package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash signature aggregate: for each of `numHashes` seeded
  * SplitMix64 permutations, the minimum mixed value of the input hash
  * column within the group — `array<long>` of length `numHashes`.
  *
  * The composition alternative (64 separate `min(mix64(h, seed_i))` agg
  * columns) computes the identical result; this custom
  * TypedImperativeAggregate folds all lanes in one buffer pass, shrinking
  * the aggregation state from 64 independent agg slots to a single
  * long-array buffer and the plan from 64 expressions to one. Exactness is
  * pinned by MinHashAggSpec (bit-equal to the composed form).
  *
  * Buffer is a primitive Array[Long]; serialization for partial/final merge
  * is a flat byte buffer (shuffle-friendly fixed size).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numHashes >= 1, s"graft_minhash: numHashes=$numHashes (need >= 1)")

  // analysis-time type gate, like every sibling aggregate: the SQL surface
  // (graft_minhash) would otherwise fail with a runtime ClassCastException
  // deep inside the aggregate exec instead of a resolvable error
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires a BIGINT column, got ${child.dataType.sql}")

  private val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => MinHashAgg.GOLDEN * i)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  /** Bound long-column fast path: the aggregate exec binds `child` before
    * update, so the common case reads the primitive directly instead of
    * boxing a java.lang.Long per input row through `eval`. */
  @transient private lazy val fastOrdinal: Int = child match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType == LongType => b.ordinal
    case _ => -1
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    if (fastOrdinal >= 0) {
      if (!input.isNullAt(fastOrdinal)) fold(buf, input.getLong(fastOrdinal))
    } else {
      val v = child.eval(input)
      if (v != null) fold(buf, v.asInstanceOf[Long])
    }
    buf
  }

  private def fold(buf: Array[Long], h: Long): Unit = {
    val n = numHashes
    val sd = seeds
    var i = 0
    while (i < n) {
      val m = Mix64.mix(h ^ sd(i))
      if (m < buf(i)) buf(i) = m
      i += 1
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_minhash"
}

object MinHashAgg {
  final val GOLDEN: Long = 0x9E3779B97F4A7C15L

  def minhash(c: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(c), numHashes).toAggregateExpression())
  }
}
