package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise MAX of `array<bigint>` vectors — the RE-AGGREGATION
  * companion to the max-merge sketch class, completing the family's
  * merge algebra: [[VecSumAgg]] re-aggregates the add-merge counters
  * (quantile histogram, CMS), [[KmvUnionAgg]] the union-merge minima
  * sets, and this one the max-merge registers ([[HllAgg]]). A stored
  * HLL register vector rolls up to any coarser grain by element-wise
  * max — each register is a pure MAX over the underlying hash set, so
  * the folded vector is BIT-IDENTICAL to a one-shot sketch over the
  * base rows, and (unlike addition) the fold is IDEMPOTENT: feeding a
  * stored sketch in twice cannot corrupt the rollup.
  * [[graft.matview.MvRewrite]] uses the identity to answer HLL
  * cardinality queries from sketch MVs.
  *
  * All input vectors in a group must share one length (a sketch
  * family's geometry is fixed); a length mismatch means the caller
  * mixed sketch types, so it fails loudly. Null vectors are skipped;
  * an all-null group evaluates to an empty array.
  *
  * 100 TB shape: O(sketch size) state per group, ordinary partial
  * aggregate with map-side combine — the shuffle moves |groups| x one
  * vector, never the stored rows.
  */
case class VecMaxAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_max requires an ARRAY<BIGINT> column, got ${other.sql}")
  }

  /** Empty sentinel until the first non-null input fixes the length. */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buf.length == 0) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        require(!arr.isNullAt(i), s"graft_vec_max: NULL element at $i")
        out(i) = arr.getLong(i); i += 1
      }
      return out
    }
    require(buf.length == n,
      s"graft_vec_max: vector length $n != ${buf.length} (mixed sketches?)")
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), s"graft_vec_max: NULL element at $i")
      val x = arr.getLong(i)
      if (x > buf(i)) buf(i) = x
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.length == 0) return a
    if (a.length == 0) return b
    require(a.length == b.length,
      s"graft_vec_max: merge of ${a.length} with ${b.length}")
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecMaxAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_vec_max"
}

object VecMaxAgg {
  def vec_max(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      VecMaxAgg(ColumnBridge.expression(c)).toAggregateExpression())
  }
}
