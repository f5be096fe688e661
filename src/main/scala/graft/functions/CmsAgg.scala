package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass count-min sketch aggregate (Cormode & Muthukrishnan, 2003):
  * d x w long counters over a 64-bit key column, returned as a flat
  * `array<long>` of length d*w (row-major: counter (r, b) at index r*w+b).
  *
  * The bucket function matches the composed-relation form it replaces
  * bit-for-bit: `mix64(k ^ seed_r) mod w` with w a power of two, so the
  * signed/unsigned modulus distinction vanishes and the DuckDB oracle
  * replays buckets exactly (Extras.mixChainSql). The composition
  * alternative (union the stream d times, groupBy (r, b)) scans the input
  * d times and shuffles a row per (input row, sketch row); this aggregate
  * folds all d rows in ONE stream pass with mergeable 32 KiB buffers —
  * the standard sketch contract (commutative, associative, fixed size),
  * so it also composes inside arbitrary grouped aggregations.
  *
  * Buffer serialization is the flat counter array (fixed size, shuffle-
  * friendly); merge is element-wise add.
  */
case class CmsAgg(
    child: Expression,
    seeds: Seq[Long],
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require((width & (width - 1)) == 0, "CMS width must be a power of two")
  private val depth = seeds.length
  private val mask = width - 1
  private val seedArr = seeds.toArray

  // update() casts the child value to Long; reject other types at
  // analysis time instead of a runtime ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms requires a BIGINT key column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        // mix64(k ^ seed) & (w-1) == pmod(mix64(...), w) for w = 2^n
        val b = (Mix64.mix(k ^ seedArr(r)) & mask).toInt
        buf(r * width + b) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
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
    Array.fill(depth * width)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_cms"
}

object CmsAgg {
  def cms(c: Column, seeds: Seq[Long], width: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      CmsAgg(ColumnBridge.expression(c), seeds, width).toAggregateExpression())
  }
}
