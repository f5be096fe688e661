package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of `array<bigint>` counter vectors — the
  * RE-AGGREGATION companion to the add-merge sketch family: a stored
  * [[QuantileSketchAgg]] (or [[CmsAgg]]) value is a vector of long
  * counters whose merge is element-wise addition, so a materialized
  * view holding per-fine-group sketches rolls up to any coarser grain
  * by folding the stored arrays through this aggregate — the counters
  * that come out are BIT-IDENTICAL to a one-shot sketch over the base
  * rows (addition is commutative/associative; no re-scan, no
  * approximation on top of approximation). [[graft.matview.MvRewrite]]
  * uses exactly that identity to answer sketch queries from sketch MVs.
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
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum requires an ARRAY<BIGINT> column, got ${other.sql}")
  }

  /** Empty sentinel until the first non-null input fixes the length. */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = if (buf.length == 0) new Array[Long](n) else buf
    require(out.length == n,
      s"graft_vec_sum: vector length $n != ${out.length} (mixed sketches?)")
    var i = 0
    while (i < n) {
      // a NULL element is a corrupt sketch, not a zero counter: reading
      // it as 0 (UnsafeArrayData) vs NPE-ing (GenericArrayData) must not
      // depend on the row representation — fail loudly either way
      require(!arr.isNullAt(i), s"graft_vec_sum: NULL element at $i")
      out(i) += arr.getLong(i); i += 1
    }
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.length == 0) return a
    if (a.length == 0) return b
    require(a.length == b.length,
      s"graft_vec_sum: merge of ${a.length} with ${b.length}")
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
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_vec_sum"
}

object VecSumAgg {
  def vec_sum(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      VecSumAgg(ColumnBridge.expression(c)).toAggregateExpression())
  }
}
