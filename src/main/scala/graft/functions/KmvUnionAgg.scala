package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-bounded set union of stored KMV sketches — [[KmvAgg]]'s
  * RE-AGGREGATION form, the union-merge counterpart of [[VecSumAgg]]'s
  * add-merge: each input is an evaluated KMV sketch (sorted-ascending
  * distinct minima, at most k), and the union-then-truncate of
  * per-fine-group sketches IS the sketch of the union — "the k smallest
  * distinct elements of a union" is computable from the per-part k
  * smallest (the classic KMV mergeability property), so a materialized
  * view holding per-month sketches answers any coarser distinct-count
  * rollup bit-identically to a one-shot sketch over the base rows.
  * Like [[KmvAgg]]'s own merge it is IDEMPOTENT (set semantics).
  *
  * State/shape: one k-slot buffer per group, map-side combine; the
  * shuffle moves |groups| x at most 8k bytes.
  */
case class KmvUnionAgg(
    child: Expression,
    k: Int = KmvAgg.K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Buf] {

  require(k >= 2, s"graft_kmv_union: k=$k (estimator needs k >= 2)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_union requires an ARRAY<BIGINT> sketch column, " +
        s"got ${other.sql}")
  }

  override def createAggregationBuffer(): KmvAgg.Buf =
    new KmvAgg.Buf(new Array[Long](k), 0, k)

  override def update(buf: KmvAgg.Buf, input: InternalRow): KmvAgg.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    require(n <= k, s"graft_kmv_union: input sketch has $n > k=$k values")
    // inputs are sorted ascending (a KmvAgg eval); inserting in order
    // keeps each binary-search insert's shift minimal
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), s"graft_kmv_union: NULL element at $i")
      val h = arr.getLong(i)
      require(h >= 0L, s"graft_kmv_union: negative hash $h")
      buf.insert(h)
      i += 1
    }
    buf
  }

  /** Same one-walk k-bounded merge as [[KmvAgg]]. */
  override def merge(a: KmvAgg.Buf, b: KmvAgg.Buf): KmvAgg.Buf =
    KmvUnionAgg.mergeBufs(a, b, k)

  override def eval(buf: KmvAgg.Buf): Any =
    new GenericArrayData(buf.arr.slice(0, buf.size))

  override def serialize(buf: KmvAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.Buf = {
    val n = bytes.length / 8
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val arr = new Array[Long](k)
    var i = 0
    while (i < n) { arr(i) = bb.getLong(); i += 1 }
    new KmvAgg.Buf(arr, n, k)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvUnionAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_kmv_union"
}

object KmvUnionAgg {

  /** One-walk k-bounded union of two sorted distinct buffers (shared
    * with [[KmvAgg.merge]]'s semantics). */
  private[functions] def mergeBufs(
      a: KmvAgg.Buf, b: KmvAgg.Buf, k: Int): KmvAgg.Buf = {
    if (b.size == 0) return a
    if (a.size == 0) {
      System.arraycopy(b.arr, 0, a.arr, 0, b.size); a.size = b.size; return a
    }
    val out = new Array[Long](k)
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && a.arr(i) <= b.arr(j))
      val v = if (takeA) a.arr(i) else b.arr(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    a.arr = out; a.size = n
    a
  }

  def kmv_union(c: Column): Column = kmv_union(c, KmvAgg.K)

  def kmv_union(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      KmvUnionAgg(ColumnBridge.expression(c), k).toAggregateExpression())
  }
}
