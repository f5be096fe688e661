package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Sum of DOUBLE values folded in ascending (key, value-bits) order —
  * the deterministic-float-reduction primitive. IEEE addition is not
  * associative, so an ordinary `sum(double)` depends on partitioning
  * and shuffle-fetch order; this aggregate buffers (key, value) pairs
  * as primitive parallel arrays, and only at EVAL sorts them and folds
  * sequentially — the fold order is a pure function of the input
  * multiset, so the result is bit-identical under any partitioning or
  * merge order, and a SQL oracle replays it with
  * `list_reduce(list(v ORDER BY k), ...)`.
  *
  * Built for `graph_pagerank`'s per-node contribution fold, which
  * previously ran as `aggregate(array_sort(collect_list(struct(k, v))),
  * 0.0, (acc, x) -> acc + x.v)`: per 120M-edge iteration at sf10 the
  * boxed struct collection + InternalRow array_sort + interpreted
  * lambda cost 16s vs 8s for a plain (non-deterministic) sum; this
  * primitive-array form closes most of that determinism tax (ProfPR,
  * round 11) and, unlike the boxed form, its buffer is GC-flat —
  * 16 bytes/edge instead of a struct object per edge.
  *
  * Ties: pairs sharing a key sort by the raw IEEE bits of the value,
  * so duplicate keys still fold in one canonical order — the result
  * stays deterministic. But ORACLE REPLAY requires UNIQUE keys per
  * group: a SQL fold ordered by key alone cannot replay the raw-bits
  * tie order (which places -0.0 after every negative value and NaN by
  * payload), so an oracle-gated caller must feed keys unique per group
  * (pagerank's in-neighbor ids are). With duplicate keys the aggregate
  * is still bit-deterministic, just not ORDER-BY-key replayable.
  */
case class OrderedSumAgg(
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[OrderedSumAgg.Buf] {

  import OrderedSumAgg.Buf

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType && value.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_ordered_sum requires (BIGINT key, DOUBLE value), got " +
        s"(${key.dataType.sql}, ${value.dataType.sql})")

  override def createAggregationBuffer(): Buf = new Buf(8)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val k = key.eval(input)
    val v = value.eval(input)
    if (k != null && v != null)
      buf.append(k.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a.appendAll(b); a }

  override def eval(buf: Buf): Any = buf.orderedSum()

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putLong(buf.ks(i)); bb.putDouble(buf.vs(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Buf(math.max(8, n))
    var i = 0
    while (i < n) { buf.append(bb.getLong(), bb.getDouble()); i += 1 }
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, value)

  override def withNewMutableAggBufferOffset(newOffset: Int): OrderedSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OrderedSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OrderedSumAgg =
    copy(key = newChildren(0), value = newChildren(1))

  override def prettyName: String = "graft_ordered_sum"
}

object OrderedSumAgg {

  /** Growable primitive pair buffer; sorted only once, at eval. */
  final class Buf(cap0: Int) {
    var ks: Array[Long] = new Array[Long](cap0)
    var vs: Array[Double] = new Array[Double](cap0)
    var size: Int = 0

    def append(k: Long, v: Double): Unit = {
      if (size == ks.length) {
        ks = java.util.Arrays.copyOf(ks, size * 2)
        vs = java.util.Arrays.copyOf(vs, size * 2)
      }
      ks(size) = k; vs(size) = v; size += 1
    }

    def appendAll(o: Buf): Unit = {
      var i = 0
      while (i < o.size) { append(o.ks(i), o.vs(i)); i += 1 }
    }

    def orderedSum(): Double = {
      sort(0, size - 1)
      var acc = 0.0
      var i = 0
      while (i < size) { acc += vs(i); i += 1 }
      acc
    }

    // in-place dual-array quicksort by (key, value-bits): median-of-3
    // pivot (Sedgewick scheme — pivot parked at hi-1, the lo/hi entries
    // double as scan sentinels), recurse into the smaller partition and
    // loop on the larger so stack depth stays O(log n); insertion sort
    // below 16 elements
    private def lt(i: Int, j: Int): Boolean =
      ks(i) < ks(j) || (ks(i) == ks(j) &&
        java.lang.Double.doubleToRawLongBits(vs(i)) <
          java.lang.Double.doubleToRawLongBits(vs(j)))
    private def swap(i: Int, j: Int): Unit = {
      val k = ks(i); ks(i) = ks(j); ks(j) = k
      val v = vs(i); vs(i) = vs(j); vs(j) = v
    }
    private def sort(lo0: Int, hi0: Int): Unit = {
      var lo = lo0; var hi = hi0
      while (hi - lo >= 16) {
        val mid = lo + (hi - lo) / 2
        if (lt(mid, lo)) swap(mid, lo)
        if (lt(hi, lo)) swap(hi, lo)
        if (lt(hi, mid)) swap(hi, mid)
        swap(mid, hi - 1)
        val p = hi - 1
        var i = lo; var j = p
        var done = false
        while (!done) {
          i += 1; while (lt(i, p)) i += 1
          j -= 1; while (lt(p, j)) j -= 1
          if (i >= j) done = true else swap(i, j)
        }
        swap(i, p)
        if (i - lo < hi - i) { sort(lo, i - 1); lo = i + 1 }
        else { sort(i + 1, hi); hi = i - 1 }
      }
      var a = lo + 1
      while (a <= hi) {
        var b = a
        while (b > lo && lt(b, b - 1)) { swap(b, b - 1); b -= 1 }
        a += 1
      }
    }
  }

  def ordered_sum(k: Column, v: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      OrderedSumAgg(ColumnBridge.expression(k),
        ColumnBridge.expression(v)).toAggregateExpression())
  }
}
