package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable distinct-count sketch: the [[KmvAgg.K]] smallest DISTINCT
  * hash values of the group (KMV — "k minimum values", Bar-Yossef et al.
  * 2002), returned as a sorted-ascending `array<long>` of at most K
  * elements. The fifth member of the engine's native sketch family
  * ([[CmsAgg]] counts, [[TopKAgg]] heavy hitters, [[MinHashAgg]]
  * signatures, [[QuantileSketchAgg]] order statistics; this one
  * cardinality), and the streaming-state form of the windowed-rank KMV
  * the batch `agg_kmv_distinct` key computes relationally.
  *
  * The sketch VALUE is a pure set function — "the K smallest distinct
  * elements" does not depend on arrival or merge order — so it is
  * bit-deterministic under any partitioning, like the rest of the
  * family. Unlike the CMS/quantile counter sketches, whose merge is
  * element-wise ADDITION, this merge is set UNION (then re-truncate to
  * K): it is IDEMPOTENT — merging a partial twice yields the same
  * state, so a replayed micro-batch merge under an at-least-once sink
  * cannot corrupt the sketch, where an add-merge sketch would
  * double-count. That property is pinned in KmvAggSpec.
  *
  * Estimation contract (computed by the CALLER from the evaluated
  * array, keeping this aggregate a pure state fold): if the sketch
  * holds fewer than K values it IS the distinct set's hashes and the
  * count is exact; at K, the standard estimator (K-1) * H / h_(K) with
  * H the hash-space size — relative std error ~ 1/sqrt(K-2), ~6.3% at
  * K=256 for 2 KiB of state.
  *
  * Input domain: NON-NEGATIVE longs (a 63-bit hash such as
  * `shiftrightunsigned(mix64(x), 1)` — the `agg_kmv_distinct` hash);
  * a negative input means the caller skipped the unsigned shift and
  * would silently skew the estimator's hash-space constant, so it
  * fails loudly instead.
  */
case class KmvAgg(
    child: Expression,
    k: Int = KmvAgg.K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Buf] {

  import KmvAgg.Buf

  require(k >= 2, s"graft_kmv_sketch: k=$k (estimator needs k >= 2)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_sketch requires a BIGINT column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Buf =
    new Buf(new Array[Long](k), 0, k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0L, s"graft_kmv_sketch: negative hash $h " +
        "(expected a 63-bit non-negative hash)")
      buf.insert(h)
    }
    buf
  }

  /** K-bounded merge of two sorted distinct arrays — one walk (shared
    * with the re-aggregation form, [[KmvUnionAgg]]). */
  override def merge(a: Buf, b: Buf): Buf = KmvUnionAgg.mergeBufs(a, b, k)

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.arr.slice(0, buf.size))

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val n = bytes.length / 8
    val bb = ByteBuffer.wrap(bytes)
    val arr = new Array[Long](k)
    var i = 0
    while (i < n) { arr(i) = bb.getLong(); i += 1 }
    new Buf(arr, n, k)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_kmv_sketch"
}

object KmvAgg {
  /** Default sketch size: 2 KiB of state, ~1/sqrt(K-2) = 6.3% std error
    * at the estimator, EXACT below K. Shared with the key SQL via
    * [[kSql]]; per-call sizes go through the `k` constructor param. */
  val K = 256

  /** The hash-space size H of the 63-bit non-negative domain, 2^63 as a
    * double — the estimator's numerator constant. One definition feeds
    * the Spark expressions, the DuckDB oracle strings ([[hSqlLit]]) and
    * the specs, so a K change cannot desynchronize engine from oracle
    * (r10 ADVICE: the constants were raw literals in three places). */
  val H: Double = 9.223372036854775808e18

  /** H as the exact SQL double literal the oracle strings interpolate. */
  val hSqlLit: String = "9223372036854775808.0"

  /** Estimator numerator (K-1)*H for a given sketch size, as a Spark
    * double and as the equivalent SQL text `"(k-1).0 * H"`. */
  def estNumerator(k: Int): Double = (k - 1).toDouble * H
  def estNumeratorSql(k: Int): String = s"${k - 1}.0 * $hSqlLit"

  /** Sorted-ascending distinct minima; `size` live slots in `arr`,
    * capacity `k`. */
  final class Buf(var arr: Array[Long], var size: Int, val k: Int) {
    def insert(h: Long): Unit = {
      if (size == k && h >= arr(k - 1)) return // beyond the k-th minimum
      var idx = java.util.Arrays.binarySearch(arr, 0, size, h)
      if (idx >= 0) return // already present (set semantics)
      idx = -idx - 1
      val last = math.min(size, k - 1) // slot k-1 falls off when full
      System.arraycopy(arr, idx, arr, idx + 1, last - idx)
      arr(idx) = h
      if (size < k) size += 1
    }
  }

  def kmv_sketch(c: Column): Column = kmv_sketch(c, K)

  def kmv_sketch(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(c), k).toAggregateExpression())
  }

  /** K as a SQL literal so key/oracle expressions stay in lockstep. */
  val kSql: String = K.toString
}
