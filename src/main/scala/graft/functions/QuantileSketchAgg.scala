package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType,
  LongType, ShortType}

/** One-pass mergeable quantile sketch over non-negative BIGINTs — the
  * order-statistic member of the engine's native sketch family (next to
  * [[CmsAgg]] / [[TopKAgg]] / [[MinHashAgg]]): a log2-bucketed histogram
  * with [[QuantileSketchAgg.SUBDIV]] linear subdivisions per octave,
  * returned as a flat `array<long>` of [[QuantileSketchAgg.SIZE]]
  * bucket counters.
  *
  * This is the integer-domain form of a relative-error quantile sketch
  * (the DDSketch family — Masson, Rim & Lee, VLDB 2019), with the
  * paper's log-gamma mapping replaced by exponent/mantissa-prefix
  * bucketing so the bucket id is PURE INTEGER arithmetic:
  *
  *   v < 32:    idx = v                                (exact, width 1)
  *   v >= 32:   e = floor(log2 v)  (= 63 - nlz(v))
  *              idx = 32 + (e-5)*32 + ((v >> (e-5)) - 32)
  *
  * No transcendental whose last ULP could differ across engines: the
  * DuckDB oracle replays the same map with bin-string length for
  * floor(log2) and `>>`, so bucket ids — and therefore every estimate —
  * are bit-identical. Bucket [lo, lo+w-1] has lo >= 32w, so the bucket
  * midpoint lo + (w-1) div 2 is within exact/64 of any member: a <=
  * 1.5625% relative-error quantile estimate from 1888 counters (15 KiB),
  * any distribution, any merge order.
  *
  * Why this exists next to `stat_approx_quantiles`: that key pins
  * Spark's built-in GK summary, whose VALUE is merge-order sensitive
  * (partials fold in shuffle-fetch order) and so never reaches its
  * output. These counters are longs and merge is element-wise add —
  * exactly commutative and associative — so the sketch value itself is
  * deterministic under any partitioning, composes inside arbitrary
  * grouped aggregations, and can carry streaming state across
  * micro-batch merges like the CMS in `events_stream_heavy_hitters`.
  */
case class QuantileSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import QuantileSketchAgg.{SIZE, SUB, SUBDIV}

  // any integral type folds (bucket ids are a pure function of the
  // widened Long value, so TINYINT..BIGINT inputs sketch identically);
  // non-integral types are rejected at analysis time instead of a
  // runtime ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_quantile_sketch requires an integral column " +
          s"(TINYINT/SMALLINT/INT/BIGINT), got ${other.sql} — " +
          "cast the column to BIGINT")
    }

  // dataType-dispatched ONCE here, not per row: update() stays a
  // monomorphic unbox in the hot path
  private lazy val widen: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType => v => v.asInstanceOf[Short].toLong
    case ByteType => v => v.asInstanceOf[Byte].toLong
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](SIZE)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = widen(v)
      // the sketch's domain is non-negative (quantized money, counts,
      // sizes); a negative value means the caller quantized wrong —
      // fail loudly rather than fold it into bucket garbage
      require(k >= 0L, s"graft_quantile_sketch: negative input $k")
      val idx =
        if (k < SUBDIV) k.toInt
        else {
          val e = 63 - java.lang.Long.numberOfLeadingZeros(k)
          SUBDIV + (e - SUB) * SUBDIV + ((k >> (e - SUB)) - SUBDIV).toInt
        }
      buf(idx) += 1L
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
    Array.fill(SIZE)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_quantile_sketch"
}

object QuantileSketchAgg {
  /** Subdivision bits per octave: 32 linear cells — relative bucket
    * width <= 1/32, midpoint error <= 1/64. */
  val SUB = 5
  val SUBDIV: Int = 1 << SUB
  /** 32 exact small-value cells + 58 octaves (e in [5, 62]) x 32. */
  val SIZE: Int = SUBDIV + (62 - SUB + 1) * SUBDIV

  def quantile_sketch(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(c)).toAggregateExpression())
  }

  /** Bucket-geometry SQL over a bucket-id column `idx` (the posexploded
    * sketch position): the bucket's width and midpoint, in the same
    * pure-integer arithmetic the oracle replays. */
  val widthSql: String =
    "CASE WHEN idx < 32 THEN CAST(1 AS BIGINT) " +
      "ELSE shiftleft(CAST(1 AS BIGINT), CAST((idx - 32) div 32 AS INT)) END"
  val midSql: String =
    "CASE WHEN idx < 32 THEN CAST(idx AS BIGINT) " +
      "ELSE CAST(32 + (idx - 32) % 32 AS BIGINT) * width + (width - 1) div 2 END"
  /** The bucket's LOWEST member value (midSql minus the half-width) —
    * with `width`, gives the bucket's exact value range [lo, lo+width-1],
    * which is what lets a caller turn a bucket id back into a pushable
    * range predicate over the raw values (the agg_quantile_sketch
    * bucket-scan exact side, r17 optimization round). */
  val loSql: String =
    "CASE WHEN idx < 32 THEN CAST(idx AS BIGINT) " +
      "ELSE CAST(32 + (idx - 32) % 32 AS BIGINT) * width END"
}
