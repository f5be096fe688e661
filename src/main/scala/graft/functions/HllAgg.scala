package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable distinct-count sketch: HyperLogLog registers (Flajolet,
  * Fusy, Gandouet, Meunier 2007) — `2^p` one-byte registers, each the
  * MAX over the group of rho(h) = 1 + leading-zeros of the hash bits
  * below the bucket prefix. The sixth member of the engine's native
  * sketch family, and the third MERGE CLASS: [[CmsAgg]] /
  * [[QuantileSketchAgg]] counters merge by element-wise ADDITION
  * (re-aggregated by [[VecSumAgg]]), [[KmvAgg]] minima sets by UNION
  * ([[KmvUnionAgg]]), and these registers by element-wise MAX
  * ([[VecMaxAgg]]) — max is commutative, associative AND idempotent,
  * so like KMV (and unlike the add-merge counters) a replayed
  * micro-batch merge under an at-least-once sink cannot corrupt the
  * state.
  *
  * Like the rest of the family the sketch VALUE is bit-deterministic:
  * each register is a pure MAX over the group's hash set, independent
  * of arrival or merge order, and rho comes from integer bit
  * arithmetic only — the DuckDB oracle replays every register from the
  * same mix64 hashes (`55 - length(bin(h & mask))`), then the
  * closed-form estimate from the exact integer register sum.
  *
  * vs [[KmvAgg]]: KMV is EXACT below K and keeps actual hash minima
  * (union-merge needs the values); HLL's fixed 512 bytes cost ~4x less
  * than KMV's 2 KiB at similar error (1.04/sqrt(m) = 4.6% at p=9 vs
  * 1/sqrt(K-2) = 6.3% at K=256) and never grows — the classic 100 TB
  * cardinality sketch, at the price of losing the exact-below-K
  * regime (the linear-counting branch stands in for it at low
  * cardinality).
  *
  * Estimation contract (computed by the CALLER from the evaluated
  * register array via [[HllAgg.sRegs]]/[[HllAgg.estimate]], keeping
  * this aggregate a pure state fold): raw = alpha_m * m^2 * 2^r / S
  * with r = RHO_MAX and S = sum over registers of 2^(r - M_j) — an
  * EXACT integer
  * folded in DECIMAL(38,0) (it can exceed 2^63), so both engines round
  * the same integer to double once; below 2.5m with empty registers
  * the standard linear-counting correction m * ln(m / V) applies.
  *
  * Input domain: NON-NEGATIVE longs (a 63-bit hash such as
  * `shiftrightunsigned(mix64(x), 1)` — shared with [[KmvAgg]]); a
  * negative input would corrupt the bucket index silently, so it
  * fails loudly instead.
  */
case class HllAgg(
    child: Expression,
    p: Int = HllAgg.P,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"graft_hll_sketch: p=$p (registers 2^p, 4..16)")

  private val m = 1 << p
  private val window = 63 - p // rho window width below the bucket prefix

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll_sketch requires a BIGINT column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0L, s"graft_hll_sketch: negative hash $h " +
        "(expected a 63-bit non-negative hash)")
      val bucket = (h >>> window).toInt
      // rho = 1 + leading zeros within the `window`-bit suffix; the long's
      // top p+1 bits are provably zero after the mask, so the 64-bit nlz
      // overcounts by exactly p+1: rho = nlz - p (w = 0 -> window + 1)
      val w = h & ((1L << window) - 1)
      val rho = (java.lang.Long.numberOfLeadingZeros(w) - p).toByte
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Long](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_hll_sketch"
}

object HllAgg {
  /** Default precision: 2^9 = 512 one-byte registers, std error
    * 1.04/sqrt(512) = 4.6%. Shared with the key/oracle SQL via the
    * literals below so the two engines cannot desynchronize. */
  val P = 9
  val M: Int = 1 << P
  /** rho window width (bits below the bucket prefix of the 63-bit hash)
    * and the maximum register value `window + 1` (all-zero suffix). */
  val WINDOW: Int = 63 - P
  val RHO_MAX: Int = WINDOW + 1

  /** Bias-corrected alpha for m >= 128 (Flajolet et al., fig. 3). */
  val ALPHA: Double = 0.7213 / (1.0 + 1.079 / M)

  /** Estimator numerator alpha * m^2 * 2^RHO_MAX: raw = EST_NUM / S with
    * S the exact integer register sum of 2^(RHO_MAX - M_j). */
  val EST_NUM: Double = ALPHA * M.toDouble * M.toDouble *
    java.lang.Math.scalb(1.0, RHO_MAX)

  /** Linear-counting threshold 2.5m (raw estimates at or below it with
    * empty registers re-estimate as m * ln(m / V)). */
  val LC_THRESHOLD: Double = 2.5 * M

  /** The constants as SQL literals — `Double.toString` is the shortest
    * round-trip form, so DuckDB parses back the identical double. */
  val estNumSqlLit: String = java.lang.Double.toString(EST_NUM)
  val lcThresholdSqlLit: String = java.lang.Double.toString(LC_THRESHOLD)
  val mSqlLit: String = s"$M.0"

  /** Exact integer register sum S = sum 2^(RHO_MAX - M_j), folded in
    * DECIMAL(38,0): each term fits a long (<= 2^RHO_MAX) but the sum can
    * reach m * 2^RHO_MAX = 2^64. Both engines cast the identical integer
    * to double exactly once, inside [[estimate]]. */
  def sRegs(regs: String): Column =
    org.apache.spark.sql.functions.expr(
      s"""aggregate($regs, CAST(0 AS DECIMAL(38,0)),
         |  (a, x) -> a + CAST(shiftleft(CAST(1 AS BIGINT),
         |    $RHO_MAX - CAST(x AS INT)) AS DECIMAL(38,0)))""".stripMargin)

  /** Count of still-empty registers (the linear-counting V). */
  def nZero(regs: String): Column =
    org.apache.spark.sql.functions.expr(
      s"size(filter($regs, x -> x = 0))")

  /** Position-weighted register sum — pins the full register CONTENT
    * (not just the estimate) through the oracle gate. */
  def regChecksum(regs: String): Column =
    org.apache.spark.sql.functions.expr(
      s"""aggregate(sequence(1, $M), CAST(0 AS BIGINT),
         |  (a, i) -> a + i * element_at($regs, i))""".stripMargin)

  /** The HLL estimate from (S, V): raw harmonic form, or linear counting
    * at low cardinality — identical branch + double ops in both engines,
    * rounded once to 6. */
  def estimate(s: Column, nZero: Column): Column = {
    import org.apache.spark.sql.functions.{lit, log, round, when}
    val raw = lit(EST_NUM) / s.cast("double")
    round(when(raw <= LC_THRESHOLD && nZero > 0,
        lit(M.toDouble) * log(lit(M.toDouble) / nZero.cast("double")))
      .otherwise(raw), 6)
  }

  /** The DuckDB replay of [[estimate]] over per-group (s HUGEINT,
    * n_zero BIGINT) columns. */
  def estimateSql(s: String, nZero: String): String =
    s"""CASE WHEN $estNumSqlLit / CAST($s AS DOUBLE) <= $lcThresholdSqlLit
       |       AND $nZero > 0
       |     THEN round($mSqlLit * ln($mSqlLit / $nZero), 6)
       |     ELSE round($estNumSqlLit / CAST($s AS DOUBLE), 6) END"""
      .stripMargin

  /** DuckDB register replay: per (group, bucket = h >> WINDOW) the MAX
    * rho, with rho = RHO_MAX - bit-length of the masked suffix (bin() is
    * minimal-length for positive values; the w = 0 case IS RHO_MAX). */
  def rhoSql(h: String): String = {
    val mask = (1L << WINDOW) - 1
    s"""($RHO_MAX - CASE WHEN ($h & $mask) = 0 THEN 0
       |  ELSE length(bin($h & $mask)) END)""".stripMargin
  }

  /** Default-p sketch. Deliberately the ONLY public constructor: every
    * companion helper above (sRegs/nZero/regChecksum/estimate/estimateSql/
    * rhoSql) hard-codes the P = 9 geometry, so a non-default-p sketch fed
    * through them would estimate silently wrong — until the estimation
    * path is parameterized by p (taking m from the register array
    * length), non-default p stays out of the public surface. */
  def hll_sketch(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      HllAgg(ColumnBridge.expression(c), P).toAggregateExpression())
  }
}
