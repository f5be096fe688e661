package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType}

/** Auto-rewrite of naive range joins — the optimizer-rule form of
  * [[graft.operators.RangeJoin]]. A pure range-condition inner join
  * (`start <= point AND point < end`, no equi conjunct) plans as a
  * nested-loop join in stock Spark: quadratic when both sides are large.
  * This rule rewrites the logical join into the binned decomposition the
  * production range-join optimizations use: the point side gains a bin
  * column (exact floor-division by the configured bin width), the
  * interval side EXPLODES into one row per overlapped bin, and the join
  * becomes an EQUI-join on the bin with the original range predicate as
  * residual — so the planner picks a hash join and the work partitions
  * by bin.
  *
  * Matched shape (conservative — it must be provable from the logical
  * plan alone): inner join whose condition contains a lower-bound and an
  * upper-bound conjunct on the SAME point expression, point from one
  * side and both bounds from the other, with NO cross-side equi conjunct
  * (if one exists the join is already hashable and binning would only
  * add work). Bounds may be strict or inclusive in either orientation
  * (`s <= p`, `p >= s`, `p BETWEEN s AND e`, ...); any extra conjuncts
  * ride along in the residual. Supported key types: integrals and DATE
  * (normalized to epoch days via [[UnixDate]] — `Cast(date, long)` is
  * an ANSI-mode error). Timestamps are deliberately out: their natural
  * unit (microseconds) makes any fixed bin width explode the interval
  * side; bin them explicitly at a chosen granularity instead.
  *
  * Bin coverage uses `floorDiv(s)` .. `floorDiv(e)` (minus one bin when
  * the upper bound is strict) — for a strict LOWER bound this covers a
  * superset of the true bins, which is always correct: the residual
  * re-applies the exact predicate.
  *
  * The rewritten join carries an equi conjunct, so the rule never
  * re-fires on its own output.
  *
  * Bin width comes from `spark.graft.rangeJoin.binWidth` (default 16) —
  * pick it near the typical interval length in the key's native unit
  * (days for dates) — or set it to `auto` to derive it from the
  * measured average interval length at planning time.
  */
case class RangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan]
  with PredicateHelper {

  /** Configured width, or — with `binWidth=auto` — the average interval
    * length measured from the interval side at planning time (one tiny
    * aggregation job over `avg(e - s)`, the CBO-statistics analog;
    * clamped to [1, 2^20]). The sampling query contains no range join,
    * so the rule cannot recurse through it; the rewritten join carries
    * an equi conjunct, so at most one probe runs per naive join per
    * optimize. Any width is CORRECT (the residual re-applies the exact
    * predicate) — width only tunes replication vs bucket size. */
  /** Memo for the `auto` probe, keyed on the canonicalized (intervals,
    * s, e) triple: re-optimizing the same query (explain + execute, AQE
    * re-plans) must not re-run the sampling job each time. Bounded —
    * cleared wholesale past 64 entries (probe results are cheap to
    * recompute; unbounded plan retention is not). */
  private val autoWidthMemo =
    new java.util.concurrent.ConcurrentHashMap[
      (LogicalPlan, Expression, Expression), java.lang.Long]()

  private def binWidth(
      intervals: LogicalPlan, s: Expression, e: Expression): Long = {
    val conf = spark.conf.get("spark.graft.rangeJoin.binWidth", "16")
    if (conf != "auto") {
      val w = conf.toLong
      require(w > 0 && w <= (1L << 20),
        s"spark.graft.rangeJoin.binWidth must be in [1, 2^20], got $w")
      w
    } else if (intervals.isStreaming) {
      // a streaming source cannot run the planning-time probe job
      // (executing it would throw inside the optimizer) — fall back to
      // the static default; set an explicit width to tune streaming
      // range joins
      16L
    } else {
      if (autoWidthMemo.size > 64) autoWidthMemo.clear()
      autoWidthMemo.computeIfAbsent(
        (intervals.canonicalized, s.canonicalized, e.canonicalized), _ => {
          import org.apache.spark.sql.graftshim.{ColumnBridge, DatasetBridge}
          val len = ColumnBridge.column(Subtract(toLong(e), toLong(s)))
          val row = DatasetBridge.ofRows(spark, intervals)
            .agg(org.apache.spark.sql.functions.avg(len))
            .head()
          if (row.isNullAt(0)) 16L
          else math.max(1L, math.min(1L << 20, math.round(row.getDouble(0))))
        }).longValue()
    }
  }

  private def supported(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType | DateType => true
    case _ => false
  }

  /** Normalize a supported expression to epoch-anchored LONG. */
  private def toLong(e: Expression): Expression = e.dataType match {
    case DateType => Cast(UnixDate(e), LongType)
    case LongType => e
    case _ => Cast(e, LongType)
  }

  private def from(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** Exact floor(x / w) for any sign: (x - pmod(x, w)) div w. */
  private def floorDiv(x: Expression, w: Long): Expression =
    IntegralDivide(
      Subtract(toLong(x), Pmod(toLong(x), Literal(w))),
      Literal(w))

  /** A bound conjunct seen from the point's perspective:
    * (point, bound, isLower, isStrict), in either written orientation. */
  private def asBound(e: Expression): Seq[(Expression, Expression, Boolean, Boolean)] =
    e match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true, false), (b, a, false, false))
      case GreaterThan(a, b)        => Seq((a, b, true, true), (b, a, false, true))
      case LessThanOrEqual(a, b)    => Seq((a, b, false, false), (b, a, true, false))
      case LessThan(a, b)           => Seq((a, b, false, true), (b, a, true, true))
      case _ => Seq.empty
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasCrossEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (from(a, l) && from(b, r)) || (from(a, r) && from(b, l))
        // an EqualNullSafe across sides is already hashable — binning on
        // top of it would only add interval replication to an equi join
        case EqualNullSafe(a, b) =>
          (from(a, l) && from(b, r)) || (from(a, r) && from(b, l))
        case _ => false
      }
      if (hasCrossEqui) j
      else {
        val lowers = conjuncts.flatMap(asBound).filter(_._3)
        val uppers = conjuncts.flatMap(asBound).filterNot(_._3)
        val matched = (for {
          (p1, s, _, _) <- lowers
          (p2, e, _, strictUpper) <- uppers
          if p1.semanticEquals(p2) && Seq(p1, s, e).forall(supported)
          pl <- (if (from(p1, l) && from(s, r) && from(e, r)) Some(true)
                 else if (from(p1, r) && from(s, l) && from(e, l)) Some(false)
                 else None).toSeq
        } yield (p1, s, e, strictUpper, pl)).headOption
        matched.fold(j: LogicalPlan) { case (p, s, e, strictUpper, pointLeft) =>
          val (points, intervals) = if (pointLeft) (l, r) else (r, l)
          rewrite(points, intervals, p, s, e, strictUpper, cond, hint, pointLeft)
        }
      }
  }

  private def rewrite(
      points: LogicalPlan,
      intervals: LogicalPlan,
      p: Expression,
      s: Expression,
      e: Expression,
      strictUpper: Boolean,
      origCond: Expression,
      hint: JoinHint,
      pointLeft: Boolean): LogicalPlan = {
    val w = binWidth(intervals, s, e)
    val binP = Alias(floorDiv(p, w), "__graft_bin_p")()
    val newPoints = Project(points.output :+ binP, points)

    val lastBin0 =
      if (strictUpper) floorDiv(Subtract(toLong(e), Literal(1L)), w)
      else floorDiv(e, w)
    // a degenerate (empty) interval would make Sequence throw where the
    // naive join just matches nothing — emit its start bin instead and
    // let the residual filter it
    val firstBin = floorDiv(s, w)
    val lastBin1 = If(GreaterThanOrEqual(lastBin0, firstBin), lastBin0, firstBin)
    // replication guard: one interval covering an absurd bin count (a
    // fine-grained long unit against a small width) would blow Spark's
    // sequence-length limit with an inscrutable array error — fail with
    // the actionable message instead. Any width is CORRECT, so the fix
    // is always "raise binWidth"; the cap is configurable for the rare
    // workload that really wants millions of replicas per interval.
    val maxBins = spark.conf.get(
      "spark.graft.rangeJoin.maxBinsPerInterval", (1L << 20).toString).toLong
    val lastBin = If(
      LessThan(Subtract(lastBin1, firstBin), Literal(maxBins)),
      lastBin1,
      Cast(new RaiseError(Literal(
        s"range-join bin explosion: one interval covers >= $maxBins bins " +
          s"at binWidth=$w — raise spark.graft.rangeJoin.binWidth (or " +
          "spark.graft.rangeJoin.maxBinsPerInterval)")), LongType))
    val gen = Explode(Sequence(
      firstBin, lastBin,
      Some(Literal(1L)),
      // Sequence is TimeZoneAware: it stays unresolved without a zone,
      // even over longs
      Some(spark.sessionState.conf.sessionLocalTimeZone)))
    val binIv = AttributeReference("__graft_bin_iv", LongType,
      nullable = false)()
    val newIntervals = Generate(gen, unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binIv),
      child = intervals)

    val joinCond = And(EqualTo(binP.toAttribute, binIv), origCond)
    val (jl, jr) = if (pointLeft) (newPoints: LogicalPlan, newIntervals)
      else (newIntervals: LogicalPlan, newPoints)
    val joined = Join(jl, jr, Inner, Some(joinCond), hint)
    val origOutput = if (pointLeft) points.output ++ intervals.output
      else intervals.output ++ points.output
    Project(origOutput, joined)
  }
}

object RangeJoinRule {
  /** Install (idempotently) on the session's extra optimizations. */
  def ensureInstalled(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[RangeJoinRule])) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRule(spark)
    }
}
