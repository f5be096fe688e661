package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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
  * Fires only on the conservative shape it can prove: inner join, the
  * containment conjuncts and nothing else unresolved about sidedness —
  * point expression from one side, start/end from the other, all
  * integral types. The rewritten join carries an equi conjunct, so the
  * rule never re-fires on its own output.
  *
  * Bin width comes from `spark.graft.rangeJoin.binWidth` (default 16) —
  * pick it near the typical interval length.
  */
case class RangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def binWidth: Long =
    spark.conf.get("spark.graft.rangeJoin.binWidth", "16").toLong

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def from(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** Exact floor(x / w) for any sign: (x - pmod(x, w)) div w. */
  private def floorDiv(x: Expression, w: Long): Expression =
    IntegralDivide(
      Subtract(Cast(x, LongType), Pmod(Cast(x, LongType), Literal(w))),
      Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint) =>
      cond match {
        // point on the LEFT, interval on the RIGHT
        case And(GreaterThanOrEqual(p1, s), LessThan(p2, e))
            if p1.semanticEquals(p2) &&
              Seq(p1, s, e).forall(integral) &&
              from(p1, l) && from(s, r) && from(e, r) =>
          rewrite(l, r, p1, s, e, cond, hint, pointLeft = true)
        // point on the RIGHT, interval on the LEFT
        case And(GreaterThanOrEqual(p1, s), LessThan(p2, e))
            if p1.semanticEquals(p2) &&
              Seq(p1, s, e).forall(integral) &&
              from(p1, r) && from(s, l) && from(e, l) =>
          rewrite(r, l, p1, s, e, cond, hint, pointLeft = false)
        case _ => j
      }
  }

  private def rewrite(
      points: LogicalPlan,
      intervals: LogicalPlan,
      p: Expression,
      s: Expression,
      e: Expression,
      origCond: Expression,
      hint: JoinHint,
      pointLeft: Boolean): LogicalPlan = {
    val w = binWidth
    val binP = Alias(floorDiv(p, w), "__graft_bin_p")()
    val newPoints = Project(points.output :+ binP, points)

    val gen = Explode(Sequence(
      floorDiv(s, w), floorDiv(Subtract(Cast(e, LongType), Literal(1L)), w),
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
