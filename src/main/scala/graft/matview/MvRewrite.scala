package graft.matview

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSeq, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Automatic materialized-view substitution — a Catalyst optimizer rule
  * that replaces any query subtree computing the same result as a
  * registered MV's defining plan with a scan of the persisted MV.
  *
  * The reference performs this rewrite manually: the author re-targets Q4's
  * queries at sales/View1/View2/View3 and reasons about grouping
  * compatibility and data sufficiency by hand (assignment-5.sql:328–469;
  * SURVEY §4 "Manual view selection — automating it would need a custom
  * Rule"). This is that rule, scoped to exact-equivalence: subtree match is
  * decided by Catalyst's own `LogicalPlan.sameResult` (canonicalized plan
  * equality), so there are no false positives — the subtree provably
  * computes the MV's exact relation. Partial/containment rewrites (e.g.
  * answering a coarser GROUP BY from a finer MV) stay the author's job, as
  * in the reference.
  *
  * Injection: `spark.experimental.extraOptimizations` — no session rebuild
  * needed; [[Materializer.enableAutoRewrite]] wires it. At scale the win is
  * the reference's own Q4 lesson: the rewritten plan reads a small
  * pre-aggregated parquet relation instead of re-running the fact join.
  */
final class MvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  /** name -> (defining plan analyzed, persisted relation plan). */
  private val registry = mutable.LinkedHashMap.empty[String, (LogicalPlan, () => LogicalPlan)]

  def register(name: String, defining: DataFrame, read: () => DataFrame): Unit =
    // store the OPTIMIZED defining plan: extraOptimizations run after the
    // main optimizer batches, so subtrees arrive post-pruning/pushdown and
    // must be compared in the same normal form
    registry(name) = (defining.queryExecution.optimizedPlan,
      () => read().queryExecution.analyzed)

  def deregister(name: String): Unit = registry.remove(name)

  override def apply(plan: LogicalPlan): LogicalPlan =
    registry.foldLeft(plan) { case (p, (_, (defining, readRelation))) =>
      p.transformUp {
        case subtree if subtree.sameResult(defining) =>
          val relation = readRelation()
          // map the MV relation's output attributes onto the subtree's
          // expected output (same schema by sameResult; ids differ)
          val projections: Seq[NamedExpression] =
            subtree.output.zip(relation.output).map { case (want, have) =>
              Alias(have, want.name)(exprId = want.exprId,
                qualifier = want.qualifier)
            }
          Project(projections, relation)
        case agg: Aggregate =>
          rollupFromMv(agg, defining, readRelation).getOrElse(agg)
        case other => other
      }
    }

  /** Containment rewrite: answer `Aggregate(g2, a2, base')` from an MV
    * defined as `Aggregate(g1, a1, base)` when base' computes base, g2 is a
    * subset of g1, and every aggregate in a2 re-aggregates one stored in a1
    * (sum->sum of sums, count(*)->sum of counts, min->min, max->max — the
    * algebra the reference proves re-aggregable, assignment-5.md:160–187;
    * averages deliberately unsupported). The reference's Q4 does exactly
    * this by hand against View2/View3.
    */
  /** Normalize an Aggregate against optimizer artifacts under it: child
    * Projects are folded away — bare attributes pass through, alias
    * definitions (extracted grouping expressions like
    * `year(x) AS _groupingexpression`) are inlined back into the
    * grouping/aggregate expressions — so both sides compare against the
    * same underlying relation regardless of pruning/extraction. */
  private def inlineChildProjects(agg: Aggregate): Aggregate = agg.child match {
    case Project(plist, grandchild)
        if plist.forall(ne => ne.isInstanceOf[Attribute] || ne.isInstanceOf[Alias]) =>
      val subs: Map[Long, Expression] = plist.collect {
        case a: Alias => a.exprId.id -> a.child
      }.toMap
      def sub(e: Expression): Expression = e.transformUp {
        case ar: Attribute if subs.contains(ar.exprId.id) => subs(ar.exprId.id)
      }
      inlineChildProjects(agg.copy(
        groupingExpressions = agg.groupingExpressions.map(sub),
        aggregateExpressions =
          agg.aggregateExpressions.map(sub(_).asInstanceOf[NamedExpression]),
        child = grandchild))
    case _ => agg
  }

  private def rollupFromMv(
      query0: Aggregate,
      defining: LogicalPlan,
      readRelation: () => LogicalPlan): Option[LogicalPlan] = defining match {
    case mvAgg: Aggregate =>
      val mv = inlineChildProjects(mvAgg)
      val query = inlineChildProjects(query0)
      val (g1, a1, base) = (mv.groupingExpressions, mv.aggregateExpressions, mv.child)
      if (!query.child.sameResult(base)) return None
      // canonical form of an expression relative to its plan's input
      def canon(e: Expression, input: Seq[Attribute]): Expression =
        QueryPlan.normalizeExpressions(e, AttributeSeq(input)).canonicalized
      val baseIn = base.output
      val queryIn = query.child.output
      val relation = readRelation()
      // position i of a1  <->  relation.output(i)
      def findStored(pred: Expression => Boolean): Option[Attribute] =
        a1.zipWithIndex.collectFirst {
          case (Alias(child, _), i) if pred(child) => relation.output(i)
          case (a: Attribute, i) if pred(a) => relation.output(i)
        }
      def storedGroup(e2: Expression): Option[Attribute] =
        findStored(e1 => canon(e1, baseIn) == canon(e2, queryIn))
      def storedAgg(pred: AggregateExpression => Boolean): Option[Attribute] =
        findStored {
          case ae: AggregateExpression => pred(ae)
          case _ => false
        }

      val g2Mapped = query.groupingExpressions.map(storedGroup)
      if (g2Mapped.exists(_.isEmpty)) return None

      val rewritten: Seq[Option[NamedExpression]] = query.aggregateExpressions.map {
        case a: Attribute =>
          storedGroup(a).map(m => Alias(m, a.name)(exprId = a.exprId))
        case al @ Alias(ae: AggregateExpression, name) =>
          def out(e: Expression): Option[NamedExpression] =
            Some(Alias(e, name)(exprId = al.exprId))
          (ae.aggregateFunction, ae.isDistinct, ae.filter) match {
            case (Sum(x, _), false, None) =>
              storedAgg(_.aggregateFunction match {
                case Sum(x1, _) => canon(x1, baseIn) == canon(x, queryIn)
                case _ => false
              }).flatMap(m => out(Sum(m).toAggregateExpression()))
            case (Count(Seq(lit)), false, None) if lit.foldable =>
              storedAgg(_.aggregateFunction match {
                case Count(Seq(l1)) => l1.foldable
                case _ => false
              }).flatMap(m => out(Sum(m).toAggregateExpression()))
            case (Min(x), false, None) =>
              storedAgg(_.aggregateFunction match {
                case Min(x1) => canon(x1, baseIn) == canon(x, queryIn)
                case _ => false
              }).flatMap(m => out(Min(m).toAggregateExpression()))
            case (Max(x), false, None) =>
              storedAgg(_.aggregateFunction match {
                case Max(x1) => canon(x1, baseIn) == canon(x, queryIn)
                case _ => false
              }).flatMap(m => out(Max(m).toAggregateExpression()))
            case _ => None
          }
        case _ => None
      }
      if (rewritten.exists(_.isEmpty)) None
      else {
        val newAgg = Aggregate(
          g2Mapped.map(_.get), rewritten.map(_.get), relation)
        // type guard: the re-aggregated output must match exactly (sum over
        // a wider decimal changes type); bail out when it doesn't
        val ok = newAgg.output.zip(query.output).forall { case (n, o) =>
          n.dataType == o.dataType
        }
        if (ok) Some(newAgg) else None
      }
    case _ => None
  }
}

object MvRewrite {
  private val active = mutable.Map.empty[SparkSession, MvRewrite]

  /** Install (idempotently) the rewrite rule on this session and return it. */
  def forSession(spark: SparkSession): MvRewrite =
    active.getOrElseUpdate(spark, {
      val rule = new MvRewrite(spark)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
      rule
    })
}
