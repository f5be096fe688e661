package graft.matview

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
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
        case other => other
      }
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
