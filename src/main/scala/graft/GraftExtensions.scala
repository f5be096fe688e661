package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point for the engine's custom Catalyst layer:
  *
  *   - [[graft.plans.AsOfJoinStrategy]] — plans the native as-of join exec
  *   - [[graft.plans.FdGroupByRule]] — PostgreSQL-style functional-
  *     dependency GROUP BY (resolution-phase first() injection)
  *   - [[graft.plans.RangeJoinRule]] — rewrites naive range-condition
  *     joins into binned equi-joins (kills the nested loop)
  *   - [[graft.plans.SnapshotSkippingRule]] — prunes Snapshots commit-log
  *     scans from their _zstats/_zbloom sidecars at plan time
  *
  * Use via `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. (The MV-substitution rule
  * attaches per-Materializer instead — it needs the MV registry — via
  * `Materializer.enableAutoRewrite()`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectResolutionRule(s => graft.plans.FdGroupByRule(s))
    e.injectOptimizerRule(s => graft.plans.RangeJoinRule(s))
    e.injectOptimizerRule(s => graft.plans.SnapshotSkippingRule(s))
    // the native kernels as SQL functions (graft_vector_dot,
    // graft_minhash, ...) so pure-SQL sessions reach them too
    graft.functions.SqlFunctions.all.foreach(e.injectFunction)
  }
}
