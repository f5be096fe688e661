package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.matview.Materializer

/** The automatic MV-substitution rule: a query that recomputes a registered
  * MV's relation is rewritten to scan the persisted MV (the reference's Q4
  * manual view selection, automated — SURVEY §4).
  */
class MvRewriteSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private def revenueByPriority = graft.Tables.load(spark, SF, "orders")
    .groupBy("o_orderpriority")
    .agg(count(lit(1)).as("n"),
      sum(col("o_totalprice").cast("decimal(12,2)")).as("revenue"))

  test("equivalent query is rewritten to scan the MV; results unchanged") {
    val m = new Materializer(spark, "/root/repo/target/scratch-test/mvrw")
      .enableAutoRewrite()
    val direct = revenueByPriority.collect().sortBy(_.getString(0))
    m.create("mv_rev_by_prio", revenueByPriority)

    // a *fresh* logically-identical plan built from base tables
    val q = revenueByPriority
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("mv_rev_by_prio"),
      s"expected MV file scan in physical plan:\n$physical")
    assert(!physical.contains("HashAggregate"),
      s"aggregation should be gone (answered from the MV):\n$physical")
    assert(q.collect().sortBy(_.getString(0)).toSeq == direct.toSeq)
    m.dropCascade("mv_rev_by_prio")
  }

  test("non-equivalent queries are untouched") {
    val m = new Materializer(spark, "/root/repo/target/scratch-test/mvrw2")
      .enableAutoRewrite()
    m.create("mv_rev_by_prio2", revenueByPriority)
    val different = graft.Tables.load(spark, SF, "orders")
      .groupBy("o_orderstatus") // different grouping
      .agg(count(lit(1)).as("n"))
    val optimized = different.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("mv_rev_by_prio2"), optimized)
    m.dropCascade("mv_rev_by_prio2")
  }

  test("after drop, the rewrite no longer fires") {
    val m = new Materializer(spark, "/root/repo/target/scratch-test/mvrw3")
      .enableAutoRewrite()
    m.create("mv_rev_tmp", revenueByPriority)
    m.dropCascade("mv_rev_tmp")
    val optimized = revenueByPriority.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("mv_rev_tmp"), optimized)
  }
}
