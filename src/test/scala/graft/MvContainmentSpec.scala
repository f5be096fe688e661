package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.matview.Materializer

/** Containment MV rewrite: a coarser GROUP BY answered by re-aggregating a
  * finer registered MV (the reference's Q4 View2/View3 technique,
  * automated for the re-aggregable algebra: sum/count/min/max).
  */
class MvContainmentSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private def fine = graft.Tables.load(spark, SF, "orders")
    .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
    .agg(count(lit(1)).as("n"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"))

  private def coarse = graft.Tables.load(spark, SF, "orders")
    .groupBy(col("o_custkey"))
    .agg(count(lit(1)).as("n"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"))

  test("coarser count/min/max roll up from the finer MV") {
    val m = new Materializer(spark, "/root/repo/target/scratch-test/mvcont")
      .enableAutoRewrite()
    val direct = coarse.collect().map(_.toSeq.toList).sortBy(_.toString)
    m.create("mv_fine_cust_year", fine)

    val q = coarse
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("mv_fine_cust_year"),
      s"expected rollup from the MV:\n$physical")
    assert(!physical.contains("orders.parquet"),
      s"base table still scanned:\n$physical")
    assert(q.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq
      == direct.toSeq)
    m.dropCascade("mv_fine_cust_year")
  }

  test("avg does NOT roll up (the reference's avg-of-avg lesson)") {
    val m = new Materializer(spark, "/root/repo/target/scratch-test/mvcont2")
      .enableAutoRewrite()
    m.create("mv_fine2", fine)
    val avgQ = graft.Tables.load(spark, SF, "orders")
      .groupBy(col("o_custkey"))
      .agg(avg(col("o_totalprice")).as("a"))
    val physical = avgQ.queryExecution.executedPlan.toString
    assert(!physical.contains("mv_fine2"), physical)
    m.dropCascade("mv_fine2")
  }

  test("extra filters block the rewrite (conservative containment)") {
    val m = new Materializer(spark, "/root/repo/target/scratch-test/mvcont3")
      .enableAutoRewrite()
    m.create("mv_fine3", fine)
    val filtered = graft.Tables.load(spark, SF, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val physical = filtered.queryExecution.executedPlan.toString
    assert(!physical.contains("mv_fine3"), physical)
    m.dropCascade("mv_fine3")
  }
}
