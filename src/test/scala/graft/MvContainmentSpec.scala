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
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvcont")
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
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvcont2")
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
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvcont3")
      .enableAutoRewrite()
    m.create("mv_fine3", fine)
    // o_orderstatus is NOT a stored grouping column of the MV — the
    // filter cannot be mapped, so the rewrite must not fire
    val filtered = graft.Tables.load(spark, SF, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val physical = filtered.queryExecution.executedPlan.toString
    assert(!physical.contains("mv_fine3"), physical)
    m.dropCascade("mv_fine3")
  }

  test("filter on a stored grouping column maps onto the MV") {
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvcont4")
      .enableAutoRewrite()
    def q = graft.Tables.load(spark, SF, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val direct = q.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq
    m.create("mv_status_prio",
      graft.Tables.load(spark, SF, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n")))
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("mv_status_prio"), physical)
    assert(!physical.contains("orders.parquet"), physical)
    assert(q.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq == direct)
    m.dropCascade("mv_status_prio")
  }

  test("exact-average (sum/count composite) rolls up from stored parts") {
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvcont5")
      .enableAutoRewrite()
    def q = graft.Tables.load(spark, SF, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(graft.Tables.exactAvg(col("o_totalprice")).as("a"))
    val direct = q.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq
    m.create("mv_avg_parts_t",
      graft.Tables.load(spark, SF, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(graft.Tables.dec(col("o_totalprice"))).as("s"),
          count(lit(1)).as("c")))
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("mv_avg_parts_t"), physical)
    assert(q.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq == direct,
      "re-aggregated exact average must be bit-identical")
    m.dropCascade("mv_avg_parts_t")
  }

  test("cost chooser picks the narrower MV when several answer") {
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvcont6")
      .enableAutoRewrite()
    m.create("mv_wide_t",
      graft.Tables.load(spark, SF, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n")))
    m.create("mv_narrow_t",
      graft.Tables.load(spark, SF, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n")))
    val q = graft.Tables.load(spark, SF, "lineitem")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("mv_narrow_t"), physical)
    assert(!physical.contains("mv_wide_t"), physical)
    m.dropCascade("mv_wide_t")
    m.dropCascade("mv_narrow_t")
  }

  test("derived grouping: year(g) rolls up from a date-grained MV") {
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvcont7")
      .enableAutoRewrite()
    def q = graft.Tables.load(spark, SF, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n"))
    val direct = q.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq
    m.create("mv_daily_t",
      graft.Tables.load(spark, SF, "orders")
        .groupBy(col("o_orderdate")).agg(count(lit(1)).as("n")))
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("mv_daily_t"), physical)
    assert(q.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq == direct)
    m.dropCascade("mv_daily_t")
  }

  test("stored aggregate aliases are not addressable as grouping values") {
    // regression: a query output shaped like a stored aggregate alias
    // (cast(sum(...))) must not map onto the stored column from inside a
    // coarser Aggregate — that would reference a non-grouping attribute
    // outside any aggregate and produce an unresolvable plan
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvcont8")
      .enableAutoRewrite()
    m.create("mv_castsum_t",
      graft.Tables.load(spark, SF, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          graft.Tables.exactSum(col("o_totalprice")).as("revenue")))
    val q = graft.Tables.load(spark, SF, "orders")
      .agg(graft.Tables.exactSum(col("o_totalprice")).as("revenue"))
    val expected = q.collect().head.getDouble(0)
    assert(q.collect().head.getDouble(0) == expected) // executes cleanly
    m.dropCascade("mv_castsum_t")
  }
}
