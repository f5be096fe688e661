package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** Invariant checks for the relational inventory — the value-level parity
  * proof is the DuckDB oracle gate (tools/compare.py); these pin the
  * algebraic properties the reference demonstrates by example (SURVEY §5.3).
  */
class RelationalSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  test("every registered query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle without query: $k"))
  }

  test("the flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("topk_order_limit: descending, deterministic, exactly 10") {
    val rows = Relational.topkOrderLimit(spark, SF).collect()
    assert(rows.length == 10)
    val spends = rows.map(_.getAs[Double]("spend"))
    assert(spends.zip(spends.tail).forall { case (a, b) => a >= b })
  }

  test("set-op algebra: |union| == |1995| + |1996| - |intersect|") {
    val u = Relational.setopUnion(spark, SF).count()
    val i = Relational.setopIntersect(spark, SF).count()
    val e95 = Relational.setopExcept(spark, SF).count()
    def distinctCustkeys(yr: Int): Long = graft.Tables.load(spark, SF, "orders")
      .filter(year(col("o_orderdate")) === yr)
      .select("o_custkey").distinct().count()
    // |1995 only| + |intersect| == |1995|
    val y95 = distinctCustkeys(1995)
    val y96 = distinctCustkeys(1996)
    assert(e95 + i == y95)
    assert(u == y95 + y96 - i)
  }

  test("window_cumulative: final running value equals the partition total") {
    val df = Relational.windowCumulative(spark, SF)
    val bad = df.groupBy("o_custkey")
      .agg(max("running_spend").as("final_run"), sum("day_spend").as("total"))
      .filter(abs(col("final_run") - col("total")) > 1e-9)
    assert(bad.count() == 0)
  }

  test("avg-of-avg is NOT the weighted avg (the reference's Q2 lesson)") {
    val r = Relational.aggAvgOfAvg(spark, SF).collect().head
    val wrong = r.getAs[Double]("avg_of_avg")
    val right = r.getAs[Double]("weighted_avg")
    assert(math.abs(wrong - right) > 1e-9,
      "on skewed group sizes these must differ")
  }

  test("agg_two_level equals weighted recombination of per-day partials") {
    val r = Relational.aggTwoLevel(spark, SF).collect().head
    val perDay = graft.Tables.load(spark, SF, "orders")
      .groupBy("o_custkey", "o_orderdate")
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("s"))
      .agg((sum("s").cast("double") / count(lit(1))).as("a"))
      .collect().head.getAs[Double]("a")
    assert(math.abs(r.getAs[Double]("avg_day_spend") - perDay) < 1e-9)
  }

  test("join variants agree: semi-join rows ⊆ inner join rows") {
    val semi = Relational.joinSemiInSubquery(spark, SF).count()
    assert(semi > 0)
  }
}
