package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.matview.Materializer

class MaterializerSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private def freshMat(tag: String) =
    new Materializer(spark, s"/root/repo/target/scratch-test/$tag")

  test("create persists and table() reads back a file scan") {
    val m = freshMat("basic")
    val df = graft.Tables.load(spark, SF, "region")
    m.create("mv_regions", df)
    assert(m.table("mv_regions").count() == df.count())
    // the read-back plans a file scan, not the original in-memory plan
    assert(m.table("mv_regions").queryExecution.executedPlan.toString
      .contains("FileScan parquet"))
  }

  test("refresh overwrites") {
    val m = freshMat("refresh")
    val r = graft.Tables.load(spark, SF, "region")
    m.create("mv_r", r.limit(2))
    assert(m.table("mv_r").count() == 2)
    m.create("mv_r", r)
    assert(m.table("mv_r").count() == r.count())
  }

  test("dropCascade removes dependents first, transitively") {
    val m = freshMat("cascade")
    val r = graft.Tables.load(spark, SF, "region")
    m.create("a", r)
    m.create("b", m.table("a").filter(col("r_regionkey") > 0), Seq("a"))
    m.create("c", m.table("b").limit(1), Seq("b"))
    m.create("unrelated", r.limit(1))
    val order = m.dropCascade("a")
    assert(order == Seq("c", "b", "a"))
    assert(!m.exists("a") && !m.exists("b") && !m.exists("c"))
    assert(m.exists("unrelated"))
  }

  test("create with unknown dependency is rejected") {
    val m = freshMat("unknown-dep")
    val r = graft.Tables.load(spark, SF, "region")
    intercept[IllegalArgumentException] {
      m.create("x", r, Seq("nope"))
    }
  }

  test("refreshIncremental merges deltas; repeated refreshes stay exact") {
    import graft.matview.Materializer.Measure
    import org.apache.spark.sql.functions._
    val m = freshMat("incr")
    val o = graft.Tables.load(spark, SF, "orders")
    // build from one status, merge the others in TWO separate deltas —
    // the second delta introduces brand-new groups
    m.createAggregated("mv_incr", o.filter(col("o_orderstatus") === "F"),
      Seq("o_orderstatus", "o_orderpriority"),
      Seq(Measure.sumOf(graft.Tables.dec(col("o_totalprice")), "rev"),
        Measure.countAll("n"),
        Measure.minOf(col("o_totalprice"), "lo"),
        Measure.maxOf(col("o_totalprice"), "hi")))
    m.refreshIncremental("mv_incr", o.filter(col("o_orderstatus") === "O"))
    m.refreshIncremental("mv_incr", o.filter(col("o_orderstatus") === "P"))
    val got = m.table("mv_incr").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDecimal(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).sortBy(_.toString)
    val want = o.groupBy("o_orderstatus", "o_orderpriority")
      .agg(sum(graft.Tables.dec(col("o_totalprice"))).as("rev"),
        count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDecimal(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).sortBy(_.toString)
    assert(got.map(t => (t._1, t._2, BigDecimal(t._3), t._4, t._5, t._6)).toSeq
      == want.map(t => (t._1, t._2, BigDecimal(t._3), t._4, t._5, t._6)).toSeq)
  }
}
