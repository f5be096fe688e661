package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoinNative

/** The native as-of exec must agree row-for-row with the composed
  * union+window operator (which itself is pinned against DuckDB's native
  * ASOF JOIN by the join_asof oracle).
  */
class AsOfJoinNativeSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private def inputs(sf: String) = {
    val e = graft.Tables.load(spark, sf, "events")
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    (purchases, clicks)
  }

  private def run(sf: String) = {
    val (purchases, clicks) = inputs(sf)
    val native = AsOfJoinNative.asofBackward(
        purchases, clicks, "user_id", "ts", "click_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("click_ts"), col("click_id"))
    val composed = graft.operators.AsOfJoin.asofBackward(
        purchases, clicks, "user_id", "ts", "click_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_click_ts").as("click_ts"), col("click_id"))
    (native, composed)
  }

  test("native == composed at sf0.001") {
    val (native, composed) = run(SF)
    assert(native.count() == composed.count())
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty)
  }

  test("native == composed at sf0.01 (multi-partition merge)") {
    val (native, composed) = run("/root/testdata/sf0.01")
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty)
  }

  test("plan: AsOfJoinExec with per-side exchanges, no window") {
    val (native, _) = run(SF)
    val qe = native.queryExecution
    native.collect()
    val p = qe.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), s"composed fallback leaked in:\n$p")
  }

  test("rejects non-long-backed keys") {
    val docs = graft.Tables.load(spark, SF, "documents")
    intercept[IllegalArgumentException] {
      AsOfJoinNative.asofBackward(docs, docs, "lang", "doc_id", "doc_id")
    }
  }
}
