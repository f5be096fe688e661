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

  test("unmatched left rows carry NULL right columns even when the right " +
      "schema is non-nullable; NULL keys/times never match or crash") {
    import spark.implicits._
    // spark.range-derived right side: all columns NON-NULLABLE — the
    // projection must still emit NULLs for unmatched left rows instead
    // of reading the null-fill slots as 0
    val right = spark.range(0, 3)
      .select(lit(1L).as("k"), (col("id") * 10 + 10).as("rt"),
        (col("id") + 100).as("payload"))
    val left = Seq(
      (Some(1L), Some(5L)),   // before any right row -> no match
      (Some(1L), Some(25L)),  // matches rt=20
      (Some(2L), Some(25L)),  // key with no right rows -> no match
      (None: Option[Long], Some(25L)), // NULL key -> no match, no NPE
      (Some(1L), None: Option[Long])   // NULL time -> no match, no NPE
    ).toDF("k", "lt")
    val out = AsOfJoinNative.asofBackward(left, right, "k", "lt", "rt")
      .select(col("k"), col("lt"), col("rt"), col("payload"))
      .collect()
    def row(k: Option[Long], t: Option[Long]) = out.find(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0))) == k &&
      (if (r.isNullAt(1)) None else Some(r.getLong(1))) == t).get
    assert(row(Some(1L), Some(5L)).isNullAt(2) &&
      row(Some(1L), Some(5L)).isNullAt(3), "pre-window row must be NULL")
    assert(row(Some(1L), Some(25L)).getLong(2) == 20 &&
      row(Some(1L), Some(25L)).getLong(3) == 101)
    assert(row(Some(2L), Some(25L)).isNullAt(3), "unmatched key row NULL")
    assert(row(None, Some(25L)).isNullAt(3), "NULL key never matches")
    assert(row(Some(1L), None).isNullAt(3), "NULL time never matches")
    assert(out.length == 5)
  }

  test("mismatched time units (timestamp vs date) are rejected loudly") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("k", "lt")
    val right = Seq((1L, java.sql.Date.valueOf("2024-01-01")))
      .toDF("k", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinNative.asofBackward(left, right, "k", "lt", "rt")
    }
    assert(e.getMessage.contains("one unit"))
  }
}
