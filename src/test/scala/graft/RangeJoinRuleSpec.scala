package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRule

/** The generalized RangeJoinRule against ground truth computed driver-side:
  * every bound orientation, strictness mix, DATE keys, degenerate
  * intervals, residual conjuncts, and the cross-equi decline. */
class RangeJoinRuleSpec extends AnyFunSuite {
  import TestSpark.spark

  RangeJoinRule.ensureInstalled(spark)
  spark.conf.set("spark.graft.rangeJoin.binWidth", "8")

  // deterministic small relations: 200 points, 40 intervals of width 0..24
  private lazy val pts = spark.range(200)
    .select((col("id") * 7919 % 311).as("p"), col("id").as("pid"))
  private lazy val ivs = spark.range(40)
    .select(col("id").as("iid"), (col("id") * 104729 % 280).as("s"))
    .withColumn("e", col("s") + col("iid") * 13 % 25)

  private lazy val ptsL = pts.collect().map(r => (r.getLong(0), r.getLong(1)))
  private lazy val ivsL = ivs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  private def expected(
      lo: (Long, Long) => Boolean, hi: (Long, Long) => Boolean): Set[(Long, Long)] =
    (for {
      (p, pid) <- ptsL
      (iid, s, e) <- ivsL
      if lo(p, s) && hi(p, e)
    } yield (pid, iid)).toSet

  private def got(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def assertRewrote(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"rule did not fire:\n$plan")
  }

  test("half-open [s, e), point left") {
    val j = pts.join(ivs, col("p") >= col("s") && col("p") < col("e"))
    assertRewrote(j)
    assert(got(j) == expected(_ >= _, _ < _))
  }

  test("closed BETWEEN, flipped orientation (s <= p, e >= p), interval left") {
    val j = ivs.join(pts, col("s") <= col("p") && col("e") >= col("p"))
    assertRewrote(j)
    assert(got(j) == expected(_ >= _, _ <= _))
  }

  test("strict both ends (s < p < e)") {
    val j = pts.join(ivs, col("p") > col("s") && col("p") < col("e"))
    assertRewrote(j)
    assert(got(j) == expected(_ > _, _ < _))
  }

  test("extra residual conjunct rides along") {
    val j = pts.join(ivs,
      col("p") >= col("s") && col("p") < col("e") && col("pid") % 2 === 0)
    assertRewrote(j)
    assert(got(j) == expected(_ >= _, _ < _).filter(_._1 % 2 == 0))
  }

  test("degenerate empty intervals match nothing and do not crash") {
    // bounds must be column-derived: literal bounds constant-fold into a
    // point-side filter before the rule sees the join (correctly declined)
    val empty = spark.range(5)
      .select(col("id").as("iid"), (col("id") + 100L).as("s"))
      .withColumn("e", col("s") - 10L)
    val j = pts.join(empty, col("p") >= col("s") && col("p") < col("e"))
    assertRewrote(j)
    assert(j.count() == 0)
  }

  test("DATE keys: BETWEEN over date columns") {
    val dp = pts.select(col("pid"),
      date_add(lit("2000-01-01").cast("date"), col("p").cast("int")).as("pd"))
    val di = ivs.select(col("iid"),
      date_add(lit("2000-01-01").cast("date"), col("s").cast("int")).as("sd"),
      date_add(lit("2000-01-01").cast("date"), col("e").cast("int")).as("ed"))
    val j = dp.join(di, col("pd").between(col("sd"), col("ed")))
    assertRewrote(j)
    assert(got(j) == expected(_ >= _, _ <= _))
  }

  test("cross-side equi conjunct: rule declines, result still correct") {
    val j = pts.join(ivs,
      col("pid") === col("iid") && col("p") >= col("s") && col("p") < col("e"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_bin"), "rule should not fire on equi joins")
    assert(got(j) == expected(_ >= _, _ < _).filter(x => x._1 == x._2))
  }

  test("auto bin width derives from interval statistics and stays exact") {
    val saved = spark.conf.get("spark.graft.rangeJoin.binWidth")
    try {
      spark.conf.set("spark.graft.rangeJoin.binWidth", "auto")
      val j = pts.join(ivs, col("p") >= col("s") && col("p") < col("e"))
      assertRewrote(j)
      assert(got(j) == expected(_ >= _, _ < _))
    } finally spark.conf.set("spark.graft.rangeJoin.binWidth", saved)
  }

  test("bin-explosion guard raises an actionable error instead of the " +
      "sequence-length failure, and the cap is configurable") {
    spark.conf.set("spark.graft.rangeJoin.maxBinsPerInterval", "4")
    try {
      // one interval spanning ~35 bins at width 8 (> the cap of 4);
      // column-derived bounds so constant propagation can't erase the
      // range shape before the rule sees it
      val wide = spark.range(1)
        .select(col("id").as("iid"), col("id").as("s"),
          (col("id") + 280).as("e"))
      val q = pts.join(wide, col("p") >= col("s") && col("p") < col("e"))
      val ex = intercept[Exception] { q.collect() }
      assert(ex.toString.contains("bin explosion") ||
        String.valueOf(ex.getCause).contains("bin explosion") ||
        String.valueOf(ex.getMessage).contains("bin explosion"),
        s"unexpected error: $ex")
      // normal intervals keep working under the default cap
      spark.conf.set("spark.graft.rangeJoin.maxBinsPerInterval",
        (1L << 20).toString)
      val ok = pts.join(wide, col("p") >= col("s") && col("p") < col("e"))
      assertRewrote(ok)
      assert(ok.count() == ptsL.count(_._1 < 280L))
    } finally
      spark.conf.unset("spark.graft.rangeJoin.maxBinsPerInterval")
  }
}
