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
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvrw")
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
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvrw2")
      .enableAutoRewrite()
    m.create("mv_rev_by_prio2", revenueByPriority)
    val different = graft.Tables.load(spark, SF, "orders")
      .groupBy("o_orderstatus") // different grouping
      .agg(count(lit(1)).as("n"))
    val optimized = different.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("mv_rev_by_prio2"), optimized)
    m.dropCascade("mv_rev_by_prio2")
  }

  test("matview_window_rewrite: refreshed window MV answers the base-table" +
      " cumulative query via the rewriter, values = direct recompute") {
    val rows = SparkEntry.queries("matview_window_rewrite")(spark, SF).collect()
    assert(rows.nonEmpty)
    // the plan fact the oracle pins: every row carries served_from_mv=true
    assert(rows.forall(_.getAs[Boolean]("served_from_mv")),
      "cumulative query was not answered from the refreshed MV")
    // values equal the non-rewriting refresh key's (same lifecycle, same
    // window) — cross-checks the rewrite changed the PLAN, not the data
    val refresh = SparkEntry.queries("matview_window_refresh")(spark, SF)
      .collect()
    assert(rows.length == refresh.length)
    rows.zip(refresh).foreach { case (a, b) =>
      assert(a.getAs[String]("nation") == b.getAs[String]("nation"))
      // day's external type follows the fixture's physical type
      // (timestamp or date) — compare as Any, both keys read the same way
      assert(a.getAs[Any]("day") == b.getAs[Any]("day"))
      assert(a.getAs[Double]("day_spend") == b.getAs[Double]("day_spend"))
      assert(a.getAs[Double]("cum_spend") == b.getAs[Double]("cum_spend"))
    }
  }

  test("matview_sketch_rewrite: per-flag sketch served by merging stored " +
      "monthly sketch vectors, values = direct recompute") {
    val rows = graft.queries.Lifecycle.matviewSketchRewrite(spark, SF)
      .collect()
    assert(rows.length == 9) // 3 returnflags x 3 quantiles
    assert(rows.forall(_.getAs[Boolean]("served_from_mv")),
      "per-flag sketch query was not served from the sketch MV")
    // direct (no MV, no rewrite): the same estimate from a one-shot
    // sketch over the base rows — the add-merge identity end to end
    import org.apache.spark.sql.expressions.Window
    import graft.functions.QuantileSketchAgg
    import spark.implicits._
    val li = graft.Tables.load(spark, SF, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(QuantileSketchAgg.quantile_sketch(
        round(col("l_extendedprice") * 100).cast("long")).as("sk"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("n"),
        posexplode(col("sk")).as(Seq("idx", "cnt")))
      .filter(col("cnt") > 0)
      .withColumn("width", expr(QuantileSketchAgg.widthSql))
      .withColumn("mid", expr(QuantileSketchAgg.midSql))
      .withColumn("cum", sum(col("cnt"))
        .over(Window.partitionBy("l_returnflag").orderBy("idx")))
      .join(broadcast(Seq(0.5, 0.9, 0.99).toDF("q")),
        col("cum") >= ceil(col("q") * col("n")))
      .groupBy("l_returnflag", "q")
      .agg(min(col("mid")).as("est_cents"))
      .select(col("l_returnflag"), col("q"),
        (col("est_cents").cast("double") / 100.0).as("est_value"))
      .orderBy("l_returnflag", "q")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSeq == direct.map(r =>
        (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq)
  }

  test("matview_sketch_rollup: the SAME monthly sketch MV serves a " +
      "QUARTERLY grain (grouping compatibility), values = direct recompute") {
    val rows = graft.queries.Lifecycle.matviewSketchRollup(spark, SF)
      .collect()
    assert(rows.nonEmpty && rows.length % 2 == 0) // groups x 2 quantiles
    assert(rows.forall(_.getAs[Boolean]("served_from_mv")),
      "quarterly rollup was not served from the monthly sketch MV")
    // direct per-quarter one-shot sketches over the base rows: the
    // VecSum of stored monthly vectors must be bit-identical, so the
    // estimates (and counts) must match exactly
    import org.apache.spark.sql.expressions.Window
    import graft.functions.QuantileSketchAgg
    import spark.implicits._
    val direct = graft.Tables.load(spark, SF, "lineitem")
      .groupBy(col("l_returnflag"),
        date_trunc("quarter", col("l_shipdate")).cast("date").as("quarter"))
      .agg(QuantileSketchAgg.quantile_sketch(
        round(col("l_extendedprice") * 100).cast("long")).as("sk"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("quarter"), col("n"),
        posexplode(col("sk")).as(Seq("idx", "cnt")))
      .filter(col("cnt") > 0)
      .withColumn("width", expr(QuantileSketchAgg.widthSql))
      .withColumn("mid", expr(QuantileSketchAgg.midSql))
      .withColumn("cum", sum(col("cnt"))
        .over(Window.partitionBy("l_returnflag", "quarter").orderBy("idx")))
      .join(broadcast(Seq(0.5, 0.9).toDF("q")),
        col("cum") >= ceil(col("q") * col("n")))
      .groupBy("l_returnflag", "quarter", "q")
      .agg(min(col("mid")).as("est_cents"), max(col("n")).as("n_rows"))
      .select(col("l_returnflag"), col("quarter"), col("q"),
        (col("est_cents").cast("double") / 100.0).as("est_value"),
        col("n_rows"))
      .orderBy("l_returnflag", "quarter", "q")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getDouble(3), r.getLong(4))).toSeq ==
      direct.map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getDouble(3), r.getLong(4))).toSeq)
  }

  test("matview_kmv_rewrite: per-flag KMV served by k-bounded union of " +
      "stored monthly sketches, bit-identical to the one-shot sketch") {
    import graft.functions.KmvAgg
    import graft.functions.Mix64.mix64
    val rows = graft.queries.Lifecycle.matviewKmvRewrite(spark, SF)
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Boolean]("served_from_mv")),
      "per-flag KMV query was not served from the sketch MV")
    // direct one-shot sketch over the base rows: n_sketch + checksum
    // must match the merged-monthly path exactly
    val direct = graft.Tables.load(spark, SF, "lineitem")
      .groupBy("l_returnflag")
      .agg(KmvAgg.kmv_sketch(
        shiftrightunsigned(mix64(col("l_orderkey")), 1)).as("sk"))
      .select(col("l_returnflag"), size(col("sk")).as("n_sketch"),
        expr("aggregate(sk, CAST(0 AS BIGINT), (a, x) -> a ^ x)")
          .as("h_checksum"))
      .orderBy("l_returnflag")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1), r.getLong(3)))
      .toSeq == direct.map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2))).toSeq)
  }

  test("matview_hll_rewrite: per-flag HLL served by element-wise max of " +
      "stored monthly registers, bit-identical to the one-shot sketch") {
    import graft.functions.HllAgg
    import graft.functions.Mix64.mix64
    val rows = graft.queries.Lifecycle.matviewHllRewrite(spark, SF)
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Boolean]("served_from_mv")),
      "per-flag HLL query was not served from the sketch MV")
    // direct one-shot registers over the base rows: empty-register count
    // + position-weighted checksum must match the merged-monthly path
    // exactly (the max-merge identity end to end)
    val direct = graft.Tables.load(spark, SF, "lineitem")
      .groupBy("l_returnflag")
      .agg(HllAgg.hll_sketch(
        shiftrightunsigned(mix64(col("l_orderkey")), 1)).as("regs"))
      .select(col("l_returnflag"),
        HllAgg.nZero("regs").as("n_zero"),
        HllAgg.regChecksum("regs").as("reg_checksum"))
      .orderBy("l_returnflag")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSeq == direct.map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2))).toSeq)
  }

  test("CMS sketches re-aggregate through the rewrite: a coarser-grain " +
      "CMS query is served by vector-summing the stored fine sketches") {
    import graft.functions.CmsAgg
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvcms")
      .enableAutoRewrite()
    val seeds = Seq(0x9e3779b97f4a7c15L, 0x5851f42d4c957f2dL)
    def grain(cs: String*) = graft.Tables.load(spark, SF, "lineitem")
      .groupBy(cs.map(col): _*)
      .agg(CmsAgg.cms(col("l_suppkey").cast("long"), seeds, 1024).as("cms"))
    val direct = grain("l_returnflag")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    m.create("mv_cms_fine", grain("l_returnflag", "l_linestatus"))
    val q = grain("l_returnflag")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("mv_cms_fine") &&
      plan.contains("graft_vec_sum"), s"no CMS rewrite in plan:\n$plan")
    val got = q.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got == direct)
    m.dropCascade("mv_cms_fine")
  }

  test("MV-on-MV chaining: a coarse MV created under the rule is captured " +
      "over the fine MV and still serves base-table queries through it") {
    // creating mv_chain_coarse while mv_chain_fine is registered makes
    // the rule answer the coarse DEFINING query from the fine MV — so the
    // registry holds coarse's plan OVER THE FINE RELATION, not over
    // lineitem. A later base-table query at the coarse grain must still
    // converge to the coarse MV: pass 1 rewrites base -> fine, pass 2
    // recognizes the fine-relation aggregate as coarse's defining and
    // lands on the coarse scan. This chain is load-bearing: it is how
    // matview_cost_choice's narrow path resolves, and it constrains the
    // count rollup to stay a bare re-aggregable Sum on grouped shapes.
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvchain")
      .enableAutoRewrite()
    val li = graft.Tables.load(spark, SF, "lineitem")
    m.create("mv_chain_fine",
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n")))
    m.create("mv_chain_coarse",
      li.groupBy("l_returnflag").agg(count(lit(1)).as("n")))
    val q = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("mv_chain_coarse") && !plan.contains("lineitem.parquet"),
      s"base-table query did not chain to the coarse MV:\n$plan")
    val direct = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // values through the chain equal the direct recompute — compare the
    // rewritten result against the same aggregation collected above via
    // the same (still rewritten) plan's output, then against storage
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    m.deregisterAll()
    val unrewritten = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == unrewritten && direct == unrewritten)
    m.dropCascade("mv_chain_coarse")
    m.dropCascade("mv_chain_fine")
  }

  test("zero-match global rollups: count coalesces to 0; counter-sketch " +
      "rollups refuse the global grain (empty-vs-zero-vector divergence)") {
    import graft.functions.CmsAgg
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvempty")
      .enableAutoRewrite()
    val seeds = Seq(0x9e3779b97f4a7c15L, 0x5851f42d4c957f2dL)
    val fine = graft.Tables.load(spark, SF, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        CmsAgg.cms(col("o_custkey").cast("long"), seeds, 1024).as("cms"))
    m.create("mv_empty_fine", fine)
    // count(*) under a filter matching nothing: the rollup rewrite fires
    // (sum of stored per-group counts) and must COALESCE the zero-group
    // sum back to the exact count semantics — 0, not NULL
    val q = graft.Tables.load(spark, SF, "orders")
      .filter(col("o_orderpriority") === "9-NO-SUCH")
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("mv_empty_fine"),
      s"count rollup did not rewrite:\n$plan")
    val row = q.collect().head
    assert(!row.isNullAt(0) && row.getLong(0) == 0L)
    // a GLOBAL counter-sketch rollup must NOT rewrite: over zero rows the
    // one-shot sketch is its fixed-geometry zero vector while VecSum's
    // empty sentinel evaluates to [] — the grouped grain (covered by the
    // CMS re-aggregation test above) is the only provably-exact one
    val qs = graft.Tables.load(spark, SF, "orders")
      .filter(col("o_orderpriority") === "9-NO-SUCH")
      .agg(CmsAgg.cms(col("o_custkey").cast("long"), seeds, 1024).as("cms"))
    val plan2 = qs.queryExecution.executedPlan.toString
    assert(!plan2.contains("graft_vec_sum"), plan2)
    val v = qs.collect().head.getSeq[Long](0)
    assert(v.length == 2 * 1024 && v.forall(_ == 0L))
    m.dropCascade("mv_empty_fine")
  }

  test("after drop, the rewrite no longer fires") {
    val m = new Materializer(spark, s"${TestSpark.scratch}/mvrw3")
      .enableAutoRewrite()
    m.create("mv_rev_tmp", revenueByPriority)
    m.dropCascade("mv_rev_tmp")
    val optimized = revenueByPriority.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("mv_rev_tmp"), optimized)
  }
}
