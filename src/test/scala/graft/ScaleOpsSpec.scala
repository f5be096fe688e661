package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.matview.Materializer
import graft.operators.SaltedJoin

/** Scale-machinery specs: skew salting and bucketed co-located joins. */
class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  test("salted join returns exactly the rows of the plain join") {
    val orders = graft.Tables.load(spark, SF, "orders")
    val customer = graft.Tables.load(spark, SF, "customer")
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey")
    val salted = SaltedJoin.saltedInner(orders, customer,
        "o_custkey", "c_custkey", salts = 8)
      .select("o_orderkey", "c_custkey")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == plain.count())
  }

  test("salted join matches plain join on a genuinely hot key") {
    import spark.implicits._
    // key 0 holds ~80% of the rows — well past any hot threshold
    val skewed = spark.range(20000)
      .select(when(col("id") % 10 < 8, 0L).otherwise(col("id") % 500).as("k"),
        col("id").as("v"))
    val dim = spark.range(500).select(col("id").as("dk"),
      (col("id") * 3).as("w"))
    val plain = skewed.join(dim, col("k") === col("dk"))
      .select("k", "v", "w")
    val salted = SaltedJoin.saltedInner(skewed, dim, "k", "dk", salts = 8)
      .select("k", "v", "w")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == plain.count())
    // auto-derived salt count: same rows
    val auto = SaltedJoin.saltedInner(skewed, dim, "k", "dk", salts = 0)
      .select("k", "v", "w")
    assert(auto.exceptAll(plain).isEmpty && plain.exceptAll(auto).isEmpty)
  }

  test("operators refuse inputs carrying their reserved scratch names " +
      "instead of silently clobbering the caller's column") {
    import spark.implicits._
    val withSalt = Seq((1L, 2L)).toDF("k", "__salt")
    val plainK = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SaltedJoin.saltedInner(withSalt, plainK, "k", "k", salts = 4)
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.saltedInner(plainK, withSalt, "k", "k", salts = 4)
    }
    val withBin = Seq((1L, 0L, 5L)).toDF("p", "__bin", "x")
    intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.pointInInterval(
        withBin, "p", Seq((0L, 9L)).toDF("s", "e"), "s", "e", 4L)
    }
    val withRank = Seq((1L, 2L)).toDF("k", "__rank_pid")
    intercept[IllegalArgumentException] {
      graft.operators.Ranks.rowNumberByRange(withRank, 4, Seq(col("k")), "rn")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Ranks.prefixMaxByRange(
        withRank, 4, Seq(col("k")), col("k"), "pm")
    }
    // ReferentialActions (r15, the r14-ADVICE gap): a child already
    // carrying __deleted or __ra_* would be clobbered by onDeleteSet /
    // onUpdateCascade's scratch machinery
    val withDel = Seq((1L, true)).toDF("fk", "__deleted")
    val keys = Seq(Tuple1(1L)).toDF("pk")
    intercept[IllegalArgumentException] {
      graft.ingest.ReferentialActions.onDeleteSet(
        withDel, Seq("fk"), keys, lit(null))
    }
    val withRa = Seq((1L, 2L)).toDF("fk", "__ra_old")
    intercept[IllegalArgumentException] {
      graft.ingest.ReferentialActions.onUpdateCascade(
        withRa, "fk", Seq((1L, 2L)).toDF("o", "n"))
    }
  }

  test("RangeJoin binning handles reserved-word and dotted column names " +
      "(r14 ADVICE: raw names interpolated into expr() SQL)") {
    import spark.implicits._
    // 'end' is a SQL reserved word; 'event.ts' needs quoting
    val pts = Seq(5L, 12L).toDF("end")
    val ivs = Seq((0L, 10L), (10L, 20L)).toDF("start", "event.ts")
    val out = graft.operators.RangeJoin.pointInInterval(
      pts, "end", ivs, "start", "event.ts", 4L)
    assert(out.count() == 2)
    assert(out.select(col("end"), col("start")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((5L, 0L), (12L, 10L)))
  }

  test("same-bucketed tables join without a shuffle exchange") {
    val m = new Materializer(spark, s"${TestSpark.scratch}/bucketed")
    val orders = graft.Tables.load(spark, SF, "orders")
    val li = graft.Tables.load(spark, SF, "lineitem")
    m.createBucketed("b_orders", orders, Seq("o_orderkey"), 4)
    m.createBucketed("b_lineitem", li, Seq("l_orderkey"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = m.table("b_lineitem").join(m.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val qe = joined.queryExecution
      assert(joined.count() == li.count())
      val p = qe.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffled:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("as-of join: every matched click is at or before its purchase") {
    val df = graft.queries.Extras.joinAsof(spark, SF)
    assert(df.count() > 0)
    assert(df.filter(col("click_ts") > col("ts")).count() == 0)
    // purchases before any click have null matches, others the latest click
    val firstClick = graft.Tables.load(spark, SF, "events")
      .filter(col("event_type") === "click")
      .groupBy("user_id").agg(min("ts").as("first_click"))
    val bad = df.join(firstClick, "user_id")
      .filter(col("click_ts").isNull && col("ts") >= col("first_click"))
    assert(bad.count() == 0)
  }

  test("shuffle-shard: per-epoch permutation, balanced shards, epoch-independent orders") {
    val rows = graft.ext.TextOps.corpusShuffleShard(spark, SF).collect()
    val docs = graft.Tables.load(spark, SF, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // each epoch is a full permutation: every doc exactly once
    Seq(0, 1).foreach { e =>
      val ep = rows.filter(_.getInt(0) == e)
      assert(ep.map(_.getLong(1)).toSet == docs)
      assert(ep.length == docs.size)
      // shards balanced within 1 (round-robin on the global position)
      val sizes = ep.groupBy(_.getLong(2)).map(_._2.length)
      assert(sizes.max - sizes.min <= 1, s"epoch $e shard sizes $sizes")
      // (shard, pos_in_shard) is a dense injective addressing
      val addr = ep.map(r => (r.getLong(2), r.getLong(3)))
      assert(addr.distinct.length == addr.length)
    }
    // the two epochs order the corpus differently (salted hash): the
    // within-shard sequences cannot coincide for 500 docs
    def orderOf(e: Int) = rows.filter(_.getInt(0) == e)
      .sortBy(r => (r.getLong(2), r.getLong(3))).map(_.getLong(1)).toSeq
    assert(orderOf(0) != orderOf(1))
  }
}
