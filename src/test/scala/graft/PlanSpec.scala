package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** Physical-plan hygiene: the plans a 100 TB deployment needs, asserted at
  * test scale — filter/projection pushdown into the parquet scan, broadcast
  * joins for dimensions, top-K as TakeOrderedAndProject (the PG top-N
  * heapsort analog, SURVEY §2.6 O2), no cartesian products where a
  * broadcast should be, and wide whole-stage-codegen coverage.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter_conjunct pushes predicates into the parquet scan") {
    val p = plan(Relational.filterConjunct(spark, SF))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("In(l_returnflag"), p)
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("GreaterThanOrEqual(l_shipdate"), p)
  }

  test("scans prune columns: projection-only query reads only its columns") {
    val p = plan(Relational.projectRename(spark, SF))
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("c_nationkey"), s"read an unused column:\n$p")
  }

  test("dimension joins broadcast (5-way join has no shuffle on dims)") {
    val p = plan(Relational.joinNatural5Way(spark, SF))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("5-way join pre-aggregates lineitem BELOW the fact-fact join") {
    // the partial agg must sit under the orderkey join so the join moves
    // |orders| rows, not |lineitem| — regression pin for the pushed-down
    // aggregation rewrite
    val df = Relational.joinNatural5Way(spark, SF)
    val text = df.queryExecution.optimizedPlan.toString
    val aggIdx = text.indexOf("Aggregate [l_orderkey")
    val joinIdx = text.indexOf("Join Inner")
    assert(aggIdx >= 0, s"no per-orderkey partial aggregate:\n$text")
    assert(joinIdx >= 0 && joinIdx < aggIdx,
      s"partial aggregate is not below the join:\n$text")
  }

  test("top-K plans as TakeOrderedAndProject, never a full global sort") {
    val p = plan(Relational.topkOrderLimit(spark, SF))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("scalar-aggregate cross join stays a broadcast nested loop") {
    val p = plan(Relational.joinThetaScalar(spark, SF))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("whole-stage codegen covers the aggregation pipeline") {
    // AQE finalizes the plan only on execution; codegen spans render as
    // "*(n)" prefixes in tree form and as WholeStageCodegen in formatted.
    val df = Relational.aggSumGroup3(spark, SF)
    val qe = df.queryExecution
    df.collect()
    // codegen'd operators carry the "* " marker in the final plan
    val p = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("* HashAggregate") && p.contains("* Filter"), p)
  }

  test("semi-join against LIMIT-1 subquery broadcasts the single row") {
    val p = plan(Relational.joinSemiInSubquery(spark, SF))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("embedding dedup has no cartesian product in the physical plan") {
    val p = plan(graft.ext.Dedup.dedupEmbeddingCosine(spark, SF))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"embedding dedup planned an all-pairs join:\n$p")
  }

  test("range join plans as an equi-join on bins, never a nested loop") {
    val p = plan(graft.queries.Extras.joinRange(spark, SF))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$p")
  }

  test("stratified sample is a map-side filter: no shuffle before the agg") {
    // only the aggregation + output-sort exchanges — the sampling itself
    // is a Filter directly over the scan
    val p = plan(graft.queries.Extras.sampleStratified(spark, SF))
    assert(p.split("Exchange").length - 1 <= 2, s"extra shuffle:\n$p")
    assert("Filter \\(shiftrightunsigned\\(graft_mix64".r
      .findFirstIn(p).isDefined, s"sample filter missing from plan:\n$p")
  }

  test("corpus clean plan does not hint-broadcast the cluster relation") {
    // the near-dup cluster relation is corpus-proportional; the logical
    // plan must not carry a broadcast hint on it (AQE may still choose a
    // runtime broadcast at test scale from actual sizes — that's its call)
    val lp = graft.ext.Dedup.corpusCleanPlan(spark, SF)
      .queryExecution.analyzed.toString
    assert(!lp.contains("UnresolvedHint") && !lp.contains("ResolvedHint"),
      s"broadcast hint found in corpus_clean_plan:\n$lp")
  }

  test("simhash signatures are a pure projection: no aggregate, no token explode") {
    // the one-pass SimHashSig kernel must keep the signature stage out of
    // any aggregation and free of any Generate (a token-level explode
    // would reintroduce the r3 shape)
    val sp = plan(graft.ext.Dedup.simhashSignatures(spark, SF))
    assert(sp.contains("graft_simhash_sig"), s"native kernel missing:\n$sp")
    assert(!sp.contains("ObjectHashAggregate") && !sp.contains("SortAggregate"),
      s"signature stage fell back to an object/sort aggregate:\n$sp")
    assert(!sp.contains("Generate"), s"unexpected explode in signatures:\n$sp")
  }

  test("simhash candidate join is key-equi over checkpointed signatures") {
    // full pipeline: the probe/index explodes are the only Generates
    // (one per self-join side), the join is an equi hash join on the
    // packed block key (never a nested-loop/cartesian), and the
    // signature relation is checkpointed (no simhash_sig recompute
    // inside the join lineage, where isnotnull pushdown would run the
    // kernel four times over the corpus)
    val p = plan(graft.ext.Dedup.dedupSimhash(spark, SF))
    assert(p.split("Generate").length - 1 <= 2,
      s"unexpected extra Generate in simhash plan:\n$p")
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      s"candidate join degenerated to a product:\n$p")
    assert(!p.contains("graft_simhash_sig"),
      s"signature kernel recomputed inside the join lineage:\n$p")
  }

  test("z-order layout write is fully distributed: no window, no global sort") {
    // the file assignment is a pure projection (top 5 z bits) and the
    // write clustering a hash exchange on the file id — a single-partition
    // ntile window here would funnel the whole table through one task
    val zed = graft.queries.Lifecycle.zorderAssign(spark, SF)
    val p = plan(graft.queries.Lifecycle.zorderWritePlan(zed))
    assert(!p.contains("Window"), s"window in the z-order write plan:\n$p")
    assert(!p.contains("Sort "), s"sort in the z-order write plan:\n$p")
    assert(p.contains("hashpartitioning(zfile"),
      s"write clustering is not a distributed hash exchange:\n$p")
  }

  test("orderby_nulls ranks without any single-partition exchange or window") {
    // the two-phase rank (range partition + narrow local scan + tiny
    // offset join) must leave no window at all and no SinglePartition
    // exchange — the plan shape that survives pointing the key at a fact
    // table. The range exchange itself runs eagerly inside the rank's
    // checkpoint; RanksSpec pins the staging plan (exactly one exchange,
    // the range one).
    val p = plan(graft.queries.Extras.orderbyNulls(spark, SF))
    assert(!p.contains("SinglePartition"),
      s"single-partition exchange in orderby_nulls plan:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window ["),
      s"window survived in orderby_nulls plan:\n$p")
  }

  test("stream-mv chunk staging is distributed: range exchange, no window") {
    // the arrival-fixture chunker must never funnel the events table
    // through a global-sort ntile: chunk order comes from a range
    // repartition, the tag from the partition id (both fully distributed)
    val raw = graft.Tables.load(spark, SF, "events")
    val p = plan(graft.streaming.StreamingOps.stageChunks(raw))
    assert(!p.contains("Window"), s"window in the chunk staging plan:\n$p")
    assert(!p.contains("SinglePartition"),
      s"single-partition exchange in the chunk staging plan:\n$p")
    assert(p.contains("rangepartitioning(ts"),
      s"chunk staging is not a range exchange on ts:\n$p")
  }

  test("graph ops stay keyed: no cartesian product, no single partition") {
    // triangle counting and the BFS loop must be pure keyed-join plans —
    // a cartesian product or a single-partition exchange would be the
    // all-pairs / global-sort failure mode at scale
    Seq(
      graft.ext.Dedup.graphTriangleCount(spark, SF),
      graft.ext.Dedup.recursiveCteReach(spark, SF)
    ).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"),
        s"cartesian product in graph plan:\n$p")
      assert(!p.contains("SinglePartition") ||
        p.contains("TakeOrderedAndProject"),
        s"single-partition exchange in graph plan:\n$p")
    }
  }

  test("pagerank superstep: edge corpus probed in place — shuffle-hash " +
      "join, no SMJ edge re-sort, no exchange above the edge scan (r16)") {
    // the 100 TB iteration contract (VERDICT r15 item 5): per superstep,
    // ONLY |nodes|-sized relations move. The checkpointed edges'
    // HashPartitioning(src) must satisfy the contrib join in place —
    // an Exchange above the edge scan, or a SortMergeJoin (re-sorting
    // 112M edge rows per round at sf10), is the regression this pins.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    graft.Tables.withConf(spark, "spark.sql.adaptive.enabled" -> "false") {
      val SER = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      val (edges, nodes, deg, nNodes) = graft.ext.Dedup.pagerankRelations(
        graft.ext.Dedup.pagerankEdges0(spark, SF), SER)
      val ranks = nodes.withColumn(
        "rank", org.apache.spark.sql.functions.lit(1.0 / nNodes))
      val step = graft.ext.Dedup.pagerankStep(edges, nodes, deg, ranks, nNodes)
      val exec = step.queryExecution.executedPlan
      // the edge scan is the RDDScanExec emitting exactly (src, dst) —
      // nodes/deg/ranks checkpoints have different shapes
      def hasEdgeScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collect { case s: org.apache.spark.sql.execution.RDDScanExec
          if s.output.map(_.name) == Seq("src", "dst") => s }.nonEmpty
      // no Sort may run at EDGE cardinality: walk each SortExec's input,
      // stopping at aggregates (their output is |nodes|-sized) — a sort
      // that reaches the edge scan without crossing one is the full
      // per-round edge re-sort this pins against (the final |nodes|-sized
      // SMJ above the dst aggregate is fine and expected)
      def edgeBeforeAgg(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p match {
          case s: org.apache.spark.sql.execution.RDDScanExec =>
            s.output.map(_.name) == Seq("src", "dst")
          case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
            false
          case other => other.children.exists(edgeBeforeAgg)
        }
      val sorts = exec.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }
      assert(!sorts.exists(s => edgeBeforeAgg(s.child)),
        s"a sort runs at edge cardinality:\n$exec")
      // the contrib join (streamed side scans the checkpointed edges) is
      // a shuffle-hash join with ZERO exchange on the edge side
      val shj = exec.collect { case j: ShuffledHashJoinExec => j }
      val edgeProbe = shj.filter { j =>
        hasEdgeScan(j.left) &&
        j.left.collect { case e: ShuffleExchangeExec => e }.isEmpty
      }
      assert(edgeProbe.nonEmpty,
        s"edge corpus not probed in place (no exchange-free shuffle-hash " +
          s"probe of the edge scan):\n$exec")
    }
  }

  test("triangle sketch: one keyed aggregate, no window, no join before the pair build") {
    // the sketch's whole point is plan shape: the bottom-k fold happens
    // INSIDE the part-keyed aggregate (TopKAgg partials map-side), pairs
    // are generated row-locally — so the plan must contain no Window, no
    // cartesian product, and no single-partition exchange
    val p = plan(graft.ext.Dedup.graphTriangleSketch(spark, SF))
    assert(!p.contains("WindowExec") && !p.contains("Window ["),
      s"window in triangle-sketch plan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cartesian product in triangle-sketch plan:\n$p")
    assert(!p.contains("SinglePartition") ||
      p.contains("TakeOrderedAndProject"),
      s"single-partition exchange in triangle-sketch plan:\n$p")
  }

  test("triangle sketch build: distinct, hub cap, and top-k cluster on one p-exchange") {
    // the r8 one-exchange restructure: repartition(p) up front, then the
    // (c, p) distinct, the hub-cap rollup, and the TopKAgg sketch all run
    // partition-local (HashPartitioning(p) satisfies ClusteredDistribution
    // by the subset rule). Regression pin: the only hashpartitioning
    // exchanges are the p-repartition and the final (u, v) pair rollup —
    // a third would mean EnsureRequirements re-shuffled the pipeline and
    // the partial aggregate maps are back to spanning the full part
    // domain (the sort-fallback/spill shape that diverged on the r7
    // driver box).
    val p = plan(graft.ext.Dedup.coPurchaseEdgesSketch(spark, SF))
    val nHash = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nHash <= 2, s"expected <= 2 hash exchanges (p, pair rollup), got $nHash:\n$p")
    assert("hashpartitioning\\(p#".r.findAllIn(p).size >= 1,
      s"no p-partitioned exchange in sketch-build plan:\n$p")
  }

  test("point lookup prunes buckets: <= 3 of 16 buckets scanned") {
    // the index-scan analog: the 3-key IN must turn into a pruned
    // bucketed scan, not a full table read
    graft.queries.Lifecycle.withAutoBucketedScanDisabled(spark) {
      val p = plan(graft.queries.Lifecycle.bucketLookupRaw(spark, SF))
      val m = "SelectedBucketsCount: (\\d+) out of 16".r.findFirstMatchIn(p)
      assert(m.isDefined, s"no bucket pruning in lookup plan:\n$p")
      val selected = m.get.group(1).toInt
      assert(selected <= 3, s"lookup scanned $selected of 16 buckets:\n$p")
    }
  }

  test("shuffle-shard ranks through the range scan: no window anywhere") {
    // the per-epoch global position must come from the two-phase range
    // rank — a Window (empty partition spec) here would be the global
    // sort that single-threads a 100 TB corpus
    val p = plan(graft.ext.TextOps.corpusShuffleShard(spark, SF))
    assert(!p.contains("WindowExec") && !p.contains("Window ["),
      s"window survived in shuffle-shard plan:\n$p")
    assert(p.contains("rangepartitioning("),
      s"no range exchange in shuffle-shard plan:\n$p")
  }

  test("markov/mann-whitney windows are keyed, never empty-partitioned") {
    // both keys run their window over a PARTITION BY key (user_id /
    // event_type) — an empty partition spec would be the 100 TB
    // global-sort trap the bench log flags as "No Partition Defined"
    Seq(
      graft.ext.EventOps.eventsMarkovTransitions(spark, SF),
      graft.queries.Extras.statMannWhitney(spark, SF)
    ).foreach { df =>
      // inspect the operator, not the plan string: every Window node
      // must carry a non-empty PARTITION BY
      val emptySpec = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(emptySpec.isEmpty,
        s"window with empty partition spec:\n${emptySpec.mkString}")
      val p = plan(df)
      assert(!p.contains("SinglePartition"),
        s"single-partition exchange:\n$p")
    }
  }

  test("ANALYZE flips the same join from sort-merge to broadcast (CBO)") {
    // the reference's VACUUM ANALYZE plan flip, as executable evidence:
    // identical query, stats presence is the only variable
    val r = graft.queries.Lifecycle.statsJoinFlip(spark, SF).head()
    assert(r.getString(0) == "sort_merge_join", r.toString)
    assert(r.getString(1) == "broadcast_hash_join", r.toString)
    assert(r.getBoolean(3), r.toString)
  }

  test("explain_analyze captures nonzero operator times") {
    // wall-clock values can't be value-pinned by the oracle; assert here
    // that the instrumented walk measures REAL time — the broadcast
    // exchange must have spent measurable collect/build/broadcast time
    val raw = graft.queries.Lifecycle.explainAnalyzeRaw(spark, SF)
    val timedOps = raw.filter(_._4.isDefined)
    assert(timedOps.nonEmpty, raw.toString)
    // assert across ALL timed operators, not one: the broadcast
    // exchange's ms-resolution metrics can all legitimately round to 0
    // on a warm run, while the sort/shuffle ns-resolution metrics can't
    // measure a real execution as zero everywhere
    assert(timedOps.map(_._5).sum > 0,
      s"no operator measured any time: $raw")
  }

  test("text_repetition moves no data: the only exchange is the output sort") {
    // the repetition metrics fold per row; nothing may shuffle besides
    // the deterministic output ordering
    val p = plan(graft.ext.TextOps.textRepetition(spark, SF))
    assert(!p.contains("Window"), s"unexpected window:\n$p")
    assert(!p.contains("HashAggregate"), s"unexpected aggregate:\n$p")
    assert(!p.contains("hashpartitioning"), s"unexpected shuffle:\n$p")
  }

  test("block-ratio and diversity-cap plans stay keyed: no single partition") {
    val pb = plan(graft.ext.Dedup.dedupBlockRatio(spark, SF))
    assert(!pb.contains("Window") && !pb.contains("CartesianProduct"), pb)
    assert(!pb.contains("SinglePartition"), s"global stage in block ratio:\n$pb")
    val pd = plan(graft.ext.Similarity.corpusDiversityCap(spark, SF))
    assert(!pd.contains("SinglePartition"),
      s"global stage in diversity cap:\n$pd")
  }

  test("span coverage: native kernel, broadcast dup set, keyed window only") {
    val p = plan(graft.ext.Dedup.dedupSpanCoverage(spark, SF))
    assert(p.contains("graft_word_gram_hashes"), s"native hasher missing:\n$p")
    assert(!p.contains("ArrayTransform") && !p.contains("lambdafunction"),
      s"interpreted higher-order function in the span stream:\n$p")
    assert(!p.contains("SinglePartition"), s"global stage:\n$p")
    // the duplicated-span set must broadcast back onto the span stream —
    // a shuffled hit join would move the whole stream a second time
    assert(p.contains("BroadcastHashJoin"), s"dup-set join not broadcast:\n$p")
  }

  test("shingle streams use the native one-pass hasher, no HOF fallback") {
    // higher-order transform lambdas are CodegenFallback; the dedup
    // shingle stream must plan the WordGramHashes kernel instead
    val p = plan(graft.ext.Dedup.dedupNgramJaccard(spark, SF))
    assert(p.contains("graft_word_gram_hashes"), s"native hasher missing:\n$p")
    assert(!p.contains("ArrayTransform") && !p.contains("lambdafunction"),
      s"interpreted higher-order function in the shingle stream:\n$p")
  }

  test("profile_table never plans an Expand: per-column rollups, not " +
      "fused multi-column countDistinct (r13 review fix)") {
    // multiple distinct aggregates over different expressions plan as an
    // Expand that multiplies EVERY input row once per distinct group —
    // the hazard class that OOM'd the agg_hll_distinct sf100 probe
    val p = plan(graft.queries.Extras.profileTable(spark, SF))
    assert(!p.contains("Expand"), s"Expand in the profile plan:\n$p")
  }

  test("join_range_auto restores the session binWidth and materializes " +
      "inside its conf scope (r13 review fix)") {
    val key = "spark.graft.rangeJoin.binWidth"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "auto")
      graft.queries.Extras.joinRangeAuto(spark, SF).collect()
      assert(spark.conf.get(key) == "auto",
        "join_range_auto leaked its binWidth override into the session")
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
