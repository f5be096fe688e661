package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

class SimilaritySpec extends AnyFunSuite {

  test("quantized ANN recovers the exact top-k through the int8 shortlist") {
    import TestSpark.{spark, SF}
    val exact = graft.ext.Similarity.similarityTopkBruteforce(spark, SF)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = graft.ext.Similarity.similarityAnnQuantized(spark, SF)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = quant.intersect(exact).size.toDouble / exact.size
    // int8 reconstruction error is ~1e-3 of the score scale while the
    // 32-wide shortlist margin is orders larger — recall should be total
    assert(recall >= 0.95, s"quantized recall $recall")
  }
  import TestSpark.{spark, SF}

  private lazy val brute = Similarity.similarityTopkBruteforce(spark, SF).collect()
  private lazy val ann = Similarity.similarityAnnLsh(spark, SF).collect()

  test("brute force: 5 ranked neighbors per query, scores non-increasing") {
    val byQuery = brute.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.values.foreach { rows =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_.getInt(2))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(sorted.map(_.getInt(2)).toSeq == Seq(1, 2, 3, 4, 5))
    }
  }

  test("ANN recall@5 vs brute force is useful on this corpus") {
    val bSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val aSet = ann.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bSet.count(aSet.contains).toDouble / bSet.size
    assert(recall >= 0.3, s"recall@5 = $recall")
  }

  test("ANN never invents scores: its pairs score <= brute-force kth score") {
    val bruteKth = brute.groupBy(_.getLong(0)).map { case (q, rows) =>
      q -> rows.map(_.getAs[Double]("score")).min
    }
    ann.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val maxAnn = rows.map(_.getAs[Double]("score")).max
      val bruteBest = brute.filter(_.getLong(0) == q).map(_.getAs[Double]("score")).max
      assert(maxAnn <= bruteBest + 1e-12)
    }
  }

  test("IVF: recall vs brute force, deterministic, probes bound the work") {
    val ivf = Similarity.similarityIvf(spark, SF).collect()
    val bSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val iSet = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bSet.count(iSet.contains).toDouble / bSet.size
    assert(recall >= 0.3, s"IVF recall@5 = $recall")
    // two runs identical (deterministic quantizer)
    val again = Similarity.similarityIvf(spark, SF).collect()
    assert(ivf.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("IVF-PQ: candidates subset IVF's lists, recall useful, deterministic") {
    val pq = Similarity.similarityIvfPq(spark, SF).collect()
    val bSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val pSet = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bSet.count(pSet.contains).toDouble / bSet.size
    // PQ compresses the first stage but the coarse probe is identical to
    // IVF's, and the 32-wide exact rerank recovers ADC ranking noise —
    // recall should track IVF's (1.0 at this SF), not degrade below it
    val ivfSet = Similarity.similarityIvf(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRecall = bSet.count(ivfSet.contains).toDouble / bSet.size
    assert(recall >= ivfRecall - 0.2, s"IVF-PQ recall@5 = $recall vs IVF $ivfRecall")
    assert(recall >= 0.3, s"IVF-PQ recall@5 = $recall")
    // deterministic end-to-end (seeded codebooks, ordered folds)
    val again = Similarity.similarityIvfPq(spark, SF).collect()
    assert(pq.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("hyperplanes are deterministic across invocations") {
    val a = Similarity.hyperplanes()
    val b = Similarity.hyperplanes()
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq)
  }

  test("IVF trains identically on a gapped vec_id space — dense-rank " +
      "seeding replaces the r14 contract refusal (r15)") {
    // the engine seeds with the first K rows by vec_id labeled by
    // POSITION (the dense rank); since r15 the oracles replay exactly
    // that (ROW_NUMBER() OVER (ORDER BY vec_id) - 1), so a filtered or
    // resharded corpus trains green with the SAME quantizer as its
    // densified twin instead of failing a require.
    val spark2 = TestSpark.spark
    import spark2.implicits._
    def emb(i: Int): Array[Float] =
      Array.tabulate(64)(j => 0.1f * ((i % 7) + 1) + 0.01f * (j % 3))
    val dir = java.nio.file.Files.createTempDirectory("ivf_gapped")
    // gapped AND non-uniformly spaced ids (filtered-corpus shape)
    val gappedIds = (0 until 30).map(i => 100L + 7L * i)
    gappedIds.zipWithIndex.map { case (id, i) => (id, emb(i), i % 3) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val (_, gapped, gCents) = Similarity.ivfListsK(spark2, dir.toString, 4)
    // densified twin: same embeddings, ids 0..29
    val dir2 = java.nio.file.Files.createTempDirectory("ivf_contig")
    (0 until 30).map(i => (i.toLong, emb(i), i % 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")
    val (_, contig, cCents) = Similarity.ivfListsK(spark2, dir2.toString, 4)
    // identical refined centroids (labels AND values)...
    assert(gCents.map(_._1).toSeq == cCents.map(_._1).toSeq)
    assert(gCents.map(_._2.toSeq).toSeq == cCents.map(_._2.toSeq).toSeq)
    // ...and identical assignments row-for-row under the id mapping
    val gAsg = gapped.select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val cAsg = contig.select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(gappedIds.zipWithIndex.forall { case (gid, i) =>
      gAsg(gid) == cAsg(i.toLong) })
    assert(gAsg.size == 30 && gCents.nonEmpty)
  }

  test("scaled IVF (r15): corpus-derived geometry, same output contract, " +
      "deterministic, recall useful") {
    val scaled = Similarity.similarityIvfScaled(spark, SF).collect()
    val byQuery = scaled.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.values.foreach { rows =>
      assert(rows.sortBy(_.getInt(2)).map(_.getInt(2)).toSeq ==
        (1 to rows.length) && rows.length <= 5)
    }
    val bSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val sSet = scaled.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bSet.count(sSet.contains).toDouble / bSet.size
    assert(recall >= 0.3, s"scaled-IVF recall@5 = $recall")
    // derived geometry equals the explicit call with the same arithmetic
    // (r16: nprobe = max(2, ceil(1.1 * sqrt(L))) — the recall-parity
    // overdrive, shared via scaledNprobeFor)
    val n = Tables.load(spark, SF, "embeddings").count()
    val nlists = Similarity.nlistsFor(n)
    val nprobe = Similarity.scaledNprobeFor(nlists)
    // the overdrive is live at the gate geometry (L=23 -> 6 probes, not
    // the bare ceil(sqrt) = 5)
    assert(nprobe >= math.ceil(math.sqrt(nlists.toDouble)).toInt)
    val explicit = Similarity.similarityIvfWith(spark, SF, nlists, nprobe)
      .collect()
    assert(scaled.map(_.toSeq).toSeq == explicit.map(_.toSeq).toSeq)
  }

  test("filtered ANN (r15): every neighbor shares its query's label; " +
      "the widened probe recovers the label-filtered exact top-k") {
    import org.apache.spark.sql.functions._
    val out = Similarity.similarityFilteredAnn(spark, SF)
    val lab = Tables.load(spark, SF, "embeddings").select(
      col("vec_id"), col("label"))
    // predicate honored: neighbor label == query label, always
    val joined = out
      .join(lab.select(col("vec_id").as("query_id"),
        col("label").as("ql")), "query_id")
      .join(lab.select(col("vec_id").as("neighbor_id"),
        col("label").as("nl")), "neighbor_id")
    assert(joined.filter(col("ql") =!= col("nl")).isEmpty)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // exact label-filtered brute force as the recall reference
    val e = Tables.load(spark, SF, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"),
        Similarity.norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("label").as("ql"))
    import org.apache.spark.sql.expressions.Window
    val exact = broadcast(q).join(e,
        col("vec_id") =!= col("query_id") && col("label") === col("ql"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (graft.functions.VectorDot.vector_dot(col("qe"), col("embedding")) /
          (col("qn") * col("nrm"))).as("s"))
      .withColumn("rk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("s").desc, col("neighbor_id"))))
      .filter(col("rk") <= 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    // a 10%-selective filter forces the probe to all 16 lists at this
    // corpus size, so the filtered search IS the filtered brute force
    assert(recall >= 0.99, s"filtered-ANN recall@5 = $recall")
  }

  test("conjunctive filtered ANN (r16): both conjuncts honored (label AND " +
      "rank window); widened probe recovers the conjunctive exact top-k") {
    import org.apache.spark.sql.functions._
    val out = Similarity.similarityFilteredAnnConj(spark, SF)
    val emb = Tables.load(spark, SF, "embeddings")
    val n = emb.count()
    // the same rank window the key cuts (contiguous fixture: id == rank-1)
    val ids = emb.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val lo = ids((n / 4).toInt)
    val hi = ids((3 * n / 4).toInt)
    val lab = emb.select(col("vec_id"), col("label"))
    val joined = out
      .join(lab.select(col("vec_id").as("query_id"),
        col("label").as("ql")), "query_id")
      .join(lab.select(col("vec_id").as("neighbor_id"),
        col("label").as("nl")), "neighbor_id")
    // conjunct 1: neighbor label == query label, always
    assert(joined.filter(col("ql") =!= col("nl")).isEmpty)
    // conjunct 2: every neighbor inside the ingestion window
    assert(out.filter(col("neighbor_id") < lo ||
      col("neighbor_id") >= hi).isEmpty)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // exact CONJUNCTIVE brute force as the recall reference
    val e = emb
      .select(col("vec_id"), col("embedding"), col("label"),
        Similarity.norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("label").as("ql"))
    import org.apache.spark.sql.expressions.Window
    val exact = broadcast(q).join(e,
        col("vec_id") =!= col("query_id") && col("label") === col("ql") &&
          col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (graft.functions.VectorDot.vector_dot(col("qe"), col("embedding")) /
          (col("qn") * col("nrm"))).as("s"))
      .withColumn("rk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("s").desc, col("neighbor_id"))))
      .filter(col("rk") <= 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    // the ~5%-selective conjunction widens the probe to all 16 lists at
    // this corpus size, so the filtered search IS the filtered brute
    // force — the recall pin the r15 VERDICT asked for
    assert(recall >= 0.99, s"conjunctive filtered-ANN recall@5 = $recall")
  }

  test("scaled filtered ANN (r17): corpus-derived geometry, label " +
      "conjunct honored, widened probe recovers the label-filtered " +
      "exact top-k, deterministic") {
    import org.apache.spark.sql.functions._
    import TestSpark.{spark, SF}
    val out = Similarity.similarityFilteredAnnScaled(spark, SF)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // determinism (seeded quantizer, exact widening arithmetic)
    assert(Similarity.similarityFilteredAnnScaled(spark, SF)
      .collect().toSeq == rows.toSeq)
    val emb = Tables.load(spark, SF, "embeddings")
    val lab = emb.select(col("vec_id"), col("label"))
    // conjunct: every neighbor shares its query's label
    assert(out
      .join(lab.select(col("vec_id").as("query_id"),
        col("label").as("ql")), "query_id")
      .join(lab.select(col("vec_id").as("neighbor_id"),
        col("label").as("nl")), "neighbor_id")
      .filter(col("ql") =!= col("nl")).isEmpty)
    // recall vs the label-filtered exact top-k: at gate SF the widened
    // probe saturates the scaled list count (lcnt ~ n/|labels| makes
    // ceil(nprobe*n/lcnt) >= L), so the filtered search IS the filtered
    // brute force — the same pin the fixture-geometry key carries
    val e = emb
      .select(col("vec_id"), col("embedding"), col("label"),
        Similarity.norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("label").as("ql"))
    import org.apache.spark.sql.expressions.Window
    val exact = broadcast(q).join(e,
        col("vec_id") =!= col("query_id") && col("label") === col("ql"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (graft.functions.VectorDot.vector_dot(col("qe"), col("embedding")) /
          (col("qn") * col("nrm"))).as("s"))
      .withColumn("rk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("s").desc, col("neighbor_id"))))
      .filter(col("rk") <= 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.99, s"scaled filtered-ANN recall@5 = $recall")
  }

  test("diversity cap: <= 8 per list, contiguous ranks, central-first") {
    val rows = Similarity.corpusDiversityCap(spark, SF).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, v) =>
      val sorted = v.sortBy(_._3)
      assert(sorted.length <= 8)
      assert(sorted.map(_._3).toSeq == (1 to sorted.length))
      // centrality is non-increasing in rank order
      sorted.sliding(2).foreach {
        case Array(hi, lo) => assert(hi._4 >= lo._4)
        case _ =>
      }
    }
    // a capped list only exists where the quantizer put vectors: every
    // kept vec_id is a real embedding row, kept at most once
    assert(rows.map(_._2).distinct.length == rows.length)
  }

  test("dedup_semantic drops only above-threshold vectors, cluster-scoped") {
    import org.apache.spark.sql.functions._
    import TestSpark.{spark, SF}
    val out = Similarity.dedupSemantic(spark, SF)
    assert(out.count() == Tables.load(spark, SF, "embeddings").count())
    // kept is exactly the threshold predicate on the emitted score
    assert(out.filter(
      col("kept") =!= (col("max_sim_lower") < 0.4)).isEmpty)
    // each cluster's lowest vec_id has no lower member: sentinel -1, kept
    val minIds = out.groupBy("cid").agg(min("vec_id").as("vec_id"))
    assert(out.join(minIds, Seq("cid", "vec_id")).filter(
      col("max_sim_lower") =!= -1.0 || !col("kept")).isEmpty)
    // the planted clusters make the operator non-vacuous at gate SF
    assert(out.filter(!col("kept")).count() > 0)
  }

  test("incremental index append: centroids frozen (clustered base version " +
      "unchanged by the append), point probe pruned, facts pinned") {
    import org.apache.spark.sql.functions._
    import TestSpark.{spark, SF}
    val rows = Similarity.similarityIndexAppend(spark, SF).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_versions") == 3L))
    assert(rows.forall(_.getAs[Boolean]("probe_pruned")))
    assert(rows.forall(_.getAs[Boolean]("probe_rows_ok")))
    // frozen-centroid invariant at the STORAGE level: the clustered base
    // version (1) read back AFTER the delta append equals the base slice
    // of the latest version — the append touched no base shard
    val snap = new graft.matview.Snapshots(spark,
      graft.matview.Materializer.defaultScratch + "/ivfidx")
    val t = s"ivf_index_${Tables.dirKey(SF)}"
    val n = Tables.load(spark, SF, "embeddings")
      .agg(max(col("vec_id"))).head().getLong(0) + 1
    val b = 3L * n / 4
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val basePersisted = pairs(snap.read(t, 1))
    val latestBase = pairs(snap.readLatest(t).filter(col("vec_id") < b))
    assert(basePersisted == latestBase && basePersisted.nonEmpty)
    // and the delta really is the rest of the corpus, assigned
    assert(snap.readLatest(t).filter(col("vec_id") >= b).count() == n - b)
  }

  test("index maintenance: delta-fold bounds manifest dirs across " +
      "repeated appends (r15) — read cost flat, nothing lost") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("idx_maint").toString
    val snap = new graft.matview.Snapshots(spark2, root)
    val t = "idx"
    def batch(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i % 4, i.toLong, Array.fill(8)(i.toFloat)))
      .toDF("cid", "vec_id", "embedding")
    snap.commitAppendStats(t, batch(0, 64), Seq("cid"))
    snap.compactClustered(t, "cid", 4, Seq("cid"))
    var folds = 0
    (0 until 6).foreach { k =>
      snap.commitAppendStats(t, batch(64 + 8 * k, 64 + 8 * (k + 1)),
        Seq("cid"))
      if (Similarity.indexMaintain(snap, t, maxDeltas = 2, shards = 4))
        folds += 1
      // the policy's bound: after maintenance the manifest never carries
      // more than shards + maxDeltas dirs, no matter how many appends
      assert(snap.manifestDirs(t, snap.latest(t)) <= 6)
    }
    // 6 appends at maxDeltas=2 fold exactly twice (5,6 pass; 7 folds)
    assert(folds == 2)
    // folding lost nothing
    assert(snap.readLatest(t).count() == 64 + 48)
    // a point probe of the folded layout still prunes to one shard
    val pr = snap.readPrunedEq(t, snap.latest(t), "cid", "1")
    assert(pr.dirsRead < pr.dirsTotal)
    assert(pr.df.filter(org.apache.spark.sql.functions.col("cid") === 1)
      .count() === 112L / 4)
  }

  test("similarity_index_maintain: fold facts pinned, served top-k " +
      "matches the unfolded union") {
    import TestSpark.{spark, SF}
    val rows = Similarity.similarityIndexMaintain(spark, SF).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_folds") == 1L))
    assert(rows.forall(_.getAs[Long]("dirs_latest") == 4L))
    assert(rows.forall(_.getAs[Boolean]("rows_total_ok")))
    assert(rows.forall(_.getAs[Boolean]("probe_pruned")))
    assert(rows.forall(_.getAs[Boolean]("probe_rows_ok")))
    // folding is a pure layout move: per query, 5 ranked neighbors
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.values.foreach { v =>
      assert(v.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    }
  }

  test("index maintain on a GAPPED vec_id space (r16, r15 ADVICE): rank " +
      "cuts keep every delta batch non-empty and rows_total_ok counts " +
      "true rows, so the pinned fold facts hold off the contiguous fixture") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    def emb(i: Int): Array[Float] =
      Array.tabulate(64)(j => 0.1f * ((i % 7) + 1) + 0.01f * ((i + j) % 5))
    val dir = java.nio.file.Files.createTempDirectory("idx_gapped")
    // gapped, non-uniform ids (queries 0..9 kept contiguous so the
    // served top-k is non-empty): value-ranged cuts on (max+1)-derived
    // boundaries would put nearly every row in "base" and
    // rows_total_ok compared 60 against max+1 = 444 (always false)
    val ids = (0L until 10L) ++ (0 until 50).map(i => 100L + 7L * i)
    ids.zipWithIndex.map { case (id, i) => (id, emb(i), i % 3) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.similarityIndexMaintain(spark2, dir.toString)
      .collect()
    assert(rows.nonEmpty)
    // the fold facts the oracle pins — on the gapped space they hold
    // only under rank cuts (n_folds = 1 needs all three batches
    // non-empty; rows_total_ok compares against COUNT(*), not max+1)
    assert(rows.forall(_.getAs[Long]("n_folds") == 1L))
    assert(rows.forall(_.getAs[Long]("dirs_latest") == 4L))
    assert(rows.forall(_.getAs[Boolean]("rows_total_ok")))
    assert(rows.forall(_.getAs[Boolean]("probe_rows_ok")))
  }

  test("similarity_index_stream (r17): exactly-once micro-batch ingestion " +
      "with the fold policy riding the stream — served top-k IDENTICAL " +
      "to the batch-mode maintain key, replay a no-op even after the fold") {
    import TestSpark.{spark, SF}
    val rows = Similarity.similarityIndexStream(spark, SF).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_folds") == 1L))
    assert(rows.forall(_.getAs[Long]("dirs_latest") == 4L))
    assert(rows.forall(_.getAs[Boolean]("rows_total_ok")))
    assert(rows.forall(_.getAs[Boolean]("replay_skipped")))
    // the stream is an execution strategy, not a semantics change: the
    // served (query, neighbor, rank, score) set equals the batch-mode
    // maintain key's exactly
    val batch = Similarity.similarityIndexMaintain(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val streamed = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
  }

  test("similarity_index_delete (r17, r16 VERDICT item 4): storage facts " +
      "pinned, no deleted vector served, survivors all reachable, " +
      "merge-on-read equals the post-fold serve") {
    import org.apache.spark.sql.functions._
    import TestSpark.{spark, SF}
    val rows = Similarity.similarityIndexDelete(spark, SF).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_versions") == 5L))
    assert(rows.forall(_.getAs[Long]("dirs_latest") == 4L))
    assert(rows.forall(_.getAs[Boolean]("rows_total_ok")))
    assert(rows.forall(_.getAs[Boolean]("tomb_gone")))
    assert(rows.forall(_.getAs[Boolean]("mor_ok")))
    assert(rows.forall(_.getAs[Boolean]("probe_pruned")))
    assert(rows.forall(_.getAs[Boolean]("probe_rows_ok")))
    // the deleted slice: ranks (n/4, 3n/8] of the vec_id order
    val emb = Tables.load(spark, SF, "embeddings")
    val n = emb.count()
    val ids = emb.select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0))
    val delLo = ids((n / 4).toInt)      // id at rank n/4 + 1
    val delHi = ids((3 * n / 8).toInt)  // id at rank 3n/8 + 1
    assert(rows.forall(_.getAs[Long]("deleted_rows") == 3 * n / 8 - n / 4))
    // NO deleted vector is ever served — as neighbor or as query
    assert(rows.forall { r =>
      val nb = r.getAs[Long]("neighbor_id")
      val q = r.getAs[Long]("query_id")
      (nb < delLo || nb >= delHi) && (q < delLo || q >= delHi)
    })
    // per surviving query: 5 ranked neighbors (the fold lost no list)
    rows.groupBy(_.getLong(0)).values.foreach { v =>
      assert(v.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    }
    // and the persisted index holds exactly the survivors
    val snap = new graft.matview.Snapshots(spark,
      graft.matview.Materializer.defaultScratch + "/ivfidx")
    val t = s"ivf_del_${Tables.dirKey(SF)}"
    val persisted = snap.readLatest(t).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val expected = ids.filter(id => id < delLo || id >= delHi).toSet
    assert(persisted == expected)
  }

  test("index delete on a GAPPED vec_id space (r17): rank-keyed " +
      "tombstones delete the same row count as the contiguous fixture " +
      "and every pinned fact holds") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    def emb(i: Int): Array[Float] =
      Array.tabulate(64)(j => 0.1f * ((i % 7) + 1) + 0.01f * ((i + j) % 5))
    val dir = java.nio.file.Files.createTempDirectory("idx_del_gapped")
    // the maintain gapped corpus: queries 0..9 contiguous, rest gapped
    // (the deleted window sits at ranks 16..22 — ids 135..177 — so the
    // query ids survive; a value-ranged cut would delete a different
    // COUNT of rows entirely)
    val ids = (0L until 10L) ++ (0 until 50).map(i => 100L + 7L * i)
    ids.zipWithIndex.map { case (id, i) => (id, emb(i), i % 3) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.similarityIndexDelete(spark2, dir.toString)
      .collect()
    assert(rows.nonEmpty)
    // n = 60: deleted_rows = 3*60/8 - 60/4 = 22 - 15 = 7, exactly —
    // on any id space
    assert(rows.forall(_.getAs[Long]("deleted_rows") == 7L))
    assert(rows.forall(_.getAs[Long]("n_versions") == 5L))
    assert(rows.forall(_.getAs[Boolean]("rows_total_ok")))
    assert(rows.forall(_.getAs[Boolean]("tomb_gone")))
    assert(rows.forall(_.getAs[Boolean]("mor_ok")))
    assert(rows.forall(_.getAs[Boolean]("probe_rows_ok")))
  }

  test("filtered-ANN generate bound (r17, r16 VERDICT item 6): the " +
      "ranked-list kernel emits min(maxDepth, L) entries — never all L — " +
      "and the prefix is exactly the unbounded ranking's prefix") {
    val refined = (0 until 16).map(c =>
      (c, Array.tabulate(64)(j => math.sin(c * 64.0 + j)))).toArray
    val query = Array.tabulate(64)(j => math.cos(j / 3.0).toFloat)
    val unbounded = Similarity.rankAllLists(refined, 16)(query)
    assert(unbounded.length == 16)
    val bounded = Similarity.rankAllLists(refined, 5)(query)
    // the cap bounds the GENERATE: 5 entries, not L
    assert(bounded.length == 5)
    // and truncation is pure: the bounded output is the unbounded prefix,
    // so every pos the downstream per-label filter can keep is identical
    assert(bounded == unbounded.take(5))
    // a cap at or past L degrades to the full ranking (the degenerate
    // no-labels path)
    assert(Similarity.rankAllLists(refined, 99)(query) == unbounded)
  }

  test("dedup_semantic equals an un-checkpointed all-pairs rebuild " +
      "(the assignment checkpoint is a pure materialization)") {
    import org.apache.spark.sql.functions._
    import TestSpark.{spark, SF}
    val got = Similarity.dedupSemantic(spark, SF).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // the same algebra rebuilt inline WITHOUT the localCheckpoint —
    // re-deriving the assignment per consumer must give identical rows
    val n = Tables.load(spark, SF, "embeddings").count()
    val (_, assigned, _) =
      Similarity.ivfListsK(spark, SF, Similarity.nlistsFor(n))
    val m = assigned.select(
      col("vec_id"), col("cid"), col("embedding"), col("nrm"))
    val mx = m.as("a").join(m.as("b"),
        col("a.cid") === col("b.cid") && col("b.vec_id") < col("a.vec_id"))
      .select(col("a.vec_id").as("vec_id"),
        (graft.functions.VectorDot
          .vector_dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .groupBy("vec_id").agg(max(col("cos")).as("mxraw"))
    val exact = m.select("vec_id", "cid").join(mx, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        round(coalesce(col("mxraw"), lit(-1.0)), 9).as("ms")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got == exact)
  }
}
