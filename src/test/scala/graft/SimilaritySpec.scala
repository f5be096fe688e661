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

  test("IVF seeding fails LOUDLY on a gapped vec_id space instead of " +
      "silently diverging from the oracle (r14 review find)") {
    // the engine seeds with the first K rows by vec_id labeled by
    // POSITION; the oracles seed with vec_id < K labeled by vec_id —
    // identical only when the lowest ids are exactly 0..K-1. A gapped
    // corpus must hit the contract require, not train a different
    // quantizer than its oracle replays.
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_gapped")
    (0 until 30).map(i => (100L + i,
        Array.fill(64)(0.1f * ((i % 7) + 1)), i % 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfListsK(spark2, dir.toString, 4)
    }
    assert(e.getMessage.contains("vec_ids 0..3"))
    // contiguous ids from 0: trains normally
    val dir2 = java.nio.file.Files.createTempDirectory("ivf_contig")
    (0 until 30).map(i => (i.toLong,
        Array.fill(64)(0.1f * ((i % 7) + 1)), i % 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")
    val (_, assigned, cents) = Similarity.ivfListsK(spark2, dir2.toString, 4)
    assert(cents.nonEmpty && assigned.count() == 30)
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
