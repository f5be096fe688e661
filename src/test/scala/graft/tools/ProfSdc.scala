package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: the measurement that KILLED the PQ/SDC pre-scoring idea for
  * dedup_semantic (r9 verdict item 7, proposed ~4x win; ROADMAP r10).
  *
  * Stages timed at sf10 (200k vectors, 448 clusters, ~44M in-cluster
  * pairs): pair join alone 2.1s; + SDC udf scoring (8 codeword-table
  * adds from a broadcast 4 MB lut) 8.7-12s; + TopKAgg(32) shortlist
  * 14.4-19.3s even with the sort-fallback threshold raised and the
  * partitioning pinned — while the EXACT codegen VectorDot + codegen
  * max over the same pairs runs 9.3s. The ScalaUDF breaks whole-stage
  * codegen and boxes per call, and the shortlist needs an
  * ObjectHashAggregate where the exact path uses a declarative max; at
  * DIM=64 the 64-FMA codegen dot is cheaper than any off-codegen
  * per-pair step. PQ's production win is memory compression (vectors
  * that don't fit RAM), not FLOPs at this dimensionality. Kept as the
  * reproducible record; dedupSemantic stays exact.
  *
  *   sbt "Test/runMain graft.tools.ProfSdc [dir]"
  */
object ProfSdc {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/target/scratch/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profsdc] $label best=${ts.min}%.2f all=${
        ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val n = graft.Tables.load(spark, dir, "embeddings").count()
    val nlists = graft.ext.Similarity.nlistsFor(n)
    println(s"[profsdc] n=$n nlists=$nlists")
    var assigned: org.apache.spark.sql.DataFrame = null
    time("train_assign_ckpt") {
      assigned = graft.ext.Similarity.ivfListsK(spark, dir, nlists)
        ._2.localCheckpoint()
    }
    var codes: org.apache.spark.sql.DataFrame = null
    var cb: Array[Array[Array[Double]]] = null
    time("pq_train_encode_ckpt") {
      val (cb0, codes0) = graft.ext.Similarity.pqTrainEncode(spark, assigned)
      cb = cb0
      codes = codes0.select(col("vec_id"), col("cid"), col("codes"))
        .localCheckpoint()
    }
    time("pair_join_cheap_max") {
      // pair join + a plain max over a cheap hash of codes: isolates the
      // JOIN + per-pair cost without udf or TopKAgg
      codes.as("a").join(codes.as("b"),
          col("a.cid") === col("b.cid") &&
            col("b.vec_id") < col("a.vec_id"))
        .select(col("a.vec_id").as("vec_id"),
          (element_at(col("a.codes"), 1) + element_at(col("b.codes"), 1))
            .as("x"))
        .groupBy("vec_id").agg(max(col("x")))
        .write.format("noop").mode("overwrite").save()
    }
    // the real SDC scoring + shortlist, stage-isolated
    val sdcFlat: Array[Double] = {
      val M = 8; val K = 256; val SD = 8
      val flat = new Array[Double](M * K * K)
      for (m <- 0 until M; a <- 0 until K; b <- 0 until K) {
        var acc = 0.0; var i = 0
        while (i < SD) { acc += cb(m)(a)(i) * cb(m)(b)(i); i += 1 }
        flat(m * K * K + a * K + b) = acc
      }
      flat
    }
    val bc = spark.sparkContext.broadcast(sdcFlat)
    val sdcUdf = udf { (a: Array[Int], b: Array[Int]) =>
      val t = bc.value
      var acc = 0.0; var mi = 0
      while (mi < 8) { acc += t(mi * 65536 + a(mi) * 256 + b(mi)); mi += 1 }
      acc
    }
    def pairScored = codes.as("a").join(codes.as("b"),
        col("a.cid") === col("b.cid") &&
          col("b.vec_id") < col("a.vec_id"))
      .select(col("a.vec_id").as("vec_id"),
        sdcUdf(col("a.codes"), col("b.codes")).as("ascore"),
        col("b.vec_id").as("bid"))
    time("pair_sdc_udf_max") {
      pairScored.groupBy("vec_id").agg(max(col("ascore")))
        .write.format("noop").mode("overwrite").save()
    }
    time("pair_sdc_topk_raised") {
      graft.Tables.withConf(spark,
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
          -> (1 << 21).toString) {
        pairScored.groupBy("vec_id")
          .agg(graft.functions.TopKAgg.top_k(col("ascore"), col("bid"), 32)
            .as("top"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // AQE hypothesis: the codes relation is ~10 MB, so the cid shuffle
    // coalesces to ~2 partitions while the JOIN OUTPUT is 44M pairs —
    // the expansion runs on 2 tasks. Pin the partitioning explicitly.
    val nPart = spark.sessionState.conf.numShufflePartitions
    val codesRep = codes.repartition(nPart, col("cid"))
    def pairScoredRep = codesRep.as("a").join(codesRep.as("b"),
        col("a.cid") === col("b.cid") &&
          col("b.vec_id") < col("a.vec_id"))
      .select(col("a.vec_id").as("vec_id"),
        sdcUdf(col("a.codes"), col("b.codes")).as("ascore"),
        col("b.vec_id").as("bid"))
    time("pair_sdc_topk_repart") {
      graft.Tables.withConf(spark,
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
          -> (1 << 21).toString) {
        pairScoredRep.groupBy("vec_id")
          .agg(graft.functions.TopKAgg.top_k(col("ascore"), col("bid"), 32)
            .as("top"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("pair_sdc_udf_max_repart") {
      pairScoredRep.groupBy("vec_id").agg(max(col("ascore")))
        .write.format("noop").mode("overwrite").save()
    }
    // the OLD exact path's pair scoring (codegen VectorDot over float
    // embeddings), as-is vs with the same explicit repartition pin
    val m0 = assigned.select(
      col("vec_id"), col("cid"), col("embedding"), col("nrm"))
    def exactMax(rel: org.apache.spark.sql.DataFrame) =
      rel.as("a").join(rel.as("b"),
          col("a.cid") === col("b.cid") &&
            col("b.vec_id") < col("a.vec_id"))
        .select(col("a.vec_id").as("vec_id"),
          (graft.functions.VectorDot
            .vector_dot(col("a.embedding"), col("b.embedding")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
        .groupBy("vec_id").agg(max(col("cos")).as("mxraw"))
    time("exact_vecdot_max_asis") {
      exactMax(m0).write.format("noop").mode("overwrite").save()
    }
    time("exact_vecdot_max_repart") {
      exactMax(m0.repartition(nPart, col("cid")))
        .write.format("noop").mode("overwrite").save()
    }
    time("full_key") {
      graft.ext.Similarity.dedupSemantic(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
