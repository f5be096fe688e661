package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage decomposition of dedup_semantic — where do the
  * seconds go between the IVF train/assign passes and the cluster-scoped
  * pair scoring?
  *
  *   sbt "Test/runMain graft.tools.ProfSem [dir]"
  */
object ProfSem {
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
      println(f"[profsem] $label best=${ts.min}%.2f all=${
        ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val n = graft.Tables.load(spark, dir, "embeddings").count()
    val nlists = graft.ext.Similarity.nlistsFor(n)
    println(s"[profsem] n=$n nlists=$nlists")
    // stage 0: ONE assignment UDF pass alone (replicates ivfListsK's
    // seed + argmax-dot udf, dev-only copy; the cluster count and the
    // refine dimension read Similarity's own nlistsFor/DIM so the
    // probe can't silently time a stale shape when those change)
    locally {
      import spark.implicits._
      val e = graft.Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val seed: Array[Array[Double]] = e.orderBy("vec_id").limit(nlists)
        .select("embedding").as[Array[Float]].collect().map(_.map(_.toDouble))
      val assign = udf { (emb: Array[Float]) =>
        var best = 0; var bestDot = Double.MinValue
        var c = 0
        while (c < seed.length) {
          var acc = 0.0; var i = 0
          val cent = seed(c)
          while (i < cent.length) { acc += emb(i) * cent(i); i += 1 }
          if (acc > bestDot) { bestDot = acc; best = c }
          c += 1
        }
        best
      }
      time("one_udf_pass") {
        e.withColumn("cid", assign(col("embedding")))
          .write.format("noop").mode("overwrite").save()
      }
      // the Lloyd refine aggregate alone — assigned0 MUST be
      // materialized first or the noop write re-runs the assignment UDF
      // inside the timed window and the stage number misattributes a
      // whole corpus pass to the refine
      val assigned0 = e.withColumn("cid", assign(col("embedding")))
        .localCheckpoint()
      time("refine_agg") {
        assigned0.groupBy(col("cid"))
          .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding"))))
            .as("vs"))
          .select(col("cid"), expr(
            s"""transform(
              |  aggregate(vs, array_repeat(CAST(0 AS DOUBLE), ${graft.ext.Similarity.DIM}),
              |    (acc, v) -> zip_with(acc, v.embedding,
              |      (a, x) -> a + CAST(x AS DOUBLE))),
              |  m -> m / size(vs))""".stripMargin).as("cent"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // stage 1: the IVF train (seed collect, UDF pass 1, Lloyd refine
    // collect, UDF pass 2), materialized through noop
    time("ivf_assign") {
      val (_, assigned, _) = graft.ext.Similarity.ivfListsK(spark, dir, nlists)
      assigned.write.format("noop").mode("overwrite").save()
    }
    // stage 2: the whole key (train + pair scoring + rollup)
    time("full_key") {
      graft.ext.Similarity.dedupSemantic(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
