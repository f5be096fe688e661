package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only: advisory-partition-size sensitivity of the 10x probes. */
object ProfAdvisory {
  def main(args: Array[String]): Unit = {
    val tenx = graft.matview.Materializer.defaultScratch + "/sf10x"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-36s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("simhash_10x")(graft.ext.Dedup.dedupSimhash(spark, tenx))
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    time("cluster_10x")(graft.ext.Dedup.dedupCluster(spark, tenx))
    time("corpus_clean_10x")(graft.ext.Dedup.corpusCleanPlan(spark, tenx))
    time("ivf_10x")(graft.ext.Similarity.similarityIvf(spark, tenx))
    for (adv <- Seq("64m", "8m", "16m", "32m")) {
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", adv)
      time(s"jaccard_adv_$adv")(graft.ext.Dedup.dedupNgramJaccard(spark, tenx))
      time(s"minhash_adv_$adv")(graft.ext.Dedup.dedupMinhashLsh(spark, tenx))
      time(s"5way_adv_$adv")(
        graft.queries.Relational.joinNatural5Way(spark, tenx))
    }
    spark.stop()
  }
}
