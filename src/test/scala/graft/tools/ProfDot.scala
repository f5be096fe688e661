package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only: before/after timing for the VectorDot hot path. */
object ProfDot {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      println(f"$tag%-28s best=${ts.min}%.3f")
    }
    time("bruteforce_vectordot") {
      graft.ext.Similarity.similarityTopkBruteforce(spark, sfDir)
    }
    time("embedding_dedup_lsh") {
      graft.ext.Dedup.dedupEmbeddingCosine(spark, sfDir)
    }
    spark.stop()
  }
}
