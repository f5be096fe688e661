package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage decomposition of the shared tf-idf fit behind
  * text_tfidf_cosine / text_keywords — the per-(doc, word) tf aggregate,
  * the materialized idf artifact, and the two keys end-to-end.
  *
  *   sbt "Test/runMain graft.tools.ProfTfidf [dir]"
  */
object ProfTfidf {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("target/scratch/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    import graft.Tables.load
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[proftfidf] $label best=${ts.min}%.2f all=${
        ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // warmup
    load(s, d, "documents").write.format("noop").mode("overwrite").save()
    val tf = load(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    time("tf_agg")(tf.write.format("noop").mode("overwrite").save())
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nd = load(s, d, "documents").agg(count(lit(1)).as("n_docs"))
    time("idf_artifact") {
      graft.matview.Materializer(s).create("proftfidf_idf",
        dfreq.crossJoin(broadcast(nd))
          .select(col("w"), col("df"),
            round(log(col("n_docs").cast("double") /
              col("df").cast("double")) *
              lit(1000000000.0)).cast("long").as("idf_e9")))
        .write.format("noop").mode("overwrite").save()
    }
    time("tfidf_cosine_full") {
      graft.ext.TextOps.textTfidfCosine(s, d)
        .write.format("noop").mode("overwrite").save()
    }
    time("keywords_full") {
      graft.ext.TextOps.textKeywords(s, d)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
