package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: split events_stream_heavy_hitters' cost between the chunk
  * STAGING write (bounded-stream scaffolding: events -> 4 time-ordered
  * files), the streaming drain itself (4 micro-batches through the CMS
  * state store), and the final probe — so optimization effort lands on
  * the piece that actually costs.
  *
  *   sbt "Test/runMain graft.tools.ProfStream [dir]"
  */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
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
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profstream] $label best=${ts.min}%.2f all=${
        ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // warmup
    graft.SparkEntry.queries("events_stream_heavy_hitters")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    time("stage_chunks") {
      val staged = java.nio.file.Paths.get(
        s"${graft.matview.Materializer.defaultScratch}/stream_chunked")
      graft.streaming.StreamingOps.del(staged)
      java.nio.file.Files.createDirectories(staged)
      graft.streaming.StreamingOps.stageChunkFiles(spark, dir, staged)
    }
    time("full_key") {
      graft.SparkEntry.queries("events_stream_heavy_hitters")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // diagnostics: which fixed cost dominates the 4-batch drain?
    time("full_key_parts4") {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try graft.SparkEntry.queries("events_stream_heavy_hitters")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      finally spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
    }
    time("full_key_no_nodata") {
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      try graft.SparkEntry.queries("events_stream_heavy_hitters")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      finally spark.conf
        .unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }
    spark.stop()
  }
}
