package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.{dec, exactSum}

/** Structured Streaming surface: the same event-time operators as
  * [[graft.ext.EventOps]], expressed over an unbounded source. The
  * reference workload is batch-only (SURVEY §2.8); this is the
  * engine-extension path for continuous ingestion at scale — file source
  * here, but the transform graph is source-agnostic (Kafka/delta swap in
  * unchanged).
  *
  * Watermarking bounds state: 1-hour tumbling windows with a 2-hour
  * watermark keep only ~3 windows of state per event_type regardless of
  * stream length.
  */
object StreamingOps {

  /** events.ts arrives as parquet TIMESTAMP(NANOS) (see Tables.load); the
    * stream source reads it as a nanosecond long and converts. */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos (legacy.parquet.nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded view of the events table (file-source stream). The file
    * stream source requires a directory, so the single events.parquet file
    * is staged into scratch — in production the source would already be a
    * directory of arriving files. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val staged = Paths.get(
      s"${graft.matview.Materializer.defaultScratch}/stream_events")
    Files.createDirectories(staged)
    Files.copy(Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsRawSchema)
      .parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour event-time aggregation with watermark — identical
    * semantics to the batch events_window_tumbling once the stream drains. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        exactSum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run a streaming aggregation to completion against a bounded file
    * source and return the final result — used by tests to prove
    * batch/stream semantic equivalence. */
  def runToCompletion(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
