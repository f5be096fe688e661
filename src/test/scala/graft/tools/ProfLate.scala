package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: inspect micro-batch splitting + late-drop behavior. */
object ProfLate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val scratch = graft.matview.Materializer.defaultScratch
    val staged = Paths.get(s"$scratch/prof_late_src")
    def del(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    del(staged); Files.createDirectories(staged)
    def writeChunk(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = staged.resolve("tmp_" + name)
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, staged.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
      del(tmp)
      Files.setLastModifiedTime(staged.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    import spark.implicits._
    // all ts handling goes through Tables.normalizeTs (physical-type agnostic)
    val events = graft.Tables.load(spark, sfDir, "events")
    writeChunk(events, "chunk_01.parquet", 1000000L)
    val maxUs = events.agg(max(unix_micros(col("ts"))))
      .collect().head.getLong(0)
    // intermediate batch: one sentinel 4h past the end -> state eviction
    writeChunk(Seq((-1L, -1L, "flush", 0.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(maxUs + 4L * 3600 * 1000000L)))
      .select("event_id", "ts", "user_id", "event_type", "value", "props"),
      "chunk_02.parquet", 2000000L)
    val late = events
      .orderBy(col("ts"), col("event_id")).limit(100)
      .withColumn("event_id", col("event_id") + 1000000000L)
    writeChunk(late, "chunk_03.parquet", 3000000L)

    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType), // normalized at staging
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val eventsStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
    val agg = eventsStream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"))
    val q = agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$scratch/prof_late_ckpt_" + System.nanoTime())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        println(s"BATCH $id upserts=${batch.count()} " +
          s"minHour=${batch.agg(min(col("hour_start"))).collect().head}")
        ()
      }
      .start()
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      println(s"PROGRESS batch=${p.batchId} rows=${p.numInputRows} " +
        s"watermark=${p.eventTime.get("watermark")}")
    }
    q.stop()
    spark.stop()
  }
}
