package graft.streaming

import org.apache.spark.sql.SparkSession

/** Runnable example: continuous event-time aggregation over the events
  * table via Structured Streaming, drained to completion and printed.
  *
  *   sbt "runMain graft.streaming.StreamDemo [sfDir]"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = StreamingOps.runToCompletion(
      spark, StreamingOps.tumblingAgg(StreamingOps.eventsStream(spark, dir)),
      "demo_tumbling")
    out.orderBy("hour_start", "event_type").show(12, truncate = false)
    println(s"[stream-demo] windows=${out.count()}")
    spark.stop()
  }
}
