package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.EventOps
import graft.streaming.StreamingOps

/** The stateful streaming sessionizer (flatMapGroupsWithState, event-time
  * timeout) must reproduce the batch sessionization exactly once the
  * bounded stream is flushed.
  */
class StatefulSessionSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  test("streaming sessions == batch sessions (values, bounds, counts)") {
    val stream = StreamingOps.eventsStreamWithFlush(spark, SF)
    val sessions = StreamingOps.sessionizeStream(stream)
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("stateful_sessions")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("stateful_sessions")
      .filter(col("user_id") =!= -1)
      .select(col("user_id"), col("session_id"), col("n_events"),
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"),
        col("session_value"))

    val batch = EventOps.eventsSessionize(spark, SF)
      .select("user_id", "session_id", "n_events",
        "session_start", "session_end", "session_value")

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming funnel == batch MIN-chain, with state carried across batches") {
    val streamed = EventOps.eventsStreamFunnel(spark, SF)

    // batch MIN-chain on the same fixture, epoch-micros throughout
    val e = Tables.load(spark, SF, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts_us")).as("view_us"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts_us") > col("view_us"))
      .groupBy("user_id", "view_us").agg(min(col("ts_us")).as("click_us"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts_us") > col("click_us"))
      .groupBy("user_id", "view_us", "click_us")
      .agg(min(col("ts_us")).as("purchase_us"))
    val batch = p.select("user_id", "view_us", "click_us", "purchase_us")

    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    // the replay genuinely spans micro-batches: at least one converted
    // user's view and purchase fall in different time-range chunks
    // (chunk boundaries = the range partitioner's (ts, event_id) split)
    val bounds = StreamingOps
      .stageChunks(Tables.load(spark, SF, "events"))
      .groupBy("__chunk").agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    def chunkOf(us: Long): Int = bounds.lastIndexWhere(b => us >= b._1)
    val spanning = batch.collect().count(r =>
      chunkOf(r.getLong(1)) != chunkOf(r.getLong(3)))
    assert(spanning > 0, "no conversion spans a micro-batch boundary")
  }

  test("streaming CDC equals batch apply and genuinely merges across batches") {
    // balance read null-safely: the CDC merge's last-writer-wins contract
    // explicitly lets a NULL payload overwrite (StreamingOps
    // .streamingCdcApply) — getDouble would NPE on such a key and crash
    // the spec instead of reporting a comparison failure
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        (Option(r.getAs[java.lang.Double](1)), r.getLong(2))).toMap
    val batch = asMap(EventOps.eventsCdcApply(spark, SF))
    val stream = asMap(EventOps.eventsStreamCdc(spark, SF))
    assert(stream == batch)
    // the equality is only meaningful if per-key state really crossed a
    // micro-batch boundary: some user must have changes in >1 chunk
    val spanning = StreamingOps.stageChunks(
        graft.Tables.load(spark, SF, "events"))
      .groupBy("user_id")
      .agg(countDistinct(col("__chunk")).as("nc"))
      .filter(col("nc") > 1).count()
    assert(spanning > 0, "no user's change stream spans a chunk boundary")
  }

  test("session numbering survives a timeout eviction: a returning user " +
      "gets session_id 2, not a duplicate 1") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(uid: Long, id: Long, sec: Long) = StreamingOps.Ev(
      uid, id, java.time.Instant.ofEpochSecond(sec), 1.0)
    val t0 = 1700000000L
    val in = MemoryStream[StreamingOps.Ev]
    val q = StreamingOps.sessionizeStream(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("tombstone_sessions").start()
    try {
      // b1: user 1 active; user 99 is the watermark driver
      in.addData(ev(1, 10, t0), ev(99, 90, t0))
      q.processAllAvailable()
      // b2: watermark jumps 2h past user 1's last event -> their session
      // times out and closes (id 1)
      in.addData(ev(99, 91, t0 + 7200))
      q.processAllAvailable()
      // b3: user 1 returns 3h in -> a NEW session opens
      in.addData(ev(1, 11, t0 + 10800))
      q.processAllAvailable()
      // b4: watermark jumps far again -> the new session closes too
      in.addData(ev(99, 92, t0 + 100000))
      q.processAllAvailable()
      in.addData(ev(99, 93, t0 + 200000))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("tombstone_sessions")
      .filter(col("user_id") === 1).select("session_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L),
      s"expected sequential session ids across a timeout, got $ids")
  }
}
