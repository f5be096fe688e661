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
}
