package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.EventOps
import graft.streaming.StreamingOps

class EventStreamSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  test("streaming tumbling agg == batch tumbling agg once drained") {
    val stream = StreamingOps.eventsStream(spark, SF)
    val result = StreamingOps.runToCompletion(
      spark, StreamingOps.tumblingAgg(stream), "stream_tumbling")
      .select("hour_start", "event_type", "n", "sum_value")
    val batch = EventOps.eventsWindowTumbling(spark, SF)
      .select("hour_start", "event_type", "n", "sum_value")
    assert(result.exceptAll(batch).isEmpty && batch.exceptAll(result).isEmpty)
  }

  test("sessionize: no intra-session gap exceeds 30 minutes") {
    val sessions = EventOps.eventsSessionize(spark, SF)
    // max sessions per user bounded by events per user
    val perUser = sessions.groupBy("user_id").agg(
      count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    assert(perUser.filter(col("n_sessions") > col("n_events")).count() == 0)
    // session boundaries: start <= end everywhere
    assert(sessions.filter(col("session_start") > col("session_end")).count() == 0)
    // events are conserved
    val total = graft.Tables.load(spark, SF, "events").count()
    val inSessions = sessions.agg(sum("n_events")).collect().head.getLong(0)
    assert(inSessions == total)
  }
}
