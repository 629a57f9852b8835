package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.queries.PipelineQueries

class SessionStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed stateful sessions ≡ batch sessionization minus open sessions") {
    val stream = EventStream.readEventsStream(spark, sf)
      .select($"user_id", expr("ts div 1000").as("ts_us"))
      .as[SessionStream.Ev]
    val q = SessionStream.sessionize(stream)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("sessions_stream")
      .select($"user_id", $"n_events").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap

    // batch q28: all sessions; the stream (Append, no timeout) withholds
    // each user's LAST session as open state
    val batch = PipelineQueries.q28Sessionize(spark, sf)
      .select($"user_id", $"session_idx", $"n_events")
      .as[(Long, Long, Long)].collect()
    val lastIdx = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batch.filter { case (u, i, _) => i != lastIdx(u) }
      .groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap

    assert(streamed == expected)
  }

  test("state carries across micro-batches (TestGroupState)") {
    import org.apache.spark.sql.streaming.TestGroupState
    import SessionStream._
    val gap = DefaultGapUs
    // batch 1: two close events -> one open session in state, nothing emitted
    val st = TestGroupState.create[OpenSession](
      org.apache.spark.api.java.Optional.empty[OpenSession](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[java.lang.Long]().asInstanceOf[org.apache.spark.api.java.Optional[Long]],
      hasTimedOut = false)
    val out1 = updateUser(7L, Iterator(Ev(7, 1000), Ev(7, 2000)), st, gap).toSeq
    assert(out1.isEmpty)
    assert(st.get == OpenSession(1000, 2000, 2))
    // batch 2: an event past the gap closes the carried session
    val out2 = updateUser(7L, Iterator(Ev(7, 2000 + gap + 1)), st, gap).toSeq
    assert(out2 == Seq(ClosedSession(7, 1000, 2000, 2)))
    assert(st.get == OpenSession(2000 + gap + 1, 2000 + gap + 1, 1))
    // regression: a LATE event (before the open session's bounds) joins
    // the session, widening start_us without rewinding end_us
    val out3 = updateUser(7L, Iterator(Ev(7, 2000 + gap - 500)), st, gap).toSeq
    assert(out3.isEmpty)
    assert(st.get == OpenSession(2000 + gap - 500, 2000 + gap + 1, 2))
    // an ORPHAN late event (more than gap before start) must NOT rewind
    // the session across the gap boundary — it emits as its own session
    val orphanTs = (2000 + gap - 500) - gap - 1000
    val out4 = updateUser(7L, Iterator(Ev(7, orphanTs)), st, gap).toSeq
    assert(out4 == Seq(ClosedSession(7, orphanTs, orphanTs, 1)))
    assert(st.get == OpenSession(2000 + gap - 500, 2000 + gap + 1, 2)) // untouched
  }
}
