package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.queries.RelationalQueries

class FunnelStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed funnel ≡ batch q102 minus open sessions") {
    val stream = EventStream.readEventsStream(spark, sf)
      .select($"user_id", expr("ts div 1000").as("ts_us"), $"event_type")
      .as[FunnelStream.FEv]
    val q = FunnelStream.funnel(stream)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("funnel_stream")
      .select($"user_id", $"n_events", $"t_view", $"t_click", $"t_purchase", $"stage")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long], Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4, r._5, r._6)).sorted.toSeq)
      .toMap

    // batch q102: all sessions; the stream (Append, no timeout)
    // withholds each user's LAST session as open state
    val batch = RelationalQueries.q102SessionFunnel(spark, sf)
      .select($"user_id", $"session_idx", $"n_events",
        $"t_view", $"t_click", $"t_purchase", $"stage")
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long], Int)].collect()
    val lastIdx = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batch.filter { case (u, i, _, _, _, _, _) => i != lastIdx(u) }
      .groupBy(_._1)
      .view.mapValues(_.map(r => (r._3, r._4, r._5, r._6, r._7)).sorted.toSeq)
      .toMap

    assert(streamed == expected)
  }

  test("stage chain arms in order and carries across micro-batches") {
    import org.apache.spark.sql.streaming.TestGroupState
    import FunnelStream._
    val gap = SessionStream.DefaultGapUs
    def fresh = TestGroupState.create[FunnelState](
      org.apache.spark.api.java.Optional.empty[FunnelState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[java.lang.Long]().asInstanceOf[org.apache.spark.api.java.Optional[Long]],
      hasTimedOut = false)

    // a click BEFORE any view must not arm stage 2; the chain then
    // arms across micro-batch boundaries and survives in state
    val st = fresh
    val out1 = updateUser(5L,
      Iterator(FEv(5, 1000, "click"), FEv(5, 2000, "view")), st, gap).toSeq
    assert(out1.isEmpty)
    assert(st.get.t_view.contains(2000L) && st.get.t_click.isEmpty)
    val out2 = updateUser(5L,
      Iterator(FEv(5, 3000, "click"), FEv(5, 4000, "purchase")), st, gap).toSeq
    assert(out2.isEmpty)
    assert(st.get == FunnelState(1000, 4000, 4, Some(2000), Some(3000), Some(4000)))
    // the gap closes the session with the full chain and stage 3
    val out3 = updateUser(5L, Iterator(FEv(5, 4000 + gap + 1, "view")), st, gap).toSeq
    assert(out3 == Seq(ClosedFunnel(5, 1000, 4000, 4,
      Some(2000), Some(3000), Some(4000), 3)))
    assert(st.get.t_view.contains(4000L + gap + 1) && st.get.t_click.isEmpty)

    // first-qualifying-wins: a second view/click never overwrites
    val st2 = fresh
    updateUser(6L, Iterator(
      FEv(6, 100, "view"), FEv(6, 200, "view"),
      FEv(6, 300, "click"), FEv(6, 250, "click")), st2, gap)
    assert(st2.get.t_view.contains(100L) && st2.get.t_click.contains(250L))
  }
}
