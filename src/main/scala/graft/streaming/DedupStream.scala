package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch q140 sliding-window delivery dedup
  * ([[graft.queries.RelationalQueries.q140EventDedupWindow]]): an
  * at-least-once event feed repaired ON INGEST — an event is emitted
  * iff no event with the same (user_id, event_type, value) identity
  * occurred within the preceding window, with the window EXTENDING
  * across a redelivery chain (each duplicate refreshes the clock — the
  * same island rule as batch, so streamed ≡ batch for in-order
  * delivery, pinned in DedupStreamSpec).
  *
  * Spark's own `dropDuplicatesWithinWatermark` anchors its window at
  * the FIRST occurrence (a chain outlasting the delay re-admits a
  * duplicate); the extending rule here matches the batch oracle
  * exactly and is one comparison + one timestamp of state per
  * identity.
  *
  * Scale shape: one exchange keyed by the identity triple (uniform —
  * value diversifies hot users), one timestamp of state per identity.
  * An identity idle past the window can never suppress anything again,
  * so on a real unbounded stream the state is GC-able by watermark:
  * `withWatermark` on ts + `EventTimeTimeout`, removing state when the
  * timeout fires (the timeout path is mechanical and orthogonal to the
  * dedup rule; the equivalence harness runs NoTimeout so streamed ≡
  * batch is exact).
  */
object DedupStream {

  final case class DEv(event_id: Long, user_id: Long, event_type: String,
      value: Double, ts_us: Long)
  /** Last seen ts for the identity — the extending-window clock. */
  final case class DState(last_ts_us: Long)
  final case class Kept(event_id: Long, user_id: Long, event_type: String,
      value: Double, ts_us: Long)

  /** Fold one identity's batch: emit island heads, refresh the clock on
    * every occurrence (kept OR dropped), forget state once stale.
    */
  def updateKey(events: Iterator[DEv], state: GroupState[DState],
      winUs: Long): Iterator[Kept] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val kept = Seq.newBuilder[Kept]
    var last: Option[Long] = state.getOption.map(_.last_ts_us)
    sorted.foreach { e =>
      if (last.forall(l => e.ts_us - l > winUs))
        kept += Kept(e.event_id, e.user_id, e.event_type, e.value, e.ts_us)
      // the clock refreshes even for drops — that's the extending rule
      last = Some(math.max(last.getOrElse(Long.MinValue), e.ts_us))
    }
    state.update(DState(last.get))
    kept.result().iterator
  }

  /** Append-mode streaming dedup over a (possibly streaming) event
    * Dataset, 10-minute window by default.
    */
  def dedup(events: Dataset[DEv],
      winUs: Long = 10L * 60 * 1000 * 1000): Dataset[Kept] = {
    implicit val evEnc = Encoders.product[DEv]
    implicit val stEnc = Encoders.product[DState]
    implicit val outEnc = Encoders.product[Kept]
    implicit val keyEnc = Encoders.product[(Long, String, Double)]
    events
      .groupByKey(e => (e.user_id, e.event_type, e.value))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Long, String, Double), it: Iterator[DEv], st: GroupState[DState]) =>
          updateKey(it, st, winUs))
  }
}
