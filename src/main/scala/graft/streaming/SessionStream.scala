package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — per-user session state survives across
  * micro-batches, closed sessions emit in Append mode, the open
  * session rides in the state store. The streaming twin of the batch
  * q28 ([[graft.queries.PipelineQueries]]).
  *
  * State per key is one [[SessionStream.OpenSession]] — O(users)
  * state, bounded regardless of event volume.
  */
object SessionStream {

  final case class Ev(user_id: Long, ts_us: Long)
  final case class OpenSession(start_us: Long, end_us: Long, n_events: Long)
  final case class ClosedSession(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  val DefaultGapUs: Long = 30L * 60 * 1000 * 1000

  /** Fold a batch of events for one user into the session state,
    * emitting every session closed by a gap. Events are sorted within
    * the batch; state carries the still-open session across batches.
    */
  def updateUser(
      userId: Long, events: Iterator[Ev], state: GroupState[OpenSession],
      gapUs: Long): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(_.ts_us)
    if (sorted.isEmpty) return Iterator.empty
    val closed = Seq.newBuilder[ClosedSession]
    var open = state.getOption
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us < s.start_us - gapUs =>
          // orphan late event from before the open session's reach:
          // batch semantics would place it in its own earlier session —
          // emit it as one (best effort; peers that would have shared
          // that session may have been emitted already)
          closed += ClosedSession(userId, e.ts_us, e.ts_us, 1)
        case Some(s) if e.ts_us - s.end_us <= gapUs =>
          // in-reach events (incl. late ones within gap of the bounds)
          // widen the session on both ends — never rewind end below
          // start, never leave start after an earlier merged event
          open = Some(s.copy(
            start_us = math.min(s.start_us, e.ts_us),
            end_us = math.max(s.end_us, e.ts_us),
            n_events = s.n_events + 1))
        case Some(s) =>
          closed += ClosedSession(userId, s.start_us, s.end_us, s.n_events)
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Append-mode sessionization over a (possibly streaming) event
    * Dataset. The open session per user stays in state — with a real
    * unbounded stream, add a processing-time timeout to flush idle
    * users.
    */
  def sessionize(events: Dataset[Ev], gapUs: Long = DefaultGapUs): Dataset[ClosedSession] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Ev], st: GroupState[OpenSession]) =>
          updateUser(uid, it, st, gapUs))
  }
}
