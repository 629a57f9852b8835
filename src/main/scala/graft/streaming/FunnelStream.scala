package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch q102 ordered funnel
  * ([[graft.queries.RelationalQueries.q102SessionFunnel]]): gap
  * sessions with null-chained view → click → purchase stage
  * timestamps, maintained incrementally in
  * `flatMapGroupsWithState` state and emitted when the gap closes the
  * session — the "live conversion dashboard" shape.
  *
  * Equivalence contract: for per-user IN-ORDER delivery the
  * incremental stage rule ("first qualifying event wins, only if the
  * previous stage is set and at-or-after it") computes exactly the
  * batch minimums, so streamed closed sessions ≡ batch q102 rows
  * (SessionStreamSpec's subtraction argument: the stream withholds
  * each user's open last session). Late events follow
  * [[SessionStream.updateUser]]'s best-effort session-bounds
  * semantics; a late event that would have changed an ALREADY-SET
  * earlier stage in batch cannot rewind it incrementally — the same
  * deliberate, documented divergence class as the session-bounds
  * widening.
  *
  * State per (user, open session) is one fixed-size row (three
  * optional stage timestamps + bounds) — bounded by active-user
  * cardinality, never by history.
  */
object FunnelStream {

  final case class FEv(user_id: Long, ts_us: Long, event_type: String)
  final case class FunnelState(
      start_us: Long, end_us: Long, n_events: Long,
      t_view: Option[Long], t_click: Option[Long], t_purchase: Option[Long])
  final case class ClosedFunnel(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long,
      t_view: Option[Long], t_click: Option[Long], t_purchase: Option[Long],
      stage: Int)

  private def stageOf(s: FunnelState): Int =
    if (s.t_purchase.nonEmpty) 3
    else if (s.t_click.nonEmpty) 2
    else if (s.t_view.nonEmpty) 1
    else 0

  /** The null-chained stage rule: first qualifying event wins; a stage
    * only arms once the previous one is set at-or-before it. In-order,
    * this IS the batch conditional-minimum.
    */
  private def advance(s: FunnelState, e: FEv): FunnelState = e.event_type match {
    case "view" if s.t_view.isEmpty =>
      s.copy(t_view = Some(e.ts_us))
    case "click" if s.t_click.isEmpty && s.t_view.exists(_ <= e.ts_us) =>
      s.copy(t_click = Some(e.ts_us))
    case "purchase" if s.t_purchase.isEmpty && s.t_click.exists(_ <= e.ts_us) =>
      s.copy(t_purchase = Some(e.ts_us))
    case _ => s
  }

  private def close(userId: Long, s: FunnelState): ClosedFunnel =
    ClosedFunnel(userId, s.start_us, s.end_us, s.n_events,
      s.t_view, s.t_click, s.t_purchase, stageOf(s))

  /** Fold one user's batch into funnel-session state —
    * [[SessionStream.updateUser]]'s session mechanics with the stage
    * chain riding along.
    */
  def updateUser(
      userId: Long, events: Iterator[FEv], state: GroupState[FunnelState],
      gapUs: Long): Iterator[ClosedFunnel] = {
    val sorted = events.toSeq.sortBy(_.ts_us)
    if (sorted.isEmpty) return Iterator.empty
    val closed = Seq.newBuilder[ClosedFunnel]
    var open = state.getOption
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us < s.start_us - gapUs =>
          // orphan late event: its own already-closed single-event session
          closed += close(userId,
            advance(FunnelState(e.ts_us, e.ts_us, 1, None, None, None), e))
        case Some(s) if e.ts_us - s.end_us <= gapUs =>
          open = Some(advance(s.copy(
            start_us = math.min(s.start_us, e.ts_us),
            end_us = math.max(s.end_us, e.ts_us),
            n_events = s.n_events + 1), e))
        case Some(s) =>
          closed += close(userId, s)
          open = Some(advance(FunnelState(e.ts_us, e.ts_us, 1, None, None, None), e))
        case None =>
          open = Some(advance(FunnelState(e.ts_us, e.ts_us, 1, None, None, None), e))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Append-mode streaming funnel over a (possibly streaming) event
    * Dataset — one state row per open (user, session), flushed by the
    * gap; add a processing-time timeout for idle users on a real
    * unbounded stream.
    */
  def funnel(events: Dataset[FEv],
      gapUs: Long = SessionStream.DefaultGapUs): Dataset[ClosedFunnel] = {
    implicit val evEnc = Encoders.product[FEv]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[ClosedFunnel]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[FEv], st: GroupState[FunnelState]) =>
          updateUser(uid, it, st, gapUs))
  }
}
