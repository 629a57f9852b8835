package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-STREAM temporal (as-of) join — both sides live: probes
  * (events) and versions (a versioned dimension: price updates, config
  * pushes, feature snapshots) arrive as streams, and each probe
  * resolves to the version in force at its event time — the greatest
  * version ts at-or-before the probe ts per key. Flink calls this a
  * temporal table join; [[EnrichStream]] covers the static-snapshot
  * case, this operator the fully-streaming one.
  *
  * ==Watermark-correct matching==
  * A probe cannot be resolved the moment it arrives: an older version
  * (still in flight) could be the one in force at the probe's ts. So
  * probes buffer in state until the event-time watermark passes their
  * ts — at that point every version at-or-before them has arrived (by
  * the watermark contract on the versions side) and the match is
  * final. Emission is therefore delayed by the watermark horizon,
  * which is the price of correctness under out-of-order delivery on
  * BOTH sides (the same bargain Spark's built-in stream-stream
  * interval join makes).
  *
  * ==Bounded state, ids only==
  * Per key the state holds (ts, id) pairs: the probes still inside the
  * watermark horizon, the versions at-or-after the watermark, and ONE
  * version below it — the latest, since any future probe has
  * ts >= watermark and can only ever resolve to that one among the
  * older versions. Everything older evicts every micro-batch, so state
  * is O(rows within the horizon), not O(stream history). Only ids
  * ride in state: resolving (probe_id -> version_id) first and
  * hydrating the wide version payload afterwards with a plain
  * equi-join on version_id keeps the state store lean — at scale the
  * hydration join is cheap and stateless, the state store is not.
  *
  * ==Liveness: BOTH inputs must keep their watermark moving==
  * The global watermark is the MIN across the two inputs, so an idle
  * VERSIONS stream (a config feed that publishes rarely) freezes it —
  * probe emission halts and pending-probe state grows with probe rate
  * until the next version arrives. This is inherent to min-watermark
  * semantics (Spark's built-in stream-stream joins carry the same
  * caveat) and is an input concern, not solvable inside the operator:
  * give a slowly-changing versions feed a periodic heartbeat row (any
  * row advances its side's watermark; an unused key works, and the
  * per-key state it creates is one (ts, id) pair that evicts on the
  * next heartbeat).
  *
  * ==Quiescent keys flush by event-time timeout==
  * `flatMapGroupsWithState` only invokes keys present in a micro-batch,
  * so a key that goes quiet after buffering a probe would otherwise
  * hold it (and its state) forever. Each invocation therefore arms an
  * event-time timeout at the minimum pending probe's ts: when the
  * global watermark passes it, Spark wakes the key with no rows
  * (Spark's no-data micro-batch after a watermark advance triggers
  * this even on an idle stream) and the probe emits. A key holding
  * only versions needs no wake-up — that remainder IS the retained
  * dimension snapshot (one version after the horizon passes), the
  * minimum any temporal join keeps per key, same as Flink's.
  *
  * ==Contract==
  * (key, ts) should be unique on the versions side (pre-aggregate if
  * not); ties probe.ts == version.ts match inclusively (consistent
  * with [[graft.relational.AsofJoin]] and DuckDB ASOF `>=`). Rows
  * later than the watermark are DROPPED before the operator — the
  * standard contract for event-time-timeout stateful ops, uniform for
  * both sides. Streaming-only (the watermark drives emission); the
  * batch equivalent is [[graft.relational.AsofJoin]].
  */
object TemporalJoin {

  final case class Probe(key: Long, ts_us: Long, probe_id: Long)
  final case class Version(key: Long, ts_us: Long, version_id: Long)
  final case class Resolved(key: Long, ts_us: Long, probe_id: Long,
      version_id: Option[Long], version_ts: Option[Long])

  /** Internal union row: probes and versions share one grouped stream. */
  final case class Tagged(key: Long, ts_us: Long, id: Long, is_probe: Boolean)

  /** Per-key buffers, (ts, id) pairs; `versions` kept sorted by ts. */
  final case class TJState(probes: Seq[(Long, Long)], versions: Seq[(Long, Long)])

  /** Fold one key's new rows into the buffers and emit every probe the
    * watermark has finalized. Pure over (rows, state, watermark) —
    * spec-driven directly via TestGroupState. Also the timeout
    * handler: a woken key arrives here with an empty iterator and an
    * advanced watermark, and the same body flushes it.
    */
  def updateKey(key: Long, rows: Iterator[Tagged],
      state: GroupState[TJState]): Iterator[Resolved] = {
    // getCurrentWatermarkMs is 0 until the first watermark commits;
    // nothing emits before one exists
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val prev = state.getOption.getOrElse(TJState(Nil, Nil))
    val (newProbes, newVersions) = rows.toSeq.partition(_.is_probe)
    val probes = prev.probes ++ newProbes.map(t => (t.ts_us, t.id))
    // prev.versions is already sorted; only re-sort when this batch
    // actually added versions (probe-heavy batches stay O(V))
    val versions =
      if (newVersions.isEmpty) prev.versions
      else (prev.versions ++ newVersions.map(t => (t.ts_us, t.id))).sortBy(_._1)

    val (ready, pending) = probes.partition(_._1 < wmUs)
    // both sequences sorted → one two-pointer pass, O(P + V), instead
    // of a version-prefix scan per probe
    val out = {
      val vs = versions.toIndexedSeq
      var vi = 0
      var last: Option[(Long, Long)] = None
      ready.sorted.map { case (pts, pid) =>
        while (vi < vs.length && vs(vi)._1 <= pts) { last = Some(vs(vi)); vi += 1 }
        last match {
          case Some((vts, vid)) => Resolved(key, pts, pid, Some(vid), Some(vts))
          case None             => Resolved(key, pts, pid, None, None)
        }
      }
    }

    // evict: below the watermark only the LATEST version can still
    // match a future probe; everything at-or-after it stays
    val (below, above) = versions.partition(_._1 < wmUs)
    val kept = below.takeRight(1) ++ above
    if (pending.isEmpty && kept.isEmpty) state.remove()
    else {
      state.update(TJState(pending, kept))
      // arm the wake-up for the oldest pending probe: it finalizes once
      // wmMs*1000 > ts_us, i.e. at watermark ts_us/1000 + 1 ms (always
      // > the current watermark, since pending means ts_us >= wmUs)
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1L)
    }
    out.iterator
  }

  /** Resolve a probe stream against a version stream. `delay` is the
    * max out-of-orderness tolerated on each side (the watermark
    * horizon — also the emission latency).
    */
  def resolve(probes: Dataset[Probe], versions: Dataset[Version],
      delay: String): Dataset[Resolved] = {
    implicit val tagEnc = Encoders.product[Tagged]
    implicit val stEnc = Encoders.product[TJState]
    implicit val outEnc = Encoders.product[Resolved]
    implicit val keyEnc = Encoders.scalaLong
    def side(df: Dataset[_], isProbe: Boolean): Dataset[Tagged] = {
      val idCol = if (isProbe) "probe_id" else "version_id"
      df.toDF()
        .select(col("key"), col("ts_us"), col(idCol).as("id"),
          lit(isProbe).as("is_probe"),
          timestamp_micros(col("ts_us")).as("event_ts"))
        .withWatermark("event_ts", delay)
        .as[Tagged]
    }
    side(probes, isProbe = true).unionByName(side(versions, isProbe = false))
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateKey)
  }
}
