package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkTestBase
import TemporalJoin._

/** The stream-stream temporal join's state machine, driven directly at
  * controlled watermarks (TestGroupState), plus a MemoryStream e2e run
  * checked against the batch as-of oracle.
  */
class TemporalJoinSpec extends SparkTestBase {

  private def st(wmMs: Long, init: Option[TJState] = None, timedOut: Boolean = false) =
    TestGroupState.create[TJState](
      init.map(Optional.of[TJState]).getOrElse(Optional.empty[TJState]()),
      GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs =
        Optional.of(wmMs: java.lang.Long).asInstanceOf[Optional[Long]],
      hasTimedOut = timedOut)

  private def probe(ts: Long, id: Long) = Tagged(1L, ts, id, is_probe = true)
  private def version(ts: Long, id: Long) = Tagged(1L, ts, id, is_probe = false)

  test("probes buffer until the watermark passes them, then resolve finally") {
    // watermark 0: nothing emits, everything buffers
    val s0 = st(wmMs = 0)
    val out0 = updateKey(1L,
      Iterator(probe(5_000_000L, 10), version(4_000_000L, 100)), s0).toSeq
    assert(out0.isEmpty)
    assert(s0.get == TJState(Seq((5_000_000L, 10L)), Seq((4_000_000L, 100L))))

    // watermark passes the probe: it resolves against the version even
    // though BOTH arrived in earlier batches (cross-batch state)
    val s1 = st(wmMs = 6_000, init = Some(s0.get))
    val out1 = updateKey(1L, Iterator.empty, s1).toSeq
    assert(out1 == Seq(Resolved(1L, 5_000_000L, 10L, Some(100L), Some(4_000_000L))))
  }

  test("out-of-order version arriving later still wins if closer to the probe") {
    // probe at 10s buffers; version at 3s arrives first, version at 7s
    // arrives in a LATER batch — the 7s one must be the match
    val s0 = st(wmMs = 0)
    updateKey(1L, Iterator(probe(10_000_000L, 10), version(3_000_000L, 100)), s0)
    val s1 = st(wmMs = 2_000, init = Some(s0.get))
    val out1 = updateKey(1L, Iterator(version(7_000_000L, 101)), s1).toSeq
    assert(out1.isEmpty, "probe at 10s must not emit at watermark 2s")
    val s2 = st(wmMs = 11_000, init = Some(s1.get))
    val out2 = updateKey(1L, Iterator.empty, s2).toSeq
    assert(out2 == Seq(Resolved(1L, 10_000_000L, 10L, Some(101L), Some(7_000_000L))))
  }

  test("tie at equal ts matches inclusively; no prior version resolves to None") {
    val s = st(wmMs = 100_000)
    val out = updateKey(1L, Iterator(
      probe(50_000_000L, 10), version(50_000_000L, 100), // tie → match
      probe(40_000_000L, 11)                             // before any version
    ), s).toSeq.sortBy(_.probe_id)
    assert(out == Seq(
      Resolved(1L, 50_000_000L, 10L, Some(100L), Some(50_000_000L)),
      Resolved(1L, 40_000_000L, 11L, None, None)))
  }

  test("eviction keeps exactly one version below the watermark plus all above") {
    val s = st(wmMs = 10_000)
    updateKey(1L, Iterator(
      version(1_000_000L, 100), version(5_000_000L, 101), // below wm: only 101 kept
      version(9_999_999L, 102),                           // below wm (wm=10s)... no: latest below
      version(15_000_000L, 103)                           // above wm: kept
    ), s)
    assert(s.get == TJState(Nil, Seq((9_999_999L, 102L), (15_000_000L, 103L))))
    // a future probe (ts >= wm by the watermark contract) still resolves
    // correctly against the retained latest-below version
    val s2 = st(wmMs = 13_000, init = Some(s.get))
    val out = updateKey(1L, Iterator(probe(12_000_000L, 10)), s2).toSeq
    assert(out == Seq(Resolved(1L, 12_000_000L, 10L, Some(102L), Some(9_999_999L))))
  }

  test("state clears when nothing remains buffered") {
    val s = st(wmMs = 100_000)
    updateKey(1L, Iterator(probe(5_000_000L, 10)), s)
    assert(s.isRemoved, "fully-drained key must not hold state forever")
  }

  test("pending probes arm a timeout; a timed-out quiescent key flushes with no rows") {
    // probe buffers (above watermark) → timeout armed at ts/1000 + 1
    val s0 = st(wmMs = 1_000)
    val out0 = updateKey(1L,
      Iterator(probe(5_000_000L, 10), version(4_000_000L, 100)), s0).toSeq
    assert(out0.isEmpty)
    assert(s0.getTimeoutTimestampMs.get() == 5_001L,
      "wake-up must be armed exactly when the watermark finalizes the probe")
    // the key receives NO further traffic: Spark wakes it via timeout
    // with an empty iterator once the watermark passes — it must emit
    val s1 = st(wmMs = 6_000, init = Some(s0.get), timedOut = true)
    val out1 = updateKey(1L, Iterator.empty, s1).toSeq
    assert(out1 == Seq(Resolved(1L, 5_000_000L, 10L, Some(100L), Some(4_000_000L))))
    // only the retained dimension snapshot (latest version) remains
    assert(s1.get == TJState(Nil, Seq((4_000_000L, 100L))))
    // GroupState timeouts do not persist across invocations — they must
    // be re-armed each call, and with no pending probes none is needed
    assert(!s1.getTimeoutTimestampMs.isPresent,
      "no pending probes → no re-armed wake-up")
  }

  test("e2e MemoryStream run ≡ batch as-of for all watermark-finalized probes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val pIn = MemoryStream[Probe]
    val vIn = MemoryStream[Version]
    val q = TemporalJoin.resolve(pIn.toDS(), vIn.toDS(), delay = "2 seconds")
      .writeStream.format("memory").queryName("tj_e2e")
      .outputMode("append").start()

    val s = 1_000_000L // 1s in µs
    // batch 1: interleaved out-of-order rows across two keys; nothing
    // can emit yet (no committed watermark during the first batch)
    vIn.addData(Version(1, 10 * s, 100), Version(1, 30 * s, 101), Version(2, 5 * s, 200))
    pIn.addData(Probe(1, 9 * s, 1), Probe(1, 10 * s, 2), Probe(1, 35 * s, 3),
      Probe(2, 4 * s, 4), Probe(2, 50 * s, 5))
    q.processAllAvailable()
    // batch 2 runs at wm = min(50, 30) - 2 = 28s (global watermark is
    // the MIN across both inputs): probes 1, 2 (key 1) and 4 (key 2)
    // finalize; the 33s version arrives now, before any probe at/after
    // it has emitted — event-time-correct for probes 3 and 6
    vIn.addData(Version(1, 33 * s, 102), Version(1, 200 * s, 110))
    pIn.addData(Probe(1, 36 * s, 6), Probe(2, 201 * s, 7))
    q.processAllAvailable()
    // batch 3 at wm = min(201, 200) - 2 = 198s: probes 3, 6, 5 finalize.
    // Both sides' maxima must advance (the global watermark is their
    // MIN); after this batch wm = 498s, past probe 7 (201s) — which
    // receives NO further rows and must flush via its armed event-time
    // timeout (Spark's no-data micro-batch after the advance wakes the
    // key with an empty iterator)
    pIn.addData(Probe(1, 500 * s, 8))
    vIn.addData(Version(2, 500 * s, 210))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tj_e2e").as[Resolved].collect()
      .map(r => r.probe_id -> ((r.version_id, r.version_ts))).toMap
    // probe 8 (500s) stays buffered: the final watermark (498s) never
    // passed it — emission is watermark-horizon-delayed by design
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    val expected = Map(
      1L -> ((None, None)),               // before any version
      2L -> ((Some(100L), Some(10 * s))), // inclusive tie
      3L -> ((Some(102L), Some(33 * s))), // the out-of-order 33s version wins
      4L -> ((None, None)),
      5L -> ((Some(200L), Some(5 * s))),
      6L -> ((Some(102L), Some(33 * s))),
      7L -> ((Some(200L), Some(5 * s))))  // timeout-flushed, quiescent key
    assert(got == expected)

    // and the emitted set agrees with the batch as-of operator (the
    // operators' shared semantics, restricted to finalized probes)
    val probes = Seq(Probe(1, 9 * s, 1), Probe(1, 10 * s, 2), Probe(1, 35 * s, 3),
      Probe(2, 4 * s, 4), Probe(2, 50 * s, 5), Probe(1, 36 * s, 6),
      Probe(2, 201 * s, 7)).toDF("key", "ts_us", "probe_id")
    val versions = Seq(Version(1, 10 * s, 100), Version(1, 30 * s, 101),
      Version(2, 5 * s, 200), Version(1, 33 * s, 102), Version(1, 200 * s, 110),
      Version(2, 500 * s, 210))
      .toDF("key", "ts_us", "version_id")
      .withColumn("version_ts", col("ts_us"))
    val batch = graft.relational.AsofJoin.asofJoin(probes, versions,
        key = "key", ts = "ts_us", payload = Seq("version_id", "version_ts"))
      .as[Resolved].collect()
      .map(r => r.probe_id -> ((r.version_id, r.version_ts))).toMap
    assert(got == batch)
  }
}
