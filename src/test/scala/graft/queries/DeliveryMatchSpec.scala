package graft.queries

import graft.SparkTestBase

/** q140 sliding-window event dedup and q141 length-matched sampling:
  * planted chains and planted skewed distributions.
  */
class DeliveryMatchSpec extends SparkTestBase {
  import spark.implicits._

  test("q140: extending chain keeps one head; post-window recurrence kept; other value untouched") {
    val dir = java.nio.file.Files.createTempDirectory("delivery-spec").toString
    val m = 60L * 1000000000L // one minute in nanos
    // user 1, type "view", value 1.0 at t = 0, 6m, 12m (chain), 30m (fresh)
    // user 1, type "view", value 2.0 at t = 1m (different identity)
    Seq(
      (1L, 0L * m, 1L, "view", 1.0, "{}"),
      (2L, 6L * m, 1L, "view", 1.0, "{}"),
      (3L, 12L * m, 1L, "view", 1.0, "{}"),
      (4L, 30L * m, 1L, "view", 1.0, "{}"),
      (5L, 1L * m, 1L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = RelationalQueries.q140EventDedupWindow(spark, dir)
      .select("event_id", "kept", "dup_lag_us")
      .as[(Long, Int, Option[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((1, None)), "chain head kept")
    assert(out(2L) == ((0, Some(6L * 60 * 1000000))), "6m dup dropped, lag to head")
    assert(out(3L) == ((0, Some(12L * 60 * 1000000))),
      "12m dup dropped — the chain EXTENDS past the 10m window")
    assert(out(4L) == ((1, None)), "30m recurrence is a fresh island")
    assert(out(5L) == ((1, None)), "different value = different identity")
  }

  test("q156 funnel timing: hand-exact discrete quantiles; empty leg reports 0 sessions") {
    val dir = java.nio.file.Files.createTempDirectory("delivery-spec").toString
    val m = 60L * 1000000000L
    // one user, one session: view at 0, clicks at 1m and 3m (first counts),
    // no purchase anywhere; a second user converts view→click in 5m
    Seq(
      (1L, 0L * m, 1L, "view", 0.0, "{}"),
      (2L, 1L * m, 1L, "click", 0.0, "{}"),
      (3L, 3L * m, 1L, "click", 0.0, "{}"),
      (4L, 0L * m, 2L, "view", 0.0, "{}"),
      (5L, 5L * m, 2L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = RelationalQueries.q156FunnelTiming(spark, dir)
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("click_to_purchase") == (("click_to_purchase", 0L, None, None)))
    // deltas: 1m (user 1, first click), 5m (user 2); n=2 → p50 = 1st (ceil 1),
    // p90 = 2nd (ceil 1.8 → 2)
    assert(out("view_to_click") ==
      (("view_to_click", 2L, Some(1L * 60 * 1000000), Some(5L * 60 * 1000000))),
      s"got ${out("view_to_click")}")
  }

  test("q141: per-decile histograms equalize across sources; absent buckets zero everyone") {
    val dir = java.nio.file.Files.createTempDirectory("delivery-spec").toString
    // source A: lengths 1..10 (one per corpus decile);
    // source B: lengths 1..5 doubled (only the short half, 2 per bucket)
    val rows = (1 to 10).map(i => (i.toLong, s"a$i", "en", "A", i.toLong)) ++
      (1 to 5).flatMap(i => Seq(
        (100L + i, s"b$i", "en", "B", i.toLong),
        (200L + i, s"c$i", "en", "B", i.toLong)))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q141MatchedSample(spark, dir)
      .as[(String, Int, Long, Long)].collect().toSeq
    val hist = out.groupBy(r => (r._1, r._2)).view.mapValues(_.size).toMap
    val decs = out.map(_._2).distinct.sorted
    // every surviving decile has the SAME count for A and B
    decs.foreach { d =>
      assert(hist.getOrElse(("A", d), 0) == hist.getOrElse(("B", d), 0),
        s"decile $d unmatched: $hist")
    }
    // B has nothing above length 5: those corpus deciles are zeroed for A too
    assert(out.forall(_._4 <= 5L),
      s"lengths beyond B's support must vanish for every source: $out")
    assert(out.nonEmpty, "the matched region itself must survive")
  }
}
