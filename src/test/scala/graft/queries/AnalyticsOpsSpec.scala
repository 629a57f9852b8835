package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Multidimensional-report and pipeline operators (q60–q64, q68–q73):
  * planted-known-answer cases on synthetic tables plus structural
  * invariants on the real testdata — the DuckDB oracle covers exact
  * parity at the gate; these pin the semantics the oracle SQL was
  * derived from.
  */
class AnalyticsOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("analytics-spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q60 rollup emits all three levels and they reconcile") {
    val dir = writeDocs(Seq(
      (1L, "a", "en", "web", 10L),
      (2L, "b", "en", "web", 20L),
      (3L, "c", "de", "web", 30L),
      (4L, "d", "en", "books", 40L)))
    val out = AnalyticsOpsQueries.q60RollupScorecard(spark, dir)
      .select("source", "lang", "g_source", "g_lang", "n_docs", "total_chars")
      .as[(String, String, Int, Int, Long, Long)].collect().toSeq
    val grand = out.filter(r => r._3 == 1 && r._4 == 1)
    assert(grand == Seq(("(all)", "(all)", 1, 1, 4L, 100L)))
    val perSource = out.filter(r => r._3 == 0 && r._4 == 1)
      .map(r => r._1 -> (r._5, r._6)).toMap
    assert(perSource == Map("web" -> (3L, 60L), "books" -> (1L, 40L)))
    val leaves = out.filter(r => r._3 == 0 && r._4 == 0)
    // leaf counts sum to each source subtotal, subtotals to the total
    assert(leaves.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
      == perSource.view.mapValues(_._1).toMap)
    assert(leaves.map(_._5).sum == 4L)
  }

  test("q61 pivot declares fixed columns and zero-fills absent classes") {
    val dir = writeDocs(Seq(
      (1L, "a", "en", "web", 100L),   // short
      (2L, "b", "en", "web", 1500L),  // medium
      (3L, "c", "en", "web", 5000L),  // long
      (4L, "d", "de", "web", 100L)))  // de has only short
    val out = AnalyticsOpsQueries.q61PivotLengthClasses(spark, dir)
    assert(out.columns.toSeq == Seq("lang", "short", "medium", "long"))
    val m = out.as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(m("en") == (1L, 1L, 1L))
    assert(m("de") == (1L, 0L, 0L), "missing classes must read 0, not null")
  }

  test("q62 lag gaps: known cadence, first event excluded") {
    val dir = java.nio.file.Files.createTempDirectory("analytics-spec").toString
    // ts stored as epoch-nanos longs (the events-table convention)
    val sec = 1000000000L
    Seq(
      (1L, 10L * sec, 7L, "view", 0.0, ""),
      (2L, 13L * sec, 7L, "view", 0.0, ""),   // gap 3s
      (3L, 19L * sec, 7L, "view", 0.0, ""),   // gap 6s
      (4L, 50L * sec, 8L, "view", 0.0, ""))   // single event -> no gaps
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q62EventDeltas(spark, dir)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq((7L, 2L, 4500000.0, 6000000L)),
      s"user 8 must not appear (no gaps); got $out")
  }

  test("q63 ntile buckets are equal-count, ordered, and exhaustive") {
    val dir = "/root/testdata/sf0.001"
    val out = AnalyticsOpsQueries.q63SizeDeciles(spark, dir)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == (1 to 10))
    val total = graft.core.Tables.load(spark, dir, "documents").count()
    assert(out.map(_._2).sum == total)
    // ntile: bucket sizes differ by at most 1, larger buckets first
    val sizes = out.map(_._2)
    assert(sizes.max - sizes.min <= 1 && sizes == sizes.sortBy(-_))
    // deciles are non-overlapping and ascending in char range
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a._4 <= b._3, s"decile ranges overlap: $a vs $b")
    case _ => ()
    }
  }

  test("q68 value-cut deciles cover all docs with ascending disjoint ranges") {
    val dir = "/root/testdata/sf0.001"
    val out = AnalyticsOpsQueries.q68DecileBuckets(spark, dir)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val total = graft.core.Tables.load(spark, dir, "documents").count()
    assert(out.map(_._2).sum == total, "every doc lands in exactly one bucket")
    assert(out.map(_._1) == out.map(_._1).sorted && out.map(_._1).distinct == out.map(_._1))
    out.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 <= b._3, s"bucket ranges overlap: $a vs $b")
      case _ => ()
    }
    // value-cut buckets track q63's equal-count deciles loosely: no
    // bucket may be empty-by-construction beyond tie collapse, and
    // every bucket holds at most ~2x the equal share at this data
    val share = total / 10.0
    assert(out.forall(_._2 <= 2 * share + 1), s"degenerate bucketing: $out")
  }

  test("q70 native session_window: merge within gap, split at exact gap") {
    val dir = java.nio.file.Files.createTempDirectory("analytics-spec").toString
    val min = 60L * 1000000000L // one minute in nanos
    Seq(
      (1L, 0L * min, 7L, "view", 0.0, ""),
      (2L, 10L * min, 7L, "view", 0.0, ""),  // merges: 10 < 30 gap
      (3L, 50L * min, 7L, "view", 0.0, ""),  // splits: 40 > 30
      (4L, 0L * min, 8L, "view", 0.0, ""),
      (5L, 30L * min, 8L, "view", 0.0, ""),  // exact gap boundary: MERGES
      (6L, 61L * min, 8L, "view", 0.0, ""))  // 31 > 30: splits
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q70SessionWindow(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val us = 60L * 1000000L
    assert(out == Seq(
      (7L, 0L, 10 * us + 30 * us, 2L),   // session covers both events + gap
      (7L, 50 * us, 80 * us, 1L),
      (8L, 0L, 60 * us, 2L),             // event AT the gap chains the session
      (8L, 61 * us, 91 * us, 1L)), s"got $out")
  }

  test("q71 JSON parse: malformed and missing-key rows null out, not fail") {
    val dir = java.nio.file.Files.createTempDirectory("analytics-spec").toString
    Seq(
      (1L, 0L, 1L, "view", 0.0, """{"k": 5}"""),
      (2L, 0L, 1L, "view", 0.0, """{"k": 7}"""),
      (3L, 0L, 1L, "view", 0.0, """not json at all"""),
      (4L, 0L, 1L, "view", 0.0, """{"other": 1}"""),
      (5L, 0L, 1L, "click", 0.0, """{"k": 2}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q71JsonExtract(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    // count(k) skips the malformed and missing-key rows; sums unaffected
    assert(out == Seq(("click", 1L, 2L, 2.0), ("view", 2L, 12L, 6.0)), s"got $out")
  }

  test("q72 temperature mixture upweights small strata, caps at full keep") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val natural = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val out = AnalyticsOpsQueries.q72TemperatureMixture(spark, dir)
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // realized keep fraction must be monotone DECREASING in stratum
    // size (alpha=0.5 flattens the distribution): order languages by
    // natural size and compare adjacent realized rates with slack for
    // md5-bucket quantization at small counts
    val rates = natural.keys.toSeq.sortBy(natural)
      .map(l => kept.getOrElse(l, 0L).toDouble / natural(l))
    rates.sliding(2).foreach {
      case Seq(small, big) =>
        assert(small >= big - 0.15, s"smaller stratum kept at lower rate: $rates")
      case _ => ()
    }
    // the smallest language must be kept (almost) fully: expected
    // keep_rate there is min(1, ...) = 1 at alpha < 1
    val smallest = natural.minBy(_._2)._1
    assert(kept(smallest) >= (natural(smallest) * 0.95).toLong,
      s"smallest stratum not preserved: ${kept(smallest)}/${natural(smallest)}")
    // rerun-stable (content-keyed, no RNG)
    val out2 = AnalyticsOpsQueries.q72TemperatureMixture(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    assert(out.as[(Long, String, Long)].collect().toSeq == out2)
  }

  test("q73 chunking: stride windows, boundary docs, short-doc single chunk") {
    val dir = writeDocs(Seq(
      (1L, "a" * 900, "en", "web", 900L),   // chunks 500, 500, 100
      (2L, "b" * 300, "en", "web", 300L),   // single short chunk
      (3L, "c" * 400, "en", "web", 400L),   // exactly one stride: one chunk
      (4L, "d" * 401, "en", "web", 401L)))  // one char past: second chunk of 1
    val out = AnalyticsOpsQueries.q73DocChunks(spark, dir)
      .select("doc_id", "chunk_idx", "chunk_len")
      .as[(Long, Int, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 500), (1L, 1, 500), (1L, 2, 100),
      (2L, 0, 300),
      (3L, 0, 400),
      (4L, 0, 401), (4L, 1, 1)), s"got $out")
    // overlap: consecutive chunks share 100 chars (500-char chunk,
    // 400 stride) — verifiable through the md5 of uniform docs: chunk
    // 0 and 1 of doc 1 are both 500 a's, hence identical hashes
    val hashes = AnalyticsOpsQueries.q73DocChunks(spark, dir)
      .filter(col("doc_id") === 1L && col("chunk_idx") < 2)
      .select("chunk_md5").as[String].collect().toSet
    assert(hashes.size == 1)
  }

  test("q64 diff keeps new content, drops re-crawled copies by hash") {
    // ids 1..10: cut_a = 1+(9*8)/10 = 8 (A = ids 1..8), cut_b = 2 (B = 2..10)
    // B-only ids are 9 and 10; all-unique texts -> both are new content
    val dir = writeDocs(Seq.tabulate(10) { i =>
      val id = (i + 1).toLong
      (id, s"text $id", "en", "web", 10L)
    })
    val out = AnalyticsOpsQueries.q64SnapshotDiff(spark, dir)
      .as[(Long, String)].collect().toSeq.map(_._1)
    assert(out == Seq(9L, 10L), s"unexpected diff: $out")
    // plant id 9 as an exact re-crawl of doc 1 -> only 10 is new content
    val dir2 = writeDocs(Seq.tabulate(10) { i =>
      val id = (i + 1).toLong
      val text = if (id == 9L) "text 1" else s"text $id"
      (id, text, "en", "web", 10L)
    })
    val out2 = AnalyticsOpsQueries.q64SnapshotDiff(spark, dir2)
      .as[(Long, String)].collect().toSeq.map(_._1)
    assert(out2 == Seq(10L), s"re-crawled copy (id 9) must be excluded: $out2")
  }

  test("q118 co-engagement: perfect overlap scores 1.0, the basket cap binds") {
    var eid = 0L
    def ev(user: Long, item: Long): (Long, Long, Long, String, Double, String) = {
      eid += 1; (eid, eid * 1000000000L, user, "view", 0.0, s"""{"k": $item}""")
    }
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("analytics-spec").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      dir
    }
    // users 1..6 all engage items 1 and 2 -> pair (1,2) cosine exactly 1;
    // users 1..3 also engage item 3 -> (1,3)/(2,3) cosine 3/sqrt(18)
    val dir1 = write((1L to 6L).flatMap(u => Seq(ev(u, 1L), ev(u, 2L))) ++
      (1L to 3L).map(u => ev(u, 3L)))
    val out = AnalyticsOpsQueries.q118ItemCooccurrence(spark, dir1)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.head == (1L, 2L, 6L, 6L, 6L, 1000000L),
      s"perfect-overlap pair must lead with cosine 1.0: ${out.head}")
    val p13 = out.find(r => r._1 == 1L && r._2 == 3L).get
    assert(p13._3 == 3L && p13._6 == math.floor(3.0 / math.sqrt(18.0) * 1e6 + 0.5).toLong)
    // users 7..9 each engage 40 items (200..239) once: the 32-item cap
    // (count ties -> item asc) keeps 200..231, so no pair touches >=232
    val dir2 = write((7L to 9L).flatMap(u => (200L to 239L).map(i => ev(u, i))))
    val out2 = AnalyticsOpsQueries.q118ItemCooccurrence(spark, dir2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out2.size == 100, "496 capped 1.0-pairs cut to the top-100")
    val items2 = out2.flatMap(r => Seq(r._1, r._2))
    assert(items2.max <= 231L,
      s"cap must exclude items beyond rank 32: max=${items2.max}")
    assert(out2.forall(r => r._3 == 3L && r._6 == 1000000L),
      "every surviving pair has full 3-user support and cosine 1.0")
  }

  test("q125 percentile curve: exact rank ratios, ties share both statistics") {
    val dir = writeDocs(Seq(
      (1L, "a", "en", "web", 10L),
      (2L, "b", "en", "web", 20L),
      (3L, "c", "en", "web", 20L),   // tie with doc 2
      (4L, "d", "en", "web", 40L),
      (5L, "e", "en", "books", 7L))) // singleton stratum
    val out = AnalyticsOpsQueries.q125PercentileCurve(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      // books: single row -> cume_dist 1, percent_rank 0 (n-1 = 0 case)
      ("books", 5L, 7L, 1000000L, 0L),
      ("web", 1L, 10L, 250000L, 0L),
      ("web", 2L, 20L, 750000L, 333333L),  // ties share 3/4 and 1/3
      ("web", 3L, 20L, 750000L, 333333L),
      ("web", 4L, 40L, 1000000L, 1000000L)), s"got $out")
  }

  test("q119 sliding 7-day distinct: no double count, windows anchor on observed days") {
    val dir = java.nio.file.Files.createTempDirectory("analytics-spec").toString
    val day = 86400L * 1000000000L // nanos
    Seq(
      (1L, 0L, 1L, "view", 0.0, ""),            // user 1, day 0
      (2L, 3 * day, 1L, "view", 0.0, ""),       // user 1 again, day 3
      (3L, 3 * day + 5L, 2L, "view", 0.0, ""),  // user 2, day 3
      (4L, 9 * day, 3L, "view", 0.0, ""))       // user 3, day 9 (outside 7d of day 3)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q119SlidingActiveUsers(spark, dir)
      .as[(java.sql.Date, Long, Long)].collect().toSeq
      .map(r => (r._1.toString, r._2, r._3))
    assert(out == Seq(
      ("1970-01-01", 1L, 1L),  // only user 1 so far
      ("1970-01-04", 2L, 2L),  // users {1,2}; user 1 active twice, counted ONCE
      ("1970-01-10", 1L, 3L)), // trailing [day 3, day 9] holds users {1,2,3}
      s"got $out")
  }
}
