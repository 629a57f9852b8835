package graft.queries

import graft.SparkTestBase

/** q168 MI profile, q169 Spearman, q170 RFM, q171 Gini: hand-exact
  * plants at the boundary values (NMI 0/1, rho ±1, gini 0/known).
  */
class StatsAuditSpec extends SparkTestBase {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String, String, Long)]) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("q168: language-siloed sources hit NMI 1e6; independent dims hit 0") {
    val dir1 = java.nio.file.Files.createTempDirectory("q168-spec").toString
    docsDf(Seq((1L, "a", "en", "A", 1L), (2L, "b", "en", "A", 1L),
      (3L, "c", "fr", "B", 1L), (4L, "d", "fr", "B", 1L)))
      .write.parquet(s"$dir1/documents.parquet")
    val silo = CorpusOpsQueries.q168MiProfile(spark, dir1)
      .as[(Long, Long, Long, Long, Long)].head()
    // H = ln 2 in micro summed over 2 symbols: 2 * floor(0.5*ln2*1e6+0.5)
    assert(silo == ((4L, 693148L, 693148L, 693148L, 1000000L)), s"silo: $silo")

    val dir2 = java.nio.file.Files.createTempDirectory("q168-spec").toString
    docsDf(Seq((1L, "a", "en", "A", 1L), (2L, "b", "fr", "A", 1L),
      (3L, "c", "en", "B", 1L), (4L, "d", "fr", "B", 1L)))
      .write.parquet(s"$dir2/documents.parquet")
    val indep = CorpusOpsQueries.q168MiProfile(spark, dir2)
      .as[(Long, Long, Long, Long, Long)].head()
    assert((indep._4, indep._5) == ((0L, 0L)), s"independent: $indep")
  }

  test("q169: reversed ranks score exactly -1e6, aligned ranks +1e6") {
    // bpe token count drives rank b: 'aa bb cc'=3, 'aa bb'=2, 'aa'=1
    val dir1 = java.nio.file.Files.createTempDirectory("q169-spec").toString
    docsDf(Seq((1L, "aa bb cc", "en", "s", 10L), (2L, "aa bb", "en", "s", 20L),
      (3L, "aa", "en", "s", 30L)))
      .write.parquet(s"$dir1/documents.parquet")
    val rev = AnalyticsOpsQueries.q169RankCorrelation(spark, dir1)
      .as[(Long, Long, Long, Long)].head()
    assert(rev == ((3L, 8L, 0L, -1000000L)), s"reversed: $rev")

    val dir2 = java.nio.file.Files.createTempDirectory("q169-spec").toString
    docsDf(Seq((1L, "aa", "en", "s", 10L), (2L, "aa bb", "en", "s", 20L),
      (3L, "aa bb cc", "en", "s", 30L)))
      .write.parquet(s"$dir2/documents.parquet")
    val fwd = AnalyticsOpsQueries.q169RankCorrelation(spark, dir2)
      .as[(Long, Long, Long, Long)].head()
    assert(fwd == ((3L, 0L, 1000000L, 1000000L)), s"aligned: $fwd")
  }

  test("q169: 25k-doc corpus does not wrap int64 (numerator ~1.6e19)") {
    // 2n(n^2-1)*5e5 at n=25000 is 1.56e19 > Long.MaxValue: the naive
    // int64 spelling silently wraps under ansi=false and reports a
    // garbage rho. Identical docs tie everywhere, so both rank orders
    // fall back to doc_id and sum_d2 = 0 -> rho must be EXACTLY +1e6.
    val dir = java.nio.file.Files.createTempDirectory("q169-ovf").toString
    (1 to 25000).map(i => (i.toLong, "aa bb", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = AnalyticsOpsQueries.q169RankCorrelation(spark, dir)
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((25000L, 0L, 1000000L, 1000000L)), s"overflow regression: $out")
  }

  test("q170: distinct metrics make every quintile a singleton; best user scores 555") {
    val dir = java.nio.file.Files.createTempDirectory("q170-spec").toString
    val day = 86400L * 1000000000L
    // user i: last active day i, i events, value sum i dollars -> user 5
    // is best on all three axes
    val rows = (1 to 5).flatMap { u =>
      (1 to u).map(k => ((u * 10 + k).toLong, u * day, u.toLong, "buy",
        1.0, ""))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q170RfmFeatures(spark, dir)
      .as[(Long, Long, Long, Long, Int, Int, Int, Int)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    out.foreach { r =>
      val u = r._1.toInt
      assert(r._2 == 5L - u && r._3 == u.toLong && r._4 == u * 100L, s"features: $r")
      assert((r._5, r._6, r._7, r._8) == ((u, u, u, u * 111)), s"scores: $r")
    }
  }

  test("q172: monolingual source scores H=1e6; a 50/50 source halves it") {
    val dir = java.nio.file.Files.createTempDirectory("q172-spec").toString
    docsDf(Seq((1L, "a", "en", "MONO", 1L), (2L, "b", "en", "MONO", 1L),
      (3L, "c", "en", "DUO", 1L), (4L, "d", "fr", "DUO", 1L)))
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q172SimpsonDiversity(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("MONO") == (("MONO", 2L, 1L, 1000000L, 1000000L)), s"${out("MONO")}")
    assert(out("DUO") == (("DUO", 2L, 2L, 500000L, 2000000L)), s"${out("DUO")}")
    // corpus row: 3 en 1 fr over 4 -> (9+1)*1e6//16 = 625000
    assert(out("(all)")._4 == 625000L, s"${out("(all)")}")
  }

  test("q173: dominance removes equal-length worse rows and shorter worse rows") {
    val dir = java.nio.file.Files.createTempDirectory("q173-spec").toString
    // (chars, tokens): (20,3) dominates (20,4) and (10,5); (5,1) survives
    // on the token axis
    docsDf(Seq((1L, "aa bb cc dd ee", "en", "s", 10L),
      (2L, "aa bb cc", "en", "s", 20L),
      (3L, "aa bb cc dd", "en", "s", 20L),
      (4L, "aa", "en", "s", 5L)))
      .write.parquet(s"$dir/documents.parquet")
    val out = AnalyticsOpsQueries.q173ParetoSkyline(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 20L, 3L), (4L, 5L, 1L)), s"got $out")
  }

  test("q174: a symmetric 2-cycle stays uniform; an absorbing state takes all mass") {
    val sec = 1000000000L
    val dir1 = java.nio.file.Files.createTempDirectory("q174-spec").toString
    // user 1: A B A B -> A->B, B->A only; uniform is stationary
    Seq((1L, 1 * sec, 1L, "A", 0.0, ""), (2L, 2 * sec, 1L, "B", 0.0, ""),
      (3L, 3 * sec, 1L, "A", 0.0, ""), (4L, 4 * sec, 1L, "B", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir1/events.parquet")
    val cyc = RelationalQueries.q174MarkovStationary(spark, dir1)
      .as[(String, Long)].collect().toMap
    assert(cyc == Map("A" -> 500000000L, "B" -> 500000000L), s"cycle: $cyc")

    val dir2 = java.nio.file.Files.createTempDirectory("q174-spec").toString
    // A->A twice (user 1), B->A once (user 2): A absorbs everything
    Seq((1L, 1 * sec, 1L, "A", 0.0, ""), (2L, 2 * sec, 1L, "A", 0.0, ""),
      (3L, 3 * sec, 1L, "A", 0.0, ""),
      (4L, 1 * sec, 2L, "B", 0.0, ""), (5L, 2 * sec, 2L, "A", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir2/events.parquet")
    val abs = RelationalQueries.q174MarkovStationary(spark, dir2)
      .as[(String, Long)].collect().toMap
    assert(abs == Map("A" -> 1000000000L, "B" -> 0L), s"absorbing: $abs")
  }

  test("q177: two equal sources interleave to perfect alternation (runs = n)") {
    val dir = java.nio.file.Files.createTempDirectory("q177-spec").toString
    docsDf((1 to 8).map(i =>
      (i.toLong, s"text $i", "en", if (i <= 4) "A" else "B", 10L)))
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q177RunsTest(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // equal sizes -> identical pos_micro ladders -> A/B alternate at each
    // tie -> 8 runs; expected for random = 1 + 2*16/8 = 5
    assert(out == ((8L, 4L, 4L, 8L, 5000000L, 1600000L)), s"got $out")
  }

  test("q178: a single doc owns its md5 shard with full share and 8x skew") {
    val dir = java.nio.file.Files.createTempDirectory("q178-spec").toString
    val text = "five tokens of shard text"
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    val shard = (md5(0) & 0xff) % 8
    docsDf(Seq((1L, text, "en", "s", text.length.toLong)))
      .write.parquet(s"$dir/documents.parquet")
    val out = PipelineQueries.q178ShardBalance(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((shard.toLong, 1L, 5L, 1000000L, 8000000L)), s"got $out")
  }

  test("q179: group-separated values score eta2 1e6; a constant column scores 0") {
    val dir1 = java.nio.file.Files.createTempDirectory("q179-spec").toString
    docsDf(Seq((1L, "a", "en", "A", 10L), (2L, "b", "en", "A", 10L),
      (3L, "c", "en", "B", 20L), (4L, "d", "en", "B", 20L)))
      .write.parquet(s"$dir1/documents.parquet")
    val sep = AnalyticsOpsQueries.q179AnovaEffect(spark, dir1)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(sep == ((2L, 4L, 100L, 100L, 1000000L)), s"separated: $sep")

    val dir2 = java.nio.file.Files.createTempDirectory("q179-spec").toString
    docsDf(Seq((1L, "a", "en", "A", 7L), (2L, "b", "en", "B", 7L)))
      .write.parquet(s"$dir2/documents.parquet")
    val const = AnalyticsOpsQueries.q179AnovaEffect(spark, dir2)
      .as[(Long, Long, Long, Long, Long)].head()
    assert((const._4, const._5) == ((0L, 0L)), s"constant: $const")
  }

  test("q180: a perfectly alternating daily series scores r1 = -1") {
    val dir = java.nio.file.Files.createTempDirectory("q180-spec").toString
    val day = 86400L * 1000000000L
    // daily counts 1, 2, 1, 2
    val rows = Seq((1L, 0 * day, 1L), (2L, 1 * day, 1L), (3L, 1 * day, 2L),
      (4L, 2 * day, 1L), (5L, 3 * day, 1L), (6L, 3 * day, 2L))
      .map { case (id, ts, u) => (id, ts, u, "view", 0.0, "") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q180DailyAutocorr(spark, dir)
      .as[(Long, Double)].head()
    assert(out == ((3L, -1.0)), s"got $out")
  }

  test("q181: a planted two-value tail pins the Hill estimate to ln 2") {
    val dir = java.nio.file.Files.createTempDirectory("q181-spec").toString
    // top-100 = 99 docs at 200 chars + the 100th at 100: terms are
    // 99 x floor(ln2*1e6+0.5) and one 0 -> mean = 693147
    val rows = (1 to 99).map(i => (i.toLong, "a", "en", "s", 200L)) ++
      (100 to 109).map(i => (i.toLong, "a", "en", "s", 100L))
    docsDf(rows).write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q181HillTailIndex(spark, dir)
      .as[(Long, Long, Long)].head()
    assert(out == ((100L, 100L, 693147L)), s"got $out")
  }

  test("q182: token thresholds classify docs into the right CDF buckets") {
    val dir = java.nio.file.Files.createTempDirectory("q182-spec").toString
    docsDf(Seq(
      (1L, "three small tokens", "en", "A", 18L),
      (2L, Seq.fill(200)("w").mkString(" "), "en", "A", 999L)))
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q182ContextFitCdf(spark, dir)
      .as[(String, Long, Long, Long, Long)].head()
    // doc 1: 3 bpe tokens (<=128); doc 2: 200 — fits 512 and 2048 only
    assert(out == (("A", 2L, 500000L, 1000000L, 1000000L)), s"got $out")
  }

  test("q183: epoch arithmetic pins weekday/hour cells (1970-01-01 is Thursday)") {
    val dir = java.nio.file.Files.createTempDirectory("q183-spec").toString
    val hour = 3600L * 1000000000L
    // ts 0 -> Thursday (dow 4) hour 0; day 4 + 5h -> Monday (dow 1) hour 5
    Seq((1L, 0L, 1L, "view", 0.0, ""),
      (2L, 4L * 24 * hour + 5 * hour, 2L, "view", 0.0, ""),
      (3L, 4L * 24 * hour + 5 * hour + 1000L, 2L, "view", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q183SeasonalProfile(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 5L, 2L, 1L), (4L, 0L, 1L, 1L)), s"got $out")
  }

  test("q184: rank cut points and the clamp reproduce the hand-winsorized mean") {
    val dir = java.nio.file.Files.createTempDirectory("q184-spec").toString
    // cents 1..10: p10 = rank ceil(1) = 1, p90 = rank 9 -> 9; the 10
    // clamps to 9 -> sum 54, mean 5.4 cents
    (1 to 10).map(i => (i.toLong, i.toLong * 1000000000L, 1L, "X", i / 100.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q184WinsorizedMean(spark, dir)
      .as[(String, Long, Long, Long, Long)].head()
    assert(out == (("X", 10L, 1L, 9L, 5400000L)), s"got $out")
  }

  test("q185: pack report invariants hold and reconcile with q41") {
    val sf = "/root/testdata/sf0.001"
    val out = PipelineQueries.q185PackEfficiency(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r._2 > 0 && r._3 > 0, s"empty split row: $r")
      assert(r._6 >= r._3 / r._2, s"max below mean: $r")
      assert(r._5 <= r._2, s"more overfull than packs: $r")
    }
    val q41Total = PipelineQueries.q41SequencePack(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("total_tokens"))
      .as[Long].head()
    assert(out.map(_._3).sum == q41Total, "token volume diverges from q41")
  }

  test("q186: long docs group with their tail variants; short docs stay singleton") {
    val dir = java.nio.file.Files.createTempDirectory("q186-spec").toString
    docsDf(Seq(
      (1L, (1 to 20).map(i => s"tok$i").mkString(" "), "en", "s", 99L),
      (2L, "only three tokens", "en", "s", 17L)))
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.q186PrefixDedup(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out.map(r => (r._2, r._3)) == Seq((2L, 1L)), s"got $out")
  }

  test("q188: a 3-4-5 vector pins the quantized norm exactly") {
    val dir = java.nio.file.Files.createTempDirectory("q188-spec").toString
    Seq((1L, Array(3.0f, 4.0f), 0), (2L, Array(0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = SimilarityQueries.q188EmbeddingNormAudit(spark, dir)
      .as[(Int, Long, Int, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0, 1L, 2, 5000000L, 5000000L, 5000000L),
      (1, 1L, 2, 0L, 0L, 0L)), s"got $out")
  }

  test("q189: bounded aggregate reproduces the rank window incl. id tiebreak") {
    val dir = java.nio.file.Files.createTempDirectory("q189-spec").toString
    docsDf(Seq((1L, "a", "en", "A", 10L), (2L, "b", "en", "A", 40L),
      (3L, "c", "en", "A", 30L), (4L, "d", "en", "A", 30L),
      (5L, "e", "en", "A", 5L)))
      .write.parquet(s"$dir/documents.parquet")
    val out = AnalyticsOpsQueries.q189GroupedTopK(spark, dir)
      .as[(String, Int, Long, Long)].collect().toSeq
    // 40 first, then the 30-tie resolved by doc_id asc (3 before 4)
    assert(out == Seq(("A", 1, 2L, 40L), ("A", 2, 3L, 30L), ("A", 3, 4L, 30L)),
      s"got $out")
  }

  test("q190: hand-computed md5 arms reproduce the readout") {
    val dir = java.nio.file.Files.createTempDirectory("q190-spec").toString
    def arm(u: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("0123456789abcdef".indexOf(hex.head) % 2 == 0) "A" else "B"
    }
    val users = (1L to 10L)
    val rows = users.map(u => (u, u * 1000000000L, u, "purchase", u.toDouble, "")) ++
      Seq((99L, 1L, 1L, "view", 1000.0, "")) // non-purchase must be ignored
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val byArm = users.groupBy(arm)
    def mean(us: Seq[Long]) = us.map(_ * 100L).sum * 1000000L / us.size
    val (ea, eb) = (byArm("A").toSeq, byArm("B").toSeq)
    val out = AnalyticsOpsQueries.q190AbLift(spark, dir)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out == ((ea.size.toLong, eb.size.toLong, mean(ea), mean(eb),
      mean(eb) * 1000000L / mean(ea))), s"got $out vs arms $byArm")
  }

  test("q193: two Thursdays at different volumes split the weekday mean exactly") {
    val dir = java.nio.file.Files.createTempDirectory("q193-spec").toString
    val day = 86400L * 1000000000L
    // day 0 (Thu): 2 events; day 7 (Thu): 4 events
    val rows = (1 to 2).map(i => (i.toLong, 0L, 1L, "v", 0.0, "")) ++
      (3 to 6).map(i => (i.toLong, 7 * day, 1L, "v", 0.0, ""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q193SeasonalResiduals(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 4L, 2L, 3000000L, 666666L),
      (7L, 4L, 4L, 3000000L, 1333333L)), s"got $out")
  }

  test("q194: five users with linear value pin the top-quintile share") {
    val dir = java.nio.file.Files.createTempDirectory("q194-spec").toString
    (1 to 5).map(u => (u.toLong, u * 1000000000L, u.toLong, "buy", u.toDouble, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q194ParetoShare(spark, dir)
      .as[(Long, Long, Long, Long, Long)].head()
    // k = 1, top user holds 500 of 1500 cents
    assert(out == ((5L, 1L, 1500L, 500L, 333333L)), s"got $out")
  }

  test("q195: first-touch mix counts each user once at their earliest event") {
    val dir = java.nio.file.Files.createTempDirectory("q195-spec").toString
    val sec = 1000000000L
    Seq((1L, 1 * sec, 1L, "purchase", 0.0, ""), (2L, 2 * sec, 1L, "view", 0.0, ""),
      (3L, 1 * sec, 2L, "view", 0.0, ""), (4L, 2 * sec, 2L, "purchase", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = RelationalQueries.q195FirstTouch(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("purchase", 1L, 500000L), ("view", 1L, 500000L)),
      s"got $out")
  }

  test("q196: identical snapshot mixes score JSD 0; a mirrored shift is symmetric") {
    val dir1 = java.nio.file.Files.createTempDirectory("q196-spec").toString
    docsDf((1 to 10).map(i => (i.toLong, "t", "en", "s", 1L)))
      .write.parquet(s"$dir1/documents.parquet")
    val same = CorpusOpsQueries.q196JsdDrift(spark, dir1)
      .as[(Long, Long, Long)].head()
    assert(same == ((0L, 0L, 0L)), s"identical: $same")

    val dir2 = java.nio.file.Files.createTempDirectory("q196-spec").toString
    docsDf((1 to 10).map(i =>
      (i.toLong, "t", if (i <= 5) "en" else "fr", "s", 1L)))
      .write.parquet(s"$dir2/documents.parquet")
    val sym = CorpusOpsQueries.q196JsdDrift(spark, dir2)
      .as[(Long, Long, Long)].head()
    // A = 5 en / 3 fr, B = 3 en / 5 fr: the mixes mirror, so the two KL
    // halves agree and JSD is strictly positive
    assert(sym._1 == sym._2 && sym._3 > 0L, s"mirrored: $sym")
  }

  test("q197: a 50/50 two-type user scores ln2; a single-note user scores 0") {
    val dir = java.nio.file.Files.createTempDirectory("q197-spec").toString
    val sec = 1000000000L
    Seq((1L, 1 * sec, 1L, "view", 0.0, ""), (2L, 2 * sec, 1L, "view", 0.0, ""),
      (3L, 3 * sec, 1L, "click", 0.0, ""), (4L, 4 * sec, 1L, "click", 0.0, ""),
      (5L, 1 * sec, 2L, "view", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = RelationalQueries.q197EngagementEntropy(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 4L, 2L, 693148L), (2L, 1L, 1L, 0L)), s"got $out")
  }

  test("q198: linear lead times pin the rank percentiles per priority") {
    val dir = java.nio.file.Files.createTempDirectory("q198-spec").toString
    val day = 86400L * 1000000L // micros per day
    def ts(d: Long) = new java.sql.Timestamp(d * 86400L * 1000L)
    // order k ships k days after its order date
    (1 to 10).map(k => (k.toLong, k.toLong, "O", 1.0, ts(0), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    (1 to 10).map(k => (k.toLong, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts(k)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = RelationalQueries.q198FulfillmentSla(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    // leads 1..10: p50 = rank 5 -> 5 days, p90 = rank 9 -> 9 days
    assert(out == Seq(("1-URGENT", 10L, 5L, 9L)), s"got $out")
  }

  test("q199: histogram partitions the corpus and buckets stay in range") {
    val sf = "/root/testdata/sf0.001"
    val out = PipelineQueries.q199LengthQualityHist(spark, sf)
      .as[(Int, Long, Long)].collect().toSeq
    assert(out.map(_._3).sum == 500L, "cells must partition the corpus")
    assert(out.forall(r => r._2 >= 1 && r._2 <= 5), s"quintile out of range: $out")
    assert(out.forall(_._1 >= 1))
  }

  test("q200: a healthy plant releases; an all-duplicate plant trips the dup gate") {
    val good = (1 to 30).map { i =>
      val lang = Seq("en", "fr", "de")(i % 3)
      val src = Seq("A", "B", "C")((i - 1) / 10)
      (i.toLong, s"the quick document number $i of and to in it that is text", lang, src, 50L)
    }
    val dir1 = java.nio.file.Files.createTempDirectory("q200-spec").toString
    docsDf(good).write.parquet(s"$dir1/documents.parquet")
    val ok = PipelineQueries.q200ReleaseGate(spark, dir1)
      .select("dup_ok", "lang_ok", "quality_ok", "balance_ok", "release_ok")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(ok == ((1L, 1L, 1L, 1L, 1L)), s"healthy corpus blocked: $ok")

    val dir2 = java.nio.file.Files.createTempDirectory("q200-spec").toString
    docsDf(good.map { case (id, _, lang, src, n) =>
      (id, "the same duplicated text of and to in it that is body", lang, src, n)
    }).write.parquet(s"$dir2/documents.parquet")
    val bad = PipelineQueries.q200ReleaseGate(spark, dir2)
      .select("dup_ok", "release_ok").as[(Long, Long)].head()
    assert(bad == ((0L, 0L)), s"all-duplicate corpus released: $bad")
  }

  test("q171: uniform lengths score gini 0; a 1-vs-9 split scores 400000") {
    val dir = java.nio.file.Files.createTempDirectory("q171-spec").toString
    docsDf(Seq((1L, "a", "en", "EQ", 5L), (2L, "b", "en", "EQ", 5L),
      (3L, "c", "en", "SKEW", 1L), (4L, "d", "en", "SKEW", 9L)))
      .write.parquet(s"$dir/documents.parquet")
    val out = AnalyticsOpsQueries.q171GiniConcentration(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out("EQ") == 0L, s"uniform: ${out("EQ")}")
    assert(out("SKEW") == 400000L, s"skew: ${out("SKEW")}")
    assert(out.contains("(all)"))
  }

  test("q171: 25k x 20k-char corpus does not wrap int64 (2*wsum*1e6 ~ 1.25e19)") {
    // wsum = 2e4 * n(n+1)/2 = 6.25e12 at n=25000; the naive int64
    // numerator 2*wsum*1e6 = 1.25e19 wraps. Uniform lengths -> gini
    // must be EXACTLY 0 for the source row and the (all) row.
    val dir = java.nio.file.Files.createTempDirectory("q171-ovf").toString
    (1 to 25000).map(i => (i.toLong, "x", "en", "s", 20000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = AnalyticsOpsQueries.q171GiniConcentration(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out == Map("s" -> 0L, "(all)" -> 0L), s"overflow regression: $out")
  }
}
