package graft.queries

import graft.SparkTestBase

/** q142 vocabulary coverage and q143 growth accounting: hand-exact
  * block arithmetic and a planted activity timeline.
  */
class GrowthVocabSpec extends SparkTestBase {
  import spark.implicits._

  test("q142: block-exact coverage on a known spectrum") {
    val dir = java.nio.file.Files.createTempDirectory("growthvocab-spec").toString
    // freqs 12/6/4/3 (total 25): 50% → ceil 13 → 2 tokens; 90% → ceil 23
    // → 4 tokens; 99% → ceil 25 → 4 tokens
    Seq((1L,
      (Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++ Seq.fill(4)("cc")
        ++ Seq.fill(3)("dd")).mkString(" "), "en", "w", 99L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q142VocabCoverage(spark, dir)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out == Seq((5000, 2L, 13L, 25L), (9000, 4L, 23L, 25L),
      (9900, 4L, 25L, 25L)), s"got $out")
  }

  test("q144 KS: disjoint supports score exactly 1.0; identical distributions 0") {
    val dir = java.nio.file.Files.createTempDirectory("growthvocab-spec").toString
    // A: lengths {10, 20}; B: lengths {30, 40} (disjoint → D = 1);
    // C: same lengths as A (identical → D = 0)
    val rows = Seq(
      (1L, "a", "en", "A", 10L), (2L, "b", "en", "A", 20L),
      (3L, "c", "en", "B", 30L), (4L, "d", "en", "B", 40L),
      (5L, "e", "en", "C", 10L), (6L, "f", "en", "C", 20L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q144KsDrift(spark, dir)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(out(("A", "B")) == 1000000L, s"disjoint: ${out(("A", "B"))}")
    assert(out(("A", "C")) == 0L, s"identical: ${out(("A", "C"))}")
    assert(out(("B", "C")) == 1000000L)
  }

  test("q145 PSI: nonnegative everywhere; a skewed source scores above a matching one") {
    val out = CorpusOpsQueries.q145PsiDrift(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach(r => assert(r._3 >= 0L, s"PSI must be nonnegative: $r"))
    // planted check: a source living in one decile vs one spread like the
    // corpus — with a broad BASE source dominating the corpus so the
    // baseline itself is uniform
    val dir = java.nio.file.Files.createTempDirectory("growthvocab-spec").toString
    val base = (1 to 100).map(i => (1000L + i, "b", "en", "BASE", i.toLong))
    val spread = (1 to 10).map(i => (i.toLong, "x", "en", "SPREAD", i * 10L - 5L))
    val peaked = (1 to 10).map(i => (100L + i, "y", "en", "PEAK", 55L))
    (base ++ spread ++ peaked).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val p = CorpusOpsQueries.q145PsiDrift(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(p("PEAK") > p("SPREAD"),
      s"single-decile source must drift harder than the corpus-shaped one: $p")
  }

  test("q151 unpivot: every (flag, measure) appears once and round-trips the wide row") {
    val out = AnalyticsOpsQueries
      .q151UnpivotMeasures(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long)].collect().toSeq
    val flags = out.map(_._1).distinct
    assert(flags.nonEmpty)
    // exactly 3 measures per flag, no nulls, n_rows positive
    flags.foreach { f =>
      val ms = out.filter(_._1 == f).map(_._2).sorted
      assert(ms == Seq("n_rows", "sum_price_cents", "sum_qty_cents"), s"$f: $ms")
    }
    assert(out.filter(_._2 == "n_rows").forall(_._3 > 0))
  }

  test("q152 set ops: inclusion-exclusion identities hold exactly") {
    val m = AnalyticsOpsQueries.q152SetOps(spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect().toMap
    assert(m("n_a") == m("n_shared") + m("n_only_a"), s"$m")
    assert(m("n_b") == m("n_shared") + m("n_only_b"), s"$m")
    assert(m("n_shared") > 0, "the 60% id overlap must share content")
    assert(m("n_only_a") > 0 && m("n_only_b") > 0)
  }

  test("q153 split leakage: content-keyed split leaks ZERO exact-dup groups across splits") {
    val out = PipelineQueries.q153SplitLeakage(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (a, b, groups, _) =>
      if (a != b) assert(groups == 0L,
        s"content-keyed split must never separate identical texts: ($a,$b,$groups)")
    }
    assert(out.filter { case (a, b, _, _) => a == b }.map(_._3).sum > 0,
      "same-split duplicate groups must be visible (the planted copies)")
  }

  test("q154 dataset card: identities reconcile") {
    val Seq(r) = PipelineQueries.q154DatasetCard(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val (nDocs, nLangs, nSources, chars, tokens, meanQ, nDistinct, nDup, dupBps) = r
    assert(nDocs == nDistinct + nDup, s"docs = distinct + dup copies: $r")
    assert(dupBps == nDup * 10000 / nDocs)
    assert(nLangs > 0 && nSources > 0 && chars > 0 && tokens > 0)
    assert(meanQ > 0 && meanQ <= 1000000L)
  }

  test("q155 waterfill: small sources taken whole, big ones leveled, budget exactly spent") {
    val dir = java.nio.file.Files.createTempDirectory("growthvocab-spec").toString
    // capacities: tiny=2, small=4, big=20, huge=30 tokens; total 56 → B = 28.
    // Waterfill: tiny(2), small(4) fully satisfied; remaining 22 over 2
    // sources → level 11 each. Σ = 2+4+11+11 = 28.
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    Seq(
      (1L, toks(2), "en", "tiny", 10L), (2L, toks(4), "en", "small", 10L),
      (3L, toks(20), "en", "big", 10L), (4L, toks(30), "en", "huge", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q155BudgetWaterfill(spark, dir)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("tiny")._4 == 2L && out("small")._4 == 4L, s"$out")
    assert(out("big")._4 == 11L && out("huge")._4 == 11L, s"$out")
    assert(out.values.map(_._4).sum == 28L, "budget must be spent exactly")
    out.values.foreach(r => assert(r._4 <= r._2, s"alloc may never exceed capacity: $r"))
    // real testdata: same invariants at corpus scale
    val real = CorpusOpsQueries
      .q155BudgetWaterfill(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect()
    val b = real.head._3
    assert(real.map(_._4).sum == math.min(b, real.map(_._2).sum))
    real.foreach(r => assert(r._4 <= r._2))
  }

  test("q157 moving average: centered frame, honest edges, exact means") {
    val dayUs = 86400000000L
    val dir = java.nio.file.Files.createTempDirectory("growthvocab-spec").toString
    // 10 days, day d has d+1 events → interior means are exact integers
    val rows = (0 until 10).flatMap(d => (0 to d).map(i =>
      ((d * 100 + i).toLong, (d * dayUs + i + 1) * 1000L, 1L, "view", 0.0, "{}")))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q157MovingAverage(spark, dir)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._3 == 4L && out(0L)._4 == (1 + 2 + 3 + 4) / 4.0,
      s"left edge averages 4 days: ${out(0L)}")
    assert(out(5L)._3 == 7L && out(5L)._4 == (3 + 4 + 5 + 6 + 7 + 8 + 9) / 7.0,
      s"interior averages the full ±3 frame: ${out(5L)}")
    assert(out(9L)._3 == 4L && out(9L)._4 == (7 + 8 + 9 + 10) / 4.0)
  }

  test("q158 fertility: punctuation-heavy text inflates BPE count over whitespace words") {
    val dir = java.nio.file.Files.createTempDirectory("growthvocab-spec").toString
    Seq(
      (1L, "plain words only here", "en", "w", 20L),          // 4 ws, 4 bpe → 1.0
      (2L, "a.b,c;d e.f,g;h i.j,k;l", "xx", "w", 23L))        // 3 ws, 21 bpe → 7.0
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = AnalyticsOpsQueries.q158TokenizerFertility(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("en") == (("en", 1L, 4L, 4L, 1000000L)), s"got ${out("en")}")
    assert(out("xx")._5 == 7000000L, s"got ${out("xx")}")
  }

  test("q143: new/retained/resurrected/churned reconcile on a planted timeline") {
    val wkUs = 604800000000L
    val dir = java.nio.file.Files.createTempDirectory("growthvocab-spec").toString
    // u1: weeks 0,1,3; u2: week 1; u3: week 0 — week 2 unobserved
    val rows = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 1L), (3L, 0L))
      .zipWithIndex.map { case ((u, w), i) =>
        (i.toLong, (w * wkUs + 1000L) * 1000L, u, "view", 0.0, "{}")
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AnalyticsOpsQueries.q143GrowthAccounting(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 2L, 0L, 0L, 0L),   // u1+u3 new
      (1L, 2L, 1L, 1L, 0L, 1L),   // u2 new, u1 retained, u3 churned
      (3L, 1L, 0L, 0L, 1L, 0L)),  // u1 resurrected; week-2 churn not emitted (unobserved week)
      s"got $out")
    // identity: active = new + retained + resurrected on every row
    out.foreach(r => assert(r._2 == r._3 + r._4 + r._5))
  }
}
