package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Corpus-analytics operators (q54–q57): planted-known-answer cases on
  * synthetic corpora plus structural invariants on the real testdata —
  * the DuckDB oracle covers exact parity at the gate; these pin the
  * semantics the oracle SQL was derived from.
  */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("corpusops-spec").toString
    rows.toDF("doc_id", "text", "lang").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q54 finds planted boilerplate and applies the short-doc fallback") {
    val boiler = "all rights reserved"
    val dir = writeDocs(Seq(
      (1L, s"unique alpha content $boiler trailing words", "en"),
      (2L, s"different beta text $boiler other tail", "en"),
      (3L, s"$boiler $boiler", "en"), // two occurrences in one doc
      (4L, "tiny doc", "en"),         // < 3 tokens -> whole-text fallback
      (5L, "tiny doc", "en")))        // same fallback gram, second doc
    val out = CorpusOpsQueries.q54BoilerplateNgrams(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    val byGram = out.map(r => r._1 -> (r._2, r._3)).toMap
    // planted 3-gram: docs 1,2 once each; doc 3 contains it twice ("all
    // rights reserved all rights reserved" also yields interior grams)
    assert(byGram(boiler) == (4L, 3L), s"got ${byGram.get(boiler)}")
    assert(byGram("tiny doc") == (2L, 2L), "short docs gram to whole text")
    // every reported gram crosses >= 2 docs and counts are consistent
    assert(out.forall { case (_, occ, df) => df >= 2 && occ >= df })
    // ordering: occurrences desc, doc_freq desc, ngram asc
    assert(out == out.sortBy { case (g, occ, df) => (-occ, -df, g) })
  }

  test("q55 balances strata to the smallest, deterministically") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val minN = docs.groupBy("lang").count()
      .agg(min("count")).as[Long].head()
    val out = CorpusOpsQueries.q55StratifiedSample(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    val out2 = CorpusOpsQueries.q55StratifiedSample(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    assert(out == out2, "content-keyed sample must be rerun-stable")
    assert(out.nonEmpty)
    // md5-uniform expectation: every stratum lands near min_n; the
    // bound below is loose (binomial tails at sf0.001 scale) but pins
    // the balancing direction — no stratum may exceed 2x the smallest.
    val perLang = CorpusOpsQueries.q55StratifiedSample(spark, dir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.values.forall(_ <= 2 * minN),
      s"stratum exceeds 2x smallest: $perLang (min_n=$minN)")
  }

  test("q56 ranks corpus-rare terms above ubiquitous ones") {
    val dir = writeDocs(Seq(
      (1L, "common common rare", "en"),
      (2L, "common filler words", "en"),
      (3L, "common other stuff", "en")))
    val out = CorpusOpsQueries.q56TfIdfTopTerms(spark, dir)
      .select("doc_id", "rank", "term", "tfidf_r6")
      .as[(Long, Int, String, Double)].collect().toSeq
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    // "common" appears in every doc -> idf = ln(1) = 0, score 0 even at
    // tf=2; "rare" (df=1) must outrank it
    assert(doc1.head._3 == "rare", s"got $doc1")
    assert(doc1.map(_._4).sameElements(doc1.map(_._4).sorted.reverse),
      "scores must be non-increasing within a doc")
    assert(out.forall(_._2 <= 3))
    val common = out.find(r => r._1 == 1L && r._3 == "common")
    assert(common.forall(_._4 == 0.0), "df=N term scores exactly 0")
  }

  test("q58 scorecard counts cross-source duplicates for both sources") {
    val dir = java.nio.file.Files.createTempDirectory("corpusops-spec").toString
    Seq(
      (1L, "shared mirrored document text", "en", "srcA"),
      (2L, "shared mirrored document text", "en", "srcB"), // cross-source copy
      (3L, "unique text one two three", "de", "srcA"),
      (4L, "another unique body", "en", "srcB"),
      (5L, "", "en", "srcB")) // empty doc -> 0 tokens
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q58SourceScorecard(spark, dir)
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("srcA") == ("srcA", 2L, 2L, 4.5, 1L), out("srcA").toString)
    // srcB: 3 docs (4+3+0 tokens)/3 rounded to 6 dp; the mirror counts
    // here too
    assert(out("srcB") == ("srcB", 3L, 1L, 2.333333, 1L), out("srcB").toString)
  }

  test("q59 caps each source at K by content order, rerun-stable") {
    val dir = "/root/testdata/sf0.01" // 25 docs/source: the K=10 cap binds
    val out = CorpusOpsQueries.q59SourceCap(spark, dir)
      .as[(Long, String, Int)].collect().toSeq
    val out2 = CorpusOpsQueries.q59SourceCap(spark, dir)
      .as[(Long, String, Int)].collect().toSeq
    assert(out == out2, "content-keyed cap must be rerun-stable")
    val perSource = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perSource.values.forall(_ == 10), s"cap must bind at 10: $perSource")
    assert(out.forall(_._3 <= 10))
  }

  test("q99 exact-k sample ≡ the window form, exactly k per stratum") {
    val dir = "/root/testdata/sf0.001"
    val got = CorpusOpsQueries.q99StratifiedExactK(spark, dir)
      .as[(String, Int, Long)].collect().toSeq
    // per-stratum count = min(k, stratum size)
    val sizes = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val perSource = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perSource.keySet == sizes.keySet)
    perSource.foreach { case (src, n) =>
      assert(n == math.min(10L, sizes(src)), s"$src: $n of ${sizes(src)}")
    }
    // the bounded aggregate must agree with the window spelling per row
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id"),
        conv(substring(md5(col("text")), 1, 13), 16, 10).cast("double").as("ord"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("ord"), col("doc_id"))
    val expect = docs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("source"), col("rank"), col("doc_id"))
      .as[(String, Int, Long)].collect().toSeq
    assert(got.sorted == expect.sorted)
  }

  test("q08 token budget cap: prefix-maximal under B per source, rerun-stable") {
    val dir = "/root/testdata/sf0.001"
    val got = CorpusOpsQueries.q08TokenBudgetCap(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    val got2 = CorpusOpsQueries.q08TokenBudgetCap(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == got2, "content-keyed cap must be rerun-stable")
    assert(got.nonEmpty)
    // every admitted prefix stays within budget
    val bySource = got.groupBy(_._2)
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_._3).sum <= 800L, s"$src exceeds budget")
      assert(rows.map(_._3).sum == rows.map(_._4).max, s"$src cum mismatch")
    }
    // maximality: the next doc in content order would overflow the budget
    val all = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .as[(Long, String, String, Long)].collect()
      .groupBy(_._2).view.mapValues(_.sortBy(r => (r._3, r._1))).toMap
    all.foreach { case (src, ordered) =>
      val kept = bySource.getOrElse(src, Seq.empty).map(_._1).toSet
      val admitted = ordered.takeWhile(r => kept(r._1))
      assert(admitted.map(_._1).toSet == kept,
        s"$src: kept set must be a prefix of the content order")
      ordered.drop(admitted.size).headOption.foreach { next =>
        assert(admitted.map(_._4).sum + next._4 > 800L,
          s"$src: first excluded doc would still fit the budget")
      }
    }
  }

  test("q95 signature candidate join ≡ the naive posting-list join") {
    val dir = "/root/testdata/sf0.001"
    val got = CorpusOpsQueries.q95SparseSimilarity(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty, "sf0.001 must produce ≥4-shared pairs")
    // naive reference spelling: pairs meet on ANY shared term, then the
    // ≥4 filter — the shape the signature join replaced; results must
    // be identical pair-for-pair and weight-for-weight
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val toks = graft.dedup.MinHashLSH.shingleRows(docs, "doc_id", "text", n = 1)
      .filter(col("sh") =!= "")
    val tf = toks.groupBy(col("sid").as("doc_id"), col("sh").as("term"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("sh").as("term"))
      .agg(countDistinct(col("sid")).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    val top = tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rank", row_number().over(byDoc))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("term"),
        floor(col("score") * 1000 + lit(0.5)).cast("long").as("wm"))
    val naive = top.alias("a")
      .join(top.alias("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared_terms"), sum(col("a.wm") * col("b.wm")).as("dot_m2"))
      .filter(col("shared_terms") >= 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.sorted == naive.sorted,
      s"signature join diverged: got ${got.size} vs naive ${naive.size}")
  }

  test("q57 hopping windows cover each event exactly twice, aligned") {
    val dir = "/root/testdata/sf0.001"
    val nEvents = graft.core.Tables.load(spark, dir, "events").count()
    val out = CorpusOpsQueries.q57HoppingWindows(spark, dir)
    val rows = out.as[(Long, Long, String, Long, Long)].collect().toSeq
    assert(rows.map(_._4).sum == 2 * nEvents,
      "size = 2x slide => every event in exactly 2 windows")
    assert(rows.forall { case (s0, e0, _, n, u) =>
      e0 - s0 == 600000000L && s0 % 300000000L == 0 && u <= n && n > 0
    })
    // (window, type) keys are unique
    assert(rows.map(r => (r._1, r._3)).distinct.size == rows.size)
  }

  test("q116 weighted sample matches an independently computed A-ES ranking") {
    val dir = java.nio.file.Files.createTempDirectory("corpusops-spec").toString
    val docs = (1L to 40L).map { i =>
      (i, s"document number $i with body ${"x " * i.toInt}", "en", "web",
        i * 10L) // weight grows with id
    } :+ ((41L, "zero weight doc", "en", "web", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q116WeightedSample(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    // k=100 > 40 weighted docs: all appear, zero-weight doc excluded
    assert(out.size == 40 && !out.exists(_._2 == 41L))
    assert(out.map(_._1) == (1L to 40L), "ranks must be contiguous 1..n")
    // recompute the Efraimidis–Spirakis keys outside Spark entirely
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(text: String, w: Long): Double = {
      val hex = md.digest(text.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4503599627370496.0
      -math.log(u) / w.toDouble
    }
    val expected = docs.filter(_._5 > 0)
      .map(d => (key(d._2, d._5), d._1)).sorted.map(_._2)
    assert(out.map(_._2) == expected,
      s"A-ES order diverged: got ${out.map(_._2)} vs $expected")
  }

  test("q117 PMI ranks an always-together pair above a frequent independent one") {
    val dir = java.nio.file.Files.createTempDirectory("corpusops-spec").toString
    // "hong kong" only ever co-occur (6x); "the" pairs with everything
    val docs = (1L to 6L).map { i =>
      (i, s"the report from hong kong arrived the day $i", "en", "web", 40L)
    } ++ (7L to 12L).map { i =>
      (i, s"the weather was fine on day $i", "en", "web", 30L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q117PmiCollocations(spark, dir)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    val hk = out.find(r => r._1 == "hong" && r._2 == "kong")
      .getOrElse(fail(s"hong kong pair missing: $out"))
    assert(hk._3 == 6L && hk._4 == 6L && hk._5 == 6L,
      s"support and unigram counts must be exact: $hk")
    assert(hk._6 > 0, "always-together pair must have positive PMI")
    // other perfectly-dependent pairs ("fine on") tie at the same PMI;
    // hong/kong must sit in that top tie class
    assert(hk._6 == out.head._6,
      s"perfectly dependent pair must be in the top tie class, got ${out.head} vs $hk")
    out.filter(r => r._1 == "the" || r._2 == "the").foreach { r =>
      assert(r._6 < hk._6, s"independent 'the' pair outranked hong/kong: $r")
    }
  }

  test("q124 KL drift: zero for a source matching the corpus, positive for a skewed one") {
    val dir = java.nio.file.Files.createTempDirectory("corpusops-spec").toString
    // sources A and B share the corpus distribution exactly (every
    // term ln(1) = 0); source C is all-"zzz" — maximally drifted
    val docs = Seq(
      (1L, "alpha beta alpha beta", "en", "A", 21L),
      (2L, "alpha beta alpha beta", "en", "B", 21L),
      (3L, "zzz zzz zzz zzz", "en", "C", 15L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q124KlDrift(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    val m = out.map(r => r._1 -> r).toMap
    // A and B: P_s(alpha)=P_s(beta)=0.5 but Q has zzz mass -> both
    // drift EQUALLY and positively; C drifts more (its token is 1/3
    // of the corpus, concentrated)
    assert(m("A")._4 == m("B")._4, "identical sources must score identically")
    assert(m("A")._4 > 0 && m("C")._4 > m("A")._4,
      s"concentrated source must drift hardest: $out")
    assert(m("C")._2 == 4L && m("C")._3 == 1L, "exact token accounting")
    // single-source corpus: P_s == Q exactly -> KL exactly 0
    val dir2 = java.nio.file.Files.createTempDirectory("corpusops-spec").toString
    docs.take(1).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    val solo = CorpusOpsQueries.q124KlDrift(spark, dir2)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(solo == Seq(("A", 4L, 2L, 0L)), s"got $solo")
  }

  test("q122 char entropy: zero for repetition, ln 2 for a two-char alternation") {
    val dir = writeDocs(Seq(
      (1L, "aaaaaaaa", "en"),   // single symbol -> entropy exactly 0
      (2L, "abababab", "en"),   // p=0.5 each -> H = ln 2 = 0.693147...
      (3L, "abcd", "en")))      // uniform over 4 -> H = ln 4
    val out = graft.queries.TextQueries.q122CharEntropy(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // per-term micro: floor(0.5*ln2*1e6 + 0.5) = 346574, summed per symbol
    assert(out == Seq(
      (1L, 8L, 1L, 0L),
      (2L, 8L, 2L, 2 * 346574L),
      (3L, 4L, 4L, 4 * math.floor(0.25 * math.log(4.0) * 1e6 + 0.5).toLong)),
      s"got $out")
  }

  test("q130 zipf fit: an exact C/rank spectrum fits slope -1 with R^2 = 1") {
    // freqs 12/6/4/3 = 12/rank for ranks 1..4 → ln f = ln 12 − ln r:
    // a perfect log-log line (up to the ±0.5e-6 micro-quantization)
    val dir = writeDocs(Seq(
      (1L, (Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++ Seq.fill(4)("cc")
        ++ Seq.fill(3)("dd")).mkString(" "), "en")))
    val Seq((n, slope, intercept, r2)) = CorpusOpsQueries.q130ZipfFit(spark, dir)
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(n == 4L)
    assert(math.abs(slope + 1.0) < 5e-6, s"slope $slope")
    assert(math.abs(intercept - math.log(12.0)) < 5e-6, s"intercept $intercept")
    assert(r2 > 0.9999989, s"r2 $r2")
  }

  test("q130 on real testdata: negative slope, valid R^2, top-1000 cut") {
    val Seq((n, slope, _, r2)) = CorpusOpsQueries
      .q130ZipfFit(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(n <= 1000L && n > 10L)
    assert(slope < 0, s"natural-language spectrum must fall with rank: $slope")
    assert(r2 >= 0 && r2 <= 1)
  }

  test("q136 epoch schedule: exact stratified positions, sources interleave") {
    val dir = java.nio.file.Files.createTempDirectory("corpusops-spec").toString
    ((1L to 4L).map(i => (i, s"a doc $i", "en", "A"))
      ++ (5L to 6L).map(i => (i, s"b doc $i", "en", "B")))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q136EpochSchedule(spark, dir)
      .as[(String, Long, Int, Long)].collect().toSeq
    // positions: source A (n_s=4, N=6): (2k-1)*6e6/8; B (n_s=2): (2k-1)*6e6/4
    assert(out.filter(_._1 == "A").map(_._4) == Seq(750000L, 2250000L, 3750000L, 5250000L))
    assert(out.filter(_._1 == "B").map(_._4) == Seq(1500000L, 4500000L))
    // reading in key order alternates at corpus proportion: A B A A B A
    assert(out.map(_._1) == Seq("A", "B", "A", "A", "B", "A"),
      s"interleave broken: ${out.map(_._1)}")
    // rk is the content-keyed in-source rank: a permutation of 1..n_s
    assert(out.filter(_._1 == "A").map(_._3).sorted == Seq(1, 2, 3, 4))
  }

  test("q163: rank-to-global index map is the exact ceiling formula") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q163-spec").toString
    // A: lengths 10, 20 (n_s = 2); B: 30, 40, 50, 60 (n_s = 4); N = 6.
    // global sorted: 10 20 30 40 50 60. A maps ranks 1,2 -> idx 3,6
    // (30, 60); B maps ranks 1..4 -> idx 2,3,5,6 (20, 30, 50, 60).
    Seq((1L, "a", "en", "A", 10L), (2L, "b", "en", "A", 20L),
      (3L, "c", "en", "B", 30L), (4L, "d", "en", "B", 40L),
      (5L, "e", "en", "B", 50L), (6L, "f", "en", "B", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q163QuantileNormalize(spark, dir)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out == Map(1L -> 30L, 2L -> 60L, 3L -> 20L, 4L -> 30L,
      5L -> 50L, 6L -> 60L), s"got $out")
  }
}
