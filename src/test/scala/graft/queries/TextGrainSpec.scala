package graft.queries

import graft.SparkTestBase

/** q138 sentence stats and q139 embedding outlier triage: hand-exact
  * planted cases for segmentation boundaries and z-score arithmetic.
  */
class TextGrainSpec extends SparkTestBase {
  import spark.implicits._

  test("q138 sentence stats: punctuation split, attached terminal, no-punct doc") {
    val dir = java.nio.file.Files.createTempDirectory("textgrain-spec").toString
    Seq(
      (1L, "One two three. Four five! Six?", "en", "w", 30L),
      (2L, "just words here", "en", "w", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.q138SentenceStats(spark, dir)
      .as[(Long, Long, Double, Int)].collect().map(r => r._1 -> r).toMap
    // "Six?" keeps its terminal (no trailing whitespace) and counts 1 word
    assert(out(1L) == ((1L, 3L, 2.0, 3)), s"got ${out(1L)}")
    assert(out(2L) == ((2L, 1L, 3.0, 3)), s"got ${out(2L)}")
  }

  test("q146 curriculum: cleanest first inside each source, q136 position formula holds") {
    val dir = java.nio.file.Files.createTempDirectory("textgrain-spec").toString
    val clean = Seq.fill(5)("the a of and to in is it that the").mkString(" ") // 50 stopwords → q = 1
    Seq(
      (1L, "zz@@!!##", "en", "A", 8L),   // junk → low q
      (2L, clean, "en", "A", 100L),      // clean → rk 1 in A
      (3L, clean, "en", "B", 100L),
      (4L, "qq%%^^&&", "en", "B", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.q146CurriculumSchedule(spark, dir)
      .as[(String, Long, Long, Int, Long)].collect().toSeq
    val rkOf = out.map(r => r._2 -> r._4).toMap
    assert(rkOf(2L) == 1 && rkOf(3L) == 1, s"clean docs must lead their source: $out")
    assert(rkOf(1L) == 2 && rkOf(4L) == 2)
    // exact q136 position arithmetic: n_s = 2, N = 4
    out.foreach { r =>
      assert(r._5 == (2L * r._4 - 1) * 4 * 1000000L / 4, s"pos formula: $r")
    }
  }

  test("q147 attrition: lang cut, duplicate collapse, and bps retention per source") {
    val dir = java.nio.file.Files.createTempDirectory("textgrain-spec").toString
    val clean = Seq.fill(5)("the a of and to in is it that the").mkString(" ")
    Seq(
      (1L, clean, "en", "A", 100L),        // survivor (min-id of the dup pair)
      (2L, clean, "en", "A", 100L),        // exact duplicate → cut
      (3L, clean, "xx", "A", 100L),        // language cut
      (4L, clean, "en", "B", 100L))        // B's copy shares A's fingerprint — rep is doc 1
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.q147SourceAttrition(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 3L, 2L, 2L, 1L, 3333L)), s"got ${out("A")}")
    assert(out("B") == (("B", 1L, 1L, 1L, 0L, 0L)),
      s"cross-source duplicate must lose to A's min-id: ${out("B")}")
  }

  test("q148 depth: planted-copy floor of 1, train copies raise multiplicity") {
    val dir = java.nio.file.Files.createTempDirectory("textgrain-spec").toString
    val leak = "w1 w2 w3 w4 w5 w6 w7 w8"
    val uniq = "u1 u2 u3 u4 u5 u6 u7 u8"
    Seq(
      (1L, leak, "en", "w", 20L),    // eval gram, leaked below
      (2L, uniq, "en", "w", 20L),    // eval gram, only its own planted copy
      (10L, leak, "en", "w", 20L),   // train copy 1
      (11L, leak, "en", "w", 20L),   // train copy 2
      (12L, "x1 x2 x3 x4 x5 x6 x7 x8", "en", "w", 20L)) // unrelated train
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.q148ContaminationDepth(spark, dir)
      .as[(Long, Long)].collect().toMap
    // leak gram: 2 train copies + its planted eval copy = 3;
    // uniq gram: planted copy only = 1 — the planted floor means 0 never occurs
    assert(out == Map(3L -> 1L, 1L -> 1L), s"got $out")
  }

  test("q139 z-scores: exact hand case, zero-variance dim excluded, no NaN") {
    val dir = java.nio.file.Files.createTempDirectory("textgrain-spec").toString
    // dim0 values (0,0,0,0,4): mu=0.8 sigma=1.6 -> z(4)=2.0, z(0)=0.5;
    // dim1 constant -> sigma 0 -> excluded entirely
    Seq(
      10L -> Seq(0f, 7f), 11L -> Seq(0f, 7f), 12L -> Seq(0f, 7f),
      13L -> Seq(0f, 7f), 14L -> Seq(4f, 7f))
      .toDF("vec_id", "embedding")
      .withColumn("label", org.apache.spark.sql.functions.lit(0))
      .write.parquet(s"$dir/embeddings.parquet")
    val out = SimilarityQueries.q139EmbeddingOutliers(spark, dir)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(14L) == ((2000000L, 0L)), s"outlier z: ${out(14L)}")
    (10L to 13L).foreach(id => assert(out(id) == ((500000L, 0L)), s"$id: ${out(id)}"))
  }
}
