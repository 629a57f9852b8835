package graft.queries

import graft.SparkTestBase

/** q165 threshold sweep, q166 hapax report, q167 n-gram novelty:
  * hand-exact planted corpora plus monotonicity invariants.
  */
class NoveltySweepSpec extends SparkTestBase {
  import spark.implicits._

  test("q165: exact plants pin the theta=1.0 row; sweep is monotone decreasing") {
    val dir = java.nio.file.Files.createTempDirectory("q165-spec").toString
    // two long, token-disjoint docs: the only 1.0 pairs are the planted
    // exact copies (one per doc), touching doc+copy = 4 docs
    Seq((1L, (1 to 30).map(i => s"alpha$i").mkString(" "), "en", "s", 1L),
      (2L, (1 to 30).map(i => s"beta$i").mkString(" "), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.q165ThresholdSweep(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(500000L, 700000L, 800000L, 900000L, 1000000L))
    val exact = out.last
    assert((exact._2, exact._3) == ((2L, 4L)), s"theta=1.0 row: $exact")
    // monotone: raising theta can only drop pairs and docs
    out.sliding(2).foreach { case Seq(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3, s"non-monotone: $lo -> $hi")
    }
  }

  test("q166: hand corpus pins hapax/dis counts per language") {
    val dir = java.nio.file.Files.createTempDirectory("q166-spec").toString
    // en: tokens aa aa bb -> vocab 2, hapax {bb}, dis {aa}
    // fr: tokens xx yy zz -> vocab 3, all hapax
    Seq((1L, "aa aa", "en", "s", 5L), (2L, "bb", "en", "s", 2L),
      (3L, "xx yy zz", "fr", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q166HapaxReport(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("en") == (("en", 3L, 2L, 1L, 1L, 500000L)), s"en: ${out("en")}")
    assert(out("fr") == (("fr", 3L, 3L, 3L, 0L, 1000000L)), s"fr: ${out("fr")}")
  }

  test("q175: one planted doc forms a complete triangle with its two copies (degree 2 each)") {
    val dir = java.nio.file.Files.createTempDirectory("q175-spec").toString
    // 30 distinct tokens: doc<->exact jm = 1e6; doc<->near and
    // near<->exact share 28 of 32 shingles = 875000 >= 0.8
    Seq((1L, (1 to 30).map(i => s"tok$i").mkString(" "), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.q175DupgraphDegrees(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 3L)), s"got $out")
  }

  test("q176: counts and count-desc/gram-asc tiebreaks pin the profile order") {
    val dir = java.nio.file.Files.createTempDirectory("q176-spec").toString
    Seq((1L, "aaaa", "en", "s", 4L), (2L, "ab ab", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.q176CharTrigramProfile(spark, dir)
      .as[(String, Int, String, Long)].collect().toSeq
    // "aaaa" -> aaa x2; "ab ab" -> "ab ", "b a", " ab" x1 each;
    // ties order lexicographically: " ab" < "ab " < "b a"
    assert(out == Seq(("en", 1, "aaa", 2L), ("en", 2, " ab", 1L),
      ("en", 3, "ab ", 1L), ("en", 4, "b a", 1L)), s"got $out")
  }

  test("q191: cluster sizes split exactly at the 0.9 Jaccard boundary") {
    val dir = java.nio.file.Files.createTempDirectory("q191-spec").toString
    // 60-token doc: near-copy Jaccard 58/62 = 0.935 >= 0.9 -> full
    // triangle (size 3); 10-token doc: 8/12 = 0.67 -> only the exact
    // pair clusters (size 2), its near-copy stays isolated
    Seq((1L, (1 to 60).map(i => s"alpha$i").mkString(" "), "en", "s", 1L),
      (2L, (1 to 10).map(i => s"beta$i").mkString(" "), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.q191ClusterSizeHist(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L), (3L, 1L)), s"got $out")
  }

  test("q192: a two-source disjoint vocabulary pins the chi-square cells") {
    val dir = java.nio.file.Files.createTempDirectory("q192-spec").toString
    Seq((1L, "apple apple apple", "en", "A", 17L),
      (2L, "banana banana banana", "en", "B", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOpsQueries.q192DistinctiveTerms(spark, dir)
      .as[(String, Int, String, Long, Long)].collect().toSeq
    // chi2 = (3*6 - 3*3)^2 / (6*3*3) = 1.5 for both cells
    assert(out == Seq(("A", 1, "apple", 3L, 1500000L),
      ("B", 1, "banana", 3L, 1500000L)), s"got $out")
  }

  test("q167: the first document is fully novel; a later near-repeat scores its new tail only") {
    val dir = java.nio.file.Files.createTempDirectory("q167-spec").toString
    // doc 1: grams {a b c, b c d}; doc 2 repeats them and adds {c d e}
    Seq((1L, "a b c d", "en", "s", 7L), (2L, "a b c d e", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.q167NgramNovelty(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L, 1000000L), (2L, 3L, 1L, 333333L)),
      s"got $out")
  }
}
