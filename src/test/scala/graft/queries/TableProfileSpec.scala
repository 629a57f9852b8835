package graft.queries

import graft.SparkTestBase

/** q120 ANALYZE-surface semantics: null accounting, exact distincts,
  * prefix truncation of min/max, and byte-length means on a corpus
  * planted to exercise each.
  */
class TableProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("q120 profiles nulls, distincts, and prefixes per column") {
    val dir = java.nio.file.Files.createTempDirectory("profile-spec").toString
    val longText = "z" * 80 // min/max prefixes truncate at 40
    Seq(
      (1L, "alpha", Option("en"), "web", 10L),
      (2L, "beta", None, "web", 20L),
      (3L, longText, Option("de"), "books", 30L),
      (4L, "alpha", Option("en"), "web", 10L)) // duplicate text + n_chars
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SqlSurfaceQueries.q120TableProfile(spark, dir)
      .as[(String, Long, Long, Long, String, String, Double)].collect().toSeq
    assert(out.map(_._1) == Seq("doc_id", "lang", "n_chars", "source", "text"),
      "one row per column, name-ordered")
    val m = out.map(r => r._1 -> r).toMap
    assert(out.forall(_._2 == 4L), "n_rows is the table row count on every row")
    assert(m("lang")._3 == 1L && m("lang")._4 == 2L, "one null, distincts {en,de}")
    assert(m("text")._3 == 0L && m("text")._4 == 3L, "duplicate text collapses")
    assert(m("doc_id")._5 == "1" && m("doc_id")._6 == "4",
      "min/max are STRING-cast ('1'..'4' here)")
    assert(m("text")._6 == "z" * 40, "max prefix truncates to 40 chars")
    // avg bytes over NON-NULL values: lang = (2+2+2)/3
    assert(m("lang")._7 == 2.0)
    // text = (5+4+80+5)/4 = 23.5
    assert(m("text")._7 == 23.5)
  }
}
