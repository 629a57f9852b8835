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
