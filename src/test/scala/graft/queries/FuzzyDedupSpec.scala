package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** q111's capped blocking join (`fuzzyCandidates`): a hot 64-char
  * prefix shared by s documents must cost O(s) candidate pairs — the
  * min-id representative star MinHashLSH applies to oversized band
  * buckets — not the s²/2 full enumeration (the r19 scale finding),
  * while planted typo copies inside the hot block still surface
  * DIRECTLY through their narrow suffix block.
  */
class FuzzyDedupSpec extends SparkTestBase {
  import spark.implicits._

  // 64+ chars so every doc shares its leading-64 block key exactly
  private val hotPrefix =
    "from the official archives of the great library records volume one"
  private def closing(i: Int) =
    s"unique closing sentence number $i repeated for suffix width $i " * 2
  private def doc(i: Int) =
    s"$hotPrefix middle section alpha beta gamma delta ${closing(i)}".trim

  test("oversized prefix block degrades to an O(s) min-id star; typo pairs survive via the suffix block") {
    val cap = 16
    val base = (0 until 100).map(i => (i.toLong, doc(i)))
    // typo copies of docs 10 and 20: one word edited in the MIDDLE, so
    // the hot prefix block (degraded) and the trailing-64 suffix block
    // (width 2 — enumerated) both contain the pair
    val typos = Seq(10, 20).map(i =>
      (1000L + i, doc(i).replace("alpha beta", "alphq beta")))
    val all = (base ++ typos).toDF("doc_id", "nt")
      .withColumn("len", length(col("nt")))

    val cand = CurationOpsQueries.fuzzyCandidates(all, cap)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    // hot block (width 102 > cap): star around min id 0 = 101 pairs;
    // the two typo suffix blocks (width 2 each) add their direct pair.
    // Uncapped enumeration would be 102·101/2 = 5151 pairs.
    assert(cand.size == 101 + 2, s"expected O(s) candidates, got ${cand.size}")
    assert(cand.contains((10L, 1010L)), "typo pair lost despite shared suffix block")
    assert(cand.contains((20L, 1020L)), "typo pair lost despite shared suffix block")
    assert((0 until 100).forall(i => i == 0 || cand.contains((0L, i.toLong))),
      "star must keep every hot-block member connected to the representative")

    // end-to-end: the q111 verify (length prefilter, text attached to
    // the narrow pair set, levenshtein ≤ 12 on the leading 256 chars)
    // confirms the typo pairs as duplicates
    val verified = CurationOpsQueries.fuzzyCandidates(all, cap)
      .filter(abs(col("a_len") - col("b_len")) <= 12)
      .select("a_id", "b_id").distinct()
      .join(all.select(col("doc_id").as("a_id"), col("nt").as("a_nt")), Seq("a_id"))
      .join(all.select(col("doc_id").as("b_id"), col("nt").as("b_nt")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        levenshtein(substring(col("a_nt"), 1, 256),
          substring(col("b_nt"), 1, 256)).as("d"))
      .filter(col("d") <= 12)
      .select("a_id", "b_id").distinct().as[(Long, Long)].collect().toSet
    assert(verified.contains((10L, 1010L)) && verified.contains((20L, 1020L)),
      s"typo copies must verify as fuzzy duplicates, got $verified")
  }

  test("blocks within the cap enumerate their pairs fully") {
    val trio = Seq(
      (1L, s"another archive opening line that reaches well past sixty four characters aaa ${closing(1)}"),
      (2L, s"another archive opening line that reaches well past sixty four characters bbb ${closing(2)}"),
      (3L, s"another archive opening line that reaches well past sixty four characters ccc ${closing(3)}"))
    val all = trio.toDF("doc_id", "nt").withColumn("len", length(col("nt")))
    val cand = CurationOpsQueries.fuzzyCandidates(all, 16)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L), (1L, 3L), (2L, 3L)), cand.toString)
  }
}
