package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the exact-Jaccard pair kernel's skew bound and its df-cap
  * escape hatch ([[TextQueries.jaccardPairsFromShingles]]) — the r17
  * verdict asked for the in-file posting-list-skew prose to become a
  * regression gate, BucketBoundSpec-style. Three claims:
  *
  *  1. The candidate self-join's pair volume IS Σ_g df(g)·(df(g)−1)/2:
  *     a planted stopword shingle shared by every document makes one
  *     posting list dominate that sum quadratically, and the kernel's
  *     uncapped output size equals the closed form.
  *  2. A finite `maxDf` removes frequent grams from candidate
  *     GENERATION only: pairs that share any rare gram survive, and
  *     their jm values are bit-identical to the uncapped kernel's —
  *     the stopword gram still counts toward their |∩|/|∪|.
  *  3. The ∞ default (and any cap ≥ max df) is bit-identical to the
  *     uncapped kernel — the q165/q175/q191 oracles stay exact.
  */
class JaccardKernelSpec extends SparkTestBase {
  import spark.implicits._

  /** 60 docs all sharing the stopword gram "the"; docs 0/1/2 also share
    * the rare gram "rare"; every doc has one unique gram.
    */
  private lazy val sh = {
    val stop = (0L until 60L).map(i => (i, "the"))
    val rare = (0L until 3L).map(i => (i, "rare"))
    val uniq = (0L until 60L).map(i => (i, s"uniq$i"))
    (stop ++ rare ++ uniq).toDF("sid", "sh")
  }

  private def pairs(maxDf: Long): Map[(Long, Long), Long] =
    TextQueries.jaccardPairsFromShingles(sh, maxDf)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("uncapped pair volume is the closed form sum df(df-1)/2, dominated by the stopword gram") {
    // closed form from the posting lists: "the" contributes C(60,2) =
    // 1770, "rare" C(3,2) = 3, uniques 0 — distinct pairs = 1770
    // (rare pairs are a subset of stopword pairs)
    val volume = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .select(sum(expr("df * (df - 1)") / 2)).as[Double].head().toLong
    assert(volume == 1773L, s"closed-form join volume: $volume")
    val p = pairs(Long.MaxValue)
    assert(p.size == 1770, s"uncapped distinct pairs: ${p.size}")
    // the stopword's C(60,2) is > 99.8% of the join volume — the skew
    // the cap exists for
    assert(1770.0 / volume > 0.998)
  }

  test("maxDf excludes frequent grams from candidate generation only; surviving jm is exact") {
    val capped = pairs(maxDf = 10L)
    // only the rare-gram pairs survive ("the" has df 60 > 10)
    assert(capped.keySet == Set((0L, 1L), (0L, 2L), (1L, 2L)),
      s"capped pairs: ${capped.keySet}")
    // their values still count the stopword gram: docs 0/1 have grams
    // {the, rare, uniqI} each → |∩| = 2, |∪| = 4 → jm = 500000, NOT
    // the 333333 a candidates-only Jaccard (rare alone ∩, uniq in ∪)
    // would... i.e. the full-relation verify is what ran
    assert(capped.values.toSet == Set(500000L), s"capped jm: $capped")
    // and they equal the uncapped kernel's values for the same pairs
    val full = pairs(Long.MaxValue)
    capped.foreach { case (k, v) => assert(full(k) == v, s"pair $k: $v vs ${full(k)}") }
  }

  test("cap >= max df is bit-identical to the uncapped default") {
    assert(pairs(maxDf = 60L) == pairs(Long.MaxValue))
  }
}
