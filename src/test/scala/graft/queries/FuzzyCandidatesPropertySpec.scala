package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** fuzzyCandidates vs a brute-force reference over random corpora: for
  * any corpus and cap, the candidate-pair set must equal blocks-by-
  * (prefix OR suffix key) with full enumeration inside the cap and the
  * min-id star beyond it — the q111 kernel pinned semantically, not
  * just on the hand-planted FuzzyDedupSpec corpus.
  */
class FuzzyCandidatesPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val openers = Vector(
    "from the official archives of the great library records volume one and",
    "in the beginning of the long winter season the village gathered to",
    "this document is provided under the standard terms of the common license")
  private val closers = Vector(
    "and that is where the record ends for this particular year of note",
    "signed and sealed by the keeper of the rolls in the usual manner here",
    "no further entries were made after the close of that final session")
  private val vocab = Vector("river", "stone", "harbor", "lantern", "meadow",
    "copper", "violin", "archive", "pepper", "willow", "anchor", "marble")

  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    (0 until 40).map { i =>
      if (rnd.nextInt(5) == 0) {
        // short doc (≤ 64 chars): prefix key == whole text == suffix
        // key, so it lands the SAME block under both key kinds — the
        // len<=64 branch the long-doc corpus never exercises
        (i.toLong, (1 to 1 + rnd.nextInt(4))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      } else {
        val mid = (1 to 4 + rnd.nextInt(12))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
        val head = if (rnd.nextInt(3) > 0) openers(rnd.nextInt(3)) else mid.take(20)
        val tail = if (rnd.nextInt(3) > 0) closers(rnd.nextInt(3)) else mid.takeRight(20)
        (i.toLong, s"$head $mid $tail")
      }
    }
  }

  private def bruteForce(docs: Seq[(Long, String)], cap: Int): Set[(Long, Long)] = {
    def keys(nt: String): Seq[(Int, String)] = Seq(
      0 -> nt.take(64),
      1 -> (if (nt.length <= 64) nt else nt.substring(nt.length - 64)))
    docs.flatMap { case (id, nt) => keys(nt).map(k => (k, id)) }
      .groupBy(_._1).values.flatMap { block =>
        val ids = block.map(_._2).sorted
        if (ids.size < 2) Nil
        else if (ids.size <= cap)
          for (a <- ids; b <- ids if a < b) yield (a, b)
        else ids.tail.map(m => (ids.head, m))
      }.toSet
  }

  test("candidate set equals the blocked brute force over random corpora (caps 2/4/1000)") {
    for (seed <- 1 to 5; cap <- Seq(2, 4, 1000)) {
      val docs = corpus(seed * 31 + cap)
      val all = docs.toDF("doc_id", "nt").withColumn("len", length(col("nt")))
      val got = CurationOpsQueries.fuzzyCandidates(all, cap)
        .select("a_id", "b_id").distinct().as[(Long, Long)].collect().toSet
      val want = bruteForce(docs, cap)
      assert(got == want,
        s"seed=$seed cap=$cap: extra=${got.diff(want)} missing=${want.diff(got)}")
    }
  }
}
