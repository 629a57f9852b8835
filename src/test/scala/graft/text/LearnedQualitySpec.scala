package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Learned quality classifier (q217 surface): the closed-form fit
  * separates planted prose from planted gibberish, generalizes off the
  * training fixture, stays deterministic, and scores in one map-side
  * projection (no shuffle anywhere in the plan).
  */
class LearnedQualitySpec extends SparkTestBase {
  import spark.implicits._

  // HELD-OUT examples — none of these strings appear in the fixture
  private val heldOutProse = Seq(
    1L -> "The harbor master checked the tide tables before letting the boats leave.",
    2L -> "Most of the apples were ripe by late September and the cider press ran daily.",
    3L -> "The lecture covered how rivers carve valleys over thousands of years.")
  // character-register junk (keyboard mash, symbol soup, non-English
  // letter salad): the class a char-trigram model owns. Repetition
  // spam built from REAL English words ("free free free buy now") is
  // deliberately absent — its trigrams are legitimate English and
  // catching it is the repetition filter's (q38) job; production
  // stacks compose both cuts.
  private val heldOutJunk = Seq(
    11L -> "qwpz xkvj rtyn mlbg qwpz xkvj rtyn mlbg qwpz xkvj rtyn",
    12L -> "vxqj plmk wrtz nbgf dhsc vxqj plmk wrtz nbgf dhsc vxqj",
    13L -> "#### @@@@ $$$$ %%%% ^^^^ &&&& #### @@@@ $$$$ %%%%",
    14L -> "gqcd fpxcv cdr dkdw cxfk xcxxq kcw mrg fxmwh xxj",
    15L -> "fwdx zjt wrnsx pmkh kdxmv nsmz fvr ngt cdwx npzt")

  test("planted gibberish scores below planted prose; decision boundary separates them") {
    val scored = QualityClassifier.score(
      (heldOutProse ++ heldOutJunk).toDF("doc_id", "text"), "doc_id", "text")
    val byId = scored.select($"doc_id", $"score_micro", $"label")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    heldOutProse.foreach { case (id, _) =>
      assert(byId(id)._2 == "keep", s"prose doc $id scored ${byId(id)._1}")
    }
    heldOutJunk.foreach { case (id, _) =>
      assert(byId(id)._2 == "cut", s"junk doc $id scored ${byId(id)._1}")
    }
    val worstProse = heldOutProse.map(p => byId(p._1)._1).min
    val bestJunk = heldOutJunk.map(j => byId(j._1)._1).max
    assert(worstProse > bestJunk,
      s"margin collapsed: worst prose $worstProse vs best junk $bestJunk")
  }

  test("training fixture is memorized correctly (sanity of the closed-form fit)") {
    val docs = (QualityClassifier.prose.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      QualityClassifier.gibberish.zipWithIndex.map { case (t, i) => (100L + i, t) })
      .toDF("doc_id", "text")
    val labels = QualityClassifier.score(docs, "doc_id", "text")
      .select($"doc_id", $"label").as[(Long, String)].collect().toMap
    QualityClassifier.prose.indices.foreach(i =>
      assert(labels(i.toLong) == "keep", s"fixture prose $i misclassified"))
    QualityClassifier.gibberish.indices.foreach(i =>
      assert(labels(100L + i) == "cut", s"fixture gibberish $i misclassified"))
  }

  test("degenerate inputs: shorter than one trigram scores 0/keep, never errors") {
    val scored = QualityClassifier.score(
      Seq((1L, ""), (2L, "ab"), (3L, "   "), (4L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text")
      .select($"doc_id", $"n_grams", $"score_micro")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(scored(1L) == ((0L, 0L)))
    assert(scored(2L) == ((0L, 0L)))
    assert(scored(3L) == ((0L, 0L)))
    assert(scored(4L)._1 == 1L) // "a b" normalizes to one trigram
  }

  test("weights are bit-stable and the score is deterministic across sessions") {
    val w1 = QualityClassifier.weightsMicro
    assert(w1.nonEmpty && !w1.valuesIterator.contains(0L), "sparse map stores only nonzero weights")
    assert(w1.keysIterator.forall(b => b >= 0 && b < QualityClassifier.Buckets))
    assert(w1.valuesIterator.exists(_ > 0) && w1.valuesIterator.exists(_ < 0),
      "fit must discriminate")
    // same inputs, two plans → identical scores
    val df = heldOutProse.toDF("doc_id", "text")
    val a = QualityClassifier.score(df, "doc_id", "text")
      .select($"doc_id", $"score_micro").as[(Long, Long)].collect().toSet
    val b = QualityClassifier.score(df, "doc_id", "text")
      .select($"doc_id", $"score_micro").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("plan lock: codegen'd relational pass — no UDF, one md5 per position, doc-grain agg only") {
    val scored = QualityClassifier.score(
      heldOutProse.toDF("doc_id", "text"), "doc_id", "text")
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), "scoring must not use Scala UDFs")
    // exactly one md5 subtree per exploded position (the interpreted
    // HOF form re-evaluated it per hex digit — 50× slower at sf0.1)
    assert(plan.sliding(4).count(_ == "md5(") == 1, s"md5 must appear once:\n$plan")
    // the only exchanges are the doc-grain aggregate's (ids + two
    // longs; map-side partial combine precedes it) — never text
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      "doc-grain aggregation with partials expected")
  }
}
