package graft.multimodal

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** Day-2 index discipline for the audio and video modalities (q223 /
  * q224, mirroring q210's image face): the probe against a stored code
  * index must equal the full batch near-dup restricted to
  * (batch × index) pairs, and the probe's plan must decode ONLY the
  * batch — the corpus contributes a parquet scan of its stored codes,
  * never a second decode.
  */
class IncrementalMediaSpec extends SparkTestBase {

  test("incremental audio probe ≡ batch near-dup restricted to (batch × index)") {
    val corpus = Multimodal.audioDedupCorpus(spark, 8)
    val idx = java.nio.file.Files.createTempDirectory("afp-idx").toString + "/codes"
    AudioFingerprint.writeIndex(corpus.filter(_.media_id < 1000), idx)
    val incremental = AudioFingerprint
      .nearDuplicatesAgainst(corpus.filter(_.media_id >= 1000), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batchCross = AudioFingerprint.nearDuplicates(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(p => p._1 < 1000 && p._2 >= 1000)
      .map(p => (p._2, p._1, p._3)).toSet
    assert(incremental == batchCross,
      s"incremental vs batch-cross: ${incremental.diff(batchCross)} / ${batchCross.diff(incremental)}")
    assert(incremental.nonEmpty)
  }

  test("audio probe plan decodes the batch once; the index side is a parquet scan") {
    val corpus = Multimodal.audioDedupCorpus(spark, 4)
    val idx = java.nio.file.Files.createTempDirectory("afp-idx2").toString + "/codes"
    AudioFingerprint.writeIndex(corpus.filter(_.media_id < 1000), idx)
    val plan = AudioFingerprint
      .nearDuplicatesAgainst(corpus.filter(_.media_id >= 1000), idx)
      .queryExecution.optimizedPlan.toString
    // exactly ONE fingerprint-decode seam (the batch's); the corpus
    // generator's own record-building map is batch-side too and fine
    val decodes = plan.linesIterator
      .count(l => l.contains("MapPartitions") && l.contains("AudioFingerprint"))
    assert(decodes == 1, s"expected exactly the batch decode seam, got $decodes:\n" +
      plan.linesIterator.filter(l => l.contains("MapPartitions") || l.contains("Relation"))
        .mkString("\n"))
    assert(plan.contains("Relation") && plan.contains("parquet"),
      s"index side must be a stored-code parquet scan:\n${plan.take(900)}")
  }

  test("incremental video probe ≡ batch near-dup restricted to (batch × index)") {
    val corpus = Multimodal.videoDedupCorpus(spark, 6)
    val idx = java.nio.file.Files.createTempDirectory("vframe-idx").toString + "/codes"
    VideoFrames.writeIndex(corpus.filter(_.media_id < 1000), idx)
    val incremental = VideoFrames
      .nearDuplicatesAgainst(corpus.filter(_.media_id >= 1000), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batchCross = VideoFrames.nearDuplicates(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(p => p._1 < 1000 && p._2 >= 1000)
      .map(p => (p._2, p._1, p._3, p._4)).toSet
    assert(incremental == batchCross,
      s"incremental vs batch-cross: ${incremental.diff(batchCross)} / ${batchCross.diff(incremental)}")
    assert(incremental.nonEmpty)
  }

  test("video probe plan reads stored frame codes — no corpus decode reachable") {
    val corpus = Multimodal.videoDedupCorpus(spark, 4)
    val idx = java.nio.file.Files.createTempDirectory("vframe-idx2").toString + "/codes"
    VideoFrames.writeIndex(corpus.filter(_.media_id < 1000), idx)
    val plan = VideoFrames
      .nearDuplicatesAgainst(corpus.filter(_.media_id >= 1000), idx)
      .queryExecution.optimizedPlan.toString
    // the batch's frame decode is eagerly checkpointed during
    // construction (LogicalRDD); the only other leaves must be the
    // stored-code parquet relation — no decode seam in the plan at all
    assert(!plan.contains("MapPartitions"),
      s"no decode may be re-runnable from the rollup plan:\n${plan.take(900)}")
    assert(plan.linesIterator.exists(_.contains("LogicalRDD")),
      "expected the checkpointed batch frame relation")
    assert(plan.contains("parquet"),
      s"index side must be a stored-code parquet scan:\n${plan.take(900)}")
  }

  test("day-2 probe of an unchanged corpus finds each planted variant's original") {
    // the q223/q224 entry-point shape: originals indexed, variants probe
    val corpus = Multimodal.videoDedupCorpus(spark, 6)
    val idx = java.nio.file.Files.createTempDirectory("vframe-idx3").toString + "/codes"
    VideoFrames.writeIndex(corpus.filter(_.media_id < 1000), idx)
    val hits = VideoFrames
      .nearDuplicatesAgainst(corpus.filter(_.media_id >= 1000), idx)
      .select(col("probe_id"), col("index_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 6).foreach { g =>
      assert(hits.contains((1000L + g, g.toLong)),
        s"re-encode variant ${1000 + g} must resolve to original $g; got $hits")
    }
  }
}
