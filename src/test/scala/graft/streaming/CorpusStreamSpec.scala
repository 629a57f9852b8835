package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.SparkTestBase
import graft.dedup.MinHashLSH

/** Streaming corpus curation (CorpusStream): per-micro-batch
  * incremental near-dup dedup against the persisted index, with
  * replay-safe sinks.
  */
class CorpusStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val day0 = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank today",
    2L -> "spark partitions shuffle data across executors for distributed joins and aggregates")

  private val batch1 = Seq(
    101L -> "the quick brown fox jumps over the lazy dog near the river bank yesterday", // ~ doc 1
    102L -> "completely different text about gardening tomatoes in clay soil with compost", // fresh
    104L -> "large language models memorize near duplicate training documents verbatim sometimes",
    105L -> "large language models memorize near duplicate training documents verbatim often") // ~ 104

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  private def corpusIds(corpusDir: String): Set[Long] =
    CorpusStream.readCorpus(spark, corpusDir).select("doc_id").as[Long].collect().toSet

  test("micro-batches dedup incrementally, grow the index, and replay as no-ops") {
    val root = Files.createTempDirectory("corpus-stream").toString
    val (idx, corpus) = (s"$root/index", s"$root/corpus")
    MinHashLSH.buildIndex(emptyDocs, "doc_id", "text", idx)

    // batch 0: empty index → everything survives
    CorpusStream.dedupAndAppend(day0.toDF("doc_id", "text"), 0L, idx, corpus, CorpusStream.MinHashText())
    assert(corpusIds(corpus) == Set(1L, 2L))

    // batch 1: corpus near-dup dropped, in-batch cluster collapsed
    CorpusStream.dedupAndAppend(batch1.toDF("doc_id", "text"), 1L, idx, corpus, CorpusStream.MinHashText())
    assert(corpusIds(corpus) == Set(1L, 2L, 102L, 104L))

    // crash-replay of batch 1: its commit marker is present → full
    // no-op — the corpus does not change
    CorpusStream.dedupAndAppend(batch1.toDF("doc_id", "text"), 1L, idx, corpus, CorpusStream.MinHashText())
    assert(corpusIds(corpus) == Set(1L, 2L, 102L, 104L))

    // batch 2: a near-copy of a batch-1 SURVIVOR is caught — proof the
    // index grew mid-stream — while fresh content passes
    val batch2 = Seq(
      201L -> "completely different text about gardening tomatoes in clay soil with compost indeed", // ~102
      202L -> "volcanoes erupting under glacial ice sheets produce dramatic steam plumes")
    CorpusStream.dedupAndAppend(batch2.toDF("doc_id", "text"), 2L, idx, corpus, CorpusStream.MinHashText())
    assert(corpusIds(corpus) == Set(1L, 2L, 102L, 104L, 202L))

    // provenance partition column is present
    assert(CorpusStream.readCorpus(spark, corpus).columns.contains("batch_id"))
  }

  test("cross-batch redelivery of a committed id is dropped; own partial append is kept") {
    val root = Files.createTempDirectory("corpus-redelivery").toString
    val (idx, corpus) = (s"$root/index", s"$root/corpus")
    MinHashLSH.buildIndex(emptyDocs, "doc_id", "text", idx)
    CorpusStream.dedupAndAppend(day0.toDF("doc_id", "text"), 0L, idx, corpus,
      CorpusStream.MinHashText())

    // an at-least-once upstream re-delivers doc 2 VERBATIM (same id,
    // same text) in a LATER batch: it self-collides against batch 0's
    // committed copy, is NOT in batch 1's own ledger, and must drop —
    // the pre-ledger protocol re-appended it as a duplicate corpus row
    val redelivery = Seq(
      2L -> "spark partitions shuffle data across executors for distributed joins and aggregates",
      301L -> "volcanoes erupting under glacial ice sheets produce dramatic steam plumes")
    CorpusStream.dedupAndAppend(redelivery.toDF("doc_id", "text"), 1L, idx, corpus,
      CorpusStream.MinHashText())
    assert(corpusIds(corpus) == Set(1L, 2L, 301L))
    val dupRows = CorpusStream.readCorpus(spark, corpus)
      .filter($"doc_id" === 2L).count()
    assert(dupRows == 1L, s"redelivered id 2 appended $dupRows times")

    // contrast: batch 2 crashes AFTER its ledger + a partial index
    // append — the unsealed replay keeps its own half-appended
    // survivor (ledger hit) while still dropping a redelivery
    val batch2 = Seq(
      401L -> "fresh prose about tidal estuaries hosting migratory shorebirds every autumn",
      1L -> "the quick brown fox jumps over the lazy dog near the river bank today")
    val survivors = CorpusStream.dedupBatch(batch2.toDF("doc_id", "text"), idx,
      CorpusStream.MinHashText(), replayOfBatch = Some(2L))
    assert(survivors.select("doc_id").as[Long].collect().toSet == Set(401L))
    CorpusStream.writeAppendLedger(survivors.select($"doc_id"), idx, 2L)
    MinHashLSH.appendToIndex(survivors, "doc_id", "text", idx)
    assert(!CorpusStream.appendCommitted(spark, idx, 2L))
    CorpusStream.dedupAndAppend(batch2.toDF("doc_id", "text"), 2L, idx, corpus,
      CorpusStream.MinHashText())
    assert(corpusIds(corpus) == Set(1L, 2L, 301L, 401L))
    assert(CorpusStream.readCorpus(spark, corpus).filter($"doc_id" === 401L).count() == 1L)
  }

  test("redelivered id + fresh near-dup in one batch: the committed corpus copy wins") {
    val root = Files.createTempDirectory("corpus-redeliver-windup").toString
    val (idx, corpus) = (s"$root/index", s"$root/corpus")
    MinHashLSH.buildIndex(emptyDocs, "doc_id", "text", idx)
    CorpusStream.dedupAndAppend(day0.toDF("doc_id", "text"), 0L, idx, corpus,
      CorpusStream.MinHashText())

    // batch 1 redelivers doc 2 verbatim AND carries a SMALLER-id fresh
    // near-dup (id 0) of the same text: if the redelivered copy were
    // classified batch-internal, cluster resolution would crown the
    // min id (0) and append a near-duplicate of committed doc 2 —
    // corpus-wins requires BOTH to drop
    val batch = Seq(
      0L -> "spark partitions shuffle data across executors for distributed joins and aggregates today",
      2L -> "spark partitions shuffle data across executors for distributed joins and aggregates")
    CorpusStream.dedupAndAppend(batch.toDF("doc_id", "text"), 1L, idx, corpus,
      CorpusStream.MinHashText())
    assert(corpusIds(corpus) == Set(1L, 2L),
      s"corpus after redelivery batch: ${corpusIds(corpus)}")
    assert(CorpusStream.readCorpus(spark, corpus).filter($"doc_id" === 2L).count() == 1,
      "redelivered doc 2 duplicated")
  }

  test("the same loop runs over embeddings via the cosine backend") {
    import graft.similarity.Similarity
    val root = Files.createTempDirectory("corpus-stream-emb").toString
    val (idx, corpus) = (s"$root/index", s"$root/corpus")
    val lsh = Similarity.RandomHyperplaneLsh(dim = 4, bits = 2, tables = 8)
    val backend = CorpusStream.CosineEmbedding(lsh, threshold = 0.9)
    def vecs(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("vec_id", "embedding")

    Similarity.buildCosineIndex(vecs(Seq.empty), lsh, idx)
    // batch 0: two distinct directions survive
    CorpusStream.dedupAndAppend(
      vecs(Seq(1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(0f, 1f, 0f, 0f))),
      0L, idx, corpus, backend)
    // batch 1: a near-copy of vec 1 drops, a fresh direction survives,
    // an in-batch near-dup pair collapses to its min id
    CorpusStream.dedupAndAppend(
      vecs(Seq(
        101L -> Seq(0.99f, 0.1f, 0f, 0f), // ~1 → dropped
        102L -> Seq(0f, 0f, 1f, 0f), // fresh
        104L -> Seq(1f, 1f, -1f, -1f),
        105L -> Seq(1f, 0.95f, -1f, -0.95f))), // ~104 → collapsed
      1L, idx, corpus, backend)
    def ids = CorpusStream.readCorpus(spark, corpus)
      .select("vec_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 102L, 104L))
    // replay of batch 1 is a no-op (commit marker present)
    CorpusStream.dedupAndAppend(
      vecs(Seq(
        101L -> Seq(0.99f, 0.1f, 0f, 0f),
        102L -> Seq(0f, 0f, 1f, 0f),
        104L -> Seq(1f, 1f, -1f, -1f),
        105L -> Seq(1f, 0.95f, -1f, -0.95f))),
      1L, idx, corpus, backend)
    assert(ids == Set(1L, 2L, 102L, 104L))
  }

  test("streaming end-to-end: two AvailableNow passes share the checkpoint and index") {
    val root = Files.createTempDirectory("corpus-stream-e2e").toString
    val (in, idx, corpus, cp) = (s"$root/in", s"$root/index", s"$root/corpus", s"$root/cp")
    MinHashLSH.buildIndex(emptyDocs, "doc_id", "text", idx)
    val schema = StructType.fromDDL("doc_id BIGINT, text STRING")

    day0.toDF("doc_id", "text").write.mode("append").parquet(in)
    CorpusStream.start(spark, in, schema, idx, corpus, cp).awaitTermination()
    assert(corpusIds(corpus) == Set(1L, 2L))

    batch1.toDF("doc_id", "text").write.mode("append").parquet(in)
    CorpusStream.start(spark, in, schema, idx, corpus, cp).awaitTermination()
    // checkpoint: day-0 files are NOT reprocessed; index catches 101/105
    assert(corpusIds(corpus) == Set(1L, 2L, 102L, 104L))
  }
}
