package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase

/** FreqStream: incremental heavy-hitter maintenance. The contract is
  * streamed-then-served ≡ the batch q81 cut on the same corpus, with
  * replay-safe partials and a compaction that preserves the view.
  */
class FreqStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def serve(countsDir: String): Seq[(String, String, Long)] =
    FreqStream.frequentTokens(spark, countsDir)
      .as[(String, String, Long)].collect().toSeq

  test("streamed partials serve exactly the batch q81 heavy hitters; replay and compaction are no-ops") {
    val root = Files.createTempDirectory("freq-stream").toString
    val counts = s"$root/counts"
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "source")
    val mid = 250L

    // two micro-batches split by doc_id
    FreqStream.countAndAppend(docs.filter($"doc_id" < mid), 0L, counts)
    FreqStream.countAndAppend(docs.filter($"doc_id" >= mid), 1L, counts)

    val batch = graft.queries.CurationOpsQueries.q81FrequentTokens(spark, sf)
      .as[(String, String, Long)].collect().toSeq
    assert(batch.nonEmpty, "q81 must produce heavy hitters at sf0.001")
    assert(serve(counts) == batch,
      "merged streamed partials must serve the exact batch cut")

    // crash-replay of batch 1: same partition overwritten, no drift
    FreqStream.countAndAppend(docs.filter($"doc_id" >= mid), 1L, counts)
    assert(serve(counts) == batch, "replayed batch must not double-count")

    // compaction folds partitions but preserves the served view
    FreqStream.compactCounts(spark, counts)
    assert(serve(counts) == batch, "compaction must preserve the view")
    val parts = new java.io.File(counts).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSeq
    assert(parts == Seq("batch_id=0"), s"compaction must fold partitions: $parts")
  }

  test("the streaming entry point drives the same partials via AvailableNow") {
    val root = Files.createTempDirectory("freq-stream").toString
    val (landing, counts, ckpt) = (s"$root/landing", s"$root/counts", s"$root/ckpt")
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "source")
    docs.write.parquet(landing)

    val q = FreqStream.start(spark, landing, counts, ckpt)
    q.awaitTermination(120000)
    val batch = graft.queries.CurationOpsQueries.q81FrequentTokens(spark, sf)
      .as[(String, String, Long)].collect().toSeq
    assert(serve(counts) == batch,
      "stream-ingested corpus must serve the exact batch cut")
  }
}
