package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.dedup.{DedupClusters, MinHashLSH}

/** Streaming corpus curation — the operational day-2 pipeline the
  * incremental dedup operators exist for: documents arrive as files in
  * a landing dir, each micro-batch is near-dup-deduped against the
  * PERSISTED MinHash index ([[MinHashLSH.nearDuplicatesAgainst]] — the
  * corpus is never re-shingled), in-batch duplicate clusters collapse
  * to one representative ([[DedupClusters]]), and survivors are
  * appended to the corpus table AND to the index so the very next
  * micro-batch (and tomorrow's run) dedups against them.
  *
  * ==Exactly-once accounting==
  * `foreachBatch` replays a micro-batch after a crash, so both sinks
  * are made replay-safe rather than transactional:
  *  - the corpus append writes to a per-batch partition dir
  *    (`<corpusDir>/batch_id=N`) with overwrite — a replayed batch
  *    overwrites its own partition, never duplicating rows;
  *  - docs already absorbed into the index pair with THEMSELVES in the
  *    candidate join (same id on both sides, Jaccard 1), so a replayed
  *    batch's already-ingested docs are recognized and dropped before
  *    any write — the index append is idempotent one step later.
  *  - writes are skipped entirely when nothing survives, so a replay
  *    that finds everything already ingested never clobbers its own
  *    batch partition with an empty overwrite.
  * Crash between the two writes (corpus first, then index): the replay
  * recomputes the same survivors — self-pairs only appear after the
  * INDEX append — overwrites the same partition, and completes the
  * index append.
  */
object CorpusStream {

  /** Start the landing→curated-corpus stream. `indexDir` must hold a
    * built index ([[MinHashLSH.buildIndex]] over the day-0 corpus, or
    * over an empty frame). Batch ids need not be ordered relative to
    * corpus ids — corpus near-dups always win over batch docs.
    */
  def start(
      spark: SparkSession, inDir: String, schema: StructType,
      indexDir: String, corpusDir: String, checkpointDir: String,
      threshold: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupAndAppend(batch, batchId, indexDir, corpusDir, threshold)
      }
      .start()

  /** One micro-batch of the curation loop (exposed for direct batch use
    * and tests). See class doc for the replay-safety contract.
    */
  def dedupAndAppend(
      batch: DataFrame, batchId: Long, indexDir: String, corpusDir: String,
      threshold: Double): Unit = {
    if (batch.isEmpty) return
    // pin the micro-batch: it feeds the pair job, two joins, and the
    // writes — streaming sources don't guarantee re-readability inside
    // foreachBatch
    val b = batch.select(col("doc_id"), col("text")).localCheckpoint(eager = true)
    val pairs = MinHashLSH.nearDuplicatesAgainst(b, "doc_id", "text", indexDir, threshold)

    // replayed docs: already in the index → they collide with
    // themselves (id_a == id_b, Jaccard 1)
    val replayed = pairs.filter(col("id_a") === col("id_b"))
      .select(col("id_a").as("doc_id")).distinct()
    val fresh = b.join(replayed, Seq("doc_id"), "left_anti")

    // order-independent corpus-vs-batch split: a pair side that is NOT
    // a batch id is a corpus doc, and the batch side of such a pair is
    // dropped regardless of id order (the corpus copy always wins);
    // batch-internal pairs go to cluster resolution
    val ids = b.select(col("doc_id")).withColumn("in_batch", lit(1))
    val flagged = pairs.filter(col("id_a") =!= col("id_b"))
      .join(ids.select(col("doc_id").as("id_a"), col("in_batch").as("a_in")), Seq("id_a"), "left")
      .join(ids.select(col("doc_id").as("id_b"), col("in_batch").as("b_in")), Seq("id_b"), "left")
      .localCheckpoint(eager = true)
    val corpusDups = flagged.filter(col("a_in").isNull || col("b_in").isNull)
      .select(when(col("a_in").isNotNull, col("id_a")).otherwise(col("id_b")).as("doc_id"))
      .distinct()
    val batchPairs = flagged.filter(col("a_in").isNotNull && col("b_in").isNotNull)
      .select(col("id_a"), col("id_b"))

    val survivors = DedupClusters.deduplicate(
        fresh.join(corpusDups, Seq("doc_id"), "left_anti"), "doc_id", batchPairs)
      .localCheckpoint(eager = true)
    if (!survivors.isEmpty) {
      survivors.write.mode("overwrite").parquet(s"$corpusDir/batch_id=$batchId")
      MinHashLSH.appendToIndex(survivors, "doc_id", "text", indexDir)
    }
  }

  /** Read the curated corpus (all ingested batches; `batch_id` appears
    * as a provenance partition column).
    */
  def readCorpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(corpusDir)
}
