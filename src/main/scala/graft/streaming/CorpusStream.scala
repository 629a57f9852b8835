package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.dedup.{DedupClusters, MinHashLSH, SimHashDedup}
import graft.similarity.Similarity

/** Streaming corpus curation — the operational day-2 pipeline the
  * incremental dedup operators exist for: records arrive as files in a
  * landing dir, each micro-batch is near-dup-deduped against the
  * PERSISTED index (the corpus's derived state is never recomputed),
  * in-batch duplicate clusters collapse to one representative
  * ([[DedupClusters]]), and survivors are appended to the corpus table
  * AND to the index so the very next micro-batch (and tomorrow's run)
  * dedups against them.
  *
  * The dedup family is pluggable ([[CorpusStream.Backend]]): MinHash
  * over text, sign-bucket cosine over embeddings, or SimHash — all
  * three incremental operators share the contract the loop needs
  * (pairs-vs-index including within-batch, an append, and the
  * self-pair replay signal).
  *
  * ==Exactly-once accounting==
  * `foreachBatch` replays a micro-batch after a crash, so the sinks
  * are made replay-safe rather than transactional:
  *  - the corpus append writes to a per-batch partition dir
  *    (`<corpusDir>/batch_id=N`) with overwrite — a replayed batch
  *    overwrites its own partition, never duplicating rows;
  *  - the index append is guarded by a per-batch COMMIT MARKER
  *    (`<indexDir>/_append_commits/batch_id=N`), written only after
  *    the append's parquet jobs all finish. Marker present ⇒ the
  *    whole batch completed ⇒ replay is a full no-op. Marker absent ⇒
  *    the previous attempt may have died ANYWHERE — including mid-way
  *    through the index append's two parquet jobs — so the replay
  *    recomputes with the batch's own ids EXCLUDED from the pair
  *    view ([[dedupBatch]] `ownAppendsPossible`): it sees exactly the
  *    pre-batch index, reproduces the original survivors, overwrites
  *    its sink partitions with identical rows, and re-runs the
  *    append. A re-run append can duplicate this batch's (sid, sh) /
  *    band rows in the index — harmless by design: verification
  *    collapses duplicate pairs, and duplicate band rows only nudge
  *    the width-cap degrade earlier (degrade, never corruption).
  * The earlier self-collision replay signal could NOT survive a crash
  * inside the append: a partially-appended batch saw only a SUBSET of
  * itself self-collide, dropped those records from the replayed sinks,
  * and lost them from the curated outputs forever.
  */
object CorpusStream {

  /** One incremental dedup family: pair detection against a persisted
    * index (self-pairs included for already-indexed ids) plus the
    * index append.
    */
  sealed trait Backend {
    def idCol: String
    def pairsAgainst(batch: DataFrame, indexDir: String): DataFrame
    def appendToIndex(batch: DataFrame, indexDir: String): Unit
  }

  /** MinHash+LSH over a text column ([[MinHashLSH]]). */
  final case class MinHashText(
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.5) extends Backend {
    def pairsAgainst(batch: DataFrame, indexDir: String): DataFrame =
      MinHashLSH.nearDuplicatesAgainst(batch, idCol, textCol, indexDir, threshold)
    def appendToIndex(batch: DataFrame, indexDir: String): Unit =
      MinHashLSH.appendToIndex(batch, idCol, textCol, indexDir)
  }

  /** Sign-bucket cosine over an embedding column ([[Similarity]]). */
  final case class CosineEmbedding(
      lsh: Similarity.RandomHyperplaneLsh, threshold: Double,
      idCol: String = "vec_id") extends Backend {
    def pairsAgainst(batch: DataFrame, indexDir: String): DataFrame =
      Similarity.cosineNearDuplicatesAgainst(batch, lsh, indexDir, threshold)
    def appendToIndex(batch: DataFrame, indexDir: String): Unit =
      Similarity.appendToCosineIndex(batch, lsh, indexDir)
  }

  /** SimHash pigeonhole over a text column ([[SimHashDedup]]). */
  final case class SimHashText(
      idCol: String = "doc_id", textCol: String = "text",
      maxDist: Int = SimHashDedup.MaxDistance) extends Backend {
    def pairsAgainst(batch: DataFrame, indexDir: String): DataFrame =
      SimHashDedup.nearDuplicatesAgainst(batch, idCol, textCol, indexDir, maxDist)
    def appendToIndex(batch: DataFrame, indexDir: String): Unit =
      SimHashDedup.appendToIndex(batch, idCol, textCol, indexDir)
  }

  /** Start the landing→curated-corpus stream. `indexDir` must hold an
    * index built by the backend's family ([[MinHashLSH.buildIndex]],
    * [[Similarity.buildCosineIndex]], [[SimHashDedup.buildIndex]] —
    * over the day-0 corpus, or over an empty frame). Batch ids need not
    * be ordered relative to corpus ids — corpus near-dups always win
    * over batch records.
    */
  def start(
      spark: SparkSession, inDir: String, schema: StructType,
      indexDir: String, corpusDir: String, checkpointDir: String,
      backend: Backend = MinHashText(),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupAndAppend(batch, batchId, indexDir, corpusDir, backend)
      }
      .start()

  /** One micro-batch of the curation loop (exposed for direct batch use
    * and tests). See class doc for the replay-safety contract.
    */
  def dedupAndAppend(
      batch: DataFrame, batchId: Long, indexDir: String, corpusDir: String,
      backend: Backend): Unit = {
    if (batch.isEmpty) return
    if (appendCommitted(batch.sparkSession, indexDir, batchId)) return
    val survivors = dedupBatch(batch, indexDir, backend, ownAppendsPossible = true)
    if (!survivors.isEmpty) {
      survivors.write.mode("overwrite").parquet(s"$corpusDir/batch_id=$batchId")
      backend.appendToIndex(survivors, indexDir)
    }
    markAppendCommitted(batch.sparkSession, indexDir, batchId)
  }

  private def appendMarker(indexDir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(f"$indexDir/_append_commits/batch_id=$batchId%05d")

  /** Has this batch's index append (and everything before it) fully
    * committed? The replay no-op signal (class doc).
    */
  def appendCommitted(spark: SparkSession, indexDir: String, batchId: Long): Boolean = {
    val m = appendMarker(indexDir, batchId)
    m.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(m)
  }

  /** Drop the batch's commit marker — called LAST, after every sink and
    * the index append finished.
    */
  def markAppendCommitted(spark: SparkSession, indexDir: String, batchId: Long): Unit = {
    val m = appendMarker(indexDir, batchId)
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(m.getParent)
    fs.create(m, true).close()
  }

  /** The batch's dedup SURVIVORS against the persisted index — the pair
    * detection + corpus-vs-batch split + in-batch cluster resolution of
    * [[dedupAndAppend]] WITHOUT the sink/index writes, so composed
    * pipelines ([[CurationStream]]) can route survivors through further
    * stages before committing. Result is eagerly checkpointed.
    *
    * `ownAppendsPossible = false` (standalone callers): records already
    * in the index self-collide (id_a == id_b) and come back empty —
    * usable as a replay signal ONLY when the caller can guarantee the
    * prior append was all-or-nothing. `true` (the marker-protocol
    * loops): self-pairs are the batch's OWN possibly-partial prior
    * append and are IGNORED, so the computation sees exactly the
    * pre-batch index and reproduces the original survivors; any pair
    * between an own indexed copy and a DIFFERENT batch record is
    * classified batch-internal by the membership flags below, exactly
    * as the first run classified it.
    */
  def dedupBatch(
      batch: DataFrame, indexDir: String, backend: Backend,
      ownAppendsPossible: Boolean = false): DataFrame = {
    val id = backend.idCol
    // pin the micro-batch: it feeds the pair job, two joins, and the
    // writes — streaming sources don't guarantee re-readability inside
    // foreachBatch
    val b = batch.localCheckpoint(eager = true)
    val pairs = backend.pairsAgainst(b, indexDir)

    // replayed records: already in the index → they collide with
    // themselves (id_a == id_b)
    val fresh =
      if (ownAppendsPossible) b
      else b.join(
        pairs.filter(col("id_a") === col("id_b"))
          .select(col("id_a").as(id)).distinct(),
        Seq(id), "left_anti")

    // order-independent corpus-vs-batch split: a pair side that is NOT
    // a batch id is a corpus record, and the batch side of such a pair
    // is dropped regardless of id order (the corpus copy always wins);
    // batch-internal pairs go to cluster resolution
    val ids = b.select(col(id)).withColumn("in_batch", lit(1))
    val flagged = pairs.filter(col("id_a") =!= col("id_b"))
      .join(ids.select(col(id).as("id_a"), col("in_batch").as("a_in")), Seq("id_a"), "left")
      .join(ids.select(col(id).as("id_b"), col("in_batch").as("b_in")), Seq("id_b"), "left")
      .localCheckpoint(eager = true)
    val corpusDups = flagged.filter(col("a_in").isNull || col("b_in").isNull)
      .select(when(col("a_in").isNotNull, col("id_a")).otherwise(col("id_b")).as(id))
      .distinct()
    val batchPairs = flagged.filter(col("a_in").isNotNull && col("b_in").isNotNull)
      .select(col("id_a"), col("id_b"))

    DedupClusters.deduplicate(
        fresh.join(corpusDups, Seq(id), "left_anti"), id, batchPairs)
      .localCheckpoint(eager = true)
  }

  /** Read the curated corpus (all ingested batches; `batch_id` appears
    * as a provenance partition column).
    */
  def readCorpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(corpusDir)
}
