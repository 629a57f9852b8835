package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.dedup.MinHashLSH

/** Streaming n-gram novelty — the q167 curve as an intake monitor:
  * each arriving micro-batch of documents is scored against a
  * PERSISTED gram→first-owner index (who introduced each trigram), the
  * per-document novelty rows append to the monitor output, and the
  * grams the batch newly introduced append to the index. The
  * operational day-2 shape of q167, mirroring [[DecontaminateStream]]/
  * [[CorpusStream]] conventions.
  *
  * ==Semantics==
  * With batches arriving in doc_id order, streamed novelty ≡ the batch
  * q167 computation over the concatenated corpus (NoveltyStreamSpec
  * pins it). Under out-of-order arrival the index still converges to
  * the true global min owner per gram (reads min-merge across
  * partitions), but novelty rows already emitted are never restated —
  * an intake monitor reports what was new AT ARRIVAL.
  *
  * ==Exactly-once accounting==
  * `foreachBatch` replays a micro-batch after a crash. Both writes are
  * deterministic per-batch partitions (`batch_id=N`): the novelty rows
  * are a pure function of (batch, min-merged index) — a replayed
  * batch's grams are already in the index with the SAME owner ids, so
  * the min-merge is idempotent and the recomputed rows are identical;
  * the index partition holds exactly the grams whose merged owner is a
  * batch document, which is replay-stable for the same reason.
  */
object NoveltyStream {

  private def gramsPath(indexDir: String) = s"$indexDir/grams"

  /** The stored gram→first-owner relation, min-merged across batch
    * partitions (empty frame when nothing has been indexed yet).
    */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    // Hadoop FS probe, not java.io.File (see PackStream.readState).
    val path = new org.apache.hadoop.fs.Path(gramsPath(indexDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("sh", "first_id")
    } else {
      spark.read.parquet(gramsPath(indexDir))
        .groupBy(col("sh")).agg(min(col("first_id")).as("first_id"))
    }
  }

  /** One batch's novelty rows against the stored index — (doc_id,
    * n_grams, n_novel, novelty_micro), the q167 schema. Pure; exposed
    * for direct batch use and the streamed ≡ batch spec.
    */
  def noveltyBatch(
      batch: DataFrame, idCol: String, textCol: String,
      indexDir: String): DataFrame = {
    val sh = MinHashLSH.shingleRows(
      batch.select(col(idCol), col(textCol)), idCol, textCol, n = 3).distinct()
    val merged = mergedOwners(batch.sparkSession, sh, indexDir)
    sh.join(merged, Seq("sh"))
      .groupBy(col("sid").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_id") === col("sid"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_micro", expr("(n_novel * 1000000) div n_grams"))
  }

  /** Per batch gram: min(batch first occurrence, stored owner). */
  private def mergedOwners(
      spark: SparkSession, sh: DataFrame, indexDir: String): DataFrame =
    sh.groupBy(col("sh")).agg(min(col("sid")).as("b_first"))
      .join(readIndex(spark, indexDir).withColumnRenamed("first_id", "s_first"),
        Seq("sh"), "left")
      .select(col("sh"),
        least(col("b_first"), coalesce(col("s_first"), col("b_first")))
          .as("first_id"),
        col("b_first"), col("s_first"))

  /** Start the landing→novelty-monitor stream. */
  def start(
      spark: SparkSession, inDir: String, schema: StructType,
      indexDir: String, outDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoreAndAppend(batch, batchId, indexDir, outDir, idCol, textCol)
      }
      .start()

  /** One micro-batch of the loop (exposed for tests). See class doc
    * for the replay contract.
    */
  def scoreAndAppend(
      batch: DataFrame, batchId: Long, indexDir: String, outDir: String,
      idCol: String, textCol: String): Unit = {
    if (batch.isEmpty) return
    // pin the micro-batch: it feeds the gram relation twice and the
    // writes — streaming sources don't guarantee re-readability inside
    // foreachBatch
    val b = batch.localCheckpoint(eager = true)
    val sh = MinHashLSH.shingleRows(
      b.select(col(idCol), col(textCol)), idCol, textCol, n = 3).distinct()
    // pin the merge once: novelty rows and the index partition must see
    // the SAME owner view even if the underlying index dir changes
    val merged = mergedOwners(b.sparkSession, sh, indexDir)
      .localCheckpoint(eager = true)
    sh.join(merged.select(col("sh"), col("first_id")), Seq("sh"))
      .groupBy(col("sid").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_id") === col("sid"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_micro", expr("(n_novel * 1000000) div n_grams"))
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    // grams this batch owns after the merge: new grams, plus replayed
    // ones whose stored owner IS the batch occurrence
    merged.filter(col("s_first").isNull || col("b_first") <= col("s_first"))
      .select(col("sh"), col("first_id"))
      .write.mode("overwrite").parquet(s"${gramsPath(indexDir)}/batch_id=$batchId")
  }

  /** Read the novelty monitor output (all batches; `batch_id` appears
    * as a provenance partition column).
    */
  def readMonitor(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
