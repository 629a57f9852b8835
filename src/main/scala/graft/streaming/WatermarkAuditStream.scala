package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming watermark-sizing audit — the incremental twin of the
  * batch q211 readout
  * ([[graft.queries.AnalyticsOpsQueries.q211WatermarkAudit]]): event
  * files arrive in ingest order, each micro-batch scores its events'
  * LATENESS against the per-user running event-time maximum carried
  * across batches, and the accumulated per-type report (out-of-order
  * count, worst and total lateness) is available at any point — the
  * monitor that tells an operator their deployed `withWatermark`
  * bound is too tight BEFORE the streams silently drop data.
  *
  * An event's lateness depends only on EARLIER-ARRIVING events of the
  * same user, so the computation splits exactly at batch boundaries:
  * within the batch a user-partitioned running max (the q211 window),
  * across batches one (user_id, max_ts) state row joined in. State
  * rides the [[CdcStream]] versioned-snapshot chain — batch N reads
  * immutable `snap_(N+1)`, overwrites only `snap_(N+2)` — and the
  * per-type partials land at batch-keyed ledger paths (the
  * [[DriftStream]] argument), so a crashed and replayed batch is a
  * no-op on both. Per-type partials aggregate with sum/sum/max/sum —
  * exactly associative — so the readout is a pure aggregate over the
  * ledger, and for arrival-ordered delivery the streamed report is
  * BIT-IDENTICAL to batch q211 (WatermarkAuditStreamSpec).
  *
  * Scale shape: per batch, ONE user-partitioned window over batch
  * rows, one equi-join against the user-count-sized state (AQE
  * broadcasts a small batch side), one t-row partial write; state is
  * one row per user ever seen.
  */
object WatermarkAuditStream {

  private def snapDir(stateDir: String, v: Int): String = f"$stateDir/snap_$v%05d"

  /** Bootstrap an empty state chain. */
  def init(spark: SparkSession, stateDir: String): Unit = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("user_id", "max_ts_us")
      .write.mode("overwrite").parquet(snapDir(stateDir, 1))
  }

  /** One micro-batch apply (exposed for tests). `batch` columns:
    * (event_id, ts_us, user_id, event_type).
    */
  def applyBatch(batch: DataFrame, batchId: Long, stateDir: String,
      ledgerDir: String): Unit = {
    val spark = batch.sparkSession
    val version = batchId.toInt + 2
    val state = spark.read.parquet(snapDir(stateDir, version - 1))
      .select(col("user_id"), col("max_ts_us").as("state_max_us"))
    val pinned = batch.localCheckpoint(eager = true)
    val inBatch = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val scored = pinned
      .withColumn("batch_prev_us", max(col("ts_us")).over(inBatch))
      .join(state, Seq("user_id"), "left")
      .withColumn("prev_max_us", greatest(col("batch_prev_us"), col("state_max_us")))
      .withColumn("lateness_us",
        when(col("prev_max_us") > col("ts_us"), col("prev_max_us") - col("ts_us"))
          .otherwise(0L))
      .localCheckpoint(eager = true)
    scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("lateness_us") > 0, 1L).otherwise(0L)).as("n_out_of_order"),
        max(col("lateness_us")).as("max_lateness_us"),
        sum(col("lateness_us")).as("total_lateness_us"))
      .coalesce(1).write.mode("overwrite")
      .parquet(f"$ledgerDir/batch_id=$batchId%05d")
    // next state: per-user max over carried state ∪ batch
    scored.select(col("user_id"), col("ts_us"))
      .unionByName(state.select(col("user_id"), col("state_max_us").as("ts_us")))
      .groupBy(col("user_id")).agg(max(col("ts_us")).as("max_ts_us"))
      .write.mode("overwrite").parquet(snapDir(stateDir, version))
  }

  /** Start the event-feed → audit stream against an [[init]]-
    * bootstrapped chain. `schema` describes
    * (event_id, ts_us, user_id, event_type).
    */
  def start(spark: SparkSession, inDir: String, schema: StructType,
      stateDir: String, ledgerDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(m => reader.option("maxFilesPerTrigger", m))
    reader.parquet(inDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, stateDir, ledgerDir)
      }
      .start()
  }

  /** The accumulated per-type report — the q211 row shape. */
  def currentReport(spark: SparkSession, ledgerDir: String): DataFrame =
    spark.read.parquet(ledgerDir)
      .groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("n_out_of_order")).as("n_out_of_order"),
        max(col("max_lateness_us")).as("max_lateness_us"),
        sum(col("total_lateness_us")).as("total_lateness_us"))
      .orderBy(col("event_type"))
}
