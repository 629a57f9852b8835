package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.medallion.{ColumnNormalizer, Lake}

/** Streaming landing→bronze (reference §2.9: Kinesis→Firehose delivery,
  * `infra/main.tf:66-124`, with batch layers polling afterwards).
  * Structured Streaming file source over `landing/<dataset>/` with
  * `Trigger.AvailableNow` — batch-equivalent, replayable semantics; the
  * checkpoint makes redelivery exactly-once per landing object.
  *
  * Micro-batches append raw normalized rows to a bronze staging dir
  * (the Firehose role); [[finalizeBronze]] then applies the global
  * full-row dedup — dedup must see all data, exactly like the batch
  * path (`flows/bronze.py:80`), so it runs once at the end rather than
  * per micro-batch.
  */
object LandingStream {

  /** Streaming CSV needs a declared schema: sample the landing dir with
    * the batch reader (same inference the batch path uses).
    */
  def inferLandingSchema(spark: SparkSession, landingDir: String): StructType =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(landingDir).schema

  def stagingDir(lake: Lake, dataset: String): String =
    s"${lake.root}/bronze_staging/$dataset"

  /** Start the landing→staging stream for one dataset. */
  def start(
      spark: SparkSession, lake: Lake, dataset: String,
      schema: StructType = null,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val s = Option(schema).getOrElse(inferLandingSchema(spark, lake.landing(dataset)))
    val staging = stagingDir(lake, dataset)
    spark.readStream
      .option("header", "true")
      .schema(s)
      .csv(lake.landing(dataset))
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"${lake.root}/_checkpoints/$dataset")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ColumnNormalizer(batch).write.mode("append").parquet(staging)
      }
      .start()
  }

  /** Global dedup staging→bronze (the batch path's `dropDuplicates`). */
  def finalizeBronze(spark: SparkSession, lake: Lake, dataset: String): String = {
    spark.read.parquet(stagingDir(lake, dataset))
      .dropDuplicates()
      .write.mode("overwrite").parquet(lake.bronze(dataset))
    lake.bronze(dataset)
  }

  /** Convenience: stream everything currently landed, then finalize. */
  def runAvailableNow(spark: SparkSession, lake: Lake, dataset: String): String = {
    val q = start(spark, lake, dataset)
    q.awaitTermination()
    finalizeBronze(spark, lake, dataset)
  }
}
