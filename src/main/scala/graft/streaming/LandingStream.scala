package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
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
    * the batch reader (same inference the batch path uses). Prefer
    * passing a declared schema to [[start]] — inference is a full extra
    * scan of landing; `samplingRatio < 1` at least bounds its parse
    * cost (see [[graft.medallion.BronzeFlow.read]]).
    */
  def inferLandingSchema(
      spark: SparkSession, landingDir: String,
      samplingRatio: Double = 1.0): StructType =
    spark.read.option("header", "true").option("inferSchema", "true")
      .option("samplingRatio", samplingRatio.toString)
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

  /** Staging→bronze dedup, INCREMENTAL: only rows staged since the last
    * finalize are read (the checkpoint makes staging append-only and
    * new-data-only), deduped among themselves, anti-joined against the
    * existing bronze (null-safe on every column — the same full-row
    * identity `dropDuplicates` uses), and appended. Incorporated staged
    * files are then removed, so each finalize costs O(new data) + one
    * bronze-side join — never a full-history rewrite.
    *
    * Crash-safe and idempotent: a failure after the append but before
    * the staged-file cleanup just re-presents already-incorporated rows
    * next time, and the anti-join drops them again. The result is
    * always exactly `dropDuplicates` over everything ever staged.
    *
    * Concurrency contract: bronze mutation happens under the table's
    * [[graft.core.FsLock]] writer lock, shared with
    * [[graft.medallion.Maintenance.compact]]/`upsertByKey` — see
    * WriterContractSpec. A crash mid-finalize leaves the lock behind;
    * the next writer breaks it after the stale horizon and the
    * staged-file protocol above makes the rerun safe.
    */
  def finalizeBronze(
      spark: SparkSession, lake: Lake, dataset: String,
      lockStaleMs: Long = graft.core.FsLock.DefaultStaleMs): String = {
    val staging = stagingDir(lake, dataset)
    val bronzeDir = lake.bronze(dataset)
    val sp = new HPath(staging)
    val f = FileSystem.get(sp.toUri, spark.sparkContext.hadoopConfiguration)
    val stagedFiles =
      if (!f.exists(sp)) Array.empty[HPath]
      else f.listStatus(sp).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
    if (stagedFiles.isEmpty) return bronzeDir // nothing new → no-op

    // writer lock on bronze: an append landing between a concurrent
    // Maintenance.compact's read and swap would be silently lost with
    // the compacted rewrite winning; under the lock the race is a loud
    // FsLock.LockHeld and the staged batch stays in staging for the
    // retry. The streaming side (start → staging appends) needs no
    // lock — it never touches bronze.
    graft.core.FsLock.withLock(spark, bronzeDir,
      s"finalizeBronze-${ProcessHandle.current().pid()}", lockStaleMs) {

    val staged = spark.read.parquet(staging).dropDuplicates()
    val bp = new HPath(bronzeDir)
    // self-heal a crashed drift rewrite: replaceDir below moves bronze
    // aside before moving the merge in; dying mid-protocol leaves
    // bronze absent (data at _old) or a stale _old copy. Healing first
    // keeps the rerun idempotent instead of rebuilding bronze from the
    // staged rows alone.
    graft.medallion.Maintenance.healStranded(spark, bronzeDir)
    if (!f.exists(bp)) staged.write.mode("overwrite").parquet(bronzeDir)
    else {
      val bronze = spark.read.parquet(bronzeDir)
      if (staged.columns.toSet != bronze.columns.toSet) {
        // schema drift (a column appeared or disappeared upstream):
        // the incremental anti-join cannot align rows, so fall back to
        // one full merge rewrite that preserves the union of columns —
        // the rare path; steady-state stays incremental
        val merged = bronze
          .unionByName(staged, allowMissingColumns = true).dropDuplicates()
        val tmp = bronzeDir + "_rewriting"
        merged.write.mode("overwrite").parquet(tmp)
        graft.medallion.Maintenance.replaceDir(spark, tmp, bronzeDir)
      } else {
        // backtick-quoted resolution: dotted CSV-derived column names
        // otherwise parse as struct-field access (graft.core.Cols)
        import graft.core.Cols.quoted
        val aligned = staged.select(bronze.columns.toSeq.map(c => staged(quoted(c))): _*)
        val dup = bronze.columns.map(c => aligned(quoted(c)) <=> bronze(quoted(c))).reduce(_ && _)
        val fresh = aligned.join(bronze, dup, "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // persist: isEmpty and the append below share one evaluation of
        // the staged-dedup + anti-join instead of running it twice
        try {
          // appended files are invisible to the bronze scan above (its
          // file listing is fixed at read time), so read-then-append is
          // safe
          if (!fresh.isEmpty) fresh.write.mode("append").parquet(bronzeDir)
        } finally fresh.unpersist()
      }
    }
    stagedFiles.foreach(p => f.delete(p, false))
    } // release writer lock
    bronzeDir
  }

  /** Convenience: stream everything currently landed, then finalize.
    * Pass `schema` (the raw landing contract, pre-normalization) to
    * skip the pre-stream inference scan entirely — the streaming twin
    * of [[graft.medallion.BronzeFlow.read]]'s single-scan ingest.
    */
  def runAvailableNow(
      spark: SparkSession, lake: Lake, dataset: String,
      schema: StructType = null): String = {
    val q = start(spark, lake, dataset, schema)
    q.awaitTermination()
    finalizeBronze(spark, lake, dataset)
  }

  /** Multi-dataset streaming ingest — the streaming twin of
    * [[graft.medallion.Flows.runAll]]'s bronze leg: start every
    * dataset's landing→staging stream (they run concurrently off the
    * shared scheduler), await them all, then finalize each into
    * bronze. `schemas` carries the declared raw landing contract per
    * dataset, same as `Flows.runAll(schemas = …)` — a dataset with an
    * entry skips the pre-stream inference scan entirely; one without
    * pays it ([[inferLandingSchema]]).
    */
  def runAllAvailableNow(
      spark: SparkSession, lake: Lake, datasets: Seq[String],
      schemas: Map[String, StructType] = Map.empty): Map[String, String] = {
    val qs = datasets.map(d => d -> start(spark, lake, d, schemas.get(d).orNull))
    qs.foreach(_._2.awaitTermination())
    datasets.map(d => d -> finalizeBronze(spark, lake, d)).toMap
  }
}
