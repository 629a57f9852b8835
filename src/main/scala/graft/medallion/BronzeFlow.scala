package graft.medallion

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Landing → bronze flow (reference `flows/bronze.py:63-113`): CSV read
  * with schema inference, header normalize+dedupe, full-row distinct,
  * snappy parquet write per dataset.
  *
  * Deviation from the reference, on purpose: the reference maps over
  * landing objects individually and each one overwrites the same bronze
  * key (`bronze.py:92-98`) — correct only while Firehose delivers one
  * object per dataset. We read the whole `landing/<dataset>/` directory
  * as one distributed scan, so bronze is the dedup of ALL landed data
  * regardless of object count — same result on the reference's layout,
  * and still correct (and parallel) with thousands of landing objects.
  *
  * Dedup runs on the raw inferred frame BEFORE any typing, as the
  * reference does (`bronze.py:74-80`) — embedded chunk-header rows force
  * the affected columns to string and must collapse identically
  * (SURVEY §7.3 risk 4).
  */
object BronzeFlow {

  /** Read one dataset's landing CSVs → normalized, deduped DataFrame. */
  def read(spark: SparkSession, landingDir: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(landingDir)
    ColumnNormalizer(raw).dropDuplicates()
  }

  /** Ingest one dataset landing→bronze; returns the bronze path. */
  def ingest(spark: SparkSession, landingDir: String, bronzeDir: String): String = {
    read(spark, landingDir).write.mode("overwrite").parquet(bronzeDir)
    bronzeDir
  }

  private def hasLanding(spark: SparkSession, dir: String): Boolean = {
    val p = new HPath(dir)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** Flow over datasets with landing data; manifest of bronze paths
    * (reference `bronze.py:102-113`: empty landing → empty manifest).
    */
  def run(spark: SparkSession, lake: Lake, datasets: Seq[String]): Map[String, String] =
    datasets.flatMap { ds =>
      if (hasLanding(spark, lake.landing(ds)))
        Some(ds -> ingest(spark, lake.landing(ds), lake.bronze(ds)))
      else None
    }.toMap
}
