package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated star-schema parquet tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The events feed has shipped with two physical `ts` encodings:
    * parquet TIMESTAMP(NANOS), which Spark reads as epoch-nanos LongType
    * under `spark.sql.legacy.parquet.nanosAsLong`, and standard
    * TIMESTAMP(MICROS), which it reads as a timestamp column. Everything
    * downstream (queries, streaming rollups, z-order keys) computes on
    * the canonical epoch-nanos LongType, so normalize here — once, at
    * the scan — rather than teaching every consumer both encodings.
    *
    * Micros → nanos is exact (`* 1000`), and the UTC session
    * (core/Sessions.scala) makes the NTZ→instant cast the identity on
    * wall-clock, so both encodings yield identical values for the same
    * instant and the DuckDB oracles (`epoch_us(ts)`) agree bit-for-bit.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", tsToNanos(col("ts")))
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: expected LongType (epoch-nanos) or a timestamp type, got $other")
    }

  /** Timestamp column (µs precision) → epoch-nanos LongType. */
  private def tsToNanos(c: Column): Column =
    unix_micros(c.cast(TimestampType)) * lit(1000L)
}
