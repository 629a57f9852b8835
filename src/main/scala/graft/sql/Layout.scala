package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ZOrderKey

/** Multi-dimensional data layout: write a table Z-ordered on two
  * columns so scans filtering on EITHER column skip most files and
  * row groups via parquet min/max stats. Complements [[Bucketing]]
  * (which co-locates joins) and partitioned writes (which prune on
  * the partition column only): Z-ordering prunes on BOTH clustered
  * columns without directory explosion — the right layout for a
  * 100 TB events table queried by user AND by time.
  */
object Layout {

  /** Write `df` Z-ordered on (dimA, dimB) into `numFiles` files.
    *
    * Each dimension is min/max-scaled to 32 bits, interleaved by the
    * codegen'd [[ZOrderKey]] expression, then range-partitioned and
    * sorted by the key — range partitioning makes files contiguous
    * Z-ranges (2-D blocks), so every file's min/max footprint is
    * narrow in BOTH dimensions. Linear scaling keeps the normalize
    * pass to one cheap min/max aggregate; a heavily skewed dimension
    * degrades block balance (not correctness) — swap in
    * approx-quantile cut points for rank-like scaling if that bites.
    *
    * The helper columns never reach the written schema.
    */
  def zorderWrite(df: DataFrame, dimA: String, dimB: String,
      outDir: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles=$numFiles must be >= 1")
    val internal = Seq("__z", "__lo_a", "__hi_a", "__lo_b", "__hi_b")
    val clash = df.columns.toSet.intersect(internal.toSet)
    require(clash.isEmpty, s"input columns collide with internal names: $clash")
    ZOrderKey.register(df.sparkSession)
    val bounds = df.agg(
      min(col(dimA)).as("__lo_a"), max(col(dimA)).as("__hi_a"),
      min(col(dimB)).as("__lo_b"), max(col(dimB)).as("__hi_b"))
    def scaled(c: String, lo: String, hi: String) = {
      val span = greatest(col(hi) - col(lo), lit(1L)).cast("double")
      (((col(c) - col(lo)).cast("double") / span) * 4294967295.0).cast("long")
    }
    val keyed = df.crossJoin(broadcast(bounds))
      .withColumn("__z", ZOrderKey.zorderKey(
        scaled(dimA, "__lo_a", "__hi_a"), scaled(dimB, "__lo_b", "__hi_b")))
    keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__lo_a", "__hi_a", "__lo_b", "__hi_b")
      .write.mode("overwrite").parquet(outDir)
  }
}
