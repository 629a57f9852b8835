package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column pipeline as a driver-verifiable query: synthetic
  * binary media (real PNGs and WAVs from a deterministic generator) →
  * size-aware repartition → batched REAL decode (ImageIO pixels, RIFF
  * PCM samples; video stays a byte-histogram stub) → per-kind feature
  * statistics. Rows-only check: the corpus is generated Scala-side, so
  * no DuckDB oracle — determinism is what the driver can assert, and
  * the decode correctness (planted dims/channel means/sample rates) is
  * spec-covered in MultimodalSpec.
  */
object MultimodalQueries {

  def q29MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(s, 1000)
    val features = Multimodal.extractFeatures(
      Multimodal.repartitionForDecode(media, targetBytes = 256 * 1024))
    features.toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(element_at(col("features"), 1), 6).as("f0"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("f0")), 6).as("avg_f0"))
      .orderBy(col("kind"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_multimodal_features" -> (q29MultimodalFeatures _))

  val oracleSql: Map[String, String] = Map.empty
}
