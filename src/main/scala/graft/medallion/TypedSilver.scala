package graft.medallion

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Typed domain model over the silver layer — `Dataset[T]` with
  * case-class encoders where compile-time safety helps downstream
  * consumers (all fields Optional: silver faithfully carries the
  * reference's null-on-bad-cast rows, including chunk-header
  * artifacts).
  */
final case class Album(
    id: Option[Long], title: Option[String],
    band: Option[Long], year: Option[Long])

final case class Band(
    id: Option[Long], name: Option[String], country: Option[String],
    genre: Option[String], theme: Option[String], status: Option[String],
    formed_in: Option[Long], active: Option[String], start_year: Option[Long])

final case class Review(
    id: Option[Long], album: Option[Long], title: Option[String],
    score: Option[Double], content: Option[String])

object TypedSilver {

  def albums(spark: SparkSession, lake: Lake): Dataset[Album] =
    spark.read.parquet(lake.silver("albums")).as[Album](Encoders.product[Album])

  def bands(spark: SparkSession, lake: Lake): Dataset[Band] =
    spark.read.parquet(lake.silver("bands")).as[Band](Encoders.product[Band])

  def reviews(spark: SparkSession, lake: Lake): Dataset[Review] =
    spark.read.parquet(lake.silver("reviews")).as[Review](Encoders.product[Review])
}
