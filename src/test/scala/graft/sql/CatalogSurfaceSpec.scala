package graft.sql

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.medallion._

/** Catalog namespaces + external tables + the Trino-analogue view over
  * a real medallion run.
  */
class CatalogSurfaceSpec extends SparkTestBase {

  private lazy val lake: Lake = {
    val root = Files.createTempDirectory("catalog-e2e").toString
    val fixtures = Paths.get(getClass.getResource("/fixtures/albums.csv").toURI)
      .getParent.toString
    val l = Lake(root)
    LandingFlow.run(fixtures, l, maxBytes = 100, bufferBytes = 1000)
    val bronze = BronzeFlow.run(spark, l, Seq("albums", "bands", "reviews"))
    SilverFlow.run(spark, l, bronze)
    GoldFlow.run(spark, l)
    l
  }

  test("namespaces + external tables resolve through spark.table") {
    CatalogSurface.registerLake(spark, lake)
    assert(spark.table("bronze.reviews").count() == 7)
    assert(spark.table("silver.music_catalog").count() == 7)
    assert(spark.table("gold.band_avg_scores").count() == 4)
    // brazilian_bands was empty → guarded, so it must NOT be registered
    assert(!spark.catalog.tableExists("gold.brazilian_bands"))
  }

  test("catalog tables survive flow rewrites after refresh") {
    CatalogSurface.registerLake(spark, lake)
    val before = spark.table("gold.band_avg_scores").count()
    GoldFlow.run(spark, lake) // rerun: truncate + rewrite same data
    CatalogSurface.refreshAll(spark) // external tables cache file lists
    assert(spark.table("gold.band_avg_scores").count() == before)
  }

  test("managed write path: create-from-schema, overwrite and append modes") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    CatalogSurface.writeManaged(df, "bronze.managed_probe")
    assert(spark.table("bronze.managed_probe").count() == 2)
    CatalogSurface.writeManaged(df, "bronze.managed_probe", mode = "append")
    assert(spark.table("bronze.managed_probe").count() == 4)
    CatalogSurface.writeManaged(df, "bronze.managed_probe") // overwrite resets
    assert(spark.table("bronze.managed_probe").count() == 2)
    spark.sql("DROP TABLE bronze.managed_probe")
  }

  test("band_score_ranking view: Trino DDL analogue over the catalog") {
    CatalogSurface.registerLake(spark, lake)
    CatalogSurface.createViews(spark)
    val ranked = spark.sql(
      "SELECT band_name, avg_score FROM gold.band_score_ranking").collect()
    assert(ranked.length == 4)
    val scores = spark.sql("SELECT avg_score FROM gold.band_score_ranking")
      .collect().map(_.getDouble(0)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
