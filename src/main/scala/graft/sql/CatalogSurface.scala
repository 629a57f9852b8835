package graft.sql

import org.apache.spark.sql.SparkSession

import graft.medallion.Lake

/** Catalog-table surface: namespaces `bronze`/`silver`/`gold` with the
  * lake's parquet layers registered as external tables, plus the
  * externally-defined SQL view layer (the reference's Trino surface,
  * `scripts/trino_create_tables.sql:14-121`, re-expressed as Spark SQL
  * — same catalog, same storage, one engine instead of two).
  *
  * External `LOCATION`-based tables mean zero data movement: the
  * catalog points at the flow-written parquet, so pipeline reruns are
  * immediately visible to SQL. An Iceberg runtime would slot in via
  * `spark.sql.catalog.*` without changing callers; nothing the
  * reference queries depends on snapshots/branches (SURVEY §3 E2).
  */
object CatalogSurface {

  val Namespaces: Seq[String] = Seq("bronze", "silver", "gold")

  private def q(path: String): String = path.replace("'", "''")

  /** Create namespaces and register one external table per existing
    * layer dataset. Idempotent.
    */
  def registerLake(
      spark: SparkSession, lake: Lake,
      bronze: Seq[String] = Seq("albums", "bands", "reviews"),
      silver: Seq[String] = Seq("albums", "bands", "reviews", "music_catalog", "album_reviews"),
      gold: Seq[String] = Seq("top10_by_country", "band_avg_scores", "brazilian_bands", "band_album_counts")): Unit = {
    Namespaces.foreach(ns => spark.sql(s"CREATE DATABASE IF NOT EXISTS $ns"))
    def register(ns: String, name: String, path: String): Unit =
      if (exists(spark, path)) {
        spark.sql(s"DROP TABLE IF EXISTS $ns.$name")
        spark.sql(
          s"CREATE TABLE $ns.$name USING PARQUET LOCATION '${q(path)}'")
      }
    bronze.foreach(d => register("bronze", d, lake.bronze(d)))
    silver.foreach(d => register("silver", d, lake.silver(d)))
    gold.foreach(d => register("gold", d, lake.gold(d)))
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(p.toUri, spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** Managed catalog write (the Iceberg-variant write path, S9:
    * bronze overwrite / silver+gold append —
    * `flows_iceberg/bronze_iceberg.py:40-44`, `silver_iceberg.py:26`).
    * `saveAsTable` creates from the DataFrame schema when absent —
    * the Arrow-schema-on-write behavior — and an Iceberg catalog
    * would swap in via `spark.sql.catalog.*` with the same calls.
    */
  def writeManaged(
      df: org.apache.spark.sql.DataFrame, table: String,
      mode: String = "overwrite"): Unit = {
    val ns = table.split('.').head
    df.sparkSession.sql(s"CREATE DATABASE IF NOT EXISTS $ns")
    df.write.mode(mode).saveAsTable(table)
  }

  /** Invalidate cached file listings after a flow rewrites a layer in
    * place (external tables cache their file manifest; a truncate +
    * rewrite otherwise leaves readers pointing at deleted part files).
    * Call after GoldFlow/SilverFlow reruns.
    */
  def refreshAll(spark: SparkSession): Unit =
    Namespaces.foreach { ns =>
      if (spark.catalog.databaseExists(ns))
        spark.catalog.listTables(ns).collect()
          .filter(!_.isTemporary) // listTables surfaces temp views in every db
          .foreach(t => spark.catalog.refreshTable(s"$ns.${t.name}"))
    }

  /** The Trino view (`trino_create_tables.sql:114-121`): global top-100
    * bands by average score — plans TakeOrderedAndProject, no global
    * sort at any scale.
    */
  def createViews(spark: SparkSession): Unit =
    spark.sql(
      """CREATE OR REPLACE VIEW gold.band_score_ranking AS
        |SELECT band_id, band_name, country, review_count, avg_score
        |FROM gold.band_avg_scores
        |ORDER BY avg_score DESC
        |LIMIT 100""".stripMargin)
}
