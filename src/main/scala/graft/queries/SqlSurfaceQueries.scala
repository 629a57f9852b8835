package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** SQL-surface parity check: the SAME SQL text runs on Spark SQL (over
  * temp views of the testdata tables) and on DuckDB as its own oracle —
  * the engine-to-engine shared-surface shape of the reference's Trino
  * layer (SURVEY §3 E2), with Spark as both engines. Plus the
  * ANALYZE-style statistics surface (q120) a catalog layer exposes.
  */
object SqlSurfaceQueries {

  /** q06's ranking view expressed purely through `spark.sql` — one SQL
    * string, two engines, hash-identical results.
    */
  def q24SqlSurface(s: SparkSession, dir: String): DataFrame = {
    Seq("orders", "customer", "nation")
      .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(Parity.q06Sql)
  }

  // ===== q120 — table profile (ANALYZE-style per-column statistics) =======

  /** Per-column statistics of the documents table — row count, null
    * count, exact distinct count, 40-char min/max prefixes, and mean
    * byte length — the dataset-card / `ANALYZE TABLE` surface a
    * catalog layer feeds to cost-based planning and a data steward
    * reads before training on a source. Values are compared as their
    * canonical string casts (both engines order strings by UTF-8
    * bytes) and the mean length divides exact integer sums
    * (byte length, not code points — `octet_length`/`strlen` agree
    * where character semantics could diverge).
    *
    * Scale shape: ONE scan — all 5 columns' aggregates run in a single
    * pass (Spark plans the multi-`countDistinct` via one Expand + two
    * hash aggregates; input rows replicate once per distinct column,
    * the standard multi-distinct plan). `stack` then melts the 1×26
    * aggregate row into the 5-row profile driver-side-free. At 100 TB
    * the exact distincts are the cost center — the documented swap is
    * q52's HLL sketch per column (same shape, mergeable, no Expand).
    */
  def q120TableProfile(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs: Seq[org.apache.spark.sql.Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        substring(min(col(c).cast("string")), 1, 40).as(s"min_$c"),
        substring(max(col(c).cast("string")), 1, 40).as(s"max_$c"),
        round(sum(octet_length(col(c).cast("string"))).cast("double")
          / count(col(c)), 6).as(s"avg_$c"))
    }
    val one = docs.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', cnt_$c, nd_$c, min_$c, max_$c, avg_$c").mkString(", ")
    one.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_nonnull, n_distinct, min_pfx, max_pfx, avg_bytes_r6)"))
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_pfx"), col("max_pfx"), col("avg_bytes_r6"))
      .orderBy(col("column_name"))
  }

  val q120Sql: String = {
    def branch(c: String): String =
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
         |  substr(min(CAST($c AS VARCHAR)), 1, 40) AS min_pfx,
         |  substr(max(CAST($c AS VARCHAR)), 1, 40) AS max_pfx,
         |  round(CAST(sum(strlen(CAST($c AS VARCHAR))) AS DOUBLE) / count($c), 6)
         |    AS avg_bytes_r6
         |FROM documents""".stripMargin
    Seq("doc_id", "text", "lang", "source", "n_chars")
      .map(branch).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_sql_surface" -> (q24SqlSurface _),
    "q120_table_profile" -> (q120TableProfile _))

  val oracleSql: Map[String, String] = Map(
    "q24_sql_surface" -> Parity.q06Sql,
    "q120_table_profile" -> q120Sql)
}
