package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** SQL-surface parity check: the SAME SQL text runs on Spark SQL (over
  * temp views of the testdata tables) and on DuckDB as its own oracle —
  * the engine-to-engine shared-surface shape of the reference's Trino
  * layer (SURVEY §3 E2), with Spark as both engines.
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_sql_surface" -> (q24SqlSurface _))

  val oracleSql: Map[String, String] = Map(
    "q24_sql_surface" -> Parity.q06Sql)
}
