package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Parity

/** Single aggregation point for every query surface the engine exposes.
  * SparkEntry delegates here; new operator families register by adding
  * their maps below. Keys must be unique across families (enforced at
  * object-init time so a collision fails fast in any test or run).
  */
object Registry {
  // def, not val: oracle maps may re-render per access (q82 splices the
  // centroids captured by its latest run into its oracle SQL, so the
  // dump Verify writes AFTER running queries must re-read them)
  private def families: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Parity.queries, Parity.oracleSql),
      (graft.queries.MedallionRoundtrip.queries, graft.queries.MedallionRoundtrip.oracleSql),
      (graft.queries.TextQueries.queries, graft.queries.TextQueries.oracleSql),
      (graft.queries.SimilarityQueries.queries, graft.queries.SimilarityQueries.oracleSql),
      (graft.queries.SqlSurfaceQueries.queries, graft.queries.SqlSurfaceQueries.oracleSql),
      (graft.queries.PipelineQueries.queries, graft.queries.PipelineQueries.oracleSql),
      (graft.queries.MultimodalQueries.queries, graft.queries.MultimodalQueries.oracleSql),
      (graft.queries.RelationalQueries.queries, graft.queries.RelationalQueries.oracleSql),
      (graft.queries.CorpusOpsQueries.queries, graft.queries.CorpusOpsQueries.oracleSql),
      (graft.queries.AnalyticsOpsQueries.queries, graft.queries.AnalyticsOpsQueries.oracleSql),
      (graft.queries.ScaleOpsQueries.queries, graft.queries.ScaleOpsQueries.oracleSql),
      (graft.queries.CurationOpsQueries.queries, graft.queries.CurationOpsQueries.oracleSql),
      (graft.queries.RetrievalQueries.queries, graft.queries.RetrievalQueries.oracleSql),
      (graft.queries.GovernanceQueries.queries, graft.queries.GovernanceQueries.oracleSql)
    )

  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = families.flatMap(_._1)
    require(all.size == all.map(_._1).distinct.size, "duplicate query keys across families")
    all.toMap
  }

  def oracleSql: Map[String, String] = {
    val o = families.flatMap(_._2).toMap
    require(o.keySet.subsetOf(queries.keySet),
      s"oracleSql keys without queries: ${o.keySet -- queries.keySet}")
    o
  }
}
