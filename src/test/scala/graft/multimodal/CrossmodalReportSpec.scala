package graft.multimodal

import graft.SparkTestBase

/** Cross-modal asset-grain duplicate report (q219 surface): the three
  * modality pair relations compose into one verdict per asset —
  * every planted variant resolves to its group original, re-encodes
  * agree across all three modalities, and no verdict ever crosses
  * groups.
  */
class CrossmodalReportSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val report = graft.queries.MultimodalQueries
    .q219CrossmodalDupReport(spark, "/root/testdata/sf0.001")
    .select($"asset_id", $"variant", $"verdict", $"dup_of", $"n_modalities", $"modalities")
    .as[(Long, String, String, Option[Long], Long, String)]
    .collect().map(r => r._1 -> r).toMap

  test("every asset gets exactly one verdict row; variants resolve to their group original") {
    assert(report.size == 32)
    (0 until 8).foreach { g =>
      Seq(1000L + g, 2000L + g, 3000L + g).foreach { v =>
        val row = report(v)
        assert(row._3 == "duplicate" && row._4.contains(g.toLong),
          s"variant $v must resolve to original $g, got $row")
      }
      // the original is itself flagged (its min-id partner is a variant)
      val orig = report(g.toLong)
      assert(orig._3 == "duplicate" && orig._4.contains(1000L + g), s"original $g: $orig")
    }
  }

  test("re-encode copies agree across all four modalities (confidence 4)") {
    (0 until 8).foreach { g =>
      val row = report(1000L + g)
      assert(row._5 == 4L && row._6 == "audio,image,text,video",
        s"re-encode $g must be flagged by all modalities, got $row")
    }
  }

  test("verdicts never cross groups") {
    report.values.foreach { case (id, _, _, dupOf, _, _) =>
      dupOf.foreach(p =>
        assert(p % 1000 == id % 1000, s"cross-group verdict: $id -> $p"))
    }
  }

  test("variant column is the source dimension") {
    assert(report(3L)._2 == "original" && report(1003L)._2 == "reencode" &&
      report(2003L)._2 == "crop_gain" && report(3003L)._2 == "rot_noise")
  }

  test("the report is distributed over materialized pair relations — decode pipelines ran once and cannot re-run") {
    // each modality pipeline is eagerly localCheckpointed during
    // construction, so (a) its decode executed exactly once, and (b)
    // the returned plan's lineage is truncated to the materialized
    // pair rows: four LogicalRDD scans, no media/file relations, no
    // codec mapPartitions seam — evaluating the report (even twice)
    // can never re-decode. The r19 shape instead collect()ed the
    // pairs to the driver, O(dups) driver memory at corpus scale.
    val df = graft.queries.MultimodalQueries
      .q219CrossmodalDupReport(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    val rdds = plan.linesIterator.count(_.contains("LogicalRDD"))
    // 4 modalities × the two sides of the pair→touch union, each a
    // re-read of the same materialized checkpoint blocks
    assert(rdds == 8, s"expected the 4 checkpointed modality relations (×2 touch sides):\n${plan.take(1200)}")
    assert(!plan.contains("MapPartitions") && !plan.contains("parquet") &&
      !plan.contains("binaryFile"),
      s"report plan must not reach back into decode pipelines:\n${plan.take(1200)}")
  }

  test("the injected oracle SQL renders with the captured pair lists") {
    val sql = graft.queries.MultimodalQueries.q219Sql
    assert(sql.contains("VALUES") && sql.contains("min_by"))
    // at least the within-group text pairs must have been captured
    assert(sql.contains("(0,1000)") || sql.contains("(0, 1000)"),
      "captured text pair (0,1000) missing from the oracle render")
  }
}
