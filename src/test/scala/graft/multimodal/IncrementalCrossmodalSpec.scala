package graft.multimodal

import graft.SparkTestBase

/** Day-2 cross-modal report (q227): the variant batch probes the four
  * stored modality indexes — corpus decoded once, batch decodes only
  * itself — and every variant resolves to its group original with the
  * same confidence semantics as the batch q219 report.
  */
class IncrementalCrossmodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = graft.queries.MultimodalQueries
    .q227IncrementalCrossmodal(spark, "/root/testdata/sf0.001")
  private lazy val report = df
    .select($"asset_id", $"variant", $"verdict", $"dup_of", $"n_modalities", $"modalities")
    .as[(Long, String, String, Option[Long], Long, String)]
    .collect().map(r => r._1 -> r).toMap

  test("every batch variant resolves to its group original through the stored indexes") {
    assert(report.size == 24)
    (0 until 8).foreach { g =>
      Seq(1000L + g, 2000L + g, 3000L + g).foreach { v =>
        val row = report(v)
        assert(row._3 == "duplicate" && row._4.contains(g.toLong),
          s"variant $v must resolve to original $g, got $row")
      }
    }
  }

  test("re-encode probes agree across all four modalities (confidence 4)") {
    (0 until 8).foreach { g =>
      val row = report(1000L + g)
      assert(row._5 == 4L && row._6 == "audio,image,text,video",
        s"re-encode ${1000 + g} must be flagged by all modalities, got $row")
    }
  }

  test("verdicts never cross groups; variant kind is the source dimension") {
    report.values.foreach { case (id, kind, _, dupOf, _, _) =>
      dupOf.foreach(p => assert(p == id % 1000, s"cross-group verdict: $id -> $p"))
      val expect = if (id < 2000) "reencode" else if (id < 3000) "crop_gain" else "rot_noise"
      assert(kind == expect, s"$id kind $kind")
    }
  }

  test("the report plan reads only materialized probe relations — no decode, no index rebuild reachable") {
    val plan = df.queryExecution.optimizedPlan.toString
    val rdds = plan.linesIterator.count(_.contains("LogicalRDD"))
    assert(rdds == 4, s"expected the 4 checkpointed probe relations:\n${plan.take(1200)}")
    assert(!plan.contains("MapPartitions") && !plan.contains("parquet") &&
      !plan.contains("binaryFile"),
      s"report plan must not reach decode or index scans:\n${plan.take(1200)}")
  }

  test("the injected oracle SQL renders with the captured probe-pair lists") {
    val sql = graft.queries.MultimodalQueries.q227Sql
    assert(sql.contains("VALUES") && sql.contains("min_by"))
    assert(sql.contains("(1000,0)") || sql.contains("(1000, 0)"),
      "captured re-encode probe pair (1000,0) missing from the oracle render")
  }
}
