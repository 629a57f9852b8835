package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.quality.IntegrityChecks

/** Data-integrity audit (q97 surface / [[IntegrityChecks]]): planted
  * violations are counted exactly, clean tables audit clean.
  */
class IntegritySpec extends SparkTestBase {
  import spark.implicits._

  private def resultMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("planted violations are counted exactly") {
    val dir = java.nio.file.Files.createTempDirectory("integrity-spec").toString
    // orders: key 10 doubled, order 13 references missing customer 99
    Seq((10L, 1L, 5.0), (10L, 1L, 6.0), (11L, 2L, 7.0), (13L, 99L, -1.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    // lineitem: orderkey 12 is an orphan, one bad quantity, one bad discount
    Seq((10L, 100L, 1.0, 0.1), (11L, 100L, -2.0, 0.2), (12L, 101L, 3.0, 1.5))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    Seq((100L, "p1"), (101L, "p2")).toDF("p_partkey", "p_name")
      .write.parquet(s"$dir/part.parquet")

    val r = resultMap(AnalyticsOpsQueries.q97IntegrityAudit(spark, dir))
    assert(r("li_orphan_orderkey") == ((1L, 3L)))
    assert(r("li_orphan_partkey") == ((0L, 3L)))
    assert(r("ord_orphan_custkey") == ((1L, 4L)))
    assert(r("li_nonpositive_qty") == ((1L, 3L)))
    assert(r("li_discount_range") == ((1L, 3L)))
    assert(r("ord_nonpositive_total") == ((1L, 4L)))
    // both rows of the doubled key count as violations
    assert(r("ord_unique_orderkey") == ((2L, 4L)))
  }

  test("null child keys are orphans; null predicate results do not count") {
    val child = Seq(Some(1L), None, Some(9L)).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val ref = resultMap(IntegrityChecks.audit(Seq(
      IntegrityChecks.referential(child, "fk", parent, "pk", "fk_check"))))
    assert(ref("fk_check") == ((2L, 3L)), "null FK and missing FK are both orphans")

    val vals = Seq(Some(1.0), None, Some(-1.0)).toDF("v")
    val pred = resultMap(IntegrityChecks.audit(Seq(
      IntegrityChecks.predicate(vals, col("v") < 0, "neg_check"))))
    assert(pred("neg_check") == ((1L, 3L)), "NULL < 0 must not count as a violation")
  }

  test("fused same-table predicates share one scan and agree with singles") {
    val df = Seq((1.0, 0.5), (-2.0, 1.5), (3.0, -0.1)).toDF("q", "d")
    val fused = resultMap(IntegrityChecks.audit(Seq(IntegrityChecks.predicates(df, Seq(
      "nonpositive" -> (col("q") <= 0),
      "range" -> (col("d") < 0 || col("d") > 1))))))
    assert(fused("nonpositive") == ((1L, 3L)))
    assert(fused("range") == ((2L, 3L)))
    // one aggregate feeding both rows: exactly one Aggregate over the
    // relation in the plan (the explode of per-check structs is a
    // projection, not a second pass)
    val plan = IntegrityChecks.predicates(df, Seq(
      "a" -> (col("q") <= 0), "b" -> (col("d") < 0)))
      .queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"fused predicates must aggregate once, saw ${aggs.size}")
  }

  test("clean tables audit clean on the real corpus") {
    val r = resultMap(AnalyticsOpsQueries.q97IntegrityAudit(spark, "/root/testdata/sf0.001"))
    assert(r.size == 7)
    assert(r.values.forall { case (_, checked) => checked > 0L })
    // the synthetic star schema is referentially intact by construction
    assert(r("li_orphan_orderkey")._1 == 0L)
    assert(r("ord_unique_orderkey")._1 == 0L)
  }
}
