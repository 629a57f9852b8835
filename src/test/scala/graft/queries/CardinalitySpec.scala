package graft.queries

import graft.SparkTestBase

/** q52 (approx_count_distinct, fixed-size HLL++ sketch per group) must
  * track q51 (exact count distinct, the oracle anchor) within the
  * configured relative standard deviation — rsd = 0.01, checked at 5
  * sigma so the bound holds deterministically for this data rather
  * than probabilistically.
  */
class CardinalitySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def byType(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r => r.getString(0) -> (r.getLong(1), r.getLong(2)) }.toMap

  test("q53 sketch-merge estimate ≡ direct sketch over raw; probe never rescans events") {
    // mergeability: estimate(union(per-day sketches)) must equal the
    // estimate of one sketch over all raw rows — HLL union is lossless
    import org.apache.spark.sql.functions._
    val direct = graft.core.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lgConfigK = 12))
        .as("distinct_users_est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaIndex = PipelineQueries.q53IncrementalCardinality(spark, sf)
    val got = viaIndex.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == direct, "daily-sketch union diverged from the direct sketch")
    // and within the HLL error envelope of the exact counts
    val exact = byType(PipelineQueries.q51Cardinality(spark, sf)).view.mapValues(_._1).toMap
    for ((tpe, e) <- exact)
      assert(math.abs(got(tpe) - e).toDouble / math.max(e, 1L) <= 0.05,
        s"$tpe: estimate ${got(tpe)} vs exact $e")
    // probe-path plan reads the persisted sketch table, never raw events
    val scans = viaIndex.queryExecution.executedPlan.toString
    assert(scans.contains("hll_daily"), "probe should scan the warehouse sketch table")
    assert(!scans.contains("events.parquet"), "probe must not rescan raw events")
  }

  test("q137 merged daily histograms ≡ direct quantile over raw; probe never rescans events") {
    import org.apache.spark.sql.functions._
    // direct recompute from raw at the same cent grain and rank rule
    val raw = graft.core.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expected = raw.groupBy(_._1).map { case (tpe, vs) =>
      val sorted = vs.map(_._2).sorted
      def q(p: Double) = sorted(math.ceil(p * sorted.size).toInt - 1)
      tpe -> ((q(0.50), q(0.90), q(0.99), sorted.size.toLong))
    }
    val probe = PipelineQueries.q137IncrPercentiles(spark, sf)
    val got = probe.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected, s"histogram-merge quantiles diverged: $got vs $expected")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("hist_daily"), "probe should scan the warehouse histograms")
    assert(!plan.contains("events.parquet"), "probe must not rescan raw events")
  }

  test("q52 approx cardinality tracks q51 exact within the rsd bound") {
    val exact = byType(PipelineQueries.q51Cardinality(spark, sf))
    val approx = byType(PipelineQueries.q52CardinalityApprox(spark, sf))
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    for ((tpe, (eDistinct, eN)) <- exact) {
      val (aDistinct, aN) = approx(tpe)
      assert(aN == eN, s"$tpe: total count $aN != $eN (count(*) is not approximate)")
      // all-NULL group → exact 0; the sketch must agree exactly (a
      // relative bound would be 0/0)
      if (eDistinct == 0L) assert(aDistinct == 0L, s"$tpe: approx $aDistinct vs exact 0")
      else assert(math.abs(aDistinct - eDistinct).toDouble / eDistinct <= 0.05,
        s"$tpe: approx $aDistinct vs exact $eDistinct")
    }
  }
}
