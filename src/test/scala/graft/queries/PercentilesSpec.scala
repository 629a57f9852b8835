package graft.queries

import graft.SparkTestBase

/** q31 (approx_percentile, bounded per-group state) must track q30
  * (exact percentile, the oracle anchor) within the sketch's rank
  * error — at accuracy=10000 and sf0.001 group sizes the sketch's
  * rank error is < 1 row, so the only residual gap is interpolation
  * (exact interpolates between order statistics; the sketch returns
  * one), bounded by the relative gap between adjacent values.
  */
class PercentilesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def byFlag(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    }.toMap

  test("q31 approx percentiles track q30 exact within rank error") {
    val exact = byFlag(PipelineQueries.q30Percentiles(spark, sf))
    val approx = byFlag(PipelineQueries.q31PercentilesApprox(spark, sf))
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    for ((flag, (n, e50, e90, e99)) <- exact) {
      val (an, a50, a90, a99) = approx(flag)
      assert(an == n, s"$flag: group count $an != $n")
      for (((e, a), p) <- Seq((e50, a50), (e90, a90), (e99, a99)).zip(Seq("p50", "p90", "p99")))
        assert(math.abs(a - e) / e <= 0.02, s"$flag $p: approx $a vs exact $e")
    }
  }
}
