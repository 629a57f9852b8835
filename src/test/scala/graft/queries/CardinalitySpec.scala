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
