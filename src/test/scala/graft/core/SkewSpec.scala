package graft.core

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val skewed = spark.range(10000)
    .selectExpr("CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k", "id AS v")
  private lazy val dim = Seq((0L, "hot"), (11L, "a"), (21L, "b"))
    .toDF("k", "label")

  test("salted join equals the unsalted join") {
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "label")
    val salted = Skew.saltedJoin(skewed, dim, "k", salt = 8).select("k", "v", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join preserves left-join null rows") {
    val plain = skewed.join(dim, Seq("k"), "left").select("k", "v", "label")
    val salted = Skew.saltedJoin(skewed, dim, "k", 4, "left").select("k", "v", "label")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join rejects outer types that would duplicate small-side rows") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, "k", 4, "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, "k", 4, "full_outer")
    }
  }

  test("salted two-phase sum equals the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(org.apache.spark.sql.functions.sum($"v").as("sum_v"),
        org.apache.spark.sql.functions.count($"v").as("count"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = Skew.saltedSum(skewed, "k", "v", salt = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == direct)
  }
}
