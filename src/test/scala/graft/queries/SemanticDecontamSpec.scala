package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** q128 semantic decontamination: planted eval-identical and
  * eval-orthogonal training vectors pin the cut boundary, the hit
  * count, and the broadcast-no-window plan shape.
  */
class SemanticDecontamSpec extends SparkTestBase {
  import spark.implicits._

  private def writeVecs(rows: Seq[(Long, Seq[Float])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("semdecon-spec").toString
    rows.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q128 cuts eval-identical vectors, keeps orthogonal ones, counts hits") {
    val dir = writeVecs(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),      // eval A
      1L -> Seq(0f, 1f, 0f, 0f),      // eval B
      50L -> Seq(2f, 0f, 0f, 0f),     // identical direction to A → cut
      51L -> Seq(0f, 0f, 1f, 0f),     // orthogonal to both → kept
      52L -> Seq(1f, 1f, 0f, 0f),     // cos 1/√2 ≈ .707 to BOTH → cut, 2 hits
      53L -> Seq(1f, 0f, 3f, 0f)))    // cos 1/√10 ≈ .316 to A → cut, 1 hit
    val out = RetrievalQueries.q128SemanticDecontaminate(spark, dir)
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(50L, 51L, 52L, 53L), "eval ids must not appear")
    assert(out(50L) == ((50L, 1000000L, 1L, 0)))
    assert(out(51L)._2 == 0L && out(51L)._3 == 0L && out(51L)._4 == 1)
    assert(out(52L)._2 == math.floor(1 / math.sqrt(2) * 1e6 + 0.5).toLong
      && out(52L)._3 == 2L && out(52L)._4 == 0)
    assert(out(53L)._2 == math.floor(1 / math.sqrt(10) * 1e6 + 0.5).toLong
      && out(53L)._3 == 1L && out(53L)._4 == 0)
  }

  test("q128 plan: eval side broadcast, no window, no sort-merge join") {
    val plan = RetrievalQueries
      .q128SemanticDecontaminate(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"eval set must ride a broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "corpus must never shuffle for the eval join")
    assert(!plan.contains("Window"), "the per-vector max is an aggregate, not a window")
  }
}
