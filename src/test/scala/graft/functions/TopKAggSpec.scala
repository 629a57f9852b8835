package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[TopKAgg]] — the bounded per-split top-k aggregate that replaces
  * global per-group windows on the ANN scoring paths. The load-bearing
  * property: for every group, the aggregate's ranked output is
  * IDENTICAL to `row_number().over(partitionBy(g).orderBy(...))`
  * regardless of partitioning (partial buffers merge losslessly within
  * the top-k), while state stays O(k) per group per split.
  */
class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int,
      asc: Boolean): Seq[(Long, Int, Long)] = {
    val ord = if (asc) col("score").asc else col("score").desc
    val w = Window.partitionBy(col("g")).orderBy(ord, col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("g"), col("rank"), col("id"))
      .as[(Long, Int, Long)].collect().toSeq.sorted
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int,
      asc: Boolean): Seq[(Long, Int, Long)] = {
    TopKAgg.register(spark)
    df.groupBy(col("g"))
      .agg(TopKAgg.topkBy(col("score"), col("id"), k, asc).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("e.id"))
      .as[(Long, Int, Long)].collect().toSeq.sorted
  }

  test("topk_by matches the row_number window, both directions, any partitioning") {
    // deterministic scores with deliberate ties (score = id % 7)
    val rows = (0L until 500L).map(i => (i % 5, (i % 7).toDouble, i))
    for (parts <- Seq(1, 7, 32); asc <- Seq(true, false)) {
      val df = spark.createDataset(rows).toDF("g", "score", "id")
        .repartition(parts)
      assert(viaAgg(df, 10, asc) === viaWindow(df, 10, asc),
        s"parts=$parts asc=$asc diverged from window")
    }
  }

  test("groups smaller than k emit all their rows, ranked") {
    val df = Seq((1L, 3.0, 10L), (1L, 1.0, 11L), (2L, 5.0, 12L))
      .toDF("g", "score", "id")
    assert(viaAgg(df, 10, asc = true) ===
      Seq((1L, 1, 11L), (1L, 2, 10L), (2L, 1, 12L)))
  }

  test("null scores are skipped, not ranked") {
    TopKAgg.register(spark)
    val df = Seq((1L, Some(2.0), 10L), (1L, None, 11L), (1L, Some(1.0), 12L))
      .toDF("g", "score", "id")
    val out = df.groupBy(col("g"))
      .agg(TopKAgg.topkBy(col("score"), col("id"), 5, asc = true).as("tk"))
      .select(explode(col("tk.id")).as("id")).as[Long].collect().toSeq
    assert(out === Seq(12L, 10L))
  }

  test("serialization round-trips through a forced shuffle merge") {
    // many input splits per group forces partial buffers through
    // serialize/merge; equality with the window is the lossless proof
    val rows = (0L until 2000L).map(i => (i % 3, math.sin(i.toDouble), i))
    val df = spark.createDataset(rows).toDF("g", "score", "id").repartition(32)
    assert(viaAgg(df, 25, asc = false) === viaWindow(df, 25, asc = false))
  }

  test("NaN ranks greatest and -0.0 equals 0.0, matching Spark sort order") {
    val df = Seq((1L, Double.NaN, 1L), (1L, 1.0, 2L), (1L, -0.0, 3L),
      (1L, 0.0, 4L), (1L, -1.0, 5L)).toDF("g", "score", "id")
    // desc: NaN first (greatest), then 1.0; ±0.0 tie breaks by id
    assert(viaAgg(df, 5, asc = false) === viaWindow(df, 5, asc = false))
    assert(viaAgg(df, 3, asc = true) === viaWindow(df, 3, asc = true))
  }

  test("plans as an ObjectHashAggregate with map-side partial combine") {
    TopKAgg.register(spark)
    val df = spark.range(100).select((col("id") % 4).as("g"),
      col("id").cast("double").as("score"), col("id"))
      .groupBy(col("g"))
      .agg(TopKAgg.topkBy(col("score"), col("id"), 5, asc = true).as("tk"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(400))
    assert(p.contains("partial_topk_by"), "no map-side partial aggregation:\n" + p.take(400))
  }
}
