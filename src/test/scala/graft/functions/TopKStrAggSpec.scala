package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[TopKStrAgg]] — the string-keyed sibling of [[TopKAgg]], swapped in
  * for per-group vocabulary windows (q176 per-lang trigrams, q192
  * per-source terms, q56/q95 per-doc TF-IDF profiles). Load-bearing
  * property, as for TopKAggSpec: per group, the ranked output is
  * IDENTICAL to `row_number().over(partitionBy(g).orderBy(score, key))`
  * under any partitioning, with key ties breaking in Spark's binary
  * string order — including non-ASCII keys, where UTF8 byte order must
  * equal the window's string comparison.
  */
class TopKStrAggSpec extends SparkTestBase {
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int,
      asc: Boolean): Seq[(Long, Int, String)] = {
    val ord = if (asc) col("score").asc else col("score").desc
    val w = Window.partitionBy(col("g")).orderBy(ord, col("key"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("g"), col("rank"), col("key"))
      .as[(Long, Int, String)].collect().toSeq.sorted
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int,
      asc: Boolean): Seq[(Long, Int, String)] = {
    TopKStrAgg.register(spark)
    df.groupBy(col("g"))
      .agg(TopKStrAgg.topkByStr(col("score"), col("key"), k, asc).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("e.key"))
      .as[(Long, Int, String)].collect().toSeq.sorted
  }

  test("topk_by_str matches the row_number window, both directions, any partitioning") {
    // deterministic scores with deliberate ties; distinct keys per group
    val rows = (0L until 500L).map(i => (i % 5, (i % 7).toDouble, f"k$i%04d"))
    for (parts <- Seq(1, 7, 32); asc <- Seq(true, false)) {
      val df = spark.createDataset(rows).toDF("g", "score", "key")
        .repartition(parts)
      assert(viaAgg(df, 10, asc) === viaWindow(df, 10, asc),
        s"parts=$parts asc=$asc diverged from window")
    }
  }

  test("non-ASCII key ties break in Spark's string order") {
    // equal scores force the tiebreak; keys span 1–3 byte UTF-8 and
    // include a codepoint above ASCII that sorts AFTER all ASCII
    val df = Seq((1L, 1.0, "zebra"), (1L, 1.0, "ábaco"), (1L, 1.0, "連結"),
      (1L, 1.0, "aaa"), (1L, 1.0, "Z"))
      .toDF("g", "score", "key")
    assert(viaAgg(df, 3, asc = false) === viaWindow(df, 3, asc = false))
    assert(viaAgg(df, 5, asc = true) === viaWindow(df, 5, asc = true))
  }

  test("groups smaller than k emit all their rows, ranked") {
    val df = Seq((1L, 3.0, "a"), (1L, 1.0, "b"), (2L, 5.0, "c"))
      .toDF("g", "score", "key")
    assert(viaAgg(df, 10, asc = true) ===
      Seq((1L, 1, "b"), (1L, 2, "a"), (2L, 1, "c")))
  }

  test("null scores and null keys are skipped, not ranked") {
    TopKStrAgg.register(spark)
    val df = Seq((1L, Some(2.0), Some("a")), (1L, None, Some("b")),
      (1L, Some(1.0), None), (1L, Some(3.0), Some("d")))
      .toDF("g", "score", "key")
    val out = df.groupBy(col("g"))
      .agg(TopKStrAgg.topkByStr(col("score"), col("key"), 5, asc = true).as("tk"))
      .select(explode(col("tk.key")).as("key")).as[String].collect().toSeq
    assert(out === Seq("a", "d"))
  }

  test("serialization round-trips through a forced shuffle merge") {
    val rows = (0L until 2000L).map(i => (i % 3, math.sin(i.toDouble), f"k$i%05d"))
    val df = spark.createDataset(rows).toDF("g", "score", "key").repartition(32)
    assert(viaAgg(df, 25, asc = false) === viaWindow(df, 25, asc = false))
  }

  test("NaN ranks greatest and -0.0 equals 0.0, matching Spark sort order") {
    val df = Seq((1L, Double.NaN, "a"), (1L, 1.0, "b"), (1L, -0.0, "c"),
      (1L, 0.0, "d"), (1L, -1.0, "e")).toDF("g", "score", "key")
    assert(viaAgg(df, 5, asc = false) === viaWindow(df, 5, asc = false))
    assert(viaAgg(df, 3, asc = true) === viaWindow(df, 3, asc = true))
  }

  test("plans as an ObjectHashAggregate with map-side partial combine") {
    TopKStrAgg.register(spark)
    val df = spark.range(100).select((col("id") % 4).as("g"),
      col("id").cast("double").as("score"), col("id").cast("string").as("key"))
      .groupBy(col("g"))
      .agg(TopKStrAgg.topkByStr(col("score"), col("key"), 5, asc = true).as("tk"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(400))
    assert(p.contains("partial_topk_by_str"), "no map-side partial aggregation:\n" + p.take(400))
  }
}
