package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.relational.AsofJoin

/** Streaming as-of enrichment must equal the batch as-of over the full
  * feed (per-batch enrichment is exact — see EnrichStream's doc), and a
  * checkpointed rerun must add nothing.
  */
class EnrichStreamSpec extends SparkTestBase {

  test("streamed enrichment ≡ batch as-of; rerun adds nothing") {
    val root = Files.createTempDirectory("enrich-stream").toString
    val ev = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_us", expr("ts div 1000")).drop("ts", "props")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      .cache()

    // land the click feed as TWO separate files → at least two distinct
    // source files for the stream to batch up
    val Array(a, b) = clicks.randomSplit(Array(0.5, 0.5), seed = 7)
    a.coalesce(1).write.parquet(s"$root/in/p1")
    b.coalesce(1).write.mode("append").parquet(s"$root/in/p1") // same dir, second file set
    val inDir = s"$root/in/p1"

    val q = EnrichStream.start(spark, inDir, clicks.schema, facts,
      key = "user_id", ts = "ts_us", payload = Seq("purchase_id", "purchase_value"),
      outDir = s"$root/out", checkpointDir = s"$root/ckpt")
    q.awaitTermination()

    val streamed = EnrichStream.readEnriched(spark, s"$root/out").drop("batch_id")
    val batch = AsofJoin.asofJoin(clicks, facts, "user_id", "ts_us",
      Seq("purchase_id", "purchase_value"))
    assert(streamed.count() == clicks.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    // second AvailableNow run against the same checkpoint: no new rows
    val q2 = EnrichStream.start(spark, inDir, clicks.schema, facts,
      key = "user_id", ts = "ts_us", payload = Seq("purchase_id", "purchase_value"),
      outDir = s"$root/out", checkpointDir = s"$root/ckpt")
    q2.awaitTermination()
    assert(EnrichStream.readEnriched(spark, s"$root/out").count() == clicks.count())
  }

  test("tolerance and direction thread through the stream") {
    val root = Files.createTempDirectory("enrich-fwd").toString
    import spark.implicits._
    val events = Seq((1L, "u1", 100L), (2L, "u1", 5L), (3L, "u2", 50L))
      .toDF("eid", "k", "t")
    val facts = Seq(("u1", 110L, 900L), ("u1", 400L, 901L), ("u2", 45L, 902L))
      .toDF("k", "t", "fact_id")
    events.write.parquet(s"$root/in")
    val q = EnrichStream.start(spark, s"$root/in", events.schema, facts,
      key = "k", ts = "t", payload = Seq("fact_id"),
      outDir = s"$root/out", checkpointDir = s"$root/ckpt",
      tolerance = Some(10L), direction = AsofJoin.Forward)
    q.awaitTermination()
    val got = EnrichStream.readEnriched(spark, s"$root/out")
      .select("eid", "fact_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // eid=1: next fact at 110, distance 10 = tol → kept
    // eid=2: next fact at 110, distance 105 → dropped
    // eid=3: no at-or-after fact within tol for u2? fact at 45 is BEFORE 50 → null
    assert(got == Map(1L -> Some(900L), 2L -> None, 3L -> None))
  }
}
