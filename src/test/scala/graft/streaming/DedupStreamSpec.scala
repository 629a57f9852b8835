package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.core.Tables

/** Streaming delivery dedup (DedupStream): streamed kept set ≡ batch
  * q140 kept set on real testdata for in-order delivery, including
  * chains that straddle micro-batch boundaries.
  */
class DedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("ts_us", LongType)))

  private def batchKept(dir: String): Set[Long] =
    graft.queries.RelationalQueries.q140EventDedupWindow(spark, dir)
      .filter(col("kept") === 1).select("event_id")
      .as[Long].collect().toSet

  test("streamed kept set ≡ batch q140 on sf0.001 + planted redeliveries, chains straddling batch boundaries") {
    val sf = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("dedup-stream").toString
    // plant redeliveries: every 3rd event re-sent 2 minutes later under a
    // fresh event_id — guaranteed in-window duplicates; write the planted
    // corpus as its own events table so batch and stream see THE SAME rows
    val base = Tables.load(spark, sf, "events")
    val planted = base.union(
      base.filter(col("event_id") % 3 === 0)
        .withColumn("event_id", col("event_id") + 1000000L)
        .withColumn("ts", col("ts") + lit(2L * 60 * 1000000000L)))
    val corpus = s"$root/corpus"
    planted.write.parquet(s"$corpus/events.parquet")
    val ev = Tables.load(spark, corpus, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        expr("ts div 1000").as("ts_us"))
    val (in, out, cp) = (s"$root/in", s"$root/out", s"$root/cp")
    Files.createDirectories(java.nio.file.Paths.get(in))
    // two time-ordered halves as separate files: per-identity chains
    // can straddle the micro-batch boundary, exercising carried state
    val med = ev.agg(expr("percentile(ts_us, 0.5D)")).head().getDouble(0).toLong
    ev.filter(col("ts_us") <= med).coalesce(1).write.parquet(s"$in/f1")
    ev.filter(col("ts_us") > med).coalesce(1).write.parquet(s"$in/f2")

    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/*")
      .as[DedupStream.DEv]
    DedupStream.dedup(src).writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .format("parquet").option("path", out)
      .start().awaitTermination()

    val streamed = spark.read.parquet(out).select("event_id").as[Long].collect().toSet
    val batch = batchKept(corpus)
    assert(streamed == batch,
      s"streamed minus batch: ${(streamed -- batch).take(5)}; " +
        s"batch minus streamed: ${(batch -- streamed).take(5)}")
    assert(streamed.nonEmpty && streamed.size < ev.count(),
      "the window must actually drop something on this data")
  }
}
