package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase

/** Streaming sequence packing (PackStream): packs continue across
  * micro-batches from persisted per-split state — streamed ≡ batch q41
  * for id-ordered arrival, and crash replay is a no-op on packs and
  * state.
  */
class PackStreamSpec extends SparkTestBase {
  import spark.implicits._

  // long docs so packs genuinely span batch boundaries: ~500 tokens each
  // -> the 2048 budget holds ~4 docs, and the batch cut at doc 6 falls
  // mid-pack
  private val docs = (1L to 12L).map { i =>
    i -> (1 to 500).map(t => s"w$t").mkString(" ")
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def rollup(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, Long)] =
    df.groupBy($"split", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("total_tokens"))
      .as[(String, Long, Long, Long)].collect().toSet

  test("streamed over two micro-batches rolls up to the one-shot q41 packing") {
    val root = Files.createTempDirectory("pack-stream").toString
    val (in, st, out, cp) = (s"$root/in", s"$root/state", s"$root/out", s"$root/cp")
    Files.createDirectories(java.nio.file.Paths.get(in))
    docs.take(6).toDF("doc_id", "text").write.parquet(s"$in/f1")
    docs.drop(6).toDF("doc_id", "text").write.parquet(s"$in/f2")
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(s"$in/*")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        PackStream.packAndAppend(b, id, st, out)
      }
      .start().awaitTermination()

    val streamed = rollup(PackStream.readPacks(spark, out))
    val dir = Files.createTempDirectory("pack-batch").toString
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val batch = graft.queries.PipelineQueries.q41SequencePack(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed == batch, s"streamed $streamed != batch $batch")
    // packing genuinely crossed the batch boundary: some pack holds docs
    // from both batches
    val packsWithBoth = PackStream.readPacks(spark, out)
      .groupBy($"split", $"pack_id")
      .agg(countDistinct($"batch_id").as("nb"))
      .filter($"nb" > 1).count()
    assert(packsWithBoth > 0, "no pack spanned the batch cut — state unused")
  }

  test("crash replay of the second micro-batch is a no-op on packs and state") {
    val root = Files.createTempDirectory("pack-replay").toString
    val (st, out) = (s"$root/state", s"$root/out")
    val b1 = docs.take(6).toDF("doc_id", "text")
    val b2 = docs.drop(6).toDF("doc_id", "text")
    PackStream.packAndAppend(b1, 0L, st, out)
    PackStream.packAndAppend(b2, 1L, st, out)
    val first = rollup(PackStream.readPacks(spark, out))
    PackStream.packAndAppend(b2, 1L, st, out)
    assert(rollup(PackStream.readPacks(spark, out)) == first,
      "replay changed the packed output")
    val cums = spark.read.parquet(st)
      .select($"batch_id".cast("long"), $"split", $"cum")
      .as[(Long, String, Long)].collect().toSet
    PackStream.packAndAppend(b2, 1L, st, out)
    assert(spark.read.parquet(st)
      .select($"batch_id".cast("long"), $"split", $"cum")
      .as[(Long, String, Long)].collect().toSet == cums,
      "replay changed the state snapshots")
  }
}
