package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.dedup.Decontaminate

/** Streaming decontamination (DecontaminateStream): the q89 span-grain
  * cut under foreachBatch against a persisted eval-gram index —
  * streamed ≡ batch on the same corpus, and crash replay is a no-op.
  */
class DecontaminateStreamSpec extends SparkTestBase {
  import spark.implicits._

  // an 8-word eval span planted verbatim inside training doc 301
  private val evalSpan = "alpha bravo charlie delta echo foxtrot golf hotel"

  private val heldOut = Seq(
    1L -> s"the secret benchmark question is $evalSpan and nothing else",
    2L -> "another held out evaluation prompt about glaciers calving into the sea")

  private val training = Seq(
    301L -> s"some clean preamble $evalSpan and a clean tail after the leak",
    302L -> "entirely clean training text about spark shuffles and partitions",
    303L -> "short doc", // shorter than the window — never cut
    304L -> s"$evalSpan") // the whole doc is the leak

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def cutRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, String)] =
    df.select($"doc_id", $"words_total", $"words_cut", $"kept_text")
      .as[(Long, Long, Long, String)].collect().toSet

  test("streamed over two micro-batches ≡ the one-shot batch cut; the cutter fires") {
    val root = Files.createTempDirectory("decon-stream").toString
    val (in, idx, out, cp) = (s"$root/in", s"$root/index", s"$root/out", s"$root/cp")
    DecontaminateStream.buildEvalIndex(
      heldOut.toDF("doc_id", "text"), "doc_id", "text", idx)

    // two landing files → two-ish micro-batches (maxFilesPerTrigger=1)
    Files.createDirectories(java.nio.file.Paths.get(in))
    training.take(2).toDF("doc_id", "text").write.parquet(s"$in/f1")
    training.drop(2).toDF("doc_id", "text").write.parquet(s"$in/f2")
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(s"$in/*")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        DecontaminateStream.cutAndAppend(b, id, idx, out, "doc_id", "text")
      }
      .start().awaitTermination()

    val streamed = cutRows(DecontaminateStream.readCurated(spark, out))
    val batch = cutRows(Decontaminate.cut(
      training.toDF("doc_id", "text"), "doc_id", "text",
      Decontaminate.evalGrams(heldOut.toDF("doc_id", "text"), "doc_id", "text")))
    assert(streamed == batch, "streamed and batch cuts diverge")

    // the cutter actually fired: 301 lost the 8 leaked words PLUS the
    // following "and" (the held-out doc also continues "hotel and", so
    // the overlapping window covers it — span semantics, not exact-span
    // only); clean head and tail survive; 304 was cut to nothing;
    // 302/303 are untouched
    val byId = streamed.map(r => r._1 -> r).toMap
    assert(byId(301L)._3 == 9L && !byId(301L)._4.contains("alpha")
      && byId(301L)._4.startsWith("some clean preamble")
      && byId(301L)._4.endsWith("after the leak"))
    assert(byId(304L)._3 == 8L && byId(304L)._4 == "")
    assert(byId(302L)._3 == 0L && byId(303L)._3 == 0L)
    // provenance partition column is present
    assert(DecontaminateStream.readCurated(spark, out).columns.contains("batch_id"))
  }

  test("the public start() entry point runs the loop end-to-end") {
    val root = Files.createTempDirectory("decon-start").toString
    val (in, idx, out, cp) = (s"$root/in", s"$root/index", s"$root/out", s"$root/cp")
    DecontaminateStream.buildEvalIndex(
      heldOut.toDF("doc_id", "text"), "doc_id", "text", idx)
    Files.createDirectories(java.nio.file.Paths.get(in))
    training.toDF("doc_id", "text").write.parquet(s"$in/f1")
    DecontaminateStream.start(spark, s"$in/*", schema, idx, out, cp)
      .awaitTermination()
    assert(cutRows(DecontaminateStream.readCurated(spark, out)) ==
      cutRows(Decontaminate.cut(
        training.toDF("doc_id", "text"), "doc_id", "text",
        Decontaminate.evalGrams(heldOut.toDF("doc_id", "text"), "doc_id", "text"))))
  }

  test("crash replay of a micro-batch is a no-op") {
    val root = Files.createTempDirectory("decon-replay").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    DecontaminateStream.buildEvalIndex(
      heldOut.toDF("doc_id", "text"), "doc_id", "text", idx)
    val b = training.toDF("doc_id", "text")
    DecontaminateStream.cutAndAppend(b, 0L, idx, out, "doc_id", "text")
    val first = cutRows(DecontaminateStream.readCurated(spark, out))
    DecontaminateStream.cutAndAppend(b, 0L, idx, out, "doc_id", "text")
    val replayed = cutRows(DecontaminateStream.readCurated(spark, out))
    assert(replayed == first, "replay changed the curated output")
    assert(DecontaminateStream.readCurated(spark, out)
      .groupBy($"doc_id").count().filter($"count" > 1).isEmpty,
      "replay duplicated rows")
  }
}
