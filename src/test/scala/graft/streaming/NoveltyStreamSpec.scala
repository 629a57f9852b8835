package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase

/** Streaming n-gram novelty (NoveltyStream): the q167 curve under
  * foreachBatch against a persisted gram-owner index — streamed over
  * id-ordered micro-batches ≡ the one-shot batch computation, and
  * crash replay is a no-op.
  */
class NoveltyStreamSpec extends SparkTestBase {
  import spark.implicits._

  // doc 3 repeats doc 1's grams and adds a tail; doc 4 is all-fresh
  private val docs = Seq(
    1L -> "a b c d",
    2L -> "x y z w",
    3L -> "a b c d e",
    4L -> "p q r s")

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.select($"doc_id", $"n_grams", $"n_novel", $"novelty_micro")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("streamed over id-ordered micro-batches ≡ the batch q167 curve") {
    val root = Files.createTempDirectory("novelty-stream").toString
    val (in, idx, out, cp) = (s"$root/in", s"$root/index", s"$root/out", s"$root/cp")
    Files.createDirectories(java.nio.file.Paths.get(in))
    docs.take(2).toDF("doc_id", "text").write.parquet(s"$in/f1")
    docs.drop(2).toDF("doc_id", "text").write.parquet(s"$in/f2")
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(s"$in/*")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        NoveltyStream.scoreAndAppend(b, id, idx, out, "doc_id", "text")
      }
      .start().awaitTermination()

    val streamed = rows(NoveltyStream.readMonitor(spark, out))
    // batch oracle over the concatenated corpus: write it as one table
    // and run the q167 query
    val dir = Files.createTempDirectory("novelty-batch").toString
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val batch = graft.queries.TextQueries.q167NgramNovelty(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch, s"streamed $streamed != batch $batch")
    // the later near-repeat actually scored partial novelty
    val byId = streamed.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 == 1000000L && byId(3L)._4 == 333333L, s"got $byId")
  }

  test("the public start() entry point runs the loop end-to-end") {
    val root = Files.createTempDirectory("novelty-start").toString
    val (in, idx, out, cp) = (s"$root/in", s"$root/index", s"$root/out", s"$root/cp")
    Files.createDirectories(java.nio.file.Paths.get(in))
    docs.toDF("doc_id", "text").write.parquet(s"$in/f1")
    NoveltyStream.start(spark, s"$in/*", schema, idx, out, cp)
      .awaitTermination()
    assert(rows(NoveltyStream.readMonitor(spark, out)).map(_._1) ==
      Set(1L, 2L, 3L, 4L))
  }

  test("crash replay of a micro-batch is a no-op on monitor and index") {
    val root = Files.createTempDirectory("novelty-replay").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    val b1 = docs.take(2).toDF("doc_id", "text")
    val b2 = docs.drop(2).toDF("doc_id", "text")
    NoveltyStream.scoreAndAppend(b1, 0L, idx, out, "doc_id", "text")
    NoveltyStream.scoreAndAppend(b2, 1L, idx, out, "doc_id", "text")
    val first = rows(NoveltyStream.readMonitor(spark, out))
    val idxFirst = NoveltyStream.readIndex(spark, idx)
      .as[(String, Long)].collect().toSet
    // replay batch 1 (crash after index append, before checkpoint commit)
    NoveltyStream.scoreAndAppend(b2, 1L, idx, out, "doc_id", "text")
    assert(rows(NoveltyStream.readMonitor(spark, out)) == first,
      "replay changed the monitor output")
    assert(NoveltyStream.readIndex(spark, idx)
      .as[(String, Long)].collect().toSet == idxFirst,
      "replay changed the index")
  }
}
