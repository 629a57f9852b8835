package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase

/** Streaming drift monitor (DriftStream): a reference-shaped batch
  * scores near zero, a shifted batch scores high, and replaying a
  * batch never duplicates its log row.
  */
class DriftStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docsDF(rows: Seq[(Long, Long)]) =
    rows.map { case (id, n) => (id, "x", "en", "w", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("reference-shaped batch ≈ 0, shifted batch high; replay overwrites its row") {
    val root = Files.createTempDirectory("drift-stream").toString
    val (in, ref, log, cp) = (s"$root/in", s"$root/ref", s"$root/log", s"$root/cp")
    // reference: uniform lengths 1..100
    DriftStream.buildReference(docsDF((1 to 100).map(i => (i.toLong, i.toLong))), ref)
    Files.createDirectories(java.nio.file.Paths.get(in))
    // batch 0: drawn uniformly like the reference; batch 1: all length 55
    docsDF((1 to 50).map(i => (1000L + i, (i * 2).toLong)))
      .coalesce(1).write.parquet(s"$in/f1")
    docsDF((1 to 50).map(i => (2000L + i, 55L)))
      .coalesce(1).write.parquet(s"$in/f2")

    DriftStream.start(spark, s"$in/*", schema, ref, log, cp,
      maxFilesPerTrigger = Some(1)).awaitTermination()
    val rows = DriftStream.readLog(spark, log)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    assert(rows.keySet.size == 2)
    val Seq(psiUniform, psiPeaked) = Seq(rows.minBy(_._2._2), rows.maxBy(_._2._2)).map(_._2._2)
    assert(psiPeaked > 10 * math.max(psiUniform, 1L),
      s"shifted batch must dominate: $rows")
    assert(rows.values.forall(_._1 == 50L))

    // crash replay of the shifted batch: same id, same input → same single row
    val shiftedId = rows.maxBy(_._2._2)._1
    DriftStream.applyBatch(docsDF((1 to 50).map(i => (2000L + i, 55L))),
      shiftedId, ref, log)
    val after = DriftStream.readLog(spark, log).collect()
    assert(after.length == 2, s"replay must overwrite, not append: ${after.length}")
  }
}
