package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

import graft.SparkTestBase

/** Streaming embedding-drift monitor (EmbeddingDriftStream):
  * streamed readout ≡ the batch q205 report over the same rows,
  * batch partials are associative (order/packing don't matter), and
  * a crash-replayed batch never double-counts.
  */
class EmbeddingDriftStreamSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  test("streamed readout ≡ batch q205 over the same even/odd split; replay no-op") {
    val root = Files.createTempDirectory("emb-drift").toString
    val (in, ref, state, cp) = (s"$root/in", s"$root/ref", s"$root/state", s"$root/cp")
    val vecs = graft.core.Tables.load(spark, sf, "embeddings")

    // reference = q205's snapshot A (even vec_ids), frozen once
    EmbeddingDriftStream.buildReference(vecs.filter(col("vec_id") % 2 === 0), ref)

    // snapshot B (odd vec_ids) arrives as 3 micro-batch files
    Files.createDirectories(java.nio.file.Paths.get(in))
    val odd = vecs.filter(col("vec_id") % 2 =!= 0)
    odd.filter(col("vec_id") % 6 === 1).coalesce(1).write.parquet(s"$in/f1")
    odd.filter(col("vec_id") % 6 === 3).coalesce(1).write.parquet(s"$in/f2")
    odd.filter(col("vec_id") % 6 === 5).coalesce(1).write.parquet(s"$in/f3")

    EmbeddingDriftStream.start(spark, s"$in/*", schema, state, cp,
      maxFilesPerTrigger = Some(1)).awaitTermination()

    // state grew one partial per batch, never a global rewrite
    val partials = spark.read.parquet(state)
      .select(col("batch_id")).distinct().count()
    assert(partials == 3, s"expected 3 batch partials, got $partials")

    // the streamed readout is bit-identical to the batch q205 report
    // (same quantization, same sign-concordant division, same rows)
    val streamed = EmbeddingDriftStream.currentDrift(spark, ref, state)
      .collect().map(_.toSeq).toSeq
    val batch = graft.queries.SimilarityQueries.q205EmbeddingDrift(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      s"streamed drift must equal batch q205: ${streamed.take(3)} vs ${batch.take(3)}")

    // crash replay: applying one batch id twice with the same content
    // leaves the readout unchanged (the partial overwrites itself) —
    // checked on a fresh id so the assertion doesn't depend on which
    // file the stream assigned to which batch id
    val extra = odd.filter(col("vec_id") % 6 === 5)
    EmbeddingDriftStream.applyBatch(extra, 99L, state)
    val once = EmbeddingDriftStream.currentDrift(spark, ref, state)
      .collect().map(_.toSeq).toSeq
    EmbeddingDriftStream.applyBatch(extra, 99L, state)
    val twice = EmbeddingDriftStream.currentDrift(spark, ref, state)
      .collect().map(_.toSeq).toSeq
    assert(once == twice, "replayed batch must overwrite its partial, not double-count")
    assert(once != batch, "the extra partial must actually have changed the readout")

    // compaction: many partials → one, identical readout (associativity)
    val compacted = s"$root/state2"
    EmbeddingDriftStream.compact(spark, state, compacted)
    val afterCompact = EmbeddingDriftStream.currentDrift(spark, ref, compacted)
      .collect().map(_.toSeq).toSeq
    assert(afterCompact == once, "compacted state must read out identically")
    assert(spark.read.parquet(compacted)
      .select(col("batch_id")).distinct().count() == 1)
  }

  test("negative-mean dimensions divide sign-concordantly (closed form)") {
    import spark.implicits._
    val root = Files.createTempDirectory("emb-drift-neg").toString
    val (ref, state) = (s"$root/ref", s"$root/state")
    // dim 1: ref mean -0.25, stream mean +0.5 → shift 750000 micro
    // dim 2: ref mean +1.0, stream mean -1.0 → shift 2000000 micro
    val refVecs = Seq((0L, Array(-0.25f, 1.0f), 0), (2L, Array(-0.25f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val batch = Seq((1L, Array(0.5f, -1.0f), 0), (3L, Array(0.5f, -1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    EmbeddingDriftStream.buildReference(refVecs, ref)
    EmbeddingDriftStream.applyBatch(batch, 0L, state)
    val out = EmbeddingDriftStream.currentDrift(spark, ref, state)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1, -250000L, 500000L, 750000L),
      (2, 1000000L, -1000000L, 2000000L)), out.toString)
  }
}
