package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.dedup.{Decontaminate, MinHashLSH}

/** The composed streaming curation pipeline (CurationStream):
  * intake → near-dup cut → span decontamination → packing, all from
  * shared batch kernels — streamed ≡ the batch composition over the
  * concatenated arrivals, every stage provably fires, and crash replay
  * is a no-op on all three sinks.
  */
class CurationStreamSpec extends SparkTestBase {
  import spark.implicits._

  // the held-out passage a training doc will leak (> 8 words)
  private val evalText = (1 to 40).map(i => s"eval$i").mkString(" ")

  private def longText(seed: String, n: Int = 260): String =
    (1 to n).map(i => s"$seed$i").mkString(" ")

  // batch 1: two clean docs + one embedding the eval passage mid-text
  private val b1 = Seq(
    1L -> longText("alpha"),
    2L -> (longText("beta", 120) + " " + evalText + " " + longText("gamma", 120)),
    3L -> longText("delta"))
  // batch 2: an exact copy of doc 1 (cross-batch dup) + fresh content
  private val b2 = Seq(
    11L -> longText("alpha"),
    12L -> longText("epsilon"))

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private case class Dirs(root: String) {
    val idx = s"$root/dedup-index"
    val eval = s"$root/eval-index"
    val curated = s"$root/curated"
    val packs = s"$root/packs"
    val state = s"$root/state"
  }

  private def setup(tag: String): Dirs = {
    val d = Dirs(Files.createTempDirectory(tag).toString)
    MinHashLSH.buildIndex(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", d.idx)
    DecontaminateStream.buildEvalIndex(
      Seq(900L -> evalText).toDF("doc_id", "text"), "doc_id", "text", d.eval)
    d
  }

  private def curatedRows(d: Dirs): Set[(Long, Long, Long, String)] =
    CurationStream.readCurated(spark, d.curated)
      .select($"doc_id", $"words_total", $"words_cut", md5($"kept_text"))
      .as[(Long, Long, Long, String)].collect().toSet

  private def packRollup(d: Dirs): Set[(String, Long, Long, Long)] =
    CurationStream.readPacks(spark, d.packs)
      .groupBy($"split", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("total_tokens"))
      .as[(String, Long, Long, Long)].collect().toSet

  test("streamed end-to-end equals the batch composition; every stage fires") {
    val d = setup("curation-stream")
    val in = s"${d.root}/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    b1.toDF("doc_id", "text").write.parquet(s"$in/f1")
    b2.toDF("doc_id", "text").write.parquet(s"$in/f2")
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(s"$in/*")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"${d.root}/cp")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        CurationStream.curateBatch(b, id, d.idx, d.eval, d.curated,
          d.packs, d.state)
      }
      .start().awaitTermination()

    // stage 1 fired: the cross-batch exact copy (11 ~ 1) is gone
    val ids = CurationStream.readCurated(spark, d.curated)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 12L), s"survivor ids: $ids")

    // streamed curated ledger ≡ the batch decon cut over the survivor
    // set (shared kernel, asserted not assumed)
    val survivors = (b1 ++ b2.filter(_._1 == 12L)).toDF("doc_id", "text")
    val batchCut = Decontaminate.cut(survivors, "doc_id", "text",
        Decontaminate.evalGrams(Seq(900L -> evalText).toDF("doc_id", "text"),
          "doc_id", "text"))
      .select($"doc_id", $"words_total", $"words_cut", md5($"kept_text"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(curatedRows(d) == batchCut, "streamed ledger != batch decon cut")

    // stage 2 fired: doc 2 lost its eval span (and more than the 40
    // eval words — window cuts bleed into neighbors), others intact
    val cuts = CurationStream.readCurated(spark, d.curated)
      .select($"doc_id", $"words_cut").as[(Long, Long)].collect().toMap
    assert(cuts(2L) >= 40L, s"doc 2 decon cut: ${cuts(2L)}")
    assert(cuts(1L) == 0L && cuts(3L) == 0L && cuts(12L) == 0L, s"cuts: $cuts")

    // stage 3: streamed packs ≡ one-shot q41 over the kept text (the
    // PackStream equality, composed)
    val keptDir = Files.createTempDirectory("curation-kept").toString
    CurationStream.readCurated(spark, d.curated)
      .filter($"kept_text" =!= "")
      .select($"doc_id", $"kept_text".as("text"), lit("en").as("lang"),
        lit("s").as("source"), length($"kept_text").cast("long").as("n_chars"))
      .write.parquet(s"$keptDir/documents.parquet")
    val batchPacks = graft.queries.PipelineQueries.q41SequencePack(spark, keptDir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(packRollup(d) == batchPacks, "streamed packs != batch q41 packing")
  }

  test("quality gate: gibberish never reaches ledger, packs, or index; prose unaffected") {
    val d = setup("curation-quality")
    // REAL prose register (the q217 fixture's positive class is natural
    // English; b1's synthetic alphaN tokens legitimately read as junk
    // to a char-trigram model and belong in the ungated tests)
    val prose = Seq(
      51L -> ("The harbor master checked the tide tables before letting " +
        "the boats leave and noted the wind shifting to the northeast."),
      52L -> ("Most of the apples were ripe by late September and the " +
        "cider press ran daily until the orchard crew finished the rows."))
    // threshold 0: the q217 decision boundary (log-ratio sign)
    val junk = 99L -> (1 to 60).map(i =>
      Seq("qwpz", "xkvj", "rtyn", "mlbg", "zxcv")(i % 5)).mkString(" ")
    CurationStream.curateBatch((prose :+ junk).toDF("doc_id", "text"), 0L,
      d.idx, d.eval, d.curated, d.packs, d.state, minScoreMicro = Some(0L))
    val ids = CurationStream.readCurated(spark, d.curated)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(51L, 52L), s"quality gate failed: $ids")

    // the junk doc was NOT indexed: re-delivering it under a new id in
    // batch 1 does not near-dup-collide — it is cut by the same gate
    CurationStream.curateBatch(Seq(199L -> junk._2).toDF("doc_id", "text"), 1L,
      d.idx, d.eval, d.curated, d.packs, d.state, minScoreMicro = Some(0L))
    val ids2 = CurationStream.readCurated(spark, d.curated)
      .select("doc_id").as[Long].collect().toSet
    assert(ids2 == Set(51L, 52L), s"junk re-delivery leaked: $ids2")

    // the gated stream over prose equals the ungated one
    val ungated = setup("curation-quality-clean")
    CurationStream.curateBatch(prose.toDF("doc_id", "text"), 0L,
      ungated.idx, ungated.eval, ungated.curated, ungated.packs, ungated.state)
    assert(curatedRows(d) == curatedRows(ungated),
      "quality gate changed prose curation")
    assert(packRollup(d) == packRollup(ungated),
      "quality gate changed prose packing")
  }

  test("crash replay of a batch is a no-op on curated ledger, packs, and state") {
    val d = setup("curation-replay")
    CurationStream.curateBatch(b1.toDF("doc_id", "text"), 0L,
      d.idx, d.eval, d.curated, d.packs, d.state)
    CurationStream.curateBatch(b2.toDF("doc_id", "text"), 1L,
      d.idx, d.eval, d.curated, d.packs, d.state)
    val (c1, p1) = (curatedRows(d), packRollup(d))
    val s1 = spark.read.parquet(d.state)
      .select($"batch_id".cast("long"), $"split", $"cum")
      .as[(Long, String, Long)].collect().toSet
    // replay batch 1: its commit marker is present → full no-op on
    // every sink (the seal written after the index append)
    CurationStream.curateBatch(b2.toDF("doc_id", "text"), 1L,
      d.idx, d.eval, d.curated, d.packs, d.state)
    assert(curatedRows(d) == c1, "replay changed the curated ledger")
    assert(packRollup(d) == p1, "replay changed the packs")
    assert(spark.read.parquet(d.state)
      .select($"batch_id".cast("long"), $"split", $"cum")
      .as[(Long, String, Long)].collect().toSet == s1,
      "replay changed the pack state")
  }

  test("crash INSIDE the index append: unsealed replay reproduces identical outputs") {
    // batch 2 widened to TWO fresh docs so a partial append is possible
    val b2w = b2 :+ (13L -> longText("zeta"))

    // the crash-free world
    val clean = setup("curation-partial-clean")
    CurationStream.curateBatch(b1.toDF("doc_id", "text"), 0L,
      clean.idx, clean.eval, clean.curated, clean.packs, clean.state)
    CurationStream.curateBatch(b2w.toDF("doc_id", "text"), 1L,
      clean.idx, clean.eval, clean.curated, clean.packs, clean.state)
    val (cClean, pClean) = (curatedRows(clean), packRollup(clean))

    // the crashed world: batch 1 died mid-append — its append LEDGER
    // was fully written (the protocol orders it before the append),
    // ONE of its two survivors reached the index, no sinks written,
    // no seal. The plain self-collision replay signal would
    // misclassify that record as already-ingested and drop it from
    // the curated outputs forever.
    val d = setup("curation-partial")
    CurationStream.curateBatch(b1.toDF("doc_id", "text"), 0L,
      d.idx, d.eval, d.curated, d.packs, d.state)
    val survivors = CorpusStream.dedupBatch(b2w.toDF("doc_id", "text"), d.idx,
      CorpusStream.MinHashText(), replayOfBatch = Some(1L))
    assert(survivors.count() == 2, "fixture needs two fresh survivors")
    CorpusStream.writeAppendLedger(survivors.select($"doc_id"), d.idx, 1L)
    MinHashLSH.appendToIndex(survivors.orderBy($"doc_id").limit(1),
      "doc_id", "text", d.idx)
    assert(!CorpusStream.appendCommitted(spark, d.idx, 1L))

    CurationStream.curateBatch(b2w.toDF("doc_id", "text"), 1L,
      d.idx, d.eval, d.curated, d.packs, d.state)
    assert(curatedRows(d) == cClean,
      "unsealed replay after a partial append must reproduce the crash-free ledger")
    assert(packRollup(d) == pClean,
      "unsealed replay after a partial append must reproduce the crash-free packs")
    assert(CorpusStream.appendCommitted(spark, d.idx, 1L), "replay must seal the batch")
  }
}
