package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** q131 PageRank and q132 PCA projection: a hand-computed quantized
  * fixpoint on a planted graph, and spectral-dominance + plan checks
  * on real testdata.
  */
class GraphPcaSpec extends SparkTestBase {
  import spark.implicits._

  test("q131 pagerank: hub outranks leaves; exact quantized fixpoint values") {
    var eid = 0L
    def ev(user: Long, item: Long): (Long, Long, Long, String, Double, String) = {
      eid += 1; (eid, eid * 1000000000L, user, "view", 0.0, s"""{"k": $item}""")
    }
    // users 1-3 engage {1,2}, users 4-6 engage {1,3}: star 2—1—3 with
    // both pair supports = 3 (the q118 threshold)
    val dir = java.nio.file.Files.createTempDirectory("graphpca-spec").toString
    ((1L to 3L).flatMap(u => Seq(ev(u, 1L), ev(u, 2L)))
      ++ (4L to 6L).flatMap(u => Seq(ev(u, 1L), ev(u, 3L))))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    // reference implementation of the same nano-quantized iteration
    val edges = Seq( // (src, dst, w, outw)
      (1L, 2L, 3L, 6L), (1L, 3L, 3L, 6L), (2L, 1L, 3L, 3L), (3L, 1L, 3L, 3L))
    val teleport = math.floor(1.5e8 / 3 + 0.5).toLong
    def step(pr: Map[Long, Long]): Map[Long, Long] =
      edges.groupBy(_._2).map { case (dst, in) =>
        dst -> (teleport + in.map { case (src, _, w, ow) =>
          math.floor(0.85 * (w.toDouble / ow) * pr(src) + 0.5).toLong
        }.sum)
      }
    var pr = Seq(1L, 2L, 3L).map(_ -> math.floor(1e9 / 3 + 0.5).toLong).toMap
    for (_ <- 1 to 3) pr = step(pr)

    val out = AnalyticsOpsQueries.q131ItemPagerank(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(out.toMap == pr, s"got $out expected $pr")
    assert(out.head._1 == 1L, "the hub must rank first")
    assert(out.head._2 > out(1)._2, "strictly above the leaves")
    assert(out(1)._2 == out(2)._2, "symmetric leaves tie exactly")
  }

  test("q133 time travel: v1 sees the old world, v2 sees updates and inserts") {
    val dir = java.nio.file.Files.createTempDirectory("graphpca-spec").toString
    Seq((3L, "AUTO"), (7L, "HOUSE"), (10L, "BUILD"))
      .toDF("c_custkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val out = AnalyticsOpsQueries.q133TimeTravelLookup(spark, dir)
      .as[(Int, Long, String)].collect().toSeq
    val v1 = out.filter(_._1 == 1).map(r => r._2 -> r._3).toMap
    val v2 = out.filter(_._1 == 2).map(r => r._2 -> r._3).toMap
    assert(v1 == Map(3L -> "AUTO", 7L -> "HOUSE", 10L -> "BUILD"),
      s"as-of v1 must predate the merge: $v1")
    assert(v2 == Map(3L -> "AUTO", 7L -> "HOUSE", 10L -> "CHG-BUILD",
      1000007L -> "NEW"), s"as-of v2 must see update + insert: $v2")
  }

  test("q134 cdc: deletes, updates, inserts classified; unchanged suppressed") {
    val dir = java.nio.file.Files.createTempDirectory("graphpca-spec").toString
    Seq((5L, "five", "en", "w", 4L), (7L, "seven", "en", "w", 5L),
      (11L, "stable", "en", "w", 6L), (35L, "both", "en", "w", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = AnalyticsOpsQueries.q134SnapshotCdc(spark, dir)
      .as[(String, Long, String)].collect().map(r => r._2 -> r._1).toMap
    assert(out(7L) == "D", "mod-7 keys are deleted")
    assert(out(35L) == "D", "delete wins over rewrite when both rules match")
    assert(out(5L) == "U", "mod-5 keys are rewritten")
    assert(!out.contains(11L), "unchanged keys emit no CDC row")
    assert(Seq(1000005L, 1000007L, 1000011L, 1000035L).forall(out(_) == "I"))
  }

  test("q135 containment: excerpt→source scores 1.0, source→excerpt 0.5; short docs absent") {
    val dir = java.nio.file.Files.createTempDirectory("graphpca-spec").toString
    val words16 = (1 to 16).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, words16, "en", "w", 100L),          // 2 tiles; planted excerpt = tile 1
      (2L, "short doc only", "en", "w", 14L))  // < 8 words: no tiles anywhere
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = CurationOpsQueries.q135Containment(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out((1000001L, 1L)) == ((1L, 1L, 1000000L)),
      "the excerpt is fully contained in its source")
    assert(out((1L, 1000001L)) == ((1L, 2L, 500000L)),
      "the source shares half its tiles with the excerpt — exactly at the cut")
    assert(out.keySet == Set((1000001L, 1L), (1L, 1000001L)),
      s"the short doc must not appear: ${out.keySet}")
  }

  test("q149 cohesion: tight planted clusters separate; orthogonal labels score near zero") {
    val dir = java.nio.file.Files.createTempDirectory("graphpca-spec").toString
    Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(1f, 0.1f), 0),
      (2L, Seq(0f, 1f), 1), (3L, Seq(0.1f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = RetrievalQueries.q149ClusterCohesion(spark, dir)
      .as[(Int, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(0, 1))
    out.values.foreach { r =>
      assert(r._2 == 2L)
      assert(r._3 > 990000L, s"own-centroid cosine must be ~1: $r")
      assert(r._4 < 200000L, s"orthogonal other-centroid cosine must be ~0: $r")
      assert(r._5 == r._3 - r._4)
    }
  }

  test("q132 pca: top-component variance dominates every single axis; map-only plan") {
    val dir = "/root/testdata/sf0.001"
    val out = SimilarityQueries.q132PcaProject(spark, dir)
    val proj = out.as[(Long, Long)].collect().map(_._2.toDouble / 1e6)
    val n = proj.length.toDouble
    val mean = proj.sum / n
    val varPc = proj.map(x => (x - mean) * (x - mean)).sum / n
    // per-axis variances straight from the embeddings
    val maxAxisVar = Tables.load(spark, dir, "embeddings")
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(var_pop(col("x")).as("v"))
      .agg(max(col("v"))).as[Double].collect().head
    assert(varPc >= maxAxisVar * 0.999,
      s"top eigenvalue must dominate the diagonal: $varPc vs $maxAxisVar")
    // rerun is bit-identical (fixed iterations, driver-deterministic math)
    val again = SimilarityQueries.q132PcaProject(spark, dir).as[(Long, Long)].collect()
    assert(again.toSeq == out.as[(Long, Long)].collect().toSeq)
    // projection is literal-driven: no join anywhere in the plan
    val plan = SimilarityQueries.q132PcaProject(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"projection must be map-only:\n$plan")
  }
}
