package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Scale-path operators (q65–q66): the bloom-pruned decontamination
  * must be bit-identical to the exact broadcast-set shape (the bloom
  * is pruning-only), and the CMS estimates must respect the sketch's
  * one-sided error bound.
  */
class ScaleOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("q65 bloom path is bit-identical to the exact anti-join semantics") {
    val dir = "/root/testdata/sf0.001"
    val out = ScaleOpsQueries.q65BloomDecontaminate(spark, dir)
      .as[(Long, Long, Boolean)].collect().toSeq
    // planted copies (ids 3000000..3000009) must all be flagged
    val planted = out.filter(_._1 >= 3000000L)
    assert(planted.size == 10 && planted.forall(_._3),
      s"planted copies must be contaminated: $planted")
    // exact reference computed without the bloom: same grams, plain join
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val contam = docs.filter(col("doc_id") < 200)
    val train = docs.filter(col("doc_id") >= 200)
      .union(contam.filter(col("doc_id") < 10)
        .select((col("doc_id") + 3000000).as("doc_id"), col("text")))
    val cg = graft.dedup.MinHashLSH.shingleRows(contam, "doc_id", "text", 8)
      .select(col("sh")).distinct()
    val ov = graft.dedup.MinHashLSH.shingleRows(train, "doc_id", "text", 8)
      .distinct().join(cg, Seq("sh"))
      .groupBy(col("sid").as("doc_id")).agg(count(lit(1)).as("overlap_grams"))
    val exact = train.select(col("doc_id"))
      .join(ov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("overlap_grams"), lit(0L)).as("overlap_grams"),
        (coalesce(col("overlap_grams"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == exact, "bloom pruning must never change results")
  }

  test("q66 CMS estimates are one-sided within the eps bound") {
    val dir = "/root/testdata/sf0.001"
    val out = ScaleOpsQueries.q66HeavyHittersCms(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    val total = graft.core.Tables.load(spark, dir, "events").count()
    val slack = math.ceil(0.001 * total).toLong
    out.foreach { case (t, exact, est) =>
      assert(est >= exact, s"CMS can never undercount: $t $est < $exact")
      assert(est <= exact + slack,
        s"CMS estimate outside eps bound: $t est=$est exact=$exact slack=$slack")
    }
    // rerun-stable: sketch merge is cell-wise addition (commutative)
    val out2 = ScaleOpsQueries.q66HeavyHittersCms(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == out2, "CMS with fixed seed must be deterministic")
  }

  test("q66 null event_type group reports a zero estimate, not an NPE") {
    // regression: the estimate UDF called CountMinSketch.estimateCount
    // on the null group's key and NPE'd; count_min_sketch itself never
    // counts nulls, so 0 is the sketch-faithful answer
    val dir = java.nio.file.Files.createTempDirectory("q66-null").toString
    Seq(Option("click"), Option("click"), None, None, None)
      .toDF("event_type").write.parquet(s"$dir/events.parquet")
    val out = ScaleOpsQueries.q66HeavyHittersCms(spark, dir).collect().toSeq
    val nullRow = out.find(_.isNullAt(0))
    assert(nullRow.isDefined, s"null group must survive the exact top-20: $out")
    assert(nullRow.get.getLong(1) == 3 && nullRow.get.getLong(2) == 0L, s"$out")
    assert(out.find(_.getString(0) == "click").exists(r =>
      r.getLong(1) == 2 && r.getLong(2) >= 2), s"$out")
  }

  test("q121 join-size profile: exact pair total and integer ppm shares on a planted skew") {
    val dir = java.nio.file.Files.createTempDirectory("q121-skew").toString
    var eid = 0L
    def evs(user: Long, n: Int) = Seq.fill(n) {
      eid += 1; (eid, eid * 1000L, user, "view", 0.0, "")
    }
    // c = (100, 10, 1) -> total pairs 10101; hot key owns 990001 ppm
    (evs(1L, 100) ++ evs(2L, 10) ++ evs(3L, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = ScaleOpsQueries.q121JoinSizeProfile(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 100L, 10000L, 10101L, 10000L * 1000000L / 10101L),
      (2L, 10L, 100L, 10101L, 100L * 1000000L / 10101L),
      (3L, 1L, 1L, 10101L, 1000000L / 10101L)), s"got $out")
  }
}
