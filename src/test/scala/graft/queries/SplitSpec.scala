package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Deterministic content-keyed split (q37 surface). */
class SplitSpec extends SparkTestBase {
  import spark.implicits._

  test("split is a pure function of content: duplicates co-locate, reruns agree") {
    val dir = java.nio.file.Files.createTempDirectory("split-spec").toString
    // two byte-identical texts under different ids + distinct texts
    val docs = Seq(
      (1L, "the same exact document text"),
      (2L, "the same exact document text"),
      (3L, "a different document entirely"),
      (4L, "yet another body of text here")).toDF("doc_id", "text")
    docs.write.parquet(s"$dir/documents.parquet")

    val a = PipelineQueries.q37DeterministicSplit(spark, dir)
      .as[(Long, Long, String)].collect()
    val b = PipelineQueries.q37DeterministicSplit(spark, dir)
      .as[(Long, Long, String)].collect()
    assert(a.toSeq == b.toSeq, "rerun must agree exactly")
    val byId = a.map(r => r._1 -> r._3).toMap
    assert(byId(1L) == byId(2L), "identical content must land in the same split")
    assert(a.forall(r => Set("train", "valid", "test")(r._3)))
    assert(a.forall(r => r._2 >= 0 && r._2 < 256))
  }

  test("q96: near-dup clusters land wholly in one split, keyed by the representative") {
    val dir = java.nio.file.Files.createTempDirectory("q96-spec").toString
    // raw-distinct, normalized-distinct texts (the q33 precondition must
    // hold); exact-dup pair (1, 2) exercises a multi-doc cluster
    val docs = Seq(
      (1L, "the same exact document text"),
      (2L, "the same exact document text"),
      (3L, "a different document entirely"),
      (4L, "yet another body of text here"),
      (5L, "fifth distinct corpus document")).toDF("doc_id", "text")
    docs.write.parquet(s"$dir/documents.parquet")

    val rows = PipelineQueries.q96LeakageSafeSplit(spark, dir)
      .as[(Long, Long, Long, String)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    // every original and its padded +2000000 copy share rep and split
    for (d <- Seq(1L, 2L, 3L, 4L, 5L)) {
      val (orig, copy) = (byId(d), byId(d + 2000000))
      assert(orig._2 == copy._2, s"doc $d: copy must share the representative")
      assert(orig._4 == copy._4, s"doc $d: copy must share the split")
    }
    // the exact-dup cluster {1, 2, copies} collapses to rep 1, one split
    assert(Seq(1L, 2L, 2000001L, 2000002L).map(byId(_)._2).distinct == Seq(1L))
    assert(Seq(1L, 2L, 2000001L, 2000002L).map(byId(_)._4).distinct.size == 1)
    // representative is the min id, so originals represent themselves
    assert(Seq(1L, 3L, 4L, 5L).forall(d => byId(d)._2 == d))
    // non-vacuity: at least one copy's OWN padded-text bucket differs
    // from the rep bucket it was assigned (split genuinely followed the
    // cluster, not the copy's own content hash)
    val ownBuckets = spark.read.parquet(s"$dir/documents.parquet")
      .select((col("doc_id") + 2000000).as("doc_id"),
        concat(col("text"), lit("  ")).as("text"))
      .withColumn("own", expr(
        "cast(((locate(substring(md5(text), 1, 1), '0123456789abcdef') - 1) * 16" +
          " + (locate(substring(md5(text), 2, 1), '0123456789abcdef') - 1)) as bigint)"))
      .select("doc_id", "own").as[(Long, Long)].collect().toMap
    assert(ownBuckets.exists { case (d, own) => own != byId(d)._3 },
      "planted copies' own buckets all equal their rep bucket — vacuous plant")
  }

  test("split proportions approach 80/10/10 on the real corpus") {
    val counts = PipelineQueries.q37DeterministicSplit(spark, "/root/testdata/sf0.001")
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(n > 0)
    // md5 is uniform; at small n allow wide tolerance
    assert(counts.getOrElse("train", 0L) / n > 0.6)
    assert(counts.getOrElse("train", 0L) / n < 0.95)
  }

  test("q162: planted 30-day timeline lands every bucket exactly; embargo days excised") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q162-spec").toString
    val day = 86400L * 1000000000L // epoch-nanos per day
    // user 1 active every day 0..29; user 2 test-only (26, 27);
    // user 3 train (0) + valid (23). span 29 -> train <20, embargo 20-21,
    // valid 22-23, embargo 24-25, test 26-29
    val rows =
      (0 to 29).map(d => (d.toLong, d * day, 1L, "view", 0.0, "")) ++
        Seq((100L, 26 * day, 2L, "view", 0.0, ""),
          (101L, 27 * day, 2L, "view", 0.0, ""),
          (102L, 0 * day, 3L, "view", 0.0, ""),
          (103L, 23 * day, 3L, "view", 0.0, ""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = PipelineQueries.q162PurgedTimeSplit(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("1_train", 21L, 2L, 0L, 19L, 2L),
      ("2_embargo", 2L, 1L, 20L, 21L, 1L),
      ("3_valid", 3L, 2L, 22L, 23L, 2L),
      ("4_embargo", 2L, 1L, 24L, 25L, 1L),
      ("5_test", 6L, 2L, 26L, 29L, 1L)), s"got $out")
  }
}
