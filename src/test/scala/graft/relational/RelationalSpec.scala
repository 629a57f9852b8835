package graft.relational

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Edge-case proof for the relational join operators, against
  * brute-force in-Spark oracles (the naive formulations the operators
  * exist to avoid at scale). The DuckDB external oracle runs in the
  * driver gate via q45/q46/q47 (RelationalQueries); this spec pins the
  * corner semantics a sampled real-data run can miss: timestamp ties,
  * no-prior-fact, NULL keys/timestamps, bucket-boundary points,
  * bucket widths above/below interval length, inverted and empty
  * intervals, and negative-domain bucketing.
  */
class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- asof

  /** Brute-force as-of oracle: all (l, r) candidates with key match +
    * r.ts <= l.ts, keep the max-r.ts one — O(L×R), test-only.
    */
  private def asofBrute(left: DataFrame, right: DataFrame): Set[Row] = {
    val r = right.select(col("k").as("rk"), col("ts").as("rts"),
      col("pay_a"), col("pay_b"))
    val cands = left.join(r, col("k") === col("rk") && col("rts") <= col("ts"), "left")
    val w = Window.partitionBy(col("lid")).orderBy(col("rts").desc_nulls_last)
    cands.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("lid", "k", "ts", "pay_a", "pay_b")
      .collect().toSet
  }

  private def asofRun(left: DataFrame, right: DataFrame): Set[Row] =
    AsofJoin.asofJoin(left, right, "k", "ts", Seq("pay_a", "pay_b"))
      .select("lid", "k", "ts", "pay_a", "pay_b")
      .collect().toSet

  private val rightRows = Seq(
    // (k, ts, pay_a, pay_b)
    (Some("u1"), Some(10L), 100L, "a"),
    (Some("u1"), Some(20L), 200L, "b"),
    (Some("u1"), Some(30L), 300L, "c"),
    (Some("u2"), Some(15L), 150L, "d"),
    (None, Some(5L), 666L, "null-key"), // must never match anyone
    (Some("u3"), None, 777L, "null-ts") // must never match anyone
  )
  private def rightDf = rightRows.toDF("k", "ts", "pay_a", "pay_b")

  test("asof: inclusive match at equal ts, strict max-prior otherwise, no prior → null") {
    val left = Seq(
      (1L, Some("u1"), Some(9L)),   // before any fact → null
      (2L, Some("u1"), Some(10L)),  // tie with fact AT 10 → inclusive match
      (3L, Some("u1"), Some(25L)),  // between 20 and 30 → 20
      (4L, Some("u1"), Some(30L)),  // tie at 30 → 30
      (5L, Some("u1"), Some(99L)),  // after all → 30
      (6L, Some("u2"), Some(15L)),  // other key, tie → d
      (7L, Some("u9"), Some(50L))   // key with no facts → null
    ).toDF("lid", "k", "ts")
    assert(asofRun(left, rightDf) == asofBrute(left, rightDf))
    // and the tie case concretely, not just vs brute force:
    val at10 = asofRun(left, rightDf).find(_.getLong(0) == 2L).get
    assert(at10.getLong(3) == 100L && at10.getString(4) == "a")
  }

  test("asof: NULL-key and NULL-ts left rows pass through unmatched, exactly once") {
    val left = Seq(
      (1L, None, Some(50L)),        // null key
      (2L, Some("u1"), None),       // null ts
      (3L, None, None),             // both null
      (4L, Some("u1"), Some(50L))   // control: matches fact at 30
    ).toDF("lid", "k", "ts")
    val got = asofRun(left, rightDf)
    assert(got == asofBrute(left, rightDf))
    assert(got.size == 4)
    for (lid <- Seq(1L, 2L, 3L)) {
      val r = got.find(_.getLong(0) == lid).get
      assert(r.isNullAt(3) && r.isNullAt(4), s"lid=$lid should be unmatched")
    }
    assert(got.find(_.getLong(0) == 4L).get.getLong(3) == 300L)
  }

  test("asof: right rows with NULL key/ts are never carried to any left row") {
    // left rows engineered so a wrongly-kept NULL right row would win:
    // u3's only fact has NULL ts; the NULL-key fact is earliest overall
    val left = Seq(
      (1L, Some("u3"), Some(100L)), // u3 has only the null-ts fact → unmatched
      (2L, Some("u1"), Some(7L))    // before u1's first fact → unmatched
    ).toDF("lid", "k", "ts")
    val got = asofRun(left, rightDf)
    assert(got.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("asof: payload columns stay atomic (both from the matched row) under ties") {
    // two facts at distinct ts; match must not mix pay_a of one with pay_b of other
    val left = Seq((1L, Some("u1"), Some(20L))).toDF("lid", "k", "ts")
    val r = asofRun(left, rightDf).head
    assert((r.getLong(3), r.getString(4)) == ((200L, "b")))
  }

  test("asof: tolerance bounds the lookback, inclusive at the bound") {
    // facts at ts 10/20/30 for u1
    val left = Seq(
      (1L, Some("u1"), Some(25L)), // match 20, age 5
      (2L, Some("u1"), Some(27L)), // match 20, age 7 = tol → kept (inclusive)
      (3L, Some("u1"), Some(28L)), // match 20, age 8 > tol → null
      (4L, Some("u1"), Some(30L)), // tie at 30, age 0
      (5L, Some("u1"), Some(9L)),  // no prior at all → null
      (6L, Some("u2"), Some(99L))  // match 15, age 84 → null
    ).toDF("lid", "k", "ts")
    val got = AsofJoin.asofJoin(left, rightDf, "k", "ts", Seq("pay_a", "pay_b"),
        tolerance = Some(7L))
      .select("lid", "k", "ts", "pay_a", "pay_b").collect().toSet
    // brute force: same candidates, additionally require age <= tol
    val r = rightDf.select(col("k").as("rk"), col("ts").as("rts"),
      col("pay_a"), col("pay_b"))
    val cands = left.join(r,
      col("k") === col("rk") && col("rts") <= col("ts")
        && col("ts") - col("rts") <= 7L, "left")
    val w = Window.partitionBy(col("lid")).orderBy(col("rts").desc_nulls_last)
    val brute = cands.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("lid", "k", "ts", "pay_a", "pay_b").collect().toSet
    assert(got == brute)
    assert(got.count(r => !r.isNullAt(3)) == 3) // lids 1, 2, 4
  }

  test("asof: forward direction matches the earliest at-or-after fact, inclusive") {
    // facts for u1 at ts 10/20/30
    val left = Seq(
      (1L, Some("u1"), Some(9L)),   // before all → 10
      (2L, Some("u1"), Some(10L)),  // tie at 10 → inclusive match at 10
      (3L, Some("u1"), Some(25L)),  // between 20 and 30 → 30
      (4L, Some("u1"), Some(31L)),  // after all → null
      (5L, Some("u2"), Some(15L)),  // tie on other key → d
      (6L, Some("u3"), Some(1L)),   // u3's only fact has NULL ts → null
      (7L, None, Some(5L))          // NULL key → unmatched passthrough
    ).toDF("lid", "k", "ts")
    val got = AsofJoin.asofJoin(left, rightDf, "k", "ts", Seq("pay_a", "pay_b"),
        direction = AsofJoin.Forward)
      .select("lid", "k", "ts", "pay_a", "pay_b").collect().toSet
    // brute force: candidates at-or-after, keep the min-ts one
    val r = rightDf.select(col("k").as("rk"), col("ts").as("rts"),
      col("pay_a"), col("pay_b"))
    val cands = left.join(r, col("k") === col("rk") && col("rts") >= col("ts"), "left")
    val w = Window.partitionBy(col("lid")).orderBy(col("rts").asc_nulls_last)
    val brute = cands.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("lid", "k", "ts", "pay_a", "pay_b").collect().toSet
    assert(got == brute)
    val at10 = got.find(_.getLong(0) == 2L).get
    assert(at10.getLong(3) == 100L, "tie at 10 should match the fact AT 10")
    assert(got.find(_.getLong(0) == 4L).get.isNullAt(3), "no later fact → null")
  }

  test("asof: forward tolerance bounds the look-ahead, inclusive at the bound") {
    val left = Seq(
      (1L, Some("u1"), Some(15L)), // next fact 20, distance 5 = tol → kept
      (2L, Some("u1"), Some(14L)), // next fact 20, distance 6 > tol → null
      (3L, Some("u1"), Some(30L))  // tie, distance 0
    ).toDF("lid", "k", "ts")
    val got = AsofJoin.asofJoin(left, rightDf, "k", "ts", Seq("pay_a"),
        tolerance = Some(5L), direction = AsofJoin.Forward)
      .select("lid", "pay_a").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(200L), 2L -> None, 3L -> Some(300L)))
  }

  test("asof: collision guards reject payload/internal name clashes") {
    val left = Seq((1L, "u1", 10L)).toDF("lid", "k", "ts")
    val bad = Seq(("u1", 5L, 1L)).toDF("k", "ts", "lid") // payload "lid" collides
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, bad, "k", "ts", Seq("lid"))
    }
    val sided = Seq((1L, "u1", 10L, 0)).toDF("lid", "k", "ts", "__side")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(sided, rightDf, "k", "ts", Seq("pay_a"))
    }
  }

  // --------------------------------------------------------------- range

  /** Brute-force containment oracle — the nested-loop the operator
    * replaces.
    */
  private def rangeBrute(points: DataFrame, intervals: DataFrame): Set[Row] =
    intervals.crossJoin(points)
      .filter(col("pt") >= col("s") && col("pt") < col("e"))
      .select("iid", "s", "e", "pid", "pt")
      .collect().toSet

  private def rangeRun(points: DataFrame, intervals: DataFrame, w: Long): Set[Row] =
    RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", w)
      .select("iid", "s", "e", "pid", "pt")
      .collect().toSet

  private val intervals = Seq(
    // (iid, s, e)
    (1L, 0L, 10L),     // [0,10)
    (2L, 10L, 20L),    // adjacent: [10,20)
    (3L, 5L, 100L),    // long interval spanning many buckets
    (4L, 50L, 50L),    // empty (e == s) → matches nothing
    (5L, 60L, 40L),    // inverted → matches nothing, must not explode
    (6L, -25L, -5L)    // negative domain
  ).toDF("iid", "s", "e")

  private val points = Seq(
    // (pid, pt) — boundary points on starts, ends, end-1, bucket edges
    (10L, 0L), (11L, 9L), (12L, 10L), (13L, 19L), (14L, 20L),
    (15L, 5L), (16L, 99L), (17L, 100L), (18L, 50L), (19L, 45L),
    (20L, -25L), (21L, -6L), (22L, -5L), (23L, -26L)
  ).toDF("pid", "pt")

  test("range: matches brute force at bucket widths below/at/above interval lengths") {
    for (w <- Seq(1L, 3L, 7L, 10L, 64L, 1000L)) {
      assert(rangeRun(points, intervals, w) == rangeBrute(points, intervals),
        s"bucketWidth=$w")
    }
  }

  test("range: no duplicate emissions — one row per (interval, contained point)") {
    for (w <- Seq(3L, 10L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", w)
        .groupBy("iid", "pid").count().filter(col("count") > 1).count()
      assert(got == 0L, s"duplicates at bucketWidth=$w")
    }
  }

  test("range: bucketing is exact beyond 2^53 (floor(double-div) would misbucket)") {
    // values where long→double loses ulps: around 2^60. A point AT an
    // interval start must land in the interval's first bucket.
    val base = 1L << 60
    val bigIntervals = Seq((1L, base, base + 1000L)).toDF("iid", "s", "e")
    val bigPoints = Seq((1L, base), (2L, base + 999L), (3L, base + 1000L),
      (4L, base - 1L)).toDF("pid", "pt")
    // width deliberately NOT a divisor of base so bucket edges fall mid-domain
    for (w <- Seq(7L, 333L, 1000L)) {
      val got = rangeRun(bigPoints, bigIntervals, w)
      assert(got == rangeBrute(bigPoints, bigIntervals), s"bucketWidth=$w")
      assert(got.map(_.getLong(3)) == Set(1L, 2L))
    }
  }

  test("range: inverted/empty intervals drop without exploding (plan-safe)") {
    // an inverted interval at scale would explode onto ~s/w buckets;
    // prove the output row count stays at the true match volume
    val huge = Seq((9L, 3_000_000_000_000L, 0L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "pt", huge, "s", "e", 10L)
    assert(got.isEmpty)
  }

  test("range: NULL bounds and NULL points drop (inner-join semantics)") {
    val iv = Seq(
      (Some(1L), Some(0L), Some(10L)),
      (Some(2L), None, Some(10L)),
      (Some(3L), Some(0L), None)
    ).toDF("iid", "s", "e")
    val pts = Seq((Some(10L), Some(5L)), (Some(11L), None)).toDF("pid", "pt")
    val got = RangeJoin.pointInInterval(pts, "pt", iv, "s", "e", 4L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  // ------------------------------------------------------------- overlap

  /** Brute-force overlap oracle — the nested loop the operator
    * replaces. Nonempty-intersection semantics (max(starts) <
    * min(ends)), NOT the two-sided textbook predicate, which would
    * wrongly match an empty [x, x) strictly inside the other side.
    */
  private def overlapBrute(l: DataFrame, r: DataFrame): Set[Row] =
    l.crossJoin(r)
      .filter(greatest(col("ls"), col("rs")) < least(col("le"), col("re")))
      .select("lid", "ls", "le", "rid", "rs", "re")
      .collect().toSet

  private def overlapRun(l: DataFrame, r: DataFrame, w: Long): Set[Row] =
    IntervalJoin.overlapJoin(l, "ls", "le", r, "rs", "re", w)
      .select("lid", "ls", "le", "rid", "rs", "re")
      .collect().toSet

  private val leftIvs = Seq(
    // (lid, ls, le)
    (1L, 0L, 10L),     // [0,10)
    (2L, 10L, 20L),    // adjacent to 1
    (3L, 5L, 100L),    // long, spans many buckets
    (4L, 50L, 50L),    // empty
    (5L, 60L, 40L),    // inverted
    (6L, -25L, -5L)    // negative domain
  ).toDF("lid", "ls", "le")

  private val rightIvs = Seq(
    // (rid, rs, re) — touching endpoints, containment, identity, point-ish
    (10L, 9L, 11L),    // straddles the 1|2 boundary → overlaps both
    (11L, 10L, 10L),   // empty at the boundary → overlaps nothing
    (12L, 0L, 10L),    // identical to lid=1
    (13L, 20L, 30L),   // touches lid=2's open end → no overlap with 2, inside 3
    (14L, -30L, -20L), // negative, overlaps 6
    (15L, 98L, 200L),  // tail of 3
    (16L, 300L, 200L)  // inverted
  ).toDF("rid", "rs", "re")

  test("overlap: matches brute force at bucket widths below/at/above interval lengths") {
    for (w <- Seq(1L, 3L, 7L, 10L, 64L, 1000L)) {
      assert(overlapRun(leftIvs, rightIvs, w) == overlapBrute(leftIvs, rightIvs),
        s"bucketWidth=$w")
    }
  }

  test("overlap: exactly one row per overlapping pair (reference-point, no dedup)") {
    for (w <- Seq(3L, 10L, 1000L)) {
      val dups = IntervalJoin.overlapJoin(leftIvs, "ls", "le", rightIvs, "rs", "re", w)
        .groupBy("lid", "rid").count().filter(col("count") > 1).count()
      assert(dups == 0L, s"duplicates at bucketWidth=$w")
    }
  }

  test("overlap: touching endpoints do not overlap (half-open both sides)") {
    val got = overlapRun(leftIvs, rightIvs, 10L)
    assert(!got.exists(r => r.getLong(0) == 2L && r.getLong(3) == 13L))
    assert(got.exists(r => r.getLong(0) == 3L && r.getLong(3) == 13L))
  }

  test("overlap: bucketing exact beyond 2^53") {
    val base = 1L << 60
    val l = Seq((1L, base, base + 100L)).toDF("lid", "ls", "le")
    val r = Seq((10L, base + 99L, base + 200L), (11L, base + 100L, base + 200L))
      .toDF("rid", "rs", "re")
    for (w <- Seq(7L, 333L, 1000L)) {
      val got = overlapRun(l, r, w)
      assert(got == overlapBrute(l, r), s"bucketWidth=$w")
      assert(got.map(_.getLong(3)) == Set(10L)) // 11 only touches the open end
    }
  }

  test("overlap: NULL bounds drop; collision guards reject shared names") {
    val l = Seq((Some(1L), Some(0L), Some(10L)), (Some(2L), None, Some(10L)))
      .toDF("lid", "ls", "le")
    val r = Seq((Some(10L), Some(5L), Some(6L)), (Some(11L), Some(5L), None))
      .toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(l, "ls", "le", r, "rs", "re", 4L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
    intercept[IllegalArgumentException] { // shared column name
      IntervalJoin.overlapJoin(l, "ls", "le", r.withColumnRenamed("rs", "ls"),
        "ls", "re", 4L)
    }
    intercept[IllegalArgumentException] { // non-positive width
      IntervalJoin.overlapJoin(l, "ls", "le", r, "rs", "re", 0L)
    }
  }

  test("range: collision guards reject shared and internal names") {
    val iv = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    intercept[IllegalArgumentException] { // shared column name "s"
      RangeJoin.pointInInterval(Seq((1L, 5L)).toDF("s", "pt"), "pt", iv, "s", "e", 5L)
    }
    intercept[IllegalArgumentException] { // internal name
      RangeJoin.pointInInterval(Seq((1L, 5L)).toDF("__bucket", "pt"), "pt", iv, "s", "e", 5L)
    }
    intercept[IllegalArgumentException] { // non-positive width
      RangeJoin.pointInInterval(points, "pt", iv, "s", "e", 0L)
    }
  }

  test("q123 nearest as-of picks the closer side; exact ties prefer backward") {
    val dir = java.nio.file.Files.createTempDirectory("q123-nearest").toString
    val us = 1000L // events ts is nanos; queries work at µs grain
    Seq(
      // purchases for user 7 at t=10µs and t=100µs
      (1L, 10L * us, 7L, "purchase", 1.0, ""),
      (2L, 100L * us, 7L, "purchase", 2.0, ""),
      // clicks: 12 (back, Δ2), 90 (forward, Δ10 < back Δ80),
      // 55 (EXACT tie Δ45 both ways -> backward), 5 (only forward exists)
      (3L, 12L * us, 7L, "click", 0.0, ""),
      (4L, 90L * us, 7L, "click", 0.0, ""),
      (5L, 55L * us, 7L, "click", 0.0, ""),
      (6L, 5L * us, 7L, "click", 0.0, ""),
      // user 8: click with NO purchases at all -> all-null match
      (7L, 50L * us, 8L, "click", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = graft.queries.RelationalQueries.q123AsofNearest(spark, dir)
      .as[(Long, Long, Long, Option[Long], Option[Double], Option[Long])]
      .collect().toSeq
    assert(out == Seq(
      (3L, 7L, 12L, Some(1L), Some(1.0), Some(2L)),
      (4L, 7L, 90L, Some(2L), Some(2.0), Some(10L)),
      (5L, 7L, 55L, Some(1L), Some(1.0), Some(45L)),
      (6L, 7L, 5L, Some(1L), Some(1.0), Some(5L)),
      (7L, 8L, 50L, None, None, None)), s"got $out")
  }
}
