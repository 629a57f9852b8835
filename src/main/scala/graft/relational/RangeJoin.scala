package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — match point rows to interval
  * rows with NO equi key: `start <= point < end`. Spark's planner has
  * nothing to hash or sort on for a pure inequality predicate, so the
  * built-in answer is BroadcastNestedLoopJoin — O(|points| × |intervals|)
  * comparisons, a non-starter at scale.
  *
  * This implementation manufactures the missing equi key: pick a bucket
  * width W, explode each interval onto every W-aligned bucket it
  * overlaps (⌈len/W⌉+1 copies — a small constant when W is chosen near
  * the typical interval length), bucket each point by ⌊pt/W⌋, hash-join
  * on the bucket, and refine with the exact containment predicate. A
  * (point, interval) pair can meet in only ONE bucket — the point's own
  * — so the join emits no duplicates and needs no post-dedup.
  *
  * Scale shape: one shuffle on the bucket key (or a broadcast when one
  * side is small — Catalyst's choice), candidate volume O(pairs sharing
  * a bucket) ≈ the true match volume when W ≈ interval length, never
  * O(n²). Bucket skew (a hot time window) is ordinary join-key skew —
  * AQE's skew-join split applies, nothing bespoke needed.
  *
  * No reference analogue — beyond-reference relational surface (the
  * reference's engines only equi-join).
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` containing them
    * (half-open: start <= pt < end). Output: every interval column,
    * plus `points`' columns for each contained point. Column names must
    * be disjoint. `ptCol`, `startCol`, `endCol` are integral (e.g.
    * epoch-µs or epoch-ns longs — bucketing is exact integer floor
    * division, valid over the full long domain); `bucketWidth` in the
    * same unit.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collisions.isEmpty, s"point/interval column names collide: $collisions")
    val internalHits = (points.columns.toSet ++ intervals.columns).intersect(Set("__bucket"))
    require(internalHits.isEmpty,
      s"column names collide with pointInInterval internals: $internalHits")

    // Exact integer floor division — NOT floor(x / w): Spark evaluates
    // long/long as DOUBLE division, so beyond 2^53 (epoch-ns values
    // qualify) boundary points round to the wrong bucket and matches
    // silently drop. (x - pmod(x, w)) is an exact multiple of w
    // (pmod >= 0 for w > 0, negatives included), and `div` is integral
    // division — exact over the full long domain.
    def bucketOf(x: Column): Column = {
      val m = x - pmod(x, lit(bucketWidth))
      call_function("div", m, lit(bucketWidth))
    }
    // Empty and inverted intervals (end <= start, e.g. an end=0
    // sentinel against epoch-µs starts) can match nothing under the
    // half-open predicate, but `sequence(a, b)` with a > b generates a
    // DESCENDING sequence — one corrupt row would fan out onto ~start/W
    // buckets (or die on the sequence-length cap) before the
    // containment filter could discard it. Drop them up front; a NULL
    // start/end also fails this predicate, matching inner-join
    // semantics (SQL comparisons through NULL are never true).
    val live = intervals.filter(col(endCol) > col(startCol))
    // end is exclusive, so the last bucket that can contain a point is
    // the one holding end-1 — never explode onto a bucket the interval
    // only touches at its open endpoint
    val expl = live.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol) - 1))))
    val pts = points.withColumn("__bucket", bucketOf(col(ptCol)))
    expl.join(pts, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
