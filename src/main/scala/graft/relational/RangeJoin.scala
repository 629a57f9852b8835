package graft.relational

import org.apache.spark.sql.DataFrame
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
    * epoch-µs or epoch-ns longs — bucketing is [[Buckets.bucketOf]]'s
    * exact integer floor division, see there for the one documented
    * bottom-edge limit); `bucketWidth` in the same unit. Inverted/empty
    * intervals and NULL bounds drop ([[Buckets.explodeOntoBuckets]]),
    * matching inner-join semantics.
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

    val expl = Buckets.explodeOntoBuckets(intervals, startCol, endCol, bucketWidth)
    val pts = points.withColumn("__bucket", Buckets.bucketOf(col(ptCol), bucketWidth))
    expl.join(pts, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
