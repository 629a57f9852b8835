package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join — match interval rows to interval rows with NO
  * equi key: half-open `[lStart, lEnd)` overlaps `[rStart, rEnd)` iff
  * the intersection is NONEMPTY — `max(starts) < min(ends)` ("which
  * sessions crossed an incident window", "which ad flights ran during
  * a promotion"). Note this is strictly stronger than the textbook
  * two-sided `lStart < rEnd && rStart < lEnd`, which degenerates for
  * EMPTY intervals (an empty `[x, x)` strictly inside the other side
  * satisfies it while sharing no point); empty and inverted intervals
  * match nothing here, consistently with [[RangeJoin]]'s treatment.
  * Spark plans a pure inequality predicate as
  * BroadcastNestedLoopJoin — O(|L| × |R|) comparisons.
  *
  * Same manufactured-equi-key design as [[RangeJoin]], extended to two
  * exploding sides: pick a bucket width W, explode EACH interval onto
  * every W-aligned bucket it covers, and hash-join on the bucket. An
  * overlapping pair shares every bucket their intersection covers — so
  * instead of a dedup pass over duplicate emissions, each pair is
  * emitted exactly once by keeping only the join row whose bucket is
  * the FIRST bucket of the intersection (`bucket(max(lStart, rStart))`
  * — computable per joined row, no extra shuffle; the standard
  * spatial-join reference-point trick).
  *
  * Scale shape: one shuffle on the bucket key (or broadcast — Catalyst
  * decides), candidate volume O(pairs sharing a bucket) ≈ true match
  * volume when W ≈ typical interval length, never O(n²); explode
  * factor per row is ⌈len/W⌉+1, a small constant under the same W
  * guidance as [[RangeJoin]]. Bucket skew is ordinary join-key skew —
  * AQE's skew split applies.
  *
  * No reference analogue — beyond-reference relational surface (the
  * reference's engines only equi-join).
  */
object IntervalJoin {

  /** Inner-join overlapping interval pairs (half-open on both sides).
    * Output: every left column, then every right column, one row per
    * overlapping (left, right) pair. Column names must be disjoint.
    * Bound columns are integral (epoch-µs/-ns longs; bucketing is
    * [[Buckets.bucketOf]]'s exact integer floor division, see there
    * for the one documented bottom-edge limit). Inverted/empty
    * intervals (end <= start) and NULL bounds drop, matching
    * inner-join semantics.
    */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions = left.columns.toSet.intersect(right.columns.toSet)
    require(collisions.isEmpty, s"left/right column names collide: $collisions")
    val internal = Set("__bucket")
    val internalHits = (left.columns.toSet ++ right.columns).intersect(internal)
    require(internalHits.isEmpty,
      s"column names collide with overlapJoin internals: $internalHits")

    val l = Buckets.explodeOntoBuckets(left, lStart, lEnd, bucketWidth)
    val r = Buckets.explodeOntoBuckets(right, rStart, rEnd, bucketWidth)
    l.join(r, Seq("__bucket"))
      // nonempty intersection, stated directly (both sides are already
      // nonempty post-drop, so this equals the two-sided form here —
      // but it IS the contract, not an optimization of it)
      .filter(greatest(col(lStart), col(rStart)) < least(col(lEnd), col(rEnd)))
      // emit each pair once: only from the first bucket of the
      // intersection, which both sides are guaranteed to have exploded
      .filter(col("__bucket") ===
        Buckets.bucketOf(greatest(col(lStart), col(rStart)), bucketWidth))
      .drop("__bucket")
  }
}
