package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared W-aligned bucketing for the manufactured-equi-key joins
  * ([[RangeJoin]], [[IntervalJoin]]) — one home for the exactness
  * subtleties so a fix cannot miss a copy.
  */
private[relational] object Buckets {

  /** Exact integer floor division — NOT `floor(x / w)`: Spark evaluates
    * long/long as DOUBLE division, so beyond 2^53 (epoch-ns values
    * qualify) boundary points round to the wrong bucket and matches
    * silently drop. `(x - pmod(x, w))` is an exact multiple of w
    * (pmod >= 0 for w > 0, negatives included), and `div` is integral
    * division. Exact over the long domain except its bottom edge:
    * values below `Long.MinValue + w` overflow the subtraction
    * (documented, not clamped — epoch-µs/-ns data sits 10+ orders of
    * magnitude away).
    */
  def bucketOf(x: Column, w: Long): Column = {
    val m = x - pmod(x, lit(w))
    call_function("div", m, lit(w))
  }

  /** Explode intervals onto every W-aligned bucket they cover, as
    * `__bucket`. Empty and inverted intervals (end <= start, e.g. an
    * end=0 sentinel against epoch-µs starts) are dropped FIRST: they
    * can match nothing, but `sequence(a, b)` with a > b generates a
    * DESCENDING sequence — one corrupt row would fan out onto ~start/W
    * buckets (or die on the sequence-length cap) before any downstream
    * filter could discard it. NULL bounds also drop (inner-join
    * semantics). `end` is exclusive, so the last covered bucket is the
    * one holding end-1 — never a bucket the interval only touches at
    * its open endpoint.
    */
  def explodeOntoBuckets(df: DataFrame, start: String, end: String, w: Long): DataFrame =
    df.filter(col(end) > col(start)).withColumn("__bucket",
      explode(sequence(bucketOf(col(start), w), bucketOf(col(end) - 1, w))))
}
