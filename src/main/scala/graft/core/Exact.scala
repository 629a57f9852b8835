package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent numeric aggregates for cross-engine exactness.
  *
  * Double `sum`/`avg`/`stddev` are order-dependent (partial aggregation
  * merges in nondeterministic order), so a Spark result can differ from a
  * DuckDB oracle in the last ulps — enough to break a hash compare. The
  * fix: sum in fixed-point decimal (exact, associative, commutative —
  * order-independent), convert the exact sum to double once, and do any
  * remaining arithmetic (division, sqrt) in IEEE doubles, which is then
  * bit-identical across engines given identical inputs.
  *
  * This is also the right call at 100 TB: decimal partial aggregation is
  * exact under any AQE re-partitioning / skew-split, so results don't
  * drift run-to-run.
  */
object Exact {
  private val D = DecimalType(18, 2)

  /** Money-ish input (≤2 decimal places) widened to exact decimal. */
  def dec2(c: Column): Column = c.cast(D)

  /** Exact, order-independent sum of a 2-dp column, as double. */
  def sumd(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact sum of squares (decimal multiply keeps exactness), as double. */
  def sumSq(c: Column): Column = sum(dec2(c) * dec2(c)).cast(DoubleType)

  /** avg = exact_sum / count, computed in doubles → engine-portable. */
  def avgd(c: Column): Column = sumd(c) / count(c)

  /** Sample stddev from exact sums: sqrt((Σx² − (Σx)²/n)/(n−1)); null for n<2
    * (matches Polars ddof=1 / `stddev_samp` — SURVEY §2.5 A3). */
  def stdd(c: Column): Column = {
    val n = count(c)
    when(n > 1,
      sqrt(greatest(sumSq(c) - sumd(c) * sumd(c) / n, lit(0.0)) / (n - lit(1))))
  }

  /** DuckDB-side SQL mirrors of the above, for oracle strings. */
  def sqlSum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlSumSq(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2)) * CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlAvg(x: String): String = s"${sqlSum(x)} / COUNT($x)"
  def sqlStd(x: String): String =
    s"CASE WHEN COUNT($x) > 1 THEN sqrt(greatest(${sqlSumSq(x)} - ${sqlSum(x)} * ${sqlSum(x)} / COUNT($x), CAST(0 AS DOUBLE)) / (COUNT($x) - 1)) END"
}
