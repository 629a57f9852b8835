package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot join/aggregation keys.
  *
  * AQE's skew-join splitting handles most runtime skew; explicit
  * salting remains necessary when a single key dominates an
  * aggregation (AQE cannot split a hash-agg group) or when the skew is
  * known ahead of time and the extra AQE re-plan round-trip matters.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Salted equi-join: the large (skewed) side gets a per-row salt in
    * [0, salt); the small side is replicated `salt` times; the join
    * key widens to (key, salt), spreading each hot key over `salt`
    * reducers. Result equals the unsalted join for any salt
    * assignment. Small side grows ×salt — keep it broadcast-sized or
    * salt modestly.
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // right/full-outer would emit each unmatched small-side row once
    // per salt replica — not equal to the unsalted join. Semi/anti are
    // safe: small-side rows are never emitted, and a large row's single
    // salt value matches its replica iff the key exists.
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "cross",
      "semi", "leftsemi", "anti", "leftanti").contains(jt),
      s"saltedJoin supports inner/left/semi/anti joins, not '$joinType'")
    val l = large.withColumn(SaltCol, pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val s = small.withColumn(SaltCol, explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    l.join(s, Seq(key, SaltCol), joinType).drop(SaltCol)
  }

  /** Two-phase (salted partial → final) aggregation for hot group
    * keys: phase 1 aggregates on (key, salt) — splitting the hot
    * group's rows across reducers — phase 2 merges the partials.
    * Supply re-aggregable partials: sums, counts, mins, maxes.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.withColumn(SaltCol, pmod(monotonically_increasing_id(), lit(salt.toLong)))
      .groupBy(col(key), col(SaltCol))
      .agg(sum(col(valueCol)).as("__partial_sum"), count(lit(1)).as("__partial_cnt"))
      .groupBy(col(key))
      .agg(sum(col("__partial_sum")).as(s"sum_$valueCol"),
        sum(col("__partial_cnt")).as("count"))
  }
}
