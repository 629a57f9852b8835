package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-integrity audit — the dbt-test / Deequ-shaped
  * validation pass a lake pipeline runs after every load: referential
  * (FK orphans), predicate (row constraints), and key-uniqueness
  * checks, each reduced to ONE row `(check_name, n_violations,
  * n_checked)` so a whole audit is a union of tiny aggregates that a
  * scheduler can gate on (`n_violations = 0`).
  *
  * No reference analogue (the reference loads without validating —
  * `main.py` trusts its CSVs end to end); this is first-class surface
  * for a 100 TB lake, where a silent orphan or duplicate key poisons
  * every downstream join.
  *
  * Scale shape: every check is a single scan + hash aggregate;
  * [[referential]] adds one equi-join against the DISTINCT parent
  * keys (map-side-combined before the shuffle, so the join's build
  * side is keys-only — at TPC-H scale that's the PK column, not the
  * table). Nothing is collected; the audit result itself is
  * O(#checks) rows.
  */
object IntegrityChecks {

  private def result(name: String, checked: Column, violations: Column)(df: DataFrame): DataFrame =
    df.agg(checked.cast("long").as("n_checked"), violations.cast("long").as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))

  /** FK check: child rows whose `childKey` matches no `parentKey`.
    * NULL child keys count as violations too (a null FK is an orphan
    * for join purposes) — callers wanting nullable FKs filter first.
    */
  def referential(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val parentKeys = parent.select(col(parentKey).as("__k")).distinct()
      .withColumn("__hit", lit(1))
    result(name, count(lit(1)), count(when(col("__hit").isNull, 1)))(
      child.select(col(childKey).as("__k")).join(parentKeys, Seq("__k"), "left"))
  }

  /** Row-constraint check: counts rows where `violated` is true
    * (null-safe — a NULL predicate result does not count).
    */
  def predicate(df: DataFrame, violated: Column, name: String): DataFrame =
    predicates(df, Seq(name -> violated))

  /** Several row-constraint checks over the SAME table fused into one
    * aggregate — the table is scanned once no matter how many
    * constraints it carries (at 100 TB the scan dominates; per-check
    * scans would multiply it).
    */
  def predicates(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "predicates needs at least one check")
    val aggs = count(lit(1)).cast("long").as("__n") +:
      checks.map { case (n, c) => count(when(c, 1)).cast("long").as(s"__v_$n") }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.map { case (n, _) =>
        struct(lit(n).as("check_name"),
          col(s"__v_$n").as("n_violations"),
          col("__n").as("n_checked"))
      }: _*)).as("__r"))
      .select(col("__r.check_name"), col("__r.n_violations"), col("__r.n_checked"))
  }

  /** Key-uniqueness check: violations = rows living in a key group of
    * size > 1 (so a doubled key contributes 2, mirroring how many rows
    * a downstream join would mis-multiply).
    */
  def uniqueKey(df: DataFrame, key: String, name: String): DataFrame =
    result(name, sum(col("__n")), sum(when(col("__n") > 1, col("__n")).otherwise(0)))(
      df.groupBy(col(key)).agg(count(lit(1)).as("__n")))

  /** The audit: union the per-check rows, deterministic order. */
  def audit(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    checks.reduce(_.unionByName(_)).orderBy(col("check_name"))
  }
}
