package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, attach the right row with the
  * greatest timestamp at-or-before the left row's timestamp within the
  * same key (the "most recent prior fact" lookup: last purchase before
  * a click, last quote before a trade, last config before a request).
  *
  * Spark has no native as-of join, and the naive forms don't scale:
  * an equi-join on key plus `r.ts <= l.ts` produces every (left row ×
  * earlier right row) candidate pair before a row_number trims it —
  * O(|L| × avg prior facts) shuffle volume — and a pure range join
  * degenerates to BroadcastNestedLoopJoin. This implementation is the
  * union-and-carry-forward form instead: tag both sides, union them,
  * and run ONE window (partition by key, order by (ts, side)) whose
  * running `last(payload, ignoreNulls)` carries each right row forward
  * to exactly the left rows it is most-recent-prior for.
  *
  * Scale shape: one hash exchange on the key + one sort — identical to
  * the shuffle a plain equi-join would need, with no candidate-pair
  * blowup in between; the running-frame window (UNBOUNDED PRECEDING ..
  * CURRENT ROW) holds O(1) state per partition, so a key's group only
  * needs to stream through an executor, not fit in memory as pairs.
  * Right rows sort before left rows at equal timestamps, making the
  * match inclusive (an event AT the purchase instant sees that
  * purchase), matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`.
  *
  * The right payload rides as one struct, so multi-column matches are
  * atomic — all payload columns come from the SAME matched row even
  * under timestamp ties. Determinism under ties among right rows is
  * the caller's contract: (key, ts) should be unique on the right
  * (pre-aggregate with max_by first if not).
  *
  * NULL semantics match SQL ASOF (`ON l.key = r.key AND l.ts >= r.ts`
  * is never true through a NULL): right rows with a NULL key or NULL
  * ts are dropped before the union — a NULL key must not become a
  * joinable partition under `Window.partitionBy`, and a NULL ts must
  * not sort first and get carried forward as everyone's "earliest"
  * fact. Left rows with NULL key/ts pass through UNMATCHED — and they
  * bypass the window entirely: routing them through `partitionBy(key)`
  * would funnel every NULL-key row of a dirty dataset into ONE
  * partition (a guaranteed straggler task at scale), so they are split
  * off before the union and re-attached afterwards with null payload
  * columns, which is observably the same result.
  *
  * No reference analogue — beyond-reference relational surface; the
  * reference's engines (reference: flows/silver.py joins) only
  * ever equi-join.
  */
object AsofJoin {

  /** Match direction: [[Backward]] = greatest ts at-or-before (the
    * default, DuckDB `l.ts >= r.ts`); [[Forward]] = smallest ts
    * at-or-after ("first purchase after signup", DuckDB
    * `l.ts <= r.ts`). Forward is backward under reversed time — the
    * implementation only flips the window's sort direction.
    */
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction

  /** Left as-of join: every left row, plus `payload` columns from the
    * matched right row (null when no right row is at-or-before).
    *
    * @param left      driving rows; all its columns pass through
    * @param right     fact rows to match; must contain `key`, `ts`, and
    *                  `payload` columns; (key, ts) should be unique
    * @param key       equi-join key column name (same name both sides)
    * @param ts        event-time column name (same name both sides, any
    *                  orderable type; must be NUMERIC — e.g. epoch-µs
    *                  long — when `tolerance` is set: the bound is
    *                  checked as `numeric difference <= tolerance`, so
    *                  a TimestampType ts would fail analysis there
    *                  (timestamp subtraction yields an interval);
    *                  convert to epoch numbers first)
    * @param payload   right columns to attach; names must not collide
    *                  with left's columns
    * @param tolerance max match distance: a match only counts while
    *                  `|l.ts - r.ts| <= tolerance` (inclusive; the
    *                  match is one-sided per `direction`, so the
    *                  absolute value is just the age) — the
    *                  feature-store staleness contract ("most recent
    *                  value, but no older than an hour"). None = any
    *                  age. Applied AFTER the single-window match: the
    *                  nearest fact being too far means every fact on
    *                  that side is, so a post-filter is equivalent to
    *                  restricting the match — same plan, no extra
    *                  shuffle.
    * @param direction [[Backward]] (most recent at-or-before, default)
    *                  or [[Forward]] (earliest at-or-after)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String], tolerance: Option[Long] = None,
               direction: Direction = Backward): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"payload columns collide with left side: $collisions")
    val internal = Set("__side", "__p", "__l", "__m", "__ts")
    val internalHits = (left.columns.toSet ++ payload + key + ts).intersect(internal)
    require(internalHits.isEmpty,
      s"column names collide with asofJoin internals: $internalHits")

    // the matched right row's ts rides inside the payload struct so the
    // tolerance bound can be checked against the SAME row the payload
    // came from (atomic even under ties)
    val r = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key), col(ts), lit(0).as("__side"),
      struct(col(ts).as("__ts") +: payload.map(col): _*).as("__p"))
    // NULL-key/-ts left rows can never match; keep them out of the
    // window (a NULL key is one partition — the straggler magnet) and
    // re-attach them unmatched at the end.
    val lLive = left.filter(col(key).isNotNull && col(ts).isNotNull)
    val lNull = left.filter(col(key).isNull || col(ts).isNull)
    val lRow = struct(left.columns.map(col): _*)
    val l = lLive.select(lRow.as("__l"))
      .select(col("__l").getField(key).as(key), col("__l").getField(ts).as(ts),
        lit(1).as("__side"), lit(null).cast(r.schema("__p").dataType).as("__p"),
        col("__l"))

    val unioned = l.unionByName(
      r.withColumn("__l", lit(null).cast(l.schema("__l").dataType)))
    // Backward streams time forward and carries the latest prior fact;
    // Forward streams time REVERSED, so the last fact seen before a
    // left row is the smallest ts at-or-after it. Either way right
    // rows sort before left rows at equal ts — inclusive match.
    val tsOrder = direction match {
      case Backward => col(ts).asc
      case Forward  => col(ts).desc
    }
    val w = Window.partitionBy(col(key))
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedStruct = tolerance match {
      case Some(tol) =>
        // too-distant match → unmatched (NULL when no match at all
        // keeps the condition NULL → otherwise-null, same outcome);
        // the signed difference is non-negative per direction
        val age = direction match {
          case Backward => col(ts) - col("__m").getField("__ts")
          case Forward  => col("__m").getField("__ts") - col(ts)
        }
        when(age <= tol, col("__m"))
      case None => col("__m")
    }
    val matched = unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .withColumn("__m", matchedStruct)
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col("__l").getField(c).as(c))
        ++ payload.map(c => col("__m").getField(c).as(c)): _*)
    matched.unionByName(lNull.select(
      left.columns.map(col)
        ++ payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*))
  }
}
