package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables, Warehouse}
import graft.dedup.MinHashLSH.shingleRows

/** Scale-path variants of operators whose naive form stops working at
  * 100 TB: bloom-filter-pruned decontamination (for a contamination
  * side too large to broadcast as an exact set) and Count-Min-Sketch
  * heavy-hitter estimation (frequency queries from one mergeable,
  * fixed-size sketch instead of a full aggregate).
  *
  * Beyond-reference surface; the exact anchors these pair with are
  * q39 (broadcast-set decontamination) and q54 (exact heavy hitters).
  */
object ScaleOpsQueries {

  // ===== q65 — bloom-pruned decontamination ===============================

  /** q39's decontamination with the broadcast exact-set replaced by a
    * bloom filter + exact verify — the shape that survives a
    * contamination side too big to broadcast (a full held-out corpus,
    * not a 10-doc eval set). Three stages:
    *
    *  1. BUILD: a bloom filter over the contamination side's distinct
    *     8-gram hashes (`DataFrameStatFunctions.bloomFilter` — a
    *     map-side mergeable sketch; ~1.2 MB per million grams at 1%
    *     fpp, vs an exact broadcast set that grows with gram count).
    *  2. PRUNE: map-side filter of the training side's grams through
    *     the bloom (no false negatives — no contaminated gram can be
    *     lost; ~1% of clean grams survive as false positives). The
    *     probe is the native codegen'd
    *     [[graft.functions.BloomMightContainExpr]] — sketch bytes ride
    *     the plan as a literal, deserialize once per task, and the
    *     filter stays inside whole-stage codegen (no per-row UDF).
    *  3. VERIFY: exact inner join (shuffle, NOT broadcast) of the
    *     survivors against the contamination grams — false positives
    *     die here, so the output is bit-identical to q39's exact
    *     semantics, and the oracle below is a true exact gate.
    *
    * The shuffle-join in stage 3 touches only bloom survivors —
    * O(contaminated + fpp·clean) rows instead of the full training
    * gram stream, which is the entire point at 100 TB. (Spark's own
    * `InjectRuntimeFilter` applies the same trick automatically to
    * some shuffle joins; stating it as an operator makes the pruning
    * unconditional and the sketch size/fpp explicit.)
    *
    * Contamination side here: docs 0–199; training side: the rest
    * plus planted copies of the first 10 (shifted ids prove the
    * detector fires through the bloom path).
    */
  /** One persisted contamination-gram set per (corpus dir, live
    * session): the set is consumed three times per call (count, bloom
    * build, verify join) and q65 is invoked repeatedly in-process
    * (bench min-of-2, verify+bench JVMs) — persisting anew on every
    * call leaked one cached RDD per run. The memo caps live caches at
    * one per corpus and makes repeat runs pure cache hits; a stale
    * entry from a stopped/replaced session is unpersisted and rebuilt.
    */
  private val contamGramCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]()

  def q65BloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
    val contam = docs.filter(col("doc_id") < 200)
    val train = docs.filter(col("doc_id") >= 200)
      .union(contam.filter(col("doc_id") < 10)
        .select((col("doc_id") + 3000000).as("doc_id"), col("text")))

    // Keyed by corpus DIR with the Warehouse fingerprint of
    // documents.parquet (file names/sizes/mtimes) stored alongside: a
    // corpus regenerated in-place within one live session rotates the
    // fingerprint, which both invalidates the cached grams AND
    // unpersists the superseded entry — fingerprint-as-key would leak
    // one persisted RDD per regeneration (ADVICE r15).
    val fp = Warehouse.derivedDir(
      s, "contam_grams_memo", s"$dir/documents.parquet", "n=8;doc_id<200")
    val contamGrams = contamGramCache.compute(dir, (_, prev) => {
      if (prev != null && prev._1 == fp && (prev._2.sparkSession eq s)) prev
      else {
        if (prev != null) prev._2.unpersist(blocking = false)
        (fp, shingleRows(contam, "doc_id", "text", n = 8)
          .select(col("sh")).distinct().persist())
      }
    })._2
    // BUILD: bloom over gram hashes; expected-items from a cheap count
    // of the (already tiny relative to training) contamination grams.
    // Bloom size arithmetic: at 1% fpp a bloom costs ~9.6 bits per
    // distinct GRAM (not per doc) — ~1.2 MB per million grams — vs an
    // exact broadcast set whose size scales with total gram BYTES.
    val nGrams = math.max(1L, contamGrams.count())
    val bloom = contamGrams.select(xxhash64(col("sh")).as("gh"))
      .stat.bloomFilter("gh", nGrams, 0.01)
    val bloomBytes = graft.functions.SketchProbes.bloomBytes(bloom)
    graft.functions.SketchProbes.register(s)

    // PRUNE map-side BEFORE the distinct — the dedup shuffle must only
    // ever see bloom survivors (pruning after it would shuffle the
    // full 100 TB gram stream first) — then VERIFY with the exact join
    // (false positives drop here; no broadcast of the exact set
    // anywhere).
    val trainGrams = shingleRows(train, "doc_id", "text", n = 8)
      .filter(graft.functions.SketchProbes.bloomMightContain(
        bloomBytes, xxhash64(col("sh")))).distinct()
    val overlap = trainGrams.join(contamGrams, Seq("sh"))
      .groupBy(col("sid").as("doc_id"))
      .agg(count(lit(1)).as("overlap_grams"))
    train.select(col("doc_id"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("overlap_grams"), lit(0L)).as("overlap_grams"),
        (coalesce(col("overlap_grams"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Exact-semantics oracle (the bloom never changes results): q39's
    * SQL with the 200-doc contamination split and 3000000 id shift.
    */
  val q65Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS tk
      |  FROM (SELECT doc_id, text FROM documents
      |        UNION ALL
      |        SELECT doc_id + 3000000, text FROM documents WHERE doc_id < 10)),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
      |         ELSE list_distinct(list_transform(range(1, len(tk) - 6),
      |                i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2], ' ', tk[i+3], ' ',
      |                            tk[i+4], ' ', tk[i+5], ' ', tk[i+6], ' ', tk[i+7]))) END AS gs
      |  FROM t),
      |cg AS (SELECT DISTINCT unnest(gs) AS sh FROM g WHERE doc_id < 200),
      |dg AS (SELECT DISTINCT doc_id, unnest(gs) AS sh FROM g WHERE doc_id >= 200),
      |ov AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS overlap_grams
      |  FROM dg JOIN cg USING (sh) GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(overlap_grams, 0) AS overlap_grams,
      |  COALESCE(overlap_grams, 0) > 0 AS contaminated
      |FROM (SELECT doc_id FROM g WHERE doc_id >= 200) d
      |LEFT JOIN ov USING (doc_id) ORDER BY doc_id""".stripMargin

  // ===== q66 — Count-Min-Sketch heavy-hitter estimates ====================

  /** Heavy-hitter frequencies from a Count-Min Sketch next to their
    * exact counts: the top-20 event types by exact count, each with
    * its CMS estimate — the operator a monitoring pipeline uses when
    * the key space is too wide to aggregate exactly on every tick
    * (the sketch is fixed-size and mergeable; the exact aggregate is
    * the anchor, the q51/q52 HLL pairing applied to frequencies).
    *
    * Determinism: Spark's `count_min_sketch` with a fixed seed is
    * deterministic under any partitioning — per-partition sketches
    * are cell-wise sums, and addition commutes — so the output is
    * rerun-stable even though DuckDB cannot replicate it (rows-only
    * gate; the exact columns carry the correctness signal, and
    * [[graft.queries.ScaleOpsSpec]] pins the CMS error bound).
    *
    * Scale shape: one map-side-partial aggregate for the sketch (a
    * single ~KB binary at the driver — justified collect), one exact
    * groupBy for the anchor counts, estimates probed driver-side for
    * only the top-20 keys.
    */
  def q66HeavyHittersCms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
    val sketchBytes = ev
      .select(col("event_type"))
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("cms"))
      .as[Array[Byte]].head()
    graft.functions.SketchProbes.register(s)
    // null-coalesced: a null event_type forms its own group in the
    // exact aggregate but was never counted by count_min_sketch, so its
    // estimate reports 0 (the native probe is NULL-in → NULL-out)
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("event_type"))
      .limit(20)
      .withColumn("cms_estimate", coalesce(
        graft.functions.SketchProbes.cmsEstimate(sketchBytes, col("event_type")),
        lit(0L)))
      .select(col("event_type"), col("exact_count"), col("cms_estimate"))
      .orderBy(col("event_type"))
  }

  // ===== q67 — Z-ordered layout round-trip ================================

  /** Events re-laid-out Z-ordered on (user_id, time) via
    * [[graft.sql.Layout.zorderWrite]], then scanned with a filter on
    * BOTH dimensions — the layout every large events table wants when
    * it serves "one user's activity in a time range" queries. The gate
    * proves the rewrite is results-neutral (identical rows to the same
    * filter on the raw table); the bytes-read locality win itself is
    * pinned in [[graft.sql.LayoutSpec]].
    *
    * The layout is Warehouse-persisted keyed to the source fingerprint
    * (the q33/q25 convention): built once, every later scan pays probe
    * cost only — exactly how a nightly OPTIMIZE job amortizes on a
    * cluster. Time cuts are computed from the data's own min/max (the
    * q64 technique) so the query is scale-factor-independent.
    */
  def q67ZorderScan(s: SparkSession, dir: String): DataFrame = {
    import graft.core.Warehouse
    import graft.streaming.EventStream
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(EventStream.nanosToTs(col("ts"))).as("ts_us"),
        col("event_type"), col("value"))
    val zDir = Warehouse.ensureBuilt(s,
      Warehouse.derivedDir(s, "zorder_events", s"$dir/events.parquet",
        "dims=user_id,ts_us;files=32")) { d =>
      graft.sql.Layout.zorderWrite(ev, "user_id", "ts_us", d, numFiles = 32)
    }
    val bounds = ev.agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"))
    // integer floor division (`div`) to match the oracle's `//`:
    // Column./ is DOUBLE division, and an event landing exactly on a
    // floored cut would be classified differently per engine
    def cut(mul: Int) =
      col("lo") + call_function("div", (col("hi") - col("lo")) * mul, lit(10L))
    s.read.parquet(zDir)
      .crossJoin(broadcast(bounds))
      .filter(col("user_id").between(10, 19) &&
        col("ts_us") >= cut(4) && col("ts_us") < cut(6))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  val q67Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
      |  FROM events),
      |b AS (SELECT min(ts_us) AS lo, max(ts_us) AS hi FROM e)
      |SELECT event_id, user_id, ts_us, event_type, value
      |FROM e, b
      |WHERE user_id BETWEEN 10 AND 19
      |  AND ts_us >= lo + ((hi - lo) * 4) // 10
      |  AND ts_us <  lo + ((hi - lo) * 6) // 10
      |ORDER BY event_id""".stripMargin

  // ========================================================================

  // ===== q121 — join-size / skew profile (pre-flight cardinality audit) ===

  /** The pre-flight audit a planner (or an engineer staring at a hung
    * stage) runs BEFORE a self-join on user_id: exact output
    * cardinality Σ c_u² and the top-10 key contributions, computed
    * from per-key counts WITHOUT materializing the join. share_ppm is
    * pure integer arithmetic (c²·10⁶ div total) — no float to
    * diverge. One hot key owning most of the ppm share is the signal
    * to salt (q105's operator) or skew-hint the join.
    *
    * Scale shape: one hash aggregate to key grain (the 10⁶× reducer at
    * 100 TB), a 1-row broadcast total, top-10 via
    * TakeOrderedAndProject. The join being audited never runs — that
    * is the point.
    */
  def q121JoinSizeProfile(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val tot = counts.agg(sum(col("n_events") * col("n_events")).as("total_pairs"))
    counts.crossJoin(broadcast(tot))
      .withColumn("pairs_contrib", col("n_events") * col("n_events"))
      .withColumn("share_ppm",
        expr("pairs_contrib * 1000000L div total_pairs"))
      .select(col("user_id"), col("n_events"), col("pairs_contrib"),
        col("total_pairs"), col("share_ppm"))
      .orderBy(col("pairs_contrib").desc, col("user_id"))
      .limit(10)
  }

  val q121Sql: String =
    """WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
      |t AS (SELECT CAST(sum(n_events * n_events) AS BIGINT) AS total_pairs FROM c)
      |SELECT user_id, n_events, n_events * n_events AS pairs_contrib,
      |  total_pairs,
      |  CAST((n_events * n_events * 1000000) // total_pairs AS BIGINT) AS share_ppm
      |FROM c, t
      |ORDER BY pairs_contrib DESC, user_id LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q121_join_size_profile" -> (q121JoinSizeProfile _),
    "q65_bloom_decontaminate" -> (q65BloomDecontaminate _),
    "q66_heavy_hitters_cms" -> (q66HeavyHittersCms _),
    "q67_zorder_scan" -> (q67ZorderScan _))

  val oracleSql: Map[String, String] = Map(
    "q121_join_size_profile" -> q121Sql,
    "q65_bloom_decontaminate" -> q65Sql,
    "q67_zorder_scan" -> q67Sql)
}
