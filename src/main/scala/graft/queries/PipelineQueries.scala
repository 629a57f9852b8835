package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables, Warehouse}
import graft.text.TextFunctions._

/** Composite pipeline queries — the shapes a real training-data
  * curation job chains together, oracle-checked end to end.
  */
object PipelineQueries {

  // ===== q27 — corpus curation: quality filter → dedup → rank ============

  /** Filter by language + quality, exact-dedup by content fingerprint,
    * rank survivors by quality. One scan, one hash-agg shuffle, one
    * top-K — the canonical curation pass.
    */
  def q27CorpusPipeline(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        qualityScore(col("text")).as("quality"),
        fingerprint(col("text")).as("fp"))
      .filter(col("lang").isin("en", "de") && col("quality") >= 0.5)
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep_doc_id"),
        max(col("quality")).as("quality"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("quality").desc, col("rep_doc_id"))
      .limit(100)

  private[queries] val SqlQuality = {
    // mirrors TextQueries' quality expression (same operand order)
    val toks = "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '')"
    val stops = "['the','a','an','of','and','to','in','is','it','that']"
    val tc = s"len($toks)"
    val pc = "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))"
    val pr = s"CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST($pc AS DOUBLE) / length(text) END"
    val sr = s"CASE WHEN $tc = 0 THEN 0.0 ELSE CAST(len(list_filter($toks, t -> list_contains($stops, t))) AS DOUBLE) / $tc END"
    s"least(1.0, CAST($tc AS DOUBLE) / 50.0) * 0.4 + (1.0 - least(1.0, ($pr) * 10.0)) * 0.3 + least(1.0, ($sr) * 5.0) * 0.3"
  }

  val q27Sql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    $SqlQuality AS quality,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM documents)
       |SELECT fp, min(doc_id) AS rep_doc_id, max(quality) AS quality,
       |  count(*) AS n_copies
       |FROM scored
       |WHERE lang IN ('en', 'de') AND quality >= 0.5
       |GROUP BY fp
       |ORDER BY quality DESC, rep_doc_id LIMIT 100""".stripMargin

  // ===== q28 — event sessionization (gap-based, stateful window) ==========

  /** 30-minute-gap sessionization: lag + running sum of session starts
    * per user, then per-session stats. Arithmetic is integer
    * epoch-MICROseconds on both sides: DuckDB truncates parquet
    * TIMESTAMP(NANOS) to µs on read, so an oracle in nanos can never
    * match — Spark truncates its exact nanos the same way
    * (`ts div 1000`). Scale shape: one shuffle on user_id; the window
    * and the session agg reuse that partitioning.
    */
  def q28Sessionize(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    Tables.load(s, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        ((max(col("ts_us")) - min(col("ts_us"))) / 1e6).as("duration_s"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val q28Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts FROM events),
      |flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e),
      |sessions AS (
      |  SELECT user_id, ts,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM flagged)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  count(*) AS n_events,
      |  (max(ts) - min(ts)) / 1e6 AS duration_s
      |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ===== q30 — exact percentiles per group =================================

  /** Exact (interpolated) percentiles of extended price per return
    * flag — the distribution-summary shape data-quality monitoring
    * needs. Spark's `percentile` and DuckDB's `quantile_cont` share
    * linear-interpolation semantics; values round to 6 dp to absorb
    * engine-internal arithmetic-order ulps.
    *
    * Scale caveat: exact `percentile` buffers every group value (3
    * groups here), which is the oracle-able correctness check — at
    * 100 TB use [[q31PercentilesApprox]] (sketch-based, bounded state
    * per group); the sketch is engine-specific and therefore not
    * DuckDB-comparable, which is why the exact form anchors the gate.
    *
    * The three percentiles come from ONE `percentile(col, array(…))`
    * aggregate, not three: each scalar `percentile` call is its own
    * TypedImperativeAggregate with its own every-value buffer, so the
    * split form triples the buffered state and partial-merge
    * serialization for identical results (measured ~3× slower at
    * sf0.1).
    */
  def q30Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("ps"))
      .select(col("l_returnflag"), col("n"),
        round(col("ps").getItem(0), 6).as("p50"),
        round(col("ps").getItem(1), 6).as("p90"),
        round(col("ps").getItem(2), 6).as("p99"))
      .orderBy(col("l_returnflag"))

  val q30Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ===== q31 — approximate percentiles per group (the 100 TB path) ========

  /** The scale-safe twin of [[q30Percentiles]]: `approx_percentile`
    * (Greenwald–Khanna sketch) keeps O(accuracy) state per group
    * instead of buffering every value, so per-group memory is bounded
    * no matter how many rows a group holds — this is the form a 100 TB
    * run uses. The sketch's answers are engine-specific (not
    * DuckDB-comparable), so q31 is rows-only in the driver gate;
    * PercentilesSpec pins |approx − exact| within the sketch's rank
    * error at sf0.001.
    */
  def q31PercentilesApprox(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)")
          .as("ps"))
      .select(col("l_returnflag"), col("n"),
        col("ps").getItem(0).as("p50"),
        col("ps").getItem(1).as("p90"),
        col("ps").getItem(2).as("p99"))
      .orderBy(col("l_returnflag"))

  // ===== q51/q52 — cardinality: exact anchor + HLL twin ===================

  /** Exact per-type user cardinality over events — the audience-count /
    * dedup-rate shape every corpus report needs. Spark plans
    * `count(DISTINCT)` as an expand + two-phase aggregate whose state
    * is proportional to the number of DISTINCT keys per group — the
    * oracle-able correctness anchor, with [[q52CardinalityApprox]] as
    * the bounded-state 100 TB path (the q30/q31 pairing applied to
    * cardinality).
    */
  def q51Cardinality(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("distinct_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  val q51Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS distinct_users,
      |  count(*) AS n_events
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** The scale-safe twin of [[q51Cardinality]]: `approx_count_distinct`
    * (HyperLogLog++) keeps a fixed-size sketch per group — O(1/rsd²)
    * registers, map-side partial-aggregated and mergeable — instead of
    * state proportional to the distinct-key count, so a group with a
    * billion distinct users costs the same memory as one with a
    * thousand. The sketch is engine-specific (not DuckDB-comparable),
    * so q52 is rows-only in the driver gate; CardinalitySpec pins
    * |approx − exact| within the configured rsd's error bound and
    * PlanShapeSpec locks the map-side partial.
    */
  def q52CardinalityApprox(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("distinct_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  // ===== q53 — incremental cardinality over persisted HLL sketches ========

  /** The day-2 shape of q51/q52: per-(event_type, day) HyperLogLog
    * sketches (DataSketches `hll_sketch_agg`) persist once under
    * [[graft.core.Warehouse]] — a few KB per group — and every
    * subsequent cardinality question merges STORED sketches
    * (`hll_union_agg`) instead of rescanning raw events. At 100 TB the
    * daily rollup pays the one full scan; "distinct users per type,
    * any day range" then reads kilobytes. Mergeability is the whole
    * point: HLL union is lossless over sketches, so
    * estimate(union(daily)) ≡ estimate(sketch(all raw)) exactly —
    * pinned in CardinalitySpec, along with the probe plan never
    * touching the raw events table. Deterministic (HLL has no RNG) but
    * engine-specific, hence rows-only in the driver gate.
    */
  def q53IncrementalCardinality(s: SparkSession, dir: String): DataFrame = {
    val idx = Warehouse.ensureBuilt(s,
      Warehouse.derivedDir(s, "hll_daily", s"$dir/events.parquet",
        params = "lgk=12")) { d =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          to_date(graft.streaming.EventStream.nanosToTs(col("ts"))).as("day"))
        .agg(hll_sketch_agg(col("user_id"), lgConfigK = 12).as("sketch"))
        .write.mode("overwrite").parquet(d)
    }
    s.read.parquet(idx)
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), allowDifferentLgConfigK = false))
        .as("distinct_users_est"))
      .orderBy(col("event_type"))
  }

  // ===== q137 — incremental percentiles over persisted exact histograms ===

  /** The day-2 shape of q30/q31 for QUANTILES: per-(event_type, day)
    * exact value histograms at cent grain — counts per
    * floor(value·100 + 0.5) bucket — persist once under
    * [[graft.core.Warehouse]], and every subsequent percentile
    * question merges STORED histograms instead of rescanning raw
    * events. Unlike q53's HLL (lossy, rows-only), an integer
    * histogram's merge is EXACT — sum of counts — so
    * quantile(merge(daily)) ≡ quantile(histogram(all raw)) identically
    * and the whole incremental path is DuckDB-oracled end to end: the
    * oracle recomputes from raw events, proving the daily decomposition
    * loses nothing. p-th percentile = smallest bucket whose cumulative
    * count reaches ⌈p·n⌉ (lower-value convention on the quantized
    * grain).
    *
    * Scale shape: the one-off build is a hash aggregate to (type, day,
    * cent) grain — the 10⁶× reducer at 100 TB; the probe reads
    * kilobyte histograms, merges with one tiny aggregate, and the
    * cumulative window runs over bucket-count rows (bounded by the
    * value range at cent grain), never over events. New days append
    * new histogram partitions; old days never rescan.
    */
  def q137IncrPercentiles(s: SparkSession, dir: String): DataFrame = {
    val idx = Warehouse.ensureBuilt(s,
      Warehouse.derivedDir(s, "hist_daily", s"$dir/events.parquet",
        params = "grain=cent")) { d =>
      Tables.load(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          expr("(ts div 1000) div 86400000000L").as("day"),
          expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"))
        .groupBy(col("event_type"), col("day"), col("vc"))
        .agg(count(lit(1)).as("c"))
        .write.mode("overwrite").parquet(d)
    }
    val hist = s.read.parquet(idx)
      .groupBy(col("event_type"), col("vc")).agg(sum(col("c")).as("c"))
    val tot = hist.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
    hist
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("event_type")).orderBy(col("vc"))))
      .join(broadcast(tot), "event_type")
      .groupBy(col("event_type"))
      .agg(
        min(when(col("cum") >= expr("cast(ceil(0.50 * n) as bigint)"), col("vc")))
          .as("p50_cents"),
        min(when(col("cum") >= expr("cast(ceil(0.90 * n) as bigint)"), col("vc")))
          .as("p90_cents"),
        min(when(col("cum") >= expr("cast(ceil(0.99 * n) as bigint)"), col("vc")))
          .as("p99_cents"),
        max(col("n")).as("n_events"))
      .orderBy(col("event_type"))
  }

  val q137Sql: String =
    """WITH v AS (
      |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      |  FROM events WHERE value IS NOT NULL),
      |h AS (SELECT event_type, vc, count(*) AS c FROM v GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
      |cumh AS (
      |  SELECT event_type, vc,
      |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY vc) AS BIGINT) AS cum
      |  FROM h)
      |SELECT event_type,
      |  min(CASE WHEN cum >= CAST(ceil(0.50 * n) AS BIGINT) THEN vc END) AS p50_cents,
      |  min(CASE WHEN cum >= CAST(ceil(0.90 * n) AS BIGINT) THEN vc END) AS p90_cents,
      |  min(CASE WHEN cum >= CAST(ceil(0.99 * n) AS BIGINT) THEN vc END) AS p99_cents,
      |  max(n) AS n_events
      |FROM cumh JOIN t USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ===== q153 — split leakage audit ========================================

  /** How much a split ACTUALLY leaks: over the q37 content-keyed split
    * applied to a corpus with planted duplicates (doc_id + 1000000
    * copies, the q19 convention), count fingerprint groups spanning
    * each split pair and the documents involved. The content-keyed
    * split sends byte-identical copies to the SAME split by
    * construction, so the exact-duplicate leak count is provably zero
    * — which this audit certifies (against a random split it would
    * light up; q96 extends the guarantee to NEAR-duplicate clusters).
    * Output: one row per (split_a < split_b) pair with shared
    * fingerprint groups and document counts, plus per-split totals.
    *
    * Scale shape: one fingerprint hash-aggregate collecting the
    * distinct splits per group (≤ 3-element sets), then a tiny
    * aggregate — the corpus shuffles 32-byte hashes once.
    */
  def q153SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
    val doubled = docs.union(docs.select(col("doc_id") + 1000000, col("text")))
    val assigned = doubled
      .withColumn("bucket", md5Bucket)
      .withColumn("split",
        when(col("bucket") < 204, "train")
          .when(col("bucket") < 230, "valid")
          .otherwise("test"))
    val groups = assigned
      .groupBy(md5(col("text")).as("fp"))
      .agg(sort_array(collect_set(col("split"))).as("splits"),
        count(lit(1)).as("n_docs"))
    groups
      .select(explode(when(size(col("splits")) === 1,
          array(struct(col("splits").getItem(0).as("split_a"),
            col("splits").getItem(0).as("split_b"))))
        .otherwise(expr(
          "flatten(transform(splits, (a, i) -> transform(slice(splits, i + 2, size(splits)), b -> struct(a as split_a, b as split_b))))")))
        .as("p"), col("n_docs"))
      .groupBy(col("p.split_a").as("split_a"), col("p.split_b").as("split_b"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n_docs")).as("n_docs"))
      .orderBy(col("split_a"), col("split_b"))
  }

  val q153Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
      |a AS (
      |  SELECT doc_id, text,
      |    CASE WHEN b < 204 THEN 'train' WHEN b < 230 THEN 'valid' ELSE 'test' END AS split
      |  FROM (SELECT doc_id, text,
      |    (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS b FROM d)),
      |g AS (
      |  SELECT md5(text) AS fp, list_sort(list_distinct(list(split))) AS splits,
      |    count(*) AS n_docs
      |  FROM a GROUP BY 1),
      |pairs AS (
      |  SELECT fp, n_docs,
      |    CASE WHEN len(splits) = 1
      |      THEN [{'split_a': splits[1], 'split_b': splits[1]}]
      |      ELSE flatten(list_transform(range(1, len(splits) + 1),
      |        i -> list_transform(splits[(i+1):len(splits)],
      |          b -> {'split_a': splits[i], 'split_b': b}))) END AS ps
      |  FROM g)
      |SELECT p.split_a, p.split_b, count(*) AS n_groups,
      |  CAST(sum(n_docs) AS BIGINT) AS n_docs
      |FROM pairs, unnest(ps) AS t(p)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ===== q154 — dataset card: one-row corpus datasheet =====================

  /** The "datasheet for datasets" summary row every corpus release
    * ships: document and token counts, language/source cardinalities,
    * exact-duplicate ratio, and mean quality/length — each value an
    * exact integer or a micro-quantized mean over exact sums, so the
    * card is bit-reproducible. One row out; numbers cross-check the
    * per-source views (q58/q76/q147).
    *
    * Scale shape: ONE pass — a single aggregate computes everything
    * except the duplicate count, which needs the fingerprint grain
    * first (one hash-agg then count-distinct rolled into the same
    * summary via a second tiny aggregate, joined by a 1-row cross).
    */
  def q154DatasetCard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(col("n_chars")).as("total_chars"),
      sum(graft.text.TextFunctions.tokenCount(col("text")).cast("long"))
        .as("total_tokens"),
      floor(sum(floor(graft.text.TextFunctions.qualityScore(col("text")) * lit(1e6)
          + lit(0.5)).cast("long")).cast("double") / count(lit(1)) + lit(0.5))
        .cast("long").as("mean_quality_micro"))
    val dups = docs.groupBy(md5(col("text")).as("fp")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_distinct_texts"),
        sum(col("c") - 1).as("n_exact_dup_docs"))
    base.crossJoin(broadcast(dups))
      .select(col("n_docs"), col("n_langs"), col("n_sources"),
        col("total_chars"), col("total_tokens"), col("mean_quality_micro"),
        col("n_distinct_texts"), col("n_exact_dup_docs"),
        expr("(n_exact_dup_docs * 10000) div n_docs").as("dup_bps"))
  }

  private val SqlTokenCountP =
    "len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> ''))"

  val q154Sql: String =
    s"""WITH base AS (
       |  SELECT count(*) AS n_docs,
       |    count(DISTINCT lang) AS n_langs,
       |    count(DISTINCT source) AS n_sources,
       |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |    CAST(sum($SqlTokenCountP) AS BIGINT) AS total_tokens,
       |    CAST(floor(CAST(sum(CAST(floor(($SqlQuality) * 1000000 + 0.5) AS BIGINT))
       |      AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS mean_quality_micro
       |  FROM documents),
       |d AS (
       |  SELECT count(*) AS n_distinct_texts,
       |    CAST(sum(c - 1) AS BIGINT) AS n_exact_dup_docs
       |  FROM (SELECT md5(text) AS fp, count(*) AS c FROM documents GROUP BY 1))
       |SELECT n_docs, n_langs, n_sources, total_chars, total_tokens,
       |  mean_quality_micro, n_distinct_texts, n_exact_dup_docs,
       |  (n_exact_dup_docs * 10000) // n_docs AS dup_bps
       |FROM base, d""".stripMargin

  // ===== q37 — deterministic content-keyed train/valid/test split =========

  /** Reproducible dataset splitting, content-keyed: each document's
    * split is a pure function of md5(text) — never of row order,
    * partitioning, or a session RNG — so reruns, engines, and
    * re-ingests all agree, and byte-identical duplicate docs land in
    * the SAME split (a random split leaks duplicates across the
    * train/test boundary, inflating eval). Bucket = first two hex
    * digits of md5 (0..255), ~80/10/10 at 204/230. Everything is
    * codegen'd string built-ins; the md5 hex string is bit-identical
    * in DuckDB, so the oracle compares per-document assignments
    * exactly.
    */
  /** 0..255 content-keyed bucket — the deterministic randomness source
    * for splits, mixtures, and sampling: a pure function of md5(text),
    * so reruns, engines, and duplicate content all agree, and the md5
    * hex path is bit-identical in DuckDB for exact oracle comparison.
    */
  private[queries] def md5Bucket: org.apache.spark.sql.Column = expr(
    "cast(((locate(substring(md5(text), 1, 1), '0123456789abcdef') - 1) * 16" +
      " + (locate(substring(md5(text), 2, 1), '0123456789abcdef') - 1)) as bigint)")

  def q37DeterministicSplit(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "documents")
      .withColumn("bucket", md5Bucket)
      .withColumn("split",
        when(col("bucket") < 204, "train")
          .when(col("bucket") < 230, "valid")
          .otherwise("test"))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")
  }

  val q37Sql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS bucket
      |  FROM documents)
      |SELECT doc_id, bucket,
      |  CASE WHEN bucket < 204 THEN 'train'
      |       WHEN bucket < 230 THEN 'valid'
      |       ELSE 'test' END AS split
      |FROM b ORDER BY doc_id""".stripMargin

  // ===== q41 — fixed-budget sequence packing ==============================

  /** Sequence packing — the post-curation step that lays documents
    * head-to-tail into fixed-token-budget training sequences: within
    * each [[q37DeterministicSplit]] split, documents in deterministic
    * doc_id order get a running token offset, and a document starting
    * at offset o lands in pack ⌊o / budget⌋ (documents may straddle a
    * boundary — the standard concat-then-chunk layout). Scale shape:
    * the only window runs PARTITIONED by split (state = one running
    * sum; shard keys can subdivide further at 100 TB — a global
    * unpartitioned window would be the anti-pattern), then one hash
    * aggregate per pack. Output: per (split, pack_id) doc count and
    * token total.
    */
  def q41SequencePack(s: SparkSession, dir: String): DataFrame = {
    val budget = 2048
    val d = Tables.load(s, dir, "documents")
      .withColumn("split",
        when(md5Bucket < 204, "train").when(md5Bucket < 230, "valid").otherwise("test"))
      .withColumn("n_tokens",
        size(graft.text.TextFunctions.tokens(col("text"))).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("split")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum") - col("n_tokens")) / lit(budget.toDouble)).cast("long"))
      .groupBy(col("split"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("split"), col("pack_id"))
  }

  val q41Sql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS bucket,
      |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |                         t -> t <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, n_tokens,
      |    CASE WHEN bucket < 204 THEN 'train'
      |         WHEN bucket < 230 THEN 'valid'
      |         ELSE 'test' END AS split
      |  FROM base),
      |c AS (
      |  SELECT split, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT split,
      |  CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ===== q209 — license propagation through pack lineage ==================

  /** License/compliance propagation — the governance step a curation
    * pipeline runs right after packing: a training sequence inherits
    * the MOST RESTRICTIVE license of any document laid into it
    * (distribution rights compose by the weakest link — one
    * restricted document taints the whole pack), plus the restricted
    * member count an auditor asks for. License tags here are
    * deterministic content-keyed stand-ins (the [[md5Bucket]]
    * discipline — reruns and engines agree doc-for-doc) for
    * catalog-joined license metadata; the lineage is q41's EXACT pack
    * layout, so the propagated tags are bit-consistent with the packs
    * the pipeline actually emits.
    *
    * Scale shape: q41's split-partitioned running-sum window (never a
    * global window), then ONE hash aggregate per pack — the
    * propagation itself is a map-side-combinable max(rank) and a
    * conditional count riding the aggregate q41 already pays for.
    */
  def q209LicensePropagation(s: SparkSession, dir: String): DataFrame = {
    val budget = 2048
    val licRank = when(md5Bucket < 128, 1L).when(md5Bucket < 192, 2L)
      .when(md5Bucket < 240, 3L).otherwise(4L)
    val d = Tables.load(s, dir, "documents")
      .withColumn("split",
        when(md5Bucket < 204, "train").when(md5Bucket < 230, "valid").otherwise("test"))
      .withColumn("lic_rank", licRank)
      .withColumn("n_tokens",
        size(graft.text.TextFunctions.tokens(col("text"))).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("split")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum") - col("n_tokens")) / lit(budget.toDouble)).cast("long"))
      .groupBy(col("split"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("lic_rank")).as("max_rank"),
        sum(when(col("lic_rank") === 4L, 1L).otherwise(0L)).as("n_restricted"))
      .select(col("split"), col("pack_id"), col("n_docs"),
        when(col("max_rank") === 1L, "cc-by").when(col("max_rank") === 2L, "cc-by-sa")
          .when(col("max_rank") === 3L, "noncommercial").otherwise("restricted")
          .as("pack_license"),
        col("n_restricted"))
      .orderBy(col("split"), col("pack_id"))
  }

  val q209Sql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS bucket,
      |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |                         t -> t <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, n_tokens,
      |    CASE WHEN bucket < 204 THEN 'train'
      |         WHEN bucket < 230 THEN 'valid'
      |         ELSE 'test' END AS split,
      |    CASE WHEN bucket < 128 THEN 1 WHEN bucket < 192 THEN 2
      |         WHEN bucket < 240 THEN 3 ELSE 4 END AS lic_rank
      |  FROM base),
      |c AS (
      |  SELECT split, n_tokens, lic_rank,
      |    sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT split,
      |  CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CASE max(lic_rank) WHEN 1 THEN 'cc-by' WHEN 2 THEN 'cc-by-sa'
      |       WHEN 3 THEN 'noncommercial' ELSE 'restricted' END AS pack_license,
      |  CAST(sum(CASE WHEN lic_rank = 4 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_restricted
      |FROM c GROUP BY split, floor((cum - n_tokens) / 2048.0)
      |ORDER BY 1, 2""".stripMargin

  // ===== q212 — dataloader shard manifest ==================================

  /** The dataloader contract file — the artifact a training job
    * actually mounts: every document assigned to a shard file with its
    * START BYTE OFFSET inside that shard, so workers seek instead of
    * scan. Shard assignment is content-keyed (`md5Bucket mod 8` — no
    * row-number window, so no split-grain sort funnel; reruns and
    * engines agree doc-for-doc) and offsets are a running sum of each
    * document's UTF-8 OCTET length (`octet_length(text)`, not the
    * character count — chars ≠ bytes on any non-ASCII text, and a
    * seek contract stated in characters would land workers mid-rune)
    * within (split, shard) in doc_id order.
    *
    * Scale shape: assignment is a pure projection; the ONLY window is
    * partitioned by (split, shard) — at 100 TB the shard count scales
    * with the corpus (100k+ shards), so the running-sum state stays
    * one value per partition and no partition exceeds a shard file's
    * size. The 8 here is the demo knob, not the design.
    */
  def q212ShardManifest(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("split"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.load(s, dir, "documents")
      .withColumn("split",
        when(md5Bucket < 204, "train").when(md5Bucket < 230, "valid").otherwise("test"))
      .withColumn("shard", (md5Bucket % 8).cast("long"))
      .withColumn("n_bytes", octet_length(col("text")).cast("long"))
      .withColumn("cum", sum(col("n_bytes")).over(w))
      .select(col("doc_id"), col("split"), col("shard"),
        (col("cum") - col("n_bytes")).as("offset_bytes"),
        col("n_bytes").as("length_bytes"))
      .orderBy(col("doc_id"))
  }

  val q212Sql: String =
    """WITH b AS (
      |  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      |    (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS bucket
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, n_bytes,
      |    CASE WHEN bucket < 204 THEN 'train'
      |         WHEN bucket < 230 THEN 'valid'
      |         ELSE 'test' END AS split,
      |    bucket % 8 AS shard
      |  FROM b)
      |SELECT doc_id, split, shard,
      |  CAST(sum(n_bytes) OVER (PARTITION BY split, shard ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes AS BIGINT)
      |    AS offset_bytes,
      |  n_bytes AS length_bytes
      |FROM d ORDER BY doc_id""".stripMargin

  // ===== q42 — deterministic data-mixture sampling ========================

  /** Domain/language mixture sampling — the weighting step that turns a
    * curated pool into a training mixture: each language keeps a target
    * fraction of its documents, decided by the content-keyed
    * [[md5Bucket]] against an integer threshold (bucket < keep×256) —
    * no RNG, no `sample()`: reruns and engines agree doc-for-doc,
    * duplicate content always samples the same way, and reweighting is
    * a re-filter, never a reshuffle. Pure projection+filter: scales as
    * a single codegen'd pass.
    */
  def q42DataMixture(s: SparkSession, dir: String): DataFrame = {
    // keep-rates ×256, integer-exact: en 100%, de 75%, es/fr 50%,
    // pt 25%, anything else 10%
    val threshold = when(col("lang") === "en", 256L)
      .when(col("lang") === "de", 192L)
      .when(col("lang") === "es", 128L)
      .when(col("lang") === "fr", 128L)
      .when(col("lang") === "pt", 64L)
      .otherwise(26L)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), md5Bucket.as("bucket"))
      .withColumn("kept", col("bucket") < threshold)
      .orderBy(col("doc_id"))
  }

  val q42Sql: String =
    """SELECT doc_id, lang,
      |  (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |  + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS bucket,
      |  bucket < (CASE lang WHEN 'en' THEN 256 WHEN 'de' THEN 192
      |            WHEN 'es' THEN 128 WHEN 'fr' THEN 128
      |            WHEN 'pt' THEN 64 ELSE 26 END) AS kept
      |FROM documents ORDER BY doc_id""".stripMargin

  // ===== q44 — curation funnel (quality → decontamination → mixture) ======

  /** The end-to-end curation funnel with the per-stage attrition report
    * a real pipeline publishes: the document pool (eval docs 0–9 held
    * out) flows through the repetition quality gate (q38's
    * distinct-ratio / top-bigram thresholds), benchmark decontamination
    * (q39's 8-gram overlap), and mixture sampling (q42's content-keyed
    * per-language rates); each cumulative stage reports surviving doc
    * and token counts. One pass: per-doc flags are computed once
    * (shingle aggregations + one broadcast join against the tiny eval
    * gram set), then a 4-way stage explode feeds a single hash
    * aggregate — no per-stage rescans.
    */
  def q44CurationFunnel(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.MinHashLSH.shingleRows
    val docs = Tables.load(s, dir, "documents")
    val pool = docs.filter(col("doc_id") >= 10)

    // two-level aggregate (the bigrams shape): per-(doc, token) counts
    // partial-combine map-side and roll up — no countDistinct Expand
    val toks = shingleRows(pool, "doc_id", "text", n = 1)
      .groupBy(col("sid"), col("sh")).agg(count(lit(1)).as("c"))
      .groupBy(col("sid"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"))
    val bigrams = shingleRows(pool, "doc_id", "text", n = 2)
      .groupBy(col("sid"), col("sh")).agg(count(lit(1)).as("c"))
      .groupBy(col("sid"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram"))
    val evalGrams = shingleRows(docs.filter(col("doc_id") < 10), "doc_id", "text", n = 8)
      .select(col("sh")).distinct()
    // broadcast prune BEFORE any distinct (the q65 stage-2 rule): the
    // gram stream's dedup shuffle only ever sees eval-hit grams
    val contaminated = shingleRows(pool, "doc_id", "text", n = 8)
      .join(broadcast(evalGrams), Seq("sh"))
      .select(col("sid")).distinct()
      .withColumn("is_contaminated", lit(true))

    val mixThreshold = when(col("lang") === "en", 256L)
      .when(col("lang") === "de", 192L)
      .when(col("lang") === "es", 128L)
      .when(col("lang") === "fr", 128L)
      .when(col("lang") === "pt", 64L)
      .otherwise(26L)
    val flags = pool
      .select(col("doc_id"), col("lang"), (md5Bucket < mixThreshold).as("m"))
      .join(toks.withColumnRenamed("sid", "doc_id"), Seq("doc_id"))
      .join(bigrams.withColumnRenamed("sid", "doc_id"), Seq("doc_id"))
      .join(contaminated.withColumnRenamed("sid", "doc_id"), Seq("doc_id"), "left")
      .withColumn("q",
        col("n_distinct").cast("double") / col("n_tokens") >= 0.3 &&
          col("top_bigram").cast("double") / col("n_bigrams") <= 0.18)
      .withColumn("d", coalesce(col("is_contaminated"), lit(false)) === false)

    flags
      .select(col("n_tokens"), explode(array(
        struct(lit(0).as("stage_idx"), lit("pool").as("stage"), lit(true).as("pass")),
        struct(lit(1).as("stage_idx"), lit("quality").as("stage"), col("q").as("pass")),
        struct(lit(2).as("stage_idx"), lit("decontaminated").as("stage"),
          (col("q") && col("d")).as("pass")),
        struct(lit(3).as("stage_idx"), lit("mixture").as("stage"),
          (col("q") && col("d") && col("m")).as("pass")))).as("s"))
      .filter(col("s.pass"))
      .groupBy(col("s.stage_idx").as("stage_idx"), col("s.stage").as("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("stage_idx"))
  }

  val q44Sql: String =
    """WITH pool AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN len(tk0) = 0 THEN [''] ELSE tk0 END AS tk,
      |    (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS bucket
      |  FROM (SELECT doc_id, lang, text,
      |          list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS tk0
      |        FROM documents)
      |  WHERE doc_id >= 10),
      |tok AS (
      |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct
      |  FROM pool),
      |bg AS (
      |  SELECT doc_id, b, count(*) AS c FROM (
      |    SELECT doc_id, unnest(CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
      |      ELSE list_transform(range(1, len(tk)), i -> concat(tk[i], ' ', tk[i+1])) END) AS b
      |    FROM pool) GROUP BY 1, 2),
      |bsum AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |    CAST(max(c) AS BIGINT) AS top_bigram FROM bg GROUP BY 1),
      |g8 AS (
      |  SELECT doc_id, gs FROM (
      |    SELECT doc_id,
      |      CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
      |           ELSE list_distinct(list_transform(range(1, len(tk) - 6),
      |                  i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2], ' ', tk[i+3], ' ',
      |                              tk[i+4], ' ', tk[i+5], ' ', tk[i+6], ' ', tk[i+7]))) END AS gs
      |    FROM pool)),
      |eg AS (
      |  SELECT DISTINCT unnest(CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
      |    ELSE list_distinct(list_transform(range(1, len(tk) - 6),
      |           i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2], ' ', tk[i+3], ' ',
      |                       tk[i+4], ' ', tk[i+5], ' ', tk[i+6], ' ', tk[i+7]))) END) AS sh
      |  FROM (SELECT CASE WHEN len(tk0) = 0 THEN [''] ELSE tk0 END AS tk
      |        FROM (SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |                x -> x <> '') AS tk0
      |              FROM documents WHERE doc_id < 10))),
      |contam AS (
      |  SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(gs) AS sh FROM g8) JOIN eg USING (sh)),
      |flags AS (
      |  SELECT p.doc_id, t.n_tokens,
      |    (CAST(t.n_distinct AS DOUBLE) / t.n_tokens >= 0.3
      |      AND CAST(b.top_bigram AS DOUBLE) / b.n_bigrams <= 0.18) AS q,
      |    (c.doc_id IS NULL) AS d,
      |    p.bucket < (CASE p.lang WHEN 'en' THEN 256 WHEN 'de' THEN 192
      |                WHEN 'es' THEN 128 WHEN 'fr' THEN 128
      |                WHEN 'pt' THEN 64 ELSE 26 END) AS m
      |  FROM pool p JOIN tok t USING (doc_id) JOIN bsum b USING (doc_id)
      |  LEFT JOIN contam c USING (doc_id))
      |SELECT stage_idx, stage,
      |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      |FROM (
      |  SELECT 0 AS stage_idx, 'pool' AS stage, n_tokens FROM flags
      |  UNION ALL SELECT 1, 'quality', n_tokens FROM flags WHERE q
      |  UNION ALL SELECT 2, 'decontaminated', n_tokens FROM flags WHERE q AND d
      |  UNION ALL SELECT 3, 'mixture', n_tokens FROM flags WHERE q AND d AND m)
      |GROUP BY 1, 2 ORDER BY stage_idx""".stripMargin

  // ===== q96 — leakage-safe split: near-dup clusters are split-coherent ===

  /** The q37 content-keyed split hardened against NEAR-duplicate
    * leakage: a per-document split (random or content-keyed) still
    * leaks when two near-identical documents hash apart — the test set
    * then holds a lightly-perturbed copy of a training document,
    * silently inflating eval. The standard fix: resolve near-dup
    * clusters FIRST ([[graft.dedup.MinHashLSH.nearDuplicates]] →
    * [[graft.dedup.DedupClusters.components]]), then key every
    * member's split on the CLUSTER REPRESENTATIVE's content, so each
    * duplicate cluster lands wholly in one split by construction.
    *
    * Oracle construction (the q74 argument made split-shaped): planted
    * copies (doc_id + 2000000) carry the original text plus two
    * trailing spaces — raw md5 differs, but the shingler normalizes
    * ([[graft.dedup.MinHashLSH.shingleRows]] trims), so shingle sets
    * are identical and the θ = 1.0 MinHash path must cluster copy with
    * original; under the q33 precondition (shingle-set equality ⟺
    * raw-text equality on this corpus) the clusters are exactly the
    * md5 groups of the UNPADDED text the oracle plants itself. A
    * copy's own padded md5 would often bucket elsewhere, so the
    * copy-follows-representative assertion is non-vacuous per row.
    *
    * Scale shape: pair/cluster cost is exactly q21 + q36 (both
    * audited); the split assignment adds one component-keyed equi-join
    * carrying only (rep_id, bucket) — no new shuffle surface, and the
    * representative's text never leaves its partition (only its
    * 0..255 bucket rides the join).
    */
  def q96LeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
    SimilarityQueries.requireQ33OraclePreconditions(docs, dir)
    val planted = docs.union(
      docs.select((col("doc_id") + 2000000).as("doc_id"),
        concat(col("text"), lit("  ")).as("text")))
    // Probes the SAME "exact2M.v1" pair relation as q74/q93: the padded
    // copies' raw text differs by the two trailing spaces, but
    // shingleRows normalizes whitespace, so the shingle relation —
    // hence the band table, the candidate set, and the verified
    // (id_a, id_b, jaccard) rows — is identical to the unpadded
    // exact-copy corpus's. One Warehouse build serves the family; the
    // oracle below recomputes the clusters independently, so a
    // divergence would be caught, not hidden.
    val pairs = graft.dedup.MinHashLSH
      .nearDuplicatesCached(s, s"$dir/documents.parquet", "exact2M.v1",
        planted, "doc_id", "text", threshold = 1.0)
      .select("id_a", "id_b")
    val comp = graft.dedup.DedupClusters.components(pairs)
    val assigned = planted.select(col("doc_id"))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("rep_id"))
    // bucket of every doc's OWN text; only representatives' rows join back
    val repBucket = planted.select(col("doc_id").as("rep_id"), md5Bucket.as("bucket"))
    assigned.join(repBucket, Seq("rep_id"))
      .withColumn("split",
        when(col("bucket") < 204, "train")
          .when(col("bucket") < 230, "valid")
          .otherwise("test"))
      .select(col("doc_id"), col("rep_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Clusters = md5 groups of the unpadded text (see q96's doc for why
    * that equals the MinHash components here); the representative is
    * the min id, and every member takes the representative's bucket.
    */
  val q96Sql: String =
    """WITH u AS (
      |  SELECT doc_id, md5(text) AS h FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000, md5(text) FROM documents),
      |r AS (
      |  SELECT h, min(doc_id) AS rep_id,
      |    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket
      |  FROM u GROUP BY h)
      |SELECT u.doc_id, r.rep_id, r.bucket,
      |  CASE WHEN r.bucket < 204 THEN 'train'
      |       WHEN r.bucket < 230 THEN 'valid'
      |       ELSE 'test' END AS split
      |FROM u JOIN r USING (h)
      |ORDER BY doc_id""".stripMargin

  // ========================================================================

  // ===== q162 — purged temporal split with embargo =========================

  /** Time-series-safe train/valid/test split: train on the first 70% of
    * the event timeline, validate from 85%, test after that — with
    * two-day EMBARGO buckets excised at each boundary so
    * leakage-by-adjacency (a label window straddling the cut) cannot
    * happen. q37's content-keyed split answers "same document on both
    * sides"; this is the temporal version every forecasting/eval
    * pipeline needs. Output: one row per bucket
    * (train/embargo/valid/embargo/test) with exact event and user
    * counts, day bounds, and the user-overlap-with-train count —
    * temporal splits DO share users, and the audit reports that
    * honestly instead of hiding it.
    *
    * Scale shape: day bounds come from one tiny min/max aggregate
    * (broadcast 1-row cross); assignment is a map-side CASE on the
    * scan; the per-bucket aggregate shuffles 5 keys. The user-overlap
    * semi-join runs at distinct-(split, user) grain — already reduced
    * far below event grain before it shuffles; no broadcast assumed,
    * AQE may still pick one when the train-user set is small.
    */
  def q162PurgedTimeSplit(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), expr("(ts div 1000) div 86400000000L").as("day"))
    val bounds = ev.agg(min(col("day")).as("min_d"), max(col("day")).as("max_d"))
    val assigned = ev.crossJoin(broadcast(bounds))
      .withColumn("split",
        when(col("day") < expr("min_d + ((max_d - min_d) * 70) div 100"),
          "1_train")
          .when(col("day") < expr("min_d + ((max_d - min_d) * 70) div 100 + 2"),
            "2_embargo")
          .when(col("day") < expr("min_d + ((max_d - min_d) * 85) div 100"),
            "3_valid")
          .when(col("day") < expr("min_d + ((max_d - min_d) * 85) div 100 + 2"),
            "4_embargo")
          .otherwise("5_test"))
      .select(col("split"), col("user_id"), col("day"))
    val perSplit = assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
    val splitUsers = assigned.select(col("split"), col("user_id")).distinct()
    val trainUsers = splitUsers.filter(col("split") === "1_train")
      .select(col("user_id"))
    val overlap = splitUsers
      .join(trainUsers, Seq("user_id"), "left_semi")
      .groupBy(col("split")).agg(count(lit(1)).as("n_users_in_train"))
    perSplit.join(overlap, Seq("split"), "left")
      .select(col("split"), col("n_events"), col("n_users"), col("min_day"),
        col("max_day"),
        coalesce(col("n_users_in_train"), lit(0L)).as("n_users_in_train"))
      .orderBy(col("split"))
  }

  val q162Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |b AS (SELECT min(day) AS min_d, max(day) AS max_d FROM e),
      |a AS (
      |  SELECT user_id, day,
      |    CASE WHEN day < min_d + ((max_d - min_d) * 70) // 100 THEN '1_train'
      |      WHEN day < min_d + ((max_d - min_d) * 70) // 100 + 2 THEN '2_embargo'
      |      WHEN day < min_d + ((max_d - min_d) * 85) // 100 THEN '3_valid'
      |      WHEN day < min_d + ((max_d - min_d) * 85) // 100 + 2 THEN '4_embargo'
      |      ELSE '5_test' END AS split
      |  FROM e, b),
      |p AS (
      |  SELECT split, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      |    min(day) AS min_day, max(day) AS max_day
      |  FROM a GROUP BY 1),
      |su AS (SELECT DISTINCT split, user_id FROM a),
      |o AS (
      |  SELECT split, count(*) AS n_users_in_train FROM su
      |  WHERE user_id IN (SELECT user_id FROM su WHERE split = '1_train')
      |  GROUP BY 1)
      |SELECT p.split, n_events, n_users, min_day, max_day,
      |  coalesce(n_users_in_train, 0) AS n_users_in_train
      |FROM p LEFT JOIN o ON p.split = o.split
      |ORDER BY 1""".stripMargin

  // ===== q178 — dataloader shard balance audit =============================

  /** Content-keyed 8-way shard assignment (md5 bucket mod 8 — the q37
    * split family's key, so byte-identical docs co-shard) with the
    * balance numbers a dataloader review reads: per shard, document and
    * token counts, the share of total tokens, and skew_micro =
    * this shard's tokens against the perfect 1/8 ideal (1e6 = balanced;
    * the max row is the straggler bound on epoch time).
    *
    * Scale shape: assignment is a map-side projection on the scan; one
    * 8-key hash aggregate; the total rides back as a broadcast 1-row
    * cross. One pass, one tiny exchange.
    */
  def q178ShardBalance(s: SparkSession, dir: String): DataFrame = {
    val perShard = Tables.load(s, dir, "documents")
      .withColumn("bucket", md5Bucket)
      .select((col("bucket") % 8).as("shard"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
    perShard
      .crossJoin(broadcast(perShard.agg(sum(col("n_tokens")).as("t_total"))))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        expr("(n_tokens * 1000000) div t_total").as("share_micro"),
        expr("(n_tokens * 8 * 1000000) div t_total").as("skew_micro"))
      .orderBy(col("shard"))
  }

  val q178Sql: String =
    """WITH d AS (
      |  SELECT ((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1)) % 8 AS shard,
      |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |      t -> t <> '')) AS tok
      |  FROM documents),
      |p AS (
      |  SELECT shard, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
      |  FROM d GROUP BY 1),
      |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_total FROM p)
      |SELECT shard, n_docs, n_tokens,
      |  (n_tokens * 1000000) // t_total AS share_micro,
      |  (n_tokens * 8 * 1000000) // t_total AS skew_micro
      |FROM p, t ORDER BY shard""".stripMargin

  // ===== q185 — sequence-packing efficiency report ==========================

  /** How good is the q41 packer? Per split: pack count, token volume,
    * the mean fill rate against the 2048 budget (micro, integer
    * division), the overfull-pack count (q41's start-position rule
    * lets a pack's LAST document overflow the boundary — the report
    * counts how often that truncation/carry decision actually fires)
    * and the worst pack. The numbers that decide whether the budget or
    * the packing rule needs tuning before a training run.
    *
    * Scale shape: exactly q41's cost plus a |splits|-row rollup.
    */
  def q185PackEfficiency(s: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    q41SequencePack(s, dir)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_packs"),
        sum(col("total_tokens")).as("total_tokens"),
        sum(when(col("total_tokens") > budget, 1L).otherwise(0L))
          .as("n_overfull"),
        max(col("total_tokens")).as("max_pack_tokens"))
      .select(col("split"), col("n_packs"), col("total_tokens"),
        expr(s"(total_tokens * 1000000) div (n_packs * $budget)")
          .as("mean_fill_micro"),
        col("n_overfull"), col("max_pack_tokens"))
      .orderBy(col("split"))
  }

  val q185Sql: String =
    s"""WITH packs AS ($q41Sql)
      |SELECT split, count(*) AS n_packs,
      |  CAST(sum(total_tokens) AS BIGINT) AS total_tokens,
      |  (CAST(sum(total_tokens) AS BIGINT) * 1000000)
      |    // (count(*) * 2048) AS mean_fill_micro,
      |  CAST(sum(CASE WHEN total_tokens > 2048 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_overfull,
      |  CAST(max(total_tokens) AS BIGINT) AS max_pack_tokens
      |FROM packs GROUP BY split ORDER BY split""".stripMargin

  // ===== q199 — length × quality joint histogram ==========================

  /** The 2D histogram behind every "are long documents better?"
    * debate: document count per (length decimal-digit-count, quality
    * quintile) cell. Both bucketings are engine-proof: the length
    * bucket is the digit count of the integer (a string length, no
    * logs), the quality bucket divides the micro-quantized q18 score
    * into five fixed bands. Reading down a column shows the quality
    * mix at each length scale — the joint view q63 (deciles) and q18
    * (scores) can't give separately.
    *
    * Scale shape: both bucket keys are map-side projections; one
    * ≤ 5·digits-key hash aggregate. One pass.
    */
  def q199LengthQualityHist(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(expr("length(cast(n_chars as string))").as("len_digits"),
        floor(graft.text.TextFunctions.qualityScore(col("text")) * lit(1e6)
          + lit(0.5)).cast("long").as("q_micro"))
      .withColumn("q_quintile", expr("least(q_micro div 200000, 4) + 1"))
      .groupBy(col("len_digits"), col("q_quintile"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("len_digits"), col("q_quintile"))

  val q199Sql: String =
    s"""WITH d AS (
       |  SELECT length(CAST(n_chars AS VARCHAR)) AS len_digits,
       |    CAST(floor(($SqlQuality) * 1000000 + 0.5) AS BIGINT) AS q_micro
       |  FROM documents)
       |SELECT len_digits, least(q_micro // 200000, 4) + 1 AS q_quintile,
       |  count(*) AS n_docs
       |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ===== q200 — corpus release gate =======================================

  /** The one-row GO/NO-GO a corpus release pipeline ends with: the
    * exact metrics the audits above compute (document/source/language
    * counts, exact-duplicate basis points, mean quality micro, the
    * smallest source's doc count) each compared against a declared
    * threshold, flags as 0/1 integers, and `release_ok` as their
    * conjunction. Every input is an exact integer from one of the
    * proven spellings (q154's card, q58's scorecard), so the gate is
    * bit-reproducible — a release decision that can be re-derived
    * byte-for-byte is an auditable one.
    *
    * Scale shape: one corpus aggregate, one fingerprint-grain
    * aggregate (the q154 pair), one source-grain aggregate — all
    * map-side combining, joined as broadcast 1-row relations.
    */
  def q200ReleaseGate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      floor(sum(floor(graft.text.TextFunctions.qualityScore(col("text")) * lit(1e6)
          + lit(0.5)).cast("long")).cast("double") / count(lit(1)) + lit(0.5))
        .cast("long").as("mean_quality_micro"))
    val dups = docs.groupBy(md5(col("text")).as("fp")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1).as("n_dup_docs"))
    val srcMin = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
      .agg(min(col("c")).as("min_source_docs"))
    base.crossJoin(broadcast(dups)).crossJoin(broadcast(srcMin))
      .withColumn("dup_bps", expr("(n_dup_docs * 10000) div n_docs"))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("mean_quality_micro"), col("dup_bps"), col("min_source_docs"),
        expr("cast(dup_bps <= 100 as bigint)").as("dup_ok"),
        expr("cast(n_langs >= 3 as bigint)").as("lang_ok"),
        expr("cast(mean_quality_micro >= 400000 as bigint)").as("quality_ok"),
        expr("cast(min_source_docs * n_sources * 10 >= n_docs as bigint)")
          .as("balance_ok"))
      .withColumn("release_ok",
        expr("dup_ok * lang_ok * quality_ok * balance_ok"))
  }

  val q200Sql: String =
    s"""WITH base AS (
       |  SELECT count(*) AS n_docs,
       |    count(DISTINCT source) AS n_sources,
       |    count(DISTINCT lang) AS n_langs,
       |    CAST(floor(CAST(sum(CAST(floor(($SqlQuality) * 1000000 + 0.5) AS BIGINT))
       |      AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS mean_quality_micro
       |  FROM documents),
       |d AS (
       |  SELECT CAST(sum(c - 1) AS BIGINT) AS n_dup_docs
       |  FROM (SELECT md5(text) AS fp, count(*) AS c FROM documents GROUP BY 1)),
       |sm AS (
       |  SELECT CAST(min(c) AS BIGINT) AS min_source_docs
       |  FROM (SELECT source, count(*) AS c FROM documents GROUP BY 1)),
       |m AS (
       |  SELECT n_docs, n_sources, n_langs, mean_quality_micro,
       |    (n_dup_docs * 10000) // n_docs AS dup_bps, min_source_docs
       |  FROM base, d, sm)
       |SELECT n_docs, n_sources, n_langs, mean_quality_micro, dup_bps,
       |  min_source_docs,
       |  CAST(dup_bps <= 100 AS BIGINT) AS dup_ok,
       |  CAST(n_langs >= 3 AS BIGINT) AS lang_ok,
       |  CAST(mean_quality_micro >= 400000 AS BIGINT) AS quality_ok,
       |  CAST(min_source_docs * n_sources * 10 >= n_docs AS BIGINT) AS balance_ok,
       |  CAST(dup_bps <= 100 AS BIGINT) * CAST(n_langs >= 3 AS BIGINT)
       |    * CAST(mean_quality_micro >= 400000 AS BIGINT)
       |    * CAST(min_source_docs * n_sources * 10 >= n_docs AS BIGINT)
       |    AS release_ok
       |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q199_length_quality_hist" -> (q199LengthQualityHist _),
    "q200_release_gate" -> (q200ReleaseGate _),
    "q185_pack_efficiency" -> (q185PackEfficiency _),
    "q178_shard_balance" -> (q178ShardBalance _),
    "q96_leakage_safe_split" -> (q96LeakageSafeSplit _),
    "q27_corpus_pipeline" -> (q27CorpusPipeline _),
    "q28_sessionize" -> (q28Sessionize _),
    "q30_percentiles" -> (q30Percentiles _),
    "q31_percentiles_approx" -> (q31PercentilesApprox _),
    "q37_deterministic_split" -> (q37DeterministicSplit _),
    "q41_sequence_pack" -> (q41SequencePack _),
    "q209_license_propagation" -> (q209LicensePropagation _),
    "q212_shard_manifest" -> (q212ShardManifest _),
    "q42_data_mixture" -> (q42DataMixture _),
    "q44_curation_funnel" -> (q44CurationFunnel _),
    "q51_cardinality" -> (q51Cardinality _),
    "q52_cardinality_approx" -> (q52CardinalityApprox _),
    "q53_incr_cardinality" -> (q53IncrementalCardinality _),
    "q137_incr_percentiles" -> (q137IncrPercentiles _),
    "q153_split_leakage" -> (q153SplitLeakage _),
    "q154_dataset_card" -> (q154DatasetCard _),
    "q162_purged_time_split" -> (q162PurgedTimeSplit _))

  val oracleSql: Map[String, String] = Map(
    "q199_length_quality_hist" -> q199Sql,
    "q200_release_gate" -> q200Sql,
    "q185_pack_efficiency" -> q185Sql,
    "q178_shard_balance" -> q178Sql,
    "q96_leakage_safe_split" -> q96Sql,
    "q27_corpus_pipeline" -> q27Sql,
    "q28_sessionize" -> q28Sql,
    "q30_percentiles" -> q30Sql,
    "q37_deterministic_split" -> q37Sql,
    "q41_sequence_pack" -> q41Sql,
    "q209_license_propagation" -> q209Sql,
    "q212_shard_manifest" -> q212Sql,
    "q42_data_mixture" -> q42Sql,
    "q44_curation_funnel" -> q44Sql,
    "q51_cardinality" -> q51Sql,
    "q137_incr_percentiles" -> q137Sql,
    "q153_split_leakage" -> q153Sql,
    "q154_dataset_card" -> q154Sql,
    "q162_purged_time_split" -> q162Sql)
}
