package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.MinHashLSH
import graft.streaming.EventStream

/** Corpus-analytics operators a large-scale training-data pipeline runs
  * between ingest and packing: boilerplate detection (corpus-frequent
  * n-grams), balanced stratified sampling (rate q55 / exact-k q99),
  * source capping (doc-count q59 / token-budget q08), TF-IDF term
  * scoring and the sparse-similarity join over its inverted index,
  * per-source scorecards, and hopping-window event rollups. All
  * DuckDB-oracled — the n-gram/token extraction used here (lowercase,
  * collapse whitespace, whitespace tokens) is restated in the oracle
  * SQL via `string_split`+`unnest`, and every float is rounded to 6
  * decimals on both sides (the q20 convention).
  *
  * Beyond-reference surface (no analogue in the reference's 25 files);
  * the closest reference shapes are the groupBy/agg reports of
  * `main.py:21-74`, which these extend to corpus-curation semantics.
  */
object CorpusOpsQueries {

  /** Tokens-as-rows with the corpus shingler at n=1; blank docs emit
    * the empty token (the shingler's whole-text fallback) which both
    * sides exclude — DuckDB via `ts <> ['']`, Spark here.
    */
  private def tokenRows(docs: DataFrame): DataFrame =
    MinHashLSH.shingleRows(docs, "doc_id", "text", n = 1)
      .filter(col("sh") =!= "")

  // ===== q54 — boilerplate n-grams: corpus-frequent 3-gram heavy hitters ==

  /** The boilerplate detector: the 100 most frequent word 3-grams that
    * appear in at least 2 documents, with occurrence and
    * document-frequency counts — the first step of CCNet-style
    * template/boilerplate removal (an n-gram shared by many documents
    * is navigation chrome, license text, or a scraper artifact, not
    * content).
    *
    * Scale shape: the shingler is one codegen'd map-side pass
    * ([[MinHashLSH.shingleRows]] — no shuffle); the (count, distinct
    * doc) aggregate is one hash-agg shuffle on the n-gram; the top-100
    * is `TakeOrderedAndProject` (per-partition heads, never a global
    * sort of the n-gram space). At 100 TB the n-gram key space is
    * huge but the aggregate is map-side partial first, and the
    * doc_freq >= 2 filter drops the singleton long tail before the
    * ordering.
    */
  def q54BoilerplateNgrams(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    // two-level aggregate instead of count + countDistinct in one agg
    // (whose Expand doubles the exchanged rows): per-(ngram, doc)
    // counts partial-combine map-side, then roll up per ngram
    MinHashLSH.shingleRows(docs, "doc_id", "text", n = 3)
      .groupBy(col("sh").as("ngram"), col("sid"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("ngram"))
      .agg(sum(col("c")).as("occurrences"), count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= 2)
      .orderBy(col("occurrences").desc, col("doc_freq").desc, col("ngram"))
      .limit(100)
  }

  /** Same extraction relationally: tokens with ordinal via
    * unnest/generate_subscripts, 3-grams via two `lead`s, the
    * whole-text fallback for docs shorter than 3 tokens stated as the
    * UNION ALL branch (mirroring the shingler's).
    */
  val q54Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS i, len(ts) AS n FROM toks),
      |grams AS (
      |  SELECT doc_id, concat_ws(' ', tok, lead(tok,1) OVER w, lead(tok,2) OVER w) AS ngram
      |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY i + 2 <= n
      |  UNION ALL
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ngram
      |  FROM documents
      |  WHERE len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) < 3)
      |SELECT ngram, count(*) AS occurrences, count(DISTINCT doc_id) AS doc_freq
      |FROM grams GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
      |ORDER BY occurrences DESC, doc_freq DESC, ngram LIMIT 100""".stripMargin

  // ===== q55 — balanced stratified sample (downsample to smallest stratum)

  /** Deterministic class-balancing: downsample every language stratum
    * to (approximately) the size of the smallest one, content-keyed —
    * each document's fate is a pure function of md5(text)
    * ([[PipelineQueries.md5Bucket]], the q37 source of determinism), so
    * reruns, engines, and duplicate texts agree. The keep rule is pure
    * integer arithmetic (`bucket · n_stratum < 256 · min_n`) — no
    * float rate to diverge between engines.
    *
    * Scale shape: stratum sizes are one tiny aggregate (|langs| rows,
    * broadcast back); the sample itself is a map-side filter — the
    * 100 TB corpus is never shuffled, and the output is written
    * without any global ordering cost beyond the gate's orderBy.
    */
  def q55StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val bucketed = docs.select(col("doc_id"), col("lang"),
      PipelineQueries.md5Bucket.as("bucket"))
    val strata = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val smallest = strata.agg(min(col("n_lang")).as("min_n"))
    bucketed
      .join(broadcast(strata), "lang")
      .crossJoin(broadcast(smallest))
      .filter(col("bucket") * col("n_lang") < lit(256L) * col("min_n"))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  val q55Sql: String =
    """WITH b AS (
      |  SELECT doc_id, lang,
      |    (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS bucket
      |  FROM documents),
      |n AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
      |m AS (SELECT min(n_lang) AS min_n FROM n)
      |SELECT b.doc_id, b.lang, b.bucket
      |FROM b JOIN n USING (lang), m
      |WHERE b.bucket * n.n_lang < 256 * m.min_n
      |ORDER BY doc_id""".stripMargin

  // ===== q99 — per-stratum EXACT-k deterministic sample ===================

  /** q55's threshold sampler draws a RATE; the other sampler every
    * curation run needs is EXACT-k per stratum ("k docs from each
    * source for the eval slice"; k = 10 here so the cut is live even
    * at the sf0.01 gate's 25-doc strata), still with zero RNG: rank documents
    * inside each source by a content-keyed uniform order — the first
    * 13 hex digits of md5(text) as an integer (52 bits, exactly
    * representable in the double the aggregate carries; DuckDB parses
    * the same prefix via a hex cast) — and keep the k smallest,
    * doc_id breaking exact ties.
    *
    * Scale shape: ranking rides the bounded per-split `topk_by`
    * aggregate ([[graft.functions.TopKAgg]], the ANN ranking tail
    * reused on a curation surface) — the exchange carries at most k
    * entries per (split, stratum), where the window form shuffles
    * EVERY row to its stratum's partition and one hot stratum becomes
    * one hot partition at 100 TB. PlanShapeSpec locks the no-window
    * shape.
    */
  def q99StratifiedExactK(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TopKAgg.register(s)
    val docs = Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        conv(substring(md5(col("text")), 1, 13), 16, 10).cast("double").as("ord"))
    docs.groupBy(col("source"))
      .agg(graft.functions.TopKAgg.topkBy(col("ord"), col("doc_id"), 10, asc = true).as("tk"))
      .select(col("source"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("source"), (col("pos") + 1).as("rank"), col("e.id").as("doc_id"))
      .orderBy(col("source"), col("rank"))
  }

  val q99Sql: String =
    """WITH o AS (
      |  SELECT source, doc_id,
      |    ('0x' || substr(md5(text), 1, 13))::BIGINT AS ord
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY ord, doc_id) AS rank
      |  FROM o)
      |SELECT source, rank, doc_id FROM r WHERE rank <= 10
      |ORDER BY source, rank""".stripMargin

  // ===== q56 — TF-IDF top terms per document ==============================

  /** Per-document top-3 TF-IDF terms — the keyword-extraction /
    * quality-signal shape (a document whose top terms are stopwords is
    * template text). tf is the in-document occurrence count, idf is
    * ln(N/df) over the corpus; ties break on the term string so the
    * top-3 is total-ordered.
    *
    * Scale shape: ONE tokenize pass — tf is checkpointed and df
    * derives from it (tf has exactly one row per (doc, term), so
    * rows-per-term IS the distinct doc count; the former second
    * shingle pass and countDistinct's two-phase aggregate disappear) —
    * then a join on term and a per-doc window (partition = one doc's
    * vocabulary, bounded by doc length — scale-safe, unlike the
    * per-lang q176 shape). The df side is vocabulary-sized — joined
    * (not broadcast) deliberately: at 100 TB the vocabulary does not
    * fit an executor. N is a 1-row aggregate, broadcast.
    */
  def q56TfIdfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val tf = tokenRows(docs)
      .groupBy(col("sid").as("doc_id"), col("sh").as("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rank", row_number().over(byDoc))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("tfidf_r6"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val q56Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(ts) AS term FROM toks WHERE ts <> ['']),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |nd AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) AS score
      |  FROM tf JOIN df USING (term), nd),
      |ranked AS (
      |  SELECT doc_id, term, tf, df, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
      |  FROM scored)
      |SELECT doc_id, rank, term, tf, df, round(score, 6) AS tfidf_r6
      |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // ===== q57 — hopping-window event rollup ================================

  /** Sliding (hopping) windows over the event stream in batch: 10-minute
    * windows every 5 minutes, counts + distinct users per (window,
    * type) — the smoothed-rate view a monitoring rollup needs (q14 is
    * the tumbling special case). Uses Spark's native `window()`
    * generator; with size = 2·slide each event lands in exactly 2
    * windows, which the oracle states as an explicit 2-offset unnest.
    *
    * Timestamps are epoch-µs on both sides (the q45–q50 convention:
    * DuckDB truncates parquet nanos to µs, Spark divides the nanos
    * long by 1000).
    *
    * Scale shape: `window()` is a codegen'd 2-row generate (no
    * shuffle), then ONE hash-agg shuffle on (window, type); the
    * distinct-user count is the exact anchor — at 100 TB swap in
    * `approx_count_distinct` (the q51/q52 pairing) and the plan shape
    * is unchanged. Streaming twin: the same `window()` call under a
    * watermark is [[EventStream.hourlyRollup]]'s shape with a slide.
    */
  def q57HoppingWindows(s: SparkSession, dir: String): DataFrame = {
    val slide = "5 minutes"
    val size = "10 minutes"
    val ev = Tables.load(s, dir, "events")
      .withColumn("ts_ev", EventStream.nanosToTs(col("ts")))
    ev.groupBy(window(col("ts_ev"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("window.start")).as("win_start"),
        unix_micros(col("window.end")).as("win_end"),
        col("event_type"), col("n_events"), col("n_users"))
      .orderBy(col("win_start"), col("event_type"))
  }

  val q57Sql: String =
    """WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS ts_us FROM events),
      |offs AS (SELECT unnest([0, 300000000]) AS off),
      |w AS (SELECT event_type, user_id,
      |        ts_us - (ts_us % 300000000) - off AS win_start FROM e, offs)
      |SELECT win_start, win_start + 600000000 AS win_end, event_type,
      |  count(*) AS n_events, count(DISTINCT user_id) AS n_users
      |FROM w GROUP BY 1, 3 ORDER BY 1, 3""".stripMargin

  // ===== q58 — source scorecard ===========================================

  /** Per-source curation scorecard: document count, language spread,
    * average token count, and the exact-duplicate count — the numbers a
    * curation run consults when deciding which sources to keep, cap, or
    * drop. A doc is a duplicate when its md5(text) appears more than
    * once in the WHOLE corpus (cross-source copies count for both
    * sources — scraper mirrors are exactly the cross-source case).
    *
    * Scale shape: the dup side is the q19 exact-dedup hash aggregate
    * (one shuffle on md5); joining it back is a shuffle on the same
    * key (co-partitioned — no extra exchange); the scorecard itself is
    * a tiny per-source aggregate. Token counting is codegen'd
    * ([[graft.text.TextFunctions.tokenCount]]), no UDFs.
    */
  def q58SourceScorecard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .withColumn("h", md5(col("text")))
      .withColumn("n_tok", graft.text.TextFunctions.tokenCount(col("text")))
    val dupCounts = docs.groupBy(col("h")).agg(count(lit(1)).as("nh"))
    docs.join(dupCounts, "h")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        round(avg(col("n_tok")), 6).as("avg_tokens"),
        sum(when(col("nh") > 1, 1L).otherwise(0L)).as("dup_docs"))
      .orderBy(col("source"))
  }

  val q58Sql: String =
    """WITH d AS (
      |  SELECT doc_id, source, lang, md5(text) AS h,
      |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS n_tok
      |  FROM documents),
      |dup AS (SELECT h, count(*) AS nh FROM d GROUP BY 1)
      |SELECT d.source, count(*) AS n_docs, count(DISTINCT d.lang) AS n_langs,
      |  round(avg(d.n_tok), 6) AS avg_tokens,
      |  CAST(sum(CASE WHEN dup.nh > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs
      |FROM d JOIN dup USING (h)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ===== q59 — per-source cap (mixture capping) ===========================

  /** Cap every source at K documents, selected content-keyed: within a
    * source, docs are ranked by (md5(text), doc_id) and the first K
    * kept — the "no single domain may dominate the mixture" rule,
    * deterministic across reruns and engines because the selection
    * order is a pure function of content, never of ingestion order or
    * partitioning.
    *
    * Scale shape: one exchange on source + a per-source sort. A
    * pathologically hot source concentrates its sort on one partition —
    * at 100 TB pre-prune with a per-partition local top-K on (source,
    * h) before the global window (the rank only ever keeps K per
    * source, so local heads are sufficient); AQE's skew handling splits
    * the straggler reads. The window itself holds O(1) state per row
    * (a running row_number), never the group.
    */
  def q59SourceCap(s: SparkSession, dir: String): DataFrame = {
    val k = 10
    val bySource = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    Tables.load(s, dir, "documents")
      .withColumn("h", md5(col("text")))
      .withColumn("rn", row_number().over(bySource))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("source"), col("rn"))
      .orderBy(col("doc_id"))
  }

  val q59Sql: String =
    """WITH r AS (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, source, rn FROM r WHERE rn <= 10 ORDER BY doc_id""".stripMargin

  // ===== q08 — token-budget source cap ====================================

  /** q59 caps each source at K DOCUMENTS; the unit a training pipeline
    * actually budgets is TOKENS: admit documents per source in the
    * deterministic content order (md5, doc_id — q59's order) while the
    * running token total stays within budget B = 800 (chosen to bind
    * at both gate scales), so every source contributes at most B
    * tokens no matter how its document lengths skew. A doc is kept iff
    * the running sum INCLUDING it is ≤ B — the first over-budget doc
    * and everything after it in content order is cut. Integer token
    * counts ([[graft.text.TextFunctions.tokenCount]]) keep the prefix
    * sums engine-exact.
    *
    * Scale shape: one shuffle on source + the running-sum window —
    * ordering is intrinsic to a prefix-sum cap (q59's shape); at
    * 100 TB the swap is range-partitioning on (source, h) so each
    * stratum's prefix sum runs in parallel ranges (the q63→q68
    * argument applied per source).
    */
  def q08TokenBudgetCap(s: SparkSession, dir: String): DataFrame = {
    val budget = 800L
    val bySource = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        md5(col("text")).as("h"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(bySource))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  val q08Sql: String =
    """WITH t AS (
      |  SELECT doc_id, source, md5(text) AS h,
      |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |      x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t)
      |SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
      |FROM c WHERE cum <= 800 ORDER BY doc_id""".stripMargin

  // ===== q95 — sparse TF-IDF similarity join (inverted index) =============

  /** Document-pair similarity over SPARSE term vectors — the
    * embedding-free fuzzy-dedup / related-document primitive (the
    * BM25-family answer to q32's dense cosine): each doc is truncated
    * to its top-5 TF-IDF terms (q56's exact weight formula), and pairs
    * sharing ≥ 4 of those 5 terms — near-identical keyword profiles,
    * the strong-overlap fuzzy-dup signal — score the dot product of
    * their truncated vectors (on this corpus's shared synthetic
    * vocabulary the ≥ 2 threshold admits ~20% of ALL pairs, so the
    * gate pins the strict profile-match semantics; the threshold is
    * the output-volume knob, orthogonal to the join shape).
    *
    * Candidate generation is the LSH AND-trick on exact terms: every
    * SORTED 4-TERM SUBSET of a doc's ≤5-term profile is a signature
    * (≤5 per doc — drop one term, or the whole profile at exactly 4),
    * and two docs meet in the signature join iff they already share a
    * full 4-subset, i.e. iff they can pass the ≥4 filter at all. The
    * naive posting-list self-join (one signature per TERM) admits
    * every pair sharing ≥1 top-term — 11.0M join rows at sf0.1 for a
    * 15k-pair result, a 700× overshoot this shape eliminates
    * (measured 15.5 s → the signature join tracks the output volume).
    *
    * Exactly oracled: weights are milli-quantized (×1e3, floor+0.5 →
    * long) BEFORE pairing, so the pair dot is integer arithmetic —
    * products ≤ ~1.6e13, sums far under 2^63 — and summation order
    * cannot shift anything (the q83 technique one level up). The
    * pair scoring walks the two ≤5-entry profile arrays (interpreted
    * HOFs, but over candidate pairs only — never the corpus).
    *
    * Scale shape: ONE tokenize pass (df derives from the checkpointed
    * tf — rows-per-term is the distinct doc count), the term join from
    * q56, one per-doc bounded `topk_by_str` aggregate whose output
    * array is the profile (no window, no second per-doc collect), a ×5
    * signature explode, and the signature equi-join — all over the
    * checkpointed profile relation, evaluated once. A signature bucket
    * of width s costs s²/2 — same exposure family as the LSH bands,
    * with the same star-degrade remedy available if a corpus
    * concentrates profiles.
    */
  def q95SparseSimilarity(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TopKStrAgg.register(s)
    val docs = Tables.load(s, dir, "documents")
    // one tokenize pass, checkpointed: df is derivable from tf (tf has
    // exactly one row per (doc, term), so rows-per-term IS the distinct
    // doc count) — the second shingle pass and the countDistinct's
    // two-phase aggregate both disappear
    val tf = tokenRows(docs)
      .groupBy(col("sid").as("doc_id"), col("sh").as("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // ≤5-entry term-sorted profile per doc; <4 terms can never share ≥4.
    // The per-doc top-5 rides the bounded topk_by_str aggregate (score
    // desc, term tiebreak — window-identical by TopKStrAggSpec) and its
    // output array IS the profile, so the former window + second
    // per-doc aggregate collapse into one exchange. Checkpointed: the
    // signature explode and both scoring joins read it, and Spark would
    // otherwise re-evaluate the whole TF-IDF subtree once per consumer.
    val vecs = tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .groupBy(col("doc_id"))
      .agg(graft.functions.TopKStrAgg
        .topkByStr(col("score"), col("term"), 5, asc = false).as("tk"))
      .select(col("doc_id"), array_sort(expr(
        "transform(tk, e -> named_struct(" +
          "'term', e.key, 'wm', cast(floor(e.score * 1000 + 0.5) as bigint)))"))
        .as("vec"))
      .filter(size(col("vec")) >= 4)
      .localCheckpoint(true)
    val combos = vecs
      .withColumn("drop_i",
        explode(when(size(col("vec")) === 5, sequence(lit(0), lit(4)))
          .otherwise(array(lit(-1)))))
      .withColumn("combo",
        when(col("drop_i") < 0, col("vec"))
          .otherwise(concat(
            slice(col("vec"), lit(1), col("drop_i")),
            slice(col("vec"), col("drop_i") + 2, lit(5)))))
      .select(col("doc_id"),
        md5(concat_ws(" ", transform(col("combo"), x => x.getField("term")))).as("sig"))
    val cand = combos.alias("a")
      .join(combos.alias("b"),
        col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(vecs.select(col("doc_id").as("id_a"), col("vec").as("va")), "id_a")
      .join(vecs.select(col("doc_id").as("id_b"), col("vec").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        expr("cast(size(filter(va, x -> exists(vb, y -> y.term = x.term))) as bigint)")
          .as("shared_terms"),
        expr("aggregate(va, 0L, (acc, x) -> acc + " +
          "aggregate(filter(vb, y -> y.term = x.term), 0L, (a2, y) -> a2 + x.wm * y.wm))")
          .as("dot_m2"))
      .filter(col("shared_terms") >= 4)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q95Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(ts) AS term FROM toks WHERE ts <> ['']),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |nd AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) AS score
      |  FROM tf JOIN df USING (term), nd),
      |top5 AS (
      |  SELECT doc_id, term, CAST(floor(score * 1000 + 0.5) AS BIGINT) AS wm FROM (
      |    SELECT doc_id, term, score,
      |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
      |    FROM scored) WHERE rank <= 5)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  count(*) AS shared_terms, CAST(sum(a.wm * b.wm) AS BIGINT) AS dot_m2
      |FROM top5 a JOIN top5 b ON a.term = b.term AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 4 ORDER BY 1, 2""".stripMargin

  // ===== q116 — weighted sample without replacement (Efraimidis–Spirakis) =

  /** Token-budget-proportional sampling: draw 100 documents WITHOUT
    * replacement with inclusion probability proportional to length
    * (n_chars) — the draw every mixture builder needs when "sample k
    * docs" really means "sample k docs the way token-weighted epoch
    * construction would". Efraimidis–Spirakis A-ES: rank every doc by
    * key = −ln(u)/w and keep the k smallest, with u a content-keyed
    * uniform (the q99 md5 52-bit prefix mapped into (0,1] — zero RNG,
    * rerun/engine stable) and w = n_chars. u is an exact dyadic
    * rational (52-bit integer / 2⁵²), so both engines feed ln the
    * SAME double and divide by the same exact weight — bit-identical
    * keys (the q77 ln precedent).
    *
    * Scale shape: the ranking rides the bounded `topk_by` aggregate
    * ([[graft.functions.TopKAgg]]) — one map-side pass computes keys,
    * each split contributes ≤ k entries, no global sort and no window;
    * the corpus never shuffles.
    */
  def q116WeightedSample(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TopKAgg.register(s)
    val keyed = Tables.load(s, dir, "documents")
      .filter(col("n_chars") > 0)
      .select(col("doc_id"),
        (-log((conv(substring(md5(col("text")), 1, 13), 16, 10).cast("double") + 1)
          / lit(4503599627370496.0)) / col("n_chars").cast("double")).as("key"))
    keyed
      .agg(graft.functions.TopKAgg.topkBy(col("key"), col("doc_id"), 100, asc = true).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "e")))
      .select((col("pos") + 1).as("rank"), col("e.id").as("doc_id"),
        round(col("e.score"), 6).as("key_r6"))
      .orderBy(col("rank"))
  }

  val q116Sql: String =
    """WITH o AS (
      |  SELECT doc_id,
      |    -ln((('0x' || substr(md5(text), 1, 13))::BIGINT + 1) / 4503599627370496.0)
      |      / CAST(n_chars AS DOUBLE) AS key
      |  FROM documents WHERE n_chars > 0),
      |r AS (
      |  SELECT doc_id, key,
      |    row_number() OVER (ORDER BY key, doc_id) AS rank
      |  FROM o)
      |SELECT rank, doc_id, round(key, 6) AS key_r6
      |FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin

  // ===== q117 — PMI collocations (top bigrams by pointwise MI) ============

  /** The collocation detector: adjacent-word bigrams scored by
    * pointwise mutual information ln(c_xy·N / (c_x·c_y)), min support
    * 5, top-100 — the standard "is this two-word phrase a unit"
    * statistic (tokenizer vocab curation, boilerplate phrase mining).
    * PMI's argument is a ratio of exact int64 products, so both
    * engines feed ln the same double; the score is micro-quantized to
    * a long (the q77 spelling) before the ordering cut, with the
    * bigram string as the total-order tiebreak.
    *
    * Scale shape: ONE tokenize pass and ONE hash aggregate — unigrams
    * and bigrams are pulled from the same normalized text in a single
    * projection (the two shingler regexes share the normalize) and
    * counted together (a bigram contains a space, a unigram cannot, so
    * the gram string itself carries the kind; map-side partial combine
    * applies as before). Singleton bigrams — the mass of the key
    * space — are dropped BEFORE the checkpoint, so the materialized
    * relation is vocabulary + supported-bigram sized, not corpus
    * sized. The margins are joined on the token, not broadcast — a
    * 100 TB vocabulary doesn't fit an executor (the q56 argument); N
    * is a 1-row broadcast; top-100 is TakeOrderedAndProject, never a
    * global sort.
    */
  def q117PmiCollocations(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    // one normalized-text projection; the nrm alias keeps projection
    // collapse from re-evaluating the normalize per regex
    val nrm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    // the shingler patterns at n=1 and n=2 (MinHashLSH.shingleRows),
    // minus the whole-text fallback: blank docs match neither pattern
    // (the former `sh =!= ""` filter), and a 1-token doc's fallback
    // shingle was dropped by the size(parts)=2 filter anyway
    val grams = docs
      .select(nrm.as("nrm"))
      .select(explode(concat(
        regexp_extract_all(col("nrm"), lit("(?:^| )(?=([^ ]+))"), lit(1)),
        regexp_extract_all(col("nrm"), lit("(?:^| )(?=([^ ]+ [^ ]+))"), lit(1)))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .filter(!col("g").contains(" ") || col("c") >= 5)
      .localCheckpoint(true)
    val uni = grams.filter(!col("g").contains(" ")).select(col("g").as("tok"), col("c"))
    val nTok = uni.agg(sum(col("c")).as("n_tokens"))
    val bi = grams.filter(col("g").contains(" "))
      .select(split(col("g"), " ").as("parts"), col("c").as("c_xy"))
      .select(col("parts").getItem(0).as("w1"), col("parts").getItem(1).as("w2"),
        col("c_xy"))
    bi
      .join(uni.select(col("tok").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(nTok))
      .withColumn("pmi_micro",
        floor(log((col("c_xy") * col("n_tokens")).cast("double")
          / (col("c_x") * col("c_y")).cast("double")) * 1e6 + 0.5).cast("long"))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(100)
  }

  val q117Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS i, len(ts) AS n
      |  FROM toks WHERE ts <> ['']),
      |uni AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
      |nt AS (SELECT count(*) AS n_tokens FROM tok),
      |bi AS (
      |  SELECT tok AS w1, lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS w2
      |  FROM tok QUALIFY i + 1 <= n),
      |bc AS (SELECT w1, w2, count(*) AS c_xy FROM bi GROUP BY 1, 2 HAVING count(*) >= 5)
      |SELECT bc.w1, bc.w2, bc.c_xy, ux.c AS c_x, uy.c AS c_y,
      |  CAST(floor(ln(CAST(bc.c_xy * n_tokens AS DOUBLE)
      |    / CAST(ux.c * uy.c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS pmi_micro
      |FROM bc JOIN uni ux ON bc.w1 = ux.tok JOIN uni uy ON bc.w2 = uy.tok, nt
      |ORDER BY pmi_micro DESC, w1, w2 LIMIT 100""".stripMargin

  // ===== q124 — per-source KL divergence from the corpus distribution =====

  /** Distribution-shift profile: for each source, the KL divergence of
    * its unigram distribution from the whole-corpus distribution —
    * KL(P_s ‖ Q) = Σ_w (c_sw/n_s)·ln(c_sw·N / (n_s·c_w)) — the drift
    * detector that flags a source whose language stopped looking like
    * the corpus (scraper breakage, template flood, language shift).
    * Every ratio is exact int64 counts, each token's term is
    * micro-quantized to a long before the per-source sum (the q77
    * discipline; terms can be negative, floor(x+0.5) is the same
    * deterministic round-half-up both engines), and only observed
    * (source, w) pairs contribute — exactly the support of P_s.
    *
    * Scale shape: one (source, w) hash aggregate feeds everything;
    * corpus token totals join on the token (vocabulary-sized — the
    * q56 no-broadcast argument), source totals and N ride in as
    * broadcasts; final rollup is |sources| rows.
    */
  def q124KlDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    // checkpointed: the source totals, token totals and the scoring
    // join all read this relation — one tokenize pass, not three
    val sw = MinHashLSH.shingleRows(docs, "source", "text", n = 1)
      .filter(col("sh") =!= "")
      .groupBy(col("sid").as("source"), col("sh").as("w"))
      .agg(count(lit(1)).as("c_sw"))
      .localCheckpoint(true)
    val srcTot = sw.groupBy(col("source")).agg(sum(col("c_sw")).as("n_s"))
    val wTot = sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
    val n = srcTot.agg(sum(col("n_s")).as("n_total"))
    sw.join(wTot, Seq("w"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(n))
      .withColumn("term_micro",
        floor((col("c_sw").cast("double") / col("n_s").cast("double"))
          * log((col("c_sw") * col("n_total")).cast("double")
            / (col("n_s") * col("c_w")).cast("double"))
          * 1e6 + 0.5).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        sum(col("term_micro")).as("kl_micro"))
      .orderBy(col("source"))
  }

  val q124Sql: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |sw AS (SELECT source, w, count(*) AS c_sw FROM toks WHERE w <> '' GROUP BY 1, 2),
      |st AS (SELECT source, sum(c_sw) AS n_s FROM sw GROUP BY 1),
      |wt AS (SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY 1),
      |n AS (SELECT sum(n_s) AS n_total FROM st)
      |SELECT sw.source, CAST(max(st.n_s) AS BIGINT) AS n_tokens,
      |  count(*) AS n_distinct_tokens,
      |  CAST(sum(CAST(floor((CAST(c_sw AS DOUBLE) / CAST(n_s AS DOUBLE))
      |    * ln(CAST(c_sw * n_total AS DOUBLE) / CAST(n_s * c_w AS DOUBLE))
      |    * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS kl_micro
      |FROM sw JOIN wt USING (w) JOIN st USING (source), n
      |GROUP BY sw.source ORDER BY sw.source""".stripMargin

  // ===== q130 — Zipf-law fit over the token frequency spectrum ============

  /** Closed-form least-squares fit of ln(freq) against ln(rank) over
    * the top-1000 corpus tokens — the Zipf exponent every tokenizer /
    * vocabulary-size decision starts from, plus R² as the "is this
    * corpus natural language or template spam" diagnostic (natural text
    * fits ln-ln near-linearly with slope ≈ −1; machine-generated
    * boilerplate bends the curve). One row out.
    *
    * Determinism: x = ln(rank), y = ln(freq) are per-row SCALARS
    * micro-quantized to longs BEFORE any aggregation (the q77
    * discipline); the five regression sums are then exact integer
    * aggregates, and slope/intercept/R² derive from those longs with
    * the identical double expression on both engines (casts applied
    * before the products that would overflow int64).
    *
    * Scale shape: one vocabulary hash-aggregate; the top-1000 cut is
    * the bounded `topk_by`-equivalent TakeOrderedAndProject (never a
    * global sort); the regression is a 1000-row single-partition
    * aggregate — driver-free, broadcast-free, one row out.
    */
  def q130ZipfFit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val top = tokenRows(docs)
      .groupBy(col("sh").as("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(1000)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("w"))))
      .select(
        floor(log(col("rank").cast("double")) * lit(1e6) + lit(0.5)).cast("long").as("x"),
        floor(log(col("c").cast("double")) * lit(1e6) + lit(0.5)).cast("long").as("y"))
    top.agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").as("n_terms"),
        (col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy"))
          .as("num"),
        (col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx"))
          .as("den"),
        (col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy"))
          .as("deny"),
        col("sx"), col("sy"), col("n"))
      .select(col("n_terms"),
        (floor(col("num") / col("den") * lit(1e6) + lit(0.5)) / lit(1e6)).as("slope_r6"),
        (floor((col("sy") - col("num") / col("den") * col("sx")) / col("n") + lit(0.5))
          / lit(1e6)).as("intercept_r6"),
        (floor(col("num") * col("num") / (col("den") * col("deny")) * lit(1e6) + lit(0.5))
          / lit(1e6)).as("r2_r6"))
  }

  val q130Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |cnt AS (SELECT w, count(*) AS c FROM toks WHERE w <> '' GROUP BY 1),
      |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 1000),
      |xy AS (
      |  SELECT
      |    CAST(floor(ln(CAST(row_number() OVER (ORDER BY c DESC, w) AS DOUBLE))
      |      * 1000000 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
      |  FROM top),
      |s AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM xy),
      |d AS (
      |  SELECT n AS n_terms,
      |    CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS num,
      |    CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS den,
      |    CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS deny,
      |    sx, sy, n
      |  FROM s)
      |SELECT n_terms,
      |  floor(num / den * 1000000 + 0.5) / 1000000 AS slope_r6,
      |  floor((sy - num / den * sx) / n + 0.5) / 1000000 AS intercept_r6,
      |  floor(num * num / (den * deny) * 1000000 + 0.5) / 1000000 AS r2_r6
      |FROM d""".stripMargin

  // ===== q136 — interleaved epoch schedule (low-discrepancy mixture) ======

  /** The global training-order schedule a data loader consumes: every
    * document gets an integer position key that spreads each source's
    * docs UNIFORMLY across the epoch — the k-th of a source's n_s docs
    * lands at fraction (2k−1)/(2n_s) of the corpus — so a consumer
    * reading in key order sees every source at its corpus proportion
    * in every window (the Pile/FineWeb shard-interleave shape), not
    * source-by-source. Within a source, order is content-keyed
    * (md5(text), doc_id — the q55/q59 mixture discipline: rerun-stable,
    * no RNG). The key is exact integer arithmetic:
    * pos = ((2·rk − 1) · N · 10⁶) div (2·n_s).
    *
    * Scale shape: ONE exchange on source covers both the in-source
    * rank and the per-source count (two window functions, same
    * partitioning); N is a broadcast 1-row aggregate. No global
    * sequence is materialized — the position KEY is the product, and
    * the epoch order is "range-partition by pos" at read time, so
    * nothing global ever sorts in the pipeline itself (the final
    * orderBy is the verification-output convention). At 100 TB the
    * ×10⁶ headroom bounds N·rk·10⁶ ≈ 2⁶³ around N ≈ 3·10⁹ docs per
    * schedule — beyond that, schedule per shard-group or drop to 10³
    * units (documented lever, not a cliff).
    */
  def q136EpochSchedule(s: SparkSession, dir: String): DataFrame = {
    val bySrc = Window.partitionBy(col("source"))
    val docs = Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"), md5(col("text")).as("ck"))
    docs
      .withColumn("rk", row_number().over(bySrc.orderBy(col("ck"), col("doc_id"))))
      .withColumn("n_s", count(lit(1)).over(bySrc))
      .crossJoin(broadcast(docs.select(count(lit(1)).as("n_total"))))
      .select(col("source"), col("doc_id"), col("rk"),
        expr("((2*rk - 1) * n_total * 1000000L) div (2 * n_s)").as("pos_micro"))
      .orderBy(col("pos_micro"), col("source"), col("doc_id"))
  }

  val q136Sql: String =
    """WITH d AS (SELECT source, doc_id, md5(text) AS ck FROM documents),
      |r AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY ck, doc_id) AS rk,
      |    count(*) OVER (PARTITION BY source) AS n_s
      |  FROM d),
      |n AS (SELECT count(*) AS n_total FROM d)
      |SELECT source, doc_id, CAST(rk AS INTEGER) AS rk,
      |  ((2*rk - 1) * n_total * 1000000) // (2 * n_s) AS pos_micro
      |FROM r, n
      |ORDER BY pos_micro, source, doc_id""".stripMargin

  // ===== q141 — length-matched sampling across sources ====================

  /** Distribution-matched subcorpus: downsample every source so that
    * all sources share an IDENTICAL length-decile histogram — the
    * matched-control construction an ablation needs when comparing
    * sources ("is source X worse, or just longer?"). Buckets are the
    * corpus deciles (q68's broadcast cut points, map-side bucket);
    * per decile the cap is the minimum source count — a source ABSENT
    * from a bucket zeroes that bucket for everyone (the grid join
    * below; without it distributions silently diverge) — and each
    * source keeps its cap-many content-ordered docs (md5, doc_id — the
    * q55/q59 discipline, no RNG).
    *
    * Scale shape: cut points and the caps grid are tiny broadcast
    * aggregates (|sources|×10 rows); bucketing is map-side; the only
    * data-sized exchange keys (source, decile) for the in-bucket rank
    * — |sources|×10 partitions, no global sort. At extreme per-bucket
    * counts the rank swaps to `topk_by` with the bucket's cap joined
    * in (the q99 shape).
    */
  def q141MatchedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val cuts = docs.agg(expr(
      "percentile(n_chars, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
      .as("qs"))
    val bucketed = docs.crossJoin(broadcast(cuts))
      .withColumn("decile", expr("1 + size(filter(qs, c -> n_chars > c))"))
      .select(col("source"), col("doc_id"), col("n_chars"), col("decile"),
        md5(col("text")).as("ck"))
    val counts = bucketed.groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n"))
    val grid = docs.select(col("source")).distinct()
      .crossJoin(s.range(1, 11).select(col("id").cast("int").as("decile")))
    val caps = grid.join(counts, Seq("source", "decile"), "left")
      .select(col("decile"), coalesce(col("n"), lit(0L)).as("n"))
      .groupBy(col("decile")).agg(min(col("n")).as("cap"))
    bucketed
      .withColumn("rk", row_number().over(Window
        .partitionBy(col("source"), col("decile"))
        .orderBy(col("ck"), col("doc_id"))))
      .join(broadcast(caps), "decile")
      .filter(col("rk") <= col("cap"))
      .select(col("source"), col("decile"), col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("decile"), col("doc_id"))
  }

  val q141Sql: String =
    """WITH c AS (
      |  SELECT quantile_cont(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
      |  FROM documents),
      |b AS (
      |  SELECT d.source, d.doc_id, d.n_chars,
      |    CAST(1 + len(list_filter(c.qs, q -> d.n_chars > q)) AS INTEGER) AS decile,
      |    md5(d.text) AS ck
      |  FROM documents d, c),
      |cnt AS (SELECT source, decile, count(*) AS n FROM b GROUP BY 1, 2),
      |grid AS (
      |  SELECT s.source, d.decile FROM (SELECT DISTINCT source FROM documents) s,
      |    (SELECT CAST(unnest(range(1, 11)) AS INTEGER) AS decile) d),
      |caps AS (
      |  SELECT g.decile, min(coalesce(cnt.n, 0)) AS cap
      |  FROM grid g LEFT JOIN cnt ON g.source = cnt.source AND g.decile = cnt.decile
      |  GROUP BY 1),
      |r AS (
      |  SELECT source, decile, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source, decile ORDER BY ck, doc_id) AS rk
      |  FROM b)
      |SELECT r.source, r.decile, r.doc_id, r.n_chars
      |FROM r JOIN caps USING (decile)
      |WHERE rk <= cap
      |ORDER BY source, decile, doc_id""".stripMargin

  // ===== q142 — vocabulary coverage curve =================================

  /** How many vocabulary entries cover 50% / 90% / 99% of corpus token
    * OCCURRENCES — the first number every tokenizer/vocab-size decision
    * reads off the frequency spectrum. Computed WITHOUT ranking the
    * vocabulary: tokens collapse to frequency-value blocks (c,
    * n_tokens) — thousands of rows however large the vocabulary — and
    * the cumulative walk runs at block grain; within a block all
    * tokens tie at c occurrences, so the smallest rank reaching target
    * T is exactly tokens_before + ⌈(T − occ_before)/c⌉ (pure integer
    * arithmetic, no approximation).
    *
    * Scale shape: one vocabulary hash-aggregate, one tiny
    * (distinct-frequency-sized) aggregate, a window over THAT block
    * relation only — the vocab itself is never globally sorted (the
    * q56 rule; a rank-window form would single-partition 10⁸ vocab
    * rows at 100 TB).
    */
  def q142VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val blocks = tokenRows(docs)
      .groupBy(col("sh").as("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("n_tokens"))
      .withColumn("cum_occ", sum(col("c") * col("n_tokens"))
        .over(Window.orderBy(col("c").desc)))
      .withColumn("cum_tok", sum(col("n_tokens"))
        .over(Window.orderBy(col("c").desc)))
      .select(col("c"), col("n_tokens"),
        (col("cum_occ") - col("c") * col("n_tokens")).as("occ_before"),
        (col("cum_tok") - col("n_tokens")).as("tok_before"), col("cum_occ"))
      // eager checkpoint: the total, the candidate filter and the pick
      // join all read the block relation — the tokenize + vocabulary
      // aggregate behind it must run once, not three times
      .localCheckpoint(true)
    val targets = s.range(0, 3).select(
      element_at(array(lit(5000), lit(9000), lit(9900)), col("id").cast("int") + 1)
        .as("p_bps"))
    val total = blocks.agg(max(col("cum_occ")).as("total_occ"))
    val cand = blocks.crossJoin(broadcast(targets)).crossJoin(broadcast(total))
      .withColumn("t_occ", expr("cast(ceil(p_bps * total_occ / 10000.0) as bigint)"))
      .filter(col("cum_occ") >= col("t_occ"))
    cand.groupBy(col("p_bps").as("pb")).agg(min(col("cum_occ")).as("pick"))
      .join(cand, col("pick") === col("cum_occ") && col("pb") === col("p_bps"))
      .select(col("p_bps"),
        expr("tok_before + (t_occ - occ_before + c - 1) div c").as("vocab_size"),
        col("t_occ"), col("total_occ"))
      .orderBy(col("p_bps"))
  }

  val q142Sql: String =
    """WITH cnt AS (
      |  SELECT w, count(*) AS c FROM (
      |    SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |    FROM documents) WHERE w <> '' GROUP BY 1),
      |blk AS (SELECT c, count(*) AS n_tokens FROM cnt GROUP BY 1),
      |cum AS (
      |  SELECT c, n_tokens,
      |    CAST(sum(c * n_tokens) OVER (ORDER BY c DESC) AS BIGINT) AS cum_occ,
      |    CAST(sum(n_tokens) OVER (ORDER BY c DESC) AS BIGINT) AS cum_tok
      |  FROM blk),
      |b AS (
      |  SELECT c, n_tokens, cum_occ - c * n_tokens AS occ_before,
      |    cum_tok - n_tokens AS tok_before, cum_occ
      |  FROM cum),
      |tot AS (SELECT max(cum_occ) AS total_occ FROM b),
      |tg AS (SELECT unnest([5000, 9000, 9900]) AS p_bps),
      |cand AS (
      |  SELECT b.*, tg.p_bps,
      |    CAST(ceil(tg.p_bps * tot.total_occ / 10000.0) AS BIGINT) AS t_occ,
      |    tot.total_occ
      |  FROM b, tg, tot WHERE b.cum_occ >= CAST(ceil(tg.p_bps * tot.total_occ / 10000.0) AS BIGINT)),
      |pick AS (SELECT p_bps, min(cum_occ) AS pick FROM cand GROUP BY 1)
      |SELECT c2.p_bps,
      |  c2.tok_before + (c2.t_occ - c2.occ_before + c2.c - 1) // c2.c AS vocab_size,
      |  c2.t_occ, c2.total_occ
      |FROM pick JOIN cand c2 ON pick.p_bps = c2.p_bps AND pick.pick = c2.cum_occ
      |ORDER BY c2.p_bps""".stripMargin

  // ===== q144 — exact two-sample KS drift between sources =================

  /** Pairwise Kolmogorov–Smirnov statistic over the document-length
    * distributions of every source pair — the distribution-drift
    * detector that needs NO binning choice (unlike PSI/KL): D = max
    * over observed values v of |cdf_a(v) − cdf_b(v)|. Computed
    * EXACTLY in integers: D·n_a·n_b = max |cum_a·n_b − cum_b·n_a|,
    * divided once at the end and micro-quantized — no float ever
    * enters the max, so the statistic is bit-stable on both engines.
    * The q124 KL and q86 overlap views say WHAT differs; KS says the
    * two samples' distributions differ and by how much, scale-free.
    *
    * Scale shape: the corpus collapses FIRST to (source, value)
    * histogram grain — the 10⁶× reducer; the dense source×value cdf
    * grid (|S|·|V| rows — both bounded: sources are curated, values
    * are char-grain lengths) takes one source-keyed window; pairs then
    * join per value with |S|²·|V| worst-case volume, all integer
    * counts. Nothing document-sized ever shuffles.
    */
  def q144KsDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val h = docs.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val grid = h.select(col("source")).distinct()
      .crossJoin(h.select(col("v")).distinct())
    val cum = grid.join(h, Seq("source", "v"), "left")
      .select(col("source"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("source")).orderBy(col("v"))))
    val tot = h.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val a = cum.join(tot, "source")
      .select(col("source").as("source_a"), col("v"),
        col("cum").as("cum_a"), col("n").as("n_a"))
    val b = cum.join(tot, "source")
      .select(col("source").as("source_b"), col("v"),
        col("cum").as("cum_b"), col("n").as("n_b"))
    a.join(b, Seq("v"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"), col("n_a"), col("n_b"))
      .agg(max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
        .as("dmax"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        floor(col("dmax").cast("double") * lit(1e6)
          / (col("n_a").cast("double") * col("n_b")) + lit(0.5)).cast("long")
          .as("ks_micro"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val q144Sql: String =
    """WITH h AS (
      |  SELECT source, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
      |grid AS (
      |  SELECT s.source, vv.v
      |  FROM (SELECT DISTINCT source FROM h) s, (SELECT DISTINCT v FROM h) vv),
      |cum AS (
      |  SELECT g.source, g.v,
      |    CAST(sum(coalesce(h.c, 0)) OVER (PARTITION BY g.source ORDER BY g.v)
      |      AS BIGINT) AS cum
      |  FROM grid g LEFT JOIN h ON g.source = h.source AND g.v = h.v),
      |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
      |p AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    ta.n AS n_a, tb.n AS n_b,
      |    max(abs(a.cum * tb.n - b.cum * ta.n)) AS dmax
      |  FROM cum a JOIN cum b ON a.v = b.v AND a.source < b.source
      |  JOIN tot ta ON ta.source = a.source
      |  JOIN tot tb ON tb.source = b.source
      |  GROUP BY 1, 2, 3, 4)
      |SELECT source_a, source_b, n_a, n_b,
      |  CAST(floor(CAST(dmax AS DOUBLE) * 1000000
      |    / (CAST(n_a AS DOUBLE) * n_b) + 0.5) AS BIGINT) AS ks_micro
      |FROM p ORDER BY source_a, source_b""".stripMargin

  // ===== q145 — PSI drift per source vs corpus ============================

  /** Population Stability Index of each source's length distribution
    * against the whole corpus over the 10 corpus deciles (q68's cut
    * points): PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) with the standard
    * +0.5-per-bucket smoothing so empty buckets stay finite — the
    * monitoring-industry drift score (rule of thumb: > 0.2 = major
    * shift) complementing q144's binning-free KS: PSI localizes WHICH
    * buckets moved; KS certifies the move. Each bucket's term is a
    * scalar of exact integer counts micro-quantized BEFORE the
    * per-source sum (the q77 discipline).
    *
    * Scale shape: cut points are one tiny aggregate broadcast back;
    * bucketing is map-side; then one (source, bucket) hash aggregate
    * and |S|·10-row arithmetic. One pass of the corpus.
    */
  def q145PsiDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val cuts = docs.agg(expr(
      "percentile(n_chars, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
      .as("qs"))
    val bucketed = docs.crossJoin(broadcast(cuts))
      .withColumn("decile", expr("1 + size(filter(qs, c -> n_chars > c))"))
      .select(col("source"), col("decile"))
    val sb = bucketed.groupBy(col("source"), col("decile")).agg(count(lit(1)).as("c_sb"))
    val grid = sb.select(col("source")).distinct()
      .crossJoin(s.range(1, 11).select(col("id").cast("int").as("decile")))
    val dense = grid.join(sb, Seq("source", "decile"), "left")
      .select(col("source"), col("decile"), coalesce(col("c_sb"), lit(0L)).as("c_sb"))
    val cb = dense.groupBy(col("decile")).agg(sum(col("c_sb")).as("c_b"))
    val ns = dense.groupBy(col("source")).agg(sum(col("c_sb")).as("n_s"))
    val n = docs.agg(count(lit(1)).as("n_total"))
    dense.join(broadcast(cb), "decile").join(broadcast(ns), "source")
      .crossJoin(broadcast(n))
      // smoothed shares: p = (c_sb + 0.5)/(n_s + 5), q = (c_b + 0.5)/(n_total + 5)
      .withColumn("p", (col("c_sb") + lit(0.5)) / (col("n_s") + lit(5.0)))
      .withColumn("q", (col("c_b") + lit(0.5)) / (col("n_total") + lit(5.0)))
      .withColumn("term_micro",
        floor((col("p") - col("q")) * log(col("p") / col("q")) * lit(1e6) + lit(0.5))
          .cast("long"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"), sum(col("term_micro")).as("psi_micro"))
      .orderBy(col("source"))
  }

  val q145Sql: String =
    """WITH c AS (
      |  SELECT quantile_cont(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
      |  FROM documents),
      |b AS (
      |  SELECT d.source,
      |    CAST(1 + len(list_filter(c.qs, q -> d.n_chars > q)) AS INTEGER) AS decile
      |  FROM documents d, c),
      |sb AS (SELECT source, decile, count(*) AS c_sb FROM b GROUP BY 1, 2),
      |grid AS (
      |  SELECT s.source, dd.decile
      |  FROM (SELECT DISTINCT source FROM sb) s,
      |       (SELECT CAST(unnest(range(1, 11)) AS INTEGER) AS decile) dd),
      |dense AS (
      |  SELECT g.source, g.decile, coalesce(sb.c_sb, 0) AS c_sb
      |  FROM grid g LEFT JOIN sb ON g.source = sb.source AND g.decile = sb.decile),
      |cb AS (SELECT decile, CAST(sum(c_sb) AS BIGINT) AS c_b FROM dense GROUP BY 1),
      |ns AS (SELECT source, CAST(sum(c_sb) AS BIGINT) AS n_s FROM dense GROUP BY 1),
      |nt AS (SELECT count(*) AS n_total FROM documents),
      |t AS (
      |  SELECT d.source, ns.n_s,
      |    CAST(floor((((CAST(d.c_sb AS DOUBLE) + 0.5) / (CAST(ns.n_s AS DOUBLE) + 5.0))
      |        - ((CAST(cb.c_b AS DOUBLE) + 0.5) / (CAST(nt.n_total AS DOUBLE) + 5.0)))
      |      * ln(((CAST(d.c_sb AS DOUBLE) + 0.5) / (CAST(ns.n_s AS DOUBLE) + 5.0))
      |        / ((CAST(cb.c_b AS DOUBLE) + 0.5) / (CAST(nt.n_total AS DOUBLE) + 5.0)))
      |      * 1000000 + 0.5) AS BIGINT) AS term_micro
      |  FROM dense d JOIN cb USING (decile) JOIN ns ON d.source = ns.source, nt)
      |SELECT source, max(n_s) AS n_docs,
      |  CAST(sum(term_micro) AS BIGINT) AS psi_micro
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  // ===== q155 — token-budget waterfilling across sources ==================

  /** The mixture-planning allocator: split a total token budget
    * (half the corpus here) across sources by WATERFILLING — every
    * source gets an equal share except those whose capacity is below
    * it, which are taken whole and their leftover redistributed — the
    * max-min-fair allocation (the standard answer to "cap the big
    * crawls without starving the small curated sets"). Entirely exact
    * integer arithmetic: sources rank by (capacity, name); a source is
    * fully-satisfiable iff cap·(remaining sources) + prefix ≤ B
    * (monotone in rank, so the satisfied set is a prefix); the rest
    * share level = (B − P_j) div (S − j) with the mod-remainder going
    * to the first `rem` unsatisfied sources. Σ alloc ≡ min(B, Σ cap)
    * by construction, and alloc ≤ cap per source (integer argument in
    * the Scaladoc of the spec).
    *
    * Scale shape: capacities are one map-side token-count aggregate
    * (the 10⁶× reducer); everything after runs on the |S|-row source
    * relation (windows over a bounded tiny relation — the q142-block
    * argument). One pass of the corpus.
    */
  def q155BudgetWaterfill(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val caps = docs.groupBy(col("source"))
      .agg(sum(graft.text.TextFunctions.tokenCount(col("text")).cast("long"))
        .as("cap"))
    val byCap = Window.orderBy(col("cap"), col("source"))
    val ranked = caps
      .crossJoin(broadcast(caps.agg(sum(col("cap")).as("tot"),
        count(lit(1)).as("ns"))))
      .withColumn("b", expr("tot div 2"))
      .withColumn("k", row_number().over(byCap))
      .withColumn("pk", sum(col("cap")).over(byCap))
      .withColumn("sat",
        col("cap") * (col("ns") - col("k") + 1) + (col("pk") - col("cap"))
          <= col("b"))
    val j = ranked.agg(
      coalesce(max(when(col("sat"), col("k"))), lit(0L)).as("j"),
      coalesce(max(when(col("sat"), col("pk"))), lit(0L)).as("pj"))
    ranked.crossJoin(broadcast(j))
      .withColumn("lvl", expr("(b - pj) div (ns - j)"))
      .withColumn("rem", expr("(b - pj) % (ns - j)"))
      .select(col("source"), col("cap").as("cap_tokens"), col("b").as("budget"),
        when(col("k") <= col("j"), col("cap"))
          .otherwise(col("lvl")
            + when(col("k") - col("j") <= col("rem"), 1L).otherwise(0L))
          .as("alloc_tokens"))
      .orderBy(col("source"))
  }

  val q155Sql: String =
    """WITH caps AS (
      |  SELECT source,
      |    CAST(sum(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |      t -> t <> ''))) AS BIGINT) AS cap
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(cap) AS BIGINT) AS tot, count(*) AS ns FROM caps),
      |r AS (
      |  SELECT source, cap, tot // 2 AS b, ns,
      |    row_number() OVER (ORDER BY cap, source) AS k,
      |    CAST(sum(cap) OVER (ORDER BY cap, source ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS pk
      |  FROM caps, t),
      |rs AS (
      |  SELECT *, cap * (ns - k + 1) + (pk - cap) <= b AS sat FROM r),
      |j AS (
      |  SELECT coalesce(max(CASE WHEN sat THEN k END), 0) AS j,
      |    coalesce(max(CASE WHEN sat THEN pk END), 0) AS pj
      |  FROM rs)
      |SELECT source, cap AS cap_tokens, b AS budget,
      |  CASE WHEN k <= j.j THEN cap
      |       ELSE (b - j.pj) // (ns - j.j)
      |         + CASE WHEN k - j.j <= (b - j.pj) % (ns - j.j) THEN 1 ELSE 0 END
      |  END AS alloc_tokens
      |FROM rs, j ORDER BY source""".stripMargin

  // ===== q163 — cross-source quantile normalization ========================

  /** Quantile-normalize document lengths across sources: each document's
    * length is replaced by the GLOBAL length at its within-source rank
    * position (index ceil(r·N/n_s) of the globally sorted lengths) — the
    * standard trick for making per-source score distributions comparable
    * before a shared threshold is applied (batch-effect removal,
    * microarray-style). Everything is rank arithmetic on exact integers:
    * row_number ranks with doc_id tiebreak, integer-ceiling index map,
    * one equi-join to look up the target value. Bit-reproducible.
    *
    * Scale shape: the per-source rank window shuffles once on source;
    * the global rank is a single-partition sort — the honest cost of
    * EXACT quantile mapping, accepted here like q63's ntile; the
    * declared 100-TB swap is q68's shape (broadcast approx cut points,
    * map-side bucket lookup, bucket-grain normalization). The lookup
    * join keys on the dense integer index — uniform, skew-free.
    */
  def q163QuantileNormalize(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    val bySrc = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    val ranked = docs
      .withColumn("r", row_number().over(bySrc).cast("long"))
      .withColumn("n_s",
        count(lit(1)).over(Window.partitionBy(col("source"))).cast("long"))
      .crossJoin(broadcast(total))
      .withColumn("g_idx", expr("(r * n_total + n_s - 1) div n_s"))
    val global = docs
      .select(col("n_chars").as("norm_chars"),
        row_number().over(Window.orderBy(col("n_chars"), col("doc_id")))
          .cast("long").as("g_idx"))
    ranked.join(global, Seq("g_idx"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("norm_chars"))
      .orderBy(col("doc_id"))
  }

  val q163Sql: String =
    """WITH t AS (SELECT count(*) AS n_total FROM documents),
      |ranked AS (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
      |    count(*) OVER (PARTITION BY source) AS n_s
      |  FROM documents),
      |g AS (
      |  SELECT n_chars AS norm_chars,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS g_idx
      |  FROM documents)
      |SELECT doc_id, source, ranked.n_chars, norm_chars
      |FROM ranked, t
      |JOIN g ON g.g_idx = (r * n_total + n_s - 1) // n_s
      |ORDER BY doc_id""".stripMargin

  // ===== q166 — hapax legomena vocabulary report ==========================

  /** Per-language vocabulary concentration: total tokens, vocabulary
    * size, hapax legomena (tokens occurring exactly once) and dis
    * legomena (exactly twice), with the hapax share of the vocabulary
    * in micro. Complements q130's Zipf slope with the head-vs-tail
    * numbers corpus linguists actually quote — a high hapax ratio
    * flags OCR noise / tokenizer damage; a collapsing one flags
    * boilerplate.
    *
    * Scale shape: token explode (codegen'd shingle path at n=1) →
    * one hash-aggregate at (lang, token) grain → one at lang grain.
    * The token relation is the big one and it shuffles once, on the
    * uniform (lang, token) hash.
    */
  def q166HapaxReport(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.MinHashLSH.shingleRows
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val toks = shingleRows(docs.select(col("doc_id"), col("text")),
        "doc_id", "text", n = 1)
      .filter(length(col("sh")) > 0)
      .join(docs.select(col("doc_id").as("sid"), col("lang")), Seq("sid"))
    val freq = toks.groupBy(col("lang"), col("sh"))
      .agg(count(lit(1)).as("c"))
    freq.groupBy(col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("dis"))
      .withColumn("hapax_ratio_micro", expr("(hapax * 1000000) div vocab"))
      .orderBy(col("lang"))
  }

  val q166Sql: String =
    """WITH toks AS (
      |  SELECT lang, unnest(list_filter(
      |    regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS tok
      |  FROM documents),
      |f AS (SELECT lang, tok, count(*) AS c FROM toks GROUP BY 1, 2)
      |SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS vocab,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
      |  (CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
      |    // count(*) AS hapax_ratio_micro
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ===== q168 — source/language mutual-information profile ================

  /** How much does knowing the source tell you about the language (and
    * vice versa)? Entropies H(source), H(lang) and their mutual
    * information over the document metadata, in micro-nats, plus the
    * normalized MI (MI / min(H)) — the one-number answer to "are my
    * sources language-siloed?" that a mixture designer reads before
    * stratifying. Per-cell and per-marginal terms are quantized with
    * the q124 discipline (floor(x·1e6+0.5) on a scalar of exact
    * integer counts, concordant across engines) BEFORE the sum; the
    * normalized ratio divides the two already-quantized sums.
    *
    * Scale shape: one (source, lang) hash aggregate — cells bounded by
    * |sources|·|langs|, marginals derived from the cells, everything
    * after the first aggregate is dashboard-sized. One shuffle.
    */
  def q168MiProfile(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.load(s, dir, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c_sl"))
    val bySrc = cells.groupBy(col("source")).agg(sum(col("c_sl")).as("c_s"))
    val byLang = cells.groupBy(col("lang")).agg(sum(col("c_sl")).as("c_l"))
    val n = cells.agg(sum(col("c_sl")).as("n_docs"))
    val hs = bySrc.crossJoin(broadcast(n))
      .select(floor((col("c_s").cast("double") / col("n_docs"))
        * -log(col("c_s").cast("double") / col("n_docs")) * 1e6 + lit(0.5))
        .cast("long").as("t"))
      .agg(sum(col("t")).as("h_source_micro"))
    val hl = byLang.crossJoin(broadcast(n))
      .select(floor((col("c_l").cast("double") / col("n_docs"))
        * -log(col("c_l").cast("double") / col("n_docs")) * 1e6 + lit(0.5))
        .cast("long").as("t"))
      .agg(sum(col("t")).as("h_lang_micro"))
    val mi = cells.join(broadcast(bySrc), Seq("source"))
      .join(broadcast(byLang), Seq("lang"))
      .crossJoin(broadcast(n))
      .select(floor((col("c_sl").cast("double") / col("n_docs"))
        * log((col("c_sl").cast("double") * col("n_docs"))
          / (col("c_s").cast("double") * col("c_l"))) * 1e6 + lit(0.5))
        .cast("long").as("t"))
      .agg(sum(col("t")).as("mi_micro"))
    // MI is mathematically >= 0; per-term rounding can leave a tiny
    // negative residue, clamped so the ratio's integer division is
    // floor==truncate in both engines
    n.crossJoin(hs).crossJoin(hl).crossJoin(mi)
      .select(col("n_docs"), col("h_source_micro"), col("h_lang_micro"),
        greatest(col("mi_micro"), lit(0L)).as("mi_micro"))
      .select(col("n_docs"), col("h_source_micro"), col("h_lang_micro"),
        col("mi_micro"),
        expr("(mi_micro * 1000000) div least(h_source_micro, h_lang_micro)")
          .as("nmi_micro"))
  }

  val q168Sql: String =
    """WITH cells AS (
      |  SELECT source, lang, count(*) AS c_sl FROM documents GROUP BY 1, 2),
      |s AS (SELECT source, sum(c_sl) AS c_s FROM cells GROUP BY 1),
      |l AS (SELECT lang, sum(c_sl) AS c_l FROM cells GROUP BY 1),
      |n AS (SELECT CAST(sum(c_sl) AS BIGINT) AS n_docs FROM cells),
      |hs AS (
      |  SELECT CAST(sum(CAST(floor((CAST(c_s AS DOUBLE) / n_docs)
      |    * -ln(CAST(c_s AS DOUBLE) / n_docs) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS h_source_micro
      |  FROM s, n),
      |hl AS (
      |  SELECT CAST(sum(CAST(floor((CAST(c_l AS DOUBLE) / n_docs)
      |    * -ln(CAST(c_l AS DOUBLE) / n_docs) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS h_lang_micro
      |  FROM l, n),
      |mi AS (
      |  SELECT CAST(sum(CAST(floor((CAST(c_sl AS DOUBLE) / n_docs)
      |    * ln((CAST(c_sl AS DOUBLE) * n_docs) / (CAST(c_s AS DOUBLE) * c_l))
      |    * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS mi_micro
      |  FROM cells JOIN s USING (source) JOIN l USING (lang), n)
      |SELECT n_docs, h_source_micro, h_lang_micro,
      |  greatest(mi_micro, 0) AS mi_micro,
      |  (greatest(mi_micro, 0) * 1000000)
      |    // least(h_source_micro, h_lang_micro) AS nmi_micro
      |FROM n, hs, hl, mi""".stripMargin

  // ===== q172 — Simpson/Herfindahl language-diversity index ===============

  /** Per-source language diversity as the Simpson/Herfindahl
    * concentration index H = Σ p² — EXACT rational in micro
    * ((Σc²)·1e6 div n²) — and its reciprocal, the "effective number of
    * languages" (micro, from the already-quantized H). The one-number
    * companion to q76's full breakdown: H → 1e6 means a monolingual
    * source; effective_langs ≈ k means "as diverse as k equal
    * languages". Corpus-wide row included under `(all)`.
    *
    * Scale shape: one (source, lang) hash aggregate; everything after
    * is |sources|·|langs|-sized. One shuffle, no windows, no floats.
    */
  def q172SimpsonDiversity(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select(col("source"), col("lang"))
    val cells = docs
      .unionAll(docs.select(lit("(all)").as("source"), col("lang")))
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
    cells.groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_langs"),
        sum(expr("c * c")).as("sum_c2"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        expr("(sum_c2 * 1000000) div (n_docs * n_docs)").as("herfindahl_micro"))
      .withColumn("effective_langs_micro",
        expr("cast(1000000000000 as bigint) div herfindahl_micro"))
      .orderBy(col("source"))
  }

  val q172Sql: String =
    """WITH d AS (
      |  SELECT source, lang FROM documents
      |  UNION ALL SELECT '(all)', lang FROM documents),
      |cells AS (SELECT source, lang, count(*) AS c FROM d GROUP BY 1, 2),
      |g AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs, count(*) AS n_langs,
      |    CAST(sum(c * c) AS BIGINT) AS sum_c2
      |  FROM cells GROUP BY 1)
      |SELECT source, n_docs, n_langs,
      |  (sum_c2 * 1000000) // (n_docs * n_docs) AS herfindahl_micro,
      |  CAST(1000000000000 AS BIGINT)
      |    // ((sum_c2 * 1000000) // (n_docs * n_docs)) AS effective_langs_micro
      |FROM g ORDER BY source""".stripMargin

  // ===== q177 — runs test: is the epoch schedule well-shuffled? ===========

  /** A Wald–Wolfowitz runs test over the q136 interleaved epoch
    * schedule: walking the schedule in training order, count the
    * maximal runs of is-largest-source vs rest, against the expected
    * run count for a random arrangement (1 + 2·n1·n2/n, exact
    * rational). ratio_micro ≈ 1e6 certifies the low-discrepancy
    * interleave actually mixes (a source-sorted epoch would score
    * runs = 2, ratio → 0) — the shuffle-quality audit training-order
    * bugs hide from.
    *
    * Scale shape: the schedule's own cost (two windows) plus ONE
    * global order walk (lag over the schedule order) — a schedule
    * audit is inherently a sequential read; it runs at corpus-metadata
    * grain (ids only, no text). Final rollup is one row.
    */
  def q177RunsTest(s: SparkSession, dir: String): DataFrame = {
    val sched = q136EpochSchedule(s, dir)
      .select(col("source"), col("pos_micro"), col("doc_id"))
    val top = sched.groupBy(col("source")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("source")).limit(1)
      .select(col("source").as("top_src"))
    val ord = Window.orderBy(col("pos_micro"), col("source"), col("doc_id"))
    sched.crossJoin(broadcast(top))
      .withColumn("b", when(col("source") === col("top_src"), 1L).otherwise(0L))
      .withColumn("chg",
        when(lag(col("b"), 1).over(ord).isNull
          || lag(col("b"), 1).over(ord) =!= col("b"), 1L).otherwise(0L))
      .agg(count(lit(1)).as("n"), sum(col("b")).as("n1"),
        sum(lit(1) - col("b")).as("n2"), sum(col("chg")).as("runs"))
      .select(col("n"), col("n1"), col("n2"), col("runs"),
        expr("((n + 2 * n1 * n2) * 1000000) div n").as("expected_runs_micro"),
        expr("(runs * n * 1000000) div (n + 2 * n1 * n2)").as("ratio_micro"))
  }

  val q177Sql: String =
    s"""WITH sched AS ($q136Sql),
      |top AS (
      |  SELECT source AS top_src FROM sched GROUP BY 1
      |  ORDER BY count(*) DESC, source LIMIT 1),
      |b AS (
      |  SELECT CASE WHEN source = top_src THEN 1 ELSE 0 END AS b,
      |    pos_micro, source, doc_id
      |  FROM sched, top),
      |c AS (
      |  SELECT b, CASE WHEN lag(b) OVER w IS NULL OR lag(b) OVER w <> b
      |    THEN 1 ELSE 0 END AS chg
      |  FROM b WINDOW w AS (ORDER BY pos_micro, source, doc_id)),
      |a AS (
      |  SELECT count(*) AS n, CAST(sum(b) AS BIGINT) AS n1,
      |    CAST(sum(1 - b) AS BIGINT) AS n2, CAST(sum(chg) AS BIGINT) AS runs
      |  FROM c)
      |SELECT n, n1, n2, runs,
      |  ((n + 2 * n1 * n2) * 1000000) // n AS expected_runs_micro,
      |  (runs * n * 1000000) // (n + 2 * n1 * n2) AS ratio_micro
      |FROM a""".stripMargin

  // ===== q181 — Hill tail-index of the length distribution ================

  /** How heavy is the document-length tail? The Hill estimator over the
    * top-k = 100 order statistics: H = mean of ln(x_i/x_k) for the k−1
    * largest values against the k-th — the standard power-law tail
    * gauge (α ≈ 1/H; H near 0 means a thin tail, large H means a few
    * giant documents dominate storage and packing). Per-term logs are
    * quantized (floor(·1e6+0.5), deterministic scalars of the two
    * integers) BEFORE the sum; the mean divides the quantized sum.
    *
    * Scale shape: the ONLY global operation is top-100 — planned as
    * TakeOrderedAndProject (per-partition heaps, k rows to the driver
    * stage), never a full sort. Everything after is 100-row local work
    * with a 1-row broadcast for x_k.
    */
  def q181HillTailIndex(s: SparkSession, dir: String): DataFrame = {
    val k = 100
    val top = Tables.load(s, dir, "documents")
      .select(col("n_chars")).orderBy(col("n_chars").desc).limit(k)
    val xk = top.agg(min(col("n_chars")).as("x_k"), count(lit(1)).as("k"))
    top.crossJoin(broadcast(xk))
      .select(col("x_k"), col("k"),
        floor(log(col("n_chars").cast("double") / col("x_k")) * lit(1e6)
          + lit(0.5)).cast("long").as("t"))
      .groupBy(col("k"), col("x_k"))
      .agg(sum(col("t")).as("sum_log_micro"))
      .select(col("k"), col("x_k"),
        expr("sum_log_micro div (k - 1)").as("hill_micro"))
  }

  val q181Sql: String =
    """WITH top AS (
      |  SELECT n_chars FROM documents ORDER BY n_chars DESC LIMIT 100),
      |xk AS (SELECT min(n_chars) AS x_k, count(*) AS k FROM top),
      |t AS (
      |  SELECT k, x_k,
      |    CAST(floor(ln(CAST(n_chars AS DOUBLE) / x_k) * 1000000 + 0.5)
      |      AS BIGINT) AS t
      |  FROM top, xk)
      |SELECT k, x_k,
      |  CAST(sum(t) AS BIGINT) // (k - 1) AS hill_micro
      |FROM t GROUP BY k, x_k""".stripMargin

  // ===== q182 — context-window fit CDF per source =========================

  /** What fraction of each source fits a context window? Per source,
    * the share of documents whose BPE-estimate token count is ≤ 128 /
    * 512 / 2048 — the first question sequence-packing (q41) and
    * truncation-loss reviews ask. Exact conditional counts, micro
    * shares by integer division; thresholds are columns so the table
    * reads as a CDF sampled at the window sizes that matter.
    *
    * Scale shape: token counting is map-side codegen; ONE source-grain
    * hash aggregate carries four conditional sums. One pass.
    */
  def q182ContextFitCdf(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("source"),
        graft.text.TextFunctions.bpeTokenEstimate(col("text")).cast("long")
          .as("t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("t") <= 128, 1L).otherwise(0L)).as("n_128"),
        sum(when(col("t") <= 512, 1L).otherwise(0L)).as("n_512"),
        sum(when(col("t") <= 2048, 1L).otherwise(0L)).as("n_2048"))
      .select(col("source"), col("n_docs"),
        expr("(n_128 * 1000000) div n_docs").as("fit128_micro"),
        expr("(n_512 * 1000000) div n_docs").as("fit512_micro"),
        expr("(n_2048 * 1000000) div n_docs").as("fit2048_micro"))
      .orderBy(col("source"))

  val q182Sql: String =
    """WITH d AS (
      |  SELECT source,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
      |      AS BIGINT) AS t
      |  FROM documents),
      |g AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(CASE WHEN t <= 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_128,
      |    CAST(sum(CASE WHEN t <= 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_512,
      |    CAST(sum(CASE WHEN t <= 2048 THEN 1 ELSE 0 END) AS BIGINT) AS n_2048
      |  FROM d GROUP BY 1)
      |SELECT source, n_docs,
      |  (n_128 * 1000000) // n_docs AS fit128_micro,
      |  (n_512 * 1000000) // n_docs AS fit512_micro,
      |  (n_2048 * 1000000) // n_docs AS fit2048_micro
      |FROM g ORDER BY source""".stripMargin

  // ===== q192 — distinctive vocabulary per source (chi-square) ============

  /** The top-5 terms most OVER-represented in each source relative to
    * the corpus — per-(source, term) chi-square association, positive
    * cells only — the "what makes this source different" readout that
    * names a subcorpus (q124 scores HOW FAR a source drifts; this
    * names the terms responsible). The statistic is computed in double
    * from exact integer counts in one fixed operand order and
    * micro-quantized per cell (the q124 discipline), so both engines
    * agree bit-for-bit; ranking ties break on the term.
    *
    * Scale shape: one (source, w) hash aggregate; corpus term totals
    * join on the term (vocabulary-sized, q56's no-broadcast argument);
    * source totals and N broadcast. The top-5 rides the bounded
    * `topk_by_str` aggregate ([[graft.functions.TopKStrAgg]] —
    * chi2-desc, term-ascending tiebreak, window-identical by
    * TopKStrAggSpec), so a hot source ships ≤ 5 entries per split
    * through the exchange instead of sorting its whole vocabulary on
    * one reducer; the winners' (o, chi2) ride back in via one
    * 5-rows-per-source equi-join against the checkpointed scored
    * relation (evaluated once, not once per consumer). chi2_micro is
    * exact in double below 2^53; between 2^53 and Long.MaxValue
    * (~9.2e18) the long is representable but the double ranking loses
    * low bits, so ordering/ties there could diverge from an exact
    * long comparison — that band needs a corpus whose chi2·1e6
    * exceeds 9e15, far beyond this data, and the term-ascending
    * tiebreak keeps the output deterministic either way.
    */
  def q192DistinctiveTerms(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TopKStrAgg.register(s)
    // checkpointed: source totals, term totals and the scoring join
    // all read this relation — one tokenize pass, not three (the q124
    // pattern)
    val sw = MinHashLSH.shingleRows(
        Tables.load(s, dir, "documents"), "source", "text", n = 1)
      .filter(col("sh") =!= "")
      .groupBy(col("sid").as("source"), col("sh").as("w"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val srcTot = sw.groupBy(col("source")).agg(sum(col("o")).as("rt"))
    val wTot = sw.groupBy(col("w")).agg(sum(col("o")).as("ct"))
    val n = srcTot.agg(sum(col("rt")).as("nd"))
    val scored = sw.join(wTot, Seq("w"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(n))
      .filter(expr("o * nd > rt * ct")) // over-represented cells only
      .withColumn("chi2_micro", expr(
        "cast(floor(((cast(o as double) * nd - cast(rt as double) * ct)" +
          " * (cast(o as double) * nd - cast(rt as double) * ct))" +
          " / (cast(nd as double) * rt * ct) * 1000000 + 0.5) as bigint)"))
      .localCheckpoint(true)
    scored
      .groupBy(col("source"))
      .agg(graft.functions.TopKStrAgg.topkByStr(
        col("chi2_micro").cast("double"), col("w"), 5, asc = false).as("tk"))
      .select(col("source"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("source"), (col("pos") + 1).as("rk"), col("e.key").as("w"))
      .join(scored.select(col("source"), col("w"), col("o"), col("chi2_micro")),
        Seq("source", "w"))
      .select(col("source"), col("rk"), col("w").as("term"), col("o"),
        col("chi2_micro"))
      .orderBy(col("source"), col("rk"))
  }

  val q192Sql: String =
    """WITH toks AS (
      |  SELECT source,
      |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |sw AS (SELECT source, w, count(*) AS o FROM toks WHERE w <> '' GROUP BY 1, 2),
      |st AS (SELECT source, CAST(sum(o) AS BIGINT) AS rt FROM sw GROUP BY 1),
      |wt AS (SELECT w, CAST(sum(o) AS BIGINT) AS ct FROM sw GROUP BY 1),
      |n AS (SELECT CAST(sum(rt) AS BIGINT) AS nd FROM st),
      |scored AS (
      |  SELECT sw.source, sw.w, sw.o,
      |    CAST(floor(((CAST(o AS DOUBLE) * nd - CAST(rt AS DOUBLE) * ct)
      |      * (CAST(o AS DOUBLE) * nd - CAST(rt AS DOUBLE) * ct))
      |      / (CAST(nd AS DOUBLE) * rt * ct) * 1000000 + 0.5) AS BIGINT)
      |      AS chi2_micro
      |  FROM sw JOIN wt USING (w) JOIN st USING (source), n
      |  WHERE o * nd > rt * ct),
      |r AS (
      |  SELECT source, w, o, chi2_micro,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY chi2_micro DESC, w) AS rk
      |  FROM scored)
      |SELECT source, CAST(rk AS INTEGER) AS rk, w AS term, o, chi2_micro
      |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin

  // ===== q196 — Jensen–Shannon divergence between corpus snapshots ========

  /** The bounded, symmetric member of the drift family: JSD between
    * the language mixes of two corpus snapshots (q152/q64's overlap
    * convention: A = first 80% of doc ids, B = last 80%) — KL (q124)
    * explodes on vanishing support and is asymmetric; JSD ∈ [0, ln 2]
    * is the number a dashboard can threshold. Per-language terms
    * p·ln(p/m) are computed in double from exact counts in one fixed
    * operand order and micro-quantized BEFORE summation (the q124
    * discipline); absent languages contribute 0 exactly.
    *
    * Scale shape: two ≤|langs| hash aggregates full-outer-joined at
    * language grain, 1-row totals broadcast. Everything after the
    * first aggregates is dashboard-sized.
    */
  def q196JsdDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val maxId = docs.agg(max(col("doc_id")).as("m"))
    val base = docs.crossJoin(broadcast(maxId))
    val aCnt = base.filter(col("doc_id") <= expr("m * 8 div 10"))
      .groupBy(col("lang")).agg(count(lit(1)).as("ca"))
    val bCnt = base.filter(col("doc_id") > expr("m * 2 div 10"))
      .groupBy(col("lang")).agg(count(lit(1)).as("cb"))
    val na = aCnt.agg(sum(col("ca")).as("na"))
    val nb = bCnt.agg(sum(col("cb")).as("nb"))
    val joined = aCnt.join(bCnt, Seq("lang"), "full_outer")
      .select(col("lang"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .withColumn("pa", expr("cast(ca as double) / na"))
      .withColumn("pb", expr("cast(cb as double) / nb"))
      .withColumn("mm", expr("(pa + pb) / 2"))
      .select(
        expr("case when ca > 0 then cast(floor(pa * ln(pa / mm) * 1000000 + 0.5)" +
          " as bigint) else 0 end").as("ta"),
        expr("case when cb > 0 then cast(floor(pb * ln(pb / mm) * 1000000 + 0.5)" +
          " as bigint) else 0 end").as("tb"))
    // both KL halves are >= 0 mathematically; clamp the per-term
    // rounding residue so the halving division is floor==truncate in
    // both engines
    joined.agg(greatest(sum(col("ta")), lit(0L)).as("kl_a_micro"),
        greatest(sum(col("tb")), lit(0L)).as("kl_b_micro"))
      .select(col("kl_a_micro"), col("kl_b_micro"),
        expr("(kl_a_micro + kl_b_micro) div 2").as("jsd_micro"))
  }

  val q196Sql: String =
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
      |a AS (
      |  SELECT lang, count(*) AS ca FROM documents, mx
      |  WHERE doc_id <= m * 8 // 10 GROUP BY 1),
      |b AS (
      |  SELECT lang, count(*) AS cb FROM documents, mx
      |  WHERE doc_id > m * 2 // 10 GROUP BY 1),
      |na AS (SELECT CAST(sum(ca) AS BIGINT) AS na FROM a),
      |nb AS (SELECT CAST(sum(cb) AS BIGINT) AS nb FROM b),
      |j AS (
      |  SELECT coalesce(a.lang, b.lang) AS lang,
      |    coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      |  FROM a FULL OUTER JOIN b ON a.lang = b.lang),
      |t AS (
      |  SELECT
      |    CASE WHEN ca > 0 THEN CAST(floor((CAST(ca AS DOUBLE) / na)
      |      * ln((CAST(ca AS DOUBLE) / na)
      |        / ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2))
      |      * 1000000 + 0.5) AS BIGINT) ELSE 0 END AS ta,
      |    CASE WHEN cb > 0 THEN CAST(floor((CAST(cb AS DOUBLE) / nb)
      |      * ln((CAST(cb AS DOUBLE) / nb)
      |        / ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2))
      |      * 1000000 + 0.5) AS BIGINT) ELSE 0 END AS tb
      |  FROM j, na, nb)
      |SELECT greatest(CAST(sum(ta) AS BIGINT), 0) AS kl_a_micro,
      |  greatest(CAST(sum(tb) AS BIGINT), 0) AS kl_b_micro,
      |  (greatest(CAST(sum(ta) AS BIGINT), 0)
      |    + greatest(CAST(sum(tb) AS BIGINT), 0)) // 2 AS jsd_micro
      |FROM t""".stripMargin

  // ========================================================================

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q196_jsd_drift" -> (q196JsdDrift _),
    "q192_distinctive_terms" -> (q192DistinctiveTerms _),
    "q181_hill_tail_index" -> (q181HillTailIndex _),
    "q182_context_fit_cdf" -> (q182ContextFitCdf _),
    "q177_runs_test" -> (q177RunsTest _),
    "q172_simpson_diversity" -> (q172SimpsonDiversity _),
    "q168_mi_profile" -> (q168MiProfile _),
    "q166_hapax_report" -> (q166HapaxReport _),
    "q163_quantile_normalize" -> (q163QuantileNormalize _),
    "q155_budget_waterfill" -> (q155BudgetWaterfill _),
    "q145_psi_drift" -> (q145PsiDrift _),
    "q144_ks_drift" -> (q144KsDrift _),
    "q142_vocab_coverage" -> (q142VocabCoverage _),
    "q141_matched_sample" -> (q141MatchedSample _),
    "q136_epoch_schedule" -> (q136EpochSchedule _),
    "q130_zipf_fit" -> (q130ZipfFit _),
    "q124_kl_drift" -> (q124KlDrift _),
    "q116_weighted_sample" -> (q116WeightedSample _),
    "q117_pmi_collocations" -> (q117PmiCollocations _),
    "q95_sparse_similarity" -> (q95SparseSimilarity _),
    "q54_boilerplate_ngrams" -> (q54BoilerplateNgrams _),
    "q55_stratified_sample" -> (q55StratifiedSample _),
    "q99_stratified_exact_k" -> (q99StratifiedExactK _),
    "q08_token_budget_cap" -> (q08TokenBudgetCap _),
    "q56_tfidf_top_terms" -> (q56TfIdfTopTerms _),
    "q57_hopping_windows" -> (q57HoppingWindows _),
    "q58_source_scorecard" -> (q58SourceScorecard _),
    "q59_source_cap" -> (q59SourceCap _))

  val oracleSql: Map[String, String] = Map(
    "q196_jsd_drift" -> q196Sql,
    "q192_distinctive_terms" -> q192Sql,
    "q181_hill_tail_index" -> q181Sql,
    "q182_context_fit_cdf" -> q182Sql,
    "q177_runs_test" -> q177Sql,
    "q172_simpson_diversity" -> q172Sql,
    "q168_mi_profile" -> q168Sql,
    "q166_hapax_report" -> q166Sql,
    "q163_quantile_normalize" -> q163Sql,
    "q155_budget_waterfill" -> q155Sql,
    "q145_psi_drift" -> q145Sql,
    "q144_ks_drift" -> q144Sql,
    "q141_matched_sample" -> q141Sql,
    "q142_vocab_coverage" -> q142Sql,
    "q136_epoch_schedule" -> q136Sql,
    "q130_zipf_fit" -> q130Sql,
    "q124_kl_drift" -> q124Sql,
    "q116_weighted_sample" -> q116Sql,
    "q117_pmi_collocations" -> q117Sql,
    "q95_sparse_similarity" -> q95Sql,
    "q54_boilerplate_ngrams" -> q54Sql,
    "q55_stratified_sample" -> q55Sql,
    "q99_stratified_exact_k" -> q99Sql,
    "q08_token_budget_cap" -> q08Sql,
    "q56_tfidf_top_terms" -> q56Sql,
    "q57_hopping_windows" -> q57Sql,
    "q58_source_scorecard" -> q58Sql,
    "q59_source_cap" -> q59Sql)
}
