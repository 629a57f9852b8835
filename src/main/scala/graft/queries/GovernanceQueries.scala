package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-governance audits: the certification queries a corpus release
  * runs AFTER curation — metadata-consistency (functional dependencies),
  * numeric-integrity (Benford digit law), and heuristic-agreement
  * (Cohen's kappa) reports. Like q97/q153/q154 these produce small,
  * bit-reproducible audit tables from one or two passes over the
  * corpus; unlike them they certify INVARIANTS (an FD holds, two
  * quality signals agree) rather than inventory counts.
  */
object GovernanceQueries {

  // ===== q159 — functional-dependency violation audit ======================

  /** Metadata-consistency certification: does identical content carry
    * identical metadata? For each declared FD (fingerprint → lang,
    * fingerprint → source) count the content groups that violate it and
    * the documents involved. The corpus is mirrored (doc_id + 1000000,
    * the q19/q153 planting convention) modeling a re-crawl: the mirror
    * attributes every copy to source `mirror` (violating fp→source for
    * every duplicated group, by construction) and loses language
    * metadata (`und`) on an md5-keyed eighth of documents (violating
    * fp→lang for exactly those groups). Output: one row per FD with
    * group/row violation counts and a rows-in-violation basis-point
    * rate — the audit a release gate reads.
    *
    * Scale shape: one hash-aggregate on the 32-byte fingerprint
    * computing per-group row and distinct-metadata counts (map-side
    * partials; the text itself never shuffles — md5 is computed in the
    * scan projection), then a single-row aggregate exploded to the
    * two-FD report. One exchange.
    */
  def q159FdViolations(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val mirror = docs
      .withColumn("bucket", PipelineQueries.md5Bucket)
      .select(
        (col("doc_id") + 1000000).as("doc_id"),
        col("text"),
        when(col("bucket") < 32, lit("und")).otherwise(col("lang")).as("lang"),
        lit("mirror").as("source"))
    val groups = docs.union(mirror)
      .groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("lang")).as("n_lang"),
        countDistinct(col("source")).as("n_source"))
    val summary = groups.agg(
      count(lit(1)).as("n_keys"),
      sum(col("n_rows")).as("n_rows_total"),
      sum(when(col("n_rows") > 1, 1L).otherwise(0L)).as("n_multi_keys"),
      sum(when(col("n_lang") > 1, 1L).otherwise(0L)).as("vk_lang"),
      sum(when(col("n_lang") > 1, col("n_rows")).otherwise(0L)).as("vr_lang"),
      sum(when(col("n_source") > 1, 1L).otherwise(0L)).as("vk_source"),
      sum(when(col("n_source") > 1, col("n_rows")).otherwise(0L)).as("vr_source"))
    summary
      .select(col("n_keys"), col("n_rows_total"), col("n_multi_keys"),
        explode(array(
          struct(lit("fp_to_lang").as("fd_name"),
            col("vk_lang").as("n_violating_keys"),
            col("vr_lang").as("n_violating_rows")),
          struct(lit("fp_to_source").as("fd_name"),
            col("vk_source").as("n_violating_keys"),
            col("vr_source").as("n_violating_rows")))).as("fd"))
      .select(col("fd.fd_name").as("fd_name"), col("n_keys"),
        col("n_multi_keys"), col("fd.n_violating_keys").as("n_violating_keys"),
        col("fd.n_violating_rows").as("n_violating_rows"),
        expr("(fd.n_violating_rows * 10000) div n_rows_total")
          .as("violation_bps"))
      .orderBy(col("fd_name"))
  }

  val q159Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text, lang, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text,
      |    CASE WHEN (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) < 32
      |      THEN 'und' ELSE lang END,
      |    'mirror'
      |  FROM documents),
      |g AS (
      |  SELECT md5(text) AS fp, count(*) AS n_rows,
      |    count(DISTINCT lang) AS n_lang, count(DISTINCT source) AS n_source
      |  FROM corpus GROUP BY 1),
      |s AS (
      |  SELECT count(*) AS n_keys, CAST(sum(n_rows) AS BIGINT) AS n_rows_total,
      |    CAST(sum(CASE WHEN n_rows > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_keys,
      |    CAST(sum(CASE WHEN n_lang > 1 THEN 1 ELSE 0 END) AS BIGINT) AS vk_lang,
      |    CAST(sum(CASE WHEN n_lang > 1 THEN n_rows ELSE 0 END) AS BIGINT) AS vr_lang,
      |    CAST(sum(CASE WHEN n_source > 1 THEN 1 ELSE 0 END) AS BIGINT) AS vk_source,
      |    CAST(sum(CASE WHEN n_source > 1 THEN n_rows ELSE 0 END) AS BIGINT) AS vr_source
      |  FROM g)
      |SELECT 'fp_to_lang' AS fd_name, n_keys, n_multi_keys,
      |  vk_lang AS n_violating_keys, vr_lang AS n_violating_rows,
      |  (vr_lang * 10000) // n_rows_total AS violation_bps FROM s
      |UNION ALL
      |SELECT 'fp_to_source', n_keys, n_multi_keys, vk_source, vr_source,
      |  (vr_source * 10000) // n_rows_total FROM s
      |ORDER BY fd_name""".stripMargin

  // ===== q160 — Benford first-digit integrity test =========================

  /** Numeric-integrity screening: the first-significant-digit
    * distribution of order totals against Benford's law, the classic
    * fabricated-data detector. Expected shares are hardcoded
    * micro-literals (floor(log10(1+1/d)·1e6+0.5) — constants, so the
    * two engines cannot disagree on a transcendental), observed shares
    * are exact integer division, and the chi-square contribution per
    * digit is computed entirely in micro-integers. TPC-H totals are
    * uniform-ish, NOT Benford — the audit faithfully reports the large
    * deviations, which is the point: the operator detects, the caller
    * judges.
    *
    * Scale shape: digit extraction is a map-side string op on the
    * scan; a 9-group hash aggregate plus a broadcast 1-row total.
    * One pass, one tiny exchange.
    */
  def q160BenfordDigits(s: SparkSession, dir: String): DataFrame = {
    val expected =
      "CASE d WHEN '1' THEN 301030L WHEN '2' THEN 176091L WHEN '3' THEN 124939L" +
        " WHEN '4' THEN 96910L WHEN '5' THEN 79181L WHEN '6' THEN 66947L" +
        " WHEN '7' THEN 57992L WHEN '8' THEN 51153L ELSE 45757L END"
    val byDigit = Tables.load(s, dir, "orders")
      .select(substring(expr("cast(cast(floor(o_totalprice) as bigint) as string)"),
        1, 1).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
    val total = byDigit.agg(sum(col("n")).as("n_total"))
    byDigit.crossJoin(broadcast(total))
      .withColumn("obs_micro", expr("(n * 1000000) div n_total"))
      .withColumn("exp_micro", expr(expected))
      .select(col("d").as("digit"), col("n"), col("obs_micro"), col("exp_micro"),
        expr("((obs_micro - exp_micro) * (obs_micro - exp_micro)) div exp_micro")
          .as("chi2_contrib_micro"))
      .orderBy(col("digit"))
  }

  val q160Sql: String =
    """WITH b AS (
      |  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS d,
      |    count(*) AS n
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM b),
      |m AS (
      |  SELECT d AS digit, n, (n * 1000000) // n_total AS obs_micro,
      |    CASE d WHEN '1' THEN 301030 WHEN '2' THEN 176091 WHEN '3' THEN 124939
      |      WHEN '4' THEN 96910 WHEN '5' THEN 79181 WHEN '6' THEN 66947
      |      WHEN '7' THEN 57992 WHEN '8' THEN 51153 ELSE 45757 END AS exp_micro
      |  FROM b, t)
      |SELECT digit, n, obs_micro, exp_micro,
      |  ((obs_micro - exp_micro) * (obs_micro - exp_micro)) // exp_micro
      |    AS chi2_contrib_micro
      |FROM m ORDER BY digit""".stripMargin

  // ===== q161 — Cohen's kappa between two quality heuristics ===============

  /** Heuristic-agreement certification: when two cheap quality signals
    * (a token-count gate and a length gate) are candidates for the same
    * filtering job, Cohen's kappa says whether they agree beyond what
    * their marginal rates force. The 2×2 confusion table is exact
    * integer counts; observed agreement, chance agreement, and kappa
    * are micro-quantized from those integers with integer division
    * only — bit-reproducible. One row out: the numbers an annotation
    * or filter-calibration review reads.
    *
    * Scale shape: both signals are map-side codegen'd; ONE single-row
    * aggregate over the corpus computes the whole confusion table.
    * No shuffle beyond the 1-row partial merge.
    */
  def q161KappaAgreement(s: SparkSession, dir: String): DataFrame = {
    val sig = Tables.load(s, dir, "documents")
      .select(
        when(graft.text.TextFunctions.tokenCount(col("text")) >= 20, 1L)
          .otherwise(0L).as("a"),
        when(col("n_chars") >= 120, 1L).otherwise(0L).as("b"))
    sig.agg(
        count(lit(1)).as("n"),
        sum(expr("a * b")).as("n11"),
        sum(expr("a * (1 - b)")).as("n10"),
        sum(expr("(1 - a) * b")).as("n01"),
        sum(expr("(1 - a) * (1 - b)")).as("n00"))
      .withColumn("po_micro", expr("((n11 + n00) * 1000000) div n"))
      .withColumn("pe_micro", expr(
        "(((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) * 1000000) div (n * n)"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        col("po_micro"), col("pe_micro"),
        // Sign-concordant division: kappa < 0 whenever the signals
        // agree worse than chance, and Spark `div` truncates toward
        // zero while DuckDB `//` floors — divergent by 1 on negative
        // non-exact quotients. Dividing the absolute value (trunc =
        // floor on nonnegative operands) and reapplying the sign makes
        // both engines bit-equal for either sign; values with
        // po ≥ pe (the bench corpus) are unchanged.
        expr("CASE WHEN po_micro >= pe_micro" +
          " THEN ((po_micro - pe_micro) * 1000000) div (1000000 - pe_micro)" +
          " ELSE -(((pe_micro - po_micro) * 1000000) div (1000000 - pe_micro))" +
          " END").as("kappa_micro"))
  }

  val q161Sql: String =
    """WITH sig AS (
      |  SELECT
      |    CASE WHEN len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |      t -> t <> '')) >= 20 THEN 1 ELSE 0 END AS a,
      |    CASE WHEN n_chars >= 120 THEN 1 ELSE 0 END AS b
      |  FROM documents),
      |c AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(a * b) AS BIGINT) AS n11,
      |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
      |    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
      |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      |  FROM sig),
      |m AS (
      |  SELECT n, n11, n10, n01, n00,
      |    ((n11 + n00) * 1000000) // n AS po_micro,
      |    (((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) * 1000000)
      |      // (n * n) AS pe_micro
      |  FROM c)
      |SELECT n, n11, n10, n01, n00, po_micro, pe_micro,
      |  CASE WHEN po_micro >= pe_micro
      |    THEN ((po_micro - pe_micro) * 1000000) // (1000000 - pe_micro)
      |    ELSE -(((pe_micro - po_micro) * 1000000) // (1000000 - pe_micro))
      |  END AS kappa_micro
      |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q159_fd_violations" -> (q159FdViolations _),
    "q160_benford_digits" -> (q160BenfordDigits _),
    "q161_kappa_agreement" -> (q161KappaAgreement _))

  val oracleSql: Map[String, String] = Map(
    "q159_fd_violations" -> q159Sql,
    "q160_benford_digits" -> q160Sql,
    "q161_kappa_agreement" -> q161Sql)
}
