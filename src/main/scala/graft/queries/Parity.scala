package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Exact, Tables}
import graft.medallion.ColumnNormalizer

/** Reference-parity query surface (SURVEY.md §2), re-expressed over the
  * driver's star-schema testdata per FIXTURES.md §B's mapping:
  * orders⟕customer⟕nation stands in for reviews⟕albums⟕bands.
  *
  * Every query is a pure DataFrame plan (no collect, no driver loops) and
  * every aggregate uses [[graft.core.Exact]] so results hash-match the
  * DuckDB oracle bit-for-bit. `nation` is a fixed-size dim (explicit
  * broadcast); `customer` scales with the data, so its joins are left
  * unhinted for Catalyst/AQE to choose; the fact-side shuffles are
  * single-key hash partitions that scale linearly with executors.
  */
object Parity {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** orders ⟕ customer ⟕ nation — the shared "reviews⟕albums⟕bands" spine.
    * nation is a true fixed-size dim (25 rows at any sf) → hint broadcast.
    * customer SCALES with sf (billions of rows at 100 TB), so it must NOT
    * be hint-broadcast: leave the join unhinted and let Catalyst/AQE pick —
    * broadcast at bench scale (under the threshold), shuffled hash/sort-merge
    * join at cluster scale.
    */
  private def orderSpine(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    ord
      .join(cust, ord("o_custkey") === cust("c_custkey"), "left")
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"), "left")
  }

  // ===== q01 — pricing summary (A1/A3 agg; SURVEY §2.5) ====================

  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import Exact._
    val li = t(s, dir, "lineitem")
    val one = lit(1.0).cast(DecimalType(18, 2))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        avgd(col("l_quantity")).as("avg_qty"),
        avgd(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Exact.sqlSum("l_quantity")} AS sum_qty,
       |  ${Exact.sqlSum("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       |  ${Exact.sqlAvg("l_quantity")} AS avg_qty,
       |  ${Exact.sqlAvg("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ===== q02 — grouped top-10 (A5/O5: gold.top10_by_country analogue) ======

  /** Reference pattern: sort + group_by(country).head(10)
    * (`flows/gold.py:91-93`). Spark-first: window row_number with a
    * deterministic band_id tie-break (SURVEY §7.1 D1) — a single shuffle
    * on the partition key, no global sort of the fact table.
    */
  def q02Top10PerNation(s: SparkSession, dir: String): DataFrame = {
    val counts = orderSpine(s, dir)
      .groupBy(col("n_name"), col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("order_count"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("order_count").desc, col("c_custkey"))
    counts
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select(col("n_name").as("nation"), col("c_custkey"), col("c_name"),
        col("order_count"), col("rn"))
      .orderBy(col("nation"), col("rn"))
  }

  val q02Sql: String =
    """WITH counts AS (
      |  SELECT n.n_name, c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS order_count
      |  FROM orders o
      |  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2, 3)
      |SELECT n_name AS nation, c_custkey, c_name, order_count,
      |  ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY order_count DESC, c_custkey) AS rn
      |FROM counts QUALIFY rn <= 10 ORDER BY nation, rn""".stripMargin

  // ===== q03 — per-entity stats (A3: gold.band_avg_scores analogue) ========

  private def custStats(s: SparkSession, dir: String): DataFrame = {
    import Exact._
    orderSpine(s, dir)
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(
        count(col("o_orderkey")).as("order_count"),
        avgd(col("o_totalprice")).as("avg_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        stdd(col("o_totalprice")).as("std_price"))
  }

  private val custStatsSql: String =
    s"""SELECT c.c_custkey, c.c_name, n.n_name,
       |    COUNT(o.o_orderkey) AS order_count,
       |    ${Exact.sqlAvg("o.o_totalprice")} AS avg_price,
       |    MIN(o.o_totalprice) AS min_price,
       |    MAX(o.o_totalprice) AS max_price,
       |    ${Exact.sqlStd("o.o_totalprice")} AS std_price
       |  FROM orders o
       |  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
       |  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  GROUP BY 1, 2, 3""".stripMargin

  def q03CustOrderStats(s: SparkSession, dir: String): DataFrame =
    custStats(s, dir)
      .withColumnRenamed("n_name", "nation")
      .orderBy(col("c_custkey"))

  val q03Sql: String =
    s"""WITH stats AS (
       |$custStatsSql)
       |SELECT c_custkey, c_name, n_name AS nation, order_count, avg_price,
       |  min_price, max_price, std_price
       |FROM stats ORDER BY c_custkey""".stripMargin

  // ===== q04 — normalized-name filter (gold.brazilian_bands analogue) ======

  /** lower+trim+isin over a derived column (F3, X4, X5; `flows/gold.py:117-120`). */
  def q04NationFilter(s: SparkSession, dir: String): DataFrame =
    custStats(s, dir)
      .withColumn("nation_normalized", lower(trim(col("n_name"))))
      .filter(col("nation_normalized").isin("nation_1", "nation_2"))
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        col("nation_normalized"), col("order_count"), col("avg_price"))
      .orderBy(col("avg_price").desc, col("c_custkey"))

  val q04Sql: String =
    s"""WITH stats AS (
       |$custStatsSql)
       |SELECT c_custkey, c_name, n_name AS nation,
       |  lower(trim(n_name)) AS nation_normalized, order_count, avg_price
       |FROM stats
       |WHERE lower(trim(n_name)) IN ('nation_1', 'nation_2')
       |ORDER BY avg_price DESC, c_custkey""".stripMargin

  // ===== q05 — counts per entity (A4: gold.band_album_counts analogue) =====

  def q05OrderCounts(s: SparkSession, dir: String): DataFrame =
    orderSpine(s, dir)
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(count(lit(1)).as("order_count"))
      .withColumnRenamed("n_name", "nation")
      .orderBy(col("order_count").desc, col("c_custkey"))

  val q05Sql: String =
    """SELECT c.c_custkey, c.c_name, n.n_name AS nation, COUNT(*) AS order_count
      |FROM orders o
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1, 2, 3
      |ORDER BY order_count DESC, c_custkey""".stripMargin

  // ===== q06 — global top-K (O6: Trino band_score_ranking view) ============

  /** `ORDER BY avg DESC LIMIT 100` — Spark plans TakeOrderedAndProject:
    * per-partition top-K then a K-row driver merge; no global sort even at
    * 100 TB.
    */
  def q06GlobalTop100(s: SparkSession, dir: String): DataFrame =
    custStats(s, dir)
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        col("order_count"), col("avg_price"))
      .orderBy(col("avg_price").desc, col("c_custkey"))
      .limit(100)

  val q06Sql: String =
    s"""WITH stats AS (
       |$custStatsSql)
       |SELECT c_custkey, c_name, n_name AS nation, order_count, avg_price
       |FROM stats ORDER BY avg_price DESC, c_custkey LIMIT 100""".stripMargin

  // ===== q07 — ad-hoc full dataset (E3: main.py J4+J5+J6 chain) ============

  /** Differing-key-name left join (J4), right join (J5), chained left join
    * (J6), and the `!= 'None'`-style string filters (F1) — one plan.
    */
  def q07FullDataset(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    val li = t(s, dir, "lineitem")
    val oc = ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left")
    li.join(oc, li("l_orderkey") === oc("o_orderkey"), "right")
      .join(broadcast(nat), oc("c_nationkey") === nat("n_nationkey"), "left")
      .filter(col("c_mktsegment") =!= "MACHINERY" && col("o_orderstatus") =!= "P")
      .select(
        col("o_orderkey").as("order_id"),
        col("o_orderstatus").as("order_status"),
        col("o_totalprice").as("total_price"),
        col("c_name").as("cust_name"),
        col("c_mktsegment").as("segment"),
        col("n_name").as("nation"),
        col("l_linenumber").as("line_number"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("extended_price"))
      .orderBy(col("order_id"), col("line_number"))
  }

  val q07Sql: String =
    """SELECT o.o_orderkey AS order_id, o.o_orderstatus AS order_status,
      |  o.o_totalprice AS total_price, c.c_name AS cust_name,
      |  c.c_mktsegment AS segment, n.n_name AS nation,
      |  l.l_linenumber AS line_number, l.l_quantity AS quantity,
      |  l.l_extendedprice AS extended_price
      |FROM lineitem l
      |RIGHT JOIN (orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
      |  ON l.l_orderkey = o.o_orderkey
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE c.c_mktsegment <> 'MACHINERY' AND o.o_orderstatus <> 'P'
      |ORDER BY order_id, line_number NULLS FIRST""".stripMargin

  // ===== q09 — exact row dedup (P9: bronze `unique()`) =====================

  def q09DedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .orderBy(col("l_partkey"), col("l_suppkey"))

  val q09Sql: String =
    "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem ORDER BY 1, 2"

  // ===== q10 — regex extract + non-strict cast + negated contains ==========

  /** X1 (regexp_extract group 0 → nullable cast, `flows/silver.py:91-94`),
    * P5 (null-on-failure cast), F2 (negated substring filter,
    * `flows/silver.py:108`).
    */
  def q10RegexExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(!col("p_type").cast("string").contains("ECO"))
      .select(
        col("p_partkey"), col("p_name"), col("p_type"),
        regexp_extract(col("p_name"), "(\\d+)", 0).cast("long").as("num_in_name"))
      .orderBy(col("p_partkey"))

  val q10Sql: String =
    """SELECT p_partkey, p_name, p_type,
      |  TRY_CAST(regexp_extract(p_name, '(\d+)', 0) AS BIGINT) AS num_in_name
      |FROM part
      |WHERE NOT contains(CAST(p_type AS VARCHAR), 'ECO')
      |ORDER BY p_partkey""".stripMargin

  // ===== q11 — conditional expression + literal (P6, P7) ===================

  def q11WhenCase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", lit("FINISHED"))
          .otherwise(col("o_orderstatus")).as("status_label"),
        lit("batch").as("source_tag"))
      .orderBy(col("o_orderkey"))

  val q11Sql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderstatus = 'F' THEN 'FINISHED' ELSE o_orderstatus END AS status_label,
      |  'batch' AS source_tag
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ===== q12 — regex replace-all (X2: `flows/silver.py:113`) ===============

  def q12RegexReplace(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        regexp_replace(col("text"), "data", "D4TA").as("text_clean"))
      .orderBy(col("doc_id"))

  val q12Sql: String =
    """SELECT doc_id, regexp_replace(text, 'data', 'D4TA', 'g') AS text_clean
      |FROM documents ORDER BY doc_id""".stripMargin

  // ===== q13 — header normalize + dedupe (P8: bronze normalize_and_dedupe) =

  /** Round-trips `region` through deliberately-messy column names and the
    * bronze normalizer; the oracle is the untouched table — proving the
    * normalizer restores canonical names.
    */
  def q13HeaderNormalize(s: SparkSession, dir: String): DataFrame = {
    val messy = t(s, dir, "region").toDF("  R RegionKey ", "R NAME")
    ColumnNormalizer(messy).orderBy(col("r_regionkey"))
  }

  val q13Sql: String =
    "SELECT r_regionkey, r_name FROM region ORDER BY 1"

  // ===== q14 — event-time bucketing (batch view of §2.9 streaming) =========

  /** events.ts is parquet TIMESTAMP(NANOS); the session reads it as
    * epoch-nanos LongType (`nanosAsLong`, core/Sessions.scala). Hour
    * bucketing uses integer `div` — a double division at 1e18 magnitude
    * would lose sub-second precision (53-bit mantissa). The bucket is
    * emitted as a canonical UTC string so the DuckDB oracle (native
    * timestamp_ns) can match it exactly via strftime.
    */
  def q14EventsHourly(s: SparkSession, dir: String): DataFrame = {
    import Exact._
    val hour = from_unixtime(expr("ts div 3600000000000") * 3600,
      "yyyy-MM-dd HH:mm:ss")
    t(s, dir, "events")
      .groupBy(hour.as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sumd(col("value")).as("sum_value"),
        avgd(col("value")).as("avg_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  val q14Sql: String =
    s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       |  event_type,
       |  COUNT(*) AS n_events,
       |  ${Exact.sqlSum("value")} AS sum_value,
       |  ${Exact.sqlAvg("value")} AS avg_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ========================================================================

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_top10_per_nation" -> (q02Top10PerNation _),
    "q03_cust_order_stats" -> (q03CustOrderStats _),
    "q04_nation_filter" -> (q04NationFilter _),
    "q05_order_counts" -> (q05OrderCounts _),
    "q06_global_top100" -> (q06GlobalTop100 _),
    "q07_full_dataset" -> (q07FullDataset _),
    "q09_dedup_exact" -> (q09DedupExact _),
    "q10_regex_extract" -> (q10RegexExtract _),
    "q11_when_case" -> (q11WhenCase _),
    "q12_regex_replace" -> (q12RegexReplace _),
    "q13_header_normalize" -> (q13HeaderNormalize _),
    "q14_events_hourly" -> (q14EventsHourly _))

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_top10_per_nation" -> q02Sql,
    "q03_cust_order_stats" -> q03Sql,
    "q04_nation_filter" -> q04Sql,
    "q05_order_counts" -> q05Sql,
    "q06_global_top100" -> q06Sql,
    "q07_full_dataset" -> q07Sql,
    "q09_dedup_exact" -> q09Sql,
    "q10_regex_extract" -> q10Sql,
    "q11_when_case" -> q11Sql,
    "q12_regex_replace" -> q12Sql,
    "q13_header_normalize" -> q13Sql,
    "q14_events_hourly" -> q14Sql)
}
