package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, punctuation/stopword quality signals, a composite
  * quality score, n-gram-free language ID (stopword votes), and content
  * fingerprinting. Everything is built from codegen'd built-in
  * functions (no UDFs), so the whole family stays inside whole-stage
  * codegen and scales embarrassingly parallel — per-row work only, no
  * shuffle, no driver involvement.
  *
  * Each function has an exact DuckDB SQL mirror (same operand order, so
  * double arithmetic is bit-identical) used by the oracle queries in
  * [[graft.queries.TextQueries]].
  */
object TextFunctions {

  /** Whitespace tokens of the lowercased text; empty strings dropped so
    * empty/blank documents tokenize to [] not [""].
    */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= lit(""))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword estimate: alpha runs count 1 each, digits count
    * individually, punctuation counts individually (the GPT-2 pre-token
    * split shape, without the merges table).
    */
  def bpeTokenEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Non-alphanumeric, non-space character count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation chars per character (0 for empty docs). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(punctCount(text).cast("double") / length(text))

  /** A small, fixed English stopword list — enough signal for quality
    * scoring without a dictionary dependency.
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Fraction of tokens that are stopwords (0 for empty docs). */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    val stops = array(Stopwords.map(lit): _*)
    when(size(ts) === 0, lit(0.0))
      .otherwise(size(filter(ts, t => array_contains(stops, t))).cast("double")
        / size(ts))
  }

  /** Mean token length: non-whitespace chars / tokens (0 for empty). */
  def meanTokenLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(length(regexp_replace(lower(trim(text)), "\\s", "")).cast("double")
        / size(ts))
  }

  /** Composite quality score in [0,1]: longer docs, low punctuation
    * noise, natural-language stopword density. The formula is the spec;
    * the oracle replicates it operand-for-operand.
    */
  def qualityScore(text: Column): Column =
    least(lit(1.0), tokenCount(text).cast("double") / 50.0) * 0.4 +
      (lit(1.0) - least(lit(1.0), punctRatio(text) * 10.0)) * 0.3 +
      least(lit(1.0), stopwordRatio(text) * 5.0) * 0.3

  /** Marker stopwords per language for the voting language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "a"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "pt" -> Seq("o", "os", "em", "uma", "nao"))

  /** Marker-token votes for one language. */
  def langScore(text: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(tokens(text), t => array_contains(m, t)))
  }

  /** Heuristic language ID: argmax of marker votes, ties broken by
    * [[LangMarkers]] order, 'und' (undetermined) when no marker hits.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, markers) => lang -> langScore(text, markers) }
    val anyHit = scores.map(_._2).reduce(_ + _) > 0
    // argmax with first-wins tie-break, expressed as a CASE chain
    def wins(i: Int): Column = {
      val (_, si) = scores(i)
      val beatsEarlier = scores.take(i).map { case (_, sj) => si > sj }
        .foldLeft(lit(true))(_ && _)
      val geLater = scores.drop(i + 1).map { case (_, sj) => si >= sj }
        .foldLeft(lit(true))(_ && _)
      beatsEarlier && geLater
    }
    val chain = scores.indices.reverse.foldLeft(lit("und")) { case (acc, i) =>
      when(anyHit && wins(i), lit(scores(i)._1)).otherwise(acc)
    }
    chain
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))
}
