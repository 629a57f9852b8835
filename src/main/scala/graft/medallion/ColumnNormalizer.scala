package graft.medallion

import org.apache.spark.sql.DataFrame

/** Column-name normalization + dedup for bronze ingestion.
  *
  * Behavior spec from the reference's `normalize_and_dedupe`
  * (reference `flows/bronze.py:30-40`): trim, lowercase, each space
  * character → one underscore (so `"a  b"` → `a__b`, exactly as the
  * reference's `str.replace(" ", "_")` does); repeated names get
  * `_2`, `_3`, … suffixes in encounter order. Pure driver-side metadata
  * rewrite (`df.toDF`) — zero data movement at any scale.
  */
object ColumnNormalizer {

  def normalizeName(raw: String): String =
    raw.trim.toLowerCase.replace(" ", "_")

  /** Normalize every name, then suffix-dedupe repeats: first keeps the
    * base name, the k-th repeat becomes `name_k`.
    */
  def normalizeAndDedupe(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { raw =>
      val base = normalizeName(raw)
      val n = seen.getOrElse(base, 0) + 1
      seen(base) = n
      if (n == 1) base else s"${base}_$n"
    }
  }

  def apply(df: DataFrame): DataFrame =
    df.toDF(normalizeAndDedupe(df.columns.toSeq): _*)
}
