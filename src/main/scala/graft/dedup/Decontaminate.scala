package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Span-grain decontamination — the surgical stage of the family (q39
  * flags docs, q65 bloom-prunes the flagging, THIS removes the
  * contaminated text itself): every training word covered by a w-word
  * window whose text occurs in the held-out set is cut, with NO
  * canonical exemption (eval text must not survive anywhere in
  * training). Shared verbatim by the batch gate (q89) and the
  * streaming loop ([[graft.streaming.DecontaminateStream]]), so
  * streamed ≡ batch holds by construction and is proven by spec.
  *
  * Scale shape: window generation is linear and shuffle-free; the flag
  * is ONE equi-join on the md5 window hash (held-out side aggregated
  * distinct first — no broadcast assumption, AQE broadcasts when it
  * fits); the rebuild is a per-doc anti-join + one hash aggregate. At
  * 100 TB, pre-prune the training window stream with the q65 bloom
  * before the join — results identical, the join then touches only
  * survivors.
  */
object Decontaminate {

  val DefaultWindow = 8

  /** (dc_id, i, h): md5 of every w-word window, i = 0-based start. Docs
    * shorter than w yield no windows (nothing to match).
    */
  private[graft] def windowHashes(
      docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame =
    docs.select(col(idCol).as("dc_id"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= w)
      .select(col("dc_id"), col("ws"),
        explode(sequence(lit(0), size(col("ws")) - w)).as("i"))
      .select(col("dc_id"), col("i"),
        md5(array_join(slice(col("ws"), col("i") + 1, lit(w)), " ")).as("h"))

  /** The held-out side's distinct window hashes — the (persistable)
    * eval-gram set every training batch is cut against.
    */
  def evalGrams(
      heldOut: DataFrame, idCol: String, textCol: String,
      w: Int = DefaultWindow): DataFrame =
    windowHashes(heldOut, idCol, textCol, w).select(col("h")).distinct()

  /** Cut every word of `train` covered by a window in `grams` (an
    * [[evalGrams]] relation, fresh or read back from parquet). Output:
    * (idCol, words_total, words_cut, kept_text) — one row per input
    * doc, kept_text empty when everything was cut. Per-doc independent,
    * so any partitioning of `train` into batches cuts identically.
    */
  def cut(
      train: DataFrame, idCol: String, textCol: String, grams: DataFrame,
      w: Int = DefaultWindow): DataFrame = {
    val words = train.select(col(idCol).as("dc_id"), split(col(textCol), " ").as("ws"))
    val cutPos = windowHashes(train, idCol, textCol, w)
      .join(grams, Seq("h"))
      .select(col("dc_id"), explode(sequence(col("i"), col("i") + lit(w - 1))).as("p"))
      .distinct()
    // explicit aliases: both sides descend from the same scan (see the
    // q87/q89 note — the lineage-ambiguous spelling logs a spurious
    // "trivially true equals predicate" warning)
    val wordRows = words
      .select(col("dc_id"), posexplode(col("ws")).as(Seq("pos", "word")))
      .alias("wr")
    val rebuilt = wordRows
      .join(cutPos.alias("ct"),
        col("wr.dc_id") === col("ct.dc_id") && col("wr.pos") === col("ct.p"),
        "left_anti")
      .groupBy(col("dc_id"))
      .agg(count(lit(1)).as("words_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("word")))),
          _.getField("word")), " ").as("kept_text"))
    words.select(col("dc_id"), size(col("ws")).cast("long").as("words_total"))
      .join(rebuilt, Seq("dc_id"), "left")
      .select(col("dc_id").as(idCol), col("words_total"),
        (col("words_total") - coalesce(col("words_kept"), lit(0L))).as("words_cut"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }
}
