package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Binary-quantized ANN: 1-bit sign quantization of each embedding
  * dimension packed into 32-bit blocks, Hamming-distance candidate
  * generation, exact-cosine rerank. The memory story at 100 TB is the
  * point — a 64-dim float32 embedding (256 B) becomes two packed words
  * (16 B), a 16× reduction, and the candidate scan runs on popcount
  * (the native [[graft.functions.HammingBitsExpr]]) instead of FMA.
  * Sign-bit Hamming distance is a monotone estimator of angular
  * distance (Charikar 2002, the q23 hyperplane-LSH family with the
  * identity basis), so a top-C Hamming cut keeps most of the true
  * cosine top-k, and the rerank restores exact order among survivors.
  *
  * Packing uses 32-bit blocks (not 64) so every word stays in
  * [0, 2^32) — representable without sign-bit gymnastics in BOTH
  * engines (DuckDB's `1::BIGINT << 63` overflows), and generalizing to
  * any dim as ceil(dim/32) words.
  *
  * Scale shape: queries broadcast (|Q| bounded, the bruteForceTopK
  * contract); the Hamming stage shuffles only (query_id, vec_id,
  * hamming) — ids and an int, never vectors; the C×Q surviving
  * candidate list is broadcast back against the corpus scan for the
  * rerank, so full-precision embeddings never shuffle at all. The
  * Hamming cut runs as a bounded per-split top-C aggregate
  * ([[graft.functions.TopKAgg]], map-side partial combine), so the
  * exchange carries at most C entries per (split, query) — at 1000
  * executors no query ever collects all N corpus ids in one place.
  */
object BinaryAnn {

  /** Sign bits of an array<double>, packed little-endian into 32-bit
    * blocks stored as longs: word w bit j set ⟺ e[32w+j] > 0. Built
    * from codegen-friendly builtins; runs once per vector (the
    * per-pair hot path is [[VectorOps.hamming64]], a native
    * expression). The ragged tail reads `element_at` past the end,
    * which is NULL under non-ANSI, so `null > 0` falls to the
    * otherwise-branch and trailing bits stay 0. An EMPTY embedding
    * packs to an empty word list (guarded: the unguarded word-count
    * sequence(0, -1) DESCENDS in Spark, yielding two spurious zero
    * words where the oracle has none); a NULL embedding stays NULL.
    */
  def packSignBits(emb: Column): Column =
    when(size(emb) === 0, array().cast("array<bigint>"))
      .otherwise(transform(
        // (size+31)/32 in `/` is a DOUBLE divide; cast truncates (= floor
        // for the positive sizes here) back to the int sequence bound
        sequence(lit(0), ((size(emb) + lit(31)) / lit(32)).cast("int") - lit(1)),
        w =>
          aggregate(
            sequence(lit(0), lit(31)),
            lit(0L),
            (acc, j) =>
              when(element_at(emb, w * 32 + j + 1) > 0,
                acc.bitwiseOR(call_function("shiftleft", lit(1L), j)))
              .otherwise(acc))))

  /** Top-k neighbors by Hamming-candidate + exact-cosine rerank.
    * Output: (query_id, rank, vec_id, hamming, cosine) — rank is the
    * rerank order (cosine desc, vec_id tie-break), hamming the code
    * distance that admitted the candidate.
    *
    * @param corpus     (vec_id, embedding) — embedding array<numeric>
    * @param queries    same schema; must be broadcast-small
    * @param k          neighbors returned per query
    * @param candidates Hamming survivors reranked per query (C ≥ k);
    *                   recall rises with C, cost is C×Q rerank rows
    */
  def hammingTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      candidates: Int): DataFrame =
    topKWithBits(corpus,
      corpus.select(col("vec_id"),
          col("embedding").cast("array<double>").as("emb"))
        .select(col("vec_id"), packSignBits(col("emb")).as("bits")),
      queries, k, candidates)

  /** Persist the packed sign-bit codes for `corpus` at `indexDir`
    * (overwrite) — the binary-ANN analogue of the q25/q33 persisted
    * indexes: packing is the one corpus-wide map pass, and the stored
    * (vec_id, bits) table is ~16× smaller than the embeddings, so the
    * day-2 probe path scans kilobits per vector and never re-packs.
    * Full-precision embeddings are NOT stored — the rerank reads them
    * from the corpus table itself (only for the C×Q candidates).
    */
  def buildIndex(corpus: DataFrame, indexDir: String): Unit = {
    VectorOps.register(corpus.sparkSession)
    corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), packSignBits(col("emb")).as("bits"))
      .write.mode("overwrite").parquet(indexDir)
  }

  /** [[hammingTopK]] against a [[buildIndex]]-persisted code table —
    * equal by construction (packing is a deterministic function of the
    * embeddings). `corpus` supplies the full-precision vectors for the
    * candidate rerank only.
    */
  def hammingTopKFromIndex(indexDir: String, corpus: DataFrame,
      queries: DataFrame, k: Int, candidates: Int): DataFrame =
    topKWithBits(corpus,
      corpus.sparkSession.read.parquet(indexDir), queries, k, candidates)

  /** [[buildIndex]] with metadata columns DECORATING the stored codes
    * (label, source, date — whatever serving predicates key on): the
    * filtered-search path needs the predicate evaluable ON THE CODE
    * SCAN, because filtering after the candidate cut is wrong (see
    * [[filteredHammingTopKFromIndex]]) and joining the corpus back in
    * just to filter would drag the full-precision table into the cut
    * stage. Metadata is a few narrow columns beside 16 B of codes —
    * the index stays ~16× smaller than the embeddings.
    */
  def buildDecoratedIndex(
      corpus: DataFrame, indexDir: String, metaCols: Seq[String]): Unit = {
    VectorOps.register(corpus.sparkSession)
    corpus.select(col("vec_id") +: col("embedding").cast("array<double>").as("emb") +:
        metaCols.map(col): _*)
      .select(col("vec_id") +: packSignBits(col("emb")).as("bits") +:
        metaCols.map(col): _*)
      .write.mode("overwrite").parquet(indexDir)
  }

  /** Metadata-FILTERED ANN over a [[buildDecoratedIndex]]-persisted
    * code table: the predicate applies to the code scan BEFORE the
    * Hamming candidate cut, then the cut and exact-cosine rerank run
    * on the qualifying subset only — RAG-style serving ("top-k within
    * this source/label/date slice").
    *
    * The ordering is the point: POST-filtering a global top-C cut
    * under-returns — a predicate holding on an x-fraction of the
    * corpus leaves ~x·C qualifying candidates (fewer under skew, 0 in
    * the worst case), so the caller asking for k gets back less than k
    * while matching rows exist (spec-pinned in FilteredAnnSpec).
    * Pre-filtering keeps the full C candidate budget inside the slice,
    * and equals exact filtered search whenever the cut does (the q85
    * recall argument, now per-slice).
    *
    * Scale shape: the predicate prunes the (already 16×-compressed)
    * code scan — a parquet pushdown on the decorated columns, so a
    * selective slice reads a fraction of the codes; everything after
    * inherits the [[hammingTopK]] bounds (top-C per split via
    * `topk_by`, ids-only shuffle, broadcast rerank).
    */
  def filteredHammingTopKFromIndex(indexDir: String, corpus: DataFrame,
      queries: DataFrame, predicate: Column, k: Int, candidates: Int): DataFrame =
    topKWithBits(corpus,
      corpus.sparkSession.read.parquet(indexDir).filter(predicate),
      queries, k, candidates)

  private def topKWithBits(corpus: DataFrame, codes: DataFrame,
      queries: DataFrame, k: Int, candidates: Int): DataFrame = {
    require(candidates >= k, s"candidates=$candidates must be >= k=$k")
    VectorOps.register(corpus.sparkSession)
    graft.functions.TopKAgg.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("q_emb"))
      .withColumn("q_bits", packSignBits(col("q_emb")))

    // Stage 1: Hamming cut — a bounded per-split top-C aggregate, so
    // only ids + an int distance reach the exchange, at most C entries
    // per (split, query). Hamming (small int) is exact in the agg's
    // double score slot.
    val cand = codes.select(col("vec_id"), col("bits"))
      .join(broadcast(q.select(col("query_id"), col("q_bits"))),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        VectorOps.hamming64(col("q_bits"), col("bits")).as("hamming"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topkBy(
        col("hamming").cast("double"), col("vec_id"), candidates, asc = true).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("e"))
      .select(col("query_id"), col("e.id").as("vec_id"),
        col("e.score").cast("int").as("hamming"))

    // Stage 2: exact rerank — C×Q candidate list broadcast against the
    // corpus scan; the corpus never shuffles
    val rw = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q.select(col("query_id"), col("q_emb"))), Seq("query_id"))
      .withColumn("cosine", Similarity.cosine(col("q_emb"), col("emb")))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("hamming").cast("long").as("hamming"), col("cosine"))
  }
}
