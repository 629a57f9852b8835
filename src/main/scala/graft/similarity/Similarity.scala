package graft.similarity

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`). The hot
  * kernel is the native `dot64` Catalyst expression
  * ([[graft.functions.VectorOps]]) — codegen'd, no UDFs; every entry
  * point registers it on the executing session.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is
  *    broadcast (it's the small side by construction), so the corpus
  *    never shuffles — each partition scores its slice and a per-query
  *    window takes the top k. Correct baseline at any corpus size as
  *    long as |queries| stays broadcast-able.
  *  - [[RandomHyperplaneLsh]]: the scale path — sign-random-projection
  *    bucketing over L tables; only bucket-colliding pairs are scored.
  *    Corpus shuffles once per table on the bucket key; candidate
  *    volume is corpus/2^bits per bucket in expectation.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in doubles, left-to-right (deterministic, oracle-exact).
    * Backed by the native dot64 expression (codegen'd; the
    * aggregate/zip_with built-in form is an interpreted HOF) — the
    * executing session must register it, which every entry point in
    * this object and [[IvfIndex]] does.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot64(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors (cosine) of each query vector, excluding
    * self-matches; deterministic vec_id tie-break.
    * Output: (query_id, rank, vec_id, cosine).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.VectorOps.register(corpus.sparkSession)
    val c = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_emb"), col("emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Sign-random-projection LSH: deterministic hyperplanes from a seed,
    * `bits` sign bits per table, `tables` independent tables to boost
    * recall (candidate = collides in ≥1 table).
    */
  final case class RandomHyperplaneLsh(dim: Int, bits: Int, tables: Int, seed: Long = 42L) {

    /** hyperplanes(t)(b) = unit-free gaussian vector, fixed by seed. */
    private val planes: Seq[Seq[Seq[Double]]] = {
      val rnd = new Random(seed)
      Seq.fill(tables, bits, dim)(rnd.nextGaussian())
    }

    /** Bucket key for table t: packed sign bits of the projections. */
    def bucket(emb: Column, t: Int): Column =
      (0 until bits).map { b =>
        val plane = array(planes(t)(b).map(lit): _*)
        when(Similarity.dot(emb, plane) >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)

    /** (table, bucket, vec_id, emb) — one row per vector per table. */
    def bucketed(vecs: DataFrame): DataFrame = {
      graft.functions.VectorOps.register(vecs.sparkSession)
      val emb = col("embedding").cast("array<double>")
      val buckets = array((0 until tables).map(t => bucket(emb, t)): _*)
      vecs.select(col("vec_id"), emb.as("emb"),
        posexplode(buckets).as(Seq("lsh_table", "lsh_bucket")))
    }

    /** Approximate top-k: score only bucket-colliding candidates.
      * Candidate pairs travel the bucket join and the distinct as bare
      * (query_id, vec_id) ids — embeddings re-join afterwards (query
      * side broadcast, corpus side one narrow hash join), so no vector
      * payload rides the wide shuffles. Output schema matches
      * [[bruteForceTopK]].
      */
    def approxTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
      val c = bucketed(corpus).select(col("lsh_table"), col("lsh_bucket"), col("vec_id"))
      val q = bucketed(queries).select(col("lsh_table"), col("lsh_bucket"),
        col("vec_id").as("query_id"))
      val cands = c.join(q, Seq("lsh_table", "lsh_bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
      val qEmb = queries.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("q_emb"))
      val cEmb = corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      // equi-joins, no hints: AQE broadcasts a small query set and
      // shuffles a corpus-sized one — a forced broadcast would cap the
      // scale path at driver memory
      cands
        .join(qEmb, Seq("query_id"))
        .join(cEmb, Seq("vec_id"))
        .withColumn("cosine", Similarity.cosine(col("q_emb"), col("emb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    }
  }

  /** Embedding-space near-duplicate pairs: bucket-colliding pairs with
    * cosine above a threshold — the embedding analogue of MinHash
    * near-dup, same no-all-pairs shuffle shape.
    */
  def cosineNearDuplicates(
      vecs: DataFrame, lsh: RandomHyperplaneLsh, threshold: Double): DataFrame = {
    val b = lsh.bucketed(vecs).select(col("lsh_table"), col("lsh_bucket"), col("vec_id"))
    val pairs = b
      .join(b.withColumnRenamed("vec_id", "id_b"), Seq("lsh_table", "lsh_bucket"))
      .withColumnRenamed("vec_id", "id_a")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val emb = vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    pairs
      .join(emb.select(col("vec_id").as("id_a"), col("e").as("emb_a")), Seq("id_a"))
      .join(emb.select(col("vec_id").as("id_b"), col("e").as("emb_b")), Seq("id_b"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
