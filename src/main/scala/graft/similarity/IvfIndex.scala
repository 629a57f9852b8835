package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into C cells; queries probe only
  * their `nprobe` nearest cells.
  *
  * Scale shape: corpus assignment is a SINGLE codegen'd projection —
  * all C centroid scores are computed from literals in one pass per
  * row (the same trick as [[Similarity.RandomHyperplaneLsh.bucket]]),
  * so no join, no row explosion, no shuffle. Probing sorts the same
  * literal-score array and explodes the top `nprobe` cells. Search
  * then shuffles on the cell id, so each query scores ~nprobe/C of
  * the corpus instead of all of it. Against the LSH path
  * ([[Similarity.RandomHyperplaneLsh]]): IVF adapts to the data's
  * cluster structure (better recall at equal candidate volume) at the
  * cost of a training pass — which [[IvfIndex.save]]/[[IvfIndex.load]]
  * amortize across probe runs.
  */
final case class IvfIndex(centroids: Seq[(Int, Seq[Double])]) {

  private def centroidsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    centroids.toDF("cell_id", "centroid")
  }

  /** One struct(score, -cell_id) per centroid, from centroid LITERALS:
    * score = dot(emb, c)/||c|| — equal to cosine × ||emb||, and ||emb||
    * is constant across cells, so rankings are unchanged and the
    * per-row norm is saved. The negated cell id makes lexicographic
    * max/sort prefer the LOWEST cell id on exact score ties
    * (deterministic, unlike the agg form's arbitrary tie). Everything
    * here is codegen'd: dot64 is a native expression, greatest /
    * sort_array / slice are built-ins, no HOFs.
    */
  private def scoredCells(emb: Column): Seq[Column] =
    centroids.map { case (cellId, c) =>
      val cNorm = math.sqrt(c.map(x => x * x).sum)
      struct(
        (graft.functions.VectorOps.dot64(emb, array(c.map(lit): _*)) / cNorm).as("s"),
        lit(-cellId).as("nc"))
    }

  /** (vec_id, cell_id, emb): each vector assigned to its nearest
    * centroid by cosine — one projection, no join, no shuffle.
    */
  def assign(vecs: DataFrame): DataFrame = {
    graft.functions.VectorOps.register(vecs.sparkSession)
    val v = vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cells = scoredCells(col("emb"))
    val best = if (cells.size == 1) cells.head else greatest(cells: _*)
    v.select(col("vec_id"), (-best.getField("nc")).as("cell_id"), col("emb"))
  }

  /** Pre-round-6 join formulation of [[assign]], kept as the spec's
    * equality anchor: broadcast join against C centroids materializes
    * C rows per vector (each carrying the embedding) before `min_by`
    * collapses them — correct, but a C× projection cost the
    * single-projection form avoids.
    */
  private[similarity] def assignViaJoin(vecs: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    graft.functions.VectorOps.register(spark)
    val v = vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    v.join(broadcast(centroidsDf(spark)))
      .withColumn("cos", Similarity.cosine(col("emb"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cell_id"), -col("cos")).as("cell_id"),
        first(col("emb")).as("emb"))
      .select("vec_id", "cell_id", "emb")
  }

  /** (query_id, q_emb, cell_id) for each query's `nprobe` nearest
    * cells — sort the literal-score array, slice, explode. Same
    * no-join shape as [[assign]].
    */
  def probes(queries: DataFrame, nprobe: Int): DataFrame = {
    graft.functions.VectorOps.register(queries.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val sorted = sort_array(array(scoredCells(col("q_emb")): _*), asc = false)
    q.select(col("query_id"), col("q_emb"),
        explode(slice(sorted, 1, nprobe)).as("cell"))
      .select(col("query_id"), col("q_emb"), (-col("cell.nc")).as("cell_id"))
  }

  /** Approximate top-k restricted to probed cells; output schema
    * matches [[Similarity.bruteForceTopK]].
    */
  def approxTopK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int): DataFrame =
    approxTopKAssigned(assign(corpus), queries, k, nprobe)

  /** [[approxTopK]] over an already-assigned corpus — the probe path
    * for a [[IvfIndex.load]]ed index: no KMeans, no re-assignment,
    * just the cell join and per-query ranking.
    */
  def approxTopKAssigned(
      assigned: DataFrame, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probed = probes(queries, nprobe)
    // ranking via the bounded per-split aggregate (Similarity.rankTopK):
    // a probed cell holds ~N/C members, so a global per-query window
    // would shuffle N·nprobe/C ids per query — corpus-proportional
    Similarity.rankTopK(
      assigned.join(probed, Seq("cell_id"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          Similarity.cosine(col("q_emb"), col("emb")).as("cosine")),
      k)
  }
}

object IvfIndex {

  /** Train the coarse quantizer with spark.ml KMeans (deterministic
    * via seed). C ≈ √N is the usual starting point; the centroid set
    * is small by construction (it gets broadcast).
    */
  def fit(vecs: DataFrame, c: Int, seed: Long = 42L, maxIter: Int = 10): IvfIndex = {
    val train = vecs.select(
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(c).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").fit(train)
    IvfIndex(model.clusterCenters.zipWithIndex
      .map { case (v, i) => i -> v.toArray.toSeq }.toSeq)
  }

  /** Persist a fitted index: the (tiny) centroid table plus the
    * assigned corpus cells. At scale the index is built once and
    * probed daily — training (a KMeans pass) and assignment (a full
    * corpus projection) both amortize to zero on the probe path.
    */
  def save(index: IvfIndex, assignedCorpus: DataFrame, dir: String): Unit = {
    val spark = assignedCorpus.sparkSession
    import spark.implicits._
    index.centroids.toDF("cell_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    assignedCorpus.write.mode("overwrite").parquet(s"$dir/cells")
  }

  /** Load a persisted index: (quantizer, assigned corpus). Feed the
    * corpus DataFrame to [[IvfIndex.approxTopKAssigned]] — nothing on
    * this path re-trains or re-assigns.
    */
  def load(spark: SparkSession, dir: String): (IvfIndex, DataFrame) = {
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .sortBy(_._1).toSeq
    (IvfIndex(cents), spark.read.parquet(s"$dir/cells"))
  }
}
