package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into C cells; queries probe only
  * their `nprobe` nearest cells.
  *
  * Scale shape: corpus assignment is one broadcast join against C
  * centroids + a `min_by` hash-aggregate (no window); search shuffles
  * on the cell id, so each query scores ~nprobe/C of the corpus
  * instead of all of it. Against the LSH path
  * ([[Similarity.RandomHyperplaneLsh]]): IVF adapts to the data's
  * cluster structure (better recall at equal candidate volume) at the
  * cost of a training pass.
  */
final case class IvfIndex(centroids: Seq[(Int, Seq[Double])]) {

  private def centroidsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    centroids.toDF("cell_id", "centroid")
  }

  /** (vec_id, emb, cell_id): each vector assigned to its nearest
    * centroid by cosine — broadcast the C centroids, `min_by` picks
    * the cell in a single hash-agg.
    */
  def assign(vecs: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    graft.functions.VectorOps.register(spark)
    val v = vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    v.join(broadcast(centroidsDf(spark)))
      .withColumn("cos", Similarity.cosine(col("emb"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cell_id"), -col("cos")).as("cell_id"),
        first(col("emb")).as("emb"))
  }

  /** (query_id, q_emb, cell_id) for each query's `nprobe` nearest
    * cells (queries are the small side; a window over them is cheap).
    */
  def probes(queries: DataFrame, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.VectorOps.register(spark)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cell_id"))
    q.join(broadcast(centroidsDf(spark)))
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("centroid")))
      .withColumn("pr", row_number().over(w))
      .filter(col("pr") <= nprobe)
      .select("query_id", "q_emb", "cell_id")
  }

  /** Approximate top-k restricted to probed cells; output schema
    * matches [[Similarity.bruteForceTopK]].
    */
  def approxTopK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val assigned = assign(corpus)
    val probed = probes(queries, nprobe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(probed, Seq("cell_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", Similarity.cosine(col("q_emb"), col("emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
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
}
