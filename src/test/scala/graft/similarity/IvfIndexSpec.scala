package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

class IvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val vecs = Tables.load(spark, sf, "embeddings")

  test("every vector lands in exactly one of C cells") {
    val idx = IvfIndex.fit(vecs, c = 10)
    val assigned = IvfIndex.fit(vecs, c = 10).assign(vecs)
    assert(assigned.count() == vecs.count())
    assert(assigned.select("cell_id").distinct().count() <= 10)
    assert(idx.centroids.size == 10)
  }

  test("IVF recall beats probing budget: nprobe=3 of 10 cells, recall ≥ 0.5") {
    val queries = vecs.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(vecs, queries, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val idx = IvfIndex.fit(vecs, c = 10)
    val approx = idx.approxTopK(vecs, queries, k = 5, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall")
  }

  test("full probe (nprobe = C) reproduces exact top-k") {
    val queries = vecs.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(vecs, queries, k = 5)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    val idx = IvfIndex.fit(vecs, c = 8)
    val full = idx.approxTopK(vecs, queries, k = 5, nprobe = 8)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(full == exact)
  }
}
