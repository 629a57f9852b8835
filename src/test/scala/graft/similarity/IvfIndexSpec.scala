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

  test("IVF at production probe budget reaches recall@5 ≥ 0.9 (sf0.01)") {
    // q25 runs nprobe=4 of 16 for speed; this pins the QUALITY knob:
    // raising nprobe must buy recall all the way to production grade.
    // This corpus is near-random (top-5 cosine ≈ 0.32), the worst case
    // for a trained quantizer — neighbors scatter across cells, so the
    // budget that clears 0.9 here (12/16) is an upper bound on what
    // clustered real embeddings need.
    val v = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = v.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(v, queries, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val idx = IvfIndex.fit(v, c = 16)
    val half = idx.approxTopK(v, queries, k = 5, nprobe = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val most = idx.approxTopK(v, queries, k = 5, nprobe = 12)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(s: Set[(Long, Long)]) = (exact & s).size.toDouble / exact.size
    assert(recall(most) >= 0.9, s"IVF recall@5 = ${recall(most)} at nprobe=12/16")
    // and recall is monotone in the probe budget
    assert(recall(most) >= recall(half),
      s"recall fell as nprobe grew: ${recall(half)} -> ${recall(most)}")
  }

  test("single-projection assign equals the join/min_by form, with no join in the plan") {
    val idx = IvfIndex.fit(vecs, c = 12)
    val fast = idx.assign(vecs).select("vec_id", "cell_id")
      .as[(Long, Int)].collect().toMap
    val joined = idx.assignViaJoin(vecs).select("vec_id", "cell_id")
      .as[(Long, Int)].collect().toMap
    assert(fast == joined)
    val plan = idx.assign(vecs).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "assignment must be a pure projection")
    assert(!plan.contains("Exchange"), "assignment must not shuffle")
  }

  test("save/load: probing a loaded index equals the fit path, without retraining") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    val queries = vecs.filter($"vec_id" < 20)
    val idx = IvfIndex.fit(vecs, c = 10)
    val fitPath = idx.approxTopK(vecs, queries, k = 5, nprobe = 3)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet

    IvfIndex.save(idx, idx.assign(vecs), dir)
    val (loaded, cells) = IvfIndex.load(spark, dir)
    assert(loaded.centroids == idx.centroids)
    val loadPath = loaded.approxTopKAssigned(cells, queries, k = 5, nprobe = 3)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(loadPath == fitPath)
    // the probe path reads the stored cells — no KMeans, no corpus re-assignment
    val plan = loaded.approxTopKAssigned(cells, queries, k = 5, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains(s"$dir/cells"), "probe path must scan the stored cells table")
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

  test("q75 (registered full-probe query, Warehouse path) equals q20 brute force") {
    // the gate-facing statement of the test above: q75 goes through
    // the persisted index (ensureBuilt → save → load) and must still
    // be row-identical to q20, which is what makes q20's DuckDB SQL a
    // sound oracle for it
    val q20 = graft.queries.SimilarityQueries.q20KnnBruteForce(spark, sf)
      .collect().toSeq
    val q75 = graft.queries.SimilarityQueries.q75IvfFullProbe(spark, sf)
      .collect().toSeq
    assert(q75 == q20)
  }
}
