package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Cluster resolution (q36 surface): transitively-connected duplicate
  * pairs must collapse to one deterministic survivor per component.
  */
class DedupClustersSpec extends SparkTestBase {
  import spark.implicits._

  test("components: chains collapse transitively, min id labels the cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = DedupClusters.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("deduplicate: one survivor per cluster, isolated docs untouched") {
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = DedupClusters.deduplicate(docs, "doc_id", pairs)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 10L, 20L))
  }

  test("a long chain converges (diameter-bound propagation)") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = DedupClusters.components(pairs).as[(Long, Long)].collect()
    assert(comp.forall(_._2 == 1L) && comp.length == 12)
  }

  test("an exhausted round budget fails loudly instead of returning partial clusters") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException](
      DedupClusters.components(pairs, maxRounds = 2))
    assert(e.getMessage.contains("converge"))
  }

  test("end-to-end with MinHash pairs: planted near-copies collapse to originals") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank today",
      2L -> "spark partitions shuffle data across executors for distributed joins and aggregates",
      3L -> "completely different text about gardening tomatoes in clay soil with compost",
      // near-copies of 1: a chain 1~101~102 where only clustering keeps
      // exactly one of the three
      101L -> "the quick brown fox jumps over the lazy dog near the river bank yesterday",
      102L -> "the quick brown fox jumps over the lazy dog near the river bank tomorrow")
      .toDF("doc_id", "text")
    val pairs = MinHashLSH.nearDuplicates(docs, "doc_id", "text", threshold = 0.5)
    val kept = DedupClusters.deduplicate(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }
}
