package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** JSONL format surface (q106): lossless write→read roundtrip against
  * the parquet source, warehouse build-once reuse.
  */
class FormatsSpec extends SparkTestBase {
  import spark.implicits._

  test("q106 jsonl roundtrip is lossless and build-once") {
    val dir = "/root/testdata/sf0.001"
    val got = MedallionRoundtrip.q106JsonlRoundtrip(spark, dir)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == want, "jsonl write->read must carry every row and byte")
    // second call reuses the warehouse artifact (no rebuild) and agrees
    val again = MedallionRoundtrip.q106JsonlRoundtrip(spark, dir)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(again == want)
  }
}
