package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Native sketch probes — bit-equivalence with the library calls the
  * replaced UDFs made, and the codegen/plan properties that motivated
  * them.
  */
class SketchProbesSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom probe: no false negatives, and equals direct mightContainLong") {
    val df = spark.range(0, 1000).select(xxhash64(col("id").cast("string")).as("h"))
    val bloom = df.stat.bloomFilter("h", 1000, 0.01)
    val bytes = SketchProbes.bloomBytes(bloom)
    SketchProbes.register(spark)
    val flagged = df.withColumn("m", SketchProbes.bloomMightContain(bytes, col("h")))
      .as[(Long, Boolean)].collect()
    assert(flagged.forall(_._2), "a member hash came back negative")
    flagged.foreach { case (h, m) => assert(m == bloom.mightContainLong(h)) }
    // non-members: expression agrees with the library probe bit-for-bit
    val outside = spark.range(5000, 6000)
      .select(xxhash64(col("id").cast("string")).as("h"))
      .withColumn("m", SketchProbes.bloomMightContain(bytes, col("h")))
      .as[(Long, Boolean)].collect()
    outside.foreach { case (h, m) => assert(m == bloom.mightContainLong(h)) }
  }

  test("cms probe equals direct estimateCount; null item is null") {
    val ev = Seq("a", "a", "a", "b", "b", "c").toDF("t")
    val bytes = ev.agg(expr("count_min_sketch(t, 0.001d, 0.99d, 42)"))
      .as[Array[Byte]].head()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    SketchProbes.register(spark)
    val out = Seq(Some("a"), Some("b"), Some("c"), Some("zzz"), None).toDF("t")
      .select(col("t"), SketchProbes.cmsEstimate(bytes, col("t")).as("e"))
      .as[(Option[String], Option[Long])].collect().toMap
    assert(out(Some("a")) === Some(cms.estimateCount("a")))
    assert(out(Some("b")) === Some(cms.estimateCount("b")))
    assert(out(Some("c")) === Some(cms.estimateCount("c")))
    assert(out(Some("zzz")) === Some(cms.estimateCount("zzz")))
    assert(out(None) === None, "null item must stay null")
    assert(cms.estimateCount("a") >= 3L, "CMS never under-counts")
  }

  test("probes run inside whole-stage codegen — no UDF node, no codegen fallback") {
    SketchProbes.register(spark)
    val df = spark.range(100).select(xxhash64(col("id").cast("string")).as("h"))
    val bloom = df.stat.bloomFilter("h", 100, 0.01)
    val probed = df.filter(SketchProbes.bloomMightContain(
      SketchProbes.bloomBytes(bloom), col("h")))
    val p = probed.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p.take(300))
    // the `*(n)` prefix marks a whole-stage-codegen'd operator in the
    // simple plan string; the probe filter must carry it
    assert("\\*\\(\\d+\\) Filter bloom_might_contain".r.findFirstIn(p).isDefined,
      "probe filter fell out of whole-stage codegen:\n" + p.take(400))
    assert(probed.count() == 100L)
  }
}
