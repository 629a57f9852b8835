package graft.medallion

import java.nio.file.Files

import graft.SparkTestBase

class MaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  test("compaction collapses small files without changing rows") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    spark.range(10000).selectExpr("id", "id * 2 AS v")
      .repartition(64) // simulate micro-batch small-file accretion
      .write.parquet(dir)
    val before = new java.io.File(dir).list().count(_.endsWith(".parquet"))
    assert(before >= 32)
    val rowsBefore = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted

    val after = Maintenance.compact(spark, dir, targetFileBytes = 1L << 20)
    assert(after < before / 4, s"still $after files")
    val rowsAfter = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
    assert(rowsAfter.toSeq == rowsBefore.toSeq)
    // no staging or backup residue
    assert(!Files.exists(java.nio.file.Paths.get(dir + "_compacting")))
    assert(!Files.exists(java.nio.file.Paths.get(dir + "_old")))
  }

  test("compaction refuses a partitioned table instead of flattening it") {
    val dir = Files.createTempDirectory("compact-part").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "part")
      .write.partitionBy("part").parquet(dir)
    val e = intercept[RuntimeException] {
      Maintenance.compact(spark, dir, 1L << 20)
    }
    assert(e.getMessage.contains("partition"))
    // table untouched
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("upsert replaces matched keys and appends new ones") {
    val dir = Files.createTempDirectory("upsert").toString + "/t"
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "score").write.parquet(dir)

    val updates = Seq((2L, "b2", 21), (4L, "d", 40)).toDF("id", "name", "score")
    Maintenance.upsertByKey(spark, dir, updates, Seq("id"))

    val out = spark.read.parquet(dir).as[(Long, String, Int)].collect().toSet
    assert(out == Set((1L, "a", 10), (2L, "b2", 21), (3L, "c", 30), (4L, "d", 40)))
    // idempotence: same upsert again changes nothing
    Maintenance.upsertByKey(spark, dir, updates, Seq("id"))
    assert(spark.read.parquet(dir).as[(Long, String, Int)].collect().toSet == out)
  }

  test("upsert with composite key") {
    val dir = Files.createTempDirectory("upsert2").toString + "/t"
    Seq((1L, "x", 1.0), (1L, "y", 2.0), (2L, "x", 3.0))
      .toDF("k1", "k2", "v").write.parquet(dir)
    Maintenance.upsertByKey(spark,
      dir, Seq((1L, "y", 9.0)).toDF("k1", "k2", "v"), Seq("k1", "k2"))
    val out = spark.read.parquet(dir).as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "x", 1.0), (1L, "y", 9.0), (2L, "x", 3.0)))
  }
}
