package graft

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.dedup.MinHashLSH

/** Scratch profiling main for q21 — DELETE before commit. */
object Q21Probe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 128
    val b = if (args.length > 1) args(1).toInt else 16
    val spark = Sessions.local("q21-probe")
    org.apache.log4j.Logger
      .getLogger("org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .setLevel(org.apache.log4j.Level.INFO)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    try {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val planted = docs.union(docs.select(col("doc_id") + 1000000,
      concat(col("text"), lit(" planted near duplicate marker"))))

    time(s"q21 cold k=$k b=$b") {
      MinHashLSH.nearDuplicates(planted, "doc_id", "text", 0.5, 3, k, b)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save()
    }
    time(s"q21 warm k=$k b=$b") {
      MinHashLSH.nearDuplicates(planted, "doc_id", "text", 0.5, 3, k, b)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
