package graft.sql

import graft.SparkTestBase
import graft.core.Tables

class BucketingSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed-by-key join plans with zero shuffle") {
    Bucketing.writeBucketed(
      Tables.load(spark, sf, "orders"), "bkt.orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(
      Tables.load(spark, sf, "customer")
        .withColumnRenamed("c_custkey", "o_custkey"), "bkt.customer_b", "o_custkey", 8)

    // disable broadcast so the join must prove co-partitioning
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt.orders_b")
        .join(spark.table("bkt.customer_b"), Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
      // and it returns the same rows as the unbucketed join
      val unbucketed = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "customer")
          .withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"))
      assert(joined.count() == unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE bkt.orders_b")
      spark.sql("DROP TABLE bkt.customer_b")
    }
  }
}
