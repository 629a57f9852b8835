package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.quality.IntegrityChecks

/** Seeded randomized equivalence for the integrity-check primitives
  * against in-memory brute force — null keys, duplicate parents, empty
  * parents, and null predicate inputs generated adversarially.
  */
class IntegrityPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("referential counts match brute force over random parent/child sets") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val child = (1 to 80).map(_ =>
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(12).toLong))
      // duplicate parent keys on purpose: the distinct() inside
      // referential must prevent join multiplication
      val parent = (1 to 30).map(_ => rnd.nextInt(8).toLong)
      val got = IntegrityChecks.referential(
          child.toDF("fk"), "fk", parent.toDF("pk"), "pk", "c")
        .as[(String, Long, Long)].head()
      val parentSet = parent.toSet
      val expectViol = child.count(c => c.isEmpty || !parentSet(c.get))
      assert(got == (("c", expectViol.toLong, child.size.toLong)), s"seed=$seed")
    }
  }

  test("fused predicates match per-check brute force with nulls present") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val rows = (1 to 60).map { _ =>
        (if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(20) - 10),
         if (rnd.nextInt(6) == 0) None else Some(rnd.nextDouble() * 2 - 0.5))
      }
      val df = rows.toDF("a", "b")
      val got = IntegrityChecks.predicates(df, Seq(
          "neg_a" -> (col("a") < 0),
          "range_b" -> (col("b") < 0 || col("b") > 1)))
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val expNeg = rows.count(_._1.exists(_ < 0)).toLong
      val expRange = rows.count(_._2.exists(v => v < 0 || v > 1)).toLong
      assert(got("neg_a") == ((expNeg, rows.size.toLong)), s"seed=$seed")
      assert(got("range_b") == ((expRange, rows.size.toLong)), s"seed=$seed")
    }
  }

  test("uniqueKey counts every row of a multiplied group, none of singletons") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val keys = (1 to 70).map(_ => rnd.nextInt(25).toLong)
      val got = IntegrityChecks.uniqueKey(keys.toDF("k"), "k", "u")
        .as[(String, Long, Long)].head()
      val expViol = keys.groupBy(identity).values.filter(_.size > 1).map(_.size).sum
      assert(got == (("u", expViol.toLong, keys.size.toLong)), s"seed=$seed")
    }
  }
}
