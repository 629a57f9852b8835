package graft.relational

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Seeded randomized equivalence: every relational operator against its
  * brute-force nested-loop oracle over generated data — key skew,
  * NULLs, timestamp ties, clustered values, and bucket widths chosen
  * adversarially relative to the data's spans. Catches the corner
  * cases enumerated fixtures miss; failures reproduce exactly (fixed
  * seeds, printed in the assertion message).
  */
class RelationalPropertySpec extends SparkTestBase {
  import spark.implicits._

  // small domains on purpose: collisions, ties, and empty keys happen
  private def genLeft(rnd: Random, n: Int): Seq[(Long, Option[String], Option[Long])] =
    (1 to n).map { i =>
      val key = if (rnd.nextInt(10) == 0) None else Some(s"k${rnd.nextInt(6)}")
      val ts = if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(50).toLong)
      (i.toLong, key, ts)
    }

  /** (key, ts) unique on the right — the operator's documented contract. */
  private def genRight(rnd: Random, n: Int): Seq[(Option[String], Option[Long], Long)] = {
    val seen = scala.collection.mutable.Set[(String, Long)]()
    (1 to n).flatMap { i =>
      val key = if (rnd.nextInt(10) == 0) None else Some(s"k${rnd.nextInt(6)}")
      val ts = if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(50).toLong)
      (key, ts) match {
        case (Some(k), Some(t)) if !seen.add((k, t)) => None
        case _ => Some((key, ts, 1000L + i))
      }
    }
  }

  private def asofBrute(left: DataFrame, right: DataFrame,
      tolerance: Option[Long], forward: Boolean): Set[Seq[Any]] = {
    val r = right.select(col("k").as("rk"), col("ts").as("rts"), col("pay"))
    val dir = if (forward) col("rts") >= col("ts") else col("rts") <= col("ts")
    val tol = tolerance.map { t =>
      if (forward) col("rts") - col("ts") <= t else col("ts") - col("rts") <= t
    }.getOrElse(lit(true))
    val cands = left.join(r, col("k") === col("rk") && dir && tol, "left")
    val order = if (forward) col("rts").asc_nulls_last else col("rts").desc_nulls_last
    val w = Window.partitionBy(col("lid")).orderBy(order)
    cands.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("lid", "k", "ts", "pay")
      .collect().map(_.toSeq).toSet
  }

  test("asof ≡ brute force: random data × directions × tolerances (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val left = genLeft(rnd, 60).toDF("lid", "k", "ts")
      val right = genRight(rnd, 40).toDF("k", "ts", "pay")
      for {
        forward <- Seq(false, true)
        tol <- Seq(None, Some(0L), Some(7L), Some(100L))
      } {
        val dir = if (forward) AsofJoin.Forward else AsofJoin.Backward
        val got = AsofJoin.asofJoin(left, right, "k", "ts", Seq("pay"),
            tolerance = tol, direction = dir)
          .select("lid", "k", "ts", "pay").collect().map(_.toSeq).toSet
        val want = asofBrute(left, right, tol, forward)
        assert(got == want,
          s"seed=$seed forward=$forward tol=$tol: ${got.diff(want)} vs ${want.diff(got)}")
      }
    }
  }

  test("range join ≡ brute force: random intervals × widths (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      // inverted and empty intervals included on purpose
      val intervals = (1 to 30).map { i =>
        val a = rnd.nextInt(100).toLong - 20
        val b = a + rnd.nextInt(30) - 5
        (i.toLong, a, b)
      }.toDF("iid", "s", "e")
      val points = (1 to 50).map(i => (100L + i, rnd.nextInt(120).toLong - 30))
        .toDF("pid", "pt")
      val brute = intervals.crossJoin(points)
        .filter(col("pt") >= col("s") && col("pt") < col("e"))
        .select("iid", "pid").collect().map(_.toSeq).toSet
      for (w <- Seq(1L, 4L, 13L, 64L)) {
        val got = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", w)
          .select("iid", "pid").collect().map(_.toSeq).toSet
        assert(got == brute, s"seed=$seed width=$w")
      }
    }
  }

  test("overlap join ≡ brute force: random interval pairs × widths (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      def gen(n: Int, idBase: Long) = (1 to n).map { i =>
        val a = rnd.nextInt(100).toLong - 20
        val b = a + rnd.nextInt(25) - 4 // some inverted/empty
        (idBase + i, a, b)
      }
      val l = gen(25, 0).toDF("lid", "ls", "le")
      val r = gen(25, 100).toDF("rid", "rs", "re")
      val brute = l.crossJoin(r)
        .filter(greatest(col("ls"), col("rs")) < least(col("le"), col("re")))
        .select("lid", "rid").collect().map(_.toSeq).toSet
      for (w <- Seq(1L, 4L, 13L, 64L)) {
        val got = IntervalJoin.overlapJoin(l, "ls", "le", r, "rs", "re", w)
          .select("lid", "rid").collect().map(_.toSeq).toSet
        assert(got == brute, s"seed=$seed width=$w")
        val dups = IntervalJoin.overlapJoin(l, "ls", "le", r, "rs", "re", w)
          .groupBy("lid", "rid").count().filter(col("count") > 1).count()
        assert(dups == 0L, s"seed=$seed width=$w: duplicate pair emissions")
      }
    }
  }
}
