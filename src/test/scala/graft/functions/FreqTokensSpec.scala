package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Misra–Gries heavy-hitter aggregate: certificate soundness (no false
  * negatives while offset < thr), exactness of the q81 two-pass pattern
  * vs a naive exact groupBy, the distributed merge path, loud failure
  * on certificate exhaustion, and analysis-time arg validation.
  */
class FreqTokensSpec extends SparkTestBase {
  import spark.implicits._

  FreqTokens.register(spark)

  test("MgSummary: exact n, bounded size, certified candidates under purge pressure") {
    val s = new MgSummary(capacity = 8)
    // 40× "hot", one each of 200 distinct cold tokens, interleaved
    val stream = (0 until 200).flatMap { i =>
      (if (i % 5 == 0) Seq("hot") else Nil) ++ Seq(s"cold$i")
    }  // true("hot") = 40, 200 distinct cold singletons
    stream.foreach(s.update)
    assert(s.n == stream.length)
    assert(s.counts.size <= 8, s"state must stay bounded, got ${s.counts.size}")
    assert(s.offset > 0, "purges must have happened at this capacity")
    // certificate: true("hot") = 40; est + offset must cover it
    val est = s.counts.getOrDefault("hot", 0L)
    assert(est + s.offset >= 40, s"est=$est offset=${s.offset}")
  }

  test("MgSummary.mergeIn preserves n, additive offsets, and the certificate") {
    val a = new MgSummary(8); val b = new MgSummary(8)
    (1 to 150).foreach(i => a.update(if (i % 3 == 0) "x" else s"a$i"))
    (1 to 150).foreach(i => b.update(if (i % 3 == 0) "x" else s"b$i"))
    val offA = a.offset; val offB = b.offset
    a.mergeIn(b)
    assert(a.n == 300)
    assert(a.offset >= offA + offB, "offset only grows through merge+repurge")
    assert(a.counts.size <= 8)
    // true("x") = 100 across both streams
    assert(a.counts.getOrDefault("x", 0L) + a.offset >= 100)
  }

  test("aggregate is exact-equivalent to a full groupBy count at any partitioning") {
    // planted: per-source heavy hitters + distinct noise, 7 partitions so
    // the serialize/merge path runs
    val rows = (1 to 400).flatMap { i =>
      val src = if (i % 2 == 0) "web" else "books"
      Seq((src, "the"), (src, s"noise${src}$i")) ++
        (if (i % 4 == 0) Seq((src, "of")) else Nil)
    }
    val df = rows.toDF("source", "w").repartition(7)
    val sk = df.groupBy($"source")
      .agg(FreqTokens.freqTokens($"w", 256, 0.05).as("fk"))
      .select($"source", $"fk.n".as("n"), $"fk.thr".as("thr"),
        explode($"fk.cand").as("w"))
    // pass 2 of the q81 pattern: exact counts on candidates only
    val got = df.join(sk.select($"source", $"thr", $"w"), Seq("source", "w"))
      .groupBy($"source", $"w", $"thr").agg(count(lit(1)).as("c"))
      .filter($"c" >= $"thr")
      .select($"source", $"w", $"c")
      .as[(String, String, Long)].collect().toSet
    // naive exact answer
    val exact = df.groupBy($"source", $"w").agg(count(lit(1)).as("c"))
      .join(df.groupBy($"source").agg(count(lit(1)).as("n")), "source")
      .filter($"c" >= greatest(lit(1L), ceil($"n" * 0.05).cast("long")))
      .select($"source", $"w", $"c")
      .as[(String, String, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must contain heavy hitters")
    assert(got == exact)
    // exact n survives the sketch
    val ns = sk.select($"source", $"n").distinct.as[(String, Long)].collect().toMap
    // web: 200 i's × 2 rows + 100 "of" rows; books: 200 × 2 (i%4==0 is even)
    assert(ns == Map("web" -> 500L, "books" -> 400L))
  }

  test("serialize survives tokens past the 64 KB modified-UTF-8 limit") {
    // writeUTF caps a key at 65535 encoded bytes; the length-prefixed
    // raw-UTF-8 codec must round-trip a token past that limit (and
    // multi-byte text) instead of throwing at the shuffle boundary
    val agg = FreqTokensAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      org.apache.spark.sql.catalyst.expressions.Literal(8),
      org.apache.spark.sql.catalyst.expressions.Literal(0.2))
    val s = new MgSummary(capacity = 8)
    val giant = "x" * 70000
    val multi = "héllo→世界"
    s.update(giant); s.update(giant); s.update(multi)
    val back = agg.deserialize(agg.serialize(s))
    assert(back.n == s.n && back.offset == s.offset)
    assert(back.counts.get(giant) == 2L)
    assert(back.counts.get(multi) == 1L)
  }

  test("certificate exhaustion fails loudly instead of dropping heavy hitters") {
    // all-distinct stream at minimum capacity: offset ~ n/9 exceeds
    // thr = 0.02·n, so eval must refuse to emit an uncertified answer
    val df = (1 to 2000).map(i => ("g", s"w$i")).toDF("g", "w")
    val e = intercept[Exception] {
      df.groupBy($"g").agg(FreqTokens.freqTokens($"w", 8, 0.02)).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("certificate exhausted"))),
      s"got: $e")
  }

  test("streaming aggregation: state survives micro-batches and equals the batch answer") {
    // the buffer serializes into the streaming state store between
    // micro-batches — the exact persisted-state path the wire-format
    // version byte guards. Two batches of grouped tokens in complete
    // mode must end at the same certified candidates as one batch run.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows1 = (1 to 300).map(i => ("a", if (i % 3 == 0) "hot" else s"w$i"))
    val rows2 = (1 to 300).map(i => ("a", if (i % 2 == 0) "hot" else s"v$i")) ++
      (1 to 50).map(i => ("b", "solo"))
    val in = MemoryStream[(String, String)]
    val q = in.toDS().toDF("g", "w")
      .groupBy($"g").agg(FreqTokens.freqTokens($"w", 256, 0.1).as("ft"))
      .writeStream.format("memory").queryName("ft_stream")
      .outputMode("complete").start()
    try {
      in.addData(rows1: _*)
      q.processAllAvailable()
      in.addData(rows2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ft_stream")
      .select($"g", $"ft.n", $"ft.cand").as[(String, Long, Seq[String])]
      .collect().map { case (g, n, c) => g -> ((n, c)) }.toMap
    val batch = (rows1 ++ rows2).toDF("g", "w")
      .groupBy($"g").agg(FreqTokens.freqTokens($"w", 256, 0.1).as("ft"))
      .select($"g", $"ft.n", $"ft.cand").as[(String, Long, Seq[String])]
      .collect().map { case (g, n, c) => g -> ((n, c)) }.toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed("a")._2.contains("hot") && streamed("b")._2 == Seq("solo"))
  }

  test("analysis rejects bad arity, non-literal params, and out-of-range frac") {
    val df = Seq(("g", "w")).toDF("g", "w")
    df.createOrReplaceTempView("ft_args")
    intercept[Exception] {
      spark.sql("SELECT freq_tokens(w) FROM ft_args GROUP BY g").collect()
    }
    intercept[Exception] {  // non-foldable capacity
      df.groupBy($"g").agg(call_function("freq_tokens", $"w", length($"w"), lit(0.1))).collect()
    }
    intercept[Exception] {  // frac out of (0,1)
      df.groupBy($"g").agg(FreqTokens.freqTokens($"w", 64, 1.5)).collect()
    }
  }
}
