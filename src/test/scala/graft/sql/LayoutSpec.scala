package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.ZOrderKey

/** Z-order layout: bit-exact interleave semantics (including through
  * codegen), and the locality claim itself — a filter on the second
  * dimension must read fewer bytes from a Z-ordered layout than from
  * a layout sorted on the first dimension only.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave is bit-exact: known answers and dimension recovery") {
    assert(ZOrderKey.interleave(0L, 0L) == 0L)
    assert(ZOrderKey.interleave(3L, 0L) == 0x5L)  // a -> even positions
    assert(ZOrderKey.interleave(0L, 3L) == 0xaL)  // b -> odd positions
    assert(ZOrderKey.interleave(0xffffffffL, 0L) == 0x5555555555555555L)
    assert(ZOrderKey.interleave(0L, 0xffffffffL) == 0xaaaaaaaaaaaaaaaaL)
    // only the low 32 bits of each input participate
    assert(ZOrderKey.interleave(0x1_00000003L, 0L) == 0x5L)
    // spread is exactly invertible on 32-bit inputs
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val a = rnd.nextLong() & 0xffffffffL
      val b = rnd.nextLong() & 0xffffffffL
      val z = ZOrderKey.interleave(a, b)
      def unspread(v: Long): Long = {
        var x = v & 0x5555555555555555L
        x = (x | (x >>> 1)) & 0x3333333333333333L
        x = (x | (x >>> 2)) & 0x0f0f0f0f0f0f0f0fL
        x = (x | (x >>> 4)) & 0x00ff00ff00ff00ffL
        x = (x | (x >>> 8)) & 0x0000ffff0000ffffL
        (x | (x >>> 16)) & 0xffffffffL
      }
      assert(unspread(z) == a && unspread(z >>> 1) == b)
    }
  }

  test("zorder_key through SQL/codegen matches the scala implementation") {
    ZOrderKey.register(spark)
    val rows = Seq((1L, 2L), (0xffffffffL, 0L), (123456789L, 987654321L))
    val out = rows.toDF("a", "b")
      .select(ZOrderKey.zorderKey(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(out == rows.map { case (a, b) => ZOrderKey.interleave(a, b) })
  }

  test("zorder_key rejects wrong arity with a clear analysis-time error") {
    // regression: the SQL builder indexed children(0)/children(1)
    // unchecked — a one-arg call died with IndexOutOfBoundsException
    ZOrderKey.register(spark)
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val e = intercept[Exception] {
      spark.range(1).selectExpr("zorder_key(id)").collect()
    }
    assert(messages(e).contains("requires exactly 2 arguments"), messages(e))
    val e3 = intercept[Exception] {
      spark.range(1).selectExpr("zorder_key(id, id, id)").collect()
    }
    assert(messages(e3).contains("requires exactly 2 arguments"), messages(e3))
  }

  test("zorder_key stays inside a whole-stage-codegen span") {
    ZOrderKey.register(spark)
    // spark.range (not a local Seq): a LocalTableScan would collapse
    // the whole plan and prove nothing about codegen
    val df = spark.range(100)
      .select(ZOrderKey.zorderKey(col("id"), col("id") * 3).as("z"))
    // `*(n)` is the whole-stage-codegen marker in the simple plan
    // string; an interpreted fallback renders the Project without it
    val p = df.queryExecution.executedPlan.toString
    val zLines = p.linesIterator.filter(_.contains("zorder_key")).toSeq
    assert(zLines.nonEmpty && zLines.forall(_.trim.startsWith("*(")), p)
  }

  test("quantile scaling keeps Z-blocks selective under heavy skew") {
    // dim a lognormal-ish: half the mass crammed into ~1% of the value
    // range — linear scaling maps that bulk onto a handful of key
    // values, so files lose a-selectivity; quantile buckets spread it
    val n = 100000
    val rnd = new scala.util.Random(23)
    val df = (1 to n).map { _ =>
      (math.exp(rnd.nextDouble() * 8).toLong, rnd.nextInt(1000).toLong)
    }.toDF("ka", "kb")
    val root = java.nio.file.Files.createTempDirectory("layout-skew").toString
    Layout.zorderWrite(df, "ka", "kb", s"$root/lin", numFiles = 32)
    Layout.zorderWrite(df, "ka", "kb", s"$root/qnt", numFiles = 32, quantile = true)

    // probe: a narrow value band around the bulk (~median); count files
    // whose [minA, maxA] stats would have to be read
    val lo = 20L; val hi = 60L
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("ka").as("mn"), max("ka").as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo)
        .count()
    val linT = filesTouched(s"$root/lin")
    val qntT = filesTouched(s"$root/qnt")
    assert(qntT < linT,
      s"quantile layout not more selective under skew: qnt=$qntT lin=$linT of 32")
    // both layouts hold identical rows
    assert(spark.read.parquet(s"$root/qnt").count() == n)
  }

  test("quantile path survives a dimension named like a lambda variable") {
    // regression: raw name splicing let a dim named `c` be shadowed by
    // the filter lambda's variable — always-false predicate, every
    // row in bucket 0, silent loss of that dimension's clustering
    val rnd = new scala.util.Random(31)
    val df = (1 to 20000).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("c", "d")
    val dir = java.nio.file.Files.createTempDirectory("layout-lambda").toString + "/t"
    Layout.zorderWrite(df, "c", "d", dir, numFiles = 8, quantile = true)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max("c") - min("c")).as("sc"))
      .agg(avg("sc")).head().getDouble(0)
    assert(spans < 700,
      s"dim `c` lost clustering (avg per-file span $spans of 1000) — lambda shadowing")
  }

  test("Z-ordered layout reads fewer bytes than single-dim sort on the other dim") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // two independent uniform dims; enough rows that parquet stats
    // dominate reader overhead
    val n = 200000
    val rnd = new scala.util.Random(11)
    val df = (1 to n).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong, rnd.nextLong()))
      .toDF("ka", "kb", "payload")
    val root = java.nio.file.Files.createTempDirectory("layout-spec").toString
    val zDir = s"$root/zordered"
    val aDir = s"$root/asorted"
    Layout.zorderWrite(df, "ka", "kb", zDir, numFiles = 16)
    df.repartitionByRange(16, col("ka")).sortWithinPartitions(col("ka"))
      .write.parquet(aDir)

    class BytesRead extends SparkListener {
      val bytes = new java.util.concurrent.atomic.AtomicLong
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    // deterministic drain instead of sleep-polling for a settled
    // counter: LiveListenerBus.waitUntilEmpty blocks until every queued
    // event (incl. our TaskEnds) is delivered. The bus accessor is
    // private[spark], which Scala compiles to a public bytecode method
    // — reflection reaches it without a package-name dodge.
    def drainListenerBus(): Unit = {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      val m = bus.getClass.getMethods
        .filter(_.getName == "waitUntilEmpty")
        .minBy(_.getParameterCount)
      if (m.getParameterCount == 1) m.invoke(bus, java.lang.Long.valueOf(30000L))
      else m.invoke(bus)
    }
    def measure(f: => Unit): Long = {
      val l = new BytesRead
      spark.sparkContext.addSparkListener(l)
      try { f; drainListenerBus() }
      finally spark.sparkContext.removeSparkListener(l)
      l.bytes.get
    }

    // same point filter on kb against both layouts; results identical
    val expected = df.filter(col("kb") === 7).count()
    var zCount = 0L; var aCount = 0L
    val zBytes = measure { zCount = spark.read.parquet(zDir).filter(col("kb") === 7).count() }
    val aBytes = measure { aCount = spark.read.parquet(aDir).filter(col("kb") === 7).count() }
    assert(zCount == expected && aCount == expected,
      s"layouts must not change results: z=$zCount a=$aCount expected=$expected")
    // Z-layout keeps kb min/max narrow per file/row-group, the
    // ka-sorted layout leaves kb full-range everywhere — the kb filter
    // must skip data only under Z. Bound is loose (2x) to stay robust
    // to footer/overhead bytes; the real ratio is far larger.
    assert(zBytes * 2 < aBytes,
      s"no locality win: zBytes=$zBytes aBytes=$aBytes")
  }
}
