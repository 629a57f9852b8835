package graft.medallion

import graft.SparkTestBase

/** S13 — the display sink (the reference drives every flow's result
  * through `df.show()`, main.py:18-86): `Dataset.show` renders an
  * ASCII table of the ACTUAL rows to the console. The one §2 row that
  * was "trivially untested": captured here via Console redirection,
  * closing the checklist at 52/52 verified.
  */
class DisplaySinkSpec extends SparkTestBase {
  import spark.implicits._

  test("df.show renders headers, grid, and row values to the console") {
    val df = Seq((1L, "norway", 4.5), (2L, "brazil", 3.0))
      .toDF("band_id", "country", "avg_score")
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      df.orderBy($"band_id").show(20, truncate = false)
    }
    val out = buf.toString("UTF-8")
    assert(out.contains("band_id") && out.contains("country") && out.contains("avg_score"),
      s"missing headers:\n$out")
    assert(out.contains("+--"), s"missing ASCII grid:\n$out")
    assert(out.contains("norway") && out.contains("brazil") && out.contains("4.5"),
      s"missing row values:\n$out")
    // honest sink: shows only the requested prefix
    val short = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(short, true, "UTF-8")) {
      df.orderBy($"band_id").show(1, truncate = false)
    }
    val s = short.toString("UTF-8")
    assert(s.contains("norway") && !s.contains("brazil"),
      s"show(1) must truncate the display:\n$s")
    assert(s.contains("only showing top 1 row"), s)
  }
}
