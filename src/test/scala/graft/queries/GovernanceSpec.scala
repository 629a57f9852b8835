package graft.queries

import graft.SparkTestBase

/** Governance audits: planted FD violations, a rigged digit
  * distribution, and hand-exact kappa tables.
  */
class GovernanceSpec extends SparkTestBase {
  import spark.implicits._

  private def md5FirstByte(s: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d(0) & 0xff
  }

  test("q159: mirror plant violates fp->source everywhere, fp->lang only under bucket 32") {
    val dir = java.nio.file.Files.createTempDirectory("gov-spec").toString
    // pick one text whose md5 bucket (first byte) < 32 and one >= 32 so the
    // lang-loss plant hits exactly one group
    val low = (1 to 1000).map(i => s"low candidate text $i")
      .find(t => md5FirstByte(t) < 32).get
    val high = (1 to 1000).map(i => s"high candidate text $i")
      .find(t => md5FirstByte(t) >= 32).get
    Seq((1L, low, "en", "web", low.length.toLong),
      (2L, high, "fr", "web", high.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = GovernanceQueries.q159FdViolations(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // 2 keys, every key duplicated by the mirror; both groups conflict on
    // source (web vs mirror); only `low`'s group loses its lang
    val lang = out("fp_to_lang")
    assert((lang._2, lang._3, lang._4, lang._5, lang._6) == ((2L, 2L, 1L, 2L, 5000L)),
      s"fp_to_lang: $lang")
    val src = out("fp_to_source")
    assert((src._2, src._3, src._4, src._5, src._6) == ((2L, 2L, 2L, 4L, 10000L)),
      s"fp_to_source: $src")
  }

  test("q160: Benford expectations sum to exactly 1e6; a rigged single-digit table maxes obs") {
    val out = GovernanceQueries.q160BenfordDigits(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._4).sum == 1000000L, "hardcoded Benford micros must sum to 1e6")
    assert(out.forall(r => r._3 >= 0 && r._3 <= 1000000 && r._5 >= 0))
    // rigged: all totals start with 9 -> obs(9) = 1e6 exactly, one row
    val dir = java.nio.file.Files.createTempDirectory("gov-spec").toString
    (1 to 8).map(i => (i.toLong, 100L + i, "O", 9000.0 + i,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val rigged = GovernanceQueries.q160BenfordDigits(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // chi2 contribution: (1000000 - 45757)^2 // 45757 = 19900336
    assert(rigged == Seq(("9", 8L, 1000000L, 45757L, 19900336L)), s"got $rigged")
  }

  test("q161: perfect agreement scores kappa 1e6; independence scores 0") {
    def doc(id: Long, a: Boolean, b: Boolean) = {
      val text = if (a) Seq.fill(25)("w").mkString(" ") else "short text"
      (id, text, "en", "s", if (b) 200L else 10L)
    }
    val dir1 = java.nio.file.Files.createTempDirectory("gov-spec").toString
    Seq(doc(1, true, true), doc(2, true, true), doc(3, false, false),
      doc(4, false, false))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir1/documents.parquet")
    val k1 = GovernanceQueries.q161KappaAgreement(spark, dir1)
      .select("kappa_micro").as[Long].head()
    assert(k1 == 1000000L, s"perfect agreement: $k1")

    val dir2 = java.nio.file.Files.createTempDirectory("gov-spec").toString
    Seq(doc(1, true, true), doc(2, true, false), doc(3, false, true),
      doc(4, false, false))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    val out = GovernanceQueries.q161KappaAgreement(spark, dir2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(out == ((4L, 1L, 1L, 1L, 1L, 500000L, 500000L, 0L)), s"independence: $out")
  }

  test("q161: worse-than-chance disagreement yields a negative kappa, trunc-semantics exact") {
    def doc(id: Long, a: Boolean, b: Boolean) = {
      val text = if (a) Seq.fill(25)("w").mkString(" ") else "short text"
      (id, text, "en", "s", if (b) 200L else 10L)
    }
    // anti-correlated signals: n11=0, n10=1, n01=1, n00=1 ->
    // po = 1e6 div 3 = 333333, pe = 5e6 div 9 = 555555,
    // kappa = -((222222 * 1e6) div 444445) = -499998 under truncation
    // toward zero on the NONNEGATIVE operand (a floored negative
    // division would give -499999 — the engine-divergence this pins).
    val dir = java.nio.file.Files.createTempDirectory("gov-spec").toString
    Seq(doc(1, true, false), doc(2, false, true), doc(3, false, false))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = GovernanceQueries.q161KappaAgreement(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(out == ((3L, 0L, 1L, 1L, 1L, 333333L, 555555L, -499998L)),
      s"negative kappa: $out")
  }
}
