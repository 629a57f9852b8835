package graft.multimodal

import scala.util.Random

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz hardening for the two container-metadata walkers: at corpus
  * scale a crawler feeds them arbitrary bytes, so `parse` must be
  * TOTAL — Some or None, never a throw — on (a) random garbage,
  * (b) every prefix truncation of a valid file, and (c) valid files
  * with random single-byte corruptions (which may still parse when
  * the flip lands in filler — the property is no-throw, not None).
  */
class ContainerFuzzSpec extends AnyFunSuite {

  private def totalOn(bytes: Array[Byte], f: Array[Byte] => Option[Any]): Boolean =
    try { f(bytes); true } catch { case _: Throwable => false }

  test("ScalaCheck: both parsers are total on arbitrary byte arrays") {
    val genBytes = Gen.choose(0, 512).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray))
    val prop = Prop.forAll(genBytes) { bs =>
      totalOn(bs, Mp4Boxes.parse) && totalOn(bs, WebmEbml.parse)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("every prefix truncation of a valid mp4 and webm parses without throwing") {
    val mp4 = Mp4Boxes.encodeMp4("isom", 600L, 4321L, 2, 0, 64, 11)
    val webm = WebmEbml.encodeWebm("webm", 1000000L, 4321L, 2, 64, 11)
    (0 until mp4.length).foreach { n =>
      assert(totalOn(mp4.take(n), Mp4Boxes.parse), s"mp4 truncated at $n threw")
    }
    (0 until webm.length).foreach { n =>
      assert(totalOn(webm.take(n), WebmEbml.parse), s"webm truncated at $n threw")
    }
  }

  test("single-byte corruptions of valid files never throw (1000 seeded flips each)") {
    val mp4 = Mp4Boxes.encodeMp4("mp42", 1200L, 777L, 3, 1, 64, 7)
    val webm = WebmEbml.encodeWebm("matroska", 2000000L, 777L, 3, 64, 7)
    val rnd = new Random(0xfeedbeef)
    (0 until 1000).foreach { i =>
      val m = mp4.clone(); m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      assert(totalOn(m, Mp4Boxes.parse), s"mp4 flip case $i threw")
      val w = webm.clone(); w(rnd.nextInt(w.length)) = rnd.nextInt(256).toByte
      assert(totalOn(w, WebmEbml.parse), s"webm flip case $i threw")
    }
  }
}
