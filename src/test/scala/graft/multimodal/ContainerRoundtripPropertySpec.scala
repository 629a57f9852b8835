package graft.multimodal

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Encode→parse roundtrip PROPERTIES for both container walkers: for
  * arbitrary field values in each format's legal domain, parse must
  * recover exactly what encode embedded — the generalization of the
  * hand-picked roundtrip cases in Mp4BoxesSpec / WebmEbmlSpec, and the
  * in-JVM mirror of the q222/q226 oracle argument (the oracle proves
  * one fixed formula; this proves the codec pair on 500 random
  * corners, including VINT/size-width boundaries the formula corpus
  * never hits).
  */
class ContainerRoundtripPropertySpec extends AnyFunSuite {

  private val brands = Gen.oneOf("isom", "mp42", "avc1", "dash", "qt  ")

  test("ScalaCheck: mp4 encode→parse roundtrips over random field values") {
    val genCase = for {
      brand <- brands
      version <- Gen.oneOf(0, 1)
      timescale <- Gen.choose(1L, 0xffffffffL) // u32 domain, nonzero
      duration <- if (version == 0) Gen.choose(0L, 0xffffffffL)
        else Gen.choose(0L, Long.MaxValue / 2)
      tracks <- Gen.choose(0, 12)
      mdat <- Gen.choose(0, 2048)
      seed <- Gen.choose(0L, 1L << 40)
    } yield (brand, version, timescale, duration, tracks, mdat, seed)
    val prop = Prop.forAll(genCase) {
      case (brand, v, ts, dur, n, mdat, seed) =>
        Mp4Boxes.parse(Mp4Boxes.encodeMp4(brand, ts, dur, n, v, mdat, seed))
          .contains(Mp4Boxes.Mp4Meta(brand, ts, dur, n))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("ScalaCheck: webm encode→parse roundtrips over random field values") {
    val genCase = for {
      dt <- Gen.oneOf("webm", "matroska")
      scale <- Gen.choose(1L, 1L << 40)
      // double-exact integer ticks (the muxer convention parse relies on)
      ticks <- Gen.choose(0L, 1L << 50)
      tracks <- Gen.choose(0, 12)
      filler <- Gen.choose(0, 2048)
      omitScale <- Gen.oneOf(true, false)
      omitDur <- Gen.oneOf(true, false)
      seed <- Gen.choose(0L, 1L << 40)
    } yield (dt, scale, ticks, tracks, filler, omitScale, omitDur, seed)
    val prop = Prop.forAll(genCase) {
      case (dt, scale, ticks, n, filler, omitScale, omitDur, seed) =>
        val parsed = WebmEbml.parse(WebmEbml.encodeWebm(
          dt, scale, ticks, n, filler, seed,
          omitScale = omitScale, omitDuration = omitDur))
        val wantScale = if (omitScale) 1000000L else scale
        val wantDur = if (omitDur) None else Some(ticks)
        parsed.contains(WebmEbml.WebmMeta(dt, wantScale, wantDur, n))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
