package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** EBML/Matroska header walker: encode→parse roundtrip across both
  * DocTypes, VINT length edges, the TimestampScale spec default, the
  * unknown-size Segment encoding, and the None convention on torn
  * payloads.
  */
class WebmEbmlSpec extends AnyFunSuite {
  import WebmEbml._

  test("roundtrip recovers DocType, scale, integer-float duration, and track count") {
    Seq("webm", "matroska").foreach { dt =>
      val bytes = encodeWebm(dt, timestampScaleNs = 2000000L,
        durationTicks = 54321L, nTracks = 3, fillerLen = 32, seed = 5)
      assert(parse(bytes).contains(WebmMeta(dt, 2000000L, Some(54321L), 3)), dt)
    }
  }

  test("VINT edges: sizes needing 2-byte VINTs (>=127) walk correctly") {
    // a track list long enough that Tracks' payload size crosses the
    // 1-byte VINT ceiling (127), and a filler crossing it too
    val bytes = encodeWebm("webm", 1000000L, 99L, nTracks = 40,
      fillerLen = 200, seed = 2)
    assert(parse(bytes).contains(WebmMeta("webm", 1000000L, Some(99L), 40)))
  }

  test("missing TimestampScale falls back to the spec default 1,000,000 ns") {
    val noScale = encodeWebm("webm", 555L /* ignored */, 77L, 1, 8, 1,
      omitScale = true)
    assert(parse(noScale).contains(WebmMeta("webm", 1000000L, Some(77L), 1)))
  }

  test("unknown-size Segment (all-ones VINT) extends to end of payload") {
    val ok = encodeWebm("webm", 1000000L, 500L, 2, 16, 9)
    // locate the Segment size VINT: EBML element first, then Segment's
    // 4-byte ID; rewrite its size VINT to the 1-byte unknown marker
    // 0xFF and splice (the payload bytes that followed stay in place —
    // the element now simply claims them "to end")
    def vintLen(first: Int) = java.lang.Integer.numberOfLeadingZeros(first) - 23
    val ebmlSizeOff = 4
    val ebmlSizeLen = vintLen(ok(ebmlSizeOff) & 0xff)
    val ebmlPayload = {
      var v = (ok(ebmlSizeOff) & 0xff & ((1 << (8 - ebmlSizeLen)) - 1)).toLong
      (1 until ebmlSizeLen).foreach(i => v = (v << 8) | (ok(ebmlSizeOff + i) & 0xffL))
      v.toInt
    }
    val segIdOff = ebmlSizeOff + ebmlSizeLen + ebmlPayload
    val segSizeOff = segIdOff + 4
    val segSizeLen = vintLen(ok(segSizeOff) & 0xff)
    val patched = ok.take(segSizeOff) ++ Array(0xff.toByte) ++
      ok.drop(segSizeOff + segSizeLen)
    assert(parse(patched).contains(WebmMeta("webm", 1000000L, Some(500L), 2)),
      "unknown-size Segment must parse to the same metadata")
  }

  test("missing Duration is valid (live recordings) — metadata parses with durationTicks None") {
    val live = encodeWebm("webm", 2000000L, 0L /* ignored */, 2, 8, 4,
      omitDuration = true)
    assert(parse(live).contains(WebmMeta("webm", 2000000L, None, 2)))
  }

  test("structural violations parse to None, never throw") {
    val ok = encodeWebm("matroska", 1000000L, 123L, 2, 16, 3)
    assert(parse(Array.empty[Byte]).isEmpty, "empty payload")
    assert(parse(corruptWebm("webm")).isEmpty, "torn Segment")
    assert(parse(ok.take(3)).isEmpty, "mid-ID truncation")
    assert(parse(ok.dropRight(4)).isEmpty, "mid-element truncation")
    assert(parse(ok.drop(9)).isEmpty, "missing EBML header")
    assert(parse(Array.tabulate(64)(i => (i * 53).toByte)).isEmpty, "garbage")
    val zeroLead = ok.clone(); zeroLead(0) = 0
    assert(parse(zeroLead).isEmpty, ">8-byte VINT lead-in")
  }
}
