package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ISO BMFF box walker: encode→parse roundtrip across both mvhd
  * versions, the size==0 (to-end) and size==1 (64-bit largesize)
  * encodings, and the None convention on every structural violation
  * class a torn crawl payload produces.
  */
class Mp4BoxesSpec extends AnyFunSuite {
  import Mp4Boxes._

  test("roundtrip: mvhd version 0 and version 1 recover the encoded fields") {
    Seq(0, 1).foreach { v =>
      val bytes = encodeMp4("isom", timescale = 1200L, duration = 98765L,
        nTracks = 3, mvhdVersion = v, mdatLen = 40, seed = 7)
      assert(parse(bytes).contains(Mp4Meta("isom", 1200L, 98765L, 3)),
        s"mvhd v$v")
    }
  }

  test("version 1 carries a 64-bit duration intact") {
    val big = 0x1_2345_6789L // > u32
    val bytes = encodeMp4("mp42", 600L, big, 1, mvhdVersion = 1,
      mdatLen = 8, seed = 1)
    assert(parse(bytes).map(_.duration).contains(big))
  }

  test("torn moov (declared size overruns buffer) parses to None") {
    assert(parse(corruptMp4("isom")).isEmpty)
  }

  test("structural violations parse to None, never throw") {
    val ok = encodeMp4("avc1", 600L, 1234L, 2, 0, 16, 3)
    assert(parse(Array.empty[Byte]).isEmpty, "empty payload")
    assert(parse(ok.take(6)).isEmpty, "mid-header truncation")
    assert(parse(ok.dropRight(5)).isEmpty, "mid-box truncation")
    assert(parse(ok.drop(20)).isEmpty, "missing ftyp (starts at moov)")
    // size smaller than its own header
    val badSize = ok.clone()
    badSize(0) = 0; badSize(1) = 0; badSize(2) = 0; badSize(3) = 4
    assert(parse(badSize).isEmpty, "box size < header")
    assert(parse(Array.tabulate(64)(i => (i * 37).toByte)).isEmpty, "garbage")
    // zero timescale: structurally addressable but semantically torn —
    // downstream duration arithmetic would divide by zero, so parse
    // must classify it as a violation (fixed offsets: ftyp is 20 bytes,
    // moov header 8, mvhd header 8, v0 timescale at payload +12 → 48)
    val zeroScale = ok.clone()
    zeroScale(48) = 0; zeroScale(49) = 0; zeroScale(50) = 0; zeroScale(51) = 0
    assert(parse(zeroScale).isEmpty, "mvhd timescale=0")
  }

  test("size==0 final box (extends to end of file) is accepted") {
    val ok = encodeMp4("dash", 600L, 500L, 1, 0, 16, 9)
    // mdat is the final top-level box: rewrite its size field to 0
    val mdatOff = {
      // walk: ftyp size at 0, moov follows, mdat last
      def sz(off: Int) = ((ok(off) & 0xff) << 24) | ((ok(off + 1) & 0xff) << 16) |
        ((ok(off + 2) & 0xff) << 8) | (ok(off + 3) & 0xff)
      val afterFtyp = sz(0)
      afterFtyp + sz(afterFtyp)
    }
    val patched = ok.clone()
    patched(mdatOff) = 0; patched(mdatOff + 1) = 0
    patched(mdatOff + 2) = 0; patched(mdatOff + 3) = 0
    assert(parse(patched).contains(Mp4Meta("dash", 600L, 500L, 1)))
  }

  test("size==1 largesize box is walked via its 64-bit length") {
    val ok = encodeMp4("isom", 600L, 500L, 1, 0, 16, 9)
    // rebuild: prepend a hand-built largesize 'free' box, parser must
    // skip it and still find ftyp/moov behind it
    val free = java.nio.ByteBuffer.allocate(24)
    free.putInt(1).put("free".getBytes("US-ASCII")).putLong(24L).put(new Array[Byte](8))
    val bytes = free.array() ++ ok
    assert(parse(bytes).contains(Mp4Meta("isom", 600L, 500L, 1)))
  }
}
