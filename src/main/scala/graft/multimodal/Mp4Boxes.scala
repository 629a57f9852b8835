package graft.multimodal

/** Minimal ISO BMFF (ISO/IEC 14496-12, the public MP4 container
  * layout) box parser — the metadata-grain half of the video decode
  * seam. The container's header atoms are plain length-prefixed binary
  * (no codec required), so duration / timescale / brand / track count
  * are extractable as typed columns with nothing but byte arithmetic:
  * a real operator over `video/mp4` payloads where frame DECODE still
  * needs a codec the JVM lacks (see [[VideoFrames]]'s GIF path and the
  * declared mp4 frame stub — reference analogue: the landing payload
  * diversity at `flows/landing.py:27-53`).
  *
  * Layout walked here (all offsets fixed by the spec):
  *   - every box: size u32 + type fourcc; size==1 → u64 largesize
  *     follows; size==0 → box extends to end of enclosure
  *   - `ftyp`: major_brand fourcc + minor_version u32 + compatible
  *     brands
  *   - `moov`: container; its `mvhd` child (FullBox) carries
  *     version 0 → timescale u32 @ +12, duration u32 @ +16;
  *     version 1 → timescale u32 @ +20, duration u64 @ +24
  *   - `trak` children of `moov`: one per track
  *
  * CORRUPT-PAYLOAD CONVENTION: any structural violation — a box
  * overrunning its enclosure, a size smaller than its own header, a
  * missing `ftyp`/`moov`/`mvhd`, a truncated `mvhd`, an unknown mvhd
  * version — parses to None, never throws: at corpus scale a crawler's
  * torn payloads are data, not exceptions.
  */
object Mp4Boxes {

  /** Typed header metadata of one mp4 payload. `duration` is in
    * `timescale` units per the spec; millisecond conversion is the
    * caller's (exact: duration·1000 / timescale, floor).
    */
  final case class Mp4Meta(
      majorBrand: String, timescale: Long, duration: Long, nTracks: Int)

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Child boxes of the byte range [from, until): (type, payloadFrom,
    * payloadUntil) per box, or None on any structural violation.
    */
  private def children(
      b: Array[Byte], from: Int, until: Int): Option[Seq[(String, Int, Int)]] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var off = from
    while (off < until) {
      if (off + 8 > until) return None
      val size32 = u32(b, off)
      val typ = fourcc(b, off + 4)
      var header = 8L
      val size: Long =
        if (size32 == 1L) {
          if (off + 16 > until) return None
          header = 16L
          u64(b, off + 8)
        } else if (size32 == 0L) (until - off).toLong
        else size32
      if (size < header || off + size > until) return None
      out += ((typ, off + header.toInt, off + size.toInt))
      off += size.toInt
    }
    Some(out.result())
  }

  /** mvhd payload → (timescale, duration); versions 0 and 1 only (the
    * spec defines no others).
    */
  private def mvhd(b: Array[Byte], from: Int, until: Int): Option[(Long, Long)] = {
    if (until - from < 4) return None
    val td = (b(from) & 0xff) match {
      case 0 if until - from >= 20 => Some((u32(b, from + 12), u32(b, from + 16)))
      case 1 if until - from >= 32 => Some((u32(b, from + 20), u64(b, from + 24)))
      case _ => None
    }
    // a zero timescale is a structural violation (the spec defines it
    // as ticks-per-second; zero makes every duration arithmetic a
    // division by zero downstream — "torn payloads are data, not
    // exceptions" must hold here too)
    td.filter(_._1 != 0L)
  }

  /** Parse one mp4 payload's header atoms. None = structurally invalid
    * (see the corrupt-payload convention above).
    */
  def parse(bytes: Array[Byte]): Option[Mp4Meta] =
    if (bytes == null) None
    else for {
      top <- children(bytes, 0, bytes.length)
      ftyp <- top.find(_._1 == "ftyp")
      brand <- if (ftyp._3 - ftyp._2 >= 8) Some(fourcc(bytes, ftyp._2)) else None
      moov <- top.find(_._1 == "moov")
      kids <- children(bytes, moov._2, moov._3)
      mv <- kids.find(_._1 == "mvhd")
      td <- mvhd(bytes, mv._2, mv._3)
    } yield Mp4Meta(brand, td._1, td._2, kids.count(_._1 == "trak"))

  // ===== deterministic encoder (test/demo corpus) ==========================

  private final class Buf {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): this.type = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt); this
    }
    def u64(v: Long): this.type = { u32(v >>> 32); u32(v & 0xffffffffL) }
    def u16(v: Int): this.type = { out.write((v >> 8) & 0xff); out.write(v & 0xff); this }
    def ascii(s: String): this.type = {
      out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)); this
    }
    def zeros(n: Int): this.type = { out.write(new Array[Byte](n)); this }
    def box(typ: String)(body: Buf => Unit): this.type = {
      val inner = new Buf; body(inner)
      val payload = inner.out.toByteArray
      u32(8L + payload.length); ascii(typ); out.write(payload); this
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** A REAL (spec-layout) mp4 header: ftyp + moov(mvhd, trak×n) + mdat
    * with deterministic filler. mvhd uses version 0 or 1 per
    * `mvhdVersion` — both live in the wild, so the parser must handle
    * both. Full-width mvhd/tkhd payloads (rate/matrix/etc. zeroed) keep
    * the fixed offsets honest.
    */
  def encodeMp4(
      majorBrand: String, timescale: Long, duration: Long, nTracks: Int,
      mvhdVersion: Int, mdatLen: Int, seed: Long): Array[Byte] = {
    require(majorBrand.length == 4, s"fourcc brand, got '$majorBrand'")
    require(mvhdVersion == 0 || mvhdVersion == 1, s"mvhd version $mvhdVersion")
    val b = new Buf
    b.box("ftyp") { f => f.ascii(majorBrand).u32(0L).ascii(majorBrand) }
    b.box("moov") { m =>
      m.box("mvhd") { h =>
        if (mvhdVersion == 0)
          h.u32(0L) // version 0 + flags
            .u32(0L).u32(0L) // creation, modification
            .u32(timescale).u32(duration)
            .u32(0x00010000L).u16(0x0100).u16(0) // rate, volume, reserved
            .zeros(8) // reserved
            .zeros(36) // matrix
            .zeros(24) // pre_defined
            .u32(nTracks + 1L) // next_track_ID
        else
          h.u32(0x01000000L) // version 1 + flags
            .u64(0L).u64(0L) // creation, modification
            .u32(timescale).u64(duration)
            .u32(0x00010000L).u16(0x0100).u16(0)
            .zeros(8).zeros(36).zeros(24)
            .u32(nTracks + 1L)
      }
      (1 to nTracks).foreach { t =>
        m.box("trak") { tr =>
          tr.box("tkhd") { h =>
            h.u32(0L).u32(0L).u32(0L).u32(t.toLong).u32(0L).u32(duration)
              .zeros(8).u16(0).u16(0).u16(0).u16(0).zeros(36).u32(0L).u32(0L)
          }
        }
      }
    }
    b.box("mdat") { d =>
      d.out.write(Array.tabulate(mdatLen)(j => ((seed * 31 + j * 7) % 251).toByte))
    }
    b.bytes
  }

  /** A torn payload: valid ftyp, then a moov header whose declared
    * size overruns the buffer — the crawler-truncation case the None
    * convention exists for.
    */
  def corruptMp4(majorBrand: String): Array[Byte] = {
    val b = new Buf
    b.box("ftyp") { f => f.ascii(majorBrand).u32(0L).ascii(majorBrand) }
    b.u32(4096L).ascii("moov") // declares 4 KB, carries none
    b.bytes
  }
}
