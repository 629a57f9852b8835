package graft.multimodal

/** Minimal EBML / Matroska (webm) header parser — the second codec-free
  * metadata face of the video seam beside [[Mp4Boxes]]. EBML (RFC 8794)
  * is the public length-prefixed binary layout under webm/mkv: every
  * element is (variable-length ID, variable-length size VINT, payload),
  * so DocType / TimestampScale / Duration / track count are extractable
  * with byte arithmetic and no codec, exactly like mp4's header atoms.
  *
  * Elements walked (IDs as registered in the public Matroska spec):
  *   - EBML header `0x1A45DFA3` → DocType `0x4282` (ascii)
  *   - Segment `0x18538067` (unknown-size allowed → extends to end)
  *     - Info `0x1549A966` → TimestampScale `0x2AD7B1` (uint, ns;
  *       default 1,000,000), Duration `0x4489` (float32/float64, in
  *       timestamp-scale ticks)
  *     - Tracks `0x1654AE6B` → one TrackEntry `0xAE` per track
  *
  * CORRUPT-PAYLOAD CONVENTION (same as [[Mp4Boxes]]): any structural
  * violation — a VINT running off the buffer, an element overrunning
  * its enclosure, missing EBML/Segment/Info, a Duration of unexpected
  * width — parses to None, never throws.
  */
object WebmEbml {

  /** Typed header metadata of one webm/mkv payload. `durationTicks` is
    * the Duration float truncated to ticks (exact when the float holds
    * an integer, which muxers write) — None when the element is absent,
    * which is LEGAL Matroska (live/unfinalized recordings omit it), so
    * a Duration-less file is metadata-valid, not corrupt; ms = ticks ·
    * timestampScaleNs / 1e6, the caller's arithmetic.
    */
  final case class WebmMeta(
      docType: String, timestampScaleNs: Long, durationTicks: Option[Long],
      nTracks: Int)

  // ---- VINT machinery ----------------------------------------------------

  /** Leading-zero-prefixed variable-length integer at `off`:
    * (value, encodedLength). `keepMarker` keeps the length-marker bit
    * in the value (element IDs compare as stored, marker included);
    * size VINTs strip it. None if the VINT runs off `until`.
    */
  private def vint(
      b: Array[Byte], off: Int, until: Int,
      keepMarker: Boolean): Option[(Long, Int)] = {
    if (off >= until) return None
    val first = b(off) & 0xff
    if (first == 0) return None // >8-byte VINT: out of scope, malformed here
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 32-8 bits
    if (len < 1 || len > 8 || off + len > until) return None
    var v: Long =
      if (keepMarker) first.toLong
      else first.toLong & ((1L << (8 - len)) - 1)
    var i = 1
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    Some((v, len))
  }

  /** All-value-bits-ones size VINT = "unknown size" (RFC 8794 §4.1):
    * the element extends to the end of its enclosure. Only Segment
    * uses it in practice.
    */
  private def isUnknownSize(size: Long, sizeLen: Int): Boolean =
    size == (1L << (7 * sizeLen)) - 1

  /** Child elements of [from, until): (id, payloadFrom, payloadUntil),
    * or None on any structural violation.
    */
  private def children(
      b: Array[Byte], from: Int, until: Int): Option[Seq[(Long, Int, Int)]] = {
    val out = Seq.newBuilder[(Long, Int, Int)]
    var off = from
    while (off < until) {
      val (id, idLen) = vint(b, off, until, keepMarker = true) match {
        case Some(x) => x
        case None => return None
      }
      val (size, sizeLen) = vint(b, off + idLen, until, keepMarker = false) match {
        case Some(x) => x
        case None => return None
      }
      val pFrom = off + idLen + sizeLen
      val pUntil =
        if (isUnknownSize(size, sizeLen)) until
        else {
          if (size > until - pFrom) return None
          pFrom + size.toInt
        }
      out += ((id, pFrom, pUntil))
      off = pUntil
    }
    Some(out.result())
  }

  private def uintAt(b: Array[Byte], from: Int, until: Int): Option[Long] = {
    val n = until - from
    if (n < 1 || n > 8) return None
    var v = 0L; var i = from
    while (i < until) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    Some(v)
  }

  private def floatAt(b: Array[Byte], from: Int, until: Int): Option[Double] =
    until - from match {
      case 4 => uintAt(b, from, until).map(v =>
        java.lang.Float.intBitsToFloat(v.toInt).toDouble)
      case 8 => uintAt(b, from, until).map(java.lang.Double.longBitsToDouble)
      case _ => None
    }

  // ---- element IDs (public Matroska registry) ------------------------------

  private val EbmlHeader = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL

  /** Parse one webm/mkv payload's header elements. None = structurally
    * invalid (see the corrupt-payload convention above).
    */
  def parse(bytes: Array[Byte]): Option[WebmMeta] =
    if (bytes == null) None
    else for {
      top <- children(bytes, 0, bytes.length)
      ebml <- top.find(_._1 == EbmlHeader)
      hdrKids <- children(bytes, ebml._2, ebml._3)
      dt <- hdrKids.find(_._1 == DocType)
      docType = new String(bytes, dt._2, dt._3 - dt._2,
        java.nio.charset.StandardCharsets.US_ASCII)
      seg <- top.find(_._1 == Segment)
      segKids <- children(bytes, seg._2, seg._3)
      info <- segKids.find(_._1 == Info)
      infoKids <- children(bytes, info._2, info._3)
      // absent → spec default; PRESENT but malformed → None (a torn
      // scale must not silently become the default)
      scale <- infoKids.find(_._1 == TimestampScale) match {
        case Some(e) => uintAt(bytes, e._2, e._3)
        case None => Some(1000000L)
      }
      // Duration is OPTIONAL (live recordings omit it — still valid);
      // present-but-malformed is a structural violation like the scale
      dur <- infoKids.find(_._1 == Duration) match {
        case Some(e) => floatAt(bytes, e._2, e._3).map(d => Some(d.toLong))
        case None => Some(None)
      }
      tracks <- segKids.find(_._1 == Tracks)
      trackKids <- children(bytes, tracks._2, tracks._3)
    } yield WebmMeta(docType, scale, dur,
      trackKids.count(_._1 == TrackEntry))

  // ===== deterministic encoder (test/demo corpus) ==========================

  private final class Buf {
    val out = new java.io.ByteArrayOutputStream()
    def raw(bs: Int*): this.type = { bs.foreach(out.write); this }
    def id(v: Long): this.type = { // IDs are stored marker-included
      val len = (63 - java.lang.Long.numberOfLeadingZeros(v)) / 8 + 1
      var i = len - 1
      while (i >= 0) { out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
      this
    }
    def sizeVint(v: Long): this.type = {
      // shortest length whose value space holds v (avoid the all-ones
      // "unknown" pattern by widening when v hits it)
      var len = 1
      while (len < 8 && (v >= (1L << (7 * len)) - 1)) len += 1
      val marked = v | (1L << (7 * len))
      var i = len - 1
      while (i >= 0) { out.write(((marked >> (8 * i)) & 0xff).toInt); i -= 1 }
      this
    }
    def element(eid: Long)(body: Buf => Unit): this.type = {
      val inner = new Buf; body(inner)
      val payload = inner.out.toByteArray
      id(eid); sizeVint(payload.length.toLong); out.write(payload); this
    }
    def uint(v: Long): this.type = {
      val len = math.max(1, (63 - java.lang.Long.numberOfLeadingZeros(v)) / 8 + 1)
      var i = len - 1
      while (i >= 0) { out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
      this
    }
    def float8(v: Double): this.type = {
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 7
      while (i >= 0) { out.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
      this
    }
    def ascii(s: String): this.type = {
      out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)); this
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** A REAL (spec-layout) webm/mkv header: EBML(DocType) +
    * Segment(Info(TimestampScale, Duration), Tracks(TrackEntry×n)) +
    * deterministic cluster filler. Duration is written as a float64 of
    * an integer tick count — what muxers do — so parse recovers it
    * exactly.
    */
  def encodeWebm(
      docType: String, timestampScaleNs: Long, durationTicks: Long,
      nTracks: Int, fillerLen: Int, seed: Long,
      omitScale: Boolean = false, omitDuration: Boolean = false): Array[Byte] = {
    val b = new Buf
    b.element(EbmlHeader) { h => h.element(DocType)(_.ascii(docType)) }
    b.element(Segment) { s =>
      s.element(Info) { in =>
        // a muxer may omit TimestampScale entirely (spec default
        // 1,000,000 ns) — `omitScale` exercises the fallback; a live/
        // unfinalized muxer omits Duration — `omitDuration` exercises
        // the valid-but-durationless path
        if (!omitScale) in.element(TimestampScale)(_.uint(timestampScaleNs))
        if (!omitDuration) in.element(Duration)(_.float8(durationTicks.toDouble))
      }
      s.element(Tracks) { tr =>
        (1 to nTracks).foreach { t =>
          tr.element(TrackEntry)(_.uint(t.toLong))
        }
      }
      // an opaque Void element stands in for cluster data
      s.element(0xECL) { v =>
        v.out.write(Array.tabulate(fillerLen)(j => ((seed * 29 + j * 11) % 241).toByte))
      }
    }
    b.bytes
  }

  /** A torn payload: valid EBML header, then a Segment whose declared
    * size overruns the buffer with a truncated Info inside — the
    * crawler-truncation case.
    */
  def corruptWebm(docType: String): Array[Byte] = {
    val b = new Buf
    b.element(EbmlHeader) { h => h.element(DocType)(_.ascii(docType)) }
    b.id(Segment).sizeVint(4096L).id(Info).sizeVint(64L) // declares, carries nothing
    b.bytes
  }
}
