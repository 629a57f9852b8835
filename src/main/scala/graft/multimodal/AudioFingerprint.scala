package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Audio fingerprinting — the audio twin of [[ImagePhash]], closing
  * the multimodal near-dup triangle (text simhash64 → image pHash →
  * audio envelope fingerprint; video stays a declared stub, no JDK
  * codec). A 64-bit fingerprint of a clip's ENERGY ENVELOPE, stable
  * under the perturbations a re-delivered clip actually carries —
  * resampling to a different rate, gain changes, mild noise — which
  * all defeat byte-level hashing and most of them defeat the q29
  * amplitude-histogram features (a gain change shifts every histogram
  * bin; the envelope SHAPE is what survives).
  *
  * Construction (the Haitsma–Kalker sign-of-energy-delta shape, at
  * frame grain rather than filterbank grain — the JDK has no FFT, and
  * the envelope delta is the part of that fingerprint that needs no
  * spectral transform):
  *  1. parse RIFF/WAV 16-bit PCM (same chunk-walk as
  *     [[Multimodal.decodeWav]]), average channels to mono;
  *  2. slice the clip into 64 equal-duration frames (duration-
  *     proportional bounds, so a copy resampled at any rate lands the
  *     same content in the same frames) and take per-frame RMS energy;
  *  3. bit f = energy(f) > energy((f+1) mod 64) — the sign of the
  *     temporal energy delta. Ratios of energies are invariant under
  *     uniform gain, so the bits survive amplitude scaling exactly;
  *     resampling preserves the envelope shape up to fringe frames;
  *     noise flips only bits whose adjacent frames were near-equal.
  *
  * Near-dup search reuses [[MultiIndexHamming]] verbatim: 8 × 8-bit
  * chunks, 1-bit multi-probe, radius ≤ 15 guaranteed, inline
  * `bit_count` verify. At 100 TB the fingerprint relation is
  * 16 bytes/clip and the chunk join is the only shuffle; decode
  * parallelism follows [[Multimodal.repartitionForDecode]].
  */
object AudioFingerprint {

  val Frames = 64
  val MaxDistance: Int = MultiIndexHamming.MaxDistance

  /** Mono sample stream (channel-averaged, normalized to [-1, 1]) from
    * RIFF/WAV 16-bit PCM bytes; None if the payload doesn't parse.
    * Same chunk-walk as [[Multimodal.decodeWav]], kept separate because
    * that path folds straight to feature statistics while this one
    * needs the raw envelope.
    */
  def decodeSamplesMono(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4() = { val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII") }
    if (tag4() != "RIFF") return None
    buf.getInt
    if (tag4() != "WAVE") return None
    var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (buf.remaining() >= 8) {
      val id = tag4(); val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return None
      if (id == "fmt ") {
        val p = buf.position()
        if (buf.getShort != 1) return None // PCM only
        channels = buf.getShort; buf.getInt
        buf.getInt; buf.getShort
        bits = buf.getShort
        buf.position(p + len)
      } else if (id == "data") {
        dataOff = buf.position(); dataLen = len
        buf.position(buf.position() + len)
      } else buf.position(buf.position() + len)
      // RIFF word alignment: an odd-sized chunk is followed by one pad
      // byte — common real-world WAVs carry odd-length LIST/INFO text
      // chunks before `data`, and skipping the pad is what keeps the
      // walk on tag boundaries instead of silently failing the clip
      if (len % 2 == 1 && buf.remaining() > 0) buf.position(buf.position() + 1)
    }
    if (channels <= 0 || bits != 16 || dataOff < 0) return None
    val n = dataLen / 2 / channels
    if (n == 0) return None
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = 0.0; var c = 0
      while (c < channels) {
        s += buf.getShort(dataOff + 2 * (i * channels + c)); c += 1
      }
      out(i) = s / channels / 32768.0
      i += 1
    }
    Some(out)
  }

  /** 64-bit energy-envelope fingerprint; None if the payload isn't
    * parseable PCM WAV with at least [[Frames]] samples. Deterministic.
    */
  def afp64(bytes: Array[Byte]): Option[Long] =
    decodeSamplesMono(bytes).filter(_.length >= Frames).map { s =>
      val n = s.length
      val energy = new Array[Double](Frames)
      var f = 0
      while (f < Frames) {
        // Long frame-bound arithmetic: f * n wraps Int for clips past
        // ~34M samples (a 13-minute 44.1 kHz mono WAV) — a negative x0
        // would crash the whole job instead of fingerprinting the clip
        val x0 = (f.toLong * n / Frames).toInt
        val x1 = math.max(((f + 1).toLong * n / Frames).toInt, x0 + 1)
        var sumSq = 0.0; var i = x0
        while (i < x1) { sumSq += s(i) * s(i); i += 1 }
        energy(f) = sumSq / (x1 - x0)
        f += 1
      }
      var bitsOut = 0L
      f = 0
      while (f < Frames) {
        if (energy(f) > energy((f + 1) % Frames)) bitsOut |= (1L << f)
        f += 1
      }
      bitsOut
    }

  /** (media_id, afp) for every parseable audio clip in `media` —
    * mapPartitions decode (the [[Multimodal.extractFeatures]]
    * justification: a byte-level codec is not expressible in Catalyst;
    * everything downstream is relational).
    */
  def fingerprints(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m =>
        if (m.kind == "audio") afp64(m.content).map(m.media_id -> _) else None))
      .toDF("media_id", "afp")
  }

  /** Near-duplicate audio pairs (id_a < id_b, hamming_dist) within
    * `maxDist` fingerprint bits — [[MultiIndexHamming]], exact within
    * the multi-probe radius.
    */
  def nearDuplicates(
      media: Dataset[MediaRecord], maxDist: Int = MaxDistance): DataFrame =
    MultiIndexHamming.nearDuplicatePairs(fingerprints(media), "afp", maxDist)

  /** Persist the (media_id, afp) relation as a probe-able code index —
    * 16 bytes/clip, decoded ONCE; day-2 batches probe the stored codes
    * without re-decoding the corpus (the [[ImagePhash.writeIndex]] /
    * q210 incremental discipline; callers key the dir through
    * [[graft.core.Warehouse.ensureBuilt]] when the source is a stable
    * path).
    */
  def writeIndex(media: Dataset[MediaRecord], indexDir: String): Unit =
    fingerprints(media).write.mode("overwrite").parquet(indexDir)

  /** Incremental near-dup: decode ONLY the new batch, probe the stored
    * fingerprint index ([[MultiIndexHamming.searchAgainst]]) —
    * (probe_id, index_id, hamming_dist), exact within the multi-probe
    * radius.
    */
  def nearDuplicatesAgainst(media: Dataset[MediaRecord], indexDir: String,
      maxDist: Int = MaxDistance): DataFrame =
    MultiIndexHamming.searchAgainst(
      fingerprints(media), media.sparkSession.read.parquet(indexDir), "afp", maxDist)
}
