package graft.multimodal

import graft.SparkTestBase

/** Audio fingerprint near-dup (q208 surface, AudioFingerprint): the
  * planted resample/gain/noise copies land within the operating
  * radius through the REAL WAV byte path, distinct envelopes stay far
  * outside it, and the fingerprint really is gain-invariant.
  */
class AudioNearDupSpec extends SparkTestBase {

  private val groups = 8

  test("audio near-dup finds every planted resample/gain/noise copy; no cross-group pair") {
    val media = Multimodal.audioDedupCorpus(spark, groups)
    val pairs = AudioFingerprint.nearDuplicates(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

    def group(id: Long): Long = id % 1000
    assert(pairs.nonEmpty)
    assert(pairs.forall(p => group(p._1) == group(p._2)),
      s"cross-group pair found: ${pairs.filterNot(p => group(p._1) == group(p._2)).toSeq}")

    // every (original, copy) pair is present, well inside the radius
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    (0 until groups).foreach { g =>
      Seq(1000L + g, 2000L + g, 3000L + g).foreach { copy =>
        val d = byPair.get((g.toLong, copy))
        assert(d.isDefined, s"planted pair ($g, $copy) not found")
        assert(d.get <= 8, s"planted pair ($g, $copy) at distance ${d.get}")
      }
    }
  }

  test("distinct envelopes are far apart: min cross-group distance beyond the radius") {
    val media = Multimodal.audioDedupCorpus(spark, groups)
      .filter(_.media_id < 1000) // originals only
    val fps = AudioFingerprint.fingerprints(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(fps.length == groups)
    val dists = for {
      (ia, ha) <- fps; (ib, hb) <- fps if ia < ib
    } yield java.lang.Long.bitCount(ha ^ hb)
    assert(dists.min > AudioFingerprint.MaxDistance,
      s"distinct envelopes must separate: min ${dists.min}")
  }

  test("the fingerprint is exactly gain-invariant on unquantized ratios") {
    // pure-tone clip with a two-level envelope: halving the gain scales
    // every frame energy by the same factor, so every energy-delta
    // comparison — and the fingerprint — is unchanged
    def clip(gain: Double): Array[Byte] = {
      val rate = 8000
      val s = Array.tabulate(rate) { t =>
        val env = if ((t * 64 / rate) % 2 == 0) 0.9 else 0.3
        (gain * env * math.sin(2 * math.Pi * 440 * t / rate) * 20000).toShort
      }
      Multimodal.encodeWavMono(rate, s)
    }
    val (a, b) = (AudioFingerprint.afp64(clip(1.0)), AudioFingerprint.afp64(clip(0.5)))
    assert(a.isDefined && b.isDefined)
    assert(a.get == b.get, f"gain must not move the fingerprint: ${a.get}%016x vs ${b.get}%016x")
    // and the alternating envelope is what the bits encode: 32 rises
    assert(java.lang.Long.bitCount(a.get) == 32, a.get.toBinaryString)
  }

  test("non-audio and corrupt payloads yield no fingerprint, not garbage") {
    assert(AudioFingerprint.afp64(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioFingerprint.afp64("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }

  test("RIFF word alignment: an odd-length metadata chunk before data still parses") {
    // common real-world shape: an ICMT/LIST text chunk with an odd byte
    // length, padded to the word boundary per the WAV spec — a walk
    // that ignores the pad lands off-boundary and silently drops the clip
    val plain = {
      val s = Array.tabulate(8000)(t =>
        (0.5 * math.sin(2 * math.Pi * 440 * t / 8000) * 20000).toShort)
      Multimodal.encodeWavMono(8000, s)
    }
    // splice an odd-length LIST chunk (len 7 + 1 pad byte) after "WAVE"
    val chunk = java.nio.ByteBuffer.allocate(8 + 7 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("LIST".getBytes("US-ASCII")).putInt(7)
      .put("INFOxyz".getBytes("US-ASCII")).put(0.toByte)
    val withMeta = {
      val out = java.nio.ByteBuffer.allocate(plain.length + chunk.capacity())
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(plain, 0, 12) // RIFF + size + WAVE
      out.put(chunk.array())
      out.put(plain, 12, plain.length - 12)
      // patch the RIFF size field for the inserted bytes
      out.putInt(4, plain.length - 8 + chunk.capacity())
      out.array()
    }
    val (a, b) = (AudioFingerprint.afp64(plain), AudioFingerprint.afp64(withMeta))
    assert(b.isDefined, "odd-chunk WAV must parse, not silently drop")
    assert(a == b, "metadata chunks must not move the fingerprint")
    assert(Multimodal.decodeWav(withMeta).isDefined,
      "the feature decoder shares the aligned walk")
  }
}
