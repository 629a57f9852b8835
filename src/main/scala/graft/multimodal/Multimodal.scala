package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed media record: opaque binary payload + structured metadata —
  * the multimodal-column data model (image/audio/video as `binary`
  * with typed sidecar metadata).
  */
final case class MediaRecord(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    mime: String,
    width: Int,
    height: Int,
    duration_ms: Long,
    content: Array[Byte])

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    features: Array[Float])

/** Multimodal-column plumbing for training-data pipelines: schema,
  * size-aware partitioning, and batched per-partition decode /
  * feature-extract / resize / frame-sample.
  *
  * ==Decode status==
  * Image and audio features derive from ACTUAL BYTES using only the
  * JDK: PNG/JPEG via `javax.imageio.ImageIO` (width/height/band count
  * and per-channel pixel statistics), WAV via a little-endian RIFF
  * parser (channel count, sample rate, duration, PCM amplitude
  * statistics). Video FRAME decode remains an honest stub for
  * mp4/webm (the JDK ships no video codec — animated GIF gets the
  * real [[VideoFrames]] path): generic-video "features" are a byte
  * histogram, and frame sampling slices byte windows instead of
  * seeking keyframes. Video METADATA is real, codec-free:
  * [[Mp4Boxes]] walks the public ISO BMFF header atoms into typed
  * brand/timescale/duration/track columns (q222). Payloads that fail
  * to decode fall back to the same deterministic byte histogram, so
  * the pipeline never throws on dirty data — at 100 TB some payloads
  * WILL be corrupt.
  */
object Multimodal {

  val FeatureDim = 16

  /** Deterministic PNG encoder for fixtures/corpora: pixel (x, y) gets
    * the 0xRRGGBB value `rgb(x, y)`. The JDK PNG writer emits no
    * timestamp chunks, so output bytes are a pure function of the
    * pixels.
    */
  def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV encoder (RIFF + fmt + data). */
  def encodeWavMono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Image features from actual bytes (ImageIO):
    * f0 width, f1 height, f2 band count, f3..f5 mean R/G/B in [0,1],
    * f6 mean luminance in [0,1], f7 aspect ratio, f8..f15 8-bin
    * normalized luminance histogram. None if the payload doesn't
    * decode as an image.
    */
  def decodeImage(bytes: Array[Byte]): Option[Array[Float]] = {
    val img =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    img.map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val f = new Array[Float](FeatureDim)
      f(0) = w.toFloat; f(1) = h.toFloat
      f(2) = im.getRaster.getNumBands.toFloat
      var (sr, sg, sb) = (0L, 0L, 0L)
      val hist = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = im.getRGB(x, y)
          val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
          sr += r; sg += g; sb += b
          // integer Rec.601 luma
          hist(((r * 299 + g * 587 + b * 114) / 1000) >> 5) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      f(3) = (sr.toDouble / n / 255).toFloat
      f(4) = (sg.toDouble / n / 255).toFloat
      f(5) = (sb.toDouble / n / 255).toFloat
      f(6) = ((sr * 299L + sg * 587L + sb * 114L).toDouble / 1000 / n / 255).toFloat
      f(7) = w.toFloat / h
      var i = 0
      while (i < 8) { f(8 + i) = (hist(i).toDouble / n).toFloat; i += 1 }
      f
    }
  }

  /** Audio features from actual bytes (RIFF/WAV, 16-bit PCM):
    * f0 channels, f1 sample rate, f2 duration in seconds, f3 RMS,
    * f4 peak, f5 mean (all amplitudes normalized by 2^15), f6
    * zero-crossing rate, f7..f15 9-bin normalized |amplitude|
    * histogram. None if the payload isn't parseable 16-bit PCM WAV.
    */
  def decodeWav(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4() = { val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII") }
    if (tag4() != "RIFF") return None
    buf.getInt
    if (tag4() != "WAVE") return None
    var channels = 0; var sampleRate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    // walk chunks; fmt before data per spec, but don't assume
    while (buf.remaining() >= 8) {
      val id = tag4(); val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return None
      if (id == "fmt ") {
        val p = buf.position()
        if (buf.getShort != 1) return None // PCM only
        channels = buf.getShort; sampleRate = buf.getInt
        buf.getInt; buf.getShort // byte rate, block align
        bits = buf.getShort
        buf.position(p + len)
      } else if (id == "data") {
        dataOff = buf.position(); dataLen = len
        buf.position(buf.position() + len)
      } else buf.position(buf.position() + len)
      // RIFF word alignment: odd-sized chunks carry one pad byte (see
      // AudioFingerprint.decodeSamplesMono — same walk, same fix)
      if (len % 2 == 1 && buf.remaining() > 0) buf.position(buf.position() + 1)
    }
    if (channels <= 0 || sampleRate <= 0 || bits != 16 || dataOff < 0) return None
    val n = dataLen / 2
    if (n == 0) return None
    val f = new Array[Float](FeatureDim)
    f(0) = channels.toFloat; f(1) = sampleRate.toFloat
    f(2) = (n.toDouble / channels / sampleRate).toFloat
    var sumSq = 0.0; var sum = 0.0; var peak = 0; var crossings = 0; var prev = 0
    val hist = new Array[Long](9)
    var i = 0
    while (i < n) {
      val s: Int = buf.getShort(dataOff + 2 * i)
      sumSq += s.toDouble * s; sum += s
      val a = math.abs(s)
      if (a > peak) peak = a
      if (i > 0 && ((s < 0) != (prev < 0))) crossings += 1
      hist(a * 9 / 32769) += 1
      prev = s
      i += 1
    }
    f(3) = (math.sqrt(sumSq / n) / 32768).toFloat
    f(4) = peak / 32768f
    f(5) = (sum / n / 32768).toFloat
    f(6) = crossings.toFloat / n
    i = 0
    while (i < 9) { f(7 + i) = (hist(i).toDouble / n).toFloat; i += 1 }
    Some(f)
  }

  /** Fallback / video stub: deterministic normalized byte histogram.
    * Kept for undecodable payloads and for video, where the JDK has no
    * codec — loudly NOT real video features.
    */
  def byteHistogram(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xFF) % FeatureDim) += 1f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < FeatureDim) { hist(j) /= bytes.length; j += 1 }
    }
    hist
  }

  /** Kind-dispatched decode; corrupt payloads degrade to the byte
    * histogram instead of failing the task.
    */
  def decodeBytes(kind: String, bytes: Array[Byte]): Array[Float] = kind match {
    case "image" => decodeImage(bytes).getOrElse(byteHistogram(bytes))
    case "audio" => decodeWav(bytes).getOrElse(byteHistogram(bytes))
    case _ => byteHistogram(bytes)
  }

  /** Batched decode: one partition = one sequential batch through the
    * codec — the mapInPandas batch shape. Binary payloads never hit
    * the driver; feature rows are narrow.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.content.length, decodeBytes(m.kind, m.content))
      }
    }
  }

  /** Resize: images are re-encoded at progressively halved resolution
    * (real pixels through a real codec) until they fit `maxBytes`;
    * non-image payloads fall back to byte decimation (stub — a real
    * implementation re-encodes audio/video at a lower bitrate).
    */
  def resize(media: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.content.length <= maxBytes) m
      else if (m.kind == "image") {
        val src =
          try Option(ImageIO.read(new ByteArrayInputStream(m.content)))
          catch { case _: Exception => None }
        src.map { im =>
          var (w, h, bytes) = (im.getWidth, im.getHeight, m.content)
          while (bytes.length > maxBytes && w > 1 && h > 1) {
            w = math.max(1, w / 2); h = math.max(1, h / 2)
            val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            g.drawImage(im.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
            g.dispose()
            val bos = new ByteArrayOutputStream()
            ImageIO.write(scaled, "png", bos)
            bytes = bos.toByteArray
          }
          m.copy(width = w, height = h, content = bytes)
        }.getOrElse(decimate(m, maxBytes))
      } else decimate(m, maxBytes)
    }
  }

  private def decimate(m: MediaRecord, maxBytes: Int): MediaRecord = {
    val stride = math.ceil(m.content.length.toDouble / maxBytes).toInt
    m.copy(content = m.content.indices.collect {
      case i if i % stride == 0 => m.content(i)
    }.toArray.take(maxBytes))
  }

  /** STUB frame sampling: every `everyMs` milliseconds of a "video"
    * payload yields one fixed-size byte window (a real implementation
    * seeks keyframes). Output: (media_id, frame_idx, frame_bytes).
    */
  def frameSampleStub(
      media: Dataset[MediaRecord], everyMs: Long, frameBytes: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val frames = math.max(1, (m.duration_ms / math.max(1, everyMs)).toInt)
      (0 until frames).map { f =>
        val start = if (frames == 1) 0
          else ((m.content.length - frameBytes).max(0).toLong * f / frames).toInt
        (m.media_id, f, m.content.slice(start, start + frameBytes))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Size-aware repartition before decode: binary payloads skew task
    * runtimes badly if partitioned by row count; aim for ~targetBytes
    * of payload per task instead. One lightweight stats job, then a
    * round-robin shuffle.
    */
  def repartitionForDecode(media: Dataset[MediaRecord], targetBytes: Long): Dataset[MediaRecord] = {
    val row = media.toDF().agg(sum(length(col("content")))).head()
    if (row.isNullAt(0)) media // empty input: sum() is null, nothing to spread
    else {
      val parts = math.max(1, math.ceil(row.getLong(0).toDouble / targetBytes).toInt)
      media.repartition(parts)
    }
  }

  /** Deterministic image corpus with planted near-duplicates, for the
    * image-dedup pipeline (q35 / ImageNearDupSpec): `groups` original
    * 32×32 two-tone gray PNGs (ids 0..groups-1), each putting its luma
    * mass in a DISTINCT pair of the decoder's 8 histogram bins
    * ([[decodeImage]] f8..f15), plus one perturbed copy per original
    * (ids 1000+i) with ~2% of pixels retoned into a third bin — the
    * copy's histogram stays near-identical (cosine ≈ 0.9997) while any
    * two distinct originals share at most one bin (cosine ≤ ~0.7).
    * Requires `groups` ≤ 28 (= C(8,2) distinct bin pairs).
    */
  def imageDedupCorpus(spark: SparkSession, groups: Int): Dataset[MediaRecord] = {
    require(groups <= 28, s"only ${28} distinct histogram-bin pairs exist")
    import spark.implicits._
    val binPairs = (for { a <- 0 until 8; b <- a + 1 until 8 } yield (a, b)).take(groups)
    def tone(bin: Int) = bin * 32 + 16 // gray level landing in histogram bin `bin`
    spark.range(groups).flatMap { i =>
      val g = i.toInt
      val (b1, b2) = binPairs(g)
      val b3 = (b2 + 1) % 8 match { case `b1` => (b2 + 2) % 8; case x => x }
      val split = 0.4 + 0.01 * g // vary the two-tone mass split per image
      def png(perturbed: Boolean) = encodePng(32, 32, (x, y) => {
        val idx = y * 32 + x
        val base = if (idx < (split * 1024).toInt) tone(b1) else tone(b2)
        val v = if (perturbed && idx % 50 == 0) tone(b3) else base
        (v << 16) | (v << 8) | v
      })
      Seq(
        MediaRecord(g.toLong, "image", "image/png", 32, 32, 0L, png(perturbed = false)),
        MediaRecord(1000L + g, "image", "image/png", 32, 32, 0L, png(perturbed = true)))
    }
  }

  /** Planted corpus for the PERCEPTUAL-hash near-dup surface
    * ([[ImagePhash]]): `groups` natural-image-like luminance fields —
    * a seeded 1/f-decaying sum of 8 low-frequency sinusoid products
    * per group, rendered as REAL PNGs — each with three perturbed
    * copies the HISTOGRAM path cannot reliably pair but pHash must:
    *
    *   id+1000: re-encode at 2× resolution (same continuous image)
    *   id+2000: ~1% border crop
    *   id+3000: ~0.5° rotation about the center
    *
    * The decaying spectrum matters: it gives the 8×8 DCT block a
    * spread of coefficient magnitudes (like real photographs), so the
    * median-threshold bits are mostly well-separated and perturbations
    * flip only fringe bits — measured ≤ 14 of 64, vs ≥ 24 between
    * distinct groups (ImageNearDupSpec pins both sides of the margin).
    */
  def phashDedupCorpus(spark: SparkSession, groups: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(groups).flatMap { i =>
      val g = i.toInt
      // seeded per-group spectrum: (freq, phase) pairs fixed at build
      val rnd = new scala.util.Random(g * 7919 + 13)
      val comps = (1 to 8).map { k =>
        (1 + rnd.nextInt(4), 1 + rnd.nextInt(4),
          rnd.nextDouble() * 2 * math.Pi, rnd.nextDouble() * 2 * math.Pi,
          35.0 / k)
      }
      def lum(xc: Double, yc: Double): Int = {
        var v = 128.0
        comps.foreach { case (fx, fy, p1, p2, amp) =>
          v += amp * math.sin(2 * math.Pi * fx * xc + p1) *
            math.cos(2 * math.Pi * fy * yc + p2)
        }
        math.max(0, math.min(255, math.round(v).toInt))
      }
      def png(size: Int, xf: (Double, Double) => (Double, Double)) =
        encodePng(size, size, (x, y) => {
          val (xc, yc) = xf((x + 0.5) / size, (y + 0.5) / size)
          val v = lum(xc, yc)
          (v << 16) | (v << 8) | v
        })
      val theta = math.toRadians(0.5)
      val (ct, st) = (math.cos(theta), math.sin(theta))
      Seq(
        MediaRecord(g.toLong, "image", "image/png", 64, 64, 0L,
          png(64, (a, b) => (a, b))),
        MediaRecord(1000L + g, "image", "image/png", 128, 128, 0L,
          png(128, (a, b) => (a, b))),
        MediaRecord(2000L + g, "image", "image/png", 64, 64, 0L,
          png(64, (a, b) => (0.01 + a * 0.98, 0.01 + b * 0.98))),
        MediaRecord(3000L + g, "image", "image/png", 64, 64, 0L,
          png(64, (a, b) => {
            val (u, v) = (a - 0.5, b - 0.5)
            (0.5 + u * ct - v * st, 0.5 + u * st + v * ct)
          })))
    }
  }

  /** Planted audio near-dup corpus for [[AudioFingerprint]]: `groups`
    * originals (REAL 16-bit PCM WAVs — a 440 Hz carrier amplitude-
    * modulated by a seeded 64-segment envelope, each segment's gain an
    * independent uniform draw, so each clip's envelope SHAPE is a
    * distinct random walk) with three perturbed copies of each:
    * a 2× sample-rate re-encode (16 kHz vs 8 kHz, same content —
    * the "different delivery pipeline" copy), a −6 dB gain copy, and
    * a ~1%-amplitude additive-noise copy. The fingerprint's
    * energy-delta bits are gain-invariant and frame bounds are
    * duration-proportional, so planted copies land within a few bits
    * while distinct envelopes disagree on ~half (AudioNearDupSpec pins
    * both margins).
    */
  /** Planted VIDEO dedup corpus (REAL animated GIFs —
    * [[VideoFrames.encodeGif]]): per group a seeded 16-frame evolving
    * luminance field (per-frame phase drift animates the q204-style
    * spectrum, so every frame carries pHash-able spatial structure and
    * the clip genuinely changes over time) plus three copies —
    * 1000+g a 2×-resolution re-encode (same timeline), 2000+g a
    * TRIMMED copy missing the first two frames (shifted timeline: the
    * alignment-free matcher's reason to exist), 3000+g a luma-affine
    * regrade (0.8·v + 20 — pHash's median threshold is invariant to
    * monotone luma maps).
    */
  def videoDedupCorpus(spark: SparkSession, groups: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(groups).flatMap { i =>
      val g = i.toInt
      val rnd = new scala.util.Random(g * 7919 + 29)
      val comps = (1 to 8).map { k =>
        (1 + rnd.nextInt(4), 1 + rnd.nextInt(4),
          rnd.nextDouble() * 2 * math.Pi, rnd.nextDouble() * 2 * math.Pi,
          35.0 / k)
      }
      def lum(xc: Double, yc: Double, t: Int): Double = {
        var v = 128.0
        comps.zipWithIndex.foreach { case ((fx, fy, p1, p2, amp), ci) =>
          v += amp * math.sin(2 * math.Pi * fx * xc + p1 + 0.12 * t * (ci + 1)) *
            math.cos(2 * math.Pi * fy * yc + p2 + 0.07 * t)
        }
        v
      }
      def frames(size: Int, ts: Range, shade: Double => Double) =
        ts.map { t =>
          val img = new java.awt.image.BufferedImage(
            size, size, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var y = 0
          while (y < size) {
            var x = 0
            while (x < size) {
              val v = shade(lum((x + 0.5) / size, (y + 0.5) / size, t))
              img.getRaster.setSample(x, y, 0,
                math.max(0, math.min(255, math.round(v).toInt)))
              x += 1
            }
            y += 1
          }
          img
        }
      def rec(id: Long, size: Int, ts: Range, shade: Double => Double) = {
        val fs = frames(size, ts, shade)
        MediaRecord(id, "video", "image/gif", size, size, ts.size * 100L,
          VideoFrames.encodeGif(fs))
      }
      Seq(
        rec(g.toLong, 48, 0 until 16, identity),
        rec(1000L + g, 96, 0 until 16, identity), // 2× re-encode
        rec(2000L + g, 48, 2 until 16, identity), // trimmed head
        rec(3000L + g, 48, 0 until 16, v => 0.8 * v + 20)) // luma regrade
    }
  }

  def audioDedupCorpus(spark: SparkSession, groups: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(groups).flatMap { i =>
      val g = i.toInt
      val rnd = new scala.util.Random(g * 6211 + 17)
      val envelope = Array.fill(64)(0.1 + 0.9 * rnd.nextDouble())
      def clip(rate: Int, gain: Double, noiseAmp: Double): Array[Short] = {
        val n = rate * 64 / 50 // 1.28 s → rate/50 samples per segment
        val noise = new scala.util.Random(g * 31 + 7)
        Array.tabulate(n) { t =>
          val seg = math.min(t * 64 / n, 63)
          val v = gain * envelope(seg) * math.sin(2 * math.Pi * 440 * t / rate) +
            noiseAmp * (noise.nextDouble() * 2 - 1)
          (math.max(-1.0, math.min(1.0, v)) * 30000).toShort
        }
      }
      def rec(id: Long, rate: Int, gain: Double, noiseAmp: Double) = {
        val s = clip(rate, gain, noiseAmp)
        MediaRecord(id, "audio", "audio/wav", 0, 0,
          s.length * 1000L / rate, encodeWavMono(rate, s))
      }
      Seq(
        rec(g.toLong, 8000, 1.0, 0.0),
        rec(1000L + g, 16000, 1.0, 0.0), // resampled re-encode
        rec(2000L + g, 8000, 0.5, 0.0), // −6 dB gain
        rec(3000L + g, 8000, 1.0, 0.01)) // mild additive noise
    }
  }

  /** Deterministic synthetic media corpus for tests/demos: REAL PNGs
    * (deterministic pixel pattern), REAL 16-bit PCM WAVs
    * (deterministic sine), and REAL mp4 header atoms around
    * deterministic filler ([[Mp4Boxes.encodeMp4]]). Metadata matches
    * the actual payload in every kind (PNG dims, WAV duration, mvhd
    * duration/track count — spec-pinned in MultimodalSpec).
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i
      (id % 3).toInt match {
        case 0 =>
          val w = 16 + (id % 64).toInt
          val h = 16 + (id % 48).toInt
          val png = encodePng(w, h, (x, y) =>
            ((((id * 31 + x * 7 + y * 13) % 256).toInt & 0xFF) << 16) |
              ((((id * 17 + x * 3 + y * 5) % 256).toInt & 0xFF) << 8) |
              (((id * 11 + x * 11 + y * 2) % 256).toInt & 0xFF))
          MediaRecord(id, "image", "image/png", w, h, 0L, png)
        case 1 =>
          val rate = 8000
          val samples = Array.tabulate(400 + (id * 37 % 4000).toInt)(j =>
            (math.sin(2 * math.Pi * (220 + id % 220) * j / rate) * 8000).toShort)
          MediaRecord(id, "audio", "audio/wav", 0, 0,
            samples.length * 1000L / rate, encodeWavMono(rate, samples))
        case _ =>
          // REAL mp4 header atoms around deterministic mdat filler —
          // mvhd carries the duration at a 1000-tick/s scale, so the
          // record's duration_ms is recoverable from the payload
          // (Mp4Boxes.parse), same payload↔metadata honesty as the
          // PNG dims and WAV durations above; frame decode stays the
          // declared byte-window stub (no JDK codec)
          val durMs = 1000 + id * 100
          MediaRecord(id, "video", "video/mp4",
            16 + (id % 64).toInt, 16 + (id % 48).toInt, durMs,
            Mp4Boxes.encodeMp4("isom", timescale = 1000L, duration = durMs,
              nTracks = 1 + (id % 2).toInt, mvhdVersion = (id % 2).toInt,
              mdatLen = 64 + (id * 37 % 4096).toInt, seed = id))
      }
    }
  }
}
