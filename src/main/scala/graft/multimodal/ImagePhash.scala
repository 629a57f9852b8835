package graft.multimodal

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image hashing (DCT pHash) — the image twin of the text
  * stack's `simhash64`: a 64-bit fingerprint of an image's
  * LOW-FREQUENCY luminance structure, stable under re-encoding, small
  * crops, mild noise, and small rotations — exactly the perturbations
  * that defeat q35's luma-HISTOGRAM vectors (a histogram survives
  * recoloring of scattered pixels but shifts under global tone changes,
  * and carries no spatial structure at all, so a crop that keeps the
  * tone mix but moves content is invisible to it).
  *
  * Algorithm (the standard pHash construction):
  *  1. decode (ImageIO — the one justified non-Catalyst decode path,
  *     [[Multimodal]] doc), Rec.601 luma, box-filter resample to 32×32
  *     (area averaging: deterministic, anti-aliased);
  *  2. 2-D DCT-II (separable, O(32³) ≈ 65k mults per image — decode
  *     dominates);
  *  3. keep the 8×8 lowest-frequency block, threshold each coefficient
  *     against the MEDIAN of the 63 AC coefficients → 64 bits (the DC
  *     bit is constant-ish; it rides along harmlessly).
  *
  * Near-dup search is multi-index Hamming (Norouzi et al.'s
  * multi-index hashing shape, the simhash pigeonhole widened for
  * pHash's REAL operating radius): perceptual perturbations land at
  * Hamming 6–15 of 64 (measured on the planted corpus — re-encode,
  * crop, and rotation each cost several fringe bits; distinct images
  * sit ≥ 24), so the text stack's radius-3 chunk join is too tight.
  * The hash splits into 8 × 8-bit chunks; the PROBE side of the
  * self-join emits each chunk value plus its 8 single-bit flips, the
  * index side emits exact values, and candidates come from
  * (chunk_idx, chunk_value) equality. A pair within Hamming ≤ 15 has
  * some chunk differing in ≤ ⌊15/8⌋ = 1 bit (pigeonhole), which a
  * 1-bit flip covers — the radius-15 guarantee. Exact
  * `bit_count(xor)` verification runs inline on the joined rows.
  * At 100 TB: the phash relation is 16 bytes/image, the probe fanout
  * is a fixed ×9 per chunk, the chunk join is the only shuffle, and
  * decode parallelism follows
  * [[Multimodal.repartitionForDecode]]'s size-aware partitioning.
  */
object ImagePhash {

  val N = 32 // resample grid
  val Chunks: Int = MultiIndexHamming.Chunks
  val ChunkBits: Int = MultiIndexHamming.ChunkBits
  /** Multi-probe-guaranteed search radius: some chunk differs in ≤ 1
    * bit for any pair within 2·Chunks − 1.
    */
  val MaxDistance: Int = MultiIndexHamming.MaxDistance

  // DCT-II basis, built once per JVM: cos(π/N · (n + ½) · k)
  private lazy val cosTable: Array[Array[Double]] =
    Array.tabulate(N, N)((k, n) => math.cos(math.Pi / N * (n + 0.5) * k))

  /** 64-bit DCT pHash of an encoded image; None if the payload doesn't
    * decode. Deterministic (pure integer/double math, fixed tables).
    */
  def phash64(bytes: Array[Byte]): Option[Long] = {
    val img =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    img.filter(im => im.getWidth > 0 && im.getHeight > 0).map(phashOf)
  }

  /** [[phash64]] over an already-decoded frame — the shared kernel the
    * video path ([[VideoFrames]]) hashes each sampled GIF frame with,
    * so image stills and video frames live in ONE perceptual space.
    */
  def phashOf(im: java.awt.image.BufferedImage): Long = {
      val (w, h) = (im.getWidth, im.getHeight)
      // box-filter luma resample to N×N
      val luma = Array.ofDim[Double](N, N)
      var by = 0
      while (by < N) {
        var bx = 0
        while (bx < N) {
          val x0 = bx * w / N; val x1 = math.max((bx + 1) * w / N, x0 + 1)
          val y0 = by * h / N; val y1 = math.max((by + 1) * h / N, y0 + 1)
          var s = 0.0; var c = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val p = im.getRGB(x, y)
              s += (((p >> 16) & 0xFF) * 299 + ((p >> 8) & 0xFF) * 587 +
                (p & 0xFF) * 114) / 1000.0
              c += 1; x += 1
            }
            y += 1
          }
          luma(by)(bx) = s / c
          bx += 1
        }
        by += 1
      }
      // 3×3 edge-clamped mean blur (the pHash library's pre-filter):
      // suppresses sampling-phase noise so perturbations flip fewer
      // fringe bits
      val blurred = Array.ofDim[Double](N, N)
      var yy0 = 0
      while (yy0 < N) {
        var xx0 = 0
        while (xx0 < N) {
          var s = 0.0; var c = 0
          var dy = -1
          while (dy <= 1) {
            var dx = -1
            while (dx <= 1) {
              val yv = yy0 + dy; val xv = xx0 + dx
              if (yv >= 0 && yv < N && xv >= 0 && xv < N) { s += luma(yv)(xv); c += 1 }
              dx += 1
            }
            dy += 1
          }
          blurred(yy0)(xx0) = s / c
          xx0 += 1
        }
        yy0 += 1
      }
      // separable 2-D DCT-II; only the first 8 frequencies of each
      // dimension are ever read, so compute just those
      val B = 8
      val tmp = Array.ofDim[Double](N, B) // rows transformed in x
      var y = 0
      while (y < N) {
        var k = 0
        while (k < B) {
          var s = 0.0; var x = 0
          while (x < N) { s += blurred(y)(x) * cosTable(k)(x); x += 1 }
          tmp(y)(k) = s; k += 1
        }
        y += 1
      }
      val block = new Array[Double](B * B)
      var v = 0
      while (v < B) {
        var u = 0
        while (u < B) {
          var s = 0.0; var yy = 0
          while (yy < N) { s += tmp(yy)(u) * cosTable(v)(yy); yy += 1 }
          block(v * B + u) = s; u += 1
        }
        v += 1
      }
      // median of the 63 AC coefficients (index 0 is DC)
      val ac = java.util.Arrays.copyOfRange(block, 1, B * B)
      java.util.Arrays.sort(ac)
      val med = ac(ac.length / 2)
      var bits = 0L
      var i = 0
      while (i < 64) {
        if (block(i) > med) bits |= (1L << i)
        i += 1
      }
      bits
  }

  /** (media_id, phash) for every decodable image in `media` —
    * mapPartitions decode (the [[Multimodal.extractFeatures]]
    * justification: ImageIO is not expressible in Catalyst; everything
    * downstream is relational).
    */
  def phashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m =>
        if (m.kind == "image") phash64(m.content).map(m.media_id -> _) else None))
      .toDF("media_id", "phash")
  }

  /** Chunked phash relation: (chunk_idx, chunk_value, media_id, phash),
    * one row per 8-bit chunk. With `probe = true` each chunk also emits
    * its 8 single-bit flips (the multi-probe side, ×9 fanout).
    * Delegates to the shared [[MultiIndexHamming]] core.
    */
  def chunked(ph: DataFrame, probe: Boolean = false): DataFrame =
    MultiIndexHamming.chunked(ph, "phash", probe)

  /** Near-duplicate image pairs (id_a < id_b) within `maxDist` Hamming
    * bits of each other's pHash. Exact within the multi-probe radius:
    * a pair at distance ≤ 15 has a chunk differing in ≤ 1 bit, which
    * the probe side's single-bit flips cover; every candidate is
    * popcount-verified inline, so false positives are impossible
    * ([[MultiIndexHamming.nearDuplicatePairs]]).
    */
  def nearDuplicates(
      media: Dataset[MediaRecord], maxDist: Int = MaxDistance): DataFrame =
    MultiIndexHamming.nearDuplicatePairs(phashes(media), "phash", maxDist)

  /** Persist the (media_id, phash) relation as a probe-able code
    * index — 16 bytes/image, decoded ONCE; day-2 batches probe the
    * stored codes without rescanning raw media (the q33/q34/q88
    * incremental discipline; callers key the dir through
    * [[graft.core.Warehouse.ensureBuilt]] when the source is a stable
    * path).
    */
  def writeIndex(media: Dataset[MediaRecord], indexDir: String): Unit =
    phashes(media).write.mode("overwrite").parquet(indexDir)

  /** Incremental near-dup: decode ONLY the new batch, probe the stored
    * code index ([[MultiIndexHamming.searchAgainst]]) —
    * (probe_id, index_id, hamming_dist), exact within the multi-probe
    * radius.
    */
  def nearDuplicatesAgainst(media: Dataset[MediaRecord], indexDir: String,
      maxDist: Int = MaxDistance): DataFrame =
    MultiIndexHamming.searchAgainst(
      phashes(media), media.sparkSession.read.parquet(indexDir), "phash", maxDist)
}
