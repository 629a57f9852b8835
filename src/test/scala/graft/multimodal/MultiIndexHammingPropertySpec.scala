package graft.multimodal

import scala.util.Random

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The multi-index radius guarantee, pinned for ALL chunk layouts
  * instead of hand-built pairs: any two 64-bit codes within Hamming
  * distance ≤ 15 share a chunk differing in ≤ 1 bit (pigeonhole over
  * 8 × 8-bit chunks), which the probe side's single-bit flips cover —
  * so every within-radius pair collides in ≥ 1 probed
  * (chunk_idx, chunk_value). Swept with ScalaCheck over random codes ×
  * random ≤15-bit flip patterns (800 cases), then driven through the
  * REAL Spark chunk join on 600 seeded pairs, plus the adversarial
  * 16-bit pattern (2 flips in every chunk) that the guarantee
  * deliberately does not extend to.
  */
class MultiIndexHammingPropertySpec extends AnyFunSuite {

  private val Chunks = MultiIndexHamming.Chunks
  private val ChunkBits = MultiIndexHamming.ChunkBits

  private def chunkOf(h: Long, i: Int): Long = (h >>> (i * ChunkBits)) & 0xffL

  /** The collision predicate the probe side implements: some chunk
    * differs in ≤ 1 bit (0 = exact chunk match, 1 = covered by a
    * single-bit probe flip).
    */
  private def collides(a: Long, b: Long): Boolean =
    (0 until Chunks).exists(i =>
      java.lang.Long.bitCount(chunkOf(a, i) ^ chunkOf(b, i)) <= 1)

  test("ScalaCheck sweep: every ≤15-bit flip pattern of every code collides in ≥1 probed chunk") {
    val genCase: Gen[(Long, Seq[Int])] = for {
      code <- Gen.long
      d <- Gen.choose(1, MultiIndexHamming.MaxDistance)
      flips <- Gen.pick(d, 0 until 64)
    } yield (code, flips.toSeq)
    val prop = Prop.forAll(genCase) { case (code, flips) =>
      val mask = flips.foldLeft(0L)((m, b) => m | (1L << b))
      collides(code, code ^ mask)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(800), prop)
    assert(res.passed, s"radius guarantee violated: ${res.status}")
  }

  test("ScalaCheck sweep: the 0-flip (identical codes) and full-radius boundary hold") {
    val prop = Prop.forAll(Gen.long) { code =>
      // d = 15 spread maximally adversarially within the guarantee:
      // 2 bits in 7 chunks + 1 bit in the last — still collides
      val mask = (0 until 7).foldLeft(0L)((m, c) =>
        m | (3L << (c * ChunkBits))) | (1L << (7 * ChunkBits))
      collides(code, code) && collides(code, code ^ mask)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}

/** The same sweep through the REAL Spark chunk join (one job, 600
  * seeded pairs) — the property above proves the math; this proves
  * [[MultiIndexHamming.nearDuplicatePairs]] implements it.
  */
class MultiIndexHammingSparkSweepSpec extends SparkTestBase {
  import spark.implicits._

  test("600 seeded within-radius pairs all surface from the Spark chunk join; the 16-bit adversary does not") {
    val rnd = new Random(0xbadc0de)
    val pairs = (0 until 600).map { i =>
      val code = rnd.nextLong()
      val d = 1 + rnd.nextInt(MultiIndexHamming.MaxDistance)
      val flips = rnd.shuffle((0 until 64).toList).take(d)
      val mask = flips.foldLeft(0L)((m, b) => m | (1L << b))
      (i, code, code ^ mask)
    }
    // the adversarial 16-bit pattern: 2 flips in EVERY chunk — no
    // chunk within 1 bit, so the multi-probe join must NOT pair them
    val advBase = rnd.nextLong()
    val advMask = (0 until 8).foldLeft(0L)((m, c) => m | (3L << (c * 8)))
    val rows =
      pairs.flatMap { case (i, a, b) => Seq((2L * i, a), (2L * i + 1, b)) } ++
        Seq((100000L, advBase), (100001L, advBase ^ advMask))
    val found = MultiIndexHamming
      .nearDuplicatePairs(rows.toDF("media_id", "hash"), "hash")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    pairs.foreach { case (i, _, _) =>
      assert(found.contains((2L * i, 2L * i + 1)),
        s"planted within-radius pair $i missing from the chunk join")
    }
    assert(!found.contains((100000L, 100001L)),
      "the 16-bit adversarial pair must not collide (guarantee boundary)")
  }
}
