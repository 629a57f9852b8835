package graft.medallion

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property + reference-parity tests for `normalize_and_dedupe`
  * (reference `flows/bronze.py:30-40`).
  */
class ColumnNormalizerSpec extends AnyFunSuite {

  test("reference parity: trim, lower, EACH space → one underscore") {
    assert(ColumnNormalizer.normalizeName("  N NationKey ") == "n_nationkey")
    assert(ColumnNormalizer.normalizeName("Formed in") == "formed_in")
    // multi-space: str.replace(' ', '_') is per-character, NOT \s+ collapse
    assert(ColumnNormalizer.normalizeName("a  b") == "a__b")
  }

  test("dedupe: first keeps base, k-th repeat gets _k in encounter order") {
    assert(ColumnNormalizer.normalizeAndDedupe(Seq("Id", "ID", " id", "x")) ==
      Seq("id", "id_2", "id_3", "x"))
  }

  private val rnd = new Random(7)
  private def randName(): String = {
    val chars = "abcXYZ019 _"
    (0 to rnd.nextInt(8)).map(_ => chars(rnd.nextInt(chars.length))).mkString
  }

  test("idempotence: a collision-free normalized list re-normalizes to itself") {
    (1 to 300).foreach { _ =>
      val names = List.fill(rnd.nextInt(10))(randName())
      val once = ColumnNormalizer.normalizeAndDedupe(names)
      if (once.distinct == once)
        assert(ColumnNormalizer.normalizeAndDedupe(once) == once, s"input=$names")
    }
  }

  test("size is preserved") {
    (1 to 300).foreach { _ =>
      val names = List.fill(rnd.nextInt(10))(randName())
      assert(ColumnNormalizer.normalizeAndDedupe(names).size == names.size)
    }
  }
}
