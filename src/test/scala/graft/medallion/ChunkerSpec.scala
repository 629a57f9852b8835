package graft.medallion

import java.nio.charset.StandardCharsets.UTF_8

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Chunker properties (SURVEY §5): every chunk carries the header, byte
  * cap holds (modulo single oversized lines, as in the reference), and
  * de-headered chunks concatenate back to the original body. Randomized
  * cases use a fixed seed for reproducibility.
  */
class ChunkerSpec extends AnyFunSuite {

  private val rnd = new Random(42)
  private def randLine(): String =
    rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString

  private def cases: Seq[(String, List[String], Int)] =
    (1 to 200).map { _ =>
      val header = randLine()
      val body = List.fill(rnd.nextInt(30))(randLine())
      val maxBytes = 8 + rnd.nextInt(56)
      (header, body, maxBytes)
    }

  test("chunks start with header; concat of de-headered chunks == body") {
    cases.foreach { case (header, body, maxBytes) =>
      val text = (header +: body).mkString("", "\n", "\n")
      val chunks = Chunker.split(text, maxBytes)
      assert(chunks.forall(_.startsWith(header + "\n")))
      val rebuilt = chunks.flatMap(_.linesIterator.toList.tail)
      assert(rebuilt == body, s"header=$header body=$body max=$maxBytes")
    }
  }

  test("byte cap holds whenever a chunk has >1 body line") {
    cases.foreach { case (header, body, maxBytes) =>
      Chunker.split((header +: body).mkString("", "\n", "\n"), maxBytes)
        .foreach { c =>
          if (c.linesIterator.size > 2) // header + >1 body lines
            assert(c.getBytes(UTF_8).length <= maxBytes)
        }
    }
  }

  test("empty body produces no chunks (reference tail-guard)") {
    assert(Chunker.split("only_header\n", 100).isEmpty)
    assert(Chunker.split("", 100).isEmpty)
  }

  test("reference sizing example: 2-line chunks at a tight cap") {
    // header(2B as "h\n") + 2 lines of 4B fit in 10B; a 3rd would exceed.
    val text = "h\nAAA\nBBB\nCCC\nDDD\n"
    val chunks = Chunker.split(text, maxBytes = 10)
    assert(chunks == Seq("h\nAAA\nBBB\n", "h\nCCC\nDDD\n"))
  }

  test("oversized first body line does not flush a header-only chunk") {
    val big = "X" * 600
    // the oversized line gets its own chunk (flushed when `ok` arrives);
    // the regression was a spurious "id,name\n"-only chunk before it
    val chunks = Chunker.split(s"id,name\n$big\nok\n", maxBytes = 500)
    assert(chunks == Seq(s"id,name\n$big\n", "id,name\nok\n"))
    assert(!chunks.contains("id,name\n"))
    // oversized line mid-file: same shape, three chunks
    val chunks2 = Chunker.split(s"h\naa\n$big\nbb\n", maxBytes = 500)
    assert(chunks2 == Seq("h\naa\n", s"h\n$big\n", "h\nbb\n"))
  }

  test("deliver batches respect the buffer and preserve order") {
    val chunks = Seq("h\n1\n", "h\n2\n", "h\n3\n", "h\n4\n", "h\n5\n")
    val dir = java.nio.file.Files.createTempDirectory("chunker-deliver").toString
    val files = Chunker.deliver(chunks, dir, bufferBytes = 9) // 2 chunks/object
    assert(files.size == 3)
    val contents = files.map(p => new String(java.nio.file.Files.readAllBytes(p), UTF_8))
    assert(contents == Seq("h\n1\nh\n2\n", "h\n3\nh\n4\n", "h\n5\n"))
  }
}
