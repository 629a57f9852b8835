package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Video near-dup over REAL animated-GIF decode (VideoFrames, q221):
  * every planted copy — 2× re-encode, head-trimmed, luma regrade —
  * resolves to its group original, distinct groups never pair, the
  * trimmed copy proves alignment-free matching, and corrupt payloads
  * degrade to None instead of failing the job.
  */
class VideoNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val groups = 6
  private lazy val corpus = Multimodal.videoDedupCorpus(spark, groups)

  private lazy val pairs = VideoFrames.nearDuplicates(corpus)
    .select($"id_a", $"id_b", $"matched_frames", $"n_min")
    .as[(Long, Long, Long, Long)].collect()

  test("every planted copy pairs with its group original; no cross-group pairs") {
    val idPairs = pairs.map(p => (p._1, p._2)).toSet
    (0 until groups).foreach { g =>
      Seq(1000L + g, 2000L + g, 3000L + g).foreach { v =>
        assert(idPairs.contains((g.toLong, v)),
          s"copy $v must pair with original $g; got ${idPairs.filter(_._1 == g)}")
      }
    }
    pairs.foreach { case (a, b, _, _) =>
      assert(a % 1000 == b % 1000, s"cross-group video pair: ($a, $b)")
    }
  }

  test("trimmed copy matches through the alignment-free rollup (shifted timeline)") {
    val trimmed = pairs.filter(p => p._1 < 1000 && p._2 >= 2000 && p._2 < 3000)
    assert(trimmed.size == groups, s"trimmed pairs: ${trimmed.toSeq}")
    trimmed.foreach { case (g, v, matched, nMin) =>
      // the trim drops two frames: 7 samples against the original's 8,
      // every one of which exists in the original's sampled timeline
      assert(nMin == 7 && matched == 7,
        s"trimmed $v vs $g: matched $matched of $nMin")
    }
  }

  test("re-encode and regrade match on (nearly) every sampled frame") {
    pairs.filter(p => p._2 >= 1000 && p._2 < 2000).foreach {
      case (g, v, matched, nMin) =>
        assert(matched >= nMin - 1, s"re-encode $v vs $g: $matched/$nMin")
    }
    pairs.filter(p => p._2 >= 3000).foreach { case (g, v, matched, nMin) =>
      assert(matched >= nMin - 1, s"regrade $v vs $g: $matched/$nMin")
    }
  }

  test("frame sampling plumbing: every-2nd-frame ordinals, shared pHash space") {
    val fr = VideoFrames.framePhashes(corpus, every = 2)
      .groupBy($"media_id").agg(count(lit(1)).as("n"), max($"ord").as("mx"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fr(0L) == ((8L, 7L)), s"original sampling: ${fr(0L)}")
    assert(fr(2000L) == ((7L, 6L)), s"trimmed sampling: ${fr(2000L)}")
    // shared space: a video frame hash is a plain 64-bit pHash an image
    // still could carry — the same chunked search core accepts both
    val oneHash = VideoFrames.framePhashes(corpus.filter(_.media_id == 0L))
      .select($"phash").as[Long].head()
    assert(oneHash != 0L)
  }

  test("corrupt payloads decode to None; non-video records are ignored") {
    val junk = Seq(
      MediaRecord(900L, "video", "image/gif", 8, 8, 100L, Array[Byte](1, 2, 3)),
      MediaRecord(901L, "image", "image/png", 8, 8, 0L, Array[Byte](9, 9)))
      .toDS()
    assert(VideoFrames.decodeFrames(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoFrames.framePhashes(junk).count() == 0)
  }
}
