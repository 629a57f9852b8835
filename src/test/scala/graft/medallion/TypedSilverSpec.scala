package graft.medallion

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

class TypedSilverSpec extends SparkTestBase {

  private lazy val lake: Lake = {
    val l = Lake(Files.createTempDirectory("typed-e2e").toString)
    val fixtures = Paths.get(getClass.getResource("/fixtures/albums.csv").toURI)
      .getParent.toString
    Flows.runAll(spark, fixtures, l, maxChunkBytes = 100)
    l
  }

  test("typed datasets decode silver rows including null artifacts") {
    val albums = TypedSilver.albums(spark, lake).collect()
    assert(albums.length == 7) // 6 albums + header-artifact row
    assert(albums.count(_.id.isEmpty) == 1)
    val real = albums.flatMap(a => a.id.map(_ -> a)).toMap
    assert(real(1L).title.contains("Altars of Madness"))
    assert(real(6L).year.isEmpty) // missing year -> None, not 0
  }

  test("typed transforms compose: bands active since the 80s") {
    import spark.implicits._
    val eighties = TypedSilver.bands(spark, lake)
      .filter(b => b.start_year.exists(y => y >= 1980 && y < 1990))
      .map(b => b.name.getOrElse("?"))
      .collect().toSet
    assert(eighties == Set("Morbid Angel", "Entombed", "Dismember", "Obituary", "Sarcófago"))
  }

  test("typed join: average review score per band, compile-time fields") {
    import spark.implicits._
    val reviews = TypedSilver.reviews(spark, lake)
    val albums = TypedSilver.albums(spark, lake)
    val scored = reviews.joinWith(albums,
        reviews("album") === albums("id"), "inner")
      .map { case (r, a) => (a.band.get, r.score.get) }
      .groupByKey(_._1)
      .mapGroups { (band, it) =>
        val scores = it.map(_._2).toSeq
        (band, scores.sum / scores.size)
      }
      .collect().toMap
    assert(math.abs(scored(10L) - 9.25) < 1e-12)
    assert(math.abs(scored(11L) - 7.75) < 1e-12)
  }
}
