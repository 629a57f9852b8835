package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.medallion.{BronzeFlow, Chunker, Lake}

/** End-to-end medallion ingestion as a driver-verifiable query: the
  * `nation` dim is round-tripped through messy CSV → chunked landing
  * (headers re-carried per chunk, `flows/landing.py:27-53`) → bronze
  * (infer + header normalize + full-row dedup, `flows/bronze.py:74-98`)
  * → silver-style header-row filter + typed casts
  * (`flows/silver.py:106-112`). The DuckDB oracle is the untouched
  * table, proving the whole chain is lossless.
  *
  * The CSV producer collects `nation` — safe at any scale: nation is a
  * fixed 25-row dim, and the producer models the reference's external
  * `csv/` folder (driver-side there too). Chunk/buffer sizes are set
  * small so multiple chunks land per object and embedded header lines
  * genuinely exercise dedup + the header-row filter.
  */
object MedallionRoundtrip {

  private val cleanupRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** One-shot JVM shutdown hook deleting the per-process scratch lake. */
  private[queries] def registerCleanup(root: java.nio.file.Path): Unit =
    if (cleanupRegistered.compareAndSet(false, true)) {
      sys.addShutdownHook {
        if (Files.exists(root)) {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(root)
          try walk.iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
          finally walk.close()
        }
      }
    }

  def q15MedallionRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(s, dir, "nation")
    val rows = nation.select(
        col("n_nationkey").cast("string"),
        col("n_name"),
        col("n_regionkey").cast("string"))
      .collect() // 25-row fixed dim: the external CSV producer edge
      .map(r => s"${r.getString(0)},${r.getString(1)},${r.getString(2)}")

    // Messy header (exercises trim/lower/space→underscore) + a
    // duplicated data row (exercises bronze full-row dedup).
    val csv = ("  N NationKey ,N NAME,N RegionKey" +: (rows :+ rows.head))
      .mkString("", "\n", "\n")

    // per-PROCESS scratch root, wiped per invocation and deleted by a
    // shutdown hook: bounded to one dir per LIVE JVM without letting
    // concurrent JVMs wipe each other's lake mid-query
    val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-q15-roundtrip-${ProcessHandle.current().pid()}")
    MedallionRoundtrip.registerCleanup(tmp)
    if (Files.exists(tmp)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    val lake = Lake(tmp.toString)
    // ~120-byte chunks, ~400-byte delivery buffer → several chunks per
    // landing object → embedded header lines in bronze input.
    Chunker.deliver(Chunker.split(csv, maxBytes = 120),
      lake.landing("nation"), bufferBytes = 400)
    val bronzePath = BronzeFlow.ingest(s, lake.landing("nation"), lake.bronze("nation"))

    s.read.parquet(bronzePath)
      .filter(!col("n_nationkey").cast("string").contains("NationKey"))
      .select(
        col("n_nationkey").cast("int"),
        col("n_name"),
        col("n_regionkey").cast("int"))
      .orderBy(col("n_nationkey"))
  }

  val q15Sql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY 1"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q15_medallion_roundtrip" -> (q15MedallionRoundtrip _))

  val oracleSql: Map[String, String] = Map(
    "q15_medallion_roundtrip" -> q15Sql)
}
