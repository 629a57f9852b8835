package graft.medallion

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Landing ingestion flow (reference `flows/landing.py:69-74`):
  * glob `*.csv` in a source folder (sorted — `landing.py:22-24`),
  * chunk each through [[Chunker]] into `landing/<dataset>/`, return a
  * manifest of written objects per dataset. Dataset name = file stem
  * lowercased (`landing.py:31`).
  */
object LandingFlow {

  def listCsv(folder: String): Seq[Path] =
    Files.list(Paths.get(folder)).iterator().asScala
      .filter(_.getFileName.toString.toLowerCase.endsWith(".csv"))
      .toSeq.sortBy(_.getFileName.toString)

  def run(
      csvFolder: String,
      lake: Lake,
      maxBytes: Int = Chunker.DefaultMaxBytes,
      bufferBytes: Int = Chunker.DefaultBufferBytes): Map[String, Seq[String]] =
    listCsv(csvFolder).map { p =>
      val dataset = p.getFileName.toString.stripSuffix(".csv").toLowerCase
      val written = Chunker.ingestFile(p, lake.landing(dataset), maxBytes, bufferBytes)
      dataset -> written.map(_.toString)
    }.toMap
}
