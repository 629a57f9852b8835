package graft.core

/** Local-filesystem helpers shared by scratch-dir owners. (Engine data
  * paths go through Hadoop `FileSystem`; this is only for JVM-local
  * temp roots — warehouse dirs, per-query scratch — where java.nio is
  * the right tool.)
  */
object LocalFs {

  /** Depth-first recursive delete; missing path is a no-op. */
  def deleteRecursively(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
}
