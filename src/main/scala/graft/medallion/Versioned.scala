package graft.medallion

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/** Atomic-publish layout for plain-parquet tables — the manifest-pointer
  * idea table formats (Iceberg snapshot pointer, reference
  * `flows_iceberg/bronze_iceberg.py:40-44`) are built on, reduced to a
  * single pointer file:
  *
  * {{{
  *   <root>/v_000001/part-*.parquet     immutable version dirs
  *   <root>/v_000002/part-*.parquet
  *   <root>/.v_000002.claim             writer's claim marker
  *   <root>/_current                    names the active version
  * }}}
  *
  * [[commit]] writes a fresh version dir, then publishes it by renaming
  * a temp pointer over `_current` with `Options.Rename.OVERWRITE` via
  * `FileContext` — atomic on HDFS and local filesystems. A concurrent
  * reader therefore resolves either the previous or the new version,
  * never an absent table: this closes the old-nor-new visibility window
  * a directory swap ([[Maintenance]] rename protocol) necessarily has.
  *
  * Retention: each commit keeps the newly published version and the
  * version that was active just before it (in-flight readers of the
  * previous version finish against immutable files). Everything else —
  * superseded versions, orphan dirs, and orphan claim markers left by
  * crashed committers — is garbage-collected, but only `gcGraceMs`
  * after a commit FIRST saw it superseded (a `.v_N.reap` tombstone
  * starts the clock; publishing clears it). Retention is keyed on the
  * pointer history, not directory count, so an orphan can never evict
  * the previously-active version, and the supersession-keyed grace is
  * what keeps a racing committer's just-claimed (still-writing) or
  * just-published version safe from another committer's GC regardless
  * of how long its write runs. `gcGraceMs = 0` reaps immediately —
  * single-writer-only.
  *
  * Concurrent writers: version numbers are allocated by atomically
  * creating a `.v_NNNNNN.claim` marker (create-no-overwrite), so two
  * committers can never write into the same version dir. The pointer
  * flip then serializes publication (last flip wins — both versions are
  * fully written, so the loser's data is superseded, never interleaved).
  */
object Versioned {

  private val Pointer = "_current"

  /** Default GC grace: long enough for any realistic in-flight write or
    * read of a superseded version to finish.
    */
  val DefaultGcGraceMs: Long = 60L * 60 * 1000

  private def fs(spark: SparkSession, p: HPath): FileSystem =
    FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)

  /** Active version dir (absolute path). Fails if never committed.
    * Retries briefly on ANY transient read failure: a checksummed local
    * FS renames the pointer and its .crc sidecar in two steps (a read
    * between them throws ChecksumException), and the local
    * `FileContext` OVERWRITE rename is delete-then-rename (a read
    * between them throws FileNotFoundException) — on HDFS both are
    * atomic and the retries never fire. Under back-to-back commits a
    * single retry can land inside the NEXT commit's window, so the
    * budget is 10 attempts × 10 ms. A genuinely never-committed root
    * pays the full budget once, then surfaces the original
    * FileNotFoundException — which is what [[commit]] keys
    * first-commit detection on.
    */
  def resolve(spark: SparkSession, root: String): String = {
    val ptr = new HPath(s"$root/$Pointer")
    val f = fs(spark, ptr)
    def readOnce(): String = {
      val in = f.open(ptr)
      val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      require(v.nonEmpty, s"$ptr is empty")
      s"$root/$v"
    }
    var attempt = 0
    while (true) {
      try return readOnce()
      catch {
        case e: java.io.IOException =>
          attempt += 1
          if (attempt >= 10) throw e
          Thread.sleep(10)
      }
    }
    sys.error("unreachable")
  }

  /** Read the active version. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolve(spark, root))

  private def versionDirs(f: FileSystem, rootP: HPath): Seq[(Int, HPath)] =
    if (!f.exists(rootP)) Seq.empty
    else f.listStatus(rootP).toSeq.collect {
      case s if s.isDirectory && s.getPath.getName.matches("v_\\d+") =>
        (s.getPath.getName.drop(2).toInt, s.getPath)
    }.sortBy(_._1)

  /** Atomically claim the next free version number ≥ the given floor.
    * Bounded: a persistent (non-already-exists) IO failure surfaces
    * after the attempt budget instead of spinning on rising numbers.
    */
  private def claimNext(f: FileSystem, root: String, floor: Int): String = {
    var lastErr: java.io.IOException = null
    var n = floor
    while (n < floor + 1000) {
      val name = f"v_$n%06d"
      try {
        f.create(new HPath(s"$root/.$name.claim"), false).close()
        return name
      } catch {
        case e: java.io.IOException => lastErr = e; n += 1 // claimed (or raced); try next
      }
    }
    throw new java.io.IOException(
      s"could not claim a version under $root after 1000 attempts", lastErr)
  }

  /** Write `df` as the next version and atomically publish it. Returns
    * the new version dir. Readers in flight keep their resolved dir;
    * new resolves see the new version the instant the pointer rename
    * lands.
    */
  def commit(
      spark: SparkSession, root: String, df: DataFrame,
      gcGraceMs: Long = DefaultGcGraceMs,
      partitions: Seq[String] = Nil): String = {
    val rootP = new HPath(root)
    val f = fs(spark, rootP)
    if (!f.exists(rootP)) f.mkdirs(rootP)
    val floor = versionDirs(f, rootP).lastOption.fold(1)(_._1 + 1)
    val vName = claimNext(f, root, floor)
    val vDir = s"$root/$vName"
    val w = df.write.mode("overwrite")
    (if (partitions.nonEmpty) w.partitionBy(partitions: _*) else w).parquet(vDir)

    // the version active until this instant stays retained for its
    // in-flight readers. ONLY a missing pointer means "first commit";
    // any other resolve failure aborts (a transient error must not be
    // mistaken for an empty history — GC would then delete the version
    // readers are on)
    val prevActive: Option[String] =
      try Some(new HPath(resolve(spark, root)).getName)
      catch { case _: java.io.FileNotFoundException => None }

    // publish: write the pointer beside _current, then atomic-overwrite
    // rename it into place (FileContext supports OVERWRITE; the plain
    // FileSystem.rename does not)
    val tmp = new HPath(s"$root/._current.tmp")
    val out = f.create(tmp, true)
    try out.write(vName.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val fc = FileContext.getFileContext(rootP.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new HPath(s"$root/$Pointer"), Options.Rename.OVERWRITE)

    // GC everything outside {new, previously-active}, graced by a REAP
    // TOMBSTONE: the first commit that sees a version superseded drops
    // `.v_N.reap` beside it; only a commit running gcGraceMs after that
    // sighting deletes. Keying the clock on supersession time (tombstone
    // creation) rather than dir mtime matters — a dir's mtime does not
    // advance during a long in-flight parquet write (and is synthetic on
    // object stores), so an mtime-keyed grace would reap a slow racing
    // committer mid-write. A version that later publishes clears its
    // tombstone below.
    val keep = Set(vName) ++ prevActive
    val cutoff = System.currentTimeMillis() - gcGraceMs
    def reapTomb(v: String) = new HPath(s"$root/.$v.reap")
    keep.foreach(v => f.delete(reapTomb(v), false)) // published → not reapable
    val statuses = f.listStatus(rootP).toSeq
    statuses
      .filter(s => s.isDirectory && s.getPath.getName.matches("v_\\d+"))
      .filterNot(s => keep(s.getPath.getName))
      .foreach { s =>
        val v = s.getPath.getName
        val tomb = reapTomb(v)
        def reap(): Unit = {
          f.delete(s.getPath, true)
          f.delete(new HPath(s"$root/.$v.claim"), false)
          f.delete(tomb, false)
        }
        if (gcGraceMs <= 0) reap() // single-writer mode: no tombstone round-trip
        else if (!f.exists(tomb)) f.create(tomb, true).close() // start the clock
        else if (f.getFileStatus(tomb).getModificationTime <= cutoff) reap()
      }
    // orphan claims with no dir: claim mtime IS the right clock there
    // (the dir appears immediately after a live claim)
    statuses
      .filter(s => s.isFile && s.getPath.getName.matches("\\.v_\\d+\\.claim"))
      .filter(_.getModificationTime <= cutoff)
      .map(_.getPath.getName.stripPrefix(".").stripSuffix(".claim"))
      .filterNot(keep)
      .filterNot(v => f.exists(new HPath(s"$root/$v")))
      .foreach(v => f.delete(new HPath(s"$root/.$v.claim"), false))
    vDir
  }
}
