package graft.core

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Shared-storage home for persisted derived state — near-dup and ANN
  * indexes ([[graft.dedup.MinHashLSH.buildIndex]],
  * [[graft.similarity.IvfIndex.save]]) that are built once and probed
  * by every subsequent batch.
  *
  * On a cluster, set `spark.graft.warehouse` to a path every executor
  * can read and write (s3://…, hdfs://…) — an index written to a
  * driver-local temp dir would scatter its shards across executor-local
  * disks and silently serve a fraction of itself. The local default is
  * a stable per-user directory under java.io.tmpdir, correct only in
  * local mode and for tests.
  *
  * Index dirs are keyed by a fingerprint of the SOURCE table's file
  * statuses (name, length, mtime), so a changed source gets a fresh
  * index dir instead of silently serving a stale one, while an
  * unchanged source reuses its built index across processes — the
  * build cost amortizes to zero on the day-2 probe path.
  */
object Warehouse {

  val ConfKey = "spark.graft.warehouse"

  def root(spark: SparkSession): String =
    spark.conf.getOption(ConfKey).getOrElse(
      s"${sys.props("java.io.tmpdir")}/graft-warehouse-${sys.props.getOrElse("user.name", "anon")}")

  private def fs(spark: SparkSession, p: HPath): FileSystem =
    FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)

  /** Hex fingerprint of a source dir/file plus the builder's
    * parameterization: every file's (name, length, mtime) and the
    * `params` string folded through a 64-bit FNV-1a — a metadata-only
    * listing, no data scan.
    */
  private def fingerprint(
      spark: SparkSession, sourcePath: String, params: String): String = {
    val p = new HPath(sourcePath)
    val f = fs(spark, p)
    val parts: Seq[String] =
      if (!f.exists(p)) Seq("absent")
      else {
        val it = f.listFiles(p, true)
        val b = Seq.newBuilder[String]
        while (it.hasNext) {
          val s = it.next()
          b += s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}"
        }
        b.result().sorted
      }
    var h = 0xcbf29ce484222325L
    (params + "||" + parts.mkString("|")).foreach { c => h ^= c; h *= 0x100000001b3L }
    f"$h%016x"
  }

  /** Stable index dir for derived state of kind `kind` over
    * `sourcePath`: `<root>/<kind>/<fingerprint>`. `params` MUST encode
    * every builder knob the stored state depends on (LSH
    * bits/tables/seed, shingle n/k/b, quantizer c/iterations, …): the
    * source fingerprint alone cannot see a code-side knob change, and a
    * probe against an index built with different knobs is silently
    * wrong, not slow.
    */
  def derivedDir(
      spark: SparkSession, kind: String, sourcePath: String,
      params: String = ""): String =
    s"${root(spark)}/$kind/${fingerprint(spark, sourcePath, params)}"

  private val BuiltMarker = "_GRAFT_BUILT"

  /** Build-once: if `dir` carries the completion marker, reuse it;
    * otherwise run `build(dir)` (which must write with overwrite
    * semantics) and drop the marker. Guarded by an [[FsLock]] so two
    * processes arriving at an unbuilt index serialize — the loser of
    * the lock either finds the marker on retry or surfaces the
    * conflict loudly rather than interleaving overwrites.
    */
  def ensureBuilt(spark: SparkSession, dir: String)(build: String => Unit): String = {
    val marker = new HPath(s"$dir/$BuiltMarker")
    val f = fs(spark, marker)
    if (f.exists(marker)) {
      // touch: the marker's mtime is this index's liveness clock for
      // [[pruneStale]] — an index in active use never ages out
      try f.setTimes(marker, System.currentTimeMillis(), -1)
      catch { case _: java.io.IOException => () }
      buildEvents.add(dir -> false)
      return dir
    }
    var builtNow = false
    FsLock.withLock(spark, dir, s"warehouse-build-${ProcessHandle.current().pid()}") {
      if (!f.exists(marker)) { // double-check under the lock
        build(dir)
        f.create(marker, true).close()
        builtNow = true
      }
    }
    buildEvents.add(dir -> builtNow)
    pruneStale(spark, dir)
    dir
  }

  /** Process-local log of [[ensureBuilt]] outcomes, (dir → built this
    * call?). A benchmark drains it around each timed query to record
    * whether an indexed query's wall time includes the one-off index
    * BUILD or only the steady-state probe — without it a build-vs-probe
    * cost difference is unattributable noise in the bench artifact.
    */
  private val buildEvents =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Boolean)]

  /** Drain and return the [[ensureBuilt]] outcomes recorded since the
    * last drain.
    */
  def drainBuildEvents(): Seq[(String, Boolean)] = {
    val b = Seq.newBuilder[(String, Boolean)]
    var e = buildEvents.poll()
    while (e != null) { b += e; e = buildEvents.poll() }
    b.result()
  }

  /** Default retention for superseded index states: long enough that
    * any job started against an old corpus state finishes.
    */
  val DefaultRetainMs: Long = 7L * 24 * 60 * 60 * 1000

  /** Drop sibling index dirs of the same kind that are UNUSED — each
    * changed source or parameterization leaves its old dir behind
    * forever otherwise. Age is the sibling's completion MARKER mtime —
    * a real file timestamp even on object stores whose directory
    * mtimes are synthetic — and [[ensureBuilt]] touches the marker on
    * every reuse, so any index probed within the retention window
    * (including other sources sharing the kind) stays alive. Dirs
    * WITHOUT a marker are never touched: that's a concurrent build in
    * flight (its FsLock protects it) or a crashed one (harmless, and
    * its own rebuild will overwrite). Best-effort: IO failures here
    * never fail the build that triggered it.
    */
  private[core] def pruneStale(
      spark: SparkSession, dir: String, retainMs: Long = DefaultRetainMs): Unit = {
    try {
      val p = new HPath(dir)
      val parent = p.getParent
      val f = fs(spark, parent)
      val cutoff = System.currentTimeMillis() - retainMs
      f.listStatus(parent)
        .filter(s => s.isDirectory && s.getPath.getName != p.getName)
        .filter { s =>
          val m = new HPath(s.getPath, BuiltMarker)
          try f.exists(m) && f.getFileStatus(m).getModificationTime <= cutoff
          catch { case _: java.io.IOException => false }
        }
        .foreach(s => f.delete(s.getPath, true))
    } catch { case _: java.io.IOException => () }
  }
}
