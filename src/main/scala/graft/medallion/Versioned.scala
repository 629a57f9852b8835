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
  * Old versions are retained for `keepVersions` commits (in-flight
  * readers of the previous version finish against immutable files) and
  * garbage-collected after.
  */
object Versioned {

  private val Pointer = "_current"

  private def fs(spark: SparkSession, p: HPath): FileSystem =
    FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)

  /** Active version dir (absolute path). Fails if never committed. */
  def resolve(spark: SparkSession, root: String): String = {
    val ptr = new HPath(s"$root/$Pointer")
    val f = fs(spark, ptr)
    val in = f.open(ptr)
    val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    require(v.nonEmpty, s"$ptr is empty")
    s"$root/$v"
  }

  /** Read the active version. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolve(spark, root))

  private def versionsOn(f: FileSystem, rootP: HPath): Seq[(Int, HPath)] =
    if (!f.exists(rootP)) Seq.empty
    else f.listStatus(rootP).toSeq.collect {
      case s if s.isDirectory && s.getPath.getName.matches("v_\\d+") =>
        (s.getPath.getName.drop(2).toInt, s.getPath)
    }.sortBy(_._1)

  /** Write `df` as the next version and atomically publish it. Returns
    * the new version dir. Readers in flight keep their resolved dir;
    * new resolves see the new version the instant the pointer rename
    * lands.
    */
  def commit(
      spark: SparkSession, root: String, df: DataFrame,
      keepVersions: Int = 2): String = {
    require(keepVersions >= 1, "must keep at least the active version")
    val rootP = new HPath(root)
    val f = fs(spark, rootP)
    val next = versionsOn(f, rootP).lastOption.fold(1)(_._1 + 1)
    val vName = f"v_$next%06d"
    val vDir = s"$root/$vName"
    df.write.mode("overwrite").parquet(vDir)

    // publish: write the pointer beside _current, then atomic-overwrite
    // rename it into place (FileContext supports OVERWRITE; the plain
    // FileSystem.rename does not)
    val tmp = new HPath(s"$root/._current.tmp")
    val out = f.create(tmp, true)
    try out.write(vName.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val fc = FileContext.getFileContext(rootP.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new HPath(s"$root/$Pointer"), Options.Rename.OVERWRITE)

    // GC versions older than the retained window (never the active one)
    versionsOn(f, rootP).dropRight(keepVersions)
      .foreach { case (_, p) => f.delete(p, true) }
    vDir
  }
}
