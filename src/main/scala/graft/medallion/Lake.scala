package graft.medallion

/** Layer/path scheme for a medallion lake rooted at `root`
  * (reference: bucket prefixes `landing/ bronze/ silver/ gold/` —
  * `flows/bronze.py:21-23`, `flows/silver.py:20-22`, `flows/gold.py:18-20`).
  * Paths are plain strings so the same scheme works for local FS, HDFS,
  * or an object store (`s3a://bucket/...`) unchanged.
  */
final case class Lake(root: String) {
  def landing(dataset: String): String = s"$root/landing/$dataset"
  def errors(dataset: String): String = s"$root/errors/$dataset"
  def bronze(dataset: String): String = s"$root/bronze/$dataset"
  def silver(dataset: String): String = s"$root/silver/$dataset"
  def goldRoot: String = s"$root/gold"
  def gold(name: String): String = s"$goldRoot/$name"
}
