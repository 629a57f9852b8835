package graft.core

/** Column-name quoting for dynamically discovered names (CSV headers,
  * `df.columns` round-trips): both `functions.col` and `Dataset.apply`
  * parse unquoted dots as struct-field access, so a literal column
  * named `album.score` must be backtick-quoted to resolve.
  */
object Cols {
  def quoted(name: String): String = "`" + name.replace("`", "``") + "`"
}
