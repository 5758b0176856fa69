package graft.api

/** SQL-identifier quoting for column names interpolated into `expr()`
  * strings. Any name that reaches a SQL fragment goes through [[bq]] so
  * CSV-born names with spaces/hyphens/dots (or embedded backticks)
  * survive the median/percentile/mad paths — mirrors how the reference
  * always addresses fields by exact mapping name rather than splicing
  * them into Painless source (eland/query_compiler.py field resolution).
  */
private[graft] object Names {
  /** Backtick-quote a column name for use inside a Spark SQL string. */
  def bq(name: String): String = "`" + name.replace("`", "``") + "`"
}
