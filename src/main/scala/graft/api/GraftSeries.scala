package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-column facade: eland `Series` (eland/series.py) — both a
  * 1-column frame and the operand type for predicates and arithmetic.
  *
  * In eland, Series-vs-Series ops compile to Painless scripts over the
  * same document (eland/arithmetics.py, eland/filter.py:166-179); here
  * both operands are Columns of the same Dataset, so every operator is
  * a plain Column expression and the whole codegen layer disappears
  * (SURVEY.md §3.3).
  */
class GraftSeries(val frame: GraftFrame, val name: String) {

  /** Unbound name reference, not `frame.df(name)`: eland frames are
    * single-table, and an instance-bound attribute would make
    * predicates built from one read fail against an equal frame from
    * another read (a real landmine for `df[df['x'] > 5]`-style use).
    */
  def col: Column = {
    require(frame.columns.contains(name), s"unknown column $name")
    org.apache.spark.sql.functions.col(name)
  }

  // ---- predicates (eland/filter.py; SURVEY §2.3 F1-F7) -------------
  def >(v: Any): Column  = col > lit(v)
  def >=(v: Any): Column = col >= lit(v)
  def <(v: Any): Column  = col < lit(v)
  def <=(v: Any): Column = col <= lit(v)
  def ===(v: Any): Column = col === lit(v)
  def =!=(v: Any): Column = col =!= lit(v)
  def >(o: GraftSeries): Column  = col > o.col
  def <(o: GraftSeries): Column  = col < o.col
  def ===(o: GraftSeries): Column = col === o.col
  def isin(vs: Seq[Any]): Column = col.isin(vs: _*)
  def isna: Column = col.isNull
  def notna: Column = col.isNotNull

  /** eland wildcard `es_wildcard` — `*`/`?` translated to LIKE. */
  def esWildcard(pattern: String): Column =
    col.like(Predicates.wildcardToLike(pattern))
  def rlike(re: String): Column = col.rlike(re)
  def startsWith(s: String): Column = col.startsWith(s)

  // ---- arithmetic (eland/arithmetics.py; SURVEY §2.8 E1-E6) --------
  def +(v: Any): Column = col + lit(v)
  def -(v: Any): Column = col - lit(v)
  def *(v: Any): Column = col * lit(v)
  def /(v: Any): Column = col / lit(v)
  def %(v: Any): Column = col % lit(v)
  def +(o: GraftSeries): Column = col + o.col
  def -(o: GraftSeries): Column = col - o.col
  def *(o: GraftSeries): Column = col * o.col
  def /(o: GraftSeries): Column = col / o.col
  def floordiv(o: GraftSeries): Column = floor(col / o.col)
  // reflected operators — eland's __radd__/__rsub__/... aliases
  // (eland/series.py:1345-1372): scalar on the left
  def radd(v: Any): Column = lit(v) + col
  def rsub(v: Any): Column = lit(v) - col
  def rmul(v: Any): Column = lit(v) * col
  def rdiv(v: Any): Column = lit(v) / col
  def rmod(v: Any): Column = lit(v) % col
  def rfloordiv(v: Any): Column = floor(lit(v) / col)
  def rpow(v: Double): Column = org.apache.spark.sql.functions.pow(lit(v), col)
  def pow(v: Double): Column = org.apache.spark.sql.functions.pow(col, v)
  def strConcat(o: GraftSeries): Column = concat(col, o.col)
  def strRepeat(n: Int): Column = expr(s"repeat($name, $n)")

  // ---- single-column aggregations ----------------------------------
  def toFrame: GraftFrame =
    GraftFrame(frame.df.select(frame.df(frame.idCol), col), frame.idCol)

  def valueCounts(n: Int = 10): DataFrame = frame.valueCounts(name, n)
  def uniqueValues: DataFrame = frame.unique(name)
  def histogram(bins: Int): DataFrame = frame.hist(name, bins)
}
