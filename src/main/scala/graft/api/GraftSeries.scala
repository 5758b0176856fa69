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
  def strRepeat(n: Int): Column = repeat(col, n)

  // ---- full-text match (eland/series.py:752 Series.es_match) -------
  /** Predicate matching this column against an analyzed-text query —
    * the Series-level `es_match`; compose with `frame.where`. Refuses
    * non-text columns like the reference (see GraftFrame.esMatch);
    * `matchOnlyTextFields = false` is the lenient escape hatch.
    */
  def esMatch(query: String, operator: String = "or",
              fuzziness: Option[Int] = None,
              matchOnlyTextFields: Boolean = true,
              analyzer: String = "standard"): Column = {
    if (matchOnlyTextFields) {
      val es = frame.fieldCaps.find(_.column == name)
        .map(_.esDtype).getOrElse("object")
      require(es == "text",
        s"Attempting to run esMatch() on non-text field ($name=$es); " +
          "pin it as text via withEsDtype or pass matchOnlyTextFields=false")
    }
    fuzziness match {
      case Some(f) if operator == "and" =>
        graft.functions.EsMatch.matchFuzzyAll(col, query, f, analyzer)
      case Some(f) =>
        graft.functions.EsMatch.matchFuzzy(col, query, f, analyzer)
      case None if operator == "and" =>
        graft.functions.EsMatch.matchAll(col, query, analyzer)
      case None =>
        graft.functions.EsMatch.matchAny(col, query, analyzer)
    }
  }

  // ---- metric aggregations (eland/series.py:596-780) ---------------
  /** One-row frame of the requested aggs over this column, with
    * eland's `<col>_<agg>` naming — the lazy/plan form behind the
    * scalar accessors below.
    */
  def aggregate(aggs: Seq[String]): DataFrame = {
    val f = frame.schema.fields.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown column $name"))
    val exprs = aggs.map(a => frame.aggExpr(a, f))
    frame.df.agg(exprs.head, exprs.tail: _*)
  }

  private def scalar(agg: String): Any = aggregate(Seq(agg)).head().get(0)
  private def scalarD(agg: String): Double =
    scalar(agg).asInstanceOf[Number].doubleValue()

  /** Scalar metric aggs — eland Series.mean()/sum()/... return numpy
    * scalars (eland/series.py:596-780); these are the eager Spark
    * equivalents. EACH CALL IS ONE SPARK JOB (a driver-collected
    * one-row aggregate): needing several stats, call
    * `aggregate(Seq("mean", "std", ...))` once — all of them compute
    * in a single scan/aggregate pass (the s1 gate's shape) instead of
    * one scan per accessor.
    */
  def mean(): Double = scalarD("mean")
  def sum(): Double = scalarD("sum")
  def min(): Any = scalar("min")
  def max(): Any = scalar("max")
  def std(): Double = scalarD("std")
  def varSamp(): Double = scalarD("var")
  def median(): Double = scalarD("median")
  def nunique(): Long = scalar("nunique").asInstanceOf[Number].longValue()

  /** Exact two-pass MAD of this column (eland/series.py:714-738). */
  def mad(): Double = frame.mad(name).head().getDouble(0)

  /** Single-column describe frame (eland/series.py:Series.describe). */
  def describe(): DataFrame =
    if (name == frame.idCol) GraftFrame(frame.df.select(col), name).describe()
    else toFrame.drop(Seq(frame.idCol), errors = "ignore").describe()

  // ---- frame-shaped views (eland/series.py:142-353) ----------------
  def toFrame: GraftFrame =
    GraftFrame(frame.df.select(frame.df(frame.idCol), col), frame.idCol)

  def shape: (Long, Int) = (frame.len(), 1)
  def ndim: Int = 1
  def isEmpty: Boolean = frame.isEmpty()

  /** pandas dtype of this column (eland Series.dtype). */
  def dtype: String = frame.dtypes.toMap.apply(name)

  /** ES dtype per the capability matrix (eland Series.es_dtype). */
  def esDtype: String =
    frame.fieldCaps.find(_.column == name).map(_.esDtype).getOrElse("object")

  /** Display-name relabel (eland Series.rename: new Series, same
    * backing query).
    */
  def renamed(newName: String): GraftSeries =
    new GraftSeries(frame.rename(Map(name -> newName)), newName)

  def head(n: Int = 5): GraftFrame = toFrame.head(n)
  def tail(n: Int = 5): GraftFrame = toFrame.tail(n)
  def sample(n: Int, seed: Long): GraftFrame = toFrame.sample(n, seed)

  /** Keep/reorder by id list (eland Series.filter(items, axis=0)). */
  def filterItems(ids: Seq[Any]): GraftFrame = toFrame.keepIds(ids)

  /** Plan inspection for the single-column query (Series.es_info). */
  def esInfo(): String = toFrame.esInfo()

  /** Capped text render (Series.to_string / __repr__). */
  def renderString(maxRows: Int = 60): String = toFrame.renderString(maxRows)

  // ---- single-column aggregations ----------------------------------
  /** Multi-quantile over this column (eland/series.py:597-636). */
  def quantile(qs: Seq[Double]): DataFrame = {
    import Names.bq
    val exprs = qs.map(q => expr(s"percentile(${bq(name)}, $q)").as(s"${name}_q$q"))
    frame.df.agg(exprs.head, exprs.tail: _*)
  }

  def mode(esSize: Int = 10): DataFrame = frame.mode(name, esSize)
  def valueCounts(n: Int = 10): DataFrame = frame.valueCounts(name, n)
  def uniqueValues: DataFrame = frame.unique(name)
  def histogram(bins: Int): DataFrame = frame.hist(name, bins)
}
