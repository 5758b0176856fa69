package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Grouped-aggregation facade: eland `DataFrameGroupBy`
  * (eland/groupby.py) over Spark's `groupBy().agg(...)`.
  *
  * Eland resolves a composite agg with `after_key` pagination at 5000
  * buckets/request (eland/operations.py:822-1053); Spark's partial →
  * shuffle → final HashAggregate replaces the pagination outright and
  * is the scalable shape (no coordinator bottleneck, spills to disk).
  * `dropna=true` (the pandas default) pre-filters null group keys,
  * matching eland's missing_bucket handling (eland/query.py:195-211);
  * MultiIndex output columns flatten to `col_agg` names.
  */
class GraftGroupBy(frame: GraftFrame, by: Seq[String], dropna: Boolean) {

  import Names.bq

  require(by.nonEmpty, "groupby needs at least one key")
  by.foreach(b => require(frame.columns.contains(b), s"unknown by-column $b"))

  private def base: DataFrame = {
    val df = frame.df
    if (dropna) df.filter(by.map(col(_).isNotNull).reduce(_ && _)) else df
  }

  private def aggFields(aggs: Seq[String]): Seq[StructField] =
    frame.schema.fields.toSeq
      .filterNot(f => by.contains(f.name) || f.name == frame.idCol)
      .filter(f => aggs.forall(a => PdDtypes.aggCompatible(a, f.dataType)))

  private def aggExpr(agg: String, f: StructField): Column = {
    val c = f.dataType match {
      case BooleanType => col(f.name).cast("int")
      case _           => col(f.name)
    }
    val temporal = PdDtypes.isTemporal(f.dataType)
    val e = agg match {
      case "count"   => F.count(c)
      case "min"     => F.min(c)
      case "max"     => F.max(c)
      case "mean" if temporal =>
        timestamp_millis(floor(avg(unix_millis(c.cast("timestamp"))))
          .cast("long")).cast(f.dataType)
      case "median" if temporal =>
        timestamp_millis(floor(
          expr(s"median(unix_millis(cast(${bq(f.name)} as timestamp)))"))
          .cast("long")).cast(f.dataType)
      case "mean"    => avg(c)
      case "sum"     => F.sum(c)
      case "std"     => stddev_samp(c)
      case "var"     => var_samp(c)
      case "median"  => expr(s"median(${bq(f.name)})")
      case "nunique" => countDistinct(c)
      case other     => throw new IllegalArgumentException(s"agg: $other")
    }
    e.as(s"${f.name}_$agg")
  }

  /** Multi-agg over all compatible non-key columns; one shuffle, all
    * cells in a single HashAggregate pass (eland needs one ES agg per
    * cell inside one composite request).
    */
  def agg(aggs: Seq[String]): DataFrame = {
    val fields = aggFields(aggs)
    require(fields.nonEmpty, "no compatible agg columns")
    val exprs = for { f <- fields; a <- aggs } yield aggExpr(a, f)
    base.groupBy(by.map(col): _*).agg(exprs.head, exprs.tail: _*)
      .orderBy(by.map(col): _*)
  }

  /** Named per-column aggs: Map(column -> Seq(aggs)). */
  def agg(spec: Map[String, Seq[String]]): DataFrame = {
    val exprs = for {
      (c, aggs) <- spec.toSeq.sortBy(_._1)
      f = frame.schema.fields.find(_.name == c)
        .getOrElse(throw new IllegalArgumentException(s"unknown column $c"))
      a <- aggs
    } yield aggExpr(a, f)
    base.groupBy(by.map(col): _*).agg(exprs.head, exprs.tail: _*)
      .orderBy(by.map(col): _*)
  }

  def count(): DataFrame   = agg(Seq("count"))
  def min(): DataFrame     = agg(Seq("min"))
  def max(): DataFrame     = agg(Seq("max"))
  def mean(): DataFrame    = agg(Seq("mean"))
  def sum(): DataFrame     = agg(Seq("sum"))
  def std(): DataFrame     = agg(Seq("std"))
  def varSamp(): DataFrame = agg(Seq("var"))
  def median(): DataFrame  = agg(Seq("median"))
  def nunique(): DataFrame = agg(Seq("nunique"))

  /** Group size (count of rows per group, not per column). */
  def size(): DataFrame =
    base.groupBy(by.map(col): _*)
      .agg(org.apache.spark.sql.functions.count(lit(1)).cast("long").as("size"))
      .orderBy(by.map(col): _*)

  /** Grouped multi-quantile, exploded to (group, q, value-per-column)
    * rows (eland/operations.py:955-993).
    */
  def quantile(colName: String, qs: Seq[Double]): DataFrame = {
    val qArr = qs.map(q => s"$q").mkString("array(", ", ", ")")
    base.groupBy(by.map(col): _*)
      .agg(expr(s"percentile(${bq(colName)}, $qArr)").as("_qs"))
      .select(by.map(col) :+ posexplode(col("_qs")): _*)
      .withColumn("q", element_at(lit(qs.toArray), col("pos") + 1))
      .select(by.map(col) :+ col("q") :+ col("col").as(s"${colName}_quantile"): _*)
      .orderBy(by.map(col) :+ col("q"): _*)
  }

  /** Grouped MAD, exact two-pass: per-group median join + per-group
    * median of absolute deviations.
    */
  def mad(colName: String): DataFrame = {
    val med = base.groupBy(by.map(col): _*)
      .agg(expr(s"median(${bq(colName)})").as("_gm"))
    base.join(med, by)
      .groupBy(by.map(col): _*)
      .agg(expr(s"median(abs(${bq(colName)} - _gm))").as(s"${colName}_mad"))
      .orderBy(by.map(col): _*)
  }

  /** Grouped mode with pandas tie semantics (all modal values, ties
    * by ascending value). The reference declares this unsupported
    * (`eland/groupby.py:701-702` raises NotImplementedError) — here
    * it is the same two-level aggregation as frame-level mode with
    * the group keys prepended: one counted shuffle, a per-(group)
    * window over the counts, no corpus-wide window.
    */
  def mode(colName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = base.filter(col(colName).isNotNull)
      .groupBy((by :+ colName).map(col): _*)
      .agg(F.count(lit(1)).as("_cnt"))
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("_cnt").desc, col(colName).asc)
    counts
      .withColumn("_best", F.max(col("_cnt")).over(
        Window.partitionBy(by.map(col): _*)))
      .filter(col("_cnt") === col("_best"))
      .withColumn("_mr", row_number().over(w).cast("long"))
      .select(by.map(col) ++ Seq(col("_mr").as("mode_rank"),
        col(colName).as(s"${colName}_mode")): _*)
      .orderBy(by.map(col) :+ col("mode_rank"): _*)
  }
}
