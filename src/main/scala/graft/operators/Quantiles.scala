package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact quantiles via distributed sort + rank selection.
  *
  * Spark's built-in exact `percentile` aggregates a value→count map
  * per partition and merges maps on the driver side of the agg — fine
  * for low-cardinality columns, but the map is O(distinct values) and
  * at 100TB a high-cardinality double column blows it up. A
  * sort-based plan (range-partitioned global sort, pick the two
  * neighbors of each target rank, linear interpolation) is the
  * scale-stable alternative: O(n log n) shuffle, O(1) state.
  *
  * Interpolation matches `percentile` / `quantile_cont`:
  * rank = q*(n-1), v = lo + (hi-lo)*frac.
  */
object Quantiles {

  /** (q, value) rows for each requested quantile of `valueCol`. */
  def viaSort(df: DataFrame, valueCol: String, qs: Seq[Double]): DataFrame =
    viaSort(df, col(valueCol), qs)

  /** Column-expression form (e.g. quantiles of abs deviations). */
  def viaSort(df: DataFrame, value: org.apache.spark.sql.Column,
              qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(value.cast("double").as("v"))
      .filter(col("v").isNotNull)
    // global ascending rank (0-based). zipWithIndex over a sorted
    // Dataset: sortWithinPartitions after a range repartition gives a
    // total order; monotonically_increasing_id is NOT rank, so use a
    // window-free rank via sort + zipWithIndex on the RDD (narrow, no
    // extra shuffle beyond the sort's).
    val sorted = vals.orderBy("v").select("v")
    val n = sorted.count()
    if (n == 0) return qs.toDF("q").withColumn("value", lit(null).cast("double"))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) => (i, r.getDouble(0)) }
    // target ranks: for each q we need floor and ceil of q*(n-1)
    val targets = qs.flatMap { q =>
      val r = q * (n - 1)
      Seq(math.floor(r).toLong, math.ceil(r).toLong)
    }.distinct.toSet
    val picked = ranked.filter { case (i, _) => targets.contains(i) }
      .collect().toMap
    qs.map { q =>
      val r = q * (n - 1)
      val loIdx = math.floor(r).toLong
      val hiIdx = math.ceil(r).toLong
      val lo = picked(loIdx)
      val hi = picked(hiIdx)
      // exactly Spark's Percentile interpolation (weighted two-sided
      // form), so results are bit-identical to the builtin
      val v = if (hiIdx == loIdx) lo
              else hi * (r - loIdx) + lo * (hiIdx - r)
      (q, v)
    }.toDF("q", "value")
  }
}
