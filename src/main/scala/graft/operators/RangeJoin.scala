package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join via fixed-width time bucketing.
  *
  * Spark plans a raw `p.ts BETWEEN i.start AND i.end` join as a
  * broadcast-nested-loop (or cartesian) product — O(|points| ×
  * |intervals|) comparisons, fatal when both sides are large. This
  * operator turns it into an equi-join: every interval is exploded
  * onto the fixed-width buckets it covers, every point lands in
  * exactly one bucket, and the bucket equi-join (a plain shuffled
  * hash join Catalyst can optimize) is refined by the exact BETWEEN
  * filter. Cost is O(|points| + |intervals| × buckets-per-interval +
  * |matches|): pick `bucketSeconds` near the typical interval length
  * so the expansion factor stays ~1-2.
  *
  * A point has exactly one bucket, so no pair is emitted twice and no
  * distinct pass is needed. Intervals must be bounded (end ≥ start);
  * degenerate huge intervals expand proportionally — split those out
  * and broadcast them instead.
  */
object RangeJoin {

  /** Inner-join `points` to every interval containing them
    * (inclusive bounds). Column names must be disjoint; timestamps
    * are bucketed on whole epoch seconds, which is consistent for
    * both bound checks because `unix_timestamp` truncation is
    * monotone.
    *
    * Malformed intervals (end < start) are dropped BEFORE the bucket
    * explode: they can match no point anyway (the BETWEEN refinement
    * is unsatisfiable), and without the filter `sequence`'s default
    * step would silently walk DESCENDING and emit garbage buckets; the
    * explode therefore uses an explicit step of 1. Intervals spanning
    * more than `maxBucketsPerInterval` buckets abort with a clear
    * message naming the interval bounds — the degenerate-interval
    * guard: one year-long interval at 600 s buckets would explode
    * 52 k rows, and such outliers should be split out and broadcast
    * (see the class note) rather than silently multiplied.
    */
  def pointInInterval(points: DataFrame, pointTime: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long,
                      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collisions.isEmpty,
      s"point/interval columns collide: ${collisions.mkString(", ")}")
    require(!(points.columns ++ intervals.columns).contains("_bucket"),
      "column name _bucket is reserved by the range join")

    val pts = points.withColumn("_bucket",
      floor(unix_timestamp(col(pointTime)) / bucketSeconds))
    val b0 = floor(unix_timestamp(col(startCol)) / bucketSeconds)
    val b1 = floor(unix_timestamp(col(endCol)) / bucketSeconds)
    // the greatest() clamp keeps the sequence bounds total even for
    // rows the filter drops: constant folding may evaluate the
    // expression on literal inputs independently of the filter, and an
    // unclamped descending range would throw at PLANNING time
    val ints = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("_bucket", explode(sequence(b0,
        when(b1 - b0 < maxBucketsPerInterval, greatest(b0, b1))
          .otherwise(raise_error(concat(
            lit(s"interval spans more than $maxBucketsPerInterval buckets of " +
              s"$bucketSeconds s ["), col(startCol), lit(", "), col(endCol),
            lit("]: raise bucketSeconds, or split degenerate intervals out " +
              "and broadcast them")))),
        lit(1L))))
    pts.join(ints, Seq("_bucket"))
      .filter(col(pointTime) >= col(startCol) &&
        col(pointTime) <= col(endCol))
      .drop("_bucket")
  }
}
