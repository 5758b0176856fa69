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
    */
  def pointInInterval(points: DataFrame, pointTime: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collisions.isEmpty,
      s"point/interval columns collide: ${collisions.mkString(", ")}")
    require(!(points.columns ++ intervals.columns).contains("_bucket"),
      "column name _bucket is reserved by the range join")

    val pts = points.withColumn("_bucket",
      floor(unix_timestamp(col(pointTime)) / bucketSeconds))
    val ints = intervals.withColumn("_bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    pts.join(ints, Seq("_bucket"))
      .filter(col(pointTime) >= col(startCol) &&
        col(pointTime) <= col(endCol))
      .drop("_bucket")
  }
}
