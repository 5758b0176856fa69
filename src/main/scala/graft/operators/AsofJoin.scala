package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the single
  * right row with the same key whose time is the latest not exceeding
  * the left time ([[backward]]) or the earliest not preceding it
  * ([[forward]]). The operator Spark's built-in join surface lacks
  * (pandas `merge_asof`, DuckDB `ASOF JOIN`) and the one a training
  * pipeline reaches for whenever features must be joined
  * "as of" an observation time without leaking the future.
  *
  * Scale shape — union + running window, NOT a range join:
  * both sides are tagged and unioned, shuffled ONCE on the key, and a
  * running `last(_, ignoreNulls)` over the per-key time order carries
  * the most recent right payload forward onto each left row. Cost is
  * one hash partitioning plus a per-key sort — no interval cross
  * product, no per-row subquery, and no broadcast requirement on
  * either side, so it survives two 100 TB inputs as long as single
  * keys fit a partition (salt-by-time-range first if one key is
  * pathologically hot).
  *
  * Ties: right rows sort before left rows at equal time, so an exact
  * timestamp match IS visible (inclusive bound, matching DuckDB/pandas
  * semantics). Multiple right rows at the same (key, time) are
  * nondeterministic — pre-aggregate the right side to one row per
  * (key, time) when that matters (the driver gate does).
  */
object AsofJoin {

  /** Latest right row with `right.rightTime <= left.leftTime` per key.
    * Right payload columns must not collide with left column names
    * (rename before calling); unmatched left rows keep null payloads.
    *
    * `toleranceSeconds` mirrors pandas `merge_asof(tolerance=...)`:
    * when set, a match older than the tolerance is rejected (payloads
    * null) rather than falling back to anything older still.
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               toleranceSeconds: Option[Long] = None): DataFrame =
    joined(left, right, key, leftTime, rightTime, descending = false,
      toleranceSeconds)

  /** Earliest right row with `right.rightTime >= left.leftTime` per
    * key — the look-ahead mirror of [[backward]].
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              toleranceSeconds: Option[Long] = None): DataFrame =
    joined(left, right, key, leftTime, rightTime, descending = true,
      toleranceSeconds)

  private def joined(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     descending: Boolean,
                     toleranceSeconds: Option[Long]): DataFrame = {
    val payload = right.columns.filterNot(_ == key).toSeq
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right columns collide with left: ${collisions.mkString(", ")} " +
        "- rename them before the as-of join")
    val reserved = Set("_t", "_side", "_payload")
    val reservedHits =
      (left.columns ++ right.columns).toSet.intersect(reserved)
    require(reservedHits.isEmpty,
      s"column names ${reservedHits.mkString(", ")} are reserved by the " +
        "as-of join - rename them before calling")
    val leftCols = left.columns.toSeq

    // the right payload travels as ONE struct so the carry attaches a
    // whole right row: a per-column last(ignoreNulls) would tear rows
    // whenever a right payload column holds a legitimate null (mixing
    // fields of different right rows). The struct is null exactly on
    // left-side rows, so ignoreNulls skips those and nothing else.
    val payloadStruct = struct(payload.map(col): _*)
    val nullPayload = lit(null).cast(
      right.select(payloadStruct).schema.head.dataType)

    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType).as(c)

    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(col("_t") +: col("_side") +: (leftCols.map(col) :+
        nullPayload.as("_payload")): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(col("_t") +: col("_side") +: (col(key) +:
        (leftCols.filterNot(_ == key).map(nullOf(left, _)) :+
          payloadStruct.as("_payload"))): _*)

    val ord: Seq[Column] =
      if (descending) Seq(col("_t").desc, col("_side").asc)
      else Seq(col("_t").asc, col("_side").asc)
    val w = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val bounded = toleranceSeconds match {
      case None => carried
      case Some(tol) =>
        // gap measured on whole epoch seconds, on the matched row's
        // own right time (the struct keeps time and values together)
        val rt = col("_payload").getField(rightTime)
        val gap =
          if (descending) rt.cast("long") - col(leftTime).cast("long")
          else col(leftTime).cast("long") - rt.cast("long")
        carried.withColumn("_payload",
          when(rt.isNotNull && gap <= tol, col("_payload")))
    }
    payload.foldLeft(bounded) { (df, c) =>
      df.withColumn(c, col("_payload").getField(c))
    }.drop("_t", "_side", "_payload")
  }
}
