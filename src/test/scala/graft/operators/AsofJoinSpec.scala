package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AsofJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("backward picks the latest right row at or before the left time") {
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"), (3L, 1L, "d"))
      .toDF("k", "lt", "tag")
      .withColumn("lt", timestamp_seconds(col("lt")))
    val right = Seq((1L, 5L, 100.0), (1L, 8L, 200.0), (1L, 11L, 300.0),
        (2L, 9L, 400.0))
      .toDF("k", "rt", "payload")
      .withColumn("rt", timestamp_seconds(col("rt")))

    val out = AsofJoin.backward(left, right, "k", "lt", "rt")
      .select("tag", "payload").collect().map(r =>
        r.getString(0) -> Option(r.get(1))).toMap
    // a: latest rt<=10 is 8 -> 200; b: rt<=5 inclusive -> 100
    // c: no right rt<=7 for k=2 (9 > 7) -> null; d: no k=3 rows -> null
    assert(out === Map("a" -> Some(200.0), "b" -> Some(100.0),
      "c" -> None, "d" -> None))
  }

  test("forward picks the earliest right row at or after the left time") {
    val left = Seq((1L, 6L, "a"), (1L, 12L, "b")).toDF("k", "lt", "tag")
      .withColumn("lt", timestamp_seconds(col("lt")))
    val right = Seq((1L, 5L, 1.0), (1L, 6L, 2.0), (1L, 9L, 3.0))
      .toDF("k", "rt", "payload")
      .withColumn("rt", timestamp_seconds(col("rt")))
    val out = AsofJoin.forward(left, right, "k", "lt", "rt")
      .select("tag", "payload").collect().map(r =>
        r.getString(0) -> Option(r.get(1))).toMap
    assert(out === Map("a" -> Some(2.0), "b" -> None))
  }

  test("matches a brute-force correlated scan on generated data") {
    val n = 400
    val left = spark.range(n).select(
      (col("id") % 7).as("k"),
      timestamp_seconds(pmod(col("id") * 37 + 11, lit(1000))).as("lt"),
      col("id").as("lid"))
    val right = spark.range(n).select(
      (col("id") % 7).as("k"),
      timestamp_seconds(pmod(col("id") * 53 + 3, lit(1000))).as("rt"),
      (col("id") * 2).cast("double").as("pay"))
      // one row per (k, rt) so the expected answer is unique
      .groupBy("k", "rt").agg(max("pay").as("pay"))

    val got = AsofJoin.backward(left, right, "k", "lt", "rt")
      .select("lid", "rt", "pay")

    val exp = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("l.lt") >= col("r.rt"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lid").orderBy(col("r.rt").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("lid"), col("r.rt").as("rt"), col("r.pay").as("pay"))

    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("null right payload fields do not tear the matched row") {
    val left = Seq((1L, 10L, "x")).toDF("k", "lt", "tag")
      .withColumn("lt", timestamp_seconds(col("lt")))
    // latest right row (t=9) has a NULL in column a; an older row (t=5)
    // has a=1. The match must be the WHOLE t=9 row — (null, 30.0) —
    // not a chimera (1.0, 30.0) assembled from both rows.
    val right = Seq((1L, 5L, Some(1.0), 20.0), (1L, 9L, None, 30.0))
      .toDF("k", "rt", "a", "b")
      .withColumn("rt", timestamp_seconds(col("rt")))
    val row = AsofJoin.backward(left, right, "k", "lt", "rt")
      .select("a", "b").collect()(0)
    assert(row.isNullAt(0) && row.getDouble(1) == 30.0)
  }

  test("reserved internal column names are rejected") {
    val l = Seq((1L, 1L, 2.0)).toDF("k", "_t", "v")
    val r = Seq((1L, 1L, 3.0)).toDF("k", "rt", "pay")
    assertThrows[IllegalArgumentException] {
      AsofJoin.backward(l, r, "k", "_t", "rt")
    }
  }

  test("tolerance rejects stale matches instead of falling back") {
    val left = Seq((1L, 100L, "near"), (1L, 500L, "far")).toDF("k", "lt", "tag")
      .withColumn("lt", timestamp_seconds(col("lt")))
    val right = Seq((1L, 90L, 7.0), (1L, 130L, 8.0)).toDF("k", "rt", "payload")
      .withColumn("rt", timestamp_seconds(col("rt")))
    val out = AsofJoin.backward(left, right, "k", "lt", "rt",
        toleranceSeconds = Some(60L))
      .select("tag", "payload").collect().map(r =>
        r.getString(0) -> Option(r.get(1))).toMap
    // "near" is 10s after rt=90 (within 60s); "far" is 370s after
    // rt=130 — the match exists but is too old, so pandas-style null
    assert(out === Map("near" -> Some(7.0), "far" -> None))
    val fwd = AsofJoin.forward(left, right, "k", "lt", "rt",
        toleranceSeconds = Some(60L))
      .select("tag", "payload").collect().map(r =>
        r.getString(0) -> Option(r.get(1))).toMap
    // forward: "near"(100) sees rt=130, gap 30 within; "far"(500) has
    // no later right row at all
    assert(fwd === Map("near" -> Some(8.0), "far" -> None))
  }

  test("colliding right column names are rejected") {
    val l = Seq((1L, 1L, 2.0)).toDF("k", "t", "value")
      .withColumn("t", timestamp_seconds(col("t")))
    val r = Seq((1L, 1L, 3.0)).toDF("k", "rt", "value")
      .withColumn("rt", timestamp_seconds(col("rt")))
    assertThrows[IllegalArgumentException] {
      AsofJoin.backward(l, r, "k", "t", "rt")
    }
  }
}
