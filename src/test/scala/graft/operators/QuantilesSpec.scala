package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sort-based quantiles equal the builtin exact percentile") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val viaSort = Quantiles.viaSort(li, "l_extendedprice", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val builtin = li.agg(
      expr(s"percentile(l_extendedprice, array(${qs.mkString(",")}))"))
      .head().getSeq[Double](0)
    qs.zipWithIndex.foreach { case (q, i) =>
      assert(viaSort(q) == builtin(i), s"q=$q")
    }
  }

  test("ranks stay correct when input is spread over many partitions") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem").repartition(16)
    val qs = Seq(0.1, 0.5, 0.9)
    val spread = Quantiles.viaSort(li, "l_extendedprice", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val single = Quantiles.viaSort(
      Tables.load(spark, TestSpark.sfDir, "lineitem").coalesce(1),
      "l_extendedprice", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(spread == single)
  }

  test("empty input yields null quantiles, singleton yields the value") {
    import spark.implicits._
    val empty = Quantiles.viaSort(
      Seq.empty[Double].toDF("x"), "x", Seq(0.5)).head()
    assert(empty.isNullAt(1))
    val one = Quantiles.viaSort(
      Seq(42.0).toDF("x"), "x", Seq(0.0, 0.5, 1.0))
      .collect().map(_.getDouble(1)).toSeq
    assert(one == Seq(42.0, 42.0, 42.0))
  }
}
