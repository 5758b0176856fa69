package graft.api

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class GraftSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def f = GraftFrame(
    Tables.load(spark, TestSpark.sfDir, "part"), "p_partkey")

  test("comparison predicates filter as expected") {
    val n = f.df.count()
    val gt = f.where(f("p_size") > 25).df.count()
    val le = f.where(f("p_size") <= 25).df.count()
    assert(gt + le == n)
    assert(f.where(f("p_brand") === "Brand#1").df.count() ==
      f.df.filter("p_brand = 'Brand#1'").count())
  }

  test("series-vs-series comparison and isin") {
    val a = f.where(f("p_size") > f("p_partkey")).df.count()
    val b = f.df.filter("p_size > p_partkey").count()
    assert(a == b)
    assert(f.where(f("p_brand").isin(Seq("Brand#1", "Brand#2"))).df.count() ==
      f.df.filter("p_brand IN ('Brand#1','Brand#2')").count())
  }

  test("esWildcard translates * and ? into LIKE semantics") {
    val star = f.where(f("p_name").esWildcard("*re*")).df.count()
    assert(star == f.df.filter("p_name LIKE '%re%'").count())
    val q = f.where(f("p_name").esWildcard("re? widget")).df.count()
    assert(q == f.df.filter("p_name LIKE 're_ widget'").count())
  }

  test("arithmetic operators build correct columns") {
    import org.apache.spark.sql.functions._
    val r = f.df.select(
      (f("p_size") + 1).as("p1"),
      (f("p_size") * 2).as("t2"),
      f("p_retailprice").floordiv(f("p_size")).as("fd"))
      .filter(col("p1") =!= col("p_size") + 1 ||
        col("t2") =!= col("p_size") * 2 ||
        col("fd") =!= floor(col("p_retailprice") / col("p_size")))
    assert(r.count() == 0)
  }

  test("single-column helpers delegate to the frame") {
    val vc = f("p_brand").valueCounts(3).collect()
    assert(vc.length == 3)
    assert(vc(0).getLong(1) >= vc(1).getLong(1))
    assert(f("p_brand").uniqueValues.count() ==
      f.df.select("p_brand").distinct().count())
  }

  test("frame-shaped views: shape/ndim/dtype/es_dtype/head/tail/rename") {
    val s = f("p_size")
    assert(s.shape == (f.len(), 1) && s.ndim == 1 && !s.isEmpty)
    assert(s.dtype == "int64")
    assert(s.esDtype == "integer")
    assert(f("p_name").esDtype == "text")
    val h = s.head(3).df.collect()
    assert(h.length == 3 && h.map(_.getLong(0)).toSeq.sorted ==
      h.map(_.getLong(0)).toSeq)
    assert(s.tail(3).df.count() == 3)
    assert(s.sample(5, seed = 1).df.count() == 5)
    val r = s.renamed("sz")
    assert(r.name == "sz" && r.toFrame.df.columns.contains("sz"))
    assert(s.renderString(5).contains("p_size"))
    assert(s.esInfo().nonEmpty)
  }

  test("series quantile/mode/filterItems") {
    val q = f("p_retailprice").quantile(Seq(0.5)).head().getDouble(0)
    val direct = f.df.selectExpr("percentile(p_retailprice, 0.5)")
      .head().getDouble(0)
    assert(q == direct)
    assert(f("p_brand").mode(2).count() <= 2)
    val kept = f("p_size").filterItems(Seq(3L, 1L)).df
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L, 1L))
  }
}
