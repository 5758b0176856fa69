package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.functions.VectorOps

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def embs = Tables.load(spark, TestSpark.sfDir, "embeddings")

  test("native dot/cosine match the HOF implementation bit-for-bit") {
    val paired = embs.limit(50).select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(embs.limit(7).select(col("embedding").as("b")))
    val cmp = paired.select(
      VectorExpressions.dot(col("a"), col("b")).as("nd"),
      VectorOps.dot(col("a"), col("b")).as("hd"),
      VectorExpressions.cosine(col("a"), col("b")).as("nc"),
      (VectorOps.dot(col("a"), col("b")) /
        (sqrt(VectorOps.normSq(col("a"))) * sqrt(VectorOps.normSq(col("b"))))).as("hc"))
      .collect()
    cmp.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "cosine mismatch")
    }
  }

  test("null and mismatched-length inputs yield null") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f, 3.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq(0.0f, 0.0f)), Some(Seq(1.0f, 1.0f)))
    ).toDF("a", "b")
    val out = df.select(
      VectorExpressions.dot($"a", $"b").as("d"),
      VectorExpressions.cosine($"a", $"b").as("c")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1)) // length mismatch
    assert(out(1).isNullAt(0) && out(1).isNullAt(1)) // null input
    assert(out(2).isNullAt(1))                        // zero norm -> null cosine
    assert(out(2).getDouble(0) == 0.0)                // but dot is 0
  }

  test("sorted intersect count agrees with array_intersect on random sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    }
    val diff = rows.toDF("a", "b").select(
      VectorExpressions.sortedIntersectCount(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(diff == 0)
    val empty = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
      .select(VectorExpressions.sortedIntersectCount(col("a"), col("b")))
      .head().getInt(0)
    assert(empty == 0)
  }

  test("native expression participates in whole-stage codegen") {
    val df = embs.select(
      VectorExpressions.cosine(col("embedding"), col("embedding")).as("c"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p)
  }
}
