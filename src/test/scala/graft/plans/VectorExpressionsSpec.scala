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

  test("hyperplane sign bits match the HOF form bit-for-bit") {
    import graft.operators.Similarity
    // real embeddings (float), several plane counts and tables
    for (planes <- Seq(1, 6, 16); table <- Seq(0, 3)) {
      val diff = embs.select(
        VectorExpressions.hyperplaneBits(col("embedding"), planes, table).as("n"),
        Similarity.lshBucketsHof(col("embedding"), planes, table).as("h"))
        .filter(col("n") =!= col("h")).count()
      assert(diff == 0, s"planes=$planes table=$table")
    }
    // generated doubles incl. negatives/zeros, plus double-typed arrays
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val gen = Seq.fill(300)(Seq.fill(1 + rnd.nextInt(20))(
      (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(6) - 3))).toDF("v")
    val diffD = gen.select(
      VectorExpressions.hyperplaneBits(col("v"), 8, 1).as("n"),
      Similarity.lshBucketsHof(col("v"), 8, 1).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(diffD == 0)
  }

  test("hyperplane sign bits edge cases: empty vector, null element, null vector") {
    import graft.operators.Similarity
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq[Option[Float]]())),                          // empty
      (2L, Some(Seq(Option(1.0f), None, Option(2.0f)))),         // null elem
      (3L, Option.empty[Seq[Option[Float]]])                     // null vec
    ).toDF("id", "v")
    val rows = df.select(col("id"),
      VectorExpressions.hyperplaneBits(col("v"), 6).as("n"),
      Similarity.lshBucketsHof(col("v"), 6).as("h"),
      Similarity.lshBuckets(col("v"), 6).as("w")).orderBy("id").collect()
    // empty vec: HOF's sequence(0,-1) null-pads -> projections null -> 0
    assert(rows(0).getLong(1) == 0L && rows(0).getLong(2) == 0L)
    assert(rows(1).getLong(1) == 0L && rows(1).getLong(2) == 0L)   // null elem -> bucket 0
    assert(rows(2).isNullAt(1)) // raw expression: null in -> null out
    // operator wrapper coalesces to bucket 0 — the HOF contract: null
    // vectors stay joinable instead of dropping out of bucket equi-joins
    assert(rows(2).getLong(2) == 0L && rows(2).getLong(3) == 0L)
  }

  test("numeric non-float arrays bucket identically to the HOF form; bad types fail analysis") {
    import graft.operators.Similarity
    import spark.implicits._
    val ints  = Seq.tabulate(100)(i => Seq(i - 50, i * 3 % 17, -i)).toDF("v")
    val longs = Seq.tabulate(100)(i => Seq((i - 50).toLong * 1000000007L, i.toLong)).toDF("v")
    for (df <- Seq(ints, longs)) {
      val diff = df.select(
        VectorExpressions.hyperplaneBits(col("v"), 8, 2).as("n"),
        Similarity.lshBucketsHof(col("v"), 8, 2).as("h"))
        .filter(col("n") =!= col("h")).count()
      assert(diff == 0)
    }
    val bad = Seq(Seq("a", "b")).toDF("v")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(VectorExpressions.hyperplaneBits(col("v"), 4)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("hyperplane_bits"))
  }

  test("native expression participates in whole-stage codegen") {
    val df = embs.select(
      VectorExpressions.cosine(col("embedding"), col("embedding")).as("c"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p)
  }
}
