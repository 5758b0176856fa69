package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.functions.VectorOps
import graft.plans.VectorExpressions

class QuantizationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def embs = Tables.load(spark, TestSpark.sfDir, "embeddings")
    .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))

  test("reconstruction error is bounded by scale/2 per element") {
    val enc = Quantization.encode(embs, "vec_id", "v")
    // per-vector: max|v - dequant(q)| <= scale/2 (half-up rounds to
    // the nearest grid point, grid pitch = scale)
    val bad = enc.join(embs, Seq("vec_id"))
      .select(col("vec_id"),
        array_max(zip_with(col("v"),
          Quantization.dequantize(col("q"), col("scale")),
          (a, b) => abs(a - b))).as("err"),
        (col("scale") / 2 * 1.000001).as("bound"))
      .filter(col("err") > col("bound"))
      .count()
    assert(bad == 0L)
  }

  test("quantized values stay in [-127, 127]") {
    val enc = Quantization.encode(embs, "vec_id", "v")
    val out = enc.select(
      array_min(col("q")).as("lo"), array_max(col("q")).as("hi"))
      .agg(min(col("lo")).as("lo"), max(col("hi")).as("hi")).head()
    assert(out.getInt(0) >= -127 && out.getInt(1) <= 127)
  }

  test("cosine over int8 arrays tracks the exact cosine (scale-invariance)") {
    val enc = Quantization.encode(embs, "vec_id", "v")
    val q = embs.filter(col("vec_id") === 0)
      .select(col("v").as("qv"))
    val cmp = enc.join(embs, Seq("vec_id")).crossJoin(broadcast(q))
      .select(
        VectorExpressions.cosine(col("q"), col("qv")).as("c8"),
        VectorExpressions.cosine(col("v"), col("qv")).as("cx"))
      .collect()
    // int8 keeps ~2 decimal digits of the direction; the observed gap
    // on 16-dim unit-ish vectors is < 5e-3
    cmp.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 5e-3,
        s"quantized cosine drifted: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("int8 search returns the same top-k as exact search on this corpus") {
    val base = embs
    val enc = Quantization.encode(base, "vec_id", "v")
    val qs = base.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    def topk(scored: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("q_id", "rank", "vec_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    }
    val exact = topk(base.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", VectorExpressions.cosine(col("v"), col("q_v"))))
    val quant = topk(enc.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", VectorExpressions.cosine(col("q"), col("q_v"))))
    assert(quant == exact)
  }

  test("zero vectors are dropped by encode; non-numeric arrays fail analysis") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, -2.0))).toDF("id", "v")
    val enc = Quantization.encode(df, "id", "v")
    assert(enc.select("id").as[Long].collect().toSeq == Seq(2L))
    // widened VectorFold guard: string arrays must fail at analysis
    // time, not read garbage bytes
    val strs = Seq((Seq("a", "b"), Seq("c", "d"))).toDF("a", "b")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      strs.select(VectorExpressions.cosine(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array"))
  }
}
