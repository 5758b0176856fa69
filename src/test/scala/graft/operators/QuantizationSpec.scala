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

  test("PQ: codes well-formed; exact config == brute force; ADC recalls a planted dup") {
    import spark.implicits._
    val emb = graft.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
    val model = Quantization.trainPq(emb, "embedding", m = 8, ksub = 16)
    assert(model.m == 8 && model.ksub == 16 && model.dsub == 8)
    val codes = Quantization.pqEncodeFrame(emb, "vec_id", "embedding", model)
    // every code row: m entries, each in [0, ksub)
    val bad = codes.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
    // exact configuration (candidates >= corpus) equals brute force
    val q = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 900000).as("vec_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    val viaPq = rows(Quantization.pqSearchTopK(q, codes, emb, "vec_id",
      "embedding", k = 4, model, candidates = 1000000))
    val brute = rows(Similarity.bruteForceTopK(q, emb, "vec_id",
        "embedding", k = 4)
      .withColumnsRenamed(Map("n_id" -> "vec_id")))
    assert(viaPq == brute)
    // ADC recall: a planted exact copy encodes to the same codes, so
    // even a small candidate set must surface it at cosine 1.0
    val planted = emb.filter(col("vec_id") === 7)
      .select(lit(777777L).as("vec_id"), col("embedding"))
    val corpus2 = emb.select("vec_id", "embedding").unionByName(planted)
    val codes2 = Quantization.pqEncodeFrame(corpus2, "vec_id", "embedding",
      model)
    val q2 = emb.filter(col("vec_id") === 7)
      .select(lit(111L).as("vec_id"), col("embedding"))
    val top = Quantization.pqSearchTopK(q2, codes2, corpus2, "vec_id",
        "embedding", k = 2, model, candidates = 20)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(2)).toSet == Set(7L, 777777L))
    assert(top.forall(_.getDouble(3) == 1.0))
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

  test("pqSearchTopK enforces the modest-query-frame contract loudly") {
    import spark.implicits._
    val emb = graft.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
    val model = Quantization.trainPq(emb, "embedding", m = 8, ksub = 16)
    val codes = Quantization.pqEncodeFrame(emb, "vec_id", "embedding",
      model)
    val q = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 900000).as("vec_id"), col("embedding"))
    val ex = intercept[IllegalArgumentException] {
      Quantization.pqSearchTopK(q, codes, emb, "vec_id", "embedding",
        k = 2, model, candidates = 5, maxQueries = 4)
    }
    assert(ex.getMessage.contains("refused") &&
      ex.getMessage.contains("searchTopK"), ex.getMessage)
    // within the bound, same call serves
    assert(Quantization.pqSearchTopK(q, codes, emb, "vec_id", "embedding",
      k = 2, model, candidates = 5, maxQueries = 10).count() > 0)
  }
}
