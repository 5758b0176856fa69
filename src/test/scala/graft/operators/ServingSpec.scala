package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class ServingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val f = java.nio.file.Files.createTempDirectory(name).toFile
    f.deleteOnExit(); f.toString
  }

  private def docs = Tables.load(spark, TestSpark.sfDir, "documents")
  private def emb = Tables.load(spark, TestSpark.sfDir, "embeddings")

  private val qv1 = (0 until 64).map(i => ((i * 7) % 13 - 6) / 10.0)
  private val qv2 = (0 until 64).map(i => ((i * 5) % 11 - 5) / 10.0)

  test("searchHybrid == the hand-wired per-query composition on a " +
    "two-query frame") {
    val ipath = tmp("graft-serv-i")
    val vpath = tmp("graft-serv-v")
    InvertedIndex.build(docs, "doc_id", "text", ipath)
    VectorIndex.build(emb, "vec_id", "embedding", vpath, nlist = 8)
    val queries = Seq(
      (1L, Seq("stream", "filter", "join"), qv1),
      (2L, Seq("spark", "hash"), qv2)
    ).toDF("q_id", "terms", "vec")
    val fused = Serving.searchHybrid(queries, ipath, vpath, k = 20,
        perLegK = 30, nprobe = 8, idColName = "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(fused.keySet == Set(1L, 2L))
    for ((qid, terms, qv) <- Seq((1L, Seq("stream", "filter", "join"), qv1),
        (2L, Seq("spark", "hash"), qv2))) {
      val lex = InvertedIndex.searchTopK(spark, ipath, terms, k = 30,
          idColName = "doc_id")
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      val sem = VectorIndex.searchTopK(
        Seq((qid, qv)).toDF("q_id", "vec"), vpath, k = 30, nprobe = 8,
        idColName = "doc_id")
      val hand = Ranking.rrfFuse(
          Seq(lex.select("doc_id", "rank"), sem.select("doc_id", "rank")),
          "doc_id", "rank", k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val slice = fused(qid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(slice == hand, s"q_id=$qid diverged")
      assert(slice.nonEmpty)
    }
  }

  test("rrfFusePerQuery slices == rrfFuse run per query on synthetic " +
    "rankings") {
    val ra = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 12L, 1L))
      .toDF("q", "doc", "rank")
    val rb = Seq((1L, 11L, 1L), (1L, 13L, 2L), (2L, 12L, 1L),
      (2L, 10L, 2L)).toDF("q", "doc", "rank")
    val fused = Ranking.rrfFusePerQuery(Seq(ra, rb), "q", "doc", "rank",
        k = 3, rrfK = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    for (qid <- Seq(1L, 2L)) {
      val one = Ranking.rrfFuse(
          Seq(ra.filter(col("q") === qid).select("doc", "rank"),
            rb.filter(col("q") === qid).select("doc", "rank")),
          "doc", "rank", k = 3, rrfK = 60)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val slice = fused.filter(_._1 == qid).sortBy(_._2)
        .map(t => (t._3, t._4)).toSeq
      assert(slice == one, s"q=$qid diverged")
    }
  }

  test("searchHybrid fusion=linear == hand-wired per-query linearFuse") {
    val ipath = tmp("graft-serv-li")
    val vpath = tmp("graft-serv-lv")
    InvertedIndex.build(docs, "doc_id", "text", ipath)
    VectorIndex.build(emb, "vec_id", "embedding", vpath, nlist = 8)
    val queries = Seq(
      (1L, Seq("stream", "filter", "join"), qv1),
      (2L, Seq("spark", "hash"), qv2)
    ).toDF("q_id", "terms", "vec")
    val fused = Serving.searchHybrid(queries, ipath, vpath, k = 20,
        perLegK = 30, nprobe = 8, idColName = "doc_id",
        fusion = "linear", legWeights = Seq(0.6, 0.4))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(fused.keySet == Set(1L, 2L))
    for ((qid, terms, qv) <- Seq((1L, Seq("stream", "filter", "join"), qv1),
        (2L, Seq("spark", "hash"), qv2))) {
      val lex = InvertedIndex.searchTopK(spark, ipath, terms, k = 30,
        idColName = "doc_id")
      val sem = VectorIndex.searchTopK(
          Seq((qid, qv)).toDF("q_id", "vec"), vpath, k = 30, nprobe = 8,
          idColName = "doc_id")
        .select(col("doc_id"), col("cos").as("score"))
      val hand = Ranking.linearFuse(
          Seq(lex.select("doc_id", "score"), sem),
          "doc_id", "score", Seq(0.6, 0.4), k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val slice = fused(qid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(slice == hand, s"q_id=$qid diverged")
      assert(slice.nonEmpty)
    }
  }

  test("searchHybrid validates perLegK, fusion, and column collisions") {
    val q = Seq((1L, Seq("a"), Seq(1.0))).toDF("q_id", "terms", "vec")
    assert(intercept[IllegalArgumentException] {
      Serving.searchHybrid(q, "/nope", "/nope", k = 10, perLegK = 5)
    }.getMessage.contains("perLegK"))
    assert(intercept[IllegalArgumentException] {
      Serving.searchHybrid(q, "/nope", "/nope", k = 5,
        idColName = "rrf_score")
    }.getMessage.contains("collide"))
    assert(intercept[IllegalArgumentException] {
      Serving.searchHybrid(q, "/nope", "/nope", k = 5,
        fusion = "softmax")
    }.getMessage.contains("fusion"))
    assert(intercept[IllegalArgumentException] {
      Serving.searchHybrid(q, "/nope", "/nope", k = 5,
        fusion = "linear", legWeights = Seq(1.0))
    }.getMessage.contains("legWeights"))
  }
}
