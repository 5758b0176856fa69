package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SelectionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // topic A docs (alpha-heavy) vs topic B docs (beta-heavy); the
  // target is all-A, so A-docs must earn higher importance weights
  private val raw = Seq(
    (1L, "alpha alpha gamma"), (2L, "alpha gamma gamma"),
    (3L, "beta beta gamma"), (4L, "beta gamma gamma")
  ).toDF("doc_id", "text")
  private val target = Seq(
    (100L, "alpha alpha alpha gamma")).toDF("doc_id", "text")

  test("target-like documents earn higher importance weights") {
    val w = Selection.importanceWeights(raw, target, "doc_id", "text",
        buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(1L) > w(3L) && w(1L) > w(4L), w.toString)
    assert(w(2L) > w(3L), w.toString)
    // alpha-bucket ratio positive, beta-bucket negative
    val lr = Selection.importanceRatios(raw, target, "text", 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ab = spark.range(1).select(
      Selection.tokenBucket(lit("alpha"), 64),
      Selection.tokenBucket(lit("beta"), 64)).collect().head
    assert(lr(ab.getLong(0)) > 0 && lr(ab.getLong(1)) < 0, lr.toString)
  }

  test("dsirSample is exact-n, a subset of raw ids, and deterministic") {
    val s1 = Selection.dsirSample(raw, target, "doc_id", "text",
      n = 2, buckets = 64, seed = 9)
    val s2 = Selection.dsirSample(raw, target, "doc_id", "text",
      n = 2, buckets = 64, seed = 9)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids1.length == 2 && ids1.forall(Set(1L, 2L, 3L, 4L)))
    assert(ids1 === s2.select("doc_id").collect().map(_.getLong(0)).toSeq)
  }

  test("topFractionPerGroup: ceil rank cut per group, ties by id, " +
    "frac >= 1 keeps everything") {
    // group g has 5 rows -> ceil(5 * 0.4) = 2 kept; h has 3 -> 2 kept
    val df = Seq(
      ("g", 1L, 10.0), ("g", 2L, 50.0), ("g", 3L, 50.0),
      ("g", 4L, 20.0), ("g", 5L, 5.0),
      ("h", 6L, 1.0), ("h", 7L, 2.0), ("h", 8L, 3.0)
    ).toDF("src", "id", "score")
    val kept = Selection.topFractionPerGroup(df, "src", "score", 0.4, "id")
      .select("id").collect().map(_.getLong(0)).toSet
    // g: scores 50,50 tie -> ids 2 and 3 (smaller id wins the tie
    // ordering but both land inside the cut); h: top-2 by score = 8,7
    assert(kept == Set(2L, 3L, 8L, 7L))
    assert(Selection.topFractionPerGroup(df, "src", "score", 1.0, "id")
      .count() == 8)
    assert(intercept[IllegalArgumentException] {
      Selection.topFractionPerGroup(df, "src", "score", 0.0, "id")
    }.getMessage.contains("positive"))
  }

  test("hardNegatives excludes the planted positive that brute-force" +
    " ranks first") {
    // corpus: id 1 = query clone (cos 1 with query), others spread
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(0.5, 0.5))
    ).toDF("id", "vec")
    val queries = Seq((10L, Seq(1.0, 0.0))).toDF("id", "vec")
    val pos = Seq((10L, 1L)).toDF("q_id", "pos_id")
    val got = Selection.hardNegatives(queries, corpus, pos,
        "id", "vec", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    // without the exclusion, id 1 (the clone) would be rank 1
    assert(got.map(_._2) === Seq(2L, 4L))
    val unfiltered = Similarity.bruteForceTopK(queries, corpus,
        "id", "vec", k = 1).collect().head.getLong(2)
    assert(unfiltered == 1L, "fixture: the positive must be the argmax")
  }

  test("the ratio table broadcasts; the corpus is not shuffle-joined") {
    val p = Selection.importanceWeights(raw, target, "doc_id", "text", 64)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("hardNegativesServed at exact configuration == hardNegatives; " +
    "the index corpus never shuffles into its join") {
    val e = graft.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
    val path = java.nio.file.Files
      .createTempDirectory("graft-hnserved").toString
    VectorIndex.build(e, "vec_id", "embedding", path, nlist = 8)
    val pos = e.select((col("vec_id") % 25).as("q_id"),
        col("vec_id").as("pos_id"))
      .filter(col("q_id") < 3)
    val q = e.filter(col("vec_id") < 3)
    val served = Selection.hardNegativesServed(q, pos, path,
      "vec_id", "embedding", k = 10, fetchK = 1000000, nprobe = 8)
    val got = served.orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val brute = Selection.hardNegatives(q, e, pos, "vec_id", "embedding",
        k = 10)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got.nonEmpty && got == brute)
    // the corpus-stays-put pin: every pruned vectors scan enters its
    // (broadcast-query) join without an Exchange in between
    val checked = graft.PlanCheck.requireUnshuffledScanToJoin(
      served.queryExecution.executedPlan, "vectors")
    assert(checked >= 1, "no vectors scan found to check")
  }

  test("hardNegativesServed validates fetchK >= k") {
    val e = graft.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
    val path = java.nio.file.Files
      .createTempDirectory("graft-hnserved-req").toString
    VectorIndex.build(e.filter(col("vec_id") < 50), "vec_id", "embedding",
      path, nlist = 2)
    val ex = intercept[IllegalArgumentException] {
      Selection.hardNegativesServed(e.filter(col("vec_id") < 2),
        e.limit(0).select(col("vec_id").as("q_id"),
          col("vec_id").as("pos_id")),
        path, "vec_id", "embedding", k = 5, fetchK = 3)
    }
    assert(ex.getMessage.contains("fetchK"))
  }
}
