package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FeatureLoggerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("feature matrix per judgment pair with es_match-based extractors") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "slow green turtle swims"),
      (3L, "fox and turtle race")).toDF("doc_id", "text")
    val judgments = Seq(
      ("q1", "fox race", 1L, 2),
      ("q1", "fox race", 3L, 3),
      ("q2", "green turtle", 2L, 3),
      ("q2", "green turtle", 1L, 0)).toDF("qid", "qtext", "doc_id", "grade")
    val out = FeatureLogger.logFeatures(docs, "doc_id", judgments,
      "qid", "qtext", FeatureLogger.defaultExtractors("text"))
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        (r.getDouble(4), r.getDouble(5), r.getDouble(7))).toMap
    // (qid, doc) -> (match_any, match_all, term_overlap)
    assert(out(("q1", 3L)) == (1.0, 1.0, 2.0)) // fox+race both present
    assert(out(("q1", 1L)) == (1.0, 0.0, 1.0)) // only fox
    assert(out(("q2", 1L)) == (0.0, 0.0, 0.0)) // no overlap
    assert(out(("q2", 2L)) == (1.0, 1.0, 2.0))
  }

  test("graft_dot / graft_cosine register as SQL functions") {
    GraftExtensionsHelper.registerOn(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "graft_match_any('the quick fox', 'fox bear') AS m, " +
        "graft_match_all('the quick fox', 'fox bear') AS ma, " +
        "graft_simhash64('a b c') AS sh")
      .head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getBoolean(2) && !r.getBoolean(3))
    assert(r.getLong(4) == graft.plans.TokenSimHash.simhash("a b c"))
    val r2 = spark.sql(
      "SELECT graft_minhash('a b c d e', 3, 8) AS mh, " +
        "graft_shingle_hashes('a b c d e', 3) AS sh, " +
        "graft_sorted_intersect(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS si")
      .head()
    assert(r2.getSeq[Long](0) ==
      graft.plans.TokenMinHash.signature("a b c d e", 3, 8).toSeq)
    assert(r2.getSeq[Long](1) ==
      graft.plans.TokenShingleHashes.sortedDistinctHashes("a b c d e", 3).toSeq)
    assert(r2.getInt(2) == 2)
  }

  test("maxQueryBranches fails fast instead of exploding the plan") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val judgments = (1 to 5).map(i => (i.toLong, 1L, s"query $i"))
      .toDF("q_id", "doc_id", "q_text")
    val e = intercept[IllegalArgumentException] {
      FeatureLogger.logFeatures(docs, "doc_id", judgments, "q_id", "q_text",
        FeatureLogger.defaultExtractors("text"), maxQueryBranches = 3)
    }
    assert(e.getMessage.contains("plan branches"))
  }
}

object GraftExtensionsHelper {
  def registerOn(s: org.apache.spark.sql.SparkSession): Unit =
    graft.plans.GraftExtensions.register(s)
}
