package graft.operators

import graft.TestSpark
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Hand-computed `_rank_eval` metrics on a four-doc result list. */
class RankEvalSpec extends AnyFunSpec with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // q1 retrieved (rank order): d2(rating 1), d5(unjudged), d1(3), d3(0)
  private def results = Seq(
    ("q1", "d2", 1), ("q1", "d5", 2), ("q1", "d1", 3), ("q1", "d3", 4),
    // q2: nothing relevant retrieved, one relevant judged elsewhere
    ("q2", "d7", 1), ("q2", "d8", 2)
  ).toDF("query", "doc", "rank")

  private def judgments = Seq(
    ("q1", "d1", 3), ("q1", "d2", 1), ("q1", "d3", 0), ("q1", "d4", 2),
    ("q2", "d9", 2), ("q2", "d7", 0)
  ).toDF("query", "doc", "rating")

  it("matches the hand computation for every metric") {
    val out = RankEval.rankEval(results, judgments,
      "query", "doc", "rank", "rating", k = 4,
      relevantThreshold = 2, maxRating = 3)
      .collect().map(r => r.getString(0) -> r).toMap

    val q1 = out("q1")
    q1.getAs[Long]("retrieved") shouldBe 4L
    q1.getAs[Long]("relevant_retrieved") shouldBe 1L // only d1 >= 2
    q1.getAs[Double]("precision") shouldBe 0.25 +- 1e-12
    q1.getAs[Double]("recall") shouldBe 0.5 +- 1e-12 // of d1, d4
    q1.getAs[Double]("mrr") shouldBe (1.0 / 3) +- 1e-12
    // dcg: 1/log2(2) + 0 + 7/log2(4) + 0 = 1 + 3.5
    q1.getAs[Double]("dcg") shouldBe 4.5 +- 1e-12
    // ideal: d1(3)@1 → 7, d4(2)@2 → 3/log2(3), d2(1)@3 → 0.5, d3 0
    val idcg = 7.0 + 3.0 / (math.log(3) / math.log(2)) + 0.5
    q1.getAs[Double]("ndcg") shouldBe (4.5 / idcg) +- 1e-9
    // ERR, R = (2^r − 1)/8: 0.125@1, 0@2, 0.875@3, 0@4
    val err = 0.125 + (1.0 / 3) * 0.875 * (1 - 0.125)
    q1.getAs[Double]("err") shouldBe err +- 1e-9

    val q2 = out("q2")
    q2.getAs[Long]("relevant_retrieved") shouldBe 0L
    q2.getAs[Double]("precision") shouldBe 0.0
    q2.getAs[Double]("recall") shouldBe 0.0 // d9 judged relevant, missed
    q2.getAs[Double]("mrr") shouldBe 0.0
    q2.getAs[Double]("ndcg") shouldBe 0.0 // dcg 0
    q2.getAs[Double]("err") shouldBe 0.0
  }

  it("a perfect ranking scores ndcg = 1 and err tops out") {
    val perfect = Seq(("q", "a", 1), ("q", "b", 2)).toDF(
      "query", "doc", "rank")
    val j = Seq(("q", "a", 3), ("q", "b", 1)).toDF(
      "query", "doc", "rating")
    val r = RankEval.rankEval(perfect, j, "query", "doc", "rank",
      "rating", k = 2).collect().head
    r.getAs[Double]("ndcg") shouldBe 1.0 +- 1e-12
    r.getAs[Double]("recall") shouldBe 1.0 +- 1e-12
    r.getAs[Double]("mrr") shouldBe 1.0 +- 1e-12
    // ERR: R = 7/8 @1, survival 1/8 for rank 2's R = 1/8
    r.getAs[Double]("err") shouldBe
      (7.0 / 8 + (1.0 / 8) * (1.0 / 8) / 2) +- 1e-12
  }

  it("validates its knobs") {
    an[IllegalArgumentException] should be thrownBy
      RankEval.rankEval(results, judgments, "query", "doc", "rank",
        "rating", k = 0)
    an[IllegalArgumentException] should be thrownBy
      RankEval.rankEval(results, judgments, "query", "doc", "rank",
        "rating", k = 5, relevantThreshold = 3, maxRating = 2)
  }

  it("refuses a rating above maxRating inside the plan (no silent ERR)") {
    // rating 4 with maxRating 3: errR > 1 would have nulled the
    // log-survival and coalesced to a WRONG err of 1.0 pre-guard
    val j = Seq(("q", "a", 4)).toDF("query", "doc", "rating")
    val res = Seq(("q", "a", 1)).toDF("query", "doc", "rank")
    val ex = intercept[Exception] {
      RankEval.rankEval(res, j, "query", "doc", "rank", "rating",
        k = 1, maxRating = 3).collect()
    }
    ex.getMessage should include("exceeds maxRating")
  }

  it("refuseDuplicates rejects duplicate (query, doc), (query, rank) and duplicate judgments") {
    val dupDoc = Seq(("q", "a", 1), ("q", "a", 2)).toDF(
      "query", "doc", "rank")
    val dupRank = Seq(("q", "a", 1), ("q", "b", 1)).toDF(
      "query", "doc", "rank")
    val clean = Seq(("q", "a", 1), ("q", "b", 2)).toDF(
      "query", "doc", "rank")
    val j = Seq(("q", "a", 2)).toDF("query", "doc", "rating")
    val dupJ = Seq(("q", "a", 2), ("q", "a", 1)).toDF(
      "query", "doc", "rating")
    an[IllegalArgumentException] should be thrownBy
      RankEval.rankEval(dupDoc, j, "query", "doc", "rank", "rating",
        k = 4, refuseDuplicates = true)
    an[IllegalArgumentException] should be thrownBy
      RankEval.rankEval(dupRank, j, "query", "doc", "rank", "rating",
        k = 4, refuseDuplicates = true)
    an[IllegalArgumentException] should be thrownBy
      RankEval.rankEval(clean, dupJ, "query", "doc", "rank", "rating",
        k = 4, refuseDuplicates = true)
    // clean inputs validate AND still compute
    RankEval.rankEval(clean, j, "query", "doc", "rank", "rating",
      k = 4, refuseDuplicates = true).collect().length shouldBe 1
  }
}
