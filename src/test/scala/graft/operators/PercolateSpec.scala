package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class PercolateSpec extends AnyFunSpec with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark streams filter quickly"),
    (2L, "filter join merge"),
    (3L, "nothing relevant here")).toDF("doc_id", "text")

  it("matches docs against rule queries with per-query msm") {
    val out = Percolate.percolateRules(docs, "doc_id", "text", Seq(
      ("needsBoth", Seq("filter", "join"), 2),
      ("anyStream", Seq("streams", "stream"), 1)))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    out shouldBe Set((2L, "needsBoth"), (1L, "anyStream"))
  }

  it("duplicate terms inside one rule count once") {
    val out = Percolate.percolateRules(docs, "doc_id", "text", Seq(
      ("dup", Seq("filter", "filter"), 1)))
      .collect().map(_.getLong(0)).toSet
    out shouldBe Set(1L, 2L)
    // msm above the distinct-term count refuses loudly
    an[IllegalArgumentException] should be thrownBy
      Percolate.percolateRules(docs, "doc_id", "text", Seq(
        ("bad", Seq("filter", "filter"), 2)))
  }

  it("the query side broadcasts; the corpus never shuffles to match") {
    val out = Percolate.percolateRules(docs, "doc_id", "text", Seq(
      ("r", Seq("filter"), 1)))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  it("the TABLE entry point validates stored queries like the rules " +
      "form: msm < 1, msm > distinct terms, empty terms all refuse") {
    def run(rules: Seq[(String, Seq[String], Int)]) =
      Percolate.percolate(docs, "doc_id", "text",
        rules.toDF("query_id", "terms", "msm"),
        "query_id", "terms", "msm").collect()
    // msm = 0 would silently behave as msm = 1 (zero-hit pairs never
    // reach the >= filter) — it must fail loudly instead
    an[IllegalArgumentException] should be thrownBy
      run(Seq(("zero", Seq("filter"), 0)))
    an[IllegalArgumentException] should be thrownBy
      run(Seq(("over", Seq("filter", "filter"), 2)))
    an[IllegalArgumentException] should be thrownBy
      run(Seq(("empty", Seq.empty[String], 1)))
    // a well-formed table still percolates
    run(Seq(("ok", Seq("filter"), 1))).length shouldBe 2
  }

  it("phrase percolate requires ADJACENCY, not just containment") {
    val d = Seq(
      (1L, "spark hash join runs"),   // adjacent → matches
      (2L, "hash of the join"),       // both terms, not adjacent
      (3L, "join hash"),              // both terms, wrong order
      (4L, "nothing here")).toDF("doc_id", "text")
    val out = Percolate.percolatePhraseRules(d, "doc_id", "text",
      Seq(("hj", "hash join"), ("nr", "never matches")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    out shouldBe Set((1L, "hj"))
    // the adjacency needle analyzes like the corpus (case folds)
    Percolate.percolatePhraseRules(d, "doc_id", "text",
      Seq(("up", "HASH Join"))).collect()
      .map(_.getLong(0)).toSeq shouldBe Seq(1L)
    an[IllegalArgumentException] should be thrownBy
      Percolate.percolatePhraseRules(d, "doc_id", "text",
        Seq(("empty", "   ")))
    an[IllegalArgumentException] should be thrownBy
      Percolate.percolatePhraseRules(d, "doc_id", "text", Seq.empty)
  }

  it("refuses empty rule tables and duplicate names") {
    an[IllegalArgumentException] should be thrownBy
      Percolate.percolateRules(docs, "doc_id", "text", Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Percolate.percolateRules(docs, "doc_id", "text",
        Seq(("x", Seq("a"), 1), ("x", Seq("b"), 1)))
  }

  it("query_string rules: must/should/must_not semantics, refusals") {
    import spark.implicits._
    val d = Seq(
      (1L, "stream filter join"),  // has forbidden 'join' for r1
      (2L, "stream filter only"),  // r1: both shoulds, no join
      (3L, "merge alone here"),    // r2: one should
      (4L, "stream merge both")    // r3: both musts; r1: 1 should; r2
    ).toDF("doc_id", "text")
    val out = Percolate.percolateQueryStrings(d, "doc_id", "text", Seq(
        ("r1", "stream filter -join"),  // OR-default shoulds + not
        ("r2", "merge | sort"),          // pure disjunction
        ("r3", "stream + merge")))       // conjunction (musts)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      (2L, "r1", 2L), (4L, "r1", 1L),
      (3L, "r2", 1L), (4L, "r2", 1L),
      (4L, "r3", 2L)), out)
    // purely-negative and contradictory rules refuse at registration
    an[IllegalArgumentException] should be thrownBy
      Percolate.percolateQueryStrings(d, "doc_id", "text",
        Seq(("bad", "-join")))
    an[IllegalArgumentException] should be thrownBy
      Percolate.percolateQueryStrings(d, "doc_id", "text",
        Seq(("contra", "stream + merge -merge")))
    // unflattenable grammar (a phrase) refuses naming the scan faces
    val e = intercept[IllegalArgumentException] {
      Percolate.percolateQueryStrings(d, "doc_id", "text",
        Seq(("ph", "\"stream filter\"")))
    }
    assert(e.getMessage.contains("scan faces") ||
      e.getMessage.contains("term"), e.getMessage)
  }
}
