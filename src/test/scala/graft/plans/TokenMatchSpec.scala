package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.functions.EsMatch

class TokenMatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native TokenMatch agrees with the composed-builtin form on the corpus") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    for (q <- Seq("filter join", "the", "zzz-notoken", "SCAN Merge")) {
      val diff = docs.select(
        TokenMatch.any(col("text"), q).as("n_any"),
        EsMatch.matchAnyHof(col("text"), q).as("h_any"),
        TokenMatch.all(col("text"), q).as("n_all"),
        EsMatch.matchAllHof(col("text"), q).as("h_all"))
        .filter(col("n_any") =!= col("h_any") || col("n_all") =!= col("h_all"))
        .count()
      assert(diff == 0, s"divergence for query '$q'")
    }
  }

  test("stemmed TokenMatch agrees with the composed-builtin english " +
      "chain on the suffixed corpus") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .withColumn("text", graft.queries.QueryUtil.stemFixtureText(
        col("text"), col("doc_id")))
    for (q <- Seq("story dogs", "boxes knee", "queries GLASS", "the")) {
      val diff = docs.select(
        TokenMatch.any(col("text"), q, stem = true).as("n_any"),
        EsMatch.matchAnyHof(col("text"), q, "english").as("h_any"),
        TokenMatch.all(col("text"), q, stem = true).as("n_all"),
        EsMatch.matchAllHof(col("text"), q, "english").as("h_all"))
        .filter(col("n_any") =!= col("h_any") || col("n_all") =!= col("h_all"))
        .count()
      assert(diff == 0, s"stemmed divergence for query '$q'")
    }
  }

  test("stemmed match semantics: both sides analyzed, no over-stem") {
    import spark.implicits._
    val df = Seq("the filters are stories", "a knee dog").toDF("t")
    val r = df.select(
      TokenMatch.any($"t", "filter", stem = true).as("q_plain_doc_plural"),
      TokenMatch.any($"t", "story", stem = true).as("q_sing_doc_ies"),
      TokenMatch.any($"t", "dogs", stem = true).as("q_plural_doc_sing"),
      TokenMatch.any($"t", "knees", stem = true).as("knees_stays"),
      TokenMatch.all($"t", "filters stories", stem = true).as("all_stemmed"))
      .collect()
    assert(r(0).getBoolean(0) && r(0).getBoolean(1) && r(0).getBoolean(4))
    assert(!r(0).getBoolean(2) && !r(0).getBoolean(3))
    // "knees" stems to itself (ees rule) — it must NOT match "knee"
    assert(r(1).getBoolean(2) && !r(1).getBoolean(3))
  }

  test("highlight: analyzed matching, original bytes displayed, NULL " +
      "on no match, empty query") {
    import spark.implicits._
    val df = Seq("The Filters are HERE", "nothing to see", null)
      .toDF("t")
    val r = df.select(
      EsMatch.highlight($"t", "filter", "english").as("en"),
      EsMatch.highlight($"t", "the here", "standard").as("st"),
      EsMatch.highlight($"t", "", "english").as("empty")).collect()
    // english: "Filters" stems to "filter" — wrapped with its case
    assert(r(0).getString(0) == "The <em>Filters</em> are HERE")
    // standard: case-insensitive match, original case displayed
    assert(r(0).getString(1) == "<em>The</em> Filters are <em>HERE</em>")
    assert(r(0).isNullAt(2))             // empty query -> null
    assert(r(1).isNullAt(0) && r(1).isNullAt(1)) // no match -> null
    assert(r(2).isNullAt(0))             // null text -> null
  }

  test("edge semantics: empty query, empty text, nulls") {
    import spark.implicits._
    val df = Seq(Some("a b"), Some(""), None).toDF("t")
    val r = df.select(
      TokenMatch.any($"t", "").as("any_empty"),
      TokenMatch.all($"t", "").as("all_empty"),
      TokenMatch.any($"t", "a").as("any_a")).collect()
    assert(r(0).getBoolean(0) == false && r(0).getBoolean(1) == true)
    assert(r(1).getBoolean(2) == false)
    assert(r(2).isNullAt(2)) // null text -> null, not false
  }

  test("native TokenSimHash is bit-identical to the HOF sketch") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val diff = docs.select(
      TokenSimHash(col("text")).as("n"),
      graft.functions.TextAnalysis.simhash64Hof(col("text")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(diff == 0)
  }

  test("TokenMatch runs inside whole-stage codegen") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val df = docs.filter(TokenMatch.any(col("text"), "filter"))
      .select(count(lit(1)))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }
}
