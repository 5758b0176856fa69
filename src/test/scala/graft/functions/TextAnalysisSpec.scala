package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c).head().get(0)

  test("tokens lowercase, split on whitespace runs, drop empties") {
    assert(one(TextAnalysis.tokens($"t"), "  Hello   WORLD  ") ==
      Seq("hello", "world"))
    assert(one(TextAnalysis.tokenCount($"t"), "") == 0L)
    assert(one(TextAnalysis.tokenCount($"t"), "a b\tc\nd") == 4L)
  }

  test("shingles produce n-grams and empty below n") {
    assert(one(TextAnalysis.shingles($"t", 3), "a b c d") ==
      Seq("a b c", "b c d"))
    assert(one(TextAnalysis.shingles($"t", 3), "a b") == Seq())
  }

  test("fingerprint is order-sensitive and deterministic") {
    val f1 = one(TextAnalysis.fingerprint($"t"), "a b c")
    val f2 = one(TextAnalysis.fingerprint($"t"), "a b c")
    val f3 = one(TextAnalysis.fingerprint($"t"), "c b a")
    assert(f1 == f2 && f1 != f3)
  }

  test("language id picks marker-heavy language, und on no markers") {
    assert(one(TextAnalysis.languageId($"t"), "the cat and the dog") == "en")
    assert(one(TextAnalysis.languageId($"t"), "der hund und die katze ist") == "de")
    assert(one(TextAnalysis.languageId($"t"), "xyz qrs tuv") == "und")
  }

  test("quality features on empty and normal docs") {
    val q = one(TextAnalysis.qualityFeatures($"t"), "the fox! runs")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(q.getAs[Long]("n_tokens") == 3L)
    assert(q.getAs[Double]("stopword_ratio") > 0.3)
    assert(q.getAs[Double]("non_alnum_ratio") > 0.0)
    val e = one(TextAnalysis.qualityFeatures($"t"), "")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(e.getAs[Long]("n_tokens") == 0L)
  }

  test("es_match variants") {
    val df = Seq("the quick brown fox", "slow green turtle").toDF("t")
    assert(df.filter(EsMatch.matchAny($"t", "fox turtle")).count() == 2)
    assert(df.filter(EsMatch.matchAll($"t", "quick fox")).count() == 1)
    assert(df.filter(EsMatch.matchPhrase($"t", "brown fox")).count() == 1)
    assert(df.filter(EsMatch.matchPhrase($"t", "fox brown")).count() == 0)
    assert(df.filter(EsMatch.matchFuzzy($"t", "quik", 1)).count() == 1)
  }
}
