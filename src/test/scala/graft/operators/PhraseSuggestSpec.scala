package graft.operators

import graft.TestSpark
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class PhraseSuggestSpec extends AnyFunSpec with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus: "quick fox" appears 3×, "quick box" 1×, plus filler so
  // the vocabulary has near-misses of the query terms
  private def corpus = Seq(
    "quick fox", "quick fox", "quick fox", "quick box",
    "slow dog runs").toDF("text")

  it("corrects a one-edit misspelling to the LM-preferred phrase") {
    val out = PhraseSuggest.suggest(corpus, "text", "quick fix",
      k = 3, numCandidates = 3).collect()
    out.head.getString(0) shouldBe "quick fox"
    // "quick box" is also distance 1 from "fix" and grammatical, but
    // the bigram "quick fox" (3) outscores "quick box" (1)
    val sugs = out.map(_.getString(0)).toSeq
    if (sugs.contains("quick box"))
      sugs.indexOf("quick fox") should be < sugs.indexOf("quick box")
  }

  it("scores by the documented stupid-backoff noisy channel") {
    // hand-compute the winner's score: N = 11 tokens
    // log P(quick) = log(4/11); transition quick→fox = log(3/4);
    // channel = log(.95) + log(.05) (one kept, one changed)
    val expected = math.log(4.0 / 11) + math.log(3.0 / 4) +
      (math.log(0.95) + math.log(0.05))
    val got = PhraseSuggest.suggest(corpus, "text", "quick fix",
      k = 1, numCandidates = 3).collect().head.getDouble(1)
    got shouldBe (math.floor(expected * 1e6 + 0.5) / 1e6) +- 1e-9
  }

  it("returns nothing when the input already outscores every candidate") {
    PhraseSuggest.suggest(corpus, "text", "quick fox",
      k = 3, numCandidates = 3).count() shouldBe 0L
  }

  it("confidence > 1 raises the bar") {
    // with a huge confidence factor even good corrections are cut
    PhraseSuggest.suggest(corpus, "text", "quick fix", k = 3,
      numCandidates = 3, confidence = 1e9).count() shouldBe 0L
  }

  it("maxErrors bounds how many positions may change") {
    // both terms misspelled, but only one may be corrected → no
    // combination fixes the phrase fully; "quick fix"-style partial
    // corrections still appear if they outscore the input
    val out = PhraseSuggest.suggest(corpus, "text", "quik fix",
      k = 5, numCandidates = 3, maxErrors = 1).collect()
    out.foreach { r =>
      val ws = r.getString(0).split(" ")
      // at most one position differs from the input
      Seq("quik", "fix").zip(ws).count { case (a, b) => a != b } should
        be <= 1
    }
    val both = PhraseSuggest.suggest(corpus, "text", "quik fix",
      k = 5, numCandidates = 3, maxErrors = 2).collect()
      .map(_.getString(0)).toSeq
    both should contain("quick fox")
  }

  it("refuses phrases past the combination bound and empty analysis") {
    an[IllegalArgumentException] should be thrownBy
      PhraseSuggest.suggest(corpus, "text", "a b c d e f")
    an[IllegalArgumentException] should be thrownBy
      PhraseSuggest.suggest(corpus, "text", "   ")
  }
}
