package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QualityRulesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sigs(text: String): Map[String, Any] = {
    val df = QualityRules.signals(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
    val row = df.collect().head
    df.columns.drop(1).zipWithIndex
      .map { case (c, i) => c -> row.get(i + 1) }.toMap
  }

  test("word count and mean word length") {
    val m = sigs("alpha be gamma")
    assert(m("n_words") === 3L)
    assert(m("mean_word_len") === (5 + 2 + 5) / 3.0)
  }

  test("symbol-to-word ratio counts # and non-overlapping ellipses") {
    val m = sigs("# tag ... more #")
    assert(m("symbol_word_ratio") === 3.0 / 5)
    // '....' is ONE non-overlapping '...' by length-delta counting
    assert(sigs("a ....")("symbol_word_ratio") === 1.0 / 2)
  }

  test("bullet-start and ellipsis-end line fractions") {
    val m = sigs("• a\n- b\n* c\nplain d")
    assert(m("bullet_start_frac") === 3.0 / 4)
    val e = sigs("so...\ndone…\nok then")
    assert(e("ellipsis_end_frac") === 2.0 / 3)
  }

  test("alphabetic-word fraction and required stopwords") {
    assert(sigs("abc 123 4d5")("alpha_word_frac") === 2.0 / 3)
    // the, with, and present; be/to/of/that/have absent
    assert(sigs("the cat sat with style and grace")("stop_hits") === 3L)
    // stopword must match a whole token, not a substring
    assert(sigs("theatre ofcourse")("stop_hits") === 0L)
  }

  test("empty text yields zeros, not nulls or division errors") {
    val m = sigs("")
    assert(m("n_words") === 0L)
    assert(m("mean_word_len") === 0.0)
    assert(m("stop_hits") === 0L)
  }

  test("gopherFilter applies every bound; survivors keep original schema") {
    // 60 words, stopwords {the, and}, mean word length 3.5
    val passing = ("the data and more " * 15).trim
    // fails ONLY the bullet rule: 40 of 41 lines bulleted, but alpha
    // fraction stays at 180/220 >= 0.8 and mean word len at 3.5
    val bullety = passing + "\n" + ("• big bullet line\n" * 40).trim
    val docs = Seq(
      (1L, passing, "keep"),
      (2L, "the with short text", "drop-wordcount"),
      (3L, ("x " * 60).trim, "drop-meanlen-stopwords"),
      (4L, bullety, "drop-bullets")
    ).toDF("doc_id", "text", "tag")
    val kept = QualityRules.gopherFilter(docs, "text")
    assert(kept.columns.toSeq === Seq("doc_id", "text", "tag"))
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    // loosening the bullet bound readmits doc 4
    val loose = QualityRules.gopherFilter(docs, "text", maxBulletFrac = 1.0)
    assert(loose.select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 4L))
  }

  test("zero-shuffle plan") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = QualityRules.signals(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
