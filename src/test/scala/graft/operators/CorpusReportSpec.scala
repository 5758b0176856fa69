package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CorpusReportSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bySource: integer rollup of volume, rule failures, exact dups") {
    // passes BOTH rule families: 60 words, 2 stopwords, distinct
    // tokens (no repeated grams), mean word length ~6
    val clean = "the and " + (3 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, "web", clean),
      (2L, "web", clean),            // exact dup of 1
      // fails quality (word count) AND repetition: its one 2-gram
      // covers 100% of chars — Gopher's top-gram rule assumes web-
      // length docs, the word-count rule is what's meant to catch this
      (3L, "web", "tiny doc"),
      (4L, "book", ("spam " * 60).trim) // fails repetition AND quality
    ).toDF("doc_id", "source", "text")
    val rep = CorpusReport.bySource(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(rep("web") === ((3L, 122L, 1L, 1L, 1L)))
    assert(rep("book") === ((1L, 60L, 1L, 1L, 0L)))
  }

  test("null-text rows: counted, zero volume, fail quality, pass repetition, never dups") {
    val docs = Seq(
      (1L, "web", null.asInstanceOf[String]),
      (2L, "web", null.asInstanceOf[String]),
      (3L, "web", "the and " + (3 to 60).map(i => s"word$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val r = CorpusReport.bySource(docs, "text", "source").collect().head
    // n_docs=3, tokens/chars only from doc 3, two quality failures
    // (the null rows — matching what gopherFilter would drop), zero
    // repetition failures, and the two null rows are NOT "duplicates"
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 60L) // tokens only from doc 3
    assert(r.getLong(4) === 2L)
    assert(r.getLong(5) === 0L)
    assert(r.getLong(6) === 0L)
  }

  test("zipfFit: hand-computed OLS on a tiny exact-Zipf vocabulary") {
    // frequencies 8, 4, 2, 1 over ranks 1..4: ln f = ln 8 − ln 2 ·
    // (perfectly linear on ln rank? no — ranks 1,2,3,4 vs halving
    // freq is NOT exact Zipf; just hand-check the moments instead)
    val docs = Seq(
      ("a " * 8) + ("b " * 4) + ("c " * 2) + "d").toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val r = CorpusReport.zipfFit(docs, "text", k = 4).collect().head
    assert(r.getLong(0) === 4L)
    val xs = Seq(1.0, 2.0, 3.0, 4.0).map(math.log)
    val ys = Seq(8.0, 4.0, 2.0, 1.0).map(math.log)
    val n = 4.0
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    def rhu(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(math.abs(r.getDouble(1) - rhu(slope)) < 2e-6,
      s"${r.getDouble(1)} vs $slope")
    // a halving-frequency vocabulary is steeper than Zipf's -1
    assert(r.getDouble(1) < -1.0, r.getDouble(1))
    // r2 high (near-linear) but not 1
    assert(r.getDouble(3) > 0.9 && r.getDouble(3) <= 1.0)
    intercept[IllegalArgumentException] {
      CorpusReport.zipfFit(docs, "text", k = 2)
    }
  }

  test("one shuffle: flags are per-row, the only exchange is the source groupBy") {
    val docs = Seq((1L, "s", "a b c")).toDF("doc_id", "source", "text")
    val plan = CorpusReport.bySource(docs, "text", "source")
      .queryExecution.executedPlan.toString
    // exactly one shuffle origin: the hash aggregate on source
    // (count-distinct rides an expand within the same key shuffle)
    assert(plan.contains("Exchange"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
  }
}
