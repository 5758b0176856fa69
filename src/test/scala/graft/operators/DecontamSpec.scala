package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DecontamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("counts distinct shared n-grams per document") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown cat naps all day the quick brown cat"),
      (4L, "short text")).toDF("doc_id", "text")
    val bench = Seq("the quick brown fox runs", "xyzzy unrelated words here")
      .toDF("text")

    val out = Decontam.contaminationReport(
        corpus, "doc_id", "text", bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bench 3-grams: {the quick brown, quick brown fox, brown fox runs,
    //                 xyzzy unrelated words, unrelated words here}
    // doc1 shares 2 (the quick brown, quick brown fox); doc3 shares 1
    // (the quick brown — repeated in the doc, counted once); doc2/4 none
    assert(out === Map(1L -> 2L, 3L -> 1L))
  }

  test("contaminatedIds applies the minHits threshold") {
    val corpus = Seq(
      (1L, "a b c d e"), (2L, "a b c x y"), (3L, "z z z z")).toDF("doc_id", "text")
    val bench = Seq("a b c d e f").toDF("text")
    val ids = Decontam.contaminatedIds(
        corpus, "doc_id", "text", bench, "text", n = 3, minHits = 2L)
      .as[Long].collect().sorted
    // doc1 shares 3 grams, doc2 shares 1, doc3 none
    assert(ids.toSeq === Seq(1L))
  }

  test("spanContamination merges overlapping windows into disjoint spans") {
    // benchmark doc: 20 unique tokens b0..b19
    val bench = Seq((0 until 20).map(i => s"b$i").mkString(" ")).toDF("text")
    val corpus = Seq(
      // quotes b2..b8 (7 tokens) then separator then b11..b17 (7 tokens):
      // with k=5, hits merge into TWO disjoint spans of 7 tokens each
      (1L, (Seq("x0", "x1") ++ (2 to 8).map(i => s"b$i") ++ Seq("y0") ++
        (11 to 17).map(i => s"b$i")).mkString(" ")),
      // the whole benchmark doc verbatim: one 20-token span
      (2L, (0 until 20).map(i => s"b$i").mkString(" ")),
      // quotes b0..b13 (14 tokens): 10 overlapping 5-windows, ONE span
      (3L, (Seq("z0") ++ (0 to 13).map(i => s"b$i")).mkString(" ")),
      // clean
      (4L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val out = Decontam.spanContamination(corpus, "doc_id", "text",
        bench, "text", minTokens = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (2L, 14L, 7L))
    assert(out(2L) == (1L, 20L, 20L))
    assert(out(3L) == (1L, 14L, 14L))
    assert(!out.contains(4L))
  }

  test("benchmark gram set is broadcast (corpus never shuffles to match)") {
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq("a b c").toDF("text")
    val plan = Decontam.contaminationReport(
        corpus, "doc_id", "text", bench, "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
