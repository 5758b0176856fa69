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

  test("bloomContaminationReport ≡ contaminationReport (exactness survives the prefilter)") {
    // enough docs that the bloom actually filters, plus planted overlap
    val corpus = (1L to 200L).map { i =>
      if (i % 10 == 0) (i, s"shared gram alpha beta gamma doc$i filler")
      else (i, s"unique tokens only u${i}a u${i}b u${i}c u${i}d")
    }.toDF("doc_id", "text")
    val bench = Seq("shared gram alpha beta gamma").toDF("text")
    val exact = Decontam.contaminationReport(
        corpus, "doc_id", "text", bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = Decontam.bloomContaminationReport(
        corpus, "doc_id", "text", bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)          // non-vacuous: the planted docs hit
    assert(bloomed === exact)
  }

  test("semanticContamination: best match per row, rounded threshold, ties to smallest bench id") {
    val bench = Seq(
      (10L, Seq(1.0, 0.0)), (20L, Seq(0.0, 1.0))).toDF("bid", "bv")
    val corpus = Seq(
      (1L, Seq(0.9, 0.1)),    // close to bench 10
      (2L, Seq(0.1, 0.9)),    // close to bench 20
      (3L, Seq(0.5, -0.8)),   // cos 0.53 / -0.85 — below threshold
      (4L, Seq(1.0, 1.0))     // cos 0.70711 to BOTH -> tie, bid 10
    ).toDF("id", "v")
    val out = Decontam.semanticContamination(corpus, "id", "v",
        bench, "bid", "bv", minCosine = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.keySet === Set(1L, 2L, 4L))
    assert(out(1L)._1 === 10L && out(1L)._2 > 0.99)
    assert(out(2L)._1 === 20L)
    assert(out(4L) === (10L, 0.70711)) // exact tie -> smallest bench id
    // the bench side must be the broadcast side
    val plan = Decontam.semanticContamination(corpus, "id", "v",
        bench, "bid", "bv", 0.7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }

  test("BloomMightContain: no false negatives, codegen path, null in → null out") {
    val keys = (1 to 1000).map(i => s"key-$i").toDF("k")
    val bloom = spark.sparkContext.broadcast(
      Decontam.buildStringBloom(keys, "k", expectedItems = 1000L, fpp = 0.01))
    val probe = ((1 to 1000).map(i => s"key-$i") ++
      (1 to 1000).map(i => s"absent-$i")).toDF("k")
    val kept = probe.filter(graft.plans.BloomMightContain(col("k"), bloom))
      .as[String].collect().toSet
    // every member survives (Bloom guarantee); false positives bounded
    // loosely — at fpp=1% seeing >10% of 1000 absents would mean the
    // build/probe byte semantics disagree, not bad luck
    assert((1 to 1000).forall(i => kept(s"key-$i")))
    assert(kept.count(_.startsWith("absent-")) < 100)
    val withNull = Seq(Some("key-1"), None).toDF("k")
    val nullOut = withNull
      .select(graft.plans.BloomMightContain(col("k"), bloom).as("m"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(nullOut.toSeq === Seq(true, null))
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
