package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SemDeDupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 3 orthogonal clone groups (3 near-identical members each) plus 2
  // off-axis singletons: within-group cosine ~1, cross-group ~0, so
  // the expected pair set at 0.99 is exactly the 3 intra-group pairs
  // per group
  private def corpus() = {
    val rows = (for {
      g <- 0 until 3
      c <- 0 until 3
    } yield {
      val v = Array.fill(4)(0.0)
      v(g) = 1.0
      v(3) = c * 0.001 // tiny perturbation so members aren't bit-equal
      ((g * 10 + c).toLong, v.toSeq)
    }) ++ Seq(
      (100L, Seq(0.5, 0.5, 0.5, 0.5)),
      (101L, Seq(-0.5, 0.5, -0.5, 0.5)))
    rows.toDF("id", "v")
  }

  test("cluster-blocked pairs recall every planted clone pair, nothing else") {
    val df = corpus()
    val cents = Similarity.trainIvfCentroids(df, "v", nlist = 3, seed = 11)
    val pairs = Dedup.semanticDedupPairs(df, "id", "v", cents, 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      g <- 0 until 3
      a <- 0 until 3; b <- (a + 1) until 3
    } yield ((g * 10 + a).toLong, (g * 10 + b).toLong)).toSet
    assert(pairs == expected)
  }

  test("keep-first drops every clone except the smallest id per group") {
    val df = corpus()
    val cents = Similarity.trainIvfCentroids(df, "v", nlist = 3, seed = 11)
    val kept = Dedup.semanticDedupKeep(df, "id", "v", cents, 0.99)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(0L, 10L, 20L, 100L, 101L))
  }

  test("blocked pairs are a subset of exact all-pairs at the threshold") {
    val df = corpus()
    val cents = Similarity.trainIvfCentroids(df, "v", nlist = 2, seed = 3)
    val blocked = Dedup.semanticDedupPairs(df, "id", "v", cents, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.embeddingNearDup(df, "id", "v", lit(0), 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(exact))
  }
}
