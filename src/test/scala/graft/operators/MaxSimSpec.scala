package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** MaxSim late-interaction scoring: hand-computed 2-dim fixtures. */
class MaxSimSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // d1: unit x + unit y token; d2: one (0.6, 0.8) token
  private val dv = Seq(
    (1L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
    (2L, Seq(0.6, 0.8))).toDF("id", "vec")

  test("maxsim = sum over query tokens of max cosine; repeated query" +
    " tokens each contribute") {
    // two identical (1,0) query tokens: d1 max = 1.0 each -> 2.0;
    // d2 max = 0.6 each -> 1.2
    val qv = Seq((10L, 0L, Seq(1.0, 0.0)), (10L, 1L, Seq(1.0, 0.0)))
      .toDF("q_id", "qpos", "vec")
    val got = Ranking.maxSimTopK(dv, qv, "id", "q_id", "qpos", "vec", k = 5)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === Seq((1L, 1L, 2.0), (2L, 2L, 1.2)))
  }

  test("mixed query: per-token maxes pick different doc tokens") {
    // q tokens (1,0) and (0,1): d1 = 1.0 + 1.0 = 2.0;
    // d2 = 0.6 + 0.8 = 1.4
    val qv = Seq((10L, 0L, Seq(1.0, 0.0)), (10L, 1L, Seq(0.0, 1.0)))
      .toDF("q_id", "qpos", "vec")
    val got = Ranking.maxSimTopK(dv, qv, "id", "q_id", "qpos", "vec", k = 5)
      .orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq
    assert(got === Seq((1L, 2.0), (2L, 1.4)))
  }

  test("rerank scores only the candidate set") {
    val qv = Seq((10L, 0L, Seq(1.0, 0.0))).toDF("q_id", "qpos", "vec")
    val cand = Seq((10L, 2L)).toDF("q_id", "id")
    val got = Ranking.maxSimRerank(dv, qv, cand,
        "id", "q_id", "qpos", "vec", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq((10L, 1L, 2L, 0.6)))
  }

  test("multiple queries rank independently") {
    val qv = Seq((10L, 0L, Seq(1.0, 0.0)), (20L, 0L, Seq(0.0, 1.0)))
      .toDF("q_id", "qpos", "vec")
    val got = Ranking.maxSimTopK(dv, qv, "id", "q_id", "qpos", "vec", k = 1)
      .orderBy("q_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .toSeq
    // both queries' best is d1 (has a perfectly aligned token)
    assert(got === Seq((10L, 1L, 1.0), (20L, 1L, 1.0)))
  }

  test("candidate set broadcasts; doc-token table is not shuffled to" +
    " find candidates") {
    val qv = Seq((10L, 0L, Seq(1.0, 0.0))).toDF("q_id", "qpos", "vec")
    val cand = Seq((10L, 1L), (10L, 2L)).toDF("q_id", "id")
    val df = Ranking.maxSimRerank(dv, qv, cand,
      "id", "q_id", "qpos", "vec", k = 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
