package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EqlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*) =
    rows.toSeq.toDF("event_id", "ms", "event_type", "user_id")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")

  private def chains(df: org.apache.spark.sql.DataFrame,
                     types: Seq[String], maxspanMs: Long) =
    Eql.sequence(df, "user_id", "ts", "event_id",
        types.map(t => col("event_type") === t), maxspanMs)
      .select("user_id", "id_1", "id_2", "id_3")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  test("anchored-greedy chains: earliest strictly-later event per " +
      "step; incomplete anchors drop; maxspan cuts the span") {
    val df = ev(
      (1L, 1000L, "signup", 1L), (3L, 3000L, "purchase", 1L),
      (4L, 4000L, "error", 1L), (5L, 5000L, "purchase", 1L),
      (6L, 6000L, "error", 1L),
      (7L, 1000L, "signup", 2L), // no purchase for user 2
      (8L, 1000L, "signup", 3L), (9L, 2000L, "purchase", 3L),
      (10L, 999000L, "error", 3L)) // span 998s > 600s maxspan
    assert(chains(df, Seq("signup", "purchase", "error"), 600000L) ==
      Seq((1L, 1L, 3L, 4L)))
    // wider maxspan admits user 3
    assert(chains(df, Seq("signup", "purchase", "error"), 1000000L) ==
      Seq((1L, 1L, 3L, 4L), (3L, 8L, 9L, 10L)))
    // a SECOND anchor chains independently (signup 5000? no — two
    // signups for one user both anchor)
    val two = ev(
      (1L, 1000L, "signup", 1L), (2L, 2000L, "signup", 1L),
      (3L, 3000L, "purchase", 1L), (4L, 4000L, "error", 1L))
    assert(chains(two, Seq("signup", "purchase", "error"), 600000L) ==
      Seq((1L, 1L, 3L, 4L), (1L, 2L, 3L, 4L)))
  }

  test("strictness includes the tie breaker: an event never fills " +
      "two steps, equal timestamps honor id order") {
    // one event matching both step types cannot chain with itself
    val one = ev((1L, 1000L, "both", 1L))
    val r = Eql.sequence(one, "user_id", "ts", "event_id",
      Seq(col("event_type") === "both", col("event_type") === "both"),
      60000L).collect()
    assert(r.isEmpty)
    // equal ts: id 11 > 10 chains, id 9 < 10 does not
    val eq = ev(
      (10L, 1000L, "signup", 1L), (11L, 1000L, "purchase", 1L),
      (20L, 2000L, "signup", 2L), (9L, 2000L, "purchase", 2L))
    val got = Eql.sequence(eq, "user_id", "ts", "event_id",
      Seq(col("event_type") === "signup",
        col("event_type") === "purchase"), 60000L)
      .select("user_id", "id_1", "id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 10L, 11L)))
  }

  test("refusals: < 2 steps, bad maxspan, missing/reserved columns") {
    val df = ev((1L, 1000L, "a", 1L))
    intercept[IllegalArgumentException](Eql.sequence(df, "user_id",
      "ts", "event_id", Seq(col("event_type") === "a"), 1000L))
    intercept[IllegalArgumentException](Eql.sequence(df, "user_id",
      "ts", "event_id", Seq(lit(true), lit(true)), 0L))
    intercept[IllegalArgumentException](Eql.sequence(df, "ghost",
      "ts", "event_id", Seq(lit(true), lit(true)), 1000L))
    intercept[IllegalArgumentException](Eql.sequence(
      df.withColumn("_side", lit(1)), "user_id", "ts", "event_id",
      Seq(lit(true), lit(true)), 1000L))
  }
  test("until: an until event strictly between two chain events " +
      "kills the chain; outside the transitions it does not") {
    val df = ev(
      // user 1: signup, VIEW between, purchase -> dead
      (1L, 1000L, "signup", 1L), (2L, 1500L, "view", 1L),
      (3L, 2000L, "purchase", 1L),
      // user 2: view BEFORE the anchor and AFTER completion -> alive
      (4L, 500L, "view", 2L), (5L, 1000L, "signup", 2L),
      (6L, 2000L, "purchase", 2L), (7L, 3000L, "view", 2L))
    def run(u: Option[org.apache.spark.sql.Column]) =
      Eql.sequence(df, "user_id", "ts", "event_id",
        Seq(col("event_type") === "signup",
          col("event_type") === "purchase"), 600000L, until = u)
        .select("user_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(run(None) == Seq(1L, 2L))
    assert(run(Some(col("event_type") === "view")) == Seq(2L))
    // an event matching BOTH the step and until kills (conservative)
    val both = ev((1L, 1000L, "signup", 5L), (2L, 2000L, "dual", 5L))
    val r = Eql.sequence(both, "user_id", "ts", "event_id",
      Seq(col("event_type") === "signup",
        col("event_type") === "dual"), 600000L,
      until = Some(col("event_type") === "dual")).collect()
    assert(r.isEmpty)
  }
}

