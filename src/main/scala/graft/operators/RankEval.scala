package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ES `_rank_eval` re-expressed: ranking-quality metrics over a table
  * of ranked RESULTS (query, doc, 1-based rank) and a table of
  * relevance JUDGMENTS (query, doc, integer rating) — the evaluation
  * half of a retrieval stack, which the reference only reaches as a
  * raw endpoint passthrough. Formulas follow the ES documentation for
  * each metric:
  *
  *  - `precision@k`   relevant retrieved / retrieved (rating ≥
  *    `relevantThreshold`; unjudged docs count as not relevant,
  *    ES's `ignore_unlabeled: false` default)
  *  - `recall@k`      relevant retrieved / total relevant judged
  *  - `mrr@k`         1 / rank of the first relevant hit (0 if none)
  *  - `dcg@k`         Σ (2^rating − 1) / log₂(rank + 1), unjudged = 0
  *  - `ndcg@k`        dcg / ideal dcg (judgments re-ranked by rating
  *    desc; 0 when the query has no positive judgment)
  *  - `err@k`         Σ (1/rank) · R(rank) · Π_{j<rank} (1 − R(j))
  *    with R = (2^rating − 1) / 2^maxRating (the Chapelle ERR the ES
  *    docs cite; `maxRating` must bound every rating — enforced by an
  *    in-expression raise_error, never a silently-wrong ERR)
  *
  * One row per query — callers average for the ES summary number.
  * `refuseDuplicates = true` adds one bounded validation pass that
  * refuses duplicate (query, doc)/(query, rank) rows in `results` and
  * duplicate (query, doc) rows in `judgments` — shapes ES guarantees
  * by construction but caller data cannot.
  *
  * Scale shape: results are cut to rank ≤ k FIRST (pushable filter),
  * one left join against judgments on (query, doc), per-query window
  * functions over ≤ k rows, one groupBy(query). The ideal-DCG leg is
  * a second bounded window over the judgments table. No corpus is
  * touched — both inputs are already reduced.
  */
object RankEval {

  def rankEval(results: DataFrame, judgments: DataFrame,
               queryCol: String, docCol: String, rankCol: String,
               ratingCol: String, k: Int,
               relevantThreshold: Int = 1,
               maxRating: Int = 3,
               refuseDuplicates: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(relevantThreshold >= 1,
      s"relevant threshold must be >= 1, got $relevantThreshold")
    require(maxRating >= relevantThreshold,
      s"maxRating $maxRating below relevantThreshold $relevantThreshold")
    val q = col(queryCol)
    val topk = results.filter(col(rankCol) <= k && col(rankCol) >= 1)
      .select(q, col(docCol), col(rankCol).cast("long").as("_rank"))
    val judged = judgments.select(q, col(docCol),
      col(ratingCol).cast("long").as("_rating"))
    // opt-in input validation: ES generates the ranking itself so
    // (query, doc) and (query, rank) are unique by construction there;
    // here both tables are caller data, and a duplicate row silently
    // skews every metric (double-counted gains, phantom ranks). One
    // bounded action over the ALREADY-REDUCED inputs (≤ k rows per
    // query + the judgment list): per-query distinct counts, first
    // violating query reported.
    if (refuseDuplicates) {
      val dupResults = topk.groupBy(q).agg(
          count(lit(1)).as("_n"),
          countDistinct(col(docCol)).as("_nd"),
          countDistinct(col("_rank")).as("_nr"))
        .filter(col("_n") > col("_nd") || col("_n") > col("_nr"))
        .select(q.cast("string").as("_q"), lit("results").as("_side"))
      val dupJudged = judged.groupBy(q).agg(
          count(lit(1)).as("_n"),
          countDistinct(col(docCol)).as("_nd"))
        .filter(col("_n") > col("_nd"))
        .select(q.cast("string").as("_q"), lit("judgments").as("_side"))
      val bad = dupResults.unionByName(dupJudged).limit(1).collect()
      require(bad.isEmpty,
        s"rank_eval: duplicate (query, doc) or (query, rank) rows in " +
          s"the ${bad.head.getString(1)} table (e.g. query " +
          s"'${bad.head.getString(0)}') — duplicates silently skew " +
          "every metric; dedupe the input")
    }
    val joined = topk.join(judged, Seq(queryCol, docCol), "left")
      .withColumn("_r", coalesce(col("_rating"), lit(0L)))
    val rel = (col("_r") >= relevantThreshold).cast("int")
    val gain = (pow(lit(2.0), col("_r")) - 1.0) /
      log(2.0, col("_rank") + 1.0)
    // ERR stop probability and the preceding-ranks survival product:
    // Π(1 − R_j) via exp(Σ ln) with an any-zero flag (a rank with
    // R = 1 zeroes every later term — ln would NaN there). A rating
    // above maxRating would make errR > 1, ln(1 − errR) null, and the
    // coalesce below would map the null to survival 1.0 — a WRONG ERR
    // instead of a loud refusal — so the bound is enforced inside the
    // evaluated expression (the rateAgg discipline; the optimizer
    // cannot prune it).
    val errR = when(col("_r") > maxRating,
      raise_error(concat(
        lit("rank_eval: rating "), col("_r"),
        lit(s" exceeds maxRating $maxRating — maxRating must bound " +
          "every rating for ERR to be a probability")))
        .cast("double"))
      .otherwise((pow(lit(2.0), col("_r")) - 1.0) /
        math.pow(2.0, maxRating))
    val wPrev = Window.partitionBy(q).orderBy(col("_rank"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val surv = coalesce(
      when(max(when(errR === 1.0, 1).otherwise(0)).over(wPrev) === 1,
        lit(0.0))
        .otherwise(exp(sum(log(lit(1.0) - errR)).over(wPrev))),
      lit(1.0))
    val perRow = joined
      .withColumn("_rel", rel)
      .withColumn("_gain", gain)
      .withColumn("_errterm", surv * errR / col("_rank"))
    val perQuery = perRow.groupBy(q)
      .agg(
        count(lit(1)).cast("long").as("retrieved"),
        sum(col("_rel")).cast("long").as("relevant_retrieved"),
        (sum(col("_rel")).cast("double") / count(lit(1)))
          .as("precision"),
        coalesce(lit(1.0) /
          min(when(col("_rel") === 1, col("_rank"))), lit(0.0))
          .as("mrr"),
        sum(col("_gain")).as("dcg"),
        sum(col("_errterm")).as("err"))
    // per-query judged totals + ideal DCG from the judgments alone
    val wIdeal = Window.partitionBy(q)
      .orderBy(col("_rating").desc, col(docCol))
    // relevant_total counts EVERY relevant judgment (the recall
    // denominator); the ideal DCG only sums the top-k ideal ranks
    val ideal = judged
      .withColumn("_irank", row_number().over(wIdeal))
      .groupBy(q)
      .agg(
        sum((col("_rating") >= relevantThreshold).cast("long"))
          .as("relevant_total"),
        sum(when(col("_irank") <= k,
          (pow(lit(2.0), col("_rating")) - 1.0) /
            log(2.0, col("_irank") + 1.0)).otherwise(lit(0.0)))
          .as("_idcg"))
    perQuery.join(ideal, Seq(queryCol), "left")
      .select(q,
        col("retrieved"), col("relevant_retrieved"),
        col("precision"),
        when(coalesce(col("relevant_total"), lit(0L)) > 0,
          col("relevant_retrieved").cast("double") /
            col("relevant_total"))
          .otherwise(lit(0.0)).as("recall"),
        col("mrr"), col("dcg"),
        when(coalesce(col("_idcg"), lit(0.0)) > 0.0,
          col("dcg") / col("_idcg")).otherwise(lit(0.0)).as("ndcg"),
        col("err"))
      .orderBy(q)
  }
}
