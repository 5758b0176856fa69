package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** A persistent inverted index (term → postings) with index-backed
  * BM25 search — the materialized face of [[Ranking.bm25TopK]].
  *
  * The scan-based bm25TopK re-tokenizes the corpus per query; that is
  * the right shape for one-off analytics but the wrong one for a
  * query-serving workload, which is exactly what the reference's
  * backing engine builds an inverted index for (Lucene; eland pushes
  * all `match` queries to it). This is the Spark-native equivalent:
  *
  *  - `build` runs ONE corpus-wide (term, doc) count shuffle and
  *    writes postings parquet partitioned by a stable term bucket
  *    (first byte of md5(term), so the layout is engine- and
  *    run-independent), plus a one-row stats table.
  *  - `searchTopK` reads ONLY the query terms' buckets — directory
  *    pruning at planning time (spec-pinned), then a parquet
  *    `term IN (...)` pushdown within them. Query cost is
  *    O(postings of the query terms), not O(corpus): at 100 TB the
  *    corpus is never re-read, and a b-bucket index turns a q-term
  *    query into reading ≤ q/256-th… ≤ q/b-th of the postings files.
  *
  * Scoring is bit-compatible with [[Ranking.bm25TopK]] (same staged
  * doubles, same idf/tf expression tree, same 6-dp rounding —
  * differential-pinned in InvertedIndexSpec), so a caller can move
  * between the scan and index paths without result drift.
  *
  * Build contract: offline, single-writer, `overwrite` (rebuild =
  * re-run; for incremental corpora put new docs in a second index and
  * union the searches, or rebuild on a cadence — postings rows are
  * ~30 B, so even a 100 TB corpus's index is shuffle-bound, not
  * storage-bound).
  */
object InvertedIndex {

  /** Stable term → bucket assignment: first byte of md5(term) mod
    * `buckets`. md5 over UTF-8 bytes on both sides, so the Spark
    * expression, the driver-side [[bucketOf]], and a DuckDB oracle
    * all agree on the layout.
    */
  private def termBucket(term: Column, buckets: Int): Column =
    (conv(substring(md5(term), 1, 2), 16, 10).cast("int") % buckets)

  /** Driver-side twin of [[termBucket]] — lets `searchTopK` enumerate
    * the buckets of its query terms without running a job.
    */
  private[operators] def bucketOf(term: String, buckets: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (d(0) & 0xff) % buckets
  }

  /** Tokenize, count, and persist the postings index at `indexPath`:
    * `postings/` holds (term, id, len, tf) partitioned by `bucket`;
    * `stats/` holds one row (n, avg_len, buckets). Doc length and
    * corpus stats count ALL docs (including those whose tokens never
    * match a query), mirroring bm25TopK's statistics.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
            indexPath: String, buckets: Int = 64): Unit = {
    require(buckets >= 1 && buckets <= 256,
      s"buckets must be in [1, 256] (one md5 byte), got $buckets")
    val staged = docs
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col("id"), col("_toks"),
        size(col("_toks")).cast("double").as("len"))
    val postings = staged
      .select(col("id"), col("len"), explode(col("_toks")).as("term"))
      .groupBy(col("term"), col("id"), col("len"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", termBucket(col("term"), buckets))
    // repartition by bucket before partitionBy: otherwise every write
    // task opens up to `buckets` files (the small-files trap); this
    // way each task writes into few directories
    postings.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexPath/postings")
    // stats LAST: readers require stats, so a crashed build (postings
    // present, stats missing) fails loudly instead of serving an
    // index whose corpus constants belong to a previous build
    staged.agg(count(lit(1)).cast("double").as("n"),
        avg(col("len")).as("avg_len"),
        lit(buckets).as("buckets"))
      .write.mode("overwrite").parquet(s"$indexPath/stats")
  }

  /** Index-backed BM25 top-k: (idColName, score) ordered by score
    * desc, ties by id — the same output contract, formula, and 6-dp
    * rounding as [[Ranking.bm25TopK]], reading only the query terms'
    * postings buckets.
    */
  def searchTopK(spark: SparkSession, indexPath: String,
                 queryTerms: Seq[String], k: Int,
                 idColName: String = "id",
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k > 0)
    val stats = spark.read.parquet(s"$indexPath/stats")
    val buckets = stats.select("buckets").head().getInt(0)
    val terms = queryTerms.map(_.toLowerCase).distinct
    val wanted = terms.map(bucketOf(_, buckets)).distinct
    val p = spark.read.parquet(s"$indexPath/postings")
      // bucket IN (...) prunes partition DIRECTORIES at planning time
      // (pinned in PlanQualitySpec); term IN (...) pushes to parquet
      .filter(col("bucket").isin(wanted: _*))
      .filter(col("term").isin(terms: _*))
    // postings rows are unique per (term, id): df = row count per term
    val dfreq = p.groupBy("term")
      .agg(count(lit(1)).cast("double").as("_df"))
    p.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats.select(col("n").as("_n"),
        col("avg_len").as("_avg"))))
      .withColumn("_idf",
        log(lit(1.0) + (col("_n") - col("_df") + 0.5) / (col("_df") + 0.5)))
      .withColumn("_s",
        col("_idf") * col("tf") * (k1 + 1.0) /
          (col("tf") +
            lit(k1) * (lit(1.0) - b + lit(b) * col("len") / col("_avg"))))
      .groupBy(col("id").as(idColName))
      .agg(round(sum(col("_s")), 6).as("score"))
      .orderBy(col("score").desc, col(idColName))
      .limit(k)
  }
}
