package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Per-document keyword extraction by tf-idf — the corpus-analysis op
  * behind topic labeling, data-card "what is this source about"
  * summaries, and cheap keyword-match retrieval over a curated corpus.
  *
  * Scoring is the smooth-idf spelling (the sklearn TfidfTransformer
  * default): idf = ln((N + 1) / (df + 1)) + 1, score = tf · idf,
  * rounded half-up at 6 dp so the DuckDB oracle replays the ranking;
  * ties break by term ascending, so the per-document top-k is total.
  *
  * Scale shape: one (doc, term) count aggregation (map-side combined),
  * one term-keyed df aggregation joined back on the term key (AQE
  * balances the Zipf skew; df is a term-table, never corpus-sized
  * rows), N rides as a 1-row lazy crossJoin (the in-plan-stats
  * discipline — no collect), and the per-document top-k window
  * partitions on the DOCUMENT id — every window group is one
  * document's distinct terms, bounded by document length, so the
  * window that is fatal on corpus-wide keys is safe here by
  * construction.
  */
object Keywords {

  /** (idCol, rank, term, tf, score): the top-`k` tf-idf terms of every
    * document with at least one token; rank is 1-based in (score desc,
    * term asc) order.
    *
    * Precondition (the [[Dedup.keepFirstByKey]] /
    * [[Packing.packByBudget]] contract): `idCol` must be UNIQUE across
    * the frame — tf groups on (id, term) and df counts distinct ids,
    * so two rows sharing an id would silently merge their term counts
    * into one phantom document instead of failing. Dedup upstream
    * (e.g. [[Dedup.exactKeepFirst]]) before extracting keywords.
    */
  def keywordsTfIdf(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 5): DataFrame = {
    require(k >= 1, s"keywordsTfIdf: k must be >= 1 (got $k)")
    val terms = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol)))
        .as("term"))
      .groupBy(idCol, "term")
      .agg(count(lit(1)).cast("long").as("tf"))
    val df = terms.groupBy("term")
      .agg(countDistinct(col(idCol)).cast("double").as("df"))
    val n = docs.select(col(idCol)).distinct()
      .agg(count(lit(1)).cast("double").as("n"))
    val scored = terms
      .join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", graft.queries.QueryUtil.rhu(
        col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("score"))
  }

  /** Per-source DISTINCTIVE terms by JLH significance — ES's
    * `significant_terms` aggregation (its default JLH heuristic:
    * score = (fg% − bg%) · (fg% ∕ bg%) over DOCUMENT frequencies,
    * foreground = the source, background = the whole corpus including
    * the foreground), the "what distinguishes source X" face of a
    * data-card report. eland users reach this agg only through the
    * raw-DSL passthrough (eland/query_compiler.py:490-491); here it is
    * a first-class operator.
    *
    * Output: (sourceCol, rank, term, df_fg, df_bg, score) for the
    * top-`k` positively-significant terms per source (fg% > bg%; rank
    * 1-based in score desc, term asc order; score rounded half-up at
    * 6 dp so the DuckDB oracle replays the ranking).
    *
    * Scale shape: one (source, doc, distinct-term) explode with a
    * map-side-combined (source, term) doc-count aggregation; the
    * background counts derive from the foreground table (every doc
    * has exactly one source, so bg df = Σ over sources — no second
    * corpus scan); source sizes and the corpus size ride as broadcast
    * one-row-per-source frames. The per-source top-k runs through the
    * two-phase [[Similarity.rankTopKPerQuery]], so a source whose
    * vocabulary is corpus-sized never funnels through one partition
    * (the kw1 window would — its per-DOC partitions are bounded by
    * document length, per-SOURCE partitions are not).
    *
    * Precondition (the [[keywordsTfIdf]] contract): `idCol` unique —
    * duplicate ids would double-count their doc frequencies.
    */
  /** `backgroundFilter` — ES's `background_filter` knob: the
    * background statistics (df_bg, n_bg) restrict to the docs
    * matching the filter instead of the whole frame; foreground
    * buckets are unchanged. A foreground term ABSENT from the
    * filtered background drops from the ranking — ES's JLH heuristic
    * scores a zero-superset-frequency term 0 (the Lucene zero
    * guard), and a 0 score never ranks; here the inner background
    * join realizes the same verdict without a divide-by-zero.
    */
  def significantTerms(docs: DataFrame, idCol: String, textCol: String,
                       sourceCol: String, k: Int = 5,
                       backgroundFilter: Option[Column] = None)
      : DataFrame = {
    require(k >= 1, s"significantTerms: k must be >= 1 (got $k)")
    val docTerms = docs.select(col(sourceCol), col(idCol),
      explode(array_distinct(TextAnalysis.tokens(col(textCol))))
        .as("term"))
    val bgDocs = backgroundFilter.fold(docs)(docs.filter)
    val bgTerms = backgroundFilter.fold(docTerms)(_ =>
      bgDocs.select(col(idCol),
        explode(array_distinct(TextAnalysis.tokens(col(textCol))))
          .as("term")))
    jlhTopK(docTerms, docs, bgTerms, bgDocs, sourceCol, k)
  }

  /** ES `significant_text` aggregation — [[significantTerms]]' JLH
    * scoring over ANALYZED text with the agg's one semantic novelty,
    * `filter_duplicate_text`: near-duplicate PASSAGES (boilerplate,
    * quoted email chains, syndicated paragraphs) are de-weighted so
    * they cannot masquerade as significant. ES spots re-occurring
    * byte sequences longer than ~5 tokens during collection
    * (DuplicateByteSequenceSpotter), which depends on shard-local
    * collection order; the portable adjudication here: a `dupWindow`-
    * token shingle is OWNED by the smallest `idCol` containing it,
    * and in every LATER document the token positions covered by an
    * already-owned shingle are dropped before the document's distinct
    * term set is counted. Within-document repetition is untouched
    * (document frequencies already count a term once per doc).
    * Reference reaches this agg only as raw-DSL passthrough
    * (eland/filter.py:182-185).
    *
    * Scale shape: shingle ownership is one map-side-combined min
    * aggregation + one shingle-keyed join (the [[Dedup]] banding
    * discipline — never all-pairs); the surviving dup-window starts
    * come home as ONE bounded array per affected doc (docs with no
    * duplicated passage carry nothing), applied locally with a
    * higher-order exists — the corpus text shuffles ONCE, on the doc
    * key. Per-token cost of the local filter is O(dup windows in the
    * doc), bounded by document length. The final counts ride the
    * same map-side-combined (source, term) aggregation as kw2.
    */
  /** `maxShingleOccurrences` is the hot-shingle guard (the
    * sharedSpans maxPostings / LSH maxBucketSize trade): the
    * ownership window partitions by shingle, and a whole-partition
    * window has NO map-side partial aggregation — at corpus scale one
    * universal boilerplate shingle ("all rights reserved …") would
    * land every occurrence row in a single task. A shingle occurring
    * MORE than the cap is adjudicated pure boilerplate and its
    * positions are masked in EVERY document — the owner included
    * (no ownership verdict needed, so its rows never enter the
    * window; the JLH verdict is unchanged in spirit: de-weighting a
    * passage that common IS boilerplate removal). Cost of the guard:
    * one map-side-combined shingle count (partials only — far
    * smaller than the window shuffle it protects) plus two broadcast
    * joins against the tiny (≤ totalWindows ∕ cap keys) hot set.
    */
  def significantText(docs: DataFrame, idCol: String, textCol: String,
                      sourceCol: String, k: Int = 5,
                      filterDuplicateText: Boolean = true,
                      dupWindow: Int = 6,
                      maxShingleOccurrences: Int = 100000): DataFrame = {
    if (!filterDuplicateText)
      return significantTerms(docs, idCol, textCol, sourceCol, k)
    require(k >= 1, s"significantText: k must be >= 1 (got $k)")
    require(dupWindow >= 2,
      s"significantText: dupWindow must be >= 2 (got $dupWindow)")
    require(maxShingleOccurrences >= 2,
      "significantText: maxShingleOccurrences must be >= 2 (got " +
        s"$maxShingleOccurrences)")
    val toks = docs.select(col(sourceCol), col(idCol),
      TextAnalysis.tokens(col(textCol)).as("_toks"))
    // 0-based shingle window starts; docs shorter than the window
    // contribute none
    val winKeys = when(size(col("_toks")) >= dupWindow,
      transform(sequence(lit(0), size(col("_toks")) - dupWindow),
        i => concat_ws(" ", slice(col("_toks"), i + 1, lit(dupWindow)))))
      .otherwise(array().cast("array<string>"))
    val windows = toks.select(col(idCol),
      posexplode(winKeys).as(Seq("_wp", "_key")))
    // the hot-shingle guard (scaladoc): above-cap shingles mask
    // everywhere and never enter the ownership window
    val hot = windows.groupBy("_key")
      .agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") > maxShingleOccurrences.toLong)
      .select("_key")
    val hotStarts = windows.join(broadcast(hot), Seq("_key"))
      .select(col(idCol), col("_wp"))
    // ownership via a whole-partition window min — ONE shingle-keyed
    // shuffle instead of a groupBy + a join re-shuffling both sides
    // (and the windows subtree tokenizes once, not twice); partition
    // size is bounded by min(duplication count, the cap) after the
    // guard. Only windows whose shingle was seen in an EARLIER doc
    // survive — docs without duplicated passages vanish here.
    val coldStarts = windows.join(broadcast(hot), Seq("_key"), "left_anti")
      .withColumn("_owner", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_key")))
      .filter(col(idCol) > col("_owner"))
      .select(col(idCol), col("_wp"))
    val dupStarts = coldStarts.unionByName(hotStarts)
      .groupBy(idCol)
      .agg(collect_set(col("_wp")).as("_dups"))
    val kept = filter(col("_toks"),
      (_, p) => !exists(col("_dups"),
        w => w <= p && p < w + dupWindow))
    val docTerms = toks.join(dupStarts, Seq(idCol), "left")
      .select(col(sourceCol), col(idCol),
        explode(array_distinct(
          when(col("_dups").isNull, col("_toks")).otherwise(kept)))
          .as("term"))
    jlhTopK(docTerms, docs, docTerms, docs, sourceCol, k)
  }

  /** The JLH top-k core shared by [[significantTerms]] and
    * [[significantText]]: `docTerms` must hold DISTINCT (source, id,
    * term) rows; `docs` supplies the per-source and corpus doc counts
    * (which duplicate-text filtering never changes — it de-weights
    * term frequencies, not document totals).
    */
  private def jlhTopK(docTerms: DataFrame, fgDocs: DataFrame,
                      bgTerms: DataFrame, bgDocs: DataFrame,
                      sourceCol: String, k: Int): DataFrame = {
    val fg = docTerms.groupBy(sourceCol, "term")
      .agg(count(lit(1)).cast("double").as("df_fg"))
    // one row per (doc, term) on either side, so df is a row count.
    // With the DEFAULT (whole-frame) background the bg table is the
    // sum-over-sources rollup of the fg table (every doc has exactly
    // one source) — derive it from fg instead of re-tokenizing the
    // corpus for a second explode+count pass (r18, guide §1.2; the
    // counts are integers in doubles, so the rollup is exact). A real
    // background_filter keeps its own pass: its doc set differs.
    val bg =
      if (bgTerms eq docTerms)
        fg.groupBy("term").agg(sum(col("df_fg")).as("df_bg"))
      else bgTerms.groupBy("term")
        .agg(count(lit(1)).cast("double").as("df_bg"))
    val sizes = fgDocs.groupBy(sourceCol)
      .agg(count(lit(1)).cast("double").as("n_fg"))
    // same derivation for the corpus size when the background IS the
    // frame: Σ per-source sizes — drops the second count scan
    val total =
      if (bgDocs eq fgDocs)
        sizes.agg(coalesce(sum(col("n_fg")), lit(0.0)).as("n_bg"))
      else bgDocs.agg(count(lit(1)).cast("double").as("n_bg"))
    val scored = fg
      .join(bg, Seq("term"))
      .join(broadcast(sizes), Seq(sourceCol))
      .crossJoin(broadcast(total))
      .withColumn("_p_fg", col("df_fg") / col("n_fg"))
      .withColumn("_p_bg", col("df_bg") / col("n_bg"))
      .filter(col("_p_fg") > col("_p_bg"))
      .withColumn("score", graft.queries.QueryUtil.rhu(
        (col("_p_fg") - col("_p_bg")) * (col("_p_fg") / col("_p_bg")), 6))
    Similarity.rankTopKPerQuery(scored, k, sourceCol, "term", "score")
      .select(col(sourceCol), col("rank"), col("term"),
        col("df_fg").cast("long").as("df_fg"),
        col("df_bg").cast("long").as("df_bg"), col("score"))
  }
}
