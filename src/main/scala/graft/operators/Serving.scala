package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one-call face of the persistent serving stack — the
  * composition a retrieval user actually runs (the reference's
  * backing engine exposes it as a single search request with
  * `rank: {rrf: ...}` fusing a lexical query with a `knn` clause;
  * eland rides that wire format): a whole query frame answered from
  * BOTH persistent indexes and fused per query.
  *
  * Everything here is composition — the legs are the gated
  * [[InvertedIndex.searchTopKBatch]] and [[VectorIndex.searchTopK]]
  * faces, the fusion is [[Ranking.rrfFusePerQuery]] — so the facade
  * inherits their contracts verbatim (segment/tombstone correctness,
  * plan-time cell/bucket pruning, broadcast query frames, bounded
  * driver state) and adds none of its own state.
  */
object Serving {

  /** Hybrid retrieval over the persistent stack: each query row
    * carries a lexical bag (`termsCol`, array of terms) and an
    * embedding (`vecCol`); the inverted index at `textIndexPath`
    * answers the lexical leg (BM25 top-`perLegK` per query, every
    * touched bucket directory read once for the whole frame), the IVF
    * index at `vectorIndexPath` answers the semantic leg (cosine
    * top-`perLegK`, probed cells pruned at plan time), and the two
    * rankings fuse per query via reciprocal-rank fusion. Output
    * (qIdCol, rank, idColName, rrf_score) for rank ≤ k per query.
    *
    * Both legs must be present and non-null on every row — a
    * lexical-only or vector-only workload should call the leg's own
    * search face directly rather than fuse against nothing.
    *
    * Scale shape: two index searches (each reads only pruned
    * directories; the corpus never shuffles — query frames broadcast
    * onto the pruned scans) + a fusion over ≤ 2 × |queries| × perLegK
    * rows. `nprobe` is the semantic leg's usual recall dial.
    *
    * `fusion` picks the combiner: `"rrf"` (rank-based — scales never
    * need normalizing; the default, ES's hybrid default) fuses via
    * [[Ranking.rrfFusePerQuery]] and returns `rrf_score`;
    * `"linear"` (the ES `linear` retriever — score magnitudes
    * matter) min-max normalizes each leg per query and returns
    * Σ legWeightsᵢ × normᵢ as `lin_score` via
    * [[Ranking.linearFusePerQuery]] — `legWeights` is (lexical,
    * semantic).
    */
  def searchHybrid(queries: DataFrame, textIndexPath: String,
                   vectorIndexPath: String, k: Int, perLegK: Int = 30,
                   rrfK: Int = 60, nprobe: Int = 2,
                   qIdCol: String = "q_id", termsCol: String = "terms",
                   vecCol: String = "vec", idColName: String = "id",
                   roundTo: Int = 6, fusion: String = "rrf",
                   legWeights: Seq[Double] = Seq(0.5, 0.5)): DataFrame = {
    require(k > 0, "k must be positive")
    require(perLegK >= k,
      s"perLegK ($perLegK) should be >= k ($k): a doc outside both " +
        "legs' top-perLegK cannot enter the fused top-k")
    require(Set("rrf", "linear")(fusion),
      s"fusion '$fusion' not supported (rrf, linear)")
    require(legWeights.size == 2,
      s"legWeights needs (lexical, semantic), got ${legWeights.size}")
    val resultCols = Seq("rank", "rrf_score", "lin_score")
    require(qIdCol != idColName && !resultCols.contains(qIdCol)
        && !resultCols.contains(idColName),
      "qIdCol/idColName collide with the result columns " +
        "(rank, rrf_score, lin_score)")
    val lex = InvertedIndex.searchTopKBatch(
      queries.select(col(qIdCol), col(termsCol)), textIndexPath, perLegK,
      qIdCol = qIdCol, termsCol = termsCol, idColName = idColName)
    val sem = VectorIndex.searchTopK(
      queries.select(col(qIdCol), col(vecCol)), vectorIndexPath, perLegK,
      nprobe, qIdCol = qIdCol, vecCol = vecCol, idColName = idColName,
      roundTo = roundTo)
    fusion match {
      case "rrf" =>
        Ranking.rrfFusePerQuery(
          Seq(lex.select(col(qIdCol), col(idColName), col("rank")),
            sem.select(col(qIdCol), col(idColName), col("rank"))),
          qIdCol, idColName, "rank", k, rrfK)
      case "linear" =>
        Ranking.linearFusePerQuery(
          Seq(lex.select(col(qIdCol), col(idColName), col("score")),
            sem.select(col(qIdCol), col(idColName),
              col("cos").as("score"))),
          qIdCol, idColName, "score", legWeights, k)
    }
  }

  /** One-call retrieve-then-rerank: first-stage candidates come from
    * the persistent inverted index's batched BM25 (`fetchK` per
    * query), and [[Ranking.maxSimRerank]] rescores ONLY those by
    * late interaction — the ColBERT serving shape as a library face
    * (the mv2 composition). `queries` carries (qIdCol, termsCol);
    * `docTokenVecs` (idColName, vecCol) one row per document token;
    * `queryTokenVecs` (qIdCol, qPosCol, vecCol) one row per query
    * token. Output (qIdCol, rank, idColName, maxsim) for rank ≤ k.
    *
    * Scale shape: the index answers the frame reading only the query
    * terms' buckets; the candidate set broadcasts onto the doc-token
    * table (filtered map-side — the corpus-scale table never
    * shuffles to find candidates); the quadratic token×token work is
    * bounded by |queries| × fetchK × tokens-per-doc × query tokens.
    */
  def searchMaxSim(queries: DataFrame, textIndexPath: String,
                   docTokenVecs: DataFrame, queryTokenVecs: DataFrame,
                   k: Int, fetchK: Int = 30,
                   qIdCol: String = "q_id", termsCol: String = "terms",
                   qPosCol: String = "qpos", vecCol: String = "vec",
                   idColName: String = "id",
                   roundTo: Int = 6): DataFrame = {
    require(k > 0, "k must be positive")
    require(fetchK >= k, s"fetchK ($fetchK) must be >= k ($k)")
    val cands = InvertedIndex.searchTopKBatch(
        queries.select(col(qIdCol), col(termsCol)), textIndexPath, fetchK,
        qIdCol = qIdCol, termsCol = termsCol, idColName = idColName)
      .select(col(qIdCol), col(idColName))
    Ranking.maxSimRerank(docTokenVecs, queryTokenVecs, cands,
      idColName, qIdCol, qPosCol, vecCol, k, roundTo)
  }
}
