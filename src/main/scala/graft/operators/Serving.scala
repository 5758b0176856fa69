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
    */
  def searchHybrid(queries: DataFrame, textIndexPath: String,
                   vectorIndexPath: String, k: Int, perLegK: Int = 30,
                   rrfK: Int = 60, nprobe: Int = 2,
                   qIdCol: String = "q_id", termsCol: String = "terms",
                   vecCol: String = "vec", idColName: String = "id",
                   roundTo: Int = 6): DataFrame = {
    require(k > 0, "k must be positive")
    require(perLegK >= k,
      s"perLegK ($perLegK) should be >= k ($k): a doc outside both " +
        "legs' top-perLegK cannot enter the fused top-k")
    require(qIdCol != idColName && !Seq("rank", "rrf_score").contains(qIdCol)
        && !Seq("rank", "rrf_score").contains(idColName),
      "qIdCol/idColName collide with the result columns (rank, rrf_score)")
    val lex = InvertedIndex.searchTopKBatch(
      queries.select(col(qIdCol), col(termsCol)), textIndexPath, perLegK,
      qIdCol = qIdCol, termsCol = termsCol, idColName = idColName)
    val sem = VectorIndex.searchTopK(
      queries.select(col(qIdCol), col(vecCol)), vectorIndexPath, perLegK,
      nprobe, qIdCol = qIdCol, vecCol = vecCol, idColName = idColName,
      roundTo = roundTo)
    Ranking.rrfFusePerQuery(
      Seq(lex.select(col(qIdCol), col(idColName), col("rank")),
        sem.select(col(qIdCol), col(idColName), col("rank"))),
      qIdCol, idColName, "rank", k, rrfK)
  }
}
