package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Distributed k-means over the FULL corpus — the corpus-clustering
  * face of the engine (domain discovery, SemDeDup's first stage,
  * curriculum bucketing). Complements the driver-trained quantizers
  * (`Similarity.trainIvfCentroids` Lloyd's a bounded SAMPLE for IVF
  * cells; fine for a quantizer, not for clusters you report on): here
  * every iteration sees every row.
  *
  * Scale shape per iteration: ONE corpus scan — the assignment is a
  * broadcast expression (k dot products against centroid literals, the
  * `Similarity.ivfCell` shape), the centroid update is a posexplode +
  * groupBy(cluster, dim) average with map-side partial aggregation
  * (k × dim groups), and only k × dim doubles return to the driver.
  * No row-level state, no corpus shuffle — the classic distributed
  * Lloyd layout.
  *
  * Determinism contract (what the DuckDB oracle replays): init = the
  * k rows with smallest id (cluster ids dense in id order); distance
  * score = −2·v·c + ‖c‖² (the ‖v‖² term is constant per row) ROUNDED
  * to `roundTo` dp; argmin ties take the smallest cluster id; updated
  * centroids are per-dim averages rounded to `roundTo`; empty clusters
  * keep their previous centroid. The smallest-id init is replayable by
  * construction; for production runs seed it with
  * `Sampling.deterministicSample` ids or k-means++ over a sample —
  * the iteration semantics stay identical.
  */
object Clustering {

  final case class KmeansModel(centroids: Array[Array[Double]],
                               roundTo: Int) {
    /** Nearest-cluster id (int) for a vector column. */
    def assign(vec: Column): Column =
      assignCluster(vec, centroids, roundTo)
  }

  /** Nearest-centroid id with rounded distances and smallest-id ties —
    * `Similarity.cellScores` (the shared −2·v·c + ‖c‖² kernel, so the
    * IVF probe rule and the cluster rule cannot drift) plus the
    * cross-engine rounding contract.
    */
  def assignCluster(vec: Column, centroids: Array[Array[Double]],
                    roundTo: Int = 6): Column = {
    val v = VectorOps.asDouble(vec)
    val scores = array(
      Similarity.cellScores(v, centroids).map(round(_, roundTo)): _*)
    (array_position(scores, array_min(scores)) - 1).cast("int")
  }

  /** Run `iters` full-corpus Lloyd iterations; returns the model with
    * the post-update centroids. `df` must have a unique non-null
    * `idCol` (init order) and an array-typed `vecCol` of constant
    * dimension. The projected (id, vector) frame is persisted for the
    * loop — each iteration scans the cache, not `df`'s upstream
    * lineage — and released before returning.
    */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
                iters: Int, roundTo: Int = 6): KmeansModel = {
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be non-negative")
    val base = df
      .select(col(idCol).as("_kid"),
        VectorOps.asDouble(col(vecCol)).as("_v"))
      .persist()
    try {
      val init = base.orderBy(col("_kid")).limit(k).select(col("_v"))
        .collect().map(_.getSeq[Double](0).toArray)
      require(init.length == k, s"need at least $k rows, got ${init.length}")
      var centroids = init
      val dim = centroids.head.length
      var it = 0
      while (it < iters) {
        val sums = base
          .select(assignCluster(col("_v"), centroids, roundTo).as("_cl"),
            posexplode(col("_v")).as(Seq("_dim", "_x")))
          .groupBy("_cl", "_dim")
          .agg(round(avg(col("_x")), roundTo).as("_m"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
        centroids = centroids.zipWithIndex.map { case (old, cl) =>
          if (sums.contains((cl, 0)))
            Array.tabulate(dim)(d => sums((cl, d)))
          else old // empty cluster keeps its centroid
        }
        it += 1
      }
      KmeansModel(centroids, roundTo)
    } finally {
      base.unpersist(false)
      ()
    }
  }

  /** Fit then assign: (df columns…, cluster). */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int, roundTo: Int = 6): DataFrame = {
    val model = kmeansFit(df, idCol, vecCol, k, iters, roundTo)
    df.withColumn("cluster", model.assign(col(vecCol)))
  }

  /** Topic-balanced subset: cluster the corpus, then cap every cluster
    * at `capPerCluster` rows — the diversity primitive that stops a
    * few mega-topics from dominating a training mix (the cluster-
    * then-prune recipe of SemDeDup / DataComp-style curation, with a
    * deterministic cap instead of intra-cluster dedup — [[Dedup]]
    * owns that). Which rows survive a full cluster is decided by
    * [[Sampling.hashKey]]'s portable md5 draw, so re-runs, auditors,
    * and other engines reproduce the subset row for row.
    *
    * Cost: the k-means fit (`iters` full-corpus passes, centroids on
    * the driver — O(k·dim)) plus [[Sampling.stratifiedSample]]'s one
    * shuffle on the cluster id. Pick k well above the executor count
    * at corpus scale: the cap is a per-cluster ranked window, so k
    * partitions bound the parallelism of the final pass.
    *
    * Returns (df columns…, cluster), capped.
    */
  def clusterCappedSample(df: DataFrame, idCol: String, vecCol: String,
                          k: Int, iters: Int, capPerCluster: Int,
                          seed: Long, roundTo: Int = 6): DataFrame = {
    require(capPerCluster > 0, s"capPerCluster must be > 0: $capPerCluster")
    Sampling.stratifiedSample(kmeans(df, idCol, vecCol, k, iters, roundTo),
      idCol, "cluster", capPerCluster, seed)
  }
}
