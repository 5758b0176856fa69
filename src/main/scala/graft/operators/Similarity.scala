package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps
import graft.plans.VectorExpressions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceTopK`: broadcast the (small) query set against the
  *    corpus, compute cosine per (query, candidate), take top-k per
  *    query with a window. Exact baseline; cost O(|Q| * N) but fully
  *    parallel and shuffle-free until the final per-query top-k, so it
  *    scales to 100TB corpora as long as |Q| stays modest.
  *  - `lshBuckets` + `lshTopK`: random-hyperplane LSH. Each vector gets
  *    a `planes`-bit bucket; queries only scan their own bucket —
  *    the standard recall/cost dial (more planes = smaller buckets).
  *    Hyperplane components are derived from xxhash64(plane, dim) so
  *    the index is deterministic and needs no stored model.
  */
object Similarity {

  /** Two-phase per-query top-k over a scored candidate frame.
    *
    * The naive spelling — `row_number().over(Window.partitionBy(qCol))`
    * — funnels EVERY candidate row for a query into one partition and
    * sorts it in one task: for brute-force search that is O(N) rows per
    * query, a straggler by construction, and parallelism is capped at
    * |Q| no matter how large the cluster. Instead: phase 1 ranks within
    * (input-partition, query) cells — the shuffle key carries
    * `spark_partition_id()`, so the sort work spreads across
    * partitions×|Q| cells — and keeps at most k survivors per cell;
    * phase 2 ranks the ≤ partitions×k survivors per query, a bounded
    * set regardless of corpus size.
    *
    * Results are identical to the single-window spelling for ANY
    * partition assignment: a row outside its cell's top-k is dominated
    * by ≥ k same-cell rows for the same query and can never enter the
    * global top-k. Ties break on `idCol`, so ranking stays total and
    * reproducible. Returns `scored` plus a long `rank` column,
    * filtered to rank ≤ k; callers project their own output shape.
    */
  private[graft] def rankTopKPerQuery(scored: DataFrame, k: Int,
                                      qCol: String, idCol: String,
                                      scoreCol: String): DataFrame = {
    val localW = Window.partitionBy(col("_tk_pid"), col(qCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val globalW = Window.partitionBy(col(qCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    scored
      .withColumn("_tk_pid", spark_partition_id())
      .withColumn("_tk_lr", row_number().over(localW))
      .filter(col("_tk_lr") <= k)
      .drop("_tk_pid", "_tk_lr")
      .withColumn("rank", row_number().over(globalW).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1). */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000L)).cast("double") / 1000.0) - 1.0

  /** Engine-PORTABLE hyperplane component in [-1, 1): derived from
    * md5("<plane>:<dim>") instead of xxhash64, so any engine replays
    * the identical plane set —
    * `(('0x'||substr(md5(p||':'||d),1,8))::BIGINT % 2000)/1000.0 - 1`.
    * Same quantization (2000 steps of 1e-3) as the fast path.
    */
  private def planeComponentPortable(plane: Int, dim: Column): Column =
    (pmod(conv(substring(
        md5(concat(lit(s"$plane:"), dim.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(2000L)).cast("double") / 1000.0) - 1.0

  /** Signed projection of `vec` onto deterministic hyperplane `plane`. */
  private def projection(vec: Column, plane: Int,
                         portable: Boolean = false): Column =
    aggregate(
      zip_with(VectorOps.asDouble(vec),
        sequence(lit(0), size(vec) - 1),
        (x, i) => x * (if (portable) planeComponentPortable(plane, i)
                       else planeComponent(plane, i))),
      lit(0.0), (acc, x) => acc + x)

  /** HOF reference form of [[lshBuckets]] — kept ONLY as the
    * differential-test pin for the native codegen expression
    * (VectorPropertySpec asserts bit-identity on generated vectors).
    */
  private[graft] def lshBucketsHof(vec: Column, planes: Int, table: Int = 0): Column =
    (0 until planes).map { p =>
      when(projection(vec, table * 4096 + p) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Random-hyperplane LSH bucket id (0 until 2^planes). `table`
    * selects an independent plane set for multi-table LSH. Native
    * codegen kernel ([[graft.plans.VectorExpressions.HyperplaneSignBits]]):
    * one unboxed elements×planes pass per vector instead of `planes`
    * interpreted aggregate(zip_with(...)) towers — bit-identical to
    * [[lshBucketsHof]] by construction. A NULL vector lands in bucket
    * 0 (coalesced here: the raw expression follows Catalyst's
    * null-in/null-out convention, but the operator contract — kept
    * from the HOF form — is that degenerate rows stay joinable in
    * bucket 0 rather than silently dropping out of bucket equi-joins).
    */
  def lshBuckets(vec: Column, planes: Int, table: Int = 0): Column =
    coalesce(VectorExpressions.hyperplaneBits(vec, planes, table), lit(0L))

  /** Engine-portable bucket id: [[lshBucketsHof]]'s structure over the
    * md5-derived plane set, so the bucket of every vector — and
    * therefore the whole candidate walk — replays in any engine with
    * md5. System-boundary variant; [[lshBuckets]] (native codegen,
    * xxhash64 planes) is the interior fast path.
    */
  def lshBucketsPortable(vec: Column, planes: Int, table: Int = 0): Column =
    coalesce((0 until planes).map { p =>
      when(projection(vec, table * 4096 + p, portable = true) >= 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _), lit(0L))

  /** Exact cosine top-k of `corpus` rows for each row of `queries`.
    * Output: (q_id, rank, n_id, cos). Ranking uses cosine rounded to
    * `roundTo` decimals with id tiebreak so results are reproducible
    * across engines and partitionings.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     roundTo: Int = 6): DataFrame = {
    // norms precomputed per row BEFORE the |Q|*N join: cosine inside
    // the join would redo both norms per pair (3x the flops)
    val q = queries.select(col(idCol).as("q_id"),
      VectorOps.asDouble(col(vecCol)).as("q_v"))
      .withColumn("q_n", sqrt(VectorOps.normSq(col("q_v"))))
    val c = corpus.select(col(idCol).as("n_id"),
      VectorOps.asDouble(col(vecCol)).as("n_v"))
      .withColumn("n_n", sqrt(VectorOps.normSq(col("n_v"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", round(
        VectorExpressions.dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")),
        roundTo))
    rankTopKPerQuery(scored, k, "q_id", "n_id", "cos")
      .select("q_id", "rank", "n_id", "cos")
  }

  // ---- IVF (inverted-file) ANN ------------------------------------
  // The other standard scale path beside LSH: a coarse k-means
  // quantizer partitions the corpus into `nlist` cells; queries probe
  // only their `nprobe` nearest cells. The quantizer trains on a
  // deterministic bounded sample DRIVER-SIDE (the standard IVF recipe —
  // the model is nlist×dim doubles, tiny; what must scale is the
  // assignment and search, and those are broadcast-expression
  // distributed here). nprobe/nlist is the recall-vs-cost dial;
  // nprobe = nlist degrades gracefully to exact brute force.

  /** Train `nlist` centroids with Lloyd iterations over a seeded
    * xxhash64 sample (reproducible across partitionings). Empty
    * clusters keep their previous centroid.
    */
  def trainIvfCentroids(corpus: DataFrame, vecCol: String, nlist: Int,
                        iters: Int = 10, sampleN: Int = 4096,
                        seed: Long = 42): Array[Array[Double]] = {
    val sample = corpus
      .select(VectorOps.asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .orderBy(xxhash64(col("v"), lit(seed)), col("v"))
      .limit(sampleN)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= nlist,
      s"IVF needs >= nlist sample vectors (${sample.length} < $nlist)")
    lloyd(sample, nlist, iters)
  }

  /** Driver-side Lloyd iterations over an in-memory sample — the
    * k-means kernel shared by the IVF quantizer and
    * [[Quantization.trainPq]]'s per-subspace codebooks. Empty clusters
    * keep their previous centroid; init is the first `nlist` sample
    * rows (deterministic — the sample itself is seeded).
    */
  private[operators] def lloyd(sample: Array[Array[Double]], nlist: Int,
                               iters: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    var centroids = sample.take(nlist).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < nlist) {
          var d = 0.0; var t = 0
          while (t < dim) { val x = v(t) - centroids(j)(t); d += x * x; t += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        var t = 0
        while (t < dim) { sums(best)(t) += v(t); t += 1 }
        counts(best) += 1
      }
      centroids = centroids.indices.map { j =>
        if (counts(j) == 0) centroids(j)
        else sums(j).map(_ / counts(j))
      }.toArray
      it += 1
    }
    centroids
  }

  /** -2·v·c + ‖c‖² per centroid — argmin equals nearest-by-L2 (the
    * ‖v‖² term is constant per row). ‖c‖² folds at plan time.
    */
  private[operators] def cellScores(v: Column, centroids: Array[Array[Double]]): Seq[Column] =
    centroids.toSeq.map { c =>
      VectorExpressions.dot(v, typedLit(c.toSeq)) * -2.0 + lit(c.map(x => x * x).sum)
    }

  /** Nearest-cell id for a vector under the trained quantizer. */
  def ivfCell(vec: Column, centroids: Array[Array[Double]]): Column = {
    val scores = array(cellScores(VectorOps.asDouble(vec), centroids): _*)
    (array_position(scores, array_min(scores)) - 1).cast("int")
  }

  /** The `nprobe` nearest cell ids for a vector — sort (score, cell)
    * structs (lexicographic struct order = by score then cell id,
    * deterministic) and keep the first `nprobe`. Shared by [[ivfTopK]]
    * and [[VectorIndex.searchTopK]] so the scan and index probe rules
    * cannot drift (differential-pinned in VectorIndexSpec).
    */
  def ivfProbeCells(vec: Column, centroids: Array[Array[Double]],
                    nprobe: Int): Column =
    transform(
      slice(array_sort(array(
        cellScores(VectorOps.asDouble(vec), centroids).zipWithIndex.map {
          case (s, j) => struct(s.as("s"), lit(j).as("i"))
        }: _*)), 1, nprobe),
      p => p.getField("i"))

  /** IVF ANN top-k: corpus rows live in their nearest cell; each query
    * probes its `nprobe` nearest cells. Output shape matches
    * bruteForceTopK; with nprobe = nlist the result IS the exact
    * brute-force answer (asserted in SimilaritySpec).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              centroids: Array[Array[Double]], nprobe: Int = 2,
              roundTo: Int = 6): DataFrame = {
    val nlist = centroids.length
    require(nprobe >= 1 && nprobe <= nlist, s"nprobe out of range: $nprobe")
    val c = corpus.select(col(idCol).as("n_id"),
      VectorOps.asDouble(col(vecCol)).as("n_v"))
      .withColumn("cell", ivfCell(col("n_v"), centroids))
      .withColumn("n_n", sqrt(VectorOps.normSq(col("n_v"))))
    val qv = queries.select(col(idCol).as("q_id"),
      VectorOps.asDouble(col(vecCol)).as("q_v"))
    val q = qv
      .withColumn("probes", ivfProbeCells(col("q_v"), centroids, nprobe))
      .select(col("q_id"), col("q_v"), explode(col("probes")).as("cell"))
      .withColumn("q_n", sqrt(VectorOps.normSq(col("q_v"))))
    val cand = c.join(broadcast(q), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", round(
        VectorExpressions.dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")),
        roundTo))
    rankTopKPerQuery(cand, k, "q_id", "n_id", "cos")
      .select("q_id", "rank", "n_id", "cos")
  }

  /** LSH-bucketed ANN top-k: candidates limited to the query's bucket,
    * unioned over `tables` independent hash tables (the standard
    * recall dial: recall rises with tables, cost rises linearly;
    * planes shrinks buckets 2x each).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 8, tables: Int = 1, roundTo: Int = 6,
              portable: Boolean = false): DataFrame = {
    def bucketed(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).as(id),
        VectorOps.asDouble(col(vecCol)).as(v),
        array((0 until tables).map(t =>
          struct(lit(t).as("t"),
            (if (portable) lshBucketsPortable(col(vecCol), planes, t)
             else lshBuckets(col(vecCol), planes, t)).as("b"))): _*).as("bks"))
        .select(col(id), col(v), explode(col("bks")).as("bk"))
        .select(col(id), col(v), col("bk.t"), col("bk.b"))
    val q = bucketed(queries, "q_id", "q_v")
      .withColumn("q_n", sqrt(VectorOps.normSq(col("q_v"))))
    val c = bucketed(corpus, "n_id", "n_v")
      .withColumn("n_n", sqrt(VectorOps.normSq(col("n_v"))))
    val scored = c.join(broadcast(q), Seq("t", "b"))
      .filter(col("n_id") =!= col("q_id"))
      .dropDuplicates("q_id", "n_id") // same pair may match in >1 table
      .withColumn("cos", round(
        VectorExpressions.dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")),
        roundTo))
    rankTopKPerQuery(scored, k, "q_id", "n_id", "cos")
      .select("q_id", "rank", "n_id", "cos")
  }
}
