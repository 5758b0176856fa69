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

  /** Deterministic pseudo-random hyperplane component in [-1, 1). */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000L)).cast("double") / 1000.0) - 1.0

  /** Signed projection of `vec` onto deterministic hyperplane `plane`. */
  private def projection(vec: Column, plane: Int): Column =
    aggregate(
      zip_with(VectorOps.asDouble(vec),
        sequence(lit(0), size(vec) - 1),
        (x, i) => x * planeComponent(plane, i)),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane LSH bucket id (0 until 2^planes). `table`
    * selects an independent plane set for multi-table LSH.
    */
  def lshBuckets(vec: Column, planes: Int, table: Int = 0): Column =
    (0 until planes).map { p =>
      when(projection(vec, table * 4096 + p) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

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
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /** LSH-bucketed ANN top-k: candidates limited to the query's bucket,
    * unioned over `tables` independent hash tables (the standard
    * recall dial: recall rises with tables, cost rises linearly;
    * planes shrinks buckets 2x each).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 8, tables: Int = 1, roundTo: Int = 6): DataFrame = {
    def bucketed(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).as(id),
        VectorOps.asDouble(col(vecCol)).as(v),
        array((0 until tables).map(t =>
          struct(lit(t).as("t"),
            lshBuckets(col(vecCol), planes, t).as("b"))): _*).as("bks"))
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
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }
}
