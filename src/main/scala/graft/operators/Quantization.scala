package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector symmetric int8 quantization for embedding corpora — the
  * standard storage layout for ANN at 100 TB scale: a float32 embedding
  * column shrinks 4× (plus one double scale per vector), which is the
  * difference between an embedding table that fits executor memory and
  * one that spills.
  *
  * Scheme: `scale = max|v| / 127`; `q_i = floor(v_i/scale + 0.5)` (an
  * explicit floor-based half-up — spelled identically in the DuckDB
  * oracle, so the quantization decision is engine-replayable; a bare
  * `round` would hit the half-up vs half-even divergence). By
  * construction every |q_i| <= 127, so the values fit int8 even though
  * Spark stores them as array<int> (Spark has no int8 array element
  * narrower than byte via tungsten arrays; the PARQUET encoding of
  * small ints is bit-packed anyway, which is where the 4× lives).
  *
  * Search path needs NO dequantization for cosine: cosine is
  * scale-invariant (`cos(s·q, x) = cos(q, x)` for s > 0), so quantized
  * search is the codegen [[graft.plans.VectorExpressions.cosine]]
  * kernel directly over the int arrays — zero interpreted work per
  * candidate. Dot/L2 users multiply the codegen dot by `scale` (one
  * scalar op per pair, not per element).
  *
  * The encode pass uses interpreted HOF transforms — acceptable
  * because encode is the one-shot WRITE path (O(corpus) once at
  * ingest, amortized over every query thereafter); the per-query hot
  * path is fully codegen.
  */
object Quantization {

  /** Per-vector quantization step: `max|v| / 127`; 0 for an all-zero
    * or empty vector (callers treat scale=0 as "not quantizable").
    */
  def int8Scale(vec: Column): Column =
    coalesce(array_max(transform(vec, x => abs(x))), lit(0.0)) / lit(127.0)

  /** Quantize with an explicit floor-based half-up; requires
    * scale > 0. |q_i| <= 127 by construction (the max element maps to
    * floor(127.5) = 127, the min to floor(-127 + 0.5) = -127).
    */
  def int8Quantize(vec: Column, scale: Column): Column =
    transform(vec, x => floor(x / scale + lit(0.5)).cast("int"))

  /** Inverse map (for dot/L2 consumers and for auditing the
    * quantization error; cosine consumers skip it — scale-invariance).
    */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Encode a frame's vector column: (idCol, scale, q). Zero/empty
    * vectors (scale = 0) are dropped — they have no direction, so no
    * cosine consumer can use them, and keeping them would force every
    * downstream join to re-guard against a null cosine.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).as("_v"))
      .withColumn("scale", int8Scale(col("_v")))
      .where(col("scale") > 0)
      // scale is materialized as its own projection alias above, so
      // the quantize lambda reads a column, not a re-derived subtree
      .select(col(idCol), col("scale"),
        int8Quantize(col("_v"), col("scale")).as("q"))

  // ---- Product quantization (Jégou et al., TPAMI'11) ---------------
  // The next rung past int8 on the ANN storage ladder: a D-dim float
  // vector becomes m small codes (one per D/m-dim subspace, each the
  // id of its nearest codebook centroid) — 64-dim float32 at m=8 is a
  // 32× cut. Search is ASYMMETRIC (ADC): the query stays exact, each
  // corpus row's approximate distance is m table lookups into the
  // query's precomputed per-subspace distance tables, and the corpus
  // VECTORS are never read — only the code rows. A two-stage search
  // re-ranks the ADC candidates by exact cosine, so recall is a dial
  // (candidates) and candidates = corpus degrades to exact brute
  // force (the oracle-gated configuration, the sim3/vx1 discipline).

  /** m codebooks of ksub centroids over D/m-dim subspaces. Driver-side
    * by design — m × ksub × dsub doubles, the whole model; what must
    * scale is encode and search, and those run as expressions.
    */
  final case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks.head.length
    def dsub: Int = codebooks.head.head.length
  }

  /** Train per-subspace codebooks with Lloyd iterations over ONE
    * seeded xxhash64 sample (a single corpus scan feeds all m
    * subspaces — [[Similarity.trainIvfCentroids]]'s sampling with
    * [[Similarity.lloyd]] run m times locally).
    */
  def trainPq(corpus: DataFrame, vecCol: String, m: Int = 8,
              ksub: Int = 16, iters: Int = 10, sampleN: Int = 4096,
              seed: Long = 42): PqModel = {
    require(m >= 1 && ksub >= 1)
    val sample = corpus
      .select(graft.functions.VectorOps.asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .orderBy(xxhash64(col("v"), lit(seed)), col("v"))
      .limit(sampleN)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= ksub,
      s"PQ needs >= ksub sample vectors (${sample.length} < $ksub)")
    val d = sample.head.length
    require(d % m == 0, s"dim $d is not divisible by m = $m subspaces")
    val dsub = d / m
    PqModel((0 until m).map { j =>
      Similarity.lloyd(sample.map(v => v.slice(j * dsub, (j + 1) * dsub)),
        ksub, iters)
    }.toArray)
  }

  /** The m nearest-centroid codes of a vector (array<int>, one per
    * subspace) — [[Similarity.ivfCell]] per subvector slice, so the
    * assignment rule is shared with the IVF family.
    */
  def pqEncode(vec: Column, model: PqModel): Column = {
    val v = graft.functions.VectorOps.asDouble(vec)
    array((0 until model.m).map { j =>
      Similarity.ivfCell(slice(v, j * model.dsub + 1, model.dsub),
        model.codebooks(j))
    }: _*)
  }

  /** Materialize a corpus's code table: (idCol, codes). This is what
    * ADC search scans — ~m small ints per row instead of the vectors.
    */
  def pqEncodeFrame(df: DataFrame, idCol: String, vecCol: String,
                    model: PqModel): DataFrame =
    df.select(col(idCol), pqEncode(col(vecCol), model).as("codes"))

  /** Two-stage PQ top-k. Stage 1 scans ONLY `codes`: each query's
    * per-subspace squared-distance tables (m × ksub doubles, computed
    * driver-side from the collected query frame — the modest-query
    * contract of every search face here) enter as literals, a corpus
    * row's approximate distance is m `element_at` lookups, and the
    * two-phase ranking keeps `candidates` per query. Stage 2 joins
    * only those candidates back to `corpus` and re-ranks by exact
    * cosine (6-dp rounding, id ties). Output (q_id, rank, idColName,
    * cos) — with `candidates` ≥ corpus size this IS exact brute
    * force. Query and corpus ids must be long-castable.
    *
    * The modest-query-frame contract is ENFORCED: the frame collects
    * to ≤ `maxQueries` rows (the collect itself is `limit`-bounded, so
    * an oversized frame fails loudly instead of OOM-ing the driver or
    * baking a megabyte-scale literal plan). Raise `maxQueries`
    * deliberately for a bigger batch, or split the frame; an
    * unbounded workload belongs on the non-ADC exact path
    * ([[graft.operators.VectorIndex.searchTopK]]), whose queries ride
    * a broadcast join instead of plan literals.
    */
  def pqSearchTopK(queries: DataFrame, codes: DataFrame, corpus: DataFrame,
                   idCol: String, vecCol: String, k: Int, model: PqModel,
                   candidates: Int, roundTo: Int = 6,
                   maxQueries: Int = 1024): DataFrame = {
    require(k >= 1 && candidates >= k,
      s"candidates ($candidates) must be >= k ($k)")
    require(maxQueries >= 1, s"maxQueries must be positive, got $maxQueries")
    val qRows = queries.select(col(idCol).cast("long").as("q_id"),
        graft.functions.VectorOps.asDouble(col(vecCol)).as("q_v"))
      .limit(maxQueries + 1)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(qRows.length <= maxQueries,
      s"ADC search bakes per-query distance tables into the plan as " +
        s"literals, so the query frame collects driver-side — more than " +
        s"$maxQueries queries refused (raise maxQueries deliberately, " +
        "split the frame, or use the broadcast-joined searchTopK path)")
    require(qRows.nonEmpty, "empty query frame")
    val m = model.m; val dsub = model.dsub
    // per (query, subspace): ksub squared distances from the exact
    // query subvector to each centroid — the ADC lookup tables
    val tables: Array[Array[Array[Double]]] = qRows.map { case (_, qv) =>
      Array.tabulate(m) { j =>
        Array.tabulate(model.ksub) { c =>
          var s = 0.0; var t = 0
          while (t < dsub) {
            val x = qv(j * dsub + t) - model.codebooks(j)(c)(t)
            s += x * x; t += 1
          }
          s
        }
      }
    }
    val adcPerQuery = tables.map { tq =>
      (0 until m).map(j =>
        element_at(typedLit(tq(j).toSeq),
          element_at(col("codes"), j + 1) + 1))
        .reduce(_ + _)
    }
    val qIds = typedLit(qRows.map(_._1).toSeq)
    val stage1 = codes
      .select(col(idCol),
        posexplode(array(adcPerQuery.toIndexedSeq: _*))
          .as(Seq("_qi", "_adc")))
      .withColumn("q_id", element_at(qIds, col("_qi") + 1))
      // rankTopKPerQuery ranks DESC; ADC is a distance — negate
      .withColumn("_neg_adc", -col("_adc"))
    val cand = Similarity
      .rankTopKPerQuery(stage1, candidates, "q_id", idCol, "_neg_adc")
      .select(col("q_id"), col(idCol))
    val qFrame = queries.sparkSession.createDataFrame(
        qRows.toSeq.map { case (id, v) => (id, v.toSeq) })
      .toDF("q_id", "q_v")
      .withColumn("q_n", sqrt(graft.functions.VectorOps.normSq(col("q_v"))))
    val c = corpus.select(col(idCol),
        graft.functions.VectorOps.asDouble(col(vecCol)).as("n_v"))
      .withColumn("n_n", sqrt(graft.functions.VectorOps.normSq(col("n_v"))))
    val exact = cand.join(c, Seq(idCol)).join(broadcast(qFrame), Seq("q_id"))
      .withColumn("cos", round(
        graft.plans.VectorExpressions.dot(col("q_v"), col("n_v")) /
          (col("q_n") * col("n_n")), roundTo))
    Similarity.rankTopKPerQuery(exact, k, "q_id", idCol, "cos")
      .select(col("q_id"), col("rank"), col(idCol), col("cos"))
  }

  /** Max absolute reconstruction error of a quantized corpus — the
    * audit metric for "is int8 enough for this embedding family".
    * Bounded by scale/2 per element; one number to the driver.
    */
  def reconstructionError(encoded: DataFrame, original: DataFrame,
                          idCol: String, vecCol: String): DataFrame = {
    val deq = encoded.select(col(idCol), dequantize(col("q"), col("scale")).as("dq"))
    original.select(col(idCol), col(vecCol).as("v"))
      .join(deq, Seq(idCol))
      .select(col(idCol),
        array_max(zip_with(col("v"), col("dq"),
          (a, b) => abs(a - b))).as("max_abs_err"))
      .agg(max(col("max_abs_err")).as("max_abs_err"))
  }
}
