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
