package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns,
  * expressed with higher-order functions (`zip_with`/`aggregate`) so
  * they run inside codegen with no UDF boundary.
  *
  * All math is done in double: the inputs are float32 embeddings, and
  * accumulating in float both loses precision and diverges from every
  * SQL oracle, so elements are cast once up front.
  */
object VectorOps {

  /** numeric array → array<double>, cast once before any arithmetic.
    * A direct array cast, NOT `transform(v, _.cast("double"))`: Cast
    * is whole-stage-codegen'd while ArrayTransform is an interpreted
    * lambda per element — and this sits under every dot/cosine on the
    * full corpus, so the difference is a per-row tax at scale. Same
    * semantics (element-wise cast, null-preserving, no-op on
    * array<double> input — SimplifyCasts removes it).
    */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Left-to-right sequential sum — same accumulation order as SQL
    * engines' list folds, so cross-engine comparisons are bit-stable.
    */
  private def suml(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    suml(zip_with(asDouble(a), asDouble(b), (x, y) => x * y))

  def normSq(a: Column): Column = {
    val d = asDouble(a)
    suml(zip_with(d, d, (x, y) => x * y))
  }

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  def l2Dist(a: Column, b: Column): Column =
    sqrt(suml(zip_with(asDouble(a), asDouble(b),
      (x, y) => (x - y) * (x - y))))

  /** Matryoshka-style truncation: keep the first `d` dimensions. Pair
    * with a renormalize-or-not decision at the call site: cosine over
    * truncated vectors needs NO renormalization (it divides by the
    * truncated norms anyway), so prefer searching the raw prefix and
    * renormalizing only when a downstream consumer expects unit
    * vectors. A 64→16 truncation is a 4× scan/storage cut on top of
    * whatever quantization already bought.
    */
  def truncate(v: Column, d: Int): Column = slice(asDouble(v), 1, d)

  /** [[truncate]] + L2-renormalize (unit-length prefix), null-safe on
    * zero vectors (returns the zero prefix unchanged).
    *
    * NOTE the divisor is an aggregate nested under the per-element
    * lambda (interpreted HOFs re-evaluate it per element — the arr1
    * rule), so in hot pipelines stage the truncated column and its
    * norm in their own projections, or search the raw prefix with
    * cosine (which needs no renormalization at all, as emb3 does).
    */
  def truncateNormalize(v: Column, d: Int): Column = {
    val t = truncate(v, d)
    val n = sqrt(suml(zip_with(t, t, (x, y) => x * y)))
    when(n > 0.0, transform(t, x => x / n)).otherwise(t)
  }
}
