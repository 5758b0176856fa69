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
}
