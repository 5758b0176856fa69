package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions registration for graft's native expressions,
  * so SQL users get them too:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT graft_cosine(a.v, b.v) FROM ...")
  *
  * `register(spark)` does the same on an already-built session via the
  * function registry (handy in tests/notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[VectorExpressions.CosineSimilarity].getName,
        "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorExpressions.CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[VectorExpressions.DotProduct].getName,
        "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorExpressions.DotProduct(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  /** Register on a live session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => VectorExpressions.CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => VectorExpressions.DotProduct(exprs(0), exprs(1)),
      "built-in")
  }
}
