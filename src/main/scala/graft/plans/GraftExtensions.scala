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

  private def qTokens(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[String] = {
    require(e.foldable, "query argument must be a literal string")
    graft.functions.TextAnalysis.tokensOf(String.valueOf(e.eval()))
  }

  /** Register on a live session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => VectorExpressions.CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => VectorExpressions.DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_match_any",
      exprs => TokenMatch(exprs(0), qTokens(exprs(1)), matchAll = false), "built-in")
    reg.createOrReplaceTempFunction("graft_match_all",
      exprs => TokenMatch(exprs(0), qTokens(exprs(1)), matchAll = true), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64",
      exprs => TokenSimHash(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      exprs => TokenMinHash(exprs(0), litInt(exprs(1)), litInt(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_portable",
      exprs => TokenMinHashPortable(exprs(0), litInt(exprs(1)),
        litInt(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      exprs => TokenShingleHashes(exprs(0), litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_sorted_intersect",
      exprs => VectorExpressions.SortedIntersectCount(exprs(0), exprs(1)), "built-in")
  }

  private def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    require(e.foldable, "argument must be an integer literal")
    e.eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(s"not an int: $other")
    }
  }
}
