package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable rounding for oracle-compared outputs.
  *
  * Spark's round() decimal-rescales the shortest string repr with
  * HALF_UP; DuckDB's multiplies and rounds half-even. On decimal-clean
  * data (prices with 2 decimals), averages land EXACTLY on tie points
  * (x.xxxx5) and the two rules systematically disagree. Emitting the
  * identical floor-based expression on both sides makes the comparison
  * deterministic whenever the input doubles agree bitwise.
  */
object QueryUtil {

  private def p10(scale: Int): Double = math.pow(10.0, scale)

  /** floor(x * 10^s + 0.5) / 10^s — half-up via explicit IEEE ops. */
  def rhu(c: Column, scale: Int): Column =
    floor(c * p10(scale) + 0.5) / p10(scale)

  /** The same expression as DuckDB SQL text. */
  def rhuSql(e: String, scale: Int): String = {
    val m = BigDecimal(p10(scale)).toBigInt.toString
    s"floor(($e) * $m + 0.5) / $m.0"
  }
}
