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

  /** The minimal-English-stemmer rules
    * ([[graft.functions.EnglishMinimalStem]]: Harman's S-stemmer in
    * Lucene's `minimal_english` rule order) as DuckDB SQL over a token
    * expression — pure CASE + ends_with + substr string rewriting, so
    * the g23/idx9 oracles replay the analysis chain verbatim. One line
    * (no margin chars) so it embeds inside stripMargin SQL safely.
    */
  def stemSql(t: String): String =
    s"(CASE WHEN length($t) < 3 OR NOT ends_with($t, 's') THEN $t " +
      s"WHEN ends_with($t, 'us') OR ends_with($t, 'ss') THEN $t " +
      s"WHEN ends_with($t, 'ies') AND length($t) > 3 " +
      s"AND NOT ends_with($t, 'aies') AND NOT ends_with($t, 'eies') " +
      s"THEN substr($t, 1, length($t) - 3) || 'y' " +
      s"WHEN ends_with($t, 'ies') OR ends_with($t, 'aes') " +
      s"OR ends_with($t, 'oes') OR ends_with($t, 'ees') THEN $t " +
      s"ELSE substr($t, 1, length($t) - 1) END)"

  /** [[graft.functions.Geo.haversineMeters]] mirrored
    * operation-for-operation as DuckDB SQL (the literal 12742000.0 is
    * the plan-time-folded 2·R of the Column tree). See the Geo
    * float-discipline note: compare raw against a radius, round
    * exported values no finer than ~1 m.
    */
  def haversineSqlMeters(lat1: String, lon1: String,
                         lat2: String, lon2: String): String =
    s"(12742000.0 * asin(sqrt(least(" +
      s"sin(radians(($lat2) - ($lat1)) / 2) * " +
      s"sin(radians(($lat2) - ($lat1)) / 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * " +
      s"sin(radians(($lon2) - ($lon1)) / 2) * " +
      s"sin(radians(($lon2) - ($lon1)) / 2), 1.0))))"

  /** Shared g23/idx9 stemming fixture: the documents text plus a
    * doc_id-keyed suffix exercising every stemmer rule — "stories
    * queries" (ies→y; "query" merges with the corpus word), "dogs
    * boxes" (plain drop-s; es-fallthrough drop-s), "glass virus" (the
    * ss/us unchanged rules), "knees aies" (the ees / a-before-ies
    * unchanged rules, which also catch an OVER-stemming
    * implementation). The corpus itself has no s-final tokens (31
    * singular words), so the suffix is what makes doc-side analysis
    * observable — the dd2/mmdd derived-fixture discipline.
    */
  def stemFixtureText(textCol: Column, idCol: Column): Column =
    concat(textCol, lit(" "),
      element_at(
        array(lit("stories queries"), lit("dogs boxes"),
          lit("glass virus"), lit("knees aies")),
        (idCol % 4 + 1).cast("int")))

  /** The same derived table as DuckDB SQL (FROM documents). */
  val stemFixtureSql: String =
    "SELECT doc_id, text || ' ' || CASE CAST(doc_id % 4 AS INT) " +
      "WHEN 0 THEN 'stories queries' WHEN 1 THEN 'dogs boxes' " +
      "WHEN 2 THEN 'glass virus' ELSE 'knees aies' END AS text " +
      "FROM documents"
}
