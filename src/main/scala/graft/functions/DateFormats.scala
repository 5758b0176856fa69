package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ES named date-format → Spark datetime-pattern translation — the
  * Spark re-expression of eland's date decoding table
  * (elasticsearch_date_to_pandas_date, eland/common.py:106-304, which
  * enumerates the named Elasticsearch formats and epoch variants).
  *
  * Pure functions: a name→pattern table plus a parse helper that
  * handles the two epoch formats (numbers, not patterns) and ES
  * multi-format strings ("format||fallback||..."), which parse with
  * coalesce over the alternatives — same first-match-wins behavior as
  * the reference.
  */
object DateFormats {

  /** Named ES formats → Spark/Java DateTimeFormatter patterns.
    * "strict_" variants share the base pattern (strictness in ES means
    * 4-digit years + zero padding, which these patterns already
    * enforce on the Spark side).
    */
  val esToSpark: Map[String, String] = {
    val base = Map(
      "basic_date"                      -> "yyyyMMdd",
      "basic_date_time"                 -> "yyyyMMdd'T'HHmmss.SSSXX",
      "basic_date_time_no_millis"       -> "yyyyMMdd'T'HHmmssXX",
      "basic_ordinal_date"              -> "yyyyDDD",
      "basic_time"                      -> "HHmmss.SSSXX",
      "basic_time_no_millis"            -> "HHmmssXX",
      "basic_t_time"                    -> "'T'HHmmss.SSSXX",
      "basic_t_time_no_millis"          -> "'T'HHmmssXX",
      "date"                            -> "yyyy-MM-dd",
      "date_hour"                       -> "yyyy-MM-dd'T'HH",
      "date_hour_minute"                -> "yyyy-MM-dd'T'HH:mm",
      "date_hour_minute_second"         -> "yyyy-MM-dd'T'HH:mm:ss",
      "date_hour_minute_second_fraction" -> "yyyy-MM-dd'T'HH:mm:ss.SSS",
      "date_hour_minute_second_millis"  -> "yyyy-MM-dd'T'HH:mm:ss.SSS",
      "date_time"                       -> "yyyy-MM-dd'T'HH:mm:ss.SSSXX",
      "date_time_no_millis"             -> "yyyy-MM-dd'T'HH:mm:ssXX",
      "hour"                            -> "HH",
      "hour_minute"                     -> "HH:mm",
      "hour_minute_second"              -> "HH:mm:ss",
      "hour_minute_second_fraction"     -> "HH:mm:ss.SSS",
      "hour_minute_second_millis"       -> "HH:mm:ss.SSS",
      "ordinal_date"                    -> "yyyy-DDD",
      "time"                            -> "HH:mm:ss.SSSXX",
      "time_no_millis"                  -> "HH:mm:ssXX",
      "t_time"                          -> "'T'HH:mm:ss.SSSXX",
      "t_time_no_millis"                -> "'T'HH:mm:ssXX",
      "year"                            -> "yyyy",
      "year_month"                      -> "yyyy-MM",
      "year_month_day"                  -> "yyyy-MM-dd",
      "date_optional_time"              -> "yyyy-MM-dd['T'HH:mm:ss[.SSS][XX]]")
    base ++ base.map { case (k, v) => s"strict_$k" -> v }
  }

  /** ES ISO week-date formats (Joda `xxxx-'W'ww-e`). Spark 3+'s
    * datetime parser REJECTS week-based pattern letters (Y/w/e) in
    * to_timestamp, so these are computed from first principles:
    * ISO-8601 puts Jan 4 in week 1, so the Monday of week 1 is
    * `jan4 - weekday(jan4)` and the date is
    * `mondayWk1 + (week-1)*7 + (dow-1)` (dow 1=Monday..7=Sunday).
    * Pure Column arithmetic — codegen-friendly, no UDF.
    */
  private val basicWeekRe = "^(\\d{4})W(\\d{2})(\\d)$"
  private val weekRe = "^(\\d{4})-W(\\d{2})-(\\d)$"

  private def parseIsoWeekDate(c: Column, re: String): Column = {
    val y = regexp_extract(c, re, 1).cast("int")
    val w = regexp_extract(c, re, 2).cast("int")
    val dow = regexp_extract(c, re, 3).cast("int")
    val jan4 = make_date(y, lit(1), lit(4))
    val mondayWk1 = date_sub(jan4, weekday(jan4))
    // non-matching rows stay null via the rlike gate (the casts above
    // only evaluate inside the matching CASE branch)
    when(c.rlike(re) && dow.between(1, 7) && w.between(1, 53),
      date_add(mondayWk1, (w - lit(1)) * 7 + (dow - lit(1))).cast("timestamp"))
  }

  private def formatIsoWeekDate(c: Column, basic: Boolean): Column = {
    // ISO week-based year = calendar year of that week's Thursday;
    // Spark's weekofyear is already ISO, weekday is 0=Monday
    val thursday = date_add(c.cast("date"), lit(3) - weekday(c.cast("date")))
    val isoYear = lpad(year(thursday).cast("string"), 4, "0")
    val wk = lpad(weekofyear(c.cast("date")).cast("string"), 2, "0")
    val dow = (weekday(c.cast("date")) + 1).cast("string")
    if (basic) concat(isoYear, lit("W"), wk, dow)
    else concat(isoYear, lit("-W"), wk, lit("-"), dow)
  }

  private val weekNames =
    Set("basic_week_date", "week_date",
      "strict_basic_week_date", "strict_week_date")

  /** Parse a string column carrying an ES-formatted date. Handles:
    * epoch_millis / epoch_second (numeric), a named format (including
    * the week-date family, computed — see [[parseIsoWeekDate]]), a raw
    * Java pattern, or an ES multi-format "a||b||c" (first match wins).
    */
  def parseEsDate(c: Column, esFormat: String): Column = esFormat match {
    case "epoch_millis" => timestamp_millis(c.cast("long"))
    case "epoch_second" => timestamp_seconds(c.cast("long"))
    case f if f.contains("||") =>
      coalesce(f.split("\\|\\|").toSeq.map(one => parseEsDate(c, one.trim)): _*)
    case "basic_week_date" | "strict_basic_week_date" =>
      parseIsoWeekDate(c, basicWeekRe)
    case "week_date" | "strict_week_date" =>
      parseIsoWeekDate(c, weekRe)
    case f =>
      try_to_timestamp(c, lit(esToSpark.getOrElse(f, f)))
  }

  /** Render a timestamp back to an ES named format (for sinks). */
  def formatEsDate(c: Column, esFormat: String): Column = esFormat match {
    case "epoch_millis" => unix_millis(c).cast("string")
    case "epoch_second" => unix_timestamp(c).cast("string")
    case f if weekNames(f) =>
      formatIsoWeekDate(c, basic = f.endsWith("basic_week_date"))
    case f => date_format(c, esToSpark.getOrElse(f, f))
  }

  /** Every named format this module understands (the esToSpark table
    * plus the computed week-date and epoch families).
    */
  val supportedNames: Set[String] =
    esToSpark.keySet ++ weekNames ++ Set("epoch_millis", "epoch_second")
}
