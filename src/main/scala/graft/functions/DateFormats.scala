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
      "basic_week_date"                 -> "YYYY'W'wwe",
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
      "week_date"                       -> "YYYY-'W'ww-e",
      "year"                            -> "yyyy",
      "year_month"                      -> "yyyy-MM",
      "year_month_day"                  -> "yyyy-MM-dd",
      "date_optional_time"              -> "yyyy-MM-dd['T'HH:mm:ss[.SSS][XX]]")
    base ++ base.map { case (k, v) => s"strict_$k" -> v }
  }

  /** Parse a string column carrying an ES-formatted date. Handles:
    * epoch_millis / epoch_second (numeric), a named format, a raw
    * Java pattern, or an ES multi-format "a||b||c" (first match wins).
    */
  def parseEsDate(c: Column, esFormat: String): Column = esFormat match {
    case "epoch_millis" => timestamp_millis(c.cast("long"))
    case "epoch_second" => timestamp_seconds(c.cast("long"))
    case f if f.contains("||") =>
      coalesce(f.split("\\|\\|").toSeq.map(one => parseEsDate(c, one.trim)): _*)
    case f =>
      try_to_timestamp(c, lit(esToSpark.getOrElse(f, f)))
  }

  /** Render a timestamp back to an ES named format (for sinks). */
  def formatEsDate(c: Column, esFormat: String): Column = esFormat match {
    case "epoch_millis" => unix_millis(c).cast("string")
    case "epoch_second" => unix_timestamp(c).cast("string")
    case f => date_format(c, esToSpark.getOrElse(f, f))
  }
}
