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
      "basic_ordinal_date_time"         -> "yyyyDDD'T'HHmmss.SSSXX",
      "basic_ordinal_date_time_no_millis" -> "yyyyDDD'T'HHmmssXX",
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
      "ordinal_date_time"               -> "yyyy-DDD'T'HH:mm:ss.SSSXX",
      "ordinal_date_time_no_millis"     -> "yyyy-DDD'T'HH:mm:ssXX",
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

  /** ES ISO week-date family (Joda `xxxx-'W'ww-e['T'HH:mm:ss.SSSZZ]`
    * and friends). Spark 3+'s datetime parser REJECTS week-based
    * pattern letters (Y/x/w/e) in to_timestamp, so these are computed
    * from first principles: ISO-8601 puts Jan 4 in week 1, so the
    * Monday of week 1 is `jan4 - weekday(jan4)` and the date is
    * `mondayWk1 + (week-1)*7 + (dow-1)` (dow 1=Monday..7=Sunday);
    * time-of-day and a Z / ±hh:mm offset are added as micros. Pure
    * Column arithmetic — codegen-friendly, no UDF.
    *
    * `week`/`day`/`time`/`frac`/`off` give the regex group index of
    * each optional component (None = component absent, ISO defaults:
    * week 1, Monday, midnight, UTC).
    */
  private def parseWeekFamily(c: Column, re: String,
      week: Option[Int] = None, day: Option[Int] = None,
      time: Option[(Int, Int, Int)] = None,
      frac: Option[Int] = None, off: Option[Int] = None): Column = {
    val y = regexp_extract(c, re, 1).cast("int")
    val w = week.map(i => regexp_extract(c, re, i).cast("int")).getOrElse(lit(1))
    val d = day.map(i => regexp_extract(c, re, i).cast("int")).getOrElse(lit(1))
    val (hh, mm, ss) = time.map { case (a, b, s) =>
      (regexp_extract(c, re, a).cast("int"),
        regexp_extract(c, re, b).cast("int"),
        regexp_extract(c, re, s).cast("int"))
    }.getOrElse((lit(0), lit(0), lit(0)))
    val ms = frac.map { i =>
      val digits = regexp_replace(regexp_extract(c, re, i), "\\.", "")
      when(digits === "", 0)
        .otherwise(substring(rpad(digits, 3, "0"), 1, 3).cast("int"))
    }.getOrElse(lit(0))
    val offStr = off.map(i => regexp_extract(c, re, i)).getOrElse(lit(""))
    val offMin = {
      val g = regexp_replace(offStr, ":", "")
      when(g === "" || g === "Z", 0).otherwise(
        when(substring(g, 1, 1) === "-", -1).otherwise(1) *
          (substring(g, 2, 2).cast("int") * 60 + substring(g, 4, 2).cast("int")))
    }
    val jan4 = make_date(y, lit(1), lit(4))
    val mondayWk1 = date_sub(jan4, weekday(jan4))
    val dayDate = date_add(mondayWk1, (w - lit(1)) * 7 + (d - lit(1)))
    // strict validity: week 53 exists only in 53-week ISO years — the
    // requested week-year must equal the computed date's ISO week-year
    // (the year of its week's Thursday), else null like a Joda strict
    // parser
    val validWeek = year(date_add(dayDate, lit(3) - weekday(dayDate))) === y
    // Timezone anchoring: an EXPLICIT offset pins an absolute instant
    // (wall clock at that offset), computed from the UTC day number —
    // session timezone must not leak in. WITHOUT an offset the wall
    // clock is session-local, built with make_timestamp so DST rules
    // apply — matching to_timestamp's behavior for offset-less
    // patterns elsewhere in this module.
    val utcInstant = timestamp_micros(
      unix_date(dayDate).cast("long") * 86400000000L +
        (hh * 3600L + mm * 60L + ss - offMin * 60L).cast("long") * 1000000L +
        ms.cast("long") * 1000L)
    val localTs = make_timestamp(
      year(dayDate), month(dayDate), dayofmonth(dayDate),
      hh, mm, (ss + ms.cast("double") / 1000.0).cast("decimal(16,6)"))
    val ts = when(offStr === "", localTs).otherwise(utcInstant)
    // non-matching rows stay null via the rlike gate (the casts above
    // only evaluate inside the matching CASE branch)
    when(c.rlike(re) && d.between(1, 7) && w.between(1, 53) && validWeek, ts)
  }

  // ISO week-based year = calendar year of that week's Thursday;
  // Spark's weekofyear is already ISO, weekday is 0=Monday
  private def isoWeekYear(c: Column): Column = {
    val thursday = date_add(c.cast("date"), lit(3) - weekday(c.cast("date")))
    lpad(year(thursday).cast("string"), 4, "0")
  }
  private def isoWeek(c: Column): Column =
    lpad(weekofyear(c.cast("date")).cast("string"), 2, "0")
  private def isoDow(c: Column): Column =
    (weekday(c.cast("date")) + 1).cast("string")

  private def formatIsoWeekDate(c: Column, basic: Boolean): Column =
    if (basic) concat(isoWeekYear(c), lit("W"), isoWeek(c), isoDow(c))
    else concat(isoWeekYear(c), lit("-W"), isoWeek(c), lit("-"), isoDow(c))

  /** The week-based names handled by the computed path (Spark's parser
    * cannot express them).
    */
  private val weekFamilyBase = Set(
    "basic_week_date", "basic_week_date_time", "basic_week_date_time_no_millis",
    "week_date", "week_date_time", "week_date_time_no_millis",
    "weekyear", "weekyear_week", "weekyear_week_day")
  private val weekNames = weekFamilyBase ++ weekFamilyBase.map("strict_" + _)

  private def stripStrict(f: String): String = f.stripPrefix("strict_")

  private def parseWeekName(c: Column, name: String): Column =
    stripStrict(name) match {
      case "weekyear" =>
        parseWeekFamily(c, "^(\\d{4})$")
      case "weekyear_week" =>
        parseWeekFamily(c, "^(\\d{4})-W(\\d{2})$", week = Some(2))
      case "weekyear_week_day" | "week_date" =>
        parseWeekFamily(c, "^(\\d{4})-W(\\d{2})-(\\d)$",
          week = Some(2), day = Some(3))
      case "basic_week_date" =>
        parseWeekFamily(c, "^(\\d{4})W(\\d{2})(\\d)$",
          week = Some(2), day = Some(3))
      case "week_date_time" =>
        parseWeekFamily(c,
          "^(\\d{4})-W(\\d{2})-(\\d)T(\\d{2}):(\\d{2}):(\\d{2})(\\.\\d{1,9})?(Z|[+-]\\d{2}:?\\d{2})?$",
          week = Some(2), day = Some(3), time = Some((4, 5, 6)),
          frac = Some(7), off = Some(8))
      case "week_date_time_no_millis" =>
        parseWeekFamily(c,
          "^(\\d{4})-W(\\d{2})-(\\d)T(\\d{2}):(\\d{2}):(\\d{2})(Z|[+-]\\d{2}:?\\d{2})?$",
          week = Some(2), day = Some(3), time = Some((4, 5, 6)), off = Some(7))
      case "basic_week_date_time" =>
        parseWeekFamily(c,
          "^(\\d{4})W(\\d{2})(\\d)T(\\d{2})(\\d{2})(\\d{2})(\\.\\d{1,9})?(Z|[+-]\\d{2}:?\\d{2})?$",
          week = Some(2), day = Some(3), time = Some((4, 5, 6)),
          frac = Some(7), off = Some(8))
      case "basic_week_date_time_no_millis" =>
        parseWeekFamily(c,
          "^(\\d{4})W(\\d{2})(\\d)T(\\d{2})(\\d{2})(\\d{2})(Z|[+-]\\d{2}:?\\d{2})?$",
          week = Some(2), day = Some(3), time = Some((4, 5, 6)), off = Some(7))
    }

  private def formatWeekName(c: Column, name: String): Column =
    stripStrict(name) match {
      case "weekyear"      => isoWeekYear(c)
      case "weekyear_week" => concat(isoWeekYear(c), lit("-W"), isoWeek(c))
      case "weekyear_week_day" | "week_date" => formatIsoWeekDate(c, basic = false)
      case "basic_week_date"                 => formatIsoWeekDate(c, basic = true)
      case "week_date_time" =>
        concat(formatIsoWeekDate(c, basic = false), lit("T"),
          date_format(c, "HH:mm:ss.SSSXX"))
      case "week_date_time_no_millis" =>
        concat(formatIsoWeekDate(c, basic = false), lit("T"),
          date_format(c, "HH:mm:ssXX"))
      case "basic_week_date_time" =>
        concat(formatIsoWeekDate(c, basic = true), lit("T"),
          date_format(c, "HHmmss.SSSXX"))
      case "basic_week_date_time_no_millis" =>
        concat(formatIsoWeekDate(c, basic = true), lit("T"),
          date_format(c, "HHmmssXX"))
    }

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
    case f if weekNames(f) => parseWeekName(c, f)
    case f =>
      // named formats: the trailing offset is optional on parse (ES
      // accepts both "…ss" and "…ssZ"); raw user patterns pass through
      val p = esToSpark.get(f).map(_.replace("XX", "[XX]")).getOrElse(f)
      try_to_timestamp(c, lit(p))
  }

  /** Render a timestamp back to an ES named format (for sinks). */
  def formatEsDate(c: Column, esFormat: String): Column = esFormat match {
    case "epoch_millis" => unix_millis(c).cast("string")
    case "epoch_second" => unix_timestamp(c).cast("string")
    case f if weekNames(f) => formatWeekName(c, f)
    case f => date_format(c, esToSpark.getOrElse(f, f))
  }

  /** Every named format this module understands (the esToSpark table
    * plus the computed week-date and epoch families).
    */
  val supportedNames: Set[String] =
    esToSpark.keySet ++ weekNames ++ Set("epoch_millis", "epoch_second")
}
