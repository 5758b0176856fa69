package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import java.sql.Timestamp

class DateFormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def parse(v: String, fmt: String): Any = {
    import spark.implicits._
    Seq(v).toDF("s")
      .select(DateFormats.parseEsDate(org.apache.spark.sql.functions.col("s"), fmt))
      .head().get(0)
  }

  test("named formats parse") {
    assert(parse("2024-03-05", "strict_date") ==
      Timestamp.valueOf("2024-03-05 00:00:00"))
    assert(parse("2024-03-05T10:11:12", "strict_date_hour_minute_second") ==
      Timestamp.valueOf("2024-03-05 10:11:12"))
    assert(parse("20240305", "basic_date") ==
      Timestamp.valueOf("2024-03-05 00:00:00"))
    assert(parse("2024-03", "year_month") ==
      Timestamp.valueOf("2024-03-01 00:00:00"))
  }

  test("epoch formats parse numerically") {
    assert(parse("1709633472000", "epoch_millis") ==
      Timestamp.valueOf("2024-03-05 10:11:12"))
    assert(parse("1709633472", "epoch_second") ==
      Timestamp.valueOf("2024-03-05 10:11:12"))
  }

  test("multi-format first-match-wins like ES ||") {
    val fmt = "strict_date_hour_minute_second||strict_date"
    assert(parse("2024-03-05T10:11:12", fmt) ==
      Timestamp.valueOf("2024-03-05 10:11:12"))
    assert(parse("2024-03-05", fmt) ==
      Timestamp.valueOf("2024-03-05 00:00:00"))
  }

  test("unparseable input yields null, not an error") {
    assert(parse("not-a-date", "strict_date") == null)
  }

  test("ISO week-date formats parse (Spark rejects Y/w/e patterns; computed instead)") {
    // 2024-01-04 is Thursday => Monday of W01 is 2024-01-01;
    // W10-2 (Tuesday) = 2024-01-01 + 9*7 + 1 = 2024-03-05
    assert(parse("2024-W10-2", "week_date") ==
      Timestamp.valueOf("2024-03-05 00:00:00"))
    assert(parse("2024W102", "basic_week_date") ==
      Timestamp.valueOf("2024-03-05 00:00:00"))
    assert(parse("2024-W10-2", "strict_week_date") ==
      Timestamp.valueOf("2024-03-05 00:00:00"))
    // 2021-01-04 is Monday; W01-1 IS Jan 4 (2021-01-01 falls in 2020-W53)
    assert(parse("2021-W01-1", "week_date") ==
      Timestamp.valueOf("2021-01-04 00:00:00"))
    // day-of-week out of ISO range -> null, not garbage
    assert(parse("2024-W10-8", "week_date") == null)
    assert(parse("garbage", "week_date") == null)
  }

  test("week-date-time family parses time, millis, and offsets") {
    assert(parse("2024-W10-2T10:11:12", "week_date_time_no_millis") ==
      Timestamp.valueOf("2024-03-05 10:11:12"))
    assert(parse("2024-W10-2T10:11:12.500", "week_date_time") ==
      Timestamp.valueOf("2024-03-05 10:11:12.5"))
    assert(parse("2024-W10-2T10:11:12.500Z", "strict_week_date_time") ==
      Timestamp.valueOf("2024-03-05 10:11:12.5"))
    // +02:00 offset: UTC instant is two hours earlier
    assert(parse("2024-W10-2T10:11:12+02:00", "week_date_time_no_millis") ==
      Timestamp.valueOf("2024-03-05 08:11:12"))
    assert(parse("2024W102T101112.250-0130", "basic_week_date_time") ==
      Timestamp.valueOf("2024-03-05 11:41:12.25"))
    assert(parse("2024W102T101112", "basic_week_date_time_no_millis") ==
      Timestamp.valueOf("2024-03-05 10:11:12"))
    // weekyear family: ISO defaults (week 1, Monday)
    assert(parse("2024", "weekyear") ==
      Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(parse("2024-W10", "weekyear_week") ==
      Timestamp.valueOf("2024-03-04 00:00:00"))
    assert(parse("2024-W10-2", "strict_weekyear_week_day") ==
      Timestamp.valueOf("2024-03-05 00:00:00"))
  }

  test("week 53 is rejected in 52-week ISO years, accepted in 53-week years") {
    assert(parse("2024-W53-1", "strict_week_date") == null) // 2024 has 52 weeks
    assert(parse("2020-W53-5", "week_date") ==              // 2020 has 53
      Timestamp.valueOf("2021-01-01 00:00:00"))
  }

  test("explicit offsets pin absolute instants regardless of session timezone") {
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // 2024-03-05T10:11:12+02:00 == 2024-03-05T08:11:12Z, an absolute
      // instant — the session timezone must not shift it
      val got = parse("2024-W10-2T10:11:12+02:00", "week_date_time_no_millis")
      val want = parse("1709626272", "epoch_second")
      assert(got == want)
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("ordinal date-time formats parse") {
    assert(parse("2024-065T10:11:12", "ordinal_date_time_no_millis") ==
      Timestamp.valueOf("2024-03-05 10:11:12"))
    assert(parse("2024065T101112", "basic_ordinal_date_time_no_millis") ==
      Timestamp.valueOf("2024-03-05 10:11:12"))
  }

  test("week-date round-trips through formatEsDate, incl. year boundary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def roundTrip(s: String, fmt: String): String =
      Seq(s).toDF("s").select(DateFormats.formatEsDate(
        DateFormats.parseEsDate(col("s"), fmt), fmt).as("r"))
        .head().getString(0)
    assert(roundTrip("2024-W10-2", "week_date") == "2024-W10-2")
    assert(roundTrip("2024W102", "basic_week_date") == "2024W102")
    // 2019-12-30 (Monday) is ISO 2020-W01-1: week-based year != calendar year
    assert(roundTrip("2020-W01-1", "week_date") == "2020-W01-1")
    val wd = Seq("2019-12-30").toDF("s")
      .select(DateFormats.formatEsDate(
        DateFormats.parseEsDate(col("s"), "strict_date"), "week_date").as("r"))
      .head().getString(0)
    assert(wd == "2020-W01-1")
  }

  test("round-trip through formatEsDate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Seq("2024-03-05T10:11:12").toDF("s")
      .select(DateFormats.formatEsDate(
        DateFormats.parseEsDate(col("s"), "strict_date_hour_minute_second"),
        "strict_date_hour_minute_second").as("r"))
      .head().getString(0)
    assert(out == "2024-03-05T10:11:12")
  }
}
