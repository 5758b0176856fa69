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
