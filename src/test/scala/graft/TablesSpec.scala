package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("loadPattern unions matching tables with first-wins dtype resolution") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tables").toString
    Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)).toDF("id", "name", "score")
      .write.mode("overwrite").parquet(s"$tmp/doc_a.parquet")
    // score int here: conflicts with doc_a's double -> cast to double
    Seq((3L, 7, "en"), (4L, 9, "de")).toDF("id", "score", "lang")
      .write.mode("overwrite").parquet(s"$tmp/doc_b.parquet")
    // non-matching name must be excluded by the glob
    Seq((99L, "x")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$tmp/other.parquet")

    val out = Tables.loadPattern(spark, tmp, "doc_*")
    assert(out.schema("score").dataType == DoubleType) // first mapping wins
    assert(out.schema("id").dataType == LongType)
    assert(out.columns.toSeq == Seq("id", "name", "score", "lang"))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows(2).isNullAt(1) && rows(2).getDouble(2) == 7.0 &&
      rows(2).getString(3) == "en")
    assert(rows(0).getString(1) == "alpha" && rows(0).isNullAt(3))
  }

  test("loadPattern: ? wildcard and no-match failure") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tables2").toString
    Seq((1L, 2.0)).toDF("id", "v").write.parquet(s"$tmp/t1.parquet")
    Seq((2L, 3.0)).toDF("id", "v").write.parquet(s"$tmp/t2.parquet")
    assert(Tables.loadPattern(spark, tmp, "t?").count() == 2)
    assertThrows[IllegalArgumentException](
      Tables.loadPattern(spark, tmp, "nope*"))
  }
}
