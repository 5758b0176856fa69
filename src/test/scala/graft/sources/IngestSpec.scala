package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import java.nio.file.Files

class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp() = Files.createTempDirectory("graft-ingest").toString + "/t"

  test("fail mode refuses existing target; replace overwrites; append grows") {
    val nation = Tables.load(spark, TestSpark.sfDir, "nation")
    val path = tmp()
    Ingest.saveTable(nation, path, "fail")
    assertThrows[IllegalArgumentException](Ingest.saveTable(nation, path, "fail"))
    Ingest.saveTable(nation.limit(5), path, "replace")
    assert(spark.read.parquet(path).count() == 5)
    Ingest.saveTable(nation.limit(3), path, "append")
    assert(spark.read.parquet(path).count() == 8)
  }

  test("append verifies schema compatibility") {
    val nation = Tables.load(spark, TestSpark.sfDir, "nation")
    val region = Tables.load(spark, TestSpark.sfDir, "region")
    val path = tmp()
    Ingest.saveTable(nation, path)
    val e = intercept[IllegalArgumentException](
      Ingest.saveTable(region, path, "append"))
    assert(e.getMessage.contains("incompatible schema"))
  }

  test("csvToFrame pins index_col as row identity") {
    val nation = Tables.load(spark, TestSpark.sfDir, "nation")
    val csvDir = tmp()
    nation.write.option("header", "true").csv(csvDir)
    val f = Ingest.csvToFrame(spark, csvDir, indexCol = Some("n_nationkey"))
    assert(f.idCol == "n_nationkey")
    val h = f.head(3).df.collect().map(_.getInt(0)).toSeq
    assert(h == Seq(0, 1, 2))
    val minted = Ingest.csvToFrame(spark, csvDir)
    assert(minted.idCol == "_row_id" && minted.len() == nation.count())
  }

  test("csv round-trip preserves data") {
    val nation = Tables.load(spark, TestSpark.sfDir, "nation")
    val csvDir = tmp()
    nation.write.option("header", "true").csv(csvDir)
    val back = Ingest.csvToParquet(spark, csvDir, tmp())
    assert(back.count() == nation.count())
    val a = back.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq
    val b = nation.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq
    assert(a == b)
  }
}
