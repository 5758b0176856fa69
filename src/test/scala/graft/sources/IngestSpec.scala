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

  test("CsvOptions: sep, na sentinels, dtype, usecols, names, nrows") {
    val dir = Files.createTempDirectory("graft-csvopts").toString
    val csv = dir + "/in.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      """id;name;qty;price;note
        |1;alpha;3;1.50;ok
        |2;beta;NA;2.25;n/a
        |3;NULL;7;NA;fine
        |4;delta;9;4.00;meh
        |""".stripMargin)
    val opts = Ingest.CsvOptions(
      sep = ";",
      naValues = Seq("NA", "NULL", "n/a"),
      dtype = Map("qty" -> "long"),
      usecols = Seq("id", "name", "qty", "price"))
    val df = Ingest.readCsv(spark, csv, opts).orderBy("id")
    assert(df.columns.toSeq == Seq("id", "name", "qty", "price"))
    assert(df.schema("qty").dataType.simpleString == "bigint")
    val rows = df.collect()
    assert(rows.length == 4)
    assert(rows(1).isNullAt(2))           // qty "NA" -> null
    assert(rows(2).isNullAt(1))           // name "NULL" -> null (extra sentinel)
    assert(rows(2).isNullAt(3))           // price "NA" -> null
    assert(rows(0).getLong(2) == 3L)
    // names override + nrows cap: pandas nrows = the FIRST n data rows
    // in FILE order (whole-file parse — not a split-order limit), so
    // the exact drawn ids are pinned, not just the count
    val renamed = Ingest.readCsv(spark, csv, Ingest.CsvOptions(sep = ";",
      names = Seq("a", "b", "c", "d", "e"), nrows = Some(2)))
    assert(renamed.columns.toSeq == Seq("a", "b", "c", "d", "e"))
    assert(renamed.select("a").collect().map(_.getInt(0)).toSeq
      == Seq(1, 2))
    // nrows over a multi-file input is refused loudly — "first n rows"
    // has no file order to honor across files
    val multi = Files.createTempDirectory("graft-csvmulti").toString
    Files.writeString(java.nio.file.Paths.get(s"$multi/x.csv"), "id\n1\n")
    Files.writeString(java.nio.file.Paths.get(s"$multi/y.csv"), "id\n2\n")
    val e = intercept[IllegalArgumentException] {
      Ingest.readCsv(spark, multi, Ingest.CsvOptions(nrows = Some(1)))
    }
    assert(e.getMessage.contains("ONE csv file"), e.getMessage)
    // full-option path reaches the frame facade too
    val f = Ingest.csvToFrame(spark, csv, Some("id"), opts)
    assert(f.idCol == "id" && f.len() == 4)
  }

  test("numeric columns polluted by extra na sentinels are re-inferred") {
    val dir = Files.createTempDirectory("graft-csvna").toString
    val csv = dir + "/in.csv"
    // "NULL" is a SECOND sentinel: the reader's inference sees it as a
    // string and types qty/score as string — re-inference must recover
    // bigint/double like pandas (which drops na_values before typing)
    Files.writeString(java.nio.file.Paths.get(csv),
      """id,qty,score,label
        |1,3,1.5,x
        |2,NULL,NULL,y
        |3,7,2.25,NULL
        |""".stripMargin)
    val df = Ingest.readCsv(spark, csv,
      Ingest.CsvOptions(naValues = Seq("NA", "NULL")))
    assert(df.schema("qty").dataType.simpleString == "bigint")
    assert(df.schema("score").dataType.simpleString == "double")
    assert(df.schema("label").dataType.simpleString == "string")
    val r = df.orderBy("id").collect()
    assert(r(1).isNullAt(1) && r(1).isNullAt(2) && r(2).isNullAt(3))
    assert(r(2).getLong(1) == 7L && r(2).getDouble(2) == 2.25)
  }

  test("upsertTable replaces matching keys, keeps the rest, inserts new ones") {
    import spark.implicits._
    val path = tmp()
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "name", "v").write.parquet(path)
    Ingest.upsertTable(
      Seq((2L, "b2", 20.0), (9L, "new", 9.0)).toDF("k", "name", "v"),
      path, "k")
    val got = spark.read.parquet(path).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0),
      (9L, "new", 9.0)))
    // second upsert over the swapped table (the rename must leave a
    // readable table behind)
    Ingest.upsertTable(Seq((1L, "a2", 10.0)).toDF("k", "name", "v"), path, "k")
    assert(spark.read.parquet(path).filter($"k" === 1L)
      .collect()(0).getString(1) == "a2")
    // no table yet -> plain write
    val fresh = tmp()
    Ingest.upsertTable(Seq((5L, "x", 5.0)).toDF("k", "name", "v"), fresh, "k")
    assert(spark.read.parquet(fresh).count() == 1)
    // incompatible schema still refused
    assertThrows[IllegalArgumentException] {
      Ingest.upsertTable(Seq((1L, 2L)).toDF("k", "name"), path, "k")
    }
  }

  test("upsertTable recovers a table stranded at __upsert_old by a crash") {
    import spark.implicits._
    val path = tmp()
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").write.parquet(path)
    // simulate a crash between the two swap renames: the table moved
    // aside but the merged result never landed
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__upsert_old")))
    // next upsert must restore the backup and MERGE, not rebuild the
    // table from the incoming batch alone
    Ingest.upsertTable(Seq((2L, 99.0), (3L, 30.0)).toDF("k", "v"), path, "k")
    val got = spark.read.parquet(path).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__upsert_old")))
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

  test("updateWhere rewrites only matching rows against ORIGINAL " +
      "values; zero matches touch nothing; key rewrite refused") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-updatewhere").toString + "/t"
    val src = Seq((1L, "a", 10.0), (2L, "b", -5.0), (3L, "a", -1.0))
      .toDF("k", "tag", "v")
    Ingest.saveTable(src, dir, "replace")
    // both updates read the ORIGINAL row: v doubles AND tag gets the
    // ORIGINAL v's sign — a withColumn chain would see the new v
    val n = Ingest.updateWhere(spark, dir, "k", col("v") < 0,
      Map("v" -> (col("v") * 2), "tag" -> concat(col("tag"),
        when(col("v") < 0, "_neg").otherwise("_pos"))))
    assert(n == 2L)
    val got = spark.read.parquet(dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b_neg", -10.0),
      (3L, "a_neg", -2.0)))
    // zero matches: count 0, table byte-identical in content
    assert(Ingest.updateWhere(spark, dir, "k", col("v") > 1e9,
      Map("v" -> lit(0.0))) == 0L)
    assert(spark.read.parquet(dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == got.toSeq)
    intercept[IllegalArgumentException](
      Ingest.updateWhere(spark, dir, "k", lit(true),
        Map("k" -> lit(9L))))
    intercept[IllegalArgumentException](
      Ingest.updateWhere(spark, dir, "k", lit(true),
        Map("nope" -> lit(9L))))
  }
}
