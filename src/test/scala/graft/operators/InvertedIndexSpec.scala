package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class InvertedIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val f = java.nio.file.Files.createTempDirectory(name).toFile
    f.deleteOnExit(); f.toString
  }

  test("index-backed search is row-identical to the corpus-scan bm25TopK") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val path = tmp("graft-idx-diff")
    InvertedIndex.build(docs, "doc_id", "text", path)
    val terms = Seq("stream", "filter", "join")
    val viaIndex = InvertedIndex.searchTopK(spark, path, terms, k = 10,
        idColName = "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaScan = Ranking.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIndex == viaScan)
    assert(viaIndex.nonEmpty)
  }

  test("driver-side bucketOf agrees with the index's layout column") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val path = tmp("graft-idx-bucket")
    InvertedIndex.build(docs, "doc_id", "text", path, buckets = 64)
    // every persisted (term, bucket) pair must match the driver hash —
    // otherwise searchTopK would prune away the terms it needs
    val mism = spark.read.parquet(s"$path/postings")
      .select("term", "bucket").distinct().collect()
      .count(r => InvertedIndex.bucketOf(r.getString(0), 64) != r.getInt(1))
    assert(mism == 0)
  }

  test("search prunes postings directories at planning time") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val path = tmp("graft-idx-prune")
    InvertedIndex.build(docs, "doc_id", "text", path, buckets = 64)
    val df = InvertedIndex.searchTopK(spark, path, Seq("stream"), k = 5)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.filter(_.relation.location.rootPaths.exists(_.toString.contains("postings")))
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, "no PartitionFilters on bucket")
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).length
    val total = scan.relation.location.listFiles(Nil, Nil).length
    assert(selected < total,
      s"selected $selected of $total postings partitions — nothing pruned")
    // and the term predicate reaches the parquet reader
    assert(scan.dataFilters.nonEmpty, "term filter not pushed to the scan")
  }

  test("stats are written last: a build missing them fails loudly") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val path = tmp("graft-idx-crash")
    InvertedIndex.build(docs, "doc_id", "text", path)
    // simulate a crash between the postings write and the stats write
    def wipe(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(wipe)); f.delete(); ()
    }
    wipe(new java.io.File(s"$path/stats"))
    assertThrows[org.apache.spark.sql.AnalysisException](
      InvertedIndex.searchTopK(spark, path, Seq("a"), k = 1))
  }

  test("stats count every doc, including token-free ones") {
    val docs = Seq((1L, "x x y"), (2L, ""), (3L, "y")).toDF("doc_id", "text")
    val path = tmp("graft-idx-stats")
    InvertedIndex.build(docs, "doc_id", "text", path)
    val st = spark.read.parquet(s"$path/stats").head()
    assert(st.getDouble(st.fieldIndex("n")) == 3.0)
    // avg_len over ALL docs: (3 + 0 + 1) / 3
    assert(math.abs(st.getDouble(st.fieldIndex("avg_len")) - 4.0 / 3) < 1e-12)
    // empty doc contributes no postings
    assert(spark.read.parquet(s"$path/postings")
      .filter(col("id") === 2L).count() == 0)
  }
}
