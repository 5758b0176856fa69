package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ChunkingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("overlapping windows cover every token with the right stride") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(docs, "doc_id", "text", 4, 2)
      .orderBy("chunk_no")
      .select("chunk_no", "chunk_text", "n_tok").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (0L, "t1 t2 t3 t4", 4L), (1L, "t3 t4 t5 t6", 4L),
      (2L, "t5 t6 t7 t8", 4L), (3L, "t7 t8 t9 t10", 4L)))
  }

  test("short, exact-fit, and empty documents chunk sanely") {
    val docs = Seq((1L, "a b"), (2L, "a b c d"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(docs, "doc_id", "text", 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set((1L, 0L, "a b"), (2L, 0L, "a b c d"), (3L, 0L, "")))
  }

  test("non-overlapping chunks reconstruct the token stream") {
    val docs = spark.range(50).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), (col("id") % 37 + 1).cast("int")),
        i => concat(lit("w"), i))).as("text"))
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", 8, 8)
    // collect_list order is not guaranteed — sort by chunk_no explicitly
    val rebuilt = chunks.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("chunk_no"), col("chunk_text"))))
        .as("arr"))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("arr"), s => s.getField("chunk_text")))
          .as("re"))
    val diff = rebuilt.join(docs, Seq("doc_id"))
      .filter(col("re") =!= lower(col("text")))
    assert(diff.count() === 0)
    // every chunk except a doc's last has exactly chunkSize tokens
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val bad = chunks.withColumn("mx", max("chunk_no").over(w))
      .filter(col("chunk_no") < col("mx") && col("n_tok") =!= 8)
    assert(bad.count() === 0)
  }

  test("stride larger than chunk size is rejected") {
    assertThrows[IllegalArgumentException] {
      Chunking.chunkByTokens(Seq((1L, "a")).toDF("doc_id", "text"), "doc_id",
        "text", 4, 5)
    }
  }

  test("contentDefinedChunks: chunks tile the document exactly") {
    val text = (0 until 200).map(i => s"w${i % 37}").mkString(" ")
    val got = Chunking.contentDefinedChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        window = 3, divisor = 8)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // contiguous coverage: chunk i+1 starts where chunk i ends
    assert(got.head._2 == 0L)
    got.sliding(2).foreach {
      case Array((_, s1, n1, _), (_, s2, _, _)) => assert(s2 == s1 + n1)
      case _ => ()
    }
    assert(got.map(_._3).sum == 200L)
    // re-assembly reproduces the text
    assert(got.map(_._4).mkString(" ") == text)
    assert(got.length > 1, "divisor 8 over 200 tokens must cut somewhere")
  }

  test("contentDefinedChunks boundaries are edit-stable (the CDC" +
    " property)") {
    val base = (0 until 300).map(i => s"w${(i * 7) % 53}").toVector
    val edited = base.updated(0, "EDITED")
    def chunks(tokens: Vector[String]) =
      Chunking.contentDefinedChunks(
        Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", window = 3, divisor = 8)
        .collect().map(r => (r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
    val a = chunks(base)
    val b = chunks(edited)
    // changing token 0 can only affect boundary flags at pos <= 2, so
    // every chunk starting at pos >= 4 is identical — fixed-width
    // chunking would shift EVERY later chunk
    val aLate = a.filter(_._1 >= 4)
    val bLate = b.filter(_._1 >= 4)
    assert(aLate == bLate, "late chunks must survive an early edit")
    assert(aLate.nonEmpty)
    assert(a != b, "the edit must change at least the first chunk")
  }

  test("truncateTokens: head/tail/middle_out keep the right tokens; " +
      "under-budget and null pass through") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // over budget
      (2L, "a b c"),                                   // under budget
      (3L, null: String)).toDF("id", "text")
    def run(st: String) = Chunking
      .truncateTokens(docs, "id", "text", maxTokens = 5, strategy = st)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    val h = run("head")
    assert(h(1L) == (("t1 t2 t3 t4 t5", 5L, true)))
    assert(h(2L) == (("a b c", 3L, false)))
    assert(h(3L) == (("", 0L, false)))
    val t = run("tail")
    assert(t(1L) == (("t6 t7 t8 t9 t10", 5L, true)))
    assert(t(2L)._1 == "a b c")
    val m = run("middle_out") // headN 3, tailN 2 on an odd budget
    assert(m(1L) == (("t1 t2 t3 t9 t10", 5L, true)))
    assert(m(2L)._1 == "a b c")
    intercept[IllegalArgumentException](
      Chunking.truncateTokens(docs, "id", "text", 0))
    intercept[IllegalArgumentException](
      Chunking.truncateTokens(docs, "id", "text", 5, "best"))
  }
}
