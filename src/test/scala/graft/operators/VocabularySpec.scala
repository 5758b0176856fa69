package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class VocabularySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b b c c c"),
    (2L, "c d d a"),
    (3L, "e")).toDF("doc_id", "text")
  // counts: c=4, a=2, b=2, d=2, e=1

  test("build ranks by count desc then token, dense ids from 0") {
    val v = Vocabulary.build(docs, "text", 4).orderBy("token_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(v === Seq((0L, "c", 4L), (1L, "a", 2L), (2L, "b", 2L),
      (3L, "d", 2L)))
  }

  test("encodeExploded preserves order and encodes OOV as -1") {
    val v = Vocabulary.build(docs, "text", 4) // e is out of vocab
    val got = Vocabulary.encodeExploded(docs, "doc_id", "text", v)
      .orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 2L), (1L, 3L, 0L),
      (1L, 4L, 0L), (1L, 5L, 0L),
      (2L, 0L, 0L), (2L, 1L, 3L), (2L, 2L, 3L), (2L, 3L, 1L),
      (3L, 0L, -1L)))
  }

  test("array encode equals exploded encode re-assembled") {
    val v = Vocabulary.build(docs, "text", 4)
    val arr = Vocabulary.encode(docs, "doc_id", "text", v)
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(arr(1L) == Seq(1L, 2L, 2L, 0L, 0L, 0L))
    assert(arr(3L) == Seq(-1L))
  }
}
