package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class WordPieceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // hand-computed likelihood walk over {low x5, lower x2, lowest x2}:
  // initial scores put every (l,##o)/(##o,##w)/(##w,##e) pair at 1/9
  // and (##s,##t) at 1/2 — WordPiece merges the RARE-but-cohesive
  // pair first, which is exactly where it diverges from BPE's
  // count argmax (BPE would merge (l,##o) or (##o,##w) first)
  private val dict: Array[(String, Long)] =
    Array(("low", 5L), ("lower", 2L), ("lowest", 2L))

  test("trainFromDict walks the hand-computed likelihood merges") {
    val m = WordPiece.trainFromDict(dict, numMerges = 4)
    assert(m.merges == Seq(
      ("##s", "##t"),   // 2/(2*2) beats everything
      ("##e", "##r"),   // 0.25 tie vs (##e,##st): r asc
      ("##e", "##st"),  // 2/(2*2) again after ##er leaves
      ("##o", "##w")))  // all remaining at 1/9: l asc picks ##o
    assert(m.vocab == Seq("##e", "##o", "##r", "##s", "##t", "##w", "l",
      "##st", "##er", "##est", "##ow"))
  }

  test("greedy longest-match encode; whole-word [UNK] on any miss") {
    val m = WordPiece.trainFromDict(dict, numMerges = 4)
    val got = Seq("low", "lower", "lowest", "stop", "o")
      .toDF("w")
      .select($"w", WordPiece.wordPieceSegment($"w", m).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("low") == Seq("l", "##ow"))
    assert(got("lower") == Seq("l", "##ow", "##er"))
    assert(got("lowest") == Seq("l", "##ow", "##est"))
    // 's' exists only as a continuation symbol — no word-initial
    // match means the WHOLE word is [UNK], not a partial split
    assert(got("stop") == Seq("[UNK]"))
    // 'o' word-initially: bare "o" is not in the vocab either
    assert(got("o") == Seq("[UNK]"))
  }

  test("exploded encode matches per-word segmentation over a corpus") {
    val m = WordPiece.trainFromDict(dict, numMerges = 4)
    val docs = Seq((1L, "low lowest"), (2L, "stop lower"))
      .toDF("doc_id", "text")
    val got = WordPiece.wordPieceEncodeExploded(docs, "doc_id", "text", m)
      .orderBy("doc_id", "pos", "piece_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, "l"), (1L, 0L, 1L, "##ow"),
      (1L, 1L, 0L, "l"), (1L, 1L, 1L, "##ow"), (1L, 1L, 2L, "##est"),
      (2L, 0L, 0L, "[UNK]"),
      (2L, 1L, 0L, "l"), (2L, 1L, 1L, "##ow"), (2L, 1L, 2L, "##er")))
  }

  test("train runs end-to-end on the documents table and every vocab " +
      "piece is reachable") {
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val m = WordPiece.train(docs, "text", numMerges = 30)
    assert(m.merges.size == 30 && m.vocab.distinct.size == m.vocab.size)
    // encode round trip: concatenating pieces (## stripped) re-forms
    // every non-UNK word
    val enc = WordPiece.wordPieceEncodeExploded(
        docs.filter(col("doc_id") < 30), "doc_id", "text", m)
      .groupBy("doc_id", "pos")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("piece_pos"), col("piece")))),
        x => x.getField("piece"))).as("joined"))
    val toks = docs.filter(col("doc_id") < 30)
      .select(col("doc_id"),
        posexplode(graft.functions.TextAnalysis.tokens(col("text")))
          .as(Seq("pos", "token")))
    val bad = enc.join(toks, Seq("doc_id", "pos"))
      .filter(!col("joined").contains("[UNK]"))
      .filter(regexp_replace(col("joined"), "##", "") =!= col("token"))
    assert(bad.count() == 0)
    // and the corpus genuinely exercises multi-piece splits
    assert(enc.filter(col("joined").contains("##")).count() > 0)
  }
}
