package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** BPE training + segmentation. The hand-computed fixture is the
  * classic hug/pug/pun/bun/hugs corpus; every merge below is derived
  * by hand from the determinism contract (overlapping adjacent-pair
  * counts, (count desc, l, r) argmax, left-to-right merge apply).
  */
class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // word freqs: hug 10, pug 5, pun 12, bun 4, hugs 5
  private val docs = Seq(
    (1L, (("hug " * 10) + ("pug " * 5)).trim),
    (2L, (("pun " * 12) + ("bun " * 4) + ("hugs " * 5)).trim)
  ).toDF("doc_id", "text")

  private val expectedMerges = Seq(
    ("u", "g"),   // 20
    ("u", "n"),   // 16
    ("h", "ug"),  // 15
    ("p", "un"),  // 12
    ("hug", "s"), // 5 — ties (p,ug)=5, "hug" < "p" wins
    ("p", "ug"))  // 5

  test("trainBpe walks the hand-computed merge sequence") {
    val model = Vocabulary.trainBpe(docs, "text", numMerges = 6)
    assert(model.merges === expectedMerges)
  }

  test("merge apply is left-to-right non-overlapping (the BPE order)") {
    assert(Vocabulary.segmentWord("aaaa", Seq(("a", "a")))
      === Seq("aa", "aa"))
    assert(Vocabulary.segmentWord("aaa", Seq(("a", "a")))
      === Seq("aa", "a"))
    assert(Vocabulary.segmentWord("aaaaa", Seq(("a", "a"), ("aa", "aa")))
      === Seq("aaaa", "a"))
  }

  test("merges apply to unseen words (OOV segmentation)") {
    assert(Vocabulary.segmentWord("hugpun", expectedMerges)
      === Seq("hug", "pun"))
    assert(Vocabulary.segmentWord("zug", expectedMerges)
      === Seq("z", "ug"))
  }

  test("column segmentation is identical to the driver reference") {
    val words = Seq("hug", "pug", "pun", "bun", "hugs", "hugpun", "zug",
      "aaaa", "a", "x", "gug", "unun", "shug", "puguh")
    val got = words.toDF("w")
      .select(col("w"),
        Vocabulary.bpeSegment(col("w"), expectedMerges).as("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    words.foreach { w =>
      assert(got(w) === Vocabulary.segmentWord(w, expectedMerges),
        s"word $w")
    }
  }

  test("bpeEncodeExploded: per-token pieces, positions 0-based") {
    val model = Vocabulary.BpeModel(expectedMerges)
    val tiny = Seq((7L, "hugs pun zug")).toDF("doc_id", "text")
    val got = Vocabulary.bpeEncodeExploded(tiny, "doc_id", "text", model)
      .orderBy("pos", "piece_pos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got === Seq(
      (7L, 0L, 0L, "hugs"),
      (7L, 1L, 0L, "pun"),
      (7L, 2L, 0L, "z"), (7L, 2L, 1L, "ug")))
  }

  test("training stops early when every word is one symbol") {
    val tiny = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val model = Vocabulary.trainBpe(tiny, "text", numMerges = 10)
    assert(model.merges === Seq(("a", "b")))
    val chars = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(Vocabulary.trainBpe(chars, "text", numMerges = 3).merges.isEmpty)
  }

  test("symbols are code points: driver and column forms agree on" +
    " supplementary-plane characters") {
    val word = "a😀b" // a😀b — 😀 is one symbol, not two units
    assert(Vocabulary.segmentWord(word, Nil) ===
      Seq("a", "😀", "b"))
    val merges = Seq(("a", "😀"))
    val driver = Vocabulary.segmentWord(word, merges)
    assert(driver === Seq("a😀", "b"))
    val column = Seq(word).toDF("w")
      .select(Vocabulary.bpeSegment(col("w"), merges))
      .collect().head.getSeq[String](0).toSeq
    assert(column === driver)
  }

  test("bpeTokenCount sums piece counts per document") {
    val model = Vocabulary.BpeModel(expectedMerges)
    // "hugs pun zug" -> 1 + 1 + 2 pieces; "bun" -> b + un = 2
    val tiny = Seq((7L, "hugs pun zug"), (8L, "bun")).toDF("doc_id", "text")
    val got = Vocabulary.bpeTokenCount(tiny, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(7L -> 4L, 8L -> 2L))
  }

  test("incremental trainer walks the identical merge sequence as the" +
    " full recount, to exhaustion") {
    val hug = Array(("hug", 10L), ("pug", 5L), ("pun", 12L),
      ("bun", 4L), ("hugs", 5L))
    assert(Vocabulary.trainMerges(hug, 100) ===
      Vocabulary.trainMergesNaive(hug, 100))
    // seeded random dict over a tiny alphabet: heavy ties, repeated
    // letters (overlap-prone runs like "aaaa"), full exhaustion
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    val dict = (0 until 300).map { _ =>
      val len = 1 + rnd.nextInt(10)
      Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
    }.groupBy(identity).map { case (w, g) => (w, g.size.toLong * 3) }
      .toArray.sortBy(_._1)
    val fast = Vocabulary.trainMerges(dict, 2000)
    val slow = Vocabulary.trainMergesNaive(dict, 2000)
    assert(fast === slow)
    assert(fast.nonEmpty && fast.size < 2000, s"${fast.size} merges")
  }

  test("training is deterministic across runs") {
    val a = Vocabulary.trainBpe(docs, "text", numMerges = 6).merges
    val b = Vocabulary.trainBpe(docs, "text", numMerges = 6).merges
    assert(a === b)
  }
}
