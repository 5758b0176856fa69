package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.load(spark, TestSpark.sfDir, "documents")

  test("trainUnigramFromDict: hand-checked seed, EM recount, prune") {
    // dict: "abab" x 10, "ab" x 5, "cd" x 3
    val dict = Array(("abab", 10L), ("ab", 5L), ("cd", 3L))
    val m = Unigram.trainUnigramFromDict(dict, vocabSize = 6,
      maxPieceLen = 4, iters = 1, seedSize = 3)
    // seed singles: a=25 (2x10+5), b=25, c=3, d=3; multis by cnt desc,
    // piece asc: ab=25, ba=10, aba=10 -> top 3 all kept ("abab"=10,
    // "bab"=10 lose to aba/ba on the piece tie-break? counts: ab=25,
    // ba=10, aba=10, bab=10, abab=10 -> top3 = ab, aba, abab)
    // After one EM pass every word segments to its best pieces; the
    // model keeps all 4 singles + top (6-4)=2 multis.
    val pieces = m.pieces.map(p => (p._1, p._2)).toMap
    assert(pieces.keySet.count(_.length == 1) == 4)
    assert(pieces.keySet.count(_.length > 1) == 2)
    // hand-run EM: seed scores make V("abab") best as the WHOLE piece
    // [abab] (-2.313 beats ab+ab = -2.792) — the lexicon-over-
    // composition behavior that distinguishes unigram from greedy BPE.
    // So abab counts 10, ab counts 5 (from the word "ab"), aba drops
    // at 0; unused singles a, b take the +1 floor
    assert(pieces("abab") == 10L && pieces("ab") == 5L)
    assert(!pieces.contains("aba"))
    assert(pieces("a") == 1L && pieces("b") == 1L)
    // cd has no multi piece kept -> c, d counted 3 (+1 floor)
    assert(pieces("c") == 4L && pieces("d") == 4L)
  }

  test("viterbi: tie breaks toward the shortest last piece; unknown " +
    "code points fall back to UnkScore") {
    val score = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    // "ab": [a][b] = -2.0 ties [ab] = -2.0 -> shortest LAST piece wins
    assert(Unigram.viterbi(Array("a", "b"), score, 4) == Seq("a", "b"))
    // strictly better multi wins
    val score2 = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -1.5)
    assert(Unigram.viterbi(Array("a", "b"), score2, 4) == Seq("ab"))
    // unknown char segments alone at UnkScore
    assert(Unigram.viterbi(Array("a", "z", "b"), score, 4) ==
      Seq("a", "z", "b"))
  }

  test("column segmentation = driver viterbi on every corpus word; " +
    "pieces concatenate back to the word") {
    val model = Unigram.trainUnigram(docs, "text")
    val words = docs
      .select(explode(graft.functions.TextAnalysis.tokens(col("text")))
        .as("word"))
      .distinct()
    val got = words
      .withColumn("pieces", Unigram.unigramSegment(col("word"), model))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got.nonEmpty)
    got.foreach { case (w, ps) =>
      val cps = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      assert(ps == Unigram.viterbi(cps, model.scores, 4).toList, s"word $w")
      assert(ps.mkString == w, s"coverage broken for $w")
    }
    // the model actually compresses: some word uses a multi-char piece
    assert(got.values.exists(ps => ps.exists(_.length > 1)))
  }

  test("save/load round-trip carries the exact model; loud on missing") {
    val model = Unigram.trainUnigram(docs, "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-spm").toString
    Unigram.saveUnigramModel(spark, model, path)
    val loaded = Unigram.loadUnigramModel(spark, path)
    assert(loaded.pieces == model.pieces)
    val e = intercept[IllegalArgumentException] {
      Unigram.loadUnigramModel(spark, path + "-nope")
    }
    assert(e.getMessage.contains("no committed"), e.getMessage)
  }

  test(".vocab interop: export/import round-trips the exact scores; " +
    "malformed lines refuse") {
    val model = Unigram.trainUnigram(docs, "text")
    val file = java.nio.file.Files
      .createTempDirectory("graft-spmvocab").toString + "/m.vocab"
    Unigram.exportSpmVocabTxt(spark, model, file)
    val imported = Unigram.importSpmVocabTxt(spark, file)
    // counts are not part of the format; pieces + logp round-trip
    assert(imported.pieces.map(p => (p._1, p._3)) ==
      model.pieces.map(p => (p._1, p._3)))
    assert(imported.pieces.forall(_._2 == 0L))
    val bad = file + ".bad"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      "justapiece\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      Unigram.importSpmVocabTxt(spark, bad)
    }
    assert(e.getMessage.contains("malformed"), e.getMessage)
    // duplicate pieces refuse at IMPORT (a dup would otherwise blow up
    // inside every encode job as a duplicate map key)
    val dup = file + ".dup"
    java.nio.file.Files.write(java.nio.file.Paths.get(dup),
      "ab\t-1.5\nab\t-2.5\n".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      Unigram.importSpmVocabTxt(spark, dup)
    }
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
  }

  test("segmentation depth derives from the model; an explicit depth " +
    "too small to reach the longest piece refuses") {
    val model = Unigram.UnigramModel(Seq(
      ("a", 1L, -1.0), ("b", 1L, -1.0), ("abab", 4L, -0.5)))
    assert(model.maxPieceLen == 4)
    // default depth reaches the 4-char piece
    val got = Seq("abab").toDF("w")
      .select(Unigram.unigramSegment(col("w"), model)).head().getSeq[String](0)
    assert(got == Seq("abab"))
    intercept[IllegalArgumentException] {
      Unigram.unigramSegment(col("w"), model, maxPieceLen = 2)
    }
  }

  test("unigramEncodeExploded: positions 0-based, pieces in word order, " +
    "piece stream rebuilds each token") {
    val model = Unigram.trainUnigram(docs, "text")
    val enc = Unigram.unigramEncodeExploded(
      docs.filter(col("doc_id") < 5), "doc_id", "text", model)
    val rows = enc.orderBy("doc_id", "pos", "piece_pos").collect()
    assert(rows.nonEmpty)
    val byTok = rows.groupBy(r => (r.getLong(0), r.getLong(1)))
    val toks = docs.filter(col("doc_id") < 5)
      .select(col("doc_id"),
        posexplode(graft.functions.TextAnalysis.tokens(col("text")))
          .as(Seq("pos", "token")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getString(2)).toMap
    byTok.foreach { case ((id, pos), prs) =>
      val joined = prs.sortBy(_.getLong(2)).map(_.getString(3)).mkString
      assert(joined == toks((id, pos)), s"doc $id pos $pos")
    }
  }
}
