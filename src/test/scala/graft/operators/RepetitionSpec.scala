package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark

class RepetitionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sigMap(text: String): Map[String, Double] = {
    val df = Repetition.signals(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
    val row = df.collect().head
    df.columns.drop(1).zipWithIndex
      .map { case (c, i) => c -> row.getDouble(i + 1) }.toMap
  }

  test("duplicate line fraction and char fraction (2nd+ occurrences)") {
    val m = sigMap("aa bb\ncc dd\naa bb\nee ff")
    // 4 lines, 3 distinct -> 1/4; repeated chars 5 of 20 -> 1/4
    assert(m("dup_line_frac") === 0.25)
    assert(m("dup_line_char_frac") === 0.25)
    assert(m("dup_para_frac") === 0.0) // no blank line: one paragraph
  }

  test("duplicate paragraph fractions") {
    val m = sigMap("x y\n\nx y\n\nz w")
    assert(m("dup_para_frac") === 1.0 / 3)
    assert(m("dup_para_char_frac") === 1.0 / 3) // 3 of 9 chars
    // as lines: [x y, x y, z w] after dropping blanks -> 1/3 too
    assert(m("dup_line_frac") === 1.0 / 3)
  }

  test("top n-gram char fraction: count x len of most frequent gram") {
    val m = sigMap("la la la la la") // 14 chars, 4x "la la" (len 5)
    assert(m("top_2gram_char_frac") === 20.0 / 14)
    assert(m("top_3gram_char_frac") === 24.0 / 14) // 3x "la la la"(8)
    assert(m("top_4gram_char_frac") === 22.0 / 14) // 2x len-11
  }

  test("top run ties break toward larger char coverage") {
    // 2-grams: "aa aa" x2, "bbbb bbbb" x2 (cnt tie, longer wins)
    val m = sigMap("aa aa aa x bbbb bbbb bbbb")
    // sorted 2-gram runs: [aa aa x2, aa x, bbbb bbbb x2, x bbbb]
    assert(m("top_2gram_char_frac") === (2 * 9.0) / 25)
  }

  test("dup n-gram char fraction counts ALL occurrences of duplicated grams") {
    val m = sigMap("a b c d e a b c d e x") // 21 chars
    // 5-grams: "a b c d e" twice (9 chars each), 5 singles
    assert(m("dup_5gram_char_frac") === 18.0 / 21)
    assert(m("dup_6gram_char_frac") === 0.0)
  }

  test("degenerate inputs: empty text, single token") {
    val e = sigMap("")
    assert(e.values.forall(_ === 0.0))
    val s = sigMap("hello")
    assert(s.values.forall(_ === 0.0)) // no lines repeat, no 2-grams
  }

  test("single-occurrence grams still give a nonzero top fraction") {
    val m = sigMap("p q r s t u v w") // 15 chars, all 2-grams unique
    assert(m("top_2gram_char_frac") === 3.0 / 15) // best run cnt=1, len 3
  }

  test("gopherFilter drops repetitious docs, keeps clean ones, keeps schema") {
    // clean docs must be LONG enough that a single-occurrence top
    // 2-gram stays under 20% of chars — the published thresholds
    // assume web-document lengths (Gopher pairs them with a 50-word
    // minimum), so the fixtures do too
    val clean1 = (1 to 60).map(i => s"w$i").mkString(" ")
    val clean2 = (1 to 30).map(i => s"p$i").mkString(" ") + "\n\n" +
      (31 to 60).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, clean1, "keep"),
      (2L, "buy now buy now buy now buy now buy now", "drop-top2"),
      (3L, ("nav\nhome\n" * 4) + (1 to 60).map(i => s"b$i").mkString(" "),
        "drop-lines"),
      (4L, clean2, "keep")
    ).toDF("doc_id", "text", "tag")
    val kept = Repetition.gopherFilter(docs, "text")
    assert(kept.columns.toSeq === Seq("doc_id", "text", "tag"))
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 4L))
  }

  test("native kernel ≡ HOF reference on adversarial strings (all 13 signals, bit-exact)") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(1234)
    val adversarial = Seq(
      "", " ", "\n", "\r\n\r\n", "a", "a a a a a a",
      "line one\r\nline one\r\nline two",          // CRLF line identity
      "p1 p1\n\n  \n\np1 p1",                      // blank-with-spaces para split
      "İstanbul İstanbul İstanbul", // Turkish dotted I
      "Σος σος Σος", // final sigma
      "中文 分词 中文 分词 中文",
      "😀 🚀 😀 🚀 😀 🚀",                          // supplementary planes
      "tab\tsepvt\fff\rcr mix tab\tsep",
      " padded  line \n padded  line \nx",
      ("tok " * 30).trim + "\n" + ("tok " * 30).trim
    ) ++ (0 until 60).map { _ =>
      val vocab = Seq("la", "la", "the", "café", "😀", "x1", "\tt", "word")
      (0 until rnd.nextInt(50)).map(_ =>
        if (rnd.nextInt(6) == 0) "\n" else vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
    val df = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val kernel = df.select(col("id"),
      graft.plans.TokenRepetitionSignals(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1).toSeq).toMap
    val hof = df.select(col("id"),
      Repetition.signalsStructHof(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1).toSeq).toMap
    assert(kernel.keySet === hof.keySet)
    kernel.foreach { case (id, ks) =>
      assert(ks === hof(id), s"signal mismatch for doc $id") // bit-exact
    }
  }

  test("null text: all-zero signals (kernel ≡ HOF) and gopherFilter keeps the row") {
    // doc 2 is LONG and distinct (a short doc's single top 2-gram
    // covers >20% of chars and legitimately fails the top-gram rule)
    val docs = Seq((1L, Option.empty[String]),
      (2L, Some((1 to 60).map(i => s"word$i").mkString(" "))))
      .toDF("doc_id", "text")
    val sigs = Repetition.signals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (1 to 13).map(i => r.getDouble(i))).toMap
    assert(sigs(1L).forall(_ === 0.0)) // not nulls, not dropped
    val hof = docs.select(col("doc_id"),
      Repetition.signalsStructHof(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1).toSeq).toMap
    assert(sigs(1L) === hof(1L).map(_.asInstanceOf[Double]))
    // no text, nothing repeats: the filter keeps the row
    val kept = Repetition.gopherFilter(docs, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("zero-shuffle plan: the sweep is a single scan-shaped stage") {
    val docs = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val plan = Repetition.signals(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
