package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Property-based differential tests: the native codegen expressions
  * must agree with their builtin-composed HOF reference forms on
  * arbitrary generated text, not just the fixture corpus — whitespace
  * runs, punctuation, unicode letters, mixed case, degenerate inputs.
  */
class TokenHashPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // text generator biased toward tokenizer edge cases
  private val wsChars = Gen.oneOf(' ', '\t', '\n', '', '\f', '\r')
  private val wordChars = Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('ä', 'É', 'ß', 'ñ', '汉', 'φ', '.', ',', '-'))
  private val token = Gen.nonEmptyListOf(wordChars).map(_.mkString)
  private val textGen: Gen[String] = for {
    toks <- Gen.listOf(token)
    seps <- Gen.listOfN(toks.size + 1,
      Gen.nonEmptyListOf(wsChars).map(_.mkString))
  } yield seps.zipAll(toks, "", "").flatMap { case (s, t) => Seq(s, t) }.mkString

  private def batchCheck(texts: Seq[String]): Unit = {
    import spark.implicits._
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    // MinHash: HOF tower vs native
    val hofSig = docs
      .select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), transform(col("tk"), t => xxhash64(t)).as("th"))
      .select(col("doc_id"),
        transform(sequence(lit(1), size(col("th")) - lit(2)),
          i => xxhash64(element_at(col("th"), i),
            element_at(col("th"), i + 1), element_at(col("th"), i + 2))).as("hs"))
      .select(col("doc_id"),
        graft.operators.Dedup.minhashFromHashes(col("hs"), 16).as("sig"))
    val natSig = docs
      .select(col("doc_id"), TokenMinHash(col("text"), 3, 16).as("sig"))
      .filter(col("sig").isNotNull)
    assert(hofSig.count() == natSig.count())
    assert(hofSig.as("a").join(natSig.as("b"), "doc_id")
      .filter(col("a.sig") =!= col("b.sig")).count() == 0)

    // Shingle sets: HOF sorted-distinct-hash vs native
    val hofSh = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(
        array_distinct(graft.functions.TextAnalysis.shingles(col("text"), 2)),
        s => xxhash64(s)))).as("sh"))
    val natSh = docs.select(col("doc_id"),
      TokenShingleHashes(col("text"), 2).as("sh"))
    assert(hofSh.as("a").join(natSh.as("b"), "doc_id")
      .filter(col("a.sh") =!= col("b.sh")).count() == 0)

    // SimHash: HOF sketch vs native
    val hofSim = docs.select(col("doc_id"),
      graft.functions.TextAnalysis.simhash64(col("text")).as("s"))
    val natSim = docs.select(col("doc_id"), TokenSimHash(col("text")).as("s"))
    assert(hofSim.as("a").join(natSim.as("b"), "doc_id")
      .filter(col("a.s") =!= col("b.s")).count() == 0)
  }

  test("native sketch expressions agree with HOF forms on generated text") {
    // one Spark job over a generated batch beats hundreds of tiny jobs
    val texts = Gen.listOfN(200, textGen).sample.getOrElse(Nil) ++ Seq(
      "", " ", "\t\n", "a", "a b", "a b c", "A  B\tC\nD",
      "ÄÖÜ ß ss Σ σ ς", "汉字 漢字 かな カナ", "a.b,c-d a.b,c-d")
    assert(texts.nonEmpty)
    batchCheck(texts)
  }

  test("TokenRepetitionSignals kernel ≡ HOF reference on generated text (bit-exact)") {
    import spark.implicits._
    // bias toward REPETITION: draw tokens from a tiny vocab so dup
    // grams/lines actually occur, and sprinkle newlines for line/para
    // structure (the sketch generator above never repeats)
    val smallVocab = Gen.oneOf("la", "la", "the", "x", "yß", "汉", "...")
    val unit = Gen.listOf(smallVocab).map(_.mkString(" "))
    val repTextGen: Gen[String] = for {
      lines <- Gen.listOf(unit)
      seps <- Gen.listOfN(math.max(lines.size - 1, 0),
        Gen.oneOf("\n", "\r\n", "\n\n", "\n \n"))
    } yield lines.zipAll(seps, "", "").flatMap { case (l, s) => Seq(l, s) }
      .mkString
    val texts = Gen.listOfN(150, repTextGen).sample.getOrElse(Nil) ++ Seq(
      "", "\n", "la la\nla la", "a\r\n\r\na", " \n \n ")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val mismatches = docs.select(col("doc_id"),
        TokenRepetitionSignals(col("text")).as("k"),
        graft.operators.Repetition.signalsStructHof(col("text")).as("h"))
      .filter(col("k") =!= col("h"))
      .count()
    assert(mismatches == 0)
  }
}
