package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class StemmerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // one word per rule, plus the boundary cases each rule's condition
  // carves out (Harman's S-stemmer in Lucene's minimal_english order)
  val table: Seq[(String, String)] = Seq(
    // rule 1: short / no trailing s
    "as" -> "as", "is" -> "is", "dog" -> "dog", "query" -> "query",
    "" -> "", "s" -> "s",
    // rule 2: us / ss unchanged
    "virus" -> "virus", "glass" -> "glass", "ss" -> "ss", "bus" -> "bus",
    // rule 3: ies -> y (not after a/e, length > 3)
    "queries" -> "query", "stories" -> "story", "ties" -> "ty",
    "ponies" -> "pony",
    // rule 4: ies (len 3 or after a/e) / aes / oes / ees unchanged
    "ies" -> "ies", "aies" -> "aies", "eies" -> "eies",
    "goes" -> "goes", "knees" -> "knees", "aes" -> "aes",
    // rule 5: plain drop-s, including the es-fallthrough
    "dogs" -> "dog", "filters" -> "filter", "boxes" -> "boxe",
    "tables" -> "table", "windows" -> "window", "its" -> "it",
    "bosses" -> "bosse")

  test("rule table: String form") {
    for ((in, want) <- table)
      assert(EnglishMinimalStem.stemString(in) == want, s"stem('$in')")
  }

  test("rule table: Column form agrees") {
    import spark.implicits._
    val rows = table.map(_._1).toDF("t")
      .select(col("t"), EnglishMinimalStem.stem(col("t")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((in, want) <- table) assert(rows(in) == want, s"column stem('$in')")
  }

  test("property: Column and String forms agree on random tokens, " +
      "including code points above the BMP") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    // bias toward s-endings and the rule suffixes so every branch is hit
    val suffixes = Seq("", "s", "ss", "us", "es", "ies", "aies", "eies",
      "aes", "oes", "ees", "ys")
    val alph = "abceiosux𝕏" // the astral char stresses code-point counting
    val words = (1 to 400).map { _ =>
      val base = (0 until rnd.nextInt(5)).map(_ =>
        alph.charAt(rnd.nextInt(alph.length - 2))).mkString
      val astral = if (rnd.nextInt(4) == 0) "𝕏" else ""
      astral + base + suffixes(rnd.nextInt(suffixes.length))
    }.distinct
    val got = words.toDF("t")
      .select(col("t"), EnglishMinimalStem.stem(col("t")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (w <- words)
      assert(got(w) == EnglishMinimalStem.stemString(w),
        s"divergence on '$w' (${w.toList.map(_.toInt)})")
  }

  test("the stemmer is idempotent (every output is a fixed point)") {
    val rnd = new scala.util.Random(99)
    val suffixes = Seq("s", "ss", "us", "es", "ies", "aes", "oes", "ees")
    val words = table.map(_._1) ++ (1 to 300).map { _ =>
      (0 until rnd.nextInt(6)).map(_ =>
        ('a' + rnd.nextInt(26)).toChar).mkString +
        suffixes(rnd.nextInt(suffixes.length))
    }
    for (w <- words) {
      val once = EnglishMinimalStem.stemString(w)
      assert(EnglishMinimalStem.stemString(once) == once,
        s"'$w' -> '$once' -> '${EnglishMinimalStem.stemString(once)}'")
    }
  }

  test("unknown analyzer is refused loudly") {
    val e = intercept[IllegalArgumentException](
      EnglishMinimalStem.analyzeTerm("porter", "dogs"))
    assert(e.getMessage.contains("unknown analyzer"))
  }

  test("analyzeTokens(english) stems in place; standard is identity") {
    import spark.implicits._
    val df = Seq("dogs chase queries").toDF("text")
    val r = df.select(
      EnglishMinimalStem.analyzeTokens("english",
        TextAnalysis.tokens(col("text"))).as("e"),
      EnglishMinimalStem.analyzeTokens("standard",
        TextAnalysis.tokens(col("text"))).as("s")).head()
    assert(r.getSeq[String](0) == Seq("dog", "chase", "query"))
    assert(r.getSeq[String](1) == Seq("dogs", "chase", "queries"))
  }
}
