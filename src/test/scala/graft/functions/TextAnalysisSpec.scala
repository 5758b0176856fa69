package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c).head().get(0)

  test("normalizeUnicode: NFC composes combining marks, NFKC folds " +
    "compatibility forms, bad form refuses") {
    val pre = "caf\u00e9"                 // precomposed
    val dec = "cafe\u0301"                // e + combining acute
    assert(one(TextAnalysis.normalizeUnicode($"t"), dec) == pre)
    assert(one(TextAnalysis.normalizeUnicode($"t"), pre) == pre)
    assert(one(TextAnalysis.normalizeUnicode($"t"), "plain ascii") ==
      "plain ascii")
    // NFC preserves the \ufb01 ligature; NFKC folds it to "fi"
    assert(one(TextAnalysis.normalizeUnicode($"t"), "\ufb01n") == "\ufb01n")
    assert(one(TextAnalysis.normalizeUnicode($"t", "NFKC"), "\ufb01n") == "fin")
    // NFD decomposes the precomposed form back out
    assert(one(TextAnalysis.normalizeUnicode($"t", "NFD"), pre) == dec)
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.normalizeUnicode($"t", "NFX")
    }.getMessage.contains("unknown form"))
    // null flows through untouched
    val r = Seq[String](null).toDF("t")
      .select(TextAnalysis.normalizeUnicode($"t")).head()
    assert(r.isNullAt(0))
  }

  test("stripHtml: script/style content gone, tags to spaces, " +
    "double-escape-safe entities, whitespace collapsed") {
    def h(s: String) = one(TextAnalysis.stripHtml($"t"), s)
    assert(h("<p>Hello <b>world</b></p>") == "Hello world")
    // script CONTENT (including its '<') must vanish, case-insensitive
    assert(h("before<SCRIPT>if (1 < 2) alert('x')</script>after") ==
      "before after")
    assert(h("a<style>p { color: red }</style>b") == "a b")
    // entity order: &amp; last, so double-escapes stop one level down
    assert(h("R&amp;D &lt;tag&gt; &amp;lt;still-escaped") ==
      "R&D <tag> &lt;still-escaped")
    assert(h("one&nbsp;&nbsp;two \n three") == "one two three")
    // plain text passes through trimmed
    assert(h("  nothing to strip  ") == "nothing to strip")
  }

  test("normalizeUrl: RFC 3986 syntax normalization + curation extras") {
    def n(s: String) = one(TextAnalysis.normalizeUrl($"t"), s)
    // scheme + host lowered, path case preserved, fragment dropped
    assert(n("HTTPS://Example.COM/Path/A#frag") == "https://example.com/Path/A")
    // default port stripped per scheme; non-default ports kept
    assert(n("https://example.com:443/a") == "https://example.com/a")
    assert(n("http://example.com:80/a") == "http://example.com/a")
    assert(n("https://example.com:8443/a") == "https://example.com:8443/a")
    assert(n("http://example.com:443/a") == "http://example.com:443/a")
    // www. stripped (default), empty path -> '/', query preserved
    assert(n(" https://www.example.com ") == "https://example.com/")
    assert(n("https://example.com/a?q=1&r=2") == "https://example.com/a?q=1&r=2")
    // stripQuery drops it; stripWww=false keeps the www
    assert(one(TextAnalysis.normalizeUrl($"t", stripQuery = true),
      "https://example.com/a?q=1") == "https://example.com/a")
    assert(one(TextAnalysis.normalizeUrl($"t", stripWww = false),
      "https://www.example.com/a") == "https://www.example.com/a")
    // not a URL: returned trimmed, untouched
    assert(n("  just a title  ") == "just a title")
    // userinfo is case-significant (RFC 3986 §6.2.2.1 normalizes only
    // scheme + host) and precedes the www/port handling
    assert(n("https://TokenA@Example.COM:443/x") ==
      "https://TokenA@example.com/x")
    assert(n("https://Bob@www.example.com") == "https://Bob@example.com/")
  }

  test("dedupByUrl: variants collapse keep-first, nulls all kept") {
    val docs = Seq(
      (1L, "https://www.Example.com/p"),
      (2L, "HTTPS://example.com:443/p#x"),   // same page as 1
      (3L, "http://example.com/p"),          // different scheme
      (4L, null.asInstanceOf[String]),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "url")
    val kept = graft.operators.Dedup.dedupByUrl(docs, "id", "url")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("stripAccents folds composed ≡ decomposed, leaves ASCII/CJK/marksless intact") {
    val df = Seq(
      (1L, "caf\u00e9 na\u00efve se\u00f1or z\u00fcrich"), // precomposed
      (2L, "cafe\u0301 nai\u0308ve sen\u0303or zu\u0308rich"), // combining
      (3L, "plain ascii stays put"),
      (4L, "中文 emoji 😀 stays")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.stripAccents(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "cafe naive senor zurich")
    assert(out(2L) === out(1L)) // both spellings fold to the same bytes
    assert(out(3L) === "plain ascii stays put")
    assert(out(4L) === "中文 emoji 😀 stays")
    // null-safe
    val n = Seq((1L, Option.empty[String])).toDF("id", "text")
      .select(TextAnalysis.stripAccents(col("text"))).collect().head
    assert(n.isNullAt(0))
  }

  test("tokens lowercase, split on whitespace runs, drop empties") {
    assert(one(TextAnalysis.tokens($"t"), "  Hello   WORLD  ") ==
      Seq("hello", "world"))
    assert(one(TextAnalysis.tokenCount($"t"), "") == 0L)
    assert(one(TextAnalysis.tokenCount($"t"), "a b\tc\nd") == 4L)
  }

  test("shingles produce n-grams and empty below n") {
    assert(one(TextAnalysis.shingles($"t", 3), "a b c d") ==
      Seq("a b c", "b c d"))
    assert(one(TextAnalysis.shingles($"t", 3), "a b") == Seq())
  }

  test("fingerprint is order-sensitive and deterministic") {
    val f1 = one(TextAnalysis.fingerprint($"t"), "a b c")
    val f2 = one(TextAnalysis.fingerprint($"t"), "a b c")
    val f3 = one(TextAnalysis.fingerprint($"t"), "c b a")
    assert(f1 == f2 && f1 != f3)
  }

  test("language id picks marker-heavy language, und on no markers") {
    assert(one(TextAnalysis.languageId($"t"), "the cat and the dog") == "en")
    assert(one(TextAnalysis.languageId($"t"), "der hund und die katze ist") == "de")
    assert(one(TextAnalysis.languageId($"t"), "xyz qrs tuv") == "und")
  }

  test("quality features on empty and normal docs") {
    val q = one(TextAnalysis.qualityFeatures($"t"), "the fox! runs")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(q.getAs[Long]("n_tokens") == 3L)
    assert(q.getAs[Double]("stopword_ratio") > 0.3)
    assert(q.getAs[Double]("non_alnum_ratio") > 0.0)
    val e = one(TextAnalysis.qualityFeatures($"t"), "")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(e.getAs[Long]("n_tokens") == 0L)
  }

  test("es_match variants") {
    val df = Seq("the quick brown fox", "slow green turtle").toDF("t")
    assert(df.filter(EsMatch.matchAny($"t", "fox turtle")).count() == 2)
    assert(df.filter(EsMatch.matchAll($"t", "quick fox")).count() == 1)
    assert(df.filter(EsMatch.matchPhrase($"t", "brown fox")).count() == 1)
    assert(df.filter(EsMatch.matchPhrase($"t", "fox brown")).count() == 0)
    assert(df.filter(EsMatch.matchFuzzy($"t", "quik", 1)).count() == 1)
  }

  test("subword run-counting regex ≡ historical lookbehind split (differential)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ0189 .,-_!?/äöπ文\t"
    val samples = Seq("", "a", "a1b2", "  12ab!cd34  ", "π文9") ++
      (0 until 200).map(_ => (0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = samples.toDF("t")
    val diff = df.select(
        TextAnalysis.subwordCountEstimate($"t").as("a"),
        TextAnalysis.subwordCountEstimateSplit($"t").as("b"))
      .filter($"a" =!= $"b")
    assert(diff.count() == 0)
  }

  test("fingerprintPortable matches a driver-side md5 fold and is order-sensitive") {
    def md5hash32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    def expected(text: String): Long =
      text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .foldLeft(0L)((acc, t) => (acc * 31 + md5hash32(t)) % 1000000007L)
    for (s <- Seq("", "a", "a b c", "The Quick  brown\tFox", "x y z x y z")) {
      assert(one(TextAnalysis.fingerprintPortable($"t"), s) == expected(s), s)
    }
    assert(one(TextAnalysis.fingerprintPortable($"t"), "a b c") !=
      one(TextAnalysis.fingerprintPortable($"t"), "c b a"))
  }

  test("simhashPortable: bag-of-words semantics, 60-bit range, md5 replay") {
    def one(s: String): Long =
      Seq(s).toDF("t").select(TextAnalysis.simhashPortable($"t"))
        .collect()(0).getLong(0)
    // order-insensitive (a bag sketch), token-sensitive
    assert(one("alpha beta gamma") == one("gamma Beta ALPHA"))
    assert(one("alpha beta gamma") != one("alpha beta delta"))
    // single token: the sketch IS the token's 60-bit md5 prefix
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    assert(one("alpha") == java.lang.Long.parseLong(h, 16))
    assert((one("alpha beta") >>> 60) == 0L)
  }

  test("FromTokens forms are bit-identical to the convenience forms") {
    val texts = Seq("the cat and the dog", "der hund und die katze ist",
      "xyz", "", "el la de los 7 que es").toDF("t")
    val staged = texts.select($"t", TextAnalysis.tokens($"t").as("toks"))
    val diff = staged.select(
        TextAnalysis.languageId($"t").as("a"),
        TextAnalysis.languageIdFromTokens($"toks").as("b"),
        TextAnalysis.qualityFeatures($"t").as("qa"),
        TextAnalysis.qualityFeaturesFromTokens($"t", $"toks").as("qb"))
      .filter($"a" =!= $"b" || $"qa" =!= $"qb")
    assert(diff.count() == 0)
  }

  test("luhnValid matches the textbook checksum; redactPiiExtended " +
      "gates cards on validity and sweeps IPs") {
    import spark.implicits._
    // reference implementation straight from ISO/IEC 7812
    def luhnRef(s: String): Boolean = {
      val ds = s.map(_ - '0')
      val total = ds.reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      total % 10 == 0
    }
    val rnd = new scala.util.Random(5)
    val nums = Seq("4111111111111111", "4111111111111112", "79927398713",
      "79927398710", "0", "00") ++
      (1 to 200).map(_ => (1 to 16).map(_ => rnd.nextInt(10)).mkString)
    val got = nums.toDF("n")
      .select($"n", TextAnalysis.luhnValid($"n").as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for (n <- nums) assert(got(n) == luhnRef(n), n)
    val red = Seq(
      "pay 4111-1111-1111-1111 from 10.0.0.1",
      "order 4111 1111 1111 1112 is not a card",
      "id 1234567890123456 and mail a@b.co").toDF("t")
      .select(TextAnalysis.redactPiiExtended($"t"))
      .collect().map(_.getString(0)).toSeq
    assert(red(0) == "pay <CC> from <IP>", red(0))
    assert(red(1) == "order 4111 1111 1111 1112 is not a card", red(1))
    assert(red(2) == "id 1234567890123456 and mail <EMAIL>", red(2))
  }

  test("highlightPhrase wraps adjacency occurrences as units, merges " +
      "overlaps, keeps original bytes, NULLs non-matches") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox quick brown end"),
      (2L, "a a a b"),           // overlapping "a a" -> one merged span
      (3L, "quick alone brown"), // terms present, no adjacency -> NULL
      (4L, "x"),                 // shorter than the phrase -> NULL
      (5L, "Quick Brown tail")   // analyzed match, original bytes kept
    ).toDF("id", "t")
    val got = df.select($"id",
        graft.functions.EsMatch.highlightPhrase($"t", "quick brown")
          .as("hl"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1).contains(
      "the <em>quick brown</em> fox <em>quick brown</em> end"), got(1))
    assert(got(3).isEmpty && got(4).isEmpty)
    assert(got(5).contains("<em>Quick Brown</em> tail"), got(5))
    val aa = df.filter($"id" === 2)
      .select(graft.functions.EsMatch.highlightPhrase($"t", "a a"))
      .head().getString(0)
    assert(aa == "<em>a a a</em> b", aa)
  }

  test("highlightFragments keeps the best windows, renders in " +
      "document order, NULLs non-matches") {
    import graft.functions.EsMatch.highlightFragments
    // 9 tokens, window size 3 → windows [t1..t3][t4..t6][t7..t9];
    // "cat" hits window 0 once and window 2 twice → top-1 keeps the
    // LAST window despite document order; top-2 keeps both, rendered
    // in document order
    val df = Seq((1L, "cat a b x y z cat cat q"),
      (2L, "nothing here at all")).toDF("id", "t")
    val top1 = df.filter($"id" === 1).select(
      highlightFragments($"t", "cat", fragTokens = 3,
        numFragments = 1)).head().getString(0)
    assert(top1 == "<em>cat</em> <em>cat</em> q", top1)
    val top2 = df.filter($"id" === 1).select(
      highlightFragments($"t", "cat", fragTokens = 3,
        numFragments = 2)).head().getString(0)
    assert(top2 == "<em>cat</em> a b ... <em>cat</em> <em>cat</em> q",
      top2)
    // non-matching doc → NULL (ES omits its highlight entry)
    assert(df.filter($"id" === 2).select(
      highlightFragments($"t", "cat", fragTokens = 3))
      .head().isNullAt(0))
    // english chain analyzes both sides; display keeps original bytes
    val st = Seq("The Filters run").toDF("t").select(
      highlightFragments($"t", "filter", "english", 5, 2))
      .head().getString(0)
    assert(st == "The <em>Filters</em> run", st)
  }
}
