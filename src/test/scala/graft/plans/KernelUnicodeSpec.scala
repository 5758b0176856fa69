package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Adversarial-input differentials for the native per-document sketch
  * kernels vs their composed-builtin HOF references. The oracle corpus
  * is ASCII-ish, so the corpus-level differentials in DedupSpec never
  * exercise unicode lowercasing (Turkish dotted I, final sigma, sharp
  * s), combining marks, exotic whitespace, or the short-document null
  * contract — this suite pins them explicitly for every kernel and
  * shingle width the library ships.
  */
class KernelUnicodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val texts = Seq(
    "İstanbul İZMİR ıI dotted dotless pad",
    "ÄÖÜ ß STRASSE GROß pad pad",
    "ΣΙΓΜΑ ΤΕΛΟΣ σίγμα pad pad",
    "ЛОРЕМ ИПСУМ ДОЛОР pad pad",
    "中文 没有 大小写 标记 pad",
    "emoji 😀😀 mixed 🚀 ASCII pad",
    "á combining é́ marks pad pad",
    "tab\tsep\nnewlinevtab\ffeed\rcr pad",
    "  leading and trailing   ",
    "double  space   runs between tokens pad",
    "UPPER lower MiXeD case case case",
    "repeated repeated repeated repeated",
    "#version: 0.2 hash #prefixed tokens pad",
    "one",
    "one two",
    " \t\n\f\r ",
    ""
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def df = texts.toDF("id", "text")

  test("TokenMinHash == xxhash64 HOF reference on adversarial strings, n=1..3") {
    for (n <- 1 to 3) {
      val nat = df.select($"id", TokenMinHash($"text", n, 8).as("s"))
        .filter($"s".isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val hof = df
        .select($"id", graft.functions.TextAnalysis.tokens($"text").as("tk"))
        .filter(size($"tk") >= n)
        .select($"id", transform($"tk", t => xxhash64(t)).as("th"))
        .select($"id",
          transform(sequence(lit(1), size($"th") - lit(n - 1)),
            i => xxhash64((0 until n).map(o =>
              element_at($"th", i + o)): _*)).as("hs"))
        .select($"id", graft.operators.Dedup.minhashFromHashes($"hs", 8).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(nat.keySet == hof.keySet, s"n=$n null contract drifted")
      val bad = hof.keys.filter(k => nat(k) != hof(k)).toSeq.sorted
      assert(bad.isEmpty, s"n=$n native != HOF for ids $bad")
    }
  }

  test("TokenMinHashPortable == md5 HOF reference on adversarial strings, n=1..3") {
    for (n <- 1 to 3) {
      val nat = df.select($"id", TokenMinHashPortable($"text", n, 8).as("s"))
        .filter($"s".isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val hof = df
        .select($"id",
          graft.operators.Dedup.portableShingleHashes($"text", n).as("hs"))
        .filter(size($"hs") >= 1)
        .select($"id",
          graft.operators.Dedup.minhashFromHashesPortable($"hs", 8).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(nat.keySet == hof.keySet, s"n=$n null contract drifted")
      val bad = hof.keys.filter(k => nat(k) != hof(k)).toSeq.sorted
      assert(bad.isEmpty, s"n=$n native != HOF for ids $bad")
    }
  }

  test("TokenSimHash == HOF reference on adversarial strings") {
    val nat = df.select($"id", TokenSimHash($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = df.select($"id",
        graft.functions.TextAnalysis.simhash64Hof($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bad = hof.keys.filter(k => nat.get(k) != hof.get(k)).toSeq.sorted
    assert(bad.isEmpty, s"native != HOF for ids $bad")
  }
}
