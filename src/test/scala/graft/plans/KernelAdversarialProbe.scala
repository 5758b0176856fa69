package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class KernelAdversarialProbe extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("probe: unicode lowercase parity between kernels and Spark lower()") {
    val texts = Seq(
      "İstanbul İZMİR ıI", // Turkish dotted/dotless I
      "ÄÖÜ ß STRASSE", // sharp s
      "ΣΙΓΜΑ ΤΕΛΟΣ", // Greek final sigma
      "ЛОРЕМ ИПСУМ ДОЛОР", // Cyrillic
      "中文 没有 大小写 标记",
      "emoji 😀😀 mixed ASCII",
      "aé́ combining",
      "İIı mixed dots"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t + " pad pad pad") }
    val df = texts.toDF("id", "text")
    val nat = df.select($"id", TokenMinHash($"text", 3, 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = df
      .select($"id", graft.functions.TextAnalysis.tokens($"text").as("tk"))
      .filter(size($"tk") >= 3)
      .select($"id", transform($"tk", t => xxhash64(t)).as("th"))
      .select($"id",
        transform(sequence(lit(1), size($"th") - lit(2)),
          i => xxhash64(element_at($"th", i),
            element_at($"th", i + 1), element_at($"th", i + 2))).as("hs"))
      .select($"id", graft.operators.Dedup.minhashFromHashes($"hs", 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val bad = hof.keys.filter(k => nat.get(k) != hof.get(k)).toSeq.sorted
    assert(bad.isEmpty, s"native != HOF for ids $bad")
  }
}
