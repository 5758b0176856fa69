package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class KeywordsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tf-idf keywords: hand-computed smooth-idf scores, term-asc " +
    "ties, per-doc k cut; rare terms beat ubiquitous ones") {
    // 3 docs; "common" appears in all, "rare" in doc 0 only (twice)
    val docs = Seq(
      (0L, "common rare rare zeta"),
      (1L, "common beta beta"),
      (2L, "common beta")).toDF("id", "text")
    val out = Keywords.keywordsTfIdf(docs, "id", "text", k = 2)
      .orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    def idf(df: Int) = math.log(4.0 / (df + 1.0)) + 1.0
    def rhu(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // doc 0: rare tf=2 df=1 -> 2*(ln(2)+1); zeta tf=1 df=1; common
    // tf=1 df=3 -> ln(1)+1 = 1.0 loses to zeta (~1.69)
    assert(out.filter(_._1 == 0L).toSeq == Seq(
      (0L, 1L, "rare", 2L, rhu(2 * idf(1))),
      (0L, 2L, "zeta", 1L, rhu(idf(1)))))
    // doc 1: beta tf=2 df=2 -> 2*(ln(4/3)+1) beats common 1.0
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 1L, "beta", 2L, rhu(2 * idf(2))),
      (1L, 2L, "common", 1L, rhu(idf(3)))))
    // doc 2: beta (idf ~1.29) beats common (1.0); equal-score ties
    // would order by term asc — exercised implicitly by rank
    // determinism across runs
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq("beta", "common"))
    intercept[IllegalArgumentException] {
      Keywords.keywordsTfIdf(docs, "id", "text", k = 0)
    }
  }

  test("window partitions per document — no corpus-wide single " +
    "partition; null/empty docs yield no rows") {
    val docs = Seq((0L, "a b"), (1L, null: String), (2L, "   "))
      .toDF("id", "text")
    val out = Keywords.keywordsTfIdf(docs, "id", "text")
    assert(out.collect().map(_.getLong(0)).toSet == Set(0L))
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the rank window partitions on the id column (bounded groups),
    // never on an empty partition spec
    assert(!p.contains("Window [") ||
      p.contains("partitionBy") || p.contains("windowspecdefinition"),
      "unexpected window shape:\n" + p)
  }

  test("significant terms: hand-computed JLH over doc frequencies; " +
    "only positively-significant terms; per-source k cut") {
    // source A: 2 docs, "apple" in both, "common" in both;
    // source B: 2 docs, "berry" in one, "common" in both.
    val docs = Seq(
      (0L, "A", "apple common"),
      (1L, "A", "apple common extra"),
      (2L, "B", "berry common"),
      (3L, "B", "common")).toDF("id", "src", "text")
    val out = Keywords.significantTerms(docs, "id", "text", "src", k = 2)
      .orderBy("src", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    def rhu(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def jlh(dfFg: Int, nFg: Int, dfBg: Int, nBg: Int) = {
      val (p, q) = (dfFg.toDouble / nFg, dfBg.toDouble / nBg)
      rhu((p - q) * (p / q))
    }
    // "common" is in every doc: fg% == bg% == 1 -> NOT significant.
    // A: apple fg 2/2 vs bg 2/4 -> (1-.5)*(1/.5)=1; extra fg 1/2 vs
    // bg 1/4 -> (.5-.25)*2 = .5
    assert(out.filter(_._1 == "A").toSeq == Seq(
      ("A", 1L, "apple", 2L, 2L, jlh(2, 2, 2, 4)),
      ("A", 2L, "extra", 1L, 1L, jlh(1, 2, 1, 4))))
    // B: only berry (fg 1/2 vs bg 1/4)
    assert(out.filter(_._1 == "B").toSeq == Seq(
      ("B", 1L, "berry", 1L, 1L, jlh(1, 2, 1, 4))))
    assert(!out.exists(_._3 == "common"))
    // within-doc repeats count once (doc frequency, not term
    // frequency): doubling a token changes nothing
    val rep = Seq((0L, "A", "apple apple"), (1L, "B", "x"))
      .toDF("id", "src", "text")
    val r2 = Keywords.significantTerms(rep, "id", "text", "src", k = 1)
      .filter($"src" === "A").head()
    assert(r2.getLong(3) == 1L && r2.getLong(4) == 1L)
    intercept[IllegalArgumentException] {
      Keywords.significantTerms(docs, "id", "text", "src", k = 0)
    }
  }

  test("significant_text: filter_duplicate_text de-weights a copied " +
    "passage; the owner doc keeps it; short docs untouched") {
    // a 6-token boilerplate passage copied into BOTH src-A docs and
    // one src-B doc; doc 0 owns it. Unfiltered, every boilerplate
    // term has df_fg 2/2 in A and dominates; filtered, only doc 0
    // counts them (df_fg 1) and A's genuinely-distinctive 'apple'
    // (df 2) outranks them.
    val boiler = "click here to subscribe right now"
    val docs = Seq(
      (0L, "A", s"apple pie $boiler"),
      (1L, "A", s"apple tart $boiler"),
      (2L, "B", s"berry jam $boiler"),
      (3L, "B", "berry toast")).toDF("id", "src", "text")

    val unfiltered = Keywords.significantText(docs, "id", "text",
      "src", k = 9, filterDuplicateText = false)
      .filter($"src" === "A").collect()
    // unfiltered: every boilerplate term counts in BOTH src-A docs
    // (df_fg 2) and in 3 of 4 docs corpus-wide
    val uClick = unfiltered.find(_.getString(2) == "click").get
    assert(uClick.getLong(3) == 2L && uClick.getLong(4) == 3L)

    val filtered = Keywords.significantText(docs, "id", "text",
      "src", k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val a = filtered.filter(_._1 == "A")
    // apple: fg 2/2, bg 2/4 — the clear top; boilerplate terms now
    // have fg df 1 (doc 0 only) bg 1 — same score as 'pie'/'tart'
    assert(a.head == ("A", 1L, "apple", 2L, 2L), a.toSeq)
    // doc 2's copy was dropped: no boilerplate term has df_bg > 1
    val boilerRows = filtered.filter(r =>
      boiler.split(" ").contains(r._3))
    assert(boilerRows.forall(r => r._4 == 1L && r._5 == 1L),
      boilerRows.toSeq)
    // B keeps berry (fg 2/2) on top — its doc-2 copy lost only the
    // boilerplate positions, not its own words
    val b = filtered.filter(_._1 == "B")
    assert(b.head == ("B", 1L, "berry", 2L, 2L), b.toSeq)

    // a doc shorter than the window contributes no shingles and is
    // never filtered
    val short = Seq((0L, "A", "tiny doc"), (1L, "B", "tiny doc too"))
      .toDF("id", "src", "text")
    val s = Keywords.significantText(short, "id", "text", "src", k = 5)
      .collect()
    assert(s.exists(r => r.getString(2) == "too"), s.toSeq)
    intercept[IllegalArgumentException] {
      Keywords.significantText(docs, "id", "text", "src",
        dupWindow = 1)
    }
  }

  test("significant_text hot-shingle guard: an above-cap shingle " +
      "masks EVERYWHERE (owner included) and skips the window") {
    // the boilerplate shingle occurs 4x; with the cap at 3 it is
    // adjudicated pure boilerplate — even doc 0 (the would-be owner)
    // loses its positions, so no boilerplate term counts anywhere
    val boiler = "click here to subscribe right now"
    val docs = Seq(
      (0L, "A", s"apple pie $boiler"),
      (1L, "A", s"apple tart $boiler"),
      (2L, "B", s"berry jam $boiler"),
      (3L, "B", s"berry toast $boiler")).toDF("id", "src", "text")
    val capped = Keywords.significantText(docs, "id", "text", "src",
      k = 9, maxShingleOccurrences = 3).collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3)))
    assert(!capped.exists(r => boiler.split(" ").contains(r._2)),
      capped.toSeq)
    assert(capped.exists(_._2 == "apple"))
    // at the default cap the same corpus keeps the owner's copy
    // (ownership semantics unchanged below the threshold)
    val owned = Keywords.significantText(docs, "id", "text", "src",
      k = 9).collect().map(_.getString(2))
    assert(owned.contains("click"), owned.toSeq)
    intercept[IllegalArgumentException] {
      Keywords.significantText(docs, "id", "text", "src",
        maxShingleOccurrences = 1)
    }
  }
}
