package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ObjectivesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (0L until 80L).map(i =>
      (i, if (i == 77L) null else s"doc $i " + ("x" * (i % 9).toInt)))
    .toDF("id", "text")

  test("FIM: reassembly invariant, determinism, rate edges, null " +
      "passthrough, applied fraction tracks the rate") {
    val out = Objectives.fimTransform(docs, "id", "text",
        fimRate = 0.5, seed = 7)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    val orig = docs.collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    var applied = 0
    for ((id, fim, t) <- out) {
      if (!fim) assert(t == orig(id), s"id $id passthrough")
      else {
        applied += 1
        // <PRE>p<SUF>s<MID>m must reassemble to p + m + s
        assert(t.startsWith("<PRE>"), t)
        val sufAt = t.indexOf("<SUF>"); val midAt = t.indexOf("<MID>")
        assert(sufAt >= 5 && midAt > sufAt, t)
        val p = t.substring(5, sufAt)
        val sfx = t.substring(sufAt + 5, midAt)
        val m = t.substring(midAt + 5)
        assert(p + m + sfx == orig(id), s"id $id reassembly")
      }
    }
    assert(out.find(_._1 == 77L).get._3 == null) // null text untouched
    assert(applied > 15 && applied < 65, s"applied $applied of 80")
    // deterministic across runs
    val again = Objectives.fimTransform(docs, "id", "text",
      fimRate = 0.5, seed = 7).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(out.toSeq == again.toSeq)
    // a different seed transforms a different subset
    val other = Objectives.fimTransform(docs, "id", "text",
      fimRate = 0.5, seed = 8).collect().map(r => r.getBoolean(1)).toSeq
    assert(other != out.map(_._2).toSeq)
    // rate edges
    assert(Objectives.fimTransform(docs, "id", "text", fimRate = 0.0)
      .filter($"fim_applied").count() == 0)
    assert(Objectives.fimTransform(docs, "id", "text", fimRate = 1.0)
      .filter(!$"fim_applied").count() == 1) // only the null-text row
    intercept[IllegalArgumentException] {
      Objectives.fimTransform(docs, "id", "text", fimRate = 1.5)
    }
  }

  test("span corruption: interleaving inputs and targets reconstructs " +
      "the token stream; sentinel numbering, rate, edges") {
    val corpus = (0L until 40L).map(i =>
        (i, (0 until (i % 37).toInt).map(t => s"w$t").mkString(" ")))
      .toDF("id", "text") // includes len 0 and lens below one block
    val out = Objectives.spanCorrupt(corpus, "id", "text",
        blockSize = 8, maxSpan = 3, seed = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    def sentSplit(s: String): Seq[(Int, Seq[String])] = {
      val re = "<extra_id_(\\d+)>".r
      val ks = re.findAllMatchIn(s).map(_.group(1).toInt).toSeq
      val parts = re.split(s).toSeq.drop(1) // text before first sent is ""
        .map(_.trim.split("\\s+").filter(_.nonEmpty).toSeq)
      ks.zipAll(parts, -1, Seq.empty)
    }
    for (i <- 0L until 40L) {
      val n = (i % 37).toInt
      val orig = (0 until n).map(t => s"w$t")
      val (inp, tgt, masked) = out(i)
      val inParts = sentSplit(inp)
      val tgtParts = sentSplit(tgt)
      // sentinels number 0..nBlocks-1 in both, + the terminator
      val nBlocks = math.ceil(n / 8.0).toInt
      assert(inParts.map(_._1) == (0 until nBlocks), s"id $i inputs")
      assert(tgtParts.map(_._1) == (0 to nBlocks), s"id $i targets")
      assert(tgtParts.last._2.isEmpty, s"id $i terminator")
      // interleave: hidden_k ++ kept_k re-forms the original stream
      val rebuilt = (0 until nBlocks).flatMap(k =>
        tgtParts(k)._2 ++ inParts(k)._2)
      assert(rebuilt == orig, s"id $i reconstruction")
      assert(masked == tgtParts.dropRight(1).map(_._2.size).sum)
      // every window masks between 1 and maxSpan tokens (or the whole
      // short window)
      tgtParts.dropRight(1).foreach { case (k, hidden) =>
        val blockLen = math.min(8, n - k * 8)
        assert(hidden.size >= 1 && hidden.size <= math.min(3, blockLen),
          s"id $i window $k masked ${hidden.size} of $blockLen")
      }
    }
    // zero-token doc: empty inputs, lone terminator
    assert(out(0L) == (("", "<extra_id_0>", 0L)))
    // contracts
    intercept[IllegalArgumentException](
      Objectives.spanCorrupt(corpus, "id", "text", blockSize = 1))
    intercept[IllegalArgumentException](
      Objectives.spanCorrupt(corpus, "id", "text", maxSpan = 16))
    intercept[IllegalArgumentException](
      Objectives.spanCorrupt(corpus, "id", "text", sentinel = "<mask>"))
  }

  test("MLM masking: token-count invariant, labels cover exactly the " +
      "selected positions, 80/10/10 shape, vocab vs in-doc draws") {
    val corpus = (0L until 60L).map(i =>
        (i, (0 until 40).map(t => s"w${(t + i) % 11}").mkString(" ")))
      .toDF("id", "text")
    val out = Objectives.mlmMask(corpus, "id", "text",
        maskRate = 0.3, seed = 3)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getSeq[String](2), r.getLong(3)))
    val orig = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    var masked = 0; var kept = 0; var changedOther = 0
    for ((id, text, labels, n) <- out) {
      val toks = text.split(" ").toSeq
      assert(toks.size == orig(id).size, s"id $id token count")
      assert(labels.size == n && n > 0, s"id $id label count")
      val selPos = labels.map(_.split(":")(0).toInt).toSet
      for (l <- labels) {
        val Array(p, w) = l.split(":")
        assert(orig(id)(p.toInt) == w, s"id $id label $l")
      }
      for (p <- toks.indices) {
        val (o, c) = (orig(id)(p), toks(p))
        if (!selPos.contains(p)) assert(c == o, s"id $id pos $p")
        else if (c == "[MASK]") masked += 1
        else if (c == o) kept += 1
        else { changedOther += 1; assert(c.startsWith("w"), c) }
      }
    }
    val total = masked + kept + changedOther
    assert(masked > total * 2 / 3, s"$masked of $total masked")
    assert(kept > 0 && changedOther > 0, s"kept $kept other $changedOther")
    // a provided vocabulary pool draws replacements from it
    val withVocab = Objectives.mlmMask(corpus, "id", "text",
        maskRate = 0.9, seed = 3, randomTokens = Seq("ZZZ"))
      .collect().flatMap(_.getString(1).split(" "))
    assert(withVocab.contains("ZZZ"))
    // null text passes through empty
    val nulls = Seq((1L, null: String)).toDF("id", "text")
    val nr = Objectives.mlmMask(nulls, "id", "text").head()
    assert(nr.getString(1) == "" && nr.getSeq[String](2).isEmpty &&
      nr.getLong(3) == 0L)
  }

  test("sftLossMask: boundary from the RENDERED prefix, glue-aware; " +
    "null rows drop; non-whitespace-tail separator refuses") {
    val df = Seq((1L, Some("hello world"), Some("the answer")),
      (2L, None: Option[String], Some("x")),
      (3L, Some("y"), None: Option[String]))
      .toDF("id", "prompt", "response")
    val clean = Objectives.sftLossMask(df, "id", "prompt", "response")
      .collect()
    assert(clean.length == 1) // null prompt/response rows drop
    val r = clean.head
    assert(r.getString(1) ==
      "<|user|> hello world <|assistant|> the answer")
    assert(r.getLong(2) == 6L && r.getLong(3) == 4L)
    // a separator with NO leading space glues into the prompt's last
    // token: the naive per-part sum says 4, the rendered prefix says 3
    val glued = Objectives.sftLossMask(df, "id", "prompt", "response",
      separator = "<|assistant|>: ").collect().head
    assert(glued.getString(1) ==
      "<|user|> hello world<|assistant|>: the answer")
    assert(glued.getLong(2) == 5L && glued.getLong(3) == 3L)
    // a separator that does not END in whitespace leaves the
    // boundary undefined — refused, never a silently-shifted mask
    intercept[IllegalArgumentException] {
      Objectives.sftLossMask(df, "id", "prompt", "response",
        separator = " <|assistant|>")
    }
  }

  test("sftMultiTurnMasks: additive boundaries per turn, unknown " +
    "role refuses in-plan, gluing markers refuse at call") {
    val convs = Seq(
      (1L, Seq(("user", "hello there"), ("assistant", "hi"),
        ("user", "bye"))),
      (2L, Seq(("system", "rules"), ("assistant", "ok then"))))
      .toDF("id", "raw")
      .withColumn("turns", expr(
        "transform(raw, t -> struct(t._1 as role, t._2 as content))"))
      .drop("raw")
    val out = Objectives.sftMultiTurnMasks(convs, "id", "turns")
      .orderBy("id", "turn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // conv 1: pieces = 1+2, 1+1, 1+1 tokens -> spans [0,3) [3,5) [5,7)
    // conv 2: pieces = 1+1, 1+2 -> [0,2) [2,5)
    assert(out.toSeq == Seq(
      (1L, 0L, "user", 0L, 3L, 7L),
      (1L, 1L, "assistant", 3L, 5L, 7L),
      (1L, 2L, "user", 5L, 7L, 7L),
      (2L, 0L, "system", 0L, 2L, 5L),
      (2L, 1L, "assistant", 2L, 5L, 5L)), out.toSeq)
    // an unmapped role refuses inside the plan
    val bad = Seq((1L, Seq(("robot", "beep"))))
      .toDF("id", "raw")
      .withColumn("turns", expr(
        "transform(raw, t -> struct(t._1 as role, t._2 as content))"))
      .drop("raw")
    val e = intercept[Exception] {
      Objectives.sftMultiTurnMasks(bad, "id", "turns").collect()
    }
    assert(e.getMessage.contains("unknown role"), e.getMessage)
    // a marker that could glue across a seam refuses at call time
    intercept[IllegalArgumentException] {
      Objectives.sftMultiTurnMasks(convs, "id", "turns",
        markers = Map("user" -> "<|user|> "))
    }
  }
  test("groupAdvantages: GRPO population-std normalization, RLOO " +
      "leave-one-out baseline, degenerate groups pin to 0") {
    val df = Seq(
      ("p1", 1L, 1.0), ("p1", 2L, 2.0), ("p1", 3L, 3.0),
      ("p2", 4L, 5.0),                  // singleton group
      ("p3", 5L, 7.0), ("p3", 6L, 7.0)  // zero-variance group
    ).toDF("prompt", "cid", "reward")
    val out = Objectives.groupAdvantages(df, "prompt", "reward")
      .collect().map(r => r.getAs[Long]("cid") ->
        (r.getAs[Double]("grpo_adv"), r.getAs[Double]("rloo_adv")))
      .toMap
    // p1: mean 2, pop std sqrt(2/3); rloo for r=1: 1 - (5/2) = -1.5
    val std = math.sqrt(2.0 / 3)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(1L) == ((r6((1 - 2) / std), -1.5)))
    assert(out(3L) == ((r6((3 - 2) / std), 1.5)))
    assert(out(2L) == ((0.0, 0.0)))
    // singleton and zero-variance: 0.0, never NaN
    assert(out(4L) == ((0.0, 0.0)))
    assert(out(5L) == ((0.0, 0.0)))
    // plan: group stats broadcast back — no Window
    val plan = Objectives.groupAdvantages(df, "prompt", "reward")
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}

