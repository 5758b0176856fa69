package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class ServingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val f = java.nio.file.Files.createTempDirectory(name).toFile
    f.deleteOnExit(); f.toString
  }

  private def docs = Tables.load(spark, TestSpark.sfDir, "documents")
  private def emb = Tables.load(spark, TestSpark.sfDir, "embeddings")

  private val qv1 = (0 until 64).map(i => ((i * 7) % 13 - 6) / 10.0)
  private val qv2 = (0 until 64).map(i => ((i * 5) % 11 - 5) / 10.0)

  test("searchHybrid == the hand-wired per-query composition on a " +
    "two-query frame") {
    val ipath = tmp("graft-serv-i")
    val vpath = tmp("graft-serv-v")
    InvertedIndex.build(docs, "doc_id", "text", ipath)
    VectorIndex.build(emb, "vec_id", "embedding", vpath, nlist = 8)
    val queries = Seq(
      (1L, Seq("stream", "filter", "join"), qv1),
      (2L, Seq("spark", "hash"), qv2)
    ).toDF("q_id", "terms", "vec")
    val fused = Serving.searchHybrid(queries, ipath, vpath, k = 20,
        perLegK = 30, nprobe = 8, idColName = "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(fused.keySet == Set(1L, 2L))
    for ((qid, terms, qv) <- Seq((1L, Seq("stream", "filter", "join"), qv1),
        (2L, Seq("spark", "hash"), qv2))) {
      val lex = InvertedIndex.searchTopK(spark, ipath, terms, k = 30,
          idColName = "doc_id")
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      val sem = VectorIndex.searchTopK(
        Seq((qid, qv)).toDF("q_id", "vec"), vpath, k = 30, nprobe = 8,
        idColName = "doc_id")
      val hand = Ranking.rrfFuse(
          Seq(lex.select("doc_id", "rank"), sem.select("doc_id", "rank")),
          "doc_id", "rank", k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val slice = fused(qid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(slice == hand, s"q_id=$qid diverged")
      assert(slice.nonEmpty)
    }
  }

  test("rrfFusePerQuery slices == rrfFuse run per query on synthetic " +
    "rankings") {
    val ra = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 12L, 1L))
      .toDF("q", "doc", "rank")
    val rb = Seq((1L, 11L, 1L), (1L, 13L, 2L), (2L, 12L, 1L),
      (2L, 10L, 2L)).toDF("q", "doc", "rank")
    val fused = Ranking.rrfFusePerQuery(Seq(ra, rb), "q", "doc", "rank",
        k = 3, rrfK = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    for (qid <- Seq(1L, 2L)) {
      val one = Ranking.rrfFuse(
          Seq(ra.filter(col("q") === qid).select("doc", "rank"),
            rb.filter(col("q") === qid).select("doc", "rank")),
          "doc", "rank", k = 3, rrfK = 60)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val slice = fused.filter(_._1 == qid).sortBy(_._2)
        .map(t => (t._3, t._4)).toSeq
      assert(slice == one, s"q=$qid diverged")
    }
  }

  test("searchHybrid fusion=linear == hand-wired per-query linearFuse") {
    val ipath = tmp("graft-serv-li")
    val vpath = tmp("graft-serv-lv")
    InvertedIndex.build(docs, "doc_id", "text", ipath)
    VectorIndex.build(emb, "vec_id", "embedding", vpath, nlist = 8)
    val queries = Seq(
      (1L, Seq("stream", "filter", "join"), qv1),
      (2L, Seq("spark", "hash"), qv2)
    ).toDF("q_id", "terms", "vec")
    val fused = Serving.searchHybrid(queries, ipath, vpath, k = 20,
        perLegK = 30, nprobe = 8, idColName = "doc_id",
        fusion = "linear", legWeights = Seq(0.6, 0.4))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(fused.keySet == Set(1L, 2L))
    for ((qid, terms, qv) <- Seq((1L, Seq("stream", "filter", "join"), qv1),
        (2L, Seq("spark", "hash"), qv2))) {
      val lex = InvertedIndex.searchTopK(spark, ipath, terms, k = 30,
        idColName = "doc_id")
      val sem = VectorIndex.searchTopK(
          Seq((qid, qv)).toDF("q_id", "vec"), vpath, k = 30, nprobe = 8,
          idColName = "doc_id")
        .select(col("doc_id"), col("cos").as("score"))
      val hand = Ranking.linearFuse(
          Seq(lex.select("doc_id", "score"), sem),
          "doc_id", "score", Seq(0.6, 0.4), k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val slice = fused(qid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(slice == hand, s"q_id=$qid diverged")
      assert(slice.nonEmpty)
    }
  }

  test("searchHybrid validates perLegK, fusion, and column collisions") {
    val q = Seq((1L, Seq("a"), Seq(1.0))).toDF("q_id", "terms", "vec")
    assert(intercept[IllegalArgumentException] {
      Serving.searchHybrid(q, "/nope", "/nope", k = 10, perLegK = 5)
    }.getMessage.contains("perLegK"))
    assert(intercept[IllegalArgumentException] {
      Serving.searchHybrid(q, "/nope", "/nope", k = 5,
        idColName = "rrf_score")
    }.getMessage.contains("collide"))
    assert(intercept[IllegalArgumentException] {
      Serving.searchHybrid(q, "/nope", "/nope", k = 5,
        fusion = "softmax")
    }.getMessage.contains("fusion"))
    assert(intercept[IllegalArgumentException] {
      Serving.searchHybrid(q, "/nope", "/nope", k = 5,
        fusion = "linear", legWeights = Seq(1.0))
    }.getMessage.contains("legWeights"))
  }

  test("retrieverSearch: an rrf tree equals the hand-wired legs + fuse") {
    val qvJson = qv1.mkString("[", ", ", "]")
    val tree =
      s"""{"rrf": {"rank_constant": 60, "rank_window_size": 30,
         |"retrievers": [
         |  {"standard": {"query":
         |    {"match": {"text": "stream filter"}}}},
         |  {"knn": {"query_vector": $qvJson, "k": 30}}
         |]}}""".stripMargin
    val got = Serving.retrieverSearch(docs, "doc_id", emb, "vec_id",
        "embedding", tree, k = 10, rankWindowSize = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // hand-wired: the scored scan + exact cosine + rrfFuse
    val lexHand = graft.api.GraftFrame(docs, "doc_id")
      .esQueryScored("""{"match": {"text": "stream filter"}}""")
      .df.select(col("doc_id"), col("_score"))
      .orderBy(col("_score").desc, col("doc_id")).limit(30)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("_score").desc, col("doc_id"))).cast("long"))
    val semHand = emb.select(col("vec_id").as("doc_id"),
        round(graft.plans.VectorExpressions.cosine(
          graft.functions.VectorOps.asDouble(col("embedding")),
          typedLit(qv1)), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(30)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id"))).cast("long"))
    val fusedHand = Ranking.rrfFuse(
        Seq(lexHand.select("doc_id", "rank"),
          semHand.select("doc_id", "rank")), "doc_id", "rank",
        k = 30, rrfK = 60)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_score").desc, col("doc_id")))
        .cast("long"))
      .filter(col("rank") <= 10)
      .select(col("rank"), col("doc_id"), col("rrf_score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == fusedHand.toSeq)
  }

  test("retrieverSearch: linear normalizers and refusals") {
    val qvJson = qv2.mkString("[", ", ", "]")
    // minmax + none + a weight; a degenerate single leg refuses in
    // rrf but linear accepts >= 1? ES linear also wants >= 2 — we
    // require 2 via the rrf path only; linear array here has 2
    val tree =
      s"""{"linear": {"rank_window_size": 20, "retrievers": [
         |  {"retriever": {"standard": {"query":
         |     {"match": {"text": "merge join"}}}},
         |   "weight": 0.7, "normalizer": "minmax"},
         |  {"retriever": {"knn": {"query_vector": $qvJson, "k": 20}},
         |   "weight": 0.3, "normalizer": "l2_norm"}
         |]}}""".stripMargin
    val out = Serving.retrieverSearch(docs, "doc_id", emb, "vec_id",
      "embedding", tree, k = 5, rankWindowSize = 20).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(0)).toSeq == (1L to 5L))
    // scores descending
    val scores = out.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
    // refusals: unknown node, one-child rrf, bad normalizer
    intercept[IllegalArgumentException](Serving.retrieverSearch(
      docs, "doc_id", emb, "vec_id", "embedding",
      """{"text_similarity_reranker": {}}""", 5))
    intercept[IllegalArgumentException](Serving.retrieverSearch(
      docs, "doc_id", emb, "vec_id", "embedding",
      """{"rrf": {"retrievers": [
        |  {"knn": {"query_vector": [1.0], "k": 5}}]}}""".stripMargin,
      5))
    intercept[IllegalArgumentException](Serving.retrieverSearch(
      docs, "doc_id", emb, "vec_id", "embedding",
      s"""{"linear": {"retrievers": [
         |  {"retriever": {"knn": {"query_vector": [1.0], "k": 5}},
         |   "normalizer": "softmax"},
         |  {"retriever": {"knn": {"query_vector": [1.0], "k": 5}},
         |   "normalizer": "none"}]}}""".stripMargin, 5))
    // knn.similarity threshold inside a tree cuts sub-threshold hits
    val cut = Serving.retrieverSearch(docs, "doc_id", emb, "vec_id",
      "embedding",
      s"""{"knn": {"query_vector": ${qv1.mkString("[", ", ", "]")},
         |"k": 30, "similarity": 0.99}}""".stripMargin, k = 30)
      .collect()
    assert(cut.forall(_.getDouble(2) >= 0.99))
  }

  test("retrieverSearch: pinned ids rank first in given order, absent " +
      "ids skip, organic excludes them") {
    val qvJson = qv1.mkString("[", ", ", "]")
    val tree =
      s"""{"pinned": {"ids": [7, 999999, 3],
         |"retriever": {"knn": {"query_vector": $qvJson,
         |"k": 10}}}}""".stripMargin
    val out = Serving.retrieverSearch(docs, "doc_id", emb, "vec_id",
        "embedding", tree, k = 10, rankWindowSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 999999 is absent from the corpus — skipped, order preserved
    assert(out(0) == (1L, 7L, 1.0e9))
    assert(out(1) == (2L, 3L, 1.0e9 - 2))
    // organic tail never repeats a pinned id
    assert(!out.drop(2).exists(r => r._2 == 7L || r._2 == 3L))
    assert(out.length == 10)
    intercept[IllegalArgumentException](Serving.retrieverSearch(
      docs, "doc_id", emb, "vec_id", "embedding",
      """{"pinned": {"ids": [1, 1],
        |"retriever": {"knn": {"query_vector": [1.0],
        |"k": 5}}}}""".stripMargin, 5))
  }

  test("buildSemanticIndex + semanticSearchIndex == the ad-hoc " +
      "semanticSearchText at full probing; integral-id contract") {
    val d = docs.filter(col("doc_id") < 120)
    val path = tmp("graft-sx")
    Serving.buildSemanticIndex(d, "doc_id", "text", path,
      chunkSize = 16, stride = 8, nlist = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
    val served = rows(Serving.semanticSearchIndex(spark, path,
      "stream filter merge", k = 8, nprobe = 99))
    val adhoc = rows(Serving.semanticSearchText(d, "doc_id", "text",
      "stream filter merge", k = 8, chunkSize = 16, stride = 8))
    assert(served == adhoc, s"served=$served adhoc=$adhoc")
    // non-integral ids refuse loudly (the packed-key contract)
    val strIds = d.select(col("doc_id").cast("string").as("doc_id"),
      col("text"))
    val e = intercept[IllegalArgumentException](
      Serving.buildSemanticIndex(strIds, "doc_id", "text",
        tmp("graft-sx-bad")))
    assert(e.getMessage.contains("integral"), e.getMessage)
    intercept[IllegalArgumentException](
      Serving.semanticSearchIndex(spark, path, "", k = 5))
    intercept[IllegalArgumentException](
      Serving.semanticSearchIndex(spark, path, "x", k = 0))
  }

  test("retrieverSearch: rule retriever — criteria gate pin/exclude, " +
      "exclusion precedes ranks and beats pinning, refusals") {
    val qvJson = qv1.mkString("[", ", ", "]")
    def tree(matchCriteria: String, rules: String) =
      s"""{"rule": {"match_criteria": $matchCriteria, "rules": $rules,
         |"retriever": {"knn": {"query_vector": $qvJson,
         |"k": 10}}}}""".stripMargin
    def run(mc: String, rules: String) =
      Serving.retrieverSearch(docs, "doc_id", emb, "vec_id",
        "embedding", tree(mc, rules), k = 10, rankWindowSize = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val baseline = run("""{"q": "x"}""",
      """[{"type": "pinned", "ids": [7],
        |"criteria": [{"type": "exact", "metadata": "q",
        |"values": ["nomatch"]}]}]""".stripMargin)
    // a non-firing rule leaves the child untouched (no pin row)
    assert(baseline.head._3 < 1.0e8, baseline.head.toString)
    // every criterion type fires; all criteria of a rule must match
    val out = run("""{"q": "stream pipelines", "tier": 3}""",
      """[{"type": "pinned", "ids": [7, 3],
        |  "criteria": [
        |    {"type": "contains", "metadata": "q", "values": ["pipe"]},
        |    {"type": "prefix", "metadata": "q", "values": ["str"]},
        |    {"type": "suffix", "metadata": "q", "values": ["lines"]},
        |    {"type": "gte", "metadata": "tier", "values": [3]},
        |    {"type": "lt", "metadata": "tier", "values": [10]},
        |    {"type": "always"}]},
        | {"type": "exclude", "ids": [3],
        |  "criteria": [{"type": "exact", "metadata": "q",
        |    "values": ["stream pipelines"]}]}]""".stripMargin)
    // pin [7, 3] fired but 3 is excluded — exclusion beats pinning
    assert(out(0) == (1L, 7L, 1.0e9))
    assert(!out.exists(_._2 == 3L))
    // excluded ids vanish BEFORE ranks assign: dense ranks, no gaps
    assert(out.map(_._1).toSeq == (1L to out.length).toSeq)
    // a rule with ONE failing criterion does not fire
    val miss = run("""{"q": "stream", "tier": 1}""",
      """[{"type": "pinned", "ids": [7],
        |  "criteria": [
        |    {"type": "prefix", "metadata": "q", "values": ["str"]},
        |    {"type": "gte", "metadata": "tier", "values": [2]}]}]"""
        .stripMargin)
    assert(miss.head._3 < 1.0e8)
    // missing metadata key never matches (except always)
    val absent = run("""{"other": "x"}""",
      """[{"type": "exclude", "ids": [1],
        |  "criteria": [{"type": "exact", "metadata": "q",
        |    "values": ["x"]}]}]""".stripMargin)
    assert(absent.map(_._2).toSeq == baseline.map(_._2).toSeq)
    // refusals: ruleset_ids, unknown criterion type, non-numeric lt,
    // empty rules
    intercept[IllegalArgumentException](run("""{"q": "x"}""",
      """[{"type": "pinned", "ids": [1], "criteria":
        |[{"type": "fuzzy", "metadata": "q", "values": ["x"]}]}]"""
        .stripMargin))
    intercept[IllegalArgumentException](run("""{"q": "x"}""",
      """[{"type": "boost", "ids": [1], "criteria":
        |[{"type": "always"}]}]""".stripMargin))
    intercept[IllegalArgumentException](run("""{"q": "x"}""",
      """[{"type": "exclude", "ids": [1], "criteria":
        |[{"type": "lt", "metadata": "q", "values": [3]}]}]"""
        .stripMargin))
    intercept[IllegalArgumentException](run("""{"q": "x"}""", "[]"))
    intercept[IllegalArgumentException](Serving.retrieverSearch(
      docs, "doc_id", emb, "vec_id", "embedding",
      s"""{"rule": {"match_criteria": {"q": "x"},
         |"ruleset_ids": ["rs1"], "rules": [],
         |"retriever": {"knn": {"query_vector": $qvJson, "k": 5}}}}"""
        .stripMargin, 5))
  }

  test("retrieverSearch: text_similarity_reranker re-ranks the child " +
      "window through the seam, refuses without a scorer") {
    val tree =
      """{"text_similarity_reranker": {
        |  "retriever": {"standard": {"query":
        |    {"match": {"text": "stream filter"}}}},
        |  "field": "text", "inference_text": "q",
        |  "rank_window_size": 10}}""".stripMargin
    // scorer = doc_id-independent md5 of the text — deterministic
    val out = Serving.retrieverSearch(docs, "doc_id", emb, "vec_id",
      "embedding", tree, k = 5, rankWindowSize = 10,
      reranker = Some((q, c) =>
        conv(substring(md5(concat(lit(q), lit(":"), c)), 1, 8), 16, 10)
          .cast("long") / lit(4294967296.0))).collect()
    assert(out.length == 5)
    val scores = out.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(s => s >= 0.0 && s < 1.0))
    // the seam refuses by absence — never a synthesized model
    val e = intercept[IllegalArgumentException](
      Serving.retrieverSearch(docs, "doc_id", emb, "vec_id",
        "embedding", tree, k = 5, rankWindowSize = 10))
    assert(e.getMessage.contains("scorer"))
  }
  test("retrieverSearch: rescorer node combines the child window with " +
      "the rescore query under every arm") {
    import spark.implicits._
    val base = """{"standard": {"query": {"match": {"text": "stream filter"}}}}"""
    def tree(ws: Int, mode: String) =
      s"""{"rescorer": {
         |  "retriever": $base,
         |  "rank_window_size": 20,
         |  "rescore": {"window_size": $ws, "query": {
         |    "rescore_query": {"match": {"text": "join"}},
         |    "query_weight": 0.5, "rescore_query_weight": 2,
         |    "score_mode": "$mode"}}}}""".stripMargin
    val child = Serving.retrieverSearch(docs, "doc_id", emb, "vec_id",
      "embedding", base, k = 20, rankWindowSize = 20)
      .select(col("id"), col("score").as("base"), col("rank"))
    val rq = graft.functions.EsScoredQuery.scoredFrame(
      docs, "doc_id", """{"match": {"text": "join"}}""")
      .select(col("doc_id").as("id"), col("_score").as("rs"))
    val got = Serving.retrieverSearch(docs, "doc_id", emb, "vec_id",
      "embedding", tree(5, "total"), k = 20, rankWindowSize = 20)
      .select(col("id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = child.join(rq, Seq("id"), "left").collect().map { r =>
      val base = r.getAs[Double]("base")
      val rank = r.getAs[Long]("rank")
      val rs = Option(r.getAs[Any]("rs")).map(_.asInstanceOf[Double])
      val sc = if (rank <= 5)
        math.round((0.5 * base + rs.fold(0.0)(2 * _)) * 1e6) / 1e6
      else base
      r.getAs[Long]("id") -> sc
    }.toMap
    assert(got == exp)
    // multiply / max arms change the combine, non-window rows do not
    val gm = Serving.retrieverSearch(docs, "doc_id", emb, "vec_id",
      "embedding", tree(5, "max"), k = 20, rankWindowSize = 20)
      .select(col("id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val em = child.join(rq, Seq("id"), "left").collect().map { r =>
      val base = r.getAs[Double]("base")
      val rank = r.getAs[Long]("rank")
      val rs = Option(r.getAs[Any]("rs")).map(_.asInstanceOf[Double])
      val sc = if (rank <= 5)
        math.round(rs.fold(0.5 * base)(x =>
          math.max(0.5 * base, 2 * x)) * 1e6) / 1e6
      else base
      r.getAs[Long]("id") -> sc
    }.toMap
    assert(gm == em)
    // refusals: window larger than the child, missing rescore_query,
    // unknown score_mode
    intercept[IllegalArgumentException](Serving.retrieverSearch(
      docs, "doc_id", emb, "vec_id", "embedding",
      tree(25, "total"), k = 20, rankWindowSize = 20))
    intercept[IllegalArgumentException](Serving.retrieverSearch(
      docs, "doc_id", emb, "vec_id", "embedding",
      """{"rescorer": {"retriever": {"standard": {"query":
        |{"match": {"text": "x"}}}},
        |"rescore": {"query": {}}}}""".stripMargin,
      k = 5, rankWindowSize = 10))
    intercept[IllegalArgumentException](Serving.retrieverSearch(
      docs, "doc_id", emb, "vec_id", "embedding",
      tree(5, "geometric"), k = 20, rankWindowSize = 20))
  }
  test("semantic retriever leg: same-encoder cosine ranking; " +
      "inference_id and empty query refuse") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val vec = graft.ml.Inference.embedText(
      corpus, "doc_id", "text", graft.ml.Inference.hashEncoder(8))
    val got = Serving.retrieverSearch(corpus, "doc_id", vec,
      "doc_id", "embedding",
      """{"semantic": {"query": "alpha beta"}}""", k = 3,
      rankWindowSize = 10)
      .select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the hand-wired exact cosine against the same stub embedding
    val enc = graft.ml.Inference.hashEncoder(8)()
    val qv = try enc.encodeBatch(Array("alpha beta")).head.toSeq
      .map(_.toDouble) finally enc.close()
    val exp = vec.select(col("doc_id"),
      round(graft.plans.VectorExpressions.cosine(
        graft.functions.VectorOps.asDouble(col("embedding")),
        typedLit(qv)), 6).as("c")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == exp)
    // the doc embedding of the SAME text is the query vector: cos 1
    assert(got(1L) == 1.0)
    intercept[IllegalArgumentException](Serving.retrieverSearch(
      corpus, "doc_id", vec, "doc_id", "embedding",
      """{"semantic": {"query": "x", "inference_id": "elser"}}""",
      k = 1, rankWindowSize = 1))
    intercept[IllegalArgumentException](Serving.retrieverSearch(
      corpus, "doc_id", vec, "doc_id", "embedding",
      """{"semantic": {"query": ""}}""", k = 1, rankWindowSize = 1))
  }
}


