package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Plan-shape regression tests: the queries must not only be correct,
  * they must produce the plans a 100TB deployment needs — filters and
  * projections pushed into the parquet scan, dimension joins
  * broadcast, aggregates partial-before-shuffle, sorted limits fused
  * into TakeOrderedAndProject, and hot paths inside whole-stage
  * codegen. A refactor that silently loses one of these properties
  * fails here even though results stay correct.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, TestSpark.sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("f1_range: predicate and projection reach the parquet scan") {
    val p = plan("f1_range")
    assert(p.contains("PushedFilters:") &&
      p.matches("(?s).*PushedFilters:.*l_quantity.*"))
    // projection pruned to the 4 selected columns
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_quantity") && !read.contains("l_extendedprice"))
  }

  test("q1_pricing_summary: partial aggregation before the shuffle") {
    val p = plan("q1_pricing_summary")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$p")
    assert(p.contains("Exchange"))
    // shipdate filter pushed to scan
    assert(p.matches("(?s).*PushedFilters:.*l_shipdate.*"))
  }

  test("j1/j2: dimension joins are broadcast, no shuffle of the fact side for dims") {
    assert(plan("j1_join_broadcast_agg").contains("BroadcastHashJoin"))
    val p2 = plan("j2_revenue_by_nation")
    assert(p2.contains("BroadcastHashJoin"))
    assert(!p2.contains("CartesianProduct"))
  }

  test("l1_head: sorted limit fuses into TakeOrderedAndProject") {
    assert(plan("l1_head").contains("TakeOrderedAndProject"))
  }

  test("e1_arith: scalar pipeline runs in whole-stage codegen") {
    // AQE finalizes stages only on execution; run the plan, then look
    // for WholeStageCodegen nodes in the executed plan
    val df = SparkEntry.queries("e1_arith")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p) // "*(n)" marks whole-stage-codegen stages
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("j3/j4: semi and anti joins plan as joins, not subquery loops") {
    assert(plan("j3_semi_join").contains("LeftSemi") ||
      plan("j3_semi_join").contains("BroadcastHashJoin"))
    assert(plan("j4_anti_join").contains("LeftAnti"))
  }

  test("a18_len: count(*) does not read any data columns") {
    val read = plan("a18_len").linesIterator
      .find(_.contains("ReadSchema")).get
    assert(read.contains("struct<>"), read)
  }

  test("g1 facade filter+head pushes the predicate to the scan") {
    val p = plan("g1_filter_head")
    assert(p.matches("(?s).*PushedFilters:.*o_totalprice.*"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("f16_es_query: translated DSL predicates push down to the parquet scan") {
    // term/range/terms arrive as Column trees, so they must reach
    // PushedFilters exactly like hand-written predicates
    val p = plan("f16_es_query")
    assert(p.matches("(?s).*PushedFilters:.*o_totalprice.*"), p)
    assert(p.matches("(?s).*PushedFilters:.*o_orderstatus.*"), p)
  }

  test("g21_keep_ids: the id list joins broadcast — no shuffle of the fact side") {
    val p = plan("g21_keep_ids")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sim3_ivf_topk: the probe join broadcasts the query side") {
    // IVF's cell join must broadcast the (small, exploded-by-nprobe)
    // query side — a sort-merge join here would shuffle the whole
    // corpus on cell id at 100TB
    val p = plan("sim3_ivf_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dd8: bucket self-join shuffles ids only, vectors join back after distinct") {
    // the (t, b) self-join must not carry vector columns through the
    // shuffle — each side is exactly (id, t, b); the id-only layout is
    // the point of the operator
    val df = SparkEntry.queries("dd8_embedding_lsh_neardup")(spark, TestSpark.sfDir)
    // the operator persists its stages; drop the cache entries so the
    // optimized plan shows the real join tree, not InMemoryRelation
    spark.catalog.clearCache()
    val bucketJoins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.exists { c =>
          val refs = c.references.map(_.name).toSet
          refs.contains("t") && refs.contains("b")
        } => j
    }
    assert(bucketJoins.nonEmpty, df.queryExecution.optimizedPlan.toString)
    bucketJoins.foreach { j =>
      assert(j.left.output.size <= 3 && j.right.output.size <= 3,
        s"bucket join side carries extra columns:\n$j")
    }
  }

  test("dd2: hot-bucket guard shares the band-bucket shuffle with the self-join") {
    // the window count and the bucket self-join both key on (band, bh);
    // the guard must not introduce its own aggregate+semi-join pass
    val df = SparkEntry.queries("dd2_minhash_lsh_pairs")(spark, TestSpark.sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("Window"), p)
    assert(!p.contains("SemiJoin") && !p.contains("LeftSemi"), p)
  }

  test("dd3: simhash banded near-dup is equi-joins only — never all-pairs") {
    // the pigeonhole banding must plan as a (band, chunk) equi-join
    // over narrow (id, band, bk) rows; the all-pairs hamming set is
    // what it PROVABLY equals, not what it computes
    val df = SparkEntry.queries("dd3_simhash_neardup")(spark, TestSpark.sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("g11: the portable sample draw still plans as TakeOrderedAndProject") {
    // md5 key instead of xxhash64 must not change the plan shape:
    // per-partition top-n + driver merge, never a global sort
    val df = SparkEntry.queries("g11_sample")(spark, TestSpark.sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("pp1: the year predicate prunes partitions at planning time") {
    val df = SparkEntry.queries("pp1_partition_prune")(spark, TestSpark.sfDir)
    // collect on sparkPlan: executedPlan is an AdaptiveSparkPlanExec
    // wrapper whose collect() does not descend into the inner plan
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "no PartitionFilters — the year predicate is not pruning directories")
    // the pruned scan must select a strict subset of the partition dirs
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).length
    val total = scan.relation.location.listFiles(Nil, Nil).length
    assert(selected < total,
      s"selected $selected of $total partitions — nothing pruned")
  }

  test("sm1: deterministic sample plans as TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("sm1_sample_det")(spark, TestSpark.sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("pack1: no single-partition global window in the packing plan") {
    // the naive spelling (sum().over(Window.orderBy(id))) plans a
    // Window over a SinglePartition exchange — the two-phase prefix
    // sum must not contain any Window operator at all
    val df = SparkEntry.queries("pack1_token_packing")(spark, TestSpark.sfDir)
    spark.catalog.clearCache()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), p)
  }

  test("sm3: weighted mix is a pure scan-filter (no shuffle, no join)") {
    val df = SparkEntry.queries("sm3_weighted_mix")(spark, TestSpark.sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // one Exchange is allowed for the final orderBy presentation sort;
    // the mix decision itself must not join or aggregate
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
  }

  test("sm7: epoch upsampling is scan + generate — no shuffle, no join, " +
    "no window") {
    val df = SparkEntry.queries("sm7_epoch_mix")(spark, TestSpark.sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("Generate"), p)   // the epoch explode
    assert(!p.contains("Join") && !p.contains("HashAggregate") &&
      !p.contains("Window"), p)
  }

  test("sm6: token-budget mix keeps the pack1 rule — no per-source " +
    "single-task window") {
    val df = SparkEntry.queries("sm6_token_budget_mix")(spark, TestSpark.sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), p)
  }

  test("zo1: z-order bounds ride a broadcast — one broadcast join, no " +
    "shuffle join, no window") {
    val df = SparkEntry.queries("zo1_zorder_key")(spark, TestSpark.sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("Window"), p)
    // the sorted-limit presentation fuses, as everywhere else
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("asof1: the as-of join plans as union+window — zero join nodes") {
    val p = plan("asof1_pointintime")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
  }

  test("rj1: the range join is an equi-join, not a nested-loop product") {
    val p = plan("rj1_range_window")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // bucket expansion keeps it a hash-joinable equi-join
    assert(p.contains("Join"), p)
  }

  test("q18: sorted limit fuses into TakeOrderedAndProject over the joined aggregate") {
    val p = plan("q18_large_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
    // lineitem collapses through partial+final HashAggregate BEFORE joining
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p)
  }

  test("q19: side-local disjunctions are derived and pushed below the join") {
    val df = SparkEntry.queries("q19_disjunctive")(spark, TestSpark.sfDir)
    val op = df.queryExecution.optimizedPlan.toString
    // the OR-of-ANDs spans both sides; Catalyst must still derive a
    // lineitem-only quantity disjunction and a part-only brand/size
    // disjunction under the join (else both scans read everything)
    val belowJoin = op.substring(op.indexOf("Join"))
    assert(belowJoin.contains("l_quantity") && belowJoin.contains("Filter"), op)
    assert("Filter .*l_quantity.*l_quantity".r.findFirstIn(belowJoin).isDefined, op)
    assert("Filter .*p_brand".r.findFirstIn(belowJoin).isDefined, op)
  }

  test("sm5: the global permutation has no single-partition window") {
    val df = SparkEntry.queries("sm5_shuffle")(spark, TestSpark.sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the pack1 rule: an unpartitioned Window would drag the corpus
    // into one task; the two-phase prefix sum must keep Window out
    assert(!p.contains("Window"), p)
  }

  test("voc2: the vocab broadcasts; the corpus is not shuffled to encode") {
    val p = plan("voc2_encode")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ppl1: the unigram join broadcasts — no shuffle join on the Zipf-skewed _w1 key") {
    // the bigram (w1,w2) join may shuffle (AQE skew-split covers it);
    // a join keyed on _w1 ALONE concentrates every "the"-transition in
    // one task at 100×, so that join must be a broadcast
    val df = SparkEntry.queries("ppl1_bigram_lm")(spark, TestSpark.sfDir)
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    val uniJoins = joins.filter { j =>
      j.leftKeys.flatMap(_.references.map(_.name)).toSet == Set("_w1")
    }
    assert(uniJoins.nonEmpty, "no join keyed on _w1 found — test is vacuous")
    uniJoins.foreach { j =>
      assert(j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec],
        s"unigram join on the skewed _w1 key must broadcast:\n$j")
    }
  }

  test("ppl2: both single-token backoff lookups broadcast") {
    // same Zipf argument as ppl1, twice over: the c(w2) and c(w3)
    // lookups key on one token each and must broadcast; the compound
    // (w1,w2,w3)/(w1,w2)/(w2,w3) joins may shuffle under AQE
    val df = SparkEntry.queries("ppl2_trigram_backoff")(spark, TestSpark.sfDir)
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    val singleTok = joins.filter { j =>
      val ks = j.leftKeys.flatMap(_.references.map(_.name)).toSet
      ks == Set("_w2") || ks == Set("_w3")
    }
    assert(singleTok.size >= 2,
      s"expected the two single-token lookups, found ${singleTok.size}")
    singleTok.foreach { j =>
      assert(j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec],
        s"single-token backoff lookup must broadcast:\n$j")
    }
  }

  test("dd13: the postings join is an equi-join; the hot-gram guard shares its shuffle") {
    // the span pipeline must never degrade to a nested-loop product,
    // and the guard's window count keys on h — the same partitioning
    // the postings self-join uses, so no extra aggregate+semi-join pass
    val df = SparkEntry.queries("dd13_shared_spans")(spark, TestSpark.sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
    assert(!p.contains("LeftSemi"), p)
  }

  test("ANN family: two-phase top-k — no corpus-sized single-partition-per-query sort") {
    // the naive per-query ranking (row_number over partitionBy(q_id)
    // alone) drags every candidate row for a query into ONE task — for
    // brute force that is O(N) rows per query at 100×. The two-phase
    // shape must survive refactors: a local window keyed on
    // (spark_partition_id, q_id) bounds what the per-query global
    // window ever sees to partitions×k survivors.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (q <- Seq("sim1_brute_topk", "sim2_lsh_topk", "sim3_ivf_topk",
      "emb2_int8_topk", "emb3_matryoshka_topk", "idx6_batch_search",
      "vx1_vector_index_search")) {
      val df = SparkEntry.queries(q)(spark, TestSpark.sfDir)
      spark.catalog.clearCache()
      val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(windows.map(_.partitionSpec.size).sorted == Seq(1, 2),
        s"$q: expected the local (pid, q_id) + global (q_id) window pair, " +
          s"got partition specs ${windows.map(_.partitionSpec)}")
      // the global single-key window must rank only the local phase's
      // survivors — i.e. sit ABOVE the two-key window in the plan
      val global = windows.find(_.partitionSpec.size == 1).get
      assert(global.child.collect {
        case w: LWindow if w.partitionSpec.size == 2 => w
      }.nonEmpty, s"$q: global ranking window is not fed by the local phase")
    }
  }

  test("dc1: benchmark grams broadcast; corpus side joins map-side") {
    val p = plan("dc1_decontam")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dc2: span decontam broadcasts the benchmark gram hashes too") {
    val p = plan("dc2_span_decontam")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("bpe2: segmentation broadcasts back; the corpus is not" +
    " shuffle-joined to encode") {
    // the voc2 rule for BPE: the distinct-word segmentation table is
    // Zipf-bounded and must broadcast onto the exploded corpus; a
    // SortMergeJoin here would shuffle every token occurrence
    val p = plan("bpe2_encode")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("mv1: the candidate set and query tokens broadcast onto the" +
    " doc-token table") {
    // late interaction reranks a bounded candidate set: the
    // (q_id, doc_id) candidates and the query-token vectors must both
    // broadcast; a shuffle join would move the corpus-scale doc-token
    // table to find candidates
    val df = SparkEntry.queries("mv1_maxsim_rerank")(spark, TestSpark.sfDir)
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty)
    val shuffled = joins.filterNot { j =>
      j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec] ||
      // bm25's 1-row stats crossJoin plans as a broadcast NLJ — also fine
      j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]
    }
    assert(shuffled.isEmpty,
      s"non-broadcast joins in the rerank plan:\n${shuffled.mkString("\n")}")
  }

  test("sh1: shard assignment keeps the sm5 discipline — no" +
    " single-partition window anywhere in the read-back check") {
    // exportShards rides deterministicShuffle; a refactor that
    // reintroduced the global Window would make every export a
    // one-task sort at 100 TB. The gate's plan reads the EXPORTED
    // files, so pin the exporter's own plan here instead.
    val df = graft.operators.Sampling.deterministicShuffle(
      graft.Tables.load(spark, TestSpark.sfDir, "customer"),
      "c_custkey", seed = 17)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), p)
  }

  test("mmdd1: perceptual image near-dup is equi-joins only — the " +
    "banded layout never degenerates to all-pairs") {
    // dd3's contract carried to the image modality: (band, bk)
    // equi-join over narrow rows, hashes re-joined by id for the
    // verify; what it provably EQUALS (the all-pairs hamming ball) is
    // never what it computes
    val p = plan("mmdd1_image_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("mmdd4: video near-dup blocks on frame 0 and verifies aligned " +
    "frames — no cartesian, no corpus-wide window") {
    val p = plan("mmdd4_video_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("Window"), p)
  }

  test("spm2: unigram encode segments DISTINCT words and broadcasts " +
    "back — the corpus never shuffles to encode") {
    // the bpe2 discipline: one distinct aggregate over words, then a
    // BroadcastHashJoin onto the exploded corpus; a refactor that
    // shuffled the corpus side to join segmentations would show a
    // SortMergeJoin or a corpus-side Exchange below the join
    val p = plan("spm2_encode")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ca1: the composite after_key pushes to the scan and the page " +
    "cut is a TakeOrderedAndProject") {
    val p = plan("ca1_composite_page")
    // the lexicographic predicate reaches parquet whole
    assert(p.matches("(?s).*PushedFilters:.*c_mktsegment.*"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalLimit"), p) // fused, not sort+limit
  }

  test("th1: top_hits gets the partial WindowGroupLimit before the " +
    "group-key exchange") {
    // Spark's rewrite caps each map task at k rows per group BEFORE
    // the shuffle; losing it would ship the whole corpus to the window
    val df = SparkEntry.queries("th1_top_hits")(spark, TestSpark.sfDir)
    df.write.mode("overwrite").format("noop").save()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("WindowGroupLimit"), executed)
    // printed tree is parent-first: Final above the hash Exchange,
    // the Partial pass BELOW it (i.e. before the shuffle at runtime)
    assert(executed.matches("(?s).*WindowGroupLimit.*Final.*" +
      "Exchange hashpartitioning.*WindowGroupLimit.*Partial.*"),
      executed)
  }

  test("f40: the nested query is a scan-side HOF filter — no explode, " +
    "no shuffle added beyond the grouping that builds the fixture") {
    val p = plan("f40_nested")
    // the same-element predicate evaluates per row on the array
    assert(!p.contains("Generate"), p) // no explode anywhere
  }

  test("f39/f42: query-string predicates stay single-scan filters " +
    "with one tokenization pipeline, no UDFs") {
    for (g <- Seq("f39_simple_query_string", "f42_query_string")) {
      val p = plan(g)
      assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("eh1: histogram is ONE corpus scan — empty buckets come from " +
    "a lag gap-fill over the reduced frame, never a rescan") {
    // count scans on the bare tree (formatted mode prints each scan
    // twice: once in the tree, once in the details section)
    val tree = SparkEntry.queries("eh1_histogram")(spark, TestSpark.sfDir)
      .queryExecution.sparkPlan.toString
    val scans = "Scan parquet".r.findAllIn(tree).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$tree")
  }

  test("na1: nested agg is explode + ONE keyed exchange with partial " +
    "aggregation before it") {
    val p = plan("na1_nested_agg")
    assert(p.contains("Generate"), p) // the explode to element grain
    val hashAggs = "HashAggregate".r.findAllIn(p).length
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$p")
  }

  test("idx15: boolean index search reads pruned postings once — " +
    "broadcast df join, no SortMergeJoin, no second postings read") {
    val tag = TestSpark.sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val path = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft-idx15-$tag").toString
    graft.operators.InvertedIndex.build(
      Tables.load(spark, TestSpark.sfDir, "documents"),
      "doc_id", "text", path)
    val df = graft.operators.InvertedIndex.queryStringSearchTopK(
      spark, path, "stream + filter -join", 10, idColName = "doc_id")
    val p = df.queryExecution.explainString(
      ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the pruned-postings read count must match the long-accepted
    // searchTopK shape (postings referenced by the df stat and the
    // scoring pivot) — NOT grow per clause role
    val baseline = graft.operators.InvertedIndex.searchTopK(
      spark, path, Seq("stream", "filter", "join"), 10,
      idColName = "doc_id")
    val baseScans = "Scan parquet".r.findAllIn(
      baseline.queryExecution.sparkPlan.toString).length
    val postingsScans = "Scan parquet".r.findAllIn(
      df.queryExecution.sparkPlan.toString).length
    assert(postingsScans <= baseScans,
      s"$postingsScans postings scans vs searchTopK's $baseScans:\n$p")
  }

  test("sa1: the sampler's global cut is TakeOrderedAndProject, never " +
      "a global sort of the corpus") {
    val p = plan("sa1_sampler")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("cl1: collapse re-joins inner hits through a BROADCAST on the " +
      "size-bounded anchors; the outer cut is a fused sorted limit") {
    val p = plan("cl1_collapse")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ip1: ip_range is ONE aggregation pass — no join, a single " +
      "aggregate exchange") {
    // node counts on sparkPlan.toString — formatted explain prints
    // every node twice (tree + detail)
    val p = SparkEntry.queries("ip1_ip_range")(spark, TestSpark.sfDir)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("Join"), p)
    // partial + final around ONE aggregate exchange (plus the gate's
    // 4-row output sort); the bucket-struct explode adds no shuffle
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2, p)
    assert(p.linesIterator.count(_.contains("HashAggregate")) <= 2, p)
  }

  test("vw1: variable_width_histogram never plans a corpus-wide " +
      "single-partition window") {
    val df = SparkEntry.queries("vw1_variable_width_histogram")(
      spark, TestSpark.sfDir)
    val p = df.queryExecution.explainString(
      ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), p)
  }

  test("ta2: order-by-metric terms adds NO shuffle over doc_count " +
      "ordering — one aggregate exchange, a fused sorted limit") {
    val p = SparkEntry.queries("ta2_terms_order_metric")(
      spark, TestSpark.sfDir).queryExecution.sparkPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Join"), p)
    assert(p.linesIterator.count(_.contains("Exchange")) <= 1, p)
  }

  test("sv1: sparse_vector scoring over a ready column is " +
      "shuffle-free — scan, filter, sorted limit; no join, no window") {
    // a FILE-backed frame: literal local data constant-folds to a
    // LocalTableScan and the plan shape under test disappears
    val sv = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), array(struct(lit("a").as("token"),
        col("n_chars").cast("double").as("weight"))).as("ml_tokens"))
    val df = graft.functions.EsScoredQuery.scoredFrame(sv, "doc_id",
      """{"sparse_vector": {"field": "ml_tokens",
        |"query_vector": {"a": 1.0}}}""".stripMargin)
      .orderBy(col("_score").desc, col("doc_id")).limit(10)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(!p.linesIterator.exists(_.contains("Exchange")), p)
  }

  test("sy1: synonym blending adds NO shuffle over the plain match — " +
      "one doc-keyed aggregation, group stats enter as broadcasts") {
    val syn = SparkEntry.queries("sy1_synonym_match")(
      spark, TestSpark.sfDir).queryExecution.sparkPlan.toString
    val plain = graft.functions.EsScoredQuery.scoredFrame(
      graft.Tables.load(spark, TestSpark.sfDir, "documents"),
      "doc_id", """{"match": {"text": "merge stream"}}""")
      .queryExecution.sparkPlan.toString
    def shuffles(p: String) =
      p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles(syn) == shuffles(plain), s"$syn")
    assert(!syn.contains("CartesianProduct"), syn)
  }

  test("ig1: an ingest pipeline is ONE narrow projection stage — " +
      "no shuffle, no join, a single scan") {
    val pipe = graft.operators.IngestPipeline(
      """{"processors": [
        |  {"dissect": {"field": "o_orderpriority",
        |    "pattern": "%{pn}-%{pw}"}},
        |  {"lowercase": {"field": "pw"}},
        |  {"set": {"field": "engine", "value": "graft"}}
        |]}""".stripMargin)
    val p = pipe(graft.Tables.load(spark, TestSpark.sfDir, "orders"))
      .queryExecution.sparkPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"), p)
    assert(p.linesIterator.count(_.contains("Scan")) == 1, p)
  }

  test("ig2: the enrich processor joins as a BROADCAST dimension — " +
      "never a sort-merge shuffle of the corpus") {
    val p = SparkEntry.queries("ig2_ingest_enrich")(
      spark, TestSpark.sfDir).queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sg4: the weighted-suggest prefix read pushes the term RANGE " +
      "into the sidecar scan") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-plan-sg4").toString
    graft.operators.InvertedIndex.buildSuggestEntries(
      Seq(("stream", 3L, Seq("web"))).toDF("term", "weight", "ctxs"),
      "term", "weight", path, Some("ctxs"))
    val df = graft.operators.InvertedIndex.suggestWeighted(
      spark, path, "st", k = 5)
    val scan = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.dataFilters.nonEmpty,
      "term range not pushed into the suggest sidecar scan")
  }
}
