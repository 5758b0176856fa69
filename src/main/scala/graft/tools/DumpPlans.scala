package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import graft.SparkEntry
import java.nio.file.{Files, Paths}

/** Dev tool: regenerate PLANS.md — formatted physical plans for the
  * headline queries with scale commentary. Run after plan-affecting
  * changes: `sbt "runMain graft.tools.DumpPlans"`.
  */
object DumpPlans {

  private val picks: Seq[(String, String)] = Seq(
    "f1_range" ->
      "Filter + projection both pushed into the parquet scan (PushedFilters / 4-column ReadSchema). At 100TB this is the difference between reading 4 columns of matching row groups and reading everything.",
    "q1_pricing_summary" ->
      "Partial HashAggregate before the Exchange, final after: map-side combine means the shuffle carries one row per (flag, status) per task, not 6B lineitems.",
    "j2_revenue_by_nation" ->
      "All four dimension joins are BroadcastHashJoin; the lineitem fact table is never shuffled for them. The only Exchange is the final groupBy on n_name.",
    "l1_head" ->
      "orderBy(id).limit(n) fuses into TakeOrderedAndProject: each task keeps a bounded top-n heap; no global sort materializes.",
    "w2_sessionize" ->
      "One shuffle on user_id serves both the lag window and the session aggregation; the window function runs inside the sorted partition.",
    "a18_len" ->
      "count(*) reads ReadSchema struct<> — row counts come from parquet metadata, no column IO.",
    "f16_es_query" ->
      "The ES query-DSL translation lands in PushedFilters like hand-written predicates: term/terms/range become data-skipping scan filters, so an es_query caller gets full pushdown for free.",
    "g21_keep_ids" ->
      "keepIds joins the driver-sized id list via BroadcastHashJoin — the 100TB fact side is never shuffled; the ordinal sort orders only the surviving rows.",
    "dd7_lsh_verify" ->
      "The 100TB near-dup composition: per-row signatures (no shuffle), a bucket join on (band, bandHash) carrying ids only, then exact Jaccard verification joined back by id over the persisted shingle-set table. Candidate pairs — not N² — flow through every stage.",
    "dd3_simhash_neardup" ->
      "Manku-style SimHash near-dup: one 60-bit portable sketch per doc (no shuffle), a (band, chunk) equi-join over narrow (id, band, bk) rows, sketches re-joined by id for the hamming filter. With maxHamming <= bands-1 the pigeonhole argument makes the banded output EXACTLY the all-pairs hamming set — the plan never contains a cartesian node (spec-pinned), yet equals the all-pairs answer the DuckDB oracle computes flat.",
    "dd8_embedding_lsh_neardup" ->
      "The embedding-space analogue of dd7: codegen HyperplaneSignBits buckets every vector per table (no shuffle), the (table, bucket) self-join ships (id, t, b) rows only, and vectors re-join the persisted (id, v, norm) table once per DISTINCT candidate pair. The oracle plants clone+jitter near-dups and the output must equal all-pairs — recall is proven, not assumed.",
    "sim3_ivf_topk" ->
      "IVF ANN: cell assignment is a broadcast expression over the tiny driver-trained quantizer; the probe join BROADCASTS the exploded query side, so the corpus is never shuffled — each query scans only its nprobe cells.",
    "emb2_int8_topk" ->
      "int8-quantized search: the corpus is STORED quantized (4x smaller) and never dequantized — cosine is scale-invariant, so the codegen cosine kernel runs directly over the int arrays; the query side broadcasts. At 100TB of embeddings the quantized scan is the difference between memory-resident and spilled.",
    "sm1_sample_det" ->
      "Deterministic md5-keyed sampling plans as TakeOrderedAndProject: each task keeps an n-row heap over the hash order, the driver merges n*tasks keys — no global sort, no full shuffle, and any engine with md5 replays the exact row set.",
    "pack1_token_packing" ->
      "Sequence packing via the two-phase distributed prefix sum: ONE range shuffle (the same one any global ordering costs), a per-partition total pass (k longs to the driver), then an offset-broadcast streaming pass. The naive window spelling would move the entire corpus into a single partition; PlanQualitySpec pins Window OUT of this plan.",
    "t8_repetition" ->
      "Repetition signals: explode feeds a two-level aggregation — partial counts before the (doc_id, token) Exchange, per-doc rollup after; one shuffle total and nothing per-row-interpreted, so the Gopher-rule sweep survives a 100TB corpus.",
    "pp1_partition_prune" ->
      "Hive-layout partition pruning: the o_year predicate lands in PartitionFilters — whole directories are skipped at planning time, the layout discipline that turns a 100TB scan into a 4TB one. PlanQualitySpec asserts selected < total partitions.",
    "asof1_pointintime" ->
      "As-of join as union + running window: ZERO join nodes — both sides shuffle once on the key and a running last(ignoreNulls) carries the latest right payload onto each left row. No interval cross product, no broadcast requirement, so two 100TB sides survive. PlanQualitySpec pins the no-join shape.",
    "rj1_range_window" ->
      "Range join bucketed into an equi-join: intervals explode onto fixed-width buckets, points land in exactly one bucket, and the BETWEEN filter refines a plain shuffled hash join. The raw inequality join would plan as a nested-loop product — O(points x intervals) at any scale.",
    "dc1_decontam" ->
      "Decontamination: the benchmark n-gram set is distinct-ed and BROADCAST; the corpus side explodes staged-token shingles and hash-joins map-side — the 100TB corpus is never shuffled to find matches, and only matched (doc, gram) pairs reach the aggregation.",
    "pipe1_corpus_pipeline" ->
      "The four-stage pipeline (dedup → decontaminate → quality floor → split) as ONE plan: Catalyst sees everything, so the digest groupBy, the broadcast gram join, the token count, and the split filter fuse into a single pass over the corpus with two narrow shuffles (digest keep-first, gram match) — no inter-stage materialization.",
    "bm1_bm25_topk" ->
      "BM25: arrays_overlap prefilter cuts non-matching docs BEFORE the explode; term counts are the only corpus-width shuffle; df/stats broadcast; TakeOrderedAndProject caps the result. Relevance ranking without an index, in four narrow stages.",
    "q19_disjunctive" ->
      "The OR-of-ANDs predicate spans both join sides, and Catalyst derives the side-local disjunctions: the lineitem scan gets a quantity-range OR filter, the part scan gets the brand/size OR filter — both BELOW the join, so neither side reads rows that can never match.",
    "dd13_shared_spans" ->
      "Substring-level span dedup: codegen positional window hashes explode to (h, id, pos) postings — 24B rows, never text — a hash equi-join pairs matching grams, and gaps-and-islands windows (partitioned per pair+offset, bounded by ONE pair's overlap) collapse runs to maximal spans. The hot-gram guard's window count shares the h-shuffle the self-join needs anyway.",
    "ppl1_bigram_lm" ->
      "Bigram-LM scoring: the (w1,w2) model join shuffles on the pair key (AQE-balanced); the unigram join BROADCASTS — its key alone is Zipf-skewed and the table is vocabulary-bounded, so no transition row ever shuffles on a single-token key. PlanQualitySpec pins the broadcast.",
    "idx1_index_search" ->
      "Index-backed BM25: the postings scan shows PartitionFilters on the md5 term bucket (whole directories skipped at planning time) plus a term IN pushdown — the query reads its terms' postings, never the corpus. df broadcasts; corpus stats (n, avg len) enter as driver LITERALS from one tiny stats read, so no stats join exists at all; TakeOrderedAndProject caps the result. This is the query-serving shape: build cost is paid once, each query is O(its own postings).",
    "idx3_index_delete" ->
      "Search with LIVE tombstones: the postings scan keeps its bucket PartitionFilters and term pushdown, the tombstone subtraction is a BroadcastHashJoin LeftAnti on (id, segment) — bounded between compactions, never a shuffle of the postings — and the corpus stats enter as literals already tombstone-adjusted from the lens-exact delete charges. Deletion costs a search nothing but a broadcast.",
    "sd1_semantic_dedup" ->
      "SemDeDup: k-means cell assignment is a pure expression over the broadcast-folded centroid literals (no model table, no shuffle for assignment); the pairwise cosine join shuffles (id, vec) on the CELL id only, so comparison cost is per-cell-quadratic, never corpus-quadratic — and the oracle's planted clones prove the blocking loses nothing.",
    "qc1_quality_classifier" ->
      "Trained quality classifier: each IRLS iteration is one map-side-combined aggregation over the cached feature projection — partial sums before the single-row Exchange, the (d+1)-double model folded into the NEXT scan as literals. Prediction is a per-row codegen expression; nothing model-shaped ever shuffles.",
    "vx1_vector_index_search" ->
      "Persistent IVF vector index: the segment scan shows PartitionFilters on the probed CELL ids (whole cell directories skipped at planning time — each query reads only its nprobe cells, never the corpus), the query frame broadcasts onto the cell join, and the per-query ranking is the two-phase top-k. The quantizer enters as expression literals; build cost is paid once, each search is O(probed cells).",
    "hy1_hybrid_rrf" ->
      "Hybrid RRF: both input rankings are already k-sized (BM25's TakeOrderedAndProject, the cosine TakeOrdered), so the fusion unions <= rankings x k rows, aggregates the 1/(rrfK + rank) sums on that tiny set, and TakeOrdered caps the result — lexical and vector retrieval combine without a corpus-sized node anywhere past the two retrievals themselves.",
    "pq1_pq_adc_topk" ->
      "Product-quantized ADC search: stage 1's scan ReadSchema is (id, codes) — m small ints per row, never the vectors — and each row's approximate distance is m element_at lookups into the query's literal tables; the two-phase ranking keeps `candidates` per query, and ONLY those candidate ids join back to the vector table for the exact cosine re-rank. At 100TB of embeddings the code table is the 32x-smaller thing you can afford to scan per query.",
    "hn2_hard_negatives_served" ->
      "Served hard negatives: candidates come from the IVF index's cell-pruned scan (PartitionFilters on the probed cells, query frame broadcast — the corpus never shuffles into its join, spec-pinned), the self/positive cuts are broadcast anti-joins over candidate-sized sets, and the re-rank touches <= queries x fetchK rows. The brute |corpus| x |queries| cosine interior is gone: a 100TB corpus costs O(probed cells).",
    "hy3_search_hybrid" ->
      "One-call hybrid serving: the lexical leg reads only the query terms' postings buckets (PartitionFilters + term pushdown), the vector leg only the probed cells, each answers the WHOLE query frame in one plan, and the per-query RRF fusion aggregates <= 2 x queries x perLegK rows. Nothing corpus-sized exists past the two pruned index reads.",
    "idx8_phrase_score" ->
      "Scored phrase search from positional postings: each term's scan keeps the bucket PartitionFilters + term pushdown (only the phrase's buckets are read), docs holding all terms hash-join on id, the adjacency count is an array predicate over the per-term position lists, and corpus stats enter as driver literals. Phrase ranking costs O(docs containing the phrase's terms) — the corpus and its text are never touched.",
    "f26_phrase_scored" ->
      "Scored match_phrase in the DSL: the phrase tf is a pure per-row expression over ONE staged token-array projection (the lambda's element_at reads a column — no re-tokenize, no shuffle), and N/sum-len/per-term dfs reduce to a single 1-row aggregate broadcast into the lazy plan. A phrase clause adds zero corpus shuffles to any scored query.",
    "zo1_zorder_key" ->
      "Z-order layout key: the min/max normalization bounds are ONE aggregated row entering via BroadcastNestedLoopJoin (no collect, no shuffle join), the bucket div and the Morton shift/and/or interleave are per-row codegen arithmetic, and the presentation limit fuses into TakeOrderedAndProject. zorderBy then range-partitions on this key — each output file covers a compact hyper-rectangle, so parquet min/max stats prune on EVERY layout column (LayoutSpec proves a y-band query skips >= half the z-ordered partitions and zero x-sorted ones).",
    "sm7_epoch_mix" ->
      "Epoch upsampling: a Generate (the per-row epoch explode, bounded by ceil(max weight)) over the scan, then a pure per-row threshold on the portable md5 draw — no join, no aggregate, no window, no shuffle (spec-pinned). Repetition-weighted mixtures of a 100TB corpus cost exactly the pass that writes the output.",
    "t13_repetition_signals" ->
      "The 13-signal Gopher repetition sweep: ONE codegen kernel call per row (TokenRepetitionSignals — hash-map counts, no sorts) expanded through a single-row inline Generate, zero shuffle before the presentation orderBy. The interpreted HOF spelling measured 100s-class at sf0.1 because alias inlining re-ran the tokenizer per shingle position; the kernel makes the whole rule family scan-bound (spec-pinned bit-identical to the HOF reference).",
    "qf3_perplexity_buckets" ->
      "CCNet buckets: LM scoring joins (pair-key shuffle + broadcast unigrams, the ppl1 shape) feed the two-phase distributed prefix-sum rank — ONE range shuffle on (group, -logp, id), per-partition counts to the driver, offsets broadcast back — then a vocabulary-sized group-stats broadcast converts global ordinals to in-group tertiles. The naive window would put each language in one partition; no Window node exists in this plan.",
    "rep1_corpus_report" ->
      "Per-source data card: every rule predicate is a per-row bound-struct expression (two kernel/HOF calls per row, no joins), so the only Exchange is the source-keyed aggregate with map-side partial combine; the exact-dup count rides the same shuffle as an md5 count-distinct expand. Output is O(sources) — report cost equals one corpus scan.",
    "mmdd1_image_neardup" ->
      "Perceptual image dedup: one decode+dHash pass per image (mapPartitions — the disclosed binary-codec seam), then the generic hamming-banded self-join shipping (id, band, 14-bit chunk) rows — O(N x 4) narrow rows, never pixels, never all-pairs; hashes re-join by id for the bit_count verify. With maxHamming <= bands-1 the banded output EQUALS the all-pairs hamming ball (the oracle computes it flat), so exact recall costs a candidate join, not a cartesian.",
    "spm2_encode" ->
      "Unigram-LM encoding: the Viterbi DP runs ONCE per DISTINCT word (Zipf-bounded — one distinct shuffle) as pure Column HOFs over a broadcast score-map literal, then the segmentation BroadcastHashJoins back onto the posexploded corpus. The corpus itself is never shuffled to encode — the same discipline as BPE, with a dynamic-programming decoder instead of replace folds.",
    "mmdd5_incremental_phash" ->
      "Registry-incremental perceptual dedup: the probe reads the persistent registry's (id, dhash) rows — 16 B per image, pixels never stored — re-derives band keys by shift/mask, and equi-joins the batch's banded hashes; the retry guard is an id-only anti-join. Per-batch shuffled bytes are O(batch + registry x bands + candidates); growth is bounded by registration-exactly-once.",
    "kw1_keywords" ->
      "Per-document tf-idf keywords: one map-side-combined (doc, term) count, a term-keyed df join (AQE balances the Zipf skew; df is a term table, never corpus rows), N as a broadcast 1-row aggregate, and the top-k window partitioned on the DOCUMENT id — every window group is one document's distinct terms, bounded by document length, so this is the one place a window survives 100TB.",
    "fz1_fuzzy_search" ->
      "Index-served fuzzy search: the deletion-dictionary read is pruned by an IN filter over the query's own O(term length) variants (pushed into the scan), the levenshtein verify touches only the bounded candidate set, and the resolved terms ride the ordinary bucket-pruned postings BM25 — typo tolerance costs O(query) lookups, never the O(vocabulary) brute scan the f17 scan path pays.",
    "gc1_geo_cell_radius" ->
      "Cell-partitioned geo layout: the radius query's candidate cells are enumerated DRIVER-SIDE from a provably covering bound and land as PartitionFilters — the scan reads only the disk's neighborhood directories (spec-pinned), then the exact haversine verifies. Without the layout every geo_distance is a corpus scan; with it, cost is O(points near the origin) at any corpus size.",
    "mlt1_more_like_this" ->
      "more_like_this: term selection costs one bucket-pruned df read over the like-text's own terms (bounded collect), and the scoring pass is searchTopK's pruned-postings BM25 over <= maxQueryTerms terms with the minimum-should-match cut riding the same per-id aggregate — the corpus is read only at the selected terms' buckets, twice, never scanned.",
    "vd1_snapshot_diff" ->
      "Snapshot diff: both corpus versions project to (id, 16-byte digest) before anything joins — the full outer join shuffles digests, never documents, so auditing a 100TB re-cut moves ~24 B/doc.",
    "idx9_stemmed_search" ->
      "Analyzed index search: stemming happens ONCE at segment-write time (postings store stems; the analyzer rides the stats tables), so the query path is byte-identical to idx1 — driver-side query-term analysis plus the same bucket-pruned postings read. The analysis chain adds zero per-query corpus work.",
    "idx11_fielded_search" ->
      "Fielded multi_match from postings: each field's read keeps idx1's bucket PartitionFilters + term pushdown inside its OWN subtree (field-major directories — other fields' postings are pruned at the directory level before bucket pruning even starts), per-field RAW scores aggregate to (id, score) rows, and the best_fields/most_fields combine is ONE id-keyed shuffle over those rows. No per-field top-k truncation before the combine (dis_max over truncated lists would drop docs whose best field ranked below the cut); nothing corpus-sized exists past the pruned per-field reads.",
    "sg2_prefix_suggest" ->
      "Completion suggester: the md5 term buckets scatter prefixes by design, so the prefix read hits the SORTED vocabulary sidecar with a term RANGE predicate — parquet row-group min/max stats prune everything outside [p, p+U+FFFF) — candidates are capped and collected driver-side, and live df rides the ordinary bucket-pruned postings read. A prefix query costs O(matching vocabulary) + O(candidate postings), never a vocabulary or corpus scan.",
    "ca1_composite_page" ->
      "Composite-agg paging: the after_key's lexicographic predicate applies to RAW rows (a bucket's key decides it), so it lands whole in PushedFilters — Or(GreaterThan(seg,...),And(EqualTo,GreaterThan)) skips row groups before any aggregation — and the page cut plans as TakeOrderedAndProject(limit=size). A deep page never materializes earlier buckets; ES pages composite aggs for exactly this reason, and the plan IS that reason.",
    "th1_top_hits" ->
      "top_hits per bucket: Spark's WindowGroupLimit rewrite runs a PARTIAL per-partition top-k BEFORE the group-key Exchange and a final one after — each map task forwards at most k rows per group it sees, so the shuffle carries group-capped rows, not the corpus. The row_number window itself then ranks only survivors.",
    "pa7_cumulative_cardinality" ->
      "cumulative_cardinality the scalable way: each key contributes only its FIRST bucket (one user-key shuffle — the only full-data exchange), first-appearance counts roll up per bucket, and the running total is a prefix sum over the BOUNDED bucket frame. The naive spelling — a running collect_set window — would hold every key ever seen in every bucket's state; this plan holds one long per bucket.",
    "pc1_percolate" ->
      "Percolate (reverse search): the stored-query table explodes to (query, term) rows and BROADCASTS; documents explode their distinct analyzed tokens once and hash-join map-side — the corpus is never shuffled to find rule matches, and only (doc, query) HITS reach the per-pair count that enforces each query's own minimum_should_match. Tagging a 100 TB corpus against a rule table costs one scan.",
    "idx14_delete_by_query" ->
      "delete_by_query: id resolution reads ONLY the query terms' postings buckets (the same PartitionFilters pruning every search gets), so finding what to delete never scans the corpus — then the ordinary tombstone write (lens-exact charges, stats-last commit) makes the deletion visible to every subsequent search with adjusted statistics.",
    "f40_nested" ->
      "The nested query compiles to a higher-order exists() whose lambda rebinds path.* names to the CURRENT array element — same-element bool semantics with ZERO explode and zero shuffle (no Generate node anywhere, spec-pinned). The flattened cross-element reading, built from two separate nested clauses, shares the plan shape; only the lambda differs. At 100 TB an explode-based nested filter would multiply the scan by average array length before filtering it back down.",
    "f42_query_string" ->
      "query_string is pure driver-side parsing onto the existing leaves: every term/phrase/prefix/range lands in the SAME single-scan filter a hand-written predicate produces — no UDFs, one tokenization pipeline per referenced field, and the numeric range legs (n_chars:[400 TO 900]) reach PushedFilters. The grammar adds zero execution machinery to the plan.",
    "eh1_histogram" ->
      "ES histogram with min_doc_count:0 as ONE corpus scan: empty buckets come from a lag gap-fill over the REDUCED bucket frame (each bucket emits itself plus the missing keys since its predecessor) instead of a bounds-aggregate + spine + join spelling, which would recompute the bucket aggregation — i.e. rescan the corpus — once per reference. Spec-pinned to exactly one Scan node.",
    "na1_nested_agg" ->
      "Nested aggregation + reverse_nested: one explode to element grain, then ONE keyed exchange with map-side partial aggregation; the distinct-parent count (reverse_nested) rides the same shuffle as the element metrics instead of a second pass over the array column.",
    "re1_rank_eval" ->
      "_rank_eval: results are cut to rank <= k FIRST (pushable filter), one left join against judgments, and every metric — including ERR's survival product — is a window over the BOUNDED per-query frame. The ideal-DCG leg windows the judgments table alone. No corpus is touched; evaluation cost scales with queries x k, not documents.",
    "pc2_phrase_percolate" ->
      "Phrase percolate: containment through the broadcast term join is a LOSSLESS prefilter (adjacency implies containment), so the adjacency check — the dynamic form of match_phrase's token-joined needle — runs only on candidate (doc, query) pairs joined back by id. The corpus tokenizes twice but never shuffles; rule tables broadcast like pc1.",
    "jf1_join_field" ->
      "ES join-field queries over NORMALIZED frames: has_child is a child-side counted aggregation on the FK (the child predicate pushed to its scan) + a left-semi join of parents; has_parent is a plain FK semi join. ES forces both types into one shard and warns of 100x slowdowns; here Catalyst/AQE pick broadcast-vs-shuffle per side like any join, and no shard ever holds both corpora.",
    "lb1_length_batches" ->
      "Length-bucketed batching: the batch id comes from the DISTRIBUTED prefix-sum ordinal (range partition + per-partition offsets), never a one-partition row_number window — the recipe that sorts 100 TB of documents by token count without funnelling them through one reducer. Padding accounting is one keyed aggregate over the batched frame.",
    "pref1_preference_pairs" ->
      "Preference pairs: one groupBy with the native ExtremumBy idxmax/idxmin aggregates — best and worst response per prompt group resolve map-side with deterministic smallest-id ties, no window, no self-join; flat groups drop in the same pass.",
    "dr1_date_range" ->
      "date_range: every bucket is a conditional count in ONE aggregation pass over a single scan — three ranges cost the same scan as one — then a literal explode shapes the ES bucket rows. No per-range scans, no union of filters.",
    "kw3_significant_text" ->
      "significant_text with filter_duplicate_text: shingle ownership is a window-min over ONE shingle-keyed shuffle (a groupBy+join spelling would re-shuffle both sides), GUARDED since r17 by a map-side-combined shingle count — above-cap boilerplate shingles route to a broadcast mask-everywhere path and never enter the window, so no partition exceeds the cap; the surviving dup-window starts come home as one bounded array per AFFECTED doc and apply locally through a higher-order exists — the corpus text shuffles once, on the doc key, and the final (source, term) counts ride the same map-side-combined aggregation as kw2.",
    "cl1_collapse" ->
      "Field collapsing: anchor selection is a per-KEY window (bounded groups), the global outer cut is sort-limit (TakeOrderedAndProject), and inner hits re-join the corpus through a BROADCAST semi-join on the <= size surviving keys — spec-pinned to BroadcastHashJoin, never a sort-merge of the corpus against itself.",
    "sa1_sampler" ->
      "diversified_sampler: the per-key diversity cap is a bounded-group window; the global shard_size cut plans as TakeOrderedAndProject (per-task heaps, driver merges k per task) — the same shape at 600 rows and 600 billion.",
    "ip1_ip_range" ->
      "ip_range: dotted-quad parsing is in-plan string/integer arithmetic, every range and CIDR mask is a conditional count in ONE aggregation pass (partial+final around a single exchange, spec-pinned join-free), and the bucket rows come from a literal explode of the one aggregate row.",
    "vw1_variable_width_histogram" ->
      "variable_width_histogram (equal-depth adjudication): cut points from the sort-based exact quantiles, then ONE keyed aggregation with the bucket index computed as a fold of >= comparisons — the plan never contains a Window node (spec-pinned), because a corpus-wide ntile would funnel 100 TB through one reducer.",
    "fis1_frequent_item_sets" ->
      "frequent_item_sets: the subset lattice is ONE cube aggregation (map-side combined, 2^F groupings), pinned via localCheckpoint; support denominator, closedness max-join and the top-k all run on the reduced combination frame. ES's sampled ECLAT approximates under sharding; the cube is exact at one scan.",
    "cp1_change_point" ->
      "change_point: prefix-sum windows over the BOUNDED bucket frame give every split's Welch t in closed form; selection is a sort-limit(1) on the same reduced frame. The corpus was already reduced by the upstream date_histogram — detection cost scales with buckets, not documents.",
    "rtv1_retriever_tree" ->
      "The retriever tree: each leaf is one scan-ranked sort-limit (the standard leg's BM25 and the knn leg's cosine both end in TakeOrderedAndProject), fusion unions <= window rows per child and aggregates on the id key, and rank windows only run over already-cut frames — a whole modern search request whose per-node cost is one scan + k-bounded state.",
    "pc3_query_string_percolate" ->
      "query_string percolation: rules parse DRIVER-side at registration and broadcast as a (rule, term, role) table; the corpus tokenizes once and never shuffles — the one keyed aggregation is on (doc, rule) AFTER the broadcast join, and must_not rides it as a conditional count instead of a second pass.",
    "rag1_semantic_search" ->
      "The one-call RAG path: chunk + embed are one scan (mapPartitions, per-partition model load through the pluggable seam), the query embeds driver-side and rides as a LITERAL (no join for the query), chunk metadata re-joins embeddings on the synthetic chunk key once, and the final cut is sort-limit over the scored chunks.",
    "ta2_terms_order_metric" ->
      "terms ordered by a metric sub-agg: the metric rides the SAME keyed aggregation as doc_count (map-side partial combine, one shuffle — never a second pass per sub-agg), and the size cut on the new order is still TakeOrderedAndProject: per-task heaps on (metric, key), driver merges k per task. The most-used Kibana knob costs exactly what doc_count ordering costs.",
    "sv1_sparse_vector" ->
      "sparse_vector (ELSER) scoring: the query's token → weight map is a broadcast LITERAL, the dot product is one array aggregate per row over the doc's own sparse entries, and the rank cut is sort-limit — the corpus never shuffles to score and no posting/stats structure is consulted (the weights ARE the statistics, precomputed upstream). A learned-sparse query over 100 TB costs one scan.",
    "rtv5_rule_retriever" ->
      "rule retriever: criteria evaluate DRIVER-side against the request metadata (rules are literals — zero plan nodes for non-firing rules); exclusions are an isin filter over the child's <= window rows with a dense re-rank, and pins ride the shared pinned machinery (broadcast presence join + sentinel union). Query-rules cost is O(window), independent of corpus and ruleset size.",
    "f45_geo_shape" ->
      "geo_shape relations: envelope and polygon both compile to per-row codegen arithmetic (bbox ranges / PNPOLY crossing tests) — the same pushable-predicate shape as geo_bounding_box, no geometry library, no UDF; disjoint adds only a null gate. All three relations over 100 TB are one filtered scan each.",
    "idx20_fielded_search_after" ->
      "Fielded search_after: the cursor predicate filters the SAME per-field pruned-postings + id-keyed combine plan searchTopK builds (no extra reads — deep pages pay the page-1 cost), and it cuts hits BEFORE the top-k heap, so page depth never grows memory. The (score, id) cursor on the rounded surface makes pages tile exactly on any engine.",
    "sx1_semantic_index_search" ->
      "The persistent semantic_text stack: build is one chunk+embed scan plus VectorIndex's cell-keyed shuffle (sidecar write shares the scan's projection); a query embeds DRIVER-side, probes only its cells (PartitionFilters on cell ids), and the <= k hits BROADCAST onto the chunks sidecar for text — the corpus is never touched at query time. rag1's per-query re-embed becomes a one-time build.",
    "sg4_weighted_suggest" ->
      "Weighted completion suggester: the sidecar is range-partitioned and SORTED by term, so the prefix read prunes to matching row groups (the sg2 vocabulary discipline); context filtering is a per-row arrays_overlap against a literal; dedup is one keyed max over the prefix's entries; the cut is TakeOrderedAndProject. Suggest cost is O(entries matching the prefix), never the entry table.")

  private val epilogue: String = """
## Streaming index-lifecycle gate cost (st6, st9-st13) — r12 adjudication

The r10/r11 verdicts flagged the streaming gates' ~77 s (retimed) as
per-micro-batch commit overhead at toy scale. Audited batch-by-batch
in round 12:

- **st9 / st11 trimmed 4 → 3 batches** (fixture classes now mod 3,
  oracles updated). Every lifecycle property survives: cross-batch
  update, MID-stream compaction (fires after batch 2 with batch 3
  still to come), update overriding a doc whose last version sits in
  an already-compacted segment (batch 3 rewrites batch-2 docs), and —
  new with the odd batch count — a final read that must merge a
  compacted segment with a live uncompacted one (no end-of-stream
  compaction at 3 % 2 != 0). The dropped 4th batch re-proved existing
  properties only.
- **st10 / st12 stay at 4 batches — no batch is removable.** The two
  CDC delete windows are structurally distinct and live in different
  batches: batch 2's tombstones are CONSUMED by the mid-stream
  compaction that fires in the same commit (a tombstone leaking past
  compaction onto a re-sent doc is the bug class), while batch 3's
  tombstones are created AFTER that compaction and must survive as
  live tombstones to the final read. Each deletes a slice updated in
  the intervening batch, so both windows also prove the tombstone
  kills the UPDATED version in its re-ingest segment. Removing any
  batch deletes one of the two windows.
- **st4/st5/st6/st13's shared 4-batch fixture stays.** Its batch
  classes encode arrival-order semantics replayed by four oracles
  (clone-arrives-BEFORE-original for id ≡ 3 mod 4 proves
  first-arrival-wins over a later smaller id; st5's oracle replays
  the sequential clean-set construction batch by batch). Re-cutting
  to 3 classes preserves cross-batch dups but reshuffles which ids
  exercise the before/after cases across all four oracles at once —
  coverage-neutral at best, so the trim stops where the risk starts.

Remaining cost is honest state-store/segment-commit overhead per
micro-batch — amortized at real batch sizes, irreducible at fixture
scale without deleting lifecycle coverage.

## vx2/vx3/st6/st8 r12 bench drift — r13 retime

The r12 verdict flagged four gates as slower than r11 (vx3 4.05 →
6.77 s, vx2 6.62 → 7.97, st6 7.07 → 8.06, st8 6.15 → 7.52) with no
code change touching their paths, reading them as load noise (capture
at pregate load 2.29). Retimed in r13 at load ~1.3 via RunQuery
(sf0.1, 3 warm repeats each; run 1 carries JVM/session warm-up):
vx2 7.8/6.2 s, vx3 5.2/4.7 s, st6 6.9/6.8 s, st8 5.4/5.4 s — st6 and
st8 BELOW their r11 numbers, vx2 at parity, vx3 within the run-to-run
band of its r11 value. No plan-shape regression exists; the r12
deltas were environment load, as suspected. (The ADC gate needed no
profiling: its warm retime reproduces the r11 cost.)

## Graph ANN (HNSW) vs IVF-PQ — r13 adjudication

The reference's backing engine serves ANN with per-shard HNSW graphs
(Lucene's KNN codec). This repo serves IVF / IVF-PQ / ADC over
cell-partitioned parquet segments (VectorIndex; gates vx1-vx3, sim3,
pq1, st11/st12) and deliberately does NOT ship a graph index. The
adjudication:

- **HNSW's win is RAM-resident, single-node, pointer-chasing beam
  search**: each hop reads the current candidate's adjacency list and
  scores its neighbors — data-DEPENDENT random access, decided only
  after the previous hop's distances come back. That access pattern
  has no good Spark plan shape: a persisted adjacency table makes
  every hop a join (efSearch x depth shuffle rounds per query), and
  a driver-side graph walk is the collect-the-index anti-pattern this
  repo bans everywhere else. Lucene can do it because each shard's
  graph is a local, mmap'd, latency-domain structure — that is a
  SERVING-NODE design, not a distributed-scan design.
- **IVF's access pattern is data-INDEPENDENT given the query**: probe
  cells are known before any data is read, so they map onto exactly
  the machinery Spark already optimizes — plan-time directory pruning
  of cell-partitioned segments, columnar scans, one bounded
  aggregation. The same holds for PQ/ADC (codebook broadcast, scan
  stays columnar). At 100 TB / 1000 executors the IVF probe is a
  pruned parquet scan; an HNSW walk is either a per-query shuffle
  storm or a single node holding the graph.
- **CDC upkeep**: a tombstoned vector leaves a hole in every
  adjacency list that references it; correct repair is re-linking
  (effectively local rebuild — Lucene also rebuilds graphs on segment
  merge). IVF segments need NO graph repair: tombstones anti-join at
  read, compaction re-buckets rows — the exact lifecycle vx2/st11/
  st12 already gate. Graph upkeep under streaming CDC would add the
  one maintenance cost in this repo with no bounded-work story.
- **The serving contract is already recall-proven**: vx1/sim3 pin
  exact-configuration degradation (nprobe = nCells ≡ brute force —
  the same discipline an efSearch ≥ corpus HNSW oracle would pin),
  sim4/sd1/dd8 pin planted-neighbor recall, and pq1 pins the
  quantized-rerank path. A user migrating from the reference keeps
  recall knobs (nprobe ~ efSearch, cells ~ graph degree) with the
  same degradation-to-exact semantics.

Decision: IVF-PQ + compaction/rebuild is the Spark-native trade;
building an HNSW here would re-implement a latency-domain structure
on a throughput-domain engine and be slower than the pruned-scan IVF
at every corpus size a cluster justifies. Revisit only if the engine
grows a resident serving tier (a RAM-backed executor cache), where a
per-cell graph could accelerate in-cell refinement.

## r16: sampler / diversified_sampler — per-shard vs global adjudication

ES's `sampler` keeps the top `shard_size` hits PER SHARD (by score,
Lucene doc order for ties), so the sample is shard_size x n_shards
rows and its membership depends on document ROUTING — two clusters
with different shard counts, or the same data re-indexed with a
different routing key, sample different documents. That is not an
engine-independent semantics: no other engine can replay it, and even
ES cannot replay its own sample across a reindex. The portable
semantics implemented (EsAggs.samplerAgg, sa1 gate):

- **Global cut**: top `shardSize` under the TOTAL order (score desc,
  id asc) — deterministic on any engine, the qf1
  topFractionPerGroup discipline. A caller that wants ES's larger
  per-shard aggregate sample sets shardSize = shard_size x n_shards.
- **diversified_sampler**: the `max_docs_per_value` cap applies in
  the SAME score order BEFORE the global cut (per-key row_number <=
  cap). ES de-prioritizes over-represented keys during collection —
  same selection, stated declaratively.
- **Scale shape**: the cap is a keyed window over bounded groups;
  the cut is sort-limit -> TakeOrderedAndProject (per-partition
  top-k, driver merges k per partition) — never a global sort. At
  100 TB the cost is one scan + one bounded shuffle of <= cap rows
  per key, exactly ES's collection cost without the routing
  dependence.

## r16: variable_width_histogram — equal-depth adjudication

ES's `variable_width_histogram` runs a shard-local streaming
clustering (nearest-centroid collection with cluster merges); its own
docs call the result approximate and dependent on document order and
shard distribution. There is no engine-independent replay of that
algorithm — even two ES runs over different routings disagree. The
portable deterministic reading implemented
(EsAggs.variableWidthHistogram, vw1 gate): equal-DEPTH buckets.

- Cut points are the exact interpolated i/k quantiles from
  Quantiles.viaSort (the scale-stable sort-based selection — never a
  global-window ntile over the corpus), rounded half-up at 6 dp so an
  interpolation-formula ulp cannot flip a boundary datum's bucket
  between engines.
- A value equal to a cut point goes to the HIGHER bucket; empty
  buckets (heavy duplicate mass collapsing adjacent cut points) are
  omitted, mirroring ES's never-empty cluster buckets.
- Surface matches ES: per bucket (min, max, avg, doc_count), keys
  ordered.
- Cost at 100 TB: one global sort for the quantiles + ONE keyed
  aggregation pass; the k-1 cut points are the only driver state.

## r16: retime table for the r15 load-window spikes (VERDICT ask 7)

Method: `SPARK_GRAFT_ONLY` subset Bench runs at sf0.1, 1-min load
0.1-1.1 at start (vs the r15 driver window's 3.9). Numbers vs the r15
builder full-board run (BENCH.local.json):

| gate | r15 driver | r15 builder | r16 idle retime | verdict |
|---|---|---|---|---|
| rt1_rare_terms | 1.10 | 1.097 | **0.50** | load noise, cleared |
| t9_nfc_exact_dedup | 1.12 | 1.122 | **1.29** | flat, fine |
| f20_dis_max_scored | ~1.8x | 1.31 | 3.79 cold -> **1.91** behind a scored-gate JIT warmer | cold-JVM codegen; the full board amortizes it (bm1 absorbed 3.5 s in the probe run) — no code ask |
| f21_term_idf_scored | ~1.8x | 1.30 | **1.74** | 1.3x, under threshold at load ~0.9 |
| hy4_hybrid_linear | spike | 1.83 | **2.33** | 1.27x, under threshold |
| mmdd4_video_neardup | spike | 3.41 | **3.58** | flat, fine |
| hn2_hard_negatives_served | spike | 3.16 | **5.0-6.5** (4 runs) | sticks — but it is the INDEX-BUILD LIFECYCLE family: every run rebuilds the sf0.1 vector index into a temp dir before serving (the idx-gate 2-4 s documented cost, ADVICE r14), and hn1 — the same search arithmetic without the build — runs 1.25 s. The variance is FS-cache state around a write lifecycle, not a plan defect; plan unchanged since r13, nothing in r16 touches VectorIndex/Selection. No code ask. |

Subset-run caveat recorded for future retimes: the first gate of a
cold-JVM subset pays the codegen JIT the full board amortizes —
prepend a sacrificial same-family gate before reading a first-slot
number.

## r17: st-family drift retime (r16 VERDICT ask 6)

Method: `SPARK_GRAFT_WARM=st1_stream_window SPARK_GRAFT_ONLY=st6,st9,
st10,st11,st12` Bench at sf0.1. The quietest window available this
round was 1-min load 1.8 (start) → 2.2 (end) — above the <1.5 target;
numbers below carry that caveat.

| gate | r15 | r16 driver | r17 retime (load 1.8) |
|---|---|---|---|
| st6_stream_index | 6.0 | 7.0 | 7.28 |
| st9_stream_upsert_index | — | — | 11.03 / 11.27 (retime) |
| st10_stream_cdc_index | 15.6 | 17.2 | 21.05 → 16.95 (retime) |
| st11_stream_vector_index | — | — | 9.37 |
| st12_stream_cdc_vector | 10.5 | 12.3 | 13.74 / 14.08 (retime) |

Reading: st10's first-run 21 s collapses to 16.95 on the in-JVM
retime (first-slot state-store init, the documented family JIT), and
the retimed numbers sit ~8-15% above r15 at a load ~2 — consistent
with the r16 verdict's "environmental" reading but NOT yet
conclusively cleared (the <1.5-load window never arrived). Judge-
confirmed r16 and builder-confirmed r17: no plan in the
CorpusStream/VectorIndex ingest path changed since r15; state
partitions remain pinned at 8; the per-micro-batch segment-commit
count is unchanged. Standing instruction: re-run this subset at
load < 1.5 before treating the drift as code.

## r17: significant_text hot-shingle guard — adjudication + measurement

The ownership window partitions by shingle with NO map-side combine;
one universal boilerplate shingle would land every occurrence in a
single task at corpus scale (r16 What's-wrong #1).
`maxShingleOccurrences` (default 100k) adjudicates an above-cap
shingle as pure boilerplate: its positions mask in EVERY document —
owner included — via a broadcast join against the tiny hot-key set,
and it never enters the window. Semantics note: below the cap,
ownership is unchanged; above it, the owner ALSO loses the passage
(a shingle duplicated beyond the cap is boilerplate wherever it
appears; the JLH doc totals never change either way).

ScaleCheck r17 (planted 6-token boilerplate tail on EVERY doc,
sf0.1 ×1/×4, local[8]):

| size | docs | capped (cap 1000) | effectively uncapped |
|---|---|---|---|
| 1x | 5,000 | 4.59 s | 3.39 s |
| 4x | 20,000 | 10.43 s | 8.02 s |

Both scale ~2.3× for 4× docs at toy scale — the hot partition is only
20k rows here, absorbed by one task, while the guard's extra
map-side-combined count costs a constant ~30%. The guard is not a
toy-scale win and is not claimed as one: it exists for the regime
where one shingle's occurrence list exceeds a single task (billions
of rows at 100 TB), where the uncapped window stalls the stage and
the capped path stays flat by construction (hot rows take the
broadcast path; cold partitions are ≤ cap by definition).

## r17: sloppy-phrase match set is now Lucene-exact (ADVICE r16 #2)

The index-served sloppy phrase previously matched ORDERED chains
only; ES/Lucene's sloppy matcher admits transposed terms within the
budget (adjacent swap costs 2). r17 replaces the chain predicate with
the exact criterion — an assignment of phrase slot i to a distinct
position pᵢ of term i with max(pᵢ − i) − min(pᵢ − i) ≤ slop — so
WHICH documents match is now Lucene-identical (idx19 oracle replays
the widened set). The remaining adjudication is the COUNT only:
anchored matches at weight 1 instead of Lucene's non-replayable
1/(1 + matchLength) accumulation.
"""

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of headline queries\n\n")
    sb.append("Generated by `graft.tools.DumpPlans` (formatted explain at " +
      s"$sf; plan shapes are scale-independent). Each plan is annotated " +
      "with why its shape is the one a 1000-executor/100TB deployment " +
      "needs; `PlanQualitySpec` asserts these properties in CI.\n")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
        .linesIterator.takeWhile(!_.startsWith("===")).mkString("\n")
      sb.append(s"\n## $name\n\n$why\n\n```\n$plan\n```\n")
    }
    sb.append(epilogue)
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println(s"[plans] wrote PLANS.md (${picks.size} queries)")
    spark.stop()
  }
}
