package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{BucketPipeline, EsAggs, RankEval}

/** ES pipeline-aggregation gates ([[graft.operators.BucketPipeline]]):
  * each gate bucketizes with a date_histogram-shaped groupBy, applies
  * the pipeline agg, and the DuckDB oracle replays the identical
  * window arithmetic. Money rides a cents BIGINT
  * (`floor(sum·100 + 0.5)` — the identical expression on both
  * engines) so every running/moving aggregate is INTEGER-exact and
  * immune to float association order, which windowed aggregation does
  * not pin across engines.
  */
object AggQueries {

  /** Monthly order buckets: (month, n, rev_cents). */
  private def monthly(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).cast("long").as("n"),
        floor(sum("o_totalprice") * 100.0 + 0.5).cast("long")
          .as("rev_cents"))

  private val monthlySql =
    """SELECT date_trunc('month', o_orderdate) AS month,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(floor(sum(o_totalprice) * 100.0 + 0.5) AS BIGINT) AS rev_cents
      |FROM orders GROUP BY 1""".stripMargin

  /** Deterministic IPv4 fixture for the ip_range/ip_prefix gates:
    * 10.0.x.y from customer keys, with planted malformed rows
    * (%23 — an out-of-range octet) and nulls (%29) that must count
    * in NO bucket.
    */
  private def synthIps(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "customer").select(
      when(col("c_custkey") % 29 === 0, lit(null: String))
        .when(col("c_custkey") % 23 === 0, lit("300.1.2.3"))
        .otherwise(concat_ws(".", lit("10"), lit("0"),
          (col("c_custkey") % 256).cast("string"),
          ((col("c_custkey") * 7) % 256).cast("string"))).as("ip"))

  private val synthIpsSql =
    """SELECT CASE WHEN c_custkey % 29 = 0 THEN NULL
      |  WHEN c_custkey % 23 = 0 THEN '300.1.2.3'
      |  ELSE '10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.' ||
      |       CAST((c_custkey * 7) % 256 AS VARCHAR) END AS ip
      |FROM customer""".stripMargin

  /** The oracle's replay of [[EsAggs]]' ipv4Value: the same octet
    * regex then the same base-256 arithmetic (a bare expression over
    * an `ip` column).
    */
  private val ipValueSql =
    raw"""CASE WHEN regexp_matches(ip,
         |  '^((25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])$$')
         |  THEN CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
         |     + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
         |     + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
         |     + CAST(string_split(ip, '.')[4] AS BIGINT) END""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ES derivative + unit normalization (normalized_value): month-
    // over-month revenue delta, also per-day across the varying
    // 28/29/30/31-day gaps
    "pa1_derivative" -> ((s, d) => {
      val out = BucketPipeline.derivative(monthly(s, d), "month",
        "rev_cents", "delta_cents", unitMillis = Some(86400000L))
      out.select(col("month"), col("n"),
          (col("rev_cents") / 100.0).as("rev"),
          (col("delta_cents") / 100.0).as("rev_delta"),
          QueryUtil.rhu(col("delta_cents_per_unit") / 100.0, 6)
            .as("rev_delta_per_day"))
        .orderBy("month")
    }),
    // ES cumulative_sum on both a count metric and a money metric
    "pa2_cumulative_sum" -> ((s, d) => {
      val c1 = BucketPipeline.cumulativeSum(monthly(s, d), "month",
        "n", "cum_n")
      val out = BucketPipeline.cumulativeSum(c1, "month",
        "rev_cents", "cum_cents")
      out.select(col("month"), col("n"), col("cum_n"),
          (col("cum_cents") / 100.0).as("cum_rev"))
        .orderBy("month")
    }),
    // ES moving_fn per series (terms → date_histogram nesting): a
    // trailing 3-month unweightedAvg (shift 0 — ES's default window
    // EXCLUDES the current bucket) and a 3-month max including it
    // (shift 1), restarting per order status
    "pa3_moving_fn" -> ((s, d) => {
      val b = Tables.load(s, d, "orders")
        .groupBy(col("o_orderstatus"),
          date_trunc("month", col("o_orderdate")).as("month"))
        .agg(floor(sum("o_totalprice") * 100.0 + 0.5).cast("long")
          .as("rev_cents"))
      val m1 = BucketPipeline.movingFn(b, "month", "rev_cents", 3,
        "unweightedAvg", shift = 0, out = "mavg_cents",
        seriesBy = Seq("o_orderstatus"))
      val out = BucketPipeline.movingFn(m1, "month", "rev_cents", 3,
        "max", shift = 1, out = "mmax_cents",
        seriesBy = Seq("o_orderstatus"))
      out.select(col("o_orderstatus"), col("month"),
          (col("rev_cents") / 100.0).as("rev"),
          (col("mavg_cents") / 100.0).as("trailing_avg"),
          (col("mmax_cents") / 100.0).as("window_max"))
        .orderBy("o_orderstatus", "month")
    }),
    // ES bucket_script (avg order price from two sibling metrics) +
    // bucket_selector (keep months whose average clears the bar)
    "pa4_bucket_script" -> ((s, d) => {
      val scripted = BucketPipeline.bucketScript(monthly(s, d),
        "avg_price", col("rev_cents") / 100.0 / col("n"))
      BucketPipeline.bucketSelector(scripted, col("avg_price") > 151000.0)
        .select(col("month"), col("n"),
          QueryUtil.rhu(col("avg_price"), 4).as("avg_price"))
        .orderBy("month")
    }),
    // ES bucket_sort: second-to-fourth revenue months (from 1, size 3)
    "pa5_bucket_sort" -> ((s, d) => {
      BucketPipeline.bucketSort(monthly(s, d),
        Seq(col("rev_cents").desc, col("month")), from = 1,
        size = Some(3))
        .select(col("month"), col("n"),
          (col("rev_cents") / 100.0).as("rev"))
    }),
    // ES serial_diff at lag 2 (the seasonality-differencing face)
    "pa6_serial_diff" -> ((s, d) => {
      BucketPipeline.serialDiff(monthly(s, d), "month", "rev_cents",
        2, "diff_cents")
        .select(col("month"), col("n"),
          (col("diff_cents") / 100.0).as("rev_diff2"))
        .orderBy("month")
    }),
    // ES cumulative_cardinality: distinct users ever seen, per day —
    // computed scalably (first-seen bucket per key, one key shuffle,
    // prefix sum over the bounded bucket frame; never a running
    // collect_set)
    "pa7_cumulative_cardinality" -> ((s, d) => {
      val raw = Tables.load(s, d, "events")
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      val buckets = raw.groupBy("day")
        .agg(count(lit(1)).cast("long").as("n_events"))
      BucketPipeline.cumulativeCardinality(buckets, raw, col("day"),
        "user_id", "day", "cum_users")
        .select(col("day"), col("n_events"), col("cum_users"),
          col("cum_users_new"))
        .orderBy("day")
    }),
    // ES date_histogram min_doc_count:0 — weekly buckets of the
    // top-price tail are genuinely SPARSE (49 of 326 weeks at
    // sf0.001), the spine materializes the silent weeks with zeros,
    // and the prefix sum proves pipeline aggs see them
    "pa8_empty_buckets" -> ((s, d) => {
      val b = Tables.load(s, d, "orders")
        .filter(col("o_totalprice") > 480000.0)
        .groupBy(date_trunc("week", col("o_orderdate")).as("week"))
        .agg(count(lit(1)).cast("long").as("n"))
      val filled = BucketPipeline.fillEmptyBuckets(b, "week", "week",
        fill = Map("n" -> lit(0L)))
      BucketPipeline.cumulativeSum(filled, "week", "n", "cum_n")
        .select(col("week"), col("n"), col("cum_n"))
        .orderBy("week")
    }),
    // ES range aggregation: half-open [from, to) buckets over account
    // balances, including an OVERLAPPING range (ES counts a doc in
    // every range it fits — a groupBy bucketing would miss that)
    "ra1_range_agg" -> ((s, d) => {
      EsAggs.rangeAgg(Tables.load(s, d, "customer"), "c_acctbal",
        Seq((None, Some(0.0)), (Some(0.0), Some(5000.0)),
          (Some(5000.0), None), (Some(2500.0), Some(7500.0))))
        .orderBy("key")
    }),
    // ES filters aggregation: named overlapping predicates + the
    // other bucket, one pass
    "fa1_filters_agg" -> ((s, d) => {
      EsAggs.filtersAgg(Tables.load(s, d, "orders"), Seq(
        "high_value" -> (col("o_totalprice") > 300000.0),
        "urgent" -> (col("o_orderpriority") === "1-URGENT"),
        "open" -> (col("o_orderstatus") === "O")),
        otherBucket = true)
        .orderBy("key")
    }),
    // ES geohash_grid at precision 2: quantize → interleave → base32,
    // closed-form integer arithmetic replayed bit-for-bit by the
    // oracle (no transcendental anywhere)
    "gh1_geohash_grid" -> ((s, d) => {
      val pts = Tables.load(s, d, "customer").select(col("c_custkey"),
        struct(
          ((col("c_custkey") % 121) - 60).cast("double").as("lat"),
          (((col("c_custkey") * 7) % 301) - 150).cast("double")
            .as("lon")).as("loc"))
      EsAggs.geohashGrid(pts, "loc", 2)
    }),
    // ES geotile_grid: Web-Mercator z/x/y bucketing at zoom 3 over
    // the integer-derived points; the oracle replays the identical
    // expression chain (asinh spelled as ln(t + sqrt(t²+1)) on BOTH
    // engines)
    "gt1_geotile_grid" -> ((s, d) => {
      val pts = Tables.load(s, d, "customer").select(col("c_custkey"),
        struct(
          ((col("c_custkey") % 121) - 60).cast("double").as("lat"),
          (((col("c_custkey") * 7) % 301) - 150).cast("double")
            .as("lon")).as("loc"))
      EsAggs.geotileGrid(pts, "loc", 3)
    }),
    // ES boxplot: exact R-7 quartiles over integer quantities
    "bp1_boxplot" -> ((s, d) => {
      EsAggs.boxplot(Tables.load(s, d, "lineitem"), "l_quantity")
    }),
    // ES t_test, both variants: order totals (cents) of status O vs
    // F; Σx² exceeds 2^53 at scale so the t statistic carries ~1e-15
    // relative engine noise — rhu 6 pins it (means stay integer-exact)
    "tt1_t_test" -> ((s, d) => {
      val li = Tables.load(s, d, "orders")
        .withColumn("cents", floor(col("o_totalprice") * 100.0 + 0.5))
      def one(variant: String) =
        EsAggs.tTest(li, "cents", "o_orderstatus", "O", "F", variant)
          .withColumn("variant", lit(variant))
      one("heteroscedastic").unionByName(one("homoscedastic"))
        .select(col("variant"), col("n_a"), col("n_b"),
          (col("mean_a") / 100.0).as("mean_a"),
          (col("mean_b") / 100.0).as("mean_b"),
          QueryUtil.rhu(col("t_stat"), 6).as("t_stat"),
          QueryUtil.rhu(col("deg_f"), 4).as("deg_f"))
        .orderBy("variant")
    }),
    // ES string_stats (+ show_distribution's entropy) over the corpus
    "ss1_string_stats" -> ((s, d) => {
      EsAggs.stringStats(Tables.load(s, d, "documents"), "text")
        .select(col("count"), col("min_length"), col("max_length"),
          col("avg_length"),
          QueryUtil.rhu(col("entropy"), 6).as("entropy"))
    }),
    // ES matrix_stats over three small-integer measures (moment sums
    // stay under 2^53 → covariance/correlation bit-exact, no rounding)
    "mx1_matrix_stats" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .withColumn("disc_c", floor(col("l_discount") * 100.0 + 0.5))
        .withColumn("tax_c", floor(col("l_tax") * 100.0 + 0.5))
      EsAggs.matrixStats(li, Seq("l_quantity", "disc_c", "tax_c"))
        .orderBy("field_a", "field_b")
    }),
    // ES percolate (reverse search): documents matched against a
    // stored-query table (term-set subset — what routing/tagging rule
    // tables look like); broadcast rule join, corpus never shuffles
    "pc1_percolate" -> ((s, d) => {
      graft.operators.Percolate.percolateRules(
        Tables.load(s, d, "documents"), "doc_id", "text", Seq(
          ("stream_filter", Seq("stream", "filter"), 2),
          ("any_join", Seq("join", "merge"), 1),
          ("heavy_sort", Seq("window", "sort", "order"), 3)))
        .orderBy("doc_id", "query_id")
    }),
    // percolate with PHRASE rules (stored match_phrase queries):
    // containment prefilter through the broadcast term join, then the
    // adjacency check on candidate pairs only
    "pc2_phrase_percolate" -> ((s, d) => {
      graft.operators.Percolate.percolatePhraseRules(
        Tables.load(s, d, "documents"), "doc_id", "text", Seq(
          ("r_hash_join", "hash join"),
          ("r_sort_merge", "sort merge"),
          ("r_stream_filter", "stream filter")))
        .orderBy("doc_id", "query_id")
    }),
    // percolate with QUERY-STRING rules (the Kibana-bar-as-alert
    // face): parsed at registration onto must/should/must_not term
    // sets, matched through the same broadcast containment machinery;
    // the three rules exercise OR-defaults + negation, a pure
    // disjunction, and a + conjunction
    "pc3_query_string_percolate" -> ((s, d) => {
      graft.operators.Percolate.percolateQueryStrings(
        Tables.load(s, d, "documents"), "doc_id", "text", Seq(
          ("r_or_not", "stream filter -join"),
          ("r_disj", "merge | sort"),
          ("r_conj", "stream + merge")))
        .orderBy("doc_id", "rule_id")
    }),
    // ES geo_distance aggregation: ring buckets by haversine distance
    // from an origin — Geo.haversineMeters composed with rangeAgg,
    // raw-double ring compares (the Geo float discipline)
    "gd1_geo_distance_agg" -> ((s, d) => {
      val pts = Tables.load(s, d, "customer").select(col("c_custkey"),
        ((col("c_custkey") % 121) - 60).cast("double").as("lat"),
        (((col("c_custkey") * 7) % 301) - 150).cast("double").as("lon"))
      val withDist = pts.withColumn("dist_m",
        graft.functions.Geo.haversineMeters(col("lat"), col("lon"),
          lit(10.0), lit(20.0)))
      EsAggs.rangeAgg(withDist, "dist_m", Seq(
        (None, Some(2.0e6)), (Some(2.0e6), Some(8.0e6)),
        (Some(8.0e6), None)))
        .orderBy("key")
    }),
    // ES sibling pipeline aggs: stats_bucket over all monthly buckets
    // + max_bucket with its tie-keeping keys list (cents-exact)
    "pa9_sibling_buckets" -> ((s, d) => {
      val b = monthly(s, d)
      val st = BucketPipeline.bucketStats(b, "rev_cents")
        .withColumnRenamed("count", "n_months")
      val mx = BucketPipeline.maxBucket(
        b.withColumn("month_key", col("month").cast("string")),
        "month_key", "rev_cents")
        .withColumnRenamed("keys", "top_months")
        .withColumnRenamed("value", "top_rev_cents")
      st.crossJoin(mx)
    }),
    // ES moving_percentiles (exact single-p form): trailing 6-month
    // median of revenue, ES's shift-0 window (excludes the current
    // bucket); p = 0.5 over integer cents keeps the R-7 interpolation
    // bit-exact across engines
    "pa10_moving_percentile" -> ((s, d) => {
      BucketPipeline.movingPercentile(monthly(s, d), "month",
          "rev_cents", 6, 0.5, shift = 0, out = "med6_cents")
        .select(col("month"), col("n"),
          (col("med6_cents") / 100.0).as("trailing_median"))
        .orderBy("month")
    }),
    // ES geo_line: per-group tracks ordered by the sort field with
    // the size cut and the complete flag; integral coordinates keep
    // the scalar rendering engine-stable
    "gl1_geo_line" -> ((s, d) => {
      val pts = Tables.load(s, d, "customer").select(
        col("c_mktsegment"), col("c_custkey"),
        struct(((col("c_custkey") % 121) - 60).cast("double").as("lat"),
          (((col("c_custkey") * 7) % 301) - 150).cast("double")
            .as("lon")).as("loc"))
      EsAggs.geoLine(pts, "c_mktsegment", "loc", "c_custkey", size = 5)
    }),
    // ES categorize_text (the deterministic subset): digit runs mask
    // to '#', documents group by template — log-line categorization
    // without the corpus-order-dependent ML half
    "ct1_categorize_text" -> ((s, d) => {
      val lines = Tables.load(s, d, "documents").select(col("doc_id"),
        concat(concat_ws(" ", slice(
            graft.functions.TextAnalysis.tokens(col("text")), 1, 2)),
          lit(" code "), ((col("doc_id") * 7) % 13).cast("string"))
          .as("line"))
      EsAggs.categorizeText(lines, "doc_id", "line", Some(20))
    }),
    // ES date_range: [from, to) time buckets with ES's "from-to" keys
    "dr1_date_range" -> ((s, d) => {
      EsAggs.dateRangeAgg(Tables.load(s, d, "orders"), "o_orderdate",
        Seq((None, Some("1993-01-01")),
          (Some("1993-01-01"), Some("1996-06-15")),
          (Some("1996-06-15"), None)))
        .orderBy("key")
    }),
    // ES ip_range over synthesized IPv4s (10.0.x.y from customer
    // keys, with planted malformed rows and nulls that must count in
    // NO bucket): [from, to) dotted-quad bounds plus CIDR masks —
    // the oracle replays the octet parse and the integer range tests
    "ip1_ip_range" -> ((s, d) => {
      EsAggs.ipRangeAgg(synthIps(s, d), "ip",
        ranges = Seq((None, Some("10.0.64.0")),
          (Some("10.0.64.0"), Some("10.0.192.0"))),
        masks = Seq("10.0.128.0/17", "10.0.0.0/18"))
        .orderBy("key")
    }),
    // ES ip_prefix: /18 networks of the same synthesized IPs —
    // exactly four buckets (10.0.{0,64,128,192}.0), malformed rows
    // bucket nowhere
    "ip2_ip_prefix" -> ((s, d) => {
      EsAggs.ipPrefixAgg(synthIps(s, d), "ip", 18)
    }),
    // ES variable_width_histogram under the equal-depth adjudication
    // (PLANS.md r16): 5 buckets over integer-valued floor(totalprice),
    // cut points at the exact interpolated quantiles rounded at 6 dp,
    // boundary values to the higher bucket
    "vw1_variable_width_histogram" -> ((s, d) => {
      EsAggs.variableWidthHistogram(
        Tables.load(s, d, "orders")
          .select(floor(col("o_totalprice")).cast("double").as("v")),
        "v", buckets = 5)
    }),
    // ES frequent_item_sets: closed sets over the field cube; the
    // derived pclass column is a FUNCTION of o_orderpriority, so
    // every {pclass} singleton has an equal-count {pclass, priority}
    // superset and must be pruned by the closedness rule — an
    // open-set miner would emit it
    "fis1_frequent_item_sets" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
        .withColumn("pclass", substring(col("o_orderpriority"), 1, 1))
      EsAggs.frequentItemSets(o,
        Seq("o_orderstatus", "o_orderpriority", "pclass"),
        minimumSupport = 0.02, minimumSetSize = 1, size = 15)
    }),
    // ES change_point (the portable two-sample split scan): monthly
    // order counts with a planted +500 step at 1996-01-01 — the
    // detector must put the change point exactly there with a
    // step_change verdict; the oracle replays prefix sums, Welch's t
    // per split and the max-|t| earliest-tie selection
    "cp1_change_point" -> ((s, d) => {
      val stepped = monthly(s, d).withColumn("n2",
        when(col("month") >= lit("1996-01-01").cast("timestamp"),
          col("n") + 500).otherwise(col("n")))
      BucketPipeline.changePoint(stepped, "month", "n2",
        minSegment = 3, threshold = 5.0)
    }),
    // ES random_sampler: the md5(seed:id) < p portable draw (ES's own
    // per-shard hash is routing-dependent); per-source sampled counts
    // plus the 1/p doc-count estimate — sub-aggs compose over the
    // returned sample frame
    "rx1_random_sampler" -> ((s, d) => {
      EsAggs.randomSampler(Tables.load(s, d, "documents"), "doc_id",
          probability = 0.25, seed = 7)
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("doc_count"),
          (count(lit(1)) * 4).cast("long").as("estimated_doc_count"))
        .orderBy("source")
    }),
    // ES top_metrics: per bucket, the metrics of the row holding the
    // extreme sort value (deterministic tie column)
    "tm1_top_metrics" -> ((s, d) => {
      EsAggs.topMetrics(Tables.load(s, d, "orders"),
        Seq("o_orderpriority"), "o_totalprice",
        Seq("o_orderkey", "o_orderstatus"), tieCol = "o_orderkey")
    }),
    // ES rate agg (calendar normalization): monthly order counts as a
    // per-day rate — each bucket divides by ITS OWN month length
    "ra2_rate_agg" -> ((s, d) => {
      EsAggs.rateAgg(monthly(s, d), "month", "n", "month", "day")
        .select(col("month"), col("n"),
          QueryUtil.rhu(col("rate"), 6).as("orders_per_day"))
        .orderBy("month")
    }),
    // the full-knob ES terms agg: missing-bucket substitution,
    // anchored include/exclude regexes, min_doc_count, size cut
    "ta1_terms_agg" -> ((s, d) => {
      val c = Tables.load(s, d, "customer")
        .withColumn("seg", when(col("c_custkey") % 11 === 0, lit(null))
          .otherwise(col("c_mktsegment")))
      EsAggs.termsAgg(c, "seg", size = Some(10), minDocCount = 2,
        include = Some("(A|B|_).*"), exclude = Some("BUILDING"),
        missing = Some("__missing__"))
    }),
    // ES terms agg ORDERED BY A METRIC SUB-AGG ("order":
    // {"avg_price": "desc"} — the most-used Kibana terms knob): the
    // metric rides the same keyed aggregation as doc_count, ordering
    // is (metric desc nulls last, key asc — ES's tie rule), size cut
    // on the metric order
    "ta2_terms_order_metric" -> ((s, d) => {
      EsAggs.termsAgg(Tables.load(s, d, "orders"), "o_orderpriority",
        size = Some(4), orderMetric = Some(("avg", "o_totalprice")))
    }),
    // ES terms agg ordered by _key ("order": {"_key": "asc"} — the
    // alphabetical-dashboard knob); min_doc_count composes, the size
    // cut rides the key order
    "ta3_terms_order_key" -> ((s, d) => {
      EsAggs.termsAgg(Tables.load(s, d, "orders"), "o_orderpriority",
        size = Some(3), minDocCount = 2, orderByKey = true,
        orderAsc = true)
    }),
    // ES `missing` agg: the bucket of docs whose field is absent,
    // metric sub-aggs inside the bucket (nulls synthesized — the
    // testdata is dense, same discipline as f7)
    "ms1_missing_agg" -> ((s, d) => {
      EsAggs.missingAgg(
        Tables.load(s, d, "orders").withColumn("p",
          expr("nullif(o_orderpriority, '3-MEDIUM')")),
        "p", Some("o_totalprice"))
    }),
    // ES `global` agg: query-scoped vs whole-index cells from ONE
    // conditional-aggregate pass (never two scans)
    "ga1_global_agg" -> ((s, d) => {
      EsAggs.globalAgg(Tables.load(s, d, "orders"),
        col("o_orderpriority") === "1-URGENT", "o_totalprice")
    }),
    // the ES _transform API, pivot type: group_by sources (terms +
    // calendar-month date_histogram) x a 4-agg matrix as ONE keyed
    // aggregation — the entity-centric materialization ES runs
    // cluster-side
    "xf1_transform_pivot" -> ((s, d) => {
      // money rides the cents-BIGINT discipline: avg/sum of exact
      // integer cents are association-order-immune, so the 6-dp
      // rounding never sits on a cross-engine ulp tie (the r17
      // sf0.01 retime caught exactly that on raw-double avg)
      graft.operators.Transforms.pivot(
        Tables.load(s, d, "orders").withColumn("price_cents",
          floor(col("o_totalprice") * 100 + 0.5).cast("long")),
        """{"pivot": {
          |  "group_by": {
          |    "status": {"terms": {"field": "o_orderstatus"}},
          |    "month": {"date_histogram": {"field": "o_orderdate",
          |      "calendar_interval": "month"}}},
          |  "aggregations": {
          |    "avg_price": {"avg": {"field": "price_cents"}},
          |    "total": {"sum": {"field": "price_cents"}},
          |    "n": {"value_count": {"field": "o_orderkey"}},
          |    "customers": {"cardinality": {"field": "o_custkey"}}}
          |}}""".stripMargin)
    }),
    // the ES _transform API, latest type: newest order per customer
    // as a keyed struct-max (never a corpus window); ES's
    // ingest-order tie closes deterministically on the tie breaker
    "xf2_transform_latest" -> ((s, d) => {
      graft.operators.Transforms.latest(Tables.load(s, d, "orders"),
        """{"latest": {"unique_key": ["o_custkey"],
          |"sort": "o_orderdate"}}""".stripMargin,
        tieBreaker = "o_orderkey")
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy("o_custkey")
    }),
    // composite agg with a DATE_HISTOGRAM source (ca1 pages terms
    // sources): the after_key carries a TIMESTAMP bucket — two pages
    // must tile exactly across the derived key; the oracle replays
    // the month truncation, the lexicographic after predicate and
    // both page cuts
    "ca2_composite_date_histo" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
        .withColumn("month", date_trunc("month", col("o_orderdate")))
      val p1 = EsAggs.compositePage(o,
        Seq("month", "o_orderstatus"), 6)
      val last = p1.collect().last
      val p2 = EsAggs.compositePage(o,
        Seq("month", "o_orderstatus"), 6,
        afterKey = Some(Seq(last.get(0), last.get(1))))
      p1.withColumn("page", lit(1L))
        .unionByName(p2.withColumn("page", lit(2L)))
        .orderBy("page", "month", "o_orderstatus")
    }),
    // ES t_test type paired: per-row difference moments (exact
    // integral sums; one sqrt both engines)
    "tt2_t_test_paired" -> ((s, d) => {
      EsAggs.tTestPaired(Tables.load(s, d, "lineitem"),
          "l_quantity", "l_linenumber")
        .select(col("n"),
          QueryUtil.rhu(col("mean_diff"), 6).as("mean_diff"),
          QueryUtil.rhu(col("t_stat"), 6).as("t_stat"),
          col("deg_f"))
    }),
    // ES multi_terms: compound-key buckets, doc_count desc, size cut
    "mt1_multi_terms" -> ((s, d) => {
      EsAggs.multiTerms(Tables.load(s, d, "orders"),
        Seq("o_orderstatus", "o_orderpriority"), size = Some(10))
    }),
    // ES _rank_eval: precision/recall/MRR/DCG/NDCG/ERR over a
    // deterministic arithmetic fixture (3 queries × nation docs,
    // ranks from a mod permutation, even keys judged) — the oracle
    // replays every metric formula with window functions
    "re1_rank_eval" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nation = Tables.load(s, d, "nation").select("n_nationkey")
      val qs = (1 to 3).map(q => nation.withColumn("query",
          lit(q.toLong))).reduce(_ unionByName _)
      val w = Window.partitionBy("query")
        .orderBy(((col("n_nationkey") * 7 + col("query") * 3) % 25).asc,
          col("n_nationkey").asc)
      val results = qs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query"), col("n_nationkey").as("doc"), col("rank"))
      val judgments = qs.filter(col("n_nationkey") % 2 === 0)
        .select(col("query"), col("n_nationkey").as("doc"),
          ((col("n_nationkey") + col("query") * 2) % 4).as("rating"))
      RankEval.rankEval(results, judgments, "query", "doc", "rank",
          "rating", k = 10, relevantThreshold = 2, maxRating = 3)
        .select(col("query"), col("retrieved"),
          col("relevant_retrieved"),
          QueryUtil.rhu(col("precision"), 6).as("precision"),
          QueryUtil.rhu(col("recall"), 6).as("recall"),
          QueryUtil.rhu(col("mrr"), 6).as("mrr"),
          QueryUtil.rhu(col("dcg"), 6).as("dcg"),
          QueryUtil.rhu(col("ndcg"), 6).as("ndcg"),
          QueryUtil.rhu(col("err"), 6).as("err"))
        .orderBy("query")
    }),
    // ES nested aggregation + reverse_nested: element-grain terms/
    // stats over an array of structs (doc_count = elements), with the
    // reverse_nested parent-doc count riding the same shuffle; the
    // oracle aggregates the flat child table directly
    "na1_nested_agg" -> ((s, d) => {
      val items = Tables.load(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(
          col("l_returnflag"), col("l_quantity"))).as("items"))
      EsAggs.nestedTerms(items, "l_orderkey", "items",
        "l_returnflag", "l_quantity")
    }),
    // ES histogram (the fixed-interval face, not A14's pandas
    // min/max binning): offset key rule + min_doc_count:0 empty
    // buckets from a sequence spine
    "eh1_histogram" -> ((s, d) => {
      EsAggs.histogram(Tables.load(s, d, "customer"), "c_acctbal",
        interval = 750.0, offset = 500.0, minDocCount = 0)
    }),
    // ES bucket_correlation (count_correlation): Pearson r between
    // the monthly counts and a linear ramp — the trend-detection
    // pipeline agg, pure moment arithmetic over the bounded frame
    "pa12_bucket_correlation" -> ((s, d) => {
      val b = monthly(s, d)
      val n = b.count().toInt // bounded bucket frame; ramp needs its length
      BucketPipeline.bucketCorrelation(b, "month", "n",
          (1 to n).map(_.toDouble))
        .select(QueryUtil.rhu(col("correlation"), 6).as("correlation"))
    }),
    // ES normalize: rescale_0_1 / percent_of_sum / z-score over the
    // monthly counts (softmax is spec-pinned — exp of raw counts
    // overflows by design on count-scale inputs)
    "pa13_normalize" -> ((s, d) => {
      val b = monthly(s, d)
      val r1 = BucketPipeline.normalize(b, "n", "rescale_0_1", "resc")
      val r2 = BucketPipeline.normalize(r1, "n", "percent_of_sum", "pct")
      val r3 = BucketPipeline.normalize(r2, "n", "z-score", "zs")
      r3.select(col("month"), col("n"),
          QueryUtil.rhu(col("resc"), 6).as("rescale_0_1"),
          QueryUtil.rhu(col("pct"), 6).as("percent_of_sum"),
          QueryUtil.rhu(col("zs"), 6).as("zscore"))
        .orderBy("month")
    }),
    // ES percentiles_bucket (sibling): exact R-7 percentiles of the
    // monthly revenue metric across all buckets — integer cents keep
    // the interpolation bit-exact across engines
    "pa11_percentiles_bucket" -> ((s, d) => {
      BucketPipeline.percentilesBucket(monthly(s, d), "rev_cents",
          Seq(0.25, 0.50, 0.75, 0.99))
        .select((col("p25") / 100.0).as("p25"),
          (col("p50") / 100.0).as("p50"),
          (col("p75") / 100.0).as("p75"),
          (col("p99") / 100.0).as("p99"))
    }),
    // ES adjacency_matrix: singles + pair intersections of three
    // overlapping predicates, empty buckets omitted
    "am1_adjacency_matrix" -> ((s, d) => {
      EsAggs.adjacencyMatrix(Tables.load(s, d, "orders"), Seq(
        "high_value" -> (col("o_totalprice") > 300000.0),
        "urgent" -> (col("o_orderpriority") === "1-URGENT"),
        "open" -> (col("o_orderstatus") === "O")))
        .orderBy("key")
    }),
    // ES auto_date_histogram: two targets over the same ~30-day event
    // span pick different ladder arms (40 → 1d, 10 → 7d); the oracle
    // replays the ladder SELECTION from min/max, not just the buckets
    "ad1_auto_date_histogram" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      def one(target: Int) =
        EsAggs.autoDateHistogram(ev, "ts", target)
          .groupBy("auto_interval", "bucket")
          .agg(count(lit(1)).cast("long").as("n"))
          .withColumn("target", lit(target))
      one(40).unionByName(one(10))
        .select(col("target"), col("auto_interval"), col("bucket"),
          col("n"))
        .orderBy("target", "bucket")
    }),
    // ES extended_stats on an integer-valued measure: every moment
    // (incl. Σx²) is integer-exact in IEEE double, and the derived
    // variance/σ/bounds use ES's moment arithmetic — identical
    // expressions on both engines, no Welford-vs-two-pass skew
    "ax3_extended_stats" -> ((s, d) => {
      EsAggs.extendedStats(
        Tables.load(s, d, "lineitem").select("l_quantity"),
        "l_quantity", sigma = 2.0)
    }),
    // ES weighted_avg nested under terms: quantity-weighted average
    // line price per return flag, money as exact cents so the
    // Σ(v·w)/Σw ratio is bit-deterministic
    "ax4_weighted_avg" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .withColumn("price_cents",
          floor(col("l_extendedprice") * 100.0 + 0.5))
      EsAggs.weightedAvg(li, "price_cents", "l_quantity",
          by = Seq("l_returnflag"))
        .select(col("l_returnflag"),
          (col("weighted_avg") / 100.0).as("wavg_price"))
        .orderBy("l_returnflag")
    }),
    // ES top_hits under a terms agg: the two biggest orders per
    // priority, whole rows, ties by key
    "th1_top_hits" -> ((s, d) => {
      EsAggs.topHits(Tables.load(s, d, "orders"),
          Seq("o_orderpriority"), "o_totalprice", 2, "o_orderkey")
        .orderBy("o_orderpriority", "o_orderkey")
    }),
    // ES field collapsing (collapse + inner_hits): one result per
    // customer ranked by their best order's price, each carrying its
    // top-3 orders — both ranking levels replayed by row_number with
    // the (sort desc, id asc) tie discipline
    "cl1_collapse" -> ((s, d) => {
      EsAggs.collapse(Tables.load(s, d, "orders"),
        keyCol = "o_custkey", scoreCol = "o_totalprice",
        idCol = "o_orderkey", size = 10, innerHits = 3,
        innerSortCol = "o_totalprice")
    }),
    // ES diversified_sampler: top-50 docs by token count under a
    // 10-per-source diversity cap (cap in score order FIRST, global
    // cut second — the adjudicated engine-independent semantics; the
    // per-shard membership of ES's own sampler is routing-dependent).
    // The gate hashes the sample MEMBERSHIP itself, the strongest pin
    "sa1_sampler" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .withColumn("n_tokens",
          size(graft.functions.TextAnalysis.tokens(col("text")))
            .cast("long"))
      EsAggs.samplerAgg(docs, "n_tokens", "doc_id", shardSize = 50,
          diversifyField = Some("source"), maxDocsPerValue = 10)
        .select(col("doc_id"), col("source"), col("n_tokens"))
        .orderBy("doc_id")
    }),
    // ES rare_terms over the analyzed vocabulary: tokens in at most 2
    // documents, rarest first (exact groupBy — ES's CuckooFilter is a
    // memory bound, not different semantics)
    "rt1_rare_terms" -> ((s, d) => {
      val exploded = Tables.load(s, d, "documents")
        .select(explode(array_distinct(
          graft.functions.TextAnalysis.tokens(col("text")))).as("term"))
      EsAggs.rareTerms(exploded, Seq("term"), 2, limit = Some(20))
    }),
    // ES composite agg paging: the 8 (segment, nation) buckets after
    // after_key ("BUILDING", 10) — the pushable lexicographic filter
    // plus a TakeOrderedAndProject page cut
    "ca1_composite_page" -> ((s, d) => {
      EsAggs.compositePage(Tables.load(s, d, "customer"),
        Seq("c_mktsegment", "c_nationkey"), 8,
        afterKey = Some(Seq("BUILDING", 10)),
        metrics = Seq(count(lit(1)).cast("long").as("doc_count"),
          round(sum("c_acctbal"), 2).as("acct_sum")))
    }))

  val oracles: Map[String, String] = Map(
    "pa1_derivative" ->
      s"""WITH b AS ($monthlySql)
         |SELECT month, n, rev_cents / 100.0 AS rev,
         |  (rev_cents - lag(rev_cents) OVER (ORDER BY month)) / 100.0
         |    AS rev_delta,
         |  ${QueryUtil.rhuSql(
        "((rev_cents - lag(rev_cents) OVER (ORDER BY month)) / 100.0) / " +
          "((epoch_ms(CAST(month AS TIMESTAMP)) - " +
          "lag(epoch_ms(CAST(month AS TIMESTAMP))) OVER (ORDER BY month))" +
          " / 86400000.0)", 6)} AS rev_delta_per_day
         |FROM b ORDER BY month""".stripMargin,
    "pa2_cumulative_sum" ->
      s"""WITH b AS ($monthlySql)
         |SELECT month, n,
         |  CAST(sum(n) OVER (ORDER BY month
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS cum_n,
         |  sum(rev_cents) OVER (ORDER BY month
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
         |    AS cum_rev
         |FROM b ORDER BY month""".stripMargin,
    "pa3_moving_fn" ->
      """WITH b AS (SELECT o_orderstatus,
        |  date_trunc('month', o_orderdate) AS month,
        |  CAST(floor(sum(o_totalprice) * 100.0 + 0.5) AS BIGINT)
        |    AS rev_cents
        |FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, month, rev_cents / 100.0 AS rev,
        |  avg(rev_cents) OVER (PARTITION BY o_orderstatus ORDER BY month
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) / 100.0
        |    AS trailing_avg,
        |  max(rev_cents) OVER (PARTITION BY o_orderstatus ORDER BY month
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0
        |    AS window_max
        |FROM b ORDER BY o_orderstatus, month""".stripMargin,
    "pa4_bucket_script" ->
      s"""WITH b AS ($monthlySql)
         |SELECT month, n,
         |  ${QueryUtil.rhuSql("rev_cents / 100.0 / n", 4)} AS avg_price
         |FROM b WHERE rev_cents / 100.0 / n > 151000.0
         |ORDER BY month""".stripMargin,
    "pa5_bucket_sort" ->
      s"""WITH b AS ($monthlySql)
         |SELECT month, n, rev_cents / 100.0 AS rev
         |FROM b ORDER BY rev_cents DESC, month OFFSET 1 LIMIT 3""".stripMargin,
    "pa6_serial_diff" ->
      s"""WITH b AS ($monthlySql)
         |SELECT month, n,
         |  (rev_cents - lag(rev_cents, 2) OVER (ORDER BY month)) / 100.0
         |    AS rev_diff2
         |FROM b ORDER BY month""".stripMargin,
    "pa7_cumulative_cardinality" ->
      """WITH raw AS (SELECT date_trunc('day', ts) AS day, user_id
        |             FROM events),
        |b AS (SELECT day, CAST(count(*) AS BIGINT) AS n_events
        |      FROM raw GROUP BY 1),
        |fs AS (SELECT user_id, min(day) AS day FROM raw GROUP BY 1),
        |np AS (SELECT day, CAST(count(*) AS BIGINT) AS nw
        |       FROM fs GROUP BY 1)
        |SELECT b.day, b.n_events,
        |  CAST(sum(coalesce(np.nw, 0)) OVER (ORDER BY b.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_users,
        |  coalesce(np.nw, 0) AS cum_users_new
        |FROM b LEFT JOIN np USING (day) ORDER BY day""".stripMargin,
    "gh1_geohash_grid" -> {
      val inter = (0 until 5).map(i =>
        s"(((lonq >> $i) & 1) << ${2 * i + 1}) + " +
          s"(((latq >> $i) & 1) << ${2 * i})").mkString(" + ")
      val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
      raw"""WITH pts AS (SELECT
           |    CAST((c_custkey % 121) - 60 AS DOUBLE) AS lat,
           |    CAST(((c_custkey * 7) % 301) - 150 AS DOUBLE) AS lon
           |  FROM customer),
           |q AS (SELECT
           |  CAST(least(floor((lon + 180.0) / 360.0 * 32.0), 31.0)
           |    AS BIGINT) AS lonq,
           |  CAST(least(floor((lat + 90.0) / 180.0 * 32.0), 31.0)
           |    AS BIGINT) AS latq
           |  FROM pts),
           |h AS (SELECT ($inter) AS iv FROM q)
           |SELECT substr('$alpha', CAST(((iv >> 5) & 31) AS INT) + 1, 1)
           |    || substr('$alpha', CAST((iv & 31) AS INT) + 1, 1) AS key,
           |  CAST(count(*) AS BIGINT) AS doc_count
           |FROM h GROUP BY 1 ORDER BY doc_count DESC, key""".stripMargin
    },
    "gt1_geotile_grid" ->
      """WITH pts AS (SELECT
        |    CAST((c_custkey % 121) - 60 AS DOUBLE) AS lat,
        |    CAST(((c_custkey * 7) % 301) - 150 AS DOUBLE) AS lon
        |  FROM customer),
        |k AS (SELECT
        |  greatest(0.0, least(floor((lon + 180.0) / 360.0 * 8.0), 7.0))
        |    AS x,
        |  greatest(0.0, least(floor((1.0 -
        |    ln(tan(radians(lat)) + sqrt(tan(radians(lat)) *
        |      tan(radians(lat)) + 1.0)) / pi()) / 2.0 * 8.0), 7.0))
        |    AS y
        |  FROM pts)
        |SELECT '3/' || CAST(CAST(x AS BIGINT) AS VARCHAR) || '/' ||
        |       CAST(CAST(y AS BIGINT) AS VARCHAR) AS key,
        |       CAST(count(*) AS BIGINT) AS doc_count
        |FROM k GROUP BY 1 ORDER BY doc_count DESC, key""".stripMargin,
    "bp1_boxplot" ->
      """SELECT min(v) AS "min",
        |  quantile_cont(v, 0.25) AS q1,
        |  quantile_cont(v, 0.5) AS q2,
        |  quantile_cont(v, 0.75) AS q3,
        |  max(v) AS "max"
        |FROM (SELECT CAST(l_quantity AS DOUBLE) AS v
        |      FROM lineitem)""".stripMargin,
    "tt1_t_test" -> {
      def block(variant: String, tExpr: String, dfExpr: String) =
        s"""SELECT '$variant' AS variant,
           |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           |  (sa / na) / 100.0 AS mean_a, (sb / nb) / 100.0 AS mean_b,
           |  ${QueryUtil.rhuSql(tExpr, 6)} AS t_stat,
           |  ${QueryUtil.rhuSql(dfExpr, 4)} AS deg_f
           |FROM m""".stripMargin
      val va = "((qa - sa * sa / na) / (na - 1))"
      val vb = "((qb - sb * sb / nb) / (nb - 1))"
      val se2 = s"($va / na + $vb / nb)"
      raw"""WITH m AS (SELECT
           |  CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END)
           |       AS DOUBLE) AS na,
           |  sum(CASE WHEN o_orderstatus = 'O' THEN c END) AS sa,
           |  sum(CASE WHEN o_orderstatus = 'O' THEN c * c END) AS qa,
           |  CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END)
           |       AS DOUBLE) AS nb,
           |  sum(CASE WHEN o_orderstatus = 'F' THEN c END) AS sb,
           |  sum(CASE WHEN o_orderstatus = 'F' THEN c * c END) AS qb
           |  FROM (SELECT o_orderstatus,
           |          floor(o_totalprice * 100.0 + 0.5) AS c
           |        FROM orders))
           |${block("heteroscedastic",
        s"(sa / na - sb / nb) / sqrt$se2",
        s"$se2 * $se2 / (($va / na) * ($va / na) / (na - 1) + " +
          s"($vb / nb) * ($vb / nb) / (nb - 1))")}
           |UNION ALL
           |${block("homoscedastic",
        s"(sa / na - sb / nb) / sqrt((((na - 1) * $va + (nb - 1) * $vb)" +
          s" / (na + nb - 2)) * (1.0 / na + 1.0 / nb))",
        "na + nb - 2")}
           |ORDER BY variant""".stripMargin
    },
    "ss1_string_stats" ->
      raw"""WITH lens AS (SELECT CAST(count(text) AS BIGINT) AS "count",
           |  CAST(min(length(text)) AS BIGINT) AS min_length,
           |  CAST(max(length(text)) AS BIGINT) AS max_length,
           |  CAST(sum(length(text)) AS DOUBLE) / count(text)
           |    AS avg_length
           |  FROM documents),
           |ch AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM (
           |  SELECT unnest(list_filter(string_split(text, ''),
           |    x -> x <> '')) AS c FROM documents WHERE text IS NOT NULL)
           |  GROUP BY c),
           |e AS (SELECT ${QueryUtil.rhuSql(
        "-sum(n * log2(n)) / sum(n) + log2(sum(n))", 6)} AS entropy
           |      FROM ch)
           |SELECT lens.*, e.entropy FROM lens, e""".stripMargin,
    "mx1_matrix_stats" -> {
      val flds = Seq("l_quantity", "disc_c", "tax_c")
      val pairs = for { i <- flds.indices; j <- i until flds.size }
        yield (flds(i), flds(j))
      def cov(a: String, b: String) =
        s"(p_${a}_$b - s_$a * s_$b / n) / (n - 1)"
      val cells =
        Seq("CAST(count(*) AS DOUBLE) AS n") ++
          flds.map(c => s"sum($c) AS s_$c") ++
          pairs.map { case (a, b) => s"sum($a * $b) AS p_${a}_$b" }
      val rows = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS field_a, '$b' AS field_b,
           |  CAST(n AS BIGINT) AS count,
           |  s_$a / n AS mean_a, s_$b / n AS mean_b,
           |  ${cov(a, b)} AS covariance,
           |  ${cov(a, b)} / sqrt((${cov(a, a)}) * (${cov(b, b)}))
           |    AS correlation
           |FROM m""".stripMargin
      }.mkString("\nUNION ALL\n")
      raw"""WITH m AS (SELECT ${cells.mkString(", ")}
           |FROM (SELECT CAST(l_quantity AS DOUBLE) AS l_quantity,
           |        floor(l_discount * 100.0 + 0.5) AS disc_c,
           |        floor(l_tax * 100.0 + 0.5) AS tax_c
           |      FROM lineitem))
           |$rows
           |ORDER BY field_a, field_b""".stripMargin
    },
    "pc1_percolate" ->
      raw"""WITH t AS (SELECT doc_id, list_distinct(
           |    list_filter(string_split_regex(lower(text), '\s+'),
           |      x -> x <> '')) AS toks FROM documents),
           |r(query_id, terms, msm) AS (VALUES
           |  ('stream_filter', ['stream', 'filter'], 2),
           |  ('any_join', ['join', 'merge'], 1),
           |  ('heavy_sort', ['window', 'sort', 'order'], 3))
           |SELECT doc_id, query_id,
           |  CAST(len(list_filter(r.terms,
           |    x -> list_contains(t.toks, x))) AS BIGINT)
           |    AS matched_terms
           |FROM t, r
           |WHERE len(list_filter(r.terms,
           |    x -> list_contains(t.toks, x))) >= msm
           |ORDER BY doc_id, query_id""".stripMargin,
    "pc3_query_string_percolate" ->
      raw"""WITH t AS (SELECT doc_id, list_distinct(
           |    list_filter(string_split_regex(lower(text), '\s+'),
           |      x -> x <> '')) AS toks FROM documents),
           |a AS (SELECT doc_id, 'r_or_not' AS rule_id,
           |        CAST(list_contains(toks, 'stream')::INT +
           |             list_contains(toks, 'filter')::INT AS BIGINT)
           |          AS matched_terms
           |      FROM t
           |      WHERE (list_contains(toks, 'stream')
           |             OR list_contains(toks, 'filter'))
           |        AND NOT list_contains(toks, 'join')),
           |b AS (SELECT doc_id, 'r_disj' AS rule_id,
           |        CAST(list_contains(toks, 'merge')::INT +
           |             list_contains(toks, 'sort')::INT AS BIGINT)
           |          AS matched_terms
           |      FROM t
           |      WHERE list_contains(toks, 'merge')
           |         OR list_contains(toks, 'sort')),
           |c AS (SELECT doc_id, 'r_conj' AS rule_id,
           |        CAST(2 AS BIGINT) AS matched_terms
           |      FROM t
           |      WHERE list_contains(toks, 'stream')
           |        AND list_contains(toks, 'merge'))
           |SELECT * FROM (SELECT * FROM a
           |  UNION ALL SELECT * FROM b
           |  UNION ALL SELECT * FROM c)
           |ORDER BY doc_id, rule_id""".stripMargin,
    "pc2_phrase_percolate" ->
      raw"""WITH t AS (SELECT doc_id,
           |    ' ' || array_to_string(
           |      list_filter(string_split_regex(lower(text), '\s+'),
           |        x -> x <> ''), ' ') || ' ' AS joined
           |  FROM documents),
           |r(query_id, needle) AS (VALUES
           |  ('r_hash_join', ' hash join '),
           |  ('r_sort_merge', ' sort merge '),
           |  ('r_stream_filter', ' stream filter '))
           |SELECT doc_id, query_id FROM t, r
           |WHERE instr(t.joined, r.needle) > 0
           |ORDER BY doc_id, query_id""".stripMargin,
    "gd1_geo_distance_agg" -> {
      val dist = QueryUtil.haversineSqlMeters("lat", "lon",
        "10.0", "20.0")
      raw"""WITH pts AS (SELECT
           |    CAST((c_custkey % 121) - 60 AS DOUBLE) AS lat,
           |    CAST(((c_custkey * 7) % 301) - 150 AS DOUBLE) AS lon
           |  FROM customer),
           |dd AS (SELECT $dist AS dist FROM pts),
           |m AS (SELECT
           |  CAST(count(CASE WHEN dist < 2000000.0 THEN 1 END)
           |       AS BIGINT) AS r1,
           |  CAST(count(CASE WHEN dist >= 2000000.0
           |       AND dist < 8000000.0 THEN 1 END) AS BIGINT) AS r2,
           |  CAST(count(CASE WHEN dist >= 8000000.0 THEN 1 END)
           |       AS BIGINT) AS r3
           |  FROM dd)
           |SELECT key, "from", "to", doc_count FROM (
           |  SELECT '*-2000000.0' AS key, CAST(NULL AS DOUBLE)
           |    AS "from", 2000000.0 AS "to", r1 AS doc_count FROM m
           |  UNION ALL
           |  SELECT '2000000.0-8000000.0', 2000000.0, 8000000.0, r2
           |  FROM m
           |  UNION ALL SELECT '8000000.0-*', 8000000.0, NULL, r3 FROM m)
           |ORDER BY key""".stripMargin
    },
    "gl1_geo_line" ->
      """WITH pts AS (SELECT c_mktsegment, c_custkey,
        |    CAST((c_custkey % 121) - 60 AS DOUBLE) AS lat,
        |    CAST(((c_custkey * 7) % 301) - 150 AS DOUBLE) AS lon
        |  FROM customer),
        |r AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_custkey, lon, lat) AS rn,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS total
        |  FROM pts)
        |SELECT c_mktsegment,
        |  string_agg(CAST(lon AS VARCHAR) || ' ' ||
        |    CAST(lat AS VARCHAR), ';' ORDER BY rn) AS line,
        |  CAST(count(*) AS BIGINT) AS point_count,
        |  max(total) <= 5 AS complete
        |FROM r WHERE rn <= 5
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "ct1_categorize_text" -> {
      val toksSql =
        raw"""list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""
      raw"""WITH l AS (SELECT doc_id,
           |    array_to_string(($toksSql)[1:2], ' ') || ' code ' ||
           |      CAST((doc_id * 7) % 13 AS VARCHAR) AS line
           |  FROM documents),
           |c AS (SELECT doc_id,
           |    array_to_string(list_transform(
           |      list_filter(string_split_regex(lower(line), '\s+'),
           |        x -> x <> ''),
           |      t -> regexp_replace(t, '[0-9]+', '#', 'g'))
           |      , ' ') AS category
           |  FROM l)
           |SELECT category, CAST(count(*) AS BIGINT) AS doc_count,
           |  min(doc_id) AS example_id
           |FROM c GROUP BY category
           |ORDER BY doc_count DESC, category LIMIT 20""".stripMargin
    },
    "dr1_date_range" ->
      """WITH m AS (SELECT
        |  CAST(count(CASE WHEN o_orderdate < DATE '1993-01-01'
        |    THEN 1 END) AS BIGINT) AS r1,
        |  CAST(count(CASE WHEN o_orderdate >= DATE '1993-01-01'
        |    AND o_orderdate < DATE '1996-06-15' THEN 1 END)
        |    AS BIGINT) AS r2,
        |  CAST(count(CASE WHEN o_orderdate >= DATE '1996-06-15'
        |    THEN 1 END) AS BIGINT) AS r3
        |  FROM orders WHERE o_orderdate IS NOT NULL)
        |SELECT key, "from", "to", doc_count FROM (
        |  SELECT '*-1993-01-01' AS key, NULL AS "from",
        |    '1993-01-01' AS "to", r1 AS doc_count FROM m
        |  UNION ALL
        |  SELECT '1993-01-01-1996-06-15', '1993-01-01',
        |    '1996-06-15', r2 FROM m
        |  UNION ALL
        |  SELECT '1996-06-15-*', '1996-06-15', NULL, r3 FROM m)
        |ORDER BY key""".stripMargin,
    // ip bounds as integers: 10.0.64.0 = 167788544,
    // 10.0.192.0 = 167821312, 10.0.128.0 = 167804928 (/17 spans to
    // 10.1.0.0 = 167837696), 10.0.0.0 = 167772160 (/18 to 10.0.64.0)
    "ip1_ip_range" ->
      raw"""WITH s AS ($synthIpsSql),
           |vals AS (SELECT $ipValueSql AS v FROM s),
           |m AS (SELECT
           |  CAST(count(CASE WHEN v < 167788544 THEN 1 END)
           |    AS BIGINT) AS r1,
           |  CAST(count(CASE WHEN v >= 167788544 AND v < 167821312
           |    THEN 1 END) AS BIGINT) AS r2,
           |  CAST(count(CASE WHEN v >= 167804928 AND v < 167837696
           |    THEN 1 END) AS BIGINT) AS m1,
           |  CAST(count(CASE WHEN v >= 167772160 AND v < 167788544
           |    THEN 1 END) AS BIGINT) AS m2
           |  FROM vals)
           |SELECT key, "from", "to", doc_count FROM (
           |  SELECT '*-10.0.64.0' AS key, NULL AS "from",
           |    '10.0.64.0' AS "to", r1 AS doc_count FROM m
           |  UNION ALL
           |  SELECT '10.0.64.0-10.0.192.0', '10.0.64.0',
           |    '10.0.192.0', r2 FROM m
           |  UNION ALL
           |  SELECT '10.0.128.0/17', '10.0.128.0', '10.1.0.0', m1
           |    FROM m
           |  UNION ALL
           |  SELECT '10.0.0.0/18', '10.0.0.0', '10.0.64.0', m2 FROM m)
           |ORDER BY key""".stripMargin,
    "ip2_ip_prefix" ->
      raw"""WITH s AS ($synthIpsSql),
           |vals AS (SELECT $ipValueSql AS v FROM s),
           |n AS (SELECT (v // 16384) * 16384 AS net FROM vals
           |      WHERE v IS NOT NULL)
           |SELECT CAST((net // 16777216) % 256 AS VARCHAR) || '.' ||
           |       CAST((net // 65536) % 256 AS VARCHAR) || '.' ||
           |       CAST((net // 256) % 256 AS VARCHAR) || '.' ||
           |       CAST(net % 256 AS VARCHAR) AS key,
           |  CAST(18 AS BIGINT) AS prefix_length,
           |  CAST(count(*) AS BIGINT) AS doc_count
           |FROM n GROUP BY net ORDER BY net""".stripMargin,
    // equal-depth replay: quantile_cont cut points rounded half-up
    // at 6 dp (the operator's cut discipline), boundary to the
    // higher bucket, cents-free integer values so every aggregate is
    // association-order-proof
    "vw1_variable_width_histogram" ->
      """WITH o AS (SELECT CAST(floor(o_totalprice) AS DOUBLE) AS v
        |           FROM orders),
        |q AS (SELECT
        |  floor(quantile_cont(v, 0.2) * 1e6 + 0.5) / 1e6 AS c1,
        |  floor(quantile_cont(v, 0.4) * 1e6 + 0.5) / 1e6 AS c2,
        |  floor(quantile_cont(v, 0.6) * 1e6 + 0.5) / 1e6 AS c3,
        |  floor(quantile_cont(v, 0.8) * 1e6 + 0.5) / 1e6 AS c4
        |  FROM o),
        |b AS (SELECT CAST((v >= c1)::INT + (v >= c2)::INT +
        |        (v >= c3)::INT + (v >= c4)::INT AS BIGINT) AS bucket,
        |        v
        |      FROM o, q)
        |SELECT bucket, min(v) AS min, max(v) AS max,
        |  floor(avg(v) * 1e6 + 0.5) / 1e6 AS avg,
        |  CAST(count(*) AS BIGINT) AS doc_count
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "fis1_frequent_item_sets" ->
      """WITH base AS (SELECT o_orderstatus AS s, o_orderpriority AS p,
        |                substr(o_orderpriority, 1, 1) AS c FROM orders),
        |cu AS (SELECT s, p, c, count(*) AS dc,
        |         GROUPING(s) AS gs, GROUPING(p) AS gp,
        |         GROUPING(c) AS gc
        |       FROM base GROUP BY CUBE (s, p, c)),
        |tot AS (SELECT CAST(dc AS DOUBLE) AS n FROM cu
        |        WHERE gs=1 AND gp=1 AND gc=1),
        |sets AS (SELECT concat_ws(', ',
        |           CASE WHEN gs=0 THEN 'o_orderstatus=' || s END,
        |           CASE WHEN gp=0 THEN 'o_orderpriority=' || p END,
        |           CASE WHEN gc=0 THEN 'pclass=' || c END) AS items,
        |         CAST((1-gs)+(1-gp)+(1-gc) AS BIGINT) AS set_size,
        |         dc, gs, gp, gc, s, p, c
        |       FROM cu
        |       WHERE NOT (gs=1 AND gp=1 AND gc=1)
        |         AND NOT (gs=0 AND s IS NULL)
        |         AND NOT (gp=0 AND p IS NULL)
        |         AND NOT (gc=0 AND c IS NULL)),
        |par AS (
        |  SELECT concat_ws(', ',
        |           CASE WHEN gp=0 THEN 'o_orderpriority=' || p END,
        |           CASE WHEN gc=0 THEN 'pclass=' || c END) AS items,
        |         dc
        |  FROM sets WHERE gs=0 AND set_size >= 2
        |  UNION ALL
        |  SELECT concat_ws(', ',
        |           CASE WHEN gs=0 THEN 'o_orderstatus=' || s END,
        |           CASE WHEN gc=0 THEN 'pclass=' || c END), dc
        |  FROM sets WHERE gp=0 AND set_size >= 2
        |  UNION ALL
        |  SELECT concat_ws(', ',
        |           CASE WHEN gs=0 THEN 'o_orderstatus=' || s END,
        |           CASE WHEN gp=0 THEN 'o_orderpriority=' || p END),
        |         dc
        |  FROM sets WHERE gc=0 AND set_size >= 2),
        |mx AS (SELECT items, max(dc) AS mc FROM par GROUP BY 1)
        |SELECT sets.items, set_size, CAST(dc AS BIGINT) AS doc_count,
        |  floor(dc / n * 1e6 + 0.5) / 1e6 AS support
        |FROM sets LEFT JOIN mx ON mx.items = sets.items, tot
        |WHERE set_size >= 1 AND dc / n >= 0.02
        |  AND (mc IS NULL OR mc < dc)
        |ORDER BY doc_count DESC, sets.items LIMIT 15""".stripMargin,
    "cp1_change_point" ->
      raw"""WITH m AS ($monthlySql),
           |st AS (SELECT month,
           |    CAST(CASE WHEN month >= TIMESTAMP '1996-01-01'
           |      THEN n + 500 ELSE n END AS DOUBLE) AS v FROM m),
           |pre AS (SELECT
           |    CAST(row_number() OVER (ORDER BY month) AS DOUBLE) AS i,
           |    lead(CAST(CAST(month AS TIMESTAMP) AS VARCHAR), 1)
           |      OVER (ORDER BY month) AS nxt,
           |    sum(v) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED
           |      PRECEDING AND CURRENT ROW) AS cs,
           |    sum(v*v) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED
           |      PRECEDING AND CURRENT ROW) AS css,
           |    CAST(count(*) OVER () AS DOUBLE) AS nn,
           |    sum(v) OVER () AS ts,
           |    sum(v*v) OVER () AS tss
           |  FROM st),
           |c AS (SELECT nxt, i,
           |    (cs/i - (ts-cs)/(nn-i)) / sqrt(greatest(
           |      ((css - cs*cs/i)/(i-1))/i +
           |      (((tss-css) - (ts-cs)*(ts-cs)/(nn-i))/(nn-i-1))
           |        /(nn-i), 1e-12)) AS t,
           |    cs/i AS ml, (ts-cs)/(nn-i) AS mr
           |  FROM pre WHERE i >= 3 AND nn - i >= 3)
           |SELECT nxt AS change_point,
           |  CASE WHEN abs(t) >= 5.0 THEN 'step_change'
           |       ELSE 'stationary' END AS type,
           |  floor(t*1e6+0.5)/1e6 AS t_stat,
           |  floor(ml*1e6+0.5)/1e6 AS left_mean,
           |  floor(mr*1e6+0.5)/1e6 AS right_mean
           |FROM c ORDER BY abs(t) DESC, i LIMIT 1""".stripMargin,
    "rx1_random_sampler" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS doc_count,
        |  CAST(count(*) * 4 AS BIGINT) AS estimated_doc_count
        |FROM documents
        |WHERE ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)),
        |        1, 8))::BIGINT / 4294967296.0 < 0.25
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tm1_top_metrics" ->
      """SELECT o_orderpriority, o_totalprice, o_orderkey,
        |       o_orderstatus
        |FROM (SELECT o_orderpriority, o_totalprice, o_orderkey,
        |        o_orderstatus,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin,
    "ra2_rate_agg" -> {
      s"""WITH b AS ($monthlySql)
         |SELECT month, n,
         |  ${QueryUtil.rhuSql(
        "CAST(n AS DOUBLE) / date_diff('day', month, " +
          "month + INTERVAL 1 MONTH)", 6)} AS orders_per_day
         |FROM b ORDER BY month""".stripMargin
    },
    "ta1_terms_agg" ->
      """WITH k AS (SELECT CASE WHEN c_custkey % 11 = 0
        |    THEN '__missing__' ELSE c_mktsegment END AS key
        |  FROM customer),
        |b AS (SELECT key, CAST(count(*) AS BIGINT) AS doc_count
        |  FROM k
        |  WHERE regexp_matches(key, '^(?:(A|B|_).*)$')
        |    AND NOT regexp_matches(key, '^(?:BUILDING)$')
        |  GROUP BY key HAVING count(*) >= 2)
        |SELECT key, doc_count FROM b
        |ORDER BY doc_count DESC, key LIMIT 10""".stripMargin,
    "ta2_terms_order_metric" ->
      s"""WITH b AS (SELECT o_orderpriority AS key,
         |    CAST(count(*) AS BIGINT) AS doc_count,
         |    ${QueryUtil.rhuSql("avg(CAST(o_totalprice AS DOUBLE))", 6)}
         |      AS order_metric
         |  FROM orders WHERE o_orderpriority IS NOT NULL
         |  GROUP BY 1)
         |SELECT key, doc_count, order_metric FROM b
         |ORDER BY order_metric DESC NULLS LAST, key LIMIT 4""".stripMargin,
    "ta3_terms_order_key" ->
      """SELECT o_orderpriority AS key,
        |  CAST(count(*) AS BIGINT) AS doc_count
        |FROM orders WHERE o_orderpriority IS NOT NULL
        |GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY key LIMIT 3""".stripMargin,
    "ms1_missing_agg" -> {
      def m(e: String) = s"CASE WHEN p IS NULL THEN $e END"
      s"""WITH b AS (SELECT nullif(o_orderpriority, '3-MEDIUM') AS p,
         |  o_totalprice FROM orders)
         |SELECT CAST(count(CASE WHEN p IS NULL THEN 1 END) AS BIGINT)
         |    AS doc_count,
         |  min(${m("o_totalprice")}) AS "min",
         |  max(${m("o_totalprice")}) AS "max",
         |  ${QueryUtil.rhuSql(s"sum(${m("o_totalprice")})", 6)} AS "sum",
         |  ${QueryUtil.rhuSql(s"avg(${m("o_totalprice")})", 6)} AS "avg"
         |FROM b""".stripMargin
    },
    "ga1_global_agg" ->
      s"""WITH a AS (SELECT o_orderpriority = '1-URGENT' AS q,
         |  o_totalprice AS v FROM orders),
         |c AS (SELECT
         |  CAST(count(CASE WHEN q THEN 1 END) AS BIGINT) AS q_count,
         |  ${QueryUtil.rhuSql("avg(CASE WHEN q THEN v END)", 6)} AS q_avg,
         |  CAST(count(*) AS BIGINT) AS g_count,
         |  ${QueryUtil.rhuSql("avg(v)", 6)} AS g_avg FROM a)
         |SELECT 'query' AS scope, q_count AS doc_count, q_avg AS "avg"
         |FROM c
         |UNION ALL
         |SELECT 'global', g_count, g_avg FROM c""".stripMargin,
    "xf1_transform_pivot" ->
      s"""SELECT o_orderstatus AS status,
         |  date_trunc('month', o_orderdate) AS month,
         |  ${QueryUtil.rhuSql(
             "avg(CAST(floor(o_totalprice * 100 + 0.5) AS DOUBLE))",
             6)} AS avg_price,
         |  ${QueryUtil.rhuSql(
             "sum(CAST(floor(o_totalprice * 100 + 0.5) AS DOUBLE))",
             6)} AS total,
         |  CAST(count(o_orderkey) AS BIGINT) AS n,
         |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS customers
         |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "xf2_transform_latest" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "ca2_composite_date_histo" ->
      """WITH b AS (SELECT date_trunc('month', o_orderdate) AS month,
        |             o_orderstatus,
        |             CAST(count(*) AS BIGINT) AS doc_count
        |           FROM orders GROUP BY 1, 2),
        |p1 AS (SELECT * FROM b ORDER BY month, o_orderstatus LIMIT 6),
        |lastk AS (SELECT month AS lm, o_orderstatus AS ls FROM p1
        |          ORDER BY month DESC, o_orderstatus DESC LIMIT 1),
        |p2 AS (SELECT b.* FROM b, lastk
        |       WHERE b.month > lm OR (b.month = lm
        |         AND b.o_orderstatus > ls)
        |       ORDER BY month, o_orderstatus LIMIT 6)
        |SELECT CAST(1 AS BIGINT) AS page, month, o_orderstatus,
        |  doc_count FROM p1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), month, o_orderstatus, doc_count
        |FROM p2
        |ORDER BY page, month, o_orderstatus""".stripMargin,
    "tt2_t_test_paired" -> {
      def r6(e: String) = QueryUtil.rhuSql(e, 6)
      s"""WITH m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |    sum(CAST(l_quantity AS DOUBLE) - l_linenumber) AS s,
         |    sum((CAST(l_quantity AS DOUBLE) - l_linenumber) *
         |        (CAST(l_quantity AS DOUBLE) - l_linenumber)) AS q
         |  FROM lineitem
         |  WHERE l_quantity IS NOT NULL AND l_linenumber IS NOT NULL)
         |SELECT CAST(n AS BIGINT) AS n,
         |  ${r6("s / n")} AS mean_diff,
         |  ${r6("(s / n) / sqrt(greatest(0.0, " +
        "(q - s * s / n) / (n - 1)) / n)")} AS t_stat,
         |  CAST(n - 1 AS BIGINT) AS deg_f
         |FROM m""".stripMargin
    },
    "mt1_multi_terms" ->
      """SELECT o_orderstatus || '|' || o_orderpriority AS key,
        |  CAST(count(*) AS BIGINT) AS doc_count
        |FROM orders
        |WHERE o_orderstatus IS NOT NULL
        |  AND o_orderpriority IS NOT NULL
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY doc_count DESC, key LIMIT 10""".stripMargin,
    "re1_rank_eval" -> {
      def r6(e: String) = QueryUtil.rhuSql(e, 6)
      s"""WITH q AS (SELECT n_nationkey,
         |    CAST(v.query AS BIGINT) AS query
         |  FROM nation, (VALUES (1), (2), (3)) v(query)),
         |res AS (SELECT query, n_nationkey AS doc,
         |    row_number() OVER (PARTITION BY query
         |      ORDER BY (n_nationkey * 7 + query * 3) % 25,
         |        n_nationkey) AS rnk
         |  FROM q),
         |r10 AS (SELECT * FROM res WHERE rnk <= 10),
         |jud AS (SELECT query, n_nationkey AS doc,
         |    (n_nationkey + query * 2) % 4 AS rating
         |  FROM q WHERE n_nationkey % 2 = 0),
         |j AS (SELECT r.query, r.doc, r.rnk,
         |    coalesce(jud.rating, 0) AS r8
         |  FROM r10 r LEFT JOIN jud
         |    ON jud.query = r.query AND jud.doc = r.doc),
         |per AS (SELECT query, doc, rnk, r8,
         |    CASE WHEN r8 >= 2 THEN 1 ELSE 0 END AS rel,
         |    (pow(2, r8) - 1) / (ln(rnk + 1) / ln(2)) AS gain,
         |    (pow(2, r8) - 1) / 8.0 AS rr
         |  FROM j),
         |surv AS (SELECT *, coalesce(exp(sum(ln(1 - rr)) OVER (
         |    PARTITION BY query ORDER BY rnk
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), 1.0)
         |    AS sv
         |  FROM per),
         |pq AS (SELECT query,
         |    CAST(count(*) AS BIGINT) AS retrieved,
         |    CAST(sum(rel) AS BIGINT) AS relevant_retrieved,
         |    CAST(sum(rel) AS DOUBLE) / count(*) AS prec,
         |    coalesce(1.0 / min(CASE WHEN rel = 1 THEN rnk END), 0.0)
         |      AS mrr,
         |    sum(gain) AS dcg,
         |    sum(sv * rr / rnk) AS err
         |  FROM surv GROUP BY query),
         |ide AS (SELECT query,
         |    CAST(sum(CASE WHEN rating >= 2 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS rt,
         |    sum(CASE WHEN ir <= 10 THEN
         |      (pow(2, rating) - 1) / (ln(ir + 1) / ln(2))
         |      ELSE 0 END) AS idcg
         |  FROM (SELECT query, doc, rating, row_number() OVER (
         |      PARTITION BY query ORDER BY rating DESC, doc) AS ir
         |    FROM jud)
         |  GROUP BY query)
         |SELECT pq.query, retrieved, relevant_retrieved,
         |  ${r6("prec")} AS "precision",
         |  ${r6("CASE WHEN rt > 0 THEN " +
        "CAST(relevant_retrieved AS DOUBLE) / rt ELSE 0 END")}
         |    AS recall,
         |  ${r6("mrr")} AS mrr,
         |  ${r6("dcg")} AS dcg,
         |  ${r6("CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0 END")}
         |    AS ndcg,
         |  ${r6("err")} AS err
         |FROM pq JOIN ide ON ide.query = pq.query
         |ORDER BY pq.query""".stripMargin
    },
    "na1_nested_agg" ->
      """SELECT l_returnflag AS key,
        |  CAST(count(*) AS BIGINT) AS doc_count,
        |  min(CAST(l_quantity AS DOUBLE)) AS "min",
        |  max(CAST(l_quantity AS DOUBLE)) AS "max",
        |  sum(CAST(l_quantity AS DOUBLE)) AS sum,
        |  avg(CAST(l_quantity AS DOUBLE)) AS avg,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT)
        |    AS parent_doc_count
        |FROM lineitem GROUP BY 1
        |ORDER BY doc_count DESC, key""".stripMargin,
    "eh1_histogram" ->
      """WITH b AS (SELECT
        |    floor((c_acctbal - 500) / 750) * 750 + 500 AS key,
        |    CAST(count(*) AS BIGINT) AS doc_count
        |  FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1),
        |bounds AS (SELECT
        |    CAST(round((min(key) - 500) / 750) AS BIGINT) AS lo,
        |    CAST(round((max(key) - 500) / 750) AS BIGINT) AS hi
        |  FROM b),
        |spine AS (SELECT unnest(generate_series(lo, hi)) AS step
        |          FROM bounds)
        |SELECT step * 750.0 + 500 AS key,
        |  CAST(coalesce(b.doc_count, 0) AS BIGINT) AS doc_count
        |FROM spine LEFT JOIN b ON b.key = step * 750.0 + 500
        |ORDER BY key""".stripMargin,
    "pa12_bucket_correlation" -> {
      val r6 = QueryUtil.rhuSql(
        "(sxy - sx * sy / nn) / (sqrt(greatest(0.0, " +
          "sxx - sx * sx / nn)) * sqrt(greatest(0.0, " +
          "syy - sy * sy / nn)))", 6)
      s"""WITH b AS ($monthlySql),
         |r AS (SELECT CAST(n AS DOUBLE) AS x,
         |        CAST(row_number() OVER (ORDER BY month) AS DOUBLE)
         |          AS y
         |      FROM b),
         |m AS (SELECT CAST(count(*) AS DOUBLE) AS nn,
         |        sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |        sum(x * x) AS sxx, sum(y * y) AS syy FROM r)
         |SELECT $r6 AS correlation FROM m""".stripMargin
    },
    "pa13_normalize" -> {
      def r6(e: String) = QueryUtil.rhuSql(e, 6)
      s"""WITH b AS ($monthlySql),
         |s AS (SELECT month, n, CAST(n AS DOUBLE) AS x FROM b),
         |m AS (SELECT min(x) AS mn, max(x) AS mx, sum(x) AS sm,
         |        avg(x) AS av, CAST(count(*) AS DOUBLE) AS nn,
         |        sum(x * x) AS sxx FROM s)
         |SELECT month, n,
         |  ${r6("CASE WHEN mx <> mn THEN (x - mn) / (mx - mn) END")}
         |    AS rescale_0_1,
         |  ${r6("CASE WHEN sm <> 0 THEN x / sm END")}
         |    AS percent_of_sum,
         |  ${r6("CASE WHEN sxx / nn - av * av > 0 THEN " +
        "(x - av) / sqrt(sxx / nn - av * av) END")} AS zscore
         |FROM s, m ORDER BY month""".stripMargin
    },
    "pa11_percentiles_bucket" ->
      s"""WITH b AS ($monthlySql)
         |SELECT
         |  quantile_cont(CAST(rev_cents AS DOUBLE), 0.25) / 100.0 AS p25,
         |  quantile_cont(CAST(rev_cents AS DOUBLE), 0.50) / 100.0 AS p50,
         |  quantile_cont(CAST(rev_cents AS DOUBLE), 0.75) / 100.0 AS p75,
         |  quantile_cont(CAST(rev_cents AS DOUBLE), 0.99) / 100.0 AS p99
         |FROM b""".stripMargin,
    "pa9_sibling_buckets" ->
      s"""WITH b AS ($monthlySql),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_months,
         |  min(CAST(rev_cents AS DOUBLE)) AS "min",
         |  max(CAST(rev_cents AS DOUBLE)) AS "max",
         |  avg(CAST(rev_cents AS DOUBLE)) AS avg,
         |  sum(CAST(rev_cents AS DOUBLE)) AS sum FROM b),
         |m AS (SELECT max(CAST(rev_cents AS DOUBLE)) AS mv FROM b),
         |k AS (SELECT string_agg(
         |    CAST(CAST(b.month AS TIMESTAMP) AS VARCHAR), ','
         |    ORDER BY CAST(CAST(b.month AS TIMESTAMP) AS VARCHAR))
         |    AS top_months,
         |  min(mv) AS top_rev_cents
         |  FROM b, m WHERE CAST(b.rev_cents AS DOUBLE) = m.mv)
         |SELECT st.*, k.* FROM st, k""".stripMargin,
    "pa10_moving_percentile" ->
      s"""WITH b AS ($monthlySql)
         |SELECT month, n,
         |  quantile_cont(CAST(rev_cents AS DOUBLE), 0.5) OVER (
         |    ORDER BY month
         |    ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) / 100.0
         |    AS trailing_median
         |FROM b ORDER BY month""".stripMargin,
    "am1_adjacency_matrix" ->
      """WITH m AS (SELECT
        |  CAST(count(CASE WHEN o_totalprice > 300000.0 THEN 1 END)
        |       AS BIGINT) AS c11,
        |  CAST(count(CASE WHEN o_totalprice > 300000.0
        |       AND o_orderpriority = '1-URGENT' THEN 1 END)
        |       AS BIGINT) AS c12,
        |  CAST(count(CASE WHEN o_totalprice > 300000.0
        |       AND o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS c13,
        |  CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
        |       AS BIGINT) AS c22,
        |  CAST(count(CASE WHEN o_orderpriority = '1-URGENT'
        |       AND o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS c23,
        |  CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END)
        |       AS BIGINT) AS c33
        |  FROM orders)
        |SELECT key, doc_count FROM (
        |  SELECT 'high_value' AS key, c11 AS doc_count FROM m
        |  UNION ALL SELECT 'high_value&urgent', c12 FROM m
        |  UNION ALL SELECT 'high_value&open', c13 FROM m
        |  UNION ALL SELECT 'urgent', c22 FROM m
        |  UNION ALL SELECT 'urgent&open', c23 FROM m
        |  UNION ALL SELECT 'open', c33 FROM m)
        |WHERE doc_count > 0 ORDER BY key""".stripMargin,
    "ad1_auto_date_histogram" ->
      """WITH mm AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS mn,
        |              CAST(floor(epoch(max(ts))) AS BIGINT) AS mx
        |            FROM events),
        |lad(i, nm, ord) AS (VALUES (1,'1s',1),(5,'5s',2),(10,'10s',3),
        |  (30,'30s',4),(60,'1m',5),(300,'5m',6),(600,'10m',7),
        |  (1800,'30m',8),(3600,'1h',9),(10800,'3h',10),(43200,'12h',11),
        |  (86400,'1d',12),(604800,'7d',13)),
        |c40 AS (SELECT i, nm FROM lad, mm
        |        WHERE (mx // i) - (mn // i) + 1 <= 40
        |        ORDER BY ord LIMIT 1),
        |c10 AS (SELECT i, nm FROM lad, mm
        |        WHERE (mx // i) - (mn // i) + 1 <= 10
        |        ORDER BY ord LIMIT 1),
        |b40 AS (SELECT 40 AS target, nm AS auto_interval,
        |          make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT)
        |            // i) * i) * 1000000) AS bucket,
        |          CAST(count(*) AS BIGINT) AS n
        |        FROM events, c40 GROUP BY 1, 2, 3),
        |b10 AS (SELECT 10 AS target, nm AS auto_interval,
        |          make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT)
        |            // i) * i) * 1000000) AS bucket,
        |          CAST(count(*) AS BIGINT) AS n
        |        FROM events, c10 GROUP BY 1, 2, 3)
        |SELECT * FROM b40 UNION ALL SELECT * FROM b10
        |ORDER BY target, bucket""".stripMargin,
    "pa8_empty_buckets" ->
      """WITH b AS (SELECT date_trunc('week', o_orderdate) AS week,
        |             CAST(count(*) AS BIGINT) AS n
        |           FROM orders WHERE o_totalprice > 480000.0
        |           GROUP BY 1),
        |bounds AS (SELECT min(week) AS lo, max(week) AS hi FROM b),
        |spine AS (SELECT unnest(generate_series(lo, hi,
        |            INTERVAL 1 WEEK)) AS week FROM bounds),
        |f AS (SELECT spine.week, coalesce(b.n, 0) AS n
        |      FROM spine LEFT JOIN b ON b.week = spine.week)
        |SELECT week, n,
        |  CAST(sum(n) OVER (ORDER BY week
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_n
        |FROM f ORDER BY week""".stripMargin,
    "ra1_range_agg" ->
      """WITH m AS (SELECT
        |  CAST(count(CASE WHEN c_acctbal IS NOT NULL
        |       AND c_acctbal < 0.0 THEN 1 END) AS BIGINT) AS r1,
        |  CAST(count(CASE WHEN c_acctbal >= 0.0
        |       AND c_acctbal < 5000.0 THEN 1 END) AS BIGINT) AS r2,
        |  CAST(count(CASE WHEN c_acctbal >= 5000.0 THEN 1 END)
        |       AS BIGINT) AS r3,
        |  CAST(count(CASE WHEN c_acctbal >= 2500.0
        |       AND c_acctbal < 7500.0 THEN 1 END) AS BIGINT) AS r4
        |  FROM customer)
        |SELECT key, "from", "to", doc_count FROM (
        |  SELECT '*-0.0' AS key, CAST(NULL AS DOUBLE) AS "from",
        |         0.0 AS "to", r1 AS doc_count FROM m
        |  UNION ALL SELECT '0.0-5000.0', 0.0, 5000.0, r2 FROM m
        |  UNION ALL SELECT '5000.0-*', 5000.0, NULL, r3 FROM m
        |  UNION ALL SELECT '2500.0-7500.0', 2500.0, 7500.0, r4 FROM m)
        |ORDER BY key""".stripMargin,
    "fa1_filters_agg" ->
      """WITH m AS (SELECT
        |  CAST(count(CASE WHEN o_totalprice > 300000.0 THEN 1 END)
        |       AS BIGINT) AS f1,
        |  CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
        |       AS BIGINT) AS f2,
        |  CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END)
        |       AS BIGINT) AS f3,
        |  CAST(count(CASE WHEN NOT (o_totalprice > 300000.0
        |       OR o_orderpriority = '1-URGENT'
        |       OR o_orderstatus = 'O') THEN 1 END) AS BIGINT) AS fo
        |  FROM orders)
        |SELECT key, doc_count FROM (
        |  SELECT 'high_value' AS key, f1 AS doc_count FROM m
        |  UNION ALL SELECT 'urgent', f2 FROM m
        |  UNION ALL SELECT 'open', f3 FROM m
        |  UNION ALL SELECT '_other_', fo FROM m)
        |ORDER BY key""".stripMargin,
    "ax3_extended_stats" ->
      """WITH m AS (SELECT CAST(count(v) AS BIGINT) AS "count",
        |  min(v) AS "min", max(v) AS "max", sum(v) AS "sum",
        |  sum(v * v) AS sum_of_squares
        |  FROM (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem))
        |SELECT "count", "min", "max", "sum", sum_of_squares,
        |  "sum" / "count" AS avg,
        |  sum_of_squares / "count" - ("sum" / "count") * ("sum" / "count")
        |    AS variance_population,
        |  (sum_of_squares - "sum" * "sum" / "count") / ("count" - 1)
        |    AS variance_sampling,
        |  sqrt(sum_of_squares / "count" -
        |    ("sum" / "count") * ("sum" / "count"))
        |    AS std_deviation_population,
        |  sqrt((sum_of_squares - "sum" * "sum" / "count") / ("count" - 1))
        |    AS std_deviation_sampling,
        |  "sum" / "count" + 2.0 * sqrt(sum_of_squares / "count" -
        |    ("sum" / "count") * ("sum" / "count")) AS std_upper,
        |  "sum" / "count" - 2.0 * sqrt(sum_of_squares / "count" -
        |    ("sum" / "count") * ("sum" / "count")) AS std_lower
        |FROM m""".stripMargin,
    "ax4_weighted_avg" ->
      """WITH li AS (SELECT l_returnflag,
        |  floor(l_extendedprice * 100.0 + 0.5) AS price_cents,
        |  CAST(l_quantity AS DOUBLE) AS w FROM lineitem)
        |SELECT l_returnflag,
        |  (sum(price_cents * w) / sum(w)) / 100.0 AS wavg_price
        |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,
    "th1_top_hits" ->
      """SELECT * EXCLUDE (rn) FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "cl1_collapse" ->
      """WITH a AS (
        |  SELECT o_custkey, o_orderkey AS anchor_id,
        |         o_totalprice AS anchor_score,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS r
        |  FROM orders),
        |top AS (
        |  SELECT o_custkey, anchor_id, anchor_score,
        |         CAST(row_number() OVER (ORDER BY anchor_score DESC,
        |           anchor_id) AS BIGINT) AS outer_rank
        |  FROM a WHERE r = 1
        |  ORDER BY anchor_score DESC, anchor_id LIMIT 10),
        |i AS (
        |  SELECT t.outer_rank, o.o_custkey, t.anchor_id,
        |         t.anchor_score,
        |         CAST(row_number() OVER (PARTITION BY o.o_custkey
        |           ORDER BY o.o_totalprice DESC, o.o_orderkey)
        |           AS BIGINT) AS inner_rank,
        |         o.o_orderkey AS inner_id,
        |         o.o_totalprice AS inner_sort
        |  FROM orders o JOIN top t ON o.o_custkey = t.o_custkey)
        |SELECT outer_rank, o_custkey, anchor_id, anchor_score,
        |       inner_rank, inner_id, inner_sort
        |FROM i WHERE inner_rank <= 3
        |ORDER BY outer_rank, inner_rank""".stripMargin,
    "sa1_sampler" ->
      raw"""WITH t AS (SELECT doc_id, source,
           |  CAST(len(list_filter(string_split_regex(lower(text),
           |    '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
           |  FROM documents),
           |div AS (SELECT *, row_number() OVER (PARTITION BY source
           |          ORDER BY n_tokens DESC, doc_id) AS dr FROM t),
           |s AS (SELECT doc_id, source, n_tokens FROM div
           |      WHERE dr <= 10
           |      ORDER BY n_tokens DESC, doc_id LIMIT 50)
           |SELECT doc_id, source, n_tokens FROM s
           |ORDER BY doc_id""".stripMargin,
    "rt1_rare_terms" ->
      raw"""WITH t AS (SELECT doc_id,
           |  unnest(list_distinct(list_filter(
           |    string_split_regex(lower(text), '\s+'), x -> x <> '')))
           |    AS term FROM documents)
           |SELECT term, CAST(count(*) AS BIGINT) AS doc_count
           |FROM t GROUP BY 1 HAVING count(*) <= 2
           |ORDER BY 2 ASC, 1 ASC LIMIT 20""".stripMargin,
    "ca1_composite_page" ->
      """SELECT c_mktsegment, c_nationkey,
        |  CAST(count(*) AS BIGINT) AS doc_count,
        |  round(sum(c_acctbal), 2) AS acct_sum
        |FROM customer
        |WHERE c_mktsegment > 'BUILDING'
        |   OR (c_mktsegment = 'BUILDING' AND c_nationkey > 10)
        |GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 8""".stripMargin)
}
