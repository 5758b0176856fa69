package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ES metric/bucket aggregation faces the reference reaches only as
  * raw-DSL `aggs` passthrough (eland/query.py raw aggregations):
  * `extended_stats`, `weighted_avg`, `top_hits`, `top_metrics`,
  * `rare_terms`, the full-knob `terms` (missing/include/exclude/
  * min_doc_count), `multi_terms`, `histogram` (offset +
  * min_doc_count:0, max_buckets-guarded), `auto_date_histogram`,
  * `range`/`filters`/`adjacency_matrix`, `composite` paging, the
  * `nested` agg + `reverse_nested`, `rate` (calendar-normalized),
  * `boxplot`, `t_test` (Welch/pooled/paired), `string_stats`,
  * `matrix_stats`, and the geo grids/centroid. Semantics follow the
  * ES documentation; each is one declarative plan (single agg pass,
  * or one keyed shuffle) so Catalyst keeps pushdown/partial-agg
  * intact at any scale.
  */
object EsAggs {

  /** ES `extended_stats`: count/min/max/sum/avg/sum_of_squares plus
    * variance and std deviation (population AND sampling, like ES
    * 7.x+) and the `std_deviation_bounds` at `sigma` σ. One
    * HashAggregate pass; the derived moments use the same
    * moment-arithmetic ES does (variance = Σx²/n − mean²), so an
    * engine replaying the definition reproduces them bit-for-bit from
    * the same inputs — no dependence on Welford-vs-two-pass
    * differences between variance implementations.
    */
  def extendedStats(df: DataFrame, valueCol: String,
                    sigma: Double = 2.0): DataFrame = {
    require(sigma > 0, s"sigma must be > 0, got $sigma")
    val v = col(valueCol).cast("double")
    df.agg(
        count(v).cast("long").as("count"),
        min(v).as("min"), max(v).as("max"),
        sum(v).as("sum"), sum(v * v).as("sum_of_squares"))
      .withColumn("avg", col("sum") / col("count"))
      .withColumn("variance_population",
        // clamp at 0: moment arithmetic can go epsilon-negative
        when(col("count") > 0,
          greatest(lit(0.0),
            col("sum_of_squares") / col("count") -
              col("avg") * col("avg"))))
      .withColumn("variance_sampling",
        // ES returns null (not NaN/Inf) for n <= 1
        when(col("count") > 1,
          greatest(lit(0.0),
            (col("sum_of_squares") -
              col("sum") * col("sum") / col("count")) /
              (col("count") - 1))))
      .withColumn("std_deviation_population",
        sqrt(col("variance_population")))
      .withColumn("std_deviation_sampling",
        sqrt(col("variance_sampling")))
      .withColumn("std_upper",
        col("avg") + lit(sigma) * col("std_deviation_population"))
      .withColumn("std_lower",
        col("avg") - lit(sigma) * col("std_deviation_population"))
  }

  /** ES `weighted_avg`: Σ(value·weight) / Σ(weight), null-value rows
    * excluded WITH their weights (ES's `missing`-less default).
    * Optional `by` keys give the terms-nested form. One agg pass,
    * map-side combined.
    */
  def weightedAvg(df: DataFrame, valueCol: String, weightCol: String,
                  out: String = "weighted_avg",
                  by: Seq[String] = Nil): DataFrame = {
    val v = col(valueCol).cast("double")
    val w = col(weightCol).cast("double")
    val contrib = when(v.isNotNull, v * w)
    val weight = when(v.isNotNull, w)
    val agg = (sum(contrib) / sum(weight)).as(out)
    if (by.isEmpty) df.agg(agg)
    else df.groupBy(by.map(col): _*).agg(agg)
  }

  /** ES `top_hits` under a terms agg: the top `k` whole rows per
    * group by `sortCol` (desc by default), ties broken by `tieCol`
    * ascending so the cut is deterministic. One shuffle on the group
    * keys; the per-group heap is a window row_number, never a
    * collect.
    */
  def topHits(df: DataFrame, by: Seq[String], sortCol: String,
              k: Int, tieCol: String, asc: Boolean = false): DataFrame = {
    require(k > 0, s"k must be >= 1, got $k")
    require(by.nonEmpty, "top_hits needs at least one group key")
    val order =
      if (asc) Seq(col(sortCol).asc, col(tieCol).asc)
      else Seq(col(sortCol).desc, col(tieCol).asc)
    df.withColumn("_rank", row_number().over(
        Window.partitionBy(by.map(col): _*).orderBy(order: _*)))
      .filter(col("_rank") <= k)
      .drop("_rank")
  }

  /** ES `sampler` / `diversified_sampler` aggregations: bound
    * expensive sub-aggregations to the best-scoring `shardSize` hits
    * — returns the SAMPLE frame; callers compose any aggregation on
    * top (that composability is the point of the agg).
    *
    * Portability adjudication (PLANS.md r16): ES's sampler is
    * per-SHARD — each shard keeps its own top `shard_size`, so the
    * sample's membership (size shard_size × shards) depends on
    * document routing and is not replayable on another engine. The
    * portable semantics here are a GLOBAL top `shardSize` under the
    * total order (score desc, `idCol` asc) — deterministic on any
    * engine (the qf1 topFractionPerGroup discipline).
    * `diversifyField` adds diversified_sampler's knob: at most
    * `maxDocsPerValue` docs per field value, the cap applied in the
    * same score order BEFORE the global cut (ES de-prioritizes
    * over-represented keys during collection — same selection).
    *
    * Scale shape: the diversity cap is a per-KEY window (groups
    * bounded by per-key doc counts); the global cut is sort-limit
    * (TakeOrderedAndProject — per-partition top-k then a driver
    * merge of k per partition, never a single-partition sort).
    */
  def samplerAgg(hits: DataFrame, scoreCol: String, idCol: String,
                 shardSize: Int,
                 diversifyField: Option[String] = None,
                 maxDocsPerValue: Int = 1): DataFrame = {
    require(shardSize >= 1, s"shard_size must be >= 1, got $shardSize")
    require(maxDocsPerValue >= 1,
      s"max_docs_per_value must be >= 1, got $maxDocsPerValue")
    val order = Seq(col(scoreCol).desc, col(idCol).asc)
    val diversified = diversifyField match {
      case None => hits
      case Some(f) =>
        hits.withColumn("_dr", row_number().over(
            Window.partitionBy(f).orderBy(order: _*)))
          .filter(col("_dr") <= maxDocsPerValue)
          .drop("_dr")
    }
    diversified.orderBy(order: _*).limit(shardSize)
  }

  /** ES `frequent_item_sets` aggregation (8.4+): mine CLOSED frequent
    * item sets over a list of categorical FIELDS — an item is
    * (field = value), a document's item set is its non-null field
    * values, and ES reports the sets with `support` ≥
    * `minimumSupport` that are CLOSED (no superset with the same
    * doc_count), largest doc_count first. ES's own miner is a
    * sampled ECLAT whose results are approximate under sharding;
    * EXACT mining is the portable semantics, and over a FIELDS list
    * the subset lattice is precisely the grouping-sets CUBE — one
    * aggregation pass computes every field-combination's value
    * counts (2^F groupings, F bounded by contract), the grand-total
    * grouping doubles as the support denominator, and closedness is
    * one max-join over the REDUCED cube frame (each set row emits
    * its ≤ F immediate-parent keys; a parent is closed iff its
    * largest child count is strictly below its own).
    *
    * Output: (items "f=v, f=v" in field order, set_size, doc_count,
    * support rounded 6 dp), (doc_count desc, items asc), top `size`.
    *
    * Scale shape: ONE cube aggregation over the corpus (map-side
    * combined; output bounded by distinct value combinations — the
    * categorical-fields contract, enforced by the F ≤ 6 bound), then
    * everything else runs on the reduced frame, pinned once via
    * localCheckpoint so the closedness self-reference cannot rescan
    * the corpus.
    */
  def frequentItemSets(df: DataFrame, fields: Seq[String],
                       minimumSupport: Double = 0.01,
                       minimumSetSize: Int = 1,
                       size: Int = 10): DataFrame = {
    val F = fields.size
    require(F >= 1 && F <= 6,
      s"frequent_item_sets needs 1..6 categorical fields (2^F cube " +
        s"groupings), got $F")
    require(fields.distinct.size == F, s"duplicate fields in $fields")
    require(minimumSupport > 0 && minimumSupport <= 1,
      s"minimum_support must be in (0, 1], got $minimumSupport")
    require(minimumSetSize >= 1 && minimumSetSize <= F,
      s"minimum_set_size must be in [1, $F], got $minimumSetSize")
    require(size >= 1, s"size must be >= 1, got $size")
    val cubeAll = df.cube(fields.map(col): _*)
      .agg(count(lit(1)).as("doc_count"),
        grouping_id().as("_gid"))
      .localCheckpoint(true)
    def inSet(i: Int): Column =
      col("_gid").bitwiseAND(lit(1L << (F - 1 - i))) === 0L
    def itemOf(i: Int): Column =
      concat(lit(fields(i) + "="), col(fields(i)).cast("string"))
    def itemsExcept(skip: Int): Column = concat_ws(", ",
      fields.indices.filter(_ != skip).map(i =>
        when(inSet(i), itemOf(i))): _*)
    // the closedness join keys on a STRUCTURED key — a fixed-width
    // array of per-field values (null = field not in the set) — never
    // the display string: a value containing ", " or "=" would make
    // distinct sets collide as strings ({a: "1, b=2"} vs {a: "1",
    // b: "2"}) and corrupt both the max-join and the reported items
    def keyExcept(skip: Int): Column = array(fields.indices.map(j =>
      if (j == skip) lit(null).cast("string")
      else when(inSet(j), col(fields(j)).cast("string"))): _*)
    val anyInSetNull = fields.indices.map(i =>
      inSet(i) && col(fields(i)).isNull).reduce(_ || _)
    val setSize = fields.indices.map(i =>
      when(inSet(i), 1).otherwise(0)).reduce(_ + _)
    val grand = (1L << F) - 1L
    val tot = cubeAll.filter(col("_gid") === grand)
      .select(col("doc_count").cast("double").as("_n_total"))
    val sets = cubeAll
      .filter(col("_gid") =!= grand && !anyInSetNull)
      .withColumn("items", itemsExcept(-1))
      .withColumn("_key", keyExcept(-1))
      .withColumn("set_size", setSize.cast("long"))
    // each set of size >= 2 emits its immediate parents' structured
    // keys; a set is CLOSED iff no child reaches its count
    val parentKeys = array(fields.indices.map(i =>
      when(inSet(i) && col("set_size") >= 2, keyExcept(i))): _*)
    val maxChild = sets
      .select(explode(filter(parentKeys, x => x.isNotNull))
        .as("_key"), col("doc_count").as("_child"))
      .groupBy("_key").agg(max(col("_child")).as("_max_child"))
    sets.join(maxChild, Seq("_key"), "left")
      .crossJoin(broadcast(tot))
      .filter(col("set_size") >= minimumSetSize &&
        col("doc_count").cast("double") / col("_n_total") >=
          minimumSupport &&
        (col("_max_child").isNull ||
          col("_max_child") < col("doc_count")))
      .select(col("items"), col("set_size"),
        col("doc_count").cast("long").as("doc_count"),
        graft.queries.QueryUtil.rhu(
          col("doc_count").cast("double") / col("_n_total"), 6)
          .as("support"))
      .orderBy(col("doc_count").desc, col("items").asc)
      .limit(size)
  }

  /** ES `random_sampler` aggregation (8.2+, the "speed up the
    * dashboard" agg): each document enters the sample INDEPENDENTLY
    * with `probability`; sub-aggregations run over the sample and
    * doc-count estimates scale by 1/p. ES seeds a per-shard hash
    * (routing-dependent, not replayable); the portable draw here is
    * [[Sampling.hashFrac]] — md5(seed:id) < p, the sm1 discipline,
    * bit-deterministic on any engine with md5. Returns the SAMPLED
    * frame (the [[samplerAgg]] composability contract — any agg
    * stacks on top). ES restricts probability to (0, 0.5] or exactly
    * 1 (above 0.5 sampling costs more than it saves); mirrored here.
    * Scale shape: a pushable per-row filter — no shuffle, no state.
    */
  def randomSampler(df: DataFrame, idCol: String, probability: Double,
                    seed: Long = 0L): DataFrame = {
    require((probability > 0 && probability <= 0.5) || probability == 1.0,
      s"random_sampler probability must be in (0, 0.5] or exactly 1 " +
        s"(ES's bound — above 0.5 sampling costs more than it saves), " +
        s"got $probability")
    if (probability == 1.0) df
    else df.filter(Sampling.hashFrac(col(idCol), seed) < probability)
  }

  /** ES field collapsing (`collapse` + `inner_hits`): one result per
    * distinct `keyCol` value, ranked by the BEST member's score, each
    * carrying up to `innerHits` member rows re-sorted by the inner
    * sort — the one-product-per-family shape of product-search UIs.
    * Output is flat, one row per (outer hit, inner hit):
    * (outer_rank, key, anchor id/score, inner_rank, inner id + the
    * inner sort value), so both ranking levels are hash-checkable.
    *
    * Tie discipline: ES breaks score ties by Lucene doc order, which
    * no other engine can replay — both levels here use (sort desc,
    * `idCol` asc) total orders, the [[topHits]] adjudication. The
    * outer rank is over ANCHOR scores (ES: the collapsed hit keeps
    * its top member's score).
    *
    * Scale shape: the anchor selection is a per-KEY window (groups
    * bounded by per-key doc counts — the th1 WindowGroupLimit shape),
    * the global outer cut is sort-limit (TakeOrderedAndProject, never
    * a single-partition global window over the corpus) with the rank
    * number assigned by a window over the ≤ `size` survivors; inner
    * hits re-join the corpus through a BROADCAST semi join on the
    * ≤ `size` surviving keys, so the second pass scans once and
    * windows only inside surviving groups.
    */
  def collapse(hits: DataFrame, keyCol: String, scoreCol: String,
               idCol: String, size: Int, innerHits: Int,
               innerSortCol: String, innerAsc: Boolean = false)
      : DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    require(innerHits >= 1, s"inner_hits size must be >= 1, got $innerHits")
    val score = col(scoreCol).cast("double")
    // anchor = the best-scoring member of each collapse group
    val anchors = hits
      .withColumn("_r", row_number().over(Window.partitionBy(keyCol)
        .orderBy(score.desc, col(idCol).asc)))
      .filter(col("_r") === 1)
      .select(col(keyCol), col(idCol).as("anchor_id"),
        score.as("anchor_score"))
      .orderBy(col("anchor_score").desc, col("anchor_id").asc)
      .limit(size)
    val ranked = anchors.withColumn("outer_rank",
      row_number().over(Window.orderBy(col("anchor_score").desc,
        col("anchor_id").asc)).cast("long"))
    val innerOrder =
      if (innerAsc) Seq(col(innerSortCol).asc, col(idCol).asc)
      else Seq(col(innerSortCol).desc, col(idCol).asc)
    hits
      .join(broadcast(ranked), Seq(keyCol))
      .withColumn("inner_rank", row_number().over(
        Window.partitionBy(keyCol).orderBy(innerOrder: _*))
        .cast("long"))
      .filter(col("inner_rank") <= innerHits)
      .select(col("outer_rank"), col(keyCol), col("anchor_id"),
        col("anchor_score"), col("inner_rank"),
        col(idCol).as("inner_id"),
        col(innerSortCol).cast("double").as("inner_sort"))
      .orderBy("outer_rank", "inner_rank")
  }

  /** ES `top_metrics`: per bucket, the metric values carried by the
    * row holding the EXTREME sort value — the size-1 face over the
    * [[topHits]] window machinery, keeping only the named metric
    * columns (plus the sort value, which ES returns alongside). Ties
    * break on `tieCol` ascending — ES breaks ties by Lucene doc
    * order, which is not portable; a named tie column is.
    */
  def topMetrics(df: DataFrame, by: Seq[String], sortCol: String,
                 metricCols: Seq[String], tieCol: String,
                 asc: Boolean = false): DataFrame = {
    require(metricCols.nonEmpty, "top_metrics needs metric columns")
    topHits(df, by, sortCol, 1, tieCol, asc)
      .select((by :+ sortCol) ++ metricCols map col: _*)
      .orderBy(by.map(col): _*)
  }

  /** ES `rate` aggregation inside a CALENDAR date_histogram: the
    * bucket's value normalized to a per-`unit` rate by the bucket's
    * OWN calendar span — a January bucket divides by 31 at
    * unit = day, February by 28 or 29, exactly how ES normalizes
    * calendar intervals (fixed intervals are plain constant division
    * and need no face). Pure per-bucket arithmetic on the reduced
    * frame; `bucketStartCol` must hold the bucket's start timestamp
    * (what date_trunc produced).
    */
  def rateAgg(buckets: DataFrame, bucketStartCol: String,
              valueCol: String, interval: String, unit: String,
              out: String = "rate"): DataFrame = {
    val b = col(bucketStartCol)
    val spanDays: Column = interval match {
      case "month" => datediff(add_months(b, 1), b).cast("double")
      case "week"  => lit(7.0)
      case "day"   => lit(1.0)
      case other => throw new IllegalArgumentException(
        s"rate interval must be month | week | day, got '$other'")
    }
    val divisor = unit match {
      case "day"  => spanDays
      case "hour" => spanDays * 24.0
      case other => throw new IllegalArgumentException(
        s"rate unit must be day | hour, got '$other'")
    }
    // a non-truncated bucket start would give add_months arithmetic
    // that is only coincidentally right (Jan 31 + 1 month = Feb 29 —
    // a 29-day "January"); refuse inside the evaluated expression so
    // the optimizer cannot prune the check
    buckets.withColumn(out,
      when(b === date_trunc(interval, b),
        col(valueCol).cast("double") / divisor)
        .otherwise(raise_error(concat(
          lit(s"rate: bucket start is not $interval-truncated: "),
          b.cast("string"),
          lit(" — feed date_trunc output (a date_histogram bucket)")))
          .cast("double")))
  }

  /** ES `rare_terms`: bucket keys appearing in at most `maxDocCount`
    * rows, rarest first (count asc, key asc). ES approximates with a
    * CuckooFilter to bound memory; here the exact groupBy is the
    * right call — the count shuffle carries (key, partial count)
    * pairs only, and the HAVING prunes before any sort. `limit`
    * bounds the output like ES's size.
    */
  def rareTerms(df: DataFrame, keyCols: Seq[String], maxDocCount: Long,
                limit: Option[Int] = None): DataFrame = {
    require(maxDocCount >= 1, s"max_doc_count must be >= 1, got " +
      s"$maxDocCount (ES bounds it to [1, 100])")
    val counted = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("doc_count"))
      .filter(col("doc_count") <= maxDocCount)
      .orderBy(col("doc_count").asc +: keyCols.map(col(_).asc): _*)
    limit.fold(counted)(counted.limit)
  }

  /** ES `auto_date_histogram`: pick the smallest rounding from a
    * fixed ladder that yields at most `targetBuckets` buckets, then
    * bucket the time column by it. The ladder follows ES's
    * RoundingInfo spirit — fixed seconds/minutes/hours/days
    * (epoch-floor buckets: 1s 5s 10s 30s 1m 5m 10m 30m 1h 3h 12h 1d
    * 7d), then calendar months (1M 3M) and years (1y 5y 10y 20y 50y
    * 100y) via date truncation. Bucket-count estimation is
    * floor(max/i) − floor(min/i) + 1 over the unit index, exactly
    * replayable by any engine from the same min/max. Returns the
    * frame with `out` (bucket start timestamp) and `auto_interval`
    * (the chosen rounding's name) appended; one tiny min/max job
    * decides the rounding, the bucketing itself is a pure expression.
    */
  def autoDateHistogram(df: DataFrame, timeCol: String,
                        targetBuckets: Int,
                        out: String = "bucket"): DataFrame = {
    require(targetBuckets >= 1,
      s"buckets must be >= 1, got $targetBuckets")
    val r = df.agg(min(col(timeCol)).as("mn"), max(col(timeCol)).as("mx"))
      .collect().head
    require(!r.isNullAt(0),
      s"auto_date_histogram: no non-null values in $timeCol")
    // TIMESTAMP collects as java.sql.Timestamp, TIMESTAMP_NTZ (what
    // pyarrow parquet reads as in Spark 4) as LocalDateTime — the
    // session runs UTC, so NTZ wall time IS the instant
    def instantOf(v: Any): java.time.Instant = v match {
      case t: java.sql.Timestamp       => t.toInstant
      case l: java.time.LocalDateTime  => l.toInstant(java.time.ZoneOffset.UTC)
      case i: java.time.Instant        => i
      case other => throw new IllegalArgumentException(
        s"$timeCol is not a timestamp column (got $other)")
    }
    val mn = instantOf(r.get(0))
    val mx = instantOf(r.get(1))
    val fixed = Seq(1L -> "1s", 5L -> "5s", 10L -> "10s", 30L -> "30s",
      60L -> "1m", 300L -> "5m", 600L -> "10m", 1800L -> "30m",
      3600L -> "1h", 10800L -> "3h", 43200L -> "12h", 86400L -> "1d",
      604800L -> "7d")
    def fixedCount(i: Long): Long =
      Math.floorDiv(mx.getEpochSecond, i) -
        Math.floorDiv(mn.getEpochSecond, i) + 1
    // NTZ → TIMESTAMP is a no-op under the UTC session; unix_seconds
    // requires TimestampType
    val ts = col(timeCol).cast("timestamp")
    val fixedPick = fixed.find { case (i, _) =>
      fixedCount(i) <= targetBuckets
    }.map { case (i, name) =>
      (timestamp_seconds(floor(unix_seconds(ts) / i) * i), name)
    }
    lazy val calendarPick: (Column, String) = {
      val zone = java.time.ZoneOffset.UTC
      def monthIdx(t: java.time.Instant): Long = {
        val d = t.atZone(zone)
        d.getYear.toLong * 12 + (d.getMonthValue - 1)
      }
      def monthCount(m: Long): Long =
        Math.floorDiv(monthIdx(mx), m) - Math.floorDiv(monthIdx(mn), m) + 1
      val idx = year(ts).cast("long") * 12 + (month(ts) - 1)
      def monthBucket(m: Long): Column = {
        val b = floor(idx / m) * m
        to_timestamp(make_date((b / 12).cast("int"),
          (b % 12 + 1).cast("int"), lit(1)))
      }
      val months = Seq(1L -> "1M", 3L -> "3M")
        .find { case (m, _) => monthCount(m) <= targetBuckets }
        .map { case (m, name) => (monthBucket(m), name) }
      lazy val years = {
        def yearOf(t: java.time.Instant): Long =
          t.atZone(zone).getYear.toLong
        def yearCount(n: Long): Long =
          Math.floorDiv(yearOf(mx), n) - Math.floorDiv(yearOf(mn), n) + 1
        val (n, name) = Seq(1L -> "1y", 5L -> "5y", 10L -> "10y",
          20L -> "20y", 50L -> "50y", 100L -> "100y")
          .find { case (n0, _) => yearCount(n0) <= targetBuckets }
          .getOrElse(100L -> "100y") // widest arm, ES's last resort
        (to_timestamp(make_date(
          (floor(year(ts).cast("long") / n) * n).cast("int"),
          lit(1), lit(1))), name)
      }
      months.getOrElse(years)
    }
    val (bucketExpr, name) = fixedPick.getOrElse(calendarPick)
    df.withColumn(out, bucketExpr)
      .withColumn("auto_interval", lit(name))
  }

  /** ES `range` aggregation: one bucket per (from, to) range with
    * ES's [from, to) half-open semantics; `None` = unbounded (ES's
    * missing from/to), keys rendered ES-style `"from-to"` with `*`
    * for the open end. Ranges may OVERLAP (a doc counts in every
    * range it fits — ES's contract), so this is one HashAggregate
    * pass with a conditional count per range, exploded to rows; never
    * R scans, never a groupBy that would force disjointness.
    */
  def rangeAgg(df: DataFrame, valueCol: String,
               ranges: Seq[(Option[Double], Option[Double])])
      : DataFrame = {
    require(ranges.nonEmpty, "range agg needs at least one range")
    val v = col(valueCol).cast("double")
    def key(r: (Option[Double], Option[Double])): String =
      s"${r._1.map(_.toString).getOrElse("*")}-" +
        s"${r._2.map(_.toString).getOrElse("*")}"
    require(ranges.map(key).distinct.size == ranges.size,
      s"duplicate range keys in ${ranges.map(key)}")
    val cells = ranges.map { r =>
      val cond = (r._1.map(v >= _) ++ r._2.map(v < _))
        .reduceOption(_ && _).getOrElse(lit(v.isNotNull))
      count(when(v.isNotNull && cond, 1)).cast("long").as(key(r))
    }
    df.agg(cells.head, cells.tail: _*)
      .select(explode(array(ranges.map { r =>
        struct(lit(key(r)).as("key"),
          lit(r._1.orNull).cast("double").as("from"),
          lit(r._2.orNull).cast("double").as("to"),
          col(s"`${key(r)}`").as("doc_count"))
      }: _*)).as("b"))
      .select("b.*")
  }

  /** ES `date_range` aggregation: [from, to) buckets over a
    * timestamp column with ISO date(-time) bounds (the [[rangeAgg]]
    * semantics on the time axis; ES's own key format "from-to" with
    * `*` for an open side). Bounds parse DRIVER-side to timestamp
    * literals — date math (`now-1M/d`) is clock-dependent and
    * refuses by absence; pass resolved dates. One conditional-count
    * aggregation pass.
    */
  def dateRangeAgg(df: DataFrame, tsCol: String,
                   ranges: Seq[(Option[String], Option[String])])
      : DataFrame = {
    require(ranges.nonEmpty, "date_range agg needs at least one range")
    val v = col(tsCol).cast("timestamp")
    def bound(s: String): Column = {
      // strict driver-side parse: the old prefix regex accepted
      // trailing garbage ('2020-01-01Tnope'), to_timestamp then gave
      // null, the range condition went null and the bucket silently
      // counted 0 — contrary to the refusal discipline. Parse the
      // exact shapes here so a malformed bound fails at call time.
      val norm = s.replace('T', ' ')
      val ok =
        try {
          if (norm.length == 10)
            { java.time.LocalDate.parse(norm); true }
          else {
            java.time.LocalDateTime.parse(norm,
              java.time.format.DateTimeFormatter.ofPattern(
                "yyyy-MM-dd HH:mm:ss[.SSS]"))
            true
          }
        } catch { case _: java.time.format.DateTimeParseException =>
          false }
      require(ok,
        s"date_range bound '$s' is not an ISO date(-time) " +
          "(yyyy-MM-dd[[ T]HH:mm:ss[.SSS]]) — date math (now-1M/d) " +
          "is clock-dependent and not supported; resolve it " +
          "caller-side")
      to_timestamp(lit(norm))
    }
    def key(r: (Option[String], Option[String])): String =
      s"${r._1.getOrElse("*")}-${r._2.getOrElse("*")}"
    require(ranges.map(key).distinct.size == ranges.size,
      s"duplicate range keys in ${ranges.map(key)}")
    val cells = ranges.map { r =>
      val cond = (r._1.map(v >= bound(_)) ++ r._2.map(v < bound(_)))
        .reduceOption(_ && _).getOrElse(v.isNotNull)
      count(when(v.isNotNull && cond, 1)).cast("long").as(key(r))
    }
    df.agg(cells.head, cells.tail: _*)
      .select(explode(array(ranges.map { r =>
        struct(lit(key(r)).as("key"),
          lit(r._1.orNull).cast("string").as("from"),
          lit(r._2.orNull).cast("string").as("to"),
          col(s"`${key(r)}`").as("doc_count"))
      }: _*)).as("b"))
      .select("b.*")
  }

  /** Dotted-quad IPv4 → its unsigned 32-bit value as a long; any
    * other shape (malformed octets, IPv6, null) → null — ES's
    * missing-field semantics under an aggregation. Pure
    * string-split + integer arithmetic, codegen-friendly.
    */
  private def ipv4Value(ip: Column): Column = {
    val parts = split(ip, "\\.")
    when(ip.rlike("^((25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\\.){3}" +
        "(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])$"),
      element_at(parts, 1).cast("long") * 16777216L +
        element_at(parts, 2).cast("long") * 65536L +
        element_at(parts, 3).cast("long") * 256L +
        element_at(parts, 4).cast("long"))
  }

  private def parseIpv4(s: String, what: String): Long = {
    val ps = s.split("\\.", -1)
    require(ps.length == 4 && ps.forall(p =>
      p.matches("\\d{1,3}") && p.toInt <= 255),
      s"$what '$s' is not a dotted-quad IPv4 (IPv6 needs 128-bit " +
        "arithmetic this engine does not model — not supported)")
    ps.map(_.toLong).reduce(_ * 256L + _)
  }

  private def fmtIpv4(v: Long): String =
    s"${(v >> 24) & 255}.${(v >> 16) & 255}.${(v >> 8) & 255}.${v & 255}"

  /** ES `ip_range` aggregation over an IPv4 string column: [from, to)
    * buckets given as dotted quads (`*` = open side, the date_range
    * convention), and/or CIDR `masks` — a /p mask is the [network,
    * network + 2^(32−p)) range, keyed by the mask string (ES's own
    * keying). Values that are not well-formed IPv4 (including IPv6)
    * count in NO bucket, like docs missing the field; IPv6 bounds
    * refuse loudly. ONE conditional-count aggregation pass (the
    * [[dateRangeAgg]] shape) — the range tests are integer compares
    * on the parsed value, so 100 TB of logs pay one scan.
    */
  def ipRangeAgg(df: DataFrame, ipCol: String,
                 ranges: Seq[(Option[String], Option[String])] = Nil,
                 masks: Seq[String] = Nil): DataFrame = {
    require(ranges.nonEmpty || masks.nonEmpty,
      "ip_range agg needs at least one range or mask")
    val v = ipv4Value(col(ipCol))
    val cells: Seq[(String, Option[Long], Option[Long])] =
      ranges.map { r =>
        val lo = r._1.map(parseIpv4(_, "ip_range from"))
        val hi = r._2.map(parseIpv4(_, "ip_range to"))
        (lo, hi) match {
          case (Some(a), Some(b)) => require(a < b,
            s"ip_range from ${r._1.get} must be below to ${r._2.get}")
          case _ => ()
        }
        (s"${r._1.getOrElse("*")}-${r._2.getOrElse("*")}", lo, hi)
      } ++ masks.map { m =>
        val (baseStr, p) = m.split("/") match {
          case Array(b, ps) if ps.matches("\\d{1,2}") && ps.toInt <= 32 =>
            (b, ps.toInt)
          case _ => throw new IllegalArgumentException(
            s"ip_range mask '$m' is not IPv4 CIDR (a.b.c.d/p, p <= 32)")
        }
        val span = 1L << (32 - p)
        val lo = (parseIpv4(baseStr, "ip_range mask") / span) * span
        (m, Some(lo), Some(lo + span))
      }
    require(cells.map(_._1).distinct.size == cells.size,
      s"duplicate ip_range keys in ${cells.map(_._1)}")
    val aggCells = cells.map { case (k, lo, hi) =>
      val cond = (lo.map(v >= _) ++ hi.map(v < _))
        .reduceOption(_ && _).getOrElse(v.isNotNull)
      count(when(v.isNotNull && cond, 1)).cast("long").as(k)
    }
    df.agg(aggCells.head, aggCells.tail: _*)
      .select(explode(array(cells.map { case (k, lo, hi) =>
        struct(lit(k).as("key"),
          lit(lo.map(fmtIpv4).orNull).cast("string").as("from"),
          lit(hi.map(fmtIpv4).orNull).cast("string").as("to"),
          col(s"`$k`").as("doc_count"))
      }: _*)).as("b"))
      .select("b.*")
  }

  /** ES `ip_prefix` aggregation (8.9+): bucket IPv4 values by their
    * /`prefixLength` network — key = the network address, buckets
    * ordered by it. Malformed/IPv6 values bucket nowhere. One keyed
    * aggregation on the masked integer; the dotted key is formatted
    * from the group key AFTER reduction.
    */
  def ipPrefixAgg(df: DataFrame, ipCol: String,
                  prefixLength: Int): DataFrame = {
    require(prefixLength >= 1 && prefixLength <= 32,
      s"prefix_length must be in [1, 32], got $prefixLength")
    val span = 1L << (32 - prefixLength)
    // span is a power of two, so the double division is exact and
    // floor gives true integer network masking
    val net = floor(ipv4Value(col(ipCol)) / span).cast("long") * span
    df.select(net.as("_net")).filter(col("_net").isNotNull)
      .groupBy("_net")
      .agg(count(lit(1)).cast("long").as("doc_count"))
      .select(
        concat_ws(".",
          ((col("_net") / 16777216L).cast("long") % 256).cast("string"),
          ((col("_net") / 65536L).cast("long") % 256).cast("string"),
          ((col("_net") / 256L).cast("long") % 256).cast("string"),
          (col("_net") % 256).cast("string")).as("key"),
        lit(prefixLength).cast("long").as("prefix_length"),
        col("doc_count"), col("_net"))
      .orderBy("_net")
      .drop("_net")
  }

  /** ES `variable_width_histogram` — PORTABLE ADJUDICATION (PLANS.md
    * r16): ES clusters values into `buckets` clusters SHARD-LOCALLY
    * with an order-dependent streaming nearest-centroid pass (its own
    * docs call the result approximate and routing-dependent), which
    * no other engine can replay. The deterministic reading here:
    * equal-DEPTH buckets — cut points at the exact interpolated
    * i/k quantiles ([[Quantiles.viaSort]], the scale-stable
    * sort-based selection), a value landing on a cut point goes to
    * the HIGHER bucket, empty buckets (heavy duplicate mass) are
    * omitted. Output per bucket: (bucket, min, max, avg, doc_count)
    * — ES's bucket surface, deterministic boundaries. Cost: one
    * global sort (the quantiles) + ONE keyed aggregation; never a
    * global-window ntile over the corpus.
    */
  def variableWidthHistogram(df: DataFrame, valueCol: String,
                             buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val v = col(valueCol).cast("double")
    // cut points round half-up at 6 dp (the repo's cross-engine
    // determinism discipline): interpolation formulas differ by an
    // ulp between engines, and an ulp above an integer-valued datum
    // would flip that datum's bucket
    val cuts: Seq[Double] =
      if (buckets == 1) Nil
      else Quantiles.viaSort(df, v,
          (1 until buckets).map(_.toDouble / buckets))
        .orderBy("q").collect().toSeq
        .flatMap(r => Option(r.get(1)).map(c =>
          math.floor(c.asInstanceOf[Double] * 1e6 + 0.5) / 1e6))
    val idx = cuts.foldLeft(lit(0L)) { (acc, c) =>
      acc + when(v >= c, 1L).otherwise(0L)
    }
    df.filter(v.isNotNull)
      .groupBy(idx.as("bucket"))
      .agg(min(v).as("min"), max(v).as("max"),
        graft.queries.QueryUtil.rhu(avg(v), 6).as("avg"),
        count(lit(1)).cast("long").as("doc_count"))
      .orderBy("bucket")
  }

  /** ES `filters` aggregation: one bucket per NAMED predicate, plus
    * an optional `_other_` bucket for rows matching none (ES's
    * `other_bucket`). Predicates may overlap; one HashAggregate pass
    * with a conditional count per filter, exploded to rows in the
    * given order.
    */
  def filtersAgg(df: DataFrame, filters: Seq[(String, Column)],
                 otherBucket: Boolean = false): DataFrame = {
    require(filters.nonEmpty, "filters agg needs at least one filter")
    require(filters.map(_._1).distinct.size == filters.size,
      s"duplicate filter names in ${filters.map(_._1)}")
    require(!filters.exists(_._1 == "_other_"),
      "'_other_' is reserved for the other bucket")
    val named = filters ++ (if (otherBucket)
      Seq("_other_" -> !filters.map(_._2)
        .map(c => coalesce(c, lit(false))).reduce(_ || _))
    else Nil)
    val cells = named.map { case (name, pred) =>
      count(when(coalesce(pred, lit(false)), 1)).cast("long").as(name)
    }
    df.agg(cells.head, cells.tail: _*)
      .select(explode(array(named.map { case (name, _) =>
        struct(lit(name).as("key"), col(s"`$name`").as("doc_count"))
      }: _*)).as("b"))
      .select("b.*")
  }

  /** ES `missing` aggregation: the bucket of documents whose `field`
    * is null/absent, with the standard metric sub-aggs over
    * `valueCol` INSIDE that bucket (ES's usual `missing` + metric
    * composition; the reference reaches aggregations only through the
    * ES endpoint — `eland/query.py` carries no missing-bucket body,
    * so this is the parity-plus spelling). ONE conditional-aggregate
    * pass: doc_count and the metrics ride a single HashAggregate with
    * map-side partials — never a filter-then-rescan of the corpus.
    * avg/sum round 6-dp half-up (the cross-engine determinism
    * discipline); min/max are exact data values.
    */
  def missingAgg(df: DataFrame, field: String,
                 valueCol: Option[String] = None): DataFrame = {
    val miss = col(field).isNull
    val base: Seq[Column] =
      Seq(count(when(miss, 1)).cast("long").as("doc_count"))
    val metrics = valueCol.toSeq.flatMap { v =>
      val mv = when(miss, col(v).cast("double"))
      Seq(min(mv).as("min"), max(mv).as("max"),
        graft.queries.QueryUtil.rhu(sum(mv), 6).as("sum"),
        graft.queries.QueryUtil.rhu(avg(mv), 6).as("avg"))
    }
    val cells = base ++ metrics
    df.agg(cells.head, cells.tail: _*)
  }

  /** ES `global` aggregation: a bucket that ESCAPES the query scope —
    * ES runs top-level aggs under the search's query; a `global`
    * sub-agg re-aggregates over the whole index (the classic
    * "this search vs all products" dashboard cell). Spelled as ONE
    * conditional-aggregate pass over a single scan: the query-scoped
    * and global cells ride the same HashAggregate (map-side
    * partials), exploded to the two ES buckets afterward — never two
    * scans of the corpus, no join. A null query predicate counts as
    * non-matching (ES: the doc simply isn't in the query's result
    * set). Metric nulls are skipped inside avg, ES's metric rule.
    */
  def globalAgg(df: DataFrame, query: Column,
                valueCol: String): DataFrame = {
    val q = coalesce(query, lit(false))
    val v = col(valueCol).cast("double")
    val qv = when(q, v)
    df.agg(
        count(when(q, 1)).cast("long").as("q_count"),
        graft.queries.QueryUtil.rhu(avg(qv), 6).as("q_avg"),
        count(lit(1)).cast("long").as("g_count"),
        graft.queries.QueryUtil.rhu(avg(v), 6).as("g_avg"))
      .select(explode(array(
        struct(lit("query").as("scope"),
          col("q_count").as("doc_count"), col("q_avg").as("avg")),
        struct(lit("global").as("scope"),
          col("g_count").as("doc_count"), col("g_avg").as("avg"))))
        .as("b"))
      .select("b.*")
  }

  /** ES `nested` aggregation with a `terms` sub-agg and a
    * `reverse_nested` leg: aggregate over the ELEMENTS of an
    * array-of-structs column, not the documents — `doc_count` counts
    * elements (ES's nested doc_count), the metric columns aggregate
    * the element field, and `parent_doc_count` is the reverse_nested
    * "how many PARENT documents have at least one such element".
    * One explode + one keyed shuffle with map-side partial aggs —
    * the standard Spark shape for element-grain aggregation; the
    * distinct-parent count rides the same shuffle.
    * Buckets order by doc_count desc then key (ES's terms order).
    */
  def nestedTerms(df: DataFrame, idCol: String, path: String,
                  keyField: String, valueField: String): DataFrame = {
    val e = explode(col(path)).as("_el")
    df.select(col(idCol), e)
      .groupBy(col(s"_el.$keyField").as("key"))
      .agg(
        count(lit(1)).cast("long").as("doc_count"),
        min(col(s"_el.$valueField").cast("double")).as("min"),
        max(col(s"_el.$valueField").cast("double")).as("max"),
        sum(col(s"_el.$valueField").cast("double")).as("sum"),
        avg(col(s"_el.$valueField").cast("double")).as("avg"),
        countDistinct(col(idCol)).cast("long").as("parent_doc_count"))
      .orderBy(col("doc_count").desc, col("key"))
  }

  /** ES `histogram` aggregation: fixed-`interval` numeric buckets
    * with ES's key rule key = floor((v − offset)/interval)·interval +
    * offset, null values in no bucket. `minDocCount = 0` materializes
    * the empty buckets between the first and last occupied key (the
    * date_histogram spine discipline — a 1-row bounds aggregate, a
    * sequence spine, one broadcast-joinable left join; the corpus is
    * scanned once). This is ES's own histogram face — the pandas
    * two-phase min/max binning is A14 (`GraftFrame.hist`).
    */
  def histogram(df: DataFrame, valueCol: String, interval: Double,
                offset: Double = 0.0,
                minDocCount: Int = 1,
                maxBuckets: Int = 65536): DataFrame = {
    require(interval > 0, s"interval must be > 0, got $interval")
    require(minDocCount >= 0,
      s"min_doc_count must be >= 0, got $minDocCount")
    require(maxBuckets >= 1,
      s"max_buckets must be >= 1, got $maxBuckets")
    val v = col(valueCol).cast("double")
    val key = (floor((v - offset) / interval) * interval + offset)
      .as("key")
    val buckets = df.filter(v.isNotNull).select(key)
      .groupBy("key")
      .agg(count(lit(1)).cast("long").as("doc_count"))
    val filled =
      if (minDocCount != 0) buckets
      else {
        // gap-fill WITHOUT a second corpus scan: each bucket emits
        // itself plus the empty keys since its predecessor, from a
        // lag over the bounded bucket frame (a bounds-aggregate +
        // spine + join spelling would recompute `buckets` — i.e.
        // rescan the corpus — once per reference; plan-pinned in
        // PlanQualitySpec). The one-partition window is over the
        // REDUCED buckets, the BucketPipeline adjudication. Step
        // indexes are integral by construction; round before the
        // cast so float error cannot drop a bucket.
        val w = org.apache.spark.sql.expressions.Window.orderBy("key")
        buckets
          .withColumn("_i",
            round((col("key") - offset) / interval).cast("long"))
          .withColumn("_prev", lag("_i", 1).over(w))
          // the running min over ascending keys = the FIRST step, so
          // _i − _lo + 1 is the total spine size so far
          .withColumn("_lo", min(col("_i")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            0)))
          // ES refuses result sets past search.max_buckets (default
          // 65536) for exactly this reason: two outlier values with a
          // tiny interval would otherwise materialize a billion-row
          // empty spine. The guard bounds the TOTAL spine (which
          // subsumes any single gap — ES's limit is on the result
          // size, not per gap) and lives INSIDE the sequence bound so
          // the optimizer cannot prune it away.
          .select(
            explode(sequence(
              coalesce(
                when(col("_i") - col("_lo") > (maxBuckets - 1).toLong,
                  raise_error(concat(
                    lit("histogram: the min_doc_count:0 spine spans "),
                    col("_i") - col("_lo") + 1L,
                    lit(s" buckets, exceeding max_buckets $maxBuckets" +
                      " — widen the interval or raise maxBuckets")))
                    .cast("long"))
                  .otherwise(coalesce(col("_prev"), col("_i") - 1L) + 1L),
                col("_i")),
              col("_i"))).as("_k"),
            col("_i"), col("doc_count"))
          .select((col("_k") * interval + offset).as("key"),
            when(col("_k") === col("_i"), col("doc_count"))
              .otherwise(lit(0L)).as("doc_count"))
      }
    filled.filter(col("doc_count") >= minDocCount.toLong)
      .orderBy("key")
  }

  /** ES `geo_line` aggregation: per group, the track of up to `size`
    * points ordered by the sort field, rendered as the scalar
    * "lon lat;lon lat;…" string (ES returns a GeoJSON LineString —
    * the geometry VALUES are identical, the wrapping is serializer
    * syntax; a scalar keeps the driver-hashable surface). The sort
    * order is made total with (sort, lon, lat) so ties cannot
    * reorder the line between engines; `complete` reports whether
    * the group fit inside `size` (ES's flag). One keyed shuffle with
    * the WindowGroupLimit partial top-k before it — the th1 shape.
    */
  def geoLine(df: DataFrame, groupCol: String, pointCol: String,
              sortCol: String, size: Int = 10000): DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    val lat = col(pointCol).getField("lat").cast("double")
    val lon = col(pointCol).getField("lon").cast("double")
    // total order: ties on the sort field cannot reorder the line
    val w = Window.partitionBy(groupCol)
      .orderBy(col(sortCol).asc, col("_lon").asc, col("_lat").asc)
    df.select(col(groupCol), col(sortCol), lon.as("_lon"),
        lat.as("_lat"))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(groupCol)))
      .filter(col("_rn") <= size)
      .groupBy(groupCol)
      .agg(
        concat_ws(";", transform(
          array_sort(collect_list(struct(col("_rn"), col("_lon"),
            col("_lat")))),
          p => concat_ws(" ", p.getField("_lon").cast("string"),
            p.getField("_lat").cast("string")))).as("line"),
        count(lit(1)).cast("long").as("point_count"),
        (max(col("_n")) <= size).as("complete"))
      .orderBy(groupCol)
  }

  /** ES `categorize_text` — the DETERMINISTIC subset: documents group
    * by their TEMPLATE, the token stream with digit runs masked to
    * `#` (the dominant source of log-line variance; ES's ML
    * categorizer also drops rare tokens adaptively, which is
    * corpus-order-dependent and has no engine-independent
    * replay — masking is the portable core). Output per category:
    * the template key, doc_count desc, and the smallest doc id as
    * the representative example. One keyed shuffle.
    */
  def categorizeText(df: DataFrame, idCol: String,
                     textCol: String,
                     size: Option[Int] = None): DataFrame = {
    size.foreach(s => require(s >= 1, s"size must be >= 1, got $s"))
    val template = concat_ws(" ", transform(
      graft.functions.TextAnalysis.tokens(col(textCol)),
      t => regexp_replace(t, "[0-9]+", "#")))
    val out = df.filter(col(textCol).isNotNull)
      .select(col(idCol), template.as("category"))
      .groupBy("category")
      .agg(count(lit(1)).cast("long").as("doc_count"),
        min(col(idCol)).as("example_id"))
      .orderBy(col("doc_count").desc, col("category"))
    size.fold(out)(out.limit)
  }

  /** ES `geohash_grid` aggregation: bucket geo points by geohash cell
    * at `precision` characters (Niemeyer's scheme: 5·p bits, lon/lat
    * quantized to ⌈5p/2⌉ / ⌊5p/2⌋ bits, bit-interleaved lon-first,
    * base32 "0123456789bcdefghjkmnpqrstuvwxyz"). The whole encode is
    * closed-form integer arithmetic — quantize, interleave with
    * shifts, index the alphabet — NO transcendental anywhere, so the
    * key is bit-deterministic on any engine. Buckets order by
    * doc_count desc then key (ES's ordering); `size` bounds output.
    */
  def geohashGrid(df: DataFrame, pointCol: String, precision: Int,
                  size: Option[Int] = None): DataFrame = {
    require(precision >= 1 && precision <= 8,
      s"precision must be in [1, 8] (40 bits — the long-safe bound " +
        s"of this encoder; ES allows 12), got $precision")
    val p = col(pointCol)
    val lat = p.getField("lat").cast("double")
    val lon = p.getField("lon").cast("double")
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    def quantize(v: Column, lo: Double, hi: Double, bits: Int): Column = {
      val cells = math.pow(2.0, bits)
      // clamp BOTH edges: out-of-domain coordinates (lat < -90,
      // lon < -180) would otherwise go negative and garble the base32
      greatest(lit(0.0),
        least(floor((v - lo) / (hi - lo) * cells), lit(cells - 1)))
        .cast("long")
    }
    val lonQ = quantize(lon, -180.0, 180.0, lonBits)
    val latQ = quantize(lat, -90.0, 90.0, latBits)
    // interleave lon-first: lon bit i lands at 2i+1, lat bit i at 2i
    // (positions from the LSB; lon has one extra bit when 5p is odd,
    // which is exactly the geohash convention)
    val interleaved = (0 until lonBits).map(i =>
        shiftleft(shiftright(lonQ, i).bitwiseAND(lit(1L)),
          if (lonBits == latBits) 2 * i + 1 else 2 * i)
      ).reduce(_ + _) +
      (0 until latBits).map(i =>
        shiftleft(shiftright(latQ, i).bitwiseAND(lit(1L)),
          if (lonBits == latBits) 2 * i else 2 * i + 1)
      ).foldLeft(lit(0L): Column)(_ + _)
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    val chars = split(lit(alphabet), "")
    val hash = concat((0 until precision).map { j =>
      element_at(chars,
        (shiftright(interleaved, 5 * (precision - 1 - j))
          .bitwiseAND(lit(31L)) + 1).cast("int"))
    }: _*)
    val keyed = df
      .filter(p.isNotNull && lat.isNotNull && lon.isNotNull)
      .groupBy(hash.as("key"))
      .agg(count(lit(1)).cast("long").as("doc_count"))
      .orderBy(col("doc_count").desc, col("key"))
    size.fold(keyed)(keyed.limit)
  }

  /** ES `geotile_grid` aggregation: bucket geo points by Web-Mercator
    * map tile at `zoom` (the OSM "slippy map" z/x/y scheme ES uses):
    * x = ⌊(lon+180)/360·2^z⌋, y = ⌊(1 − asinh(tan φ)/π)/2·2^z⌋, both
    * clamped into [0, 2^z−1] (lon = 180 and the poles beyond Web
    * Mercator's ±85.05° land on the edge tiles, ES's behavior).
    * Buckets order by doc_count desc then key (ES's ordering), `size`
    * bounds the output. One map-side-combined groupBy; keys are
    * derived per row, so the 100 TB case is a scan + a (≤ 4^z)-key
    * shuffle. (lat 0 sits exactly on a tile boundary: tan(0) and
    * asinh(0) are IEEE-exact zeros on every libm, so the floor is
    * engine-stable; non-zero boundaries are irrational in lat and a
    * 1-ulp libm skew cannot flip them.)
    */
  def geotileGrid(df: DataFrame, pointCol: String, zoom: Int,
                  size: Option[Int] = None): DataFrame = {
    require(zoom >= 0 && zoom <= 29,
      s"zoom must be in [0, 29] (ES's precision bound), got $zoom")
    val p = col(pointCol)
    val lat = p.getField("lat").cast("double")
    val lon = p.getField("lon").cast("double")
    val n = math.pow(2.0, zoom)
    def clamp(c: Column): Column =
      greatest(lit(0.0), least(c, lit(n - 1)))
    val x = clamp(floor((lon + 180.0) / 360.0 * n))
    // asinh spelled as ln(t + √(t²+1)) — DuckDB has no asinh builtin,
    // and the explicit identity keeps the expression chain LITERALLY
    // identical on both engines (the cross-engine float discipline)
    val t = tan(radians(lat))
    val y = clamp(floor(
      (lit(1.0) - log(t + sqrt(t * t + 1.0)) / math.Pi) / 2.0 * n))
    val keyed = df
      .filter(p.isNotNull && lat.isNotNull && lon.isNotNull)
      .groupBy(concat(lit(s"$zoom/"), x.cast("long"), lit("/"),
        y.cast("long")).as("key"))
      .agg(count(lit(1)).cast("long").as("doc_count"))
      .orderBy(col("doc_count").desc, col("key"))
    size.fold(keyed)(keyed.limit)
  }

  /** ES `boxplot` aggregation: min, q1, q2 (median), q3, max — exact
    * R-7 interpolated quantiles (ES's TDigest approximates exactly
    * these), one aggregate pass.
    */
  def boxplot(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.agg(min(v).as("min"),
        percentile(v, lit(0.25)).as("q1"),
        percentile(v, lit(0.5)).as("q2"),
        percentile(v, lit(0.75)).as("q3"),
        max(v).as("max"))
  }

  /** ES `t_test` aggregation (unpaired): Student's t statistic
    * between the values of two groups, `heteroscedastic` (Welch,
    * ES's default) or `homoscedastic` (pooled variance). One
    * conditional-moment pass; the statistic and the degrees of
    * freedom derive from moment arithmetic (Σx, Σx², n per group —
    * identical expressions any engine replays). ES returns only the
    * p-value — a t-distribution CDF lookup whose libm path is
    * engine-internal — so the portable surface here is (t_stat, df,
    * means): any stats layer turns them into the p-value.
    * Welch df via Welch–Satterthwaite.
    */
  def tTest(df: DataFrame, valueCol: String, groupCol: String,
            groupA: String, groupB: String,
            variant: String = "heteroscedastic"): DataFrame = {
    require(variant == "heteroscedastic" || variant == "homoscedastic",
      s"t_test type must be heteroscedastic | homoscedastic, got " +
        s"'$variant'")
    require(groupA != groupB, "t_test needs two distinct groups")
    val v = col(valueCol).cast("double")
    def cells(g: String, tag: String) = Seq(
      count(when(col(groupCol) === g, v)).cast("double").as(s"n$tag"),
      sum(when(col(groupCol) === g, v)).as(s"s$tag"),
      sum(when(col(groupCol) === g, v * v)).as(s"q$tag"))
    val all = cells(groupA, "a") ++ cells(groupB, "b")
    val m = df.agg(all.head, all.tail: _*)
    val meanA = col("sa") / col("na")
    val meanB = col("sb") / col("nb")
    val varA = (col("qa") - col("sa") * col("sa") / col("na")) /
      (col("na") - 1)
    val varB = (col("qb") - col("sb") * col("sb") / col("nb")) /
      (col("nb") - 1)
    val (tStat, dfree) = variant match {
      case "heteroscedastic" =>
        val se2 = varA / col("na") + varB / col("nb")
        ((meanA - meanB) / sqrt(se2),
          se2 * se2 / (
            (varA / col("na")) * (varA / col("na")) / (col("na") - 1) +
              (varB / col("nb")) * (varB / col("nb")) / (col("nb") - 1)))
      case _ =>
        val pooled = ((col("na") - 1) * varA + (col("nb") - 1) * varB) /
          (col("na") + col("nb") - 2)
        ((meanA - meanB) /
          sqrt(pooled * (lit(1.0) / col("na") + lit(1.0) / col("nb"))),
          col("na") + col("nb") - 2)
    }
    m.select(col("na").cast("long").as("n_a"),
      col("nb").cast("long").as("n_b"),
      meanA.as("mean_a"), meanB.as("mean_b"),
      tStat.as("t_stat"), dfree.as("deg_f"))
  }

  /** The full-knob ES `terms` aggregation face: buckets of a single
    * field with `min_doc_count`, `include` / `exclude` regex filters
    * (anchored, ES's regexp semantics), and the `missing` parameter
    * (bucket null values under a substitute key instead of dropping
    * them). doc_count desc then key, size through a
    * TakeOrderedAndProject. The include/exclude filters apply to the
    * BUCKET KEY after aggregation (O(buckets), like ES) — but they
    * also push a mirror predicate below the groupBy so the shuffle
    * never carries excluded keys.
    *
    * `orderMetric` is ES's order-by-a-metric-sub-agg (`"order":
    * {"avg_price": "desc"}` with `avg_price: {avg: {field: ...}}` —
    * the most-used Kibana terms knob): (aggName, valueColumn) with
    * aggName one of avg | min | max | sum, direction via `orderAsc`
    * (ES's default for a metric order is desc). The metric rides the
    * SAME keyed aggregation as doc_count (no second shuffle), is
    * reported as `order_metric` (6-dp half-up — the replayable
    * ordering surface), and orders with ES's tie rule: metric, then
    * key ASC. A bucket whose metric is null (every value null — ES
    * metric aggs skip nulls) sorts LAST under either direction, the
    * documented portable reading. `min_doc_count`, include/exclude
    * and `missing` compose unchanged; the size cut remains a
    * TakeOrderedAndProject on the new order.
    *
    * `orderByKey` is ES's `"order": {"_key": asc|desc}` (alphabetical
    * dashboards) — direction via `orderAsc`; mutually exclusive with
    * `orderMetric` (ES's order here is one criterion; `_count` stays
    * the default).
    */
  def termsAgg(df: DataFrame, field: String,
               size: Option[Int] = None,
               minDocCount: Int = 1,
               include: Option[String] = None,
               exclude: Option[String] = None,
               missing: Option[String] = None,
               orderMetric: Option[(String, String)] = None,
               orderAsc: Boolean = false,
               orderByKey: Boolean = false): DataFrame = {
    require(minDocCount >= 0,
      s"min_doc_count must be >= 0, got $minDocCount")
    size.foreach(s => require(s >= 1, s"size must be >= 1, got $s"))
    require(!(orderByKey && orderMetric.isDefined),
      "pick ONE ordering: _key or a metric sub-agg (ES's order is a " +
        "single criterion here; _count is the default)")
    val valueCols = orderMetric.map(_._2).toSeq
    orderMetric.foreach { case (agg, v) =>
      require(Set("avg", "min", "max", "sum")(agg),
        s"terms order metric must be avg | min | max | sum, got '$agg'")
      require(v != field,
        "order the buckets by doc_count (the default) rather than a " +
          "metric over the key field itself")
    }
    val keyed = missing match {
      case Some(m) =>
        df.select((coalesce(col(field).cast("string"), lit(m)).as("key")
          +: valueCols.map(col)): _*)
      case None =>
        df.filter(col(field).isNotNull)
          .select((col(field).cast("string").as("key")
            +: valueCols.map(col)): _*)
    }
    val pre = Seq(
      include.map(re => col("key").rlike(s"^(?:$re)$$")),
      exclude.map(re => !col("key").rlike(s"^(?:$re)$$"))
    ).flatten.foldLeft(keyed)(_ filter _)
    val metricAgg = orderMetric.map { case (agg, v) =>
      val x = col(v).cast("double")
      val raw = agg match {
        case "avg" => avg(x)
        case "min" => min(x)
        case "max" => max(x)
        case "sum" => sum(x)
      }
      graft.queries.QueryUtil.rhu(raw, 6).as("order_metric")
    }
    val grouped = pre.groupBy("key")
      .agg(count(lit(1)).cast("long").as("doc_count"),
        metricAgg.toSeq: _*)
      .filter(col("doc_count") >= minDocCount.toLong)
    val out = orderMetric match {
      case None if orderByKey =>
        // ES `"order": {"_key": asc|desc}` — alphabetical dashboards
        grouped.orderBy(
          if (orderAsc) col("key").asc else col("key").desc)
      case None => grouped.orderBy(col("doc_count").desc, col("key"))
      case Some(_) =>
        val m = col("order_metric")
        grouped.orderBy(
          if (orderAsc) m.asc_nulls_last else m.desc_nulls_last,
          col("key"))
    }
    size.fold(out)(out.limit)
  }

  /** ES `multi_terms`: terms buckets over a COMPOUND key of several
    * fields — one keyed shuffle with map-side partial counts; the key
    * parts join with "|" for a scalar surface (ES returns a key
    * array). Docs missing ANY key field bucket nowhere (ES's rule).
    * doc_count desc then key, ES's order; `size` bounds the output
    * through a TakeOrderedAndProject.
    */
  def multiTerms(df: DataFrame, keys: Seq[String],
                 size: Option[Int] = None): DataFrame = {
    require(keys.size >= 2,
      s"multi_terms needs >= 2 key fields (got ${keys.size}; " +
        "use a plain terms/valueCounts for one)")
    size.foreach(s => require(s >= 1, s"size must be >= 1, got $s"))
    val out = df.filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("long").as("doc_count"))
      .select(concat_ws("|", keys.map(col(_).cast("string")): _*)
        .as("key"), col("doc_count"))
      .orderBy(col("doc_count").desc, col("key"))
    size.fold(out)(out.limit)
  }

  /** ES `t_test` type `paired`: Student's t over the PER-ROW
    * differences of two fields (ES requires both fields on every doc
    * counted — rows missing either side are excluded, matching the
    * filter ES's field pairing implies). t = mean(d)/(s_d/√n),
    * df = n − 1; one difference-moment pass, the [[tTest]] moment
    * discipline, p-value left to the caller's stats layer for the
    * same libm reason.
    */
  def tTestPaired(df: DataFrame, colA: String, colB: String): DataFrame = {
    require(colA != colB, "paired t_test needs two distinct fields")
    val d = col(colA).cast("double") - col(colB).cast("double")
    df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .agg(count(lit(1)).cast("double").as("n"),
        sum(d).as("s"), sum(d * d).as("q"))
      .select(col("n").cast("long").as("n"),
        (col("s") / col("n")).as("mean_diff"),
        ((col("s") / col("n")) /
          sqrt(when(col("n") > 1,
            greatest(lit(0.0),
              (col("q") - col("s") * col("s") / col("n")) /
                (col("n") - 1))) / col("n"))).as("t_stat"),
        (col("n") - 1).cast("long").as("deg_f"))
  }

  /** ES `string_stats` (with `show_distribution`'s entropy): count,
    * min/max/avg length, and the Shannon entropy (bits) of the
    * CHARACTER distribution across all values — one length pass plus
    * one character explode+count (vocabulary-bounded output).
    */
  def stringStats(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val lens = df.agg(count(v).cast("long").as("count"),
      min(length(v)).cast("long").as("min_length"),
      max(length(v)).cast("long").as("max_length"),
      (sum(length(v)) / count(v)).as("avg_length"))
    val chars = df.filter(v.isNotNull)
      .select(explode(split(v, "")).as("c"))
      .filter(length(col("c")) > 0)
      .groupBy("c").agg(count(lit(1)).cast("double").as("n"))
    val entropy = chars
      .agg((-sum(col("n") * log2(col("n"))) / sum(col("n")) +
        log2(sum(col("n")))).as("entropy"))
    lens.crossJoin(entropy)
  }

  /** ES `matrix_stats`: pairwise sample covariance and correlation
    * across numeric fields, from ONE moment pass (n, Σx, Σx², Σxy per
    * pair) — the expressions any engine replays bit-for-bit from the
    * same sums. One row per unordered pair (i ≤ j; the diagonal
    * carries the field's own variance and correlation 1). Rows with a
    * null in ANY field are skipped (ES's complete-observation rule).
    */
  def matrixStats(df: DataFrame, cols0: Seq[String]): DataFrame = {
    require(cols0.size >= 2, "matrix_stats needs at least two fields")
    val complete = df.filter(cols0.map(col(_).isNotNull).reduce(_ && _))
    val vs = cols0.map(c => c -> col(c).cast("double")).toMap
    val pairs = for {
      i <- cols0.indices; j <- i until cols0.size
    } yield (cols0(i), cols0(j))
    val cells =
      Seq(count(lit(1)).cast("double").as("_n")) ++
        cols0.map(c => sum(vs(c)).as(s"_s_$c")) ++
        pairs.map { case (a, b) =>
          sum(vs(a) * vs(b)).as(s"_p_${a}_$b")
        }
    val m = complete.agg(cells.head, cells.tail: _*)
    // n = 1 leaves sample covariance undefined → null (not an ANSI
    // divide-by-zero); n = 0 likewise (the agg row still exists)
    def cov(a: String, b: String): Column =
      when(col("_n") > 1,
        (col(s"_p_${a}_$b") -
          col(s"_s_$a") * col(s"_s_$b") / col("_n")) /
          (col("_n") - 1))
    m.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("field_a"), lit(b).as("field_b"),
          col("_n").cast("long").as("count"),
          (col(s"_s_$a") / col("_n")).as("mean_a"),
          (col(s"_s_$b") / col("_n")).as("mean_b"),
          cov(a, b).as("covariance"),
          (cov(a, b) / sqrt(cov(a, a) * cov(b, b))).as("correlation"))
      }: _*)).as("r"))
      .select("r.*")
  }

  /** ES `adjacency_matrix`: one bucket per named filter plus one per
    * PAIR intersection (key "a&b", ES's separator), empty buckets
    * omitted like ES. One HashAggregate pass with a conditional count
    * per cell (N(N+1)/2 cells), exploded to rows.
    */
  def adjacencyMatrix(df: DataFrame,
                      filters: Seq[(String, Column)]): DataFrame = {
    require(filters.nonEmpty, "adjacency_matrix needs filters")
    require(filters.map(_._1).distinct.size == filters.size,
      s"duplicate filter names in ${filters.map(_._1)}")
    require(!filters.exists(_._1.contains("&")),
      "filter names may not contain '&' (ES's intersection separator)")
    val cells = for {
      i <- filters.indices
      j <- i until filters.size
    } yield {
      val key = if (i == j) filters(i)._1
        else s"${filters(i)._1}&${filters(j)._1}"
      val pred = coalesce(filters(i)._2, lit(false)) &&
        coalesce(filters(j)._2, lit(false))
      (key, count(when(pred, 1)).cast("long").as(s"_c${i}_$j"),
        s"_c${i}_$j")
    }
    df.agg(cells.head._2, cells.tail.map(_._2): _*)
      .select(explode(array(cells.map { case (key, _, alias) =>
        struct(lit(key).as("key"), col(alias).as("doc_count"))
      }: _*)).as("b"))
      .select("b.*")
      .filter(col("doc_count") > 0)
  }

  /** ES `composite` aggregation paging: the buckets of `keys` (all
    * ascending, ES's default source order) AFTER `afterKey`, first
    * `size` of them — the scalable "give me every bucket, one page at
    * a time" agg. The after-key predicate is applied to the RAW rows
    * (a bucket's key decides the predicate, so filtering before the
    * groupBy is equivalent) — it reaches the scan as a pushable
    * lexicographic filter, and the page cut is a
    * TakeOrderedAndProject, so a deep page never materializes earlier
    * buckets.
    */
  def compositePage(df: DataFrame, keys: Seq[String], size: Int,
                    afterKey: Option[Seq[Any]] = None,
                    metrics: Seq[Column] = Seq(
                      count(lit(1)).cast("long").as("doc_count")))
      : DataFrame = {
    require(keys.nonEmpty, "composite needs at least one source key")
    require(size > 0, s"size must be >= 1, got $size")
    // NULL-keyed buckets would appear on page 1 then silently vanish
    // from every after_key page (NULL > x is null-false), and Spark
    // (nulls first) vs SQL engines (nulls last) disagree on their sort
    // position — so the paging contract requires non-null keys.
    val keyedNonNull = df.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    val paged = afterKey.fold(keyedNonNull) { after =>
      require(after.length == keys.length,
        s"after_key has ${after.length} values for ${keys.length} keys")
      // lexicographic strictly-greater: (k1 > a1) OR (k1 = a1 AND
      // (k2 > a2) OR ...) — nested so every leading-equality prefix
      // pushes down
      val pred = keys.zip(after).foldRight(lit(false): Column) {
        case ((k, a), rest) => col(k) > lit(a) ||
          (col(k) === lit(a) && rest)
      }
      keyedNonNull.filter(pred)
    }
    paged.groupBy(keys.map(col): _*)
      .agg(metrics.head, metrics.tail: _*)
      .orderBy(keys.map(col(_).asc): _*)
      .limit(size)
  }
}
