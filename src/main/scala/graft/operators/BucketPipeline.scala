package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** ES pipeline aggregations over a bucketed frame — the
  * `derivative` / `cumulative_sum` / `moving_fn` / `serial_diff` /
  * `bucket_script` / `bucket_selector` / `bucket_sort` /
  * `cumulative_cardinality` family (Elasticsearch "Pipeline
  * aggregations"; the reference reaches them only as raw-DSL `aggs`
  * passthrough on `es_query` — eland/query.py raw aggregations — so
  * the semantics here follow the ES documentation directly).
  *
  * Every function takes the OUTPUT of a bucketing aggregation (e.g.
  * [[graft.api.GraftFrame.resample]]`.agg(...)` — ES's
  * date_histogram + metric subaggs) and adds/filters columns with
  * window expressions, exactly ES's model: pipeline aggs run over the
  * reduced bucket set, never the raw documents.
  *
  * Scale shape: the input frame has one row per (series, bucket) —
  * its size is bounded by (cardinality of `seriesBy`) × (time range /
  * interval), independent of raw corpus size. With `seriesBy`
  * (ES's terms → date_histogram nesting) the window partitions by
  * series and distributes; without it the frame is a single bounded
  * time series and the one-partition window is the correct plan (the
  * 100 TB corpus was already reduced by the upstream groupBy).
  */
object BucketPipeline {

  private def spec(orderCol: String, seriesBy: Seq[String]): WindowSpec =
    if (seriesBy.isEmpty) Window.orderBy(orderCol)
    else Window.partitionBy(seriesBy.map(col): _*).orderBy(orderCol)

  /** ES `derivative`: current bucket's metric minus the previous
    * bucket's; the first bucket of each series gets null (ES omits
    * the value there). `unitMillis` adds ES's `unit` x-axis
    * normalization for date buckets: the derivative divided by the
    * bucket gap measured in that unit (a second = 1000, a day =
    * 86 400 000), emitted as `<out>_per_unit` alongside the plain
    * difference — exactly ES's `normalized_value`.
    */
  def derivative(buckets: DataFrame, orderCol: String, valueCol: String,
                 out: String = "derivative", seriesBy: Seq[String] = Nil,
                 unitMillis: Option[Long] = None): DataFrame = {
    val w = spec(orderCol, seriesBy)
    val diff = col(valueCol) - lag(col(valueCol), 1).over(w)
    val base = buckets.withColumn(out, diff)
    unitMillis.fold(base) { u =>
      require(u > 0, s"unit must be positive milliseconds, got $u")
      val gapMs = (unix_millis(col(orderCol)) -
        lag(unix_millis(col(orderCol)), 1).over(w)).cast("double")
      base.withColumn(s"${out}_per_unit",
        col(out) / (gapMs / u.toDouble))
    }
  }

  /** ES `cumulative_sum`: running total of the metric including the
    * current bucket, restarting per series.
    */
  def cumulativeSum(buckets: DataFrame, orderCol: String, valueCol: String,
                    out: String = "cumulative_sum",
                    seriesBy: Seq[String] = Nil): DataFrame =
    buckets.withColumn(out,
      sum(col(valueCol)).over(spec(orderCol, seriesBy)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** ES `serial_diff`: metric minus the metric `lag` buckets earlier;
    * buckets without enough history get null. `lag = 1` is
    * [[derivative]] without the unit option.
    */
  def serialDiff(buckets: DataFrame, orderCol: String, valueCol: String,
                 lagN: Int = 1, out: String = "serial_diff",
                 seriesBy: Seq[String] = Nil): DataFrame = {
    require(lagN >= 1, s"lag must be >= 1, got $lagN")
    buckets.withColumn(out,
      col(valueCol) - lag(col(valueCol), lagN)
        .over(spec(orderCol, seriesBy)))
  }

  /** ES `moving_fn`: `fn` over a sliding window of `window` buckets.
    * ES's `shift` convention: shift 0 (default) is the `window`
    * buckets BEFORE the current one (exclusive), shift 1 includes the
    * current bucket, shift = window/2 centers, shift = window is the
    * `window` buckets after. An empty window (e.g. the first bucket
    * at shift 0) yields null (ES renders its NaN as a skipped value).
    *
    * Functions: `max`, `min`, `sum`, `unweightedAvg`, `stdDev`
    * (population σ over the window, ES's `MovingFunctions.stdDev`),
    * `linearWeightedAvg` (weights 1..n, newest heaviest), and
    * `ewma(alpha)` via [[movingEwma]]. The first five are native
    * window aggregates; linearWeightedAvg collects the window (≤
    * `window` values, bounded) and folds position weights.
    */
  def movingFn(buckets: DataFrame, orderCol: String, valueCol: String,
               window: Int, fn: String, shift: Int = 0,
               out: String = "moving_fn",
               seriesBy: Seq[String] = Nil): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val frame = spec(orderCol, seriesBy)
      .rowsBetween(-window.toLong + shift, shift.toLong - 1)
    val v = col(valueCol)
    val expr = fn match {
      case "max"           => max(v).over(frame)
      case "min"           => min(v).over(frame)
      case "sum"           => sum(v).over(frame)
      case "unweightedAvg" => avg(v).over(frame)
      case "stdDev"        => stddev_pop(v).over(frame)
      case "linearWeightedAvg" =>
        // collect_list over a window frame preserves frame row order,
        // so weights 1..n line up oldest→newest (ES weights the
        // newest value highest: weight = position + 1)
        val vals = collect_list(v).over(frame)
        val n = size(vals)
        when(n > 0,
          aggregate(zip_with(vals,
              sequence(lit(1), greatest(n, lit(1))), (x, i) => x * i),
            lit(0.0), (acc, x) => acc + x) /
            (n.cast("double") * (n + 1).cast("double") / 2.0))
          .otherwise(lit(null).cast("double"))
      case other => throw new IllegalArgumentException(
        s"moving_fn function must be max | min | sum | unweightedAvg" +
          s" | stdDev | linearWeightedAvg (ewma → movingEwma), got " +
          s"'$other'")
    }
    buckets.withColumn(out, expr)
  }

  /** ES `MovingFunctions.ewma(values, alpha)` under `moving_fn`:
    * exponentially weighted average of the window, folded oldest →
    * newest (avg = v first value, then avg = alpha·v + (1-alpha)·avg).
    */
  def movingEwma(buckets: DataFrame, orderCol: String, valueCol: String,
                 window: Int, alpha: Double, shift: Int = 0,
                 out: String = "ewma",
                 seriesBy: Seq[String] = Nil): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val frame = spec(orderCol, seriesBy)
      .rowsBetween(-window.toLong + shift, shift.toLong - 1)
    val vals = collect_list(col(valueCol)).over(frame)
    buckets.withColumn(out,
      when(size(vals) > 0,
        aggregate(slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
          element_at(vals, 1).cast("double"),
          (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc))
        .otherwise(lit(null).cast("double")))
  }

  /** ES `bucket_script`: a per-bucket value computed from sibling
    * metrics — here the "script" is a Column expression over the
    * bucket frame's columns (codegen instead of Painless). Nulls
    * propagate like ES's `skip` gap policy: a bucket missing any
    * input yields null.
    */
  def bucketScript(buckets: DataFrame, out: String,
                   script: Column): DataFrame =
    buckets.withColumn(out, script)

  /** ES `bucket_selector`: keep only buckets where the predicate is
    * true — null predicates (a missing metric under `skip` gap
    * policy) drop the bucket, exactly ES.
    */
  def bucketSelector(buckets: DataFrame, predicate: Column): DataFrame =
    buckets.filter(coalesce(predicate, lit(false)))

  /** ES `bucket_sort`: order the buckets and keep `size` of them from
    * offset `from`. Runs as a global sort + offset/limit on the
    * bounded bucket frame (ES applies it to the parent agg's bucket
    * list the same way).
    */
  def bucketSort(buckets: DataFrame, sortBy: Seq[Column],
                 from: Int = 0, size: Option[Int] = None): DataFrame = {
    require(from >= 0, s"from must be >= 0, got $from")
    require(size.forall(_ > 0), s"size must be > 0, got ${size.get}")
    val sorted = buckets.orderBy(sortBy: _*)
    val offset = if (from == 0) sorted else sorted.offset(from)
    size.fold(offset)(offset.limit)
  }

  /** ES sibling pipeline aggs `stats_bucket` (and thereby
    * avg/sum/min/max_bucket's values): one row of count/min/max/avg/
    * sum over a metric across ALL buckets of the frame. The input is
    * the bounded bucket frame, so this is a 1-row aggregate.
    */
  def bucketStats(buckets: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    buckets.agg(count(v).cast("long").as("count"), min(v).as("min"),
      max(v).as("max"), avg(v).as("avg"), sum(v).as("sum"))
  }

  /** ES `bucket_correlation` (the count_correlation function):
    * Pearson r between the bucket metric series and a caller-provided
    * vector of the same length, buckets taken in `orderCol` order —
    * the trend/anomaly-detection pipeline agg. One row out; pure
    * moment arithmetic over the bounded frame (Σx, Σy, Σxy, Σx², Σy²
    * — the same replay-exact shape as [[graft.operators.EsAggs]]'
    * matrix_stats), so any engine reproduces it bit-for-bit.
    */
  def bucketCorrelation(buckets: DataFrame, orderCol: String,
                        valueCol: String,
                        given: Seq[Double]): DataFrame = {
    require(given.nonEmpty, "bucket_correlation needs a given vector")
    val w = Window.orderBy(orderCol)
    // row_number clamped so element_at cannot fault before the 1:1
    // length guard below can fire; the guard makes any clamped pairing
    // unreachable in a result
    val y = element_at(
      typedLit(given), least(row_number().over(w), lit(given.length)))
    // a null metric would be SKIPPED by the sums but counted by _n —
    // every moment silently skewed — so nullness refuses inside the
    // evaluated expression (the rateAgg discipline)
    val x = when(col(valueCol).isNull,
      raise_error(lit(s"bucket_correlation: null $valueCol — a " +
        "skipped null would silently skew every moment; fill or " +
        "filter the bucket frame first")).cast("double"))
      .otherwise(col(valueCol).cast("double"))
    val paired = buckets.select(x.as("_x"), y.as("_y"))
    val r =
      ((col("_sxy") - col("_sx") * col("_sy") / col("_n")) /
        (sqrt(greatest(lit(0.0),
          col("_sxx") - col("_sx") * col("_sx") / col("_n"))) *
          sqrt(greatest(lit(0.0),
            col("_syy") - col("_sy") * col("_sy") / col("_n")))))
    paired.agg(
        count(lit(1)).cast("double").as("_n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"))
      // the 1:1 length check rides the SAME aggregate (the old
      // separate count() action re-evaluated the whole input plan)
      .select(
        when(col("_n") =!= lit(given.length.toDouble),
          raise_error(concat(
            lit(s"bucket_correlation: given vector has " +
              s"${given.length} entries for "),
            col("_n").cast("long"),
            lit(" buckets — they must align 1:1 in bucket order")))
            .cast("double"))
          .otherwise(r).as("correlation"))
  }

  /** ES `normalize` pipeline agg: the bucket metric rescaled by one
    * of ES's methods — `rescale_0_1`, `rescale_0_100`,
    * `percent_of_sum`, `mean` (value − avg) / (max − min), `z-score`,
    * `softmax` — as a new column over the bounded bucket frame.
    * Windows over the whole (already reduced) frame, the
    * [[cumulativeSum]] discipline; degenerate denominators (all
    * buckets equal, zero sum) yield null rather than NaN/Inf, and
    * z-score uses the POPULATION deviation (ES's formula).
    */
  def normalize(buckets: DataFrame, valueCol: String, method: String,
                out: String = "normalized",
                seriesBy: Seq[String] = Nil): DataFrame = {
    val w =
      if (seriesBy.isEmpty)
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
      else Window.partitionBy(seriesBy.map(col): _*)
        .rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
    val v = col(valueCol).cast("double")
    val mn = min(v).over(w)
    val mx = max(v).over(w)
    val sm = sum(v).over(w)
    val av = avg(v).over(w)
    val nn = count(v).over(w).cast("double")
    val expr = method match {
      case "rescale_0_1" =>
        when(mx =!= mn, (v - mn) / (mx - mn))
      case "rescale_0_100" =>
        when(mx =!= mn, (v - mn) / (mx - mn) * 100.0)
      case "percent_of_sum" => when(sm =!= 0.0, v / sm)
      case "mean" => when(mx =!= mn, (v - av) / (mx - mn))
      case "z-score" =>
        val varPop = greatest(lit(0.0),
          sum(v * v).over(w) / nn - av * av)
        when(varPop > 0.0, (v - av) / sqrt(varPop))
      case "softmax" => exp(v) / sum(exp(v)).over(w)
      case other => throw new IllegalArgumentException(
        s"normalize method must be rescale_0_1 | rescale_0_100 | " +
          s"percent_of_sum | mean | z-score | softmax, got '$other'")
    }
    buckets.withColumn(out, expr)
  }

  /** ES `percentiles_bucket` sibling agg: percentiles of a metric
    * across ALL buckets of the bounded frame — one row, one `p<N>`
    * column per requested percent. ES documents this agg as the
    * exact-percentile member of the family (unlike the `percentiles`
    * metric agg it does NOT TDigest — the bucket list is in memory
    * server-side), and over a bounded bucket frame the exact R-7
    * interpolation Spark's `percentile` and DuckDB's `quantile_cont`
    * share reproduces it bit-for-bit. 1-row aggregate, the
    * [[bucketStats]] discipline.
    */
  def percentilesBucket(buckets: DataFrame, valueCol: String,
                        percents: Seq[Double] =
                          Seq(0.01, 0.05, 0.25, 0.50, 0.75, 0.95, 0.99))
      : DataFrame = {
    require(percents.nonEmpty, "percentiles_bucket needs >= 1 percent")
    require(percents.distinct.size == percents.size,
      s"duplicate percents in $percents")
    percents.foreach(p => require(p >= 0.0 && p <= 1.0,
      s"percent must be in [0, 1], got $p"))
    val v = col(valueCol).cast("double")
    def nameOf(p: Double): String = {
      // p25, p50, p99_9 — dots are not column-name friendly
      val pct = p * 100.0
      if (pct == pct.floor) s"p${pct.toLong}"
      else s"p${pct.toString.replace('.', '_')}"
    }
    val aggs = percents.map(p => percentile(v, lit(p)).as(nameOf(p)))
    buckets.agg(aggs.head, aggs.tail: _*)
  }

  /** ES `max_bucket`: the extreme metric value plus the keys of EVERY
    * bucket attaining it (ES returns a keys LIST on ties), keys
    * sorted ascending and joined with "," for a scalar-friendly
    * surface. `minBucket` is the mirror.
    */
  def maxBucket(buckets: DataFrame, keyCol: String,
                valueCol: String): DataFrame =
    extremeBucket(buckets, keyCol, valueCol, isMax = true)

  def minBucket(buckets: DataFrame, keyCol: String,
                valueCol: String): DataFrame =
    extremeBucket(buckets, keyCol, valueCol, isMax = false)

  private def extremeBucket(buckets: DataFrame, keyCol: String,
                            valueCol: String,
                            isMax: Boolean): DataFrame = {
    val v = col(valueCol).cast("double")
    val m = buckets.agg(
      (if (isMax) max(v) else min(v)).as("_m"))
    buckets.join(broadcast(m), v === col("_m"))
      .agg(concat_ws(",",
          sort_array(collect_list(col(keyCol).cast("string"))))
        .as("keys"),
        first(col("_m")).as("value"))
  }

  /** ES `moving_percentiles` (exact, single p): the interpolated
    * percentile of the metric over the moving window — ES moves
    * TDigests; over a bounded bucket window the exact
    * `percentile(v, p)` (the R-7 linear interpolation both Spark and
    * DuckDB implement) IS the number those sketches approximate.
    * Same `window`/`shift` conventions as [[movingFn]].
    */
  def movingPercentile(buckets: DataFrame, orderCol: String,
                       valueCol: String, window: Int, p: Double,
                       shift: Int = 0, out: String = "moving_percentile",
                       seriesBy: Seq[String] = Nil): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(p >= 0 && p <= 1, s"percentile must be in [0, 1], got $p")
    val frame = spec(orderCol, seriesBy)
      .rowsBetween(-window.toLong + shift, shift.toLong - 1)
    buckets.withColumn(out,
      percentile(col(valueCol).cast("double"), lit(p)).over(frame))
  }

  /** ES date_histogram `min_doc_count: 0` — materialize EMPTY buckets
    * so pipeline aggs see a contiguous series (a derivative across a
    * silent month must see the zero, not skip it). The spine is
    * `sequence(min, max, 1 interval)` over the frame's own bucket
    * range (ES fills between a histogram's first and last bucket;
    * `extended_bounds` would widen the agg upstream), cross-joined
    * with the distinct series keys when `seriesBy` nests it under a
    * terms agg. `fill` maps metric columns to their empty-bucket
    * value (`count → 0`); unmapped metrics stay null (ES's `skip`
    * gap policy). Cost: a 1-row bounds aggregate, a bucket-count
    * spine, one left join on the bounded bucket frame — the corpus
    * is never touched.
    */
  def fillEmptyBuckets(buckets: DataFrame, orderCol: String,
                       interval: String, seriesBy: Seq[String] = Nil,
                       fill: Map[String, Column] = Map.empty)
      : DataFrame = {
    val step = interval match {
      case "year" | "quarter" | "month" | "week" | "day" | "hour" |
           "minute" => expr(s"interval 1 $interval")
      case other => throw new IllegalArgumentException(
        s"interval must be year|quarter|month|week|day|hour|minute, " +
          s"got '$other'")
    }
    val spine = buckets
      .agg(min(col(orderCol)).as("_lo"), max(col(orderCol)).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"), step))
        .as(orderCol))
    val keyed =
      if (seriesBy.isEmpty) spine
      else buckets.select(seriesBy.map(col): _*).distinct()
        .crossJoin(spine)
    val joined = keyed.join(buckets, seriesBy :+ orderCol, "left")
    fill.foldLeft(joined) { case (df, (name, v)) =>
      require(joined.columns.contains(name),
        s"fill column '$name' is not in the bucket frame")
      df.withColumn(name, coalesce(col(name), v))
    }
  }

  /** ES `cumulative_cardinality`: per bucket, the number of DISTINCT
    * keys seen in that bucket or any earlier one — "new users per
    * day" style. Computed the scalable way, from the RAW frame:
    * each key contributes only its FIRST bucket (one groupBy on the
    * key — the single full-data shuffle), first-appearance counts
    * roll up per bucket, and a prefix sum over the bounded bucket
    * frame finishes. Never a running `collect_set` (that window
    * would hold every key in memory per bucket). Buckets present in
    * `buckets` but with no first appearances carry the previous
    * total. Emits `<out>` (the running distinct count) and
    * `<out>_new` (ES's sibling "incremental" reading: first
    * appearances in this bucket).
    */
  def cumulativeCardinality(buckets: DataFrame, raw: DataFrame,
                            bucketExpr: Column, keyCol: String,
                            orderCol: String,
                            out: String = "cumulative_cardinality",
                            seriesBy: Seq[String] = Nil): DataFrame = {
    require(!buckets.columns.contains(out) &&
      !buckets.columns.contains(s"${out}_new"),
      s"output columns '$out'/'${out}_new' collide with the bucket frame")
    val firstSeen = raw
      .groupBy((seriesBy.map(col) :+ col(keyCol)): _*)
      .agg(min(bucketExpr).as(orderCol))
    val newPerBucket = firstSeen
      .groupBy((seriesBy :+ orderCol).map(col): _*)
      .agg(count(lit(1)).as(s"${out}_new"))
    buckets.join(newPerBucket, seriesBy :+ orderCol, "left")
      .withColumn(s"${out}_new",
        coalesce(col(s"${out}_new"), lit(0L)))
      .withColumn(out,
        sum(col(s"${out}_new")).over(spec(orderCol, seriesBy)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** ES `change_point` aggregation (8.x) — the PORTABLE core: detect
    * a STEP CHANGE in a bucket metric series. ES runs a battery of
    * statistical tests with engine-internal p-value machinery (spike/
    * dip/trend/distribution variants); the engine-independent subset
    * implemented here is the classic two-sample split scan: for every
    * split with at least `minSegment` buckets on each side, Welch's
    * t between the left and right segments (sample variances; a
    * zero-variance denominator floors at 1e-12 so a PERFECT step
    * selects rather than dividing by zero); the change point is the
    * split with max |t|, earliest on ties, reported as the FIRST key
    * of the right segment. `type` is `step_change` when |t| ≥
    * `threshold`, else `stationary` (ES reports stationary the same
    * way). ES requires ≥ 22 buckets before it tests; here the frame
    * just yields ZERO rows when no split has `minSegment` a side —
    * spec-pinned, never a wrong answer.
    *
    * One row out: (change_point, type, t_stat, left_mean,
    * right_mean), floats rounded half-up at 6 dp.
    *
    * Scale shape: the whole computation is windows over the BOUNDED
    * bucket frame (prefix sums + frame totals — the cumulativeSum
    * adjudication), then a sort-limit(1) on it; the corpus was
    * reduced by the upstream date_histogram.
    */
  def changePoint(buckets: DataFrame, orderCol: String,
                  valueCol: String, minSegment: Int = 3,
                  threshold: Double = 5.0): DataFrame = {
    require(minSegment >= 2,
      s"minSegment must be >= 2 (a variance needs 2 points), got " +
        s"$minSegment")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val w = Window.orderBy("_ord")
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val all = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // a null metric would null the prefix sums — t_stat/means all null
    // and the orderBy picks arbitrarily among null-t splits — so
    // nullness refuses inside the evaluated expression (the
    // bucket_correlation/rateAgg discipline)
    val v = when(col(valueCol).isNull,
      raise_error(lit(s"change_point: null $valueCol — a null metric " +
        "would null every prefix sum and make the split arbitrary; " +
        "fill or filter the bucket frame first")).cast("double"))
      .otherwise(col(valueCol).cast("double"))
    val pre = buckets
      .select(col(orderCol).as("_ord"), v.as("_v"))
      .withColumn("_i", row_number().over(w).cast("double"))
      .withColumn("_next",
        lead(col("_ord").cast("string"), 1).over(w))
      .withColumn("_cs", sum(col("_v")).over(run))
      .withColumn("_css", sum(col("_v") * col("_v")).over(run))
      .withColumn("_nn", count(lit(1)).over(all).cast("double"))
      .withColumn("_ts", sum(col("_v")).over(all))
      .withColumn("_tss", sum(col("_v") * col("_v")).over(all))
    val nL = col("_i")
    val nR = col("_nn") - col("_i")
    val mL = col("_cs") / nL
    val mR = (col("_ts") - col("_cs")) / nR
    val varL = (col("_css") - col("_cs") * col("_cs") / nL) /
      (nL - 1.0)
    val varR = ((col("_tss") - col("_css")) -
      (col("_ts") - col("_cs")) * (col("_ts") - col("_cs")) / nR) /
      (nR - 1.0)
    val t = (mL - mR) /
      sqrt(greatest(varL / nL + varR / nR, lit(1e-12)))
    val r6 = (c: Column) => graft.queries.QueryUtil.rhu(c, 6)
    pre.filter(nL >= minSegment && nR >= minSegment)
      .withColumn("_t", t)
      .orderBy(abs(col("_t")).desc, col("_i").asc)
      .limit(1)
      .select(col("_next").as("change_point"),
        when(abs(col("_t")) >= threshold, lit("step_change"))
          .otherwise(lit("stationary")).as("type"),
        r6(col("_t")).as("t_stat"),
        r6(mL).as("left_mean"), r6(mR).as("right_mean"))
  }
}
