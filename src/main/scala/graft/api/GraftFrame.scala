package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import graft.functions.EsMatch

/** The user-facing DataFrame facade: eland's lazy pandas-shaped API
  * (eland/dataframe.py) re-expressed over an immutable Spark
  * `DataFrame` plus a pinned surrogate row-id column.
  *
  * Eland's row identity is the ES `_id` / `_doc` sort
  * (eland/index.py:24-77); Spark has no implicit row order, so every
  * frame carries `idCol` — an existing unique key column, or one
  * minted at ingest — and head/tail/sample determinism hangs off it
  * (SURVEY.md §7.5 known-hard #1).
  *
  * Everything stays lazy: each method returns a new facade over a new
  * logical plan; Catalyst handles pushdown/pruning/limit-merging that
  * eland hand-rolls in its task list (eland/operations.py:1461-1482).
  */
class GraftFrame private (val df: DataFrame, val idCol: String,
                          val esTypeOverrides: Map[String, String]) {

  private def wrap(d: DataFrame): GraftFrame =
    new GraftFrame(d, idCol, esTypeOverrides)

  // ---- schema view (eland/field_mappings.py capability matrix) -----
  def columns: Seq[String] = df.columns.toSeq

  /** (column, pandas dtype) pairs — eland `df.dtypes`. */
  def dtypes: Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => f.name -> PdDtypes.pdDtype(f.dataType))

  def schema: StructType = df.schema

  /** Searchable/aggregatable capability matrix — eland
    * `es_field_mappings` / FieldMappings (eland/field_mappings.py:
    * 431-458). String columns default to analyzed "text" with a
    * `.keyword` aggregatable alias; pin exact-match columns via
    * [[withEsDtype]].
    */
  def fieldCaps: Seq[FieldCaps.FieldCapability] =
    FieldCaps.matrix(df.schema, esTypeOverrides)

  /** (column, es dtype) pairs — eland `df.es_dtypes`. */
  def esDtypes: Seq[(String, String)] = fieldCaps.map(c => c.column -> c.esDtype)

  /** Pin a column's ES dtype ("keyword", "text", "text_no_keyword") —
    * the mapping knowledge eland reads from the index that parquet
    * can't carry.
    */
  def withEsDtype(colName: String, esDtype: String): GraftFrame = {
    require(df.columns.contains(colName), s"unknown column $colName")
    new GraftFrame(df, idCol, esTypeOverrides + (colName -> esDtype))
  }

  // ---- projections (SURVEY §2.2) -----------------------------------
  def select(cols: Seq[String]): GraftFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")
    wrap(df.select(cols.map(col): _*))
  }

  def drop(cols: Seq[String], errors: String = "raise"): GraftFrame = {
    val missing = cols.filterNot(df.columns.contains)
    if (errors == "raise")
      require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")
    wrap(df.drop(cols: _*))
  }

  def rename(mapping: Map[String, String]): GraftFrame = {
    val renamed = mapping.foldLeft(df) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to) }
    // remap pinned ES dtypes along with the columns they describe —
    // otherwise a stale key can attach to a column that later takes
    // the old name
    val remapped = esTypeOverrides.map { case (k, v) =>
      mapping.getOrElse(k, k) -> v }
    new GraftFrame(renamed, mapping.getOrElse(idCol, idCol), remapped)
  }

  /** eland `select_dtypes(include=...)` (eland/dataframe.py:1409-1443). */
  def selectDtypes(include: Set[String]): GraftFrame =
    select(dtypes.filter(kv => include(kv._2)).map(_._1))

  /** eland `filter(axis=columns, like/regex/items)`
    * (eland/dataframe.py:2078-2152).
    */
  def filterColumns(items: Seq[String] = Nil, like: String = null,
                    regex: String = null): GraftFrame = {
    val keep =
      if (items.nonEmpty) df.columns.filter(items.contains)
      else if (like != null) df.columns.filter(_.contains(like))
      else if (regex != null) df.columns.filter(_.matches(regex))
      else df.columns
    wrap(df.select(keep.map(col).toSeq: _*))
  }

  def apply(name: String): GraftSeries = new GraftSeries(this, name)

  /** eland `df.get(key, default)` (eland/dataframe.py:2038-2076). */
  def get(name: String): Option[GraftSeries] =
    if (df.columns.contains(name)) Some(apply(name)) else None

  def withColumn(name: String, c: Column): GraftFrame =
    wrap(df.withColumn(name, c))

  // ---- filters (SURVEY §2.3) ---------------------------------------
  def where(pred: Column): GraftFrame = wrap(df.filter(pred))

  /** eland `query(expr)` — Spark's SQL parser is the evaluator
    * (eland/dataframe.py:1991-2036).
    */
  def query(sqlPredicate: String): GraftFrame = wrap(df.filter(sqlPredicate))

  /** eland `es_match` (eland/query_compiler.py:419-488). Like the
    * reference, refuses non-text columns by default — matching an
    * unanalyzed keyword/numeric column "works" mechanically but
    * diverges from ES analysis semantics; pass
    * `matchOnlyTextFields = false` to match anyway (the reference's
    * lenient mode).
    */
  def esMatch(query: String, cols: Seq[String],
              operator: String = "or", fuziness: Option[Int] = None,
              matchOnlyTextFields: Boolean = true,
              analyzer: String = "standard"): GraftFrame = {
    require(cols.nonEmpty, "columns can't be empty")
    graft.functions.EnglishMinimalStem.requireKnown(analyzer)
    if (matchOnlyTextFields) {
      val caps = fieldCaps.map(c => c.column -> c.esDtype).toMap
      val nonText = cols.filter(c => caps.getOrElse(c, "object") != "text")
      require(nonText.isEmpty,
        s"Attempting to run esMatch() on non-text fields (" +
          nonText.map(c => s"$c=${caps.getOrElse(c, "?")}").mkString(", ") +
          ") means that these fields may not be analyzed properly. " +
          "Pin them as text via withEsDtype or pass matchOnlyTextFields=false " +
          "to match anyways")
    }
    // operator and fuzziness COMPOSE (as in ES and the es_query DSL
    // path): and+fuzzy requires every term to fuzzy-hit per field
    val pred = fuziness match {
      case Some(f) if operator == "and" =>
        cols.map(c => EsMatch.matchFuzzyAll(col(c), query, f, analyzer))
          .foldLeft(lit(false))(_ || _)
      case Some(f) =>
        cols.map(c => EsMatch.matchFuzzy(col(c), query, f, analyzer))
          .foldLeft(lit(false))(_ || _)
      case None if operator == "and" =>
        cols.map(c => EsMatch.matchAll(col(c), query, analyzer))
          .foldLeft(lit(false))(_ || _)
      case None => EsMatch.multiMatch(cols.map(col), query, analyzer)
    }
    wrap(df.filter(pred))
  }

  /** eland `es_query(dict)` — raw ES query-DSL JSON AND-merged into the
    * frame's filter (eland/dataframe.py:736-790). Translates the
    * engine-independent DSL subset (bool/term/terms/range/match/
    * match_phrase/wildcard/prefix/regexp/exists/ids) via
    * [[graft.functions.EsQueryDsl]]; untranslatable clauses raise.
    * match/match_phrase fields go through the same non-text guard as
    * [[esMatch]] — both front doors enforce one capability contract.
    */
  def esQuery(queryJson: String,
              matchOnlyTextFields: Boolean = true,
              synonyms: Seq[String] = Nil,
              termsLookup: Option[graft.functions.EsQueryDsl.TermsLookup] =
                None): GraftFrame = {
    val requireText = requireTextFn(matchOnlyTextFields)
    wrap(df.filter(
      graft.functions.EsQueryDsl.toColumn(queryJson, idCol, requireText,
        synonyms, termsLookup)))
  }

  /** [[esQuery]] with QUERY-context (scoring) semantics: the matching
    * rows plus a `_score` column — `match` clauses earn corpus-stats
    * BM25, `bool` must/should sum, `dis_max` takes the best branch,
    * `constant_score` its boost; see
    * [[graft.functions.EsScoredQuery]] for the exact contract. The
    * reference leaves ranking server-side (eland/filter.py:182-185
    * passes the dict through); this is the in-engine equivalent.
    *
    * Leaf-scoring caveat for relevance ports: every OTHER leaf
    * (`term`, `terms`, `range`, `wildcard`, …) gates like the filter
    * face and contributes a CONSTANT 1.0 when it matches, where ES
    * would hand several of them index-statistics scores (a bare
    * `term` earns idf). Those numbers are engine-dependent by
    * definition, so the portable `constant_score` semantics is the
    * deliberate default — a query that RANKS by bare `term`/`range`
    * clauses will order differently than ES; wrap text lookups in
    * `match` if BM25 ranking is the intent, or pass
    * `termIdf = true` to give `term` leaves ES's keyword-field
    * number (boost × idf — norms off, tf 1; `terms`/`range` stay
    * constant, which IS ES's behavior for those).
    */
  def esQueryScored(queryJson: String,
                    matchOnlyTextFields: Boolean = true,
                    termIdf: Boolean = false,
                    synonyms: Seq[String] = Nil): GraftFrame = {
    val requireText = requireTextFn(matchOnlyTextFields)
    wrap(graft.functions.EsScoredQuery.scoredFrame(df, idCol, queryJson,
      requireText, termIdf = termIdf, synonyms = synonyms))
  }

  /** ES `rescore` over [[esQueryScored]]: the global top `windowSize`
    * hits of `queryJson` re-rank under `rescoreJson` (see
    * [[graft.functions.EsScoredQuery.rescoredFrame]] for the exact
    * window/combine/non-match semantics and the per-shard-window
    * delta).
    */
  def esQueryRescored(queryJson: String, rescoreJson: String,
                      windowSize: Int, queryWeight: Double = 1.0,
                      rescoreWeight: Double = 1.0,
                      scoreMode: String = "total",
                      matchOnlyTextFields: Boolean = true): GraftFrame = {
    wrap(graft.functions.EsScoredQuery.rescoredFrame(df, idCol,
      queryJson, rescoreJson, windowSize, queryWeight, rescoreWeight,
      scoreMode, requireTextFn(matchOnlyTextFields)))
  }

  /** Row drop by id (eland/operations.py:1396-1427). */
  def dropIds(ids: Seq[Any]): GraftFrame =
    wrap(df.filter(!col(idCol).isin(ids: _*)))

  /** Keep rows by id, REORDERED to the given list — eland
    * `filter(items=..., axis=index)` reindexes the result to the items
    * order (eland/tasks.py:223-289, eland/operations.py:1396-1427).
    * Implemented as a broadcast join against an ordinal-tagged id list
    * (the list is user-supplied and driver-sized, so broadcasting it is
    * the scale-correct shape — no shuffle of the fact side) followed by
    * a sort on the ordinal. Ids absent from the frame are dropped
    * (filter semantics, not reindex-NaN); duplicate ids duplicate rows.
    * The items order holds for a direct collect of this frame; later
    * facade ops re-sort by `idCol` as usual.
    */
  def keepIds(ids: Seq[Any]): GraftFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idType = df.schema(df.schema.fieldIndex(idCol)).dataType
    // ordinal column name must not collide with user data (CSV-born
    // frames can contain anything)
    val ord = Iterator.from(0).map(i => s"_graft_ord$i")
      .find(n => !df.columns.contains(n)).get
    // values travel as strings and are cast back to the id type, which
    // sidesteps Seq[Any] encoder issues for mixed numeric literals
    val ordered = ids.map(String.valueOf).zipWithIndex
      .toDF("_kid", ord)
      .select(col("_kid").cast(idType).as(idCol), col(ord).cast("long").as(ord))
    wrap(df.join(broadcast(ordered), Seq(idCol))
      .orderBy(col(ord)).drop(ord))
  }

  // ---- limits / sampling (SURVEY §2.5) -----------------------------
  /** Deterministic first-n by row id (eland HeadTask,
    * eland/tasks.py:78-122).
    */
  def head(n: Int): GraftFrame = wrap(df.orderBy(col(idCol).asc).limit(n))

  /** Deterministic last-n: reverse-sort + limit + cheap re-sort of n
    * rows (eland TailTask, eland/tasks.py:125-185).
    */
  def tail(n: Int): GraftFrame =
    wrap(df.orderBy(col(idCol).desc).limit(n).orderBy(col(idCol).asc))

  /** Seeded exact-n sample. eland uses a seeded random_score over
    * `_seq_no` (eland/filter.py:193-202); here the score is a seeded
    * per-row hash of the id, so the sample is deterministic under any
    * partitioning/cluster size — a property rand(seed) lacks. Either
    * way the plan is TakeOrderedAndProject (per-partition top-n +
    * driver merge), never a global sort.
    *
    * `portable = true` draws by the md5 key of
    * [[graft.operators.Sampling.hashKey]] instead of xxhash64: the
    * exact drawn ID SET is then replayable by any engine with md5
    * (`ORDER BY md5('<seed>:' || id)`) — the audit property a
    * training-data pipeline wants at system boundaries. The xxhash64
    * default stays the interior fast path (one 64-bit mix per row vs
    * an md5).
    */
  def sample(n: Int, seed: Long, portable: Boolean = false): GraftFrame = {
    val key =
      if (portable) graft.operators.Sampling.hashKey(col(idCol), seed)
      else xxhash64(col(idCol), lit(seed))
    wrap(df.orderBy(key, col(idCol)).limit(n).orderBy(col(idCol).asc))
  }

  /** Fractional sample — eland `sample(frac=..)`: exact
    * round(frac*len) rows, same seeded determinism.
    *
    * NOTE: this runs a `count()` job AT CALL TIME — the only eager
    * method on the otherwise-lazy facade. Exact-n sampling needs the
    * row count (the reference issues the same eager `_count` request,
    * eland/etl.py sample path), and a metadata-only parquet count is
    * cheap; use `sample(n, seed)` if you already know n and need full
    * laziness.
    */
  def sampleFrac(frac: Double, seed: Long): GraftFrame = {
    require(frac >= 0 && frac <= 1, s"frac out of range: $frac")
    sample(math.round(frac * len()).toInt, seed)
  }

  /** pandas `df.info()`-style summary: dtypes + non-null counts. */
  def info(): String = {
    val counts = countPerColumn().head()
    val total = len()
    val lines = dtypes.zipWithIndex.map { case ((name, dt), i) =>
      f"$i%3d  $name%-24s ${counts.getLong(i)}%9d non-null  $dt"
    }
    (s"GraftFrame: $total rows, ${columns.size} columns (id: $idCol)" +:
      lines).mkString("\n")
  }

  // ---- metric aggregations (SURVEY §2.4) ---------------------------
  private def aggTargets(numericOnly: Option[Boolean], agg: String): Seq[StructField] =
    numericOnly match {
      case Some(true) =>
        df.schema.fields.toSeq.filter(f => PdDtypes.isNumeric(f.dataType) ||
          f.dataType == BooleanType)
      case Some(false) => df.schema.fields.toSeq
      case None =>
        // tri-state default: silently keep only compatible fields
        // (eland/ndframe.py:192-239)
        df.schema.fields.toSeq.filter(f => PdDtypes.aggCompatible(agg, f.dataType))
    }

  import Names.bq

  private[api] def aggExpr(agg: String, f: StructField): Column = {
    val c = f.dataType match {
      case BooleanType => col(f.name).cast("int")
      case _           => col(f.name)
    }
    val temporal = PdDtypes.isTemporal(f.dataType)
    val e = agg match {
      case "count"   => F.count(c)
      case "min"     => F.min(c)
      case "max"     => F.max(c)
      // Spark's avg/median reject timestamps; eland averages epoch-ms
      // (eland/operations.py:951-953) — do the same via unix_millis
      case "mean" if temporal =>
        timestamp_millis(floor(avg(unix_millis(c.cast("timestamp"))))
          .cast("long")).cast(f.dataType)
      case "median" if temporal =>
        timestamp_millis(floor(
          expr(s"median(unix_millis(cast(${bq(f.name)} as timestamp)))"))
          .cast("long")).cast(f.dataType)
      case "mean"    => avg(c)
      case "sum"     => F.sum(c)
      case "std"     => stddev_samp(c)
      case "var"     => var_samp(c)
      case "median"  => expr(s"median(${bq(f.name)})")
      case "nunique" => countDistinct(c)
      // the reference's nunique/median are approximate (HLL++/TDigest,
      // eland/operations.py:1118-1123); exact is our default, these are
      // the scale-path variants with the same contract
      case "nunique_approx" => approx_count_distinct(c)
      case "median_approx" =>
        expr(s"percentile_approx(${bq(f.name)}, 0.5, 10000)")
      case "skew"    => skewness(c)
      case "sem"     => stddev_samp(c) / sqrt(F.count(c))
      case other     => throw new IllegalArgumentException(s"agg: $other")
    }
    e.as(s"${f.name}_$agg")
  }

  /** Multi-agg matrix — eland `df.aggregate([...])`
    * (eland/operations.py:308-418); Spark computes every (col, agg)
    * cell in one pass of one HashAggregate.
    */
  def aggregate(aggs: Seq[String],
                numericOnly: Option[Boolean] = None): DataFrame = {
    val exprs = for {
      agg <- aggs
      f   <- aggTargets(numericOnly, agg)
    } yield aggExpr(agg, f)
    require(exprs.nonEmpty, "no compatible columns for requested aggs")
    df.agg(exprs.head, exprs.tail: _*)
  }

  def min(numericOnly: Option[Boolean] = None): DataFrame = aggregate(Seq("min"), numericOnly)
  def max(numericOnly: Option[Boolean] = None): DataFrame = aggregate(Seq("max"), numericOnly)
  def mean(numericOnly: Option[Boolean] = None): DataFrame = aggregate(Seq("mean"), numericOnly)
  def sum(numericOnly: Option[Boolean] = None): DataFrame = aggregate(Seq("sum"), numericOnly)
  def std(numericOnly: Option[Boolean] = None): DataFrame = aggregate(Seq("std"), numericOnly)
  def varSamp(numericOnly: Option[Boolean] = None): DataFrame = aggregate(Seq("var"), numericOnly)
  def median(numericOnly: Option[Boolean] = None): DataFrame = aggregate(Seq("median"), numericOnly)
  def nunique(): DataFrame = aggregate(Seq("nunique"), Some(false))

  /** Per-column quantiles (eland/operations.py:760-794).
    *
    * Cardinality note: this is the fused one-pass form — every (col, q)
    * cell in one HashAggregate — using Spark's exact `percentile`,
    * whose agg state is an O(distinct-values) count map. The right
    * shape for enum-ish/bounded columns; for a high-cardinality column
    * at corpus scale use [[graft.operators.Quantiles.viaSort]]
    * (bit-equal, O(1) state, one sort job per column) — the hybrid the
    * a7/a17 gate queries demonstrate.
    */
  def quantile(qs: Seq[Double]): DataFrame = {
    val fields = df.schema.fields.toSeq
      .filter(f => PdDtypes.isNumeric(f.dataType))
    val exprs = for { f <- fields; q <- qs } yield
      expr(s"percentile(${bq(f.name)}, $q)").as(s"${f.name}_q$q")
    df.agg(exprs.head, exprs.tail: _*)
  }

  /** ES `percentile_ranks` — the inverse of [[quantile]], reached in
    * eland via the raw-DSL aggregation passthrough: for each fixed
    * value, the percent of non-null observations <= it. EXACT (a
    * count ratio in one pass — the reference's TDigest interpolates;
    * this is the engine-independent number that sketch approximates).
    * One row, one `<col>_rank_<value>` column per value; values
    * outside the observed range read 0 / 100 like ES's clamped tails.
    */
  def percentileRanks(colName: String, values: Seq[Double]): DataFrame = {
    require(values.nonEmpty, "percentileRanks needs at least one value")
    require(values.distinct == values,
      s"duplicate probe values in $values (would collide column names)")
    val c = col(colName)
    def key(v: Double) =
      v.toString.replace('.', '_').replace('-', 'm')
    val exprs = values.map(v =>
      (F.sum(F.when(c <= v, 1L).otherwise(0L)) * 100.0 / F.count(c))
        .as(s"${colName}_rank_${key(v)}"))
    df.agg(exprs.head, exprs.tail: _*)
  }

  /** Median absolute deviation, exact two-pass (eland's is TDigest,
    * eland/operations.py:1120-1121). Uses the builtin count-map
    * median; for high-cardinality columns chain
    * [[graft.operators.Quantiles.viaSort]] twice instead (the a9 gate
    * shape).
    */
  def mad(colName: String): DataFrame = {
    val med = df.agg(expr(s"median(${bq(colName)})").as("_m"))
    df.crossJoin(broadcast(med))
      .agg(expr(s"median(abs(${bq(colName)} - _m))").as(s"${colName}_mad"))
  }

  /** eland `describe()` (eland/operations.py:1189-1216). One plan, one
    * pass; the three percentile cells use the builtin count-map
    * aggregate (see the cardinality note on [[quantile]] — the a17
    * gate shows the viaSort hybrid for high-cardinality columns).
    */
  def describe(): DataFrame = {
    val fields = df.schema.fields.toSeq.filter(f => PdDtypes.isNumeric(f.dataType))
    require(fields.nonEmpty, "describe: no numeric columns")
    val exprs: Seq[Column] = fields.flatMap { f =>
      val n = f.name
      Seq(
        count(quoted(n)).cast("double").as(s"${n}__count"),
        avg(quoted(n)).as(s"${n}__mean"),
        stddev_samp(quoted(n)).as(s"${n}__std"),
        org.apache.spark.sql.functions.min(quoted(n)).cast("double").as(s"${n}__min"),
        expr(s"percentile(${bq(n)}, 0.25)").as(s"${n}__25%"),
        expr(s"percentile(${bq(n)}, 0.5)").as(s"${n}__50%"),
        expr(s"percentile(${bq(n)}, 0.75)").as(s"${n}__75%"),
        org.apache.spark.sql.functions.max(quoted(n)).cast("double").as(s"${n}__max"))
    }
    val a = df.agg(exprs.head, exprs.tail: _*)
    val stats = Seq("count", "mean", "std", "min", "25%", "50%", "75%", "max")
    a.select(explode(array(stats.map { st =>
      struct(lit(st).as("stat") +:
        fields.map(f => quoted(s"${f.name}__$st").as(f.name)): _*)
    }: _*)).as("r")).select("r.*")
  }

  // ---- value_counts / mode / unique / hist / idx (A11-A15) ---------
  def valueCounts(colName: String, n: Int = 10): DataFrame =
    df.groupBy(colName).agg(count(lit(1)).cast("long").as("count"))
      .orderBy(col("count").desc, col(colName))
      .limit(n)

  /** Mode with ties kept, capped at esSize values like the reference's
    * terms-agg size (eland/operations.py:665-696, es_size param).
    */
  def mode(colName: String, esSize: Int = Int.MaxValue): DataFrame = {
    val counts = df.groupBy(colName).agg(count(lit(1)).as("_c"))
    val mx = counts.agg(org.apache.spark.sql.functions.max(col("_c")).as("_mc"))
    counts.crossJoin(broadcast(mx)).filter(col("_c") === col("_mc"))
      .select(colName).orderBy(colName).limit(esSize)
  }

  def unique(colName: String): DataFrame =
    df.select(colName).distinct().orderBy(colName)

  /** Two-phase histogram (eland/operations.py:470-556). */
  def hist(colName: String, bins: Int): DataFrame = {
    val mm = df.agg(
      org.apache.spark.sql.functions.min(col(colName)).as("_mn"),
      org.apache.spark.sql.functions.max(col(colName)).as("_mx"))
    df.crossJoin(broadcast(mm))
      .select(
        // constant column (min==max) would divide by zero under ANSI;
        // every row then belongs to bin 0
        when(col("_mx") === col("_mn"), lit(0L)).otherwise(least(
          floor((col(colName) - col("_mn")) / ((col("_mx") - col("_mn")) / bins.toDouble)),
          lit((bins - 1).toLong))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).cast("long").as("count"))
      .orderBy("bin")
  }

  /** Histogram with explicit bin edges — the shape eland's plotting
    * sidecar consumes (bins + weights, eland/plotting/_matplotlib/
    * hist.py:42-156).
    */
  def histogram(colName: String, bins: Int): DataFrame = {
    val mm = df.agg(
      org.apache.spark.sql.functions.min(col(colName)).cast("double").as("_mn"),
      org.apache.spark.sql.functions.max(col(colName)).cast("double").as("_mx"))
    df.crossJoin(broadcast(mm))
      .select(col("_mn"), col("_mx"),
        when(col("_mx") === col("_mn"), lit(0L)).otherwise(least(
          floor((col(colName) - col("_mn")) / ((col("_mx") - col("_mn")) / bins.toDouble)),
          lit((bins - 1).toLong))).as("bin"))
      .groupBy("bin", "_mn", "_mx")
      .agg(count(lit(1)).cast("long").as("count"))
      .select(col("bin"),
        (col("_mn") + col("bin") * (col("_mx") - col("_mn")) / bins.toDouble).as("bin_start"),
        (col("_mn") + (col("bin") + 1) * (col("_mx") - col("_mn")) / bins.toDouble).as("bin_end"),
        col("count"))
      .orderBy("bin")
  }

  /** eland-style capped text render: head/tail halves around an
    * ellipsis once the frame exceeds `maxRows` (DEFAULT_NUM_ROWS_
    * DISPLAYED = 60, eland/common.py:38), with the pandas footer.
    */
  def renderString(maxRows: Int = 60): String = {
    val n = len()
    val cols = df.columns
    val rows: Seq[Seq[String]] =
      if (n <= maxRows) {
        head(maxRows).df.collect().toSeq
          .map(r => cols.indices.map(i => String.valueOf(r.get(i))))
      } else {
        val h = head(maxRows / 2).df.collect().toSeq
        val t = tail(maxRows / 2).df.collect().toSeq
        (h.map(r => cols.indices.map(i => String.valueOf(r.get(i)))) :+
          cols.indices.map(_ => "...")) ++
          t.map(r => cols.indices.map(i => String.valueOf(r.get(i))))
      }
    val widths = cols.indices.map(i =>
      (cols(i).length +: rows.map(_(i).length)).max)
    def fmt(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c.reverse.padTo(w, ' ').reverse }
        .mkString("  ")
    (fmt(cols.toSeq) +: rows.map(fmt)).mkString("\n") +
      s"\n\n[$n rows x ${cols.length} columns]"
  }

  /** idxmax/idxmin (eland/operations.py:207-254): id of the extreme
    * row, smallest id on ties, in one partial-aggregating pass via the
    * native [[graft.plans.ExtremumBy]] aggregate (works for string or
    * otherwise non-negatable id columns and arbitrary column names).
    */
  private def quoted(name: String): Column = col(bq(name))
  def idxmax(colName: String): DataFrame =
    df.agg(graft.plans.ExtremumBy.idxmax(quoted(colName), quoted(idCol)).as("idxmax"))
  def idxmin(colName: String): DataFrame =
    df.agg(graft.plans.ExtremumBy.idxmin(quoted(colName), quoted(idCol)).as("idxmin"))

  /** eland `df.idxmax(axis=0)` — idxmax over EVERY numeric column at
    * once, one (column, id) row per column (eland/dataframe.py:1927).
    * All ExtremumBy cells compute in a single HashAggregate pass — one
    * scan regardless of column count.
    */
  def idxmaxAll(): DataFrame = idxAll(findMax = true, "idxmax")

  /** eland `df.idxmin(axis=0)` (eland/dataframe.py:1959). */
  def idxminAll(): DataFrame = idxAll(findMax = false, "idxmin")

  private def idxAll(findMax: Boolean, alias: String): DataFrame = {
    val fields = df.schema.fields.toSeq
      .filter(f => PdDtypes.isNumeric(f.dataType) && f.name != idCol)
    require(fields.nonEmpty, s"$alias: no numeric columns")
    val exprs = fields.map { f =>
      (if (findMax) graft.plans.ExtremumBy.idxmax(quoted(f.name), quoted(idCol))
       else graft.plans.ExtremumBy.idxmin(quoted(f.name), quoted(idCol)))
        .as(f.name)
    }
    df.agg(exprs.head, exprs.tail: _*)
      .select(explode(array(fields.map(f =>
        struct(lit(f.name).as("column"), quoted(f.name).as(alias))): _*)).as("r"))
      .select("r.*")
  }

  def len(): Long = df.count()

  /** eland `df.shape` (rows via the count fast path, cols from schema). */
  def shape: (Long, Int) = (len(), df.columns.length)
  def ndim: Int = 2
  def size(): Long = len() * df.columns.length
  def isEmpty(): Boolean = df.isEmpty

  /** Per-column non-null counts — eland `df.count()` returns a Series
    * indexed by column (eland/ndframe.py metric agg path).
    */
  def countPerColumn(): DataFrame = {
    val exprs = df.columns.toSeq.map(c =>
      F.count(col(c)).cast("long").as(c))
    df.agg(exprs.head, exprs.tail: _*)
  }

  // ---- groupby (SURVEY §2.4 A19-A21) -------------------------------
  def groupby(by: Seq[String], dropna: Boolean = true): GraftGroupBy =
    new GraftGroupBy(this, by, dropna)

  /** Time-bucketed groupby — eland's date_histogram composite source
    * (eland/query.py:195-211): truncate the time column to `interval`
    * ("year"/"quarter"/"month"/"week"/"day"/"hour"/"minute") and group
    * on the bucket (plus optional extra keys).
    */
  def resample(timeCol: String, interval: String,
               extraBy: Seq[String] = Nil): GraftGroupBy = {
    val bucket = s"${timeCol}_$interval"
    val withBucket = wrap(df.withColumn(bucket,
      date_trunc(interval, col(timeCol))))
    new GraftGroupBy(withBucket, bucket +: extraBy, dropna = true)
  }

  // ---- sinks (SURVEY §2.1 S4-S6) -----------------------------------
  def toCsv(path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
  def toJson(path: String): Unit = df.write.mode("overwrite").json(path)
  def toParquet(path: String): Unit = df.write.mode("overwrite").parquet(path)
  /** Columnar sink beyond the reference's CSV/JSON (ORC ships in
    * Spark, schema travels with the file — no re-read schema needed).
    */
  def toOrc(path: String): Unit = df.write.mode("overwrite").orc(path)

  /** Driver-side streamed iteration (eland iterrows/itertuples,
    * eland/dataframe.py:1501-1616).
    */
  def toLocalIterator(): java.util.Iterator[org.apache.spark.sql.Row] =
    df.toLocalIterator()

  /** Plan inspection — eland `es_info` (eland/operations.py:1500-1518). */
  def esInfo(): String = df.queryExecution.explainString(
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** The ES `_validate/query` API: parse-and-plan WITHOUT executing —
    * `(valid, explanation)` where the explanation is the compiled
    * predicate's expression string on success (the API's
    * `explain: true` response) or the parse/analysis error on
    * failure. Compiling the DSL to a Column IS the validation the
    * endpoint performs; nothing runs (the scored face stays lazy by
    * contract, spec-pinned).
    */
  def esValidateQuery(queryJson: String,
                      matchOnlyTextFields: Boolean = true,
                      synonyms: Seq[String] = Nil)
      : (Boolean, String) =
    try {
      val c = graft.functions.EsQueryDsl.toColumn(queryJson, idCol,
        requireTextFn(matchOnlyTextFields), synonyms)
      // resolve against THIS frame's schema — an unknown field is an
      // analysis error exactly as ES reports it
      df.filter(c).queryExecution.analyzed
      (true, c.toString)
    } catch {
      case e: Exception => (false, e.getMessage)
    }

  private def requireTextFn(matchOnlyTextFields: Boolean)
      : String => Unit =
    if (!matchOnlyTextFields) _ => ()
    else { field =>
      val es = fieldCaps.find(_.column == field).map(_.esDtype)
        .getOrElse("object")
      require(es == "text",
        s"es_query match on non-text field ($field=$es); pin it as " +
          "text via withEsDtype or pass matchOnlyTextFields=false")
    }
}

object GraftFrame {

  /** Wrap a DataFrame whose `idCol` is an existing unique key. */
  def apply(df: DataFrame, idCol: String): GraftFrame = {
    require(df.columns.contains(idCol), s"id column $idCol missing")
    new GraftFrame(df, idCol, Map.empty)
  }

  /** Wrap a keyless DataFrame, minting a stable surrogate id. The id is
    * a content hash of the full row — deterministic across runs and
    * partitionings (unlike monotonically_increasing_id), at the cost of
    * colliding for fully duplicate rows.
    */
  def withMintedId(df: DataFrame, idName: String = "_row_id"): GraftFrame = {
    val hashed = df.withColumn(idName, xxhash64(df.columns.map(col).toSeq: _*))
    new GraftFrame(hashed, idName, Map.empty)
  }

  def parquet(spark: SparkSession, path: String, idCol: String): GraftFrame =
    apply(spark.read.parquet(path), idCol)
}
