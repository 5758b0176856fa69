package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class FacadeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def orders: GraftFrame =
    GraftFrame(Tables.load(spark, TestSpark.sfDir, "orders"), "o_orderkey")

  test("dtypes renders pandas-style names") {
    val dt = orders.dtypes.toMap
    assert(dt("o_orderkey") == "int64")
    assert(dt("o_totalprice") == "float64")
    assert(dt("o_orderstatus") == "object")
    assert(dt("o_orderdate") == "datetime64[ns]")
  }

  test("head/tail are deterministic and ordered by id") {
    val h = orders.head(5).df.collect().map(_.getLong(0)).toSeq
    assert(h == h.sorted && h.size == 5)
    val t = orders.tail(5).df.collect().map(_.getLong(0)).toSeq
    assert(t == t.sorted && t.size == 5)
    val mx = orders.df.agg(max("o_orderkey")).head().getLong(0)
    assert(t.last == mx)
  }

  test("sample is seeded-deterministic and exact-n") {
    val a = orders.sample(20, seed = 7).df.collect().map(_.getLong(0)).toSeq
    val b = orders.sample(20, seed = 7).df.collect().map(_.getLong(0)).toSeq
    val c = orders.sample(20, seed = 8).df.collect().map(_.getLong(0)).toSeq
    assert(a == b && a.size == 20)
    assert(a != c) // different seed, different rows (overwhelmingly)
    // the portable md5 draw shares every contract (exact-n, seeded
    // determinism, different seed => different rows) and matches the
    // hand-computed md5 order on the ids it drew
    val p = orders.sample(20, seed = 7, portable = true).df
      .collect().map(_.getLong(0)).toSeq
    val p2 = orders.sample(20, seed = 7, portable = true).df
      .collect().map(_.getLong(0)).toSeq
    assert(p == p2 && p.size == 20 && p != a)
    val allIds = orders.df.select("o_orderkey").collect().map(_.getLong(0))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = allIds.sortBy(id => (md5hex(s"7:$id"), id)).take(20)
      .sorted.toSeq
    assert(p == expect)
  }

  test("select validates unknown columns; drop honors errors=ignore") {
    assertThrows[IllegalArgumentException](orders.select(Seq("nope")))
    assert(orders.drop(Seq("nope"), errors = "ignore").columns ==
      orders.columns)
  }

  test("aggregate tri-state prunes incompatible columns silently") {
    val out = orders.aggregate(Seq("sum"))
    // strings and timestamps are not sum-compatible -> pruned
    assert(out.columns.toSet ==
      Set("o_orderkey_sum", "o_custkey_sum", "o_totalprice_sum"))
  }

  test("aggregate numericOnly=false over strings fails loudly") {
    assertThrows[Exception] {
      orders.select(Seq("o_orderstatus"))
        .aggregate(Seq("sum"), Some(false)).collect()
    }
  }

  test("timestamp mean goes through unix-millis path") {
    val r = orders.select(Seq("o_orderdate")).aggregate(Seq("mean"), None)
    val v = r.head()
    assert(!v.isNullAt(0))
  }

  test("groupby dropna filters null keys; dropna=false keeps them") {
    val f = orders.withColumn("pri", expr("nullif(o_orderpriority, '1-URGENT')"))
    val kept = f.groupby(Seq("pri"), dropna = false).size().count()
    val dropped = f.groupby(Seq("pri"), dropna = true).size().count()
    assert(kept == dropped + 1)
  }

  test("mode keeps all tied values, es_size caps them") {
    import spark.implicits._
    val df = Seq(1, 1, 2, 2, 3).toDF("v")
    val f = GraftFrame.withMintedId(df)
    assert(f.mode("v").collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(f.mode("v", esSize = 1).collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("sampleFrac sizes by fraction; info renders dtypes and counts") {
    val s = orders.sampleFrac(0.1, seed = 3)
    assert(s.len() == math.round(orders.len() * 0.1))
    val i = orders.info()
    assert(i.contains("o_totalprice") && i.contains("float64") &&
      i.contains(s"${orders.len()} rows"))
  }

  test("reflected series operators put the scalar on the left") {
    import org.apache.spark.sql.functions._
    val o = orders
    val bad = o.df.select(
      (o.df.col("o_totalprice") * (-1.0) + 100.0).as("expect"),
      o("o_totalprice").rsub(100.0).as("got"))
      .filter(col("expect") =!= col("got")).count()
    assert(bad == 0)
  }

  test("get returns Some for known columns, None otherwise; iterator streams rows") {
    assert(orders.get("o_totalprice").isDefined)
    assert(orders.get("nope").isEmpty)
    val it = orders.head(3).toLocalIterator()
    var n = 0
    while (it.hasNext) { it.next(); n += 1 }
    assert(n == 3)
  }

  test("idxmax/idxmin break ties toward the smaller id") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 1.0)).toDF("id", "v")
    val f = GraftFrame(df, "id")
    assert(f.idxmax("v").head().getLong(0) == 1L)
    assert(f.idxmin("v").head().getLong(0) == 3L)
  }

  test("idxmax works with a string id key and odd column names") {
    import spark.implicits._
    // a string key (e.g. csvToFrame index_col) is not negatable — the
    // tiebreak must not rely on -id; the value column name needs quoting
    val df = Seq(("a", 5.0), ("b", 5.0), ("c", 1.0)).toDF("key", "the value")
    val f = GraftFrame(df, "key")
    assert(f.idxmax("the value").head().getString(0) == "a")
    assert(f.idxmin("the value").head().getString(0) == "c")
  }

  test("describe emits the eight pandas stats") {
    val d = orders.select(Seq("o_totalprice")).describe().collect()
    assert(d.map(_.getString(0)).toSet ==
      Set("count", "mean", "std", "min", "25%", "50%", "75%", "max"))
  }

  test("shape/size/ndim/empty/countPerColumn") {
    val o = orders
    val (rows, cols) = o.shape
    assert(rows == o.len() && cols == o.columns.size)
    assert(o.ndim == 2 && o.size() == rows * cols)
    assert(!o.isEmpty())
    val counts = o.countPerColumn().head()
    assert(o.columns.indices.forall(i => counts.getLong(i) == rows))
  }

  test("esInfo exposes the physical plan") {
    val info = orders.where(col("o_totalprice") > 100).esInfo()
    assert(info.contains("Scan parquet") || info.contains("FileScan"))
  }

  test("head/tail compose like eland's folded task list") {
    // head(10).tail(3) = rows 8..10 of the id-ordered frame
    val composed = orders.head(10).tail(3).df.collect().map(_.getLong(0)).toSeq
    val all = orders.head(10).df.collect().map(_.getLong(0)).toSeq
    assert(composed == all.takeRight(3))
    // tail(10).head(2) = first 2 of the last 10
    val c2 = orders.tail(10).head(2).df.collect().map(_.getLong(0)).toSeq
    val t10 = orders.tail(10).df.collect().map(_.getLong(0)).toSeq
    assert(c2 == t10.take(2))
  }

  test("aggregations on an empty frame return nulls/zeros, not errors") {
    val empty = orders.where(col("o_totalprice") < -1)
    assert(empty.len() == 0 && empty.isEmpty())
    val a = empty.aggregate(Seq("count", "sum", "mean"), Some(true)).head()
    assert(a.getLong(a.fieldIndex("o_totalprice_count")) == 0L)
    assert(a.isNullAt(a.fieldIndex("o_totalprice_mean")))
    assert(empty.head(5).df.count() == 0)
    assert(empty.valueCounts("o_orderstatus", 3).count() == 0)
  }

  test("toJson/toCsv sinks round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val five = orders.head(5)
    five.toJson(dir + "/j")
    five.toCsv(dir + "/c")
    assert(spark.read.json(dir + "/j").count() == 5)
    assert(spark.read.option("header", "true").csv(dir + "/c").count() == 5)
  }

  test("histogram emits edges spanning min..max with total count = rows") {
    val h = orders.histogram("o_totalprice", 10).collect()
    assert(h.length <= 10)
    assert(h.map(_.getLong(3)).sum == orders.len())
    val mn = orders.df.agg(min("o_totalprice")).head().getDouble(0)
    assert(h.head.getDouble(1) == mn)
  }

  test("resample buckets by truncated time like the date_histogram source") {
    val out = orders.resample("o_orderdate", "month").size()
    val total = out.collect().map(_.getLong(1)).sum
    assert(total == orders.len())
    val direct = orders.df
      .groupBy(date_trunc("month", col("o_orderdate"))).count().count()
    assert(out.count() == direct)
  }

  test("hist of a constant column lands everything in bin 0 (no ANSI /0)") {
    import spark.implicits._
    val f = GraftFrame.withMintedId(Seq.fill(7)(5.0).toDF("v"))
    val h = f.hist("v", 10).collect()
    assert(h.length == 1 && h.head.getLong(0) == 0L && h.head.getLong(1) == 7L)
  }

  test("renderString caps at maxRows with ellipsis and pandas footer") {
    val r = orders.renderString(10)
    val lines = r.split("\n")
    assert(lines(0).contains("o_orderkey"))
    assert(lines.exists(_.trim.startsWith("...")))
    assert(r.endsWith(s"[${orders.len()} rows x ${orders.columns.size} columns]"))
    val small = orders.head(3).renderString(10)
    assert(!small.contains("..."))
  }

  test("idxmaxAll/idxminAll cover every numeric column in one pass") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 10), (2L, 9.0, 3), (3L, 1.0, 7)).toDF("id", "a", "b")
    val f = GraftFrame(df, "id")
    val mx = f.idxmaxAll().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mx == Map("a" -> 2L, "b" -> 1L))
    val mn = f.idxminAll().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mn == Map("a" -> 3L, "b" -> 2L))
  }

  test("idxmax/idxmin skip NaN like pandas skipna=True") {
    import spark.implicits._
    // Spark's ordering treats NaN as largest; pandas idxmax skips it
    val df = Seq((1L, 2.0), (2L, Double.NaN), (3L, 5.0), (4L, Double.NaN))
      .toDF("id", "v")
    val f = GraftFrame(df, "id")
    assert(f.idxmax("v").head().getLong(0) == 3L)
    assert(f.idxmin("v").head().getLong(0) == 1L)
  }

  test("backtick-needing column names survive every expr() agg path") {
    import spark.implicits._
    // names a CSV header can produce: space, hyphen, dot
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("row id", "unit-price.usd")
    val f = GraftFrame(df, "row id")
    assert(f.median().head().getDouble(1) == 2.5)
    assert(f.aggregate(Seq("median_approx"), Some(true)).head() != null)
    val q = f.quantile(Seq(0.5)).head()
    assert(q.getDouble(q.fieldIndex("unit-price.usd_q0.5")) == 2.5)
    assert(f.mad("unit-price.usd").head().getDouble(0) == 1.0)
    assert(f.describe().count() == 8)
    val g = GraftFrame(
      Seq(("a", 1L, 2.0), ("a", 2L, 4.0), ("b", 3L, 6.0))
        .toDF("k", "row id", "unit-price.usd"), "row id")
    assert(g.groupby(Seq("k")).median().count() == 2)
    assert(g.groupby(Seq("k")).mad("unit-price.usd").count() == 2)
    assert(g.groupby(Seq("k")).quantile("unit-price.usd", Seq(0.5)).count() == 2)
    val s = new GraftSeries(GraftFrame(
      Seq((1L, "ab")).toDF("row id", "the text"), "row id"), "the text")
    assert(s.toFrame.df.select(s.strRepeat(2)).head().getString(0) == "abab")
  }

  test("keepIds keeps and REORDERS to the items list (reindex semantics)") {
    import spark.implicits._
    val f = orders
    val got = f.keepIds(Seq(5L, 1L, 3L)).df
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(5L, 1L, 3L))
    // absent ids drop silently (filter semantics)
    val got2 = f.keepIds(Seq(3L, -999L, 1L)).df
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(3L, 1L))
    // string-keyed frames work through the same cast path
    val sf = GraftFrame(Seq(("x", 1), ("y", 2), ("z", 3)).toDF("k", "v"), "k")
    assert(sf.keepIds(Seq("z", "x")).df.select("v")
      .collect().map(_.getInt(0)).toSeq == Seq(3, 1))
  }

  test("series-level metric aggs match frame-level values") {
    val o = orders
    val s = o("o_totalprice")
    val direct = o.df.agg(
      avg("o_totalprice"), sum("o_totalprice"),
      min("o_totalprice"), max("o_totalprice"),
      expr("median(o_totalprice)"), countDistinct(col("o_totalprice"))).head()
    // sum/mean: double fold order varies between executions — tolerance
    assert(math.abs(s.mean() - direct.getDouble(0)) < 1e-6)
    assert(math.abs(s.sum() - direct.getDouble(1)) < 1e-4)
    assert(s.min() == direct.getDouble(2))
    assert(s.max() == direct.getDouble(3))
    assert(s.median() == direct.getDouble(4))
    assert(s.nunique() == direct.getLong(5))
    assert(s.mad() >= 0.0)
    val d = s.describe().collect()
    assert(d.map(_.getString(0)).toSet ==
      Set("count", "mean", "std", "min", "25%", "50%", "75%", "max"))
    // describe on the id column itself (degenerate single-col frame)
    assert(o("o_orderkey").describe().count() == 8)
  }

  test("series esMatch predicates filter like the frame-level es_match") {
    val docs = GraftFrame(
      Tables.load(spark, TestSpark.sfDir, "documents"), "doc_id")
    val viaSeries = docs.where(docs("text").esMatch("filter join")).len()
    val viaFrame = docs.esMatch("filter join", Seq("text")).len()
    assert(viaSeries == viaFrame && viaSeries > 0)
    val andSeries = docs.where(
      docs("text").esMatch("filter join", operator = "and")).len()
    val andFrame = docs.esMatch("filter join", Seq("text"), operator = "and").len()
    assert(andSeries == andFrame && andSeries <= viaSeries)
    // operator and fuzziness COMPOSE (and-fuzzy requires every term),
    // and the programmatic front doors agree with the es_query DSL
    val andFuzzFrame = docs.esMatch("filtr joyn", Seq("text"),
      operator = "and", fuziness = Some(1)).len()
    val andFuzzSeries = docs.where(docs("text").esMatch("filtr joyn",
      operator = "and", fuzziness = Some(1))).len()
    val andFuzzDsl = docs.esQuery(
      """{"match": {"text": {"query": "filtr joyn", "operator": "and",
        |"fuzziness": 1}}}""".stripMargin).len()
    assert(andFuzzFrame == andFuzzDsl && andFuzzSeries == andFuzzDsl)
    // strictly tighter than or-fuzzy over the same terms, looser than
    // exact-and (the corpus has "filter join" but not "filtr joyn")
    val orFuzz = docs.esMatch("filtr joyn", Seq("text"),
      fuziness = Some(1)).len()
    assert(andFuzzFrame <= orFuzz && andFuzzFrame >= andFrame && orFuzz > 0)
    // an impossible extra term empties the and-fuzzy result
    assert(docs.esMatch("filtr zzqqxx", Seq("text"),
      operator = "and", fuziness = Some(1)).len() == 0)
  }

  test("field capability matrix: text vs keyword, .keyword aggregatable alias") {
    val docs = GraftFrame(
      Tables.load(spark, TestSpark.sfDir, "documents"), "doc_id")
    val caps = docs.fieldCaps.map(c => c.column -> c).toMap
    // string column defaults to analyzed text: searchable, NOT
    // aggregatable under its own name, .keyword alias carries aggs
    val text = caps("text")
    assert(text.esDtype == "text" && text.isSearchable && !text.isAggregatable)
    assert(text.aggregatableName.contains("text.keyword"))
    // numeric/date columns aggregate under their own name
    val id = caps("doc_id")
    assert(id.isAggregatable && id.aggregatableName.contains("doc_id"))
    // es_match on a keyword-pinned column raises like the reference
    val pinned = docs.withEsDtype("source", "keyword")
    assert(pinned.esDtypes.toMap.apply("source") == "keyword")
    val e = intercept[IllegalArgumentException](
      pinned.esMatch("web", Seq("source")))
    assert(e.getMessage.contains("non-text"))
    // lenient mode matches anyway (reference's match_only_text_fields=False)
    assert(pinned.esMatch("web", Seq("source"),
      matchOnlyTextFields = false).len() >= 0)
    // series path enforces the same contract
    assertThrows[IllegalArgumentException](
      pinned("source").esMatch("web"))
    // numeric columns refuse es_match by default too
    assertThrows[IllegalArgumentException](
      docs.esMatch("5", Seq("doc_id")))
    // rename remaps the pinned dtype with the column (and the id)
    val renamed = pinned.rename(Map("source" -> "src", "doc_id" -> "id"))
    assert(renamed.esDtypes.toMap.apply("src") == "keyword")
    assert(renamed.idCol == "id")
    assertThrows[IllegalArgumentException](
      renamed.esMatch("web", Seq("src")))
  }

  test("withMintedId is stable across identical re-reads") {
    val df = Tables.load(spark, TestSpark.sfDir, "customer")
    val a = GraftFrame.withMintedId(df).head(3).df.collect()
    val b = GraftFrame.withMintedId(
      Tables.load(spark, TestSpark.sfDir, "customer")).head(3).df.collect()
    assert(a.sameElements(b))
  }

  test("groupby mode returns all tied modal values, ranked ascending") {
    import spark.implicits._
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "b"), ("g1", "c"),
      ("g2", "z")).toDF("grp", "v")
      .withColumn("id", monotonically_increasing_id())
    val got = GraftFrame(df, "id").groupby(Seq("grp"))
      .mode("v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    // g1: a and b tie at 2 (c loses); g2: single value
    assert(got === Seq(("g1", 1L, "a"), ("g1", 2L, "b"), ("g2", 1L, "z")))
  }
  test("esValidateQuery: valid queries explain, broken ones report, " +
      "nothing executes") {
    import spark.implicits._
    val f = graft.api.GraftFrame(
      Seq((1L, "alpha")).toDF("id", "text"), "id")
    val (ok, expl) = f.esValidateQuery(
      """{"term": {"text": "alpha"}}""", matchOnlyTextFields = false)
    assert(ok && expl.nonEmpty)
    // parse error: unknown clause kind
    val (bad1, m1) = f.esValidateQuery("""{"frobnicate": {"x": 1}}""")
    assert(!bad1 && m1.nonEmpty)
    // analysis error: unknown field
    val (bad2, m2) = f.esValidateQuery(
      """{"term": {"ghost": 1}}""", matchOnlyTextFields = false)
    assert(!bad2 && m2.toLowerCase.contains("ghost"))
    // malformed JSON
    val (bad3, _) = f.esValidateQuery("""{"term": {""")
    assert(!bad3)
  }
}

