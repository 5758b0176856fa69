package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class EsAggsSpec extends AnyFunSpec with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  describe("extended_stats") {
    it("derives the moments ES derives, population and sampling") {
      // values 2, 4, 6: mean 4, pop var (4+0+4)/3 = 8/3, samp var 4
      val r = EsAggs.extendedStats(
        Seq(2.0, 4.0, 6.0).toDF("v"), "v", sigma = 2.0).collect().head
      r.getAs[Long]("count") shouldBe 3L
      r.getAs[Double]("sum") shouldBe 12.0
      r.getAs[Double]("sum_of_squares") shouldBe 56.0
      r.getAs[Double]("avg") shouldBe 4.0
      r.getAs[Double]("variance_population") shouldBe (8.0 / 3) +- 1e-12
      r.getAs[Double]("variance_sampling") shouldBe 4.0 +- 1e-12
      r.getAs[Double]("std_upper") shouldBe
        (4.0 + 2 * math.sqrt(8.0 / 3)) +- 1e-12
    }
    it("singleton input: sampling moments are null, not NaN/Inf") {
      val r = EsAggs.extendedStats(Seq(5.0).toDF("v"), "v")
        .collect().head
      r.getAs[Long]("count") shouldBe 1L
      r.isNullAt(r.fieldIndex("variance_sampling")) shouldBe true
      r.isNullAt(r.fieldIndex("std_deviation_sampling")) shouldBe true
      // population moments are still defined (variance 0)
      r.getAs[Double]("variance_population") shouldBe 0.0 +- 1e-12
      // float-error-negative variance clamps at 0 → sqrt never NaN
      val big = EsAggs.extendedStats(
        Seq(1e9 + 1, 1e9 + 1, 1e9 + 1).toDF("v"), "v").collect().head
      big.getAs[Double]("std_deviation_population") should be >= 0.0
      big.getAs[Double]("std_deviation_sampling") should be >= 0.0
    }
  }

  describe("weighted_avg") {
    it("weights values and skips null values with their weights") {
      // (10·1 + 20·3)/4 = 17.5; the null value's weight 100 is ignored
      val df = Seq((Some(10.0), 1.0), (Some(20.0), 3.0),
        (None, 100.0)).toDF("v", "w")
      EsAggs.weightedAvg(df, "v", "w").collect()
        .head.getDouble(0) shouldBe 17.5 +- 1e-12
    }
    it("groups under by keys") {
      val df = Seq(("a", 10.0, 1.0), ("a", 20.0, 1.0), ("b", 5.0, 2.0))
        .toDF("k", "v", "w")
      EsAggs.weightedAvg(df, "v", "w", by = Seq("k"))
        .collect().map(r => r.getString(0) -> r.getDouble(1))
        .toMap shouldBe Map("a" -> 15.0, "b" -> 5.0)
    }
  }

  describe("top_hits") {
    it("keeps k whole rows per group with deterministic tie cut") {
      val df = Seq(("a", 3.0, 1L), ("a", 3.0, 2L), ("a", 1.0, 3L),
        ("b", 9.0, 4L)).toDF("k", "score", "id")
      val out = EsAggs.topHits(df, Seq("k"), "score", 2, "id")
      out.count() shouldBe 3
      // tie at score 3.0 broken by id asc: ids 1 and 2 survive
      out.filter(col("k") === "a").select("id").collect()
        .map(_.getLong(0)).toSet shouldBe Set(1L, 2L)
    }
  }

  describe("ip_range / ip_prefix") {
    it("ip_range: [from, to) bounds, CIDR masks, malformed in no bucket") {
      val df = Seq("10.0.0.5", "10.0.0.200", "10.0.1.5", "10.0.128.1",
        "300.1.2.3", "not-an-ip", "::1", null).toDF("ip")
      val got = EsAggs.ipRangeAgg(df, "ip",
        ranges = Seq(
          (None, Some("10.0.1.0")),
          (Some("10.0.1.0"), None)),
        masks = Seq("10.0.0.0/24", "10.0.0.128/25")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3)))
      got.toSeq shouldBe Seq(
        ("*-10.0.1.0", null, "10.0.1.0", 2L),
        ("10.0.1.0-*", "10.0.1.0", null, 2L),
        // the mask base is masked down to its network
        ("10.0.0.0/24", "10.0.0.0", "10.0.1.0", 2L),
        ("10.0.0.128/25", "10.0.0.128", "10.0.1.0", 1L))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.ipRangeAgg(df, "ip")
      an[IllegalArgumentException] should be thrownBy
        EsAggs.ipRangeAgg(df, "ip", masks = Seq("10.0.0.0/33"))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.ipRangeAgg(df, "ip",
          ranges = Seq((Some("::1"), None)))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.ipRangeAgg(df, "ip",
          ranges = Seq((Some("10.0.1.0"), Some("10.0.0.0"))))
    }
    it("ip_prefix: buckets by network, ordered by address") {
      val df = Seq("10.0.0.1", "10.0.0.250", "10.0.1.1", "9.255.0.1",
        "garbage").toDF("ip")
      EsAggs.ipPrefixAgg(df, "ip", 24).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq shouldBe Seq(
          ("9.255.0.0", 24L, 1L), ("10.0.0.0", 24L, 2L),
          ("10.0.1.0", 24L, 1L))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.ipPrefixAgg(df, "ip", 0)
    }
  }

  describe("variable_width_histogram") {
    it("equal-depth cut points, boundary goes higher, empties omitted") {
      val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0).toDF("v")
      // k=3: cuts at q=1/3 (≈2.667) and 2/3 (≈4.333)
      val got = EsAggs.variableWidthHistogram(df, "v", 3).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getLong(4)))
      got.toSeq shouldBe Seq(
        (0L, 1.0, 2.0, 2L), (1L, 3.0, 4.0, 2L), (2L, 5.0, 6.0, 2L))
      // heavy duplicates collapse cut points; empty buckets omitted
      val dup = Seq(7.0, 7.0, 7.0, 7.0, 9.0).toDF("v")
      val g2 = EsAggs.variableWidthHistogram(dup, "v", 3).collect()
      g2.map(_.getLong(0)).toSeq should contain (2L)
      g2.map(_.getLong(4)).sum shouldBe 5L
      // one bucket = plain min/max/avg/count
      EsAggs.variableWidthHistogram(df, "v", 1).collect()
        .head.getLong(4) shouldBe 6L
      an[IllegalArgumentException] should be thrownBy
        EsAggs.variableWidthHistogram(df, "v", 0)
    }
  }

  describe("frequent_item_sets") {
    it("mines CLOSED sets over the field cube, hand-checked") {
      val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"))
        .toDF("f1", "f2")
      def run(minSupport: Double = 0.1, minSetSize: Int = 1) =
        EsAggs.frequentItemSets(df, Seq("f1", "f2"),
          minSupport, minSetSize, size = 10).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getDouble(3)))
      // {f2=x} (2) is NOT closed — its child {f1=a, f2=x} has the
      // same count; {f1=b} (1) likewise vs {f1=b, f2=y}
      run().toSeq shouldBe Seq(
        ("f1=a", 1L, 3L, 0.75),
        ("f1=a, f2=x", 2L, 2L, 0.5),
        ("f2=y", 1L, 2L, 0.5),
        ("f1=a, f2=y", 2L, 1L, 0.25),
        ("f1=b, f2=y", 2L, 1L, 0.25))
      run(minSetSize = 2).map(_._1).toSeq shouldBe
        Seq("f1=a, f2=x", "f1=a, f2=y", "f1=b, f2=y")
      run(minSupport = 0.5).map(_._1).toSeq shouldBe
        Seq("f1=a", "f1=a, f2=x", "f2=y")
      // null field values never form items: a (null, z) row counts
      // in the denominator but only {f2=z} materializes
      val withNull = Seq((Some("a"), "x"),
        (None: Option[String], "z")).toDF("f1", "f2")
      val n = EsAggs.frequentItemSets(withNull, Seq("f1", "f2"),
        0.1, 1, 10).collect().map(_.getString(0))
      assert(n.contains("f2=z") && !n.exists(_.contains("f1=null")), n.toSeq)
      an[IllegalArgumentException] should be thrownBy
        EsAggs.frequentItemSets(df, Seq("f1", "f1"))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.frequentItemSets(df, Nil)
      an[IllegalArgumentException] should be thrownBy
        EsAggs.frequentItemSets(df, Seq("f1"), minimumSupport = 0.0)
    }

    it("closedness joins on a STRUCTURED key — ', '/'=' inside a " +
        "value cannot collide distinct sets") {
      // {f1 = "1, f2=2"} displays as "f1=1, f2=2" — the same STRING
      // as the parent key {f1=1, f2=2, f3=3} emits when dropping f3.
      // A display-string join would hand the size-1 set that child's
      // count (equal to its own) and wrongly drop it as un-closed;
      // the fixed-width array key keeps the two sets distinct.
      val df = Seq(
        ("1, f2=2", null: String, null: String),
        ("1", "2", "3")).toDF("f1", "f2", "f3")
      val out = EsAggs.frequentItemSets(df, Seq("f1", "f2", "f3"),
        0.1, 1, 20).collect().map(r => (r.getString(0), r.getLong(2)))
      assert(out.contains(("f1=1, f2=2", 1L)), out.toSeq)
    }
  }

  describe("random_sampler") {
    it("deterministic md5 draw, ES probability bounds, p = 1 identity") {
      val df = (1L to 400L).toDF("id")
      val a = EsAggs.randomSampler(df, "id", 0.25, seed = 7).count()
      val b = EsAggs.randomSampler(df, "id", 0.25, seed = 7).count()
      a shouldBe b // same seed, same sample
      // roughly p·n (md5 uniformity; wide tolerance, determinism is
      // the contract under test)
      assert(a > 50 && a < 150, a)
      EsAggs.randomSampler(df, "id", 1.0).count() shouldBe 400L
      an[IllegalArgumentException] should be thrownBy
        EsAggs.randomSampler(df, "id", 0.75)
      an[IllegalArgumentException] should be thrownBy
        EsAggs.randomSampler(df, "id", 0.0)
    }
  }

  describe("sampler") {
    it("plain: global top shard_size by (score desc, id asc)") {
      val df = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("b", 3L, 9.0),
        ("b", 4L, 1.0)).toDF("k", "id", "score")
      EsAggs.samplerAgg(df, "score", "id", shardSize = 2)
        .select("id").collect().map(_.getLong(0)).toSet shouldBe
        Set(3L, 1L) // 9.0, then the 5.0 tie broken to id 1
    }
    it("diversified: per-value cap applies in score order BEFORE the cut") {
      // without the cap the sample would be ids 3, 5 (both key b);
      // the 1-per-key cap drops id 5, letting a's best (id 1) in
      val df = Seq(("a", 1L, 5.0), ("a", 2L, 4.0), ("b", 3L, 9.0),
        ("b", 5L, 8.0)).toDF("k", "id", "score")
      EsAggs.samplerAgg(df, "score", "id", shardSize = 2,
          diversifyField = Some("k"), maxDocsPerValue = 1)
        .select("id").collect().map(_.getLong(0)).toSet shouldBe
        Set(3L, 1L)
      an[IllegalArgumentException] should be thrownBy
        EsAggs.samplerAgg(df, "score", "id", 0)
      an[IllegalArgumentException] should be thrownBy
        EsAggs.samplerAgg(df, "score", "id", 1,
          diversifyField = Some("k"), maxDocsPerValue = 0)
    }
  }

  describe("collapse") {
    it("one anchor per key ranked by best score, inner hits re-sorted") {
      // A: best 9.0; B: 8.0 tie broken to id 3; C (5.0) cut by size=2.
      // inner sort = price ASC (differs from the score order)
      val hits = Seq(
        ("A", 1L, 9.0, 30.0), ("A", 2L, 7.0, 10.0),
        ("B", 3L, 8.0, 50.0), ("B", 4L, 8.0, 40.0), ("B", 5L, 2.0, 60.0),
        ("C", 6L, 5.0, 1.0))
        .toDF("k", "id", "score", "price")
      val out = EsAggs.collapse(hits, "k", "score", "id",
        size = 2, innerHits = 2, innerSortCol = "price",
        innerAsc = true).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      out.toSeq shouldBe Seq(
        (1L, "A", 1L, 9.0, 1L, 2L, 10.0),
        (1L, "A", 1L, 9.0, 2L, 1L, 30.0),
        (2L, "B", 3L, 8.0, 1L, 4L, 40.0),
        (2L, "B", 3L, 8.0, 2L, 3L, 50.0))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.collapse(hits, "k", "score", "id", 0, 1, "price")
      an[IllegalArgumentException] should be thrownBy
        EsAggs.collapse(hits, "k", "score", "id", 1, 0, "price")
    }
  }

  describe("rare_terms") {
    it("keeps keys at or under max_doc_count, rarest first") {
      val df = Seq("x", "x", "x", "y", "z", "z").toDF("t")
      EsAggs.rareTerms(df, Seq("t"), 2).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
        Seq(("y", 1L), ("z", 2L))
    }
    it("refuses max_doc_count < 1") {
      an[IllegalArgumentException] should be thrownBy
        EsAggs.rareTerms(Seq("x").toDF("t"), Seq("t"), 0)
    }
  }

  describe("auto_date_histogram") {
    def mkTs(rows: Seq[String]) = rows.toDF("t")
      .withColumn("t", to_timestamp(col("t")))
    it("walks the fixed ladder to the first arm within budget") {
      // epoch seconds 1..91: count(i) = floor(91/i) − floor(1/i) + 1
      // → 1s: 91, 5s: 19, 10s: 10, 1m: 2
      val df = mkTs(Seq("2024-01-01 00:00:01", "2024-01-01 00:01:31"))
        .withColumn("t", col("t") - expr("INTERVAL 19723 DAYS")) // → 1970
      def pick(target: Int): String =
        EsAggs.autoDateHistogram(df, "t", target)
          .select("auto_interval").head().getString(0)
      pick(100) shouldBe "1s"
      pick(19) shouldBe "5s"
      pick(15) shouldBe "10s"
      pick(2) shouldBe "1m"
    }
    it("falls through to calendar months and years") {
      val df = mkTs(Seq("2015-03-01 00:00:00", "2024-11-01 00:00:00"))
      // 117 month-units: target 120 → 1M; 40 3M-units: target 50 →
      // 3M; 10 year-units: target 12 → 1y; target 5 → 5y
      def out(target: Int) =
        EsAggs.autoDateHistogram(df, "t", target)
      out(120).select("auto_interval").head().getString(0) shouldBe "1M"
      out(50).select("auto_interval").head().getString(0) shouldBe "3M"
      val y = out(12)
      y.select("auto_interval").head().getString(0) shouldBe "1y"
      out(2).select("auto_interval").head().getString(0) shouldBe "5y"
      // year buckets truncate to Jan 1
      y.select("bucket").distinct().collect()
        .map(_.getTimestamp(0).toString).sorted.head should
        startWith("2015-01-01")
    }
    it("buckets align to the epoch floor") {
      val df = mkTs(Seq("2024-01-01 00:00:04", "2024-01-01 00:00:14"))
        .withColumn("t", col("t") - expr("INTERVAL 19723 DAYS")) // → 1970
      // epoch 4..14: count(5s) = 2 − 0 + 1 = 3 → the 5s arm at
      // target 3; buckets floor to 0 and 10
      val b = EsAggs.autoDateHistogram(df, "t", 3)
      b.select("auto_interval").head().getString(0) shouldBe "5s"
      b.select("bucket").collect().map(_.getTimestamp(0).toString)
        .toSet shouldBe Set("1970-01-01 00:00:00.0",
          "1970-01-01 00:00:10.0")
    }
    it("refuses empty input") {
      an[IllegalArgumentException] should be thrownBy
        EsAggs.autoDateHistogram(mkTs(Seq.empty[String]), "t", 10)
    }
  }

  describe("range agg") {
    it("buckets with [from, to) semantics and allows overlaps") {
      val df = Seq(0.0, 5.0, 10.0, 15.0).toDF("v")
      val out = EsAggs.rangeAgg(df, "v", Seq(
        (None, Some(10.0)), (Some(10.0), None), (Some(5.0), Some(15.0))))
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      out("*-10.0") shouldBe 2   // 0, 5 (10 excluded — half-open)
      out("10.0-*") shouldBe 2   // 10, 15
      out("5.0-15.0") shouldBe 2 // 5, 10 — overlapping range counts both
    }
    it("null values count in no range") {
      val df = Seq(Some(1.0), None).toDF("v")
      EsAggs.rangeAgg(df, "v", Seq((None, None))).collect()
        .head.getLong(3) shouldBe 1
    }
  }

  describe("filters agg") {
    it("counts per named predicate with an optional other bucket") {
      val df = Seq(("a", 1), ("a", 2), ("b", 9)).toDF("k", "v")
      val out = EsAggs.filtersAgg(df, Seq(
        "isA" -> (col("k") === "a"), "big" -> (col("v") > 1)),
        otherBucket = true)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out shouldBe Map("isA" -> 2L, "big" -> 2L, "_other_" -> 0L)
      // a row matching nothing lands in _other_
      val out2 = EsAggs.filtersAgg(df, Seq("big" -> (col("v") > 5)),
        otherBucket = true)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out2 shouldBe Map("big" -> 1L, "_other_" -> 2L)
    }
    it("refuses duplicate and reserved names") {
      val df = Seq(1).toDF("v")
      an[IllegalArgumentException] should be thrownBy
        EsAggs.filtersAgg(df, Seq("x" -> lit(true), "x" -> lit(false)))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.filtersAgg(df, Seq("_other_" -> lit(true)))
    }
  }

  describe("geo_line / categorize_text") {
    it("geo_line orders by the sort field, cuts at size, flags " +
        "completeness") {
      val df = Seq(
        ("a", 3L, 1.0, 10.0), ("a", 1L, 2.0, 20.0), ("a", 2L, 3.0, 30.0),
        ("b", 1L, 5.0, 50.0)).toDF("g", "s", "lat", "lon")
        .select(col("g"), col("s"),
          struct(col("lat"), col("lon")).as("loc"))
      val got = EsAggs.geoLine(df, "g", "loc", "s", size = 2)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getBoolean(3))).toSeq
      got shouldBe Seq(
        ("a", "20.0 2.0;30.0 3.0", 2L, false), // sorted by s, cut at 2
        ("b", "50.0 5.0", 1L, true))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.geoLine(df, "g", "loc", "s", size = 0)
    }
    it("categorize_text groups by the digit-masked template") {
      val df = Seq(
        (1L, "GET /api/user 200"), (2L, "GET /api/user 404"),
        (3L, "POST /api/user 200"), (4L, null.asInstanceOf[String]))
        .toDF("id", "line")
      val got = EsAggs.categorizeText(df, "id", "line")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2))).toSeq
      got shouldBe Seq(("get /api/user #", 2L, 1L),
        ("post /api/user #", 1L, 3L))
    }
  }

  describe("date_range") {
    it("buckets [from, to) on the time axis, refuses date math") {
      val df = Seq("2024-01-15", "2024-02-15", "2024-03-15")
        .toDF("d").withColumn("d", to_timestamp(col("d")))
      val got = EsAggs.dateRangeAgg(df, "d", Seq(
        (None, Some("2024-02-15")),
        (Some("2024-02-15"), None))).collect()
        .map(r => (r.getString(0), r.getLong(3))).toSeq
      // the boundary row lands in the >= bucket ([from, to))
      got shouldBe Seq(("*-2024-02-15", 1L), ("2024-02-15-*", 2L))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.dateRangeAgg(df, "d", Seq((Some("now-1M/d"), None)))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.dateRangeAgg(df, "d", Nil)
      // trailing garbage after a valid date prefix used to slip the
      // regex, null through to_timestamp and silently count 0
      an[IllegalArgumentException] should be thrownBy
        EsAggs.dateRangeAgg(df, "d", Seq((Some("2020-01-01Tnope"), None)))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.dateRangeAgg(df, "d", Seq((Some("2024-02-30"), None)))
      // full datetime bounds still parse
      EsAggs.dateRangeAgg(df, "d", Seq(
        (Some("2024-02-15T00:00:00"), None))).collect()
        .head.getLong(3) shouldBe 2L
    }
  }

  describe("top_metrics / rate") {
    it("top_metrics returns the extreme row's metrics per bucket") {
      val df = Seq(("a", 5.0, 1L, "x"), ("a", 9.0, 2L, "y"),
        ("a", 9.0, 3L, "z"), ("b", 1.0, 4L, "w"))
        .toDF("g", "s", "id", "m")
      EsAggs.topMetrics(df, Seq("g"), "s", Seq("m"), tieCol = "id")
        .collect().map(r => (r.getString(0), r.getDouble(1),
          r.getString(2))).toSeq shouldBe
        Seq(("a", 9.0, "y"), ("b", 1.0, "w")) // tie → smaller id
      an[IllegalArgumentException] should be thrownBy
        EsAggs.topMetrics(df, Seq("g"), "s", Nil, tieCol = "id")
    }
    it("rate divides by each bucket's own calendar span") {
      val b = Seq(("2024-01-01", 62.0), ("2024-02-01", 58.0))
        .toDF("m", "n").withColumn("m", to_timestamp(col("m")))
      val got = EsAggs.rateAgg(b, "m", "n", "month", "day")
        .orderBy("m").collect().map(_.getAs[Double]("rate")).toSeq
      got shouldBe Seq(2.0, 2.0) // 62/31, 58/29 (2024 is a leap year)
      // 2024-01-01 is a Monday (week-truncated); the Feb 1 bucket is
      // correctly refused by the truncation guard below
      val wk = Seq(("2024-01-01", 62.0)).toDF("m", "n")
        .withColumn("m", to_timestamp(col("m")))
      EsAggs.rateAgg(wk, "m", "n", "week", "hour")
        .collect().head.getAs[Double]("rate") shouldBe
        (62.0 / 168) +- 1e-12
      an[IllegalArgumentException] should be thrownBy
        EsAggs.rateAgg(b, "m", "n", "year", "day")
      an[IllegalArgumentException] should be thrownBy
        EsAggs.rateAgg(b, "m", "n", "month", "minute")
      // a non-truncated bucket start fails loudly in the plan
      val mid = Seq(("2024-01-31", 1.0)).toDF("m", "n")
        .withColumn("m", to_timestamp(col("m")))
      val e = intercept[Exception](
        EsAggs.rateAgg(mid, "m", "n", "month", "day").collect())
      assert(e.getMessage.contains("truncated"), e.getMessage)
    }
  }

  describe("terms agg (full knobs)") {
    it("missing substitutes, include/exclude filter keys, " +
        "min_doc_count prunes, size cuts") {
      val df = Seq(Some("apple"), Some("apple"), Some("avocado"),
        Some("banana"), Some("banana"), Some("cherry"), None, None)
        .toDF("f")
      EsAggs.termsAgg(df, "f").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
        Seq(("apple", 2L), ("banana", 2L), ("avocado", 1L),
          ("cherry", 1L))
      EsAggs.termsAgg(df, "f", missing = Some("__na__"),
        minDocCount = 2).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
        Seq(("__na__", 2L), ("apple", 2L), ("banana", 2L))
      EsAggs.termsAgg(df, "f", include = Some("a.*"),
        exclude = Some("avocado"), size = Some(1)).collect()
        .map(_.getString(0)).toSeq shouldBe Seq("apple")
      an[IllegalArgumentException] should be thrownBy
        EsAggs.termsAgg(df, "f", minDocCount = -1)
    }

    it("order by a metric sub-agg: avg/min/max/sum, ES's key-asc tie " +
        "rule, null metric sorts last both ways") {
      val df = Seq(
        ("a", Some(10.0)), ("a", Some(20.0)),      // avg 15
        ("b", Some(15.0)),                         // avg 15 (tie)
        ("c", Some(40.0)),                         // avg 40
        ("d", None: Option[Double])                // metric null
      ).toDF("f", "v")
      def run(agg: String, asc: Boolean = false) =
        EsAggs.termsAgg(df, "f", orderMetric = Some((agg, "v")),
          orderAsc = asc).collect()
          .map(r => (r.getString(0), r.getLong(1),
            Option(r.get(2)).map(_.asInstanceOf[Double])))
      // desc: c(40), then the 15-tie broken by key asc (a before b),
      // null-metric d LAST
      run("avg").map(_._1).toSeq shouldBe Seq("c", "a", "b", "d")
      // asc: ties still key-asc, null still last
      run("avg", asc = true).map(_._1).toSeq shouldBe
        Seq("a", "b", "c", "d")
      run("sum").map(_._1).toSeq shouldBe Seq("c", "a", "b", "d")
      run("max").head shouldBe (("c", 1L, Some(40.0)))
      run("min", asc = true).map(_._1).toSeq shouldBe
        Seq("a", "b", "c", "d")
      // doc_count rides along; the metric is the reported order_metric
      run("avg").find(_._1 == "a").get shouldBe
        (("a", 2L, Some(15.0)))
      // knobs compose: missing buckets the nulls, size cuts on the
      // METRIC order
      EsAggs.termsAgg(df, "f", size = Some(1),
        orderMetric = Some(("avg", "v"))).collect()
        .map(_.getString(0)).toSeq shouldBe Seq("c")
      an[IllegalArgumentException] should be thrownBy
        EsAggs.termsAgg(df, "f", orderMetric = Some(("median", "v")))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.termsAgg(df, "f", orderMetric = Some(("avg", "f")))
      // _key ordering: asc/desc, exclusive with the metric order
      EsAggs.termsAgg(df, "f", orderByKey = true, orderAsc = true)
        .collect().map(_.getString(0)).toSeq shouldBe
        Seq("a", "b", "c", "d")
      EsAggs.termsAgg(df, "f", orderByKey = true, size = Some(2))
        .collect().map(_.getString(0)).toSeq shouldBe Seq("d", "c")
      an[IllegalArgumentException] should be thrownBy
        EsAggs.termsAgg(df, "f", orderByKey = true,
          orderMetric = Some(("avg", "v")))
    }
  }

  describe("missing / global aggregations") {
    it("missing: counts null-field docs, metrics inside the bucket") {
      val df = Seq((Some("a"), 10.0), (None, 2.0), (None, 4.0),
        (Some("b"), 7.0)).toDF("f", "v")
      val r = EsAggs.missingAgg(df, "f", Some("v")).collect().head
      r.getAs[Long]("doc_count") shouldBe 2L
      r.getAs[Double]("min") shouldBe 2.0
      r.getAs[Double]("max") shouldBe 4.0
      r.getAs[Double]("sum") shouldBe 6.0
      r.getAs[Double]("avg") shouldBe 3.0
      // no sub-metric → just the bucket count
      EsAggs.missingAgg(df, "f").columns.toSeq shouldBe Seq("doc_count")
      // empty bucket: count 0, metrics null (ES returns no values)
      val full = EsAggs.missingAgg(
        Seq(("a", 1.0)).toDF("f", "v"), "f", Some("v")).collect().head
      full.getAs[Long]("doc_count") shouldBe 0L
      full.isNullAt(full.fieldIndex("avg")) shouldBe true
    }
    it("global: query-scoped and whole-index cells from one pass") {
      val df = Seq(("a", 2.0), ("a", 4.0), ("b", 6.0)).toDF("f", "v")
      val rows = EsAggs.globalAgg(df, col("f") === "a", "v")
        .collect().map(r => r.getAs[String]("scope") ->
          (r.getAs[Long]("doc_count"), r.getAs[Double]("avg"))).toMap
      rows("query") shouldBe ((2L, 3.0))
      rows("global") shouldBe ((3L, 4.0))
      // null predicate rows count as non-matching, not poison
      val np = EsAggs.globalAgg(
        Seq((Some("a"), 2.0), (None, 8.0)).toDF("f", "v"),
        col("f") === "a", "v").collect()
        .map(r => r.getAs[String]("scope") ->
          r.getAs[Long]("doc_count")).toMap
      np("query") shouldBe 1L
      np("global") shouldBe 2L
    }
    it("global: single scan — no join, one aggregate over the base") {
      val df = Seq(("a", 2.0)).toDF("f", "v")
      val p = EsAggs.globalAgg(df, col("f") === "a", "v")
        .queryExecution.sparkPlan.toString
      p should not include "Join"
      p.linesIterator.count(_.contains("Scan")) shouldBe 1
    }
  }

  describe("t_test paired / multi_terms") {
    it("paired t matches the hand formula and drops half-null rows") {
      // pairs (3,1),(5,2),(4,4): d = 2,3,0 → mean 5/3, var 7/3
      val df = Seq((Some(3.0), Some(1.0)), (Some(5.0), Some(2.0)),
        (Some(4.0), Some(4.0)), (None, Some(9.0)), (Some(9.0), None))
        .toDF("a", "b")
      val r = EsAggs.tTestPaired(df, "a", "b").collect().head
      r.getAs[Long]("n") shouldBe 3L
      r.getAs[Double]("mean_diff") shouldBe (5.0 / 3) +- 1e-12
      val t = (5.0 / 3) / math.sqrt((7.0 / 3) / 3)
      r.getAs[Double]("t_stat") shouldBe t +- 1e-12
      r.getAs[Long]("deg_f") shouldBe 2L
    }
    it("multi_terms buckets compound keys, excludes half-null rows") {
      val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"),
        (null, "x"), ("b", null)).toDF("k1", "k2")
      EsAggs.multiTerms(df, Seq("k1", "k2")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
        Seq(("a|x", 2L), ("a|y", 1L), ("b|x", 1L))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.multiTerms(df, Seq("k1"))
    }
  }

  describe("nested aggregation + reverse_nested") {
    it("counts elements, aggregates the element field, and counts " +
        "parents once each") {
      val df = Seq(
        (1L, Seq(("a", 10.0), ("a", 20.0), ("b", 5.0))),
        (2L, Seq(("a", 30.0))),
        (3L, Seq[(String, Double)]()),
        (4L, null.asInstanceOf[Seq[(String, Double)]])
      ).toDF("id", "items")
        .selectExpr("id",
          "transform(items, p -> named_struct(" +
            "'cat', p._1, 'v', p._2)) AS items")
      val got = EsAggs.nestedTerms(df, "id", "items", "cat", "v")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(4), r.getLong(6))).toSeq
      // key a: 3 elements across 2 parents, sum 60; key b: 1 and 1
      got shouldBe Seq(("a", 3L, 60.0, 2L), ("b", 1L, 5.0, 1L))
    }
  }

  describe("histogram (ES fixed-interval face)") {
    it("applies the offset key rule and fills empty buckets at " +
        "min_doc_count 0") {
      val df = Seq(Some(-1.0), Some(0.5), Some(10.2), Some(10.9), None)
        .toDF("v")
      // interval 2, offset 0.5: keys floor((v-0.5)/2)*2+0.5
      EsAggs.histogram(df, "v", 2.0, offset = 0.5).collect()
        .map(r => (r.getDouble(0), r.getLong(1))).toSeq shouldBe
        Seq((-1.5, 1L), (0.5, 1L), (8.5, 1L), (10.5, 1L))
      // min_doc_count 0 materializes the gap buckets, null in none
      EsAggs.histogram(df, "v", 2.0, offset = 0.5, minDocCount = 0)
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq shouldBe
        Seq((-1.5, 1L), (0.5, 1L), (2.5, 0L), (4.5, 0L), (6.5, 0L),
          (8.5, 1L), (10.5, 1L))
      an[IllegalArgumentException] should be thrownBy
        EsAggs.histogram(df, "v", 0.0)
    }
    it("a min_doc_count:0 gap past max_buckets fails LOUDLY instead " +
        "of materializing a runaway spine") {
      val outliers = Seq(0.0, 1.0e9).toDF("v")
      val e = intercept[Exception](
        EsAggs.histogram(outliers, "v", 1.0, minDocCount = 0,
          maxBuckets = 1000).collect())
      assert(e.getMessage.contains("max_buckets"), e.getMessage)
      // within the cap the spine still fills
      EsAggs.histogram(Seq(0.0, 5.0).toDF("v"), "v", 1.0,
        minDocCount = 0, maxBuckets = 1000).count() shouldBe 6L
      // the guard bounds the TOTAL spine, not just a single gap:
      // three occupied buckets with sub-cap gaps whose SUM exceeds
      // the cap must refuse too (ES's search.max_buckets is a
      // result-size limit)
      val creeping = Seq(0.0, 900.0, 1800.0).toDF("v")
      val e2 = intercept[Exception](
        EsAggs.histogram(creeping, "v", 1.0, minDocCount = 0,
          maxBuckets = 1000).collect())
      assert(e2.getMessage.contains("max_buckets"), e2.getMessage)
      // exactly at the cap is allowed (1001 buckets > 1000 refuses,
      // 1000 passes)
      EsAggs.histogram(Seq(0.0, 999.0).toDF("v"), "v", 1.0,
        minDocCount = 0, maxBuckets = 1000).count() shouldBe 1000L
    }
  }

  describe("geohash_grid") {
    it("encodes the canonical test vector and clamps the domain edges") {
      // the classic geohash example: (57.64911, 10.40744) → "u4pru…"
      val pts = Seq((1L, 57.64911, 10.40744), (2L, 90.0, 180.0),
        (3L, -90.0, -180.0)).toDF("id", "lat", "lon")
        .select(col("id"), struct(col("lat"), col("lon")).as("loc"))
      val got = EsAggs.geohashGrid(pts, "loc", 5).collect()
        .map(_.getString(0)).toSet
      assert(got.contains("u4pru"), got)
      // the north-east / south-west corners land in the edge cells
      assert(got.contains("zzzzz") && got.contains("00000"), got)
      // odd and even precisions both follow the lon-first convention
      val p1 = EsAggs.geohashGrid(pts, "loc", 1).collect()
        .map(_.getString(0)).toSet
      assert(p1.contains("u"), p1)
      an[IllegalArgumentException] should be thrownBy
        EsAggs.geohashGrid(pts, "loc", 9)
    }
    it("out-of-domain coordinates clamp on BOTH edges") {
      // lat < -90 / lon < -180 must quantize to cell 0, not negative
      val bad = Seq((1L, -95.0, -200.0), (2L, 95.0, 200.0))
        .toDF("id", "lat", "lon")
        .select(col("id"), struct(col("lat"), col("lon")).as("loc"))
      val keys = EsAggs.geohashGrid(bad, "loc", 5).collect()
        .map(_.getString(0)).toSet
      keys shouldBe Set("00000", "zzzzz")
    }
  }

  describe("geotile_grid") {
    it("buckets by the slippy-map scheme with edge clamping") {
      val pts = Seq(
        (1L, 0.1, 0.1),      // z1: x = floor(180.1/360*2) = 1, y = 0
        (2L, 0.1, -0.1),     // x 0, y 0
        (3L, -0.1, 0.1),     // x 1, y 1
        (4L, 89.9, 180.0),   // beyond Mercator + lon edge → clamped
        (5L, -89.9, -180.0)) // clamped to 0, 2^z-1
        .toDF("id", "lat", "lon")
        .select(col("id"), struct(col("lat"), col("lon")).as("loc"))
      val got = EsAggs.geotileGrid(pts, "loc", 1).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      got shouldBe Map("1/1/0" -> 2L, "1/0/0" -> 1L, "1/1/1" -> 1L,
        "1/0/1" -> 1L)
      // lat 0 sits exactly on the tile boundary → the SOUTH tile
      // (floor of an exact integer), deterministically
      val eq = Seq((1L, 0.0, 0.0)).toDF("id", "lat", "lon")
        .select(col("id"), struct(col("lat"), col("lon")).as("loc"))
      EsAggs.geotileGrid(eq, "loc", 1).collect()
        .head.getString(0) shouldBe "1/1/1"
      an[IllegalArgumentException] should be thrownBy
        EsAggs.geotileGrid(pts, "loc", 30)
    }
  }

  describe("boxplot / t_test / string_stats / matrix_stats") {
    it("boxplot returns exact R-7 quartiles") {
      // 1..5: q1 = 2, q2 = 3, q3 = 4
      val r = EsAggs.boxplot(
        Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v"), "v").collect().head
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)) shouldBe ((1.0, 2.0, 3.0, 4.0, 5.0))
    }
    it("Welch t_test matches the hand formula") {
      // A: 1,2,3 (mean 2, var 1); B: 5,7 (mean 6, var 2)
      val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0),
        ("b", 7.0)).toDF("g", "v")
      val r = EsAggs.tTest(df, "v", "g", "a", "b").collect().head
      val se2 = 1.0 / 3 + 2.0 / 2
      r.getAs[Double]("t_stat") shouldBe
        ((2.0 - 6.0) / math.sqrt(se2)) +- 1e-12
      r.getAs[Double]("deg_f") shouldBe (se2 * se2 /
        ((1.0 / 3) * (1.0 / 3) / 2 + 1.0 * 1.0 / 1)) +- 1e-12
      // homoscedastic: pooled var = (2·1 + 1·2)/3
      val h = EsAggs.tTest(df, "v", "g", "a", "b",
        "homoscedastic").collect().head
      val pooled = (2.0 * 1 + 1.0 * 2) / 3
      h.getAs[Double]("t_stat") shouldBe
        (-4.0 / math.sqrt(pooled * (1.0 / 3 + 1.0 / 2))) +- 1e-12
      h.getAs[Double]("deg_f") shouldBe 3.0
    }
    it("string_stats entropy matches the character distribution") {
      // "aab" + "b": chars a,a,b,b → p = .5/.5 → entropy 1 bit
      val r = EsAggs.stringStats(
        Seq(Some("aab"), Some("b"), None).toDF("s"), "s")
        .collect().head
      r.getAs[Long]("count") shouldBe 2L
      r.getAs[Long]("min_length") shouldBe 1L
      r.getAs[Long]("max_length") shouldBe 3L
      r.getAs[Double]("avg_length") shouldBe 2.0
      r.getAs[Double]("entropy") shouldBe 1.0 +- 1e-12
    }
    it("matrix_stats covariance/correlation from moment sums") {
      // x = 1,2,3; y = 2,4,6 → cov 2, corr 1
      val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
      val rows = EsAggs.matrixStats(df, Seq("x", "y")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r).toMap
      val xy = rows(("x", "y"))
      xy.getAs[Double]("covariance") shouldBe 2.0 +- 1e-12
      xy.getAs[Double]("correlation") shouldBe 1.0 +- 1e-12
      rows(("x", "x")).getAs[Double]("covariance") shouldBe 1.0 +- 1e-12
      // null in any field drops the row everywhere
      val withNull = Seq((Some(1.0), Some(2.0)), (Some(9.0), None))
        .toDF("x", "y")
      EsAggs.matrixStats(withNull, Seq("x", "y")).collect()
        .head.getAs[Long]("count") shouldBe 1L
    }
  }

  describe("adjacency_matrix") {
    it("counts singles and pair intersections, omits empty buckets") {
      val df = Seq(("a", 1), ("a", 9), ("b", 9)).toDF("k", "v")
      val out = EsAggs.adjacencyMatrix(df, Seq(
        "isA" -> (col("k") === "a"), "big" -> (col("v") > 5),
        "neg" -> (col("v") < 0)))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out shouldBe Map("isA" -> 2L, "big" -> 2L, "isA&big" -> 1L)
      // "neg", "isA&neg", "big&neg" omitted (empty buckets)
    }
    it("refuses '&' in names") {
      an[IllegalArgumentException] should be thrownBy
        EsAggs.adjacencyMatrix(Seq(1).toDF("v"),
          Seq("a&b" -> lit(true)))
    }
  }

  describe("composite paging") {
    it("pages buckets lexicographically after the after_key") {
      val df = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2), ("c", 1))
        .toDF("k1", "k2")
      val page = EsAggs.compositePage(df, Seq("k1", "k2"), 2,
        afterKey = Some(Seq("a", 2)))
      page.collect().map(r => (r.getString(0), r.getInt(1))).toSeq shouldBe
        Seq(("b", 1), ("b", 2))
      // pages tile: the next after_key continues without overlap
      EsAggs.compositePage(df, Seq("k1", "k2"), 2,
          afterKey = Some(Seq("b", 2)))
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq shouldBe
        Seq(("c", 1))
    }
    it("refuses a mis-sized after_key") {
      an[IllegalArgumentException] should be thrownBy
        EsAggs.compositePage(Seq(("a", 1)).toDF("k1", "k2"),
          Seq("k1", "k2"), 2, afterKey = Some(Seq("a")))
    }
    it("NULL-keyed rows are excluded from every page (the paging " +
        "contract: NULL > x is null-false, so they could never tile)") {
      val df = Seq((Some("a"), 1), (None, 2), (Some("b"), 3))
        .toDF("k1", "k2")
      // page 1 has no null bucket…
      EsAggs.compositePage(df, Seq("k1"), 10).collect()
        .map(_.getString(0)).toSeq shouldBe Seq("a", "b")
      // …so after_key pages stay consistent with it
      EsAggs.compositePage(df, Seq("k1"), 10,
          afterKey = Some(Seq("a"))).collect()
        .map(_.getString(0)).toSeq shouldBe Seq("b")
    }
  }
}
