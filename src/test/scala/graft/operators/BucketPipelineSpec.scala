package graft.operators

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** ES pipeline-agg semantics pinned on hand-computed series. */
class BucketPipelineSpec extends AnyFunSpec with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // three monthly buckets, values 10, 30, 25
  private def series = Seq(
    ("2024-01-01", 10.0), ("2024-02-01", 30.0), ("2024-03-01", 25.0))
    .toDF("m", "v").withColumn("m", to_timestamp(col("m")))

  private def vals(df: org.apache.spark.sql.DataFrame,
                   c: String): Seq[Option[Double]] =
    df.orderBy("m").select(c).collect().toSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  describe("derivative") {
    it("is the lag-1 difference, null on the first bucket") {
      vals(BucketPipeline.derivative(series, "m", "v", "d"), "d") shouldBe
        Seq(None, Some(20.0), Some(-5.0))
    }
    it("normalizes by the bucket gap in the given unit") {
      val out = BucketPipeline.derivative(series, "m", "v", "d",
        unitMillis = Some(86400000L)) // per day
      // Jan→Feb gap 31 days: 20/31; Feb→Mar gap 29 days (2024): -5/29
      val per = vals(out, "d_per_unit")
      per.head shouldBe None
      per(1).get shouldBe (20.0 / 31.0) +- 1e-12
      per(2).get shouldBe (-5.0 / 29.0) +- 1e-12
    }
    it("restarts per series under seriesBy") {
      val two = series.withColumn("s", lit("a"))
        .unionByName(series.withColumn("v", col("v") * 2)
          .withColumn("s", lit("b")))
      val out = BucketPipeline.derivative(two, "m", "v", "d",
        seriesBy = Seq("s"))
      out.filter(col("d").isNull).count() shouldBe 2 // one per series
      out.filter(col("s") === "b" && col("d") === 40.0).count() shouldBe 1
    }
  }

  describe("cumulative_sum and serial_diff") {
    it("cumulativeSum runs a prefix total") {
      vals(BucketPipeline.cumulativeSum(series, "m", "v", "c"), "c") shouldBe
        Seq(Some(10.0), Some(40.0), Some(65.0))
    }
    it("serialDiff lag 2 needs two buckets of history") {
      vals(BucketPipeline.serialDiff(series, "m", "v", 2, "sd"), "sd") shouldBe
        Seq(None, None, Some(15.0))
    }
  }

  describe("moving_fn") {
    it("shift 0 excludes the current bucket (ES default)") {
      vals(BucketPipeline.movingFn(series, "m", "v", 2, "unweightedAvg",
        out = "ma"), "ma") shouldBe Seq(None, Some(10.0), Some(20.0))
    }
    it("shift 1 includes the current bucket") {
      vals(BucketPipeline.movingFn(series, "m", "v", 2, "unweightedAvg",
        shift = 1, out = "ma"), "ma") shouldBe
        Seq(Some(10.0), Some(20.0), Some(27.5))
    }
    it("stdDev is the population σ of the window") {
      // window 2 incl current at bucket 2: [10, 30] → σ = 10
      vals(BucketPipeline.movingFn(series, "m", "v", 2, "stdDev",
        shift = 1, out = "sd"), "sd")(1).get shouldBe 10.0 +- 1e-12
    }
    it("linearWeightedAvg weights the newest value highest") {
      // bucket 3, window 3 incl current: (10·1 + 30·2 + 25·3)/6
      vals(BucketPipeline.movingFn(series, "m", "v", 3,
        "linearWeightedAvg", shift = 1, out = "lw"), "lw")(2).get shouldBe
        (145.0 / 6.0) +- 1e-12
    }
    it("ewma folds oldest→newest") {
      // bucket 3: start 10, then .5·30+.5·10 = 20, then .5·25+.5·20
      vals(BucketPipeline.movingEwma(series, "m", "v", 3, 0.5,
        shift = 1, out = "e"), "e")(2).get shouldBe 22.5 +- 1e-12
    }
    it("refuses unknown functions") {
      an[IllegalArgumentException] should be thrownBy
        BucketPipeline.movingFn(series, "m", "v", 2, "holtWinters")
    }
  }

  describe("bucket_script / bucket_selector / bucket_sort") {
    it("selector drops null predicates like ES skip gap policy") {
      val withNull = BucketPipeline.bucketScript(series, "r",
        when(col("v") > 12, col("v") * 2))
      BucketPipeline.bucketSelector(withNull, col("r") > 0)
        .count() shouldBe 2
    }
    it("bucket_sort pages with from/size") {
      val out = BucketPipeline.bucketSort(series,
        Seq(col("v").desc), from = 1, size = Some(2))
      out.select("v").collect().map(_.getDouble(0)).toSeq shouldBe
        Seq(25.0, 10.0)
    }
  }

  describe("sibling bucket aggs") {
    it("bucketStats aggregates the metric over all buckets") {
      val r = BucketPipeline.bucketStats(series, "v").collect().head
      r.getAs[Long]("count") shouldBe 3L
      r.getAs[Double]("min") shouldBe 10.0
      r.getAs[Double]("max") shouldBe 30.0
      r.getAs[Double]("sum") shouldBe 65.0
    }
    it("maxBucket returns ALL tying keys sorted, minBucket mirrors") {
      val tied = Seq(("b2", 9.0), ("b1", 9.0), ("b3", 1.0))
        .toDF("k", "v")
      val mx = BucketPipeline.maxBucket(tied, "k", "v").collect().head
      mx.getString(0) shouldBe "b1,b2"
      mx.getDouble(1) shouldBe 9.0
      val mn = BucketPipeline.minBucket(tied, "k", "v").collect().head
      mn.getString(0) shouldBe "b3"
      mn.getDouble(1) shouldBe 1.0
    }
    it("bucketCorrelation: Pearson r vs a given vector, length-checked") {
      // values 10, 30, 25 vs the perfectly correlated vector itself
      BucketPipeline.bucketCorrelation(series, "m", "v",
        Seq(10.0, 30.0, 25.0)).collect().head.getDouble(0) shouldBe
        1.0 +- 1e-12
      // anti-correlated ramp vs [3,2,1] on a rising series
      val rising = Seq(("2024-01-01", 1.0), ("2024-02-01", 2.0),
        ("2024-03-01", 3.0)).toDF("m", "v")
        .withColumn("m", to_timestamp(col("m")))
      BucketPipeline.bucketCorrelation(rising, "m", "v",
        Seq(3.0, 2.0, 1.0)).collect().head.getDouble(0) shouldBe
        -1.0 +- 1e-12
      // the 1:1 length check now rides the aggregate itself (one
      // plan, no separate count() action) — still loud
      val short = intercept[Exception](
        BucketPipeline.bucketCorrelation(series, "m", "v", Seq(1.0))
          .collect())
      assert(short.getMessage.contains("align 1:1"), short.getMessage)
      // a null metric refuses in-plan instead of silently skewing
      val withNull = Seq(("2024-01-01", Some(1.0)),
        ("2024-02-01", None: Option[Double])).toDF("m", "v")
        .withColumn("m", to_timestamp(col("m")))
      val nul = intercept[Exception](
        BucketPipeline.bucketCorrelation(withNull, "m", "v",
          Seq(1.0, 2.0)).collect())
      assert(nul.getMessage.contains("null"), nul.getMessage)
    }
    it("changePoint: finds a planted step, stays stationary on flat, " +
        "empty under minSegment") {
      def series(vs: Double*) = vs.zipWithIndex.map { case (v, i) =>
        (f"2024-${i + 1}%02d", v) }.toDF("m", "v")
      // clean step: 10,10,10 -> 50,50,50
      val step = BucketPipeline.changePoint(
        series(10, 10, 10, 50, 50, 50), "m", "v",
        minSegment = 3, threshold = 5.0).collect()
      step.length shouldBe 1
      step.head.getString(0) shouldBe "2024-04" // first right-segment key
      step.head.getString(1) shouldBe "step_change"
      step.head.getDouble(3) shouldBe 10.0 // left mean
      step.head.getDouble(4) shouldBe 50.0
      // flat series: max |t| small -> stationary
      val flat = BucketPipeline.changePoint(
        series(10, 11, 10, 11, 10, 11), "m", "v",
        minSegment = 3, threshold = 5.0).collect()
      flat.head.getString(1) shouldBe "stationary"
      // too few buckets for any valid split -> zero rows (spec-pinned)
      BucketPipeline.changePoint(series(1, 2, 3), "m", "v",
        minSegment = 3).collect().length shouldBe 0
      an[IllegalArgumentException] should be thrownBy
        BucketPipeline.changePoint(series(1, 2), "m", "v",
          minSegment = 1)
      // a null metric refuses in-plan (a null _v would null the
      // prefix sums and make the split pick arbitrary) — the
      // bucket_correlation discipline
      val withNull = (1 to 6).map(i => (f"2024-$i%02d",
        if (i == 4) None: Option[Double] else Some(i.toDouble)))
        .toDF("m", "v")
      val nul = intercept[Exception](
        BucketPipeline.changePoint(withNull, "m", "v",
          minSegment = 3).collect())
      assert(nul.getMessage.contains("null"), nul.getMessage)
    }
    it("normalize: every ES method, degenerate frames go null") {
      def one(method: String, df: org.apache.spark.sql.DataFrame =
          series): Seq[Option[Double]] =
        vals(BucketPipeline.normalize(df, "v", method, "o")
          .select(col("m"), col("o")), "o")
      one("rescale_0_1") shouldBe
        Seq(Some(0.0), Some(1.0), Some(0.75))
      one("rescale_0_100") shouldBe
        Seq(Some(0.0), Some(100.0), Some(75.0))
      one("percent_of_sum") shouldBe
        Seq(Some(10.0 / 65), Some(30.0 / 65), Some(25.0 / 65))
      // z-score population: mean 65/3, var = (100+900+625)/3 - mean²
      val mean = 65.0 / 3
      val sd = math.sqrt(1625.0 / 3 - mean * mean)
      one("z-score").map(_.get) zip
        Seq((10 - mean) / sd, (30 - mean) / sd, (25 - mean) / sd) foreach {
          case (g, e) => g shouldBe e +- 1e-12
        }
      // softmax sums to 1 on small values
      val sm = one("softmax",
        Seq(("2024-01-01", 0.1), ("2024-02-01", 0.2),
          ("2024-03-01", 0.3)).toDF("m", "v")
          .withColumn("m", to_timestamp(col("m")))).map(_.get)
      sm.sum shouldBe 1.0 +- 1e-12
      // all-equal buckets: rescale/mean/z-score are null, not NaN
      val flat = Seq(("2024-01-01", 5.0), ("2024-02-01", 5.0))
        .toDF("m", "v").withColumn("m", to_timestamp(col("m")))
      one("rescale_0_1", flat) shouldBe Seq(None, None)
      one("z-score", flat) shouldBe Seq(None, None)
      an[IllegalArgumentException] should be thrownBy
        BucketPipeline.normalize(series, "v", "nope")
    }
    it("percentilesBucket: exact R-7 over all buckets, one row") {
      val r = BucketPipeline.percentilesBucket(series, "v",
        Seq(0.0, 0.5, 0.75, 1.0, 0.999)).collect().head
      // sorted [10, 25, 30]
      r.getAs[Double]("p0") shouldBe 10.0
      r.getAs[Double]("p50") shouldBe 25.0
      // R-7 at .75 over 3 values: h = 1.5 → 25 + 0.5·5 = 27.5
      r.getAs[Double]("p75") shouldBe 27.5
      r.getAs[Double]("p100") shouldBe 30.0
      // non-integral percent gets an underscore name
      r.schema.fieldNames should contain("p99_9")
      an[IllegalArgumentException] should be thrownBy
        BucketPipeline.percentilesBucket(series, "v", Nil)
      an[IllegalArgumentException] should be thrownBy
        BucketPipeline.percentilesBucket(series, "v", Seq(1.5))
      an[IllegalArgumentException] should be thrownBy
        BucketPipeline.percentilesBucket(series, "v", Seq(0.5, 0.5))
    }
    it("movingPercentile interpolates over the window") {
      // window 3 incl current at bucket 3: values [10, 30, 25],
      // p=.5 → sorted [10,25,30] → 25
      vals(BucketPipeline.movingPercentile(series, "m", "v", 3, 0.5,
        shift = 1, out = "mp"), "mp")(2).get shouldBe 25.0
      // p=.25 over [10,25,30]: pos 0.5 → 10 + 0.5·15 = 17.5
      vals(BucketPipeline.movingPercentile(series, "m", "v", 3, 0.25,
        shift = 1, out = "mp"), "mp")(2).get shouldBe 17.5
    }
  }

  describe("fillEmptyBuckets (min_doc_count 0)") {
    it("materializes the missing buckets with the fill values") {
      val sparse = Seq(("2024-01-01", 5L), ("2024-04-01", 7L))
        .toDF("m", "n").withColumn("m", to_timestamp(col("m")))
      val out = BucketPipeline.fillEmptyBuckets(sparse, "m", "month",
        fill = Map("n" -> lit(0L)))
      out.count() shouldBe 4
      out.orderBy("m").select("n").collect().map(_.getLong(0))
        .toSeq shouldBe Seq(5L, 0L, 0L, 7L)
      // pipeline aggs over the filled frame see the zeros
      val cum = BucketPipeline.cumulativeSum(out, "m", "n", "c")
      cum.orderBy("m").select("c").collect().map(_.getLong(0))
        .toSeq shouldBe Seq(5L, 5L, 5L, 12L)
    }
    it("fills per series over the shared spine") {
      val sparse = Seq(("a", "2024-01-01", 1L), ("a", "2024-03-01", 2L),
        ("b", "2024-02-01", 3L)).toDF("s", "m", "n")
        .withColumn("m", to_timestamp(col("m")))
      val out = BucketPipeline.fillEmptyBuckets(sparse, "m", "month",
        seriesBy = Seq("s"), fill = Map("n" -> lit(0L)))
      out.count() shouldBe 6 // 2 series × 3 months
      out.filter(col("s") === "b" && col("n") === 0L).count() shouldBe 2
    }
    it("refuses unknown intervals and unknown fill columns") {
      val b = Seq(("2024-01-01", 1L)).toDF("m", "n")
        .withColumn("m", to_timestamp(col("m")))
      an[IllegalArgumentException] should be thrownBy
        BucketPipeline.fillEmptyBuckets(b, "m", "fortnight")
      an[IllegalArgumentException] should be thrownBy
        BucketPipeline.fillEmptyBuckets(b, "m", "month",
          fill = Map("nope" -> lit(0)))
    }
  }

  describe("cumulative_cardinality") {
    it("counts first appearances and carries totals over quiet buckets") {
      val raw = Seq(
        ("2024-01-01", "u1"), ("2024-01-01", "u2"),
        ("2024-02-01", "u2"), ("2024-02-01", "u3"),
        ("2024-04-01", "u1"))
        .toDF("m", "u").withColumn("m", to_timestamp(col("m")))
      val buckets = raw.groupBy("m").agg(count(lit(1)).as("n"))
        // add an empty-but-present bucket shape via the March gap:
        // only buckets with raw rows exist here; April has no NEW user
      val out = BucketPipeline.cumulativeCardinality(
        buckets, raw, col("m"), "u", "m", "cc")
      out.orderBy("m").select("cc", "cc_new").collect().toSeq shouldBe
        Seq(Row(2L, 2L), Row(3L, 1L), Row(3L, 0L))
    }
    it("refuses output-column collisions") {
      val raw = Seq(("2024-01-01", "u1")).toDF("m", "u")
        .withColumn("m", to_timestamp(col("m")))
      val buckets = raw.groupBy("m").agg(count(lit(1)).as("cc"))
      an[IllegalArgumentException] should be thrownBy
        BucketPipeline.cumulativeCardinality(
          buckets, raw, col("m"), "u", "m", "cc")
    }
  }
}
