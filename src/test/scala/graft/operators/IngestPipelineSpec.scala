package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IngestPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("processors run in order; set override/copy_from; remove; " +
      "rename; trim/case; split/join round-trip") {
    val df = Seq((1L, "  A-B  ", null.asInstanceOf[String]))
      .toDF("id", "raw", "maybe")
    val out = IngestPipeline(
      """{"processors": [
        |  {"trim": {"field": "raw"}},
        |  {"lowercase": {"field": "raw", "target_field": "lo"}},
        |  {"split": {"field": "lo", "separator": "-"}},
        |  {"join": {"field": "lo", "separator": "|"}},
        |  {"set": {"field": "maybe", "value": "filled",
        |    "override": false}},
        |  {"set": {"field": "tag", "copy_from": "maybe"}},
        |  {"rename": {"field": "raw", "target_field": "trimmed"}},
        |  {"remove": {"field": "id"}},
        |  {"remove": {"field": "ghost", "ignore_missing": true}}
        |]}""".stripMargin)(df)
    assert(out.columns.toSeq == Seq("trimmed", "maybe", "lo", "tag"))
    val r = out.collect().head
    assert(r.getAs[String]("trimmed") == "A-B")
    assert(r.getAs[String]("lo") == "a|b")
    assert(r.getAs[String]("maybe") == "filled") // null -> filled
    assert(r.getAs[String]("tag") == "filled")
    // override:false never clobbers a present value
    val kept = IngestPipeline(
      """{"processors": [{"set": {"field": "maybe", "value": "x",
        |"override": false}}]}""".stripMargin)(
      Seq("there").toDF("maybe")).collect().head.getString(0)
    assert(kept == "there")
  }

  test("convert: loud failure on unparseable non-null, " +
      "ignore_failure nulls instead; append scalar-promotes") {
    val df = Seq("12", "nope").toDF("v")
    val ok = IngestPipeline(
      """{"processors": [{"convert": {"field": "v", "type": "long",
        |"ignore_failure": true}}]}""".stripMargin)(df)
      .collect().map(r => Option(r.get(0))).toSeq
    assert(ok == Seq(Some(12L), None))
    val boom = intercept[Exception](IngestPipeline(
      """{"processors": [{"convert": {"field": "v",
        |"type": "long"}}]}""".stripMargin)(df).collect())
    assert(boom.getMessage.contains("cannot parse"), boom.getMessage)
    // append on a scalar makes [old, new...] (ES's promotion)
    val ap = IngestPipeline(
      """{"processors": [{"append": {"field": "v",
        |"value": ["x", "y"]}}]}""".stripMargin)(
      Seq("a").toDF("v")).collect().head.getSeq[String](0)
    assert(ap == Seq("a", "x", "y"))
    // append creates a missing field
    val created = IngestPipeline(
      """{"processors": [{"append": {"field": "w",
        |"value": [1, 2]}}]}""".stripMargin)(
      Seq("a").toDF("v")).collect().head.getSeq[Long](1)
    assert(created == Seq(1L, 2L))
  }

  test("date: format ladder first-match; no-match fails loudly; " +
      "UNIX_MS parses epoch millis") {
    val df = Seq("2020-03-04 05:06:07").toDF("ts")
    val out = IngestPipeline(
      """{"processors": [{"date": {"field": "ts",
        |"formats": ["UNIX", "yyyy-MM-dd HH:mm:ss"]}}]}""".stripMargin)(
      df).select(col("@timestamp").cast("string")).collect().head
    assert(out.getString(0) == "2020-03-04 05:06:07")
    val ms = IngestPipeline(
      """{"processors": [{"date": {"field": "ms",
        |"formats": ["UNIX_MS"], "target_field": "t"}}]}""".stripMargin)(
      Seq(86400000L).toDF("ms"))
      .select(col("t").cast("string")).collect().head.getString(0)
    assert(ms == "1970-01-02 00:00:00")
    val boom = intercept[Exception](IngestPipeline(
      """{"processors": [{"date": {"field": "ts",
        |"formats": ["UNIX"]}}]}""".stripMargin)(df).collect())
    assert(boom.getMessage.contains("matches none"), boom.getMessage)
  }

  test("dissect: non-greedy splits, longest tail, anchored; " +
      "no-match fails; ambiguous/repeated patterns refuse") {
    val df = Seq("a-b-c").toDF("v")
    val r = IngestPipeline(
      """{"processors": [{"dissect": {"field": "v",
        |"pattern": "%{x}-%{y}"}}]}""".stripMargin)(df)
      .select("x", "y").collect().head
    // first key is non-greedy, the LAST takes the tail
    assert(r.getString(0) == "a" && r.getString(1) == "b-c")
    val boom = intercept[Exception](IngestPipeline(
      """{"processors": [{"dissect": {"field": "v",
        |"pattern": "%{x}:%{y}"}}]}""".stripMargin)(df).collect())
    assert(boom.getMessage.contains("does not match"), boom.getMessage)
    intercept[IllegalArgumentException](IngestPipeline(
      """{"processors": [{"dissect": {"field": "v",
        |"pattern": "%{x}%{y}"}}]}""".stripMargin)(df))
    intercept[IllegalArgumentException](IngestPipeline(
      """{"processors": [{"dissect": {"field": "v",
        |"pattern": "%{x}-%{x}"}}]}""".stripMargin)(df))
  }

  test("enrich: broadcast lookup as a struct; duplicate policy key " +
      "fails loudly; unknown policy refuses") {
    val facts = Seq((1L, "alpha", 10L), (2L, "beta", 20L))
      .toDF("k", "name", "w")
    val pol = Map("p" -> IngestPipeline.EnrichPolicy(
      facts, "k", Seq("name", "w")))
    val out = IngestPipeline(
      """{"processors": [{"enrich": {"policy_name": "p",
        |"field": "fk", "target_field": "e"}}]}""".stripMargin, pol)(
      Seq(1L, 3L).toDF("fk"))
      .select(col("fk"), col("e.name"), col("e.w"))
      .orderBy("fk").collect()
    assert(out(0).getString(1) == "alpha" && out(0).getLong(2) == 10L)
    assert(out(1).isNullAt(1)) // no match -> null object
    val dup = Map("p" -> IngestPipeline.EnrichPolicy(
      facts.unionAll(facts), "k", Seq("name")))
    val boom = intercept[Exception](IngestPipeline(
      """{"processors": [{"enrich": {"policy_name": "p",
        |"field": "fk", "target_field": "e"}}]}""".stripMargin, dup)(
      Seq(1L).toDF("fk")).collect())
    assert(boom.getMessage.contains("duplicate match key"),
      boom.getMessage)
    intercept[IllegalArgumentException](IngestPipeline(
      """{"processors": [{"enrich": {"policy_name": "nope",
        |"field": "fk", "target_field": "e"}}]}""".stripMargin, pol)(
      Seq(1L).toDF("fk")))
  }

  test("refusal arms: script, grok, fail/drop, per-processor if, " +
      "rename onto an existing column, missing source") {
    val df = Seq("a").toDF("v")
    def boom(json: String): IllegalArgumentException =
      intercept[IllegalArgumentException](IngestPipeline(json)(df))
    assert(boom("""{"processors": [{"script": {"source": "x"}}]}""")
      .getMessage.contains("Painless"))
    assert(boom("""{"processors": [{"grok": {"field": "v",
      |"patterns": ["%{IP:c}"]}}]}""".stripMargin)
      .getMessage.contains("dissect"))
    assert(boom("""{"processors": [{"drop": {}}]}""")
      .getMessage.contains("Column predicate"))
    assert(boom("""{"processors": [{"lowercase": {"field": "v",
      |"if": "ctx.v != null"}}]}""".stripMargin)
      .getMessage.contains("Painless"))
    assert(boom("""{"processors": [{"rename": {"field": "v",
      |"target_field": "v"}}]}""".stripMargin)
      .getMessage.contains("already exists"))
    assert(boom("""{"processors": [{"lowercase":
      |{"field": "ghost"}}]}""".stripMargin)
      .getMessage.contains("does not exist"))
  }
}
