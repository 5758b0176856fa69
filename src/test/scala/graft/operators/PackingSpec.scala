package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = spark.range(500).toDF("id")
    .withColumn("tok", pmod(col("id") * 37 + 11, lit(90)) + 10)

  test("two-phase distributed prefix sum equals the single-partition window") {
    val got = Packing.packByBudget(docs, "id", "tok", budget = 256,
      partitions = 7)
    val w = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val exp = docs
      .withColumn("cum_before", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("bin", expr("cum_before div 256"))
      .select(col("id"), col("tok").cast("long").as("n_tokens"),
        col("cum_before"), col("bin"))
    val diff = got.join(exp, Seq("id"))
      .filter(got("n_tokens") =!= exp("n_tokens") ||
        got("cum_before") =!= exp("cum_before") || got("bin") =!= exp("bin"))
    assert(got.count() == 500)
    assert(diff.count() == 0)
  }

  test("partition count does not change the layout") {
    val a = Packing.packByBudget(docs, "id", "tok", 512, partitions = 3)
      .orderBy("id").collect().toSeq
    val b = Packing.packByBudget(docs, "id", "tok", 512, partitions = 13)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("bins are contiguous in id order and fill to the budget") {
    val rows = Packing.packByBudget(docs, "id", "tok", 512)
      .orderBy("id").collect()
    // bin ids never decrease along the layout order
    assert(rows.sliding(2).forall(p =>
      p(0).getAs[Long]("bin") <= p(1).getAs[Long]("bin")))
    val stats = Packing.binStats(
      Packing.packByBudget(docs, "id", "tok", 512), 512)
      .orderBy("bin").collect()
    val lastBin = stats.last.getAs[Long]("bin")
    // every bin except the last starts within budget of its boundary:
    // total >= budget - (max doc size) is guaranteed by construction
    stats.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("total_tokens") >= 512 - 99,
        s"bin ${r.getAs[Long]("bin")} underfilled")
      assert(r.getAs[Long]("bin") < lastBin)
    }
  }

  test("packSequences: layout-ordered members, boundary-joined text, " +
    "budget-bounded bins") {
    import spark.implicits._
    val d = Seq((0L, "alpha one", 4L), (1L, "beta two", 4L),
      (2L, "gamma three", 4L), (3L, "delta four", 4L))
      .toDF("id", "text", "tok")
    val out = Packing.packSequences(d, "id", "tok", "text", budget = 8,
        sep = " | ")
      .orderBy("bin").collect()
    // cum_before 0,4,8,12 -> bins 0,0,1,1
    assert(out.length == 2)
    assert(out(0).getAs[scala.collection.Seq[Long]]("doc_ids").toSeq ==
      Seq(0L, 1L))
    assert(out(0).getAs[String]("packed_text") == "alpha one | beta two")
    assert(out(0).getAs[Long]("total_tokens") == 8L)
    assert(out(1).getAs[scala.collection.Seq[Long]]("doc_ids").toSeq ==
      Seq(2L, 3L))
    assert(out(1).getAs[String]("packed_text") == "gamma three | delta four")
    // membership agrees with packByBudget's assignment on a bigger mix
    val seqs = Packing.packSequences(
      docs.withColumn("text", concat(lit("d"), col("id"))),
      "id", "tok", "text", budget = 256)
    val fromSeqs = seqs.select(col("bin"), explode(col("doc_ids")).as("id"))
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val fromPack = Packing.packByBudget(docs, "id", "tok", 256)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(fromSeqs == fromPack)
    // a zero-token row breaks the budget-bounded-bin invariant and
    // must refuse loudly, not pile rows silently into one bin
    val withEmpty = d.union(Seq((9L, "", 0L)).toDF("id", "text", "tok"))
    val e = intercept[IllegalArgumentException] {
      Packing.packSequences(withEmpty, "id", "tok", "text", budget = 8)
    }
    assert(e.getMessage.contains(">= 1 token"), e.getMessage)
    // NULL text (tokens >= 1) packs as an EMPTY segment: array_join
    // would otherwise drop the element and misalign doc_ids with
    // separator-split segments
    val withNull = d.union(Seq((9L, null: String, 4L))
      .toDF("id", "text", "tok"))
    val nOut = Packing.packSequences(withNull, "id", "tok", "text",
        budget = 100, sep = " | ")
      .head()
    assert(nOut.getAs[scala.collection.Seq[Long]]("doc_ids").toSeq ==
      Seq(0L, 1L, 2L, 3L, 9L))
    assert(nOut.getAs[String]("packed_text") ==
      "alpha one | beta two | gamma three | delta four | ")
    assert(nOut.getAs[String]("packed_text").split(" \\| ", -1).length == 5)
  }

  test("length-bucketed batches: similar lengths share a batch, " +
      "padding accounts exactly") {
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    // lengths 10,10,9,9 | 5,5,4,4 → two batches of 4 at batchSize 4
    val df = Seq((1L, 10L), (2L, 10L), (3L, 9L), (4L, 9L),
      (5L, 5L), (6L, 5L), (7L, 4L), (8L, 4L)).toDF("id", "len")
    val b = Packing.lengthBucketedBatches(df, "id", "len", 4)
    val byBatch = b.collect()
      .groupBy(_.getAs[Long]("batch_id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("id")).toSet }
    assert(byBatch(0L) == Set(1L, 2L, 3L, 4L))
    assert(byBatch(1L) == Set(5L, 6L, 7L, 8L))
    val stats = Packing.batchPaddingStats(b, "len").collect()
    // batch 0: max 10, sum 38 → padding (40-38)/40
    assert(stats(0).getAs[Double]("padding_frac") == 2.0 / 40)
    assert(stats(1).getAs[Long]("max_len") == 5L)
    intercept[IllegalArgumentException](
      Packing.lengthBucketedBatches(df, "id", "len", 0))
  }

  test("empty input and single row") {
    val empty = Packing.packByBudget(docs.filter(col("id") < 0), "id", "tok", 64)
    assert(empty.count() == 0)
    val one = Packing.packByBudget(docs.filter(col("id") === 7), "id", "tok", 64)
      .head()
    assert(one.getAs[Long]("cum_before") == 0L && one.getAs[Long]("bin") == 0L)
  }
}
