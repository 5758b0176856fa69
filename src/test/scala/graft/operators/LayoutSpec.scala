package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleaveBits: hand-computed Morton code") {
    // x = 0b101 -> bits at output positions 0,4; y = 0b011 -> 1,3
    val out = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), 3).as("z"))
      .collect()(0).getLong(0)
    assert(out == ((1L << 0) | (1L << 4) | (1L << 1) | (1L << 3)))
    // one column degenerates to the identity (bit j -> bit j)
    val id = Seq(Tuple1(173L)).toDF("x")
      .select(Layout.interleaveBits(Seq(col("x")), 8).as("z"))
      .collect()(0).getLong(0)
    assert(id == 173L)
  }

  test("withZorderKey: min->0, max->all-ones, constant column->0") {
    val df = Seq((0L, 10L, 7L), (1L, 30L, 7L), (2L, 50L, 7L))
      .toDF("id", "a", "c")
    val m = Layout.withZorderKey(df, Seq("a", "c"), bits = 8)
      .select("id", "zkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // c is constant -> bucket 0 everywhere; a buckets 0/127/255 and
    // lands on the even (i=0) bit positions
    def spread(b: Long): Long =
      (0 until 8).map(j => ((b >> j) & 1L) << (2 * j)).reduce(_ | _)
    assert(m(0L) == spread(0L))
    assert(m(1L) == spread(127L))   // (20*255) div 40 = 127
    assert(m(2L) == spread(255L))
    // non-integral layout column refuses loudly
    val bad = Seq((1L, 0.5)).toDF("id", "d")
    assert(intercept[IllegalArgumentException] {
      Layout.withZorderKey(bad, Seq("d"))
    }.getMessage.contains("integral"))
  }

  test("withZorderKey: wide spans take the divide regime (no overflow), " +
    "a span beyond a signed long refuses loudly") {
    // span ~ Long.MaxValue/2 — the multiply formula would overflow;
    // buckets must stay in [0, 255] and be monotone in the value
    val wide = Seq((0L, 0L), (1L, Long.MaxValue / 4), (2L, Long.MaxValue / 2))
      .toDF("id", "v").withColumn("c", lit(1L))
    val keys = Layout.withZorderKey(wide, Seq("v", "c"), bits = 8)
      .orderBy("id").select("zkey").collect().map(_.getLong(0))
    assert(keys.forall(k => k >= 0 && k < (1L << 16)))
    assert(keys(0) < keys(1) && keys(1) < keys(2))
    // min near Long.MinValue, max near Long.MaxValue: span overflows
    val bad = Seq((0L, Long.MinValue + 1), (1L, Long.MaxValue)).toDF("id", "v")
    val e = intercept[Exception] {
      Layout.withZorderKey(bad, Seq("v"), bits = 8).collect()
    }
    assert(e.getMessage.contains("exceeds a signed long"), e.getMessage)
    // names that would break the spliced expr() SQL refuse loudly
    // BEFORE any parse (backtick in the reference, quote in the
    // raise_error literal)
    for (evil <- Seq("v`x", "v'x", "v\\x")) {
      val f = Seq((0L, 1L)).toDF("id", evil)
      val ne = intercept[IllegalArgumentException] {
        Layout.withZorderKey(f, Seq(evil), bits = 8)
      }
      assert(ne.getMessage.contains("rename"), ne.getMessage)
    }
  }

  test("zorderBy: partitions cover compact boxes — a y-band query " +
    "prunes most z-ordered partitions but NO x-sorted ones") {
    // 64x64 grid; both layouts into 16 range partitions
    val grid = spark.range(64L * 64)
      .select((col("id") / 64).cast("long").as("x"),
        pmod(col("id"), lit(64)).cast("long").as("y"))
    def partitionBoxes(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("y").as("y0"), max("y").as("y1"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val zBoxes = partitionBoxes(
      Layout.zorderBy(grid, Seq("x", "y"), bits = 6, partitions = 16))
    val xBoxes = partitionBoxes(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    // query: y in [8, 15], any x — partitions whose y-range intersects
    def hit(b: (Long, Long)) = b._1 <= 15 && b._2 >= 8
    val zHits = zBoxes.count(hit)
    val xHits = xBoxes.count(hit)
    assert(xHits == xBoxes.length)   // x-sort: every partition spans all y
    assert(zHits * 2 <= zBoxes.length,
      s"z-order should prune >= half the partitions, hit $zHits/${zBoxes.length}")
    // the layout is a permutation: nothing lost or duplicated
    assert(Layout.zorderBy(grid, Seq("x", "y"), bits = 6).count() == 64L * 64)
  }
}
