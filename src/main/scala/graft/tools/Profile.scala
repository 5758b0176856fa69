package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Scratch profiling main (dev-only). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, d, "documents")
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }

    time("shingles only") {
      docs.select(TextAnalysis.shingles(col("text"), 3).as("sh"))
        .select(sum(size(col("sh")))).head(); 1L
    }
    val sig = docs.select(col("doc_id").as("id"),
        TextAnalysis.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("id"), transform(col("tk"), t => xxhash64(t)).as("th"))
      .select(col("id"),
        transform(sequence(lit(1), size(col("th")) - lit(2)),
          i => xxhash64(element_at(col("th"), i), element_at(col("th"), i + 1),
            element_at(col("th"), i + 2))).as("hs"))
      .select(col("id"), Dedup.minhashFromHashes(col("hs"), 64).as("sig"))
    time("signatures") { sig.select(sum(pmod(element_at(col("sig"), 1), lit(997L)))).head(); 1L }
    val sigP = sig.persist()
    time("persist sigs") { sigP.count() }
    val banded = sigP.select(col("id"), col("sig"),
      explode(array((0 until 16).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until 4).map(r => element_at(col("sig"), b*4+r+1)): _*).as("bh"))
      }: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bh"))
    time("banded count") { banded.count() }
    val l = banded.select(col("band"), col("bh"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bh"), col("id").as("id_b"), col("sig").as("sig_b"))
    val joined = l.join(r, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
    time("join candidates") { joined.count() }
    time("full minhashLshPairs") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.2).count()
    }
    spark.stop()
  }
}
// appended: quantile path comparison (dev)
object ProfileQuantiles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    li.count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    time("builtin percentile x3") {
      li.agg(expr("percentile(l_extendedprice, array(0.25,0.5,0.75))")).head()
    }
    time("viaSort x3") {
      graft.operators.Quantiles.viaSort(li, "l_extendedprice",
        Seq(0.25, 0.5, 0.75)).count()
    }
    time("builtin percentile again") {
      li.agg(expr("percentile(l_extendedprice, array(0.25,0.5,0.75))")).head()
    }
    time("viaSort again") {
      graft.operators.Quantiles.viaSort(li, "l_extendedprice",
        Seq(0.25, 0.5, 0.75)).count()
    }
    spark.stop()
  }
}
