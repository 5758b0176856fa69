package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Dev-only scale sanity check: replicate the sf0.1 documents Nx with
  * fresh ids (each replica's text gets a distinguishing suffix token so
  * near-dup structure is preserved rather than exploding into exact
  * duplicates) and watch how the dedup/similarity pipelines scale.
  * Linear-ish growth = the plan shape survives scale-up; superlinear =
  * a bucket or join is quadratic.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val n0 = docs.count()

    val big = docs
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("doc_id") * mult + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
    big.write.mode("overwrite").parquet("/tmp/scale_docs")
    val scaled = spark.read.parquet("/tmp/scale_docs")
    println(s"[scale] corpus: ${n0} -> ${scaled.count()} docs")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $name%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    time("exactStats") { Dedup.exactStats(scaled, "text").count() }
    time("minhashLshPairs") {
      Dedup.minhashLshPairs(scaled, "doc_id", "text", threshold = 0.5).count()
    }
    time("simhash sketches") {
      scaled.select(graft.functions.TextAnalysis.simhash64(col("text"))).count()
    }
    spark.stop()
  }
}
