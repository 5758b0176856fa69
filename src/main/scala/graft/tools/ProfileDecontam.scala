package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Scratch profiling main (dev-only): where does the decontamination
  * sweep spend its time at replicated scale?
  */
object ProfileDecontam {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scaled = spark.read.parquet("/tmp/scale_docs")
    println(s"[prof] docs=${scaled.count()}")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val grams = scaled
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
      .select(col("doc_id"),
        explode(TextAnalysis.shinglesFromTokens(col("_toks"), 3)).as("_gram"))
    time("corpus gram explode") { grams.count() }

    val benchGrams = scaled.filter(col("doc_id") % 500 === 0)
      .select(TextAnalysis.tokens(col("text")).as("_toks"))
      .select(explode(TextAnalysis.shinglesFromTokens(col("_toks"), 3))
        .as("_gram"))
      .distinct()
    time("bench grams distinct") { benchGrams.count() }

    val joined = grams.join(broadcast(benchGrams), Seq("_gram"))
    time("broadcast join") { joined.count() }
    time("join+countDistinct") {
      joined.groupBy("doc_id")
        .agg(count_distinct(col("_gram"))).count()
    }
    time("contaminationReport e2e") {
      graft.operators.Decontam.contaminationReport(scaled, "doc_id", "text",
        scaled.filter(col("doc_id") % 500 === 0), "text", 3).count()
    }
    time("contaminationReport again") {
      graft.operators.Decontam.contaminationReport(scaled, "doc_id", "text",
        scaled.filter(col("doc_id") % 500 === 0), "text", 3).count()
    }
    spark.stop()
  }
}
