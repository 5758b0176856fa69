package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.WordPiece

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

    val model = WordPiece.train(docs, "text", numMerges = 12)
    println(s"[prof] vocab size = ${model.vocab.size}")

    val toks = docs.select(col("doc_id"),
      posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "token")))
    time("distinct tokens") { toks.select("token").distinct().count() }
    time("segment distinct only") {
      toks.select("token").distinct()
        .withColumn("pieces", WordPiece.wordPieceSegment(col("token"), model))
        .select(sum(size(col("pieces")))).head(); 1L
    }
    time("join+explode dummy pieces") {
      val seg = toks.select("token").distinct()
        .withColumn("pieces", array(col("token")))
      toks.join(broadcast(seg), Seq("token"))
        .select(col("doc_id"), posexplode(col("pieces"))).count()
    }
    time("full encode") {
      WordPiece.wordPieceEncodeExploded(docs, "doc_id", "text", model).count()
    }
    val enc = WordPiece.wordPieceEncodeExploded(docs, "doc_id", "text", model)
    enc.count()
    val plan = enc.queryExecution.executedPlan.toString
    println("[prof] aggregate-in-plan occurrences after join: " +
      plan.linesIterator.count(_.contains("aggregate(sequence")))
    println(plan.linesIterator.filter(_.contains("Generate")).take(4)
      .mkString("[prof] ", "\n[prof] ", ""))
    spark.stop()
  }
}
