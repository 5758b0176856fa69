package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMP probe: hamming distribution of simhash64 over high-jaccard
  * candidate pairs.
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = graft.Tables.load(spark, dir, "documents")
      val cand = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.2,
        maxBucketSize = 100)
      val verified = graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text",
        cand.select("id_a", "id_b"), shingleN = 3)
        .filter(col("jaccard") >= 0.7)
      val sh = docs.select(col("doc_id"),
        graft.functions.TextAnalysis.simhash64(col("text")).as("sh"))
      val j = verified
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), col("jaccard"),
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("ham"))
      println(s"[probe] $dir")
      j.groupBy((col("jaccard") * 10).cast("int").as("jx"))
        .agg(count(lit(1)).as("n"), max("ham").as("max_ham"),
          expr("percentile(ham, 0.9)").as("p90_ham"))
        .orderBy("jx")
        .collect().foreach(r => println(s"[probe] $r"))
    }
    spark.stop()
  }
}
