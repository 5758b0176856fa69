package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileRepetition {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $tag%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    // warm
    docs.write.mode("overwrite").format("noop").save()
    // kernel alone on raw docs (1 partition)
    time("kernel raw (1 part)") {
      docs.select(graft.plans.TokenRepetitionSignals(col("text")))
        .write.mode("overwrite").format("noop").save()
    }
    time("kernel raw again") {
      docs.select(graft.plans.TokenRepetitionSignals(col("text")))
        .write.mode("overwrite").format("noop").save()
    }
    time("kernel repart 32") {
      docs.repartition(32)
        .select(graft.plans.TokenRepetitionSignals(col("text")))
        .write.mode("overwrite").format("noop").save()
    }
    // full gate
    time("t13 full gate") {
      graft.SparkEntry.queries("t13_repetition_signals")(spark, "/root/testdata/sf0.1")
        .write.mode("overwrite").format("noop").save()
    }
    time("t13 full gate again") {
      graft.SparkEntry.queries("t13_repetition_signals")(spark, "/root/testdata/sf0.1")
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
