package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: re-time a comma-separated list of SparkEntry queries in
  * ISOLATION (same measurement discipline as Bench — warmup, noop
  * sink, cache clear) to separate real regressions from load noise.
  */
object Retime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    graft.SparkEntry.queries("a18_len")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    names.foreach { n =>
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"[retime] $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
