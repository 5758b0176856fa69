package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query runner: `runMain graft.tools.RunQuery <name>
  * <sfDir> [showN] [repeat]` — prints row count and the first rows.
  * `repeat` > 1 re-runs in the warm session (cache cleared between
  * runs, like Bench) so the later timings exclude JVM/session startup.
  * For iterating on one gate without a full Verify pass.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunQuery <queryName> <sfDir> [showN] [repeat]")
    val name = args(0)
    val dir = args(1)
    val showN = if (args.length > 2) args(2).toInt else 10
    val repeat = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    var shown = false
    for (it <- 1 to repeat) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = q(spark, dir).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[runquery] $name run$it rows=${rows.length} ${sec}%.2fs")
      if (!shown) { rows.take(showN).foreach(r => println(s"[runquery] $r")); shown = true }
    }
    spark.stop()
  }
}
