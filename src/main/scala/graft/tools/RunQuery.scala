package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query runner: `runMain graft.tools.RunQuery <name>
  * <sfDir> [showN]` — prints row count and the first rows. For
  * iterating on one gate without a full Verify pass.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunQuery <queryName> <sfDir> [showN]")
    val name = args(0)
    val dir = args(1)
    val showN = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    val t0 = System.nanoTime()
    val df = q(spark, dir)
    val rows = df.collect()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[runquery] $name rows=${rows.length} ${sec}%.2fs")
    rows.take(showN).foreach(r => println(s"[runquery] $r"))
    spark.stop()
  }
}
