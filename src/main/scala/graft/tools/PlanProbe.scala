package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: print a named query's optimized plan (for checking
  * expression duplication / staging questions).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    val p = df.queryExecution.optimizedPlan.toString
    println("[probe] split_occurrences=" + "split".r.findAllIn(p).length)
    println(p.linesIterator.take(12).map("[probe] " + _).mkString("\n"))
    spark.stop()
  }
}
