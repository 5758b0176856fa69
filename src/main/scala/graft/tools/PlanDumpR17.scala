package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** r17-opt deliverable helper: dump `.explain("formatted")` for the
  * named gates to `<outDir>/<name>_<suffix>.txt`.
  * usage: runMain graft.tools.PlanDumpR17 <outDir> <suffix> <q1,q2,...>
  * (gates with build side effects run them at sf0.001 — the plan of
  * the RETURNED frame is what lands in the file).
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDumpR17 <outDir> <suffix> <names>")
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
