package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator family; each entry
  * has a DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (sketches, LSH, sampling), in which case the driver
  * records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.FacadeQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.AggQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.FacadeQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.AggQueries.oracles
}
