package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** Executed-plan helpers for the bucketed-layout pins: walking through
  * the AQE wrappers (plan.collect does not descend into finalized
  * stages) and asserting the co-location property the bucketed stores
  * exist for — registry/ledger rows reach their probe join
  * pre-partitioned, with no Exchange between scan and join.
  */
object PlanCheck {

  /** All nodes, descending through AQE/stage/reuse wrappers. */
  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Bucketed file scans whose location matches `pathSubstring`. */
  def bucketedScans(p: SparkPlan,
                    pathSubstring: String): Seq[FileSourceScanExec] =
    flatten(p).collect {
      case f: FileSourceScanExec if f.bucketedScan &&
        f.relation.location.rootPaths
          .exists(_.toString.contains(pathSubstring)) => f
    }

  /** Ancestors of `scan` under `root`, nearest first, stopping BEFORE
    * the first join — the segment of the plan where an Exchange would
    * mean the bucketed side reshuffled on its way into its probe.
    */
  private def ancestorsToJoin(root: SparkPlan,
                              scan: SparkPlan): Seq[SparkPlan] = {
    def kids(p: SparkPlan) = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    def go(p: SparkPlan, acc: List[SparkPlan]): Option[List[SparkPlan]] =
      if (p eq scan) Some(acc)
      else kids(p).view.flatMap(k => go(k, p :: acc)).headOption
    go(root, Nil).getOrElse(Nil)
      .takeWhile(!_.isInstanceOf[BaseJoinExec])
  }

  /** Assert every bucketed scan under `pathSubstring` reaches its
    * nearest join ancestor without an Exchange; returns how many scans
    * were checked so callers can assert non-vacuity.
    */
  def requireCoLocatedProbes(root: SparkPlan,
                             pathSubstring: String): Int = {
    val scans = bucketedScans(root, pathSubstring)
    scans.foreach { scan =>
      val between = ancestorsToJoin(root, scan)
      assert(!between.exists(_.isInstanceOf[Exchange]),
        s"Exchange between bucketed scan and its join:\n$root")
    }
    scans.size
  }

  /** Same no-Exchange-to-join property for PLAIN (non-bucketed) file
    * scans under `pathSubstring` — the corpus-stays-put pin for scans
    * that must enter a broadcast join map-side rather than reshuffle
    * (e.g. an index's pruned vectors feeding the broadcast query
    * frame). Returns the number of scans checked.
    */
  def requireUnshuffledScanToJoin(root: SparkPlan,
                                  pathSubstring: String): Int = {
    val scans = flatten(root).collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains(pathSubstring)) => f
    }
    scans.foreach { scan =>
      val between = ancestorsToJoin(root, scan)
      assert(!between.exists(_.isInstanceOf[Exchange]),
        s"Exchange between scan and its join:\n$root")
    }
    scans.size
  }
}
