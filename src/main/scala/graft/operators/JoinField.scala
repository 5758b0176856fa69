package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES join-field faces — the `has_child` / `has_parent` queries and
  * the `children` aggregation — re-expressed over NORMALIZED
  * parent/child frames. ES's join field forces both document types
  * into ONE index (routed to the same shard) because Lucene cannot
  * join across indexes, and its docs warn the queries can be
  * "hundreds of times slower" for it; a relational engine has no such
  * constraint, so the Spark-native shape is two frames and id-keyed
  * joins — identical semantics, none of the single-shard cliff, and
  * Catalyst/AQE pick broadcast vs shuffle per side like any other
  * join. (eland's `TEST_MAPPING1` fixture carries a join field;
  * queries over it only ever pass through raw DSL.)
  */
object JoinField {

  /** ES `has_child`: parents with at least `minChildren` (and at most
    * `maxChildren`, when given) children matching `childPred` — the
    * query's own min_children/max_children knobs. With the default
    * 1/∞ bounds this is a plain left-semi join (no aggregation at
    * all); with bounds it is one child-side counted aggregation on
    * the FK followed by the same semi join. The child predicate
    * pushes into the child scan either way.
    */
  def hasChild(parents: DataFrame, children: DataFrame,
               parentIdCol: String, childParentCol: String,
               childPred: Column,
               minChildren: Int = 1,
               maxChildren: Option[Int] = None): DataFrame = {
    require(minChildren >= 1,
      s"min_children must be >= 1, got $minChildren")
    maxChildren.foreach(mx => require(mx >= minChildren,
      s"max_children $mx below min_children $minChildren"))
    val matched = children.filter(childPred)
      .select(col(childParentCol).as(parentIdCol))
    val keys =
      if (minChildren == 1 && maxChildren.isEmpty) matched
      else matched.groupBy(parentIdCol)
        .agg(count(lit(1)).as("_nc"))
        .filter(col("_nc") >= minChildren.toLong &&
          maxChildren.fold(lit(true))(mx => col("_nc") <= mx.toLong))
        .select(parentIdCol)
    parents.join(keys, Seq(parentIdCol), "left_semi")
  }

  /** ES `has_parent`: children whose parent matches `parentPred`.
    * One semi join on the FK; the parent predicate pushes into the
    * parent scan, and a small parent side broadcasts.
    */
  def hasParent(children: DataFrame, parents: DataFrame,
                parentIdCol: String, childParentCol: String,
                parentPred: Column): DataFrame =
    children.join(
      parents.filter(parentPred)
        .select(col(parentIdCol).as(childParentCol)),
      Seq(childParentCol), "left_semi")

  /** ES `children` aggregation under a parent-side terms agg: per
    * parent bucket key, count/min/max/sum/avg over a CHILD field.
    * One dimension join (parent key onto children — broadcast-able)
    * + one keyed aggregation with map-side partials. Buckets order by
    * doc_count desc then key, the terms order.
    */
  def childrenAgg(parents: DataFrame, children: DataFrame,
                  parentIdCol: String, childParentCol: String,
                  parentKeyCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    children.join(
        parents.select(col(parentIdCol).as(childParentCol),
          col(parentKeyCol)),
        Seq(childParentCol))
      .groupBy(col(parentKeyCol).as("key"))
      .agg(count(lit(1)).cast("long").as("doc_count"),
        min(v).as("min"), max(v).as("max"),
        sum(v).as("sum"), avg(v).as("avg"))
      .orderBy(col("doc_count").desc, col("key"))
  }
}
