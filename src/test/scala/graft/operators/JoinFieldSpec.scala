package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class JoinFieldSpec extends AnyFunSpec with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parents = Seq(
    (1L, "a"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("pid", "grp")
  private def children = Seq(
    (10L, 1L, 5.0), (11L, 1L, 7.0), (12L, 1L, 1.0), // 3 under p1
    (13L, 2L, 9.0),                                 // 1 under p2
    (14L, 3L, 9.0), (15L, 3L, 9.0)                  // 2 under p3
  ).toDF("cid", "pid", "v")

  it("has_child gates on matching-children counts, bounds included") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("pid").collect().map(_.getLong(0)).toSet
    // any child with v >= 5: p1 (2 of them), p2, p3
    ids(JoinField.hasChild(parents, children, "pid", "pid",
      col("v") >= 5.0)) shouldBe Set(1L, 2L, 3L)
    // at least 2 matching children: p1, p3
    ids(JoinField.hasChild(parents, children, "pid", "pid",
      col("v") >= 5.0, minChildren = 2)) shouldBe Set(1L, 3L)
    // between 2 and 2: same here; p1 has exactly 2 v>=5 children
    assert(ids(JoinField.hasChild(parents, children, "pid", "pid",
      col("v") >= 5.0, minChildren = 2, maxChildren = Some(2)))
      == Set(1L, 3L))
    // max below total prunes: p1 has 3 children of ANY v
    assert(ids(JoinField.hasChild(parents, children, "pid", "pid",
      lit(true), minChildren = 1, maxChildren = Some(2)))
      == Set(2L, 3L))
    an[IllegalArgumentException] should be thrownBy
      JoinField.hasChild(parents, children, "pid", "pid", lit(true),
        minChildren = 0)
    an[IllegalArgumentException] should be thrownBy
      JoinField.hasChild(parents, children, "pid", "pid", lit(true),
        minChildren = 3, maxChildren = Some(2))
  }

  it("has_parent keeps children of matching parents only") {
    JoinField.hasParent(children, parents, "pid", "pid",
        col("grp") === "a")
      .select("cid").collect().map(_.getLong(0)).toSet shouldBe
      Set(10L, 11L, 12L, 13L)
  }

  it("children agg buckets by the parent key over child metrics") {
    val got = JoinField.childrenAgg(parents, children, "pid", "pid",
      "grp", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4),
        r.getDouble(5))).toSeq
    // grp a: 4 children sum 22 avg 5.5; grp b: 2 children sum 18
    got shouldBe Seq(("a", 4L, 22.0, 5.5), ("b", 2L, 18.0, 9.0))
  }
}
