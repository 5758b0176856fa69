package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ClusteringSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // two tight groups around (0,0) and (10,10); ids 0 and 1 seed them
  private val pts = Seq(
    (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 10.0)),
    (2L, Seq(0.2, 0.0)), (3L, Seq(0.0, 0.2)),
    (4L, Seq(10.2, 10.0)), (5L, Seq(10.0, 10.2))
  ).toDF("id", "vec")

  test("kmeans separates the planted groups and computes exact means") {
    val model = Clustering.kmeansFit(pts, "id", "vec", k = 2, iters = 2)
    val got = pts.withColumn("cluster", model.assign(col("vec")))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(Seq(0L, 2L, 3L).forall(got(_) == got(0L)))
    assert(Seq(1L, 4L, 5L).forall(got(_) == got(1L)))
    assert(got(0L) != got(1L))
    // converged centroids are the group means under the 6-dp rounding
    // contract: mean of {0, 0.2, 0} = 0.066667, of {10, 10.2, 10} =
    // 10.066667 (each dim)
    val c = model.centroids.map(_.toSeq).toSeq
    assert(c.contains(Seq(0.066667, 0.066667)), c.toString)
    assert(c.contains(Seq(10.066667, 10.066667)), c.toString)
  }

  test("distance ties assign to the smallest cluster id") {
    // centroids (0,0) and (2,0); point (1,0) is equidistant
    val m = Clustering.KmeansModel(
      Array(Array(0.0, 0.0), Array(2.0, 0.0)), roundTo = 6)
    val got = Seq((0L, Seq(1.0, 0.0))).toDF("id", "vec")
      .select(m.assign(col("vec"))).collect().head.getInt(0)
    assert(got == 0)
  }

  test("an empty cluster keeps its previous centroid") {
    // ids 0,1,2 seed; id 2 duplicates id 0's point, so every tie goes
    // to cluster 0 and cluster 2 empties out
    val dup = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 10.0)), (2L, Seq(0.0, 0.0)),
      (3L, Seq(0.2, 0.0)), (4L, Seq(10.2, 10.0))
    ).toDF("id", "vec")
    val model = Clustering.kmeansFit(dup, "id", "vec", k = 3, iters = 1)
    assert(model.centroids(2).toSeq === Seq(0.0, 0.0))
  }

  test("clusterCappedSample caps every cluster, deterministically") {
    // three tight clusters of 4 points each
    val docs = (0 until 12).map { i =>
      val c = i % 3
      (i.toLong, Seq(c * 10.0 + (i / 3) * 0.1, c * 10.0))
    }.toDF("id", "vec")
    val capped = Clustering.clusterCappedSample(docs, "id", "vec",
      k = 3, iters = 2, capPerCluster = 2, seed = 7)
    val byCluster = capped.collect()
      .groupBy(_.getInt(2)).view.mapValues(_.map(_.getLong(0)).sorted.toSeq)
      .toMap
    assert(byCluster.size === 3)
    assert(byCluster.values.forall(_.size == 2))
    // survivors carry their true kmeans assignment
    val assigned = Clustering.kmeans(docs, "id", "vec", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    capped.collect().foreach(r =>
      assert(r.getInt(2) === assigned(r.getLong(0))))
    // same seed -> same subset
    val again = Clustering.clusterCappedSample(docs, "id", "vec",
      k = 3, iters = 2, capPerCluster = 2, seed = 7)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(again === capped.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("fit is deterministic and iters=0 returns the init centroids") {
    val a = Clustering.kmeansFit(pts, "id", "vec", k = 2, iters = 3)
    val b = Clustering.kmeansFit(pts, "id", "vec", k = 2, iters = 3)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
    val init = Clustering.kmeansFit(pts, "id", "vec", k = 2, iters = 0)
    assert(init.centroids.map(_.toSeq).toSeq ===
      Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)))
  }
}
