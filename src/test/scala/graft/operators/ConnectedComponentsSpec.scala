package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side union-find oracle: min-id label per component. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to one component labeled by its minimum") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("star component where the greedy drop list under-drops") {
    // {2,9} and {3,9} are near-dups but {2,3} never was: the greedy
    // pair-local reduction drops only 9 (keeps both 2 and 3), while
    // the transitive cluster policy keeps exactly one representative
    val pairs = Seq((2L, 9L), (3L, 9L))
    val greedy = Dedup.nearDupDrops(pairs.toDF("id_a", "id_b"))
      .collect().map(_.getLong(0)).toSet
    assert(greedy == Set(9L))
    val comp = run(pairs)
    assert(comp == Map(2L -> 2L, 3L -> 2L, 9L -> 2L))
    val drops = Dedup.clusterDrops(
      Dedup.connectedComponents(pairs.toDF("id_a", "id_b")))
      .collect().map(_.getLong(0)).toSet
    assert(drops == Set(3L, 9L))
  }

  test("random graphs match the union-find oracle") {
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = (0 until 90).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val exp = unionFind(edges)
      val got = run(edges)
      assert(got == exp, s"seed $seed: CC labels diverge from union-find")
    }
  }

  test("self-loops and duplicate pairs are ignored; empty input is empty") {
    val got = run(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
  }

  test("long path needs multiple star rounds (log-n convergence)") {
    // a 33-node path is the adversarial diameter case for label prop;
    // large-star/small-star must still converge and label by the min
    val path = (0L until 32L).map(i => (i, i + 1))
    val got = run(path)
    assert(got.size == 33 && got.values.forall(_ == 0L))
  }
}
