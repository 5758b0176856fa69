package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ObjectivesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (0L until 80L).map(i =>
      (i, if (i == 77L) null else s"doc $i " + ("x" * (i % 9).toInt)))
    .toDF("id", "text")

  test("FIM: reassembly invariant, determinism, rate edges, null " +
      "passthrough, applied fraction tracks the rate") {
    val out = Objectives.fimTransform(docs, "id", "text",
        fimRate = 0.5, seed = 7)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    val orig = docs.collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    var applied = 0
    for ((id, fim, t) <- out) {
      if (!fim) assert(t == orig(id), s"id $id passthrough")
      else {
        applied += 1
        // <PRE>p<SUF>s<MID>m must reassemble to p + m + s
        assert(t.startsWith("<PRE>"), t)
        val sufAt = t.indexOf("<SUF>"); val midAt = t.indexOf("<MID>")
        assert(sufAt >= 5 && midAt > sufAt, t)
        val p = t.substring(5, sufAt)
        val sfx = t.substring(sufAt + 5, midAt)
        val m = t.substring(midAt + 5)
        assert(p + m + sfx == orig(id), s"id $id reassembly")
      }
    }
    assert(out.find(_._1 == 77L).get._3 == null) // null text untouched
    assert(applied > 15 && applied < 65, s"applied $applied of 80")
    // deterministic across runs
    val again = Objectives.fimTransform(docs, "id", "text",
      fimRate = 0.5, seed = 7).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(out.toSeq == again.toSeq)
    // a different seed transforms a different subset
    val other = Objectives.fimTransform(docs, "id", "text",
      fimRate = 0.5, seed = 8).collect().map(r => r.getBoolean(1)).toSeq
    assert(other != out.map(_._2).toSeq)
    // rate edges
    assert(Objectives.fimTransform(docs, "id", "text", fimRate = 0.0)
      .filter($"fim_applied").count() == 0)
    assert(Objectives.fimTransform(docs, "id", "text", fimRate = 1.0)
      .filter(!$"fim_applied").count() == 1) // only the null-text row
    intercept[IllegalArgumentException] {
      Objectives.fimTransform(docs, "id", "text", fimRate = 1.5)
    }
  }
}
