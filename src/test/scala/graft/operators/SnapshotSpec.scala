package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diff verdicts all four states; null-text pairs compare " +
      "null-safely; summary counts agree") {
    val old = Seq(
      (1L, "same"), (2L, "was this"), (3L, "dropped"),
      (4L, null: String), (5L, null: String)).toDF("id", "text")
    val neu = Seq(
      (1L, "same"), (2L, "now this"), (6L, "brand new"),
      (4L, null: String), (5L, "text now")).toDF("id", "text")
    val got = Snapshot.diff(old, neu, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged",
      2L -> "changed",
      3L -> "removed",
      4L -> "unchanged", // null text on both sides IS the same doc
      5L -> "changed",   // null -> text is a change, not an add
      6L -> "added"))
    val s = Snapshot.diffSummary(old, neu, "id", "text").head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
      == (1L, 1L, 2L, 2L))
    // duplicate ids refuse loudly — the fan-out would double verdicts.
    // The guard lives INSIDE the join plan (raise_error on a per-id
    // count), so it fires on action, costing no extra pass.
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "text")
    val e = intercept[Exception] {
      Snapshot.diff(dup, neu, "id", "text").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("duplicate"), messages(e))
    // pre-verified snapshots skip the guard: the duplicate fans out
    // instead of raising (the caller owns the contract)
    assert(Snapshot.diff(dup, neu, "id", "text", verifyUnique = false)
      .count() > 0)
  }
}
