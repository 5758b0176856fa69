package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus SNAPSHOT DIFF — the dataset-versioning audit between two
  * materialized corpus versions: which documents were added, removed,
  * changed, or carried unchanged. The reproducibility question every
  * training-data pipeline answers before re-training ("what actually
  * changed since the last cut?"), and the verification step after a
  * re-run of a curation pipeline ("the rewrite touched ONLY what it
  * was supposed to").
  *
  * Scale shape: each side projects to (id, md5(text)) — digest-only
  * rows, never documents — and ONE full outer join on the id key
  * produces the verdict. Content equality is digest equality
  * (md5 — the exact-dedup digest of [[Dedup]], engine-replayable);
  * NULL text digests NULL and compares null-safely, so two null-text
  * versions of a doc are "unchanged", and null-vs-text is "changed".
  *
  * Precondition: `idCol` unique within each snapshot (the
  * [[Dedup.keepFirstByKey]] contract) — enforced loudly by the
  * aggregate probe, since a duplicated id would fan the join out and
  * double-count every verdict.
  */
object Snapshot {

  val Added = "added"
  val Removed = "removed"
  val Changed = "changed"
  val Unchanged = "unchanged"

  /** (idCol, status, old_digest, new_digest) for every id in either
    * snapshot.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           idCol: String, textCol: String): DataFrame = {
    def digests(df: DataFrame, side: String): DataFrame = {
      val d = df.select(col(idCol), md5(col(textCol)).as(s"${side}_digest"))
      val r = d.agg(count(lit(1)).as("_n"),
        count_distinct(col(idCol)).as("_d")).head()
      require(r.getLong(0) == r.getLong(1),
        s"$side snapshot has duplicate ids (${r.getLong(0)} rows, " +
          s"${r.getLong(1)} distinct $idCol) — dedup before diffing")
      d
    }
    val o = digests(oldSnap, "old")
    val n = digests(newSnap, "new")
    // presence flags, NOT digest nullness: a present row with NULL
    // text must not read as an absent row
    o.withColumn("_in_old", lit(true))
      .join(n.withColumn("_in_new", lit(true)), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(coalesce(col("_in_old"), lit(false)) &&
            !coalesce(col("_in_new"), lit(false)), lit(Removed))
          .when(!coalesce(col("_in_old"), lit(false)), lit(Added))
          .when(col("old_digest") <=> col("new_digest"), lit(Unchanged))
          .otherwise(lit(Changed)).as("status"),
        col("old_digest"), col("new_digest"))
  }

  /** One-row verdict counts — the data-card / CI-gate face. */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame,
                  idCol: String, textCol: String): DataFrame =
    diff(oldSnap, newSnap, idCol, textCol)
      .agg(
        sum(when(col("status") === Added, 1L).otherwise(0L))
          .cast("long").as("n_added"),
        sum(when(col("status") === Removed, 1L).otherwise(0L))
          .cast("long").as("n_removed"),
        sum(when(col("status") === Changed, 1L).otherwise(0L))
          .cast("long").as("n_changed"),
        sum(when(col("status") === Unchanged, 1L).otherwise(0L))
          .cast("long").as("n_unchanged"))
}
