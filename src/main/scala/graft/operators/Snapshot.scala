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
  * [[Dedup.keepFirstByKey]] contract) — a duplicated id would fan the
  * join out and double-count every verdict, so it's enforced loudly
  * INSIDE the join plan: each side groups digests by id and raises on
  * count > 1. The group-by keys match the join keys, so the partial
  * aggregate rides the join's own exchange — the guard costs no extra
  * pass and no extra shuffle (vs the former eager count/count_distinct
  * probe, which scanned each side once more per call). Pre-verified
  * snapshots can skip it with `verifyUnique = false`.
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
           idCol: String, textCol: String,
           verifyUnique: Boolean = true): DataFrame = {
    def digests(df: DataFrame, side: String): DataFrame = {
      val dig = s"${side}_digest"
      val d = df.select(col(idCol), md5(col(textCol)).as(dig))
      if (!verifyUnique) d
      else d.groupBy(idCol)
        .agg(first(col(dig)).as(dig), count(lit(1)).as("_c"))
        .select(col(idCol),
          when(col("_c") > 1, raise_error(concat(
              lit(s"$side snapshot has duplicate $idCol = "),
              col(idCol).cast("string"),
              lit(" — dedup before diffing"))))
            .otherwise(col(dig)).as(dig))
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

  /** One-row verdict counts — the data-card / CI-gate face. One lazy
    * plan over [[diff]] (the guard is in-plan, so nothing runs twice).
    */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame,
                  idCol: String, textCol: String,
                  verifyUnique: Boolean = true): DataFrame =
    diff(oldSnap, newSnap, idCol, textCol, verifyUnique)
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
