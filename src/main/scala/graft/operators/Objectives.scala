package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-OBJECTIVE data transforms: rewrite documents into the
  * input format a pretraining objective consumes. First member: FIM —
  * fill-in-the-middle (Bavarian et al. 2022, "Efficient Training of
  * Language Models to Fill in the Middle"), the code-model staple:
  * with probability `fimRate` a document splits at two uniform
  * CHARACTER cuts (the paper's character-level transform, applied
  * before tokenization) and re-emits in PSM order —
  * `<PRE>prefix<SUF>suffix<MID>middle` — so the model learns to
  * complete a middle given both sides.
  *
  * Determinism contract (the seeded-sample discipline of
  * [[Sampling]]): the apply-draw and both cuts derive from portable
  * md5 uniforms over (seed, doc id), so re-runs, other engines, and
  * auditors reproduce the exact transformed corpus — the fim1 oracle
  * replays every cut in SQL. Per-row expression, no shuffle, codegen
  * throughout.
  */
object Objectives {

  private def mdInt(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8),
      16, 10).cast("long")

  /** (idCol, fim_applied, textCol): rows drawn under `fimRate`
    * re-emit as `preTok + prefix + sufTok + suffix + midTok + middle`
    * with cuts lo ≤ hi uniform over [0, len]; other rows (and
    * NULL-text rows, which have nothing to split) pass through
    * unchanged with fim_applied = false. Degenerate cuts are legal
    * and meaningful (lo = hi → empty middle; the paper keeps them —
    * the model must learn to emit an empty completion).
    */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
                   fimRate: Double = 0.5, seed: Long = 0,
                   preTok: String = "<PRE>", sufTok: String = "<SUF>",
                   midTok: String = "<MID>"): DataFrame = {
    require(fimRate >= 0.0 && fimRate <= 1.0,
      s"fimRate must be in [0, 1], got $fimRate")
    val id = col(idCol)
    val t = col(textCol)
    val len = length(t)
    // portable uniform in [0, 1): first 8 md5 hex chars / 2^32
    val u = mdInt(s"$seed:fimr:", id).cast("double") / lit(4294967296.0)
    val c1 = pmod(mdInt(s"$seed:fim1:", id), len + 1)
    val c2 = pmod(mdInt(s"$seed:fim2:", id), len + 1)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val applied = t.isNotNull && u < fimRate
    val psm = concat(
      lit(preTok), t.substr(lit(1), lo),
      lit(sufTok), t.substr(hi + 1, len - hi),
      lit(midTok), t.substr(lo + 1, hi - lo))
    docs.select(id, applied.as("fim_applied"),
      when(applied, psm).otherwise(t).as(textCol))
  }
}
