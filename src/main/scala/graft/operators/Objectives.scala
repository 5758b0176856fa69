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

  /** T5-style SPAN CORRUPTION (Raffel et al. 2020, the span-masking
    * denoising objective): masked token spans are replaced by numbered
    * sentinels in the input, and the target lists each sentinel
    * followed by the tokens it hid, terminated by one final sentinel —
    * `inputs:  tok tok <extra_id_0> tok ... <extra_id_1> ...`
    * `targets: <extra_id_0> hidden toks <extra_id_1> hidden ...
    *  <extra_id_n>`.
    *
    * DETERMINISTIC block recipe (the replayability trade, documented):
    * where the paper samples span starts and lengths, here the token
    * stream partitions into fixed `blockSize` windows and window b of
    * document id masks its FIRST `1 + md5(seed:id:b) % maxSpan` tokens
    * (capped by the window's length). Spans are block-aligned so they
    * can never overlap or merge — every per-window decision is
    * independent, which is exactly what makes the transform a pure
    * per-row expression AND byte-replayable in SQL; expected
    * corruption rate = mean span ∕ blockSize = ((maxSpan + 1) ∕ 2) ∕
    * blockSize — the defaults give 2.5/16 ≈ 15.6%, the paper's ~15%
    * at its mean span 3. Sentinel numbering follows the window index
    * (every window masks ≥ 1 token, the T5 convention of numbering
    * spans in order). Documents with no tokens yield empty inputs and
    * the lone terminating sentinel.
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  blockSize: Int = 16, maxSpan: Int = 4,
                  seed: Long = 0,
                  sentinel: String = "<extra_id_%d>"): DataFrame = {
    require(blockSize >= 2, s"blockSize must be >= 2, got $blockSize")
    require(maxSpan >= 1 && maxSpan < blockSize,
      s"maxSpan must be in [1, blockSize), got $maxSpan")
    require(sentinel.contains("%d"), "sentinel needs a %d slot")
    val id = col(idCol)
    val sentPre = sentinel.substring(0, sentinel.indexOf("%d"))
    val sentPost = sentinel.substring(sentinel.indexOf("%d") + 2)
    def sent(k: Column): Column =
      concat(lit(sentPre), k.cast("string"), lit(sentPost))
    val toks = graft.functions.TextAnalysis.tokens(col(textCol))
    val out = graft.functions.TextAnalysis.bindOnce(toks) { tk =>
      // coalesce: a NULL text (size = null via the null token array)
      // behaves exactly like a zero-token one — empty inputs, the
      // lone terminating sentinel
      val n = coalesce(size(tk), lit(-1))
      val nBlocks =
        greatest(ceil(n.cast("double") / blockSize).cast("int"), lit(0))
      // per window b (0-based): struct(start, maskLen, sentIdx) where
      // sentIdx = number of windows before b (all windows mask here —
      // maskLen >= 1 — so the sentinel index IS b). The sequence is
      // guarded against n = 0 (Spark's sequence(0, -1) DESCENDS): the
      // start < n filter drops the phantom window of an empty doc.
      val blocks = filter(transform(
        sequence(lit(0), greatest(nBlocks - 1, lit(0))), b => {
        val start = b * blockSize // 0-based token offset
        val blockLen = least(lit(blockSize), n - start)
        val m = least(
          pmod(mdInt(s"$seed:span:", concat(id.cast("string"),
            lit(":"), b.cast("string"))), lit(maxSpan.toLong)) + 1,
          blockLen.cast("long")).cast("int")
        struct(start.as("s"), m.as("m"), b.as("k"))
      }), bl => bl.getField("s") < n)
      val inputs = concat_ws(" ", flatten(transform(blocks, bl => {
        val kept = slice(tk, bl.getField("s") + bl.getField("m") + 1,
          least(lit(blockSize), n - bl.getField("s")) - bl.getField("m"))
        concat(array(sent(bl.getField("k"))), kept)
      })))
      val targets = concat_ws(" ", concat(
        flatten(transform(blocks, bl => concat(
          array(sent(bl.getField("k"))),
          slice(tk, bl.getField("s") + 1, bl.getField("m"))))),
        array(sent(nBlocks))))
      struct(inputs.as("inputs"), targets.as("targets"),
        aggregate(transform(blocks, _.getField("m")), lit(0),
          (a, x) => a + x).cast("long").as("n_masked"))
    }
    docs.select(id, out.getField("inputs").as("inputs"),
      out.getField("targets").as("targets"),
      out.getField("n_masked").as("n_masked"))
  }

  /** BERT-style MLM masking (Devlin et al. 2018): each token position
    * selects with probability `maskRate`; of the selected, 80% become
    * `maskTok`, 10% become a RANDOM token, 10% keep their surface form
    * (the model still predicts at kept positions — they are in the
    * label stream). Deterministic per-position md5 draws (the FIM
    * discipline), so the corrupted corpus replays byte-for-byte.
    *
    * The random-replacement pool: `randomTokens` when provided (pass
    * e.g. a [[Vocabulary]] top-k — a broadcast-literal global-vocab
    * draw, BERT's recipe); otherwise the token at a hash-drawn
    * position of the SAME document (the in-context variant — a
    * documented simplification that still forces the model to spot
    * corrupted tokens without a vocabulary build).
    *
    * Output: (idCol, text — the corrupted ANALYZED token stream,
    * space-joined; labels — "pos:original" for every selected
    * 0-based position, in order; n_masked). NULL/empty docs yield
    * empty text and labels.
    */
  /** SFT loss-mask rendering: the chat-template transform every
    * supervised-fine-tune data pipeline runs — render (prompt,
    * response) into the training text and compute the TOKEN index
    * where the loss mask ends (loss is taken on the response tokens
    * only). The subtle bug this operator exists to prevent: the
    * boundary must be the token count of the RENDERED prefix
    * (`preamble + prompt + separator`), not tokens(prompt) plus a
    * constant — a separator that glues to the prompt's last word
    * (no leading whitespace) merges a token at the seam and the
    * naive per-part sum over-counts (spec-pinned). A separator that
    * does not END in whitespace would glue into the response itself,
    * leaving the boundary UNDEFINED — refused loudly.
    *
    * Output: (id, text, n_tokens, mask_from) — `mask_from` is the
    * 0-based token index of the first RESPONSE token; rows with a
    * null prompt or response drop (no renderable example). Pure
    * per-row expressions over one tokenization each for the prefix
    * and the full text — zero shuffle, the t1 scan shape.
    */
  def sftLossMask(docs: DataFrame, idCol: String, promptCol: String,
                  responseCol: String,
                  preamble: String = "<|user|> ",
                  separator: String = " <|assistant|> "): DataFrame = {
    import graft.functions.TextAnalysis
    require(separator.nonEmpty && separator.last.isWhitespace,
      "the separator must end in whitespace — otherwise it glues " +
        "into the response's first token and the mask boundary is " +
        s"undefined (got '$separator')")
    val prefix = concat(lit(preamble), col(promptCol), lit(separator))
    val full = concat(prefix, col(responseCol))
    docs
      .filter(col(promptCol).isNotNull && col(responseCol).isNotNull)
      .select(col(idCol), full.as("text"),
        size(TextAnalysis.tokens(full)).cast("long").as("n_tokens"),
        size(TextAnalysis.tokens(prefix)).cast("long").as("mask_from"))
  }

  /** MULTI-TURN SFT loss masks — [[sftLossMask]] for whole
    * conversations: `turns` is an array&lt;struct&lt;role string,
    * content string&gt;&gt;, each turn renders as
    * `marker(role) + content`, and every turn's token span
    * [from_token, to_token) comes out as a row so the trainer can
    * mask non-assistant spans. Boundaries are ADDITIVE per rendered
    * piece, which is exact only when every marker both STARTS and
    * ENDS with whitespace (no token can glue across a piece seam) —
    * enforced loudly, the [[sftLossMask]] boundary discipline.
    * Unknown roles refuse at render (a silently unmarked turn would
    * shift every later boundary).
    *
    * Output: (id, turn, role, from_token, to_token, n_tokens) — one
    * row per turn, `n_tokens` the whole conversation's count (the
    * same on every row of a conversation); rows with a null turns
    * array drop. Pure per-row HOF arithmetic: one rendered-piece
    * token count per turn, a running-sum transform over the ≤ turns
    * array — zero shuffle.
    */
  def sftMultiTurnMasks(docs: DataFrame, idCol: String,
                        turnsCol: String,
                        markers: Map[String, String] = Map(
                          "user" -> " <|user|> ",
                          "assistant" -> " <|assistant|> ",
                          "system" -> " <|system|> ")): DataFrame = {
    import graft.functions.TextAnalysis
    require(markers.nonEmpty, "sftMultiTurnMasks: no role markers")
    markers.foreach { case (r, m) =>
      require(m.nonEmpty && m.head.isWhitespace && m.last.isWhitespace,
        s"marker for role '$r' must start AND end with whitespace — " +
          s"otherwise tokens glue across turn seams and every later " +
          s"boundary shifts (got '$m')")
    }
    // per-turn rendered piece and its token count; unknown roles
    // refuse in-plan (raise_error — the optimizer cannot prune it)
    val roleMarker = markers.foldLeft(
      raise_error(concat(lit("sftMultiTurnMasks: unknown role '"),
        col("_t.role"), lit("' — add a marker"))).cast("string")) {
      case (acc, (r, m)) =>
        when(col("_t.role") === r, lit(m)).otherwise(acc)
    }
    val exploded = docs
      .filter(col(turnsCol).isNotNull)
      .select(col(idCol), posexplode(col(turnsCol)).as(Seq("turn", "_t")))
      .select(col(idCol), col("turn").cast("long").as("turn"),
        col("_t.role").as("role"),
        size(TextAnalysis.tokens(concat(roleMarker,
          coalesce(col("_t.content"), lit("")))))
          .cast("long").as("_piece"))
    // running boundaries via a per-conversation window — partitions
    // are bounded by the turn count of ONE conversation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("turn")
    exploded
      .withColumn("to_token",
        sum(col("_piece")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          0)))
      .withColumn("from_token", col("to_token") - col("_piece"))
      .withColumn("n_tokens",
        sum(col("_piece")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(idCol)))
      .select(col(idCol), col("turn"), col("role"),
        col("from_token"), col("to_token"), col("n_tokens"))
  }

  def mlmMask(docs: DataFrame, idCol: String, textCol: String,
              maskRate: Double = 0.15, seed: Long = 0,
              maskTok: String = "[MASK]",
              randomTokens: Seq[String] = Nil): DataFrame = {
    require(maskRate >= 0.0 && maskRate <= 1.0,
      s"maskRate must be in [0, 1], got $maskRate")
    val id = col(idCol)
    def u(salt: String, p: Column): Column =
      mdInt(s"$seed:$salt:", concat(id.cast("string"), lit(":"),
        p.cast("string"))).cast("double") / lit(4294967296.0)
    val toks = graft.functions.TextAnalysis.tokens(col(textCol))
    val out = graft.functions.TextAnalysis.bindOnce(toks) { tk =>
      val n = size(tk)
      def sel(p: Column): Column = u("mlm", p) < maskRate
      def corrupted(t: Column, p: Column): Column = {
        val kind = u("mlmk", p)
        val replacement =
          if (randomTokens.nonEmpty)
            element_at(lit(randomTokens.toArray),
              (pmod(mdInt(s"$seed:mlmr:", concat(id.cast("string"),
                lit(":"), p.cast("string"))),
                lit(randomTokens.size.toLong)) + 1).cast("int"))
          else element_at(tk,
            (pmod(mdInt(s"$seed:mlmr:", concat(id.cast("string"),
              lit(":"), p.cast("string"))), n.cast("long")) + 1)
              .cast("int"))
        when(!sel(p), t)
          .when(kind < 0.8, lit(maskTok))
          .when(kind < 0.9, replacement)
          .otherwise(t)
      }
      // n > 0 guard everywhere: Spark's sequence(1, 0) DESCENDS (the
      // spanCorrupt trap), and a null text's size() is -1
      val seqp = sequence(lit(1), n)
      struct(
        when(n > 0,
          concat_ws(" ", zip_with(tk, seqp, (t, p) => corrupted(t, p))))
          .otherwise(lit("")).as("text"),
        when(n > 0, filter(zip_with(tk, seqp, (t, p) =>
            when(sel(p), concat((p - 1).cast("string"), lit(":"), t))),
          x => x.isNotNull))
          .otherwise(array().cast("array<string>")).as("labels"),
        when(n > 0, size(filter(seqp, p => sel(p))))
          .otherwise(lit(0)).cast("long").as("n_masked"))
    }
    docs.select(id, out.getField("text").as(textCol),
      out.getField("labels").as("labels"),
      out.getField("n_masked").as("n_masked"))
  }

  /** Group-relative advantage preprocessing — the RL-from-rewards
    * data-prep step behind GRPO and RLOO (the reference has no RL
    * surface at all; this extends the pref1 preference-pair family to
    * the group-sampled objectives): completions grouped by their
    * prompt, each reward normalized against ITS group.
    *
    * Output adds two columns:
    *  - `grpo_adv` = (r − mean_g) / std_g (POPULATION std — the GRPO
    *    normalizer), 6-dp half-up; a degenerate group (n = 1 or
    *    std = 0, i.e. no within-group signal) gets 0.0 — the
    *    documented convention, never a NaN/±Inf,
    *  - `rloo_adv` = r − (sum_g − r)/(n − 1) (the leave-one-out
    *    baseline), 6-dp; n = 1 groups get 0.0 (no opponents).
    *
    * ONE keyed aggregation computes the group moments; they re-join
    * the completions as a BROADCAST (groups ≪ completions — the
    * prompt set is the small side by construction). No window, no
    * shuffle of the completion frame beyond the stats join.
    */
  def groupAdvantages(completions: DataFrame, groupCol: String,
                      rewardCol: String): DataFrame = {
    val r = col(rewardCol).cast("double")
    // a NULL group key would silently vanish in the stats join (null
    // never equi-joins) — refuse in-plan instead; a completion
    // without a prompt id is a data bug, not a droppable row
    val guarded = completions.withColumn(groupCol,
      when(col(groupCol).isNull, raise_error(lit(
        s"groupAdvantages: null $groupCol — every completion needs " +
          "a prompt group"))).otherwise(col(groupCol)))
    val stats = guarded.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("_gn"),
        avg(r).as("_gmean"),
        coalesce(stddev_pop(r), lit(0.0)).as("_gstd"),
        sum(r).as("_gsum"))
    val grpo = when(col("_gn") > 1 && col("_gstd") > 0,
      graft.queries.QueryUtil.rhu(
        (r - col("_gmean")) / col("_gstd"), 6)).otherwise(lit(0.0))
    val rloo = when(col("_gn") > 1,
      graft.queries.QueryUtil.rhu(
        r - (col("_gsum") - r) / (col("_gn") - 1), 6))
      .otherwise(lit(0.0))
    guarded
      .join(broadcast(stats), Seq(groupCol))
      .withColumn("grpo_adv", grpo)
      .withColumn("rloo_adv", rloo)
      .drop("_gn", "_gmean", "_gstd", "_gsum")
  }
}
