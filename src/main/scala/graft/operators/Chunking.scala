package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Document chunking: split long documents into overlapping token
  * windows (the preprocessing step feeding embedding models and
  * context-window-bounded training examples).
  *
  * Chunk i covers tokens `[i*stride, i*stride + chunkSize)`; the last
  * chunk may be shorter, and every token belongs to at least one chunk
  * (`stride <= chunkSize` enforced). A document shorter than one chunk
  * yields exactly one chunk.
  *
  * Scale shape: pure per-row work — tokens are staged ONCE per
  * document in their own projection (interpreted HOF lambdas re-run
  * anything nested under them), chunk starts come from a `sequence`
  * over the staged count, and `posexplode` emits one row per chunk.
  * No shuffle, no join; output size is corpus tokens × (chunkSize /
  * stride) overlap factor, linear in the input.
  */
object Chunking {

  /** (idCol, chunk_no, chunk_text, n_tok) — one row per chunk. */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize (every token must land in a chunk)")
    val staged = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("_toks"))
    // number of chunks: ceil(max(n - chunkSize, 0) / stride) + 1
    val n = size(col("_toks"))
    val nChunks = (ceil((greatest(n - chunkSize, lit(0)).cast("double")) /
      stride) + 1).cast("int")
    staged
      .select(col(idCol), col("_toks"),
        posexplode(sequence(lit(0), nChunks - 1)).as(Seq("chunk_no", "_i")))
      .select(col(idCol), col("chunk_no").cast("long").as("chunk_no"),
        slice(col("_toks"), col("_i") * stride + 1, lit(chunkSize))
          .as("_chunk"))
      .select(col(idCol), col("chunk_no"),
        concat_ws(" ", col("_chunk")).as("chunk_text"),
        size(col("_chunk")).cast("long").as("n_tok"))
  }

  /** CONTENT-DEFINED chunking (the FastCDC/rolling-hash idea at token
    * level): a chunk boundary falls AFTER token position i whenever
    * the md5-derived hash of the `window`-gram ending at i is
    * divisible by `divisor` — so boundaries are a function of LOCAL
    * content only, and an edit early in a document cannot shift every
    * later chunk the way fixed-width chunking does (the property that
    * makes chunk-level dedup and caching survive edits). Expected
    * chunk length ≈ `divisor` tokens.
    *
    * Output: (idCol, chunk_id, start_pos, n_tokens, chunk_text) with
    * chunk_id dense from 0 in position order and start_pos the
    * 0-based token offset. Deterministic and engine-portable (md5 —
    * the DuckDB oracle replays every boundary).
    *
    * Scale shape: one posexplode per token, the boundary flag is a
    * per-row expression over the staged token array, the running
    * boundary count is a window PARTITIONED BY DOCUMENT (state
    * bounded by one document, the `removeSharedSpans` rebuild
    * discipline — never a global window), and the chunk re-assembly
    * is one groupBy on (id, chunk_id). No corpus-sized sort.
    */
  def contentDefinedChunks(docs: DataFrame, idCol: String,
                           textCol: String, window: Int = 3,
                           divisor: Int = 16): DataFrame = {
    require(window > 0 && divisor > 1,
      "need window > 0 and divisor > 1")
    val staged = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("_toks"))
    val exploded = staged
      .select(col(idCol), col("_toks"),
        posexplode(col("_toks")).as(Seq("pos", "_tok")))
    // gram ending at pos (0-based) = tokens[pos-window+1 .. pos];
    // positions before the first full window never bound a chunk —
    // the boundary flag gates them out, but the slice start is still
    // clamped to 1 (Spark's slice refuses start 0, and the gram value
    // is irrelevant there)
    val gram = concat_ws(" ",
      slice(col("_toks"), greatest(col("pos") - window + 2, lit(1)),
        lit(window)))
    val boundary = (col("pos") >= window - 1) &&
      (conv(substring(md5(gram), 1, 8), 16, 10).cast("long")
        % divisor === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    exploded
      .withColumn("_bf", when(boundary, 1L).otherwise(0L))
      .withColumn("chunk_id",
        coalesce(sum(col("_bf")).over(w), lit(0L)))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(min(col("pos")).cast("long").as("start_pos"),
        count(lit(1)).as("n_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("_tok")))),
          s => s.getField("_tok"))).as("chunk_text"))
  }

  /** TOKEN-BUDGET TRUNCATION — fit documents into a context window
    * before packing/training, keeping the part the strategy says
    * matters:
    *
    *  - "head": the first `maxTokens` (the classic cutoff),
    *  - "tail": the last `maxTokens` (recency-matters feeds: logs,
    *    chat transcripts),
    *  - "middle_out": first half + last half of the budget, the
    *    middle dropped (the long-context eval recipe — keeps the
    *    instruction at the top AND the question at the bottom); the
    *    head gets the odd token on odd budgets.
    *
    * Output (idCol, textCol — the token-joined truncated text,
    * n_tokens — tokens KEPT, truncated — whether anything dropped).
    * Documents at or under budget pass through with their original
    * token stream re-joined (one documented normalization: whitespace
    * runs collapse — truncation is a token-level op). NULL text yields
    * empty output with n_tokens 0. Pure per-row expression.
    */
  def truncateTokens(docs: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int,
                     strategy: String = "head"): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(Seq("head", "tail", "middle_out").contains(strategy),
      s"unknown strategy '$strategy' (head, tail, middle_out)")
    val toks = TextAnalysis.tokens(col(textCol))
    val out = TextAnalysis.bindOnce(toks) { tk =>
      val n = coalesce(size(tk), lit(0))
      val over = n > maxTokens
      val kept = strategy match {
        case "head" => slice(tk, 1, maxTokens)
        case "tail" => slice(tk, n - maxTokens + 1, lit(maxTokens))
        case "middle_out" =>
          val headN = (maxTokens + 1) / 2
          val tailN = maxTokens - headN
          if (tailN == 0) slice(tk, 1, headN)
          else concat(slice(tk, 1, headN),
            slice(tk, n - tailN + 1, lit(tailN)))
      }
      val chosen = when(over, kept).otherwise(tk)
      struct(
        when(n > 0, concat_ws(" ", chosen)).otherwise(lit("")).as("text"),
        when(n > 0, size(chosen)).otherwise(lit(0)).cast("long")
          .as("n_tokens"),
        over.as("truncated"))
    }
    docs.select(col(idCol), out.getField("text").as(textCol),
      out.getField("n_tokens").as("n_tokens"),
      out.getField("truncated").as("truncated"))
  }
}
