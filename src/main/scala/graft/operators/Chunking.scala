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
}
