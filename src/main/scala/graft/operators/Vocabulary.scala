package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Token vocabulary building + sequence encoding — the tokenizer-prep
  * face of the pipeline (vocab from corpus frequencies, then encode
  * documents as id sequences against it).
  *
  * Scale shapes:
  *  - [[build]]: explode → count is ONE shuffle with map-side partial
  *    aggregation; the top-k cut is a TakeOrdered (per-partition heap,
  *    driver merge of k×tasks rows). The id-assigning window then runs
  *    over ≤ k rows — bounded by construction, so the single-partition
  *    window that is fatal on corpus-sized data is fine here (a vocab
  *    is driver-sized by definition).
  *  - [[encodeExploded]]: the vocab BROADCASTS; each (doc, pos, token)
  *    row resolves its id map-side, out-of-vocabulary tokens encode as
  *    -1. The corpus is never shuffled to encode.
  */
object Vocabulary {

  /** Top-k vocabulary: (token_id, token, cnt), ids dense from 0 in
    * (count desc, token) order — deterministic under ties.
    */
  def build(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, "vocabulary size must be positive")
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts.withColumn("token_id", (row_number().over(w) - 1).cast("long"))
      .select(col("token_id"), col("token"), col("cnt").cast("long").as("cnt"))
  }

  /** Encode every document as (idCol, pos, token_id) rows, one per
    * token in order (pos is 0-based); unknown tokens get id -1.
    */
  def encodeExploded(docs: DataFrame, idCol: String, textCol: String,
                     vocab: DataFrame): DataFrame =
    docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
      .join(broadcast(vocab.select("token", "token_id")), Seq("token"),
        "left")
      .select(col(idCol), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))

  /** Array-form encoding: (idCol, token_ids array<long>), token order
    * preserved. One groupBy shuffle on the id; the sort-by-position
    * happens inside the collected array, not as a global sort.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame): DataFrame =
    encodeExploded(docs, idCol, textCol, vocab)
      .groupBy(idCol)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("token_id")))),
        s => s.getField("token_id")).as("token_ids"))
}
