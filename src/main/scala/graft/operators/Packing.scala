package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: assign documents, in a
  * deterministic global order, to fixed token-budget bins ("which
  * context window does this document land in?").
  *
  * Semantics: documents are laid out in `idCol` order; a document's bin
  * is `floor(tokens_before_it / budget)` — the streaming layout where
  * bin capacity is `budget` and a document that straddles a boundary
  * counts toward the bin it starts in. This is the PARALLEL packing
  * discipline: unlike greedy first-fit (inherently sequential — each
  * decision depends on every earlier bin's fill), the prefix-sum layout
  * is a pure function of the running total, so it distributes.
  *
  * Scale shape — the naive Spark spelling
  * `sum(tokens).over(Window.orderBy(id))` moves the ENTIRE dataset into
  * one partition (an unpartitioned window is a single-task sort): fatal
  * at 100 TB. This implementation is the classic two-phase distributed
  * prefix sum instead:
  *   1. range-partition + sort by id (one shuffle, the same one any
  *      global ordering costs), then one cheap pass computing each
  *      partition's token TOTAL (k values to the driver, k = #partitions);
  *   2. broadcast the k partial-sum offsets and stream each partition
  *      once more, adding its offset to a local running sum.
  * Every partition works independently in both passes; driver state is
  * O(partitions), not O(rows). The result is byte-identical to the
  * single-partition window (prefix sums are associative), which is what
  * the DuckDB oracle recomputes.
  */
object Packing {

  /** (idCol, n_tokens, cum_before, bin) for every row of `df`, where
    * `cum_before` is the sum of `tokenCol` over all rows with smaller
    * `idCol` and `bin = cum_before / budget` (integer division).
    * `idCol` must be unique (it defines the layout order).
    */
  def packByBudget(df: DataFrame, idCol: String, tokenCol: String,
                   budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "packByBudget: budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val nPart =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("n_tokens"))
      .repartitionByRange(nPart, col("id"))
      .sortWithinPartitions("id")
      .persist()
    // pass 1: per-partition totals — k longs to the driver
    val totals = sorted.as[(Long, Long)].mapPartitions { it =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator((TaskContext.getPartitionId(), s))
    }.collect().toMap
    // offsets(p) = tokens in all partitions before p (range partitioning
    // makes partition order = id order)
    val offsets = new Array[Long](nPart + 1)
    var p = 0
    while (p < nPart) {
      offsets(p + 1) = offsets(p) + totals.getOrElse(p, 0L)
      p += 1
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val out = sorted.as[(Long, Long)].mapPartitions { it =>
      var cum = bc.value(TaskContext.getPartitionId())
      it.map { case (id, tk) =>
        val before = cum
        cum += tk
        (id, tk, before, before / budget)
      }
    }.toDF(idCol, "n_tokens", "cum_before", "bin")
    Dedup.materializeAndRelease(sorted, out)
  }

  /** Materialize the packed TRAINING SEQUENCES [[packByBudget]] lays
    * out — the artifact a dataloader actually reads: one row per bin
    * with the member docs in layout order — (bin, n_docs,
    * total_tokens, doc_ids, packed_text), where `packed_text` joins
    * the member texts with `sep` (the document-boundary marker a
    * tokenizer inserts, "\n<|doc|>\n" by default).
    *
    * The per-bin list aggregation is SAFE here by construction: a bin
    * holds at most `budget` tokens plus one straddling document, so
    * per-group state is budget-bounded, not corpus-bounded — provided
    * every document has ≥ 1 token (zero-token documents all share a
    * cum_before and would pile into one bin; filter empties first).
    * One extra shuffle on the bin id beyond packByBudget's range
    * shuffle.
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
                    textCol: String, budget: Long,
                    sep: String = "\n<|doc|>\n"): DataFrame = {
    val packed = packByBudget(docs, idCol, tokenCol, budget)
    packed.join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("n_tokens").cast("long").as("total_tokens"),
        array_sort(collect_list(struct(col(idCol).as("_i"),
          col(textCol).as("_t")))).as("_m"))
      .select(col("bin"), col("n_docs"), col("total_tokens"),
        transform(col("_m"), m => m.getField("_i")).as("doc_ids"),
        array_join(transform(col("_m"), m => m.getField("_t")), sep)
          .as("packed_text"))
  }

  /** Per-bin packing summary: how many documents and tokens landed in
    * each budget window, and the fill ratio. The waste diagnostic for
    * choosing a budget (fill << 1 means the corpus has documents larger
    * than the window).
    */
  def binStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("n_tokens").cast("long").as("total_tokens"))
      .withColumn("fill",
        least(col("total_tokens").cast("double") / budget, lit(1.0)))
}
