package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ES 8.12+ `learning_to_rank` rescorer: retrieve with a cheap
  * query, re-rank the top `windowSize` with a trained model over
  * per-doc features — the serving half of the M3 feature-logging /
  * M1 model-import pipeline, composed end to end
  * (`eland/ml/ml_model.py` trains and serializes the model; ES's LTR
  * rescorer runs it at search time; this runs the same model
  * in-engine).
  *
  * Semantics (ES's LTR rescore contract): the window re-ranks by the
  * MODEL score alone (full replacement, not a weighted combine — the
  * LTR rescorer has no query_weight); documents beyond the window
  * keep the base ranking BELOW every rescored document — model and
  * BM25 scales are unrelated, so positions never interleave. Output
  * `(rank, id, score)`: 6-dp model score inside the window, base
  * score below it.
  *
  * Scale shape: the base ranking is a sorted limit
  * (TakeOrderedAndProject); features evaluate ONLY on the windowed
  * docs (a broadcast semi-join of ≤ windowSize ids onto the corpus —
  * the text_similarity_reranker fetch discipline); the model is a
  * codegen CASE WHEN Column (ml1), so rescoring is a projection over
  * ≤ windowSize rows. The only windows are over ≤ max(window, k)-row
  * frames.
  *
  * `extractors` are [[FeatureLogger]] extractors specialized to
  * `queryText`; their NAMES must cover the model's feature_names
  * (the judgment-list / serving-time contract — training and serving
  * must compute identical features).
  */
object Ltr {

  def rescoreTopK(docs: DataFrame, idCol: String, queryJson: String,
                  queryText: String, windowSize: Int, k: Int,
                  extractors: Seq[(String, FeatureLogger.Extractor)],
                  model: TreeEnsemble.Model): DataFrame = {
    require(windowSize >= 1, s"windowSize must be >= 1, got $windowSize")
    require(k >= 1, s"k must be >= 1, got $k")
    val names = extractors.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate extractor names in $names")
    val base = graft.functions.EsScoredQuery
      .scoredFrame(docs, idCol, queryJson)
      .select(col(idCol).as("_id"), col("_score").as("_base"))
    val wb = Window.orderBy(col("_base").desc, col("_id").asc)
    val top = base.orderBy(col("_base").desc, col("_id"))
      .limit(math.max(windowSize, k))
      .withColumn("_brank", row_number().over(wb).cast("long"))
    val winIds = top.filter(col("_brank") <= windowSize).select("_id")
    val feats = docs
      .join(broadcast(winIds), docs(idCol) === winIds("_id"))
      .drop("_id")
    val withF = extractors.foldLeft(feats) { case (d, (n, ex)) =>
      d.withColumn(n, ex(queryText))
    }
    val rescored = withF.select(col(idCol).as("_id"),
      round(model.predict.cast("double"), 6).as("score"))
    val wm = Window.orderBy(col("score").desc, col("_id").asc)
    val winRanked = rescored
      .withColumn("rank", row_number().over(wm).cast("long"))
      .select("rank", "_id", "score")
    val below = top.filter(col("_brank") > windowSize)
      .select(col("_brank").as("rank"), col("_id"),
        col("_base").as("score"))
    winRanked.unionByName(below)
      .filter(col("rank") <= k)
      .orderBy("rank")
      .select(col("rank"), col("_id").as("id"), col("score"))
  }
}
