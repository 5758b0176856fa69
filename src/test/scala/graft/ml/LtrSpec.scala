package graft.ml

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LtrSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val model = TreeEnsemble.fromEsTrainedModel(
    """{"trained_model":{"ensemble":{
      |  "feature_names":["term_overlap"],
      |  "target_type":"regression",
      |  "trained_models":[
      |   {"tree":{"feature_names":["term_overlap"],
      |    "tree_structure":[
      |     {"node_index":0,"decision_type":"lte","split_feature":0,
      |      "threshold":1.0,"left_child":1,"right_child":2},
      |     {"node_index":1,"leaf_value":1.0},
      |     {"node_index":2,"leaf_value":4.0}]}}],
      |  "aggregate_output":{"weighted_sum":{"weights":[1.0]}}
      |}}}""".stripMargin)

  test("LTR rescore: model REPLACES window scores, below-window " +
      "keeps base order after; window smaller than matches") {
    // base BM25 favors repeated 'alpha'; the model favors docs
    // holding BOTH query terms (term_overlap = 2) — doc 3 must jump
    // doc 1 inside the window
    val docs = Seq(
      (1L, "alpha alpha alpha alpha"), (2L, "alpha alpha alpha"),
      (3L, "alpha beta"), (4L, "alpha x"), (5L, "alpha y z")
    ).toDF("doc_id", "text")
    val out = Ltr.rescoreTopK(docs, "doc_id",
      """{"match": {"text": "alpha beta"}}""", "alpha beta",
      windowSize = 3, k = 5,
      extractors = FeatureLogger.defaultExtractors("text"),
      model = model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // base order: 1, 2, 3 (tf), then 4, 5; window of 3 re-ranks to
    // 3 (overlap 2 -> 4.0) then 1, 2 (1.0, id tie); 4, 5 keep base
    assert(out.map(x => (x._1, x._2)).toSeq ==
      Seq((1L, 3L), (2L, 1L), (3L, 2L), (4L, 4L), (5L, 5L)))
    assert(out(0)._3 == 4.0 && out(1)._3 == 1.0)
    // below-window rows carry their BASE scores
    assert(out(3)._3 > 0.0 && out(3)._3 != 1.0 && out(3)._3 != 4.0)
    intercept[IllegalArgumentException](Ltr.rescoreTopK(docs, "doc_id",
      """{"match": {"text": "alpha"}}""", "alpha", 0, 5,
      FeatureLogger.defaultExtractors("text"), model))
  }
}
