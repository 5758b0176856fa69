package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TreeEnsembleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val json =
    """{"kind":"regression","weights":[0.5,0.5],
      | "trees":[
      |  {"feature":"x","threshold":1.0,
      |   "left":{"value":10.0},
      |   "right":{"feature":"y","threshold":0.0,
      |            "left":{"value":20.0},"right":{"value":30.0}}},
      |  {"feature":"y","threshold":5.0,
      |   "left":{"value":-2.0},"right":{"value":2.0}}
      |]}""".stripMargin

  test("json round-trip and plan-compiled scoring match hand evaluation") {
    import spark.implicits._
    val m = TreeEnsemble.fromJson(json)
    assert(m.trees.size == 2 && m.kind == "regression")
    val df = Seq(
      (0.5, 9.0),   // t1: x<=1 -> 10 ; t2: y>5 -> 2  => .5*10 + .5*2 = 6
      (2.0, -1.0),  // t1: x>1, y<=0 -> 20 ; t2: y<=5 -> -2 => 9
      (2.0, 6.0)    // t1: x>1, y>0 -> 30 ; t2: 2 => 16
    ).toDF("x", "y")
    val got = df.select(m.score.as("s")).collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(6.0, 9.0, 16.0))
  }

  test("null features route left like the reference's default_left") {
    import spark.implicits._
    val m = TreeEnsemble.fromJson(json)
    val df = Seq((Option.empty[Double], Option(9.0))).toDF("x", "y")
    val got = df.select(m.score.as("s")).head().getDouble(0)
    assert(got == 0.5 * 10.0 + 0.5 * 2.0)
  }

  test("classification thresholds the score at zero") {
    import spark.implicits._
    val m = TreeEnsemble.Model(
      Seq(TreeEnsemble.Split("x", 0.0,
        TreeEnsemble.Leaf(-1.0), TreeEnsemble.Leaf(1.0))),
      Nil, "classification")
    val got = Seq(-5.0, 5.0).toDF("x")
      .select(m.predict.as("p")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 1))
  }

  test("the reference's ES trained-model JSON imports and scores") {
    import spark.implicits._
    // shape per eland/ml/_model_serializer.py:60-178 (node_index rows)
    val esJson =
      """{"ensemble": {"target_type": "regression", "weights": [1.0],
        |  "trained_models": [{"tree": {
        |    "feature_names": ["f0", "f1"],
        |    "tree_structure": [
        |      {"node_index": 0, "split_feature": 0, "threshold": 2.0,
        |       "default_left": true, "left_child": 1, "right_child": 2},
        |      {"node_index": 1, "leaf_value": 7.0},
        |      {"node_index": 2, "split_feature": 1, "threshold": 5.0,
        |       "default_left": true, "left_child": 3, "right_child": 4},
        |      {"node_index": 3, "leaf_value": 1.0},
        |      {"node_index": 4, "leaf_value": -1.0}
        |    ]}}]}}""".stripMargin
    val m = TreeEnsemble.fromEsTrainedModel(esJson)
    val got = Seq((1.0, 0.0), (3.0, 4.0), (3.0, 6.0)).toDF("f0", "f1")
      .select(m.score.as("s")).collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(7.0, 1.0, -1.0))
  }

  test("scoring stays whole-stage-codegen (no UDF in the plan)") {
    import spark.implicits._
    val m = TreeEnsemble.fromJson(json)
    val plan = Seq((1.0, 2.0)).toDF("x", "y").select(m.score.as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
