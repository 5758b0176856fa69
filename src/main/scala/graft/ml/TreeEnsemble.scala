package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tree-ensemble model import + inference — the Spark re-expression of
  * eland's ML sidecar (MLModel.import_model / predict,
  * eland/ml/ml_model.py:249-550 and eland/ml/_model_serializer.py:31-178:
  * sklearn/XGBoost/LightGBM models serialized to a tree/ensemble JSON IR
  * and evaluated server-side).
  *
  * Scoring compiles the ensemble into a nested CASE WHEN Column
  * expression — pure Catalyst, whole-stage-codegen'd, no UDF and no
  * per-row interpretation, which is the 100TB-friendly path: the model
  * ships inside the plan, executors evaluate branch code, and column
  * pruning still sees exactly which features are read.
  *
  * The IR mirrors the reference's TreeNode fields (node_index,
  * split_feature, threshold, left/right child, leaf_value;
  * eland/ml/_model_serializer.py:60-118) without its gzip+b64 wire
  * encoding.
  */
object TreeEnsemble {

  sealed trait Node
  final case class Leaf(value: Double) extends Node
  /** decision: feature <= threshold ? left : right (missing → left,
    * matching the reference's default_left convention).
    */
  final case class Split(feature: String, threshold: Double,
                         left: Node, right: Node) extends Node

  final case class Model(trees: Seq[Node], weights: Seq[Double],
                         kind: String /* "regression" | "classification" */) {
    require(weights.isEmpty || weights.size == trees.size,
      "weights must match tree count")

    private def nodeExpr(n: Node): Column = n match {
      case Leaf(v) => lit(v)
      case Split(f, t, l, r) =>
        when(col(f).isNull || col(f) <= t, nodeExpr(l)).otherwise(nodeExpr(r))
    }

    /** Raw ensemble score: weighted sum of tree outputs. */
    def score: Column = {
      val ws = if (weights.isEmpty) Seq.fill(trees.size)(1.0) else weights
      trees.zip(ws).map { case (tr, w) =>
        if (w == 1.0) nodeExpr(tr) else nodeExpr(tr) * w
      }.reduce(_ + _)
    }

    /** eland MLModel.predict shape: int class for classification (score
      * thresholded at 0), double for regression
      * (eland/ml/ml_model.py:92-212).
      */
    def predict: Column =
      if (kind == "classification") (score > 0).cast("int") else score
  }

  /** Import the REFERENCE's serialization format: the ES trained-model
    * JSON eland emits from sklearn/XGBoost/LightGBM models
    * (eland/ml/_model_serializer.py:60-178 — index-addressed TreeNode
    * rows with node_idx / split_feature / threshold / default_left /
    * left_child / right_child / leaf_value inside
    * {"ensemble": {"trained_models": [{"tree": {...}}], "weights",
    * "target_type"}}), so a model exported by the reference loads
    * directly. Only the gzip+b64 envelope is expected to be stripped.
    */
  def fromEsTrainedModel(json: String): Model = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    val ens = root \ "ensemble" match {
      case JNothing => root
      case e        => e
    }

    def buildTree(tree: JValue): Node = {
      val names = (tree \ "feature_names").extract[Seq[String]]
      val nodes = (tree \ "tree_structure").extract[Seq[JValue]]
        .map(n => (n \ "node_index").extract[Int] -> n).toMap
      def build(idx: Int): Node = {
        val n = nodes(idx)
        (n \ "leaf_value") match {
          case JDouble(v) => Leaf(v)
          case JInt(v)    => Leaf(v.toDouble)
          case _ =>
            Split(
              names((n \ "split_feature").extract[Int]),
              (n \ "threshold").extract[Double],
              build((n \ "left_child").extract[Int]),
              build((n \ "right_child").extract[Int]))
        }
      }
      build(0)
    }

    val trees = (ens \ "trained_models").extract[Seq[JValue]]
      .map(tm => buildTree(tm \ "tree"))
    val weights = (ens \ "weights") match {
      case JNothing => Nil
      case w        => w.extract[Seq[Double]]
    }
    val kind = (ens \ "target_type").extractOrElse[String]("regression")
    Model(trees, weights, kind)
  }

  /** Minimal JSON decoder for the IR, using the JSON parser Spark
    * already ships (no extra dependency). Format:
    * {"kind":"regression","weights":[..],
    *  "trees":[{"feature":"f1","threshold":1.5,
    *            "left":{"value":1.0},"right":{...}}]}
    */
  def fromJson(json: String): Model = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(json)

    def node(v: JValue): Node = v \ "value" match {
      case JDouble(d) => Leaf(d)
      case JInt(i)    => Leaf(i.toDouble)
      case _ =>
        Split(
          (v \ "feature").extract[String],
          (v \ "threshold").extract[Double],
          node(v \ "left"), node(v \ "right"))
    }
    Model(
      (root \ "trees").extract[Seq[JValue]].map(node),
      (root \ "weights") match {
        case JNothing => Nil
        case w        => w.extract[Seq[Double]]
      },
      (root \ "kind").extractOrElse[String]("regression"))
  }
}
