package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tree-ensemble model import + inference — the Spark re-expression of
  * eland's ML sidecar (MLModel.import_model / predict,
  * eland/ml/ml_model.py:249-550 and eland/ml/_model_serializer.py:31-178:
  * sklearn/XGBoost/LightGBM models serialized to a tree/ensemble JSON IR
  * and evaluated server-side).
  *
  * Scoring compiles the ensemble into nested CASE WHEN Column
  * expressions — pure Catalyst, whole-stage-codegen'd, no UDF and no
  * per-row interpretation, which is the 100TB-friendly path: the model
  * ships inside the plan, executors evaluate branch code, and column
  * pruning still sees exactly which features are read.
  *
  * Wire format parsed by [[fromEsTrainedModel]] — exactly what the
  * reference's serializer emits (eland/ml/_model_serializer.py:52-56
  * `serialize_model` wraps everything in `{"trained_model": ...}`):
  *
  * {{{
  * {"trained_model": {"ensemble": {
  *    "feature_names": [...], "target_type": "regression"|"classification",
  *    "classification_labels": [...],           // optional
  *    "trained_models": [{"tree": {"feature_names": [...],
  *       "tree_structure": [{"node_index":0, "decision_type":"lt"|"lte"|"gt"|"gte",
  *                           "split_feature":0, "threshold":1.5,
  *                           "default_left":false, "left_child":1, "right_child":2},
  *                          {"node_index":1, "leaf_value": 0.5 | [..per-class..]}]}}],
  *    "aggregate_output": {"weighted_sum": {"weights": [...]}}   // or {}
  *                      | {"weighted_mode": {"num_classes": 2}}
  *                      | {"logistic_regression": {}}
  * }}}
  * }}}
  *
  * Key reference facts honored here (per-transformer):
  *  - tree weights live under `aggregate_output.weighted_sum.weights`
  *    (1/n for sklearn / LightGBM random forests,
  *    eland/ml/transformers/sklearn.py:225-231,
  *    eland/ml/transformers/lightgbm.py:201-207); when the aggregator
  *    carries no weights every tree weighs 1.0;
  *  - `decision_type` is "lte" for sklearn (sklearn.py:62) but "lt" for
  *    XGBoost (xgboost.py:58) and whatever LightGBM's decider maps to
  *    (lightgbm.py:30-41), with condition-true routing LEFT;
  *  - missing (null/NaN) features route by per-node `default_left`
  *    (xgboost.py:110 `row["Yes"] == row["Missing"]`), absent ⇒ false
  *    (right), matching the ES TreeNode default;
  *  - multi-class leaves are per-class vectors
  *    (sklearn.py:92-96 log-probs, lightgbm.py:236-239 one-hot logits);
  *  - classifiers aggregate with weighted_mode (sklearn.py:255) or
  *    logistic_regression (xgboost.py:273, lightgbm.py:258).
  */
object TreeEnsemble {

  sealed trait Node
  final case class Leaf(values: Vector[Double]) extends Node
  object Leaf { def apply(v: Double): Leaf = Leaf(Vector(v)) }

  /** Decision node: `feature <op> threshold ? left : right` where `<op>`
    * is the ES decision_type ("lte"|"lt"|"gt"|"gte"; condition-true goes
    * left). Missing (null/NaN) feature values route to `left` when
    * `defaultLeft`, else `right`.
    */
  final case class Split(feature: String, threshold: Double,
                         left: Node, right: Node,
                         decisionType: String = "lte",
                         defaultLeft: Boolean = false) extends Node

  /** ES ensemble output aggregators (eland transformers' build_aggregator_output). */
  sealed trait Aggregator { def weights: Option[Seq[Double]] }
  final case class WeightedSum(weights: Option[Seq[Double]]) extends Aggregator
  final case class WeightedMode(weights: Option[Seq[Double]], numClasses: Int) extends Aggregator
  final case class LogisticRegression(weights: Option[Seq[Double]]) extends Aggregator
  final case class Exponent(weights: Option[Seq[Double]]) extends Aggregator

  final case class Model(trees: Seq[Node],
                         aggregator: Aggregator,
                         kind: String /* "regression" | "classification" */,
                         labels: Seq[String] = Nil) {
    require(aggregator.weights.forall(_.size == trees.size),
      "aggregate_output weights must match tree count")

    private def treeWeights: Seq[Double] =
      aggregator.weights.getOrElse(Seq.fill(trees.size)(1.0))

    /** Number of classes carried by vector leaves (1 = scalar trees). */
    private val leafWidth: Int = {
      def width(n: Node): Int = n match {
        case Leaf(v)        => v.size
        case Split(_, _, l, r, _, _) => math.max(width(l), width(r))
      }
      trees.map(width).max
    }

    /** CASE WHEN skeleton shared by all per-tree compilations: missing
      * (null/NaN) routes by default_left, then decision_type-true routes
      * left. The missing case is FOLDED into the compare arm so each
      * subtree is emitted exactly once — a separate missing WHEN arm
      * would re-emit the default-route child, growing the compiled
      * expression O(3^depth) instead of O(2^depth) and blowing the
      * 64KB codegen method limit on deep trees.
      */
    private def branch(s: Split, leafExpr: Leaf => Column): Column = {
      def rec(n: Node): Column = n match {
        case leaf: Leaf => leafExpr(leaf)
        case sp @ Split(_, t, l, r, dt, dl) =>
          val f = col(quoteIfNeeded(sp.feature))
          val compare = dt match {
            case "lt"  => f < t
            case "gt"  => f > t
            case "gte" => f >= t
            case _     => f <= t // "lte" — sklearn default
          }
          val missing = f.isNull || f.isNaN
          // null `compare` short-circuits correctly in both shapes:
          // (true || null) = true, (false && null) = false
          val goLeft = if (dl) missing || compare else !missing && compare
          when(goLeft, rec(l)).otherwise(rec(r))
      }
      rec(s)
    }

    /** Compile one tree to a scalar Column selecting class-slot `c`
      * from each leaf (scalar leaves ignore `c`).
      */
    private def nodeExpr(n: Node, c: Int): Column = n match {
      case Leaf(v) => lit(if (v.size == 1) v.head else v.applyOrElse(c, (_: Int) => 0.0))
      case s: Split =>
        branch(s, leaf => lit(
          if (leaf.values.size == 1) leaf.values.head
          else leaf.values.applyOrElse(c, (_: Int) => 0.0)))
    }

    /** Per-tree vote class for weighted_mode: vector leaves vote their
      * argmax (constant-folded at compile time, ties to the lowest
      * index), scalar leaves vote round(value).
      */
    private def voteExpr(n: Node): Column = {
      def vote(leaf: Leaf): Column = lit(
        if (leaf.values.size == 1) math.round(leaf.values.head).toInt
        else leaf.values.indexOf(leaf.values.max))
      n match {
        case leaf: Leaf => vote(leaf)
        case s: Split   => branch(s, vote)
      }
    }

    /** Σ w_i · tree_i[c] — the weighted-sum score for class slot `c`. */
    private def classScore(c: Int): Column =
      trees.zip(treeWeights).map { case (tr, w) =>
        if (w == 1.0) nodeExpr(tr, c) else nodeExpr(tr, c) * w
      }.reduce(_ + _)

    /** argmax over per-class columns; ties break to the LOWEST class
      * index (struct compare on (score, numClasses - c) — both ascending,
      * so greatest prefers higher score then lower c).
      */
    private def argmax(scores: Seq[Column]): Column = {
      val n = scores.size
      val structs = scores.zipWithIndex.map { case (s, c) =>
        struct(s.as("s"), lit(n - c).as("nc"))
      }
      (lit(n) - greatest(structs: _*).getField("nc")).cast("int")
    }

    /** Raw ensemble score (scalar-leaf weighted sum) — the regression
      * output and the binary-classification logit.
      */
    def score: Column = classScore(0)

    /** Probability of the WINNING class only (the max over
      * [[probabilities]]). Binary logistic: sigmoid of the summed logit;
      * multi-class: the largest softmax term. Use [[probabilities]] for
      * the full per-class distribution (eland predict_proba shape).
      */
    def topClassProbability: Column = {
      if (leafWidth == 1) lit(1.0) / (lit(1.0) + exp(-score))
      else greatest(probabilities: _*)
    }

    /** Kept name from round 1; see [[topClassProbability]]. */
    def probability: Column = topClassProbability

    /** Full per-class probability distribution, one Column per class —
      * eland MLModel.predict_proba (eland/ml/ml_model.py:214-247).
      * Binary (scalar-leaf) models yield [1-p, p]; multi-class models a
      * max-shifted softmax over the per-class score sums.
      */
    def probabilities: Seq[Column] = {
      if (leafWidth == 1) {
        val p = lit(1.0) / (lit(1.0) + exp(-score))
        Seq(lit(1.0) - p, p)
      } else {
        val sums = (0 until leafWidth).map(classScore)
        val mx = greatest(sums: _*)
        val exps = sums.map(s => exp(s - mx))
        val tot = exps.reduce(_ + _)
        exps.map(_ / tot)
      }
    }

    /** eland MLModel.predict shape (eland/ml/ml_model.py:92-212): int
      * class index for classification, double for regression.
      */
    def predict: Column = (kind, aggregator) match {
      case ("regression", _: Exponent) => exp(score)
      case ("regression", _)           => score
      case (_, WeightedMode(_, numClasses)) =>
        val votes = trees.zip(treeWeights).map { case (tr, w) => (voteExpr(tr), w) }
        val perClass = (0 until numClasses).map { c =>
          votes.map { case (v, w) => when(v === c, lit(w)).otherwise(lit(0.0)) }
            .reduce(_ + _)
        }
        argmax(perClass)
      case _ => // logistic_regression (or weighted_sum classification)
        if (leafWidth == 1) (score > 0).cast("int") // sigmoid(x) > .5 ⇔ x > 0
        else argmax((0 until leafWidth).map(classScore))
    }

    /** Classification label (string) when the model carries
      * classification_labels, else the numeric predict.
      */
    def predictLabel: Column =
      if (labels.isEmpty) predict
      else element_at(lit(labels.toArray), predict + 1)
  }

  private def quoteIfNeeded(name: String): String =
    if (name.forall(ch => ch.isLetterOrDigit || ch == '_')) name
    else s"`${name.replace("`", "``")}`"

  // ---------------------------------------------------------------- parsing

  /** Import the reference's serialization: the ES trained-model JSON
    * eland emits from sklearn/XGBoost/LightGBM models
    * (eland/ml/_model_serializer.py:52-56 serialize_model envelope,
    * :66-111 TreeNode rows, :144-176 Ensemble with aggregate_output).
    * Accepts the full `{"trained_model": ...}` envelope, a bare
    * `{"ensemble": ...}` / `{"tree": ...}`, or the inner dict.
    */
  def fromEsTrainedModel(json: String): Model = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    val tm = root \ "trained_model" match {
      case JNothing => root
      case t        => t
    }
    tm \ "ensemble" match {
      case JNothing =>
        tm \ "tree" match {
          case JNothing => parseEnsembleBody(tm) // inner ensemble dict
          case tree     => parseSingleTree(tree)
        }
      case ens => parseEnsembleBody(ens)
    }
  }

  /** The reference's `serialize_and_compress_model` output: gzip'd JSON
    * in base64 (eland/ml/_model_serializer.py:57-61).
    */
  def fromEsCompressed(b64: String): Model = {
    val gz = java.util.Base64.getDecoder.decode(b64.trim)
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(gz))
    val json = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    fromEsTrainedModel(json)
  }

  private def parseSingleTree(tree: org.json4s.JValue): Model = {
    import org.json4s._
    implicit val fmt: Formats = DefaultFormats
    val kind = (tree \ "target_type").extractOrElse[String]("regression")
    val labels = (tree \ "classification_labels") match {
      case JNothing => Nil
      case l        => l.extract[Seq[String]]
    }
    Model(Seq(buildTree(tree)), WeightedSum(None), kind, labels)
  }

  private def parseEnsembleBody(ens: org.json4s.JValue): Model = {
    import org.json4s._
    implicit val fmt: Formats = DefaultFormats
    val trees = (ens \ "trained_models").extract[Seq[JValue]].map { tm =>
      tm \ "tree" match {
        case JNothing => buildTree(tm) // tolerate un-nested tree dicts
        case t        => buildTree(t)
      }
    }
    def optWeights(agg: JValue): Option[Seq[Double]] = agg \ "weights" match {
      case JNothing => None
      case w        => Some(w.extract[Seq[Double]])
    }
    val aggregator = (ens \ "aggregate_output") match {
      case JNothing =>
        // legacy/hand-rolled: ensemble-level "weights" (not emitted by the
        // reference, kept for fromJson-style payloads)
        (ens \ "weights") match {
          case JNothing => WeightedSum(None)
          case w        => WeightedSum(Some(w.extract[Seq[Double]]))
        }
      case agg =>
        (agg \ "weighted_sum", agg \ "weighted_mode", agg \ "logistic_regression", agg \ "exponent") match {
          case (ws, _, _, _) if ws != JNothing => WeightedSum(optWeights(ws))
          case (_, wm, _, _) if wm != JNothing =>
            WeightedMode(optWeights(wm), (wm \ "num_classes").extractOrElse[Int](2))
          case (_, _, lr, _) if lr != JNothing => LogisticRegression(optWeights(lr))
          case (_, _, _, ex) if ex != JNothing => Exponent(optWeights(ex))
          case _                               => WeightedSum(None)
        }
    }
    val kind = (ens \ "target_type").extractOrElse[String]("regression")
    val labels = (ens \ "classification_labels") match {
      case JNothing => Nil
      case l        => l.extract[Seq[String]]
    }
    Model(trees, aggregator, kind, labels)
  }

  /** One tree dict → Node graph. Node rows are index-addressed
    * (eland/ml/_model_serializer.py:92-111): leaf_value is a scalar for
    * single-output trees or a per-class array; decision nodes carry
    * decision_type / default_left which we preserve.
    */
  private def buildTree(tree: org.json4s.JValue): Node = {
    import org.json4s._
    implicit val fmt: Formats = DefaultFormats
    val names = (tree \ "feature_names") match {
      case JNothing => Seq.empty[String]
      case n        => n.extract[Seq[String]]
    }
    val nodes = (tree \ "tree_structure").extract[Seq[JValue]]
      .map(n => (n \ "node_index").extract[Int] -> n).toMap
    def featName(i: Int): String =
      if (i < names.size) names(i) else s"f$i"
    def build(idx: Int): Node = {
      val n = nodes(idx)
      (n \ "leaf_value") match {
        case JNothing =>
          Split(
            featName((n \ "split_feature").extract[Int]),
            (n \ "threshold").extract[Double],
            build((n \ "left_child").extract[Int]),
            build((n \ "right_child").extract[Int]),
            (n \ "decision_type").extractOrElse[String]("lte"),
            (n \ "default_left").extractOrElse[Boolean](false))
        case JArray(vs)  => Leaf(vs.map(_.extract[Double]).toVector)
        case JDouble(v)  => Leaf(v)
        case JInt(v)     => Leaf(v.toDouble)
        case JLong(v)    => Leaf(v.toDouble)
        case JDecimal(v) => Leaf(v.toDouble)
        case other       => Leaf(other.extract[Double])
      }
    }
    build(0)
  }

  /** Minimal JSON decoder for the hand-rolled IR (kept as the
    * no-dependency authoring format for tests/examples):
    * {"kind":"regression","weights":[..],
    *  "trees":[{"feature":"f1","threshold":1.5,
    *            "left":{"value":1.0},"right":{...}}]}
    * Optional per-node "decision_type" / "default_left" match the ES
    * fields; the legacy default here is default_left=true (missing →
    * left) to preserve round-1 fixtures.
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
          node(v \ "left"), node(v \ "right"),
          (v \ "decision_type").extractOrElse[String]("lte"),
          (v \ "default_left").extractOrElse[Boolean](true))
    }
    val weights = (root \ "weights") match {
      case JNothing => None
      case w        => Some(w.extract[Seq[Double]])
    }
    Model(
      (root \ "trees").extract[Seq[JValue]].map(node),
      WeightedSum(weights),
      (root \ "kind").extractOrElse[String]("regression"))
  }
}
