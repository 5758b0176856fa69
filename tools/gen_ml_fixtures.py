#!/usr/bin/env python3
"""Generate ES trained-model JSON fixtures for TreeEnsembleSpec using the
REFERENCE's own serializer (eland/ml/_model_serializer.py), so the Scala
importer is tested against bytes the actual reference code emits, not a
hand-rolled imitation of the format.

The serializer module is pure stdlib (base64/gzip/json/abc) — we load it
by file path to avoid importing the eland package (which would pull the
elasticsearch client). Only fixture DATA is written into this repo.

Usage: python3 tools/gen_ml_fixtures.py
Writes: src/test/resources/ml/*.json and *.b64
"""
import importlib.util
import json
import os
import sys

SER = "/root/reference/eland/ml/_model_serializer.py"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "ml")

spec = importlib.util.spec_from_file_location("_model_serializer", SER)
ms = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ms)
Tree, TreeNode, Ensemble = ms.Tree, ms.TreeNode, ms.Ensemble


def sklearn_rf_regressor():
    """Shape of SKLearnForestRegressorTransformer output: decision_type
    'lte' on every node, NO default_left (sklearn has no missing
    handling), aggregate_output.weighted_sum.weights = [1/n]*n
    (eland/ml/transformers/sklearn.py:60-110,225-231)."""
    feats = ["f0", "f1"]

    def t(nodes):
        return Tree(feature_names=feats, target_type="regression",
                    tree_structure=nodes)

    t0 = t([
        TreeNode(0, decision_type="lte", left_child=1, right_child=2,
                 split_feature=0, threshold=2.0, number_samples=10),
        TreeNode(1, decision_type="lte", leaf_value=[7.0], number_samples=6),
        TreeNode(2, decision_type="lte", left_child=3, right_child=4,
                 split_feature=1, threshold=5.0, number_samples=4),
        TreeNode(3, decision_type="lte", leaf_value=[1.0], number_samples=2),
        TreeNode(4, decision_type="lte", leaf_value=[-1.0], number_samples=2),
    ])
    t1 = t([
        TreeNode(0, decision_type="lte", left_child=1, right_child=2,
                 split_feature=1, threshold=0.0, number_samples=10),
        TreeNode(1, decision_type="lte", leaf_value=[4.0], number_samples=5),
        TreeNode(2, decision_type="lte", leaf_value=[10.0], number_samples=5),
    ])
    t2 = t([TreeNode(0, decision_type="lte", leaf_value=[3.0], number_samples=10)])
    n = 3
    return Ensemble(
        feature_names=feats,
        trained_models=[t0, t1, t2],
        output_aggregator={"weighted_sum": {"weights": [1.0 / n] * n}},
        target_type="regression",
    )


def xgboost_regressor():
    """Shape of XGBoostRegressorTransformer output: decision_type 'lt',
    per-node default_left (Yes==Missing), aggregate_output
    {'weighted_sum': {}} with NO weights, plus the base-score stump
    (eland/ml/transformers/xgboost.py:58,107-126,225-226)."""
    feats = ["a", "b"]

    def t(nodes):
        return Tree(feature_names=feats, target_type="regression",
                    tree_structure=nodes)

    stump = t([TreeNode(0, leaf_value=[0.5])])  # base_score stump
    t0 = t([
        TreeNode(0, decision_type="lt", left_child=1, right_child=2,
                 split_feature=0, threshold=1.0, default_left=True),
        TreeNode(1, decision_type="lt", leaf_value=[-2.0]),
        TreeNode(2, decision_type="lt", left_child=3, right_child=4,
                 split_feature=1, threshold=3.0, default_left=False),
        TreeNode(3, decision_type="lt", leaf_value=[2.5]),
        TreeNode(4, decision_type="lt", leaf_value=[6.0]),
    ])
    return Ensemble(
        feature_names=feats,
        trained_models=[stump, t0],
        output_aggregator={"weighted_sum": {}},
        target_type="regression",
    )


def sklearn_rf_classifier():
    """Shape of SKLearnForestClassifierTransformer output: log-prob
    vector leaves, aggregate_output weighted_mode with num_classes
    (eland/ml/transformers/sklearn.py:88-96,255)."""
    import math
    feats = ["x"]

    def logp(p):
        return [-10000000 if n <= 0 else math.log(float(n)) for n in p]

    def t(nodes):
        return Tree(feature_names=feats, target_type="classification",
                    classification_labels=["no", "yes"], tree_structure=nodes)

    t0 = t([
        TreeNode(0, decision_type="lte", left_child=1, right_child=2,
                 split_feature=0, threshold=0.0),
        TreeNode(1, decision_type="lte", leaf_value=logp([0.9, 0.1])),
        TreeNode(2, decision_type="lte", leaf_value=logp([0.2, 0.8])),
    ])
    t1 = t([
        TreeNode(0, decision_type="lte", left_child=1, right_child=2,
                 split_feature=0, threshold=1.0),
        TreeNode(1, decision_type="lte", leaf_value=logp([0.6, 0.4])),
        TreeNode(2, decision_type="lte", leaf_value=logp([0.0, 1.0])),
    ])
    return Ensemble(
        feature_names=feats,
        trained_models=[t0, t1],
        output_aggregator={"weighted_mode": {"num_classes": 2}},
        target_type="classification",
        classification_labels=["no", "yes"],
    )


def xgboost_binary_classifier():
    """XGBoostClassifierTransformer: scalar logit leaves, decision_type
    'lt', aggregate_output logistic_regression
    (eland/ml/transformers/xgboost.py:273)."""
    feats = ["x", "y"]

    def t(nodes):
        return Tree(feature_names=feats, target_type="classification",
                    tree_structure=nodes)

    t0 = t([
        TreeNode(0, decision_type="lt", left_child=1, right_child=2,
                 split_feature=0, threshold=0.5, default_left=False),
        TreeNode(1, decision_type="lt", leaf_value=[-1.2]),
        TreeNode(2, decision_type="lt", leaf_value=[1.7]),
    ])
    t1 = t([
        TreeNode(0, decision_type="lt", left_child=1, right_child=2,
                 split_feature=1, threshold=2.0, default_left=True),
        TreeNode(1, decision_type="lt", leaf_value=[0.4]),
        TreeNode(2, decision_type="lt", leaf_value=[-0.9]),
    ])
    return Ensemble(
        feature_names=feats,
        trained_models=[t0, t1],
        output_aggregator={"logistic_regression": {}},
        target_type="classification",
        classification_labels=["neg", "pos"],
    )


def lightgbm_rf_regressor():
    """Shape of LGBMRegressorTransformer output for boosting_type='rf':
    aggregate_output.weighted_sum.weights = [1/n]*n
    (eland/ml/transformers/lightgbm.py:201-207), per-node default_left +
    transform_decider mapping ('<='→lte, '>'→gt, ...; lightgbm.py:30-41,
    75-92). A 'gt' node exercises the non-default decider path."""
    feats = ["f0", "f1"]

    def t(nodes):
        return Tree(feature_names=feats, target_type="regression",
                    tree_structure=nodes)

    t0 = t([
        TreeNode(0, decision_type="gt", left_child=1, right_child=2,
                 split_feature=0, threshold=1.0, default_left=True,
                 number_samples=10),
        TreeNode(1, decision_type="lte", leaf_value=[4.0], number_samples=4),
        TreeNode(2, decision_type="lte", leaf_value=[2.0], number_samples=6),
    ])
    t1 = t([
        TreeNode(0, decision_type="lte", left_child=1, right_child=2,
                 split_feature=1, threshold=3.0, default_left=False,
                 number_samples=10),
        TreeNode(1, decision_type="lte", leaf_value=[1.0], number_samples=5),
        TreeNode(2, decision_type="lte", leaf_value=[7.0], number_samples=5),
    ])
    n = 2
    return Ensemble(
        feature_names=feats,
        trained_models=[t0, t1],
        output_aggregator={"weighted_sum": {"weights": [1.0 / n] * n}},
        target_type="regression",
    )


def lightgbm_multiclass_classifier():
    """Shape of LGBMClassifierTransformer multiclass output: one-hot
    logit leaves — leaf_val[tree_id % n_classes] carries the tree's
    scalar (eland/ml/transformers/lightgbm.py:230-239) — with
    aggregate_output logistic_regression (lightgbm.py:258)."""
    feats = ["f0"]

    def t(nodes):
        return Tree(feature_names=feats, target_type="classification",
                    classification_labels=["a", "b", "c"],
                    tree_structure=nodes)

    def onehot(tree_id, v):
        leaf = [0.0, 0.0, 0.0]
        leaf[tree_id % 3] = v
        return leaf

    t0 = t([
        TreeNode(0, decision_type="lte", left_child=1, right_child=2,
                 split_feature=0, threshold=0.0),
        TreeNode(1, leaf_value=onehot(0, 2.0)),
        TreeNode(2, leaf_value=onehot(0, 0.5)),
    ])
    t1 = t([
        TreeNode(0, decision_type="lte", left_child=1, right_child=2,
                 split_feature=0, threshold=1.0),
        TreeNode(1, leaf_value=onehot(1, 1.5)),
        TreeNode(2, leaf_value=onehot(1, 0.2)),
    ])
    t2 = t([
        TreeNode(0, decision_type="lte", left_child=1, right_child=2,
                 split_feature=0, threshold=2.0),
        TreeNode(1, leaf_value=onehot(2, 0.1)),
        TreeNode(2, leaf_value=onehot(2, 3.0)),
    ])
    return Ensemble(
        feature_names=feats,
        trained_models=[t0, t1, t2],
        output_aggregator={"logistic_regression": {}},
        target_type="classification",
        classification_labels=["a", "b", "c"],
    )


def single_tree_regressor():
    """SKLearnDecisionTreeTransformer serializes a bare Tree (no
    ensemble wrapper) — serialize_model gives
    {'trained_model': {'tree': {...}}}."""
    return Tree(
        feature_names=["q"],
        target_type="regression",
        tree_structure=[
            TreeNode(0, decision_type="lte", left_child=1, right_child=2,
                     split_feature=0, threshold=10.0),
            TreeNode(1, decision_type="lte", leaf_value=[100.0]),
            TreeNode(2, decision_type="lte", leaf_value=[200.0]),
        ],
    )


def main():
    os.makedirs(OUT, exist_ok=True)
    fixtures = {
        "sklearn_rf_regressor": sklearn_rf_regressor(),
        "xgboost_regressor": xgboost_regressor(),
        "sklearn_rf_classifier": sklearn_rf_classifier(),
        "xgboost_binary_classifier": xgboost_binary_classifier(),
        "lightgbm_rf_regressor": lightgbm_rf_regressor(),
        "lightgbm_multiclass_classifier": lightgbm_multiclass_classifier(),
        "single_tree_regressor": single_tree_regressor(),
    }
    for name, model in fixtures.items():
        payload = model.serialize_model()  # {"trained_model": {...}} envelope
        with open(os.path.join(OUT, name + ".json"), "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
    # one compressed (gzip+b64) variant to exercise fromEsCompressed
    with open(os.path.join(OUT, "xgboost_regressor.b64"), "w") as f:
        f.write(fixtures["xgboost_regressor"].serialize_and_compress_model())
        f.write("\n")
    print("wrote", len(fixtures) + 1, "fixtures to", os.path.normpath(OUT))


if __name__ == "__main__":
    sys.exit(main())
