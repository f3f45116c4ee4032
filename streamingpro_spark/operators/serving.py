"""Executor-safe model serving: turn fitted pyspark.ml models into pure
numpy closures registrable as UDFs.

The reference serves models as UDFs (`register RandomForest.`/model` as
rf_predict` — RegisterAdaptor.scala:61-79, SQLRandomForest.scala:113+);
its JVM UDF closes over the in-JVM model.  In PySpark a JavaModel can
neither be pickled nor used on executors, so we extract the parameters:

- linear family (LogisticRegression, LinearSVC, LinearRegression):
  coefficients/intercepts → numpy dot.
- KMeans: cluster centers → nearest-center argmin.
- NaiveBayes: pi/theta matrices → log-likelihood argmax.
- tree ensembles (RandomForest, GBT): the model's own saved
  ``data/*.parquet`` (treeID, nodeData) read executor-side with pyarrow
  and evaluated by a small pure-python tree walker — no JVM, no Spark
  session needed on the executor.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np


def extract_predictor(model: Any, path: str | None = None,
                      spark: Any = None) -> Callable[[Any], float]:
    """Return a picklable fn(features_seq) -> float for a fitted model.
    `spark` enables driver-side model-file reads for non-local paths
    (hdfs://, s3a://) where executor pyarrow glob cannot reach."""
    name = type(model).__name__

    if name == "LogisticRegressionModel":
        coef = np.array(model.coefficientMatrix.toArray())
        intercept = np.array(model.interceptVector.toArray())

        def predict_lr(feats) -> float:
            x = np.asarray(list(feats), dtype=float)
            margins = coef @ x + intercept
            if margins.shape[0] == 1:       # binary
                return float(margins[0] > 0)
            return float(np.argmax(margins))
        return predict_lr

    if name == "LinearSVCModel":
        coef = np.array(model.coefficients.toArray())
        b = float(model.intercept)
        return lambda feats: float(np.dot(coef, np.asarray(list(feats), dtype=float)) + b > 0)

    if name == "LinearRegressionModel":
        coef = np.array(model.coefficients.toArray())
        b = float(model.intercept)
        return lambda feats: float(np.dot(coef, np.asarray(list(feats), dtype=float)) + b)

    if name == "KMeansModel":
        centers = np.array([c.toArray() for c in model.clusterCenters()])

        def predict_km(feats) -> float:
            x = np.asarray(list(feats), dtype=float)
            return float(np.argmin(((centers - x) ** 2).sum(axis=1)))
        return predict_km

    if name == "NaiveBayesModel":
        pi = np.array(model.pi.toArray())
        theta = np.array(model.theta.toArray())

        def predict_nb(feats) -> float:
            x = np.asarray(list(feats), dtype=float)
            return float(np.argmax(pi + theta @ x))
        return predict_nb

    if name in ("RandomForestClassificationModel", "RandomForestRegressionModel",
                "GBTClassificationModel", "GBTRegressionModel",
                "DecisionTreeClassificationModel", "DecisionTreeRegressionModel"):
        if not path:
            raise ValueError(f"{name}: serving needs the saved model path")
        return _tree_ensemble_predictor(os.path.join(path, "model"), name,
                                        spark=spark)

    raise ValueError(f"no executor-safe predictor for model type {name}")


# ---------------------------------------------------------------------------
# tree ensembles from Spark's own model persistence format
# ---------------------------------------------------------------------------

def _tree_ensemble_predictor(model_dir: str, name: str,
                             spark: Any = None) -> Callable[[Any], float]:
    # Everything below is nested so cloudpickle serializes it BY VALUE:
    # module-level helpers would pickle as references to
    # `streamingpro_spark.*`, which executors can't import unless the
    # driver happens to run from the repo root.
    state: dict = {}

    # non-local model storage (hdfs://, s3a://): executor-side pyarrow
    # glob can't reach it — read ONCE driver-side through the JVM reader
    # (any Hadoop FS) and ship the parsed trees in the closure
    preloaded = None
    if spark is not None and "://" in model_dir:
        preloaded = _load_tree_nodes_via_spark(spark, model_dir)

    def load_tree_nodes(mdir: str):
        """Read (treeID?, nodeData) rows from the model's data/*.parquet
        via pyarrow; returns {tree_id: {node_id: node_dict}} + weights."""
        import glob as _glob
        import os as _os

        import pyarrow.parquet as pq
        files = sorted(_glob.glob(_os.path.join(mdir, "data", "*.parquet")))
        if not files:
            raise FileNotFoundError(f"no model data parquet under {mdir}")
        trees: dict[int, dict[int, dict]] = {}
        for f in files:
            tbl = pq.read_table(f).to_pylist()
            for row in tbl:
                tree_id = int(row.get("treeID", 0))
                nd = row.get("nodeData", row)
                node = {
                    "id": int(nd["id"]),
                    "prediction": float(nd["prediction"]),
                    "stats": [float(v) for v in (nd.get("impurityStats")
                                                 or [])],
                    "left": int(nd["leftChild"]),
                    "right": int(nd["rightChild"]),
                    "feature": int(nd["split"]["featureIndex"]),
                    "threshold": list(nd["split"]["leftCategoriesOrThreshold"]),
                    "num_cat": int(nd["split"]["numCategories"]),
                }
                trees.setdefault(tree_id, {})[node["id"]] = node
        weights = None
        meta_files = _glob.glob(_os.path.join(mdir, "treesMetadata", "*.parquet"))
        if meta_files:
            weights = {}
            for f in meta_files:
                for row in pq.read_table(f).to_pylist():
                    # Spark 4.x persists this table with positional names
                    # (_1=treeID, _2=metadata, _3=weights)
                    tid = row.get("treeID", row.get("_1", 0))
                    wt = row.get("weights", row.get("_3", 1.0))
                    weights[int(tid)] = float(wt)
        return trees, weights

    def walk_tree(nodes: dict, x) -> dict:
        node = nodes[0]
        while node["left"] != -1:
            feat = x[node["feature"]]
            if node["num_cat"] >= 0:      # categorical split
                go_left = feat in node["threshold"]
            else:                         # continuous: threshold list len 1
                go_left = feat <= node["threshold"][0]
            node = nodes[node["left"] if go_left else node["right"]]
        return node

    def predict(feats) -> float:
        import numpy as _np
        if "trees" not in state:          # lazy per-executor load
            if preloaded is not None:
                state["trees"], state["weights"] = preloaded
            else:
                state["trees"], state["weights"] = load_tree_nodes(model_dir)
        trees, weights = state["trees"], state["weights"]
        x = list(feats)
        leaves = {t: walk_tree(nodes, x) for t, nodes in trees.items()}
        if name.startswith("GBT"):
            w = [weights.get(t, 1.0) if weights else 1.0 for t in trees]
            votes = [leaves[t]["prediction"] for t in trees]
            score = float(_np.dot(votes, w))
            return float(score > 0) if "Classification" in name else score
        if "Classification" in name:
            # Spark's soft vote: sum each tree's NORMALIZED leaf class
            # counts, argmax (RandomForestClassificationModel.predictRaw)
            # — hard majority can disagree with model.transform when
            # trees are unevenly confident
            stat_rows = [leaves[t]["stats"] for t in trees
                         if leaves[t]["stats"]]
            if stat_rows and len({len(s) for s in stat_rows}) == 1:
                M = _np.asarray(stat_rows, dtype=float)
                tot = M.sum(axis=1, keepdims=True)
                tot[tot == 0] = 1.0
                return float(_np.argmax((M / tot).sum(axis=0)))
            votes = [leaves[t]["prediction"] for t in trees]
            vals, counts = _np.unique(votes, return_counts=True)
            return float(vals[_np.argmax(counts)])
        return float(_np.mean(
            [leaves[t]["prediction"] for t in trees]))

    return predict


def _load_tree_nodes_via_spark(spark, mdir: str):
    """Driver-side tree load through the JVM parquet reader — reaches any
    Hadoop-supported filesystem.  Same node dict shape as the executor
    pyarrow path."""
    trees: dict[int, dict[int, dict]] = {}
    for row in spark.read.parquet(f"{mdir}/data").collect():
        d = row.asDict(recursive=True)
        nd = d.get("nodeData", d)
        node = {
            "id": int(nd["id"]),
            "prediction": float(nd["prediction"]),
            "stats": [float(v) for v in (nd.get("impurityStats") or [])],
            "left": int(nd["leftChild"]),
            "right": int(nd["rightChild"]),
            "feature": int(nd["split"]["featureIndex"]),
            "threshold": list(nd["split"]["leftCategoriesOrThreshold"]),
            "num_cat": int(nd["split"]["numCategories"]),
        }
        trees.setdefault(int(d.get("treeID", 0)), {})[node["id"]] = node
    weights = None
    try:
        weights = {}
        for row in spark.read.parquet(f"{mdir}/treesMetadata").collect():
            d = row.asDict()
            tid = d.get("treeID", d.get("_1", 0))
            wt = d.get("weights", d.get("_3", 1.0))
            weights[int(tid)] = float(wt)
    except Exception:
        weights = None
    return trees, weights
