"""ML algorithm ETs — thin wrappers over pyspark.ml (SURVEY.md §2.4).

Reference pattern (streaming/dsl/mmlib/algs/SQL*.scala, e.g.
SQLRandomForest.scala:38-120): `train` fits and saves to path,
`batchPredict` loads + transforms, `register ... as fn` builds a
vector→prediction UDF.  `keepVersion="true"` writes `_model_N` path
suffixes and load/predict resolve the LATEST version (reference
algs/MetaConst.scala convention); without it, plain overwrite.
Version scan uses the local filesystem (tests/CLI); a DFS deploy
would swap `_list_versions` for a Hadoop FS listing.

Input convention (same as reference): a `features` vector column (build
with vec_dense(...) from the built-in function library) + `label`.
"""

from __future__ import annotations

import os
from typing import Any

from streamingpro_spark.operators.base import ETAlgorithm
from streamingpro_spark.operators.registry import register_et


class _MLWrapper(ETAlgorithm):
    model_type = "algorithm"
    estimator_cls: Any = None
    model_cls: Any = None
    #: params forwarded to the estimator as-is (string → proper type by Param)
    int_params: tuple = ()
    float_params: tuple = ()
    str_params: tuple = ()

    def _estimator(self, params: dict[str, str]):
        kwargs: dict[str, Any] = {}
        for p in self.int_params:
            if p in params:
                kwargs[p] = int(params[p])
        for p in self.float_params:
            if p in params:
                kwargs[p] = float(params[p])
        for p in self.str_params:
            if p in params:
                kwargs[p] = params[p]
        return self.estimator_cls(**kwargs)

    @staticmethod
    def _list_versions(path: str) -> list[int]:
        try:
            return sorted(int(d[len("_model_"):]) for d in os.listdir(path)
                          if d.startswith("_model_")
                          and d[len("_model_"):].isdigit())
        except OSError:
            return []

    def _resolve_path(self, path: str, params: dict, for_write: bool) -> str:
        keep = str(params.get("keepVersion", "false")).lower() == "true"
        versions = self._list_versions(path) if path else []
        if for_write:
            if not keep:
                return path
            return os.path.join(path, f"_model_{(versions[-1] + 1) if versions else 0}")
        # read: latest version if any exist (keepVersion-written models),
        # else the plain path
        if versions:
            return os.path.join(path, f"_model_{versions[-1]}")
        return path

    def train(self, df, path, params, context=None):
        est = self._estimator(params)
        model = est.fit(df)
        real = self._resolve_path(path, params, for_write=True)
        if path:
            model.write().overwrite().save(os.path.join(real, "model"))
        spark = df.sparkSession
        return spark.createDataFrame(
            [(type(model).__name__, real, str(est.extractParamMap()))],
            "modelType: string, path: string, params: string")

    def load(self, spark, path, params, context=None):
        real = self._resolve_path(path, params or {}, for_write=False)
        return self.model_cls.load(os.path.join(real, "model"))

    def batch_predict(self, df, path, params):
        real = self._resolve_path(path, params or {}, for_write=False)
        model = self.model_cls.load(os.path.join(real, "model"))
        return model.transform(df)

    def predict(self, spark, model, name, params):
        """Register a vector→prediction UDF (reference
        SQLRandomForest.scala:113+).  JavaModels are neither picklable
        nor executor-usable, so serving extracts the parameters into a
        pure-numpy closure (operators/serving.py)."""
        from streamingpro_spark.operators.serving import extract_predictor
        fn = extract_predictor(model, params.get("__path__"))
        return spark.udf.register(name, fn, "double")


def _make(name: str, est_path: str, model_path: str, ints=(), floats=(), strs=()):
    import importlib
    e_mod, e_cls = est_path.rsplit(".", 1)
    m_mod, m_cls = model_path.rsplit(".", 1)

    @register_et(name)
    class _Alg(_MLWrapper):
        estimator_cls = getattr(importlib.import_module(e_mod), e_cls)
        model_cls = getattr(importlib.import_module(m_mod), m_cls)
        int_params = ints
        float_params = floats
        str_params = strs

    _Alg.__name__ = name
    _Alg.__doc__ = f"pyspark.ml wrapper: {e_cls} (reference SQL{name}.scala)"
    return _Alg


_make("RandomForest",
      "pyspark.ml.classification.RandomForestClassifier",
      "pyspark.ml.classification.RandomForestClassificationModel",
      ints=("numTrees", "maxDepth", "seed"), strs=("labelCol", "featuresCol"))
_make("LogisticRegression",
      "pyspark.ml.classification.LogisticRegression",
      "pyspark.ml.classification.LogisticRegressionModel",
      ints=("maxIter",), floats=("regParam", "elasticNetParam"),
      strs=("labelCol", "featuresCol"))
_make("NaiveBayes",
      "pyspark.ml.classification.NaiveBayes",
      "pyspark.ml.classification.NaiveBayesModel",
      floats=("smoothing",), strs=("labelCol", "featuresCol", "modelType"))
_make("GBTs",
      "pyspark.ml.classification.GBTClassifier",
      "pyspark.ml.classification.GBTClassificationModel",
      ints=("maxIter", "maxDepth", "seed"), strs=("labelCol", "featuresCol"))
_make("LSVM",
      "pyspark.ml.classification.LinearSVC",
      "pyspark.ml.classification.LinearSVCModel",
      ints=("maxIter",), floats=("regParam",), strs=("labelCol", "featuresCol"))
_make("LinearRegressionExt",
      "pyspark.ml.regression.LinearRegression",
      "pyspark.ml.regression.LinearRegressionModel",
      ints=("maxIter",), floats=("regParam", "elasticNetParam"),
      strs=("labelCol", "featuresCol"))
_make("GBTRegressor",
      "pyspark.ml.regression.GBTRegressor",
      "pyspark.ml.regression.GBTRegressionModel",
      ints=("maxIter", "maxDepth", "seed"), strs=("labelCol", "featuresCol"))
_make("KMeans",
      "pyspark.ml.clustering.KMeans",
      "pyspark.ml.clustering.KMeansModel",
      ints=("k", "maxIter", "seed"), strs=("featuresCol",))
_make("LDA",
      "pyspark.ml.clustering.LDA",
      "pyspark.ml.clustering.LDAModel",
      ints=("k", "maxIter", "seed"), strs=("featuresCol",))
_make("FPGrowth",
      "pyspark.ml.fpm.FPGrowth",
      "pyspark.ml.fpm.FPGrowthModel",
      floats=("minSupport", "minConfidence"), strs=("itemsCol",))
_make("ALSInPlace",
      "pyspark.ml.recommendation.ALS",
      "pyspark.ml.recommendation.ALSModel",
      ints=("rank", "maxIter", "seed"), floats=("regParam",),
      strs=("userCol", "itemCol", "ratingCol"))
_make("Word2Vec",
      "pyspark.ml.feature.Word2Vec",
      "pyspark.ml.feature.Word2VecModel",
      ints=("vectorSize", "minCount", "seed"), strs=("inputCol", "outputCol"))
_make("StandardScaler",
      "pyspark.ml.feature.StandardScaler",
      "pyspark.ml.feature.StandardScalerModel",
      strs=("inputCol", "outputCol"))


@register_et("PageRank")
class PageRank(ETAlgorithm):
    """PageRank over an edge table (reference: SQLPageRank.scala uses
    GraphX, which has no Python API) — re-expressed as iterative
    DataFrame joins: rank_{t+1} = (1-d) + d * Σ rank_t/outdeg over
    in-edges.  Shuffle per iteration on the join key (vertex id); the
    edge table is re-used (cache it).  maxIter bounds cost."""

    def train(self, df, path, params, context=None):
        from pyspark.sql import functions as F
        src = params.get("srcCol", "src")
        dst = params.get("dstCol", "dst")
        d = float(params.get("dampingFactor", "0.85"))
        iters = int(params.get("maxIter", "10"))
        edges = df.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
        verts = edges.select(F.col("src").alias("id")) \
                     .union(edges.select(F.col("dst").alias("id"))).distinct()
        outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
        ranks = verts.withColumn("rank", F.lit(1.0))
        for _ in range(iters):
            contrib = (edges.join(ranks, edges.src == ranks.id)
                       .join(outdeg, "src")
                       .select(F.col("dst").alias("id"),
                               (F.col("rank") / F.col("outdeg")).alias("c")))
            ranks = (verts.join(contrib.groupBy("id").agg(F.sum("c").alias("s")),
                                "id", "left")
                     .select("id", (F.lit(1 - d) + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank")))
        return ranks.select("id", F.round("rank", 6).alias("pagerank"))

    def explain_params(self):
        return [("srcCol", "edge source column", "src"),
                ("dstCol", "edge destination column", "dst"),
                ("dampingFactor", "PageRank damping", "0.85"),
                ("maxIter", "iterations", "10")]
