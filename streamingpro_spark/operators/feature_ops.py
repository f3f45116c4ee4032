"""Feature-engineering ETs over pyspark.ml (SURVEY.md §2.4 block 2).

Each *InPlace ET transforms the input AND persists re-apply metadata to
`path` (the reference convention: train saves meta, register turns the
saved meta into a serving UDF — e.g. SQLTfIdfInPlace.scala +
feature/StringFeature.scala:92-220).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from streamingpro_spark.operators.base import ETAlgorithm, get_int
from streamingpro_spark.operators.registry import register_et


def _save_meta(path: str, meta: dict) -> None:
    if not path:
        return
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f)


def _load_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json"), encoding="utf-8") as f:
        return json.load(f)


@register_et("TfIdfInPlace")
class TfIdfInPlace(ETAlgorithm):
    """tokenize → stopwords → TF-IDF vector, replacing the input column
    (reference: SQLTfIdfInPlace.scala + StringFeature.scala:92-220)."""

    model_type = "algorithm"

    def train(self, df, path, params, context=None):
        from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer, StopWordsRemover
        col = params.get("inputCol", "content")
        features = get_int(params, "nFeatures", 8192)
        tok = RegexTokenizer(inputCol=col, outputCol="__words", pattern=r"\s+")
        sw = StopWordsRemover(inputCol="__words", outputCol="__filtered")
        tf = HashingTF(inputCol="__filtered", outputCol="__tf", numFeatures=features)
        words = sw.transform(tok.transform(df))
        tfd = tf.transform(words)
        idf = IDF(inputCol="__tf", outputCol="__tfidf").fit(tfd)
        if path:
            idf.write().overwrite().save(os.path.join(path, "idf"))
            _save_meta(path, {"inputCol": col, "nFeatures": features})
        return (idf.transform(tfd)
                .drop(col, "__words", "__filtered", "__tf")
                .withColumnRenamed("__tfidf", col))

    def load(self, spark, path, params, context=None):
        from pyspark.ml.feature import IDFModel
        return {"idf": IDFModel.load(os.path.join(path, "idf")),
                "meta": _load_meta(path)}

    def predict(self, spark, model, name, params):
        """Serving UDF: text → tf-idf vector, reproducing the train
        chain (lowercase \\s+ tokenize → english stopwords → murmur3
        HashingTF counts → ×idf) in pure python — same closure-by-value
        convention as the HashTfIdf alg (ml_algs.py), whose murmur3 is
        pinned against JVM indices by test."""
        from pyspark.ml.feature import StopWordsRemover
        from pyspark.ml.linalg import VectorUDT
        idf = [float(v) for v in model["idf"].idf]
        n = int(model["meta"]["nFeatures"])
        stop = set(StopWordsRemover.loadDefaultStopWords("english"))

        def tfidf_text(text):
            import re as _re

            from pyspark.ml.linalg import Vectors

            def murmur3(data: bytes, seed: int = 42) -> int:
                # nested by-value copy of the murmur3_x86_32 the JVM
                # HashingTF uses (pinned against JVM indices by the
                # HashTfIdf test in test_ml)
                c1, c2 = 0xCC9E2D51, 0x1B873593
                h = seed
                m = 0xFFFFFFFF
                nblocks = len(data) // 4
                for b in range(nblocks):
                    k = int.from_bytes(data[b * 4:b * 4 + 4], "little")
                    k = (k * c1) & m
                    k = ((k << 15) | (k >> 17)) & m
                    k = (k * c2) & m
                    h ^= k
                    h = ((h << 13) | (h >> 19)) & m
                    h = (h * 5 + 0xE6546B64) & m
                k = 0
                for shift, byte in enumerate(data[nblocks * 4:]):
                    k ^= byte << (8 * shift)
                if k:
                    k = (k * c1) & m
                    k = ((k << 15) | (k >> 17)) & m
                    k = (k * c2) & m
                    h ^= k
                h ^= len(data)
                h ^= h >> 16
                h = (h * 0x85EBCA6B) & m
                h ^= h >> 13
                h = (h * 0xC2B2AE35) & m
                h ^= h >> 16
                if h >= 1 << 31:
                    h -= 1 << 32
                return ((h % n) + n) % n

            words = [w for w in _re.split(r"\s+", (text or "").lower())
                     if w and w not in stop]
            counts = {}
            for w in words:
                i = murmur3(w.encode("utf-8"))
                counts[i] = counts.get(i, 0.0) + 1.0
            idx = sorted(counts)
            return Vectors.sparse(n, idx, [counts[i] * idf[i] for i in idx])

        return spark.udf.register(name, tfidf_text, VectorUDT())

    def explain_params(self):
        return [("inputCol", "text column to replace with tf-idf vector", "content"),
                ("nFeatures", "hashing dimension", "8192")]


@register_et("Word2VecInPlace")
class Word2VecInPlace(ETAlgorithm):
    """tokenize → word2vec doc vector (reference: SQLWord2VecInPlace.scala)."""

    model_type = "algorithm"

    def train(self, df, path, params, context=None):
        from pyspark.ml.feature import RegexTokenizer, Word2Vec
        col = params.get("inputCol", "content")
        dim = get_int(params, "vectorSize", 64)
        tok = RegexTokenizer(inputCol=col, outputCol="__words", pattern=r"\s+")
        words = tok.transform(df)
        w2v = Word2Vec(inputCol="__words", outputCol="__vec", vectorSize=dim,
                       minCount=get_int(params, "minCount", 1), seed=42).fit(words)
        if path:
            w2v.write().overwrite().save(os.path.join(path, "w2v"))
            _save_meta(path, {"inputCol": col, "vectorSize": dim})
        return (w2v.transform(words).drop(col, "__words")
                .withColumnRenamed("__vec", col))

    def load(self, spark, path, params, context=None):
        from pyspark.ml.feature import Word2VecModel
        return {"w2v": Word2VecModel.load(os.path.join(path, "w2v")),
                "meta": _load_meta(path)}

    def predict(self, spark, model, name, params):
        """Serving UDF: text → mean word vector (the ml.Word2Vec doc
        embedding).  The vocabulary (bounded by minCount) is collected
        once at register time and shipped in the closure."""
        from pyspark.ml.linalg import VectorUDT
        dim = int(model["meta"]["vectorSize"])
        vocab = {r["word"]: [float(x) for x in r["vector"]]
                 for r in model["w2v"].getVectors().collect()}

        def doc_vec(text):
            import re as _re

            from pyspark.ml.linalg import Vectors
            vs = [vocab[w] for w in _re.split(r"\s+", (text or "").lower())
                  if w in vocab]
            if not vs:
                return Vectors.dense([0.0] * dim)
            return Vectors.dense([sum(col) / len(vs) for col in zip(*vs)])

        return spark.udf.register(name, doc_vec, VectorUDT())

    def explain_params(self):
        return [("inputCol", "text column", "content"),
                ("vectorSize", "embedding dim", "64"),
                ("minCount", "min token frequency", "1")]


@register_et("ScalerInPlace")
class ScalerInPlace(ETAlgorithm):
    """min-max / standard / log2 scaling of numeric columns in place
    (reference: SQLScalerInPlace.scala).  Implemented as SQL expressions
    (single pass to collect stats via agg, then codegen transform — no
    ml.feature vector detour)."""

    def train(self, df, path, params, context=None):
        cols = [c.strip() for c in params.get("inputCols", "").split(",") if c.strip()]
        method = params.get("scaleMethod", "min-max")
        stats: dict[str, dict[str, float]] = {}
        if method in ("min-max", "standard"):
            aggs = []
            for c in cols:
                aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max"),
                         F.avg(c).alias(f"{c}__avg"), F.stddev_pop(c).alias(f"{c}__std")]
            row = df.agg(*aggs).collect()[0].asDict()
            # an all-null column (or empty table) returns None stats —
            # neutral defaults keep the transform a no-op-on-null
            # instead of a driver TypeError
            neutral = {"min": 0.0, "max": 0.0, "avg": 0.0, "std": 1.0}
            for c in cols:
                stats[c] = {k: (row[f"{c}__{k}"] if row[f"{c}__{k}"] is not None
                                else neutral[k])
                            for k in ("min", "max", "avg", "std")}
        out = df
        for c in cols:
            if method == "min-max":
                lo, hi = stats[c]["min"], stats[c]["max"]
                rng = (hi - lo) or 1.0
                out = out.withColumn(c, (F.col(c) - F.lit(lo)) / F.lit(rng))
            elif method == "standard":
                mu, sd = stats[c]["avg"], stats[c]["std"] or 1.0
                out = out.withColumn(c, (F.col(c) - F.lit(mu)) / F.lit(sd))
            elif method == "log2":
                out = out.withColumn(c, F.log2(F.col(c)))
            else:
                raise ValueError(f"unknown scaleMethod {method!r}")
        _save_meta(path, {"method": method, "stats": stats, "cols": cols})
        return out

    def explain_params(self):
        return [("inputCols", "comma-separated numeric columns", ""),
                ("scaleMethod", "min-max|standard|log2", "min-max")]


@register_et("NormalizeInPlace")
class NormalizeInPlace(ETAlgorithm):
    """p-norm normalize numeric columns as a row vector
    (reference: SQLNormalizeInPlace.scala)."""

    def train(self, df, path, params, context=None):
        cols = [c.strip() for c in params.get("inputCols", "").split(",") if c.strip()]
        p = float(params.get("p", "2"))
        norm = None
        for c in cols:
            term = F.pow(F.abs(F.col(c)), p)
            norm = term if norm is None else norm + term
        norm = F.pow(norm, 1.0 / p)
        # materialize the norm FIRST: sequential withColumn would rebind
        # the norm expression to already-normalized columns
        out = df.withColumn("__norm", norm)
        for c in cols:
            out = out.withColumn(c, F.col(c) / F.col("__norm"))
        return out.drop("__norm")

    def explain_params(self):
        return [("inputCols", "columns forming the vector", ""),
                ("p", "norm order", "2")]


@register_et("Discretizer")
class Discretizer(ETAlgorithm):
    """bucketizer / quantile discretizer (reference: SQLDiscretizer.scala:32-110)."""

    def train(self, df, path, params, context=None):
        method = params.get("method", "bucketizer")
        col = params.get("inputCol")
        out_col = params.get("outputCol", f"{col}_bucket")
        if method == "bucketizer":
            from pyspark.ml.feature import Bucketizer
            splits = [float("-inf")] + [float(x) for x in
                                        params.get("splits", "").split(",") if x.strip()] + [float("inf")]
            return Bucketizer(splits=splits, inputCol=col, outputCol=out_col).transform(df)
        from pyspark.ml.feature import QuantileDiscretizer
        qd = QuantileDiscretizer(numBuckets=get_int(params, "numBuckets", 4),
                                 inputCol=col, outputCol=out_col)
        return qd.fit(df).transform(df)

    def explain_params(self):
        return [("method", "bucketizer|quantile", "bucketizer"),
                ("inputCol", "numeric column", ""),
                ("splits", "comma-separated split points (bucketizer)", ""),
                ("numBuckets", "bucket count (quantile)", "4")]


@register_et("StringIndex")
class StringIndex(ETAlgorithm):
    """label ↔ index dictionary (reference: SQLStringIndex.scala)."""

    model_type = "algorithm"

    def train(self, df, path, params, context=None):
        from pyspark.ml.feature import StringIndexer
        col = params.get("inputCol")
        out_col = params.get("outputCol", f"{col}_idx")
        model = StringIndexer(inputCol=col, outputCol=out_col,
                              stringOrderType="frequencyDesc").fit(df)
        if path:
            model.write().overwrite().save(os.path.join(path, "indexer"))
        return model.transform(df)

    def load(self, spark, path, params, context=None):
        from pyspark.ml.feature import StringIndexerModel
        return StringIndexerModel.load(os.path.join(path, "indexer"))

    def predict(self, spark, model, name, params):
        labels = list(model.labels)
        mapping = {lab: float(i) for i, lab in enumerate(labels)}
        fn = spark.udf.register(name, lambda s: mapping.get(s, -1.0), "double")
        return fn

    def explain_params(self):
        return [("inputCol", "string column", ""),
                ("outputCol", "index output column", "<inputCol>_idx")]


@register_et("ConfusionMatrix")
class ConfusionMatrix(ETAlgorithm):
    """label vs prediction matrix (reference: SQLConfusionMatrix.scala) —
    groupBy().pivot().count()."""

    def train(self, df, path, params, context=None):
        actual = params.get("actualCol", "label")
        pred = params.get("predictCol", "prediction")
        return (df.groupBy(actual).pivot(pred).count().na.fill(0)
                .orderBy(actual))

    def explain_params(self):
        return [("actualCol", "ground-truth column", "label"),
                ("predictCol", "prediction column", "prediction")]


@register_et("FeatureExtractInPlace")
class FeatureExtractInPlace(ETAlgorithm):
    """Regex surface features from raw text — phone/email/url counts etc.
    (reference: SQLFeatureExtractInPlace.scala ~250 LoC)."""

    def train(self, df, path, params, context=None):
        col = params.get("inputCol", "doc")
        # null text behaves as empty: regexp/length over NULL would
        # propagate NULL into every feature, silently dropping null-text
        # rows from numeric predicates downstream
        text = F.coalesce(F.col(col), F.lit(""))
        patterns = {
            "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
            "url": r"https?://[^\s]+",
            "phone": r"1[3-9]\d{9}|\d{3}-\d{3,4}-\d{4}",
            "qqwechat": r"[Qq]{2}[:：]?\s?\d{5,11}",
        }
        out = df
        for name, pat in patterns.items():
            # idx=0 — whole-match counting (these patterns have no groups)
            out = out.withColumn(
                name, F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))))
        out = (out.withColumn("length", F.length(text))
               .withColumn("numberRatio",
                           F.length(F.regexp_replace(text, r"[^0-9]", ""))
                           / F.greatest(F.length(text), F.lit(1))))
        return out

    def explain_params(self):
        return [("inputCol", "text column", "doc")]
