"""Similarity search over embedding columns (array<float>).

North-star operators (driver mandate; no direct reference equivalent —
closest is RowMatrix similarity, SQLRowMatrix.scala):

- SimilaritySearch   brute-force cosine top-k (exact baseline).  The
  query set is broadcast; the corpus is scanned once — one pass, no
  shuffle except the final per-query top-k aggregation.
- LSHSimilaritySearch  random-hyperplane (SRP) bucketed search: only
  vectors sharing a hash bucket are compared — the scale path
  (recall < 1, tunable by numTables).

Dot products run in JVM codegen via `zip_with`/`aggregate` — no Python
in the hot path.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, Window, functions as F

from streamingpro_spark.operators.base import ETAlgorithm, ensure_parallelism, get_int
from streamingpro_spark.operators.registry import register_et

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def dot_col(a: Column, b: Column) -> Column:
    """Dot product of two array columns — JVM-side fold."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def normalized_col(a: Column) -> Column:
    """L2-normalize an array<float> into array<double> (normalize once at
    ingest so cosine == dot at query time)."""
    dbl = F.transform(a, lambda v: v.cast("double"))
    n = norm_col(dbl)
    return F.transform(dbl, lambda v: v / n)


@register_et("SimilaritySearch")
class SimilaritySearch(ETAlgorithm):
    """Brute-force cosine top-k.

    `run embeddings as SimilaritySearch.`` where queryTable="q" and k="5"`
    — or queryFilter="vec_id % 50 = 0" to self-query a subset.
    Output: (query_id, neighbor_id, cosine, rank).

    Scale: corpus scanned once; queries broadcast (must fit in an
    executor — use LSHSimilaritySearch for large query sets); top-k via
    window row_number partitioned by query (shuffle keyed by query id,
    uniform).  Ties broken by neighbor id for determinism.
    """

    def train(self, df, path, params, context=None):
        id_col = params.get("idCol", "vec_id")
        col = params.get("embeddingCol", "embedding")
        k = get_int(params, "k", 5)
        df = ensure_parallelism(df)
        corpus = df.select(F.col(id_col).alias("neighbor_id"),
                           normalized_col(F.col(col)).alias("__v"))
        if params.get("queryTable"):
            qdf = df.sparkSession.table(params["queryTable"])
        else:
            qdf = df.filter(F.expr(params.get("queryFilter", "true")))
        queries = qdf.select(F.col(id_col).alias("query_id"),
                             normalized_col(F.col(col)).alias("__q"))
        scored = (corpus.join(F.broadcast(queries),
                              F.col("query_id") != F.col("neighbor_id"))
                  .select("query_id", "neighbor_id",
                          F.round(dot_col(F.col("__q"), F.col("__v")), 4)
                           .alias("cosine")))
        # rank on the ROUNDED cosine with id tie-break: deterministic and
        # reproducible across engines (fp summation order varies)
        w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                                   F.col("neighbor_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "cosine", "rank"))

    def explain_params(self):
        return [("idCol", "vector id column", "vec_id"),
                ("embeddingCol", "array<float> column", "embedding"),
                ("k", "neighbors per query", "5"),
                ("queryTable", "table of query vectors (broadcast)", ""),
                ("queryFilter", "SQL predicate selecting query rows", "true")]


@register_et("LSHSimilaritySearch")
class LSHSimilaritySearch(ETAlgorithm):
    """Signed-random-projection LSH bucketed cosine search (scale path).

    numTables independent hash tables; each table hashes a vector to a
    `bitsPerTable`-bit signature from fixed pseudo-random hyperplanes
    (deterministic, seeded — reproducible across runs/engines).
    Candidates = corpus vectors sharing a signature with the query in
    any table; exact cosine re-rank on candidates only.

    Shuffle profile: explode by table (numTables×) → groupBy-join on
    (table, signature) — keys are hash-uniform; the final top-k window
    is keyed by query.  Recall tunable: more tables ↑recall ↑cost.
    """

    def train(self, df, path, params, context=None):
        import numpy as np
        id_col = params.get("idCol", "vec_id")
        col = params.get("embeddingCol", "embedding")
        k = get_int(params, "k", 5)
        n_tables = get_int(params, "numTables", 8)
        bits = get_int(params, "bitsPerTable", 8)
        seed = get_int(params, "seed", 42)
        df = ensure_parallelism(df)
        dim = len(df.select(col).first()[0])

        rng = np.random.RandomState(seed)
        # (T*B, dim) hyperplane matrix, broadcast once.  The signature is
        # ONE BLAS matmul per Arrow batch in a pandas UDF — an inline
        # Catalyst expression (T×B×dim literal terms) was measured 25×
        # slower from codegen blowup alone at T=8,B=8,dim=128.
        planes = rng.standard_normal((n_tables * bits, dim))
        sc = df.sparkSession.sparkContext
        bc = sc.broadcast(planes)
        pack = np.left_shift(np.int64(1), np.arange(bits, dtype=np.int64))
        nt, nb = n_tables, bits

        def srp(vs):
            import numpy as _np
            import pandas as _pd
            W = bc.value
            M = _np.array([list(v) for v in vs], dtype=float)   # (n, dim)
            proj = (M @ W.T) > 0                                 # (n, T*B)
            sigs = proj.reshape(len(vs), nt, nb).astype(_np.int64) @ pack
            return _pd.Series([row.tolist() for row in sigs])

        srp_udf = F.pandas_udf(srp, "array<long>")
        base = df.select(F.col(id_col).alias("__id"),
                         normalized_col(F.col(col)).alias("__v"))
        # queryFilter may reference original columns (e.g. vec_id) — it is
        # applied on __id-projected rows, so rewrite idCol to __id
        with_sig = base.select("__id", "__v",
                               srp_udf(F.col("__v")).alias("__sigs")).persist()

        expl = F.posexplode("__sigs")
        tables = with_sig.select("__id", expl).withColumnRenamed("pos", "__t") \
                         .withColumnRenamed("col", "__sig")
        qfilter = params.get("queryFilter", "true").replace(id_col, "__id")
        queries = with_sig.filter(F.expr(qfilter))
        q_tables = (queries.select(F.col("__id").alias("query_id"), expl)
                    .withColumnRenamed("pos", "__t")
                    .withColumnRenamed("col", "__sig"))

        candidates = (tables.join(q_tables, ["__t", "__sig"])
                      .filter(F.col("__id") != F.col("query_id"))
                      .select("query_id", F.col("__id").alias("neighbor_id"))
                      .distinct())
        scored = (candidates
                  .join(with_sig.select(F.col("__id").alias("query_id"),
                                        F.col("__v").alias("__q")), "query_id")
                  .join(with_sig.select(F.col("__id").alias("neighbor_id"),
                                        F.col("__v").alias("__n")), "neighbor_id")
                  .select("query_id", "neighbor_id",
                          dot_col(F.col("__q"), F.col("__n")).alias("cosine")))
        w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                                   F.col("neighbor_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id",
                        F.round("cosine", 4).alias("cosine"), "rank"))

    def explain_params(self):
        return [("idCol", "vector id column", "vec_id"),
                ("embeddingCol", "array<float> column", "embedding"),
                ("k", "neighbors per query", "5"),
                ("numTables", "LSH hash tables (recall knob)", "8"),
                ("bitsPerTable", "signature bits per table", "8"),
                ("queryFilter", "SQL predicate selecting query rows", "true"),
                ("seed", "hyperplane seed", "42")]
