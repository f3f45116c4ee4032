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
        planes = rng.standard_normal((n_tables, bits, dim))

        def sig_cols(vcol: Column) -> list[Column]:
            out = []
            for t in range(n_tables):
                sig = F.lit(0).cast("long")
                for b in range(bits):
                    w = planes[t, b]
                    proj = None
                    for i, wi in enumerate(w):
                        term = vcol[i] * float(wi)
                        proj = term if proj is None else proj + term
                    sig = sig + F.when(proj > 0, F.lit(2 ** b)).otherwise(F.lit(0))
                out.append(sig.alias(f"sig{t}"))
            return out

        base = df.select(F.col(id_col).alias("__id"),
                         normalized_col(F.col(col)).alias("__v"))
        with_sig = base.select("__id", "__v", *sig_cols(F.col("__v"))).persist()

        tables = None
        for t in range(n_tables):
            one = with_sig.select("__id", F.lit(t).alias("__t"),
                                  F.col(f"sig{t}").alias("__sig"))
            tables = one if tables is None else tables.unionAll(one)

        queries = with_sig.filter(F.expr(params.get("queryFilter", "true")))
        q_tables = None
        for t in range(n_tables):
            one = queries.select(F.col("__id").alias("query_id"),
                                 F.lit(t).alias("__t"),
                                 F.col(f"sig{t}").alias("__sig"))
            q_tables = one if q_tables is None else q_tables.unionAll(one)

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
