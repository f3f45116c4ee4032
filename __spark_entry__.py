"""Driver contract for the spark-graft builder (PySpark target).

Every query runs END-TO-END through the streamingpro_spark engine (an
MLSQL-style script → Spark SQL / ET operators), proving the language
surface, and is paired with an ANSI-SQL oracle DuckDB runs on the same
parquet.  Cross-engine determinism measures: identical column aliases
on both sides; float aggregates rounded via decimal casts / integer
floor where boundaries bite (round(double) itself differs
cross-engine); a total row order on both sides (`_ordered` wrap ↔
`ORDER BY ALL NULLS LAST`) so even an order-sensitive value hash
matches; session timezone pinned UTC.  bench.py measures
`base_queries()` (no compare-order sort — its range-sampling would
re-execute each DAG).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _engine(spark: SparkSession):
    # fixture timestamps are naive (isAdjustedToUTC=false) — Spark reads
    # them as LTZ and parses `timestamp '...'` literals in the SESSION
    # timezone, so a non-UTC driver session would shift date-boundary
    # comparisons vs the (timezone-naive) DuckDB oracle.  Pin UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from streamingpro_spark import Engine
    return Engine(spark)


def _loads(sf_dir: str, *tables: str) -> str:
    return "\n".join(
        f"load parquet.`{sf_dir}/{t}.parquet` as {t};" for t in tables)


def _run(spark: SparkSession, sf_dir: str, tables: list[str], script: str) -> DataFrame:
    eng = _engine(spark)
    return eng.execute(_loads(sf_dir, *tables) + "\n" + script)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary through the script engine."""
    return queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# relational core (engine `select` → Spark SQL; oracle: same ANSI SQL)
# ---------------------------------------------------------------------------

_Q1 = """
select l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) as sum_qty,
       round(sum(l_extendedprice), 2) as sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) as sum_charge,
       round(avg(l_quantity), 4) as avg_qty,
       round(avg(l_extendedprice), 4) as avg_price,
       round(avg(l_discount), 4) as avg_disc,
       count(*) as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-02 00:00:00'
group by l_returnflag, l_linestatus
"""

_Q3 = """
select o.o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as revenue,
       o.o_orderdate, o.o_orderpriority
from customer c
join orders o on c.c_custkey = o.o_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
where c.c_mktsegment = 'BUILDING'
group by o.o_orderkey, o.o_orderdate, o.o_orderpriority
order by revenue desc, o_orderkey
limit 10
"""

_Q5 = """
select n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as revenue,
       count(*) as n_items
from region r
join nation n on n.n_regionkey = r.r_regionkey
join customer c on c.c_nationkey = n.n_nationkey
join orders o on o.o_custkey = c.c_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
group by n.n_name
"""

_TOPCUST = """
select c_nationkey, c_custkey, c_name, round(c_acctbal, 2) as acctbal
from (
  select c_nationkey, c_custkey, c_name, c_acctbal,
         row_number() over (partition by c_nationkey
                            order by c_acctbal desc, c_custkey) as rn
  from customer
) t where rn <= 3
"""

_RUNNING = """
select o_custkey, o_orderkey,
       round(sum(o_totalprice) over (partition by o_custkey
             order by o_orderdate, o_orderkey
             rows between unbounded preceding and current row), 2) as running_total
from orders
"""

_SETOPS = """
select c_custkey from customer where c_mktsegment = 'BUILDING'
intersect
select c_custkey from customer where c_acctbal > 0
union
select c_custkey from customer where c_mktsegment = 'MACHINERY'
except
select c_custkey from customer where c_acctbal < -500
"""

_ROLLUP = """
select coalesce(o_orderstatus, 'ALL') as status,
       coalesce(o_orderpriority, 'ALL') as priority,
       count(*) as n_orders,
       round(sum(o_totalprice), 2) as total
from orders
group by rollup(o_orderstatus, o_orderpriority)
"""

# decimal-exact sums; rounding via decimal cast (sum) and integer floor
# (avg) — round() on a double diverges cross-engine at representation
# boundaries (Spark rounds the shortest decimal repr, DuckDB the binary)
_TUMBLING = """
select date_trunc('hour', ts) as hour_start, event_type,
       count(*) as n_events,
       cast(cast(sum(cast(value as decimal(18, 6))) as decimal(18, 2))
            as double) as sum_value,
       floor(cast(sum(cast(value as decimal(18, 6))) as double)
             / count(*) * 10000 + 0.5) / 10000 as avg_value
from events
group by date_trunc('hour', ts), event_type
"""

# gaps-and-islands sessionization (30-min inactivity gap).  Both engines
# first truncate event time to integer seconds (tss) so gap comparisons
# and durations are bit-identical; ordering is (tss, event_id).
_SESSIONIZE_BODY = """
select user_id, session_id, count(*) as n_events,
       round(sum(value), 2) as session_value,
       max(tss) - min(tss) as duration_s
from (
  select user_id, tss, value,
         CAST(sum(new_sess) over (partition by user_id order by tss, event_id
                             rows between unbounded preceding and current row)
              AS BIGINT) as session_id
  from (
    select user_id, tss, value, event_id,
           case when lag(tss) over (partition by user_id order by tss, event_id) is null
                  or tss - lag(tss) over (partition by user_id order by tss, event_id) > 1800
                then 1 else 0 end as new_sess
    from ({seconds}) base
  ) marked
) sessioned
group by user_id, session_id
"""

_SESSIONIZE_SPARK = _SESSIONIZE_BODY.format(
    seconds="select user_id, value, event_id, unix_timestamp(ts) as tss from events")
_SESSIONIZE_DUCK = _SESSIONIZE_BODY.format(
    seconds="select user_id, value, event_id, "
            "CAST(floor(epoch(ts)) AS BIGINT) as tss from events")

# Native session_window (Spark 3.2+) vs gaps-and-islands oracle.  Both
# operate on second-truncated time; the oracle's `>= 1800` matches
# session_window's half-open [event, event+gap) merge semantics.
_SESSION_WINDOW_SPARK = """
select user_id,
       CAST(unix_timestamp(session_window.start) AS BIGINT) as sess_start,
       count(*) as n_events
from (select user_id, timestamp_seconds(unix_timestamp(ts)) as ts from events)
group by session_window(ts, '30 minutes'), user_id
"""

_SESSION_WINDOW_DUCK = """
with base as (
  select user_id, CAST(floor(epoch(ts)) AS BIGINT) as tss from events
),
marked as (
  -- STRICT > : Spark's session_window merges an event landing exactly
  -- at prev_end (gap == 1800s merges — observed on the sf0.1 fixture,
  -- user 511; a >= split diverged by one session)
  select user_id, tss,
         case when lag(tss) over w is null or tss - lag(tss) over w > 1800
              then 1 else 0 end as ns
  from base window w as (partition by user_id order by tss)
),
sess as (
  select user_id, tss,
         sum(ns) over (partition by user_id order by tss
                       rows unbounded preceding) as sid
  from marked
)
select user_id, CAST(min(tss) AS BIGINT) as sess_start,
       count(*) as n_events
from sess group by user_id, sid
"""

_JSON_SPARK = """
select event_type,
       count(*) as n,
       round(avg(cast(get_json_object(props, '$.k') as int)), 4) as avg_k
from events
group by event_type
"""

_JSON_DUCK = """
select event_type,
       count(*) as n,
       round(avg(cast(json_extract_string(props, '$.k') as int)), 4) as avg_k
from events
group by event_type
"""

_ASOF_ORACLE = """
select e.event_id, e.user_id,
       round(max_by(c.value, c.ts), 2) as asof_value
from (select * from events where event_type = 'error') e
join (select * from events where event_type = 'click') c
  on c.user_id = e.user_id and c.ts <= e.ts
group by e.event_id, e.user_id
"""


def _q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'events')}
    select * from events where event_type = 'error' as errors;
    select * from events where event_type = 'click' as clicks;
    run errors as AsOfJoin.`` where rightTable="clicks" and keyCol="user_id"
        and tsCol="ts" and valueCols="value" as joined;
    select event_id, user_id, round(asof_value, 2) as asof_value
    from joined where asof_value is not null as output;
    """)


# ---------------------------------------------------------------------------
# pivot through the ET
# ---------------------------------------------------------------------------

def _q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'orders')}
    run orders as Pivot.`` where groupCols="o_orderpriority" and
        pivotCol="o_orderstatus" and pivotValues="F,O,P" and
        aggExpr="round(sum(o_totalprice), 2)" as output;
    """)


_PIVOT_ORACLE = """
select o_orderpriority,
       round(sum(case when o_orderstatus = 'F' then o_totalprice end), 2) as F,
       round(sum(case when o_orderstatus = 'O' then o_totalprice end), 2) as O,
       round(sum(case when o_orderstatus = 'P' then o_totalprice end), 2) as P
from orders group by o_orderpriority
"""


# ---------------------------------------------------------------------------
# LLM-pipeline operators: dedup / text / similarity (ET ↔ SQL oracle)
# The oracles reproduce the exact same portable md5-based hashing —
# see streamingpro_spark/operators/dedup.py docstring.
# ---------------------------------------------------------------------------

_PHASH_DUCK = "CAST(CONCAT('0x', substr(md5({payload}), 1, 15)) AS BIGINT)"


def _q_exact_dedup(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select md5(text) as digest, min(doc_id) as keeper, count(*) as n_copies
    from documents group by md5(text) as output;
    """)


_EXACT_DEDUP_ORACLE = """
select md5(text) as digest, min(doc_id) as keeper, count(*) as n_copies
from documents group by md5(text)
"""


def _q_minhash(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as MinHashDedup.`` where threshold="0.8" and numHashes="12"
        and numBands="4" and shingleSize="3" as output;
    """)


def _mh_oracle_consts() -> str:
    """SQL literals for the minhash universal-hash family — must match
    streamingpro_spark.operators.dedup.mh_constants(12)."""
    from streamingpro_spark.operators.dedup import mh_constants
    a, b = mh_constants(12)
    return (f"SELECT {a} AS A, {b} AS B")


def _mh_pair_ctes() -> str:
    """The shared DuckDB CTE chain reproducing MinHashDedup's verified
    pairs (signatures → bands → bucket pairs → exact-Jaccard verify) —
    used by both the pair-level oracle and the NearDedup composition
    oracle."""
    return f"""consts AS ({_mh_oracle_consts()}),
t AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(list_slice(toks, i, i+2), ' ')
                        for i in generate_series(1, greatest(len(toks)-2, 1))]) AS shingles
  FROM t
),
bases AS (
  SELECT doc_id, shingles,
         [CAST(CONCAT('0x', substr(md5(CONCAT('mh:', sng)), 1, 8)) AS BIGINT)
          % 1073741824 for sng in shingles] AS ms
  FROM sh
),
sig AS (
  SELECT doc_id, shingles,
         [list_min([(m * A[s+1] + B[s+1]) % 2305843009213693951 for m in ms])
          for s in generate_series(0, 11)] AS mh
  FROM bases, consts
),
bands AS (
  SELECT doc_id, b.band,
         CAST(CONCAT('0x', substr(md5(CONCAT('band', CAST(b.band AS VARCHAR), ':',
              array_to_string(list_transform(list_slice(mh, b.band*3+1, b.band*3+3),
                                             x -> CAST(x AS VARCHAR)), '_'))), 1, 15)) AS BIGINT) AS bh
  FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM bands a JOIN bands b2 ON a.band = b2.band AND a.bh = b2.bh
                            AND a.doc_id < b2.doc_id
),
j AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.shingles, sb.shingles)) AS inter,
         len(sa.shingles) AS na, len(sb.shingles) AS nb
  FROM pairs JOIN sh sa ON doc_a = sa.doc_id JOIN sh sb ON doc_b = sb.doc_id
)"""


_MINHASH_ORACLE = f"""
WITH {_mh_pair_ctes()}
SELECT doc_a, doc_b, round(inter * 1.0 / (na + nb - inter), 4) AS jaccard
FROM j WHERE inter * 1.0 / (na + nb - inter) >= 0.8
"""

_NEAR_DEDUP_ORACLE = f"""
WITH RECURSIVE {_mh_pair_ctes()},
vp AS (
  SELECT doc_a, doc_b FROM j
  WHERE inter * 1.0 / (na + nb - inter) >= 0.8
),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM vp
  UNION ALL
  SELECT doc_b, doc_a FROM vp
),
conn(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT c.a, s.b FROM conn c JOIN sym s ON c.b = s.a
),
lbl AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(c.b), d.doc_id)) AS cl
  FROM documents d LEFT JOIN conn c ON c.a = d.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id FROM lbl WHERE doc_id = cl
"""


def _q_soft_dedup(spark, sf_dir):
    """SoftDedup (operators/dedup.py): the reweight-instead-of-remove
    near-dedup — every doc kept, sample_weight = 1/|near-dup cluster|.
    The oracle replays the same MinHash chain as near_dedup (shared
    pair CTEs + recursive components) and derives the weights."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as SoftDedup.`` where threshold="0.8" as weighted;
    select doc_id, dup_cluster_id, dup_cluster_size, sample_weight
    from weighted as output;
    """)


_SOFT_DEDUP_ORACLE = f"""
WITH RECURSIVE {_mh_pair_ctes()},
vp AS (
  SELECT doc_a, doc_b FROM j
  WHERE inter * 1.0 / (na + nb - inter) >= 0.8
),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM vp
  UNION ALL
  SELECT doc_b, doc_a FROM vp
),
conn(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT c.a, s.b FROM conn c JOIN sym s ON c.b = s.a
),
lbl AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(c.b), d.doc_id)) AS cl
  FROM documents d LEFT JOIN conn c ON c.a = d.doc_id
  GROUP BY d.doc_id
),
sz AS (SELECT cl, count(*) AS csz FROM lbl GROUP BY cl)
SELECT l.doc_id, l.cl AS dup_cluster_id,
       CAST(s.csz AS BIGINT) AS dup_cluster_size,
       round(1.0 / s.csz, 6) AS sample_weight
FROM lbl l JOIN sz s ON l.cl = s.cl
"""


def _q_weighted_sample(spark, sf_dir):
    """SoftDedup → WeightedSampleExt: the realized soft-dedup sample —
    each row kept iff pmod(md5-hash(id), 1e6) < sample_weight·1e6, so a
    near-dup cluster contributes ~1 doc in expectation.  The oracle
    replays the whole chain: MinHash pairs → components → 1/|cluster|
    weights → the same hash gate."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as SoftDedup.`` where threshold="0.8" as sd_weighted;
    run sd_weighted as WeightedSampleExt.`` as sampled;
    select doc_id, dup_cluster_id, sample_weight from sampled as output;
    """)


_WEIGHTED_SAMPLE_ORACLE = f"""
WITH RECURSIVE {_mh_pair_ctes()},
vp AS (
  SELECT doc_a, doc_b FROM j
  WHERE inter * 1.0 / (na + nb - inter) >= 0.8
),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM vp
  UNION ALL
  SELECT doc_b, doc_a FROM vp
),
conn(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT c.a, s.b FROM conn c JOIN sym s ON c.b = s.a
),
lbl AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(c.b), d.doc_id)) AS cl
  FROM documents d LEFT JOIN conn c ON c.a = d.doc_id
  GROUP BY d.doc_id
),
sz AS (SELECT cl, count(*) AS csz FROM lbl GROUP BY cl),
wts AS (
  SELECT l.doc_id, l.cl AS dup_cluster_id,
         round(1.0 / s.csz, 6) AS sample_weight
  FROM lbl l JOIN sz s ON l.cl = s.cl
)
SELECT doc_id, dup_cluster_id, sample_weight
FROM wts
WHERE {_PHASH_DUCK.format(payload="'wsample:' || CAST(doc_id AS VARCHAR)")}
      % 1000000
      < CAST(floor(sample_weight * 1000000) AS BIGINT)
"""


def _q_ngram_jaccard(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as NgramJaccardDedup.`` where threshold="0.8" and
        shingleSize="3" and maxDf="100" as output;
    """)


_NGRAM_JACCARD_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(list_slice(toks, i, i+2), ' ')
                        for i in generate_series(1, greatest(len(toks)-2, 1))]) AS shingles
  FROM t
),
sizes AS (SELECT doc_id, len(shingles) AS ns FROM sh),
posting0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
keep AS (SELECT s FROM posting0 GROUP BY s HAVING count(*) <= 100),
posting AS (SELECT doc_id, s FROM posting0 JOIN keep USING (s)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(i * 1.0 / (sa.ns + sb.ns - i), 4) AS jaccard
FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
WHERE i * 1.0 / (sa.ns + sb.ns - i) >= 0.8
"""


def _q_simhash(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as SimHashDedup.`` as output;
    """)


def _simhash_oracle() -> str:
    votes = ",\n         ".join(
        f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(60))
    assemble = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(60))
    return f"""
WITH t AS (
  SELECT doc_id, list_distinct(string_split_regex(lower(text), '\\s+')) AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
hh AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(md5(CONCAT('simhash:', tk)), 1, 15)) AS BIGINT) AS hv
  FROM tok
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hh GROUP BY doc_id
)
SELECT doc_id, {assemble} AS simhash FROM votes
"""


def _q_embedding_topk(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    run embeddings as SimilaritySearch.`` where k="5" and
        queryFilter="vec_id < 20" as output;
    """)


def _q_ivf_topk(spark, sf_dir):
    # nprobe == nlist probes every cell → exact (same oracle as brute
    # force); nprobe < nlist is the approximate 100TB scale path
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    run embeddings as IVFSimilaritySearch.`` where k="5" and nlist="8" and
        nprobe="8" and queryFilter="vec_id < 20" as output;
    """)


def _q_ivf_index_topk(spark, sf_dir):
    """IVFIndexBuild + partition-pruned search (operators/similarity.py):
    the corpus is written partitioned by IVF cell, then queried through
    the persisted index — at nprobe=nlist every cell is read, so the
    result is exact and shares the brute-force oracle; nprobe < nlist
    prunes the parquet scan itself (PartitionFilters, plan-gated in
    tests/test_operators.py)."""
    import tempfile
    eng = _engine(spark)
    idx = tempfile.mkdtemp(prefix="spk_ivfidx_") + "/idx"
    eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    run embeddings as IVFIndexBuild.`{idx}` where nlist="8" as built;
    """)
    return eng.execute(f"""
    select * from embeddings where vec_id < 20 as ivf_queries;
    run ivf_queries as IVFSimilaritySearch.`{idx}` where k="5"
        and nprobe="8" as output;
    """)


#: per-query EXACT top-5 neighbor csv, replayed entirely in DuckDB
#: (same cosine/tie-break algebra the hash-matched embedding_topk
#: oracle pins) — the cross-engine exact side both recall contracts
#: (ivf_pq_topk, lsh_similarity) anchor to (round-10): a correlated
#: bug in the engine's cosine math now fails the value hash instead of
#: passing both sides of a Spark-vs-Spark recall.
#:
#: Accepted boundary risk (documented round 11, advisor finding): the
#: engine rounds cosines with numpy (round-half-to-EVEN) and this
#: oracle with DuckDB round() (round-half-AWAY-from-zero).  The modes
#: disagree only when the float64 dot product lands within ~1 ulp of
#: an exact k.5e-4 boundary — and at that distance the two engines'
#: different summation orders (einsum vs list_dot_product) can already
#: flip the pre-round value by an ulp, so NO rounding scheme removes
#: the hazard; 4dp-then-id-tiebreak exists precisely to collapse ulp
#: noise everywhere EXCEPT that measure-zero band.  Exposure is one
#: adjacent-rank swap in one query's csv.  Empirically pinned: 129/129
#: hash-matched at sf0.001/0.01/0.1 on the synthetic corpus, and the
#: identical pattern has held in embedding_topk since round 4.  If it
#: ever flakes on new data, the remedy is to rank both sides on
#: floor(x*1e4 + 0.5) (bit-identical arithmetic in both engines)
#: rather than widen the epsilon.
_EXACT_TOP5_CSV = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id,
         list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y*y)))) AS u
  FROM v
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.u, c.u), 4) AS cosine
  FROM n q JOIN n c ON q.vec_id != c.vec_id
  WHERE q.vec_id < 20
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id,
       string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY rank)
         AS exact_top5
FROM ranked WHERE rank <= 5 GROUP BY query_id
"""


#: IVF-PQ build params shared by the benched search and the recall
#: contract — one source of truth for the index layout AND its cache
#: fingerprint, so the two can't drift
_IVFPQ_PARAMS = {"nlist": "8", "pqSubspaces": "16"}


def _ivfpq_build(eng, sf_dir: str, idx: str) -> None:
    p = _IVFPQ_PARAMS
    eng.execute(f"""
    load parquet.`{sf_dir}/embeddings.parquet` as pq_corpus;
    run pq_corpus as IVFIndexBuild.`{idx}` where nlist="{p['nlist']}"
        and pqSubspaces="{p['pqSubspaces']}" as built;
    """)


def _q_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ ADC search (operators/similarity.py, Jégou et al. 2011):
    the index stores 1-byte-per-subspace codes; the probe scans ONLY
    (id, cell, pq_code) — parquet column pruning skips the vectors —
    and `rerank` exact-rescores the top ADC candidates.  Approximate
    by construction → rows-only contract (like lsh_topk); the recall
    floor and the column-pruning plan gate live in
    tests/test_operators.py (test_ivf_pq_adc_search_and_rerank,
    test_ivf_pq_answer_quality_pinned), and ivf_pq_recall rebuilds a
    FRESH index and hash-checks recall every run.  Here the build is
    cached per (sf tag, source fingerprint, build params) — the ANN
    lifecycle is build-once / search-many, so bench samples time the
    SEARCH (round-8 bench headline entry)."""
    import os
    import tempfile
    eng = _engine(spark)
    src = f"{sf_dir}/embeddings.parquet"
    st = os.stat(src)
    tag = os.path.basename(os.path.normpath(sf_dir))
    # fingerprint = source identity + build params, so a changed
    # nlist/pqSubspaces (or regenerated table) rebuilds instead of
    # silently searching a stale index
    p = _IVFPQ_PARAMS
    fp = (f"{st.st_size:x}{int(st.st_mtime):x}"
          f"_n{p['nlist']}m{p['pqSubspaces']}")
    idx = os.path.join(tempfile.gettempdir(),
                       f"spk_ivfpq_{tag}_{fp}", "idx")
    if not os.path.exists(os.path.join(idx, "pq_codebooks.json")):
        _ivfpq_build(eng, sf_dir, idx)
    return eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    select * from embeddings where vec_id < 20 as pq_queries;
    run pq_queries as IVFSimilaritySearch.`{idx}` where k="5"
        and nprobe="8" and usePQ="true" and rerank="50" as output;
    """)


def _q_ivf_pq_topk_contract(spark, sf_dir):
    """Hash-matched contract shape for ivf_pq_topk (round-9, retiring
    the last rows-only oracle): run the EXACT benched search — same
    cached index, same params, via _q_ivf_pq_topk — then aggregate its
    answers per query into DuckDB-replayable values plus an in-engine
    quality flag: (query_id, n_hits, recall_ok).  n_hits (=k) and the
    query-id set are independently replayed by the oracle; recall@5 vs
    a brute-force SimilaritySearch computed in the same script is
    bounded per query (>= 0.6, measured 1.0 — same headroom as
    ivf_pq_recall's min bound).  Unlike ivf_pq_recall (which builds a
    FRESH index every run), this contract covers the benched
    cached-index path itself, so a stale or corrupt cache artifact
    fails the hash gate instead of silently serving wrong neighbors.
    bench.py times base_queries()['ivf_pq_topk'] (search-only shape) —
    this wrap exists only in queries(), outside the floor path.

    Round-10: the per-query EXACT top-5 csv rides along and is
    recomputed by the oracle in DuckDB list arithmetic, so the recall
    flag's exact side is cross-engine, not Spark-vs-Spark."""
    eng = _engine(spark)
    _q_ivf_pq_topk(spark, sf_dir)  # registers `output` (hits) + `embeddings`
    return eng.execute("""
    select * from output as pqt_hits;
    run embeddings as SimilaritySearch.`` where k="5"
        and queryFilter="vec_id < 20" as pqt_exact;
    select e.query_id as query_id,
           count(h.neighbor_id) / 5.0 as recall
    from pqt_exact e left join pqt_hits h
      on h.query_id = e.query_id and h.neighbor_id = e.neighbor_id
    group by e.query_id as pqt_per_query;
    select query_id,
           array_join(transform(array_sort(collect_list(
               struct(rank, neighbor_id))),
               s -> cast(s.neighbor_id as string)), ',') as exact_top5
    from pqt_exact group by query_id as pqt_exact_sets;
    select c.query_id as query_id, c.n_hits as n_hits,
           s.exact_top5 as exact_top5,
           (p.recall >= 0.6) as recall_ok
    from (select query_id, count(*) as n_hits
          from pqt_hits group by query_id) c
    join pqt_per_query p on c.query_id = p.query_id
    join pqt_exact_sets s on c.query_id = s.query_id as output;
    """)


_IVF_PQ_TOPK_ORACLE = f"""
SELECT query_id,
       CAST(5 AS BIGINT) AS n_hits,
       exact_top5,
       TRUE AS recall_ok
FROM ({_EXACT_TOP5_CSV})
"""


def _q_ivf_pq_recall(spark, sf_dir):
    """IVF-PQ answer quality as a hash-matched contract (round-8):
    recall@5 of the ADC+rerank search vs the exact brute-force
    SimilaritySearch computed in the SAME script, aggregated to
    bound flags (the same upgrade pattern as lsh_similarity).  With
    nprobe = nlist the candidate set is complete and rerank="50"
    exact-rescores, so measured recall is 1.0 at sf0.001/0.01/0.1;
    bounds (mean >= 0.9, min >= 0.6) leave headroom for future
    param retuning without letting a real ADC/rerank regression
    through.  The benched search-only query ivf_pq_topk stays
    unchanged (its committed floor times the SEARCH alone); this
    query is the correctness side of the same path — and it builds a
    FRESH index every run (no fingerprint cache: a warm /tmp index
    built by older code must never mask an IVFIndexBuild regression
    in a correctness contract)."""
    import tempfile
    eng = _engine(spark)
    idx = tempfile.mkdtemp(prefix="spk_pqrecall_") + "/idx"
    _ivfpq_build(eng, sf_dir, idx)
    return eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    select * from embeddings where vec_id < 20 as pqr_queries;
    run pqr_queries as IVFSimilaritySearch.`{idx}` where k="5"
        and nprobe="8" and usePQ="true" and rerank="50" as pqr_hits;
    run embeddings as SimilaritySearch.`` where k="5"
        and queryFilter="vec_id < 20" as pqr_exact;
    select e.query_id as query_id,
           count(p.neighbor_id) / 5.0 as recall
    from pqr_exact e left join pqr_hits p
      on p.query_id = e.query_id and p.neighbor_id = e.neighbor_id
    group by e.query_id as pqr_per_query;
    select count(*) as n_queries,
           (avg(recall) >= 0.9) as mean_recall_ok,
           (min(recall) >= 0.6) as floor_recall_ok
    from pqr_per_query as output;
    """)


_IVF_PQ_RECALL_ORACLE = """
SELECT count(*) AS n_queries,
       TRUE AS mean_recall_ok,
       TRUE AS floor_recall_ok
FROM embeddings WHERE vec_id < 20
"""


def _q_ivf_index_append(spark, sf_dir):
    """Incremental IVF ingest (operators/similarity.py IVFIndexBuild
    append="true"): build the index on half the corpus, append the
    other half against the FROZEN centroids (no re-cluster, only the
    increment is written), then search at nprobe=nlist — every cell
    read, both generations visible, so the result is exact over the
    full corpus and shares the brute-force oracle."""
    import tempfile
    eng = _engine(spark)
    idx = tempfile.mkdtemp(prefix="spk_ivfapp_") + "/idx"
    eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    select * from embeddings where vec_id % 2 = 0 as ivf_gen1;
    select * from embeddings where vec_id % 2 = 1 as ivf_gen2;
    run ivf_gen1 as IVFIndexBuild.`{idx}` where nlist="8" as built_a;
    run ivf_gen2 as IVFIndexBuild.`{idx}` where append="true" as built_b;
    """)
    return eng.execute(f"""
    select * from embeddings where vec_id < 20 as ivf_aq;
    run ivf_aq as IVFSimilaritySearch.`{idx}` where k="5"
        and nprobe="8" as output;
    """)


_EMBEDDING_TOPK_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id,
         list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y*y)))) AS u
  FROM v
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.u, c.u), 4) AS cosine
  FROM n q JOIN n c ON q.vec_id != c.vec_id
  WHERE q.vec_id < 20
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""


def _q_embedding_dedup(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    run embeddings as EmbeddingDedup.`` where threshold="0.45" as output;
    """)


_EMBEDDING_DEDUP_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id,
         list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y*y)))) AS u
  FROM v
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.u, b.u), 4) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.u, b.u), 4) >= 0.45
"""


def _q_semdedup(spark, sf_dir):
    """SemDeDup (cluster-scoped embedding dedup) at nlist=1 with the
    sub-split disabled (maxCellSize >= corpus) — the degenerate config
    that is provably identical to brute-force pair generation, checked
    against the same oracle as EmbeddingDedup."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    run embeddings as SemDeDup.`` where threshold="0.45" and nlist="1"
        and maxCellSize="10000000" as pairs;
    select id_a, id_b, cosine from pairs as output;
    """)


def _q_language_id(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as LanguageID.`` as lang_out;
    select doc_id, lang, lang_pred from lang_out as output;
    """)


def _language_id_oracle() -> str:
    from streamingpro_spark.operators.text_analysis import _LANG_MARKERS
    score_cols = []
    for lang, markers in _LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"len(list_intersect(toks, [{arr}])) / {len(markers)}.0 AS s_{lang}")
    langs = list(_LANG_MARKERS)
    # first maximal language in fixed order (strict > vs running best)
    case = "CASE WHEN " + " AND ".join(
        f"s_{langs[0]} >= s_{l}" for l in langs[1:]) + f" AND s_{langs[0]} > 0 THEN '{langs[0]}'"
    for i in range(1, len(langs)):
        conds = [f"s_{langs[i]} >= s_{l}" for l in langs[i + 1:]]
        conds.append(f"s_{langs[i]} > 0")
        case += f" WHEN {' AND '.join(conds)} THEN '{langs[i]}'"
    case += " ELSE 'und' END"
    return f"""
WITH t AS (
  SELECT doc_id, lang, list_distinct(string_split_regex(lower(text), '\\s+')) AS toks
  FROM documents
),
s AS (SELECT doc_id, lang, {", ".join(score_cols)} FROM t)
SELECT doc_id, lang, {case} AS lang_pred FROM s
"""


def _q_quality(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as QualityScore.`` as q_out;
    select doc_id, n_chars, n_tokens, mean_token_len, distinct_token_ratio,
           alpha_ratio, digit_ratio, punct_ratio, quality_score
    from q_out as output;
    """)


_QUALITY_ORACLE = """
WITH t AS (
  SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         round(length(text) * 1.0 / greatest(len(toks), 1), 4) AS mean_token_len,
         round(len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1), 4) AS distinct_token_ratio,
         round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
               / greatest(length(text), 1), 4) AS alpha_ratio,
         round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
               / greatest(length(text), 1), 4) AS digit_ratio,
         round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
               / greatest(length(text), 1), 4) AS punct_ratio
  FROM t
)
SELECT *, round(
    (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 0.25 ELSE 0.0 END)
  + (CASE WHEN distinct_token_ratio >= 0.2 THEN 0.25 ELSE 0.0 END)
  + (CASE WHEN mean_token_len >= 2 AND mean_token_len <= 12 THEN 0.25 ELSE 0.0 END)
  + (CASE WHEN alpha_ratio >= 0.5 THEN 0.25 ELSE 0.0 END), 2) AS quality_score
FROM m
"""


def _q_token_count(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as TokenCount.`` as t_out;
    select doc_id, ws_tokens, est_bpe_tokens from t_out as output;
    """)


_TOKEN_COUNT_ORACLE = """
SELECT doc_id,
       CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[^\\s]{1,6}'))
            + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT)
         AS est_bpe_tokens
FROM documents
"""


def _q_fingerprint(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as DocFingerprint.`` as f_out;
    select doc_id, md5, content_hash, normalized_hash from f_out as output;
    """)


_FINGERPRINT_ORACLE = """
SELECT doc_id, md5(text) AS md5,
       CAST(CONCAT('0x', substr(md5(CONCAT('fp:', text)), 1, 15)) AS BIGINT) AS content_hash,
       CAST(CONCAT('0x', substr(md5(CONCAT('fpn:',
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))), 1, 15)) AS BIGINT)
         AS normalized_hash
FROM documents
"""


def _q_pii_redact(spark, sf_dir):
    # the synthetic corpus has no natural PII, so the query plants a
    # deterministic email/phone/ip per row (built from doc_id identically
    # in both engines) and the oracle mirrors the same regex chain
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id,
           concat(text, ' contact user', cast(doc_id as string),
                  '@example.com or +1 555-01', cast(doc_id % 90 + 10 as string),
                  ' at 10.0.0.', cast(doc_id % 250 as string)) as text
    from documents as pii_docs;
    run pii_docs as PiiRedact.`` as red_out;
    select doc_id, n_emails, n_phones, n_ips, text_redacted
    from red_out as output;
    """)


_PII_REDACT_ORACLE = """
WITH pii AS (
  SELECT doc_id,
         concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                '@example.com or +1 555-01', CAST(doc_id % 90 + 10 AS VARCHAR),
                ' at 10.0.0.', CAST(doc_id % 250 AS VARCHAR)) AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '\\+?\\d[\\d\\- ]{6,}\\d')) AS BIGINT)
         AS n_phones,
       CAST(len(regexp_extract_all(text,
            '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
         AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
            '\\+?\\d[\\d\\- ]{6,}\\d', '<PHONE>', 'g') AS text_redacted
FROM pii
"""


def _q_contamination(spark, sf_dir):
    # benchmark = every 50th document (as a stand-in eval set); every
    # benchmark doc self-hits, near-dups cross-hit
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id as bench_id, text from documents
    where doc_id % 50 = 0 as bench_docs;
    run documents as ContaminationCheck.`` where benchmarkTable="bench_docs"
        and benchIdCol="bench_id" and shingleSize="3" and minOverlap="3"
        as output;
    """)


_CONTAMINATION_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(list_slice(toks, i, i+2), ' ')
                        for i in generate_series(1, greatest(len(toks)-2, 1))]) AS shingles
  FROM t
),
corpus_post AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
bench_post AS (
  SELECT doc_id AS bench_id, s FROM (
    SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 50 = 0)
)
SELECT c.doc_id, b.bench_id,
       CAST(count(*) AS BIGINT) AS shared_shingles
FROM corpus_post c JOIN bench_post b ON c.s = b.s
GROUP BY c.doc_id, b.bench_id
HAVING count(*) >= 3
"""


def _q_chunk_documents(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as ChunkDocuments.`` where chunkSize="20" and overlap="5"
        as chunked;
    select doc_id, chunk_index, chunk_tokens, md5(chunk_text) as chunk_md5
    from chunked as output;
    """)


_CHUNK_DOCUMENTS_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
),
starts AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, greatest(len(toks) - 5, 1), 15)) AS s
  FROM t
)
SELECT doc_id,
       CAST((s - 1) / 15 AS BIGINT) AS chunk_index,
       CAST(len(toks[s:s+19]) AS BIGINT) AS chunk_tokens,
       md5(array_to_string(toks[s:s+19], ' ')) AS chunk_md5
FROM starts
"""


def _q_near_dedup(spark, sf_dir):
    """NearDedup (operators/dedup.py): the one-shot MinHash → connected
    components → min-id-survivor composition; the oracle replays the
    whole chain in DuckDB (shared pair CTEs + recursive components)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as NearDedup.`` where threshold="0.8" as kept;
    select doc_id from kept as output;
    """)


def _q_near_dedup_incr(spark, sf_dir):
    """NearDedup refTable mode (operators/dedup.py): the daily-ingest
    contract — the increment is scrubbed of BOTH lake near-dups and
    near-dups WITHIN the increment (round-7).  The batch plants exact
    copies of ref docs (cross dups) and doubled batch docs (intra
    dups); the oracle replays the side-tagged MinHash chain + the
    removal-set union in DuckDB."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id, text from documents where doc_id % 5 != 0 as ref_corpus;
    select doc_id, text from documents where doc_id % 5 = 0
    union all
    select doc_id + 10000000 as doc_id, text from documents
    where doc_id % 5 = 1 and doc_id % 3 = 0
    union all
    select doc_id + 20000000 as doc_id, text from documents
    where doc_id % 5 = 0 and doc_id % 3 = 0
    as batch;
    run batch as NearDedup.`` where refTable="ref_corpus"
        and threshold="0.8" as kept;
    select doc_id from kept as output;
    """)


def _mh_incr_ctes() -> str:
    """Side-tagged variant of `_mh_pair_ctes`: signatures/bands over
    batch (side 0) ∪ ref (side 1), yielding verified CROSS pairs
    (batch×ref) and SELF pairs (batch×batch) — the DuckDB replay of
    MinHashDedup's intraBatch mode over the constructed increment."""
    return f"""consts AS ({_mh_oracle_consts()}),
refd AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
bat AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 10000000, text FROM documents
  WHERE doc_id % 5 = 1 AND doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 20000000, text FROM documents
  WHERE doc_id % 5 = 0 AND doc_id % 3 = 0
),
alld AS (
  SELECT 0 AS side, doc_id, text FROM bat
  UNION ALL
  SELECT 1 AS side, doc_id, text FROM refd
),
t AS (
  SELECT side, doc_id,
         string_split_regex(lower(text), '\\s+') AS toks FROM alld
),
sh AS (
  SELECT side, doc_id,
         list_distinct([array_to_string(list_slice(toks, i, i+2), ' ')
                        for i in generate_series(1, greatest(len(toks)-2, 1))]) AS shingles
  FROM t
),
bases AS (
  SELECT side, doc_id, shingles,
         [CAST(CONCAT('0x', substr(md5(CONCAT('mh:', sng)), 1, 8)) AS BIGINT)
          % 1073741824 for sng in shingles] AS ms
  FROM sh
),
sig AS (
  SELECT side, doc_id,
         [list_min([(m * A[s+1] + B[s+1]) % 2305843009213693951 for m in ms])
          for s in generate_series(0, 11)] AS mh
  FROM bases, consts
),
bands AS (
  SELECT side, doc_id, b.band,
         CAST(CONCAT('0x', substr(md5(CONCAT('band', CAST(b.band AS VARCHAR), ':',
              array_to_string(list_transform(list_slice(mh, b.band*3+1, b.band*3+3),
                                             x -> CAST(x AS VARCHAR)), '_'))), 1, 15)) AS BIGINT) AS bh
  FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) b
),
cross_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM bands a JOIN bands b2 ON a.band = b2.band AND a.bh = b2.bh
  WHERE a.side = 0 AND b2.side = 1
),
self_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM bands a JOIN bands b2 ON a.band = b2.band AND a.bh = b2.bh
                            AND a.doc_id < b2.doc_id
  WHERE a.side = 0 AND b2.side = 0
),
vcross AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           len(list_intersect(sa.shingles, sb.shingles)) AS i,
           len(sa.shingles) AS na, len(sb.shingles) AS nb
    FROM cross_pairs
    JOIN sh sa ON sa.side = 0 AND doc_a = sa.doc_id
    JOIN sh sb ON sb.side = 1 AND doc_b = sb.doc_id)
  WHERE i * 1.0 / (na + nb - i) >= 0.8
),
vself AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           len(list_intersect(sa.shingles, sb.shingles)) AS i,
           len(sa.shingles) AS na, len(sb.shingles) AS nb
    FROM self_pairs
    JOIN sh sa ON sa.side = 0 AND doc_a = sa.doc_id
    JOIN sh sb ON sb.side = 0 AND doc_b = sb.doc_id)
  WHERE i * 1.0 / (na + nb - i) >= 0.8
)"""


_NEAR_DEDUP_INCR_ORACLE = f"""
WITH RECURSIVE {_mh_incr_ctes()},
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM vself
  UNION ALL
  SELECT doc_b, doc_a FROM vself
),
conn(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT c.a, s.b FROM conn c JOIN sym s ON c.b = s.a
),
lbl AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(c.b), d.doc_id)) AS cl
  FROM bat d LEFT JOIN conn c ON c.a = d.doc_id
  GROUP BY d.doc_id
),
removed AS (
  SELECT DISTINCT doc_a AS doc_id FROM vcross
  UNION
  SELECT doc_id FROM lbl WHERE doc_id != cl
)
SELECT doc_id FROM bat
WHERE doc_id NOT IN (SELECT doc_id FROM removed)
"""


# --- composed incremental lake (round-8: the examples/09 product claim
# as ONE hash-matched contract query over two simulated ingest days) ---

#: deterministic day-1 / day-2 increment definitions, shared verbatim
#: between the Spark script (Spark SQL) and the oracle (DuckDB SQL) —
#: both dialects accept these select bodies unchanged.  Groups per day:
#: exact re-ingest (Bloom removes), near-dup of lake content (NearDedup
#: cross pair removes — day 2's near-dup targets DAY-1 arrivals, which
#: only works if the signature refresh appended day-1 band rows), an
#: intra-batch dup pair (min-id survives), and genuinely new rows.
_LAKE_DAY0 = ("SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0")
_LAKE_BATCH1 = """
  SELECT doc_id, text FROM documents
  WHERE doc_id % 3 = 1 AND doc_id % 4 = 1           -- exact re-ingest
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text || ' zxqv' AS text
  FROM documents
  WHERE doc_id % 3 = 2 AND doc_id % 4 = 2           -- near-dups lake
  UNION ALL
  SELECT doc_id + 20000000 AS doc_id, text FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 4 = 0           -- intra pair (min)
  UNION ALL
  SELECT doc_id + 30000000 AS doc_id, text FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 4 = 0           -- intra pair (drop)
  UNION ALL
  SELECT doc_id + 40000000 AS doc_id, text FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 4 = 1           -- genuinely new
"""
_LAKE_BATCH2 = """
  SELECT doc_id + 50000000 AS doc_id, text FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 4 = 0           -- exact dup of a DAY-1 arrival
  UNION ALL
  SELECT doc_id + 60000000 AS doc_id, text || ' wkjh' AS text
  FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 4 = 1           -- near-dups a DAY-1 arrival
  UNION ALL
  SELECT doc_id + 70000000 AS doc_id, text || ' pmrt' AS text
  FROM documents
  WHERE doc_id % 3 = 1 AND doc_id % 4 = 3           -- near-dups a v0 doc
  UNION ALL
  SELECT doc_id + 80000000 AS doc_id, text FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 4 = 2           -- intra pair (min)
  UNION ALL
  SELECT doc_id + 90000000 AS doc_id, text FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 4 = 2           -- intra pair (drop)
  UNION ALL
  SELECT doc_id + 95000000 AS doc_id, text FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 4 = 3           -- genuinely new
"""


def _mh_day_ctes(p: str, batch: str, ref: str) -> str:
    """One ingest day's DuckDB replay of the NearDedup refTable chain
    over arbitrary (doc_id, text) CTEs `batch` and `ref`: side-tagged
    signatures → bands → verified CROSS (batch×ref) and SELF
    (batch×batch) pairs → connected components over self pairs →
    removal set (formulas identical to `_mh_incr_ctes`, which the
    round-7 `near_dedup_incr` query proved against the operators).
    All CTE names carry prefix `p` so two days coexist in one WITH."""
    return f"""{p}alld AS (
  SELECT 0 AS side, doc_id, text FROM {batch}
  UNION ALL
  SELECT 1 AS side, doc_id, text FROM {ref}
),
{p}t AS (
  SELECT side, doc_id,
         string_split_regex(lower(text), '\\s+') AS toks FROM {p}alld
),
{p}sh AS (
  SELECT side, doc_id,
         list_distinct([array_to_string(list_slice(toks, i, i+2), ' ')
                        for i in generate_series(1, greatest(len(toks)-2, 1))]) AS shingles
  FROM {p}t
),
{p}bases AS (
  SELECT side, doc_id, shingles,
         [CAST(CONCAT('0x', substr(md5(CONCAT('mh:', sng)), 1, 8)) AS BIGINT)
          % 1073741824 for sng in shingles] AS ms
  FROM {p}sh
),
{p}sig AS (
  SELECT side, doc_id,
         [list_min([(m * A[s+1] + B[s+1]) % 2305843009213693951 for m in ms])
          for s in generate_series(0, 11)] AS mh
  FROM {p}bases, consts
),
{p}bands AS (
  SELECT side, doc_id, b.band,
         CAST(CONCAT('0x', substr(md5(CONCAT('band', CAST(b.band AS VARCHAR), ':',
              array_to_string(list_transform(list_slice(mh, b.band*3+1, b.band*3+3),
                                             x -> CAST(x AS VARCHAR)), '_'))), 1, 15)) AS BIGINT) AS bh
  FROM {p}sig, (SELECT unnest(generate_series(0, 3)) AS band) b
),
{p}cross_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM {p}bands a JOIN {p}bands b2 ON a.band = b2.band AND a.bh = b2.bh
  WHERE a.side = 0 AND b2.side = 1
),
{p}self_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM {p}bands a JOIN {p}bands b2 ON a.band = b2.band AND a.bh = b2.bh
                                  AND a.doc_id < b2.doc_id
  WHERE a.side = 0 AND b2.side = 0
),
{p}vcross AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           len(list_intersect(sa.shingles, sb.shingles)) AS i,
           len(sa.shingles) AS na, len(sb.shingles) AS nb
    FROM {p}cross_pairs
    JOIN {p}sh sa ON sa.side = 0 AND doc_a = sa.doc_id
    JOIN {p}sh sb ON sb.side = 1 AND doc_b = sb.doc_id)
  WHERE i * 1.0 / (na + nb - i) >= 0.8
),
{p}vself AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           len(list_intersect(sa.shingles, sb.shingles)) AS i,
           len(sa.shingles) AS na, len(sb.shingles) AS nb
    FROM {p}self_pairs
    JOIN {p}sh sa ON sa.side = 0 AND doc_a = sa.doc_id
    JOIN {p}sh sb ON sb.side = 0 AND doc_b = sb.doc_id)
  WHERE i * 1.0 / (na + nb - i) >= 0.8
),
{p}sym AS (
  SELECT doc_a AS a, doc_b AS b FROM {p}vself
  UNION ALL
  SELECT doc_b, doc_a FROM {p}vself
),
{p}conn(a, b) AS (
  SELECT a, b FROM {p}sym
  UNION
  SELECT c.a, s.b FROM {p}conn c JOIN {p}sym s ON c.b = s.a
),
{p}lbl AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(c.b), d.doc_id)) AS cl
  FROM {batch} d LEFT JOIN {p}conn c ON c.a = d.doc_id
  GROUP BY d.doc_id
),
{p}removed AS (
  SELECT DISTINCT doc_a AS doc_id FROM {p}vcross
  UNION
  SELECT doc_id FROM {p}lbl WHERE doc_id != cl
)"""


def _q_incremental_lake(spark, sf_dir):
    """The composed incremental-lake flow (examples/09) as ONE
    oracle-verified chain over two simulated ingest days:
    BloomFilterDedup (exact, vs the CURRENT lake snapshot) → NearDedup
    refTable+refBandsTable (near, intra-batch included; the history is
    never re-hashed) → MinHashSignatures refresh (only the day's
    accepted rows are hashed and appended) → versionedParquet append.
    Output = every lake row with the commit version it landed in, so
    the hash match pins WHICH day admitted each row.  Day 2's
    increment plants exact and near dups of DAY-1 arrivals: those rows
    only drop if the bloom probe saw the updated snapshot and the
    signature store really gained day-1's band rows."""
    import tempfile
    root = tempfile.mkdtemp(prefix="spk_inclake_")
    lake, sigs = f"{root}/lake", f"{root}/sigs"
    eng = _engine(spark)
    eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    {_LAKE_DAY0} as day0;
    save overwrite day0 as versionedParquet.`{lake}`;
    run day0 as MinHashSignatures.`` as sigs0;
    save overwrite sigs0 as parquet.`{sigs}`;

    {_LAKE_BATCH1} as batch1;
    load versionedParquet.`{lake}` as hist0;
    run batch1 as BloomFilterDedup.`` where refTable="hist0" as b1_new;
    load parquet.`{sigs}` as sigs_cur0;
    run b1_new as NearDedup.`` where refTable="hist0"
        and refBandsTable="sigs_cur0" and threshold="0.8" as day1_kept;
    save append day1_kept as versionedParquet.`{lake}`;
    run day1_kept as MinHashSignatures.`` as sigs1;
    save append sigs1 as parquet.`{sigs}`;

    {_LAKE_BATCH2} as batch2;
    load versionedParquet.`{lake}` as hist1;
    run batch2 as BloomFilterDedup.`` where refTable="hist1" as b2_new;
    load parquet.`{sigs}` as sigs_cur1;
    run b2_new as NearDedup.`` where refTable="hist1"
        and refBandsTable="sigs_cur1" and threshold="0.8" as day2_kept;
    save append day2_kept as versionedParquet.`{lake}`;
    """)
    return eng.execute(f"""
    load versionedParquet.`{lake}`
        where startingVersion="0" and endingVersion="2" as lake_rows;
    select doc_id, cast(__delta_version__ as bigint) as commit_version
    from lake_rows as output;
    """)


_INCREMENTAL_LAKE_ORACLE = f"""
WITH RECURSIVE consts AS ({_mh_oracle_consts()}),
lake0 AS MATERIALIZED ({_LAKE_DAY0}),
b1 AS ({_LAKE_BATCH1}),
b1f AS MATERIALIZED (
  SELECT b.* FROM b1 b
  WHERE NOT EXISTS (SELECT 1 FROM lake0 l WHERE l.text = b.text)
),
{_mh_day_ctes('d1_', 'b1f', 'lake0')},
day1_kept AS MATERIALIZED (
  SELECT doc_id, text FROM b1f
  WHERE doc_id NOT IN (SELECT doc_id FROM d1_removed)
),
lake1 AS MATERIALIZED (
  SELECT doc_id, text FROM lake0
  UNION ALL SELECT doc_id, text FROM day1_kept
),
b2 AS ({_LAKE_BATCH2}),
b2f AS MATERIALIZED (
  SELECT b.* FROM b2 b
  WHERE NOT EXISTS (SELECT 1 FROM lake1 l WHERE l.text = b.text)
),
{_mh_day_ctes('d2_', 'b2f', 'lake1')},
day2_kept AS (
  SELECT doc_id, text FROM b2f
  WHERE doc_id NOT IN (SELECT doc_id FROM d2_removed)
)
SELECT doc_id, CAST(0 AS BIGINT) AS commit_version FROM lake0
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT) FROM day1_kept
UNION ALL
SELECT doc_id, CAST(2 AS BIGINT) FROM day2_kept
"""


def _q_streaming_lake_ingest(spark, sf_dir):
    """The incremental lake driven by STRUCTURED STREAMING (round-8):
    the same two ingest days as `incremental_lake_e2e`, but arriving as
    micro-batches — a streamParquet source (maxFilesPerTrigger=1, one
    day per file, mtime-ordered) feeding a `custom` batchScript sink
    whose per-batch sub-script runs the full curation chain against
    the lake AS OF that batch: BloomFilterDedup → NearDedup
    refTable+refBandsTable → versionedParquet append → signature
    refresh.  The oracle is the SAME DuckDB replay as the batch query —
    a hash match proves the streaming path admits exactly the rows,
    into exactly the commits, that the batch semantics dictate."""
    import os
    import tempfile
    import time as _time
    import duckdb
    root = tempfile.mkdtemp(prefix="spk_slake_")
    lake, sigs, inc = f"{root}/lake", f"{root}/sigs", f"{root}/inc"
    os.makedirs(inc)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    con.execute(f"COPY ({_LAKE_BATCH1}) TO '{inc}/day1.parquet' "
                f"(FORMAT PARQUET)")
    con.execute(f"COPY ({_LAKE_BATCH2}) TO '{inc}/day2.parquet' "
                f"(FORMAT PARQUET)")
    con.close()
    # deterministic micro-batch order: FileStreamSource picks files by
    # modification time; force day1 strictly older
    now = _time.time()
    os.utime(f"{inc}/day1.parquet", (now - 2000, now - 2000))
    os.utime(f"{inc}/day2.parquet", (now - 1000, now - 1000))
    eng = _engine(spark)
    eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    {_LAKE_DAY0} as slake_day0;
    save overwrite slake_day0 as versionedParquet.`{lake}`;
    run slake_day0 as MinHashSignatures.`` as slake_sigs0;
    save overwrite slake_sigs0 as versionedParquet.`{sigs}`;
    set streamName = "slake_ingest";
    load streamParquet.`{inc}` options maxFilesPerTrigger="1"
        as slake_inc;
    save append slake_inc as custom.`` options
        checkpointLocation="{root}/ck" and duration="0"
        and batchScript='''
        load versionedParquet.`{lake}` as cur_lake;
        run __batch_df__ as BloomFilterDedup.`` where
            refTable="cur_lake" as fresh_batch;
        load versionedParquet.`{sigs}` as cur_sigs;
        run fresh_batch as NearDedup.`` where refTable="cur_lake"
            and refBandsTable="cur_sigs" and threshold="0.8"
            as kept_batch;
        save append kept_batch as versionedParquet.`{lake}`;
        -- derived store is computed from the COMMITTED batch delta,
        -- not the in-flight batch, and written through the same
        -- (txnId, batchId) key: a crash between the lake append and
        -- this append is healed by the replay (the replayed batch
        -- dedups to empty, but the committed delta is still there),
        -- and a full replay skips both saves (round-10)
        load versionedParquet.`{lake}` options commitOfBatch="true"
            as lake_delta;
        run lake_delta as MinHashSignatures.`` as new_sigs;
        save append new_sigs as versionedParquet.`{sigs}`;
        ''';
    """)
    q = eng.context.jobs.pop("slake_ingest")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return eng.execute(f"""
    load versionedParquet.`{lake}`
        where startingVersion="0" and endingVersion="2" as slake_rows;
    select doc_id, cast(__delta_version__ as bigint) as commit_version
    from slake_rows as output;
    """)


def _tn_default_expr(col: str) -> str:
    """DuckDB expression replaying TextNormalize's DEFAULT chain
    (stripControl -> unifyPunct -> lowercase -> collapseWhitespace) on
    `col` — translate maps taken from the module constants so the two
    can't drift (the accents/digits steps are off by default)."""
    from streamingpro_spark.operators.text_analysis import (
        _SMART_PUNCT_FROM, _SMART_PUNCT_TO)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    return (
        "trim(regexp_replace(lower(replace(translate("
        f"regexp_replace({col}, "
        "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]', '', 'g'), "
        f"{q(_SMART_PUNCT_FROM)}, {q(_SMART_PUNCT_TO)}), "
        "'…', '...')), '\\s+', ' ', 'g'))")


def _gopher_kept_ctes(p: str, src: str) -> str:
    """DuckDB CTEs replaying GopherQualityFilter's keep verdict over
    `src` (doc_id, text) with the contract thresholds (minWords=20,
    minStopwords=1, minAlphaWordFrac=0.85, maxSymbolWordRatio=0.05,
    others default) — ends with {p}kept(doc_id, text).  Ratios are
    rounded to 4 BEFORE the threshold compare, exactly as the ET
    compares its rounded output columns."""
    return f"""{p}m AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'),
                     w -> w != '') AS words,
         string_split(text, chr(10)) AS lines
  FROM {src}
),
{p}f AS (
  SELECT doc_id, text,
    len(words) AS n_words,
    round(len(regexp_replace(text, '\\s+', '', 'g'))
          / greatest(len(words), 1), 4) AS mwl,
    round((len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '\\.\\.\\.|…')))
          / greatest(len(words), 1), 4) AS sym,
    round(len(list_filter(lines,
              l -> regexp_matches(l, '^\\s*[-*•‣▪]')))
          / greatest(len(lines), 1), 4) AS bullet,
    round(len(list_filter(lines,
              l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
          / greatest(len(lines), 1), 4) AS ellip,
    round(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
          / greatest(len(words), 1), 4) AS alpha,
    len(list_intersect(
        list_distinct(string_split_regex(lower(text), '\\s+')),
        ['the','be','to','of','and','that','have','with'])) AS stops
  FROM {p}m
),
{p}kept AS MATERIALIZED (
  SELECT doc_id, text FROM {p}f
  WHERE n_words >= 20 AND n_words <= 100000
    AND mwl >= 3.0 AND mwl <= 10.0 AND sym <= 0.05
    AND bullet <= 0.9 AND ellip <= 0.3 AND alpha >= 0.85 AND stops >= 1
)"""


#: GopherQualityFilter params for the curated lake — one source of
#: truth for BOTH ingest scripts; mirrored in _gopher_kept_ctes
_CURATE_GOPHER = ('minWords="20" and minStopwords="1" and '
                  'minAlphaWordFrac="0.85" and maxSymbolWordRatio="0.05" '
                  'and mode="filter"')


def _q_streaming_curated_lake(spark, sf_dir):
    """The CURATED streaming lake (round-9; examples/14): every
    arriving micro-batch is normalized (TextNormalize, default chain)
    and quality-gated (GopherQualityFilter, filter mode) BEFORE the
    dedup chain — TextNormalize -> Gopher -> Bloom -> NearDedup
    refTable+refBandsTable -> versionedParquet append -> signature
    refresh, all inside the exactly-once batchScript sink.  Same two
    staged ingest days as streaming_lake_ingest; the DuckDB oracle
    replays the ENTIRE composition (normalize expression, gopher keep
    verdict, exact/near dedup, commit assignment) for both days, so a
    hash match proves the curation operators compose with the lake
    under streaming semantics, not just in isolated batch contracts."""
    import os
    import tempfile
    import time as _time
    import duckdb
    root = tempfile.mkdtemp(prefix="spk_sclake_")
    lake, sigs, inc = f"{root}/lake", f"{root}/sigs", f"{root}/inc"
    os.makedirs(inc)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    con.execute(f"COPY ({_LAKE_BATCH1}) TO '{inc}/day1.parquet' "
                f"(FORMAT PARQUET)")
    con.execute(f"COPY ({_LAKE_BATCH2}) TO '{inc}/day2.parquet' "
                f"(FORMAT PARQUET)")
    con.close()
    now = _time.time()
    os.utime(f"{inc}/day1.parquet", (now - 2000, now - 2000))
    os.utime(f"{inc}/day2.parquet", (now - 1000, now - 1000))
    eng = _engine(spark)
    eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    {_LAKE_DAY0} as scl_raw0;
    run scl_raw0 as TextNormalize.`` as scl_norm0;
    run scl_norm0 as GopherQualityFilter.`` where {_CURATE_GOPHER}
        as scl_gq0;
    select doc_id, text from scl_gq0 as scl_day0;
    save overwrite scl_day0 as versionedParquet.`{lake}`;
    run scl_day0 as MinHashSignatures.`` as scl_sigs0;
    save overwrite scl_sigs0 as versionedParquet.`{sigs}`;
    set streamName = "scl_ingest";
    load streamParquet.`{inc}` options maxFilesPerTrigger="1"
        as scl_inc;
    save append scl_inc as custom.`` options
        checkpointLocation="{root}/ck" and duration="0"
        and batchScript='''
        run __batch_df__ as TextNormalize.`` as scl_nb;
        run scl_nb as GopherQualityFilter.`` where {_CURATE_GOPHER}
            as scl_gb;
        select doc_id, text from scl_gb as scl_cb;
        load versionedParquet.`{lake}` as scl_lake;
        run scl_cb as BloomFilterDedup.`` where
            refTable="scl_lake" as scl_fresh;
        load versionedParquet.`{sigs}` as scl_sigs;
        run scl_fresh as NearDedup.`` where refTable="scl_lake"
            and refBandsTable="scl_sigs" and threshold="0.8"
            as scl_kept;
        save append scl_kept as versionedParquet.`{lake}`;
        -- signature refresh from the COMMITTED delta under the same
        -- (txnId, batchId) key: crash-healed and replay-skipped with
        -- the lake append (round-10)
        load versionedParquet.`{lake}` options commitOfBatch="true"
            as scl_delta;
        run scl_delta as MinHashSignatures.`` as scl_new_sigs;
        save append scl_new_sigs as versionedParquet.`{sigs}`;
        ''';
    """)
    q = eng.context.jobs.pop("scl_ingest")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return eng.execute(f"""
    load versionedParquet.`{lake}`
        where startingVersion="0" and endingVersion="2" as scl_rows;
    select doc_id, cast(__delta_version__ as bigint) as commit_version
    from scl_rows as output;
    """)


#: shared CTE chain: curated day0 lake (lake0) + two curated, deduped
#: ingest days (day1_kept, day2_kept) — the replay both the curated
#: lake oracle and the layout-ingest oracle build on
_CURATED_LAKE_CTES = f"""consts AS ({_mh_oracle_consts()}),
raw0 AS ({_LAKE_DAY0}),
n0 AS (SELECT doc_id, {_tn_default_expr('text')} AS text FROM raw0),
{_gopher_kept_ctes('g0_', 'n0')},
lake0 AS MATERIALIZED (SELECT doc_id, text FROM g0_kept),
b1raw AS ({_LAKE_BATCH1}),
b1n AS (SELECT doc_id, {_tn_default_expr('text')} AS text FROM b1raw),
{_gopher_kept_ctes('g1_', 'b1n')},
b1f AS MATERIALIZED (
  SELECT b.* FROM g1_kept b
  WHERE NOT EXISTS (SELECT 1 FROM lake0 l WHERE l.text = b.text)
),
{_mh_day_ctes('d1_', 'b1f', 'lake0')},
day1_kept AS MATERIALIZED (
  SELECT doc_id, text FROM b1f
  WHERE doc_id NOT IN (SELECT doc_id FROM d1_removed)
),
lake1 AS MATERIALIZED (
  SELECT doc_id, text FROM lake0
  UNION ALL SELECT doc_id, text FROM day1_kept
),
b2raw AS ({_LAKE_BATCH2}),
b2n AS (SELECT doc_id, {_tn_default_expr('text')} AS text FROM b2raw),
{_gopher_kept_ctes('g2_', 'b2n')},
b2f AS MATERIALIZED (
  SELECT b.* FROM g2_kept b
  WHERE NOT EXISTS (SELECT 1 FROM lake1 l WHERE l.text = b.text)
),
{_mh_day_ctes('d2_', 'b2f', 'lake1')},
day2_kept AS MATERIALIZED (
  SELECT doc_id, text FROM b2f
  WHERE doc_id NOT IN (SELECT doc_id FROM d2_removed)
)"""


_STREAMING_CURATED_LAKE_ORACLE = f"""
WITH RECURSIVE {_CURATED_LAKE_CTES}
SELECT doc_id, CAST(0 AS BIGINT) AS commit_version FROM lake0
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT) FROM day1_kept
UNION ALL
SELECT doc_id, CAST(2 AS BIGINT) FROM day2_kept
"""


#: hv = the shard-gate hash; bv = the layout-bucket hash (% 32, the
#: layoutBuckets default).  The engine's parallel position walk (rank
#: within (shard, bucket) + broadcast offset of earlier buckets) is
#: EXACTLY a per-shard row_number ordered by (bucket, hash, id), which
#: is how the oracle replays it in one window.
_SHARD_HASHES = (
    f"SELECT doc_id, "
    f"{_PHASH_DUCK.format(payload=chr(39) + 'shard:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')}"
    f" AS hv, "
    f"{_PHASH_DUCK.format(payload=chr(39) + 'shardpos:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')}"
    f" % 32 AS bv")


def _q_streaming_layout_ingest(spark, sf_dir):
    """The capstone composition (round-9): the curated streaming lake
    FEEDING an incremental training-set layout — each micro-batch's
    kept rows are appended to the layout via DeterministicShard
    refTable (stable shards, positions continue from each shard's
    max), so after two ingest days the layout is exactly what a
    training loader resumes against.  The oracle replays curation +
    dedup (shared CTEs) AND the per-day layout algebra; a hash match
    pins every document's final (shard, position) byte-for-byte.

    Exactly-once across ALL THREE stores (round-10): the signature and
    layout appends are derived from the lake commit read back under
    this batch's (txnId, batchId) key (commitOfBatch) and written
    through versionedParquet under the same key — a crash between the
    lake append and a derived append is healed on replay (the
    committed delta is re-read and the missing append lands), and a
    full replay skips all three saves.  Pinned by
    tests/test_streaming.py::test_batch_script_derived_store_crash_heal."""
    import os
    import tempfile
    import time as _time
    import duckdb
    root = tempfile.mkdtemp(prefix="spk_slayout_")
    lake, sigs, inc = f"{root}/lake", f"{root}/sigs", f"{root}/inc"
    layout = f"{root}/layout"
    os.makedirs(inc)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    con.execute(f"COPY ({_LAKE_BATCH1}) TO '{inc}/day1.parquet' "
                f"(FORMAT PARQUET)")
    con.execute(f"COPY ({_LAKE_BATCH2}) TO '{inc}/day2.parquet' "
                f"(FORMAT PARQUET)")
    con.close()
    now = _time.time()
    os.utime(f"{inc}/day1.parquet", (now - 2000, now - 2000))
    os.utime(f"{inc}/day2.parquet", (now - 1000, now - 1000))
    eng = _engine(spark)
    eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    {_LAKE_DAY0} as sli_raw0;
    run sli_raw0 as TextNormalize.`` as sli_norm0;
    run sli_norm0 as GopherQualityFilter.`` where {_CURATE_GOPHER}
        as sli_gq0;
    select doc_id, text from sli_gq0 as sli_day0;
    save overwrite sli_day0 as versionedParquet.`{lake}`;
    run sli_day0 as MinHashSignatures.`` as sli_sigs0;
    save overwrite sli_sigs0 as versionedParquet.`{sigs}`;
    run sli_day0 as DeterministicShard.`` where numShards="16"
        as sli_layout0;
    select doc_id, shard, shard_pos from sli_layout0 as sli_l0;
    save overwrite sli_l0 as versionedParquet.`{layout}`;
    set streamName = "sli_ingest";
    load streamParquet.`{inc}` options maxFilesPerTrigger="1"
        as sli_inc;
    save append sli_inc as custom.`` options
        checkpointLocation="{root}/ck" and duration="0"
        and batchScript='''
        run __batch_df__ as TextNormalize.`` as sli_nb;
        run sli_nb as GopherQualityFilter.`` where {_CURATE_GOPHER}
            as sli_gb;
        select doc_id, text from sli_gb as sli_cb;
        load versionedParquet.`{lake}` as sli_lake;
        run sli_cb as BloomFilterDedup.`` where
            refTable="sli_lake" as sli_fresh;
        load versionedParquet.`{sigs}` as sli_sigs;
        run sli_fresh as NearDedup.`` where refTable="sli_lake"
            and refBandsTable="sli_sigs" and threshold="0.8"
            as sli_kept;
        save append sli_kept as versionedParquet.`{lake}`;
        -- BOTH derived stores (signatures, layout) are computed from
        -- the COMMITTED batch delta — not the in-flight sli_kept — and
        -- written through versionedParquet under the same
        -- (txnId, batchId) key.  A crash between the lake append and
        -- either derived append used to strand lake rows with no
        -- (shard, shard_pos) forever (the replayed batch re-dedups to
        -- empty); reading the commit back makes the replay re-derive
        -- and append exactly the missing rows, while a full replay
        -- skips all three saves (round-10 advisor finding).
        load versionedParquet.`{lake}` options commitOfBatch="true"
            as sli_delta;
        run sli_delta as MinHashSignatures.`` as sli_new_sigs;
        save append sli_new_sigs as versionedParquet.`{sigs}`;
        load versionedParquet.`{layout}` as sli_prev_layout;
        run sli_delta as DeterministicShard.`` where numShards="16"
            and refTable="sli_prev_layout" as sli_new_layout;
        select doc_id, shard, shard_pos from sli_new_layout as sli_nl;
        save append sli_nl as versionedParquet.`{layout}`;
        ''';
    """)
    q = eng.context.jobs.pop("sli_ingest")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return eng.execute(f"""
    load versionedParquet.`{layout}` as sli_final;
    select doc_id, shard, shard_pos from sli_final as output;
    """)


def _layout_ctes(p: str, src: str, off: "str | None") -> str:
    """DuckDB CTEs replaying one DeterministicShard generation over
    `src` (doc_id, ...): hash-gate shard + hash-order rank, offset by
    the prior layout's per-shard max (+1) when `off` is given — ends
    with {p}l(doc_id, shard, shard_pos)."""
    rank = (f"SELECT doc_id, CAST(hv % 16 AS INT) AS shard,\n"
            f"       CAST(row_number() OVER (PARTITION BY hv % 16\n"
            f"            ORDER BY bv, hv, doc_id) - 1 AS BIGINT) AS rnk\n"
            f"     FROM ({_SHARD_HASHES} FROM {src})")
    if off is None:
        return (f"{p}l AS MATERIALIZED (\n"
                f"  SELECT doc_id, shard, rnk AS shard_pos FROM ({rank})\n"
                f")")
    return (f"{p}l AS MATERIALIZED (\n"
            f"  SELECT q.doc_id, q.shard,\n"
            f"         CAST(q.rnk + coalesce({off}.o, 0) AS BIGINT)\n"
            f"           AS shard_pos\n"
            f"  FROM ({rank}) q LEFT JOIN {off} ON q.shard = {off}.shard\n"
            f")")


_STREAMING_LAYOUT_INGEST_ORACLE = f"""
WITH RECURSIVE {_CURATED_LAKE_CTES},
{_layout_ctes('g0', 'lake0', None)},
off1 AS (SELECT shard, max(shard_pos) + 1 AS o FROM g0l GROUP BY shard),
{_layout_ctes('g1', 'day1_kept', 'off1')},
off2 AS (
  SELECT shard, max(shard_pos) + 1 AS o
  FROM (SELECT shard, shard_pos FROM g0l
        UNION ALL SELECT shard, shard_pos FROM g1l)
  GROUP BY shard
),
{_layout_ctes('g2', 'day2_kept', 'off2')}
SELECT doc_id, shard, shard_pos FROM g0l
UNION ALL SELECT doc_id, shard, shard_pos FROM g1l
UNION ALL SELECT doc_id, shard, shard_pos FROM g2l
"""


#: per-process day-1 lake state for the benched day-2 ingest —
#: keyed by sf_dir; the ANN-index pattern (build-once / measure-many):
#: the first call pays the setup, so best-of-N bench samples time the
#: DAY-2 INCREMENT alone, which is the product claim (day cost tracks
#: the increment, not the history)
_LAKE_DAY_STATE: dict = {}


def _lake_day_state(spark, sf_dir):
    """Build (once per process per sf_dir) the curated day-1 lake the
    benched day-2 ingest runs against: day-0 seed + day-1 increment,
    each through TextNormalize -> Gopher -> Bloom -> NearDedup, with
    the signature store and the DeterministicShard layout maintained
    per day — exactly the state examples/15's pipeline leaves behind
    after one ingest day."""
    import tempfile
    if sf_dir in _LAKE_DAY_STATE:
        return _LAKE_DAY_STATE[sf_dir]
    root = tempfile.mkdtemp(prefix="spk_dayingest_")
    lake, sigs, layout = f"{root}/lake", f"{root}/sigs", f"{root}/layout"
    eng = _engine(spark)
    eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    {_LAKE_DAY0} as ldi_raw0;
    run ldi_raw0 as TextNormalize.`` as ldi_n0;
    run ldi_n0 as GopherQualityFilter.`` where {_CURATE_GOPHER} as ldi_g0;
    select doc_id, text from ldi_g0 as ldi_day0;
    save overwrite ldi_day0 as versionedParquet.`{lake}`;
    run ldi_day0 as MinHashSignatures.`` as ldi_sigs0;
    save overwrite ldi_sigs0 as parquet.`{sigs}`;
    run ldi_day0 as DeterministicShard.`` where numShards="16" as ldi_l0;
    select doc_id, shard, shard_pos from ldi_l0 as ldi_l0s;
    save overwrite ldi_l0s as parquet.`{layout}`;

    {_LAKE_BATCH1} as ldi_b1;
    run ldi_b1 as TextNormalize.`` as ldi_n1;
    run ldi_n1 as GopherQualityFilter.`` where {_CURATE_GOPHER} as ldi_g1;
    select doc_id, text from ldi_g1 as ldi_c1;
    load versionedParquet.`{lake}` as ldi_hist0;
    run ldi_c1 as BloomFilterDedup.`` where refTable="ldi_hist0"
        as ldi_f1;
    load parquet.`{sigs}` as ldi_s0;
    run ldi_f1 as NearDedup.`` where refTable="ldi_hist0"
        and refBandsTable="ldi_s0" and threshold="0.8" as ldi_k1;
    save append ldi_k1 as versionedParquet.`{lake}`;
    run ldi_k1 as MinHashSignatures.`` as ldi_sigs1;
    save append ldi_sigs1 as parquet.`{sigs}`;
    load parquet.`{layout}` as ldi_prev0;
    run ldi_k1 as DeterministicShard.`` where numShards="16"
        and refTable="ldi_prev0" as ldi_l1;
    select doc_id, shard, shard_pos from ldi_l1 as ldi_l1s;
    save append ldi_l1s as parquet.`{layout}`;
    """)
    _LAKE_DAY_STATE[sf_dir] = (lake, sigs, layout)
    return _LAKE_DAY_STATE[sf_dir]


def _q_lake_day_ingest(spark, sf_dir):
    """The composed-lake DAY cost as a benchable, hash-matched shape
    (round-10): the day-2 increment's full derivation against a
    PREPARED day-1 lake — curate (TextNormalize -> Gopher), exact dedup
    vs the lake snapshot (Bloom), near dedup with the stored band rows
    (NearDedup refTable+refBandsTable: history is never re-hashed), and
    the layout extension (DeterministicShard refTable: history is never
    re-read beyond a per-shard max).  This is the product claim's hot
    path: a plan regression in the refTable broadcast, the signature
    reuse, or the offset aggregate moves THIS number, which carries a
    committed floor in BENCH_STANDALONE.json.  The physical appends are
    deliberately outside the timed shape so re-runs are idempotent
    (the derivation is everything that scales with the day; the write
    cost is the increment's own bytes).  The oracle replays the shared
    curated-lake CTEs and the day-2 layout algebra."""
    lake, sigs, layout = _lake_day_state(spark, sf_dir)
    eng = _engine(spark)
    # !cache (script lifetime): the curated batch and the bloom-fresh
    # batch are INCREMENT-sized by construction, and every downstream
    # stage (bloom verify, NearDedup's signature/band/CC passes, the
    # layout) re-executes their lineage once per action without it —
    # recomputing the curation regexes and the Arrow bloom probe 5-6x
    # per day.  Caching the increment is the at-scale choice precisely
    # because it is the DAY's data, not the history.
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    {_LAKE_BATCH2} as ldi_b2;
    run ldi_b2 as TextNormalize.`` as ldi_n2;
    run ldi_n2 as GopherQualityFilter.`` where {_CURATE_GOPHER} as ldi_g2;
    select doc_id, text from ldi_g2 as ldi_c2;
    !cache ldi_c2 script;
    load versionedParquet.`{lake}` as ldi_hist1;
    run ldi_c2 as BloomFilterDedup.`` where refTable="ldi_hist1"
        as ldi_f2;
    !cache ldi_f2 script;
    load parquet.`{sigs}` as ldi_s1;
    run ldi_f2 as NearDedup.`` where refTable="ldi_hist1"
        and refBandsTable="ldi_s1" and threshold="0.8" as ldi_k2;
    load parquet.`{layout}` as ldi_prev1;
    run ldi_k2 as DeterministicShard.`` where numShards="16"
        and refTable="ldi_prev1" as ldi_l2;
    select doc_id, shard, shard_pos from ldi_l2 as output;
    """)


_LAKE_DAY_INGEST_ORACLE = f"""
WITH RECURSIVE {_CURATED_LAKE_CTES},
{_layout_ctes('g0', 'lake0', None)},
off1 AS (SELECT shard, max(shard_pos) + 1 AS o FROM g0l GROUP BY shard),
{_layout_ctes('g1', 'day1_kept', 'off1')},
off2 AS (
  SELECT shard, max(shard_pos) + 1 AS o
  FROM (SELECT shard, shard_pos FROM g0l
        UNION ALL SELECT shard, shard_pos FROM g1l)
  GROUP BY shard
),
{_layout_ctes('g2', 'day2_kept', 'off2')}
SELECT doc_id, shard, shard_pos FROM g2l
"""


def _q_dup_clusters(spark, sf_dir):
    # deterministic chain edges (doc, doc+1) within each 10-block's first
    # 5 docs — components of diameter 4 exercise transitive propagation
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id as doc_a, doc_id + 1 as doc_b from documents
    where doc_id % 10 < 4
      and doc_id + 1 <= (select max(doc_id) from documents) as chain_pairs;
    run documents as DupClusters.`` where pairsTable="chain_pairs"
        and idCol="doc_id" as clustered;
    select doc_id, cluster_id, keep from clustered as output;
    """)


_DUP_CLUSTERS_ORACLE = """
WITH RECURSIVE sym AS (
  SELECT doc_id AS a, doc_id + 1 AS b FROM documents
  WHERE doc_id % 10 < 4
    AND doc_id + 1 <= (SELECT max(doc_id) FROM documents)
  UNION ALL
  SELECT doc_id + 1, doc_id FROM documents
  WHERE doc_id % 10 < 4
    AND doc_id + 1 <= (SELECT max(doc_id) FROM documents)
),
conn(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT c.a, s.b FROM conn c JOIN sym s ON c.b = s.a
)
SELECT d.doc_id,
       least(d.doc_id, coalesce(min(c.b), d.doc_id)) AS cluster_id,
       least(d.doc_id, coalesce(min(c.b), d.doc_id)) = d.doc_id AS keep
FROM documents d LEFT JOIN conn c ON c.a = d.doc_id
GROUP BY d.doc_id
"""


def _q_data_constraints(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as DataConstraints.`` where rules='''{{
      "notNull": ["doc_id", "text"],
      "unique": ["doc_id"],
      "min": {{"doc_id": 0}},
      "max": {{"doc_id": 1000000000}}
    }}''' as output;
    """)


_DATA_CONSTRAINTS_ORACLE = """
SELECT 'notNull' AS rule, 'doc_id' AS column,
       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS violations,
       sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) = 0 AS passed
FROM documents
UNION ALL
SELECT 'notNull', 'text',
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) = 0
FROM documents
UNION ALL
SELECT 'unique', 'doc_id',
       CAST(count(doc_id) - count(DISTINCT doc_id) AS BIGINT),
       count(doc_id) = count(DISTINCT doc_id)
FROM documents
UNION ALL
SELECT 'min', 'doc_id',
       CAST(sum(CASE WHEN doc_id < 0 THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN doc_id < 0 THEN 1 ELSE 0 END) = 0
FROM documents
UNION ALL
SELECT 'max', 'doc_id',
       CAST(sum(CASE WHEN doc_id > 1000000000 THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN doc_id > 1000000000 THEN 1 ELSE 0 END) = 0
FROM documents
"""


def _register_media_gens(spark):
    """Deterministic REAL-media generators (PNG with zlib IDAT + CRCs,
    PCM RIFF/WAVE): the oracle predicts the dimensions from doc_id, so a
    hash match proves the encode→container-parse round trip, not stub
    arithmetic (round-1 verdict item #5)."""
    from pyspark.sql import functions as F
    from streamingpro_spark.functions.codecs import (make_avi_encoder,
                                                     make_png_encoder,
                                                     make_wav_encoder)
    enc_png = make_png_encoder()
    enc_wav = make_wav_encoder()
    enc_avi = make_avi_encoder()

    @F.pandas_udf("binary")
    def gen_png(w: pd.Series, h: pd.Series) -> pd.Series:
        return pd.Series([enc_png(int(a), int(b)) for a, b in zip(w, h)])

    @F.pandas_udf("binary")
    def gen_wav(sr: pd.Series, n: pd.Series) -> pd.Series:
        return pd.Series([enc_wav(int(a), int(b)) for a, b in zip(sr, n)])

    @F.pandas_udf("binary")
    def gen_avi(w: pd.Series, h: pd.Series, fps: pd.Series,
                n: pd.Series) -> pd.Series:
        return pd.Series([enc_avi(int(a), int(b), float(f), int(c))
                          for a, b, f, c in zip(w, h, fps, n)])

    from streamingpro_spark.functions.codecs import (make_gif_encoder,
                                                     make_jpeg_encoder,
                                                     make_mp4_encoder)
    enc_mp4 = make_mp4_encoder()
    enc_gif = make_gif_encoder()
    enc_jpg = make_jpeg_encoder()

    @F.pandas_udf("binary")
    def gen_gif(w: pd.Series, h: pd.Series) -> pd.Series:
        return pd.Series([enc_gif(int(a), int(b)) for a, b in zip(w, h)])

    @F.pandas_udf("binary")
    def gen_jpeg(w: pd.Series, h: pd.Series, mode: pd.Series) -> pd.Series:
        # mode 0: baseline 4:2:0 · 1: spectral-selection progressive ·
        # 2: successive-approximation progressive (SOF2, Al-split scans)
        def one(a, b, m):
            px = [[((x + y) % 256, (2 * x) % 256, (3 * y) % 256)
                   for x in range(int(a))] for y in range(int(b))]
            if int(m) == 1:
                return enc_jpg(px, progressive=True)
            if int(m) == 2:
                return enc_jpg(px, successive=True)
            return enc_jpg(px, subsample=True)
        return pd.Series([one(a, b, m) for a, b, m in zip(w, h, mode)])

    @F.pandas_udf("binary")
    def gen_mp4(w: pd.Series, h: pd.Series, fps: pd.Series,
                n: pd.Series) -> pd.Series:
        return pd.Series([enc_mp4(int(a), int(b), float(f), int(c))
                          for a, b, f, c in zip(w, h, fps, n)])

    @F.pandas_udf("binary")
    def gen_avi_frames(doc_id: pd.Series) -> pd.Series:
        # nf ∈ {3,5,7,9} (odd → numFrames=3 sample positions are exact
        # integers); frame j is a real PNG whose dimensions derive from
        # (doc_id, j) so the oracle can predict the SAMPLED frame's
        # size.  Container alternates by parity — even doc_ids get a
        # RIFF/AVI movi list, odd doc_ids an ISO-BMFF/MP4 with genuine
        # stsz/stsc/stco tables + mdat — so one oracle proves BOTH
        # demux paths return the true stored payloads.
        def one(d):
            d = int(d)
            nf = 2 * (d % 4) + 3
            frames = [enc_png((d + j) % 16 + 4, j % 8 + 2)
                      for j in range(nf)]
            fps = 10.0 * 2 ** (d % 3)
            if d % 2 == 0:
                return enc_avi(16, 16, fps, nf, frames=frames)
            return enc_mp4(16, 16, fps, nf, frames=frames)
        return pd.Series([one(d) for d in doc_id])

    from streamingpro_spark.functions.codecs import make_rgb_png_encoder
    enc_rgb = make_rgb_png_encoder()

    @F.pandas_udf("binary")
    def gen_phash_png(doc_id: pd.Series) -> pd.Series:
        # 16x16 image whose 2x2 cells render the bits of a per-group
        # 64-bit pattern (group = doc_id % 50) as bright/dark pixels,
        # plus a brightness shift that varies WITHIN the group — the
        # files are byte-distinct but aHash-identical, so the oracle
        # can predict the exact phash value AND the survivor set
        def one(d):
            d = int(d)
            pat = (d % 50) * 2654435761 + 99991
            shift = ((d // 50) % 3) * 8
            rows = []
            for y in range(16):
                r = []
                for x in range(16):
                    i = (y // 2) * 8 + (x // 2)
                    v = (200 if (pat >> i) & 1 else 64) + shift
                    r.append((v, v, v))
                rows.append(r)
            return enc_rgb(rows)
        return pd.Series([one(d) for d in doc_id])

    @F.pandas_udf("binary")
    def gen_tone(doc_id: pd.Series) -> pd.Series:
        # 8 kHz / 2048-sample sine whose frequency class (doc_id % 6)
        # lands firmly inside a distinct log band of the default
        # AudioFingerprint grid, re-levelled WITHIN the class by gain —
        # byte-distinct files, identical spectral-peak fingerprint
        freqs = [126.0, 300.0, 500.0, 1250.0, 2000.0, 3000.0]
        def one(d):
            d = int(d)
            return enc_wav(8000, 2048, freq=freqs[d % 6],
                           gain=0.3 + (d // 6 % 3) * 0.2)
        return pd.Series([one(d) for d in doc_id])

    spark.udf.register("gen_tone", gen_tone)
    spark.udf.register("gen_phash_png", gen_phash_png)
    spark.udf.register("gen_png", gen_png)
    spark.udf.register("gen_wav", gen_wav)
    spark.udf.register("gen_avi", gen_avi)
    spark.udf.register("gen_mp4", gen_mp4)
    spark.udf.register("gen_gif", gen_gif)
    spark.udf.register("gen_jpeg", gen_jpeg)
    spark.udf.register("gen_avi_frames", gen_avi_frames)



def _loads_documents_par(spark, sf_dir: str) -> str:
    """Load `documents` and spread it across the cluster BEFORE the
    per-row media-generation UDFs run: the sf parquet is one small file
    (one input partition), and without this the EXPENSIVE python encode
    (gen_jpeg ~4ms/row) serializes onto a single core while the
    downstream operator's own ensure_parallelism only parallelizes the
    decode.  At 100 TB the scan yields many partitions and this exchange
    carries only doc ids — negligible either way."""
    n = spark.sparkContext.defaultParallelism
    return (f"load parquet.`{sf_dir}/documents.parquet` as documents;\n"
            f"run documents as TableRepartition.`` where "
            f'partitionNum="{n}" as documents_par;')

def _q_image_metadata(spark, sf_dir):
    # REAL decode: generate a genuine PNG per document (width/height
    # derived from doc_id), then parse its IHDR back out
    eng = _engine(spark)
    _register_media_gens(spark)
    return eng.execute(f"""
    {_loads_documents_par(spark, sf_dir)}
    select doc_id, gen_png(doc_id % 64 + 1, doc_id % 48 + 1) as content
    from documents_par as bin_docs;
    run bin_docs as ImageMetadata.`` as m_out;
    select doc_id, image_meta.width as width, image_meta.height as height,
           image_meta.channels as channels, image_meta.format as format
    from m_out as output;
    """)


_IMAGE_METADATA_ORACLE = """
SELECT doc_id,
       CAST(doc_id % 64 + 1 AS INT) AS width,
       CAST(doc_id % 48 + 1 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       'png' AS format
FROM documents
"""


def _q_audio_features(spark, sf_dir):
    # REAL decode: generate a genuine PCM WAV per document (sample rate /
    # sample count derived from doc_id), then parse fmt + data chunks
    eng = _engine(spark)
    _register_media_gens(spark)
    return eng.execute(f"""
    {_loads_documents_par(spark, sf_dir)}
    select doc_id, gen_wav((doc_id % 3 + 1) * 8000, doc_id % 200 + 20)
           as content from documents_par as bin_docs;
    run bin_docs as AudioFeatures.`` as a_out;
    select doc_id, audio_meta.sample_rate as sample_rate,
           audio_meta.channels as channels,
           audio_meta.bits_per_sample as bits_per_sample,
           audio_meta.n_samples as n_samples,
           audio_meta.duration_ms as duration_ms,
           audio_meta.format as format
    from a_out as output;
    """)


_AUDIO_FEATURES_ORACLE = """
SELECT doc_id,
       CAST((doc_id % 3 + 1) * 8000 AS INT) AS sample_rate,
       CAST(1 AS INT) AS channels,
       CAST(16 AS INT) AS bits_per_sample,
       CAST(doc_id % 200 + 20 AS BIGINT) AS n_samples,
       CAST((doc_id % 200 + 20) * 1000 // ((doc_id % 3 + 1) * 8000) AS BIGINT)
         AS duration_ms,
       'wav' AS format
FROM documents
"""


def _q_image_resize(spark, sf_dir):
    # REAL pixel round trip across ALL FOUR decodable formats: each
    # document gets a genuine PNG, GIF (LZW) or JPEG by doc_id % 3 —
    # and the JPEG third itself cycles baseline 4:2:0 / spectral-
    # selection progressive / successive-approximation progressive by
    # doc_id % 9 // 3; ImageResize fully decodes the pixels, resamples,
    # re-encodes PNG, and the oracle predicts the parsed dimensions of
    # the re-encoded output — a hash match proves every codec path
    # produced a genuine image
    eng = _engine(spark)
    _register_media_gens(spark)
    return eng.execute(f"""
    {_loads_documents_par(spark, sf_dir)}
    select doc_id,
           case when doc_id % 3 = 0
                then gen_png(doc_id % 64 + 8, doc_id % 48 + 8)
                when doc_id % 3 = 1
                then gen_gif(doc_id % 64 + 8, doc_id % 48 + 8)
                else gen_jpeg(doc_id % 64 + 8, doc_id % 48 + 8,
                              doc_id % 9 div 3)
           end as content
    from documents_par as rz_in;
    run rz_in as ImageResize.`` where width="12" and height="9" as rz_out;
    select doc_id, resized as content from rz_out as rz_bin;
    run rz_bin as ImageMetadata.`` as rz_meta;
    select doc_id, image_meta.width as width, image_meta.height as height,
           image_meta.format as format
    from rz_meta as output;
    """)


_IMAGE_RESIZE_ORACLE = """
SELECT doc_id,
       CAST(12 AS INT) AS width,
       CAST(9 AS INT) AS height,
       'png' AS format
FROM documents
"""


def _q_video_metadata(spark, sf_dir):
    # REAL decode, BOTH container families: even doc_ids get a genuine
    # RIFF/AVI (avih header), odd doc_ids a genuine ISO-BMFF/MP4 box
    # tree (mvhd/tkhd/mdhd/stsz) — header fields derived from doc_id,
    # parsed back out.  fps values {10,20,40} keep 1e6/fps an exact
    # integer so the round-trip is bit-exact against the oracle, and
    # duration_ms is the same arithmetic for both containers.
    eng = _engine(spark)
    _register_media_gens(spark)
    return eng.execute(f"""
    {_loads_documents_par(spark, sf_dir)}
    select doc_id,
           case when doc_id % 2 = 0
                then gen_avi(doc_id % 320 + 16, doc_id % 240 + 16,
                             10.0 * power(2, doc_id % 3),
                             doc_id % 100 + 10)
                else gen_mp4(doc_id % 320 + 16, doc_id % 240 + 16,
                             10.0 * power(2, doc_id % 3),
                             doc_id % 100 + 10)
           end as content
    from documents_par as vid_docs;
    run vid_docs as VideoMetadata.`` as v_out;
    select doc_id, video_meta.width as width, video_meta.height as height,
           video_meta.fps as fps, video_meta.n_frames as n_frames,
           video_meta.duration_ms as duration_ms,
           video_meta.format as format
    from v_out as output;
    """)


_VIDEO_METADATA_ORACLE = """
SELECT doc_id,
       CAST(doc_id % 320 + 16 AS INT) AS width,
       CAST(doc_id % 240 + 16 AS INT) AS height,
       CAST(10 * POWER(2, doc_id % 3) AS DOUBLE) AS fps,
       CAST(doc_id % 100 + 10 AS BIGINT) AS n_frames,
       CAST((doc_id % 100 + 10)
            * CAST(1000000 / (10 * POWER(2, doc_id % 3)) AS BIGINT)
            // 1000 AS BIGINT) AS duration_ms,
       CASE WHEN doc_id % 2 = 0 THEN 'avi' ELSE 'mp4' END AS format
FROM documents
"""


def _q_frame_sample(spark, sf_dir):
    # REAL demux round trip over BOTH container families: per document,
    # build an AVI movi list (even doc_ids) or an MP4 with genuine
    # stsz/stsc/stco sample tables + mdat (odd doc_ids) carrying nf
    # genuine PNG frames (nf and each frame's dimensions derived from
    # doc_id), FrameSample 3 of them, then ImageMetadata-parse the
    # DEMUXED frame bytes — the oracle predicts the sampled frame's PNG
    # dimensions, so a hash match proves frame_bytes is the true stored
    # payload at the right position in either container, not a byte
    # slice.
    eng = _engine(spark)
    _register_media_gens(spark)
    return eng.execute(f"""
    {_loads_documents_par(spark, sf_dir)}
    select doc_id, gen_avi_frames(doc_id) as content
    from documents_par as fs_in;
    run fs_in as FrameSample.`` where numFrames="3" as fs_out;
    select doc_id, frame_index, source_frame, frame_time_ms,
           frame_bytes as content from fs_out as fs_bin;
    run fs_bin as ImageMetadata.`` as fs_meta;
    select doc_id, frame_index, source_frame, frame_time_ms,
           image_meta.width as frame_w, image_meta.height as frame_h,
           image_meta.format as format
    from fs_meta as output;
    """)


# nf = 2*(doc_id%4)+3 frames; sampled source_frame = i*(nf-1)/2 =
# i*(doc_id%4+1); fps = 10*2^(doc_id%3) → 1000/fps ∈ {100,50,25} exact;
# frame j is a PNG of ((doc_id+j)%16+4) × (j%8+2)
_FRAME_SAMPLE_ORACLE = """
SELECT d.doc_id,
       CAST(t.i AS INT) AS frame_index,
       CAST(t.i * (d.doc_id % 4 + 1) AS BIGINT) AS source_frame,
       CAST(t.i * (d.doc_id % 4 + 1)
            * CAST(1000 / (10 * POWER(2, d.doc_id % 3)) AS BIGINT)
            AS BIGINT) AS frame_time_ms,
       CAST((d.doc_id + t.i * (d.doc_id % 4 + 1)) % 16 + 4 AS INT)
         AS frame_w,
       CAST(t.i * (d.doc_id % 4 + 1) % 8 + 2 AS INT) AS frame_h,
       'png' AS format
FROM documents d, (VALUES (0), (1), (2)) t(i)
"""


def _q_image_phash_dedup(spark, sf_dir):
    # Perceptual image dedup, fully oracle-predicted: each document's
    # PNG renders a per-group 64-bit pattern as 2x2 bright/dark cells
    # with a WITHIN-group brightness shift (byte-distinct files), so
    # aHash must reproduce the pattern bits exactly — the oracle pins
    # both the surviving doc_ids (min per group) and the exact phash
    # value, proving decode → luma → block-mean → threshold end to end
    # and the brightness invariance that byte-level dedup lacks.
    eng = _engine(spark)
    _register_media_gens(spark)
    return eng.execute(f"""
    {_loads_documents_par(spark, sf_dir)}
    select doc_id, gen_phash_png(doc_id) as content
    from documents_par as ph_in;
    run ph_in as ImageDedup.`` where idCol="doc_id" as ph_out;
    select doc_id, phash from ph_out as output;
    """)


_IMAGE_PHASH_DEDUP_ORACLE = """
SELECT doc_id,
       CAST(doc_id * 2654435761 + 99991 AS BIGINT) AS phash
FROM documents
WHERE doc_id < 50
"""


def _q_image_dedup_pairs(spark, sf_dir):
    # Banded-Hamming path over the same fixture: maxHamming=2 splits
    # the hash into 3 bands, bucket-joins, and verifies bit_count(xor);
    # every same-group pair (including cross-brightness ones) must come
    # back at distance 0 and nothing else may appear.
    eng = _engine(spark)
    _register_media_gens(spark)
    return eng.execute(f"""
    {_loads_documents_par(spark, sf_dir)}
    select doc_id, gen_phash_png(doc_id) as content
    from documents_par as phb_in;
    run phb_in as ImageDedup.`` where idCol="doc_id" and maxHamming="2"
    as phb_out;
    select id_a, id_b, hamming from phb_out as output;
    """)


_IMAGE_DEDUP_PAIRS_ORACLE = """
SELECT d1.doc_id AS id_a, d2.doc_id AS id_b, CAST(0 AS INT) AS hamming
FROM documents d1
JOIN documents d2
  ON d1.doc_id % 50 = d2.doc_id % 50 AND d1.doc_id < d2.doc_id
"""


def _q_audio_fingerprint_dedup(spark, sf_dir):
    # Spectral-peak audio dedup, fully oracle-predicted: each document
    # is a real 16-bit PCM sine whose frequency class (doc_id % 6) sits
    # in a distinct log band, re-levelled within the class by gain
    # (byte-distinct files) — AudioFingerprint must land the peak in
    # the same band for every gain, so the oracle pins both the exact
    # 64-bit fingerprint (one-hot peak band per segment) and the
    # HashDedup survivor set, proving the PCM decode → rfft → band
    # fold → argmax chain end to end plus the gain invariance.
    eng = _engine(spark)
    _register_media_gens(spark)
    return eng.execute(f"""
    {_loads_documents_par(spark, sf_dir)}
    select doc_id, gen_tone(doc_id) as content from documents_par as af_in;
    run af_in as AudioFingerprint.`` as af_fp;
    select doc_id, afp from af_fp as af_slim;
    run af_slim as HashDedup.`` where idCol="doc_id" and hashCol="afp"
    as af_out;
    select doc_id, afp from af_out as output;
    """)


# freq class -> peak band b in {0,2,3,5,6,7}; afp = 0x0101010101010101
# * 2^b (one-hot per 8-bit segment lane), two's-complement for b=7
_AUDIO_FP_DEDUP_ORACLE = """
SELECT doc_id,
       CAST(CASE CAST(doc_id % 6 AS INT)
         WHEN 0 THEN 72340172838076673
         WHEN 1 THEN 289360691352306692
         WHEN 2 THEN 578721382704613384
         WHEN 3 THEN 2314885530818453536
         WHEN 4 THEN 4629771061636907072
         ELSE -9187201950435737472 END AS BIGINT) AS afp
FROM documents
WHERE doc_id < 6
"""


def _q_url_filter(spark, sf_dir):
    # RefinedWeb URL curation: URLs synthesized from doc_id arithmetic
    # (scheme / host / keyword / extension / fragment variants), the ET
    # parses + flags them, and the oracle recomputes every parsed
    # column and flag from the same arithmetic — host lowering, www
    # stripping, subdomain blocklist matching, keyword and extension
    # flags, normalization, and the final keep conjunction.
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id,
           concat(case when doc_id % 7 = 0 then 'ftp' else 'https' end,
                  '://',
                  case cast(doc_id % 5 as int)
                    when 0 then 'www.good.com'
                    when 1 then 'blog.example.org'
                    when 2 then 'ads.tracker.net'
                    when 3 then 'sub.ads.tracker.net'
                    else 'News.GOOD.com' end,
                  case when doc_id % 11 = 0 then '/casino' else '' end,
                  '/p', cast(doc_id as string),
                  case when doc_id % 3 = 0 then '.css' else '.html' end,
                  case when doc_id % 2 = 1 then '#sec' else '' end)
           as url
    from documents as uf_in;
    run uf_in as UrlFilter.`` where blockedDomains="tracker.net"
      and blockedKeywords="casino" and blockedExtensions="css" as uf_out;
    select doc_id, url, url_host, url_domain, url_normalized,
           bad_scheme, blocked_domain, blocked_keyword,
           blocked_extension, keep
    from uf_out as output;
    """)


_URL_FILTER_ORACLE = r"""
WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN 'ftp' ELSE 'https' END AS sch,
         CASE CAST(doc_id % 5 AS INT)
           WHEN 0 THEN 'www.good.com'
           WHEN 1 THEN 'blog.example.org'
           WHEN 2 THEN 'ads.tracker.net'
           WHEN 3 THEN 'sub.ads.tracker.net'
           ELSE 'News.GOOD.com' END AS hostp,
         CASE WHEN doc_id % 11 = 0 THEN '/casino' ELSE '' END
           || '/p' || CAST(doc_id AS VARCHAR)
           || CASE WHEN doc_id % 3 = 0 THEN '.css' ELSE '.html' END AS pth,
         CASE WHEN doc_id % 2 = 1 THEN '#sec' ELSE '' END AS frag
  FROM documents)
SELECT doc_id,
       sch || '://' || hostp || pth || frag AS url,
       LOWER(hostp) AS url_host,
       REGEXP_REPLACE(LOWER(hostp), '^www\.', '') AS url_domain,
       REGEXP_REPLACE(LOWER(hostp), '^www\.', '') || pth
         AS url_normalized,
       doc_id % 7 = 0 AS bad_scheme,
       CAST(doc_id % 5 AS INT) IN (2, 3) AS blocked_domain,
       doc_id % 11 = 0 AS blocked_keyword,
       doc_id % 3 = 0 AS blocked_extension,
       doc_id % 7 <> 0 AND CAST(doc_id % 5 AS INT) NOT IN (2, 3)
         AND doc_id % 11 <> 0 AND doc_id % 3 <> 0 AS keep
FROM u
"""


def _q_versioned_parquet(spark, sf_dir):
    """versionedParquet time travel (writes to a temp lake): overwrite
    + two appends, then per-version snapshot counts.  The snapshot
    cardinalities are pure functions of the doc_id mod-3 splits, so
    the oracle predicts them exactly (round-8: upgraded from a
    rows-only check)."""
    import tempfile
    lake = tempfile.mkdtemp(prefix="spk_vplake_") + "/docs"
    eng = _engine(spark)
    eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id, lang from documents where doc_id % 3 = 0 as vp0;
    save overwrite vp0 as versionedParquet.`{lake}`;
    select doc_id, lang from documents where doc_id % 3 = 1 as vp1;
    save append vp1 as versionedParquet.`{lake}`;
    select doc_id, lang from documents where doc_id % 3 = 2 as vp2;
    save append vp2 as versionedParquet.`{lake}`;
    """)
    return eng.execute(f"""
    load versionedParquet.`{lake}` where versionAsOf="0" as s0;
    load versionedParquet.`{lake}` where versionAsOf="1" as s1;
    load versionedParquet.`{lake}` as s2;
    select 0L as version, count(*) as n from s0 as c0;
    select 1L as version, count(*) as n from s1 as c1;
    select 2L as version, count(*) as n from s2 as c2;
    select * from c0 union all select * from c1 union all select * from c2
    order by version as output;
    """)


def _q_warc_parse(spark, sf_dir):
    """WARC source (sources/registry.py `warc` loader): documents
    serialized into a REAL gzipped member-per-record WARC file (the
    Common Crawl layout, functions/warc.py), loaded back through
    `load warc.` — the oracle predicts every header field from the
    documents table, so a hash match proves the container round trip,
    not stub arithmetic."""
    import os
    import tempfile
    from streamingpro_spark.functions.warc import make_warc_encoder
    eng = _engine(spark)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .filter("text is not null").collect())
    recs = [("conversion", f"http://corpus.local/{r['doc_id']}",
             "2026-01-01T00:00:00Z", r["text"].encode("utf-8"))
            for r in docs]
    tmp = tempfile.mkdtemp(prefix="spk_warc_")
    with open(os.path.join(tmp, "corpus.warc.gz"), "wb") as fh:
        fh.write(make_warc_encoder()(recs, gzip_compress=True))
    return eng.execute(f"""
    load warc.`{tmp}/corpus.warc.gz` as pages;
    select target_uri, record_type, content_length, text from pages
    as output;
    """)


_VERSIONED_TT_ORACLE = """
SELECT CAST(0 AS BIGINT) AS version,
       CAST(count(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT) AS n
FROM documents
UNION ALL
SELECT 1, count(*) FILTER (WHERE doc_id % 3 IN (0, 1)) FROM documents
UNION ALL
SELECT 2, count(*) FROM documents
"""


_WARC_PARSE_ORACLE = """
SELECT 'http://corpus.local/' || CAST(doc_id AS VARCHAR) AS target_uri,
       'conversion' AS record_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
       text
FROM documents WHERE text IS NOT NULL
"""


def _q_warc_sink_roundtrip(spark, sf_dir):
    """warc SINK → SOURCE round trip (sources/registry.py _save_warc):
    documents exported as member-per-record .warc.gz archives (one per
    partition, record-by-record encode) and loaded back; the oracle
    predicts every header field and payload from the documents table,
    so a hash match proves the sink writes standards-shaped archives
    the loader (and any WARC consumer) can read."""
    import tempfile
    eng = _engine(spark)
    out = tempfile.mkdtemp(prefix="spk_warcsink_")
    eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id, text,
           concat('http://corpus.local/', doc_id) as target_uri
    from documents where text is not null as wet_rows;
    save overwrite wet_rows as warc.`{out}`
    options warcDate="2026-01-01T00:00:00Z";
    """)
    return eng.execute(f"""
    load warc.`{out}/*.warc.gz` as sink_pages;
    select target_uri, record_type, warc_date, content_length, text
    from sink_pages as output;
    """)


_WARC_SINK_ORACLE = """
SELECT 'http://corpus.local/' || CAST(doc_id AS VARCHAR) AS target_uri,
       'conversion' AS record_type,
       '2026-01-01T00:00:00Z' AS warc_date,
       CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
       text
FROM documents WHERE text IS NOT NULL
"""


#: deterministic inflation for the warc bench fixture: every document
#: text repeated x32 (~10 KB/record, ~50 MB decoded at sf0.1) so the
#: DuckDB oracle can predict every byte with repeat()
_WARC_BENCH_REPEAT = 32
_WARC_BENCH_SHARDS = 8


def _q_warc_bench(spark, sf_dir):
    """Bench-scale WARC parse (VERDICT r5 ask #8): a ~50 MB synthetic
    crawl — documents' texts inflated x{repeat} and sharded across
    {shards} member-per-record .warc.gz archives (1 file = 1 task, the
    crawl parallelism unit) — aggregated to prove the streaming split
    end-to-end.  The fixture is cached per sf_dir (built on first
    call; best-of-N bench samples then time the PARSE, not the
    build).  The oracle predicts n_records and every content_length
    byte from the documents table."""
    import os
    import tempfile
    from streamingpro_spark.functions.warc import make_warc_encoder
    eng = _engine(spark)
    # cache key = sf tag + a fingerprint of the source parquet, so a
    # regenerated documents table (or a different root with the same
    # basename) rebuilds instead of parsing a stale crawl that no
    # longer matches the oracle
    tag = os.path.basename(os.path.normpath(sf_dir))
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    fp = f"{st.st_size:x}{int(st.st_mtime):x}"
    d = os.path.join(tempfile.gettempdir(), f"spk_warcbench_{tag}_{fp}")
    marker = os.path.join(d, "_built")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text").filter("text is not null")
                .collect())
        enc = make_warc_encoder()
        shards = [[] for _ in range(_WARC_BENCH_SHARDS)]
        for r in docs:
            payload = ((r["text"] + "\n")
                       * _WARC_BENCH_REPEAT).encode("utf-8")
            shards[r["doc_id"] % _WARC_BENCH_SHARDS].append(
                ("conversion", f"http://corpus.local/{r['doc_id']}",
                 "2026-01-01T00:00:00Z", payload))
        for i, recs in enumerate(shards):
            with open(os.path.join(d, f"part{i}.warc.gz"), "wb") as fh:
                fh.write(enc(recs, gzip_compress=True))
        with open(marker, "w") as fh:
            fh.write("ok")
    return eng.execute(f"""
    load warc.`{d}/*.warc.gz` as warc_bench_pages;
    select count(*) as n_records,
           sum(content_length) as total_bytes,
           min(content_length) as min_len,
           max(content_length) as max_len
    from warc_bench_pages as output;
    """)


_WARC_BENCH_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(octet_length(encode(repeat(text || chr(10), 32))))
            AS BIGINT) AS total_bytes,
       CAST(MIN(octet_length(encode(repeat(text || chr(10), 32))))
            AS BIGINT) AS min_len,
       CAST(MAX(octet_length(encode(repeat(text || chr(10), 32))))
            AS BIGINT) AS max_len
FROM documents WHERE text IS NOT NULL
"""


def _q_bloom_dedup(spark, sf_dir):
    """BloomFilterDedup filter mode (operators/dedup.py): incremental
    dedup of an 'increment' slice of documents against a 'history'
    slice — JVM bloom build (groupBy-word bit_or), broadcast-bitmap
    Arrow probe, exact verify join on bloom-positive rows only.
    filter-mode output is EXACT, so it hash-matches NOT EXISTS."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id, text from documents where doc_id % 3 <> 0 as bref;
    select doc_id, text from documents where doc_id % 2 = 0 as bnew;
    run bnew as BloomFilterDedup.`` where refTable="bref" as bout;
    select doc_id from bout as output;
    """)


_BLOOM_DEDUP_ORACLE = """
SELECT n.doc_id
FROM (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0) n
WHERE NOT EXISTS (
  SELECT 1 FROM (SELECT text FROM documents WHERE doc_id % 3 <> 0) r
  WHERE r.text = n.text)
"""


def _q_stateful_count_stream(spark, sf_dir):
    """StatefulCount (applyInPandasWithState, streaming/stateful.py:25)
    replayed over the events fixture as a REAL Structured Streaming
    job: engine streamParquet source → stateful ET → memory sink →
    drain.  Update-mode emits the running state per batch, so the
    final state per key is max(events) — integer-exact against the
    batch GROUP BY oracle (a full hash check on custom stateful
    streaming, not just rows-only)."""
    import tempfile
    import uuid
    tag = uuid.uuid4().hex[:8]
    eng = _engine(spark)
    eng.execute(f"""
    set streamName = "scq_{tag}";
    load streamParquet.`{sf_dir}/events.parquet` as sev_{tag};
    run sev_{tag} as StatefulCount.`` where keyCol="user_id"
    as counted_{tag};
    """)
    df = spark.table(f"counted_{tag}")
    q = (df.writeStream.format("memory").queryName(f"sc_sink_{tag}")
         .outputMode("update")
         .option("checkpointLocation", tempfile.mkdtemp()).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"""
    select key as user_id, max(events) as events
    from sc_sink_{tag} group by key
    """)


_STATEFUL_COUNT_ORACLE = """
SELECT user_id, count(*) AS events FROM events GROUP BY user_id
"""


def _q_stateful_sessionizer_stream(spark, sf_dir):
    """StreamingSessionizer (event-time state timeout,
    streaming/stateful.py:64) over a 3-batch replay of the events
    fixture: batch 1 is the real data, batches 2-3 are far-future
    sentinel events (key -1) whose only job is to advance the
    watermark so every real session closes and emits — first via the
    watermark pass, stragglers via the EventTimeTimeout sweep.  The
    emitted (key, start, end, n) rows hash-match the batch
    gaps-and-islands oracle at the same 1800s gap."""
    import os
    import tempfile
    import time as _time
    import uuid
    from pyspark.sql import functions as F
    tag = uuid.uuid4().hex[:8]
    gap = 1800
    eng = _engine(spark)
    tmp = tempfile.mkdtemp(prefix="spk_sess_")
    data_dir = os.path.join(tmp, "stream_in")
    eng.execute(f"""
    {_loads(sf_dir, 'events')}
    select user_id, timestamp_seconds(unix_timestamp(ts)) as ts
    from events as sess_src_{tag};
    """)
    base = spark.table(f"sess_src_{tag}")
    key_t = base.schema["user_id"].dataType.simpleString()
    base.coalesce(1).write.mode("overwrite").parquet(data_dir)
    gmax = base.agg(
        F.max(F.unix_timestamp("ts")).alias("m")).collect()[0]["m"]
    for off in (gap + 10, 2 * gap + 20):
        _time.sleep(0.1)         # distinct mtimes → stable batch order
        spark.sql(f"""
        select cast(-1 as {key_t}) as user_id,
               timestamp_seconds({gmax + off}) as ts
        """).write.mode("append").parquet(data_dir)
    eng.execute(f"""
    set streamName = "ssq_{tag}";
    load streamParquet.`{data_dir}` where eventTimeCol="ts"
    and delayThreshold="0 seconds" and maxFilesPerTrigger="1"
    as sstream_{tag};
    run sstream_{tag} as StreamingSessionizer.`` where keyCol="user_id"
    and tsCol="ts" and gap="{gap}" as sessions_{tag};
    """)
    df = spark.table(f"sessions_{tag}")
    q = (df.writeStream.format("memory").queryName(f"ss_sink_{tag}")
         .outputMode("append")
         .option("checkpointLocation", tempfile.mkdtemp()).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # typed sentinel comparison: `key >= 0` would numeric-coerce a
    # STRING key column and silently null-filter non-numeric ids
    return spark.sql(f"""
    select key as user_id, session_start as sess_start,
           session_end as sess_end, n_events
    from ss_sink_{tag} where key <> cast(-1 as {key_t})
    """)


def _q_streaming_dedup_stream(spark, sf_dir):
    """StreamingDedup (streaming/stateful.py:156) replayed over the
    events fixture: streaming dropDuplicates keeps the FIRST arrival
    per key, so projecting only the dedup keys makes the output the
    exact DISTINCT key set — hash-matched against the batch oracle."""
    import tempfile
    import uuid
    tag = uuid.uuid4().hex[:8]
    eng = _engine(spark)
    eng.execute(f"""
    set streamName = "sdq_{tag}";
    load streamParquet.`{sf_dir}/events.parquet` as dev_{tag};
    run dev_{tag} as StreamingDedup.`` where
    dedupCols="user_id,event_type" as dd_{tag};
    """)
    df = spark.table(f"dd_{tag}").select("user_id", "event_type")
    q = (df.writeStream.format("memory").queryName(f"sd_sink_{tag}")
         .option("checkpointLocation", tempfile.mkdtemp()).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"select user_id, event_type from sd_sink_{tag}")


_STREAMING_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
"""


_STATEFUL_SESSIONIZER_ORACLE = """
with base as (
  select user_id, CAST(floor(epoch(ts)) AS BIGINT) as tss from events
),
marked as (
  -- > split matches the sessionizer's `diff <= gap merges` island rule
  select user_id, tss,
         case when lag(tss) over w is null or tss - lag(tss) over w > 1800
              then 1 else 0 end as ns
  from base window w as (partition by user_id order by tss)
),
sess as (
  select user_id, tss,
         sum(ns) over (partition by user_id order by tss
                       rows unbounded preceding) as sid
  from marked
)
select user_id, CAST(min(tss) AS BIGINT) as sess_start,
       CAST(max(tss) AS BIGINT) as sess_end,
       count(*) as n_events
from sess group by user_id, sid
"""


def _q_tree(spark, sf_dir):
    """TreeBuildExt over a supplier→nation hierarchy built from the star
    schema (synthetic parent edges: nation parent region-root)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'nation', 'region')}
    select n_nationkey + 100 as id, n_regionkey as parentId from nation
    union all
    select r_regionkey as id, -1 as parentId from region as edges;
    run edges as TreeBuildExt.`` where idCol="id" and parentIdCol="parentId" as output;
    """)


_TREE_ORACLE = """
WITH edges AS (
  SELECT n_nationkey + 100 AS id, n_regionkey AS parentId FROM nation
  UNION ALL
  SELECT r_regionkey AS id, -1 AS parentId FROM region
)
SELECT CAST(id AS BIGINT) AS id,
       CAST(CASE WHEN parentId = -1 THEN 1 ELSE 2 END AS INT) AS level
FROM edges
"""


# ---------------------------------------------------------------------------
# TPC-H-style breadth: semi/anti joins, correlated subqueries, multi-way
# joins, grouping sets/cube, named windows, scalar functions.  Identical
# ANSI SQL runs on both engines.
# ---------------------------------------------------------------------------

_Q4 = """
select o_orderpriority, count(*) as order_count
from orders
where o_orderdate >= timestamp '1996-01-01 00:00:00'
  and o_orderdate < timestamp '1997-01-01 00:00:00'
  and exists (select 1 from lineitem
              where l_orderkey = o_orderkey and l_shipdate > o_orderdate)
group by o_orderpriority
"""

_Q6 = """
select round(sum(l_extendedprice * l_discount), 2) as revenue,
       count(*) as n_items
from lineitem
where l_shipdate >= timestamp '1996-01-01 00:00:00'
  and l_shipdate < timestamp '1997-01-01 00:00:00'
  and l_discount between 0.05 and 0.07 and l_quantity < 24
"""

_Q7 = """
select supp_nation, cust_nation, l_year, round(sum(volume), 2) as revenue
from (
  select n1.n_name as supp_nation, n2.n_name as cust_nation,
         year(l.l_shipdate) as l_year,
         l.l_extendedprice * (1 - l.l_discount) as volume
  from supplier s
  join lineitem l on s.s_suppkey = l.l_suppkey
  join orders o on o.o_orderkey = l.l_orderkey
  join customer c on c.c_custkey = o.o_custkey
  join nation n1 on s.s_nationkey = n1.n_nationkey
  join nation n2 on c.c_nationkey = n2.n_nationkey
  where n1.n_name in ('NATION_1', 'NATION_2')
    and n2.n_name in ('NATION_1', 'NATION_2')
    and n1.n_name <> n2.n_name
) shipping
group by supp_nation, cust_nation, l_year
"""

_Q8 = """
select o_year,
       round(sum(case when nation = 'NATION_5' then volume else 0 end)
             / sum(volume), 4) as mkt_share
from (
  select year(o.o_orderdate) as o_year,
         l.l_extendedprice * (1 - l.l_discount) as volume,
         n2.n_name as nation
  from part p
  join lineitem l on p.p_partkey = l.l_partkey
  join orders o on l.l_orderkey = o.o_orderkey
  join customer c on o.o_custkey = c.c_custkey
  join nation n1 on c.c_nationkey = n1.n_nationkey
  join region r on n1.n_regionkey = r.r_regionkey
  join supplier s on l.l_suppkey = s.s_suppkey
  join nation n2 on s.s_nationkey = n2.n_nationkey
  where r.r_name = 'ASIA' and p.p_type = 'PROMO'
) all_nations
group by o_year
"""

_Q10 = """
select c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as revenue,
       round(c.c_acctbal, 2) as acctbal, n.n_name
from customer c
join orders o on c.c_custkey = o.o_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
join nation n on c.c_nationkey = n.n_nationkey
where l.l_returnflag = 'R'
group by c.c_custkey, c.c_name, c.c_acctbal, n.n_name
order by revenue desc, c_custkey
limit 20
"""

_Q14 = """
select round(100.00 * sum(case when p_type = 'PROMO'
                               then l_extendedprice * (1 - l_discount)
                               else 0 end)
             / sum(l_extendedprice * (1 - l_discount)), 4) as promo_revenue
from lineitem join part on l_partkey = p_partkey
where l_shipdate >= timestamp '1996-01-01 00:00:00'
  and l_shipdate < timestamp '1996-02-01 00:00:00'
"""

_Q17 = """
select round(sum(l_extendedprice) / 7.0, 2) as avg_yearly
from lineitem, part
where p_partkey = l_partkey and p_brand = 'Brand#11'
  and l_quantity < (select 0.5 * avg(l_quantity)
                    from lineitem l2 where l2.l_partkey = p_partkey)
"""

_Q18 = """
select c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) as totalprice,
       round(sum(l_quantity), 2) as sum_qty
from customer
join orders on c_custkey = o_custkey
join lineitem on o_orderkey = l_orderkey
where o_orderkey in (select l_orderkey from lineitem
                     group by l_orderkey having sum(l_quantity) > 250)
group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
order by totalprice desc, o_orderkey
limit 100
"""

_Q22 = """
select c_nationkey, count(*) as numcust, round(sum(c_acctbal), 2) as totacctbal
from customer
where c_acctbal > (select avg(c_acctbal) from customer where c_acctbal > 0)
  and not exists (select 1 from orders
                  where o_custkey = c_custkey and o_orderpriority = '1-URGENT')
group by c_nationkey
"""

_Q13 = """
select c_count, count(*) as custdist
from (
  select c.c_custkey, count(o.o_orderkey) as c_count
  from customer c left outer join orders o
    on c.c_custkey = o.o_custkey and o.o_orderpriority <> '1-URGENT'
  group by c.c_custkey
) c_orders
group by c_count
order by custdist desc, c_count desc
"""

_Q9 = """
select nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) as sum_profit
from (
  select n.n_name as nation, year(o.o_orderdate) as o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount)
              - 0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(18, 4)) as amount
  from part p
  join lineitem l on p.p_partkey = l.l_partkey
  join supplier s on s.s_suppkey = l.l_suppkey
  join orders o on o.o_orderkey = l.l_orderkey
  join nation n on s.s_nationkey = n.n_nationkey
  where p.p_name like '%gear%'
) profit
group by nation, o_year
"""

# q12 adapted: no l_shipmode/commitdate/receiptdate in fixtures — lateness is
# l_shipdate > o_orderdate + 60 days, bucketed by ship year (same CASE-priority
# split shape as TPC-H q12). BIGINT casts: duckdb sum(case) yields HUGEINT.
_Q12 = """
select year(l_shipdate) as ship_year,
       cast(sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                     then 1 else 0 end) as bigint) as high_line_count,
       cast(sum(case when o_orderpriority not in ('1-URGENT', '2-HIGH')
                     then 1 else 0 end) as bigint) as low_line_count
from orders join lineitem on o_orderkey = l_orderkey
where l_shipdate > o_orderdate + interval 60 day
group by year(l_shipdate)
order by ship_year
"""

# q15: top supplier by 3-month revenue. Decimal-exact sum so both engines
# agree on the max() equality (double summation order differs cross-engine).
_Q15 = """
with revenue as (
  select l_suppkey as supplier_no,
         sum(cast(l_extendedprice * (1 - l_discount) as decimal(18, 4))) as total_revenue
  from lineitem
  where l_shipdate >= timestamp '1996-01-01 00:00:00'
    and l_shipdate < timestamp '1996-04-01 00:00:00'
  group by l_suppkey
)
select s_suppkey, s_name, cast(total_revenue as double) as total_revenue
from supplier join revenue on s_suppkey = supplier_no
where total_revenue = (select max(total_revenue) from revenue)
order by s_suppkey
"""

# q19: disjunctive brand/size/quantity predicates (fixtures lack
# p_container/l_shipmode — p_size stands in for the container filter).
_Q19 = """
select round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
from lineitem join part on p_partkey = l_partkey
where (p_brand = 'Brand#12' and p_size between 1 and 15 and l_quantity between 1 and 20)
   or (p_brand = 'Brand#23' and p_size between 5 and 25 and l_quantity between 10 and 30)
   or (p_brand = 'Brand#34' and p_size between 10 and 40 and l_quantity between 20 and 50)
"""

# q21 adapted: "kept orders waiting" via l_shipdate > o_orderdate + 90d
# (no commit/receipt dates). Late-flag CTE keeps the EXISTS correlations
# equality-only, which both engines decorrelate.
_Q21 = """
with flagged as (
  select l_orderkey, l_suppkey,
         case when l_shipdate > o_orderdate + interval 90 day then 1 else 0 end as is_late
  from lineitem join orders on o_orderkey = l_orderkey
  where o_orderstatus = 'F'
)
select s_name, cast(count(*) as bigint) as numwait
from flagged l1 join supplier on s_suppkey = l1.l_suppkey
where l1.is_late = 1
  and exists (select 1 from flagged l2
              where l2.l_orderkey = l1.l_orderkey and l2.l_suppkey <> l1.l_suppkey)
  and not exists (select 1 from flagged l3
                  where l3.l_orderkey = l1.l_orderkey and l3.l_suppkey <> l1.l_suppkey
                    and l3.is_late = 1)
group by s_name
order by numwait desc, s_name
limit 100
"""

# q2 adapted: no partsupp — "min cost supplier per part" becomes min
# l_extendedprice over lineitem (correlated scalar-min subquery, same shape).
# Equality compares stored doubles (no arithmetic) so it is cross-engine exact.
_Q2 = """
select distinct round(s_acctbal, 2) as acctbal, s_name, n_name, p_partkey, p_name
from part, supplier, lineitem, nation
where p_partkey = l_partkey and s_suppkey = l_suppkey
  and p_size = 30 and s_nationkey = n_nationkey
  and l_extendedprice = (select min(l2.l_extendedprice)
                         from lineitem l2 where l2.l_partkey = p_partkey)
order by acctbal desc, n_name, s_name, p_partkey
limit 100
"""

# q11 adapted: no partsupp — part "stock value" is sum(price*qty) per part for
# one nation's suppliers, HAVING above 2× the average part value (scalar
# subqueries).  The relative threshold stays non-degenerate at every SF
# (a fixed fraction-of-total returned 0 rows at sf0.1); decimal per-row
# cast + integer-only multiplications keep the compare exact cross-engine.
_Q11 = """
select l_partkey,
       cast(sum(cast(l_extendedprice * l_quantity as decimal(18, 2))) as double) as part_value
from lineitem
join supplier on s_suppkey = l_suppkey
join nation on s_nationkey = n_nationkey
where n_name = 'NATION_7'
group by l_partkey
having sum(cast(l_extendedprice * l_quantity as decimal(18, 2))) * (
  select count(distinct l_partkey)
  from lineitem
  join supplier on s_suppkey = l_suppkey
  join nation on s_nationkey = n_nationkey
  where n_name = 'NATION_7') > 2 * (
  select sum(cast(l_extendedprice * l_quantity as decimal(18, 2)))
  from lineitem
  join supplier on s_suppkey = l_suppkey
  join nation on s_nationkey = n_nationkey
  where n_name = 'NATION_7')
order by part_value desc, l_partkey
"""

# bag-semantics set ops (INTERSECT ALL keeps min-multiplicity, EXCEPT ALL
# subtracts multiplicities — distinct-variant set ops are a separate query)
_SETOPS_ALL = """
with f as (select o_orderpriority as v from orders where o_orderstatus = 'F'),
     o as (select o_orderpriority as v from orders where o_orderstatus = 'O')
select 'intersect_all' as op, v, cast(count(*) as bigint) as n
from (select v from f intersect all select v from o) t1 group by v
union all
select 'except_all' as op, v, cast(count(*) as bigint) as n
from (select v from f except all select v from o) t2 group by v
order by op, v
"""

# interval RANGE frame over a timestamp ordering (sliding 1h lookback)
_INTERVAL_RANGE_FRAME = """
select event_id,
       cast(count(*) over (partition by user_id order by ts
         range between interval 1 hour preceding and current row) as bigint)
         as n_last_hour
from events
order by event_id
"""

# correlated LATERAL subquery in FROM (per-nation top balance)
_LATERAL = """
select n.n_name, l.top_bal
from nation n, lateral (
  select round(max(c_acctbal), 2) as top_bal from customer c
  where c.c_nationkey = n.n_nationkey) l
order by n.n_name
"""

# classic wordcount over documents: explode (lateral view surface) + agg.
# Deterministic cut: full (freq desc, token asc) order before the limit.
_WORDCOUNT_SPARK = """
select token, cast(count(*) as bigint) as freq
from (select explode(split(lower(text), '\\\\s+')) as token from documents)
where token <> ''
group by token
order by freq desc, token
limit 20
"""

_WORDCOUNT_DUCK = """
select token, cast(count(*) as bigint) as freq
from (select unnest(string_split_regex(lower(text), '\\s+')) as token
      from documents)
where token <> ''
group by token
order by freq desc, token
limit 20
"""

# exact linear-interpolation percentiles (Spark percentile == DuckDB
# quantile_cont); round(4) absorbs the ~1e-15 interpolation fp noise
_PERCENTILES_SPARK = """
select o_orderstatus,
       round(percentile(o_totalprice, 0.5), 4) as p50,
       round(percentile(o_totalprice, 0.9), 4) as p90,
       round(percentile(o_totalprice, 0.99), 4) as p99
from orders
group by o_orderstatus
order by o_orderstatus
"""

_PERCENTILES_DUCK = """
select o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) as p50,
       round(quantile_cont(o_totalprice, 0.9), 4) as p90,
       round(quantile_cont(o_totalprice, 0.99), 4) as p99
from orders
group by o_orderstatus
order by o_orderstatus
"""

# q16 adapted: supplier-count per part attribute over lineitem (no partsupp),
# NOT IN over a supplier sub-select (6 negative-acctbal suppliers in fixtures).
_Q16 = """
select p_brand, p_type, p_size,
       cast(count(distinct l_suppkey) as bigint) as supplier_cnt
from lineitem join part on p_partkey = l_partkey
where p_brand <> 'Brand#5'
  and p_type not like 'PROMO%'
  and p_size in (1, 4, 7, 10)
  and l_suppkey not in (select s_suppkey from supplier where s_acctbal < 0)
group by p_brand, p_type, p_size
order by supplier_cnt desc, p_brand, p_type, p_size
"""

_STRING_FNS_BODY = """
select o_orderkey,
       lower(o_orderpriority) as lo,
       trim(concat('  ', o_orderstatus, ' ')) as trimmed,
       lpad(o_orderstatus, 5, '.') as padded,
       reverse(o_orderpriority) as rev,
       replace(o_orderpriority, '-', '_') as repl,
       substr(o_orderpriority, 3) as tail3,
       {strpos}(o_orderpriority, 'O') as pos_o
from orders where o_orderkey % 13 = 0
"""
_STRING_FNS_SPARK = _STRING_FNS_BODY.format(strpos="instr")
_STRING_FNS_DUCK = _STRING_FNS_BODY.format(strpos="strpos")

# array-agg result joined to a string: the harness's value hash
# stringifies arrays engine-specifically, so compare the joined form
_ARRAY_AGG_SPARK = """
select o_custkey,
       concat_ws(',', sort_array(collect_list(o_orderstatus))) as statuses,
       count(*) as n
from orders where o_custkey % 25 = 0 group by o_custkey
"""

_ARRAY_AGG_DUCK = """
select o_custkey,
       array_to_string(list_sort(list(o_orderstatus)), ',') as statuses,
       count(*) as n
from orders where o_custkey % 25 = 0 group by o_custkey
"""

_RANGE_FRAME = """
select o_orderkey, o_custkey,
       CAST(count(*) over (partition by o_custkey order by o_totalprice
            range between 1000.0 preceding and current row) AS BIGINT)
         as near_cheaper
from orders
"""

_Q20 = """
select s.s_name, round(s.s_acctbal, 2) as acctbal
from supplier s
where s.s_suppkey in (
  select l_suppkey from lineitem join part on p_partkey = l_partkey
  where p_type = 'PROMO'
  group by l_suppkey
  having sum(l_quantity) > (
    select 1.1 * avg(total) from (
      select sum(l_quantity) as total
      from lineitem join part on p_partkey = l_partkey
      where p_type = 'PROMO'
      group by l_suppkey
    ) t
  )
)
order by s.s_name
"""

_GROUPING_SETS = """
select coalesce(o_orderstatus, 'ALL') as status,
       coalesce(o_orderpriority, 'ALL') as priority,
       count(*) as n_orders, round(sum(o_totalprice), 2) as total
from orders
group by grouping sets ((o_orderstatus), (o_orderpriority), ())
"""

_CUBE = """
select coalesce(l_returnflag, 'ALL') as rf, coalesce(l_linestatus, 'ALL') as ls,
       count(*) as n, round(sum(l_quantity), 2) as qty
from lineitem
group by cube(l_returnflag, l_linestatus)
"""

_LEAD_LAG = """
select o_custkey, o_orderkey,
       round(o_totalprice - lag(o_totalprice) over w, 2) as delta_prev,
       round(lead(o_totalprice) over w, 2) as next_price,
       ntile(4) over (order by o_totalprice, o_orderkey) as price_quartile
from orders
window w as (partition by o_custkey order by o_orderdate, o_orderkey)
"""

_SCALAR_FNS = """
select o_orderkey,
       upper(substr(o_orderpriority, 1, 3)) as pri3,
       length(o_orderstatus) as st_len,
       concat(o_orderstatus, '-', o_orderpriority) as tag,
       year(o_orderdate) as yr, month(o_orderdate) as mo,
       round(sqrt(o_totalprice), 4) as sq,
       round(ln(o_totalprice + 1), 4) as lnp,
       abs(o_custkey % 7) as bucket7
from orders where o_orderkey % 7 = 0
"""


# ---------------------------------------------------------------------------
# ET operators paired with SQL oracles (feature engineering + table utils)
# ---------------------------------------------------------------------------

def _q_scaler(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'customer')}
    run customer as ScalerInPlace.`` where inputCols="c_acctbal"
        and scaleMethod="min-max" as scaled;
    select c_custkey, round(c_acctbal, 4) as acctbal_scaled from scaled as output;
    """)


_SCALER_ORACLE = """
select c_custkey, round((c_acctbal - mn) / (mx - mn), 4) as acctbal_scaled
from customer,
     (select min(c_acctbal) as mn, max(c_acctbal) as mx from customer) s
"""


def _q_discretizer(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'orders')}
    run orders as Discretizer.`` where method="bucketizer" and
        inputCol="o_totalprice" and splits="1000,5000,20000" as bucketed;
    select o_orderkey, o_totalprice_bucket from bucketed as output;
    """)


_DISCRETIZER_ORACLE = """
select o_orderkey,
       CAST(case when o_totalprice < 1000 then 0
                 when o_totalprice < 5000 then 1
                 when o_totalprice < 20000 then 2
                 else 3 end AS DOUBLE) as o_totalprice_bucket
from orders
"""


def _q_string_index(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'customer')}
    run customer as StringIndex.`` where inputCol="c_mktsegment" as idxed;
    select c_custkey, c_mktsegment, c_mktsegment_idx from idxed as output;
    """)


# StringIndexer frequencyDesc: rank by (count desc, label asc), 0-based
_STRING_INDEX_ORACLE = """
with f as (select c_mktsegment, count(*) as n from customer group by c_mktsegment),
idx as (select c_mktsegment,
               CAST(row_number() over (order by n desc, c_mktsegment) - 1
                    AS DOUBLE) as c_mktsegment_idx
        from f)
select c.c_custkey, c.c_mktsegment, i.c_mktsegment_idx
from customer c join idx i on c.c_mktsegment = i.c_mktsegment
"""


def _q_confusion(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'orders')}
    run orders as ConfusionMatrix.`` where actualCol="o_orderstatus"
        and predictCol="o_orderpriority" as output;
    """)


_CONFUSION_ORACLE = """
select o_orderstatus,
       CAST(sum(case when o_orderpriority = '1-URGENT' then 1 else 0 end) AS BIGINT) as "1-URGENT",
       CAST(sum(case when o_orderpriority = '2-HIGH' then 1 else 0 end) AS BIGINT) as "2-HIGH",
       CAST(sum(case when o_orderpriority = '3-MEDIUM' then 1 else 0 end) AS BIGINT) as "3-MEDIUM",
       CAST(sum(case when o_orderpriority = '4-NOT SPECIFIED' then 1 else 0 end) AS BIGINT) as "4-NOT SPECIFIED",
       CAST(sum(case when o_orderpriority = '5-LOW' then 1 else 0 end) AS BIGINT) as "5-LOW"
from orders group by o_orderstatus
"""


def _q_rate_sampler(spark, sf_dir):
    """Stratified split: WHICH rows land in each split is seeded-random,
    but the exact per-label counts are deterministic (exact slicing)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as RateSampler.`` where labelCol="lang"
        and sampleRate="0.8,0.2" as split_docs;
    select lang, __split__, count(*) as n_rows from split_docs
    group by lang, __split__ as output;
    """)


_RATE_SAMPLER_ORACLE = """
with c as (select lang, count(*) as n from documents group by lang)
select lang, CAST(0 AS INT) as __split__, CAST(floor(n * 0.8) AS BIGINT) as n_rows from c
union all
select lang, CAST(1 AS INT) as __split__, CAST(n - floor(n * 0.8) AS BIGINT) as n_rows from c
"""


def _q_auto_increment(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'customer')}
    run customer as AutoIncrementKeyExt.`` where dense="true" and idCol="rid" as with_id;
    select count(*) as n, min(rid) as mn, max(rid) as mx from with_id as output;
    """)


_AUTO_INCREMENT_ORACLE = """
select count(*) as n, CAST(0 AS INT) as mn, CAST(count(*) - 1 AS INT) as mx
from customer
"""


def _q_vector_ops(spark, sf_dir):
    """Built-in vec_* UDF library (reference Functions.scala:69-300)
    against DuckDB list algebra."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    select vec_id,
           round(vec_norm(vec_dense(embedding), 2), 4) as l2,
           vec_argmax(vec_dense(embedding)) as amax,
           round(vec_mean(vec_dense(embedding)), 4) as vmean,
           round(vec_sqdist(vec_dense(embedding),
                            vec_inplace_add(vec_dense(embedding), 1.0)), 4) as sqdist_ones
    from embeddings as output;
    """)


_VECTOR_OPS_ORACLE = """
with v as (select vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) as e
           from embeddings)
select vec_id,
       round(sqrt(list_sum(list_transform(e, x -> x * x))), 4) as l2,
       CAST(list_position(e, list_max(e)) - 1 AS INT) as amax,
       round(list_avg(e), 4) as vmean,
       round(CAST(len(e) AS DOUBLE), 4) as sqdist_ones
from v
"""


def _q_time_functions(spark, sf_dir):
    """Built-in time/misc UDF library (reference Functions.scala:434-537)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'orders')}
    select o_orderkey,
           parseDateAsLong(date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss')) as epoch_s,
           timePlus(parseDateAsLong(date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss')),
                    '1 day') as plus_day,
           byteStringAsBytes(concat(cast(o_orderkey % 10 as string), 'mb')) as nbytes,
           crawler_md5(o_orderstatus) as st_md5
    from orders where o_orderkey % 11 = 0 as output;
    """)


_TIME_FUNCTIONS_ORACLE = """
select o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) as epoch_s,
       CAST(epoch(o_orderdate) + 86400 AS BIGINT) as plus_day,
       CAST((o_orderkey % 10) * 1048576 AS BIGINT) as nbytes,
       md5(o_orderstatus) as st_md5
from orders where o_orderkey % 11 = 0
"""


def _q_array_functions(spark, sf_dir):
    """Built-in array UDF library (reference Functions.scala:303-427)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id,
           mkString('-', slice(split(lower(text), '\\\\s+'), 1, 3)) as first3,
           size(ngram(split(lower(text), '\\\\s+'), 2)) as n_bigrams,
           array_index(split(lower(text), '\\\\s+'), 'the') as the_pos
    from documents as output;
    """)


_ARRAY_FUNCTIONS_ORACLE = """
with t as (select doc_id, string_split_regex(lower(text), '\\s+') as toks
           from documents)
select doc_id,
       array_to_string(list_slice(toks, 1, 3), '-') as first3,
       CAST(greatest(len(toks) - 1, 0) AS INT) as n_bigrams,
       CAST(coalesce(list_position(toks, 'the'), 0) - 1 AS INT) as the_pos
from t
"""


def _q_normalize(spark, sf_dir):
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'lineitem')}
    run lineitem as NormalizeInPlace.`` where inputCols="l_quantity,l_tax"
        and p="2" as normed;
    select l_orderkey, l_linenumber, round(l_quantity, 4) as qn,
           round(l_tax, 4) as tn
    from normed as output;
    """)


_NORMALIZE_ORACLE = """
select l_orderkey, l_linenumber,
       round(l_quantity / sqrt(l_quantity * l_quantity + l_tax * l_tax), 4) as qn,
       round(l_tax / sqrt(l_quantity * l_quantity + l_tax * l_tax), 4) as tn
from lineitem
"""


def _q_map_lookup(spark, sf_dir):
    """MapValues train→register→lookup round-trip vs a SQL join oracle."""
    import tempfile
    path = tempfile.mkdtemp(prefix="spk_mv_")
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'nation', 'customer')}
    select cast(n_nationkey as string) as k, n_name as v from nation
    union all select '__missing__' as k, 'UNKNOWN' as v as dict_t;
    train dict_t as MapValues.`{path}/mv` where inputCol="k" and outputCol="v"
        and mapMissingTo="__missing__";
    register MapValues.`{path}/mv` as nation_name;
    select c_custkey, nation_name(cast(c_nationkey as string)) as nname
    from customer as output;
    """)


_MAP_LOOKUP_ORACLE = """
select c_custkey, coalesce(n_name, 'UNKNOWN') as nname
from customer left join nation on c_nationkey = n_nationkey
"""


# Non-SQL-expressible ops (iterative / model-based): queries() entries
# WITHOUT oracle_sql — the driver records the weaker rows-only check.

def _q_approx_distinct(spark, sf_dir):
    """HLL / quantile-sketch aggregates, hash-matched via an accuracy
    bound (round-8: upgraded from rows-only).  Sketch values are
    implementation-specific across engines BY DESIGN, so the contract
    is the exact value plus a tolerance flag: approx_count_distinct
    (rsd=0.02) within 5% of the exact distinct count, and
    approx_percentile(0.5) inside the exact p40..p60 band.  Round 11
    (retiring the literal-TRUE self-certification): the oracle now
    computes the SAME flags over DuckDB's own sketches
    (approx_count_distinct HLL, approx_quantile t-digest) — both
    engines' sketches must independently satisfy the shared published
    accuracy bound, so this is a genuine cross-engine replay of the
    CONTRACT (verified to hold at sf0.001/0.01/0.1); only the sketch
    values themselves remain engine-specific, as they must be."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'lineitem')}
    select l_returnflag,
           count(distinct l_partkey) as exact_parts,
           (abs(approx_count_distinct(l_partkey, 0.02)
                - count(distinct l_partkey))
              <= 0.05 * count(distinct l_partkey)) as acd_ok,
           (approx_percentile(l_extendedprice, 0.5)
              between percentile(l_extendedprice, 0.40)
                  and percentile(l_extendedprice, 0.60)) as median_ok
    from lineitem group by l_returnflag order by l_returnflag as output;
    """)


_APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       (abs(approx_count_distinct(l_partkey)
            - count(DISTINCT l_partkey))
          <= 0.05 * count(DISTINCT l_partkey)) AS acd_ok,
       (approx_quantile(l_extendedprice, 0.5)
          BETWEEN quantile_cont(l_extendedprice, 0.40)
              AND quantile_cont(l_extendedprice, 0.60)) AS median_ok
FROM lineitem GROUP BY l_returnflag
"""


def _q_pagerank(spark, sf_dir):
    """PageRank over the nation→region membership graph.  maxIter is
    pinned at 5, so the oracle replays the exact iteration — rank_0=1,
    rank_{t+1} = 0.15 + 0.85·Σ rank_t/outdeg over in-edges — as five
    unrolled DuckDB CTEs (round-8: upgraded from a rows-only check)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'nation')}
    select cast(n_nationkey + 100 as long) as src,
           cast(n_regionkey as long) as dst from nation as edges;
    run edges as PageRank.`` where maxIter="5" as output;
    """)


def _pagerank_oracle(iters: int = 5, d: float = 0.85) -> str:
    """Fixed-iteration DuckDB replay of operators/ml_algs.py PageRank:
    identical init (1.0), damping, dangling handling (vertices with no
    in-edges hold 1-d; out-edge-less vertices contribute nothing)."""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""pr{i} AS (
  SELECT v.id, {1 - d} + {d} * coalesce(c.s, 0.0) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, sum(p.rank / o.outdeg) AS s
    FROM edges e
    JOIN pr{i - 1} p ON p.id = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) c ON c.id = v.id
)""")
    return f"""
WITH edges AS (
  SELECT CAST(n_nationkey + 100 AS BIGINT) AS src,
         CAST(n_regionkey AS BIGINT) AS dst FROM nation
),
verts AS (
  SELECT DISTINCT src AS id FROM edges
  UNION
  SELECT DISTINCT dst FROM edges
),
outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
pr0 AS (SELECT id, 1.0 AS rank FROM verts),
{', '.join(steps)}
SELECT id, round(rank, 6) AS pagerank FROM pr{iters}
"""


def _q_lsh_similarity(spark, sf_dir):
    """SRP-LSH bucketed cosine search, hash-matched via a recall bound
    (round-8: upgraded from rows-only).  The approximate result set has
    no exact oracle BY DESIGN, so the contract is recall@5 against the
    exact brute-force SimilaritySearch computed in the SAME script:
    per-query |LSH top-5 ∩ exact top-5| / 5, aggregated.  The oracle
    emits the query count (derivable from the table) and literal TRUE
    bounds — an LSH recall regression flips a flag and fails the hash.
    Banding (16 tables × 4 bits) is sized for this corpus's similarity
    level (near-orthogonal synthetic embeddings, top-1 cosine ≈ 0.3 —
    8×8 banding collides such neighbors only ~12% of the time).  Bounds
    (mean ≥ 0.75, min ≥ 0.40) sit under the measured seed-42 recall at
    sf0.001/0.01/0.1 (mean 0.95/0.92/0.91, min 0.60 at all three),
    which is deterministic per input.

    Round-10: the EXACT side is no longer Spark-vs-Spark — each row
    carries the per-query exact top-5 neighbor set (rank-ordered csv),
    which the oracle recomputes with DuckDB's own list arithmetic, so
    a correlated bug in the engine's cosine math now fails the value
    hash instead of passing both sides of the recall."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    run embeddings as LSHSimilaritySearch.`` where k="5" and numTables="16"
        and bitsPerTable="4" and queryFilter="vec_id < 20" as lsh_hits;
    run embeddings as SimilaritySearch.`` where k="5" and
        queryFilter="vec_id < 20" as exact_hits;
    select e.query_id as query_id,
           count(l.neighbor_id) / 5.0 as recall
    from exact_hits e left join lsh_hits l
      on l.query_id = e.query_id and l.neighbor_id = e.neighbor_id
    group by e.query_id as per_query;
    select query_id,
           array_join(transform(array_sort(collect_list(
               struct(rank, neighbor_id))),
               s -> cast(s.neighbor_id as string)), ',') as exact_top5
    from exact_hits group by query_id as exact_sets;
    select (avg(recall) >= 0.75) as mean_ok from per_query as mean_flag;
    select p.query_id as query_id, s.exact_top5 as exact_top5,
           (p.recall >= 0.40) as floor_recall_ok,
           (select mean_ok from mean_flag) as mean_recall_ok
    from per_query p join exact_sets s on p.query_id = s.query_id
    as output;
    """)


_LSH_SIMILARITY_ORACLE = f"""
SELECT query_id, exact_top5,
       TRUE AS floor_recall_ok,
       TRUE AS mean_recall_ok
FROM ({_EXACT_TOP5_CSV})
"""


def _q_ml_train_predict(spark, sf_dir):
    """ML lifecycle through the script language: train → batchPredict,
    hash-matched via an accuracy bound (round-8: upgraded from
    rows-only).  Model predictions have no cross-engine oracle BY
    DESIGN, so the contract is the exact per-label row counts plus a
    Spark-computed flag: training-set accuracy of the 10-class
    LogisticRegression >= 0.15 (chance = 0.10; measured 0.41/0.45/0.22
    at sf0.001/0.01/0.1 — the synthetic embeddings are only weakly
    label-correlated).  The oracle emits the same exact counts and a
    literal TRUE — a training/serving regression flips the flag and
    fails the value hash."""
    import tempfile
    path = tempfile.mkdtemp(prefix="spk_ml_")
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    select vec_dense(embedding) as features, cast(label as double) as label
    from embeddings as training;
    train training as LogisticRegression.`{path}/lr` where maxIter="20";
    predict training as LogisticRegression.`{path}/lr` as scored;
    select (avg(case when prediction = label then 1.0 else 0.0 end)
            >= 0.15) as flag from scored as accf;
    select cast(label as long) as label, count(*) as n_rows,
           (select flag from accf) as acc_above_chance
    from scored group by label as output;
    """)


_ML_TRAIN_PREDICT_ORACLE = """
SELECT CAST(label AS BIGINT) AS label, count(*) AS n_rows,
       TRUE AS acc_above_chance
FROM embeddings GROUP BY label
"""


def _q_kmeans(spark, sf_dir):
    """KMeans train→predict, hash-matched via cluster-quality bounds
    (round-8: upgraded from rows-only).  Cluster ids/sizes are
    seed- and implementation-specific BY DESIGN, so the contract is
    the exact point count plus Spark-computed flags: all k=4 clusters
    non-empty, and mean within-cluster squared distance to the cluster
    centroid <= 0.97 x the mean cross-cluster distance (measured
    ratio 0.885/0.894/0.922 at sf0.001/0.01/0.1 on the
    near-orthogonal synthetic embeddings).  The centroid/distance math
    is replayed in Spark SQL over the clustered output itself — the
    oracle emits the exact count and literal TRUEs."""
    import tempfile
    path = tempfile.mkdtemp(prefix="spk_km_")
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'embeddings')}
    select vec_id, embedding, vec_dense(embedding) as features
    from embeddings as km_in;
    train km_in as KMeans.`{path}/km` where k="4" and seed="42";
    predict km_in as KMeans.`{path}/km` as clustered;
    select vec_id, cast(prediction as long) as cluster,
           posexplode(embedding) as (pos, v) from clustered as km_ex;
    select cluster, pos, avg(v) as cv from km_ex
    group by cluster, pos as km_cent;
    select e.vec_id, e.cluster as pc, c.cluster as cc,
           sum((e.v - c.cv) * (e.v - c.cv)) as d2
    from km_ex e join km_cent c on e.pos = c.pos
    group by e.vec_id, e.cluster, c.cluster as km_dists;
    select count(distinct pc) as n_clusters_found,
           count(distinct vec_id) as n_points,
           (avg(case when pc = cc then d2 end)
            <= 0.97 * avg(case when pc != cc then d2 end)) as cohesion_ok
    from km_dists as output;
    """)


_KMEANS_ORACLE = """
SELECT 4 AS n_clusters_found, count(*) AS n_points, TRUE AS cohesion_ok
FROM embeddings
"""


def _q_tfidf(spark, sf_dir):
    """TfIdfInPlace feature pipeline.  The whole chain — lowercase \\s+
    RegexTokenizer (minTokenLength=1), English StopWordsRemover,
    murmur3 HashingTF counts, IDF — is replayed by the oracle
    (`_murmur3_sql` + the embedded snowball stopword list, the same
    public resource the JVM remover loads), so per-doc nonzero count
    and tf·idf mass hash-match (round-8: upgraded from a shape-only
    check)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as TfIdfInPlace.`` where inputCol="text"
        and nFeatures="8192" as featurized;
    select doc_id,
           aggregate(vec_array(text), 0L,
                     (acc, x) -> acc + if(x != 0.0d, 1L, 0L)) as nnz,
           round(aggregate(vec_array(text), 0d, (acc, x) -> acc + x), 4)
             as tfidf_sum
    from featurized as output;
    """)


#: org/apache/spark/ml/feature/stopwords/english.txt (the snowball list
#: StopWordsRemover loads; apostrophes SQL-escaped) — embedded so the
#: DuckDB oracle filters exactly the tokens the JVM remover drops
_ENGLISH_STOPWORDS_SQL = """
'i', 'me', 'my', 'myself', 'we', 'our', 'ours', 'ourselves', 'you',
'your', 'yours', 'yourself', 'yourselves', 'he', 'him', 'his',
'himself', 'she', 'her', 'hers', 'herself', 'it', 'its', 'itself',
'they', 'them', 'their', 'theirs', 'themselves', 'what', 'which',
'who', 'whom', 'this', 'that', 'these', 'those', 'am', 'is', 'are',
'was', 'were', 'be', 'been', 'being', 'have', 'has', 'had', 'having',
'do', 'does', 'did', 'doing', 'a', 'an', 'the', 'and', 'but', 'if',
'or', 'because', 'as', 'until', 'while', 'of', 'at', 'by', 'for',
'with', 'about', 'against', 'between', 'into', 'through', 'during',
'before', 'after', 'above', 'below', 'to', 'from', 'up', 'down', 'in',
'out', 'on', 'off', 'over', 'under', 'again', 'further', 'then',
'once', 'here', 'there', 'when', 'where', 'why', 'how', 'all', 'any',
'both', 'each', 'few', 'more', 'most', 'other', 'some', 'such', 'no',
'nor', 'not', 'only', 'own', 'same', 'so', 'than', 'too', 'very', 's',
't', 'can', 'will', 'just', 'don', 'should', 'now', 'i''ll',
'you''ll', 'he''ll', 'she''ll', 'we''ll', 'they''ll', 'i''d',
'you''d', 'he''d', 'she''d', 'we''d', 'they''d', 'i''m', 'you''re',
'he''s', 'she''s', 'it''s', 'we''re', 'they''re', 'i''ve', 'we''ve',
'you''ve', 'they''ve', 'isn''t', 'aren''t', 'wasn''t', 'weren''t',
'haven''t', 'hasn''t', 'hadn''t', 'don''t', 'doesn''t', 'didn''t',
'won''t', 'wouldn''t', 'shan''t', 'shouldn''t', 'mustn''t', 'can''t',
'couldn''t', 'cannot', 'could', 'here''s', 'how''s', 'let''s',
'ought', 'that''s', 'there''s', 'what''s', 'when''s', 'where''s',
'who''s', 'why''s', 'would'
"""


_TFIDF_FEATURIZE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, w
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents WHERE text IS NOT NULL)
  WHERE len(w) >= 1 AND w NOT IN ({_ENGLISH_STOPWORDS_SQL})
),
{{murmur}},
tf AS (SELECT doc_id, idx, count(*) AS tf FROM hashed GROUP BY doc_id, idx),
m AS (SELECT count(*) AS m FROM documents),
df AS (SELECT idx, count(DISTINCT doc_id) AS df FROM tf GROUP BY idx),
stats AS (
  SELECT tf.doc_id,
         count(*) FILTER (WHERE df.df < m.m) AS nnz,
         round(sum(tf.tf * ln((m.m + 1.0) / (df.df + 1.0))), 4)
           AS tfidf_sum
  FROM tf JOIN df USING (idx), m
  GROUP BY tf.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.nnz, 0) AS BIGINT) AS nnz,
       coalesce(s.tfidf_sum, 0.0) AS tfidf_sum
FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id
"""


def _q_tfidf_standalone(spark, sf_dir):
    """Standalone TfIdf algorithm (reference SQLTfIdf.scala — integer
    term ids, identity-hash TF + IDF) through train→predict.  Term ids
    come from md5 (DuckDB-reproducible), so the ORACLE replays the
    whole chain — identity-hash TF counts and Spark's IDF formula
    ln((m+1)/(df+1)) — and hash-matches per-doc nonzero count AND the
    tf·idf mass (round-8: upgraded from a rows-only check)."""
    import tempfile
    path = tempfile.mkdtemp(prefix="spk_tfidf_alg_")
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id, transform(split(text, ' '),
           w -> cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint) % 1024)
           as words
    from documents as tf_in;
    train tf_in as TfIdf.`{path}/m` where inputCol="words" and numFeatures="1024";
    predict tf_in as TfIdf.`{path}/m` as scored;
    select doc_id,
           aggregate(vec_array(tfidf), 0L,
                     (acc, x) -> acc + if(x != 0.0d, 1L, 0L)) as nnz,
           round(aggregate(vec_array(tfidf), 0d, (acc, x) -> acc + x), 4)
             as tfidf_sum
    from scored as output;
    """)


_TFIDF_ALG_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL
),
ids AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(md5(w), 1, 8)) AS BIGINT) % 1024 AS id
  FROM tok
),
tf AS (SELECT doc_id, id, count(*) AS tf FROM ids GROUP BY doc_id, id),
m AS (SELECT count(*) AS m FROM documents),
df AS (SELECT id, count(DISTINCT doc_id) AS df FROM tf GROUP BY id),
stats AS (
  SELECT tf.doc_id,
         count(*) FILTER (WHERE df.df < m.m) AS nnz,
         round(sum(tf.tf * ln((m.m + 1.0) / (df.df + 1.0))), 4) AS tfidf_sum
  FROM tf JOIN df USING (id), m
  GROUP BY tf.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.nnz, 0) AS BIGINT) AS nnz,
       coalesce(s.tfidf_sum, 0.0) AS tfidf_sum
FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id
"""


def _q_hash_tfidf(spark, sf_dir):
    """Standalone HashTfIdf algorithm (reference SQLHashTfIdf.scala —
    murmur3 HashingTF binary + IDF) through train→predict.  The oracle
    implements murmur3_x86_32(seed=42) itself, in pure DuckDB SQL
    (`_murmur3_sql`, validated byte-for-byte against the JVM-pinned
    serving implementation incl. empty strings, multibyte UTF-8, and
    every tail length), then replays binary TF + ln((m+1)/(df+1)) IDF
    — per-doc nonzero count AND idf mass hash-match (round-8: upgraded
    from a rows-only check)."""
    import tempfile
    path = tempfile.mkdtemp(prefix="spk_htfidf_alg_")
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id, split(text, ' ') as words from documents as htf_in;
    train htf_in as HashTfIdf.`{path}/m` where inputCol="words" and numFeatures="1024";
    predict htf_in as HashTfIdf.`{path}/m` as scored;
    select doc_id,
           aggregate(vec_array(tfidf), 0L,
                     (acc, x) -> acc + if(x != 0.0d, 1L, 0L)) as nnz,
           round(aggregate(vec_array(tfidf), 0d, (acc, x) -> acc + x), 4)
             as tfidf_sum
    from scored as output;
    """)


def _murmur3_sql(n: int = 1024) -> str:
    """murmur3_x86_32(seed=42) of UTF-8 term bytes, mod `n`, as DuckDB
    CTEs over a `tok(doc_id, w)` relation → `hashed(doc_id, idx)`.
    The exact algorithm of operators/ml_algs.py's JVM-pinned serving
    murmur3 (HashingTF term indexing): little-endian 4-byte blocks,
    xor-folded tail, fmix32.  All 32-bit arithmetic is emulated with
    BIGINTs — multiplies split the left operand 16/16 so no
    intermediate exceeds 2^48 (a direct 32x32 multiply would overflow
    the signed 64-bit BIGINT).  `n` must be a power of two so the
    unsigned h mod n equals Spark's nonNegativeMod of the signed hash
    (2^32 is a multiple of n); the consuming queries pin
    numFeatures=1024."""
    if n & (n - 1):
        raise ValueError("_murmur3_sql needs a power-of-two n")

    def m32mul(a: str, c: int) -> str:
        return (f"(((({a}) % 65536) * {c} + (((({a}) // 65536) * {c})"
                f" % 65536) * 65536) % 4294967296)")

    def rotl(a: str, r: int) -> str:
        lo = 2 ** (32 - r)
        return f"(((({a}) % {lo}) * {2 ** r}) + (({a}) // {lo}))"

    c1, c2 = 0xCC9E2D51, 0x1B873593

    def mixk(k: str) -> str:
        return m32mul(rotl(m32mul(k, c1), 15), c2)

    def mixh(h: str, k: str) -> str:
        h1 = f"xor({h}, {mixk(k)})"
        return f"(({rotl(h1, 13)}) * 5 + 3864292196) % 4294967296"

    block_le = ("CAST(CONCAT('0x', substr(hx, 8*b+7, 2), "
                "substr(hx, 8*b+5, 2), substr(hx, 8*b+3, 2), "
                "substr(hx, 8*b+1, 2)) AS BIGINT)")
    return f"""hx0 AS (
  SELECT doc_id, w, hex(encode(w)) AS hx,
         octet_length(encode(w)) AS nb
  FROM tok
),
blk AS (
  SELECT doc_id, w, nb,
         [{block_le} for b in generate_series(0, nb // 4 - 1)] AS ks,
         CASE nb % 4
           WHEN 0 THEN 0
           WHEN 1 THEN CAST(CONCAT('0x', substr(hx, 2*nb-1, 2)) AS BIGINT)
           WHEN 2 THEN CAST(CONCAT('0x', substr(hx, 2*nb-1, 2),
                                   substr(hx, 2*nb-3, 2)) AS BIGINT)
           ELSE CAST(CONCAT('0x', substr(hx, 2*nb-1, 2),
                            substr(hx, 2*nb-3, 2),
                            substr(hx, 2*nb-5, 2)) AS BIGINT)
         END AS kt
  FROM hx0
),
folded AS (
  SELECT doc_id, w, nb, kt,
         list_reduce(list_prepend(CAST(42 AS BIGINT), ks),
                     (h, k) -> {mixh('h', 'k')}) AS hb
  FROM blk
),
tailed AS (
  SELECT doc_id, w, nb,
         CASE WHEN kt != 0 THEN xor(hb, {mixk('kt')}) ELSE hb END AS ht
  FROM folded
),
fin1 AS (SELECT doc_id, w, xor(ht, nb) AS h FROM tailed),
fin2 AS (SELECT doc_id, w, xor(h, h // 65536) AS h FROM fin1),
fin3 AS (SELECT doc_id, w, {m32mul('h', 0x85EBCA6B)} AS h FROM fin2),
fin4 AS (SELECT doc_id, w, xor(h, h // 8192) AS h FROM fin3),
fin5 AS (SELECT doc_id, w, {m32mul('h', 0xC2B2AE35)} AS h FROM fin4),
fin6 AS (SELECT doc_id, w, xor(h, h // 65536) AS h FROM fin5),
hashed AS (SELECT doc_id, h % {n} AS idx FROM fin6)"""


_HASH_TFIDF_ALG_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL
),
{_murmur3_sql(1024)},
tf AS (SELECT DISTINCT doc_id, idx FROM hashed),
m AS (SELECT count(*) AS m FROM documents),
df AS (SELECT idx, count(DISTINCT doc_id) AS df FROM tf GROUP BY idx),
stats AS (
  SELECT tf.doc_id,
         count(*) FILTER (WHERE df.df < m.m) AS nnz,
         round(sum(ln((m.m + 1.0) / (df.df + 1.0))), 4) AS tfidf_sum
  FROM tf JOIN df USING (idx), m
  GROUP BY tf.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.nnz, 0) AS BIGINT) AS nnz,
       coalesce(s.tfidf_sum, 0.0) AS tfidf_sum
FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id
"""


def _q_repetition_score(spark, sf_dir):
    """Gopher-style repetition filter (RepetitionScore ET): per-row
    sort+fold duplicate stats over words / 2-grams / 3-grams / lines."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as RepetitionScore.`` as rep;
    select doc_id, top_word_frac, frac_dup_2grams, frac_dup_3grams,
           frac_dup_lines, keep from rep as output;
    """)


_REPETITION_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks,
         string_split(text, chr(10)) AS lines
  FROM documents
),
ws AS (
  SELECT doc_id, max(c) AS best_w
  FROM (SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS w FROM t)
        GROUP BY doc_id, w)
  GROUP BY doc_id
),
g2s AS (
  SELECT doc_id, coalesce(sum(c) FILTER (WHERE c > 1), 0) AS dups
  FROM (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id,
                     unnest([toks[i] || ' ' || toks[i+1]
                             for i in generate_series(1, len(toks)-1)]) AS g
              FROM t)
        GROUP BY doc_id, g)
  GROUP BY doc_id
),
g3s AS (
  SELECT doc_id, coalesce(sum(c) FILTER (WHERE c > 1), 0) AS dups
  FROM (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id,
                     unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                             for i in generate_series(1, len(toks)-2)]) AS g
              FROM t)
        GROUP BY doc_id, g)
  GROUP BY doc_id
),
ls AS (
  SELECT doc_id, coalesce(sum(c) FILTER (WHERE c > 1), 0) AS dups
  FROM (SELECT doc_id, l, count(*) AS c
        FROM (SELECT doc_id, unnest(lines) AS l FROM t)
        GROUP BY doc_id, l)
  GROUP BY doc_id
),
m AS (
  SELECT t.doc_id,
         round(ws.best_w * 1.0 / greatest(len(t.toks), 1), 4)
           AS top_word_frac,
         round(coalesce(g2s.dups, 0) * 1.0
               / greatest(greatest(len(t.toks) - 1, 0), 1), 4)
           AS frac_dup_2grams,
         round(coalesce(g3s.dups, 0) * 1.0
               / greatest(greatest(len(t.toks) - 2, 0), 1), 4)
           AS frac_dup_3grams,
         round(coalesce(ls.dups, 0) * 1.0 / greatest(len(t.lines), 1), 4)
           AS frac_dup_lines
  FROM t
  LEFT JOIN ws USING (doc_id)
  LEFT JOIN g2s USING (doc_id)
  LEFT JOIN g3s USING (doc_id)
  LEFT JOIN ls USING (doc_id)
)
SELECT doc_id, top_word_frac, frac_dup_2grams, frac_dup_3grams,
       frac_dup_lines,
       (top_word_frac <= 0.3 AND frac_dup_2grams <= 0.4
        AND frac_dup_3grams <= 0.4 AND frac_dup_lines <= 0.3) AS keep
FROM m
"""


def _q_ngram_lm_score(spark, sf_dir):
    """Bigram-LM quality score trained on the corpus itself
    (NgramLMScore ET — the CCNet-style perplexity filter)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as NgramLMScore.`` where vocabSize="200" and addK="0.1"
        as output;
    """)


_NGRAM_LM_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
),
ex AS (
  SELECT doc_id, unnest(toks) AS w,
         unnest(generate_series(1, len(toks))) AS pos
  FROM t
),
uni AS (SELECT w, count(*) AS c FROM ex GROUP BY w),
vocab AS (SELECT w, c FROM uni ORDER BY c DESC, w LIMIT 200),
vstats AS (SELECT CAST(sum(c) AS BIGINT) AS vsum, count(*) AS vn FROM vocab),
tstats AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM uni),
cnt_w AS (
  SELECT w, c FROM vocab
  UNION ALL
  SELECT '<unk>', total - vsum FROM vstats, tstats
),
vp AS (SELECT vn + 1 AS vp FROM vstats),
m AS (
  SELECT ex.doc_id, ex.pos,
         CASE WHEN v.w IS NOT NULL THEN ex.w ELSE '<unk>' END AS wm
  FROM ex LEFT JOIN vocab v ON ex.w = v.w
),
bi AS (
  SELECT doc_id, wm,
         lead(wm) OVER (PARTITION BY doc_id ORDER BY pos) AS wm2
  FROM m
  QUALIFY wm2 IS NOT NULL
),
cbg AS (SELECT wm, wm2, count(*) AS c12 FROM bi GROUP BY wm, wm2),
sc AS (
  SELECT bi.doc_id,
         -ln((cbg.c12 + 0.1) / (cw.c + 0.1 * vp.vp)) AS nll
  FROM bi
  JOIN cnt_w cw ON bi.wm = cw.w
  JOIN cbg ON bi.wm = cbg.wm AND bi.wm2 = cbg.wm2
  CROSS JOIN vp
),
per AS (
  SELECT doc_id, count(*) AS n_bigrams, round(avg(nll), 4) AS lm_score
  FROM sc GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       per.lm_score
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
"""


def _q_stratified_sample(spark, sf_dir):
    """Deterministic hash sampling per source stratum (data mixing)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as StratifiedSampleExt.`` where strataCol="source"
        and defaultFraction="0.25" and ratio.src0="0.75"
        and ratio.src1="0.5" as sampled;
    select source, count(*) as n_kept, min(doc_id) as first_id
    from sampled group by source as output;
    """)


_STRATIFIED_ORACLE = f"""
SELECT source, count(*) AS n_kept, min(doc_id) AS first_id
FROM documents
WHERE {_PHASH_DUCK.format(payload="'strat:' || CAST(doc_id AS VARCHAR)")}
      % 1000000
      < CASE source WHEN 'src0' THEN 750000
                    WHEN 'src1' THEN 500000
                    ELSE 250000 END
GROUP BY source
"""


def _q_sequence_pack(spark, sf_dir):
    """Token-budget sequence packing, chunk mode (concat-and-cut) —
    pure window cumsum per hash bucket."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as SequencePack.`` where budget="512" and numBuckets="8"
        and mode="chunk" as output;
    """)


_SEQUENCE_PACK_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         {_PHASH_DUCK.format(payload="'pack:' || CAST(doc_id AS VARCHAR)")}
           % 8 AS bucket,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         w -> w <> '')) AS n_tokens
  FROM documents
),
w AS (
  SELECT doc_id, bucket, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM b
)
SELECT doc_id, bucket, CAST(n_tokens AS INT) AS n_tokens,
       cum - n_tokens AS start_offset,
       CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS seq_first,
       CAST(floor((cum - 1) / 512) AS BIGINT) AS seq_last
FROM w
"""


def _q_data_mixing(spark, sf_dir):
    """Mixture planner (DataMixing ET): per-stratum sampling fractions
    that hit target token weights without upsampling."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as DataMixing.`` where strataCol="source"
        and weight.src0="0.5" and weight.src1="0.3" and weight.src2="0.2"
        as output;
    """)


_DATA_MIXING_ORACLE = """
WITH c AS (
  SELECT source AS stratum, count(*) AS n_docs,
         CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  w -> w <> ''))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2))
    wv(stratum, target_weight)
),
t AS (
  SELECT min(c.n_tokens / w.target_weight) AS cap
  FROM c JOIN w USING (stratum)
)
SELECT c.stratum, c.n_docs, c.n_tokens,
       coalesce(w.target_weight, 0.0) AS target_weight,
       round(coalesce(w.target_weight * t.cap / c.n_tokens, 0.0), 4)
         AS sample_fraction
FROM c LEFT JOIN w USING (stratum) CROSS JOIN t
"""


def _q_data_mixing_epochs(spark, sf_dir):
    """DataMixing with maxEpochs="3" (round-8): scarce strata may
    repeat up to 3 passes, so the achievable total is capped by
    min(n_tokens*3/weight) and fractions can exceed 1 (epochs).  Pure
    |strata|-row plan math — the oracle replays it exactly."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as DataMixing.`` where strataCol="source"
        and weight.src0="0.6" and weight.src1="0.2" and weight.src2="0.2"
        and maxEpochs="3" as output;
    """)


_DATA_MIXING_EPOCHS_ORACLE = """
WITH c AS (
  SELECT source AS stratum, count(*) AS n_docs,
         CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  w -> w <> ''))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT * FROM (VALUES ('src0', 0.6), ('src1', 0.2), ('src2', 0.2))
    wv(stratum, target_weight)
),
t AS (
  SELECT min(c.n_tokens * 3.0 / w.target_weight) AS cap
  FROM c JOIN w USING (stratum)
)
SELECT c.stratum, c.n_docs, c.n_tokens,
       coalesce(w.target_weight, 0.0) AS target_weight,
       round(coalesce(w.target_weight * t.cap / c.n_tokens, 0.0), 4)
         AS sample_fraction
FROM c LEFT JOIN w USING (stratum) CROSS JOIN t
"""


def _q_dsir_score(spark, sf_dir):
    """DSIRScore (Xie et al. 2023 importance resampling): every doc
    scored by hashed-n-gram log-ratio against a target probe (src0's
    docs).  The oracle replays the whole estimator in DuckDB — same
    md5 feature buckets, add-k smoothing, per-doc sum."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id, text from documents where source = 'src0'
    as dsir_target;
    run documents as DSIRScore.`` where targetTable="dsir_target"
        and numBuckets="512" as scored;
    select doc_id, dsir_score, n_features from scored as output;
    """)


_DSIR_SCORE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
  FROM documents
),
feats AS (
  SELECT doc_id, unnest(toks) AS f FROM base
  UNION ALL
  SELECT doc_id,
         unnest([array_to_string(list_slice(toks, i, i + 1), ' ')
                 for i in generate_series(1, len(toks) - 1)])
  FROM base
),
fb AS (
  SELECT doc_id,
         {_PHASH_DUCK.format(payload="'dsir:' || f")} % 512 AS b
  FROM feats WHERE f <> ''
),
tcnt AS (
  SELECT fb.b, count(*) AS tc FROM fb
  JOIN documents d ON fb.doc_id = d.doc_id
  WHERE d.source = 'src0' GROUP BY fb.b
),
rcnt AS (SELECT b, count(*) AS rc FROM fb GROUP BY b),
tot AS (
  SELECT (SELECT coalesce(sum(tc), 0) FROM tcnt) AS T,
         (SELECT coalesce(sum(rc), 0) FROM rcnt) AS R
),
ratios AS (
  SELECT r.b,
         ln((coalesce(t.tc, 0) + 0.5) / (tot.T + 0.5 * 512))
         - ln((r.rc + 0.5) / (tot.R + 0.5 * 512)) AS lr
  FROM rcnt r LEFT JOIN tcnt t ON r.b = t.b CROSS JOIN tot
)
SELECT d.doc_id,
       round(s.score, 4) AS dsir_score,
       coalesce(s.nf, 0) AS n_features
FROM documents d LEFT JOIN (
  SELECT fb.doc_id, sum(ratios.lr) AS score, count(*) AS nf
  FROM fb JOIN ratios ON fb.b = ratios.b
  GROUP BY fb.doc_id
) s ON d.doc_id = s.doc_id
"""


def _q_perplexity_bucket(spark, sf_dir):
    """PerplexityBucket (CCNet head/middle/tail quantile tiers) over a
    derived score, per source stratum.  exact="true" is the oracle
    path: Spark's percentile and DuckDB's quantile_cont share the
    p*(n-1) linear-interpolation definition; both engines round the
    thresholds to 6 decimals before the boundary compare."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id, source, cast(round(n_chars / 100.0, 4) as double) as ppl
    from documents as scored;
    run scored as PerplexityBucket.`` where scoreCol="ppl"
        and strataCol="source" and exact="true" as pb;
    select source, ppl_bucket, count(*) as n_docs,
           round(min(ppl), 4) as min_ppl, round(max(ppl), 4) as max_ppl
    from pb group by source, ppl_bucket as output;
    """)


_PERPLEXITY_BUCKET_ORACLE = """
WITH scored AS (
  SELECT doc_id, source, round(n_chars / 100.0, 4) AS ppl FROM documents
),
th AS (
  SELECT source, round(quantile_cont(ppl, 0.3333), 6) AS t0,
         round(quantile_cont(ppl, 0.6667), 6) AS t1
  FROM scored GROUP BY source
),
b AS (
  SELECT s.source,
         CASE WHEN ppl IS NULL THEN NULL
              WHEN round(ppl, 6) <= t0 THEN 'head'
              WHEN round(ppl, 6) <= t1 THEN 'middle'
              ELSE 'tail' END AS ppl_bucket, ppl
  FROM scored s JOIN th USING (source)
)
SELECT source, ppl_bucket, count(*) AS n_docs,
       round(min(ppl), 4) AS min_ppl, round(max(ppl), 4) AS max_ppl
FROM b GROUP BY source, ppl_bucket
"""


def _q_deterministic_shard(spark, sf_dir):
    """DeterministicShard (round-9): stable training-data layout —
    shard = hash gate, shard_pos = hash-order rank within the shard.
    Fully replayed in DuckDB (same md5 gate + row_number), so the
    physical layout a training loader would consume is byte-pinned
    across engines."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as DeterministicShard.`` where numShards="16" as sh;
    select doc_id, shard, shard_pos from sh as output;
    """)


_DETERMINISTIC_SHARD_ORACLE = f"""
WITH h AS (
  {_SHARD_HASHES} FROM documents
)
SELECT doc_id, CAST(hv % 16 AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY hv % 16
                               ORDER BY bv, hv, doc_id) - 1 AS BIGINT)
         AS shard_pos
FROM h
"""


def _q_deterministic_shard_epoch(spark, sf_dir):
    """Per-epoch reshuffle (round-10): epochSeed keeps the shard
    ASSIGNMENT byte-identical to the unseeded layout (the hash gate is
    unchanged, so shard sizes / file mapping / refTable offsets stay
    valid) but draws the within-shard order from a seed-mixed hash —
    each epoch is a fresh deterministic permutation, the per-epoch
    data-order variation LM training wants without any RNG state.  The
    oracle replays the seeded hash in DuckDB md5, pinning the epoch-2
    permutation byte-for-byte; the output also carries the unseeded
    shard for the same doc so the hash match proves assignment
    stability, not just order determinism."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as DeterministicShard.`` where numShards="16" as dse_l0;
    run documents as DeterministicShard.`` where numShards="16"
        and epochSeed="epoch2" as dse_l2;
    select a.doc_id as doc_id, a.shard as shard,
           a.shard_pos as shard_pos, b.shard as base_shard
    from dse_l2 a join dse_l0 b on a.doc_id = b.doc_id as output;
    """)


#: the seeded position hash: same md5 algebra as _PHASH_DUCK with the
#: epoch-mixed domain tag the operator uses for epochSeed="epoch2"
_DETERMINISTIC_SHARD_EPOCH_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         {_PHASH_DUCK.format(payload=chr(39) + 'shard:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} AS hv,
         {_PHASH_DUCK.format(payload=chr(39) + 'shardpos[epoch2]:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} AS ho
  FROM documents
)
SELECT doc_id, CAST(hv % 16 AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY hv % 16
                               ORDER BY ho % 32, ho, doc_id) - 1 AS BIGINT)
         AS shard_pos,
       CAST(hv % 16 AS INT) AS base_shard
FROM h
"""


def _q_deterministic_shard_incr(spark, sf_dir):
    """Incremental layout (round-9): lay out half the corpus, then
    append the other half with refTable — the increment keeps the
    stable hash shard and its positions continue from each shard's
    max, without reading the already-laid-out rows.  The union is the
    layout a loader resumes against; the oracle replays both
    generations."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select * from documents where doc_id % 2 = 0 as dsh_gen1;
    select * from documents where doc_id % 2 = 1 as dsh_gen2;
    run dsh_gen1 as DeterministicShard.`` where numShards="16" as dsh_l1;
    run dsh_gen2 as DeterministicShard.`` where numShards="16"
        and refTable="dsh_l1" as dsh_l2;
    select doc_id, shard, shard_pos from dsh_l1
    union all
    select doc_id, shard, shard_pos from dsh_l2 as output;
    """)


_DETERMINISTIC_SHARD_INCR_ORACLE = f"""
WITH h AS (
  {_SHARD_HASHES} FROM documents
),
g1 AS (
  SELECT doc_id, CAST(hv % 16 AS INT) AS shard,
         CAST(row_number() OVER (PARTITION BY hv % 16
                                 ORDER BY bv, hv, doc_id) - 1 AS BIGINT)
           AS shard_pos
  FROM h WHERE doc_id % 2 = 0
),
off AS (
  SELECT shard, max(shard_pos) + 1 AS o FROM g1 GROUP BY shard
),
g2 AS (
  SELECT doc_id, CAST(hv % 16 AS INT) AS shard,
         CAST(row_number() OVER (PARTITION BY hv % 16
                                 ORDER BY bv, hv, doc_id) - 1 AS BIGINT)
           AS rnk
  FROM h WHERE doc_id % 2 = 1
)
SELECT doc_id, shard, shard_pos FROM g1
UNION ALL
SELECT g2.doc_id, g2.shard,
       CAST(g2.rnk + coalesce(off.o, 0) AS BIGINT) AS shard_pos
FROM g2 LEFT JOIN off ON g2.shard = off.shard
"""


def _q_layout_audit(spark, sf_dir):
    """LayoutAudit (round-11): the data-quality gate a training job
    runs before resuming from (shard, position) — per-shard
    contiguity / uniqueness / hash-gate / NULL-convention invariants.
    The contract audits a layout with shard 5's positions DELIBERATELY
    shifted by +3, so the flags are exercised in both directions:
    DuckDB replays the layout, the corruption AND every audit
    aggregate — nothing about the verdicts is engine-certified."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as DeterministicShard.`` where numShards="16" as la_l;
    select doc_id, shard,
           case when shard = 5 then shard_pos + 3 else shard_pos end
             as shard_pos
    from la_l as la_bad;
    run la_bad as LayoutAudit.`` where numShards="16" as la_audit;
    select shard, n_rows, n_distinct_pos, min_pos, max_pos,
           contiguous_ok, gate_ok, convention_ok, xor_sig
    from la_audit as output;
    """)


#: the audit's per-row content-signature hash — same md5 algebra as
#: the engine's portable_hash64("sig", id || ':' || pos)
_PHASH_DUCK_SIG = _PHASH_DUCK.format(
    payload="'sig:' || CAST(doc_id AS VARCHAR) || ':' "
            "|| CAST(shard_pos AS VARCHAR)")

_LAYOUT_AUDIT_ORACLE = f"""
WITH h AS (
  {_SHARD_HASHES} FROM documents
),
lay AS (
  SELECT doc_id, hv, CAST(hv % 16 AS INT) AS shard,
         CAST(row_number() OVER (PARTITION BY hv % 16
                                 ORDER BY bv, hv, doc_id) - 1 AS BIGINT)
           AS shard_pos
  FROM h
),
bad AS (
  SELECT doc_id, hv, shard,
         CASE WHEN shard = 5 THEN shard_pos + 3 ELSE shard_pos END
           AS shard_pos
  FROM lay
)
SELECT shard,
       count(*) AS n_rows,
       count(DISTINCT shard_pos) AS n_distinct_pos,
       min(shard_pos) AS min_pos,
       max(shard_pos) AS max_pos,
       (count(DISTINCT shard_pos) = count(*)
        AND min(shard_pos) = 0
        AND max(shard_pos) = count(*) - 1) AS contiguous_ok,
       bool_and(shard = CAST(hv % 16 AS INT)) AS gate_ok,
       bool_and(doc_id IS NOT NULL AND shard IS NOT NULL
                AND shard_pos IS NOT NULL) AS convention_ok,
       bit_xor({_PHASH_DUCK_SIG}) AS xor_sig
FROM bad GROUP BY shard
"""


def _q_layout_manifest(spark, sf_dir):
    """LayoutManifest (round-11): the O(|shards|) per-shard
    (shard, next_pos, n_rows) manifest DeterministicShard appends
    against — examples/15's hand-rolled aggregate as a first-class op.
    The contract also closes the loop: the manifest FEEDS a refTable
    append and the appended generation's per-shard min position must
    equal the manifest's next_pos (replayed in DuckDB end to end)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select * from documents where doc_id % 2 = 0 as lm_g1;
    select * from documents where doc_id % 2 = 1 as lm_g2;
    run lm_g1 as DeterministicShard.`` where numShards="16" as lm_l1;
    run lm_l1 as LayoutManifest.`` as lm_man;
    run lm_g2 as DeterministicShard.`` where numShards="16"
        and refTable="lm_man" as lm_l2;
    select m.shard as shard, m.next_pos as next_pos, m.n_rows as n_rows,
           g.min_pos2 as gen2_min_pos
    from lm_man m
    left join (select shard, min(shard_pos) as min_pos2 from lm_l2
               group by shard) g on m.shard = g.shard as output;
    """)


_LAYOUT_MANIFEST_ORACLE = f"""
WITH h AS (
  {_SHARD_HASHES} FROM documents
),
g1 AS (
  SELECT doc_id, CAST(hv % 16 AS INT) AS shard,
         CAST(row_number() OVER (PARTITION BY hv % 16
                                 ORDER BY bv, hv, doc_id) - 1 AS BIGINT)
           AS shard_pos
  FROM h WHERE doc_id % 2 = 0
),
man AS (
  SELECT shard, max(shard_pos) + 1 AS next_pos, count(*) AS n_rows
  FROM g1 GROUP BY shard
),
g2 AS (
  SELECT CAST(hv % 16 AS INT) AS shard,
         CAST(row_number() OVER (PARTITION BY hv % 16
                                 ORDER BY bv, hv, doc_id) - 1 AS BIGINT)
           AS rnk
  FROM h WHERE doc_id % 2 = 1
)
SELECT man.shard AS shard, man.next_pos AS next_pos,
       man.n_rows AS n_rows,
       g.mn + man.next_pos AS gen2_min_pos
FROM man LEFT JOIN (SELECT shard, min(rnk) AS mn FROM g2
                    GROUP BY shard) g ON man.shard = g.shard
"""


def _q_grouped_split(spark, sf_dir):
    """GroupedSplit (round-11): leakage-safe train/val/test assignment
    by GROUP hash — all rows of a group land in one split, so
    near-duplicates within a group can never straddle the train/eval
    boundary.  Per-row doc-level output: the md5 gate and the integer
    cumulative thresholds are replayed byte-for-byte in DuckDB."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as GroupedSplit.`` where groupCol="source"
        and splits="train:0.8,validation:0.1,test:0.1" as gs;
    select doc_id, source, split from gs as output;
    """)


_GROUPED_SPLIT_ORACLE = f"""
WITH h AS (
  SELECT doc_id, source,
         {_PHASH_DUCK.format(payload=chr(39) + 'split:' + chr(39) + ' || source')}
           % 1000000 AS hv
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN source IS NULL THEN NULL
            WHEN hv < 800000 THEN 'train'
            WHEN hv < 900000 THEN 'validation'
            ELSE 'test' END AS split
FROM h
"""


#: the synthetic page each document is wrapped in for the
#: MainContentExtract contract: a link-dense nav block (dropped by the
#: link-density gate), the document text as the prose block, a
#: too-short block, script/style/comment noise — one source of truth
#: for BOTH engines' page construction
_MCE_PRE = ('<html><head><title>t</title><style>.n{color:red}</style>'
            '<script>var n=1; if (n<2) {}</script></head><body>'
            '<div><a href="/">Home</a> <a href="/a">About</a> '
            '<a href="/b">Contact</a> nav menu</div><p>')
_MCE_POST = ('</p><div>too short</div>'
             '<!-- boilerplate comment that must never surface -->'
             '</body></html>')


def _q_main_content_extract(spark, sf_dir):
    """MainContentExtract (round-11): boilerplate-aware main-content
    extraction (Kohlschütter 2010 / trafilatura block model) as pure
    JVM regex + higher-order-list expressions — every step (script/
    style/comment strip, block split, entity decode, word and anchor
    counts, the integer link-density gate) is replayed in DuckDB, so
    the extraction semantics are pinned cross-engine, not just
    row-counted."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id, concat('{_MCE_PRE}', text, '{_MCE_POST}') as html
    from documents as mce_in;
    run mce_in as MainContentExtract.`` as mce;
    select doc_id, main_content, n_blocks_kept, n_blocks_total
    from mce as output;
    """)


_MAIN_CONTENT_ORACLE = f"""
WITH pages AS (
  SELECT doc_id, '{_MCE_PRE}' || text || '{_MCE_POST}' AS html
  FROM documents
),
cleaned AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             html,
             '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
             '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
             '(?s)<!--.*?-->', ' ', 'g'),
             '(?i)</?(?:p|div|br|li|h[1-6]|tr|td|th|section|article|ul|ol|table|blockquote|header|footer|nav)\\b[^>]*>',
             chr(10), 'g') AS c
  FROM pages
),
blocks AS (
  SELECT doc_id, string_split(c, chr(10)) AS bs FROM cleaned
),
judged AS (
  SELECT doc_id,
         list_transform(bs, b -> {{
           't': trim(regexp_replace(
                  replace(replace(replace(replace(replace(replace(
                    regexp_replace(b, '<[^>]+>', ' ', 'g'),
                    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                    '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
                  '\\s+', ' ', 'g')),
           'l': len(regexp_extract_all(b, '(?i)<a\\b'))
         }}) AS js
  FROM blocks
),
scored AS (
  SELECT doc_id,
         list_transform(js, j -> {{
           't': j.t,
           'w': len(list_filter(string_split(j.t, ' '), x -> x != '')),
           'l': j.l
         }}) AS ss
  FROM judged
)
SELECT doc_id,
       array_to_string(
         list_transform(
           list_filter(ss, s -> s.w >= 5 AND s.l * 5 < s.w),
           s -> s.t),
         chr(10)) AS main_content,
       CAST(len(list_filter(ss, s -> s.w >= 5 AND s.l * 5 < s.w))
            AS INT) AS n_blocks_kept,
       CAST(len(list_filter(ss, s -> s.w > 0)) AS INT)
         AS n_blocks_total
FROM scored
"""


def _q_lake_diff(spark, sf_dir):
    """LakeDiff (round-11): keyed added/removed/changed diff of a
    candidate table against a versionedParquet snapshot — the
    change-data-feed analogue for the native lake, covering overwrite
    semantics the __delta_version__ range read cannot express.  The
    lake (v0 = docs except id%3==2) and the candidate (docs except
    id%3==0, text edited where id%7==0) are built deterministically
    from `documents`, so DuckDB replays both sides, the md5 content
    digests AND the full-outer classification."""
    import tempfile
    eng = _engine(spark)
    lake = tempfile.mkdtemp(prefix="spk_lakediff_") + "/lake"
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id, source, text from documents
    where doc_id % 3 != 2 as ld_v0;
    save overwrite ld_v0 as versionedParquet.`{lake}`;
    select doc_id, source,
           case when doc_id % 7 = 0 then concat(text, ' EDITED')
                else text end as text
    from documents where doc_id % 3 != 0 as ld_cand;
    run ld_cand as LakeDiff.`{lake}` where versionAsOf="0"
        and digestCols="source,text" as ld_d;
    select doc_id, change, old_digest, new_digest from ld_d as output;
    """)


#: null-safe digest matching the operator's per-column sentinel
#: coalesce (review finding, round 11: a bare || null-propagates, so a
#: future NULL source/text row would diverge from Spark's digest)
_LAKE_DIFF_ORACLE = """
WITH v0 AS (
  SELECT doc_id,
         md5(coalesce(source, chr(0) || 'null') || chr(31)
             || coalesce(text, chr(0) || 'null')) AS old_digest
  FROM documents WHERE doc_id % 3 != 2
),
cand AS (
  SELECT doc_id,
         md5(coalesce(source, chr(0) || 'null') || chr(31)
             || coalesce(CASE WHEN doc_id % 7 = 0 THEN text || ' EDITED'
                              ELSE text END,
                         chr(0) || 'null')) AS new_digest
  FROM documents WHERE doc_id % 3 != 0
),
j AS (
  SELECT coalesce(cand.doc_id, v0.doc_id) AS doc_id,
         old_digest, new_digest,
         CASE WHEN old_digest IS NULL THEN 'added'
              WHEN new_digest IS NULL THEN 'removed'
              WHEN new_digest != old_digest THEN 'changed' END AS change
  FROM cand FULL OUTER JOIN v0 ON cand.doc_id = v0.doc_id
)
SELECT doc_id, change, old_digest, new_digest
FROM j WHERE change IS NOT NULL
"""


def _q_token_budget_sample(spark, sf_dir):
    """TokenBudgetSample: cap each source stratum at a token budget in
    deterministic hash order (annotate mode so the oracle can check
    the keep set AND the untouched row count in one output)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as TokenBudgetSample.`` where strataCol="source"
        and defaultBudget="800" and budget.src0="300"
        and budget.src1="100000" and mode="annotate" as tb;
    select source,
           sum(case when keep then 1 else 0 end) as n_kept,
           sum(case when keep then n_tokens else 0 end) as kept_tokens,
           count(*) as n_docs
    from tb group by source as output;
    """)


_TOKEN_BUDGET_ORACLE = f"""
WITH b AS (
  SELECT source, doc_id,
         {_PHASH_DUCK.format(payload="'budget:' || CAST(doc_id AS VARCHAR)")}
           AS h,
         len(list_filter(string_split_regex(lower(coalesce(text, '')),
                                            '\\s+'),
                         w -> w <> '')) AS nt
  FROM documents
),
w AS (
  SELECT source, doc_id, nt,
         CAST(sum(nt) OVER (PARTITION BY source ORDER BY h % 32, h, doc_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM b
),
k AS (
  SELECT *, (cum - nt <
             CASE source WHEN 'src0' THEN 300
                         WHEN 'src1' THEN 100000 ELSE 800 END) AS keep
  FROM w
)
SELECT source,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN keep THEN nt ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       count(*) AS n_docs
FROM k GROUP BY source
"""


def _q_bpe_tokenize(spark, sf_dir):
    """Real BPE: train merges on the corpus word counts, apply via
    broadcast Arrow UDF.  Hash-matched via invariants (round-8:
    upgraded from rows-only — the iterative merge loop itself has no
    SQL oracle BY DESIGN): per document, the exact whitespace word
    count (SQL-replayable) plus two Spark-computed flags — the
    encoding round-trips losslessly (tokens re-concatenated with the
    </w> end-of-word marker restored to spaces reproduce the
    lowercased whitespace-normalized text; measured 100% at
    sf0.001/0.01/0.1) and every word yields at least one token
    (n_bpe_tokens >= n_words).  A merge-table or apply regression
    flips a flag and fails the value hash."""
    import tempfile
    path = tempfile.mkdtemp(prefix="spk_bpe_")
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    train documents as BPETokenizer.`{path}/m` where numMerges="60"
        and maxWords="5000";
    predict documents as BPETokenizer.`{path}/m` as encoded;
    select doc_id,
           size(filter(split(lower(text), '\\\\s+'), w -> w != ''))
             as n_words,
           (trim(replace(concat_ws('', bpe_tokens), '</w>', ' ')) =
            concat_ws(' ', filter(split(lower(text), '\\\\s+'),
                                  w -> w != ''))) as roundtrip_ok,
           (n_bpe_tokens >=
            size(filter(split(lower(text), '\\\\s+'), w -> w != '')))
             as tokens_ge_words
    from encoded as output;
    """)


_BPE_TOKENIZE_ORACLE = """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w != '')) AS INT) AS n_words,
       TRUE AS roundtrip_ok,
       TRUE AS tokens_ge_words
FROM documents
"""



def _q_exact_substr(spark, sf_dir):
    """ExactSubstrDedup (Lee et al. 2022 window-hash approximation):
    per-doc duplicated-window counts over 8-token windows."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    run documents as ExactSubstrDedup.`` where windowSize="8" as esd;
    select doc_id, n_windows, dup_windows, dup_window_fraction
    from esd as output;
    """)


_EXACT_SUBSTR_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents
), wins AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 8
              THEN list_transform(range(1, len(t)-8+2),
                                  i -> array_to_string(t[i:i+7], ' '))
              ELSE []::VARCHAR[] END AS ws
  FROM toks
), ex AS (
  SELECT doc_id, unnest(ws) AS w FROM wins
), cnt AS (SELECT w, count(*) AS c FROM ex GROUP BY w),
per AS (
  SELECT e.doc_id, count(*) AS n_windows,
         CAST(coalesce(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS dup_windows
  FROM ex e JOIN cnt c USING (w) GROUP BY e.doc_id
)
SELECT d.doc_id, coalesce(p.n_windows, 0) AS n_windows,
       coalesce(p.dup_windows, 0) AS dup_windows,
       round(coalesce(p.dup_windows, 0)
             / greatest(coalesce(p.n_windows, 0), 1), 4) AS dup_window_fraction
FROM documents d LEFT JOIN per p USING (doc_id)
"""


def _q_paragraph_dedup(spark, sf_dir):
    """ParagraphDedup (CCNet): global first-occurrence paragraph dedup.
    The synthetic corpus has no newlines, so both engines derive
    paragraphs by turning the frequent token ' table ' into one."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id, replace(text, ' table ', chr(10)) as text
    from documents as pdocs;
    run pdocs as ParagraphDedup.`` as pd_out;
    select doc_id, text, n_paras, n_kept from pd_out as output;
    """)


_PARAGRAPH_DEDUP_ORACLE = """
WITH pdocs AS (
  SELECT doc_id, replace(text, ' table ', chr(10)) AS text FROM documents
), arrs AS (
  SELECT doc_id, string_split(text, chr(10)) AS arr FROM pdocs
), paras AS (
  SELECT doc_id, unnest(arr) AS para,
         generate_subscripts(arr, 1) - 1 AS pos
  FROM arrs
), nz AS (
  SELECT doc_id, pos, para
  FROM paras
  WHERE trim(regexp_replace(lower(para), '[^a-z0-9 ]', '', 'g')) <> ''
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY regexp_replace(lower(para), '[^a-z0-9 ]', '', 'g')
      ORDER BY doc_id, pos) AS rn
  FROM nz
), np AS (
  SELECT doc_id, count(*) AS n_paras FROM nz GROUP BY doc_id
), reb AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(para, chr(10) ORDER BY pos) AS text
  FROM ranked WHERE rn = 1 GROUP BY doc_id
)
SELECT np.doc_id, coalesce(reb.text, '') AS text, np.n_paras,
       coalesce(reb.n_kept, 0) AS n_kept
FROM np LEFT JOIN reb USING (doc_id)
"""


def _q_c4_quality(spark, sf_dir):
    """C4QualityFilter: line keep/drop + page flags.  The corpus has no
    punctuation or newlines, so both engines plant them ('. ' for
    ' row ', '.'+newline for ' agg ') before filtering."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id,
           replace(replace(text, ' row ', '. '), ' agg ',
                   concat('.', chr(10))) as text
    from documents as cdocs;
    run cdocs as C4QualityFilter.`` where minWordsPerLine="3"
        and badWords="vector,carbon" as c4;
    select doc_id, n_lines, n_kept_lines, n_sentences, has_lorem,
           has_brace, has_bad_word, keep, text_clean from c4 as output;
    """)


_C4_QUALITY_ORACLE = """
WITH cdocs AS (
  SELECT doc_id,
         replace(replace(text, ' row ', '. '), ' agg ', '.' || chr(10)) AS text
  FROM documents
), st AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS lines,
         list_filter(string_split(text, chr(10)),
                     l -> regexp_matches(l, '[.!?"]\\s*$')
                          AND len(string_split_regex(trim(l), '\\s+')) >= 3)
           AS good
  FROM cdocs
), flags AS (
  SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(good) AS BIGINT) AS n_kept_lines,
       CAST(greatest(len(string_split_regex(text, '[.!?]')) - 1, 0) AS BIGINT)
         AS n_sentences,
       contains(lower(text), 'lorem ipsum') AS has_lorem,
       contains(text, '{') AS has_brace,
       (list_contains(string_split_regex(
            regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\\s+'),
            'vector')
        OR list_contains(string_split_regex(
            regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\\s+'),
            'carbon')) AS has_bad_word,
       coalesce(array_to_string(good, chr(10)), '') AS text_clean
  FROM st
)
SELECT doc_id, n_lines, n_kept_lines, n_sentences, has_lorem, has_brace,
       has_bad_word,
       (n_kept_lines > 0 AND n_sentences >= 3 AND NOT has_lorem
        AND NOT has_brace AND NOT has_bad_word) AS keep,
       text_clean
FROM flags
"""


def _q_text_normalize(spark, sf_dir):
    """TextNormalize (CCNet-style pre-dedup cleanup).  The corpus is
    plain ASCII words, so both engines plant the mess first: smart
    quotes + an accented word, a tab + em dash + digits, and an
    ellipsis char — then normalize with every step on."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id,
           replace(replace(replace(text, ' the ', ' “Thé” '),
                           ' row ', concat(' Na', chr(9), 'ïve—42 ')),
                   ' agg ', concat(' DA', chr(133), 'TA… ')) as text
    from documents as ndocs;
    run ndocs as TextNormalize.`` where stripAccents="true"
        and digitsToZero="true" and outputCol="text_norm" as tn;
    select doc_id, text_norm from tn as output;
    """)


def _text_normalize_oracle() -> str:
    """DuckDB replay of the TextNormalize chain, translate maps taken
    from the module constants so the two can't drift."""
    from streamingpro_spark.operators.text_analysis import (
        _ACCENT_FROM, _ACCENT_TO, _SMART_PUNCT_FROM, _SMART_PUNCT_TO)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    return f"""
WITH ndocs AS (
  SELECT doc_id,
         replace(replace(replace(text, ' the ', ' “Thé” '),
                         ' row ', ' Na' || chr(9) || 'ïve—42 '),
                 ' agg ', ' DA' || chr(133) || 'TA… ') AS text
  FROM documents
)
SELECT doc_id,
  trim(regexp_replace(
    lower(
      regexp_replace(
        translate(
          replace(
            translate(
              regexp_replace(text,
                             '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]',
                             '', 'g'),
              {q(_SMART_PUNCT_FROM)}, {q(_SMART_PUNCT_TO)}),
            '…', '...'),
          {q(_ACCENT_FROM)}, {q(_ACCENT_TO)}),
        '[0-9]', '0', 'g')),
    '\\s+', ' ', 'g')) AS text_norm
FROM ndocs
"""


def _q_gopher_quality(spark, sf_dir):
    """GopherQualityFilter (Rae et al. §A1.1 non-repetition rules).
    The corpus has no symbols/newlines, so both engines plant them:
    ' hash ' -> ' # ' (symbol), ' row ' -> newline+'- ' (bullet-start
    line), ' agg ' -> ' ...'+newline (ellipsis-end line)."""
    eng = _engine(spark)
    return eng.execute(f"""
    {_loads(sf_dir, 'documents')}
    select doc_id,
           replace(replace(replace(text, ' hash ', ' # '),
                           ' row ', concat(chr(10), '- ')),
                   ' agg ', concat(' ...', chr(10))) as text
    from documents as gdocs;
    run gdocs as GopherQualityFilter.`` where minWords="20"
        and minStopwords="1" and minAlphaWordFrac="0.85"
        and maxSymbolWordRatio="0.05" as gq;
    select doc_id, n_words, mean_word_len, symbol_word_ratio,
           frac_bullet_lines, frac_ellipsis_lines, frac_alpha_words,
           n_required_stopwords, keep from gq as output;
    """)


_GOPHER_QUALITY_ORACLE = """
WITH gdocs AS (
  SELECT doc_id,
         replace(replace(replace(text, ' hash ', ' # '),
                         ' row ', chr(10) || '- '),
                 ' agg ', ' ...' || chr(10)) AS text
  FROM documents
), m AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'),
                     w -> w != '') AS words,
         string_split(text, chr(10)) AS lines
  FROM gdocs
), f AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    greatest(len(words), 1) AS dw,
    greatest(len(lines), 1) AS dl,
    len(regexp_replace(text, '\\s+', '', 'g')) AS word_chars,
    len(regexp_extract_all(text, '#'))
      + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS n_symbols,
    len(list_filter(lines,
        l -> regexp_matches(l, '^\\s*[-*•‣▪]'))) AS bullet,
    len(list_filter(lines,
        l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS ellip,
    len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha,
    CAST(len(list_intersect(
        list_distinct(string_split_regex(lower(text), '\\s+')),
        ['the','be','to','of','and','that','have','with'])) AS BIGINT)
      AS n_required_stopwords
  FROM m
), r AS (
  SELECT doc_id, n_words,
    round(word_chars / dw, 4) AS mean_word_len,
    round(n_symbols / dw, 4) AS symbol_word_ratio,
    round(bullet / dl, 4) AS frac_bullet_lines,
    round(ellip / dl, 4) AS frac_ellipsis_lines,
    round(alpha / dw, 4) AS frac_alpha_words,
    n_required_stopwords
  FROM f
)
SELECT *,
  (n_words >= 20 AND n_words <= 100000
   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
   AND symbol_word_ratio <= 0.05
   AND frac_bullet_lines <= 0.9 AND frac_ellipsis_lines <= 0.3
   AND frac_alpha_words >= 0.85
   AND n_required_stopwords >= 1) AS keep
FROM r
"""


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------

# rows-only entries (no oracle): skipped by the deterministic-order wrap.
# EMPTY as of round 9 — ivf_pq_topk, the last holdout, now hash-matches
# through _q_ivf_pq_topk_contract (the benched search-only shape stays in
# base_queries(); the contract wrap lives only in queries()).
_ROWS_ONLY: set = set()

# contract-shape overrides: queries()/oracle hash-check THIS shape while
# bench.py times the base_queries() shape under the same name
_CONTRACT_OVERRIDES = {"ivf_pq_topk": _q_ivf_pq_topk_contract}


def _ordered(df: DataFrame) -> DataFrame:
    """Total row order over all output columns (projection order, nulls
    last) — mirrors the `ORDER BY ALL NULLS LAST` wrap on the oracle
    side, so a row-order-sensitive value hash sees identical sequences
    from both engines."""
    from pyspark.sql import functions as F
    return df.orderBy(*[F.col(c).asc_nulls_last() for c in df.columns])


def base_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The contract queries WITHOUT the deterministic-order wrap.
    bench.py measures these: the global orderBy exists only so an
    order-sensitive value hash compares equal across engines — it is
    harness plumbing, and Spark's range partitioner SAMPLES its input
    (re-executing the upstream DAG), which 10×'d minhash at sf0.1."""
    def sql_q(script_sql: str, tables: list[str]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _run(spark, sf_dir, tables, f"{script_sql.strip()} as output;")
        return run

    return {
        # relational core
        "q1_pricing_summary": sql_q(_Q1, ["lineitem"]),
        "q3_shipping_priority": sql_q(_Q3, ["customer", "orders", "lineitem"]),
        "q5_local_supplier": sql_q(_Q5, ["region", "nation", "customer", "orders", "lineitem"]),
        "top_customers_per_nation": sql_q(_TOPCUST, ["customer"]),
        "running_total": sql_q(_RUNNING, ["orders"]),
        "set_ops": sql_q(_SETOPS, ["customer"]),
        "rollup_orders": sql_q(_ROLLUP, ["orders"]),
        "events_tumbling": sql_q(_TUMBLING, ["events"]),
        "events_sessionize": sql_q(_SESSIONIZE_SPARK, ["events"]),
        "events_session_window": sql_q(_SESSION_WINDOW_SPARK, ["events"]),
        "events_json_extract": sql_q(_JSON_SPARK, ["events"]),
        "events_asof_join": _q_asof,
        "pivot_orders": _q_pivot,
        "tree_hierarchy": _q_tree,
        # TPC-H-style breadth
        "q4_order_priority": sql_q(_Q4, ["orders", "lineitem"]),
        "q6_revenue_forecast": sql_q(_Q6, ["lineitem"]),
        "q7_volume_shipping": sql_q(_Q7, ["supplier", "lineitem", "orders",
                                          "customer", "nation"]),
        "q8_market_share": sql_q(_Q8, ["part", "lineitem", "orders", "customer",
                                       "nation", "region", "supplier"]),
        "q10_returned_items": sql_q(_Q10, ["customer", "orders", "lineitem", "nation"]),
        "q14_promo_effect": sql_q(_Q14, ["lineitem", "part"]),
        "q17_small_qty": sql_q(_Q17, ["lineitem", "part"]),
        "q18_large_volume": sql_q(_Q18, ["customer", "orders", "lineitem"]),
        "q22_idle_customers": sql_q(_Q22, ["customer", "orders"]),
        "q13_order_distribution": sql_q(_Q13, ["customer", "orders"]),
        "q20_excess_suppliers": sql_q(_Q20, ["supplier", "lineitem", "part"]),
        "q9_product_profit": sql_q(_Q9, ["part", "lineitem", "supplier",
                                         "orders", "nation"]),
        "q12_late_shipments": sql_q(_Q12, ["orders", "lineitem"]),
        "q15_top_supplier": sql_q(_Q15, ["supplier", "lineitem"]),
        "q19_disjunctive_revenue": sql_q(_Q19, ["lineitem", "part"]),
        "q21_waiting_suppliers": sql_q(_Q21, ["supplier", "lineitem", "orders"]),
        "q2_min_cost_supplier": sql_q(_Q2, ["part", "supplier", "lineitem", "nation"]),
        "q11_important_parts": sql_q(_Q11, ["lineitem", "supplier", "nation"]),
        "q16_supplier_count": sql_q(_Q16, ["lineitem", "part", "supplier"]),
        "setops_all_variants": sql_q(_SETOPS_ALL, ["orders"]),
        "lateral_top_balance": sql_q(_LATERAL, ["nation", "customer"]),
        "interval_range_frame": sql_q(_INTERVAL_RANGE_FRAME, ["events"]),
        "wordcount_top20": sql_q(_WORDCOUNT_SPARK, ["documents"]),
        "percentiles_by_status": sql_q(_PERCENTILES_SPARK, ["orders"]),
        "grouping_sets_orders": sql_q(_GROUPING_SETS, ["orders"]),
        "cube_lineitem": sql_q(_CUBE, ["lineitem"]),
        "window_lead_lag": sql_q(_LEAD_LAG, ["orders"]),
        "scalar_functions": sql_q(_SCALAR_FNS, ["orders"]),
        "string_functions": sql_q(_STRING_FNS_SPARK, ["orders"]),
        "window_range_frame": sql_q(_RANGE_FRAME, ["orders"]),
        "array_agg_sorted": sql_q(_ARRAY_AGG_SPARK, ["orders"]),
        # feature/table ETs with oracles
        "scaler_minmax": _q_scaler,
        "discretizer_bucket": _q_discretizer,
        "string_index": _q_string_index,
        "confusion_matrix": _q_confusion,
        "rate_sampler_counts": _q_rate_sampler,
        "auto_increment": _q_auto_increment,
        "vector_ops": _q_vector_ops,
        "time_functions": _q_time_functions,
        "array_functions": _q_array_functions,
        "normalize_l2": _q_normalize,
        "map_lookup": _q_map_lookup,
        # iterative / approximate / model ops — rows-only checks
        "pagerank": _q_pagerank,
        "approx_distinct": _q_approx_distinct,
        "lsh_similarity": _q_lsh_similarity,
        "tfidf_featurize": _q_tfidf,
        "tfidf_alg": _q_tfidf_standalone,
        "hash_tfidf_alg": _q_hash_tfidf,
        "ml_train_predict": _q_ml_train_predict,
        "kmeans_clusters": _q_kmeans,
        # LLM-pipeline: dedup
        "exact_dedup": _q_exact_dedup,
        "minhash_dedup": _q_minhash,
        "ngram_jaccard_dedup": _q_ngram_jaccard,
        "simhash_fingerprint": _q_simhash,
        "embedding_dedup": _q_embedding_dedup,
        "semdedup_exact": _q_semdedup,
        # LLM-pipeline: similarity search
        "embedding_topk": _q_embedding_topk,
        "ivf_topk": _q_ivf_topk,
        "ivf_index_topk": _q_ivf_index_topk,
        "ivf_index_append": _q_ivf_index_append,
        "ivf_pq_topk": _q_ivf_pq_topk,
        "ivf_pq_recall": _q_ivf_pq_recall,
        # LLM-pipeline: text analysis
        "language_id": _q_language_id,
        "quality_score": _q_quality,
        "token_count": _q_token_count,
        "doc_fingerprint": _q_fingerprint,
        "pii_redact": _q_pii_redact,
        "data_constraints": _q_data_constraints,
        "dup_clusters": _q_dup_clusters,
        "near_dedup": _q_near_dedup,
        "soft_dedup": _q_soft_dedup,
        "weighted_sample": _q_weighted_sample,
        "near_dedup_incr": _q_near_dedup_incr,
        "incremental_lake_e2e": _q_incremental_lake,
        "streaming_lake_ingest": _q_streaming_lake_ingest,
        "streaming_curated_lake": _q_streaming_curated_lake,
        "streaming_layout_ingest": _q_streaming_layout_ingest,
        "lake_day_ingest": _q_lake_day_ingest,
        "chunk_documents": _q_chunk_documents,
        "contamination_check": _q_contamination,
        "exact_substr_dedup": _q_exact_substr,
        "paragraph_dedup": _q_paragraph_dedup,
        "c4_quality_filter": _q_c4_quality,
        "gopher_quality_filter": _q_gopher_quality,
        "text_normalize": _q_text_normalize,
        # LLM-pipeline: LM scoring / mixing / packing / tokenization
        "repetition_score": _q_repetition_score,
        "ngram_lm_score": _q_ngram_lm_score,
        "stratified_sample": _q_stratified_sample,
        "sequence_pack": _q_sequence_pack,
        "data_mixing": _q_data_mixing,
        "data_mixing_epochs": _q_data_mixing_epochs,
        "dsir_score": _q_dsir_score,
        "perplexity_bucket": _q_perplexity_bucket,
        "token_budget_sample": _q_token_budget_sample,
        "deterministic_shard": _q_deterministic_shard,
        "deterministic_shard_incr": _q_deterministic_shard_incr,
        "deterministic_shard_epoch": _q_deterministic_shard_epoch,
        "layout_audit": _q_layout_audit,
        "layout_manifest": _q_layout_manifest,
        "grouped_split": _q_grouped_split,
        "lake_diff": _q_lake_diff,
        "main_content_extract": _q_main_content_extract,
        "bpe_tokenize": _q_bpe_tokenize,
        # LLM-pipeline: multimodal (stub decode, real plumbing)
        "image_metadata": _q_image_metadata,
        "audio_features": _q_audio_features,
        "video_metadata": _q_video_metadata,
        "frame_sample": _q_frame_sample,
        "url_filter": _q_url_filter,
        "audio_fingerprint_dedup": _q_audio_fingerprint_dedup,
        "image_phash_dedup": _q_image_phash_dedup,
        "image_dedup_pairs": _q_image_dedup_pairs,
        "image_resize": _q_image_resize,
        "versioned_parquet_tt": _q_versioned_parquet,
        "bloom_dedup": _q_bloom_dedup,
        "warc_parse": _q_warc_parse,
        "warc_bench": _q_warc_bench,
        "warc_sink_roundtrip": _q_warc_sink_roundtrip,
        # custom stateful streaming, replayed and hash-checked vs batch
        "stateful_count_stream": _q_stateful_count_stream,
        "stateful_sessionizer_stream": _q_stateful_sessionizer_stream,
        "streaming_dedup_stream": _q_streaming_dedup_stream,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _ordered(fn(spark, sf_dir))
        return run

    return {name: (fn if name in _ROWS_ONLY
                   else wrap(_CONTRACT_OVERRIDES.get(name, fn)))
            for name, fn in base_queries().items()}


def oracle_sql() -> dict[str, str]:
    base = {
        "q1_pricing_summary": _Q1,
        "q3_shipping_priority": _Q3,
        "q5_local_supplier": _Q5,
        "top_customers_per_nation": _TOPCUST,
        "running_total": _RUNNING,
        "set_ops": _SETOPS,
        "rollup_orders": _ROLLUP,
        "events_tumbling": _TUMBLING,
        "events_sessionize": _SESSIONIZE_DUCK,
        "events_session_window": _SESSION_WINDOW_DUCK,
        "events_json_extract": _JSON_DUCK,
        "events_asof_join": _ASOF_ORACLE,
        "pivot_orders": _PIVOT_ORACLE,
        "tree_hierarchy": _TREE_ORACLE,
        "q4_order_priority": _Q4,
        "q6_revenue_forecast": _Q6,
        "q7_volume_shipping": _Q7,
        "q8_market_share": _Q8,
        "q10_returned_items": _Q10,
        "q14_promo_effect": _Q14,
        "q17_small_qty": _Q17,
        "q18_large_volume": _Q18,
        "q22_idle_customers": _Q22,
        "q13_order_distribution": _Q13,
        "q20_excess_suppliers": _Q20,
        "q9_product_profit": _Q9,
        "q12_late_shipments": _Q12,
        "q15_top_supplier": _Q15,
        "q19_disjunctive_revenue": _Q19,
        "q21_waiting_suppliers": _Q21,
        "q2_min_cost_supplier": _Q2,
        "q11_important_parts": _Q11,
        "q16_supplier_count": _Q16,
        "setops_all_variants": _SETOPS_ALL,
        "lateral_top_balance": _LATERAL,
        "interval_range_frame": _INTERVAL_RANGE_FRAME,
        "wordcount_top20": _WORDCOUNT_DUCK,
        "percentiles_by_status": _PERCENTILES_DUCK,
        "grouping_sets_orders": _GROUPING_SETS,
        "cube_lineitem": _CUBE,
        "window_lead_lag": _LEAD_LAG,
        "scalar_functions": _SCALAR_FNS,
        "string_functions": _STRING_FNS_DUCK,
        "window_range_frame": _RANGE_FRAME,
        "array_agg_sorted": _ARRAY_AGG_DUCK,
        "scaler_minmax": _SCALER_ORACLE,
        "discretizer_bucket": _DISCRETIZER_ORACLE,
        "string_index": _STRING_INDEX_ORACLE,
        "confusion_matrix": _CONFUSION_ORACLE,
        "rate_sampler_counts": _RATE_SAMPLER_ORACLE,
        "auto_increment": _AUTO_INCREMENT_ORACLE,
        "vector_ops": _VECTOR_OPS_ORACLE,
        "time_functions": _TIME_FUNCTIONS_ORACLE,
        "array_functions": _ARRAY_FUNCTIONS_ORACLE,
        "normalize_l2": _NORMALIZE_ORACLE,
        "map_lookup": _MAP_LOOKUP_ORACLE,
        "exact_dedup": _EXACT_DEDUP_ORACLE,
        "minhash_dedup": _MINHASH_ORACLE,
        "ngram_jaccard_dedup": _NGRAM_JACCARD_ORACLE,
        "simhash_fingerprint": _simhash_oracle(),
        "embedding_dedup": _EMBEDDING_DEDUP_ORACLE,
        "semdedup_exact": _EMBEDDING_DEDUP_ORACLE,
        "embedding_topk": _EMBEDDING_TOPK_ORACLE,
        "ivf_topk": _EMBEDDING_TOPK_ORACLE,
        "ivf_index_topk": _EMBEDDING_TOPK_ORACLE,
        "ivf_index_append": _EMBEDDING_TOPK_ORACLE,
        "ivf_pq_recall": _IVF_PQ_RECALL_ORACLE,
        "ivf_pq_topk": _IVF_PQ_TOPK_ORACLE,
        "ml_train_predict": _ML_TRAIN_PREDICT_ORACLE,
        "kmeans_clusters": _KMEANS_ORACLE,
        "bpe_tokenize": _BPE_TOKENIZE_ORACLE,
        "language_id": _language_id_oracle(),
        "quality_score": _QUALITY_ORACLE,
        "token_count": _TOKEN_COUNT_ORACLE,
        "doc_fingerprint": _FINGERPRINT_ORACLE,
        "pii_redact": _PII_REDACT_ORACLE,
        "data_constraints": _DATA_CONSTRAINTS_ORACLE,
        "dup_clusters": _DUP_CLUSTERS_ORACLE,
        "near_dedup": _NEAR_DEDUP_ORACLE,
        "soft_dedup": _SOFT_DEDUP_ORACLE,
        "weighted_sample": _WEIGHTED_SAMPLE_ORACLE,
        "near_dedup_incr": _NEAR_DEDUP_INCR_ORACLE,
        "incremental_lake_e2e": _INCREMENTAL_LAKE_ORACLE,
        # the streaming path must land exactly the batch chain's rows
        # in exactly the batch chain's commits — same oracle
        "streaming_lake_ingest": _INCREMENTAL_LAKE_ORACLE,
        "streaming_curated_lake": _STREAMING_CURATED_LAKE_ORACLE,
        "streaming_layout_ingest": _STREAMING_LAYOUT_INGEST_ORACLE,
        "lake_day_ingest": _LAKE_DAY_INGEST_ORACLE,
        "chunk_documents": _CHUNK_DOCUMENTS_ORACLE,
        "contamination_check": _CONTAMINATION_ORACLE,
        "exact_substr_dedup": _EXACT_SUBSTR_ORACLE,
        "paragraph_dedup": _PARAGRAPH_DEDUP_ORACLE,
        "c4_quality_filter": _C4_QUALITY_ORACLE,
        "gopher_quality_filter": _GOPHER_QUALITY_ORACLE,
        "text_normalize": _text_normalize_oracle(),
        "repetition_score": _REPETITION_ORACLE,
        "ngram_lm_score": _NGRAM_LM_ORACLE,
        "stratified_sample": _STRATIFIED_ORACLE,
        "sequence_pack": _SEQUENCE_PACK_ORACLE,
        "data_mixing": _DATA_MIXING_ORACLE,
        "data_mixing_epochs": _DATA_MIXING_EPOCHS_ORACLE,
        "dsir_score": _DSIR_SCORE_ORACLE,
        "perplexity_bucket": _PERPLEXITY_BUCKET_ORACLE,
        "token_budget_sample": _TOKEN_BUDGET_ORACLE,
        "deterministic_shard": _DETERMINISTIC_SHARD_ORACLE,
        "deterministic_shard_epoch": _DETERMINISTIC_SHARD_EPOCH_ORACLE,
        "deterministic_shard_incr": _DETERMINISTIC_SHARD_INCR_ORACLE,
        "layout_audit": _LAYOUT_AUDIT_ORACLE,
        "layout_manifest": _LAYOUT_MANIFEST_ORACLE,
        "grouped_split": _GROUPED_SPLIT_ORACLE,
        "lake_diff": _LAKE_DIFF_ORACLE,
        "main_content_extract": _MAIN_CONTENT_ORACLE,
        "image_metadata": _IMAGE_METADATA_ORACLE,
        "audio_features": _AUDIO_FEATURES_ORACLE,
        "video_metadata": _VIDEO_METADATA_ORACLE,
        "frame_sample": _FRAME_SAMPLE_ORACLE,
        "url_filter": _URL_FILTER_ORACLE,
        "audio_fingerprint_dedup": _AUDIO_FP_DEDUP_ORACLE,
        "image_phash_dedup": _IMAGE_PHASH_DEDUP_ORACLE,
        "image_dedup_pairs": _IMAGE_DEDUP_PAIRS_ORACLE,
        "image_resize": _IMAGE_RESIZE_ORACLE,
        "bloom_dedup": _BLOOM_DEDUP_ORACLE,
        "warc_parse": _WARC_PARSE_ORACLE,
        "warc_bench": _WARC_BENCH_ORACLE,
        "warc_sink_roundtrip": _WARC_SINK_ORACLE,
        "stateful_count_stream": _STATEFUL_COUNT_ORACLE,
        "stateful_sessionizer_stream": _STATEFUL_SESSIONIZER_ORACLE,
        "streaming_dedup_stream": _STREAMING_DEDUP_ORACLE,
        # round-8 rows-only → hash-match upgrades
        "tfidf_alg": _TFIDF_ALG_ORACLE,
        "hash_tfidf_alg": _HASH_TFIDF_ALG_ORACLE,
        "tfidf_featurize":
            _TFIDF_FEATURIZE_ORACLE.format(murmur=_murmur3_sql(8192)),
        "pagerank": _pagerank_oracle(),
        "approx_distinct": _APPROX_DISTINCT_ORACLE,
        "lsh_similarity": _LSH_SIMILARITY_ORACLE,
        "versioned_parquet_tt": _VERSIONED_TT_ORACLE,
    }
    # same total row order as the Spark-side _ordered() wrap — projection
    # order, nulls last — so order-sensitive value hashes match
    return {name: "SELECT * FROM (" + sql.strip().rstrip(";")
                  + ") __q ORDER BY ALL NULLS LAST"
            for name, sql in base.items()}
