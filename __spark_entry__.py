"""Driver contract for the spark-graft builder (PySpark target).

Every query runs END-TO-END through the streamingpro_spark engine (an
MLSQL-style script → Spark SQL / ET operators), proving the language
surface, and is paired with an ANSI-SQL oracle DuckDB runs on the same
parquet.  Aggregate/computed columns are aliased identically on both
sides; floating aggregates are rounded on both sides so the
order-insensitive value hash is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _engine(spark: SparkSession):
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

_TUMBLING = """
select date_trunc('hour', ts) as hour_start, event_type,
       count(*) as n_events,
       round(sum(value), 2) as sum_value,
       round(avg(value), 4) as avg_value
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


_MINHASH_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(list_slice(toks, i, i+2), ' ')
                        for i in generate_series(1, greatest(len(toks)-2, 1))]) AS shingles
  FROM t
),
sig AS (
  SELECT doc_id, shingles,
         [list_min([CAST(CONCAT('0x', substr(md5(CONCAT(CAST(s AS VARCHAR), ':', sng)), 1, 15)) AS BIGINT)
                    for sng in shingles])
          for s in generate_series(0, 11)] AS mh
  FROM sh
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
)
SELECT doc_a, doc_b, round(inter * 1.0 / (na + nb - inter), 4) AS jaccard
FROM j WHERE inter * 1.0 / (na + nb - inter) >= 0.8
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
WHERE list_dot_product(a.u, b.u) >= 0.45
"""


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
WITH t AS (
  SELECT doc_id, text, string_split_regex(text, '\\s+') AS words
  FROM documents
)
SELECT doc_id,
       CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS ws_tokens,
       CAST(list_sum(list_transform(words,
                w -> greatest(CAST(ceil(length(w) / 6.0) AS BIGINT), 1)))
            + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT)
         AS est_bpe_tokens
FROM t
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
# contract functions
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
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
        "events_json_extract": sql_q(_JSON_SPARK, ["events"]),
        "events_asof_join": _q_asof,
        "pivot_orders": _q_pivot,
        "tree_hierarchy": _q_tree,
        # LLM-pipeline: dedup
        "exact_dedup": _q_exact_dedup,
        "minhash_dedup": _q_minhash,
        "ngram_jaccard_dedup": _q_ngram_jaccard,
        "simhash_fingerprint": _q_simhash,
        "embedding_dedup": _q_embedding_dedup,
        # LLM-pipeline: similarity search
        "embedding_topk": _q_embedding_topk,
        # LLM-pipeline: text analysis
        "language_id": _q_language_id,
        "quality_score": _q_quality,
        "token_count": _q_token_count,
        "doc_fingerprint": _q_fingerprint,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": _Q1,
        "q3_shipping_priority": _Q3,
        "q5_local_supplier": _Q5,
        "top_customers_per_nation": _TOPCUST,
        "running_total": _RUNNING,
        "set_ops": _SETOPS,
        "rollup_orders": _ROLLUP,
        "events_tumbling": _TUMBLING,
        "events_sessionize": _SESSIONIZE_DUCK,
        "events_json_extract": _JSON_DUCK,
        "events_asof_join": _ASOF_ORACLE,
        "pivot_orders": _PIVOT_ORACLE,
        "tree_hierarchy": _TREE_ORACLE,
        "exact_dedup": _EXACT_DEDUP_ORACLE,
        "minhash_dedup": _MINHASH_ORACLE,
        "ngram_jaccard_dedup": _NGRAM_JACCARD_ORACLE,
        "simhash_fingerprint": _simhash_oracle(),
        "embedding_dedup": _EMBEDDING_DEDUP_ORACLE,
        "embedding_topk": _EMBEDDING_TOPK_ORACLE,
        "language_id": _language_id_oracle(),
        "quality_score": _QUALITY_ORACLE,
        "token_count": _TOKEN_COUNT_ORACLE,
        "doc_fingerprint": _FINGERPRINT_ORACLE,
    }
