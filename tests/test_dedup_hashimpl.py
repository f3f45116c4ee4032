"""hashImpl parity: the dedup family's OUTCOME (pair/survivor sets,
per-doc annotations) must be identical under the oracle-portable md5
hash and the production xxhash64 hash — only the internal signatures
differ.  Pins the round-5 `hashImpl` switch (VERDICT r4 task 2)."""

import json

import pytest

DOCS = [
    # 3 exact copies, one near-copy (1 word changed), 3 distinct docs
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    (3, "the quick brown fox jumps over the lazy dog again and again"),
    (4, "the quick brown fox jumps over the lazy cat again and again"),
    (5, "completely different text about spark dataframes and shuffles"),
    (6, "a third topic entirely parquet files and column pruning rules"),
    (7, "yet another unique document mentioning watermarks and windows"),
]


def _docs_script():
    data = "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in DOCS)
    return f"set docs_json = '''{data}''';\nload jsonStr.`docs_json` as docs;"


def _run(engine, script):
    return engine.execute(_docs_script() + "\n" + script)


@pytest.mark.parametrize("op,script,key", [
    ("ExactDedup",
     'run docs as ExactDedup.`` where idCol="doc_id" and hashImpl="{h}" '
     'as out;\nselect doc_id from out as final;',
     lambda r: r["doc_id"]),
    # threshold ABOVE the near-copy's true jaccard (0.54): exact copies
    # have identical signatures under any hash family (always candidates,
    # verify=1.0) while borderline candidates — whose LSH banding IS
    # hash-family-dependent — get filtered by the exact verify either way
    ("MinHashDedup",
     'run docs as MinHashDedup.`` where threshold="0.8" and '
     'hashImpl="{h}" as out;\nselect doc_a, doc_b, jaccard from out as final;',
     lambda r: (r["doc_a"], r["doc_b"], r["jaccard"])),
    ("ExactSubstrDedup",
     'run docs as ExactSubstrDedup.`` where windowSize="5" and '
     'hashImpl="{h}" as out;\n'
     'select doc_id, n_windows, dup_windows from out as final;',
     lambda r: (r["doc_id"], r["n_windows"], r["dup_windows"])),
    ("ParagraphDedup",
     'run docs as ParagraphDedup.`` where sep=" and " and hashImpl="{h}" '
     'as out;\nselect doc_id, text, n_paras, n_kept from out as final;',
     lambda r: (r["doc_id"], r["text"], r["n_paras"], r["n_kept"])),
])
def test_outcome_identical_across_impls(engine, op, script, key):
    results = {}
    for h in ("md5", "xxhash64"):
        rows = _run(engine, script.format(h=h)).collect()
        results[h] = sorted(key(r) for r in rows)
    assert results["md5"] == results["xxhash64"], op
    assert results["md5"], f"{op}: fixture produced no rows"


def test_exactdedup_survivor_set(engine):
    """Ground truth under BOTH impls: one survivor per exact-copy
    group, near-copy and distinct docs kept."""
    for h in ("md5", "xxhash64"):
        df = _run(engine,
                  f'run docs as ExactDedup.`` where idCol="doc_id" and '
                  f'hashImpl="{h}" as out;\nselect doc_id from out as final;')
        assert sorted(r["doc_id"] for r in df.collect()) == [1, 4, 5, 6, 7]


def test_simhash_grouping_structure(engine):
    """Fingerprint VALUES differ across impls, but which docs share a
    fingerprint (the dedup semantics) must not."""
    groups = {}
    for h in ("md5", "xxhash64"):
        df = _run(engine,
                  f'run docs as SimHashDedup.`` where hashImpl="{h}" as out;')
        by_hash = {}
        for r in df.collect():
            by_hash.setdefault(r["simhash"], []).append(r["doc_id"])
        groups[h] = sorted(sorted(v) for v in by_hash.values())
    assert groups["md5"] == groups["xxhash64"]
    # the three exact copies share one fingerprint under both
    assert [1, 2, 3] in groups["md5"]


def test_sampling_gates_accept_impl(engine):
    """The hash-gate samplers produce a valid (impl-dependent) subset
    under xxhash64 — membership may differ from md5, the contract
    (fraction gating, determinism) may not."""
    script = ('select doc_id, text, cast(doc_id % 2 as string) as source '
              'from docs as sdocs;\n'
              'run sdocs as StratifiedSampleExt.`` where idCol="doc_id" '
              'and defaultFraction="1.0" and ratio.0="0.0" and '
              'hashImpl="{h}" as out;\nselect doc_id, source from out as final;')
    for h in ("md5", "xxhash64"):
        rows = _run(engine, script.format(h=h)).collect()
        got = sorted(r["doc_id"] for r in rows)
        # stratum "0" fully gated out; stratum "1" fully kept — exact
        # under any hash because the gates are 0% / 100%
        assert got == [1, 3, 5, 7], (h, got)
        # deterministic: identical on re-run
        rows2 = _run(engine, script.format(h=h)).collect()
        assert sorted(r["doc_id"] for r in rows2) == got


def test_bad_hash_impl_rejected(engine):
    with pytest.raises(Exception, match="hashImpl must be"):
        _run(engine,
             'run docs as ExactDedup.`` where hashImpl="sha9" as out;')


def test_bloom_filter_dedup_filter_mode(engine):
    """filter mode is EXACT (bloom prunes, verify join confirms):
    output == NOT EXISTS anti-join, false positives verified away."""
    import json
    ref = [(i, f"ref document number {i} unique content") for i in range(50)]
    new = ([(100 + i, f"ref document number {i} unique content")
            for i in range(0, 50, 5)]            # 10 true dups
           + [(200 + i, f"fresh document {i} never seen") for i in range(20)]
           + [(300, None)])                       # null: kept
    rj = "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in ref)
    nj = "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in new)
    df = engine.execute(f"""
    set refj = '''{rj}''';
    set newj = '''{nj}''';
    load jsonStr.`refj` as ref_corpus;
    load jsonStr.`newj` as new_batch;
    run new_batch as BloomFilterDedup.`` where refTable="ref_corpus"
    and fpp="0.2" as out;
    select doc_id from out as final;
    """)
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == sorted([200 + i for i in range(20)] + [300]), got


def test_portable_hash64_null_parity(spark):
    """Null input hashes to NULL under BOTH impls.  Spark's xxhash64
    skips null args (hashing just the seed to a non-null constant), so
    without the explicit guard null-key rows would gate differently
    between md5 and xxhash64 (ADVICE r5)."""
    from pyspark.sql import functions as F

    from streamingpro_spark.operators.dedup import portable_hash64
    df = spark.createDataFrame([("a",), (None,)], "s: string")
    for impl in ("md5", "xxhash64"):
        rows = {r["s"]: r["h"] for r in df.select(
            "s", portable_hash64(F.col("s"), impl=impl).alias("h")).collect()}
        assert rows[None] is None, impl
        assert rows["a"] is not None, impl


def test_bloom_max_bits_guard(engine):
    """Fail fast when the derived bitmap exceeds maxBits — before any
    job runs, naming the remedies (VERDICT r5 ask #2)."""
    import pytest as _pytest
    with _pytest.raises(Exception, match="maxBits"):
        engine.execute("""
        select 1 as doc_id, "x" as text as bref;
        select 2 as doc_id, "y" as text as bnew;
        run bnew as BloomFilterDedup.`` where refTable="bref"
        and expectedItems="100000000000" and fpp="0.01" as bad3;
        """)
    # an explicit higher maxBits unblocks sizing (still a small real m
    # here because expectedItems drives m, so use a modest cap override)
    engine.execute("""
    select 1 as doc_id, "x" as text as bref4;
    select 2 as doc_id, "y" as text as bnew4;
    run bnew4 as BloomFilterDedup.`` where refTable="bref4"
    and expectedItems="100000" and maxBits="10000000" as ok4;
    """)


def test_bloom_filter_dedup_annotate_and_validation(engine):
    import json
    import pytest as _pytest
    ref = [(1, "alpha beta"), (2, "gamma delta")]
    new = [(10, "alpha beta"), (11, "epsilon zeta")]
    rj = "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in ref)
    nj = "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in new)
    df = engine.execute(f"""
    set refj2 = '''{rj}''';
    set newj2 = '''{nj}''';
    load jsonStr.`refj2` as refc2;
    load jsonStr.`newj2` as newb2;
    run newb2 as BloomFilterDedup.`` where refTable="refc2"
    and mode="annotate" and fpp="0.001" as ann;
    select doc_id, might_dup from ann as final2;
    """)
    got = {r["doc_id"]: r["might_dup"] for r in df.collect()}
    assert got[10] is True            # true member: bloom never misses
    # doc 11 is overwhelmingly False at fpp=0.001 but probabilistic —
    # only the guaranteed no-false-negative side is asserted
    with _pytest.raises(Exception, match="refTable"):
        engine.execute("""
        select 1 as doc_id, "x" as text as t;
        run t as BloomFilterDedup.`` as bad;
        """)
    with _pytest.raises(Exception, match="fpp"):
        engine.execute("""
        select 1 as doc_id, "x" as text as t2;
        run t2 as BloomFilterDedup.`` where refTable="t2" and fpp="1.5"
        as bad2;
        """)


def test_shingles_col_zip_edges(spark):
    """The round-11 zip-based shingles_col must be byte-identical to
    the old per-position slice form on every edge case: normal docs,
    docs shorter than n (single truncated shingle), empty text ([''])
    and NULL text ([''] via the coalesce), and multi-space runs."""
    from pyspark.sql import functions as F
    from streamingpro_spark.operators.dedup import shingles_col, tokens_col

    def old_shingles(text, n=3):
        toks = tokens_col(text)
        idx = F.sequence(F.lit(1),
                         F.greatest(F.size(toks) - (n - 1), F.lit(1)))
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ",
                                                   F.slice(toks, i, n))))

    rows = [(1, "a b c d e"), (2, "a b"), (3, "a"), (4, ""), (5, None),
            (6, "x  y   z"), (7, "a b c"), (8, "dup dup dup dup")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for n in (1, 2, 3, 5):
        bad = (df.select(old_shingles(F.col("text"), n).alias("a"),
                         shingles_col(F.col("text"), n).alias("b"))
               .filter((F.col("a") != F.col("b"))
                       | F.col("a").isNull() | F.col("b").isNull())
               .count())
        assert bad == 0, f"n={n}: zip shingles diverge from legacy form"
