"""Analyzer pass (reference: auth pass D, AuthSpec MLSQLTable assertions)."""


def test_analyze_load_select_save(spark):
    from streamingpro_spark.analyzer import analyze
    res = analyze("""
    load parquet.`/data/lineitem.parquet` as lineitem;
    select l_returnflag, sum(l_quantity) as q from lineitem
      join orders on l_orderkey = o_orderkey
      group by l_returnflag as summary;
    save overwrite summary as jdbc.`db1.result`;
    """, spark).as_dict()
    ins = {(t["table"], t["operateType"]) for t in res["inputs"]}
    outs = {(t["table"], t["operateType"]) for t in res["outputs"]}
    assert ("/data/lineitem.parquet", "load") in ins
    assert ("lineitem", "select") in ins
    assert ("orders", "select") in ins
    assert ("summary", "save") in ins
    assert ("summary", "select") in outs
    assert ("db1.result", "save") in outs
    src = {t["table"]: t["sourceType"] for t in res["outputs"]}
    assert src["db1.result"] == "jdbc"


def test_analyze_train(spark):
    from streamingpro_spark.analyzer import analyze
    res = analyze("""
    load parquet.`/d/t.parquet` as t1;
    train t1 as RandomForest.`/models/rf` where maxDepth="3" as trained;
    """, spark).as_dict()
    assert {"table": "t1", "operateType": "train", "sourceType": "temp",
            "db": None} in res["inputs"]
    assert any(t["table"] == "trained" for t in res["outputs"])


def test_analyze_does_not_execute(spark):
    """analyze must not touch data — nonexistent paths are fine."""
    from streamingpro_spark.analyzer import analyze
    res = analyze("load parquet.`/definitely/not/there.parquet` as x;",
                  spark).as_dict()
    assert res["inputs"][0]["table"] == "/definitely/not/there.parquet"


def test_analyze_env_substitution(spark):
    from streamingpro_spark.analyzer import analyze
    res = analyze("""
    set base = "/data/root";
    load parquet.`${base}/a.parquet` as a;
    """, spark).as_dict()
    assert res["inputs"][0]["table"] == "/data/root/a.parquet"


def test_rest_analyze_mode(spark):
    from streamingpro_spark.server import MLSQLServer
    srv = MLSQLServer(spark).start()
    try:
        import json
        import urllib.request
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/run/script",
            data=json.dumps({"sql": "select * from secret_table as out;",
                             "executeMode": "analyze"}).encode(),
            headers={"Content-Type": "application/json"})
        res = json.loads(urllib.request.urlopen(req, timeout=30).read())
        assert any(t["table"] == "secret_table" for t in res["inputs"])
    finally:
        srv.stop()


def test_engine_table_auth_hook(spark, sf_dir):
    """Pluggable pre-execution TableAuth (reference pass D): a rejecting
    hook aborts the script BEFORE any statement runs."""
    import pytest
    from streamingpro_spark import Engine

    seen = {}

    def deny_lineitem(owner, tables):
        seen["owner"] = owner
        seen["inputs"] = [t["table"] for t in tables["inputs"]]
        return not any("lineitem" in t for t in seen["inputs"])

    eng = Engine(spark, owner="bob", table_auth=deny_lineitem)
    with pytest.raises(PermissionError, match="bob"):
        eng.execute(f"""
        load parquet.`{sf_dir}/lineitem.parquet` as li;
        select count(*) as n from li as auth_out;
        """)
    assert seen["owner"] == "bob"
    assert any("lineitem" in t for t in seen["inputs"])
    # the rejected script never registered its output view
    assert not spark.catalog.tableExists("auth_out")
    # an allowed script passes through the same hook
    df = eng.execute(f"""
    load parquet.`{sf_dir}/region.parquet` as reg;
    select count(*) as n from reg as auth_ok;
    """)
    assert df.collect()[0]["n"] == 5


def test_table_auth_not_bypassed_by_run_script(spark, sf_dir):
    """`!runScript '''...'''` must run the sub-script under the SAME
    auth policy (review finding: the inner Engine previously had none)."""
    import pytest
    from streamingpro_spark import Engine

    def deny_lineitem(owner, tables):
        return not any("lineitem" in t["table"] for t in tables["inputs"])

    eng = Engine(spark, owner="eve", table_auth=deny_lineitem)
    with pytest.raises(PermissionError):
        eng.execute(
            f"!runScript '''load parquet.`{sf_dir}/lineitem.parquet` as li; "
            "select count(*) as n from li as x;''' named out;")


def test_table_auth_sees_through_includes(spark, sf_dir):
    """Tables reached via `include` are analyzed too."""
    import pytest
    from streamingpro_spark import Engine

    def deny_lineitem(owner, tables):
        return not any("lineitem" in t["table"] for t in tables["inputs"])

    eng = Engine(spark, owner="eve", table_auth=deny_lineitem)
    eng.context.env["hidden"] = (
        f"load parquet.`{sf_dir}/lineitem.parquet` as li2;")
    with pytest.raises(PermissionError):
        eng.execute("include script.`hidden`; "
                    "select count(*) as n from li2 as out;")


def test_table_auth_not_bypassed_by_iterator_command(spark, sf_dir):
    """IteratorCommand's per-batch sub-engine inherits the policy too
    (second-pass review finding)."""
    import pytest
    from streamingpro_spark import Engine

    def deny_lineitem(owner, tables):
        return not any("lineitem" in t["table"] for t in tables["inputs"])

    eng = Engine(spark, owner="eve", table_auth=deny_lineitem)
    with pytest.raises(PermissionError):
        eng.execute(f"""
        select 1 as a as seed;
        run seed as IteratorCommand.`` where script='''
        load parquet.`{sf_dir}/lineitem.parquet` as li3;
        select count(*) as n from li3 as x;''' as out;
        """)


def test_table_auth_allows_set_then_include(spark):
    """set-then-include (runtime include variable) still executes under
    an auth-enabled engine, and the spliced text IS auth-checked."""
    import pytest
    from streamingpro_spark import Engine

    eng = Engine(spark, owner="ok",
                 table_auth=lambda o, t: not any(
                     "forbidden" in x["table"] for x in t["inputs"]))
    df = eng.execute("""
    set body = '''select 5 as v as inc_t;''';
    include script.`body`;
    select v from inc_t as out;
    """)
    assert df.collect()[0]["v"] == 5
    eng.context.env.pop("body", None)
    with pytest.raises(PermissionError):
        eng.execute("""
        set body = '''load parquet.`/data/forbidden.parquet` as f;''';
        include script.`body`;
        """)


def test_analyzer_expands_macros(spark):
    """`!split docs by lang rate 0.9,0.1 named s` reads `docs` — the
    macro must appear in the access list (auth completeness)."""
    from streamingpro_spark.analyzer import analyze
    res = analyze("!split docs by lang rate 0.9,0.1 named s;").as_dict()
    assert any(t["table"] == "docs" for t in res["inputs"])
    assert any(t["table"] == "s" for t in res["outputs"])


def test_analyzer_multipart_table_names(spark):
    from streamingpro_spark.analyzer import analyze
    res = analyze("select * from warehouse.orders as t;", spark=spark)
    assert "warehouse.orders" in [r.table for r in res.inputs]


def test_analyzer_set_overwrite_semantics(spark):
    from streamingpro_spark.analyzer import analyze
    res = analyze("""
    set p = "staging";
    set p = "prod";
    load parquet.`/data/${p}` as t;
    """, spark=spark)
    assert any(r.table == "/data/prod" for r in res.inputs)


def test_analyzer_register_reads_model_path(spark):
    from streamingpro_spark.analyzer import analyze
    res = analyze("register RandomForest.`/secure/models/rf` as p;",
                  spark=spark)
    assert any(r.table == "/secure/models/rf" for r in res.inputs)
