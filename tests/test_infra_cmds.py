"""Infra command ETs + model self-describe loaders."""

import http.server
import json
import threading
import time

import pytest


def test_delta_command_gated(engine):
    """Without delta on the classpath, !delta raises a clear install hint."""
    with pytest.raises(Exception, match="[Dd]elta"):
        engine.execute("!delta history /tmp/nope;")


def test_kafka_command_gated(engine):
    with pytest.raises(Exception, match="kafka|Kafka"):
        engine.execute('run command as KafkaCommand.`` where subscribe="t" and parameters="[\\"sampleData\\"]";')


def test_python_command(engine):
    df = engine.execute("""
    select 1 as a union all select 2 as a as t1;
    run command as PythonCommand.`` where input="t1"
        and code='''output_df = input_df.assign(b=input_df.a * 10)''' as out;
    """)
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    assert rows == [(1, 10), (2, 20)]


def test_callback_registers_and_fires(engine, tmp_path):
    hits = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            hits.append(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        engine.execute(f'!callback post http://127.0.0.1:{port}/cb when "started,terminated";')
        spark = engine.spark
        q = (spark.readStream.format("rate").option("rowsPerSecond", "1").load()
             .writeStream.format("noop").start())
        time.sleep(2)
        q.stop()
        deadline = time.time() + 15
        while time.time() < deadline and len(hits) < 2:
            time.sleep(0.5)
        assert any("id" in h for h in hits)
    finally:
        srv.shutdown()


def test_model_example_loader(engine):
    df = engine.execute("load modelExample.`RandomForest` as ex;")
    row = df.collect()[0]
    assert row["name"] == "RandomForest"


def test_model_explain_saved(engine, tmp_path):
    engine.execute(f"""
    select vec_dense(array(cast(id as double))) as features,
           cast(id % 2 as double) as label from range(50) as training;
    train training as RandomForest.`{tmp_path}/m` where maxDepth="2";
    """)
    df = engine.execute(f"load modelExplain.`{tmp_path}/m` as info;")
    names = {r["name"] for r in df.collect()}
    assert "class" in names or "maxDepth" in names


def test_model_params_loader(engine):
    df = engine.execute("load modelParams.`MinHashDedup` as p;")
    params = {r[0] for r in df.collect()}
    assert "numHashes" in params


def test_fs_macro_block_string(engine, tmp_path):
    """!fs args flow through '''json''' block-string parameters (the
    path that silently passed empty before the block-string fix)."""
    (tmp_path / "a.txt").write_text("x")
    (tmp_path / "b.txt").write_text("yy")
    df = engine.execute(f"!fs ls {tmp_path};")
    names = [r["name"] for r in df.collect()]
    assert names == ["a.txt", "b.txt"]


def test_profiler_macro(engine, sf_dir):
    engine.execute(f"load parquet.`{sf_dir}/nation.parquet` as nat;")
    df = engine.execute('!profiler explain "select * from nat";')
    text = " ".join(str(r[0]) for r in df.collect())
    assert "nat" in text or "Scan" in text or "Relation" in text


def test_jdbc_macro_reaches_connection(engine):
    """!jdbc expands to the JDBC ET and merges connect meta; without a
    driver jar the connection attempt surfaces a JDBC-level error (not a
    macro/parse error)."""
    import pytest as _pytest
    engine.execute('connect jdbc where url="jdbc:nodb://x" and driver="no.Driver" as db9;')
    with _pytest.raises(Exception, match="[Dd]river|jdbc|SQLException"):
        engine.execute('!jdbc db9 "select 1";')


def test_save_mode_error_names_culprit(engine):
    import pytest as _pytest
    with _pytest.raises(Exception, match="invalid save mode 'frobnicate'"):
        engine.execute("select 1 as x as t1; save frobnicate t1 as parquet.`/tmp/zz`;")


def test_plugin_add_registers_et(engine, tmp_path):
    plugin = tmp_path / "myplugin.py"
    plugin.write_text("""
from pyspark.sql import functions as F
from streamingpro_spark.operators.base import ETAlgorithm
from streamingpro_spark.operators.registry import register_et

@register_et("DoubleUp")
class DoubleUp(ETAlgorithm):
    def train(self, df, path, params, context=None):
        col = params.get("col", "v")
        return df.withColumn(col, F.col(col) * 2)
""")
    out = engine.execute(f"!plugin add {plugin};")
    assert "DoubleUp" in out.first()["registered"]
    df = engine.execute("""
    select 21 as v as t_in;
    run t_in as DoubleUp.`` as t_out;
    """)
    assert df.first()["v"] == 42


def test_mlsql_api_and_conf_tables(engine):
    df = engine.execute("load mlsqlAPI.`` as api; "
                        "select * from api as out;")
    paths = {r["path"] for r in df.collect()}
    assert "/run/script" in paths and "/runningjobs" in paths
    engine.execute('set probe_var = "42";')
    df = engine.execute("load mlsqlConf.`` as conf; "
                        "select * from conf as out;")
    kv = {r["k"]: r["v"] for r in df.collect()}
    assert kv["env.probe_var"] == "42"
    assert any(k.startswith("spark.") for k in kv)


def test_unstructured_source(engine, tmp_path):
    (tmp_path / "doc.bin").write_bytes(b"raw-bytes-here")
    df = engine.execute(f"""
    load unStructured.`{tmp_path}/doc.bin` as files;
    select path, length, content from files as out;
    """)
    row = df.collect()[0]
    assert row["length"] == 14
    assert bytes(row["content"]) == b"raw-bytes-here"


def test_show_commands_and_et(engine):
    """!show commands / !show et / !show et/<Name> (reference
    ShowCommand.scala case arms)."""
    cmds = {r["command"] for r in engine.execute("!show commands;").collect()}
    assert "!split" in cmds and "!withWatermark" in cmds
    ets = {r["name"] for r in engine.execute("!show et;").collect()}
    assert "MinHashDedup" in ets and "TfIdf" in ets
    params = engine.execute("!show et/RateSampler;").collect()
    assert any(r["param"] == "sampleRate" for r in params)


def test_delta_macro_on_versioned_parquet_lake(engine, tmp_path):
    """!delta history / !delta compact work natively on versionedParquet
    lakes (no delta-spark needed); real delta paths still render the
    install hint."""
    lake = tmp_path / "vlake"
    engine.execute(f"""
    select explode(sequence(1, 30)) as id as vt;
    save overwrite vt as versionedParquet.`{lake}`;
    select explode(sequence(31, 40)) as id as vt2;
    save append vt2 as versionedParquet.`{lake}`;
    """)
    hist = engine.execute(f"!delta history {lake};").collect()
    assert [(r["version"], r["mode"]) for r in hist] == \
        [(0, "overwrite"), (1, "append")]
    out = engine.execute(f"!delta compact {lake} 1;").collect()[0]
    assert out["files"] == 1
    # the compacted snapshot is a new overwrite commit with all 40 rows
    df = engine.execute(f"load versionedParquet.`{lake}` as z; "
                        "select count(*) as n from z as out;")
    assert df.collect()[0]["n"] == 40
    hist2 = engine.execute(f"!delta history {lake};").collect()
    assert hist2[-1]["mode"] == "overwrite" and hist2[-1]["version"] == 2
    # vacuum with retain=0: versions superseded by the compact
    # overwrite (v0, v1) reclaim; an orphan dir reclaims; history
    # keeps all records, the latest snapshot stays readable
    import os
    os.makedirs(lake / "v=9")                   # uncommitted orphan
    out = engine.execute(f"!delta vacuum {lake} 0;").collect()[0]
    assert (out["orphansRemoved"], out["versionsRemoved"]) == (1, 2)
    assert sorted(d for d in os.listdir(lake) if d.startswith("v=")) \
        == ["v=2"]
    df2 = engine.execute(f"load versionedParquet.`{lake}` as z2; "
                         "select count(*) as n from z2 as out2;")
    assert df2.collect()[0]["n"] == 40
    hist3 = engine.execute(f"!delta history {lake};").collect()
    assert [r["version"] for r in hist3] == [0, 1, 2]
    # a second vacuum is a no-op
    out2 = engine.execute(f"!delta vacuum {lake} 0;").collect()[0]
    assert (out2["orphansRemoved"], out2["versionsRemoved"]) == (0, 0)


def test_python_macro_reference_forms(engine):
    """!python env / on <tbl> <code> named <out> (reference
    PythonCommand.scala:171-223 arg forms)."""
    r = engine.execute('!python env "PYTHON_ENV=prod";').collect()[0]
    assert (r["kind"], r["k"], r["v"]) == ("env", "PYTHON_ENV", "prod")
    engine.execute("""
    select 3 as a union all select 4 as a as py_src;
    !python on py_src '''output_df = input_df.assign(b=input_df.a + 1)''' named py_out;
    """)
    rows = sorted((r["a"], r["b"]) for r in
                  engine.spark.table("py_out").collect())
    assert rows == [(3, 4), (4, 5)]
    df = engine.execute("!python '''output_df = None''';")
    assert df.collect()[0]["status"] == "ok"


def test_python_macro_bare_multi_token_code(engine):
    """Unquoted multi-token code (the pre-round-4 form) still executes
    (review finding: the json arg split must re-join it)."""
    df = engine.execute("!python import os;")
    assert df.collect()[0]["status"] == "ok"


def test_vacuumed_version_renders_clear_error(engine, tmp_path):
    lake = tmp_path / "vlake2"
    engine.execute(f"""
    select 1 as id as va;
    save overwrite va as versionedParquet.`{lake}`;
    select 2 as id as vb;
    save overwrite vb as versionedParquet.`{lake}`;
    """)
    engine.execute(f"!delta vacuum {lake} 0;")
    with pytest.raises(Exception, match="removed by vacuum"):
        engine.execute(
            f'load versionedParquet.`{lake}` where versionAsOf="0" as z;')
    # the surviving snapshot still reads
    df = engine.execute(f"load versionedParquet.`{lake}` as z2; "
                        "select id from z2 as out;")
    assert df.collect()[0]["id"] == 2


def test_lake_diff_classification_and_guards(engine, tmp_path):
    """LakeDiff (round-11): added/removed/changed keyed diff of a
    candidate table against a versionedParquet snapshot — both shapes
    (pre-commit candidate, version-to-version), identity diff empty,
    digestCols subset narrows the change set, duplicate keys rendered,
    NULL keys excluded."""
    import pytest as _pytest
    lake = tmp_path / "ld_lake"
    engine.execute(f"""
    select id as k, concat('v', cast(id as string)) as payload,
           cast(id % 3 as int) as tag from range(0, 100) as ld0;
    save overwrite ld0 as versionedParquet.`{lake}`;
    -- v1: drop 0-9 (removed), add 100-109, change payload for 20-24
    select id as k,
           case when id between 20 and 24
                then concat('vX', cast(id as string))
                else concat('v', cast(id as string)) end as payload,
           cast(id % 3 as int) as tag
    from range(10, 110) as ld1;
    save overwrite ld1 as versionedParquet.`{lake}`;
    """)
    pull = lambda t: {r["change"]: r["n"] for r in engine.execute(
        f"select change, count(*) as n from {t} group by change as o;"
    ).collect()}
    engine.execute(f"""
    run ld1 as LakeDiff.`{lake}` where versionAsOf="0" and keyCol="k"
        as d_pre;
    """)
    assert pull("d_pre") == {"added": 10, "removed": 10, "changed": 5}
    engine.execute(f"""
    load versionedParquet.`{lake}` where versionAsOf="1" as ld_s1;
    run ld_s1 as LakeDiff.`{lake}` where versionAsOf="0" and keyCol="k"
        as d_vv;
    """)
    assert pull("d_vv") == {"added": 10, "removed": 10, "changed": 5}
    # identity diff: latest vs latest -> empty
    n = engine.execute(f"""
    load versionedParquet.`{lake}` as ld_latest;
    run ld_latest as LakeDiff.`{lake}` where keyCol="k" as d_id;
    select * from d_id as o;
    """).count()
    assert n == 0
    # digest on tag only: payload edits disappear from the change set
    engine.execute(f"""
    run ld1 as LakeDiff.`{lake}` where versionAsOf="0" and keyCol="k"
        and digestCols="tag" as d_tag;
    """)
    assert pull("d_tag") == {"added": 10, "removed": 10}
    # the changed rows carry BOTH digests; added/removed carry one
    rows = engine.execute(
        "select * from d_pre where change = 'changed' as o;").collect()
    assert all(r["old_digest"] and r["new_digest"]
               and r["old_digest"] != r["new_digest"] for r in rows)
    # duplicate key on the input side: rendered error at action time
    with _pytest.raises(Exception, match="not unique"):
        engine.execute(f"""
        select * from ld1 union all select * from ld1 where k = 50
        as ld_dup;
        run ld_dup as LakeDiff.`{lake}` where versionAsOf="0"
            and keyCol="k" as d_dup;
        select * from d_dup as o;
        """).count()
    # NULL keys excluded from the diff, not matched or multiplied
    engine.execute(f"""
    select cast(null as bigint) as k, 'vnull' as payload,
           cast(0 as int) as tag
    union all select * from ld1 as ld_null;
    run ld_null as LakeDiff.`{lake}` where versionAsOf="0"
        and keyCol="k" as d_null;
    """)
    assert pull("d_null") == {"added": 10, "removed": 10, "changed": 5}
    # param errors
    with _pytest.raises(ValueError, match="keyCol"):
        engine.execute(
            f'run ld1 as LakeDiff.`{lake}` where keyCol="nope" as x;')
    with _pytest.raises(ValueError, match="digestCols"):
        engine.execute(f'run ld1 as LakeDiff.`{lake}` where keyCol="k" '
                       f'and digestCols="bogus" as x;')
