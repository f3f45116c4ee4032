"""Structured Streaming e2e (reference: StreamSpec/Stream2Spec pattern —
set streamName → load stream → transform → save append → assert active
query; SURVEY.md §2.7)."""

import time

import pytest


def _wait_for(cond, timeout=30, step=0.5):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(step)
    return False


def test_stream_file_source_to_memory(engine, sf_dir, tmp_path):
    """streamParquet file source → tumbling window agg → memory sink."""
    spark = engine.spark
    engine.execute(f"""
    set streamName = "evstream";
    load streamParquet.`{sf_dir}/events.parquet` as events_raw;
    select event_type, count(*) as n from events_raw group by event_type as agg;
    save complete agg as memory.`` where checkpointLocation="{tmp_path}/ck"
        and duration="0" and queryName="evstream";
    """)
    q = engine.context.jobs.get("evstream")
    assert q is not None
    try:
        assert _wait_for(lambda: q.lastProgress is not None
                         and q.lastProgress["numInputRows"] >= 0)
        q.processAllAvailable()
        rows = spark.sql("select * from evstream").collect()
        types = {r["event_type"] for r in rows}
        assert "click" in types
    finally:
        q.stop()


def test_stream_watermark_option(engine, sf_dir, tmp_path):
    """eventTimeCol/delayThreshold load options attach a watermark
    (reference LoadAdaptor.scala:148-157)."""
    engine.execute(f"""
    set streamName = "wmstream";
    load streamParquet.`{sf_dir}/events.parquet` where eventTimeCol="ts"
        and delayThreshold="10 seconds" as ev;
    select window(ts, '1 hour') as w, count(*) as n from ev group by window(ts, '1 hour') as agg;
    save append agg as memory.`` where checkpointLocation="{tmp_path}/ckwm"
        and duration="0" and queryName="wmstream";
    """)
    q = engine.context.jobs.get("wmstream")
    assert q is not None
    try:
        q.processAllAvailable()
        # watermark shows up in progress
        assert q.lastProgress is not None
    finally:
        q.stop()


def test_with_watermark_macro(engine, sf_dir):
    df = engine.execute(f"""
    set streamName = "wm2";
    load streamParquet.`{sf_dir}/events.parquet` as ev2;
    !withWatermark ev2 ts "5 seconds";
    """)
    assert df.isStreaming


def test_kill_stream(engine, sf_dir, tmp_path):
    engine.execute(f"""
    set streamName = "killme";
    load streamParquet.`{sf_dir}/events.parquet` as ev3;
    select * from ev3 as passthrough;
    save append passthrough as parquet.`{tmp_path}/out` where
        checkpointLocation="{tmp_path}/ck3" and duration="0";
    """)
    q = engine.context.jobs["killme"]
    assert q.isActive
    engine.execute("!kill killme;")
    assert _wait_for(lambda: not q.isActive)


def test_stream_callback_listener(spark):
    from streamingpro_spark.streaming.manager import get_listener
    listener = get_listener(spark)
    seen = []
    listener.add_callback("started,terminated", seen.append)
    df = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    q = df.writeStream.format("noop").start()
    try:
        assert _wait_for(lambda: any("id" in p for p in seen))
    finally:
        q.stop()


def test_value_schema_decode(engine):
    """kafka-style valueFormat/valueSchema decode on a batch table
    (parser path LoadAdaptor.scala:167-199)."""
    spark = engine.spark
    spark.createDataFrame(
        [(b"k1", b'{"x": 5, "name": "a"}'), (b"k2", b'{"x": 7, "name": "b"}')],
        "key binary, value binary").createOrReplaceTempView("kafka_like")
    from streamingpro_spark.sources.value_parser import decode_value
    out = decode_value(spark.table("kafka_like"), "json",
                       "st(field(x,long),field(name,string))")
    rows = {r["name"]: r["x"] for r in out.collect()}
    assert rows == {"a": 5, "b": 7}
    assert "kafkaValue" in out.columns


def test_schema_dsl():
    from streamingpro_spark.sources.value_parser import parse_schema_dsl
    s = parse_schema_dsl("st(field(a,integer),field(b,array(string)),field(c,map(string,double)))")
    assert s.fieldNames() == ["a", "b", "c"]
    assert s["b"].dataType.simpleString() == "array<string>"
    assert s["c"].dataType.simpleString() == "map<string,double>"


def test_mock_stream(engine, tmp_path):
    """mockStream equivalent: batch table replayed via rate join."""
    engine.execute("""
    select explode(sequence(0, 9)) as v as batch_src;
    """)
    engine.execute("""
    set streamName = "mock1";
    load mockStream.`batch_src` where stepSizeRange="0-5" as mocked;
    select v from mocked as mocked_v;
    """)
    df = engine.context.spark.table("mocked_v")
    assert df.isStreaming
    q = (df.writeStream.format("memory").queryName("mock_sink")
         .option("checkpointLocation", str(tmp_path / "ckm")).start())
    try:
        assert _wait_for(
            lambda: engine.spark.sql("select count(*) as c from mock_sink")
            .collect()[0]["c"] >= 3, timeout=30)
    finally:
        q.stop()


def test_stateful_count(engine, sf_dir, tmp_path):
    """applyInPandasWithState running per-key aggregate across batches."""
    engine.execute(f"""
    set streamName = "statecount";
    load streamParquet.`{sf_dir}/events.parquet` as sev;
    run sev as StatefulCount.`` where keyCol="user_id" and valueCol="value" as counted;
    """)
    df = engine.spark.table("counted")
    assert df.isStreaming
    q = (df.writeStream.format("memory").queryName("statecount_sink")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "cks")).start())
    try:
        q.processAllAvailable()
        rows = engine.spark.sql("""
            select key, max(events) as events from statecount_sink group by key
        """).collect()
        got = {r["key"]: r["events"] for r in rows}
        import pyspark.sql.functions as F
        expected = {r["user_id"]: r["n"] for r in
                    engine.spark.read.parquet(f"{sf_dir}/events.parquet")
                    .groupBy("user_id").agg(F.count("*").alias("n")).collect()}
        assert got == expected
    finally:
        q.stop()


def test_streaming_dedup(engine, sf_dir, tmp_path):
    engine.execute(f"""
    set streamName = "sdedup";
    load streamParquet.`{sf_dir}/events.parquet` as dev;
    run dev as StreamingDedup.`` where dedupCols="user_id,event_type" as dd;
    """)
    df = engine.spark.table("dd")
    assert df.isStreaming
    q = (df.writeStream.format("memory").queryName("sdedup_sink")
         .option("checkpointLocation", str(tmp_path / "ckd")).start())
    try:
        q.processAllAvailable()
        n = engine.spark.sql(
            "select count(*) as c from (select distinct user_id, event_type from sdedup_sink)"
        ).collect()[0]["c"]
        total = engine.spark.sql("select count(*) as c from sdedup_sink").collect()[0]["c"]
        assert n == total  # every (user, type) pair appears exactly once
    finally:
        q.stop()


def test_foreach_batch_script_sink(engine, sf_dir, tmp_path):
    """`save ... as custom.`` where batchScript=...` runs an MLSQL
    sub-script per micro-batch (reference MLSQLForeachBatchRunner)."""
    out = tmp_path / "fb_out"
    engine.execute(f"""
    set streamName = "fbstream";
    load streamParquet.`{sf_dir}/events.parquet` as fev;
    select user_id, value from fev as fsel;
    save append fsel as custom.`` where checkpointLocation="{tmp_path}/ckfb"
        and duration="0" and batchScript='''
        select user_id, sum(value) as sv from __batch_df__ group by user_id as agg_b;
        save overwrite agg_b as parquet.`{out}`;
        ''';
    """)
    q = engine.context.jobs["fbstream"]
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = engine.spark.read.parquet(str(out))
    assert got.count() > 0
    assert set(got.columns) == {"user_id", "sv"}


def test_batchscript_vp_save_exactly_once(engine, tmp_path):
    """versionedParquet saves inside a foreachBatch batchScript are
    stamped with the stream's (txn, batchId) — a REPLAYED micro-batch
    (crash between the save and the streaming checkpoint) skips its
    duplicate append (round-8).  Simulated by re-running the sub-script
    save under the same injected batch env, the way the custom sink's
    run_batch sets it."""
    lake = tmp_path / "xo_lake"
    engine.execute(f"""
    select 1 as id as xo_seed;
    save overwrite xo_seed as versionedParquet.`{lake}`;
    """)
    engine.context.env["__batch_id__"] = "7"
    engine.context.env["__stream_txn__"] = "ck-xyz"
    try:
        engine.execute(f"""
        select 2 as id as xo_b;
        save append xo_b as versionedParquet.`{lake}`;
        """)
        # replay of the same micro-batch: must NOT commit again
        engine.execute(f"""
        select 2 as id as xo_b;
        save append xo_b as versionedParquet.`{lake}`;
        """)
    finally:
        engine.context.env.pop("__batch_id__")
        engine.context.env.pop("__stream_txn__")
    # a different batch of the same transaction still commits
    engine.context.env["__batch_id__"] = "8"
    engine.context.env["__stream_txn__"] = "ck-xyz"
    try:
        engine.execute(f"""
        select 3 as id as xo_c;
        save append xo_c as versionedParquet.`{lake}`;
        """)
    finally:
        engine.context.env.pop("__batch_id__")
        engine.context.env.pop("__stream_txn__")
    hist = engine.execute(f"!delta history {lake};").collect()
    assert [r["version"] for r in hist] == [0, 1, 2]
    rows = engine.execute(f"load versionedParquet.`{lake}` as xo_all; "
                          "select id from xo_all as out;").collect()
    assert sorted(r["id"] for r in rows) == [1, 2, 3]


def test_commit_of_batch_empty_slice_full_snapshot_schema(engine,
                                                          tmp_path):
    """The commitOfBatch no-commit EMPTY slice must carry the FULL
    snapshot schema (mergeSchema honored across commit dirs), not the
    newest commit dir's alone: on a schema-evolving lake whose latest
    commit lacks columns earlier commits carry, downstream derivations
    would otherwise see a narrower schema than a real commit read
    (advisor finding, round 11)."""
    lake = tmp_path / "es_lake"
    engine.execute(f"""
    select 1 as id, 'x' as a as es_seed;
    save overwrite es_seed as versionedParquet.`{lake}`;
    select 2 as id, 7 as b as es_evo;
    save append es_evo as versionedParquet.`{lake}`;
    """)
    # a batch key that never committed: the read must be EMPTY but
    # carry id, a AND b (v=1, the latest commit, has no `a`)
    engine.context.env["__batch_id__"] = "42"
    engine.context.env["__stream_txn__"] = "ck-empty"
    try:
        out = engine.execute(f"""
        load versionedParquet.`{lake}` where commitOfBatch="true"
            and mergeSchema="true" as es_slice;
        select * from es_slice as out;
        """)
    finally:
        engine.context.env.pop("__batch_id__")
        engine.context.env.pop("__stream_txn__")
    assert out.count() == 0
    assert set(out.columns) == {"id", "a", "b"}, out.columns


def test_stream_stream_join(engine, sf_dir, tmp_path):
    """Watermarked stream-stream inner join with a time-range condition
    (view within 30 min after a click), verified against the batch
    ground truth on the same fixture."""
    spark = engine.spark
    engine.execute(f"""
    set streamName = "ssj";
    load streamParquet.`{sf_dir}/events.parquet` where eventTimeCol="ts"
        and delayThreshold="2 hours" as ssj_clicks;
    load streamParquet.`{sf_dir}/events.parquet` where eventTimeCol="ts"
        and delayThreshold="2 hours" as ssj_views;
    select c.user_id, c.ts as click_ts, v.ts as view_ts
    from ssj_clicks c join ssj_views v
      on c.user_id = v.user_id
     and v.ts >= c.ts and v.ts <= c.ts + interval 30 minutes
     and c.event_type = 'click' and v.event_type = 'view' as ssj_joined;
    save append ssj_joined as memory.`` where checkpointLocation="{tmp_path}/ckssj"
        and duration="0" and queryName="ssj";
    """)
    q = engine.context.jobs.get("ssj")
    assert q is not None
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select count(*) as n from ssj").first()["n"]
    finally:
        q.stop()
    expected = engine.execute(f"""
    load parquet.`{sf_dir}/events.parquet` as ev_batch;
    select count(*) as n
    from ev_batch c join ev_batch v
      on c.user_id = v.user_id
     and v.ts >= c.ts and v.ts <= c.ts + interval 30 minutes
     and c.event_type = 'click' and v.event_type = 'view' as out;
    """).first()["n"]
    assert expected > 0
    assert got == expected


def test_streaming_session_window(engine, sf_dir, tmp_path):
    """Native session_window aggregation in a streaming query with a
    watermark (SURVEY §2.7: session windows are a free Spark upgrade)."""
    spark = engine.spark
    engine.execute(f"""
    set streamName = "sesswin";
    load streamParquet.`{sf_dir}/events.parquet` where eventTimeCol="ts"
        and delayThreshold="1 hour" as sw_ev;
    select session_window(ts, '30 minutes') as sw, user_id, count(*) as n
    from sw_ev group by session_window(ts, '30 minutes'), user_id as sw_agg;
    save append sw_agg as memory.`` where checkpointLocation="{tmp_path}/cksw"
        and duration="0" and queryName="sesswin";
    """)
    q = engine.context.jobs.get("sesswin")
    assert q is not None
    try:
        q.processAllAvailable()
        # append mode only emits sessions finalized by the watermark;
        # with a bounded fixture most sessions close
        n = spark.sql("select count(*) as c from sesswin").first()["c"]
        assert n > 0
        row = spark.sql("select sw.start, sw.end, n from sesswin limit 1").first()
        assert row["end"] >= row["start"] and row["n"] >= 1
    finally:
        q.stop()


def test_streaming_sessionizer(engine, sf_dir, tmp_path):
    """Custom stateful sessionizer with event-time timeout: sessions
    closed by the watermark match the batch gaps-and-islands session
    count for the same (closed) horizon."""
    spark = engine.spark
    engine.execute(f"""
    set streamName = "sessionizer";
    load streamParquet.`{sf_dir}/events.parquet` where eventTimeCol="ts"
        and delayThreshold="1 second" as zev;
    run zev as StreamingSessionizer.`` where keyCol="user_id" and tsCol="ts"
        and gap="1800" as sessions;
    """)
    df = spark.table("sessions")
    assert df.isStreaming
    q = (df.writeStream.format("memory").queryName("sessionizer_sink")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckz")).start())
    try:
        q.processAllAvailable()
        rows = spark.sql("""
            select key, session_start, n_events from sessionizer_sink
        """).collect()
        assert rows, "no sessions closed by the watermark"
        got = {(r["key"], r["session_start"]): r["n_events"] for r in rows}
        # batch ground truth (sessions whose end+gap < max_ts - delay close)
        batch = engine.execute(f"""
        load parquet.`{sf_dir}/events.parquet` as zev_b;
        with base as (
          select user_id, cast(unix_timestamp(ts) as bigint) as tss from zev_b
        ),
        marked as (
          select user_id, tss,
                 case when lag(tss) over w is null
                           or tss - lag(tss) over w > 1800
                      then 1 else 0 end as ns
          from base window w as (partition by user_id order by tss)
        ),
        sess as (
          select user_id, tss,
                 sum(ns) over (partition by user_id order by tss
                               rows unbounded preceding) as sid
          from marked
        )
        select user_id, min(tss) as session_start, count(*) as n_events,
               max(tss) as session_end
        from sess group by user_id, sid as out;
        """).collect()
        expected = {(r["user_id"], r["session_start"]): r["n_events"]
                    for r in batch}
        # every emitted session matches the batch session exactly
        mismatches = {k: (v, expected.get(k)) for k, v in got.items()
                      if expected.get(k) != v}
        assert not mismatches, dict(list(mismatches.items())[:5])
    finally:
        q.stop()


def test_web_console_sink(engine, sf_dir, tmp_path):
    """webConsole maps onto the console sink (reference streams console
    output to the web client; batch results return via REST here)."""
    engine.execute(f"""
    set streamName = "wc1";
    load streamParquet.`{sf_dir}/events.parquet` as ev_wc;
    select count(*) as n from ev_wc as agg_wc;
    save complete agg_wc as webConsole.`` where
        checkpointLocation="{tmp_path}/ckwc" and duration="0";
    """)
    q = engine.context.jobs["wc1"]
    try:
        q.processAllAvailable()
        assert q.isActive
    finally:
        q.stop()


def test_new_parquet_overwrite_sink(engine, sf_dir, tmp_path):
    """newParquet: each micro-batch REPLACES the output dir (reference
    NewFileStreamSink) — the final read shows the LAST batch's state,
    not an append history."""
    out = tmp_path / "np_out"
    engine.execute(f"""
    set streamName = "np1";
    load streamParquet.`{sf_dir}/events.parquet` as ev_np;
    select count(*) as n from ev_np as agg_np;
    save complete agg_np as newParquet.`{out}` where
        checkpointLocation="{tmp_path}/cknp" and duration="0";
    """)
    q = engine.context.jobs["np1"]
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = engine.spark.read.parquet(str(out)).collect()
    assert len(rows) == 1 and rows[0]["n"] > 0


def test_versioned_parquet_stream_sink(engine, sf_dir, tmp_path):
    """Streaming into versionedParquet: each micro-batch is a commit;
    the result is time-travelable afterwards."""
    lake = tmp_path / "stream_lake"
    engine.execute(f"""
    set streamName = "vps";
    load streamParquet.`{sf_dir}/events.parquet` as ev_vp;
    select user_id, ts from ev_vp as sel_vp;
    save append sel_vp as versionedParquet.`{lake}` where
        checkpointLocation="{tmp_path}/ckvp" and duration="0";
    """)
    q = engine.context.jobs["vps"]
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    hist = engine.execute(
        f'load versionedParquet.`{lake}` where history="true" as h; '
        "select * from h as out;").collect()
    assert len(hist) >= 1 and all(r["mode"] == "append" for r in hist)
    n = engine.execute(f"load versionedParquet.`{lake}` as d; "
                       "select count(*) as n from d as out;").collect()[0]["n"]
    assert n > 0


def test_versioned_parquet_complete_mode_no_duplication(engine, sf_dir,
                                                        tmp_path):
    """complete-mode streams re-emit the full state each batch — the sink must
    commit them as overwrites so snapshots don't duplicate (review
    finding)."""
    lake = tmp_path / "cmp_lake"
    engine.execute(f"""
    set streamName = "vpc";
    load streamParquet.`{sf_dir}/events.parquet` as ev_c;
    select count(*) as n from ev_c as agg_c;
    save complete agg_c as versionedParquet.`{lake}` where
        checkpointLocation="{tmp_path}/ckc" and duration="0";
    """)
    q = engine.context.jobs["vpc"]
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = engine.execute(f"load versionedParquet.`{lake}` as d; "
                          "select * from d as out;").collect()
    assert len(rows) == 1          # ONE aggregate row, not one per batch
    hist = engine.execute(
        f'load versionedParquet.`{lake}` where history="true" as h; '
        "select * from h as out;").collect()
    assert all(r["mode"] == "overwrite" for r in hist)
    assert all(r["timestamp"] > 0 for r in hist)


def test_versioned_parquet_batch_dedup_keyed_by_txn(engine, tmp_path):
    """Replayed (txn, batch) pairs are skipped, but a RESTARTED query
    with a fresh checkpoint (batch ids reset) still commits
    (second-pass review finding: batchId alone dropped data)."""
    from streamingpro_spark.sources import versioned as vp
    lake = str(tmp_path / "txn_lake")
    df = engine.spark.range(3)
    ctx = engine.context
    vp.save(ctx, df, lake, "append", {}, [], batch_id=0, txn_id="ckA")
    vp.save(ctx, df, lake, "append", {}, [], batch_id=0, txn_id="ckA")  # replay
    vp.save(ctx, df, lake, "append", {}, [], batch_id=0, txn_id="ckB")  # restart
    hist = vp.read_commits(lake)
    assert len(hist) == 2
    assert [c["txnId"] for c in hist] == ["ckA", "ckB"]


def test_versioned_parquet_orphan_dir_recovered(engine, tmp_path):
    """A crash between data write and manifest append leaves v=N with no
    commit record; the next save clears the orphan and succeeds."""
    import os
    from streamingpro_spark.sources import versioned as vp
    lake = str(tmp_path / "orphan_lake")
    ctx = engine.context
    vp.save(ctx, engine.spark.range(2), lake, "overwrite", {}, [])
    # simulate the crash: v=1 data exists, manifest does not know it
    os.makedirs(os.path.join(lake, "v=1"))
    with open(os.path.join(lake, "v=1", "part-orphan.parquet"), "wb") as f:
        f.write(b"junk")
    vp.save(ctx, engine.spark.range(5), lake, "append", {}, [])
    assert [c["version"] for c in vp.read_commits(lake)] == [0, 1]
    n = vp.load(ctx, lake, {}).count()
    assert n == 7


def test_stateful_count_string_keys(engine, tmp_path):
    """Output key schema follows the input key type (string keys killed
    the query when `key long` was hardcoded)."""
    import pandas as pd
    spark = engine.spark
    src = tmp_path / "skey_src"
    src.mkdir()
    pd.DataFrame({"name": ["alice", "bob", "alice"],
                  "value": [1.0, 2.0, 3.0]}).to_parquet(src / "a.parquet")
    engine.execute(f"""
    set streamName = "skeys";
    load streamParquet.`{src}/a.parquet` as sk;
    run sk as StatefulCount.`` where keyCol="name" and valueCol="value" as skc;
    """)
    q = (spark.table("skc").writeStream.format("memory")
         .queryName("skeys_sink").outputMode("update")
         .option("checkpointLocation", str(tmp_path / "cks")).start())
    try:
        q.processAllAvailable()
        rows = {r["key"]: (r["events"], r["total"])
                for r in spark.sql("select * from skeys_sink").collect()}
        assert rows == {"alice": (2, 4.0), "bob": (1, 2.0)}
    finally:
        q.stop()


def test_sessionizer_out_of_order_island(engine, tmp_path):
    """An in-watermark event far EARLIER than the stored session must
    become its own island, not inflate the stored one."""
    import pandas as pd
    spark = engine.spark
    src = tmp_path / "ooo_src"
    src.mkdir()
    t0 = pd.Timestamp("2024-01-01 12:00:00")
    pd.DataFrame({"user_id": [1], "ts": [t0]}).astype({"ts": "datetime64[us]"}).to_parquet(src / "a.parquet")
    engine.execute(f"""
    set streamName = "oooses";
    load streamParquet.`{src}/*.parquet` where eventTimeCol="ts"
        and delayThreshold="2 hours" as oz;
    run oz as StreamingSessionizer.`` where keyCol="user_id" and tsCol="ts"
        and gap="60" as osess;
    """)
    q = (spark.table("osess").writeStream.format("memory")
         .queryName("oooses_sink").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "cko")).start())
    try:
        q.processAllAvailable()
        # batch 2: 11:30 — above watermark (12:00 - 2h), 30 min before the
        # stored session with gap=60s → separate island
        pd.DataFrame({"user_id": [1],
                      "ts": [pd.Timestamp("2024-01-01 11:30:00")]}
                     ).astype({"ts": "datetime64[us]"}).to_parquet(src / "b.parquet")
        q.processAllAvailable()
        # batch 3: far-future event pushes the watermark past both islands
        pd.DataFrame({"user_id": [1],
                      "ts": [pd.Timestamp("2024-01-02 12:00:00")]}
                     ).astype({"ts": "datetime64[us]"}).to_parquet(src / "c.parquet")
        q.processAllAvailable()
        # one more batch so the new watermark drives the timeout/eviction
        pd.DataFrame({"user_id": [1],
                      "ts": [pd.Timestamp("2024-01-02 12:00:01")]}
                     ).astype({"ts": "datetime64[us]"}).to_parquet(src / "d.parquet")
        q.processAllAvailable()
        rows = sorted((r["session_start"], r["session_end"], r["n_events"])
                      for r in spark.sql(
                          "select * from oooses_sink").collect())
        t1130 = int(pd.Timestamp("2024-01-01 11:30:00").timestamp())
        t1200 = int(pd.Timestamp("2024-01-01 12:00:00").timestamp())
        assert (t1130, t1130, 1) in rows, rows
        assert (t1200, t1200, 1) in rows, rows
        assert not any(s == t1130 and e == t1200 for s, e, _ in rows), rows
    finally:
        q.stop()


def test_streaming_dedup_same_key_different_ts(engine, tmp_path):
    """Within-watermark dedup drops the same key even when the replay
    carries a different timestamp; empty dedupCols is a rendered error."""
    import pandas as pd
    import pytest as _pytest
    spark = engine.spark
    src = tmp_path / "wmk_src"
    src.mkdir()
    pd.DataFrame({
        "msg_id": [1, 1, 2],
        "ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 10:00:05",
                              "2024-01-01 10:01:00"]),
    }).astype({"ts": "datetime64[us]"}).to_parquet(src / "a.parquet")
    engine.execute(f"""
    set streamName = "wdedup";
    load streamParquet.`{src}/a.parquet` as wd;
    run wd as StreamingDedup.`` where dedupCols="msg_id"
        and eventTimeCol="ts" and delayThreshold="10 minutes" as wdd;
    """)
    q = (spark.table("wdd").writeStream.format("memory")
         .queryName("wdedup_sink")
         .option("checkpointLocation", str(tmp_path / "ckw")).start())
    try:
        q.processAllAvailable()
        ids = sorted(r["msg_id"] for r in
                     spark.sql("select msg_id from wdedup_sink").collect())
        assert ids == [1, 2], ids   # the ts-10:00:05 replay of msg 1 dropped
    finally:
        q.stop()
    with _pytest.raises(ValueError, match="dedupCols"):
        engine.execute(f"""
        load parquet.`{src}/a.parquet` as wb;
        run wb as StreamingDedup.`` as bad;
        """)


def test_int96_parquet_loads_clean(engine, spark, tmp_path):
    """Spark's DEFAULT parquet writer emits INT96 timestamps, which
    pyarrow surfaces as timestamp[ns] — the nanos-shim detection must
    NOT fire on them (it would div a TimestampType by 1000 and kill the
    load).  Pins the round-5 physical-type check in
    sources/registry.py:_nanos_timestamp_cols."""
    src = str(tmp_path / "int96")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        spark.sql("""
        select id as k, timestamp_seconds(1700000000 + id * 60) as ts
        from range(5)
        """).coalesce(1).write.parquet(src)
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    # batch load through the engine
    df = engine.execute(f"""
    load parquet.`{src}` as t96;
    select k, unix_timestamp(ts) as tss from t96 as out96;
    """)
    got = {r["k"]: r["tss"] for r in df.collect()}
    assert got == {i: 1700000000 + i * 60 for i in range(5)}
    # streaming load through streamParquet (same detection path)
    engine.execute(f"""
    set streamName = "s96";
    load streamParquet.`{src}` as st96;
    select k, unix_timestamp(ts) as tss from st96 as sout96;
    """)
    sdf = engine.spark.table("sout96")
    assert sdf.isStreaming
    q = (sdf.writeStream.format("memory").queryName("s96_sink")
         .option("checkpointLocation", str(tmp_path / "ck96")).start())
    try:
        q.processAllAvailable()
        rows = {r["k"]: r["tss"]
                for r in engine.spark.sql("select * from s96_sink").collect()}
        assert rows == got
    finally:
        q.stop()


def test_nanos_col_appearing_in_late_file(engine, tmp_path):
    """Schema evolution: a TIMESTAMP(NANOS) column that first appears in
    the 10th file of a dataset must still be detected — the detection
    scans footers until every ns candidate is resolved, not a fixed
    first-8 sample (ADVICE r5)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    src = tmp_path / "ns_evo"
    src.mkdir()
    for i in range(9):
        pq.write_table(pa.table({"k": pa.array([i], type=pa.int64())}),
                       str(src / f"f{i}.parquet"))
    ns = pa.table({
        "k": pa.array([9], type=pa.int64()),
        "ts": pa.array([1700000000_000000000 + 9], type=pa.timestamp("ns")),
    })
    pq.write_table(ns, str(src / "f9.parquet"),
                   coerce_timestamps=None, allow_truncated_timestamps=False)
    df = engine.execute(f"""
    load parquet.`{src}` where mergeSchema="true" as nsevo;
    select k, unix_timestamp(ts) as tss from nsevo where ts is not null
    as out_nsevo;
    """)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["k"] == 9
    assert rows[0]["tss"] == 1700000000


def test_int64_nanos_parquet_loads_clean(engine, tmp_path):
    """The plain (no-mergeSchema) INT64 TIMESTAMP(NANOS) path: detection
    must fire from the first-fragment schema + footer physical-type
    check, and the long-div shim must produce correct timestamps."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    src = tmp_path / "ns_plain"
    src.mkdir()
    vals = [1700000000_000000000 + i * 1_000_000_000 for i in range(5)]
    pq.write_table(pa.table({
        "k": pa.array(list(range(5)), type=pa.int64()),
        "ts": pa.array(vals, type=pa.timestamp("ns")),
    }), str(src / "f0.parquet"))
    df = engine.execute(f"""
    load parquet.`{src}` as nsp;
    select k, unix_timestamp(ts) as tss from nsp as out_nsp;
    """)
    got = {r["k"]: r["tss"] for r in df.collect()}
    assert got == {i: 1700000000 + i for i in range(5)}


def test_multimodal_op_on_stream(engine, spark, tmp_path):
    """The mapInPandas multimodal ops must keep working on STREAMING
    inputs — ensure_parallelism passes streams through (.rdd is illegal
    on them).  Pins the round-5 review fix in operators/base.py."""
    from streamingpro_spark.functions.codecs import make_png_encoder
    src = str(tmp_path / "imgs")
    png = make_png_encoder()
    rows = [(i, png(8 + i, 6 + i)) for i in range(4)]
    spark.createDataFrame(rows, "doc_id long, content binary") \
        .coalesce(1).write.parquet(src)
    engine.execute(f"""
    set streamName = "smm";
    load streamParquet.`{src}` as simgs;
    run simgs as ImageMetadata.`` as smeta;
    select doc_id, image_meta.width as w, image_meta.height as h,
           image_meta.format as fmt from smeta as sout_mm;
    """)
    sdf = engine.spark.table("sout_mm")
    assert sdf.isStreaming
    q = (sdf.writeStream.format("memory").queryName("smm_sink")
         .option("checkpointLocation", str(tmp_path / "ckmm")).start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: (r["w"], r["h"], r["fmt"]) for r in
               engine.spark.sql("select * from smm_sink").collect()}
        assert got == {i: (8 + i, 6 + i, "png") for i in range(4)}
    finally:
        q.stop()


def test_map_only_curation_et_in_stream(engine, tmp_path):
    """Map-only curation ETs (quality filters, normalizers, scorers)
    run UNCHANGED inside Structured Streaming: `run` on a streaming
    table yields a streaming table — the streaming-ingest curation
    pipeline needs no batch detour."""
    engine.execute("""
    select id as doc_id,
           concat('the quick brown fox jumps over the lazy dog number ',
                  cast(id as string)) as text
    from range(20) as sqc_src;
    """)
    engine.execute("""
    set streamName = "sqc";
    load mockStream.`sqc_src` where stepSizeRange="0-5" as sqc_docs;
    run sqc_docs as TextNormalize.`` where outputCol="text_norm" as tn;
    run tn as GopherQualityFilter.`` where minWords="5"
        and contentCol="text_norm" as gq;
    """)
    sdf = engine.context.spark.table("gq")
    assert sdf.isStreaming
    q = (sdf.writeStream.format("memory").queryName("sqc_sink")
         .option("checkpointLocation", str(tmp_path / "ck_sqc")).start())
    try:
        # mockStream replays rows over rate-source time — wait until
        # all 20 have been emitted AND processed (processAllAvailable
        # alone only drains what the rate source has produced so far)
        def all_in():
            q.processAllAvailable()
            return engine.spark.sql(
                "select count(*) as n from sqc_sink").collect()[0]["n"] >= 20
        assert _wait_for(all_in, timeout=60)
        rows = engine.spark.sql(
            "select count(*) as n, sum(cast(keep as int)) as kept, "
            "sum(n_words) as words from sqc_sink").collect()[0]
        assert rows["n"] == 20          # every doc flowed through both ETs
        assert rows["words"] == 20 * 11   # 10 words + the number suffix
        # the quality rules actually evaluated per micro-batch
        assert 0 <= rows["kept"] <= 20
    finally:
        q.stop()


def test_batchscript_vp_double_save_same_batch_is_error(engine, tmp_path):
    """TWO versionedParquet saves to the SAME lake within one
    batchScript execution share the exactly-once key — the second used
    to be silently skipped as a replay, losing its rows. Rendered error
    now; a replay (a fresh execute of the sub-script) still skips."""
    import pytest as _pytest
    lake = tmp_path / "dbl_lake"
    engine.context.env["__batch_id__"] = "3"
    engine.context.env["__stream_txn__"] = "ck-dbl"
    try:
        with _pytest.raises(ValueError, match="second save to the same"):
            engine.execute(f"""
            select 1 as id as dbl_a;
            save append dbl_a as versionedParquet.`{lake}`;
            select 2 as id as dbl_b;
            save append dbl_b as versionedParquet.`{lake}`;
            """)
        # fresh execution with the same (txn, batch): the replay skip
        engine.execute(f"""
        select 1 as id as dbl_a2;
        save append dbl_a2 as versionedParquet.`{lake}`;
        """)
    finally:
        engine.context.env.pop("__batch_id__")
        engine.context.env.pop("__stream_txn__")
    hist = engine.execute(f"!delta history {lake};").collect()
    assert [r["version"] for r in hist] == [0]   # one commit total


def test_streaming_lake_replay_after_checkpoint_loss(engine, tmp_path):
    """Query-level exactly-once (round-9): crash BETWEEN the
    versionedParquet append and the streaming checkpoint commit —
    simulated by deleting the checkpoint's last commit marker after a
    clean run — must not double-commit on restart.  Spark replays the
    uncommitted micro-batch with the same (txnId=checkpointLocation,
    batchId) key, the sink takes the replay-skip path, and the lake's
    version list and row multiset are unchanged.  This is the failure
    mode the (txnId, batchId) key exists for (the reference's Delta
    sink carries the same appId+batchId contract)."""
    import os
    import pandas as pd
    from streamingpro_spark.sources import versioned as vp
    lake = str(tmp_path / "replay_lake")
    sigs = str(tmp_path / "replay_sigs")
    ck = str(tmp_path / "replay_ck")
    inc = tmp_path / "replay_inc"
    inc.mkdir()
    pd.DataFrame({"doc_id": [10, 11],
                  "text": ["alpha beta gamma delta",
                           "epsilon zeta eta theta"]}
                 ).to_parquet(inc / "day1.parquet")
    pd.DataFrame({"doc_id": [20, 21],
                  "text": ["iota kappa lambda mu",
                           "nu xi omicron pi rho"]}
                 ).to_parquet(inc / "day2.parquet")
    import time as _t
    now = _t.time()
    os.utime(inc / "day1.parquet", (now - 2000, now - 2000))
    os.utime(inc / "day2.parquet", (now - 1000, now - 1000))
    engine.execute(f"""
    select cast(doc_id as bigint) as doc_id, text
    from (values (1, 'sigma tau upsilon phi'))
      v(doc_id, text) as slr_day0;
    save overwrite slr_day0 as versionedParquet.`{lake}`;
    run slr_day0 as MinHashSignatures.`` as slr_sig0;
    save overwrite slr_sig0 as parquet.`{sigs}`;
    """)

    stream_script = f"""
    set streamName = "slr_ingest";
    load streamParquet.`{inc}` options maxFilesPerTrigger="1" as slr_inc;
    save append slr_inc as custom.`` options
        checkpointLocation="{ck}" and duration="0"
        and batchScript='''
        load versionedParquet.`{lake}` as slr_lake;
        run __batch_df__ as BloomFilterDedup.`` where
            refTable="slr_lake" as slr_fresh;
        load parquet.`{sigs}` as slr_sigs;
        run slr_fresh as NearDedup.`` where refTable="slr_lake"
            and refBandsTable="slr_sigs" and threshold="0.8"
            as slr_kept;
        save append slr_kept as versionedParquet.`{lake}`;
        run slr_kept as MinHashSignatures.`` as slr_new_sigs;
        save append slr_new_sigs as parquet.`{sigs}`;
        ''';
    """

    def run_stream():
        engine.execute(stream_script)
        q = engine.context.jobs.pop("slr_ingest")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            # a restart over the SAME checkpoint needs the prior run
            # fully deregistered, or Spark rejects it as a concurrent
            # user of <ck>/commits
            q.awaitTermination()
            while any(aq.name == "slr_ingest"
                      for aq in engine.spark.streams.active):
                _t.sleep(0.2)

    def lake_state():
        hist = [(c["version"], c.get("txnId"), c.get("batchId"))
                for c in vp.read_commits(lake)]
        rows = sorted(r["doc_id"] for r in engine.execute(
            f"load versionedParquet.`{lake}` as d; "
            "select doc_id from d as out;").collect())
        return hist, rows

    run_stream()
    hist1, rows1 = lake_state()
    assert rows1 == [1, 10, 11, 20, 21]
    assert [v for v, _, _ in hist1] == [0, 1, 2]
    assert [b for _, _, b in hist1] == [None, 0, 1]

    # the crash: the sink committed batch 1 but the streaming
    # checkpoint never recorded it — on restart Spark REPLAYS batch 1.
    # The sibling .crc must go too: a stale local-FS checksum blocks
    # the commit log's atomic rename and Spark misreports it as
    # concurrent checkpoint use
    commit_files = sorted(f for f in os.listdir(os.path.join(ck, "commits"))
                          if not f.startswith("."))
    os.remove(os.path.join(ck, "commits", commit_files[-1]))
    crc = os.path.join(ck, "commits", f".{commit_files[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    run_stream()
    hist2, rows2 = lake_state()
    assert hist2 == hist1, "replayed batch must not add a commit"
    assert rows2 == rows1, "replayed batch must not duplicate rows"


def test_streaming_layout_replay_keeps_layout_stable(engine, tmp_path):
    """Round-10 transactional layout chain under a checkpoint-loss
    replay: the layout is derived from the lake commit read back under
    this batch's (txnId, batchId) key (commitOfBatch) and appended
    through versionedParquet under the SAME key, so a replayed
    micro-batch skips both the lake and the layout append — the layout
    is byte-identical after crash-replaying the real query (delete the
    checkpoint's last commit marker, restart).  The partial-failure
    window (crash BETWEEN the two appends) is covered separately by
    test_batch_script_derived_store_crash_heal."""
    import os
    import time as _t
    import pandas as pd
    lake = str(tmp_path / "lyr_lake")
    layout = str(tmp_path / "lyr_layout")
    ck = str(tmp_path / "lyr_ck")
    inc = tmp_path / "lyr_inc"
    inc.mkdir()
    pd.DataFrame({"doc_id": [10, 11],
                  "text": ["alpha beta gamma", "delta epsilon zeta"]}
                 ).to_parquet(inc / "d1.parquet")
    pd.DataFrame({"doc_id": [20, 21],
                  "text": ["eta theta iota", "kappa lambda mu"]}
                 ).to_parquet(inc / "d2.parquet")
    now = _t.time()
    os.utime(inc / "d1.parquet", (now - 2000, now - 2000))
    os.utime(inc / "d2.parquet", (now - 1000, now - 1000))
    engine.execute(f"""
    select cast(doc_id as bigint) as doc_id, text
    from (values (1, 'nu xi omicron')) v(doc_id, text) as lyr_day0;
    save overwrite lyr_day0 as versionedParquet.`{lake}`;
    run lyr_day0 as DeterministicShard.`` where numShards="4" as lyr_l0;
    select doc_id, shard, shard_pos from lyr_l0 as lyr_l0s;
    save overwrite lyr_l0s as versionedParquet.`{layout}`;
    """)
    script = f"""
    set streamName = "lyr_ingest";
    load streamParquet.`{inc}` options maxFilesPerTrigger="1" as lyr_in;
    save append lyr_in as custom.`` options
        checkpointLocation="{ck}" and duration="0"
        and batchScript='''
        load versionedParquet.`{lake}` as lyr_lake;
        run __batch_df__ as BloomFilterDedup.`` where
            refTable="lyr_lake" as lyr_kept;
        save append lyr_kept as versionedParquet.`{lake}`;
        load versionedParquet.`{lake}` options commitOfBatch="true"
            as lyr_delta;
        load versionedParquet.`{layout}` as lyr_prev;
        run lyr_delta as DeterministicShard.`` where numShards="4"
            and refTable="lyr_prev" as lyr_new;
        select doc_id, shard, shard_pos from lyr_new as lyr_news;
        save append lyr_news as versionedParquet.`{layout}`;
        ''';
    """

    def run_stream():
        engine.execute(script)
        q = engine.context.jobs.pop("lyr_ingest")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
            while any(aq.name == "lyr_ingest"
                      for aq in engine.spark.streams.active):
                _t.sleep(0.2)

    def layout_state():
        return sorted(
            (r["doc_id"], r["shard"], r["shard_pos"])
            for r in engine.execute(
                f"load versionedParquet.`{layout}` as l; "
                f"select * from l as out;"
            ).collect())

    run_stream()
    state1 = layout_state()
    assert len(state1) == 5  # day0 + both increments
    commits = sorted(f for f in os.listdir(os.path.join(ck, "commits"))
                     if not f.startswith("."))
    os.remove(os.path.join(ck, "commits", commits[-1]))
    crc = os.path.join(ck, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_stream()
    assert layout_state() == state1, "replayed batch must not re-append"


def test_batch_script_derived_store_crash_heal(engine, tmp_path):
    """The partial-failure window the round-10 advisor flagged: a crash
    AFTER the lake append but BEFORE the derived layout append used to
    strand the batch's rows in the lake with no (shard, shard_pos)
    forever — the replayed batch re-dedups to empty, so the plain
    parquet append had nothing to write.  With the layout derived from
    commitOfBatch (the lake commit under this batch's (txnId, batchId)
    key) and appended through versionedParquet under the same key, the
    replay re-reads the COMMITTED delta and lands exactly the missing
    append; a second full replay then skips everything.  Simulated at
    the batchScript level: the engine stamps the same env keys the
    streaming sink sets per micro-batch."""
    from streamingpro_spark.sources import versioned as vp
    lake = str(tmp_path / "heal_lake")
    layout = str(tmp_path / "heal_layout")
    engine.execute(f"""
    select cast(doc_id as bigint) as doc_id, text
    from (values (1, 'base row one'), (2, 'base row two'))
      v(doc_id, text) as hl_day0;
    save overwrite hl_day0 as versionedParquet.`{lake}`;
    run hl_day0 as DeterministicShard.`` where numShards="4" as hl_l0;
    select doc_id, shard, shard_pos from hl_l0 as hl_l0s;
    save overwrite hl_l0s as versionedParquet.`{layout}`;
    """)
    batch_stmts = [
        f'load versionedParquet.`{lake}` as hl_lake;',
        ('select cast(doc_id as bigint) as doc_id, text from (values '
         "(10, 'incoming alpha'), (11, 'incoming beta')) "
         'v(doc_id, text) as hl_batch;'),
        'run hl_batch as BloomFilterDedup.`` where refTable="hl_lake" '
        'as hl_kept;',
        f'save append hl_kept as versionedParquet.`{lake}`;',
        # ---- the crash point: everything below may never run ----
        f'load versionedParquet.`{lake}` options commitOfBatch="true" '
        f'as hl_delta;',
        f'load versionedParquet.`{layout}` as hl_prev;',
        'run hl_delta as DeterministicShard.`` where numShards="4" '
        'and refTable="hl_prev" as hl_new;',
        'select doc_id, shard, shard_pos from hl_new as hl_news;',
        f'save append hl_news as versionedParquet.`{layout}`;',
    ]
    env = engine.context.env
    env["__batch_id__"] = "0"
    env["__stream_txn__"] = "heal-ck"
    try:
        # run 1 "crashes" right after the lake append
        engine.execute("\n".join(batch_stmts[:4]))
        lake_commits_1 = [(c["version"], c.get("batchId"))
                          for c in vp.read_commits(lake)]
        assert lake_commits_1 == [(0, None), (1, 0)]
        stranded = engine.execute(
            f"load versionedParquet.`{lake}` as l; "
            f"load versionedParquet.`{layout}` as y; "
            f"select l.doc_id from l left join y on l.doc_id = y.doc_id "
            f"where y.doc_id is null as out;").collect()
        assert sorted(r["doc_id"] for r in stranded) == [10, 11]

        def layout_state():
            return sorted(
                (r["doc_id"], r["shard"], r["shard_pos"])
                for r in engine.execute(
                    f"load versionedParquet.`{layout}` as y2; "
                    f"select * from y2 as out;").collect())

        # run 2: the REPLAY executes the full batchScript — lake save
        # skips, the committed delta is re-read, the layout heals
        engine.execute("\n".join(batch_stmts))
        healed = layout_state()
        assert sorted(d for d, _, _ in healed) == [1, 2, 10, 11]
        assert [(c["version"], c.get("batchId"))
                for c in vp.read_commits(lake)] == lake_commits_1
        # positions contiguous per shard across both generations
        by_shard = {}
        for d, s, p in healed:
            by_shard.setdefault(s, []).append(p)
        for poss in by_shard.values():
            assert sorted(poss) == list(range(len(poss)))
        # run 3: a full second replay is a no-op on every store
        engine.execute("\n".join(batch_stmts))
        assert layout_state() == healed
        assert [(c["version"], c.get("batchId"))
                for c in vp.read_commits(layout)][-1][1] == 0
    finally:
        env.pop("__batch_id__", None)
        env.pop("__stream_txn__", None)


def test_commit_of_batch_load_contract(engine, tmp_path):
    """commitOfBatch reads exactly the current (txnId, batchId) commit:
    an empty lake-schema slice when no such commit exists, and a
    rendered error outside a batchScript (no batch env)."""
    import pytest as _pytest
    lake = str(tmp_path / "cob_lake")
    engine.execute(f"""
    select cast(1 as bigint) as doc_id, 'zero' as text as cob0;
    save overwrite cob0 as versionedParquet.`{lake}`;
    """)
    with _pytest.raises(ValueError, match="batchScript"):
        engine.execute(f'load versionedParquet.`{lake}` options '
                       f'commitOfBatch="true" as bad;')
    env = engine.context.env
    env["__batch_id__"] = "7"
    env["__stream_txn__"] = "cob-ck"
    try:
        empty = engine.execute(
            f'load versionedParquet.`{lake}` options '
            f'commitOfBatch="true" as cob_none; '
            f'select * from cob_none as out;')
        assert empty.count() == 0
        assert set(empty.columns) == {"doc_id", "text"}
        engine.execute(f"""
        select cast(2 as bigint) as doc_id, 'batch seven' as text as cob7;
        save append cob7 as versionedParquet.`{lake}`;
        """)
        rows = engine.execute(
            f'load versionedParquet.`{lake}` options '
            f'commitOfBatch="true" as cob_mine; '
            f'select * from cob_mine as out;').collect()
        assert [(r["doc_id"], r["text"]) for r in rows] == [(2, "batch seven")]
    finally:
        env.pop("__batch_id__", None)
        env.pop("__stream_txn__", None)
