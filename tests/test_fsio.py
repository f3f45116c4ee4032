"""The DFS write seam (sources/fsio.py): pyarrow.fs-backed atomic
writes for the operators that write outside Spark's own writers —
the WARC sink and versionedParquet's commit manifest.  Round 7 made
the documented seam real: file: URIs drive the same code path a
hdfs/s3 deploy would use, and every artifact lands via
write-to-temp + rename."""

import json
import os

import pytest


# ---------------------------------------------------------------------------
# fsio unit level
# ---------------------------------------------------------------------------

def test_open_output_atomic_success_and_failure(tmp_path):
    from streamingpro_spark.sources import fsio
    final = str(tmp_path / "a.bin")
    with fsio.open_output_atomic(final) as fh:
        fh.write(b"hello")
        # before close+rename, the final name must NOT exist — readers
        # can never observe a partial file
        assert not os.path.exists(final)
        assert any(f.startswith("a.bin.inprogress-")
                   for f in os.listdir(tmp_path))
    assert open(final, "rb").read() == b"hello"
    # a failed write leaves NEITHER the final file NOR the temp
    bad = str(tmp_path / "b.bin")
    with pytest.raises(RuntimeError):
        with fsio.open_output_atomic(bad) as fh:
            fh.write(b"partial")
            raise RuntimeError("boom")
    assert not os.path.exists(bad)
    assert not any(f.startswith("b.bin.inprogress-")
                   for f in os.listdir(tmp_path))


def test_fsio_file_uri_forms(tmp_path):
    from streamingpro_spark.sources import fsio
    p = str(tmp_path / "x.txt")
    fsio.write_text_atomic(f"file://{p}", "via-uri\n")
    assert fsio.read_text(p) == "via-uri\n"
    assert fsio.exists(f"file://{p}") and fsio.exists(p)
    assert fsio.is_local(f"file://{p}") and fsio.is_local(p)
    assert not fsio.is_local("hdfs://nn/x")
    assert fsio.local_path(f"file://{p}") == p
    assert fsio.local_path("file:/single/slash") == "/single/slash"
    with pytest.raises(ValueError, match="not a local"):
        fsio.local_path("s3://bucket/k")
    assert sorted(fsio.listdir(str(tmp_path))) == ["x.txt"]
    assert fsio.listdir(str(tmp_path / "missing")) == []


# ---------------------------------------------------------------------------
# WARC sink through a file: URI, temp+rename protocol, selective overwrite
# ---------------------------------------------------------------------------

def test_warc_sink_file_uri_and_atomicity(engine, tmp_path):
    out = tmp_path / "crawl_uri"
    docs = [(i, f"uri sink doc {i}") for i in range(6)]
    dj = "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in docs)
    engine.execute(f"""
    set wudocs = '''{dj}''';
    load jsonStr.`wudocs` as wud;
    save overwrite wud as warc.`file://{out}`;
    """)
    names = os.listdir(out)
    assert any(f.endswith(".warc.gz") for f in names)
    # temp+rename protocol: no in-progress temps survive a clean write
    assert not any(".inprogress-" in f for f in names)
    rows = engine.execute(f"""
    load warc.`file://{out}/*.warc.gz` as wub;
    select text from wub as wub_out;
    """).collect()
    assert sorted(r["text"] for r in rows) == sorted(t for _, t in docs)
    # overwrite removes ONLY the sink's artifacts — an unrelated file
    # living alongside the archives survives
    bystander = out / "README.txt"
    bystander.write_text("not an archive")
    engine.execute(f"save overwrite wud as warc.`file://{out}`;")
    assert bystander.read_text() == "not an archive"
    assert any(f.endswith(".warc.gz") for f in os.listdir(out))


def test_warc_sink_single_slash_file_uri(engine, tmp_path):
    """Hadoop-style single-slash `file:/p` URIs: the driver-side path
    checks and the EXECUTOR-side part writes must agree on the target
    (round-8: un-normalized, executors wrote to a literal ./file:/p
    while the driver listed /p)."""
    out = tmp_path / "crawl_ss"
    docs = [(i, f"single slash doc {i}") for i in range(4)]
    dj = "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in docs)
    engine.execute(f"""
    set wsdocs = '''{dj}''';
    load jsonStr.`wsdocs` as wsd;
    save overwrite wsd as warc.`file:{out}`;
    """)
    names = os.listdir(out)
    assert any(f.endswith(".warc.gz") for f in names), names
    # no stray literal 'file:' directory anywhere plausible
    assert not os.path.exists("file:") \
        and not os.path.exists(str(tmp_path / "file:"))
    rows = engine.execute(f"""
    load warc.`{out}/*.warc.gz` as wsb;
    select text from wsb as wsb_out;
    """).collect()
    assert sorted(r["text"] for r in rows) == sorted(t for _, t in docs)


def test_warc_overwrite_reclaims_orphan_temps(engine, tmp_path):
    """Overwrite deletes hard-killed tasks' part-*.inprogress-* temps
    alongside the archives (round-8: the targeted *.warc delete must
    not let them accumulate forever), while bystander files survive."""
    out = tmp_path / "crawl_orphan"
    docs = [(i, f"orphan test doc {i}") for i in range(3)]
    dj = "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in docs)
    engine.execute(f"""
    set wodocs = '''{dj}''';
    load jsonStr.`wodocs` as wod;
    save overwrite wod as warc.`{out}`;
    """)
    orphan = out / "part-deadbeef-00001.warc.gz.inprogress-cafe0123"
    orphan.write_bytes(b"half-written")
    bystander = out / "NOTES.md"
    bystander.write_text("keep me")
    engine.execute(f"save overwrite wod as warc.`{out}`;")
    names = os.listdir(out)
    assert not any(".inprogress-" in f for f in names), names
    assert bystander.read_text() == "keep me"
    assert any(f.endswith(".warc.gz") for f in names)


# ---------------------------------------------------------------------------
# versionedParquet through a file: URI + atomic manifest
# ---------------------------------------------------------------------------

def test_versioned_parquet_file_uri_roundtrip(engine, tmp_path):
    lake = tmp_path / "uri_lake"
    engine.execute(f"""
    select 1 as id, 'a' as v as t1;
    save overwrite t1 as versionedParquet.`file://{lake}`;
    select 2 as id, 'b' as v as t2;
    save append t2 as versionedParquet.`file://{lake}`;
    """)
    # manifest written atomically at the local path (file: collapsed)
    assert (lake / "_commits.json").exists()
    assert not any(".inprogress-" in f for f in os.listdir(lake))
    commits = [json.loads(ln) for ln in
               (lake / "_commits.json").read_text().splitlines()]
    assert [c["version"] for c in commits] == [0, 1]
    rows = engine.execute(f"""
    load versionedParquet.`file://{lake}` as snap;
    select id, v from snap as snap_out;
    """).collect()
    assert sorted((r["id"], r["v"]) for r in rows) == [(1, "a"), (2, "b")]
    v0 = engine.execute(f"""
    load versionedParquet.`file://{lake}` where versionAsOf="0" as s0;
    select id from s0 as s0_out;
    """).collect()
    assert [r["id"] for r in v0] == [1]


def test_versioned_parquet_nonlocal_scheme_needs_ack():
    """hdfs/s3 lakes have no cross-writer flock: without the
    assumeSingleWriter acknowledgment the save fails fast with a
    rendered error (same honesty gate as network mounts)."""
    from streamingpro_spark.sources.versioned import _check_lockable_fs
    with pytest.raises(ValueError, match="no cross-writer file lock"):
        _check_lockable_fs("s3://bucket/lake", None)
    # an UNRESOLVABLE scheme with the ack set must not leak a raw fsio
    # resolver error from the best-effort marker write — the save's own
    # diagnostics own that failure (round-8: ValueError was escaping)
    _check_lockable_fs("bogusfs://x/lake",
                       {"assumeSingleWriter": "true"})


def test_versioned_parquet_vacuum_reclaims_manifest_temps(engine,
                                                          tmp_path):
    """vacuum removes stale _commits.json.inprogress-* temps left by a
    hard-killed writer's atomic rewrite (round-8), counting them as
    orphans; the live manifest and data survive."""
    lake = tmp_path / "vac_lake"
    engine.execute(f"""
    select 1 as id as vt1;
    save overwrite vt1 as versionedParquet.`{lake}`;
    """)
    stale = lake / "_commits.json.inprogress-deadbeef1234"
    stale.write_text('{"version": 99, "mode": "overwrite"}\n')
    out = engine.execute(f"!delta vacuum {lake} 0;").collect()
    assert not stale.exists()
    assert (lake / "_commits.json").exists()
    rows = engine.execute(f"""
    load versionedParquet.`{lake}` as vsnap;
    select id from vsnap as vsnap_out;
    """).collect()
    assert [r["id"] for r in rows] == [1]
    assert out  # vacuum reports counts
