"""WARC source (ISO 28500): encode → engine load round trip, gzip
multi-member streams, record-type filtering, malformed tolerance."""

import pytest


def _records(n):
    return [("response" if i % 2 == 0 else "conversion",
             f"http://example.org/page{i}",
             f"2026-01-0{i % 9 + 1}T00:00:00Z",
             f"payload text {i} with unicode ✓".encode())
            for i in range(n)]


def test_warc_round_trip_plain_and_gzip(engine, tmp_path):
    from streamingpro_spark.functions.warc import (make_warc_encoder,
                                                   make_warc_record_parser)
    enc, parse = make_warc_encoder(), make_warc_record_parser()
    recs = _records(6)
    (tmp_path / "a.warc").write_bytes(enc(recs))
    (tmp_path / "b.warc.gz").write_bytes(enc(recs, gzip_compress=True))
    # unit: parser returns every record with exact payloads, both forms
    for name in ("a.warc", "b.warc.gz"):
        got = parse((tmp_path / name).read_bytes())
        assert [r["target_uri"] for r in got] == \
            [u for _, u, _, _ in recs]
        assert [bytes(r["content"]) for r in got] == \
            [p for _, _, _, p in recs]
    # engine: one row per record across BOTH files
    df = engine.execute(f"""
    load warc.`{tmp_path}/*` as pages;
    select record_type, target_uri, content_length, text from pages
    as out;
    """)
    rows = sorted((r["target_uri"], r["record_type"], r["text"])
                  for r in df.collect())
    assert len(rows) == 12                      # 6 records x 2 files
    assert rows[0][0] == "http://example.org/page0"
    assert "payload text 0" in rows[0][2]
    # recordType filter: WET-style conversion records only
    df2 = engine.execute(f"""
    load warc.`{tmp_path}/a.warc` where recordType="conversion" as wet;
    select target_uri from wet as out2;
    """)
    assert sorted(r["target_uri"] for r in df2.collect()) == \
        [f"http://example.org/page{i}" for i in (1, 3, 5)]


def test_warc_malformed_tolerance(engine, tmp_path):
    from streamingpro_spark.functions.warc import (make_warc_encoder,
                                                   make_warc_record_parser)
    enc, parse = make_warc_encoder(), make_warc_record_parser()
    good = enc(_records(2))
    # garbage between records, a bogus Content-Length header, and a
    # truncated trailer must not raise or mis-slice the good records
    noisy = b"junk-bytes" + good + \
        b"WARC/1.0\r\nContent-Length: zap\r\n\r\n" + \
        enc(_records(1)) + \
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
    got = parse(noisy)
    assert len(got) == 3
    assert parse(None) == []
    assert parse(b"\x1f\x8bnot really gzip") == []


def test_warc_iter_streams_with_small_chunks(tmp_path):
    """The streaming iterator parses identically under a pathologically
    small chunk size (every token straddles a boundary) — the shape
    that bounds per-task memory on ~GB archives (VERDICT r5 ask #1)."""
    from streamingpro_spark.functions.warc import (make_warc_encoder,
                                                   make_warc_record_iter)
    enc, it = make_warc_encoder(), make_warc_record_iter()
    recs = _records(6)
    for gz in (False, True):
        raw = enc(recs, gzip_compress=gz)
        got = list(it(raw, chunk_size=7))
        assert [r["target_uri"] for r in got] == [u for _, u, _, _ in recs]
        assert [bytes(r["content"]) for r in got] == \
            [p for _, _, _, p in recs]


def test_warc_sink_round_trip(engine, tmp_path):
    """`save ... as warc.`dir``: one archive per partition, loader
    round-trips every record; header columns used when present,
    defaults otherwise; modes enforced."""
    import json
    out = tmp_path / "crawl_out"
    docs = [(i, f"document body {i} with some text ✓") for i in range(8)]
    dj = "\n".join(json.dumps({"doc_id": i, "text": t,
                               "target_uri": f"http://d.org/{i}"})
                   for i, t in docs)
    engine.execute(f"""
    set wdocs = '''{dj}''';
    load jsonStr.`wdocs` as wd;
    save overwrite wd as warc.`{out}` options warcDate="2026-01-01T00:00:00Z";
    """)
    import os
    files = [f for f in os.listdir(out) if f.endswith(".warc.gz")]
    assert files, os.listdir(out)
    rows = engine.execute(f"""
    load warc.`{out}/*.warc.gz` as back;
    select target_uri, record_type, warc_date, text from back as bout;
    """).collect()
    got = sorted((r["target_uri"], r["text"]) for r in rows)
    assert got == sorted((f"http://d.org/{i}", t) for i, t in docs)
    assert all(r["record_type"] == "conversion" for r in rows)
    assert all(r["warc_date"] == "2026-01-01T00:00:00Z" for r in rows)
    # errorIfExists on a non-empty target; append adds records
    import pytest as _pytest
    with _pytest.raises(Exception, match="errorIfExists"):
        engine.execute(f"save wd as warc.`{out}`;")
    engine.execute(f"save append wd as warc.`{out}`;")
    n = engine.execute(f"load warc.`{out}/*.warc.gz` as back2; "
                       "select count(*) as n from back2 as b2;"
                       ).collect()[0]["n"]
    assert n == 16
    # binary content column round-trips byte-exact, uncompressed form
    out2 = tmp_path / "crawl_bin"
    engine.execute(f"""
    select doc_id, cast(text as binary) as content,
           concat('urn:doc:', doc_id) as target_uri from wd as wbin;
    save overwrite wbin as warc.`{out2}` options compress="false"
    and recordType="response";
    """)
    rows2 = engine.execute(f"""
    load warc.`{out2}/*.warc` as back3;
    select record_type, target_uri, content from back3 as b3;
    """).collect()
    assert len(rows2) == 8
    assert all(r["record_type"] == "response" for r in rows2)
    assert sorted(bytes(r["content"]).decode() for r in rows2) == \
        sorted(t for _, t in docs)


def test_warc_http_decode(engine, tmp_path):
    """httpDecode="true": WARC response records' HTTP envelopes split
    into http_status/http_content_type with `text` = the decoded BODY;
    WET-style records without an envelope pass through with null
    status and whole-payload text."""
    from streamingpro_spark.functions.warc import make_warc_encoder
    enc = make_warc_encoder()
    http_payload = (b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html; charset=utf-8\r\n"
                    b"Server: test\r\n\r\n"
                    b"<html><body>the actual page</body></html>")
    recs = [("response", "http://x.org/a", "2026-01-01T00:00:00Z",
             http_payload),
            ("conversion", "http://x.org/b", "2026-01-01T00:00:00Z",
             b"bare wet text")]
    (tmp_path / "h.warc.gz").write_bytes(enc(recs, gzip_compress=True))
    rows = engine.execute(f"""
    load warc.`{tmp_path}/h.warc.gz` where httpDecode="true" as hp;
    select target_uri, http_status, http_content_type, text, content
    from hp as hout;
    """).collect()
    by_uri = {r["target_uri"]: r for r in rows}
    a = by_uri["http://x.org/a"]
    assert a["http_status"] == 200
    assert a["http_content_type"] == "text/html; charset=utf-8"
    assert a["text"] == "<html><body>the actual page</body></html>"
    assert bytes(a["content"]) == http_payload      # raw kept intact
    b = by_uri["http://x.org/b"]
    assert b["http_status"] is None and b["text"] == "bare wet text"


def test_warc_streaming_sink(engine, spark, tmp_path):
    """Streaming save to warc: one set of archives appended per
    micro-batch; records round-trip through the loader."""
    src = tmp_path / "wsrc"
    spark.createDataFrame(
        [(i, f"streamed doc {i}") for i in range(6)],
        "doc_id long, text string").coalesce(1).write.parquet(str(src))
    out = tmp_path / "wstream_out"
    engine.execute(f"""
    set streamName = "wsink";
    load streamParquet.`{src}` as wsrc;
    select doc_id, text, concat('urn:doc:', doc_id) as target_uri
    from wsrc as wrows;
    save append wrows as warc.`{out}`
    options checkpointLocation="{tmp_path}/ckw" and duration="0"
    and warcDate="2026-01-01T00:00:00Z";
    """)
    q = engine.context.jobs.get("wsink")
    assert q is not None
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = engine.execute(f"""
    load warc.`{out}/*.warc.gz` as wback;
    select target_uri, text from wback as wbout;
    """).collect()
    assert sorted(r["text"] for r in rows) == \
        [f"streamed doc {i}" for i in range(6)]


def test_warc_sink_validation(engine, tmp_path):
    import pytest as _pytest
    with _pytest.raises(Exception, match="payload column"):
        engine.execute(f"""
        select 1 as a as nopayload;
        save overwrite nopayload as warc.`{tmp_path}/bad`;
        """)


def test_warc_chunked_batches_and_text_decode(engine, tmp_path):
    """Loader options: maxRecordsPerBatch bounds each yielded pandas
    batch (all rows still arrive), textDecode="false" skips the str
    copy (text null, content intact)."""
    from streamingpro_spark.functions.warc import make_warc_encoder
    enc = make_warc_encoder()
    (tmp_path / "c.warc.gz").write_bytes(enc(_records(9),
                                             gzip_compress=True))
    df = engine.execute(f"""
    load warc.`{tmp_path}/c.warc.gz` where maxRecordsPerBatch="2"
    and maxBytesPerBatch="64" as pages3;
    select target_uri, text from pages3 as out3;
    """)
    rows = df.collect()
    assert len(rows) == 9
    assert all("payload text" in r["text"] for r in rows)
    df2 = engine.execute(f"""
    load warc.`{tmp_path}/c.warc.gz` where textDecode="false" as pages4;
    select target_uri, content, text from pages4 as out4;
    """)
    rows2 = df2.collect()
    assert len(rows2) == 9
    assert all(r["text"] is None for r in rows2)
    assert all(b"payload text" in bytes(r["content"]) for r in rows2)
