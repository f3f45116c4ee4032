"""WARC (ISO 28500) record encode/parse — the container Common Crawl
ships (WARC responses, WET text conversions).  Pure stdlib, same
make_* nested-def pickling convention as functions/codecs.py: every
closure the executors run closes over nothing module-level.

No reference counterpart (the reference's closest surface is
MLSQLBinaryFile.scala raw bytes); this is north-star pipeline plumbing:
`load warc.`crawl/*.warc[.gz]` as pages` → one row per record with the
standard headers split out, ready for the text-curation operators.
"""

from __future__ import annotations


def make_warc_encoder():
    """-> warc_bytes(records, gzip_compress=False) — serialize
    [(record_type, target_uri, date_iso, payload_bytes), ...] as a
    standards-shaped WARC file: version line, canonical headers,
    Content-Length, double-CRLF record terminator.  gzip_compress=True
    emits one gzip member PER RECORD (the Common Crawl layout — members
    concatenate, and stdlib gzip reads multi-member streams)."""
    def warc_bytes(records, gzip_compress: bool = False) -> bytes:
        out = []
        for i, (rtype, uri, date, payload) in enumerate(records):
            payload = bytes(payload)
            head = (
                "WARC/1.0\r\n"
                f"WARC-Type: {rtype}\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"WARC-Date: {date}\r\n"
                f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
                f"Content-Length: {len(payload)}\r\n"
                "\r\n").encode("utf-8")
            rec = head + payload + b"\r\n\r\n"
            if gzip_compress:
                import gzip as _gz
                rec = _gz.compress(rec)
            out.append(rec)
        return b"".join(out)

    return warc_bytes


def make_warc_record_parser():
    """-> parse(content) -> list[dict] — split raw WARC file bytes into
    records.  Handles plain and gzipped input (multi-member streams —
    the Common Crawl member-per-record layout), tolerates LF-only
    header lines, stops cleanly on truncated trailers, and skips
    garbage between records by scanning to the next version line.
    Each dict: record_type, target_uri, warc_date, content_length,
    content (payload bytes)."""
    def parse(content):
        if content is None:
            return []
        b = bytes(content)
        if b[:2] == b"\x1f\x8b":                 # gzip magic
            import gzip as _gz
            import io as _io
            try:
                b = _gz.GzipFile(fileobj=_io.BytesIO(b)).read()
            except OSError:
                return []
        records = []
        i = 0
        n = len(b)
        while i < n:
            j = b.find(b"WARC/", i)
            if j == -1:
                break
            # header block ends at the first blank line (CRLF or LF)
            he = b.find(b"\r\n\r\n", j)
            he_len = 4
            alt = b.find(b"\n\n", j)
            if he == -1 or (alt != -1 and alt < he):
                he, he_len = alt, 2
            if he == -1:
                break
            headers = {}
            for line in b[j:he].decode("utf-8", "replace").splitlines()[1:]:
                if ":" in line:
                    k, v = line.split(":", 1)
                    headers[k.strip().lower()] = v.strip()
            try:
                clen = int(headers.get("content-length", ""))
            except ValueError:
                i = he + he_len
                continue
            body = he + he_len
            if body + clen > n:
                break                            # truncated trailer
            records.append({
                "record_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_length": clen,
                "content": b[body:body + clen],
            })
            i = body + clen
        return records

    return parse
