"""Pins for the oracle-side SQL kernels in `__spark_entry__.py` that
re-implement engine arithmetic — pure DuckDB, no Spark session, so a
future edit to the oracle generators can't silently diverge from the
engine implementations they replay."""

import random
import string

import duckdb
import pytest


def _murmur3_py(data: bytes, n: int, seed: int = 42) -> int:
    """Reference murmur3_x86_32 — the same algorithm as the JVM-pinned
    serving UDF in operators/ml_algs.py (which test_ml pins against
    JVM HashingTF indices); kept verbatim so SQL == this == JVM."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    m = 0xFFFFFFFF
    nblocks = len(data) // 4
    for b in range(nblocks):
        k = int.from_bytes(data[b * 4:b * 4 + 4], "little")
        k = (k * c1) & m
        k = ((k << 15) | (k >> 17)) & m
        k = (k * c2) & m
        h ^= k
        h = ((h << 13) | (h >> 19)) & m
        h = (h * 5 + 0xE6546B64) & m
    k = 0
    for shift, byte in enumerate(data[nblocks * 4:]):
        k ^= byte << (8 * shift)
    if k:
        k = (k * c1) & m
        k = ((k << 15) | (k >> 17)) & m
        k = (k * c2) & m
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & m
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & m
    h ^= h >> 16
    if h >= 1 << 31:
        h -= 1 << 32
    return ((h % n) + n) % n


@pytest.mark.parametrize("n", [1024, 8192])
def test_sql_murmur3_matches_serving_algorithm(n):
    """The DuckDB-SQL murmur3 (`_murmur3_sql`) must agree with the
    serving algorithm on an adversarial vocabulary: every tail length
    (0-3 bytes), multibyte UTF-8, the empty string, and words long
    enough to exercise many blocks."""
    import __spark_entry__ as entry
    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + "éü中日ß€'-_"
    words = {""}
    for length in range(1, 17):
        for _ in range(30):
            words.add("".join(rng.choice(alphabet) for _ in range(length)))
    words.update(["中", "中文", "中文字", "中文字符", "naïve", "€uro",
                  "a" * 64])
    words = sorted(words)
    con = duckdb.connect()
    # one word per doc_id so the (doc_id, idx) output keys back to words
    rows = con.execute(
        f"WITH tok2 AS (SELECT row_number() OVER () AS doc_id, w "
        f"FROM (SELECT unnest(?) AS w)), "
        f"tok AS (SELECT doc_id, w FROM tok2), "
        f"{entry._murmur3_sql(n)} "
        f"SELECT t.w, h.idx FROM tok2 t JOIN hashed h USING (doc_id)",
        [words])
    got = dict(rows.fetchall())
    assert len(got) == len(words)
    for w in words:
        assert got[w] == _murmur3_py(w.encode("utf-8"), n), w


def test_sql_murmur3_requires_power_of_two():
    import __spark_entry__ as entry
    with pytest.raises(ValueError, match="power-of-two"):
        entry._murmur3_sql(1000)
