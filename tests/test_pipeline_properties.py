"""Property tests for the driver-side pieces of the round-4 pipeline
operators: BPE training/apply (lossless, deterministic), greedy packing
invariants, and the cron matcher vs a brute-force reference."""

import time

from hypothesis import given, settings, strategies as st

_WORD = st.text(alphabet="abcdef", min_size=1, max_size=8)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_WORD, st.integers(1, 50)), min_size=1,
                max_size=20),
       st.integers(0, 40))
def test_bpe_lossless_roundtrip(word_counts, num_merges):
    """Any trained merge table encodes any trained-on word losslessly:
    concatenating the tokens and stripping the end marker reconstructs
    the word exactly."""
    from streamingpro_spark.operators.pipeline_ops import (_bpe_apply,
                                                           _bpe_train)
    merges = _bpe_train(word_counts, num_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in word_counts:
        toks = _bpe_apply(w, ranks)
        assert "".join(toks) == w + "</w>"
        # apply is deterministic
        assert _bpe_apply(w, ranks) == toks


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_WORD, st.integers(1, 50)), min_size=1,
                max_size=15))
def test_bpe_training_deterministic(word_counts):
    from streamingpro_spark.operators.pipeline_ops import _bpe_train
    assert _bpe_train(word_counts, 20) == _bpe_train(word_counts, 20)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdefgh xyz", max_size=60))
def test_bpe_apply_unseen_words_lossless(s):
    """Words NEVER seen in training still round-trip (BPE degrades to
    characters, never drops content)."""
    from streamingpro_spark.operators.pipeline_ops import (_bpe_apply,
                                                           _bpe_train)
    ranks = {p: i for i, p in
             enumerate(_bpe_train([("abab", 5), ("cdcd", 3)], 10))}
    for w in s.lower().split():
        assert "".join(_bpe_apply(w, ranks)) == w + "</w>"


# ---------------------------------------------------------------------------
# CronPattern vs brute-force reference
# ---------------------------------------------------------------------------

_FIELD_STRATS = [
    st.sampled_from(["*", "0", "30", "59", "*/5", "10-20", "1,2,3",
                     "0-59/15"]),
    st.sampled_from(["*", "0", "23", "*/3", "8-18", "1,13"]),
    st.sampled_from(["*", "1", "28", "*/7", "1-15", "1,15,28"]),
    st.sampled_from(["*", "1", "12", "*/2", "3-9", "1,6,12"]),
    st.sampled_from(["*", "0", "6", "1-5", "0,6", "*/2"]),
]


@settings(max_examples=150, deadline=None)
@given(st.tuples(*_FIELD_STRATS),
       st.integers(0, 365 * 24 * 60 - 1))
def test_cron_matches_bruteforce(fields, minute_of_year):
    """CronPattern.matches agrees with a naive per-field evaluation on
    arbitrary minutes of 2024."""
    from streamingpro_spark.scheduler import CronPattern
    expr = " ".join(fields)
    t = time.localtime(time.mktime(
        (2024, 1, 1, 0, 0, 0, 0, 1, -1)) + minute_of_year * 60)

    def field_ok(f, value, lo, hi):
        for part in f.split(","):
            step = 1
            if "/" in part:
                part, s = part.split("/", 1)
                step = int(s)
            if part == "*":
                a, b = lo, hi
            elif "-" in part:
                a, b = (int(x) for x in part.split("-"))
            else:
                a = b = int(part)
            if value in range(a, b + 1, step):
                return True
        return False

    expected = (field_ok(fields[0], t.tm_min, 0, 59)
                and field_ok(fields[1], t.tm_hour, 0, 23)
                and field_ok(fields[2], t.tm_mday, 1, 31)
                and field_ok(fields[3], t.tm_mon, 1, 12)
                and field_ok(fields[4], (t.tm_wday + 1) % 7, 0, 6))
    assert CronPattern(expr).matches(t) == expected


# ---------------------------------------------------------------------------
# greedy packing invariants (driver-side reference of the pandas kernel)
# ---------------------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(1, 300), min_size=1, max_size=50),
       st.integers(10, 200))
def test_greedy_packing_invariants(sizes, budget):
    """First-fit-in-order packing: every sequence except possibly ones
    holding a single oversized doc stays within budget; sequence ids are
    contiguous and non-decreasing."""
    seq_ids, seq, used = [], 0, 0
    for n in sizes:
        if used > 0 and used + n > budget:
            seq += 1
            used = 0
        seq_ids.append(seq)
        used += n
    # non-decreasing, contiguous
    assert seq_ids[0] == 0
    for a, b in zip(seq_ids, seq_ids[1:]):
        assert b in (a, a + 1)
    # budget respected except single-doc oversize
    from collections import defaultdict
    totals = defaultdict(list)
    for sid, n in zip(seq_ids, sizes):
        totals[sid].append(n)
    for docs in totals.values():
        assert sum(docs) <= budget or len(docs) == 1
