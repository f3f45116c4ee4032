"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.7; the reference's stateful surface is Spark's own —
these add the engine-level operators a 100 TB streaming pipeline needs).

State is per-key and partitioned by Spark's state store: the plan
shuffles once on the key, each state partition holds only its keys, and
checkpointing/recovery ride Structured Streaming's mechanisms — this is
the idiomatic scale path for custom state (vs. collecting to a driver).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from streamingpro_spark.operators.base import ETAlgorithm, get_int
from streamingpro_spark.operators.registry import register_et

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


@register_et("StatefulCount")
class StatefulCount(ETAlgorithm):
    """Running per-key event count + value sum across micro-batches.

    `run stream_t as StatefulCount.`` where keyCol="user_id" and
    valueCol="value"` → streaming DF (key, events, total) emitting the
    updated running state each batch."""

    def train(self, df, path, params, context=None):
        key = params.get("keyCol", "key")
        value = params.get("valueCol")
        # the output key column mirrors the INPUT key's type — a
        # hardcoded `key long` killed the query on string keys
        key_t = df.schema[key].dataType.simpleString()

        def update(key_tuple, pdfs, state):
            import pandas as pd
            events, total = state.get if state.exists else (0, 0.0)
            for pdf in pdfs:
                events += len(pdf)
                if value:
                    total += float(pdf[value].sum())
            state.update((events, total))
            yield pd.DataFrame({"key": [key_tuple[0]], "events": [events],
                                "total": [total]})

        return (df.groupBy(F.col(key))
                .applyInPandasWithState(
                    update,
                    outputStructType=f"key {key_t}, events long, total double",
                    stateStructType="events long, total double",
                    outputMode="update",
                    timeoutConf=GroupStateTimeout.NoTimeout))

    def explain_params(self):
        return [("keyCol", "grouping key column", "key"),
                ("valueCol", "numeric column to sum (optional)", "")]


@register_et("StreamingSessionizer")
class StreamingSessionizer(ETAlgorithm):
    """Custom session assembly with EVENT-TIME STATE TIMEOUT — the state
    machine `session_window` can't express (e.g. emit-on-close with
    custom session payloads).  State per key is a LIST of open islands
    (start, last, count): out-of-order events within the watermark that
    belong to an EARLIER island (or bridge two islands) merge correctly
    instead of inflating the latest session.  An island closes (and
    emits) once the watermark passes its last_event + gap — at that
    point no admissible event can extend or bridge it.

    `run stream_t as StreamingSessionizer.`` where keyCol="user_id" and
    tsCol="ts" and gap="1800"` → (key, session_start, session_end,
    n_events) rows, one per CLOSED session (append semantics).

    Scale: state is per-key in the state store (one shuffle on key);
    watermark-driven island eviction bounds state to the open sessions
    of each key.  Requires an upstream watermark on `tsCol` (load with
    eventTimeCol/delayThreshold or `!withWatermark`)."""

    def train(self, df, path, params, context=None):
        key = params.get("keyCol", "user_id")
        ts = params.get("tsCol", "ts")
        gap = get_int(params, "gap", 1800)
        key_t = df.schema[key].dataType.simpleString()

        def update(key_tuple, pdfs, state):
            import numpy as np
            import pandas as pd
            out = []
            if state.hasTimedOut:
                starts, lasts, ns = state.get
                for s, l, n in zip(starts, lasts, ns):
                    out.append((key_tuple[0], int(s), int(l), int(n)))
                state.remove()
            else:
                secs = np.sort(np.concatenate(
                    [(pdf[ts].astype("int64") // 1_000_000_000).to_numpy()
                     for pdf in pdfs] or [np.array([], dtype="int64")]))
                if secs.size:
                    cuts = np.nonzero(np.diff(secs) > gap)[0] + 1
                    batch_islands = [(int(i[0]), int(i[-1]), len(i))
                                     for i in np.split(secs, cuts)]
                    cur = ([tuple(map(int, t)) for t in zip(*state.get)]
                           if state.exists else [])
                    # merge sorted islands; a batch island adjacent
                    # (within gap) to a stored one coalesces — including
                    # bridging events that fuse two stored islands
                    merged: list[tuple[int, int, int]] = []
                    for s, e, c in sorted(cur + batch_islands):
                        if merged and s - merged[-1][1] <= gap:
                            ps, pe, pc = merged[-1]
                            merged[-1] = (ps, max(pe, e), pc + c)
                        else:
                            merged.append((s, e, c))
                    # emit islands already beyond the watermark — no
                    # admissible event can touch them
                    wm_s = state.getCurrentWatermarkMs() // 1000
                    still_open = []
                    for s, e, c in merged:
                        if wm_s > 0 and e + gap <= wm_s:
                            out.append((key_tuple[0], s, e, c))
                        else:
                            still_open.append((s, e, c))
                    if still_open:
                        state.update((
                            [s for s, _, _ in still_open],
                            [e for _, e, _ in still_open],
                            [c for _, _, c in still_open]))
                        state.setTimeoutTimestamp(
                            (max(e for _, e, _ in still_open) + gap) * 1000)
                    elif state.exists:
                        state.remove()
            yield pd.DataFrame(
                out, columns=["key", "session_start", "session_end", "n_events"])

        return (df.groupBy(F.col(key))
                .applyInPandasWithState(
                    update,
                    outputStructType=(f"key {key_t}, session_start long, "
                                      "session_end long, n_events long"),
                    stateStructType=("starts array<long>, lasts array<long>, "
                                     "ns array<long>"),
                    outputMode="append",
                    timeoutConf=GroupStateTimeout.EventTimeTimeout))

    def explain_params(self):
        return [("keyCol", "grouping key column", "user_id"),
                ("tsCol", "event-time column (watermarked)", "ts"),
                ("gap", "session inactivity gap, seconds", "1800")]


@register_et("StreamingDedup")
class StreamingDedup(ETAlgorithm):
    """Streaming exact-dedup on key columns.  With `eventTimeCol` set,
    uses `dropDuplicatesWithinWatermark` — duplicates of the SAME key
    arriving with different timestamps (the retry/replay case) are
    still dropped, and the state store is bounded by the watermark (the
    correct 100 TB design: unbounded dedup state grows forever)."""

    def train(self, df, path, params, context=None):
        cols = [c.strip() for c in params.get("dedupCols", "").split(",")
                if c.strip()]
        if not cols:
            raise ValueError(
                "StreamingDedup needs dedupCols=\"col1[,col2...]\" — an "
                "empty subset would collapse the whole stream to one row "
                "(dropDuplicates([]) keeps a single arbitrary row)")
        ts = params.get("eventTimeCol")
        delay = params.get("delayThreshold", "10 minutes")
        if ts:
            from streamingpro_spark.streaming.watermark import apply_watermark
            df = apply_watermark(df, ts, delay)
            return df.dropDuplicatesWithinWatermark(cols)
        return df.dropDuplicates(cols)

    def explain_params(self):
        return [("dedupCols", "key columns (required)", ""),
                ("eventTimeCol", "watermark column (bounds state)", ""),
                ("delayThreshold", "watermark delay", "10 minutes")]
