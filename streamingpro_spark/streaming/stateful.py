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
                    outputStructType="key long, events long, total double",
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
    custom session payloads).  One running session per key; a session
    closes (and emits) when the watermark passes last_event + gap.

    `run stream_t as StreamingSessionizer.`` where keyCol="user_id" and
    tsCol="ts" and gap="1800"` → (key, session_start, session_end,
    n_events) rows, one per CLOSED session (append semantics).

    Scale: state is per-key in the state store (one shuffle on key);
    timeout eviction bounds state exactly like a watermark does.
    Requires an upstream watermark on `tsCol` (load with eventTimeCol/
    delayThreshold or `!withWatermark`)."""

    def train(self, df, path, params, context=None):
        key = params.get("keyCol", "user_id")
        ts = params.get("tsCol", "ts")
        gap = get_int(params, "gap", 1800)

        def update(key_tuple, pdfs, state):
            import numpy as np
            import pandas as pd
            out = []
            if state.hasTimedOut:
                start, last, n = state.get
                out.append((key_tuple[0], start, last, n))
                state.remove()
            else:
                secs = np.sort(np.concatenate(
                    [(pdf[ts].astype("int64") // 1_000_000_000).to_numpy()
                     for pdf in pdfs] or [np.array([], dtype="int64")]))
                if secs.size:
                    # islands: split the sorted batch wherever gap exceeded
                    cuts = np.nonzero(np.diff(secs) > gap)[0] + 1
                    islands = np.split(secs, cuts)
                    cur = state.get if state.exists else None
                    for isl in islands:
                        mn, mx, cnt = int(isl[0]), int(isl[-1]), len(isl)
                        if cur is not None and mn - cur[1] <= gap:
                            cur = (min(cur[0], mn), max(cur[1], mx),
                                   cur[2] + cnt)
                        else:
                            if cur is not None:
                                out.append((key_tuple[0], *cur))
                            cur = (mn, mx, cnt)
                    state.update(cur)
                    state.setTimeoutTimestamp((cur[1] + gap) * 1000)
            yield pd.DataFrame(
                out, columns=["key", "session_start", "session_end", "n_events"])

        return (df.groupBy(F.col(key))
                .applyInPandasWithState(
                    update,
                    outputStructType=("key long, session_start long, "
                                      "session_end long, n_events long"),
                    stateStructType="start long, last long, n long",
                    outputMode="append",
                    timeoutConf=GroupStateTimeout.EventTimeTimeout))

    def explain_params(self):
        return [("keyCol", "grouping key column", "user_id"),
                ("tsCol", "event-time column (watermarked)", "ts"),
                ("gap", "session inactivity gap, seconds", "1800")]


@register_et("StreamingDedup")
class StreamingDedup(ETAlgorithm):
    """Streaming exact-dedup on key columns within the watermark window
    (`dropDuplicates` + state store — Spark-native; the state is bounded
    by the event-time watermark, the correct 100 TB design: unbounded
    dedup state would grow forever)."""

    def train(self, df, path, params, context=None):
        cols = [c.strip() for c in params.get("dedupCols", "").split(",") if c.strip()]
        ts = params.get("eventTimeCol")
        delay = params.get("delayThreshold", "10 minutes")
        if ts:
            df = df.withWatermark(ts, delay)
            return df.dropDuplicates(cols + [ts])
        return df.dropDuplicates(cols)

    def explain_params(self):
        return [("dedupCols", "key columns", ""),
                ("eventTimeCol", "watermark column (bounds state)", ""),
                ("delayThreshold", "watermark delay", "10 minutes")]
