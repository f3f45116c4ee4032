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
