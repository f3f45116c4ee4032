"""Shared watermark attachment.

Both watermark entry points — the ``eventTimeCol``/``delayThreshold`` load
options (reference: LoadAdaptor.scala:148-157) and the ``!withWatermark``
macro / WaterMarkInPlace ET (reference: SQLWaterMarkInPlace.scala:29-47) —
must tolerate TIMESTAMP_NTZ event-time columns: parquet written with
isAdjustedToUTC=false loads as NTZ, and ``withWatermark`` rejects NTZ with
EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def apply_watermark(df: "DataFrame", event_time_col: str,
                    delay: str) -> "DataFrame":
    """Cast an NTZ event-time column to TIMESTAMP, then withWatermark."""
    try:
        if df.schema[event_time_col].dataType.typeName() == "timestamp_ntz":
            from pyspark.sql import functions as F
            df = df.withColumn(event_time_col,
                               F.col(event_time_col).cast("timestamp"))
    except KeyError:
        pass  # let withWatermark raise its own missing-column error
    return df.withWatermark(event_time_col, delay)
