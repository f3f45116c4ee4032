"""Multimodal column operators (north-star).

Images/audio/video are opaque `binary` columns with typed metadata
(Spark's own `binaryFile` source yields path/modificationTime/length/
content — the reference's equivalents are MLSQLBinaryFile.scala and
MLSQLImage.scala).  Decode/resize/frame-sample run as Arrow-batched
Pandas UDFs over mapInPandas; the actual codec calls are STUBBED
(image/audio libs are not in this container) behind
`_decode_image_stub` — the Spark-side plumbing (schema, batching,
partitioning) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F, types as T

from streamingpro_spark.operators.base import ETAlgorithm, get_int
from streamingpro_spark.operators.registry import register_et

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
])


@register_et("ImageMetadata")
class ImageMetadata(ETAlgorithm):
    """Attach decoded image metadata to a binary column.

    `run files as ImageMetadata.`` where contentCol="content"`.
    mapInPandas → Arrow batches; per-batch decode keeps Python overhead
    amortized.  On 100 TB: pure map stage, no shuffle; partition count
    follows the file scan (`maxPartitionBytes`).
    """

    def train(self, df, path, params, context=None):
        col = params.get("contentCol", "content")
        out_schema = T.StructType(df.schema.fields + [T.StructField("image_meta", IMAGE_META_SCHEMA)])

        def _decode_image_stub(content: bytes) -> dict:
            """STUB decode: real impl would use PIL/cv2 (not installed here).
            Returns deterministic fake metadata derived from the bytes so the
            pipeline is testable end-to-end.  Nested for by-value pickling."""
            if content is None:
                return {"width": None, "height": None,
                        "channels": None, "format": None}
            size = len(content)
            return {"width": int(size % 1024) + 1,
                    "height": int((size // 1024) % 1024) + 1,
                    "channels": 3, "format": "stub"}

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["image_meta"] = [
                    _decode_image_stub(c) for c in pdf[col]]
                yield pdf

        return df.mapInPandas(decode, out_schema)

    def explain_params(self):
        return [("contentCol", "binary column with encoded image bytes", "content")]


@register_et("FrameSample")
class FrameSample(ETAlgorithm):
    """Sample N pseudo-frames from a binary video column — emits one row
    per sampled frame with (frame_index, frame_bytes).  Decode is
    stubbed (slices of the source bytes); the explode/batch plumbing is
    real.  Scale: output rows = input × n_frames; map-only."""

    def train(self, df, path, params, context=None):
        col = params.get("contentCol", "content")
        n = get_int(params, "numFrames", 4)
        base_fields = [f for f in df.schema.fields if f.name != col]
        out_schema = T.StructType(base_fields + [
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ])

        def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for _, row in pdf.iterrows():
                    content = row[col] or b""
                    chunk = max(len(content) // max(n, 1), 1)
                    for i in range(n):
                        out = {k: row[k] for k in pdf.columns if k != col}
                        out["frame_index"] = i
                        out["frame_bytes"] = bytes(content[i * chunk:(i + 1) * chunk])
                        rows.append(out)
                yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

        return df.mapInPandas(sample, out_schema)

    def explain_params(self):
        return [("contentCol", "binary column", "content"),
                ("numFrames", "frames per input row", "4")]


@register_et("AudioFeatures")
class AudioFeatures(ETAlgorithm):
    """Attach decoded audio features to a binary column.

    `run files as AudioFeatures.`` where contentCol="content"`.
    Decode is STUBBED (librosa/soundfile absent in this container) with
    deterministic arithmetic on the byte length — 16-bit PCM @ 16 kHz
    assumed — so the plumbing is oracle-checkable end-to-end; a real
    deploy swaps only the body of `_decode_audio_stub`.

    Scale: map-only mapInPandas stage, no shuffle; partitioning follows
    the binary file scan.
    """

    AUDIO_SCHEMA = T.StructType([
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_stub", T.DoubleType()),
    ])

    def train(self, df, path, params, context=None):
        col = params.get("contentCol", "content")
        out_schema = T.StructType(
            df.schema.fields + [T.StructField("audio_meta", self.AUDIO_SCHEMA)])

        def _decode_audio_stub(content: bytes) -> dict:
            # nested for by-value pickling
            if content is None:
                return {"sample_rate": None, "n_samples": None,
                        "duration_ms": None, "rms_stub": None}
            size = len(content)
            n_samples = size // 2
            # integer-exact arithmetic: float rounding differs across
            # engines (half-even vs half-away) — keep the oracle trivial
            return {"sample_rate": 16000,
                    "n_samples": n_samples,
                    "duration_ms": n_samples * 1000 // 16000,
                    "rms_stub": (size % 1000) / 1000.0}

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["audio_meta"] = [_decode_audio_stub(c) for c in pdf[col]]
                yield pdf

        return df.mapInPandas(decode, out_schema)

    def explain_params(self):
        return [("contentCol", "binary column with encoded audio bytes", "content")]
