"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ordinary ``binary`` columns with a metadata
struct; decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` so each executor processes column batches (the decode
libraries are NOT in this container — the decode kernel is a clearly-marked
stub with a deterministic fake so the Spark-side contract — schema,
partitioning, batch shape — is real and tested; swap ``_decode_payload``
for a real codec in production).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

METADATA_SCHEMA = T.StructType([
    T.StructField("modality", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
])


def attach_binary_metadata(
    df: DataFrame,
    binary_col: str,
    modality: str,
    mime: str,
    meta_col: str = "media_meta",
) -> DataFrame:
    """Attach the typed metadata struct next to an opaque binary column.

    Width/height/frames are derived deterministically from the payload hash
    (stand-ins until a real probe decodes headers) — the COLUMN SHAPE is the
    contract downstream operators rely on."""
    h = F.abs(F.xxhash64(F.col(binary_col)))
    return df.withColumn(meta_col, F.struct(
        F.lit(modality).alias("modality"),
        F.lit(mime).alias("mime"),
        (h % 1920 + 1).cast("int").alias("width"),
        (h % 1080 + 1).cast("int").alias("height"),
        (h % 300 + 1).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    ))


def _decode_payload(payload: bytes, meta: dict) -> list[float]:
    """STUB decode kernel.  In production this calls the real codec
    (PIL/ffmpeg/soundfile — not available in this container).  The
    deterministic fake returns an 8-dim feature from the payload bytes so
    the distributed plumbing is testable end-to-end."""
    if payload is None:
        raise NotImplementedError(
            "real decode requires an image/audio codec; install one and "
            "replace _decode_payload")
    acc = [0.0] * 8
    for i, byte in enumerate(payload[:1024]):
        acc[i % 8] += byte / 255.0
    return acc


def decode_binary(
    df: DataFrame,
    binary_col: str,
    meta_col: str = "media_meta",
    out_col: str = "features",
    batch_size_hint: Optional[int] = None,
) -> DataFrame:
    """Decode/feature-extract binary payloads via ``mapInPandas`` (Arrow
    batches; one Python worker per core; no shuffle — a narrow map over
    whatever partitioning the scan produced)."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.DoubleType()))])
    in_cols = df.columns

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(p, m) if p is not None else None
                for p, m in zip(pdf[binary_col], pdf.get(meta_col, [None] * len(pdf)))
            ]
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf[in_cols + [out_col]]

    return df.mapInPandas(mapper, schema=out_schema)


def sample_frames(
    df: DataFrame,
    meta_col: str = "media_meta",
    every_n: int = 10,
    out_col: str = "frame_index",
) -> DataFrame:
    """Explode every Nth frame index per video row (JVM-side sequence
    explode; downstream decode then happens per-frame, distributing a large
    video corpus across the cluster row-by-frame)."""
    n_frames = F.col(f"{meta_col}.n_frames")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.withColumn(out_col, F.explode(idx))
