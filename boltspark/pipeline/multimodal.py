"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video bytes ride as BinaryType columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over mapInPandas.  The codec libraries
(Pillow/ffmpeg/...) are NOT in this container, so the actual pixel/PCM
decode is stubbed behind ``NotImplementedError`` with a deterministic
fake for tests — but the Spark-side plumbing (schema, partitioning,
UDF signatures, batch shapes) is real and tested, which is the part
that matters for the 100 TB pipeline.
"""

from __future__ import annotations

import hashlib
import struct as pystruct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),   # image/audio/video
    T.StructField("format", T.StringType()),       # png/jpeg/wav/mp4/...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload_sha", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

FEATURE_DIM = 16


def real_decode(payload: bytes, meta: dict):  # pragma: no cover - env stub
    """Decode media bytes to pixels/PCM.  STUB: the image/audio libraries
    are not installed in this container."""
    raise NotImplementedError(
        "media decode requires Pillow/soundfile/ffmpeg — not available in "
        "this environment; wire in here on a real cluster image"
    )


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic fake 'embedding' so the distributed plumbing is
    testable without codec libraries: sha256 -> 16 floats in [0,1)."""
    d = hashlib.sha256(payload or b"").digest()
    vals = np.frombuffer(d[: FEATURE_DIM * 2], dtype=np.uint16)
    return (vals / 65536.0).astype(np.float32)


def extract_features(df: DataFrame, payload_col: str = "payload",
                     key: str = "doc_id", use_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one feature
    batch out.  Swap ``use_stub=False`` on a cluster with codec libs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            if use_stub:
                feats = [_fake_feature(p) for p in payloads]
            else:  # pragma: no cover
                feats = [real_decode(p, {}) for p in payloads]
            yield pd.DataFrame({
                key: pdf[key].astype("int64"),
                "payload_sha": [hashlib.sha256(p or b"").hexdigest() for p in payloads],
                "n_bytes": payloads.str.len().fillna(0).astype("int64"),
                "feature": feats,
            })

    schema = T.StructType([T.StructField(key, T.LongType())]
                          + FEATURE_SCHEMA.fields[1:])
    return df.mapInPandas(run, schema)


def media_from_text(df: DataFrame, text_col: str = "text",
                    key: str = "doc_id") -> DataFrame:
    """Media table derived from a text column: payload = the utf-8 bytes
    (an oracle-recomputable stand-in for image/audio payloads — sha256
    and byte length are exactly checkable from the source table), plus
    the typed MEDIA_META struct.  Pure built-ins; the downstream
    extract_features/resize path is identical to real binary media."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8")
    meta = F.struct(
        F.lit("text").alias("media_type"), F.lit("utf-8").alias("format"),
        F.lit(0).cast("int").alias("width"), F.lit(0).cast("int").alias("height"),
        F.lit(1).cast("int").alias("n_frames"),
        F.lit(0).cast("int").alias("sample_rate"),
    )
    return df.select(F.col(key).cast("long").alias(key),
                     payload.alias("payload"), meta.alias("meta"))


def synth_media_table(spark, n_rows: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: binary payloads + typed metadata."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        size = int(rng.integers(64, 4096))
        payload = pystruct.pack("<q", i) + rng.bytes(size)
        rows.append((
            i, bytearray(payload),
            ("image", "png", int(rng.integers(16, 512)),
             int(rng.integers(16, 512)), 1, 0),
        ))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ])
    return spark.createDataFrame(rows, schema)


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("src_w", T.IntegerType()),
    T.StructField("src_h", T.IntegerType()),
    T.StructField("dst_w", T.IntegerType()),
    T.StructField("dst_h", T.IntegerType()),
    T.StructField("resized", T.BinaryType()),
])


def resize_images(df: DataFrame, max_side: int = 224,
                  payload_col: str = "payload", key: str = "doc_id",
                  use_stub: bool = True) -> DataFrame:
    """Aspect-preserving resize over mapInPandas: the target-geometry
    math and the Arrow batch plumbing are real; the pixel work is the
    environment-stubbed decode (swap ``use_stub=False`` with codec libs).
    The stub output is deterministic (sha256 of payload+geometry) so
    the distributed path is testable end to end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["meta"].map(lambda m: m["width"]).astype("int64")
            h = pdf["meta"].map(lambda m: m["height"]).astype("int64")
            scale = np.minimum(1.0, max_side / np.maximum(w, h).clip(lower=1))
            dw = np.maximum(1, np.round(w * scale)).astype("int32")
            dh = np.maximum(1, np.round(h * scale)).astype("int32")
            if use_stub:
                resized = [
                    hashlib.sha256((p or b"") + pystruct.pack("<ii", a, b)).digest()
                    for p, a, b in zip(pdf[payload_col], dw, dh)
                ]
            else:  # pragma: no cover
                resized = [real_decode(p, {"resize": (a, b)})
                           for p, a, b in zip(pdf[payload_col], dw, dh)]
            yield pd.DataFrame({
                key: pdf[key].astype("int64"),
                "src_w": w.astype("int32"), "src_h": h.astype("int32"),
                "dst_w": dw, "dst_h": dh, "resized": resized,
            })

    schema = T.StructType([T.StructField(key, T.LongType())]
                          + RESIZE_SCHEMA.fields[1:])
    return df.mapInPandas(run, schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame index
    (pure built-ins — the decode itself happens in extract_features)."""
    return df.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                       F.lit(every_n))
        ).alias("frame_idx"),
    )
