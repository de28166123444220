"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side machinery here is real and tested — schemas, Arrow-
batched ``mapInPandas`` UDF signatures, partition sizing — while the
actual media decoding is stubbed behind :func:`register_decoder`
(image/audio libs aren't in this container; a deterministic fake
decoder stands in so the plumbing is exercised end-to-end). Swapping in
a real decoder is a one-function change.

At scale: binary payloads ride as parquet binary columns (or
``spark.read.format('binaryFile')`` over object storage); decode /
feature-extract runs in ``mapInPandas`` so each Arrow batch amortizes
Python overhead, and ``spark.sql.files.maxPartitionBytes`` bounds
per-task memory (payload bytes dominate row width).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),      # image | audio | video
    StructField("format", StringType()),        # png | wav | mp4 | ...
    StructField("payload", BinaryType()),
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_bytes", LongType()),
    ])),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),
    StructField("n_bytes", LongType()),
    StructField("checksum", StringType()),
    StructField("feature", StringType()),
])

_DECODERS: dict[str, Callable[[bytes, str], dict[str, Any]]] = {}


def register_decoder(modality: str,
                     fn: Callable[[bytes, str], dict[str, Any]]) -> None:
    """Plug in a real decoder: fn(payload, fmt) -> feature dict."""
    _DECODERS[modality] = fn


def _stub_decode(payload: bytes, fmt: str) -> dict[str, Any]:
    """Deterministic fake decoder (REPLACE via register_decoder): real
    image/audio decoding needs libs not present in this container."""
    # NotImplementedError semantics, but deterministic so plumbing tests
    # can assert on it:
    return {"feature": f"stub:{fmt}:{len(payload)}"}


def attach_media(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Fixture lift: derive a deterministic binary payload + metadata
    struct from a text table (the documents fixture has no real media;
    payload = utf-8 bytes, metadata from its length). Production path:
    the payload column arrives from parquet/binaryFile already."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        (F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video")).alias("modality"),
        (F.when(F.col(id_col) % 3 == 0, "png")
         .when(F.col(id_col) % 3 == 1, "wav")
         .otherwise("mp4")).alias("format"),
        payload.alias("payload"),
        F.struct(
            (F.octet_length(payload) % 1920).cast("int").alias("width"),
            (F.octet_length(payload) % 1080).cast("int").alias("height"),
            (F.octet_length(payload) * 10).cast("int").alias("duration_ms"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame,
                     batch_size_hint: int = 256) -> DataFrame:
    """Decode/feature-extract via Arrow-batched ``mapInPandas``.

    The pandas iterator signature is the real production shape: each
    batch is decoded payload-by-payload (vectorized where the decoder
    allows), and the output schema is fixed so downstream relational
    ops stay columnar.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = []
            for payload, modality, fmt in zip(pdf["payload"], pdf["modality"],
                                              pdf["format"]):
                raw = bytes(payload) if payload is not None else b""
                decoder = _DECODERS.get(modality, _stub_decode)
                d = decoder(raw, fmt)
                feats.append((len(raw),
                              hashlib.md5(raw).hexdigest(),
                              str(d.get("feature"))))
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": [f[0] for f in feats],
                "checksum": [f[1] for f in feats],
                "feature": [f[2] for f in feats],
            })
            yield out

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode each video into frame
    timestamps (the decode of each frame is the stubbed step). Shows
    the fan-out shape: one row per (media_id, frame_ts_ms)."""
    n_frames = F.greatest((F.col("meta.duration_ms") / every_ms)
                          .cast("int"), F.lit(1))
    return (
        media.filter(F.col("modality") == "video")
        .select("media_id",
                F.explode(F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: i * every_ms)).alias("frame_ts_ms"))
    )
