"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side machinery here is real and tested — schemas, Arrow-
batched ``mapInPandas`` UDF signatures, partition sizing. AUDIO and
IMAGE decode are real too: :func:`decode_wav` is a strict pure-numpy
RIFF/WAVE (PCM16) parser — container magic, chunk walk, fmt
validation, sample extraction, amplitude features — and
:func:`decode_ppm` a strict binary-PPM (P6) parser — magic, header
integers with comment handling, maxval and raster-length validation,
pixel statistics. Both are exercised over genuine container bytes
(:func:`make_wav` / :func:`make_ppm` build them; the fixture lift
synthesizes a deterministic waveform/raster per document). Video
decoding stays stubbed behind :func:`register_decoder` (the
compressed-codec libs aren't in this container); swapping in a real
decoder is a one-function change, exactly like the audio/image ones
plug in.

At scale: binary payloads ride as parquet binary columns (or
``spark.read.format('binaryFile')`` over object storage); decode /
feature-extract runs in ``mapInPandas`` so each Arrow batch amortizes
Python overhead, and ``spark.sql.files.maxPartitionBytes`` bounds
per-task memory (payload bytes dominate row width).
"""

from __future__ import annotations

import math
import struct
from collections.abc import Callable, Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),      # image | audio | video
    StructField("format", StringType()),        # ppm | wav | mp4 | ...
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
    StructField("metric", DoubleType()),   # numeric feature (e.g. RMS)
])

WAV_RATE = 8000


def make_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """Build a canonical RIFF/WAVE container (PCM16 mono, 44-byte
    header) around an int16 sample array — the writer twin of
    :func:`decode_wav`."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes, fmt: str = "wav") -> dict[str, Any]:
    """REAL audio decode, pure numpy/stdlib: strict RIFF/WAVE (PCM16
    mono) parser. Validates the container magic, the declared RIFF
    size, every chunk boundary, and the fmt chunk's encoding before
    touching a sample; raises ``ValueError`` on anything corrupt or
    unsupported (a malformed payload must fail the row loudly, not
    fake a feature).

    Returns feature ``wav:<rate>:<n_samples>``, ``metric`` = RMS
    amplitude (HALF_UP-rounded to 1e-6 — the repo's cross-engine float
    convention), and ``content`` = the comma-joined sample values (the
    decode-invariant canonical form the checksum hashes: the same
    audio re-containered hashes identically)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    declared = struct.unpack("<I", payload[4:8])[0]
    if declared + 8 != len(payload):
        raise ValueError(f"truncated WAV: RIFF declares {declared + 8} "
                         f"bytes, payload has {len(payload)}")
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"chunk {cid!r} overruns the container")
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if fmt_chunk is None or len(fmt_chunk) < 16 or data is None:
        raise ValueError("missing fmt /data chunk")
    audio_fmt, channels, rate, _rate_b, _align, bits = struct.unpack(
        "<HHIIHH", fmt_chunk[:16])
    if audio_fmt != 1 or bits != 16 or channels != 1:
        raise ValueError(f"unsupported WAV encoding: fmt={audio_fmt} "
                         f"bits={bits} channels={channels}")
    if len(data) % 2:
        raise ValueError("odd PCM16 data size")
    samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    n = int(samples.size)
    if n:
        # integer sum of squares (exact), then one float div + sqrt:
        # order-independent, bit-identical to the SQL oracle's
        # list_sum-of-BIGINT arithmetic
        rms = math.sqrt(int((samples * samples).sum()) / n)
        metric = math.floor(rms * 1e6 + 0.5) / 1e6
    else:
        metric = 0.0
    return {"feature": f"wav:{rate}:{n}",
            "metric": metric,
            "content": ",".join(str(int(s)) for s in samples)}


def make_ppm(pixels: np.ndarray) -> bytes:
    """Build a canonical binary PPM (P6, maxval 255) container around a
    (height, width, 3) uint8 pixel array — the writer twin of
    :func:`decode_ppm`."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("make_ppm wants (h, w, 3) RGB pixels")
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def _ppm_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers from a PPM header
    starting at ``start``, honoring ``#`` comments anywhere in the
    header: a comment runs to the next LF *or* CR (Netpbm allows
    either), and ``#`` also terminates a digit token (``255# c\\n`` is
    legal). The final token must still be ended by a single whitespace
    byte — the Netpbm header/raster boundary. Returns (values, position
    after that terminating whitespace byte)."""
    vals: list[int] = []
    pos = start
    while len(vals) < n:
        # skip interleaved whitespace and comments
        while pos < len(payload):
            b = payload[pos:pos + 1]
            if b.isspace():
                pos += 1
            elif b == b"#":
                while pos < len(payload) and payload[pos] not in (0x0A, 0x0D):
                    pos += 1
            else:
                break
        tok = b""
        while pos < len(payload) and payload[pos:pos + 1].isdigit():
            tok += payload[pos:pos + 1]
            pos += 1
        nxt = payload[pos:pos + 1]
        if not tok or not (nxt.isspace() or nxt == b"#"):
            raise ValueError("malformed PPM header")
        vals.append(int(tok))
    # a comment may sit between the last token and the boundary byte
    while payload[pos:pos + 1] == b"#":
        while pos < len(payload) and payload[pos] not in (0x0A, 0x0D):
            pos += 1
    if not payload[pos:pos + 1].isspace():
        raise ValueError("malformed PPM header")   # raster boundary
    return vals, pos + 1


def decode_ppm(payload: bytes, fmt: str = "ppm") -> dict[str, Any]:
    """REAL image decode, pure numpy/stdlib: strict binary PPM (P6,
    8-bit) parser. Validates the magic, header integers (with Netpbm
    ``#`` comment handling), the maxval (must fit one byte), and that
    the raster is EXACTLY ``width*height*3`` bytes; raises
    ``ValueError`` on anything corrupt or unsupported — a malformed
    payload must fail the row loudly, not fake a feature.

    Returns feature ``ppm:<width>x<height>``, ``metric`` = mean pixel
    value (exact integer sum, one float division, HALF_UP-rounded to
    1e-6 — the repo's cross-engine float convention), and ``content`` =
    the comma-joined raster bytes (the decode-invariant canonical form
    the checksum hashes: the same image re-containered hashes
    identically)."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) container")
    (w, h, maxval), pos = _ppm_tokens(payload, 3, 2)
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate PPM dimensions {w}x{h}")
    if not 0 < maxval < 256:
        raise ValueError(f"unsupported PPM maxval {maxval} "
                         "(only 1-byte samples)")
    raster = payload[pos:]
    if len(raster) != w * h * 3:
        raise ValueError(f"PPM raster is {len(raster)} bytes, header "
                         f"declares {w}x{h}x3 = {w * h * 3}")
    px = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
    mean = int(px.sum()) / px.size
    return {"feature": f"ppm:{w}x{h}",
            "metric": math.floor(mean * 1e6 + 0.5) / 1e6,
            "content": ",".join(str(int(v)) for v in px)}


_DECODERS: dict[str, Callable[[bytes, str], dict[str, Any]]] = {}

# Built-in real decoders (separate from the user-registration table so
# clearing/overriding registrations can't lose them): audio and image
# are real (uncompressed containers need no codec lib); video falls
# back to the stub until a codec decoder is plugged in.
_DEFAULT_DECODERS: dict[str, Callable[[bytes, str], dict[str, Any]]] = {
    "audio": decode_wav,
    "image": decode_ppm,
}


def register_decoder(modality: str,
                     fn: Callable[[bytes, str], dict[str, Any]]) -> None:
    """Plug in a real decoder: fn(payload, fmt) -> feature dict."""
    _DECODERS[modality] = fn


def _stub_decode(payload: bytes, fmt: str) -> dict[str, Any]:
    """Deterministic fake decoder for the modalities whose codec libs
    aren't in this container (video — REPLACE via register_decoder;
    audio and image already have the real :func:`decode_wav` /
    :func:`decode_ppm`)."""
    return {"feature": f"stub:{fmt}:{len(payload)}"}


def _wave_samples(doc_id: int, n: int) -> np.ndarray:
    """Deterministic per-document waveform: sample_i = (doc_id*31 +
    i*7) % 256 − 128. Chosen to be replicable in closed-form SQL so
    the decoded features can be oracle-verified end to end."""
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 31 + i * 7) % 256 - 128).astype(np.int16)


@pandas_udf(BinaryType())
def _synth_wav(doc_id: pd.Series, n_samples: pd.Series) -> pd.Series:
    """Arrow-batched WAV synthesis: real RIFF/PCM16 bytes per row."""
    return pd.Series([
        make_wav(_wave_samples(int(d), int(k)), WAV_RATE)
        for d, k in zip(doc_id, n_samples)])


def _image_pixels(doc_id: int) -> np.ndarray:
    """Deterministic per-document raster: width = 4 + doc_id % 13,
    height = 3 + doc_id % 7, raster byte_i = (doc_id*13 + i*5) % 256.
    Chosen to be replicable in closed-form SQL so the decoded image
    features can be oracle-verified end to end (the WAV convention)."""
    w, h = 4 + doc_id % 13, 3 + doc_id % 7
    i = np.arange(w * h * 3, dtype=np.int64)
    return ((doc_id * 13 + i * 5) % 256).astype(np.uint8).reshape(h, w, 3)


@pandas_udf(BinaryType())
def _synth_ppm(doc_id: pd.Series) -> pd.Series:
    """Arrow-batched PPM synthesis: real P6 bytes per row."""
    return pd.Series([make_ppm(_image_pixels(int(d))) for d in doc_id])


def attach_media(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Fixture lift: derive a deterministic binary payload + metadata
    struct from a text table (the documents fixture has no real media).
    AUDIO rows carry a genuine RIFF/WAVE payload (PCM16 mono, 8 kHz,
    one sample per character of text, waveform a closed-form function
    of the id) and IMAGE rows a genuine binary PPM (P6, dimensions and
    raster closed-form functions of the id) for the real decoders;
    video rows keep utf-8 bytes as stand-ins for their stubbed decoder.
    Production path: the payload column arrives from
    parquet/binaryFile already."""
    text_payload = F.encode(F.col(text_col), "utf-8")
    payload: Column = F.when(
        F.col(id_col) % 3 == 1,
        _synth_wav(F.col(id_col), F.length(F.col(text_col)))
    ).when(
        F.col(id_col) % 3 == 0, _synth_ppm(F.col(id_col))
    ).otherwise(text_payload)
    return df.select(
        F.col(id_col).alias("media_id"),
        (F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video")).alias("modality"),
        (F.when(F.col(id_col) % 3 == 0, "ppm")
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
                decoder = _DECODERS.get(modality) \
                    or _DEFAULT_DECODERS.get(modality, _stub_decode)
                d = decoder(raw, fmt)
                # checksum the decoder's canonical content when it
                # provides one (decode-invariant: the same media
                # re-containered hashes identically), raw bytes
                # otherwise
                content = d.get("content")
                digest = hashlib.md5(
                    content.encode() if content is not None else raw
                ).hexdigest()
                metric = d.get("metric")
                feats.append((len(raw), digest, str(d.get("feature")),
                              None if metric is None else float(metric)))
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": [f[0] for f in feats],
                "checksum": [f[1] for f in feats],
                "feature": [f[2] for f in feats],
                "metric": [f[3] for f in feats],
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
