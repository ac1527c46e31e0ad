"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed:
``decode="fake"`` derives deterministic pseudo-features from the bytes
(sha256-seeded), ``decode="real"`` raises NotImplementedError at the exact
seam where PIL/librosa/ffmpeg would plug in. Everything Spark-side — the
schema, Arrow batch shape, mapInPandas signature, partition strategy — is
real and tested; swapping in a real codec changes one function.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),     # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),    # image/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
    T.StructField("payload", T.BinaryType(), False),  # opaque encoded bytes
])

FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract: features are a
    pure function of the bytes (sha256 expanded), so tests are exact.

    The counter suffix is ASCII (``b"0"``, ``b"1"``, ...) rather than raw
    bytes so the identical expansion is expressible as DuckDB SQL
    (``sha256(text || '0')``) — that gives the driver contract a real
    value-level oracle for the multimodal plumbing."""
    out = np.empty(dim, dtype=np.float32)
    i, ctr = 0, 0
    while i < dim:
        h = hashlib.sha256(payload + str(ctr).encode()).digest()
        for j in range(0, 32, 4):
            if i >= dim:
                break
            out[i] = int.from_bytes(h[j:j + 4], "big") / 2**32
            i += 1
        ctr += 1
    return out


def extract_media_features(media: DataFrame,
                           decode: str = "fake") -> DataFrame:
    """(media_id, kind, feature: array<float>) via mapInPandas — the Arrow
    batch carries the binary payloads; partitioning is preserved (narrow)."""
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    out_schema = "media_id long, kind string, feature array<float>"

    def extract(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode needs PIL/librosa/ffmpeg — not in "
                    "this container; plug the codec in here")
            feats = [_fake_decode(bytes(p)).tolist()
                     for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"], "feature": feats})

    return media.mapInPandas(extract, out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 decode: str = "fake") -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame offset.
    Offsets are exact (from duration_ms); frame decode is the stub seam."""
    frames = (media.where(F.col("kind") == "video")
              .withColumn("frame_ms", F.explode(F.sequence(
                  F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)))))
    if decode == "real":
        raise NotImplementedError("real frame decode not available here")
    return frames.select("media_id", "frame_ms",
                         F.sha2(F.concat(F.col("payload"),
                                         F.col("frame_ms").cast("string")
                                         .cast("binary")), 256)
                         .substr(1, 16).alias("frame_digest"))


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + int(rng.integers(0, 256)))
        rows.append((i, kind,
                     {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[kind],
                     64 if kind != "audio" else None,
                     64 if kind != "audio" else None,
                     None if kind == "image" else
                     int(rng.integers(1000, 10000)),
                     payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
