"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched pandas pipelines.

North-star operator set (not in the reference surface). The decode
libraries (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is stubbed behind a deterministic fake keyed on the
payload bytes — the Spark-side plumbing (schema, partitioning, UDF
signature, Arrow batch shape) is real and tested. Swapping
``_fake_decode`` for a real decoder changes no plan shape.

Scale posture: payloads stay as ``binary`` columns inside parquet —
feature extraction is ``mapInPandas`` (one Arrow batch per ~10k rows,
zero driver involvement); downstream joins/apices use only the small
typed metadata columns, never re-shipping the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, sha16 string, "
    "width int, height int, duration_s double, feature array<float>"
)


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for the real decoder (PIL/ffmpeg absent
    here). Derives stable pseudo-metadata from the payload digest so
    tests pin exact values; a real decoder replaces only this function.
    """
    if payload is None:
        raise NotImplementedError("real decode requires media libs")
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0] % 192 if kind in ("image", "video") else None
    height = 64 + d[1] % 192 if kind in ("image", "video") else None
    # exact dyadic rationals (x/16, x/128): bit-identical in float32,
    # float64, and any SQL engine — keeps the stub oracle-reproducible
    duration = d[2] / 16.0 if kind in ("audio", "video") else None
    feature = [(b - 128) / 128.0 for b in d[:8]]
    return {
        "n_bytes": len(payload),
        "sha16": d.hex()[:16],
        "width": width,
        "height": height,
        "duration_s": duration,
        "feature": feature,
    }


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p) if p is not None else None, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Frame-sampling plumbing for video: explodes per-media frame
    timestamps from the (stub-decoded) duration; the real
    implementation would emit one binary frame per row from ffmpeg.
    """
    feats = decode_features(media.filter(F.col("kind") == "video"))
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(F.col("duration_s") / every_s).cast("int"),
            )
        ).alias("frame_idx"),
    ).withColumn("frame_ts_s", F.col("frame_idx") * every_s)


def binary_metadata(media: DataFrame) -> DataFrame:
    """Pure-SQL metadata over binary payloads (no Python): size and
    content digest — the cheap pre-filter before any decode."""
    return media.select(
        "media_id",
        "kind",
        "mime",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
    )
