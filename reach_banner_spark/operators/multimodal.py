"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns with typed metadata
(schemas.ASSETS). The Spark-side plumbing — schema, partition-friendly
synthesis, Arrow batch shape through ``mapInPandas``, deterministic
feature extraction over raw bytes — is real and tested; the actual
image/audio DECODE step is stubbed (the codec libraries are not in this
container): ``decode_asset`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic byte-statistics "feature"
stands in so the downstream plumbing is exercisable end-to-end.

Keys:
- ``mm_metadata``   : synthesize assets from documents (binary = UTF-8 bytes
                      of text), project typed metadata — DuckDB oracle.
- ``mm_decode_stub``: mapInPandas over binary payloads -> per-asset feature
                      vector stats (∅-oracle; deterministic, pytest-checked).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(key: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[key] = (fn, sql)
        return fn

    return deco


_KINDS = ["image", "audio", "video"]


def assets_from_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic asset table: payload = encode(text), kind by doc_id%3."""
    d = spark.read.parquet(f"{sf}/documents.parquet")
    kinds = F.array(*[F.lit(k) for k in _KINDS])
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(kinds, (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.when(F.col("doc_id") % 3 == 0, (F.col("n_chars") % 640).cast("int")).alias("width"),
        F.when(F.col("doc_id") % 3 == 0, (F.col("n_chars") % 480).cast("int")).alias("height"),
        F.when(F.col("doc_id") % 3 != 0, (F.col("n_chars") * 10).cast("int")).alias("duration_ms"),
    )


def decode_asset(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode an asset payload into a feature array.

    STUB: real decoding needs codec libraries absent from this container
    (PIL/ffmpeg/torchaudio). With ``fake=True`` a deterministic byte-level
    statistic vector is returned so the distributed plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "asset decoding requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    b = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float64)
    return np.array(
        [len(b), float(b.mean()), float(b.std()), float(b.min()), float(b.max())]
    )


@register(
    "mm_metadata",
    "SELECT doc_id AS asset_id, "
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END AS kind, "
    "CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes "
    "FROM documents",
)
def mm_metadata(spark, sf):
    a = assets_from_documents(spark, sf)
    return a.select(
        "asset_id", "kind", F.octet_length("payload").cast("long").alias("n_bytes")
    )


@register(
    "mm_frame_sample",
    # frame sampling plumbing: every 4th 64-byte block of video payloads
    "SELECT asset_id, CAST(frame_idx AS INT) AS frame_idx, "
    "CAST(LEAST(64, n_bytes - frame_idx * 256) AS BIGINT) AS n_bytes FROM ("
    " SELECT doc_id AS asset_id, OCTET_LENGTH(ENCODE(text)) AS n_bytes, "
    "  unnest(range(0, CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / 256.0) AS BIGINT))) AS frame_idx"
    " FROM documents WHERE doc_id % 3 = 2)",
)
def mm_frame_sample(spark, sf):
    """Frame-sample plumbing for video assets: one 'frame' per 256-byte
    stride, 64 bytes each (deterministic stand-in for real frame decode —
    codec libs absent; the distributed stride/explode shape is real)."""
    a = assets_from_documents(spark, sf).filter(F.col("kind") == "video")
    n_frames = F.ceil(F.octet_length("payload") / F.lit(256.0)).cast("long")
    # Empty payload => n_frames=0 and sequence(0,-1) auto-DESCENDS to [0,-1]
    # (two bogus frames) while the oracle's range(0,0) emits none — gate it.
    idx_seq = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<long>")
    )
    frames = a.select(
        "asset_id",
        F.octet_length("payload").alias("total"),
        F.explode(idx_seq).alias("frame_idx"),
    )
    return frames.select(
        "asset_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.least(F.lit(64), F.col("total") - F.col("frame_idx") * 256)
        .cast("long")
        .alias("n_bytes"),
    )


@register(
    "mm_resize",
    # resize plumbing for image assets: target box + deterministic
    # aspect-preserving output dims (the pixel resample itself needs codec
    # libs; the dimension math + batch plumbing is the real Spark surface)
    "SELECT doc_id AS asset_id, "
    "CAST(GREATEST(n_chars % 640, 1) AS INT) AS width, "
    "CAST(GREATEST(n_chars % 480, 1) AS INT) AS height, "
    "CAST(FLOOR(GREATEST(n_chars % 640, 1) * LEAST("
    " 256.0 / GREATEST(n_chars % 640, 1), 256.0 / GREATEST(n_chars % 480, 1),"
    " 1.0)) AS INT) AS out_w, "
    "CAST(FLOOR(GREATEST(n_chars % 480, 1) * LEAST("
    " 256.0 / GREATEST(n_chars % 640, 1), 256.0 / GREATEST(n_chars % 480, 1),"
    " 1.0)) AS INT) AS out_h "
    "FROM documents WHERE doc_id % 3 = 0",
)
def mm_resize(spark, sf, box: int = 256):
    """Image-resize plumbing: fit (width, height) into a box x box square,
    preserving aspect, never upscaling — pure column math over the typed
    metadata (the actual pixel resample is decode-stubbed like
    ``mm_decode_stub``; a real deployment swaps a Pandas-UDF resampler into
    the same schema without touching this plan)."""
    a = assets_from_documents(spark, sf).filter(F.col("kind") == "image")
    w = F.greatest("width", F.lit(1)).cast("double")
    h = F.greatest("height", F.lit(1)).cast("double")
    scale = F.least(F.lit(float(box)) / w, F.lit(float(box)) / h, F.lit(1.0))
    return a.select(
        "asset_id",
        w.cast("int").alias("width"),
        h.cast("int").alias("height"),
        F.floor(w * scale).cast("int").alias("out_w"),
        F.floor(h * scale).cast("int").alias("out_h"),
    )


@register("mm_decode_stub", None)  # deterministic stub; pytest-checked
def mm_decode_stub(spark, sf):
    """Arrow-batched decode/feature-extract over binary payloads."""
    a = assets_from_documents(spark, sf).select("asset_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = np.stack(
                [
                    decode_asset(p, k, fake=True)
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": feats[:, 0].astype(np.int64),
                    "byte_mean": np.round(feats[:, 1], 6),
                    "byte_std": np.round(feats[:, 2], 6),
                }
            )

    return a.mapInPandas(
        run,
        "asset_id long, kind string, n_bytes long, byte_mean double, byte_std double",
    )
