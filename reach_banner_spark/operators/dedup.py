"""Deduplication operators over the ``documents`` table.

Training-data-pipeline surface (part of the graded operator inventory):
exact hash dedup, MinHash-LSH near-dup, SimHash near-dup, and n-gram
Jaccard — each a ``queries()`` key. Exact and n-gram variants have DuckDB
oracles; the LSH/SimHash families are deterministic (fixed seeds) and
golden-checked in pytest against exhaustive similarity at small scale.

Scale design:
- exact dedup is one hash-aggregate (map-side partial combine, no row
  explosion);
- MinHash-LSH is the standard shingle -> signature -> band -> bucket-join
  pipeline: the only shuffle is the equi-join on (band_idx, band_hash) and
  the candidate-pair distinct; the quadratic all-pairs problem never
  materializes;
- SimHash pairs bucket on 4x16-bit chunks (pigeonhole: hamming<=3 over 64
  bits guarantees one exact chunk match), again an equi-join;
- n-gram Jaccard verification is array algebra (JVM-side higher-order
  functions), only over candidate pairs.
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


def _docs(spark, sf):
    return spark.read.parquet(f"{sf}/documents.parquet")


# ------------------------------------------------------------------ exact ----

@register(
    "dedup_exact",
    "SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups "
    "FROM documents GROUP BY MD5(text)",
)
def dedup_exact(spark, sf):
    d = _docs(spark, sf)
    return (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_dups"))
        .drop("h")
    )


# ----------------------------------------------------------- minhash-lsh ----

# Doc near-dup LSH operating point: 8 bands x 8 rows targets TRUE near-dups
# (candidate prob 0.99 at j=0.9, 0.03 at j=0.5). This synthetic corpus has
# MEDIAN pairwise char-3-gram Jaccard ~0.48 (measured) — a high-recall-at-
# 0.5 scheme would admit essentially all ~1.25B pairs at sf0.1.
DOC_NUM_HASHES = 64
DOC_NUM_BANDS = 8
MAX_BUCKET = 50  # degenerate-bucket cap: buckets this big are common-pattern
# collisions contributing O(size^2) low-similarity pairs; a true near-dup
# pair collides in ~all of its 8 bands, so dropping its few huge buckets
# barely dents recall (standard "stop bucket" trick in LSH dedup).


def doc_band_hashes(d: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, band_idx, band_hash) via char-3-gram shingles + MinHash."""
    from .linking import band_hashes

    narrow = d.select("doc_id", text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bh = band_hashes(
                pdf[text_col], num_hashes=DOC_NUM_HASHES, num_bands=DOC_NUM_BANDS
            )
            n, b = bh.shape
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), b),
                    "band_idx": np.tile(np.arange(b, dtype=np.int32), n),
                    "band_hash": bh.reshape(-1),
                }
            )

    return narrow.mapInPandas(run, "doc_id long, band_idx int, band_hash long")


def doc_shingles(d: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sh: array<long>) sorted distinct hashed char-3-gram sets —
    computed ONCE per doc so pair verification stays JVM-side."""
    from .linking import char3_shingle_ids

    narrow = d.select("doc_id", text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            sh = char3_shingle_ids(pdf[text_col])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "sh": [x.tolist() for x in sh],
                }
            )

    return narrow.mapInPandas(run, "doc_id long, sh array<long>")


@register("dedup_minhash_lsh", None)  # pytest-golden vs exhaustive Jaccard
def dedup_minhash_lsh(spark, sf, min_jaccard: float = 0.9):
    """Near-duplicate pairs (j >= 0.9) with exact verified Jaccard.

    shingle -> minhash -> band -> bucket-join (degenerate buckets capped)
    -> JVM-side exact verify (array_intersect on precomputed shingle sets;
    no Python in the quadratic part).
    """
    d = _docs(spark, sf)
    bands = doc_band_hashes(d)
    # cap degenerate buckets
    sizes = bands.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    bands = bands.join(
        sizes.filter(F.col("bucket_n") <= MAX_BUCKET), ["band_idx", "band_hash"]
    ).drop("bucket_n")
    a = bands.select(F.col("doc_id").alias("a"), "band_idx", "band_hash")
    b = bands.select(F.col("doc_id").alias("b"), "band_idx", "band_hash")
    cands = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sh = doc_shingles(d)
    pairs = (
        cands.join(sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")), "a")
        .join(sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b")), "b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
        .select("a", "b", "jaccard")
    )


# --------------------------------------------------------------- simhash ----

def simhash64(texts: pd.Series) -> np.ndarray:
    """Deterministic 64-bit SimHash over whitespace tokens (uint64)."""
    from ..functions.hashing import fnv64_array

    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        words = np.array((t or "").lower().split(), dtype=object)
        if len(words) == 0:
            continue
        h = fnv64_array(words)  # (m,) uint64
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)  # signed bit votes
        sig = np.uint64(0)
        for j in range(64):
            if v[j] > 0:
                sig |= np.uint64(1) << np.uint64(j)
        out[i] = sig
    return out


@register("dedup_simhash", None)  # deterministic; golden-checked in pytest
def dedup_simhash(spark, sf):
    """Per-doc 64-bit SimHash + 4x16-bit chunk keys for hamming<=3 blocking."""
    d = _docs(spark, sf).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            sig = simhash64(pdf["text"])
            out = pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy()})
            out["simhash"] = sig.astype(np.int64)  # two's-complement view
            for c in range(4):
                out[f"chunk{c}"] = (
                    (sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)
                ).astype(np.int64)
            yield out

    return d.mapInPandas(
        run,
        "doc_id long, simhash long, chunk0 long, chunk1 long, chunk2 long, chunk3 long",
    )


# --------------------------------------------------------- n-gram jaccard ----

@register(
    "dedup_ngram_jaccard",
    # word-set Jaccard of consecutive docs within a source (bounded pair set)
    "SELECT a.doc_id AS a, b.doc_id AS b, "
    "ROUND(CAST(LEN(list_intersect(a.w, b.w)) AS DOUBLE) / "
    "LEN(list_distinct(list_concat(a.w, b.w))), 6) AS jaccard FROM "
    "(SELECT doc_id, source, list_distinct(string_split(text,' ')) w FROM documents) a "
    "JOIN (SELECT doc_id, source, list_distinct(string_split(text,' ')) w FROM documents) b "
    "ON a.source = b.source AND b.doc_id = a.doc_id + 20",
)
def dedup_ngram_jaccard(spark, sf):
    d = _docs(spark, sf).select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("w")
    )
    a = d.select(F.col("doc_id").alias("a"), F.col("source").alias("sa"), F.col("w").alias("wa"))
    b = d.select(F.col("doc_id").alias("b"), F.col("source").alias("sb"), F.col("w").alias("wb"))
    pairs = a.join(
        b, (F.col("sa") == F.col("sb")) & (F.col("b") == F.col("a") + 20)
    )
    inter = F.size(F.array_intersect("wa", "wb")).cast("double")
    union = F.size(F.array_distinct(F.concat("wa", "wb"))).cast("double")
    return pairs.select(
        "a", "b", F.round(inter / union, 6).alias("jaccard")
    )
