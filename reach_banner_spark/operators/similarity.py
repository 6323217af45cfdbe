"""Similarity search over the ``embeddings`` table (array<float> column).

- ``ann_cosine_topk``: brute-force exact top-k cosine per query — the
  correctness baseline, expressed entirely JVM-side with higher-order
  functions (``zip_with`` + ``aggregate``), no Python. DuckDB oracle via
  ``list_cosine_similarity``.
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH bucketing
  (sign-bit signatures of dot products with seeded hyperplanes), bucket
  equi-join, exact cosine re-rank inside buckets only. At 100 TB the
  brute-force cross join is infeasible; the bucket join shuffles
  O(n * n_tables) rows instead of O(n * q).

Float policy: cosine is computed in float64 from float32 inputs in BOTH
engines, rounded to 6 decimals; ties broken by vec_id so top-k is stable.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QueryFn = Callable[[SparkSession, str], DataFrame]
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 10


def register(key: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[key] = (fn, sql)
        return fn

    return deco


def _emb(spark, sf):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def _cosine(a, b):
    """JVM-side cosine of two array<float> columns (float64 math)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    return dot / (na * nb)


_COS_SQL = (
    "list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(e.embedding, x -> CAST(x AS DOUBLE))) / "
    "(SQRT(list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(q.embedding, x -> CAST(x AS DOUBLE)))) * "
    "SQRT(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(e.embedding, x -> CAST(x AS DOUBLE)))))"
)


@register(
    "ann_cosine_topk",
    f"""SELECT qid, vec_id, cos FROM (
      SELECT q.vec_id AS qid, e.vec_id AS vec_id,
        ROUND({_COS_SQL}, 6) AS cos,
        ROW_NUMBER() OVER (PARTITION BY q.vec_id
          ORDER BY ROUND({_COS_SQL}, 6) DESC, e.vec_id) AS rn
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ) WHERE rn <= {TOP_K}""",
)
def ann_cosine_topk(spark, sf):
    e = _emb(spark, sf)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pairs = F.broadcast(q).crossJoin(e.select("vec_id", "embedding")).filter(
        F.col("vec_id") != F.col("qid")
    )
    scored = pairs.select(
        "qid",
        "vec_id",
        F.round(_cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cos")
    )


# -------------------------------------------------------------- LSH path ----

N_PLANES = 8   # bits per signature
N_TABLES = 8   # independent hash tables (OR-amplification)


def _hyperplanes(
    dim: int, n_tables: int = N_TABLES, n_planes: int = N_PLANES, seed: int = 42
) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_tables, n_planes, dim)).astype(np.float64)


def lsh_signatures(
    d: DataFrame,
    dim: int,
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, table_idx, sig) sign-bit bucket keys per vector."""
    planes = _hyperplanes(dim, n_tables, n_planes, seed)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n = len(pdf)
            out_ids = np.repeat(pdf["vec_id"].to_numpy(), n_tables)
            out_tbl = np.tile(np.arange(n_tables, dtype=np.int32), n)
            sigs = np.empty((n, n_tables), dtype=np.int64)
            for t in range(n_tables):
                proj = mat @ planes[t].T  # (n, n_planes)
                bits = (proj > 0).astype(np.int64)
                sigs[:, t] = (bits << np.arange(n_planes, dtype=np.int64)).sum(axis=1)
            yield pd.DataFrame(
                {"vec_id": out_ids, "table_idx": out_tbl, "sig": sigs.reshape(-1)}
            )

    return d.select("vec_id", "embedding").mapInPandas(
        run, "vec_id long, table_idx int, sig long"
    )


@register("ann_lsh_topk", None)  # recall vs brute force checked in pytest
def ann_lsh_topk(spark, sf):
    e = _emb(spark, sf)
    dim = len(e.select("embedding").first()[0])
    sigs = lsh_signatures(e, dim)
    qs = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "table_idx", "sig"
    )
    cands = (
        F.broadcast(qs)
        .join(sigs, ["table_idx", "sig"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    scored = (
        cands.join(F.broadcast(q), "qid")
        .join(e.select("vec_id", "embedding"), "vec_id")
        .select(
            "qid",
            "vec_id",
            F.round(_cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cos")
    )
