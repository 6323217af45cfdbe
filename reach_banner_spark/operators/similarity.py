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

import os
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
    from ..caching import cached_scan

    return cached_scan(spark, f"{sf}/embeddings.parquet")


def _emb_par(spark, sf):
    """Embeddings scan rebalanced for compute-heavy map stages (the
    corpus files are single-row-group parquet, i.e. ONE scan split and
    ONE Arrow/Python worker for every mapInPandas pass — see
    reach_banner_spark.fanout)."""
    from reach_banner_spark.fanout import fan_out

    return fan_out(_emb(spark, sf), "vec_id")


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
    e = _emb_par(spark, sf)
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


HAM_CAND = 50  # Hamming pre-rank candidates re-ranked exactly per query

_BIN_W_SQL = (
    "CAST(list_sum(list_transform(generate_series(0, 31), i -> "
    "CASE WHEN embedding[i + {off}] > 0 THEN (CAST(1 AS BIGINT) << i) "
    "ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
)


@register(
    "emb_binarize",
    # Sign-bit binarization + Hamming pre-rank + exact cosine re-rank,
    # spelled with identical integer arithmetic on both engines (32-bit
    # halves packed into BIGINTs; xor + popcount distance).
    f"""WITH b AS (SELECT vec_id,
      {_BIN_W_SQL.format(off=1)} AS w1,
      {_BIN_W_SQL.format(off=33)} AS w2 FROM embeddings),
    cand AS (SELECT qid, vec_id, ham FROM (
      SELECT q.vec_id AS qid, e.vec_id AS vec_id,
        CAST(bit_count(xor(q.w1, e.w1)) + bit_count(xor(q.w2, e.w2))
          AS BIGINT) AS ham,
        ROW_NUMBER() OVER (PARTITION BY q.vec_id
          ORDER BY bit_count(xor(q.w1, e.w1)) + bit_count(xor(q.w2, e.w2)),
          e.vec_id) AS rn
      FROM b q JOIN b e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}) WHERE rn <= {HAM_CAND})
    SELECT qid, vec_id, cos, ham FROM (
      SELECT c.qid, c.vec_id, c.ham, ROUND({_COS_SQL}, 6) AS cos,
        ROW_NUMBER() OVER (PARTITION BY c.qid
          ORDER BY ROUND({_COS_SQL}, 6) DESC, c.vec_id) AS rn2
      FROM cand c JOIN embeddings q ON q.vec_id = c.qid
      JOIN embeddings e ON e.vec_id = c.vec_id) WHERE rn2 <= {TOP_K}""",
)
def emb_binarize(spark, sf):
    """Binary sign quantization — the 1-bit member of the compression
    family (256-byte float vectors -> 8 bytes; PQ16x8 is the 16-byte
    member): pack each dimension's sign into two 32-bit words, pre-rank
    by Hamming distance (xor + popcount, pure integer codegen — the cheap
    pass a binarized index runs over EVERY vector), then exact-cosine
    re-rank only the ``HAM_CAND`` survivors. The same
    cheap-scan-then-exact-re-rank economics as ``emb_pq``'s ADC, at 2x
    less memory and a far simpler distance kernel; sign bits are also
    exactly the hyperplane-LSH signature family with axis-aligned planes,
    so the key doubles as the quantized complement of ``ann_lsh_topk``.

    Everything is deterministic integer algebra until the final rounded
    cosine, so the key carries a full same-value oracle (unlike the
    recall-tested ANN keys). Scale shape: the codes table is 16 B/row;
    the 5-query broadcast pre-rank touches codes only; float vectors are
    read for |queries| x HAM_CAND rows."""
    e = _emb_par(spark, sf)

    def pack(off: int):
        return F.expr(
            f"aggregate(transform(slice(embedding, {off}, 32), (x, i) -> "
            f"IF(x > 0, shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), "
            f"CAST(0 AS BIGINT), (a, b) -> a + b)"
        )

    codes = e.select(
        "vec_id", pack(1).alias("w1"), pack(33).alias("w2")
    )
    qc = codes.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("w1").alias("qw1"),
        F.col("w2").alias("qw2"),
    )
    ham = (
        F.bit_count(F.col("qw1").bitwiseXOR(F.col("w1")))
        + F.bit_count(F.col("qw2").bitwiseXOR(F.col("w2")))
    ).cast("long")
    pre = (
        F.broadcast(qc)
        .crossJoin(codes)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", ham.alias("ham"))
    )
    wh = Window.partitionBy("qid").orderBy(F.asc("ham"), F.asc("vec_id"))
    cand = (
        pre.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") <= HAM_CAND)
        .select("qid", "vec_id", "ham")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    scored = (
        cand.join(F.broadcast(q), "qid")
        .join(e.select("vec_id", "embedding"), "vec_id")
        .select(
            "qid",
            "vec_id",
            F.round(_cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos"),
            "ham",
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn2", F.row_number().over(w))
        .filter(F.col("rn2") <= TOP_K)
        .select("qid", "vec_id", "cos", "ham")
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


# -------------------------------------------------------------- IVF path ----

# Operating point (measured r5; recall@10 of the true brute-force top-10
# across the 5 query vectors at sf0.001/sf0.01/sf0.1; frac = mean candidate
# fraction actually scored). This corpus is NEAR-UNIFORM random (mean
# top-10 cosine ~0.3, dim 64) — the worst case for any space-partitioning
# index, where recall tracks candidate fraction almost linearly no matter
# the layout. Frontier measured (single-assignment, a=1):
#   cells=16 probe=4   frac=0.25  recall 0.54-0.62   (r4 point — too weak)
#   cells=64 probe=16  frac=0.25  recall 0.66-0.78
#   cells=64 probe=32  frac=0.50  recall 0.84-0.98
# Multi-assignment (each database vector indexed under its top-a cells,
# FAISS's replication trick) at the committed point:
#   cells=64 a=3 probe=16  frac~0.55  recall 0.96/0.94/0.94  <- committed
#   cells=64 a=4 probe=16  frac~0.66  recall 1.00/0.98/0.98
# pytest pins recall >= 0.9 (deterministic pipeline: measured recall is
# exact per corpus). On real clustered embedding corpora the same layout
# gives the sublinear scans IVF is built for; the ~55% fraction here is a
# property of uniform data, not of the index.
N_CELLS = 64       # coarse-quantizer cells (k-means centroids)
N_PROBE = 16       # cells probed per query
N_ASSIGN = 3       # cells each database vector is indexed under
KMEANS_SAMPLE = 1024
KMEANS_ITERS = 5


def _ivf_centroids(sample_mat: np.ndarray, k: int = N_CELLS,
                   iters: int = KMEANS_ITERS) -> np.ndarray:
    """Spherical k-means coarse quantizer trained on a bounded driver-side
    sample (the standard IVF recipe: the quantizer never sees the full
    table — at 100 TB you train on the same fixed-size sample and only the
    assignment pass is distributed). Deterministic: init = evenly strided
    sample rows, no RNG anywhere; empty cells keep their previous centroid.
    Returns unit-norm (k, dim) float64 centroids."""
    m = sample_mat.astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    k = min(k, len(m))
    c = m[np.linspace(0, len(m) - 1, k).astype(np.int64)].copy()
    for _ in range(iters):
        assign = (m @ c.T).argmax(axis=1)
        for j in range(k):
            rows = m[assign == j]
            if len(rows):
                v = rows.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    c[j] = v / n
    return c


def ivf_assign(
    d: DataFrame, centroids: np.ndarray, n_assign: int = 1
) -> DataFrame:
    """(vec_id, cell) top-``n_assign``-centroid assignment — one
    Arrow-batched map pass, no shuffle; the centroid matrix is kilobytes
    and ships in the closure. ``n_assign > 1`` replicates each vector
    under its nearest cells (index is n_assign x larger, recall rises at
    fixed nprobe — the multi-assignment trade FAISS documents)."""
    a = max(1, min(int(n_assign), centroids.shape[0]))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            sims = mat @ centroids.T
            topa = np.argsort(-sims, axis=1, kind="stable")[:, :a]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), a),
                    "cell": topa.reshape(-1).astype(np.int32),
                }
            )

    return d.select("vec_id", "embedding").mapInPandas(
        run, "vec_id long, cell int"
    )


@register("ann_ivf_topk", None)  # recall vs brute force checked in pytest
def ann_ivf_topk(spark, sf):
    """IVF (inverted-file) ANN: coarse k-means cells + nprobe search.
    Candidate generation is an equi-join on cell id — the probed cells'
    vectors only, never the full table; exact cosine re-ranks candidates.
    Complements ``ann_lsh_topk`` (FAISS's IVF-Flat layout re-expressed as
    DataFrame ops). The 5-query probe table is computed driver-side (it is
    N_QUERIES x N_PROBE rows); a batch-query deployment runs the same
    argpartition inside ``mapInPandas`` like ``ivf_assign``."""
    e = _emb_par(spark, sf)
    sample = (
        e.orderBy("vec_id").limit(KMEANS_SAMPLE).select("vec_id", "embedding")
        .toPandas()
    )
    empty = spark.createDataFrame([], "qid long, vec_id long, cos double")
    if len(sample) == 0:  # empty table: degrade like the sibling ANN keys
        return empty
    cents = _ivf_centroids(np.stack(sample["embedding"].to_numpy()))
    cells = ivf_assign(e, cents, n_assign=N_ASSIGN)

    qpdf = sample[sample["vec_id"] < N_QUERIES]
    if len(qpdf) == 0:  # no query ids in range: no results, not a crash
        return empty
    qmat = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    sims = qmat @ cents.T
    nprobe = min(N_PROBE, cents.shape[0])
    probe_rows = [
        (int(qid), int(cell))
        for qid, row in zip(qpdf["vec_id"].to_numpy(), sims)
        for cell in np.argsort(-row, kind="stable")[:nprobe]
    ]
    probes = spark.createDataFrame(probe_rows, "qid long, cell int")

    cands = (
        F.broadcast(probes)
        .join(cells, "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()  # a vector can sit in several probed cells (n_assign>1)
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


RANGE_MIN_COS = 0.25  # range-search threshold (~55 hits at sf0.01, 227 at sf0.1)


@register(
    "ann_range_search",
    f"""SELECT q.vec_id AS qid, e.vec_id AS vec_id, ROUND({_COS_SQL}, 6) AS cos
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES} AND ROUND({_COS_SQL}, 6) >= {RANGE_MIN_COS}""",
)
def ann_range_search(spark, sf):
    """Range search: ALL neighbours above a similarity threshold, per
    query — the retrieval primitive under near-duplicate lookup and
    recall-oriented RAG (top-k truncates; range search doesn't). Exact
    spelling over the broadcast query side — the correctness baseline the
    LSH/IVF candidate generators plug into (swap the crossJoin for their
    bucket equi-join and keep the same threshold filter to make it
    approximate). The threshold compares the ROUNDED cosine, so the
    boundary is the same bit pattern in both engines (the float rule);
    the filter sits directly on the scored stream — no window, no global
    sort, one broadcast-join pass over the table."""
    e = _emb_par(spark, sf)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pairs = F.broadcast(q).crossJoin(e.select("vec_id", "embedding")).filter(
        F.col("vec_id") != F.col("qid")
    )
    return (
        pairs.select(
            "qid",
            "vec_id",
            F.round(_cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= RANGE_MIN_COS)
    )


KMEANS_K = 16  # emb_kmeans cluster count


@register("emb_kmeans", None)  # == numpy twin, pytest-pinned (kmeans_assign_pandas)
def emb_kmeans(spark, sf):
    """K-means clustering assignments over the embeddings table — the
    corpus-organization primitive (cluster-then-sample curation, semantic
    sharding, diversity balancing) and the training half of the IVF
    index: reuses ``_ivf_centroids``' deterministic spherical k-means
    (strided init, no RNG) on the bounded driver sample, then one
    Arrow-batched assignment pass over the full table (``ivf_assign`` with
    ``n_assign=1``) joined back to an exact-cosine score against the
    assigned centroid. At 100 TB the sample stays fixed-size (the
    standard bounded-quantizer recipe), the assignment is embarrassingly
    parallel with the kilobyte centroid matrix in the closure, and
    nothing shuffles except the final broadcast join of the (k, dim)
    centroid table. Cosine emitted as a formatted string (float rule)."""
    e = _emb_par(spark, sf)
    sample = (
        e.orderBy("vec_id").limit(KMEANS_SAMPLE).select("embedding").toPandas()
    )
    if len(sample) == 0:
        return spark.createDataFrame([], "vec_id long, cluster int, cos string")
    cents = _ivf_centroids(
        np.stack(sample["embedding"].to_numpy()), k=KMEANS_K
    )
    assigned = ivf_assign(e, cents, n_assign=1).withColumnRenamed("cell", "cluster")
    cent_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)]
    cent_df = spark.createDataFrame(cent_rows, "cluster int, cvec array<double>")
    return (
        assigned.join(F.broadcast(cent_df), "cluster")
        .join(e.select("vec_id", "embedding"), "vec_id")
        .select(
            "vec_id",
            "cluster",
            # ROUND before formatting: the JVM formatter ties HALF_UP,
            # other formatters tie half-even; ROUND first removes any
            # 7th-digit tie (same discipline as quality_repetition)
            F.format_string(
                "%.6f", F.round(_cosine(F.col("embedding"), F.col("cvec")), 6)
            ).alias("cos"),
        )
    )


def kmeans_assign_pandas(emb: pd.DataFrame, k: int = KMEANS_K,
                         sample_n: int = KMEANS_SAMPLE) -> pd.DataFrame:
    """Single-process twin of ``emb_kmeans`` for the golden test:
    ``emb`` has columns (vec_id, embedding); returns (vec_id, cluster,
    cos) with identical determinism (same strided-init k-means, same
    argmax tie-handling as ``ivf_assign``'s stable argsort)."""
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    cents = _ivf_centroids(
        np.stack(emb["embedding"].head(sample_n).to_numpy()), k=k
    )
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = unit @ cents.T
    cl = np.argsort(-sims, axis=1, kind="stable")[:, 0]
    # exact cosine against the assigned centroid, same float64 algebra as
    # the Spark side's JVM fold (sequential left-to-right dot product)
    cos = []
    for row, j in zip(mat, cl):
        c = cents[j]
        dot = 0.0
        for x, y in zip(row, c):
            dot += float(x) * float(y)
        na = 0.0
        for x in row:
            na += float(x) * float(x)
        nb = 0.0
        for y in c:
            nb += float(y) * float(y)
        # Python's %-format ties half-even; mimic Spark's round-then-
        # format (BigDecimal HALF_UP over the double's shortest repr)
        from decimal import Decimal, ROUND_HALF_UP

        v = dot / (np.sqrt(na) * np.sqrt(nb))
        cos.append(
            "%.6f"
            % Decimal(repr(float(v))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
    return pd.DataFrame(
        {"vec_id": emb["vec_id"].to_numpy(), "cluster": cl.astype(np.int32),
         "cos": cos}
    )


@register("ann_lsh_topk", None)  # recall vs brute force checked in pytest
def ann_lsh_topk(spark, sf):
    e = _emb(spark, sf)
    dim = len(e.select("embedding").first()[0])
    return lsh_query_topk(e, lsh_signatures(e, dim))


def lsh_query_topk(e: DataFrame, sigs: DataFrame) -> DataFrame:
    """Answer the fixed query set over an LSH signature index — the
    query-side half of ``ann_lsh_topk``, shared with ``stream_ann``
    (which builds ``sigs`` incrementally at ingest): bucket equi-join
    for candidates, exact cosine re-rank of candidates only, per-query
    top-k under the (cos DESC, vec_id ASC) deterministic order."""
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


# --- Product quantization (PQ) ----------------------------------------------
# The memory-compression half of a production vector index (FAISS IVF-PQ):
# dim-64 float32 vectors (256 B) compress to PQ_M small-int codes (8 B as
# stored ints, 4 B bit-packed). At 100 TB of embeddings the codes table is
# what fits in cluster RAM; the float vectors are only touched for the exact
# re-rank of the tiny ADC candidate set.
#
# Operating point (measured on this corpus, numpy sweep in the session log;
# recall@10 vs brute force, cand=50):
#   m=8  k=16  (4-bit)  0.62 / 0.48   (sf0.001 / sf0.1 — too weak)
#   m=8  k=256 (8-bit)  0.98 / 0.66
#   m=16 k=64  (6-bit)  0.96 / 0.98
#   m=16 k=256 (8-bit)  1.00 / 1.00   <- committed (FAISS PQ16x8, 16 B/vec)
# Unlike IVF (whose recall on this uniform corpus tracks candidate
# fraction), finer PQ codes shrink the ADC error itself: full recall at a
# 2.5% candidate fraction (50 of 2000) — compression 256 B -> 16 B stands.
PQ_M = 16       # subspaces (dim 64 -> 4 dims each)
PQ_K = 256      # codewords per subspace (8-bit codes)
PQ_CAND = 50    # ADC candidates re-ranked exactly per query
PQ_ITERS = 5


def _pq_codebooks(
    sample_mat: np.ndarray, m: int = PQ_M, k: int = PQ_K, iters: int = PQ_ITERS
) -> np.ndarray:
    """Per-subspace L2 k-means codebooks over the UNIT-normalized bounded
    driver sample (same bounded-quantizer recipe as ``_ivf_centroids`` —
    the codebooks never see the full table). Deterministic: strided init,
    first-min tie-break, empty cells keep their previous codeword.
    Returns (m, k', dsub) float64 with k' = min(k, sample rows)."""
    x = sample_mat.astype(np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n, dim = x.shape
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    dsub = dim // m
    k = min(k, n)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        c = sub[np.linspace(0, n - 1, k).astype(np.int64)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # first-min: deterministic ties
            for ci in range(k):
                rows = sub[assign == ci]
                if len(rows):
                    c[ci] = rows.mean(axis=0)
        books[j] = c
    return books


def pq_encode(d: DataFrame, books: np.ndarray) -> DataFrame:
    """(vec_id, codes array<int>) PQ encoding — one Arrow-batched map
    pass, no shuffle; the codebook tensor is ~8 KB and ships in the
    closure (same pattern as ``ivf_assign``). Vectors are unit-normalized
    before encoding so ADC inner products approximate cosine."""
    m, _k, dsub = books.shape

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(
                    axis=2
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "codes": list(codes),
                }
            )

    return d.select("vec_id", "embedding").mapInPandas(
        run, "vec_id long, codes array<int>"
    )


@register("emb_pq", None)  # codes + recall vs brute force checked in pytest
def emb_pq(spark, sf):
    """PQ-compressed ANN (FAISS IVF-PQ's compression half re-expressed as
    DataFrame ops): (1) train per-subspace codebooks on the bounded
    driver sample, (2) ONE distributed encode pass produces the codes
    table — the only representation the search ever scans, (3) ADC
    (asymmetric distance computation): each query precomputes an
    (M x K) lookup table of partial inner products driver-side (tiny),
    the approximate score of a database vector is the sum of M table
    lookups over its codes — an Arrow-batched map over the CODES table,
    the float vectors untouched, (4) the top ``PQ_CAND`` ADC candidates
    per query are re-ranked by exact cosine (broadcast query side,
    equi-join back to the float table for candidates only).

    Approx scores are rounded to 6 decimals before the candidate window
    (ties broken by vec_id) so the candidate set is run- and
    plan-deterministic. Recall floor vs ``ann_cosine_topk`` is pinned in
    pytest at 0.9 (measured 1.00 at both SFs with the committed PQ16x8
    point — see the operating-point table above)."""
    e = _emb(spark, sf)
    sample = (
        e.orderBy("vec_id").limit(KMEANS_SAMPLE).select("vec_id", "embedding")
        .toPandas()
    )
    empty = spark.createDataFrame([], "qid long, vec_id long, cos double")
    if len(sample) == 0:
        return empty
    books = _pq_codebooks(np.stack(sample["embedding"].to_numpy()))
    codes = pq_encode(e, books)

    qpdf = sample[sample["vec_id"] < N_QUERIES]
    if len(qpdf) == 0:
        return empty
    qmat = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qids = qpdf["vec_id"].to_numpy()
    m, _k, dsub = books.shape
    # (n_queries, M, K) lookup tables: qsub_m . codeword
    luts = np.stack(
        [
            np.stack(
                [q[j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)]
            )
            for q in qmat
        ]
    )

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.stack(pdf["codes"].to_numpy())  # (n, M)
            vid = pdf["vec_id"].to_numpy()
            for qi, qid in enumerate(qids):
                approx = luts[qi][rng, cmat].sum(axis=1)
                yield pd.DataFrame(
                    {
                        "qid": np.full(len(vid), qid, dtype=np.int64),
                        "vec_id": vid,
                        "approx": np.round(approx, 6),
                    }
                )

    scored_codes = codes.mapInPandas(
        adc, "qid long, vec_id long, approx double"
    ).filter(F.col("vec_id") != F.col("qid"))
    w = Window.partitionBy("qid").orderBy(F.desc("approx"), F.asc("vec_id"))
    cands = (
        scored_codes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_CAND)
        .select("qid", "vec_id")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    rerank = (
        cands.join(F.broadcast(q), "qid")
        .join(e.select("vec_id", "embedding"), "vec_id")
        .select(
            "qid",
            "vec_id",
            F.round(_cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos"),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        rerank.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cos")
    )


@register("ann_ivfpq_topk", None)  # recall vs brute force checked in pytest
def ann_ivfpq_topk(spark, sf):
    """The COMPLETE FAISS IVF-PQ index re-expressed as DataFrame ops —
    the composition of ``ann_ivf_topk`` (coarse-quantizer candidate
    pruning) and ``emb_pq`` (code compression + ADC scoring), which is
    what a production vector index actually deploys at 100 TB: the
    inverted lists bound WHICH vectors are touched (probed cells only),
    the PQ codes bound WHAT is read per touched vector (16 B, not the
    256 B float vector), and exact re-rank touches floats only for the
    tiny ADC-top-``PQ_CAND`` set.

    Stages (every trained artifact from the same bounded driver sample —
    the standard recipe; both training passes reuse the committed
    operating points of their component keys): (1) coarse centroids +
    per-subspace codebooks, (2) distributed cell multi-assignment
    (``ivf_assign``) and code encoding (``pq_encode``) — two Arrow map
    passes, no shuffle, (3) candidates = broadcast probe-table equi-join
    on cell id, (4) ADC scores computed ONLY for candidate codes (join
    candidates to the codes table on vec_id — co-keyed, AQE broadcasts
    the probe side at small SF), (5) top-``PQ_CAND`` per query by
    rounded ADC score (vec_id tie-break → deterministic), (6) exact
    cosine re-rank to the final top-k.

    Deterministic end-to-end (no RNG anywhere); recall@10 vs brute force
    pinned in pytest — the IVF stage's candidate recall is the ceiling
    (~0.94-0.96 on this near-uniform corpus, see the IVF operating-point
    table), and PQ16x8's ADC ranking is near-exact within candidates."""
    e = _emb_par(spark, sf)
    sample = (
        e.orderBy("vec_id").limit(KMEANS_SAMPLE).select("vec_id", "embedding")
        .toPandas()
    )
    empty = spark.createDataFrame([], "qid long, vec_id long, cos double")
    if len(sample) == 0:
        return empty
    smat = np.stack(sample["embedding"].to_numpy())
    cents = _ivf_centroids(smat)
    books = _pq_codebooks(smat)
    cells = ivf_assign(e, cents, n_assign=N_ASSIGN)
    codes = pq_encode(e, books)

    qpdf = sample[sample["vec_id"] < N_QUERIES]
    if len(qpdf) == 0:
        return empty
    qmat = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qids = qpdf["vec_id"].to_numpy()

    # probe table: nprobe nearest cells per query (driver-side — it is
    # N_QUERIES x N_PROBE rows; batch-query deployments run the same
    # argsort inside mapInPandas like ivf_assign)
    sims = qmat @ cents.T
    nprobe = min(N_PROBE, cents.shape[0])
    probe_rows = [
        (int(qid), int(cell))
        for qid, row in zip(qids, sims)
        for cell in np.argsort(-row, kind="stable")[:nprobe]
    ]
    probes = spark.createDataFrame(probe_rows, "qid long, cell int")
    cands = (
        F.broadcast(probes)
        .join(cells, "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()  # a vector can sit in several probed cells (n_assign>1)
    )

    # per-query ADC lookup tables (M x K partial inner products; ~KBs)
    m, _k, dsub = books.shape
    luts = np.stack(
        [
            np.stack(
                [q[j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)]
            )
            for q in qmat
        ]
    )
    qid_to_idx = {int(q): i for i, q in enumerate(qids)}

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            qi = pdf["qid"].map(qid_to_idx).to_numpy()
            cmat = np.stack(pdf["codes"].to_numpy())  # (n, M)
            approx = luts[qi[:, None], rng[None, :], cmat].sum(axis=1)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy(),
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "approx": np.round(approx, 6),
                }
            )

    scored = cands.join(codes, "vec_id").mapInPandas(
        adc, "qid long, vec_id long, approx double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("approx"), F.asc("vec_id"))
    short = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_CAND)
        .select("qid", "vec_id")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    rerank = (
        short.join(F.broadcast(q), "qid")
        .join(e.select("vec_id", "embedding"), "vec_id")
        .select(
            "qid",
            "vec_id",
            F.round(_cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos"),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        rerank.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cos")
    )


# SemDeDup-style prototypicality: flag the K least-central vectors per
# label (lowest cosine to the label centroid) as outliers.
PROTO_OUTLIER_K = 5


@register("emb_prototypicality", None)  # == pandas twin, pytest-pinned
def emb_prototypicality(spark, sf):
    """Per-label prototypicality scoring — the SemDeDup/D4-family
    curation signal: how close each embedding sits to its label's
    centroid. Semantic-dedup pipelines KEEP the prototypes and drop (or
    down-weight) the tails; this key emits the score plus the bottom-K
    outlier flag per label so both curation policies compose off it.

    Deterministic by construction: the centroid comes from the bounded
    driver sample (``KMEANS_SAMPLE`` rows in vec_id order — the same
    bounded-quantizer recipe as ``emb_kmeans``; labels absent from the
    sample contribute no centroid and their rows drop, which at real
    scale means 'sample covers every label' is a stated precondition),
    the per-vector cosine is the exact JVM fold against that constant
    centroid, and the outlier rank orders by the ROUNDED cosine with
    vec_id tie-break.

    Scale shape: ONE Arrow-free broadcast join of the (labels x dim)
    centroid table, cosine inside whole-stage codegen, then ONE
    label-keyed window for the bottom-K flag — the same exchange a
    per-label selection step needs anyway. No full-table driver
    materialization at any scale (the sample is fixed-size)."""
    e = _emb_par(spark, sf)
    sample = (
        e.orderBy("vec_id")
        .limit(KMEANS_SAMPLE)
        .select("label", "embedding")
        .toPandas()
    )
    if len(sample) == 0:
        return spark.createDataFrame(
            [], "vec_id long, label int, cos string, is_outlier boolean"
        )
    cent_rows = []
    for lab in sorted(sample["label"].unique()):
        mat = np.stack(
            sample.loc[sample["label"] == lab, "embedding"].to_numpy()
        ).astype(np.float64)
        cent_rows.append((int(lab), [float(x) for x in mat.mean(axis=0)]))
    cent_df = spark.createDataFrame(cent_rows, "label int, cvec array<double>")
    rc = F.round(_cosine(F.col("embedding"), F.col("cvec")), 6)
    w = Window.partitionBy("label").orderBy(F.asc("rc"), F.asc("vec_id"))
    return (
        e.join(F.broadcast(cent_df), "label")
        .withColumn("rc", rc)
        .withColumn("rn", F.row_number().over(w))
        .select(
            "vec_id",
            "label",
            # ROUND before formatting — quality_repetition's tie note
            F.format_string("%.6f", F.col("rc")).alias("cos"),
            (F.col("rn") <= PROTO_OUTLIER_K).alias("is_outlier"),
        )
    )


def prototypicality_pandas(
    emb: pd.DataFrame,
    sample_n: int = KMEANS_SAMPLE,
    outlier_k: int = PROTO_OUTLIER_K,
) -> pd.DataFrame:
    """Single-process twin of ``emb_prototypicality`` for the golden
    test: identical bounded sample, identical numpy centroid (same row
    order -> bit-identical mean), cosine via the sequential left fold the
    JVM ``F.aggregate`` uses, Decimal-HALF_UP rounding (Spark ROUND
    semantics), identical (rounded cos, vec_id) outlier ranking."""
    from decimal import ROUND_HALF_UP, Decimal

    emb = emb.sort_values("vec_id").reset_index(drop=True)
    sample = emb.head(sample_n)
    cents = {}
    for lab in sorted(sample["label"].unique()):
        mat = np.stack(
            sample.loc[sample["label"] == lab, "embedding"].to_numpy()
        ).astype(np.float64)
        cents[int(lab)] = mat.mean(axis=0)
    rows = []
    for vec_id, lab, vec in zip(
        emb["vec_id"].to_numpy(), emb["label"].to_numpy(), emb["embedding"]
    ):
        if int(lab) not in cents:
            continue
        c = cents[int(lab)]
        dot = 0.0
        for x, y in zip(vec, c):
            dot += float(x) * float(y)
        na = 0.0
        for x in vec:
            na += float(x) * float(x)
        nb = 0.0
        for y in c:
            nb += float(y) * float(y)
        v = dot / (np.sqrt(na) * np.sqrt(nb))
        rv = float(
            Decimal(repr(float(v))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        rows.append((int(vec_id), int(lab), rv))
    out = pd.DataFrame(rows, columns=["vec_id", "label", "rc"])
    out["rn"] = (
        out.sort_values(["rc", "vec_id"])
        .groupby("label")
        .cumcount()
        .reindex(out.index)
        + 1
    )
    out["is_outlier"] = out["rn"] <= outlier_k
    out["cos"] = out["rc"].map(lambda x: "%.6f" % x)
    return out[["vec_id", "label", "cos", "is_outlier"]]


# ------------------------------------------------------------- PCA ----

PCA_SAMPLE = 512
PCA_DIMS = 8


def _pca_components(sample_mat: np.ndarray, k: int = PCA_DIMS):
    """(mean, W) from a bounded driver-side sample — the same bounded-
    quantizer recipe as ``_ivf_centroids``: at 100 TB the covariance is
    estimated from a fixed-size sample and only the projection pass is
    distributed. Deterministic: covariance -> ``eigh`` (symmetric,
    LAPACK-deterministic for identical input), components ordered by
    eigenvalue DESC then sign-fixed so the largest-|coefficient|
    coordinate is positive (eigenvector sign is otherwise arbitrary).
    Returns float64 (dim,) mean and (dim, k) projection matrix."""
    m = sample_mat.astype(np.float64)
    mean = m.mean(axis=0)
    x = m - mean
    cov = (x.T @ x) / max(1, len(m))
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(-vals, kind="stable")[: min(k, vecs.shape[1])]
    w = vecs[:, order]
    for j in range(w.shape[1]):
        i = int(np.argmax(np.abs(w[:, j])))  # first max on ties
        if w[i, j] < 0:
            w[:, j] = -w[:, j]
    return mean, w


@register("emb_pca", None)  # == numpy twin, pytest-pinned (pca_project_pandas)
def emb_pca(spark, sf):
    """PCA projection of the embedding column to its top principal
    components — the standard dimensionality-reduction prep before
    clustering / ANN indexing (FAISS's OPQ/PCA pre-transform): train the
    rotation on a bounded sample, project the full table distributed.

    Scale shape: the sample is a fixed-size single limit-toPandas job
    (same discipline as the IVF quantizer); the projection is one
    Arrow-batched ``mapInPandas`` pass with the kilobyte (dim × k)
    matrix in the closure — embarrassingly parallel, zero shuffles.
    Output doubles are the raw float64 matmul results; the pytest twin
    replays the identical numpy op sequence, so equality is bit-exact
    (∅-oracle: per-row float formatting differs across engines).

    NOT fan_out (r6): the twin's bit-exactness depends on the BLAS
    matmul seeing the same batch shapes — dgemm kernel/blocking (and
    therefore last-ulp summation order) changes with row count, so
    rebalancing the scan into 32 small batches flips low bits vs the
    one-batch twin. The key is 0.5 s; exactness wins."""
    e = _emb(spark, sf)
    sample = (
        e.orderBy("vec_id").limit(PCA_SAMPLE).select("embedding").toPandas()
    )
    cols = ", ".join(f"pc{i + 1} double" for i in range(PCA_DIMS))
    if len(sample) == 0:
        return spark.createDataFrame([], f"vec_id long, {cols}")
    mean, w = _pca_components(np.stack(sample["embedding"].to_numpy()))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            proj = (mat - mean) @ w
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for i in range(w.shape[1]):
                out[f"pc{i + 1}"] = proj[:, i]
            yield pd.DataFrame(out)

    return e.select("vec_id", "embedding").mapInPandas(
        run, f"vec_id long, {cols}"
    )


def pca_project_pandas(emb: pd.DataFrame, k: int = PCA_DIMS) -> pd.DataFrame:
    """Pure-pandas twin of ``emb_pca``: identical sample (first
    PCA_SAMPLE by vec_id), identical component fit, identical float64
    matmul — bit-for-bit the distributed output."""
    s = emb.sort_values("vec_id").head(PCA_SAMPLE)
    mean, w = _pca_components(np.stack(s["embedding"].to_numpy()), k=k)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    proj = (mat - mean) @ w
    out = {"vec_id": emb["vec_id"].to_numpy()}
    for i in range(w.shape[1]):
        out[f"pc{i + 1}"] = proj[:, i]
    return pd.DataFrame(out)


@register(
    "emb_quantize_int8",
    # Symmetric per-vector int8 scalar quantization with a FULL value
    # oracle: every arithmetic step is forced to DOUBLE on both engines
    # (float32 -> double casts are exact; DuckDB would otherwise keep
    # FLOAT where Spark promotes to double), so x/scale*127.0 is the
    # identical IEEE op sequence and round() ties (exact .5 doubles)
    # break half-away-from-zero on both. Zero vectors quantize to all
    # zeros via the same CASE on both sides.
    "SELECT vec_id, label, "
    "printf('%.6f', ROUND(list_max(list_transform(embedding, "
    " x -> abs(CAST(x AS DOUBLE)))), 6)) AS scale6, "
    "array_to_string(list_transform(embedding, x -> CASE "
    " WHEN list_max(list_transform(embedding, "
    "   y -> abs(CAST(y AS DOUBLE)))) = 0 THEN 0 "
    " ELSE CAST(ROUND(CAST(x AS DOUBLE) "
    "  / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE))))"
    "  * 127.0) AS BIGINT) END), ',') AS codes "
    "FROM embeddings",
)
def emb_quantize_int8(spark, sf):
    """Per-vector symmetric int8 scalar quantization — the 8-bit member
    of the compression family (``emb_binarize`` is the 1-bit member,
    ``emb_pq`` the 16-byte PQ member): scale = max|x_i|, code_i =
    round(x_i / scale * 127) in [-127, 127], the layout faiss'
    ScalarQuantizer QT_8bit_direct-style stores and every int8 ANN
    index ships. 4x smaller than float32 with a worst-case per-dim
    reconstruction error of scale/254 (pytest pins the bound by
    dequantizing).

    Unlike the recall-gated ANN keys this key carries a FULL value
    oracle: the max is an exact double (no accumulation), the quantized
    code is ONE division, ONE multiply, one half-away-from-zero round —
    the fixed-IEEE-op-sequence rule — and codes are emitted as the
    joined integer string so the whole 64-dim payload is compared.

    Scale shape: a projection over the embeddings scan plus the fan_out
    rebalance (array lambdas are JVM codegen); at 100 TB this runs at
    scan speed and writes the 64-byte codes column a downstream int8
    index consumes. r6: the per-vector scale is computed ONCE per row by
    binding it as a single-element-array lambda variable — the previous
    spelling re-evaluated array_max(transform(...)) (a 2·d-op fold)
    inside the per-element CASE, i.e. O(d^2) work per row; the value and
    therefore the IEEE op sequence per code are unchanged."""
    e = _emb_par(spark, sf)
    scale = F.expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))")
    codes = F.expr(
        "array_join(flatten(transform("
        " array(array_max(transform(embedding, y -> abs(CAST(y AS DOUBLE))))), "
        " s -> transform(embedding, x -> CASE "
        "  WHEN s = 0D THEN CAST(0 AS BIGINT) "
        "  ELSE CAST(ROUND(CAST(x AS DOUBLE) / s * 127.0) AS BIGINT) "
        " END))), ',')"
    )
    return e.select(
        "vec_id",
        "label",
        F.format_string("%.6f", F.round(scale, 6)).alias("scale6"),
        codes.alias("codes"),
    )


# MMR diversified re-ranking: candidate pool size, output size, and the
# dyadic trade-off weight (0.5 = equal relevance/diversity — exact in
# binary, so the score chain stays bit-stable).
MMR_CAND = 50
MMR_K = 10
MMR_LAMBDA = 0.5


@register("retrieval_mmr", None)  # == independent greedy twin, pytest-pinned
def retrieval_mmr(spark, sf):
    """Maximal Marginal Relevance re-ranking ([K] Carbonell & Goldstein
    1998) — the diversity pass every retrieval stack runs between ANN
    and the prompt window: from the query's top-``MMR_CAND`` cosine
    candidates, greedily pick ``MMR_K`` maximizing
    0.5·rel(d) − 0.5·max_{s∈selected} sim(d, s), so near-duplicate
    passages don't crowd out coverage (the retrieval-side complement of
    ``dedup_embedding_cosine``: dedup removes copies from the corpus,
    MMR removes redundancy from a RESULT).

    Determinism: relevance is the rounded-cosine contract of
    ``ann_cosine_topk``; pairwise sims are float64 dots over the
    normalized candidate block computed in one process; ties break
    (score DESC, vec_id) — pytest pins the selection against an
    independent greedy implementation plus a re-run.

    Scale shape: the distributed part is exactly ``ann_cosine_topk``'s
    plan for one query — broadcast query row, scan-side cosine, ONE
    TakeOrderedAndProject top-50 (never a global sort). The greedy
    itself is sequential by definition, over a candidate block that is
    CONSTANT-sized (50×64 floats) regardless of corpus scale — the
    size-gated driver step the pipeline's canonicalize precedent
    allows; per-query fan-out at 100 TB distributes queries, not the
    greedy."""
    import pandas as pd

    pdf = _mmr_candidates(spark, sf)
    rows = _mmr_greedy(pdf)
    out = pd.DataFrame(
        rows, columns=["rank", "vec_id", "relevance", "mmr_score"]
    )
    return spark.createDataFrame(
        out, "rank int, vec_id long, relevance string, mmr_score string"
    )


def _mmr_candidates(spark, sf):
    """Distributed candidate cut for ``retrieval_mmr``: the query row
    (vec_id 0) broadcast against the corpus, rounded-cosine scored,
    TakeOrderedAndProject top-``MMR_CAND`` — one bounded toPandas."""
    e = _emb_par(spark, sf)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            F.round(_cosine(F.col("qvec"), F.col("embedding")), 6).alias(
                "cos"
            ),
        )
    )
    return (
        scored.orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(MMR_CAND)
        .toPandas()
    )


def _mmr_greedy(pdf) -> list:
    """Sequential MMR greedy over the constant-sized candidate block:
    per step argmax of 0.5·rel − 0.5·max-sim-to-selected, ties broken
    (score DESC, vec_id). Returns (rank, vec_id, relevance, mmr_score)
    tuples with %.6f-formatted floats."""
    import numpy as np

    ids = pdf["vec_id"].to_numpy()
    rel = pdf["cos"].to_numpy(dtype=np.float64)
    V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    norms = np.sqrt((V * V).sum(axis=1))
    norms[norms == 0.0] = 1.0
    Vn = V / norms[:, None]
    S = Vn @ Vn.T
    lam = MMR_LAMBDA
    selected: list[int] = []
    remaining = list(range(len(ids)))
    rows = []
    while remaining and len(selected) < MMR_K:
        best_i, best_key = None, None
        for i in remaining:
            red = max((S[i, j] for j in selected), default=0.0)
            score = lam * rel[i] - (1.0 - lam) * red
            key = (-score, int(ids[i]))
            if best_key is None or key < best_key:
                best_i, best_key = i, key
        selected.append(best_i)
        remaining.remove(best_i)
        rows.append(
            (
                len(selected),
                int(ids[best_i]),
                f"{rel[best_i]:.6f}",
                f"{-best_key[0]:.6f}",
            )
        )
    return rows


KNN_K = 5  # neighbors per node in the k-NN graph
# Above this vector count the kNN-graph candidate generation switches
# from the exact all-pairs cross to IVF blocking (r5-VERDICT #1); both
# test SFs sit below it so the oracle pins the exact path, and the
# forced-path pytest pins the ANN path against it. Env-overridable for
# deployments whose exact-capacity differs.
KNN_EXACT_CUTOFF = int(os.environ.get("RBS_KNN_EXACT_CUTOFF", "50000"))
KNN_ASSIGN = 6   # index-side multi-assignment for the kNN-graph blocking
KNN_PROBE = 24   # probe-side cells per vector (a=6/probe=24: measured
                 # edge recall 0.998 / 1.000 / 0.998 vs the exact graph
                 # at sf0.001/0.01/0.1 — pytest pins >= 0.95)

# (applicationId, sf) -> localCheckpointed per-node top-K edge table —
# emb_knn_graph and emb_cluster_knn share the expensive all-pairs scoring
# (the _ALLPAIRS_MEMO discipline from kg_queries)
_KNN_MEMO: dict = {}


@register(
    "emb_knn_graph",
    # Mutual k-NN graph over ALL embeddings: per-node exact top-KNN_K
    # cosine neighbors (the ann_cosine_topk chain — identical
    # fold/sqrt/divide spelling both engines, ROUND(cos, 6) rank with
    # vec_id tie-break), kept only where BOTH endpoints choose each
    # other, emitted canonically a < b. cos(a,b) == cos(b,a)
    # bit-exactly (commutative multiplies inside the same fold order),
    # so the mutual join can never disagree with itself.
    f"""WITH s AS (
      SELECT q.vec_id AS src, e.vec_id AS dst,
        ROUND({_COS_SQL}, 6) AS cos,
        ROW_NUMBER() OVER (PARTITION BY q.vec_id
          ORDER BY ROUND({_COS_SQL}, 6) DESC, e.vec_id) AS rn
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id),
    k AS (SELECT src, dst, cos FROM s WHERE rn <= {KNN_K})
    SELECT a.src AS a, a.dst AS b, a.cos
    FROM k a JOIN k b ON b.src = a.dst AND b.dst = a.src
    WHERE a.src < a.dst""",
)
def emb_knn_graph(spark, sf, exact_cutoff: int | None = None):
    """Mutual k-NN graph construction over the embedding table — the
    similarity-graph primitive under semi-supervised label
    propagation, graph-based dedup clustering, and manifold
    visualization (every 'embedding atlas' starts here): each vector's
    exact top-``KNN_K`` cosine neighbors, kept only when the choice is
    MUTUAL (the standard noise filter — asymmetric hub edges are what
    make raw k-NN graphs unusable), emitted canonically a < b.
    Complements ``dedup_embedding_cosine`` (global threshold pairs —
    density-blind) and the ``ann_*`` family (query-set search): the
    k-NN graph adapts to local density.

    Float discipline: the cosine is the ann_cosine_topk chain —
    identical zip-with fold, sqrt, multiply, divide spelling on both
    engines; cos(a,b) == cos(b,a) bit-exactly because the fold order
    is positional and each step's multiply is commutative, so
    mutuality never self-contradicts; ranking uses ROUND(cos, 6) with
    the vec_id tie-break (the established contract).

    Scale shape (r6, the r5-VERDICT #1 fix): SIZE-GATED. Below
    ``KNN_EXACT_CUTOFF`` vectors the exact all-pairs scoring runs (one
    broadcast cross + per-source top-k window — what the oracle pins at
    test SFs). ABOVE the gate the candidate generation is ANN-BLOCKED:
    the module's own IVF machinery indexes every vector under its
    ``KNN_ASSIGN`` nearest coarse cells and probes its ``KNN_PROBE``
    nearest cells, so candidates are co-members of probed cells —
    O(n^2 / cells) pair evaluations scaling sublinearly as the cell
    count grows with the corpus (the FAISS recipe), never the Θ(n^2)
    blocked matmul the old docstring hand-waved at. Exact cosine
    re-rank (the identical fold/sqrt/divide chain, so every surviving
    edge's score is bit-equal to the exact path's) + the same mutual
    filter. Operating point a=6/probe=24 measures edge recall
    0.998/1.000/0.998 at sf0.001/0.01/0.1 vs the exact graph
    (pytest-pinned >= 0.95 via the forced-path kwarg, the dedup_cluster
    discipline); per-node top-k stays a rank window partitioned on the
    source, and the mutual filter is a self-join of the k-sized edge
    list on the reversed key — dimension-scale, k*N rows."""
    cutoff = KNN_EXACT_CUTOFF if exact_cutoff is None else int(exact_cutoff)
    memo_key = (spark.sparkContext.applicationId, sf, cutoff)
    cached = _KNN_MEMO.get(memo_key)
    if cached is not None:
        return _mutual_edges(cached)
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            c,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    # norms fold ONCE per vector (the per-pair chain then multiplies the
    # two precomputed sqrts — the identical op sequence _cosine runs,
    # just not recomputed 2N times); the fan_out spreads the probe side
    # (one small parquet file = one input split, which would otherwise
    # single-thread the whole scoring pass)
    from reach_banner_spark.fanout import fan_out

    e = (
        fan_out(_emb(spark, sf), "vec_id")
        .select("vec_id", "embedding", nrm(F.col("embedding")).alias("nv"))
        .localCheckpoint()
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("qvec"),
            F.col("embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    if e.count() <= cutoff:
        q = e.select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            F.col("nv").alias("nq"),
        )
        pairs = F.broadcast(q).crossJoin(e).filter(
            F.col("vec_id") != F.col("qid")
        )
    else:
        sample = (
            e.orderBy("vec_id").limit(KMEANS_SAMPLE)
            .select("vec_id", "embedding").toPandas()
        )
        cents = _ivf_centroids(np.stack(sample["embedding"].to_numpy()))
        cells = ivf_assign(e, cents, n_assign=KNN_ASSIGN)
        probes = ivf_assign(e, cents, n_assign=KNN_PROBE).select(
            F.col("vec_id").alias("qid"), "cell"
        )
        cands = (
            probes.join(cells, "cell")
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id")
            .distinct()
        )
        pairs = cands.join(
            e.select(
                F.col("vec_id").alias("qid"),
                F.col("embedding").alias("qvec"),
                F.col("nv").alias("nq"),
            ),
            "qid",
        ).join(e, "vec_id")
    scored = pairs.select(
        F.col("qid").alias("src"),
        F.col("vec_id").alias("dst"),
        F.round(dot / (F.col("nq") * F.col("nv")), 6).alias("cos"),
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    k = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select("src", "dst", "cos")
        .localCheckpoint()
    )
    _KNN_MEMO[memo_key] = k
    return _mutual_edges(k)


def _mutual_edges(k):
    """Mutual filter over a per-node top-K edge table: keep (src, dst)
    only when dst also picked src, emit canonically a < b."""
    rev = k.select(
        F.col("src").alias("r_src"), F.col("dst").alias("r_dst")
    )
    return (
        k.join(
            rev,
            (F.col("r_src") == F.col("dst"))
            & (F.col("r_dst") == F.col("src")),
        )
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"), "cos")
    )


@register(
    "emb_cluster_knn",
    # Embedding clusters = connected components of the mutual k-NN
    # graph: the edge CTE is emb_knn_graph's oracle verbatim; the
    # component labels come from a recursive min-label closure (every
    # node's id floods its component; MIN per node is the canonical
    # cluster id — the kg_reach recursion pattern). All integers — the
    # only floats (the cosines) never leave the edge derivation.
    f"""WITH RECURSIVE s AS (
      SELECT q.vec_id AS src, e.vec_id AS dst,
        ROUND({_COS_SQL}, 6) AS cos,
        ROW_NUMBER() OVER (PARTITION BY q.vec_id
          ORDER BY ROUND({_COS_SQL}, 6) DESC, e.vec_id) AS rn
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id),
    k AS (SELECT src, dst FROM s WHERE rn <= {KNN_K}),
    m AS (SELECT a.src AS a, a.dst AS b
      FROM k a JOIN k b ON b.src = a.dst AND b.dst = a.src
      WHERE a.src < a.dst),
    e2 AS (SELECT a AS s, b AS o FROM m UNION SELECT b, a FROM m),
    r(node, lab) AS (
      SELECT s, s FROM e2
      UNION
      SELECT e2.o, r.lab FROM r JOIN e2 ON e2.s = r.node),
    c AS (SELECT node, MIN(lab) AS cluster FROM r GROUP BY node),
    z AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM c GROUP BY cluster)
    SELECT c.node AS vec_id, c.cluster, z.cluster_size
    FROM c JOIN z ON z.cluster = c.cluster""",
)
def emb_cluster_knn(spark, sf, small_pair_cutoff: int = 100_000):
    """Embedding clustering via mutual-kNN connected components — the
    composition a dedup/curation pipeline actually ships (the
    SemDeDup/near-dup-cluster shape): build ``emb_knn_graph``'s mutual
    edge set, then label each vector with its component (canonical id
    = the component's smallest vec_id) and the component size. The
    unsupervised complement of ``emb_kmeans`` (no k to pick; clusters
    follow the graph's density structure) and the embedding-space twin
    of ``dedup_cluster`` (which clusters MinHash pairs the same way).

    Oracle: the mutual-edge CTE verbatim from emb_knn_graph plus a
    recursive min-label closure — a genuinely different component
    algorithm (label flooding to fixpoint) than the engine's
    pointer-jumping ``connected_components``, so a green row is an
    algorithmic cross-check of the component structure itself (the
    kg_bridges definition-vs-algorithm discipline). Vectors with no
    mutual edge are not clustered (excluded on both engines).

    Scale shape: the edge derivation is emb_knn_graph's (broadcast
    cross + per-source top-k window); components run the operator's
    O(log n)-round pointer-jumping min-label iteration over the
    k*N-bounded edge list; the size rollup is dimension-scale."""
    from .components import connected_components, connected_components_pandas

    edges = emb_knn_graph(spark, sf).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    # Size-adaptive closure (the dedup_cluster planner decision): the
    # mutual edge set is K*N/2-bounded — dimension-scale, not
    # fact-scale — so below the gate union-find runs on the driver in
    # one collect (identical output, zero iterative shuffle rounds);
    # the distributed min-label loop is kept for genuinely huge graphs
    # and the pytest union-find property pins both paths.
    pdf = edges.limit(small_pair_cutoff + 1).toPandas()
    if len(pdf) <= small_pair_cutoff:
        comp_pdf = connected_components_pandas(pdf)
        comp = spark.createDataFrame(comp_pdf, "node long, comp long")
    else:
        comp = connected_components(edges)
    sizes = comp.groupBy("comp").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return comp.join(F.broadcast(sizes), "comp").select(
        F.col("node").alias("vec_id"),
        F.col("comp").alias("cluster"),
        "cluster_size",
    )


@register(
    "emb_hard_negatives",
    # Triplet mining for contrastive training: per query vector, the
    # hardest POSITIVE (highest-cosine same-label, excluding self) and
    # hardest NEGATIVE (highest-cosine different-label), plus the
    # margin between them — the ann_cosine_topk scoring contract with a
    # label split.
    f"""WITH s AS (
      SELECT q.vec_id AS qid, e.vec_id AS vid,
        e.label = q.label AS same,
        ROUND({_COS_SQL}, 6) AS cos
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}),
    p AS (SELECT qid, vid AS pos_id, cos AS pos_cos,
      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn
      FROM s WHERE same QUALIFY rn = 1),
    n AS (SELECT qid, vid AS neg_id, cos AS neg_cos,
      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn
      FROM s WHERE NOT same QUALIFY rn = 1)
    SELECT p.qid, pos_id, pos_cos, neg_id, neg_cos,
      ROUND(pos_cos - neg_cos, 6) AS margin
    FROM p JOIN n ON n.qid = p.qid""",
)
def emb_hard_negatives(spark, sf):
    """Hard-negative / hard-positive triplet mining over the embedding
    table — the batch that contrastive fine-tuning actually trains on:
    for each query (anchor) vector, the highest-cosine SAME-label
    vector (hardest positive, self excluded) and the highest-cosine
    DIFFERENT-label vector (hardest negative — the pair InfoNCE/triplet
    losses need most), plus the anchor's margin. A negative margin
    flags anchors whose nearest neighbour crosses the label boundary —
    exactly the items worth mining.

    Float discipline: the ann_cosine_topk contract — cosine as the
    fixed zip_with/fold chain rounded to 6 decimals on both engines,
    ranking on the rounded value with a vec_id tie-break; the margin
    subtracts two identical rounded doubles (one IEEE op) and
    re-rounds, so it is bit-identical by construction.

    Scale shape: the documented brute-force baseline — {N_QUERIES}
    broadcast anchors against the full table, one pass, two
    rank-1 windows per anchor partition (the IVF/LSH keys are the
    scale path for the candidate generation; this key pins the scoring
    and mining semantics those paths re-rank with)."""
    e = _emb_par(spark, sf)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    pairs = F.broadcast(q).crossJoin(
        e.select("vec_id", "embedding", "label")
    ).filter(F.col("vec_id") != F.col("qid"))
    scored = pairs.select(
        "qid",
        F.col("vec_id").alias("vid"),
        (F.col("label") == F.col("qlabel")).alias("same"),
        F.round(_cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))
    p = (
        scored.filter(F.col("same"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "qid",
            F.col("vid").alias("pos_id"),
            F.col("cos").alias("pos_cos"),
        )
    )
    n = (
        scored.filter(~F.col("same"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("qid").alias("n_qid"),
            F.col("vid").alias("neg_id"),
            F.col("cos").alias("neg_cos"),
        )
    )
    return p.join(n, p["qid"] == n["n_qid"]).select(
        "qid",
        "pos_id",
        "pos_cos",
        "neg_id",
        "neg_cos",
        F.round(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
    )


@register(
    "emb_norm_profile",
    # Embedding L2-norm profile: per-vector norms via the shared
    # fold-once chain, then min / rank-selected median / max — the
    # median picks the row at position (n+1) div 2 under the total
    # (norm, vec_id) order, so no float interpolation and no
    # unordered mean ever runs.
    "WITH nm AS (SELECT vec_id, "
    " SQRT(list_dot_product("
    "  list_transform(embedding, x -> CAST(x AS DOUBLE)), "
    "  list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm "
    " FROM embeddings), "
    "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nm), "
    "r AS (SELECT nrm, ROW_NUMBER() OVER (ORDER BY nrm, vec_id) AS rn "
    " FROM nm), "
    "med AS (SELECT nrm AS med FROM r, t WHERE rn = (n + 1) // 2) "
    "SELECT n AS n_vecs, "
    "printf('%.6f', ROUND((SELECT MIN(nrm) FROM nm), 6)) AS min_norm, "
    "printf('%.6f', ROUND(med, 6)) AS median_norm, "
    "printf('%.6f', ROUND((SELECT MAX(nrm) FROM nm), 6)) AS max_norm "
    "FROM t, med",
)
def emb_norm_profile(spark, sf):
    """Embedding L2-norm profile — min / median / max vector norms,
    the first QA readout on any embedding table (a normalized encoder
    should read ~1.0 across the board; drift, dead vectors, or a
    mixed-encoder ingest show up here before any similarity search
    does — the check next to ``emb_prototypicality``'s semantic one).

    Float discipline: each norm is the shared fold-once dot-product
    chain + one correctly-rounded sqrt (the ann_cosine_topk contract,
    bit-identical on both engines); the median is RANK-SELECTED at
    position (n+1) div 2 under the total (norm, vec_id) order —
    identical doubles order identically, so selection is exact and no
    interpolation or unordered mean ever runs; min/max are
    order-insensitive over the same doubles.

    Scale shape: one projection pass computes norms JVM-side; min/max
    are map-side-combinable; only the median pays a rank (at 100 TB:
    replace with the cents-grain-style binned selection — the
    documented trade for an exact quantile of a continuous column)."""
    from pyspark.sql.window import Window

    e = _emb(spark, sf)
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double"),
    )
    nm = e.select("vec_id", F.sqrt(sq).alias("nrm")).localCheckpoint()
    t = nm.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy("nrm", "vec_id")
    r = nm.select("nrm", F.row_number().over(w).cast("long").alias("rn"))
    med = (
        r.crossJoin(F.broadcast(t))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("nrm").alias("med"))
    )
    mm = nm.agg(
        F.min("nrm").alias("mn"), F.max("nrm").alias("mx")
    )
    fmt6 = lambda c: F.format_string("%.6f", F.round(c, 6))  # noqa: E731
    return (
        t.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mm))
        .select(
            F.col("n").alias("n_vecs"),
            fmt6(F.col("mn")).alias("min_norm"),
            fmt6(F.col("med")).alias("median_norm"),
            fmt6(F.col("mx")).alias("max_norm"),
        )
    )


@register(
    "emb_dim_stats",
    # Per-dimension embedding profile: min/max are order-insensitive
    # selections over identical doubles (float32 widens to double
    # EXACTLY on both engines), and the mean's sum is folded in
    # vec_id order on both sides — Spark aggregate(sort_array(...)),
    # DuckDB list_reduce over the ORDER BY vec_id list with a 0.0
    # prepended (acc type == element type) — so the double sum is
    # bit-identical by construction (the kg_resource_allocation
    # sorted-fold discipline applied to a fact-scale column).
    "WITH x AS (SELECT vec_id, e, "
    " unnest(generate_series(1, len(e))) AS i FROM "
    " (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) "
    "  AS e FROM embeddings) t0), "
    "d AS (SELECT CAST(i - 1 AS BIGINT) AS dim, e[i] AS v, vec_id FROM x), "
    "g AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n, MIN(v) AS mn, "
    " MAX(v) AS mx, list(v ORDER BY vec_id) AS vs FROM d GROUP BY dim) "
    "SELECT dim, n, "
    "printf('%.6f', ROUND(mn, 6)) AS min_v, "
    "printf('%.6f', ROUND(mx, 6)) AS max_v, "
    "printf('%.6f', ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), vs), "
    " (s, x) -> s + x) / CAST(n AS DOUBLE), 6)) AS mean_v "
    "FROM g ORDER BY dim",
)
def emb_dim_stats(spark, sf):
    """Per-dimension embedding statistics — min / mean / max of every
    coordinate across the table, the encoder-health profile run before
    any quantization or indexing decision (``emb_quantize_int8``'s
    scale factor, ``emb_pq``'s subspace split, and whitening choices
    all start from exactly this table; a dead or saturated dimension
    shows up here first).

    Float discipline: float32 coordinates widen to double exactly on
    both engines; min/max are order-insensitive selections; the mean's
    sum is a SORTED LEFT FOLD in vec_id order on both engines (Spark
    ``aggregate(sort_array(collect_list(struct(vec_id, v))))``, DuckDB
    ``list_reduce`` over the ORDER BY vec_id list) so the accumulation
    order — the one thing IEEE addition is sensitive to — is pinned
    bit-for-bit; the mean is one further correctly-rounded division.

    Scale shape: one posexplode pass, ONE dim-keyed aggregation (64
    groups; map-side partials carry (n, min, max) cheaply — the
    collect_list is the price of the deterministic fold and is bounded
    per group by the row count; at 100 TB swap it for a two-pass
    exact-scaled integer sum, the documented trade)."""
    d = _emb_par(spark, sf).select(
        "vec_id", F.posexplode("embedding").alias("dim", "v0")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.col("v0").cast("double").alias("v"),
    )
    g = d.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("vec_id", "v"))),
            F.lit(0.0),
            lambda acc, s: acc + s["v"],
        ).alias("ssum"),
    )
    fmt6 = lambda c: F.format_string("%.6f", F.round(c, 6))  # noqa: E731
    return g.select(
        "dim",
        "n",
        fmt6(F.col("mn")).alias("min_v"),
        fmt6(F.col("mx")).alias("max_v"),
        fmt6(F.col("ssum") / F.col("n").cast("double")).alias("mean_v"),
    ).orderBy("dim")


# --- prefix-dimension (matryoshka) retrieval quality ------------------------

_PFX_DIMS = 16


def _pfx_cos_sql(qcol: str, ecol: str, dims: str) -> str:
    qs = f"list_transform({qcol}{dims}, x -> CAST(x AS DOUBLE))"
    es = f"list_transform({ecol}{dims}, x -> CAST(x AS DOUBLE))"
    return (
        f"list_dot_product({qs}, {es}) / "
        f"(SQRT(list_dot_product({qs}, {qs})) * "
        f"SQRT(list_dot_product({es}, {es})))"
    )


@register(
    "emb_prefix_recall",
    # Full-dim exact top-10 vs prefix-16-dim top-10, overlap per query:
    # both rankings use the ROUND(cos, 6) contract with the vec_id
    # tie-break; the overlap count and the recall division are exact.
    f"""WITH full10 AS (SELECT qid, vec_id FROM (
      SELECT q.vec_id AS qid, e.vec_id AS vec_id,
        ROW_NUMBER() OVER (PARTITION BY q.vec_id
          ORDER BY ROUND({_pfx_cos_sql('q.embedding', 'e.embedding', '')}, 6)
            DESC, e.vec_id) AS rn
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}) WHERE rn <= {TOP_K}),
    pfx10 AS (SELECT qid, vec_id FROM (
      SELECT q.vec_id AS qid, e.vec_id AS vec_id,
        ROW_NUMBER() OVER (PARTITION BY q.vec_id
          ORDER BY ROUND({_pfx_cos_sql('q.embedding', 'e.embedding',
                                       f'[1:{_PFX_DIMS}]')}, 6)
            DESC, e.vec_id) AS rn
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}) WHERE rn <= {TOP_K})
    SELECT f.qid, CAST(COUNT(p.vec_id) AS BIGINT) AS n_overlap,
      printf('%.6f', ROUND(CAST(COUNT(p.vec_id) AS DOUBLE)
        / CAST({TOP_K} AS DOUBLE), 6)) AS recall_at_10
    FROM full10 f LEFT JOIN pfx10 p
      ON p.qid = f.qid AND p.vec_id = f.vec_id
    GROUP BY f.qid""",
)
def emb_prefix_recall(spark, sf):
    """Prefix-dimension retrieval quality — the matryoshka-embedding
    question (Kusupati et al.): if we truncate every vector to its
    first 16 of 64 dimensions (4x cheaper storage, dot products, and
    index memory), how much of the exact full-dimension top-10 does
    the truncated search still find? Reported as overlap@10 per query
    vector — the measurement that decides whether a prefix index is an
    acceptable first-stage retriever for THIS embedding space (these
    synthetic embeddings are NOT matryoshka-trained, so the number
    doubles as the honest baseline a trained model would beat).

    Float discipline: both rankings use the shared ROUND(cos, 6)
    contract (each cosine is the positional zip_with fold — engine-
    identical) with the vec_id tie-break; the overlap count is an
    exact integer and recall is ONE division under ROUND + %.6f.

    Scale shape: two broadcast-query passes over the embeddings table
    (the ann_cosine_topk discipline — the query side is 5 rows);
    per-query top-10s join on (qid, vec_id). At real scale the prefix
    pass is the one you'd index (IVF over 16 dims) — this key measures
    whether that is safe."""
    e = _emb_par(spark, sf)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pairs = F.broadcast(q).crossJoin(
        e.select("vec_id", "embedding")
    ).filter(F.col("vec_id") != F.col("qid"))

    def top10(score_col):
        w = Window.partitionBy("qid").orderBy(
            F.desc("cos"), F.asc("vec_id")
        )
        return (
            pairs.select(
                "qid", "vec_id", F.round(score_col, 6).alias("cos")
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .select("qid", "vec_id")
        )

    full10 = top10(_cosine(F.col("qvec"), F.col("embedding")))
    pfx10 = top10(
        _cosine(
            F.slice(F.col("qvec"), 1, _PFX_DIMS),
            F.slice(F.col("embedding"), 1, _PFX_DIMS),
        )
    ).withColumnRenamed("vec_id", "pvec")
    j = full10.join(
        pfx10,
        (full10["qid"] == pfx10["qid"])
        & (full10["vec_id"] == pfx10["pvec"]),
        "left",
    ).select(full10["qid"].alias("fqid"), "pvec")
    return j.groupBy(F.col("fqid").alias("qid")).agg(
        F.count("pvec").cast("long").alias("n_overlap"),
        F.format_string(
            "%.6f",
            F.round(
                F.count("pvec").cast("double")
                / F.lit(TOP_K).cast("double"),
                6,
            ),
        ).alias("recall_at_10"),
    )


# --- embedding isotropy ------------------------------------------------------

def _isotropy_sql() -> str:
    """Build the emb_isotropy oracle: per-vector positional norm folds,
    per-dimension vec_id-sorted unit-coordinate folds, the dim-sorted
    fold of squared dimension sums, and the pinned final
    subtract-divide chain."""
    fold = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), {lst}), "
        "(s, x) -> s + x)"
    )
    return (
        "WITH e0 AS (SELECT vec_id, list_transform(embedding, "
        " v -> CAST(v AS DOUBLE)) AS e FROM embeddings), "
        "nv AS (SELECT vec_id, e, "
        f" {fold.format(lst='list_transform(e, v -> v * v)')} AS n2 "
        " FROM e0), "
        "u AS (SELECT vec_id, list_transform(e, v -> v / SQRT(n2)) AS u "
        " FROM nv WHERE n2 > 0), "
        "q AS (SELECT vec_id, u, "
        f" {fold.format(lst='list_transform(u, v -> v * v)')} AS q "
        " FROM u), "
        "x AS (SELECT vec_id, unnest(generate_series(1, len(u))) AS i, u "
        " FROM u), "
        "d AS (SELECT CAST(i - 1 AS BIGINT) AS dim, u[i] AS v, vec_id "
        " FROM x), "
        "g AS (SELECT dim, list(v ORDER BY vec_id) AS vs FROM d "
        " GROUP BY dim), "
        f"s AS (SELECT dim, {fold.format(lst='vs')} AS sd FROM g), "
        "ss AS (SELECT "
        f" {fold.format(lst='list(sd * sd ORDER BY dim)')} AS snorm2 "
        " FROM s), "
        "s2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        f" {fold.format(lst='list(q ORDER BY vec_id)')} AS sq FROM q) "
        "SELECT n AS n_vecs, "
        "printf('%.6f', ROUND(sq, 6)) AS sum_unit_norm2, "
        "printf('%.6f', ROUND((snorm2 - sq) "
        " / CAST(n * (n - 1) AS DOUBLE), 6)) AS mean_pairwise_cos "
        "FROM ss, s2 WHERE n >= 2"
    )


@register("emb_isotropy", _isotropy_sql())
def emb_isotropy(spark, sf):
    """Embedding-space isotropy diagnostic — the mean pairwise cosine
    between all distinct normalized vectors, computed WITHOUT the
    O(n^2) pair join via the centroid identity ||Σu||^2 = Σ||u||^2 +
    Σ_{i≠j} cos(u_i, u_j): the Ethayarajh / Mu-Viswanath anisotropy
    number (encoder cones score far above 0; a healthy retrieval space
    sits near 0), read before trusting cosine thresholds anywhere else
    in the embedding family — an anisotropic space silently inflates
    every ``dedup_embedding_cosine`` and ``ann_*`` similarity.

    Float discipline: every accumulation is a PINNED fold — per-vector
    norms and unit-norm checks fold positionally over the array (the
    emb_knn_graph discipline), per-dimension sums fold in vec_id order
    (the emb_dim_stats sorted-fold discipline), the squared-dimension
    sums fold in dim order — so each IEEE add happens in one textual
    order on both engines; the readout is one pinned subtract-divide
    chain under ROUND + %.6f. Σ||u||^2 is computed explicitly (NOT
    assumed to be n: unit normalization rounds), and emitted as the
    sum_unit_norm2 sanity column ≈ n.

    Scale shape: ONE posexplode pass and one dim-keyed aggregation (64
    groups) replace the n^2 pair join entirely — the identity is the
    whole point at scale; the collect_list folds are the documented
    determinism trade (two-pass scaled-integer sums at 100 TB, the
    emb_dim_stats note)."""
    e0 = _emb_par(spark, sf).select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("e"),
    )
    n2 = F.aggregate(
        F.transform("e", lambda v: v * v), F.lit(0.0), lambda a, x: a + x
    )
    u = e0.select("vec_id", n2.alias("n2"), "e").filter(
        F.col("n2") > 0
    ).select(
        "vec_id",
        F.transform(
            "e", lambda v: v / F.sqrt(F.col("n2"))
        ).alias("u"),
    )
    q = u.select(
        "vec_id",
        "u",
        F.aggregate(
            F.transform("u", lambda v: v * v),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("q"),
    )
    q = q.localCheckpoint()
    d = q.select("vec_id", F.posexplode("u").alias("dim", "v")).select(
        "vec_id", F.col("dim").cast("long").alias("dim"), "v"
    )
    s = d.groupBy("dim").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("vec_id", "v"))),
            F.lit(0.0),
            lambda acc, st: acc + st["v"],
        ).alias("sd")
    )
    ss = s.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("dim", "sd"))),
            F.lit(0.0),
            lambda acc, st: acc + st["sd"] * st["sd"],
        ).alias("snorm2")
    )
    s2 = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("vec_id", "q"))),
            F.lit(0.0),
            lambda acc, st: acc + st["q"],
        ).alias("sq"),
    )
    fmt6 = lambda c: F.format_string("%.6f", F.round(c, 6))  # noqa: E731
    return (
        ss.crossJoin(F.broadcast(s2))
        .filter(F.col("n") >= 2)
        .select(
            F.col("n").alias("n_vecs"),
            fmt6(F.col("sq")).alias("sum_unit_norm2"),
            fmt6(
                (F.col("snorm2") - F.col("sq"))
                / (F.col("n") * (F.col("n") - 1)).cast("double")
            ).alias("mean_pairwise_cos"),
        )
    )
