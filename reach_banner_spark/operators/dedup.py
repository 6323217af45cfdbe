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
    from ..caching import cached_scan

    return cached_scan(spark, f"{sf}/documents.parquet")


def _docs_par(spark, sf):
    """Documents scan rebalanced for compute-heavy map stages (the corpus
    files are single-row-group parquet, i.e. ONE scan split and ONE
    Arrow/Python worker for every mapInArrow/mapInPandas pass — see
    reach_banner_spark.fanout)."""
    from reach_banner_spark.fanout import fan_out

    return fan_out(_docs(spark, sf), "doc_id")


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


def doc_shingle_bands(d: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sh: array<long>, bands: array<long>) in ONE Python pass:
    shingle sets are computed once and reused for both the MinHash band
    hashes and the exact-verify arrays (band_hashes used to re-shingle).

    mapInArrow, not mapInPandas: the shingle lists go out as ONE flat
    int64 buffer + offsets (``pa.ListArray.from_arrays``) instead of a
    Python list-of-lists per row — the per-batch
    ``[x.tolist() for x in sh]`` materialization was a measured tax on the
    dedup bench (r2 VERDICT #4); Arrow's list array is zero-copy from the
    numpy buffers."""
    import pyarrow as pa

    from .linking import NUM_BANDS as _  # noqa: F401  (doc: same banding math)
    from .linking import _BAND_MIX, char3_shingle_ids
    from ..functions.hashing import minhash_signatures

    narrow = d.select("doc_id", text_col)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            texts = rb.column(1).to_pandas()
            sh = char3_shingle_ids(texts)
            sigs = minhash_signatures(sh, num_hashes=DOC_NUM_HASHES).astype(
                np.uint64
            )
            rows = DOC_NUM_HASHES // DOC_NUM_BANDS
            sigs = sigs.reshape(n, DOC_NUM_BANDS, rows)
            bh = np.zeros((n, DOC_NUM_BANDS), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for r in range(rows):
                    bh ^= sigs[:, :, r]
                    bh *= _BAND_MIX
            bh = (bh >> np.uint64(1)).astype(np.int64)

            lens = np.fromiter((len(x) for x in sh), dtype=np.int64, count=n)
            sh_offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(lens, out=sh_offsets[1:])
            sh_values = (
                np.concatenate(sh) if lens.sum() else np.empty(0, dtype=np.int64)
            )
            sh_arr = pa.ListArray.from_arrays(
                pa.array(sh_offsets), pa.array(sh_values, type=pa.int64())
            )
            band_offsets = np.arange(n + 1, dtype=np.int32) * DOC_NUM_BANDS
            band_arr = pa.ListArray.from_arrays(
                pa.array(band_offsets),
                pa.array(bh.reshape(-1), type=pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), sh_arr, band_arr], ["doc_id", "sh", "bands"]
            )

    return narrow.mapInArrow(
        run, "doc_id long, sh array<long>, bands array<long>"
    )


def verify_jaccard(
    cands: DataFrame, sh_lookup: DataFrame, minj: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (a, b) pairs against the
    shingle lookup — the ONE shared spelling for batch and streaming dedup
    (a per-caller copy would let the algebra drift out from under the
    streaming==batch test pin).

    Verify-condition shape matters: a naive ``withColumn(jaccard).filter``
    gets pushed into the join condition with array_intersect duplicated
    (numerator + denominator, no CSE inside the BHJ condition) — the
    intersect IS the verify cost, so that doubles it. The pushed predicate
    uses the algebra  inter/(s - inter) >= t  <=>  inter >= t/(1+t) * s,
    prefixed by a zero-intersect size-ratio gate (j >= t implies
    min/max >= t) that short-circuits ~half the candidates before any
    intersect.

    The contract is round(j, 6) >= minj, so a pair with raw j as low as
    minj - 5e-7 must still reach the exact filter (6-decimal HALF_UP
    rounds it up). The gate predicates therefore use t' = minj - 5.01e-7
    — wide enough for the whole rounding window plus double arithmetic —
    and the exact rounded filter above the join restores the precise
    threshold for the few hundred survivors."""
    pairs = (
        cands.join(
            sh_lookup.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")),
            "a",
        ).join(
            sh_lookup.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b")),
            "b",
        )
    )
    t = minj - 5.01e-7  # covers round-half-up at 6 decimals + fp slack
    na, nb = F.size("sh_a"), F.size("sh_b")
    cheap = F.least(na, nb).cast("double") >= F.lit(t) * F.greatest(na, nb).cast(
        "double"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    s = (na + nb).cast("double")
    pushed = inter >= F.lit(t / (1.0 + t)) * s
    union = s - inter
    return (
        pairs.filter(cheap & pushed)
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= F.lit(minj))
        .select("a", "b", "jaccard")
    )


@register("dedup_minhash_lsh", None)  # pytest-golden vs exhaustive Jaccard
def dedup_minhash_lsh(spark, sf, min_jaccard: float = 0.9, max_bucket: int = MAX_BUCKET):
    """Near-duplicate pairs (j >= 0.9) with exact verified Jaccard.

    shingle -> minhash -> band -> bucket pairs (degenerate buckets capped)
    -> JVM-side exact verify (array_intersect on precomputed shingle sets;
    no Python in the quadratic part).

    Plan shape (shuffle-minimal): ONE Python scan computes shingle sets +
    band hashes together and is persisted; buckets come from a single
    groupBy on (band_idx, band_hash) with pairs generated by in-bucket
    explode (bounded by MAX_BUCKET — never a self-join of the band table);
    the verify join reads the persisted narrow table, which AQE broadcasts
    when small and shuffles at scale. At 100 TB the same plan holds: the
    persist becomes a checkpoint table, every stage is linear in docs +
    candidate pairs.
    """
    from ..caching import persist_swap

    d = _docs_par(spark, sf)
    # materialize NOW (lazy persists recompute the UDF per branch); tracked
    # so the next operator invocation releases this cache (ADVICE r2)
    base = persist_swap(doc_shingle_bands(d))
    bands = base.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_hash")
    )
    buckets = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids").between(2, max_bucket))
    )
    cands = (
        buckets.select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    return verify_jaccard(cands, base.select("doc_id", "sh"), float(min_jaccard))


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


# ---------------------------------------------------- embedding cosine ----

EMB_DIM = 64        # hashed bag-of-words projection dimension
EMB_MIN_COS = 0.97  # near-dup threshold (this corpus' common-vocab floor is
# cos~0.94 at p99.9; 0.97 isolates the true replicas — same 25 pairs the
# MinHash j>=0.9 path finds at sf0.01, measured)
EMB_TABLES = 12     # dedicated LSH operating point: recall 1.0 vs exhaustive
EMB_PLANES = 16     # at both test SFs with ~15k candidates (grid-measured)
EMB_SEED = 43
EMB_MAX_BUCKET = 100


def doc_embed_pandas(texts: "pd.Series | np.ndarray") -> np.ndarray:
    """Deterministic (n, EMB_DIM) float64 document vectors: l2-normalized
    hashed bag-of-words counts (FNV token hash mod EMB_DIM). The stand-in
    for a model embedding column — near-dup documents share their word
    distribution, so cosine separates them the way a real embedding would;
    the Spark-side plumbing (batch shape, LSH bucketing, verify join) is
    exactly what a model-produced ``array<float>`` column needs."""
    from ..functions.hashing import hash_str_array

    n = len(texts)
    toks = [(t or "").lower().split() for t in texts]
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
    flat = np.array([w for ts in toks for w in ts], dtype=object)
    out = np.zeros((n, EMB_DIM), dtype=np.float64)
    if len(flat):
        h = hash_str_array(flat, EMB_DIM)
        owner = np.repeat(np.arange(n, dtype=np.int64), lens)
        np.add.at(out, (owner, h), 1.0)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def doc_embeddings(d: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, embedding: array<double>) via the hashed-BoW projection.

    mapInArrow: the (n, EMB_DIM) matrix goes out as ONE flat float64
    buffer + stride offsets (zero-copy from numpy), same pattern as
    ``doc_shingle_bands``."""
    import pyarrow as pa

    narrow = d.select("doc_id", text_col)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            vecs = doc_embed_pandas(rb.column(1).to_pandas())
            offsets = np.arange(n + 1, dtype=np.int32) * EMB_DIM
            arr = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(vecs.reshape(-1), type=pa.float64())
            )
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), arr], ["doc_id", "embedding"]
            )

    return narrow.mapInArrow(run, "doc_id long, embedding array<double>")


@register("dedup_embedding_cosine", None)  # pytest-golden vs exhaustive cosine
def dedup_embedding_cosine(
    spark, sf, min_cos: float = EMB_MIN_COS, broadcast_doc_cutoff: int = 200_000
):
    """Embedding-cosine near-dup pairs (cos >= EMB_MIN_COS = 0.97,
    see the operating-point note on the constant above), LSH-bucketed.

    embed -> random-hyperplane signatures (reusing the ann_lsh machinery)
    -> bucket pairs (capped) -> exact JVM-side cosine verify. The all-pairs
    cosine matrix never materializes; at 100 TB the shuffle is O(docs x
    n_tables) bucket rows plus candidate pairs.
    """
    from .similarity import lsh_signatures
    from ..caching import persist_swap

    d = _docs_par(spark, sf)
    # one Python scan feeds signatures AND the verify join; tracked persist
    # so the next operator invocation releases this cache (ADVICE r2)
    emb = persist_swap(doc_embeddings(d).withColumnRenamed("doc_id", "vec_id"))
    sigs = lsh_signatures(
        emb, EMB_DIM, n_tables=EMB_TABLES, n_planes=EMB_PLANES, seed=EMB_SEED
    )
    buckets = (
        sigs.groupBy("table_idx", "sig")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
        .filter(F.size("ids").between(2, EMB_MAX_BUCKET))
    )
    cands = (
        buckets.select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    # Size-adaptive verify. The candidate set is ~1000x the survivor set
    # (488k cands -> 268 pairs at sf0.1), and the JVM higher-order-function
    # dot (zip_with + aggregate, interpreted per element) paid ~2 s there.
    # Below the gate the verify ships ONLY (a, b) id pairs through Arrow
    # and reads the embeddings from a broadcast (n_docs x EMB_DIM) numpy
    # matrix — one einsum per batch, vectors never join-shuffled. The gate
    # (200k docs ~ 100 MB float64) is the broadcastability bound; above it
    # the JVM join twin below runs unchanged (arrays move to the pairs).
    emb_gate = broadcast_doc_cutoff
    emb_pdf = emb.limit(emb_gate + 1).toPandas()
    if len(emb_pdf) <= emb_gate:
        from ..caching import track_broadcast

        order = np.argsort(emb_pdf["vec_id"].to_numpy(), kind="stable")
        sids = emb_pdf["vec_id"].to_numpy()[order]
        mat = np.stack(emb_pdf["embedding"].to_numpy())[order]
        bc = track_broadcast(spark.sparkContext.broadcast((sids, mat)))
        minc = float(min_cos)

        def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # Rounding must match the JVM twin EXACTLY (the paths-identical
            # test pins pair-set equality): Spark's F.round(x, 6) is
            # BigDecimal HALF_UP over Double.toString's shortest decimal
            # form, and Python's repr(float) is the same shortest form —
            # so Decimal(repr(x)).quantize(HALF_UP) reproduces it bit-for-
            # bit, where np.round (half-even) can flip a borderline pair
            # (ADVICE r4). Slack gate first, exact decimal only for the
            # few survivors near/above threshold.
            from decimal import ROUND_HALF_UP, Decimal

            q6 = Decimal("0.000001")
            vids, vmat = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                a = pdf["a"].to_numpy()
                b = pdf["b"].to_numpy()
                ia = np.searchsorted(vids, a)
                ib = np.searchsorted(vids, b)
                # left-fold accumulation (cumsum) matches F.aggregate's
                # sequential fold bit-for-bit; einsum's pairwise/SIMD sum
                # can differ in the last ulp, which matters at the
                # rounding boundary below
                raw = (vmat[ia] * vmat[ib]).cumsum(axis=1)[:, -1]
                slack = raw >= minc - 5.01e-7  # covers the rounding window
                a, b, raw = a[slack], b[slack], raw[slack]
                # float(x) first: on NumPy >= 2.0 repr(np.float64) is
                # "np.float64(...)", which Decimal cannot parse; the plain
                # Python float keeps the shortest-repr equivalence with
                # Double.toString that the HALF_UP argument relies on
                cos = np.array(
                    [
                        float(Decimal(repr(float(x))).quantize(q6, ROUND_HALF_UP))
                        for x in raw
                    ],
                    dtype=np.float64,
                )
                keep = cos >= minc
                yield pd.DataFrame(
                    {"a": a[keep], "b": b[keep], "cos": cos[keep]}
                )

        return cands.mapInPandas(verify, "a long, b long, cos double")

    ea = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        cands.join(ea, "a")
        .join(eb, "b")
        .withColumn("cos", F.round(dot, 6))  # vectors are l2-normalized
        .filter(F.col("cos") >= F.lit(min_cos))
        .select("a", "b", "cos")
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


@register("dedup_cluster", None)  # pytest vs union-find twin
def dedup_cluster(spark, sf, small_pair_cutoff: int = 1_000_000):
    """Near-duplicate CLUSTERS with a canonical survivor per cluster:
    the verified minhash pair graph (``dedup_minhash_lsh``) closed under
    transitivity by connected components (G3), canonical = min doc_id of
    the component. This is the shape a 100 TB dedup actually ships — pair
    lists alone under-remove (a~b, b~c but a!~c leaves two survivors);
    the component closure removes every non-canonical member once.
    Output: (doc_id, canonical_id) for every doc in some near-dup
    cluster; docs with no near-dup are absent (nothing to remove)."""
    from .components import connected_components, connected_components_pandas

    pairs = dedup_minhash_lsh(spark, sf).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    # Size-adaptive closure (same planner decision as pipeline.canonicalize):
    # the verified pair set is usually TINY relative to the corpus (near-dup
    # rate, not corpus size), so below the gate union-find runs on the
    # driver in one collect — identical output, zero iterative shuffle
    # rounds. The distributed min-label loop only pays off for genuinely
    # huge pair graphs. ONE gate job: limit-toPandas decides the path and
    # already holds the rows on the driver path. The cutoff is a kwarg so
    # tests can force the distributed branch (small_pair_cutoff=0) and pin
    # it equal to the driver union-find (same pattern as link_mentions'
    # broadcast_lex_cutoff).
    # persist BEFORE the gate probe: in the above-gate case the probe has
    # already executed the whole shingle/band/verify pipeline, and without
    # a cache the distributed component loop would re-execute it all
    from ..caching import persist_swap

    pairs = persist_swap(pairs)
    pair_pdf = pairs.limit(small_pair_cutoff + 1).toPandas()
    if len(pair_pdf) <= small_pair_cutoff:
        if len(pair_pdf) == 0:
            return spark.createDataFrame([], "doc_id long, canonical_id long")
        comp_pdf = connected_components_pandas(pair_pdf).rename(
            columns={"node": "doc_id", "comp": "canonical_id"}
        )
        return spark.createDataFrame(comp_pdf, "doc_id long, canonical_id long")
    comp = connected_components(pairs)
    return comp.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("canonical_id")
    )


# -------------------------------------------------------------- URL dedup ----
# The corpus carries no URL column, so (pii_scrub precedent) a raw URL is
# synthesized per document by the SAME deterministic expression on both
# engines: scheme/host-case/default-port/www-prefix/utm-param/fragment
# variations that a crawler actually sees, arranged so canonicalization
# collapses deterministic groups of docs onto one canonical URL.
_URL_RAW_SQL = (
    "'HTTPS://' || "
    "CASE WHEN doc_id % 3 = 0 THEN 'WWW.Site' || CAST(doc_id % 5 AS STRING)"
    " || '.COM' "
    "WHEN doc_id % 3 = 1 THEN 'site' || CAST(doc_id % 5 AS STRING) || '.com' "
    "ELSE 'Site' || CAST(doc_id % 5 AS STRING) || '.com:443' END || "
    "'/p/' || CAST(doc_id % 40 AS STRING) || "
    "CASE WHEN doc_id % 4 = 0 THEN '?utm_source=tw&ref=' "
    "  || CAST(doc_id % 3 AS STRING) "
    "WHEN doc_id % 4 = 1 THEN '?ref=' || CAST(doc_id % 3 AS STRING) "
    "WHEN doc_id % 4 = 2 THEN '?ref=' || CAST(doc_id % 3 AS STRING)"
    " || '&utm_campaign=x' "
    "ELSE '' END || "
    "CASE WHEN doc_id % 2 = 0 THEN '#sec' ELSE '' END"
)

# canonicalization pipeline: (pattern, replacement), applied IN ORDER.
# RE2-safe (no lookaround) so DuckDB and the JVM compile identical
# semantics; DuckDB needs the explicit 'g' flag to match Spark's
# replace-all default.
_URL_CANON_STEPS = [
    (r"#.*$", ""),                       # strip fragment
    (r":443/", "/"),                     # strip default https port
    (r"^https://www\.", "https://"),     # strip www. prefix
    (r"&utm_[a-z]+=[^&]*", ""),          # utm param in non-leading position
    (r"\?utm_[a-z]+=[^&]*&", "?"),       # leading utm followed by others
    (r"\?utm_[a-z]+=[^&]*$", ""),        # query that was ONLY utm params
]


def _url_canon_sql() -> str:
    expr = f"lower({_URL_RAW_SQL})"
    for pat, rep in _URL_CANON_STEPS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return expr


def _url_canon_col():
    raw = F.expr(_URL_RAW_SQL)
    c = F.lower(raw)
    for pat, rep in _URL_CANON_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return c


@register(
    "dedup_url",
    f"SELECT {_url_canon_sql()} AS canonical_url, "
    "CAST(MIN(doc_id) AS BIGINT) AS keeper, "
    "CAST(COUNT(*) AS BIGINT) AS n_dups "
    "FROM documents GROUP BY 1",
)
def dedup_url(spark, sf):
    """URL-canonicalization dedup — the crawl-frontier companion to
    content dedup: case-fold, strip fragments, default ports, the
    ``www.`` prefix and ``utm_*`` tracking parameters (in that fixed
    order — canonicalization is only deterministic if both engines apply
    the SAME rewrite sequence, which lives once in ``_URL_CANON_STEPS``),
    then keep the minimum doc_id per canonical URL. Each rewrite is an
    RE2-safe regex (no lookaround), so the Java and RE2 engines agree.

    Scale shape: identical to ``dedup_exact`` — a pure projection chain
    inside whole-stage codegen followed by ONE hash aggregation on the
    canonical URL (map-side combinable). No joins, no windows; this is
    the cheapest dedup on the surface and the first one a web-scale
    ingest runs (before any content hashing)."""
    d = _docs(spark, sf)
    return (
        d.select(_url_canon_col().alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


@register(
    "dedup_containment",
    # Asymmetric word-set containment over the same bounded pairing as
    # dedup_ngram_jaccard: inter/|A| detects A-quoted-in-B even when
    # symmetric Jaccard is low (|B| >> |A|). Exact integer set sizes;
    # each ratio is ONE division under ROUND-then-%.6f.
    "SELECT a.doc_id AS a, b.doc_id AS b, "
    "CAST(LEN(list_intersect(a.w, b.w)) AS BIGINT) AS inter, "
    "CAST(LEN(a.w) AS BIGINT) AS na, CAST(LEN(b.w) AS BIGINT) AS nb, "
    "printf('%.6f', ROUND(CAST(LEN(list_intersect(a.w, b.w)) AS DOUBLE) "
    " / LEN(a.w), 6)) AS cont_a, "
    "printf('%.6f', ROUND(CAST(LEN(list_intersect(a.w, b.w)) AS DOUBLE) "
    " / LEN(b.w), 6)) AS cont_b FROM "
    "(SELECT doc_id, source, list_distinct(string_split(text, ' ')) w "
    " FROM documents) a "
    "JOIN (SELECT doc_id, source, list_distinct(string_split(text, ' ')) w "
    " FROM documents) b "
    "ON a.source = b.source AND b.doc_id = a.doc_id + 20",
)
def dedup_containment(spark, sf):
    """Asymmetric containment scoring — the quote/inclusion detector the
    symmetric dedup family misses: containment(A in B) = |A∩B|/|A| is
    near 1 when document A is substantially QUOTED inside a much larger
    B, a pair symmetric Jaccard scores near |A|/|B| and never flags
    (the Broder containment-sketch use case; boilerplate and licence
    blocks surface exactly this way). Same bounded same-source pairing
    rule as ``dedup_ngram_jaccard`` so the two keys are directly
    comparable pair-for-pair; both directions emitted.

    Float discipline: set sizes and the intersection are exact
    integers; each ratio is ONE correctly-rounded IEEE division under
    the shared ROUND/%.6f contract.

    Scale shape: same as ngram_jaccard — the pairing predicate bounds
    candidates to one partner per doc (at scale the pair source is the
    LSH candidate table; the scoring algebra is what this key pins),
    one broadcast-free equi-join on (source, doc_id+20), pure JVM array
    algebra."""
    d = _docs_par(spark, sf).select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("w")
    )
    a = d.select(
        F.col("doc_id").alias("a"),
        F.col("source").alias("sa"),
        F.col("w").alias("wa"),
    )
    b = d.select(
        F.col("doc_id").alias("b"),
        F.col("source").alias("sb"),
        F.col("w").alias("wb"),
    )
    pairs = a.join(
        b, (F.col("sa") == F.col("sb")) & (F.col("b") == F.col("a") + 20)
    )
    inter = F.size(F.array_intersect("wa", "wb"))
    fmt = lambda c: F.format_string("%.6f", F.round(c, 6))  # noqa: E731
    return pairs.select(
        "a",
        "b",
        inter.cast("long").alias("inter"),
        F.size("wa").cast("long").alias("na"),
        F.size("wb").cast("long").alias("nb"),
        fmt(inter.cast("double") / F.size("wa")).alias("cont_a"),
        fmt(inter.cast("double") / F.size("wb")).alias("cont_b"),
    )


# ---------------------------------------------------------- winnowing ----

@register(
    "dedup_winnowing",
    # Winnowing (Schleimer et al., MOSS): per doc, MD5 word-3-gram
    # shingle hashes; each sliding window of 4 consecutive hashes
    # selects its MINIMUM (string min over fixed-width hex — a total
    # deterministic order); the doc's fingerprint set is the distinct
    # selected values. Docs are paired by shared fingerprints — all
    # counts exact integers, top-50 under a tie-free total order.
    "WITH d AS (SELECT doc_id, string_split(text, ' ') AS w "
    " FROM documents), "
    "sh AS (SELECT doc_id, list_transform("
    " generate_series(1, greatest(len(w) - 2, 0)), "
    " i -> md5(w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s FROM d), "
    "fp AS (SELECT doc_id, unnest(list_distinct(list_transform("
    " generate_series(1, greatest(len(s) - 3, 0)), "
    " i -> list_min(s[i:i+3])))) AS f FROM sh WHERE len(s) >= 4) "
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CAST(COUNT(*) AS BIGINT) AS n_shared "
    "FROM fp a JOIN fp b ON b.f = a.f AND a.doc_id < b.doc_id "
    "GROUP BY 1, 2 ORDER BY n_shared DESC, doc_a, doc_b LIMIT 50",
)
def dedup_winnowing(spark, sf):
    """Winnowing document fingerprinting (Schleimer et al. 2003 — the
    MOSS algorithm): every window of 4 consecutive word-3-gram hashes
    selects its minimum, so any shared substring of ~6 words GUARANTEES
    a shared fingerprint (the local-selection property ``doc_fingerprint``'s
    single global min lacks and ``dedup_minhash_lsh``'s random
    projections only provide probabilistically) while storing ~1/4 of
    the shingles. Pairs ranked by shared-fingerprint count are the
    plagiarism/quote-detection candidates a curation pipeline feeds to
    exact verification (``dedup_containment``).

    Determinism: hashes are fixed-width MD5 hex, so the window MIN is
    a total lexicographic order with no ties across distinct shingles;
    everything is exact integers — no float contract at all.

    Scale shape: fingerprint selection is PURE per-doc array algebra
    (slice + array_min inside whole-stage codegen — zero shuffle, the
    _tri_md5_col discipline); the pair join keys on the fingerprint
    value whose selectivity winnowing exists to provide (~1/4 shingle
    mass), followed by one pair aggregation and a
    TakeOrderedAndProject top-50 — the bucketed-not-all-pairs shape.
    At 100 TB the fingerprint table is the only shuffled artifact."""
    from .textstats import _tri_md5_col

    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    sh = d.select(
        "doc_id",
        F.filter(_tri_md5_col(), lambda x: x.isNotNull()).alias("s"),
    ).filter(F.size("s") >= 4)
    fps = sh.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("s") - 3),
                    lambda i: F.array_min(F.slice("s", i, 4)),
                )
            )
        ).alias("f"),
    )
    b = fps.select(F.col("doc_id").alias("doc_b"), "f")
    return (
        fps.select(F.col("doc_id").alias("doc_a"), "f")
        .join(b, "f")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .orderBy(F.desc("n_shared"), "doc_a", "doc_b")
        .limit(50)
    )
# --- cross-split leakage --------------------------------------------------

def _cross_split_sql() -> str:
    """Build the dedup_cross_split oracle: the split_assign MD5-prefix
    bands, DISTINCT train membership sets at both the whole-doc-hash
    and pseudo-line grains, LEFT-join probes, one exact division per
    rate."""
    from .textstats import _LINE_WORDS, _SPLIT_TEST_BOUND, _SPLIT_VAL_BOUND

    split = (
        "CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) <= "
        f"'{_SPLIT_VAL_BOUND}' THEN 'val' "
        "WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) <= "
        f"'{_SPLIT_TEST_BOUND}' THEN 'test' ELSE 'train' END"
    )
    return (
        f"WITH s AS (SELECT doc_id, {split} AS split, MD5(text) AS h "
        " FROM documents), "
        "tr AS (SELECT DISTINCT h FROM s WHERE split = 'train'), "
        "ed AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "  CAST(SUM(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) "
        "   AS BIGINT) AS n_leaked_docs "
        " FROM s LEFT JOIN tr ON tr.h = s.h WHERE split <> 'train' "
        " GROUP BY split), "
        "d AS (SELECT doc_id, string_split(text, ' ') AS w "
        " FROM documents), "
        "c AS (SELECT doc_id, unnest(generate_series(0, "
        f" CAST(CEIL(LEN(w) / {_LINE_WORDS}.0) AS INT) - 1)) AS ci, w "
        " FROM d), "
        "lines AS (SELECT doc_id, array_to_string(list_slice(w, "
        f" ci * {_LINE_WORDS} + 1, (ci + 1) * {_LINE_WORDS}), ' ') "
        " AS line FROM c), "
        "sl AS (SELECT lines.line, s.split FROM lines "
        " JOIN s ON s.doc_id = lines.doc_id), "
        "tl AS (SELECT DISTINCT line FROM sl WHERE split = 'train'), "
        "el AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_lines, "
        "  CAST(SUM(CASE WHEN tl.line IS NOT NULL THEN 1 ELSE 0 END) "
        "   AS BIGINT) AS n_leaked_lines "
        " FROM sl LEFT JOIN tl ON tl.line = sl.line "
        " WHERE sl.split <> 'train' GROUP BY split) "
        "SELECT ed.split, n_docs, n_leaked_docs, "
        "printf('%.6f', ROUND(CAST(n_leaked_docs AS DOUBLE) "
        " / CAST(n_docs AS DOUBLE), 6)) AS doc_leak_rate, "
        "n_lines, n_leaked_lines, "
        "printf('%.6f', ROUND(CAST(n_leaked_lines AS DOUBLE) "
        " / CAST(n_lines AS DOUBLE), 6)) AS line_leak_rate "
        "FROM ed JOIN el ON el.split = ed.split "
        "WHERE n_docs > 0 AND n_lines > 0"
    )


@register("dedup_cross_split", _cross_split_sql())
def dedup_cross_split(spark, sf):
    """Train→eval leakage report — the DECONTAMINATION check every
    training run owes its eval numbers (the GPT-3/C4 lesson: benchmark
    content hiding verbatim in the training split inflates eval scores
    silently): for each eval split of the deterministic
    ``split_assign`` bands, membership of eval content in the train
    split at TWO grains — whole-document exact text (MD5 of the body;
    near-zero on a healthy corpus, the alarm wire) and the C4-style
    12-word pseudo-line (the ``dedup_lines`` grain, where boilerplate
    genuinely crosses the boundary — a few percent here is the
    realistic background the doc-level zero would hide). Complements
    ``contamination_ngram`` (partial overlap against a FIXED benchmark
    list) with the whole-corpus membership sweep across the split
    boundary itself.

    Float discipline: all counts are exact integers (hash-set /
    line-set membership via LEFT joins against DISTINCT train sets);
    each leak rate is ONE correctly-rounded IEEE division per row
    under ROUND + %.6f. Split membership is the split_assign
    MD5-prefix contract — a pure function of doc_id, identical on both
    engines.

    Scale shape: one corpus pass per grain; the DISTINCT train sets
    are content-bounded and the probes are hash joins keyed on the
    digest/line (at 100 TB: broadcast if the train digest set fits,
    else a shuffle join on the key — either way full text moves at
    most once, into 16-byte hashes and bounded pseudo-lines); the
    readout is two rows."""
    from .textstats import _SPLIT_TEST_BOUND, _SPLIT_VAL_BOUND, doc_lines

    d = _docs_par(spark, sf)
    sp = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
        <= _SPLIT_VAL_BOUND,
        "val",
    ).when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
        <= _SPLIT_TEST_BOUND,
        "test",
    ).otherwise("train")
    s = d.select("doc_id", F.md5("text").alias("h"), sp.alias("split"))
    tr = (
        s.filter(F.col("split") == "train")
        .select("h")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ed = (
        s.filter(F.col("split") != "train")
        .join(tr, "h", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_leaked_docs"),
        )
    )
    sl = doc_lines(d).select("doc_id", "line").join(
        s.select("doc_id", "split"), "doc_id"
    )
    tl = (
        sl.filter(F.col("split") == "train")
        .select("line")
        .distinct()
        .withColumn("lhit", F.lit(1))
    )
    el = (
        sl.filter(F.col("split") != "train")
        .join(tl, "line", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.coalesce(F.col("lhit"), F.lit(0)))
            .cast("long")
            .alias("n_leaked_lines"),
        )
    )
    fmt = lambda c: F.format_string("%.6f", F.round(c, 6))  # noqa: E731
    return (
        ed.join(el, "split")
        .filter((F.col("n_docs") > 0) & (F.col("n_lines") > 0))
        .select(
            "split",
            "n_docs",
            "n_leaked_docs",
            fmt(
                F.col("n_leaked_docs").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("doc_leak_rate"),
            "n_lines",
            "n_leaked_lines",
            fmt(
                F.col("n_leaked_lines").cast("double")
                / F.col("n_lines").cast("double")
            ).alias("line_leak_rate"),
        )
    )
