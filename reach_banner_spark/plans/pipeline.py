"""The end-to-end KG-construction pipeline (SURVEY.md §3.2 L1).

turns -> salted repartition (G5) -> fused mention detection (P2-P11, one
mapInPandas) -> parenthesis filter (P12, pure expr) -> entity linking
(G1/G2) -> canonicalization (G3) -> window triple assembly (G4)
[-> partitioned materialize + per-partition checkpoints (G6/G7)].

Skew note (G5): transcript corpora have hot conversations (one conv with
1000x the median turns). The mention stage is embarrassingly parallel per
TURN, not per conversation, so we repartition on a deterministic composite
key hash(conv_id, turn_idx) — this splits hot conversations across
partitions with zero correctness impact (mentions are per-turn). The later
triple self-join groups by conv_id again; AQE skew-join splitting plus the
distinct() pre-aggregation keep that stage balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.components import connected_components
from ..operators.linking import entity_edges, link_mentions
from ..operators.mentions import detect_mentions, paren_balanced
from ..operators.triples import assemble_triples


def salt_repartition(turns: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Deterministic skew-busting repartition on hash(conv_id, turn_idx).

    Salt is derived from turn_idx (not rand()) so a resumed run reproduces
    identical partitions (SURVEY.md §7 hard part #2).
    """
    key = F.pmod(F.hash(F.col("conv_id"), F.col("turn_idx")), F.lit(1 << 20))
    if num_partitions:
        return turns.repartition(num_partitions, key)
    return turns.repartition(key)


def canonicalize(
    linked: DataFrame, lexicon: DataFrame, small_edge_cutoff: int = 100_000
) -> DataFrame:
    """Replace each mention's (entity_id, canonical) with its connected-
    component representative (min entity_id in the similarity component).

    Size-adaptive: the similarity graph lives on the *lexicon* (a dimension
    table), so it is usually tiny relative to the fact side. Below
    ``small_edge_cutoff`` edges we run union-find on the driver (identical
    output, zero shuffle rounds) and only go to the distributed
    min-label-propagation loop for genuinely large alias graphs — the same
    decision a planner makes between broadcast and shuffle joins.
    """
    rep = canonical_rep_map(
        linked.sparkSession, lexicon, small_edge_cutoff=small_edge_cutoff
    )
    return apply_canonical(linked, rep)


def canonical_rep_map(
    spark, lexicon: DataFrame, small_edge_cutoff: int = 100_000
) -> DataFrame | None:
    """The entity_id -> (rep_id, rep_canonical) mapping ``canonicalize``
    applies — a pure function of the LEXICON, factored out (r6) so the
    incremental pipeline can derive it ONCE per stream instead of once
    per micro-batch (it was rebuilt per batch: a size-gate job, the
    driver union-find, and the id2canon aggregate — all over static
    reference data). Returns None when the lexicon has no similarity
    edges (canonicalization is then the identity)."""
    # ONE size-gate job: limit-toPandas both decides the path and, on the
    # driver path, already holds the rows (previously a .count() job and a
    # .toPandas() job ran serially here — driver-serial fixed cost)
    lex_pdf = lexicon.limit(small_edge_cutoff + 1).toPandas()
    if len(lex_pdf) <= small_edge_cutoff:
        # dimension-scale lexicon: build the similarity graph + components
        # entirely on the driver (same shared band/jaccard/union-find code
        # as the distributed twins) — avoids ~6 tiny Spark jobs whose fixed
        # scheduling cost would dominate and serialize the pipeline
        from ..operators.components import connected_components_pandas
        from ..operators.linking import entity_edges_pandas

        edges_pdf = entity_edges_pandas(lex_pdf)
        if len(edges_pdf) == 0:
            return None
        comp_pdf = connected_components_pandas(edges_pdf)
        comp = spark.createDataFrame(comp_pdf)
    else:
        comp = connected_components(entity_edges(lexicon))
    id2canon = (
        lexicon.select("entity_id", "canonical")
        .groupBy("entity_id")
        .agg(F.min("canonical").alias("rep_canonical"))
    )
    return (
        comp.join(id2canon, comp["comp"] == id2canon["entity_id"])
        .select(
            F.col("node").alias("entity_id"),
            F.col("comp").alias("rep_id"),
            "rep_canonical",
        )
    )


def apply_canonical(linked: DataFrame, rep: DataFrame | None) -> DataFrame:
    """Apply a ``canonical_rep_map`` to linked mentions (identity when
    the map is None — no similarity edges)."""
    if rep is None:
        return linked
    return (
        linked.join(F.broadcast(rep), "entity_id", "left")
        .withColumn("entity_id", F.coalesce("rep_id", "entity_id"))
        .withColumn("canonical", F.coalesce("rep_canonical", "canonical"))
        .drop("rep_id", "rep_canonical")
    )


def run_pipeline(
    turns: DataFrame,
    lexicon: DataFrame,
    model_path: str,
    window_turns: int = 2,
    num_partitions: int | None = None,
    persist_stages: bool = True,
) -> DataFrame:
    """turns + lexicon -> triples DataFrame (no side effects).

    ``persist_stages``: the mention stage feeds multiple downstream branches
    (exact-link, fuzzy-link candidates, triples); without persistence the
    Arrow UDF would re-run once per branch. MEMORY_AND_DISK persistence is
    the in-session analogue of the checkpointed variant's materialization
    (plans/checkpoint.py), which is what a resumable production run uses.
    """
    # prune to the mention stage's columns BEFORE the salt shuffle — the
    # repartition otherwise moves role/tool/ts bytes that never get used
    salted = salt_repartition(
        turns.select("conv_id", "turn_idx", "text"), num_partitions
    )
    mentions = detect_mentions(salted, model_path)
    mentions = mentions.filter(paren_balanced("surface"))
    if persist_stages:
        # persist AND materialize: the linking stage fans mentions into
        # three branches (exact, fuzzy, candidate bands) inside one action;
        # an unmaterialized cache would let all three recompute the Arrow
        # UDF concurrently before the cache fills (measured 1.7x job cost).
        # Tracked persists: materializing the linked stage below releases
        # the mention cache (its only consumer), and the next pipeline run
        # releases the linked cache — executor storage stays bounded across
        # repeated invocations in one session (ADVICE r2).
        from ..caching import persist_swap

        mentions = persist_swap(mentions)
    linked = link_mentions(mentions, lexicon)
    linked = canonicalize(linked, lexicon)
    if persist_stages:
        linked = persist_swap(linked)
    return assemble_triples(linked, turns, window_turns=window_turns)
