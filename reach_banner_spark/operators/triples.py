"""(subj, pred, obj) triple assembly per conversation window (G4).

No BANNER counterpart — this stage comes from the graft spec
[V BASELINE.json:6]: linked mentions are paired within a sliding window of
``window_turns`` turns inside each conversation, ordered by (turn_idx,
begin_char), and the predicate is chosen by a role/tool-aware rule table
over the *object* turn (pure ``when()`` expression chain — stays entirely
inside whole-stage codegen, no Python).

Rule table (deterministic, shared verbatim by the pandas golden twin):

  same turn                         -> co_mentioned
  obj turn role=assistant, tool!='' -> derived_via_<tool>
  obj turn role=assistant           -> answered_with
  obj turn role=user                -> asked_about
  obj turn role=tool                -> observed_with
  otherwise                         -> followed_by

Scale: the self-join shuffles once on conv_id (both sides co-partitioned);
conversation skew is handled upstream by salted repartition (G5) and AQE
skew-join splitting. Output is ``distinct()`` so the triple set is stable.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pred_tail_expr(role_col, tool_col):
    """The predicate rule table MINUS the same-turn branch — everything
    that depends only on the object turn's (role, tool), so it can be
    evaluated at the mention grain before the window explode; the
    same-turn override is applied after the pair join."""
    return (
        F.when(
            (role_col == "assistant") & (tool_col.isNotNull()) & (tool_col != ""),
            F.concat(F.lit("derived_via_"), tool_col),
        )
        .when(role_col == "assistant", F.lit("answered_with"))
        .when(role_col == "user", F.lit("asked_about"))
        .when(role_col == "tool", F.lit("observed_with"))
        .otherwise(F.lit("followed_by"))
    )


def assemble_triples(
    linked_mentions: DataFrame,
    turns: DataFrame,
    window_turns: int = 2,
    obj_mentions: DataFrame | None = None,
) -> DataFrame:
    """linked mentions (with ``canonical``) + turns -> TRIPLES DataFrame.

    ``obj_mentions`` (optional) restricts the OBJECT side of the pairing
    to a subset of the mentions (same required columns). The incremental
    streaming twin (``stream_triples``) passes only the new micro-batch's
    mentions here while the subject side sees batch + tail: since turns
    arrive in order, every triple's object turn is >= its subject turn,
    so object-in-new-batch captures exactly the triples the batch did not
    emit before."""
    # ONE exchange keyed (conv_id, turn_idx) serves the mention dedup, the
    # object side's turn-meta join AND the subject side of the pair join:
    # HashPartitioning on (conv_id, turn_idx) is a subset of every one of
    # those keys, so no further exchange is required (guide §2.4 — two
    # operations keyed the same way share one exchange).
    m = (
        linked_mentions.filter(F.col("canonical").isNotNull())
        .select("conv_id", "turn_idx", "begin_char", "canonical")
        .repartition("conv_id", "turn_idx")
        .distinct()
    )
    if obj_mentions is None:
        # batch path: subject and object sides consume the SAME mention
        # table — materialize it once (the lazy plan re-derived the whole
        # upstream mention subtree per side: two scans, two dict joins,
        # two distincts at sf1.0). persist (not localCheckpoint): the
        # in-memory scan keeps the (conv_id, turn_idx) outputPartitioning,
        # so neither side re-shuffles; a checkpointed RDD reports
        # UnknownPartitioning and both sides would pay a fresh exchange.
        from ..caching import persist_swap

        m = persist_swap(m)
        mb = m
    else:
        mb = (
            obj_mentions.filter(F.col("canonical").isNotNull())
            .select("conv_id", "turn_idx", "begin_char", "canonical")
            .repartition("conv_id", "turn_idx")
            .distinct()
        )
    turn_meta = turns.select("conv_id", "turn_idx", "role", "tool")

    a = m.select(
        "conv_id",
        F.col("turn_idx").alias("t1"),
        F.col("begin_char").alias("c1"),
        F.col("canonical").alias("subj"),
    )
    # The predicate depends only on the OBJECT turn's (role, tool) plus
    # the same-turn test — attach role/tool at the MENTION grain, before
    # the window explode and pair join (the old plan shuffled the full
    # pair table by (conv_id, t2) to meet turn_meta; guide §2.3/§8:
    # decide with small rows). turns is the fact table — never
    # broadcastable; the shuffled-hash hint pins a shuffle-side path so
    # size misestimates can't pull it through the driver. The mention
    # side is already partitioned by (conv_id, turn_idx), so only
    # turn_meta pays an exchange here.
    b = (
        mb.select(
            "conv_id",
            F.col("turn_idx").alias("t2"),
            F.col("begin_char").alias("c2"),
            F.col("canonical").alias("obj"),
        )
        .join(
            turn_meta.withColumnRenamed("turn_idx", "t2").hint("shuffle_hash"),
            ["conv_id", "t2"],
            "left",
        )
        .withColumn("pred_tail", _pred_tail_expr(F.col("role"), F.col("tool")))
        .drop("role", "tool")
    )
    # Equi-join on (conv_id, t1): each object mention is exploded to the
    # window_turns+1 subject turns that may pair with it. A plain join on
    # conv_id alone would be a within-conversation cartesian product —
    # O(mentions_per_conv^2) intermediate rows, catastrophic for hot
    # conversations; including the turn in the key both bounds the join
    # fan-out and spreads hot conv_ids across partitions.
    b_exp = b.withColumn(
        "t1",
        F.explode(
            F.array(*[F.col("t2") - F.lit(d) for d in range(window_turns + 1)])
        ),
    )
    # shuffled-hash beats sort-merge here (~30% at 2 and 8 cores pinned):
    # the pair table is consumed once, so SMJ's sorted output buys nothing
    # and its two big sorts dominate; hash build side = the exploded
    # mentions, bounded per partition by the (conv_id, turn) key spread
    pairs = a.join(b_exp.hint("shuffle_hash"), ["conv_id", "t1"]).filter(
        (
            (F.col("t1") < F.col("t2"))
            | ((F.col("t1") == F.col("t2")) & (F.col("c1") < F.col("c2")))
        )
        & (F.col("subj") != F.col("obj"))
    )
    # The distinct's grouping keys contain the pair join's keys
    # (conv_id, t1), so the join's HashPartitioning already satisfies the
    # aggregation's required distribution — the pair-grain dedup runs
    # with ZERO additional exchange (the old plan paid a full exchange of
    # the distinct triple set). The int cast happens after the dedup so
    # the t1 attribute stays recognizable to the planner (turn_idx is
    # already int, so the cast is a no-op on values).
    return (
        pairs.select(
            "conv_id",
            "t1",
            "subj",
            F.when(F.col("t1") == F.col("t2"), F.lit("co_mentioned"))
            .otherwise(F.col("pred_tail"))
            .alias("pred"),
            "obj",
        )
        .distinct()
        .select(
            "conv_id",
            F.col("t1").cast("int").alias("window_start"),
            "subj",
            "pred",
            "obj",
        )
    )


def assemble_triples_pandas(
    mentions: pd.DataFrame, turns: pd.DataFrame, window_turns: int = 2
) -> pd.DataFrame:
    """Single-process twin of ``assemble_triples`` for the golden generator.

    ``mentions`` needs columns (conv_id, turn_idx, begin_char, canonical);
    ``turns`` needs (conv_id, turn_idx, role, tool).
    """
    m = (
        mentions.dropna(subset=["canonical"])[
            ["conv_id", "turn_idx", "begin_char", "canonical"]
        ]
        .drop_duplicates()
    )
    meta = turns.set_index(["conv_id", "turn_idx"])[["role", "tool"]]
    out = []
    for conv_id, grp in m.groupby("conv_id", sort=False):
        rows = grp.sort_values(["turn_idx", "begin_char"]).to_numpy()
        # columns: conv_id, turn_idx, begin_char, canonical
        for i in range(len(rows)):
            _, t1, c1, subj = rows[i]
            for j in range(len(rows)):
                _, t2, c2, obj = rows[j]
                if t2 < t1 or t2 > t1 + window_turns:
                    continue
                if not (t1 < t2 or (t1 == t2 and c1 < c2)):
                    continue
                if subj == obj:
                    continue
                role, tool = meta.loc[(conv_id, t2)] if (conv_id, t2) in meta.index else ("", "")
                if t1 == t2:
                    pred = "co_mentioned"
                elif role == "assistant" and tool:
                    pred = f"derived_via_{tool}"
                elif role == "assistant":
                    pred = "answered_with"
                elif role == "user":
                    pred = "asked_about"
                elif role == "tool":
                    pred = "observed_with"
                else:
                    pred = "followed_by"
                out.append((conv_id, int(t1), subj, pred, obj))
    df = pd.DataFrame(
        out, columns=["conv_id", "window_start", "subj", "pred", "obj"]
    ).drop_duplicates()
    return df.reset_index(drop=True)
