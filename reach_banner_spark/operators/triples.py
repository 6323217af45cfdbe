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


def _pred_expr(role_col, tool_col):
    return (
        F.when(F.col("same_turn"), F.lit("co_mentioned"))
        .when(
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
    m = (
        linked_mentions.filter(F.col("canonical").isNotNull())
        .select("conv_id", "turn_idx", "begin_char", "canonical")
        .distinct()
    )
    mb = m if obj_mentions is None else (
        obj_mentions.filter(F.col("canonical").isNotNull())
        .select("conv_id", "turn_idx", "begin_char", "canonical")
        .distinct()
    )
    turn_meta = turns.select("conv_id", "turn_idx", "role", "tool")

    a = m.select(
        "conv_id",
        F.col("turn_idx").alias("t1"),
        F.col("begin_char").alias("c1"),
        F.col("canonical").alias("subj"),
    )
    b = mb.select(
        "conv_id",
        F.col("turn_idx").alias("t2"),
        F.col("begin_char").alias("c2"),
        F.col("canonical").alias("obj"),
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
    pairs = pairs.withColumn("same_turn", F.col("t1") == F.col("t2"))
    # turns is the 10^12-row fact table — never broadcastable; pin a
    # shuffle-side path so size misestimates can't pull it through the
    # driver (shuffled-hash: no sort of the large pair table)
    pairs = pairs.join(
        turn_meta.withColumnRenamed("turn_idx", "t2").hint("shuffle_hash"),
        ["conv_id", "t2"],
        "left",
    )
    return (
        pairs.select(
            "conv_id",
            F.col("t1").cast("int").alias("window_start"),
            "subj",
            _pred_expr(F.col("role"), F.col("tool")).alias("pred"),
            "obj",
        )
        .distinct()
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
