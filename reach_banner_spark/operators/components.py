"""Connected components over similarity edges, in pure DataFrame ops (G3).

The graft spec calls for GraphFrames connected components, but the sandbox
has no GraphFrames jar (SURVEY.md §0.1), so the engine hand-rolls min-label
propagation with pointer jumping:

    comp(v) <- min( comp(v), min_{u in N(v)} comp(u), comp(comp(v)) )

iterated to fixpoint. The neighbor step propagates along edges; the
pointer-jumping step (comp of comp) compresses paths, so chains converge in
O(log n) rounds instead of O(diameter). Each round ends with
``localCheckpoint()`` to truncate the exponentially-growing lineage
(SURVEY.md §4.3) — at cluster scale this would be a reliable ``checkpoint()``
to HDFS instead.

Oracle: DuckDB recursive CTE on the small fixture (queries key
``connected_components``); pytest also checks against a union-find twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 50, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """edges(src,dst) -> DataFrame(node:long, comp:long) with comp = min
    node id of the component. Isolated appearance order does not matter."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for it in range(max_iter):
        nb = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("comp").alias("nb_comp"))
        )
        stepped = (
            labels.join(nb, labels["node"] == nb["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nb_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # pointer jumping: comp <- min(comp, comp(comp))
        l2 = stepped.select(
            F.col("node").alias("pnode"), F.col("comp").alias("pcomp")
        )
        jumped = (
            stepped.join(l2, stepped["comp"] == l2["pnode"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("pcomp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        # epoch-batched fixpoint probe (VERDICT r3): the limit(1).count()
        # convergence check is a driver barrier per round; with pointer
        # jumping the round count is already O(log n), so probing every
        # SECOND round halves the barriers for at most one extra (cheap,
        # already-converged) iteration. Comparing jumped vs the previous
        # round's labels is still a sound fixpoint test: if the latest
        # single round changed nothing, the iteration is at its fixpoint.
        if it % 2 == 1 or it == max_iter - 1:
            changed = (
                jumped.alias("a")
                .join(labels.alias("b"), "node")
                .filter(F.col("a.comp") != F.col("b.comp"))
                .limit(1)
                .count()
            )
            if changed == 0:
                labels = jumped
                break
        labels = jumped
    return labels


def connected_components_pandas(edges: pd.DataFrame) -> pd.DataFrame:
    """Union-find twin for goldens/tests: DataFrame(node, comp)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for s, d in zip(edges["src"].to_numpy(), edges["dst"].to_numpy()):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            # union by min id so comp == min node id
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    nodes = sorted(parent.keys())
    return pd.DataFrame(
        {"node": np.array(nodes, dtype=np.int64),
         "comp": np.array([find(n) for n in nodes], dtype=np.int64)}
    )
