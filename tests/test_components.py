"""Connected components: Spark DataFrame implementation vs union-find
(FIXTURES.md B5 shape: chains, stars, a blob, singleton pairs)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def edge_fixture():
    rng = np.random.RandomState(42)
    edges = []
    # chain 0..99
    edges += [(i, i + 1) for i in range(99)]
    # star centered at 200
    edges += [(200, 200 + i) for i in range(1, 30)]
    # dense blob on 500..559
    blob = np.arange(500, 560)
    for _ in range(300):
        a, b = rng.choice(blob, 2, replace=False)
        edges.append((int(a), int(b)))
    # isolated pairs
    edges += [(1000 + 2 * i, 1001 + 2 * i) for i in range(20)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    pdf["sim"] = 1.0
    return pdf


def test_cc_matches_union_find(spark, edge_fixture):
    from reach_banner_spark.operators.components import (
        connected_components,
        connected_components_pandas,
    )

    edges = spark.createDataFrame(edge_fixture)
    got = connected_components(edges).toPandas().sort_values("node").reset_index(drop=True)
    want = connected_components_pandas(edge_fixture)
    assert got["node"].tolist() == want["node"].tolist()
    assert got["comp"].tolist() == want["comp"].tolist()
    # structural sanity: chain collapses to min id 0, blob to 500
    comp_of = dict(zip(got["node"], got["comp"]))
    assert comp_of[99] == 0
    assert comp_of[229] == 200
    assert comp_of[559] == 500


def test_cc_is_partition_refinement(spark, edge_fixture):
    """Every edge's endpoints land in the same component (validity)."""
    from reach_banner_spark.operators.components import connected_components

    edges = spark.createDataFrame(edge_fixture)
    comp = connected_components(edges).toPandas()
    comp_of = dict(zip(comp["node"], comp["comp"]))
    for s, d in edge_fixture[["src", "dst"]].itertuples(index=False, name=None):
        assert comp_of[s] == comp_of[d]
