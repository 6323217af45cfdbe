"""Pure-python property tests for the single-process twins (no Spark):
the twins gate the ∅-oracle keys, so their own invariants deserve
independent coverage beyond the fixture-corpus equality pins."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


def _edges_strategy():
    """Random small multi-conv edge lists over a tiny entity domain."""
    ent = st.sampled_from(["a", "b", "c", "d", "e", "f"])
    edge = st.tuples(st.sampled_from(["c0", "c1"]), ent, ent)
    return st.lists(edge, min_size=1, max_size=30)


@settings(max_examples=60, deadline=None)
@given(_edges_strategy())
def test_lpa_pandas_invariants(rows):
    from reach_banner_spark.plans.kg_queries import lpa_pandas

    edges = pd.DataFrame(rows, columns=["conv_id", "subj", "obj"])
    out = lpa_pandas(edges)
    out2 = lpa_pandas(edges)
    # deterministic
    assert out.equals(out2)
    e = edges[edges["subj"] != edges["obj"]]
    for conv, grp in e.groupby("conv_id"):
        nodes = set(grp["subj"]) | set(grp["obj"])
        sub = out[out["conv_id"] == conv]
        # exactly the conversation's connected nodes, each labelled once
        assert set(sub["node"]) == nodes
        assert len(sub) == len(nodes)
        # labels never escape the conversation's node set (labels
        # originate as node ids and only propagate along edges)
        assert set(sub["community"]) <= nodes
    if e.empty:
        assert out.empty


@settings(max_examples=60, deadline=None)
@given(_edges_strategy())
def test_pagerank_pandas_invariants(rows):
    import numpy as np

    from reach_banner_spark.plans.kg_queries import kg_pagerank_pandas

    edges = pd.DataFrame(rows, columns=["subj", "obj", "ignore"])[
        ["subj", "obj"]
    ]
    out = kg_pagerank_pandas(edges)
    assert out.equals(kg_pagerank_pandas(edges))
    if len(out):
        r = out["rank"].to_numpy()
        assert (r > 0).all()
        # dangling mass is NOT redistributed (documented simplification),
        # so total mass never exceeds 1 but can fall below it
        assert r.sum() <= 1.0 + 1e-9


def test_lpa_pandas_two_cliques_converge_to_two_communities():
    from reach_banner_spark.plans.kg_queries import lpa_pandas

    rows = [
        ("c0", "a", "b"), ("c0", "b", "c"), ("c0", "a", "c"),  # clique 1
        ("c0", "d", "e"), ("c0", "e", "f"), ("c0", "d", "f"),  # clique 2
    ]
    out = lpa_pandas(pd.DataFrame(rows, columns=["conv_id", "subj", "obj"]))
    comm = dict(zip(out["node"], out["community"]))
    assert comm["a"] == comm["b"] == comm["c"] == "a"
    assert comm["d"] == comm["e"] == comm["f"] == "d"
