"""Tolerance / property checks for ∅-oracle and approximate operators."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_agg_approx_within_rsd(spark):
    from reach_banner_spark.plans.relational import REGISTRY

    got = REGISTRY["agg_approx"][0](spark, SF).collect()[0]["approx_cust"]
    exact = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    # rsd=0.02; allow 5 sigma
    assert abs(got - exact) <= max(5, 0.10 * exact), (got, exact)


def test_sort_within_partitions_ordered(spark):
    """Rows inside each partition are ordered by (source, doc_id)."""
    from reach_banner_spark.plans.kg_queries import REGISTRY

    df = REGISTRY["sort_within_partitions"][0](spark, SF)
    parts = df.rdd.glom().collect()
    for part in parts:
        keys = [(r["source"], r["doc_id"]) for r in part]
        assert keys == sorted(keys)


def test_cc_property_random_graphs(spark):
    """Property check: Spark CC == union-find on random seeded graphs."""
    from reach_banner_spark.operators.components import (
        connected_components,
        connected_components_pandas,
    )

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        n_nodes = 120
        edges = pd.DataFrame(
            {
                "src": rng.randint(0, n_nodes, 150).astype("int64"),
                "dst": rng.randint(0, n_nodes, 150).astype("int64"),
            }
        )
        edges = edges[edges["src"] != edges["dst"]].reset_index(drop=True)
        got = (
            connected_components(spark.createDataFrame(edges))
            .toPandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        want = connected_components_pandas(edges)
        assert got["node"].tolist() == want["node"].tolist(), seed
        assert got["comp"].tolist() == want["comp"].tolist(), seed


def test_minhash_estimates_jaccard():
    """MinHash signature agreement approximates true Jaccard (property)."""
    from reach_banner_spark.functions.hashing import minhash_signatures
    from reach_banner_spark.operators.linking import char3_shingle_ids

    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox leaps over the lazy cat"
    sa, sb = char3_shingle_ids(pd.Series([a, b]))
    true_j = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
    sigs = minhash_signatures([sa, sb], num_hashes=256)
    est = (sigs[0] == sigs[1]).mean()
    assert abs(est - true_j) < 0.15, (est, true_j)
