"""BANNER-style golden evaluation (SURVEY.md §5.2.2, BASELINE.md gates).

The reference recognizer (fixtures.reference_*: same numpy core, single
process, no Spark) defines golden mentions and triples; the Spark pipeline
must agree: exact-span mention agreement, triple-set P >= 0.95 and
R >= 0.95, per-turn text equality under stable (conv_id, turn_idx) order,
and no per-row Python anywhere in the physical plan.
"""

from __future__ import annotations

import pytest

from reach_banner_spark import schemas


@pytest.fixture(scope="module")
def spark_triples(spark, small_turns, lexicon_pdf, model_path):
    from reach_banner_spark.plans.pipeline import run_pipeline

    turns_pdf, _ = small_turns
    turns = spark.createDataFrame(turns_pdf, schema=schemas.TURNS)
    lexicon = spark.createDataFrame(lexicon_pdf, schema=schemas.LEXICON)
    df = run_pipeline(turns, lexicon, model_path, window_turns=2)
    return df


def test_mention_exact_span_agreement(spark, small_turns, model_path):
    from reach_banner_spark.fixtures import reference_mentions
    from reach_banner_spark.operators.mentions import detect_mentions, paren_balanced

    turns_pdf, _ = small_turns
    turns = spark.createDataFrame(turns_pdf, schema=schemas.TURNS)
    got = (
        detect_mentions(turns, model_path)
        .filter(paren_balanced("surface"))
        .select("conv_id", "turn_idx", "begin_char", "end_char", "surface")
        .toPandas()
    )
    want = reference_mentions(turns_pdf)[
        ["conv_id", "turn_idx", "begin_char", "end_char", "surface"]
    ]
    gs = {tuple(r) for r in got.itertuples(index=False, name=None)}
    ws = {tuple(r) for r in want.itertuples(index=False, name=None)}
    assert gs == ws, (
        f"span mismatch: {len(gs - ws)} spurious, {len(ws - gs)} missing "
        f"of {len(ws)} golden"
    )


def test_triple_set_precision_recall(spark_triples, small_turns, lexicon_pdf):
    from reach_banner_spark.fixtures import reference_triples

    turns_pdf, _ = small_turns
    golden = reference_triples(turns_pdf, lexicon_pdf)
    got = spark_triples.toPandas()
    cols = ["conv_id", "window_start", "subj", "pred", "obj"]
    gs = {tuple(r) for r in got[cols].itertuples(index=False, name=None)}
    ws = {tuple(r) for r in golden[cols].itertuples(index=False, name=None)}
    assert ws, "golden triple set empty — fixture broken"
    tp = len(gs & ws)
    precision = tp / max(1, len(gs))
    recall = tp / max(1, len(ws))
    assert precision >= 0.95, f"P={precision:.3f} ({len(gs)} got, {tp} tp)"
    assert recall >= 0.95, f"R={recall:.3f} ({len(ws)} gold, {tp} tp)"


def test_per_turn_text_equality_invariant(spark, small_turns):
    """Texts survive every shuffle bit-for-bit under stable ordering."""
    from reach_banner_spark.plans.pipeline import salt_repartition

    turns_pdf, _ = small_turns
    turns = spark.createDataFrame(turns_pdf, schema=schemas.TURNS)
    out = (
        salt_repartition(turns)
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    ref = (
        turns_pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == ref["text"].tolist()


def test_no_per_row_python_in_plan(spark_triples):
    """north_star forbids per-row Python: only Arrow nodes may appear."""
    plan = spark_triples._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in plan"


def test_entry_contract(spark):
    import __spark_entry__ as em

    df = em.entry(spark)
    assert df.schema.fieldNames() == [
        "conv_id",
        "window_start",
        "subj",
        "pred",
        "obj",
    ]
    assert df.count() > 0


def test_kg_pagerank_matches_numpy_twin(spark):
    """Distributed PageRank == single-process power iteration on the same
    entity edge list (6-decimal agreement; Spark's partition-order float
    sums differ only in late ulps)."""
    import numpy as np

    from reach_banner_spark.plans.kg_queries import (
        REGISTRY,
        _triples,
        kg_pagerank_pandas,
    )

    SF = "/root/testdata/sf0.001"
    got = (
        REGISTRY["kg_pagerank"][0](spark, SF)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    edges = _triples(spark, SF).select("subj", "obj").distinct().toPandas()
    want = kg_pagerank_pandas(edges).sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == want["node"].tolist()
    assert np.allclose(got["rank"].to_numpy(), want["rank"].to_numpy(), atol=2e-6)
    # ranks form a probability-like vector: positive, bounded by 1
    assert (got["rank"] > 0).all() and (got["rank"] < 1).all()


def test_kg_hits_matches_python_twin(spark):
    """Distributed HITS == single-process twin EXACTLY: both sides use
    sorted-fold sums, max-normalization (order-independent), and HALF_UP
    6-decimal rounding, so every score is the same IEEE op sequence —
    equality, not tolerance. Determinism re-run included."""
    from reach_banner_spark.plans.kg_queries import (
        REGISTRY,
        _triples,
        kg_hits_py,
    )

    SF = "/root/testdata/sf0.001"
    got = (
        REGISTRY["kg_hits"][0](spark, SF)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    edges = _triples(spark, SF).select("subj", "obj").distinct().toPandas()
    want = kg_hits_py(edges).sort_values("node").reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert got["node"].tolist() == want["node"].tolist()
    assert got["hub"].tolist() == want["hub"].tolist()
    assert got["auth"].tolist() == want["auth"].tolist()
    # scores normalized by max: all in [0, 1], and 1.0 is attained
    for col in ("hub", "auth"):
        assert got[col].between(0.0, 1.0).all()
        assert (got[col] == 1.0).any()
    again = (
        REGISTRY["kg_hits"][0](spark, SF)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert got.equals(again)


def test_kg_communities_matches_pandas_twin(spark):
    """Distributed synchronous LPA == single-process twin EXACTLY (same
    fixed rounds, same min-label tie-break — both deterministic, so the
    comparison is equality, not tolerance), plus the community-label
    sanity that every label is itself a node of the same conversation."""
    from reach_banner_spark.plans.kg_queries import (
        REGISTRY,
        _triples,
        lpa_pandas,
    )

    SF = "/root/testdata/sf0.001"
    got = (
        REGISTRY["kg_communities"][0](spark, SF)
        .toPandas()
        .sort_values(["conv_id", "node"])
        .reset_index(drop=True)
    )
    edges = (
        _triples(spark, SF).select("conv_id", "subj", "obj").distinct().toPandas()
    )
    want = lpa_pandas(edges).sort_values(["conv_id", "node"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert got[["conv_id", "node", "community"]].equals(
        want[["conv_id", "node", "community"]]
    )
    nodes = set(map(tuple, got[["conv_id", "node"]].values.tolist()))
    assert all(
        (c, comm) in nodes
        for c, comm in got[["conv_id", "community"]].values.tolist()
    )


def test_kg_kcore_matches_pandas_twin(spark):
    """Distributed fixed-round 2-core peel == single-process peel-to-
    fixpoint twin EXACTLY (the dictionary bounds per-conv nodes, so the
    round budget always reaches the fixpoint), plus the defining core
    property: every surviving node has >= 2 surviving-set neighbours."""
    from collections import defaultdict

    from reach_banner_spark.plans.kg_queries import (
        REGISTRY,
        _triples,
        kcore_pandas,
    )

    SF = "/root/testdata/sf0.001"
    got = (
        REGISTRY["kg_kcore"][0](spark, SF)
        .toPandas()
        .sort_values(["conv_id", "node"])
        .reset_index(drop=True)
    )
    edges = (
        _triples(spark, SF).select("conv_id", "subj", "obj").distinct().toPandas()
    )
    want = kcore_pandas(edges).sort_values(["conv_id", "node"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert got[["conv_id", "node"]].equals(want[["conv_id", "node"]])
    # minimum-degree property inside the surviving set
    surv = set(map(tuple, got[["conv_id", "node"]].values.tolist()))
    adj = defaultdict(set)
    for c, s, o in edges[edges["subj"] != edges["obj"]].values.tolist():
        if (c, s) in surv and (c, o) in surv:
            adj[(c, s)].add(o)
            adj[(c, o)].add(s)
    assert all(len(adj[v]) >= 2 for v in surv)


def test_kcore_pandas_peels_pendants():
    """Unit fixture: a triangle with a pendant chain — the chain is
    peeled (cascading), the triangle survives as the 2-core."""
    import pandas as pd

    from reach_banner_spark.plans.kg_queries import kcore_pandas

    edges = pd.DataFrame(
        {
            "conv_id": ["c"] * 5,
            "subj": ["a", "b", "c", "c", "d"],
            "obj": ["b", "c", "a", "d", "e"],
        }
    )
    got = kcore_pandas(edges)
    assert got["node"].tolist() == ["a", "b", "c"]


def test_kg_random_walks_matches_python_twin(spark):
    """Distributed derandomized walks == a from-scratch hashlib twin over
    the collected (dimension-sized) edge set — EXACT equality, including
    the hash-argmin transition at every step. Re-implements the choice
    rule independently (hashlib, not Spark md5), so an expression-level
    regression in the lambda (e.g. the HOF arity pitfall where a default
    arg binds to the array index) cannot pass both sides."""
    import hashlib

    from reach_banner_spark.plans.kg_queries import (
        REGISTRY,
        _WALK_STEPS,
        _WALKS_PER_NODE,
        _sym_edges,
        _triples_table,
    )

    SF = "/root/testdata/sf0.001"
    got = (
        REGISTRY["kg_random_walks"][0](spark, SF)
        .toPandas()
        .sort_values(["conv_id", "start", "walk_id"])
        .reset_index(drop=True)
    )
    edges = _sym_edges(_triples_table(spark, SF)).toPandas()
    adj: dict[tuple[str, str], list[str]] = {}
    for c, s, o in edges.values.tolist():
        adj.setdefault((c, s), []).append(o)

    def walk(conv: str, start: str, wid: int) -> str:
        cur, path = start, [start]
        for t in range(1, _WALK_STEPS + 1):
            cur = min(
                hashlib.md5(f"{conv}|{wid}|{t}|{n}".encode()).hexdigest()
                + "::"
                + n
                for n in adj[(conv, cur)]
            )[34:]
            path.append(cur)
        return " ".join(path)

    assert len(got) == len(adj) * _WALKS_PER_NODE > 0
    for conv, start, wid, w in got[
        ["conv_id", "start", "walk_id", "walk"]
    ].values.tolist():
        assert w == walk(conv, start, wid), (conv, start, wid)
    # the two walks per node genuinely diverge somewhere (hash scrambling
    # works): at least one start node's walk_id-0 and walk_id-1 paths differ
    by_node = got.groupby(["conv_id", "start"])["walk"].nunique()
    assert (by_node > 1).any()


def test_sink_nquads_roundtrip(spark):
    """The partitioned text sink lands exactly the export's line set and
    a second invocation survives the work-dir sweep (determinism +
    ADVICE-r4 localCheckpoint rule)."""
    from reach_banner_spark.plans.kg_queries import REGISTRY

    SF = "/root/testdata/sf0.001"
    exported = sorted(
        r["nquad"]
        for r in REGISTRY["kg_export_nquads"][0](spark, SF).collect()
    )
    landed = sorted(
        r["nquad"] for r in REGISTRY["sink_nquads_text"][0](spark, SF).collect()
    )
    assert landed == exported and len(landed) > 0
    again = sorted(
        r["nquad"] for r in REGISTRY["sink_nquads_text"][0](spark, SF).collect()
    )
    assert again == landed


def test_kg_betweenness_matches_pair_sum_twin(spark):
    """Distributed grouped-map Brandes == the independent pair-sum
    formulation within 1e-9 (different float add order — per-pair
    quotients vs back-propagated deltas), plus the structural sanity
    that leaf nodes (degree 1) have zero betweenness, and a bit-exact
    determinism re-run (sorted iteration fixes the accumulation
    order)."""
    import numpy as np

    from reach_banner_spark.plans.kg_queries import (
        REGISTRY,
        _triples,
        betweenness_pairs_py,
    )

    SF = "/root/testdata/sf0.001"
    got = (
        REGISTRY["kg_betweenness"][0](spark, SF)
        .toPandas()
        .sort_values(["conv_id", "node"])
        .reset_index(drop=True)
    )
    edges = (
        _triples(spark, SF).select("conv_id", "subj", "obj").distinct().toPandas()
    )
    want = (
        betweenness_pairs_py(edges)
        .sort_values(["conv_id", "node"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert got[["conv_id", "node"]].equals(want[["conv_id", "node"]])
    assert np.allclose(
        got["betweenness"], want["betweenness"], atol=1e-9, rtol=0
    )
    # degree-1 nodes broker nothing
    deg = {}
    for c, s, o in edges[edges.subj != edges.obj][
        ["conv_id", "subj", "obj"]
    ].itertuples(index=False):
        deg[(c, s)] = deg.get((c, s), set()) | {o}
        deg[(c, o)] = deg.get((c, o), set()) | {s}
    leaves = got[
        [len(deg[(c, n)]) == 1 for c, n in zip(got.conv_id, got.node)]
    ]
    assert (leaves.betweenness == 0.0).all()

    again = (
        REGISTRY["kg_betweenness"][0](spark, SF)
        .toPandas()
        .sort_values(["conv_id", "node"])
        .reset_index(drop=True)
    )
    assert got.equals(again)


def test_tarjan_bridges_unit():
    """Handcrafted graphs: two triangles joined by one edge (exactly
    that edge), a path (every edge), a cycle (none)."""
    from reach_banner_spark.plans.kg_queries import _tarjan_bridges

    def build(edges):
        adj = {}
        for x, y in edges:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        nodes = sorted(adj)
        return nodes, {v: sorted(adj[v]) for v in nodes}

    two_tri = [("a", "b"), ("b", "c"), ("a", "c"),
               ("c", "d"), ("d", "e"), ("e", "f"), ("d", "f")]
    assert _tarjan_bridges(*build(two_tri)) == [("c", "d")]
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    assert sorted(_tarjan_bridges(*build(path))) == path
    cycle = [("a", "b"), ("b", "c"), ("c", "a")]
    assert _tarjan_bridges(*build(cycle)) == []


def test_kg_bridges_matches_removal_twin(spark):
    """Tarjan kernel == the DEFINITIONAL remove-edge-and-BFS twin over
    the strong backbone (the DuckDB oracle is a third, recursive-CTE
    formulation), plus an exact determinism re-run."""
    from collections import deque

    from reach_banner_spark.plans.kg_queries import (
        REGISTRY,
        _strong_canon_edges,
        _triples_table,
    )

    SF = "/root/testdata/sf0.001"
    got = REGISTRY["kg_bridges"][0](spark, SF).toPandas()
    strong = _strong_canon_edges(_triples_table(spark, SF)).toPandas()
    want = set()
    for conv, grp in strong.groupby("conv_id"):
        edges = [(a, b) for a, b in zip(grp.a, grp.b) if a != b]
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for a, b in edges:
            seen = {a}
            q = deque([a])
            while q:
                v = q.popleft()
                for w in adj[v]:
                    if (min(v, w), max(v, w)) == (a, b):
                        continue
                    if w not in seen:
                        seen.add(w)
                        q.append(w)
            if b not in seen:
                want.add((conv, a, b))
    gset = set(map(tuple, got[["conv_id", "a", "b"]].values.tolist()))
    assert gset == want
    assert len(want) > 0
    again = REGISTRY["kg_bridges"][0](spark, SF).toPandas()
    assert set(map(tuple, again[["conv_id", "a", "b"]].values.tolist())) == gset


def test_kg_closeness_consistent_with_diameter(spark):
    """Cross-key invariant: the sum of n_reach over a conversation's
    entities equals kg_diameter's ordered reachable-pair count on the
    same backbone (both read the shared all-pairs BFS), and the %.6f
    closeness re-derives from the exact integers (Decimal HALF_UP)."""
    from decimal import ROUND_HALF_UP, Decimal

    from reach_banner_spark.plans.kg_queries import REGISTRY

    SF = "/root/testdata/sf0.001"
    clo = REGISTRY["kg_closeness"][0](spark, SF).toPandas()
    dia = REGISTRY["kg_diameter"][0](spark, SF).toPandas()
    assert len(clo) > 0 and len(dia) > 0
    per_conv = clo.groupby("conv_id").n_reach.sum()
    for r in dia.itertuples():
        assert per_conv.get(r.conv_id, 0) == r.n_pairs, r
    for r in clo.itertuples():
        want = Decimal(repr(r.n_reach / r.total_dist)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
        assert r.closeness == f"{want:.6f}", r


def test_tarjan_articulation_unit():
    """Handcrafted graphs: two triangles joined by an edge (both its
    endpoints), two triangles SHARING a vertex (that vertex — a cut
    vertex with zero bridges), a path (interior node), a cycle (none)."""
    from reach_banner_spark.plans.kg_queries import _tarjan_cuts

    def build(edges):
        adj = {}
        for x, y in edges:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        nodes = sorted(adj)
        return nodes, {v: sorted(adj[v]) for v in nodes}

    two_tri = [("a", "b"), ("b", "c"), ("a", "c"),
               ("c", "d"), ("d", "e"), ("e", "f"), ("d", "f")]
    br, ar = _tarjan_cuts(*build(two_tri))
    assert br == [("c", "d")] and ar == ["c", "d"]
    shared_v = [("a", "b"), ("b", "c"), ("a", "c"),
                ("c", "d"), ("d", "e"), ("e", "c")]
    br, ar = _tarjan_cuts(*build(shared_v))
    assert br == [] and ar == ["c"]
    br, ar = _tarjan_cuts(*build([("a", "b"), ("b", "c")]))
    assert sorted(br) == [("a", "b"), ("b", "c")] and ar == ["b"]
    br, ar = _tarjan_cuts(*build([("a", "b"), ("b", "c"), ("c", "a")]))
    assert br == [] and ar == []


def test_kg_articulation_matches_removal_twin(spark):
    """Tarjan kernel == the DEFINITIONAL remove-node component-count
    twin (components via BFS before and after deleting each node; the
    DuckDB oracle is a third, min-label recursive-CTE formulation),
    plus an exact determinism re-run."""
    from collections import deque

    from reach_banner_spark.plans.kg_queries import (
        REGISTRY,
        _strong_canon_edges,
        _triples_table,
    )

    SF = "/root/testdata/sf0.001"
    got = REGISTRY["kg_articulation"][0](spark, SF).toPandas()
    strong = _strong_canon_edges(_triples_table(spark, SF)).toPandas()

    def n_comps(nodes, adj, excl=None):
        seen, c = set(), 0
        for s in nodes:
            if s == excl or s in seen:
                continue
            c += 1
            q = deque([s])
            seen.add(s)
            while q:
                v = q.popleft()
                for w in adj.get(v, ()):
                    if w != excl and w not in seen:
                        seen.add(w)
                        q.append(w)
        return c

    want = set()
    for conv, grp in strong.groupby("conv_id"):
        adj: dict = {}
        nodes = set()
        for a, b in zip(grp.a, grp.b):
            nodes.update((a, b))
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        base = n_comps(sorted(nodes), adj)
        for v in sorted(nodes):
            if n_comps(sorted(nodes), adj, excl=v) > base:
                want.add((conv, v))
    gset = set(map(tuple, got[["conv_id", "entity"]].values.tolist()))
    assert gset == want
    assert len(want) > 0
    again = REGISTRY["kg_articulation"][0](spark, SF).toPandas()
    assert set(map(tuple, again.values.tolist())) == gset


def test_kg_components_consistent_with_closeness(spark):
    """Cross-key invariant over the shared all-pairs table: an entity's
    reachable count equals its component size minus one (BFS complete
    within the hop bound), entities absent from kg_closeness
    (self-loop-only) are singleton components, and component labels are
    the component's own minimum entity."""
    from reach_banner_spark.plans.kg_queries import REGISTRY

    SF = "/root/testdata/sf0.001"
    comp = REGISTRY["kg_components"][0](spark, SF).toPandas()
    clo = REGISTRY["kg_closeness"][0](spark, SF).toPandas()
    assert len(comp) > 0
    merged = comp.merge(clo, on=["conv_id", "entity"], how="left")
    present = merged[~merged.n_reach.isna()]
    assert len(present) > 0
    assert (present.n_reach == present.comp_size - 1).all()
    absent = merged[merged.n_reach.isna()]
    assert (absent.comp_size == 1).all()
    # label is the component's minimum member
    mins = comp.groupby(["conv_id", "comp_label"]).entity.min()
    for (conv, lbl), m in mins.items():
        assert lbl == m, (conv, lbl, m)


def test_kg_mst_matches_prim_twin(spark):
    """Kruskal kernel == an independent Prim construction per component
    (under the (support DESC, a, b) total order the maximum spanning
    forest is UNIQUE, so two different algorithms must emit the same
    edge set), plus the forest invariant |edges| == |nodes| -
    |components| against kg_components, and a determinism re-run."""
    from reach_banner_spark.plans.kg_queries import (
        REGISTRY,
        _strong_canon_edges,
        _triples_table,
    )

    SF = "/root/testdata/sf0.001"
    got = REGISTRY["kg_mst"][0](spark, SF).toPandas()
    strong = _strong_canon_edges(_triples_table(spark, SF)).toPandas()
    comp = REGISTRY["kg_components"][0](spark, SF).toPandas()
    assert len(got) > 0

    want = set()
    for conv, grp in strong.groupby("conv_id"):
        edges = [
            (int(n), a, b)
            for a, b, n in zip(grp.a, grp.b, grp.n)
            if a != b
        ]
        adj: dict = {}
        nodes = set()
        for n, a, b in edges:
            nodes.update((a, b))
            adj.setdefault(a, []).append((n, a, b))
            adj.setdefault(b, []).append((n, a, b))
        visited = set()
        for start in sorted(nodes):
            if start in visited:
                continue
            tree = {start}
            visited.add(start)
            while True:
                crossing = [
                    e
                    for v in tree
                    for e in adj[v]
                    if (e[1] in tree) != (e[2] in tree)
                ]
                if not crossing:
                    break
                n, a, b = min(crossing, key=lambda t: (-t[0], t[1], t[2]))
                want.add((conv, a, b, n))
                new = b if a in tree else a
                tree.add(new)
                visited.add(new)
    gset = set(map(tuple, got[["conv_id", "a", "b", "w"]].values.tolist()))
    assert gset == want
    # forest invariant per conversation: edges = nodes - components,
    # counting only non-singleton structure (mst nodes = edge endpoints)
    for conv, grp in comp.groupby("conv_id"):
        nonsingle = grp[grp.comp_size > 1]
        n_edges = len(got[got.conv_id == conv])
        assert n_edges == len(nonsingle) - nonsingle.comp_label.nunique()
    again = REGISTRY["kg_mst"][0](spark, SF).toPandas()
    assert set(map(tuple, again[["conv_id", "a", "b", "w"]].values.tolist())) == gset


def test_kg_conv_similarity_reconciles(spark):
    """Pair Jaccards re-derive from per-conversation entity sets built
    off the raw triples (intersection/size integers exact, ratio via
    Decimal-HALF_UP), and every pair sharing an entity is present."""
    from decimal import ROUND_HALF_UP, Decimal

    from reach_banner_spark.plans.kg_queries import (
        REGISTRY,
        _triples_table,
    )

    SF = "/root/testdata/sf0.001"
    got = REGISTRY["kg_conv_similarity"][0](spark, SF).toPandas()
    t = _triples_table(spark, SF).toPandas()
    ents: dict = {}
    for conv, s, o in zip(t.conv_id, t.subj, t.obj):
        ents.setdefault(conv, set()).update((s, o))
    convs = sorted(ents)
    want = {}
    for i, ca in enumerate(convs):
        for cb in convs[i + 1:]:
            inter = len(ents[ca] & ents[cb])
            if inter:
                want[(ca, cb)] = (inter, len(ents[ca]), len(ents[cb]))
    assert len(got) == len(want) > 0
    for r in got.itertuples():
        inter, na, nb = want[(r.ca, r.cb)]
        assert (r.inter, r.na, r.nb) == (inter, na, nb)
        exp = Decimal(repr(float(inter) / (na + nb - inter))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
        assert r.jaccard == f"{exp:.6f}", r


def test_macro_graph_health_cross_key_consistency(spark):
    """The macro's columns reconcile against the per-key outputs it
    composes: n_nodes/diameter vs kg_diameter, n_comps vs
    kg_components' distinct labels, n_bridges vs kg_bridges' rows."""
    from reach_banner_spark.plans.kg_queries import REGISTRY

    SF = "/root/testdata/sf0.001"
    mac = (
        REGISTRY["macro_graph_health"][0](spark, SF)
        .toPandas()
        .set_index("conv_id")
    )
    dia = REGISTRY["kg_diameter"][0](spark, SF).toPandas().set_index("conv_id")
    comp = REGISTRY["kg_components"][0](spark, SF).toPandas()
    br = REGISTRY["kg_bridges"][0](spark, SF).toPandas()
    assert len(mac) == len(dia) > 0
    for conv, row in mac.iterrows():
        assert row.n_nodes == dia.loc[conv].n_nodes
        assert row.diameter == dia.loc[conv].diameter
        sub = comp[comp.conv_id == conv]
        assert row.n_comps == sub.comp_label.nunique()
        assert row.n_bridges == len(br[br.conv_id == conv])


def test_kg_edge_betweenness_matches_pair_sum_twin(spark):
    """Distributed grouped-map edge Brandes == the independent
    per-pair path-fraction formulation within 1e-9, plus the exact
    invariant sum_e ebc(e) == sum over reachable unordered pairs of
    d(s, t) (each pair spreads exactly d edges' worth of weight), and
    a bit-exact determinism re-run."""
    import numpy as np

    from reach_banner_spark.plans.kg_queries import (
        REGISTRY,
        _triples,
        edge_betweenness_pairs_py,
    )

    SF = "/root/testdata/sf0.001"
    got = (
        REGISTRY["kg_edge_betweenness"][0](spark, SF)
        .toPandas()
        .sort_values(["conv_id", "ent_a", "ent_b"])
        .reset_index(drop=True)
    )
    edges = (
        _triples(spark, SF)
        .select("conv_id", "subj", "obj")
        .distinct()
        .toPandas()
    )
    want = (
        edge_betweenness_pairs_py(edges)
        .sort_values(["conv_id", "ent_a", "ent_b"])
        .reset_index(drop=True)
    )
    # Brandes only emits edges that carried weight; the twin emits all
    # edges — join on the twin's key set and require zero-weight
    # agreement for the rest
    m = want.merge(
        got, on=["conv_id", "ent_a", "ent_b"], how="left", suffixes=("_w", "_g")
    )
    m["edge_betweenness_g"] = m["edge_betweenness_g"].fillna(0.0)
    assert len(m) == len(want) > 0
    assert np.allclose(
        m["edge_betweenness_g"], m["edge_betweenness_w"], atol=1e-9, rtol=0
    )
    # exact invariant: total edge weight == sum of pairwise distances
    from collections import deque

    total_d = 0.0
    e = edges[edges.subj != edges.obj]
    for conv, grp in e.groupby("conv_id"):
        adj = {}
        for s, o in zip(grp["subj"], grp["obj"]):
            adj.setdefault(s, set()).add(o)
            adj.setdefault(o, set()).add(s)
        nodes = sorted(adj)
        for i, s in enumerate(nodes):
            dist = {s: 0}
            q = deque([s])
            while q:
                v = q.popleft()
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        q.append(w)
            for t in nodes[i + 1 :]:
                total_d += dist.get(t, 0)
    assert abs(got["edge_betweenness"].sum() - total_d) < 1e-6

    again = (
        REGISTRY["kg_edge_betweenness"][0](spark, SF)
        .toPandas()
        .sort_values(["conv_id", "ent_a", "ent_b"])
        .reset_index(drop=True)
    )
    assert again.equals(got)
