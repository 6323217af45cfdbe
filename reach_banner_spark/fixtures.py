"""Deterministic fixtures + the single-process reference recognizer.

Mirrors the reference's evaluation design (SURVEY.md §5): BANNER's
correctness story is golden-corpus evaluation (BioCreative-II GM harness,
``banner.eval.BC2GeneMentionTest`` [P]) rather than unit tests. Here, a
seeded synthetic transcript corpus with planted entity surfaces plays the
role of BC2GM, and the *reference recognizer* — the exact same numpy batch
core as the Spark pipeline, invoked single-process with no Spark — plays the
role of the reference BANNER binary (which is absent from this sandbox,
SURVEY.md §0). Golden mentions/triples are generated once per session from
seed 42; the trained CRF weights are committed at
``reach_banner_spark/resources/model.npz`` so Viterbi output is bit-stable.

Everything is derived from seed=42; no wall-clock, no external data.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from .operators.components import connected_components_pandas
from .operators.crf import CrfModel, train_perceptron
from .operators.features import featurize_flat
from .operators.linking import entity_edges_pandas, link_surfaces_pandas
from .operators.mentions import paren_balanced_py, recognize_batch
from .operators.tokenizer import tokenize_batch
from .operators.triples import assemble_triples_pandas

SEED = 42
MODEL_PATH = os.path.join(os.path.dirname(__file__), "resources", "model.npz")
MODEL2_PATH = os.path.join(os.path.dirname(__file__), "resources", "model2.npz")

_FILLERS = (
    "the quick analysis shows that expression levels were observed in sample "
    "cells during treatment and the results indicate a strong response to the "
    "protein pathway while binding activity remains stable across conditions "
    "we report measured values for each group under control settings with "
    "significant changes noted in tissue samples after incubation this study "
    "examines regulation patterns found within human subjects over time"
).split()

_PREFIXES = [
    "TP", "BRCA", "IL", "KRAS", "EGFR", "MYC", "CDK", "FOX", "STAT", "RAS",
    "ABL", "HER",
]
_GREEK = ["alpha", "beta", "gamma"]


def make_lexicon() -> pd.DataFrame:
    """~500-row lexicon: 60 base entities x case/hyphen/suffix variants,
    plus deliberate near-duplicate entities (same gene registered twice with
    different ids) so canonicalization has real work to do."""
    rows = []
    eid = 1000
    rng = np.random.RandomState(SEED)
    for pfx in _PREFIXES:
        for num in range(1, 6):
            canonical = f"{pfx}{num}"
            aliases = {
                canonical,
                canonical.lower(),
                f"{pfx}-{num}",
                f"{canonical} gene",
            }
            if rng.rand() < 0.3:
                aliases.add(f"{canonical} {_GREEK[num % 3]}")
            for alias in sorted(aliases):
                rows.append((alias, canonical, eid, "GENE"))
            eid += 1
    # near-duplicate entities: hyphenated canonical registered under a new id
    dup_targets = [f"{p}{n}" for p in _PREFIXES[:6] for n in (1, 2)]
    for canonical in dup_targets:
        pfx, num = canonical[:-1], canonical[-1]
        dup_can = f"{pfx}-{num}"
        rows.append((dup_can, dup_can, eid, "GENE"))
        rows.append((dup_can.lower(), dup_can, eid, "GENE"))
        eid += 1
    return pd.DataFrame(rows, columns=["alias", "canonical", "entity_id", "entity_type"])


def make_turns(
    n_convs: int = 200,
    skew_conv_turns: int = 1000,
    seed: int = SEED,
    lexicon: pd.DataFrame | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Synthetic transcript corpus (FIXTURES.md B1).

    Returns (turns, gold_spans): turns has the exact input_hint schema;
    gold_spans has (conv_id, turn_idx, begin_char, end_char, surface) for
    every planted entity surface — used ONLY to train the fixture model,
    never as the evaluation golden (that comes from the reference
    recognizer itself, like BANNER's own output defines the parity target).
    """
    if lexicon is None:
        lexicon = make_lexicon()
    aliases = lexicon["alias"].to_numpy()
    rng = np.random.RandomState(seed)
    roles = np.array(["user", "assistant", "system", "tool"])
    tools = np.array(["", "search", "python", "browser"])
    base_ts = datetime(2025, 1, 1)

    t_rows = []
    g_rows = []
    for ci in range(n_convs):
        conv_id = f"conv_{ci:05d}"
        n_turns = skew_conv_turns if ci == 0 else int(rng.randint(3, 41))
        for ti in range(n_turns):
            role = roles[ti % 4] if ci % 3 == 0 else roles[rng.randint(0, 4)]
            tool = tools[rng.randint(0, 4)] if role in ("assistant", "tool") else ""
            n_words = int(rng.randint(5, 26))
            words = list(rng.choice(_FILLERS, size=n_words))
            spans = []
            if rng.rand() < 0.55:
                n_ents = int(rng.randint(1, 4))
                for _ in range(n_ents):
                    alias = str(aliases[rng.randint(0, len(aliases))])
                    pos = int(rng.randint(0, len(words) + 1))
                    words.insert(pos, "\x00" + alias)  # marker, resolved below
            # occasionally plant an unbalanced-paren trap the paren filter drops
            text_parts = []
            cursor = 0
            for w in words:
                if text_parts:
                    cursor += 1  # the joining space
                if w.startswith("\x00"):
                    alias = w[1:]
                    spans.append((cursor, cursor + len(alias), alias))
                    text_parts.append(alias)
                    cursor += len(alias)
                else:
                    text_parts.append(w)
                    cursor += len(w)
            text = " ".join(text_parts)
            ts = base_ts + timedelta(minutes=ci * 7, seconds=ti * 13)
            t_rows.append((conv_id, ti, role, text, tool, ts))
            for b, e, s in spans:
                g_rows.append((conv_id, ti, b, e, s))
    turns = pd.DataFrame(
        t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    turns["turn_idx"] = turns["turn_idx"].astype("int32")
    gold = pd.DataFrame(
        g_rows, columns=["conv_id", "turn_idx", "begin_char", "end_char", "surface"]
    )
    return turns, gold


def _training_arrays(turns: pd.DataFrame, gold: pd.DataFrame):
    """Tokenize + IOB-label the planted spans -> perceptron training arrays."""
    toks, starts, ends = tokenize_batch(turns["text"], fine=True)
    seq_lens = np.fromiter((len(t) for t in toks), count=len(toks), dtype=np.int64)
    flat_toks = np.array([t for ts in toks for t in ts], dtype=object)
    seq_ids = np.repeat(np.arange(len(toks)), seq_lens)
    feat_idx = featurize_flat(flat_toks, seq_ids)
    labels = np.zeros(len(flat_toks), dtype=np.int8)
    offsets = np.concatenate(([0], np.cumsum(seq_lens)))
    key_to_row = {
        (c, int(t)): i
        for i, (c, t) in enumerate(zip(turns["conv_id"], turns["turn_idx"]))
    }
    for c, t, b, e, _s in gold.itertuples(index=False):
        row = key_to_row[(c, int(t))]
        ss, ee = starts[row], ends[row]
        in_span = np.flatnonzero((ss >= b) & (ee <= e))
        if len(in_span) == 0:
            continue
        base = offsets[row]
        labels[base + in_span[0]] = 1  # B
        labels[base + in_span[1:]] = 2  # I
    return feat_idx, labels, seq_lens


def train_fixture_model(epochs: int = 8) -> CrfModel:
    """Train the committed fixture model on a small deterministic corpus."""
    lex = make_lexicon()
    turns, gold = make_turns(n_convs=60, skew_conv_turns=60, lexicon=lex)
    feat_idx, labels, seq_lens = _training_arrays(turns, gold)
    return train_perceptron(feat_idx, labels, seq_lens, epochs=epochs, seed=SEED)


def train_fixture_model2(epochs: int = 8):
    """Order-2 twin of ``train_fixture_model`` (the reference's published
    best config [K PSB-2008]) — same corpus, pair-state perceptron."""
    from .operators.crf import train_perceptron2

    lex = make_lexicon()
    turns, gold = make_turns(n_convs=60, skew_conv_turns=60, lexicon=lex)
    feat_idx, labels, seq_lens = _training_arrays(turns, gold)
    return train_perceptron2(
        feat_idx, labels, seq_lens, epochs=epochs, seed=SEED
    )


def ensure_model2(path: str = MODEL2_PATH) -> str:
    """Order-2 counterpart of ``ensure_model`` (resources/model2.npz)."""
    return _ensure_model_file(
        path, "model2.npz", "rbs_model2_cache.npz", train_fixture_model2
    )


def _ensure_model_file(path: str, resource_name: str, cache_name: str, train_fn) -> str:
    """Shared model-file resolution: (1) the committed .npz on disk;
    (2) a /tmp cache; (3) extraction from the package via
    importlib.resources — needed when the package ships as a
    ``spark-submit --py-files`` zip; (4) deterministic retraining."""
    if os.path.exists(path):
        return path
    cache = os.path.join("/tmp", cache_name)
    if os.path.exists(cache):
        return cache
    try:
        from importlib import resources

        ref = resources.files("reach_banner_spark") / "resources" / resource_name
        data = ref.read_bytes()
        with open(cache, "wb") as f:
            f.write(data)
        return cache
    except Exception:
        pass
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        train_fn().save_npz(path)
        return path
    except OSError:
        train_fn().save_npz(cache)
        return cache


def ensure_model(path: str = MODEL_PATH) -> str:
    """Return a readable filesystem path to the order-1 fixture model."""
    return _ensure_model_file(
        path, "model.npz", "rbs_model_cache.npz", train_fixture_model
    )


def reference_mentions(turns: pd.DataFrame, model: CrfModel | None = None) -> pd.DataFrame:
    """THE reference recognizer: single-process, chunked recognize_batch +
    parenthesis filter — defines golden mentions (BANNER-output analogue)."""
    if model is None:
        model = CrfModel.load_npz(ensure_model())
    outs = []
    for lo in range(0, len(turns), 2000):
        outs.append(recognize_batch(turns.iloc[lo : lo + 2000], model))
    m = pd.concat(outs, ignore_index=True) if outs else recognize_batch(turns, model)
    keep = m["surface"].map(paren_balanced_py)
    return m[keep].reset_index(drop=True)


def reference_triples(
    turns: pd.DataFrame,
    lexicon: pd.DataFrame | None = None,
    model: CrfModel | None = None,
    window_turns: int = 2,
) -> pd.DataFrame:
    """Golden triples: reference mentions -> link -> canonicalize (union-find
    over entity similarity edges) -> window triple assembly, all in pandas."""
    if lexicon is None:
        lexicon = make_lexicon()
    mentions = reference_mentions(turns, model)
    links = link_surfaces_pandas(mentions["surface"].to_numpy(), lexicon)
    mentions = mentions.assign(surface_key=mentions["surface"].str.lower()).merge(
        links, on="surface_key", how="left"
    )
    # canonicalization: entity_id -> component min id -> that id's canonical
    edges = entity_edges_pandas(lexicon)
    if len(edges):
        comp = connected_components_pandas(edges)
        id2canon = (
            lexicon.sort_values(["entity_id", "canonical"])
            .drop_duplicates("entity_id")
            .set_index("entity_id")["canonical"]
        )
        comp_map = dict(zip(comp["node"], comp["comp"]))
        mentions["entity_id"] = mentions["entity_id"].map(
            lambda x: comp_map.get(int(x), int(x)) if pd.notna(x) else x
        )
        mentions["canonical"] = mentions["entity_id"].map(
            lambda x: id2canon.get(int(x)) if pd.notna(x) else None
        )
    return assemble_triples_pandas(mentions, turns, window_turns=window_turns)
