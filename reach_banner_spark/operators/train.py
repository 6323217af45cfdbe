"""Distributed CRF training + BC2-style k-fold evaluation (E2/E3).

Reference lifecycle E2 [P banner.eval + banner.tagging.CRFTagger.train ->
MALLET CRFTrainerByLabelLikelihood]: parse labeled sentences, build feature
pipeline, L-BFGS train, serialize. E3 adds k-fold cross-validation.

Engine re-expression:
- ``train_distributed``: parameter-mixing structured perceptron — each
  partition trains a local averaged perceptron on its shard with the SAME
  numpy core as the fixture trainer, emits its sparse weight deltas, and
  the driver averages shards (iterative parameter mixing, McDonald et al.,
  NAACL 2010 [K]). Deterministic: shards are formed by hash(conv_id) and
  sorted on (conv_id, turn_idx) before training; seeds are fixed.
- ``kfold_eval``: BANNER-style k-fold — train on k-1 folds, exact-span
  P/R/F1 on the held-out fold (BioCreative-II matching; the harness twin
  of banner.eval.BC2GeneMentionTest).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import FEATURE_SPACE
from .crf import N_LABELS, CrfModel, train_perceptron
from .features import featurize_flat
from .tokenizer import tokenize_flat


def _label_arrays(turns_pdf: pd.DataFrame, gold_pdf: pd.DataFrame):
    """Tokenize + IOB-label planted spans for a pandas shard."""
    toks, starts, ends, seq_ids, seq_lens = tokenize_flat(
        turns_pdf["text"], fine=True
    )
    feat_idx = featurize_flat(toks, seq_ids)
    labels = np.zeros(len(toks), dtype=np.int8)
    offsets = np.concatenate(([0], np.cumsum(seq_lens)))
    key_to_row = {
        (c, int(t)): i
        for i, (c, t) in enumerate(
            zip(turns_pdf["conv_id"], turns_pdf["turn_idx"])
        )
    }
    cuts = np.cumsum(seq_lens)[:-1]
    starts_per = np.split(starts, cuts)
    ends_per = np.split(ends, cuts)
    for c, t, b, e in gold_pdf[
        ["conv_id", "turn_idx", "begin_char", "end_char"]
    ].itertuples(index=False, name=None):
        row = key_to_row.get((c, int(t)))
        if row is None:
            continue
        ss, ee = starts_per[row], ends_per[row]
        in_span = np.flatnonzero((ss >= b) & (ee <= e))
        if len(in_span) == 0:
            continue
        base = offsets[row]
        labels[base + in_span[0]] = 1
        labels[base + in_span[1:]] = 2
    return feat_idx, labels, seq_lens


def train_distributed(
    turns: DataFrame,
    gold: DataFrame,
    n_shards: int = 8,
    epochs: int = 6,
    seed: int = 42,
    order: int = 1,
) -> CrfModel:
    """Parameter-mixing perceptron over deterministic conv_id shards.

    ``order=2`` trains the pair-state (order-2) model — the reference's
    published best config [K PSB-2008] — with the same parameter-mixing
    scheme; transition2 deltas ride the same sparse (idx, lab, w) rows
    with a negative flat index over the (L+1, L+1, L) tensor."""
    g = gold.groupBy("conv_id", "turn_idx").agg(
        F.collect_list(F.struct("begin_char", "end_char")).alias("spans")
    )
    data = (
        turns.select("conv_id", "turn_idx", "text")
        .join(g, ["conv_id", "turn_idx"], "left")
        .repartition(n_shards, F.pmod(F.hash("conv_id"), F.lit(n_shards)))
        .sortWithinPartitions("conv_id", "turn_idx")
    )

    def shard_train(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        spans = []
        for conv_id, turn_idx, span_list in zip(
            pdf["conv_id"], pdf["turn_idx"], pdf["spans"]
        ):
            if span_list is None:
                continue
            for s in span_list:
                spans.append((conv_id, int(turn_idx), s["begin_char"], s["end_char"]))
        gold_pdf = pd.DataFrame(
            spans, columns=["conv_id", "turn_idx", "begin_char", "end_char"]
        )
        feat_idx, labels, seq_lens = _label_arrays(pdf, gold_pdf)
        if order == 2:
            from .crf import train_perceptron2

            model = train_perceptron2(
                feat_idx, labels, seq_lens, epochs=epochs, seed=seed
            )
            trans_flat = model.transition2.reshape(-1)
        else:
            model = train_perceptron(
                feat_idx, labels, seq_lens, epochs=epochs, seed=seed
            )
            trans_flat = model.transition.reshape(-1)
        nz = np.nonzero(model.emission)
        out = pd.DataFrame(
            {
                "idx": nz[0].astype(np.int64),
                "lab": nz[1].astype(np.int32),
                "w": model.emission[nz].astype(np.float64),
            }
        )
        # transitions ride along with idx = -(flat_index) - 1 over the
        # row-major flattening of the order's transition tensor
        tnz = np.nonzero(trans_flat)[0]
        trows = pd.DataFrame(
            {
                "idx": (-tnz - 1).astype(np.int64),
                "lab": np.zeros(len(tnz), dtype=np.int32),
                "w": trans_flat[tnz].astype(np.float64),
            }
        )
        yield pd.concat([out, trows], ignore_index=True)

    deltas = data.mapInPandas(shard_train, "idx long, lab int, w double")
    avg = (
        deltas.groupBy("idx", "lab")
        .agg((F.sum("w") / F.lit(n_shards)).alias("w"))
        .collect()
    )
    emission = np.zeros((FEATURE_SPACE, N_LABELS), dtype=np.float32)
    t_shape = (
        (N_LABELS + 1, N_LABELS + 1, N_LABELS)
        if order == 2
        else (N_LABELS + 1, N_LABELS)
    )
    trans_flat = np.zeros(int(np.prod(t_shape)), dtype=np.float32)
    for r in avg:
        if r["idx"] >= 0:
            emission[r["idx"], r["lab"]] = r["w"]
        else:
            trans_flat[-r["idx"] - 1] = r["w"]
    if order == 2:
        from .crf import Crf2Model

        return Crf2Model(emission, trans_flat.reshape(t_shape))
    return CrfModel(emission, trans_flat.reshape(t_shape))


def eval_exact_span(
    pred: pd.DataFrame, gold: pd.DataFrame, alt: pd.DataFrame | None = None
) -> dict[str, float]:
    """BioCreative-II exact-span P/R/F1 (banner.eval twin), with optional
    ALTGENE alternative-span credit (SURVEY §2.1 P15 / §5.2.2).

    ``alt`` columns: (conv_id, turn_idx, gold_begin, gold_end, begin_char,
    end_char) — each row says "span [begin_char, end_char) is an acceptable
    alternative for the gold mention at [gold_begin, gold_end)". Under the
    BC2 alt protocol a predicted span is TP if it matches the gold span or
    ANY alternative; precision counts credited predictions, recall counts
    credited golds (found directly or via any of their alternatives).
    With ``alt=None`` this is exactly the plain exact-span metric.
    """
    cols = ["conv_id", "turn_idx", "begin_char", "end_char"]
    ps = {tuple(r) for r in pred[cols].itertuples(index=False, name=None)}
    gs = {tuple(r) for r in gold[cols].itertuples(index=False, name=None)}
    if alt is None or len(alt) == 0:
        tp = len(ps & gs)
        p = tp / max(1, len(ps))
        r = tp / max(1, len(gs))
        f1 = 2 * p * r / max(1e-12, p + r)
        return {"precision": p, "recall": r, "f1": f1, "tp": tp}
    # alt span -> owning gold span(s); one alt span may serve several golds
    alt_owner: dict[tuple, set[tuple]] = {}
    for c, t, gb, ge, b, e in alt[
        ["conv_id", "turn_idx", "gold_begin", "gold_end", "begin_char", "end_char"]
    ].itertuples(index=False, name=None):
        alt_owner.setdefault((c, t, b, e), set()).add((c, t, gb, ge))
    # alternatives whose owning mention is not actually in the gold set are
    # malformed input and credit NOTHING (neither precision nor recall)
    credited_preds = {
        s for s in ps if s in gs or (alt_owner.get(s, set()) & gs)
    }
    credited_golds = set(ps & gs)
    for s in ps:
        credited_golds.update(alt_owner.get(s, ()))
    credited_golds &= gs
    tp = len(credited_preds)
    p = tp / max(1, len(ps))
    r = len(credited_golds) / max(1, len(gs))
    f1 = 2 * p * r / max(1e-12, p + r)
    return {"precision": p, "recall": r, "f1": f1, "tp": tp}


def kfold_eval(
    turns_pdf: pd.DataFrame,
    gold_pdf: pd.DataFrame,
    k: int = 3,
    epochs: int = 6,
    order: int = 1,
) -> list[dict[str, float]]:
    """k-fold cross-validation, folds split by conv_id hash (deterministic).
    ``order=2`` evaluates the pair-state CRF config."""
    from ..functions.hashing import fnv1a_bytes
    from .mentions import recognize_batch

    fold_of = {
        c: fnv1a_bytes(c.encode()) % k for c in turns_pdf["conv_id"].unique()
    }
    turns_fold = turns_pdf["conv_id"].map(fold_of)
    gold_fold = gold_pdf["conv_id"].map(fold_of)
    results = []
    for fold in range(k):
        tr_t = turns_pdf[turns_fold != fold].reset_index(drop=True)
        tr_g = gold_pdf[gold_fold != fold].reset_index(drop=True)
        te_t = turns_pdf[turns_fold == fold].reset_index(drop=True)
        te_g = gold_pdf[gold_fold == fold].reset_index(drop=True)
        feat_idx, labels, seq_lens = _label_arrays(tr_t, tr_g)
        if order == 2:
            from .crf import train_perceptron2

            model = train_perceptron2(
                feat_idx, labels, seq_lens, epochs=epochs
            )
        else:
            model = train_perceptron(feat_idx, labels, seq_lens, epochs=epochs)
        pred = recognize_batch(te_t[["conv_id", "turn_idx", "text"]], model)
        results.append(eval_exact_span(pred, te_g))
    return results
