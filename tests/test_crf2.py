"""Order-2 CRF (the reference's published best config [K PSB-2008]):
pair-state Viterbi + order-2 perceptron recover planted spans."""

from __future__ import annotations

import numpy as np


def _arrays(turns, gold):
    from reach_banner_spark.operators.features import featurize_flat
    from reach_banner_spark.operators.tagformat import spans_to_labels
    from reach_banner_spark.operators.tokenizer import tokenize_flat

    toks, starts, ends, seq_ids, seq_lens = tokenize_flat(turns["text"])
    feat_idx = featurize_flat(toks, seq_ids)
    offsets = np.concatenate(([0], np.cumsum(seq_lens)))
    key_to_row = {
        (c, int(t)): i
        for i, (c, t) in enumerate(zip(turns["conv_id"], turns["turn_idx"]))
    }
    cuts = np.cumsum(seq_lens)[:-1]
    sp, ep = np.split(starts, cuts), np.split(ends, cuts)
    ranges = []
    for c, t, b, e, _s in gold.itertuples(index=False):
        row = key_to_row[(c, int(t))]
        hit = np.flatnonzero((sp[row] >= b) & (ep[row] <= e))
        if len(hit):
            base = offsets[row]
            ranges.append((int(base + hit[0]), int(base + hit[-1] + 1)))
    labels = spans_to_labels("IOB", len(toks), ranges)
    return feat_idx, labels, seq_lens


def test_order2_learns_and_decodes(lexicon_pdf):
    from reach_banner_spark.fixtures import make_turns
    from reach_banner_spark.operators.crf import decode2, train_perceptron2
    from reach_banner_spark.operators.mentions import recognize_batch
    from reach_banner_spark.operators.train import eval_exact_span

    turns, gold = make_turns(n_convs=25, skew_conv_turns=25, lexicon=lexicon_pdf)
    feat_idx, labels, seq_lens = _arrays(turns, gold)
    model = train_perceptron2(feat_idx, labels, seq_lens, epochs=5)
    pred_labels = decode2(model, feat_idx, seq_lens[seq_lens > 0])
    assert (pred_labels == labels).mean() > 0.98
    # through the full recognizer (dispatches on transition2)
    pred = recognize_batch(turns[["conv_id", "turn_idx", "text"]], model)
    m = eval_exact_span(pred, gold)
    assert m["f1"] >= 0.9, m


def test_order2_viterbi_agrees_with_bruteforce():
    """Pair-state Viterbi == exhaustive search on tiny random instances."""
    from itertools import product

    from reach_banner_spark.operators.crf import viterbi2_batch

    rng = np.random.RandomState(3)
    L = 3
    for trial in range(25):
        n = int(rng.randint(1, 6))
        emit = rng.randn(n, L).astype(np.float32)
        t2 = rng.randn(L + 1, L + 1, L).astype(np.float32)

        def score(seq):
            s = 0.0
            p2, p1 = L, L
            for t, k in enumerate(seq):
                s += t2[p2, p1, k] + emit[t, k]
                p2, p1 = p1, k
            return s

        best = max(product(range(L), repeat=n), key=score)
        got = viterbi2_batch(emit, np.array([n]), t2)
        assert score(tuple(got.tolist())) >= score(best) - 1e-4, (
            trial, got, best, score(tuple(got.tolist())), score(best))


def test_order2_committed_model_through_spark_path(spark, lexicon_pdf):
    """The committed order-2 model (resources/model2.npz): ensure_model2
    resolves it, the npz loader dispatches on the transition2 key, and the
    Spark detect_mentions path emits EXACTLY the rows the single-process
    recognizer emits with the same model (the same by-construction parity
    the order-1 model carries)."""
    from reach_banner_spark import schemas
    from reach_banner_spark.fixtures import ensure_model2, make_turns
    from reach_banner_spark.operators.crf import Crf2Model
    from reach_banner_spark.operators.mentions import (
        detect_mentions,
        recognize_batch,
    )
    from reach_banner_spark.operators.train import eval_exact_span

    path = ensure_model2()
    model = Crf2Model.load_npz(path)
    turns_pdf, gold_pdf = make_turns(n_convs=20, skew_conv_turns=20, lexicon=lexicon_pdf)
    turns = spark.createDataFrame(turns_pdf, schema=schemas.TURNS)
    got = (
        detect_mentions(turns.select("conv_id", "turn_idx", "text"), path)
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "begin_char"])
        .reset_index(drop=True)
    )
    want = (
        recognize_batch(turns_pdf[["conv_id", "turn_idx", "text"]], model)
        .sort_values(["conv_id", "turn_idx", "begin_char"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert got[["conv_id", "turn_idx", "begin_char", "end_char", "surface"]].equals(
        want[["conv_id", "turn_idx", "begin_char", "end_char", "surface"]]
    )
    # the order-2 model recovers the planted spans on its fixture
    m = eval_exact_span(want, gold_pdf)
    assert m["f1"] >= 0.95, m


def test_order2_train_distributed(spark, lexicon_pdf):
    """Parameter-mixing trainer with order=2 returns a Crf2Model that
    learns the fixture (E2 lifecycle, order-2 config)."""
    from reach_banner_spark import schemas
    from reach_banner_spark.fixtures import make_turns
    from reach_banner_spark.operators.crf import Crf2Model
    from reach_banner_spark.operators.mentions import recognize_batch
    from reach_banner_spark.operators.train import (
        eval_exact_span,
        train_distributed,
    )

    turns_pdf, gold_pdf = make_turns(n_convs=25, skew_conv_turns=25, lexicon=lexicon_pdf)
    turns = spark.createDataFrame(turns_pdf, schema=schemas.TURNS)
    gold = spark.createDataFrame(
        gold_pdf[["conv_id", "turn_idx", "begin_char", "end_char"]]
    )
    model = train_distributed(turns, gold, n_shards=4, epochs=4, order=2)
    assert isinstance(model, Crf2Model)
    pred = recognize_batch(turns_pdf[["conv_id", "turn_idx", "text"]], model)
    m = eval_exact_span(pred, gold_pdf)
    assert m["f1"] >= 0.9, m
