"""E2/E3 lifecycle: distributed parameter-mixing training and k-fold eval
(reference: banner.tagging.CRFTagger.train + banner.eval cross-validation)."""

from __future__ import annotations

import pandas as pd

from reach_banner_spark import schemas


def test_train_distributed_learns(spark, lexicon_pdf):
    from reach_banner_spark.fixtures import make_turns
    from reach_banner_spark.operators.mentions import recognize_batch
    from reach_banner_spark.operators.train import (
        eval_exact_span,
        train_distributed,
    )

    turns_pdf, gold_pdf = make_turns(n_convs=40, skew_conv_turns=40, lexicon=lexicon_pdf)
    turns = spark.createDataFrame(turns_pdf, schema=schemas.TURNS)
    gold = spark.createDataFrame(
        gold_pdf[["conv_id", "turn_idx", "begin_char", "end_char"]]
    )
    model = train_distributed(turns, gold, n_shards=4, epochs=4)
    pred = recognize_batch(turns_pdf[["conv_id", "turn_idx", "text"]], model)
    m = eval_exact_span(pred, gold_pdf)
    assert m["f1"] >= 0.9, m


def test_train_distributed_deterministic(spark, lexicon_pdf):
    from reach_banner_spark.fixtures import make_turns
    from reach_banner_spark.operators.train import train_distributed

    turns_pdf, gold_pdf = make_turns(n_convs=15, skew_conv_turns=15, lexicon=lexicon_pdf)
    turns = spark.createDataFrame(turns_pdf, schema=schemas.TURNS)
    gold = spark.createDataFrame(
        gold_pdf[["conv_id", "turn_idx", "begin_char", "end_char"]]
    )
    m1 = train_distributed(turns, gold, n_shards=4, epochs=3)
    m2 = train_distributed(turns, gold, n_shards=4, epochs=3)
    assert (m1.emission == m2.emission).all()
    assert (m1.transition == m2.transition).all()


def test_kfold_eval(lexicon_pdf):
    from reach_banner_spark.fixtures import make_turns
    from reach_banner_spark.operators.train import kfold_eval

    turns_pdf, gold_pdf = make_turns(n_convs=30, skew_conv_turns=30, lexicon=lexicon_pdf)
    folds = kfold_eval(turns_pdf, gold_pdf, k=3, epochs=4)
    assert len(folds) == 3
    for m in folds:
        assert m["f1"] >= 0.8, folds


def test_eval_exact_span_alt_credit():
    """ALTGENE alternative-span credit (P15): a prediction matching ONLY an
    alternative span counts as TP and credits its gold — both precision and
    recall must change vs the plain metric on the same inputs."""
    import pandas as pd

    from reach_banner_spark.operators.train import eval_exact_span

    cols = ["conv_id", "turn_idx", "begin_char", "end_char"]
    # gold: two mentions; pred: one exact hit, one boundary-variant hit,
    # one spurious
    gold = pd.DataFrame(
        [("c1", 0, 10, 15), ("c1", 1, 4, 9)], columns=cols
    )
    pred = pd.DataFrame(
        [("c1", 0, 10, 15),   # exact match of gold #1
         ("c1", 1, 4, 12),    # matches ONLY the alternative of gold #2
         ("c1", 2, 0, 3)],    # spurious
        columns=cols,
    )
    alt = pd.DataFrame(
        [("c1", 1, 4, 9, 4, 12)],  # gold #2 accepts the wider boundary
        columns=["conv_id", "turn_idx", "gold_begin", "gold_end",
                 "begin_char", "end_char"],
    )

    plain = eval_exact_span(pred, gold)
    with_alt = eval_exact_span(pred, gold, alt)
    assert plain["tp"] == 1 and with_alt["tp"] == 2
    assert plain["precision"] == 1 / 3 and with_alt["precision"] == 2 / 3
    assert plain["recall"] == 1 / 2 and with_alt["recall"] == 1.0
    # alt=None and empty alt are the plain metric exactly
    assert eval_exact_span(pred, gold, alt.iloc[0:0]) == plain
    # an alternative whose gold is NOT in the gold set credits nothing
    stray = pd.DataFrame(
        [("c1", 2, 99, 100, 0, 3)],
        columns=["conv_id", "turn_idx", "gold_begin", "gold_end",
                 "begin_char", "end_char"],
    )
    with_stray = eval_exact_span(pred, gold, stray)
    assert with_stray["recall"] == plain["recall"]
    assert with_stray["precision"] == plain["precision"]
    assert with_stray["tp"] == plain["tp"]


def test_ambiguity_protocol_tracks_bayes_ceiling(lexicon_pdf):
    """The irreducible-ambiguity evaluation (BASELINE.md r5 table): when a
    fraction q of plants lose their gold label, no learner can beat
    F1* = 2(1-q)/(2-q); the perceptron should land well inside
    [0.8 * F1*, F1* + slack] — a regression pin on the measured operating
    point, scaled down for test speed. Deterministic (fixed seeds)."""
    import numpy as np

    from reach_banner_spark.fixtures import _training_arrays, make_turns
    from reach_banner_spark.operators.crf import train_perceptron
    from reach_banner_spark.operators.mentions import recognize_batch
    from reach_banner_spark.operators.train import eval_exact_span

    q = 0.3
    tr_t, tr_g = make_turns(n_convs=40, skew_conv_turns=40, lexicon=lexicon_pdf)
    te_t, te_g = make_turns(
        n_convs=20, skew_conv_turns=20, lexicon=lexicon_pdf, seed=43
    )
    r = np.random.RandomState(7)
    tr_gq = tr_g[r.rand(len(tr_g)) >= q].reset_index(drop=True)
    r = np.random.RandomState(11)
    te_gq = te_g[r.rand(len(te_g)) >= q].reset_index(drop=True)
    fi, lab, sl = _training_arrays(tr_t, tr_gq)
    model = train_perceptron(fi, lab, sl, epochs=5)
    pred = recognize_batch(te_t[["conv_id", "turn_idx", "text"]], model)
    m = eval_exact_span(pred, te_gq)
    ceiling = 2 * (1 - q) / (2 - q)
    # the ceiling is exact only in expectation over the label coin; allow
    # a small finite-sample margin above it
    assert m["f1"] <= ceiling + 0.05, m
    assert m["f1"] >= 0.8 * ceiling, m
