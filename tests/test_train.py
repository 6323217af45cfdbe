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
