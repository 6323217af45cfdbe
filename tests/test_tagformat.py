"""Tag-format schemes IO/IOB/IOBEW (banner.tagging.TagFormat parity):
round-trip span<->label encoding, and an end-to-end train+decode per scheme
recovering the planted spans."""

from __future__ import annotations

import numpy as np
import pytest

from reach_banner_spark.operators.tagformat import (
    SCHEMES,
    labels_to_spans,
    spans_to_labels,
)


@pytest.mark.parametrize("fmt", sorted(SCHEMES))
def test_roundtrip_spans(fmt):
    rng = np.random.RandomState(7)
    for _ in range(50):
        n = int(rng.randint(1, 30))
        is_start = np.zeros(n, dtype=bool)
        is_end = np.zeros(n, dtype=bool)
        is_start[0] = True
        is_end[-1] = True
        # random non-overlapping, non-adjacent spans (adjacent spans are
        # indistinguishable from one span in IO — excluded by construction)
        spans = []
        pos = 0
        while pos < n:
            if rng.rand() < 0.4:
                ln = int(rng.randint(1, 4))
                e = min(n, pos + ln)
                spans.append((pos, e))
                pos = e + 1  # gap
            else:
                pos += 1
        lab = spans_to_labels(fmt, n, spans)
        s_idx, e_idx = labels_to_spans(fmt, lab, is_start, is_end)
        got = [(int(s), int(e) + 1) for s, e in zip(s_idx, e_idx)]
        assert got == spans, (fmt, lab.tolist(), spans, got)


@pytest.mark.parametrize("fmt", ["IO", "IOBEW"])
def test_train_decode_scheme(fmt, lexicon_pdf):
    """Train a model per scheme on the fixture; spans must be recovered."""
    from reach_banner_spark.fixtures import make_turns
    from reach_banner_spark.operators.crf import train_perceptron
    from reach_banner_spark.operators.features import featurize_flat
    from reach_banner_spark.operators.mentions import recognize_batch
    from reach_banner_spark.operators.tokenizer import tokenize_flat
    from reach_banner_spark.operators.train import eval_exact_span

    turns, gold = make_turns(n_convs=25, skew_conv_turns=25, lexicon=lexicon_pdf)
    toks, starts, ends, seq_ids, seq_lens = tokenize_flat(turns["text"])
    feat_idx = featurize_flat(toks, seq_ids)
    offsets = np.concatenate(([0], np.cumsum(seq_lens)))
    key_to_row = {
        (c, int(t)): i for i, (c, t) in enumerate(zip(turns["conv_id"], turns["turn_idx"]))
    }
    cuts = np.cumsum(seq_lens)[:-1]
    sp, ep = np.split(starts, cuts), np.split(ends, cuts)
    ranges = []
    for c, t, b, e, _s in gold.itertuples(index=False):
        row = key_to_row[(c, int(t))]
        in_span = np.flatnonzero((sp[row] >= b) & (ep[row] <= e))
        if len(in_span):
            base = offsets[row]
            ranges.append((int(base + in_span[0]), int(base + in_span[-1] + 1)))
    labels = spans_to_labels(fmt, len(toks), ranges)
    model = train_perceptron(feat_idx, labels, seq_lens, epochs=5, fmt=fmt)
    assert model.fmt == fmt and model.n_labels == SCHEMES[fmt]
    pred = recognize_batch(turns[["conv_id", "turn_idx", "text"]], model)
    m = eval_exact_span(pred, gold)
    assert m["f1"] >= 0.9, (fmt, m)
