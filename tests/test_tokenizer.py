"""Tokenizer/feature property tests (SURVEY.md §5.2.6)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from reach_banner_spark.operators.tokenizer import tokenize_batch

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def _check_offsets(text: str):
    toks, starts, ends = tokenize_batch(pd.Series([text]))
    for t, s, e in zip(toks[0], starts[0], ends[0]):
        assert text[s:e] == t
    # spans strictly increasing and non-overlapping
    se = list(zip(starts[0].tolist(), ends[0].tolist()))
    for (s1, e1), (s2, e2) in zip(se, se[1:]):
        assert e1 <= s2
        assert s1 < e1


def test_offsets_simple_cases():
    for text in [
        "Hello, world!",
        "TP53 (p53) binds IL-2R alpha.",
        "camelCaseABC123def",
        "",
        "   ",
        "a",
        "(((unbalanced",
        "unicode café naïve",
    ]:
        _check_offsets(text)


def test_fine_splits_case_and_digit_boundaries():
    toks, _, _ = tokenize_batch(pd.Series(["Abc12deFG"]))
    assert toks[0] == ["Abc", "12", "de", "FG"]


def test_simple_keeps_alnum_runs():
    toks, _, _ = tokenize_batch(pd.Series(["Abc12de-f"]), fine=False)
    assert toks[0] == ["Abc12de", "-", "f"]


if HAVE_HYP:

    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_offsets_property(text):
        _check_offsets(text)


def test_feature_hash_stability():
    from reach_banner_spark.functions.hashing import fnv1a_bytes, hash_str_array

    arr = np.array(["W=tp53", "SH=Aa0", "POS=NN"], dtype=object)
    idx = hash_str_array(arr)
    # vectorized path must equal the scalar reference implementation
    for s, i in zip(arr, idx):
        assert fnv1a_bytes(s.encode()) % (1 << 20) == i
    # stable across calls
    assert (hash_str_array(arr) == idx).all()
