"""Offset-preserving tokenizers (reference: banner.tokenization [P]).

The reference ships two tokenizers:
- ``SimpleTokenizer`` [P banner.tokenization.SimpleTokenizer]: splits text
  into maximal alphanumeric runs and single punctuation characters, keeping
  character offsets into the sentence.
- ``FineTokenizer`` [P banner.tokenization.FineTokenizer]: additionally
  breaks at letter<->digit boundaries and lowercase->uppercase case
  transitions (so ``Abc12de`` -> ``Abc``, ``12``, ``de``).

Both are re-expressed here as batch functions over pandas Series of turn
texts, producing parallel lists of (token, start, end). They run inside one
fused ``mapInPandas`` stage (see mentions.py) — Arrow batches in, Arrow
batches out, no per-row Spark Python.

Invariant (tested): for every input string the token spans are
non-overlapping, strictly increasing, and ``text[start:end] == tok``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# SimpleTokenizer: alnum runs or single non-space symbol.
_SIMPLE_RE = re.compile(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")
# FineTokenizer: split alnum runs further at letter/digit and case boundaries.
_FINE_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|[0-9]+|[^\sA-Za-z0-9]")


def tokenize_batch(
    texts: pd.Series, fine: bool = True
) -> tuple[list[list[str]], list[np.ndarray], list[np.ndarray]]:
    """Tokenize a batch of texts; returns (tokens, starts, ends) per text."""
    rx = _FINE_RE if fine else _SIMPLE_RE
    toks_out: list[list[str]] = []
    starts_out: list[np.ndarray] = []
    ends_out: list[np.ndarray] = []
    for text in texts:
        if text is None:
            toks_out.append([])
            starts_out.append(np.empty(0, np.int32))
            ends_out.append(np.empty(0, np.int32))
            continue
        toks, starts, ends = [], [], []
        for m in rx.finditer(text):
            toks.append(m.group(0))
            starts.append(m.start())
            ends.append(m.end())
        toks_out.append(toks)
        starts_out.append(np.asarray(starts, dtype=np.int32))
        ends_out.append(np.asarray(ends, dtype=np.int32))
    return toks_out, starts_out, ends_out


def tokenize_pandas(pdf: pd.DataFrame, text_col: str = "text", fine: bool = True) -> pd.DataFrame:
    """Return pdf + a ``tokens`` column of list<dict(tok,start,end)>."""
    toks, starts, ends = tokenize_batch(pdf[text_col], fine=fine)
    pdf = pdf.copy()
    pdf["tokens"] = [
        [
            {"tok": t, "start": int(s), "end": int(e)}
            for t, s, e in zip(ts, ss.tolist(), es.tolist())
        ]
        for ts, ss, es in zip(toks, starts, ends)
    ]
    return pdf
