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


def tokenize_flat(
    texts: "pd.Series | list", fine: bool = True
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a whole batch in ONE regex pass over a '\\n'-joined
    megastring (both token classes exclude whitespace, so tokens never
    cross the separator). Returns flat arrays:
    (tokens, starts, ends, seq_ids, seq_lens) with per-text char offsets.
    ~2x faster than per-text ``finditer`` loops on Arrow-size batches.
    """
    rx = _FINE_RE if fine else _SIMPLE_RE
    tl = [t if isinstance(t, str) else ("" if t is None else str(t)) for t in texts]
    n = len(tl)
    lens = np.fromiter((len(t) for t in tl), count=n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens + 1, out=offsets[1:])  # +1 per '\n' separator
    big = "\n".join(tl)
    spans = [m.span() for m in rx.finditer(big)]
    if spans:
        arr = np.asarray(spans, dtype=np.int64)
        gs, ge = arr[:, 0], arr[:, 1]
    else:
        gs = ge = np.empty(0, dtype=np.int64)
    seq_ids = np.searchsorted(offsets, gs, side="right") - 1
    starts = (gs - offsets[seq_ids]).astype(np.int32)
    ends = (ge - offsets[seq_ids]).astype(np.int32)
    toks = np.array([big[s:e] for s, e in spans], dtype=object)
    seq_lens = np.bincount(seq_ids, minlength=n).astype(np.int64)
    return toks, starts, ends, seq_ids.astype(np.int64), seq_lens


def tokenize_batch(
    texts: pd.Series, fine: bool = True
) -> tuple[list[list[str]], list[np.ndarray], list[np.ndarray]]:
    """Tokenize a batch of texts; returns (tokens, starts, ends) per text."""
    toks, starts, ends, _seq_ids, seq_lens = tokenize_flat(texts, fine=fine)
    cuts = np.cumsum(seq_lens)[:-1]
    starts_out = np.split(starts, cuts)
    ends_out = np.split(ends, cuts)
    toks_out: list[list[str]] = []
    idx = 0
    for c in seq_lens:
        toks_out.append(list(toks[idx : idx + c]))
        idx += int(c)
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
