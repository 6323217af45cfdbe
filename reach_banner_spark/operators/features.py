"""Per-token feature extraction (reference: BANNER's MALLET feature pipes).

The reference builds, per token, a sparse feature vector from [P pipes under
banner.tagging / MALLET TokenText* + OffsetConjunctions, K PSB-2008]:
word identity, word shape ("Abc12" -> "Aa0"), brief shape (collapsed runs),
prefix/suffix character n-grams, internal character 2/3-grams, lemma (Dragon
EngLemmatiser [P dragon.nlp.tool.lemmatiser]), POS tag (Hepple tagger
[P dragon.nlp.tool.HeppleTagger]) and token-window conjunctions over offsets
[-2..2]; indices come from a growable MALLET Alphabet.

This module re-creates those semantics columnar-style: every feature family
is computed as a vectorized numpy/pandas operation over the FLAT token array
of a whole Arrow batch (all turns concatenated), then hashed with the fixed
FNV-1a hashing trick (functions/hashing.py) instead of a mutable alphabet.
The Dragon lemmatizer and Hepple tagger are tens of kLoC the reference
bundles but did not author; the engine substitutes a deterministic
suffix-strip lemmatizer and a closed-class + suffix-rule POS tagger with the
same *role* in the feature vector (golden outputs are regenerated with these,
SURVEY.md §5.2.2, so span semantics stay exact).
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import FEATURE_SPACE, hash_str_array

# Number of hashed feature slots per token (fixed-width feature matrix).
N_FEATURES = 21

_CLOSED_CLASS = {
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "of": "IN", "in": "IN", "on": "IN", "at": "IN", "by": "IN", "for": "IN",
    "with": "IN", "from": "IN", "to": "TO", "and": "CC", "or": "CC",
    "but": "CC", "is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD",
    "be": "VB", "been": "VBN", "has": "VBZ", "have": "VBP", "had": "VBD",
    "it": "PRP", "he": "PRP", "she": "PRP", "they": "PRP", "we": "PRP",
    "not": "RB", "no": "DT",
}


def word_shape(tokens: np.ndarray) -> np.ndarray:
    """Full shape: each char class-mapped (A/a/0/x), runs kept."""
    out = np.empty(len(tokens), dtype=object)
    tbl = str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789",
        "A" * 26 + "a" * 26 + "0" * 10,
    )
    for i, t in enumerate(tokens):
        s = t.translate(tbl)
        out[i] = "".join(c if c in "Aa0" else "x" for c in s)
    return out


def brief_shape(shapes: np.ndarray) -> np.ndarray:
    """Brief shape: collapse repeated run characters (``AAaa00`` -> ``Aa0``)."""
    out = np.empty(len(shapes), dtype=object)
    for i, s in enumerate(shapes):
        prev = ""
        buf = []
        for c in s:
            if c != prev:
                buf.append(c)
                prev = c
        out[i] = "".join(buf)
    return out


def lemmatize(tokens_lower: np.ndarray) -> np.ndarray:
    """Deterministic suffix-strip lemmatizer (EngLemmatiser stand-in)."""
    out = np.empty(len(tokens_lower), dtype=object)
    for i, w in enumerate(tokens_lower):
        if len(w) > 4 and w.endswith("ies"):
            out[i] = w[:-3] + "y"
        elif len(w) > 4 and w.endswith("ing"):
            out[i] = w[:-3]
        elif len(w) > 3 and w.endswith("ed"):
            out[i] = w[:-2]
        elif len(w) > 3 and w.endswith("es"):
            out[i] = w[:-2]
        elif len(w) > 2 and w.endswith("s") and not w.endswith("ss"):
            out[i] = w[:-1]
        else:
            out[i] = w
    return out


def pos_tag(tokens: np.ndarray, tokens_lower: np.ndarray) -> np.ndarray:
    """Greedy rule POS tagger (Hepple-tagger stand-in, deterministic)."""
    out = np.empty(len(tokens), dtype=object)
    for i, (t, w) in enumerate(zip(tokens, tokens_lower)):
        tag = _CLOSED_CLASS.get(w)
        if tag is not None:
            out[i] = tag
        elif t.isdigit():
            out[i] = "CD"
        elif not t[0].isalnum():
            out[i] = "SYM"
        elif w.endswith("ing"):
            out[i] = "VBG"
        elif w.endswith("ed"):
            out[i] = "VBD"
        elif w.endswith("ly"):
            out[i] = "RB"
        elif t[0].isupper():
            out[i] = "NNP"
        elif w.endswith("s"):
            out[i] = "NNS"
        else:
            out[i] = "NN"
    return out


def _shift(arr: np.ndarray, sent_start: np.ndarray, sent_end: np.ndarray, k: int) -> np.ndarray:
    """Neighbor token at offset k within the same sentence, else boundary."""
    n = len(arr)
    out = np.full(n, "<S>" if k < 0 else "</S>", dtype=object)
    if n == 0:
        return out
    idx = np.arange(n) + k
    valid = (idx >= sent_start) & (idx <= sent_end)
    out[valid] = arr[idx[valid]]
    return out


def featurize_flat(
    tokens: np.ndarray, seq_ids: np.ndarray, space: int = FEATURE_SPACE
) -> np.ndarray:
    """Hashed feature-index matrix (n_tokens, N_FEATURES) for a flat batch.

    ``tokens`` is the object array of all tokens of all turns in the batch,
    ``seq_ids`` the parallel int array identifying each token's turn.
    """
    n = len(tokens)
    if n == 0:
        return np.empty((0, N_FEATURES), dtype=np.int64)
    # sentence start/end index per token (seq_ids is non-decreasing)
    change = np.flatnonzero(np.diff(seq_ids)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change - 1, [n - 1]))
    sent_start = np.repeat(starts, np.diff(np.concatenate((starts, [n]))))
    sent_end = np.repeat(ends, np.diff(np.concatenate((starts, [n]))))

    lower = np.array([t.lower() for t in tokens], dtype=object)
    shape = word_shape(tokens)
    brief = brief_shape(shape)
    lemma = lemmatize(lower)
    pos = pos_tag(tokens, lower)

    prev1 = _shift(lower, sent_start, sent_end, -1)
    prev2 = _shift(lower, sent_start, sent_end, -2)
    next1 = _shift(lower, sent_start, sent_end, 1)
    next2 = _shift(lower, sent_start, sent_end, 2)
    pos_prev = _shift(pos, sent_start, sent_end, -1)
    pos_next = _shift(pos, sent_start, sent_end, 1)
    shape_prev = _shift(shape, sent_start, sent_end, -1)
    shape_next = _shift(shape, sent_start, sent_end, 1)

    def fam(prefix: str, values: np.ndarray) -> np.ndarray:
        return hash_str_array(
            np.array([prefix + v for v in values], dtype=object), space
        )

    pre2 = np.array([t[:2] for t in lower], dtype=object)
    pre3 = np.array([t[:3] for t in lower], dtype=object)
    suf2 = np.array([t[-2:] for t in lower], dtype=object)
    suf3 = np.array([t[-3:] for t in lower], dtype=object)
    # regex-class style boolean features, as strings
    klass = np.array(
        [
            ("D" if t.isdigit() else "")
            + ("d" if any(c.isdigit() for c in t) else "")
            + ("U" if t.isupper() and len(t) > 1 else "")
            + ("C" if t[:1].isupper() else "")
            + ("P" if not t[:1].isalnum() else "")
            + ("G" if t.lower() in ("alpha", "beta", "gamma", "delta", "kappa") else "")
            for t in tokens
        ],
        dtype=object,
    )

    cols = [
        fam("W=", lower),
        fam("SH=", shape),
        fam("BR=", brief),
        fam("LM=", lemma),
        fam("POS=", pos),
        fam("P2=", pre2),
        fam("P3=", pre3),
        fam("S2=", suf2),
        fam("S3=", suf3),
        fam("KL=", klass),
        fam("W-1=", prev1),
        fam("W-2=", prev2),
        fam("W+1=", next1),
        fam("W+2=", next2),
        fam("POS-1=", pos_prev),
        fam("POS+1=", pos_next),
        fam("SH-1=", shape_prev),
        fam("SH+1=", shape_next),
        # conjunctions (OffsetConjunctions analogue)
        fam("W-1|W=", np.array([a + "|" + b for a, b in zip(prev1, lower)], dtype=object)),
        fam("W|W+1=", np.array([a + "|" + b for a, b in zip(lower, next1)], dtype=object)),
        fam("SH-1|SH|SH+1=", np.array(
            [a + "|" + b + "|" + c for a, b, c in zip(shape_prev, shape, shape_next)],
            dtype=object,
        )),
    ]
    return np.stack(cols, axis=1)
