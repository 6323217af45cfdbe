"""Per-token feature extraction (reference: BANNER's MALLET feature pipes).

The reference builds, per token, a sparse feature vector from [P pipes under
banner.tagging / MALLET TokenText* + OffsetConjunctions, K PSB-2008]:
word identity, word shape ("Abc12" -> "Aa0"), brief shape (collapsed runs),
prefix/suffix character n-grams, lemma (Dragon EngLemmatiser
[P dragon.nlp.tool.lemmatiser]), POS tag (Hepple tagger
[P dragon.nlp.tool.HeppleTagger]) and token-window conjunctions over offsets
[-2..2]; indices come from a growable MALLET Alphabet.

Engine re-expression, tuned for Arrow-batch throughput (this runs on every
token of a 10^12-turn corpus):

1. **Factorize first.** Tokens repeat heavily; every string-level derivation
   (shape, lemma, POS, n-grams, char classes) is computed once per UNIQUE
   token in the batch and broadcast back through the factorize codes.
2. **No feature strings.** The MALLET pipeline materializes strings like
   ``"W-1=il|W=2r"`` and dictionary-encodes them; we instead keep one 64-bit
   FNV hash per base value and combine families *numerically*:
   ``idx = mix64(value_hash, FAMILY_SALT) % FEATURE_SPACE``; conjunctions
   mix the participating value hashes. Same role as the hashing trick
   (SURVEY.md P8) with zero string construction on the hot path.
3. Window features shift the int64 hash arrays (not the strings), with
   sentinel hashes at sequence boundaries.

The Dragon lemmatizer and Hepple tagger are tens of kLoC the reference
bundles but did not author; the engine substitutes a deterministic
suffix-strip lemmatizer and a closed-class + suffix-rule POS tagger with the
same role in the feature vector (goldens are regenerated with these, so span
semantics stay exact — SURVEY.md §5.2.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.hashing import FEATURE_SPACE, fnv64_array, mix64, to_space

# Number of hashed feature slots per token (fixed-width feature matrix).
N_FEATURES = 21

# family salts (arbitrary distinct constants, fixed forever)
_FAM = {
    name: np.uint64(0x9E3779B97F4A7C15 * (i + 1) & 0xFFFFFFFFFFFFFFFF)
    for i, name in enumerate(
        [
            "W", "SH", "BR", "LM", "POS", "P2", "P3", "S2", "S3", "KL",
            "W-1", "W-2", "W+1", "W+2", "POS-1", "POS+1", "SH-1", "SH+1",
            "W-1|W", "W|W+1", "SH-1|SH|SH+1",
        ]
    )
}
_BOS = np.uint64(0x1111111111111111)  # sentinel hash for <S>
_EOS = np.uint64(0x2222222222222222)  # sentinel hash for </S>

_CLOSED_CLASS = {
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "of": "IN", "in": "IN", "on": "IN", "at": "IN", "by": "IN", "for": "IN",
    "with": "IN", "from": "IN", "to": "TO", "and": "CC", "or": "CC",
    "but": "CC", "is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD",
    "be": "VB", "been": "VBN", "has": "VBZ", "have": "VBP", "had": "VBD",
    "it": "PRP", "he": "PRP", "she": "PRP", "they": "PRP", "we": "PRP",
    "not": "RB", "no": "DT",
}

_SHAPE_TBL = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789",
    "A" * 26 + "a" * 26 + "0" * 10,
)


def word_shape(tokens: np.ndarray) -> np.ndarray:
    """Full shape: each char class-mapped (A/a/0/x), runs kept."""
    out = np.empty(len(tokens), dtype=object)
    for i, t in enumerate(tokens):
        s = t.translate(_SHAPE_TBL)
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


def token_class(tokens: np.ndarray) -> np.ndarray:
    """Regex-class style composite flag string per token."""
    out = np.empty(len(tokens), dtype=object)
    greek = ("alpha", "beta", "gamma", "delta", "kappa")
    for i, t in enumerate(tokens):
        out[i] = (
            ("D" if t.isdigit() else "")
            + ("d" if any(c.isdigit() for c in t) else "")
            + ("U" if t.isupper() and len(t) > 1 else "")
            + ("C" if t[:1].isupper() else "")
            + ("P" if not t[:1].isalnum() else "")
            + ("G" if t.lower() in greek else "")
        )
    return out


def _shift_h(h: np.ndarray, sent_start: np.ndarray, sent_end: np.ndarray,
             k: int) -> np.ndarray:
    """Neighbor value-hash at offset k within the same sentence, else sentinel."""
    n = len(h)
    out = np.full(n, _BOS if k < 0 else _EOS, dtype=np.uint64)
    if n == 0:
        return out
    idx = np.arange(n) + k
    valid = (idx >= sent_start) & (idx <= sent_end)
    out[valid] = h[idx[valid]]
    return out


def featurize_flat(
    tokens: np.ndarray, seq_ids: np.ndarray, space: int = FEATURE_SPACE
) -> np.ndarray:
    """Hashed feature-index matrix (n_tokens, N_FEATURES) for a flat batch.

    ``tokens`` is the object array of all tokens of all turns in the batch,
    ``seq_ids`` the parallel int array identifying each token's turn
    (non-decreasing).
    """
    n = len(tokens)
    if n == 0:
        return np.empty((0, N_FEATURES), dtype=np.int64)
    # sentence start/end flat index per token
    change = np.flatnonzero(np.diff(seq_ids)) + 1
    starts = np.concatenate(([0], change))
    counts = np.diff(np.concatenate((starts, [n])))
    sent_start = np.repeat(starts, counts)
    sent_end = np.repeat(starts + counts - 1, counts)

    # ---- per-UNIQUE-token string derivations ----
    codes, uniques = pd.factorize(tokens)
    uniq = np.asarray(uniques, dtype=object)
    lower_u = np.array([t.lower() for t in uniq], dtype=object)
    shape_u = word_shape(uniq)
    brief_u = brief_shape(shape_u)
    lemma_u = lemmatize(lower_u)
    pos_u = pos_tag(uniq, lower_u)
    klass_u = token_class(uniq)
    pre2_u = np.array([t[:2] for t in lower_u], dtype=object)
    pre3_u = np.array([t[:3] for t in lower_u], dtype=object)
    suf2_u = np.array([t[-2:] for t in lower_u], dtype=object)
    suf3_u = np.array([t[-3:] for t in lower_u], dtype=object)

    # 64-bit value hashes per unique, broadcast to tokens via codes
    hW = fnv64_array(lower_u)[codes]
    hSH = fnv64_array(shape_u)[codes]
    hBR = fnv64_array(brief_u)[codes]
    hLM = fnv64_array(lemma_u)[codes]
    hPOS = fnv64_array(pos_u)[codes]
    hP2 = fnv64_array(pre2_u)[codes]
    hP3 = fnv64_array(pre3_u)[codes]
    hS2 = fnv64_array(suf2_u)[codes]
    hS3 = fnv64_array(suf3_u)[codes]
    hKL = fnv64_array(klass_u)[codes]

    # window value-hashes (shift the numeric arrays, not the strings)
    hW_m1 = _shift_h(hW, sent_start, sent_end, -1)
    hW_m2 = _shift_h(hW, sent_start, sent_end, -2)
    hW_p1 = _shift_h(hW, sent_start, sent_end, 1)
    hW_p2 = _shift_h(hW, sent_start, sent_end, 2)
    hPOS_m1 = _shift_h(hPOS, sent_start, sent_end, -1)
    hPOS_p1 = _shift_h(hPOS, sent_start, sent_end, 1)
    hSH_m1 = _shift_h(hSH, sent_start, sent_end, -1)
    hSH_p1 = _shift_h(hSH, sent_start, sent_end, 1)

    cols = [
        to_space(mix64(hW, _FAM["W"]), space),
        to_space(mix64(hSH, _FAM["SH"]), space),
        to_space(mix64(hBR, _FAM["BR"]), space),
        to_space(mix64(hLM, _FAM["LM"]), space),
        to_space(mix64(hPOS, _FAM["POS"]), space),
        to_space(mix64(hP2, _FAM["P2"]), space),
        to_space(mix64(hP3, _FAM["P3"]), space),
        to_space(mix64(hS2, _FAM["S2"]), space),
        to_space(mix64(hS3, _FAM["S3"]), space),
        to_space(mix64(hKL, _FAM["KL"]), space),
        to_space(mix64(hW_m1, _FAM["W-1"]), space),
        to_space(mix64(hW_m2, _FAM["W-2"]), space),
        to_space(mix64(hW_p1, _FAM["W+1"]), space),
        to_space(mix64(hW_p2, _FAM["W+2"]), space),
        to_space(mix64(hPOS_m1, _FAM["POS-1"]), space),
        to_space(mix64(hPOS_p1, _FAM["POS+1"]), space),
        to_space(mix64(hSH_m1, _FAM["SH-1"]), space),
        to_space(mix64(hSH_p1, _FAM["SH+1"]), space),
        # conjunctions (OffsetConjunctions analogue): mix value hashes
        to_space(mix64(mix64(hW_m1, hW), _FAM["W-1|W"]), space),
        to_space(mix64(mix64(hW, hW_p1), _FAM["W|W+1"]), space),
        to_space(
            mix64(mix64(mix64(hSH_m1, hSH), hSH_p1), _FAM["SH-1|SH|SH+1"]), space
        ),
    ]
    return np.stack(cols, axis=1)
