"""Tag-format schemes: IO / IOB / IOBEW (reference: banner.tagging.TagFormat [P]).

BANNER's CRF can label with three schemes; the engine supports all three in
both directions, vectorized over the flat token stream of an Arrow batch:

- ``spans_to_labels``: gold char spans -> per-token label ids (training);
- ``labels_to_spans``: decoded label ids -> (start_idx, end_idx) token-run
  pairs (mention assembly), tolerant to scheme-invalid sequences the same
  way BANNER's assembly is (an inside tag after O opens a mention).

Label ids per scheme (O always 0):
  IO   : O=0, I=1
  IOB  : O=0, B=1, I=2            (the committed fixture model's scheme)
  IOBEW: O=0, B=1, I=2, E=3, W=4
"""

from __future__ import annotations

import numpy as np

SCHEMES = {"IO": 2, "IOB": 3, "IOBEW": 5}


def n_labels(fmt: str) -> int:
    return SCHEMES[fmt]


def spans_to_labels(
    fmt: str, n_tokens: int, span_tok_ranges: list[tuple[int, int]]
) -> np.ndarray:
    """Gold token ranges [start, end) (flat indices) -> label id array."""
    lab = np.zeros(n_tokens, dtype=np.int8)
    for s, e in span_tok_ranges:
        if e <= s:
            continue
        if fmt == "IO":
            lab[s:e] = 1
        elif fmt == "IOB":
            lab[s] = 1
            lab[s + 1 : e] = 2
        else:  # IOBEW
            if e - s == 1:
                lab[s] = 4  # W
            else:
                lab[s] = 1  # B
                lab[s + 1 : e - 1] = 2  # I
                lab[e - 1] = 3  # E
    return lab


def labels_to_spans(
    fmt: str,
    lab: np.ndarray,
    is_seq_start: np.ndarray,
    is_seq_end: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Decoded labels -> (start_indices, end_indices) of contiguous mentions.

    Both arrays are flat token indices; ends are INCLUSIVE. Assembly is
    fault-tolerant: continuation tags opening after O start a new mention
    (BANNER's contiguous-run semantics).
    """
    n = len(lab)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    prev = np.concatenate(([0], lab[:-1]))
    prev[is_seq_start] = 0
    nxt = np.concatenate((lab[1:], [0]))
    nxt[is_seq_end] = 0

    if fmt == "IO":
        in_m = lab == 1
        is_start = in_m & (prev != 1)
        is_end = in_m & (nxt != 1)
    elif fmt == "IOB":
        in_m = lab != 0
        is_start = (lab == 1) | ((lab == 2) & (prev == 0))
        is_end = in_m & ((nxt != 2) | is_seq_end)
    else:  # IOBEW
        in_m = lab != 0
        # starts: B, W, or inside/end tag right after O (tolerance)
        is_start = (lab == 1) | (lab == 4) | (
            ((lab == 2) | (lab == 3)) & (prev == 0)
        )
        # ends: E, W, or any entity tag whose successor does not continue
        cont_next = (nxt == 2) | (nxt == 3)
        is_end = (lab == 3) | (lab == 4) | (in_m & (~cont_next | is_seq_end))
        # a B directly followed by continuation is not an end
        is_end &= ~((lab == 1) & cont_next & ~is_seq_end)
        is_end |= in_m & is_seq_end
    s_idx = np.flatnonzero(is_start)
    e_idx = np.flatnonzero(is_end)
    if len(s_idx) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # pair each start with the first end >= it
    pos = np.searchsorted(e_idx, s_idx, side="left")
    pos = np.clip(pos, 0, len(e_idx) - 1)
    e_pos = e_idx[pos]
    keep = e_pos >= s_idx
    return s_idx[keep], e_pos[keep]
