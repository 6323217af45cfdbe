"""Fused mention-detection stage + mention assembly + post-processing.

Reference lifecycle being re-created (SURVEY.md §3.1 E1 [P banner.*]):
``Sentence`` -> ``Tokenizer.tokenize`` -> MALLET feature pipes ->
``CRF.transduce`` Viterbi -> contiguous-tag ``Mention`` assembly ->
``ParenthesisPostProcessor`` / ``LocalAbbreviationPostProcessor``.

Engine re-expression: ALL of tokenize -> featurize -> Viterbi -> assemble ->
abbreviation-expand run inside ONE ``mapInPandas`` generator
(``detect_mentions``): one Arrow round-trip per batch instead of five
chained UDF nodes (SURVEY.md §4.3). The parenthesis filter is a pure column
expression (no Python at all). The exact same batch core
(``recognize_batch``) is invoked single-process by fixtures.py to produce
golden mentions, giving BANNER-style exact-span agreement by construction.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schemas
from .crf import CrfModel, decode, emission_scores
from .features import featurize_flat
from .tagformat import labels_to_spans
from .tokenizer import tokenize_batch, tokenize_flat

_ABBREV_RE = re.compile(r"^ ?\(([A-Za-z0-9-]{1,10})\)")

# module-level model cache: one deserialization per Python worker process,
# not per task (SURVEY.md §4.3 "broadcast of model weights"). Weights travel
# as ONE SparkContext.broadcast of the raw .npz bytes — a driver filesystem
# path would not exist on real executors.
_MODEL_CACHE: dict[tuple[int, int], CrfModel] = {}


def _load_model_bytes(blob: bytes) -> CrfModel:
    import io
    import zlib

    key = (len(blob), zlib.crc32(blob))
    m = _MODEL_CACHE.get(key)
    if m is None:
        import numpy as _np

        d = _np.load(io.BytesIO(blob))
        from ..functions.hashing import FEATURE_SPACE

        fmt = str(d["fmt"]) if "fmt" in d else "IOB"
        if "transition2" in d:  # order-2 model (PSB-2008 best config)
            from .crf import Crf2Model

            t2 = d["transition2"].astype(_np.float32)
            emission = _np.zeros((FEATURE_SPACE, t2.shape[2]), dtype=_np.float32)
            emission[d["idx"], d["lab"]] = d["w"]
            m = Crf2Model(emission, t2, fmt)
        else:
            trans = d["transition"].astype(_np.float32)
            emission = _np.zeros(
                (FEATURE_SPACE, trans.shape[1]), dtype=_np.float32
            )
            emission[d["idx"], d["lab"]] = d["w"]
            m = CrfModel(emission, trans, fmt)
        _MODEL_CACHE[key] = m
    return m


def recognize_batch(
    pdf: pd.DataFrame, model: CrfModel, entity_type: str = "GENE"
) -> pd.DataFrame:
    """Batch core: (conv_id, turn_idx, text) -> mentions rows.

    Pure pandas/numpy — runs identically inside the Spark worker (via
    ``detect_mentions``) and single-process (reference recognizer).
    """
    texts = pdf["text"]
    flat_toks, flat_starts, flat_ends, seq_ids, seq_lens = tokenize_flat(
        texts, fine=True
    )
    n = len(flat_toks)
    empty = pd.DataFrame(
        {
            "conv_id": pd.Series([], dtype="string"),
            "turn_idx": pd.Series([], dtype="int32"),
            "begin_tok": pd.Series([], dtype="int32"),
            "end_tok": pd.Series([], dtype="int32"),
            "begin_char": pd.Series([], dtype="int32"),
            "end_char": pd.Series([], dtype="int32"),
            "entity_type": pd.Series([], dtype="string"),
            "surface": pd.Series([], dtype="string"),
            "score": pd.Series([], dtype="float64"),
        }
    )
    if n == 0:
        return empty

    feat_idx = featurize_flat(flat_toks, seq_ids)
    nonempty = seq_lens > 0
    if hasattr(model, "transition2"):  # order-2 CRF (PSB-2008 best config)
        from .crf import decode2

        labels = decode2(model, feat_idx, seq_lens[nonempty])
    else:
        labels = decode(model, feat_idx, seq_lens[nonempty])
    emit = emission_scores(model, feat_idx)

    # --- mention assembly (P11): scheme-aware contiguous-run grouping ---
    lab = labels.astype(np.int8)
    is_seq_start = np.zeros(n, dtype=bool)
    offs = np.concatenate(([0], np.cumsum(seq_lens[nonempty])[:-1]))
    is_seq_start[offs] = True
    is_seq_end = np.zeros(n, dtype=bool)
    last = np.cumsum(seq_lens[nonempty]) - 1
    is_seq_end[last] = True
    s_idx, e_pos = labels_to_spans(model.fmt, lab, is_seq_start, is_seq_end)

    sent_of = seq_ids[s_idx]
    sent_base = np.concatenate(([0], np.cumsum(seq_lens)[:-1]))
    begin_tok = (s_idx - sent_base[sent_of]).astype(np.int32)
    end_tok = (e_pos - sent_base[sent_of] + 1).astype(np.int32)
    begin_char = flat_starts[s_idx].astype(np.int32)
    end_char = flat_ends[e_pos].astype(np.int32)
    # score: mean Viterbi margin over the span (entity score vs O).
    # Summed PER SPAN (not via a batch-global cumsum): prefix-sum low bits
    # would depend on every preceding token in the Arrow batch, making the
    # score sensitive to batch composition — caught by the streaming==batch
    # equality test.
    margin = (emit[:, 1:].max(axis=1) - emit[:, 0]).astype(np.float64)
    span_len = (e_pos - s_idx + 1).astype(np.float64)
    if len(s_idx):
        # segment sums via reduceat on interleaved (start, end+1) boundaries
        # (vectorized; a per-span Python loop here costs ~25s/job at bench
        # scale). Pad one zero so a span ending at the last token is legal.
        mpad = np.concatenate((margin, [0.0]))
        bounds = np.empty(2 * len(s_idx), dtype=np.int64)
        bounds[0::2] = s_idx
        bounds[1::2] = e_pos + 1
        score = np.add.reduceat(mpad, bounds)[0::2] / span_len
    else:
        score = np.empty(0, dtype=np.float64)

    conv = pdf["conv_id"].to_numpy()
    tidx = pdf["turn_idx"].to_numpy()
    texts_np = texts.to_numpy()
    rows = {
        "conv_id": conv[sent_of],
        "turn_idx": tidx[sent_of].astype(np.int32),
        "begin_tok": begin_tok,
        "end_tok": end_tok,
        "begin_char": begin_char,
        "end_char": end_char,
        "entity_type": np.full(len(s_idx), entity_type, dtype=object),
        "surface": np.array(
            [texts_np[si][b:e] for si, b, e in zip(sent_of, begin_char, end_char)],
            dtype=object,
        ),
        "score": score,
    }
    out = pd.DataFrame(rows)

    # --- local abbreviation post-processing (P13 analogue): a detected
    # mention immediately followed by " (ABBR)" also yields the ABBR span ---
    extra = []
    for si, e in zip(sent_of, end_char):
        text = texts_np[si]
        m = _ABBREV_RE.match(text[e:])
        if m:
            b2 = e + m.start(1)
            e2 = e + m.end(1)
            extra.append(
                (
                    conv[si],
                    int(tidx[si]),
                    -1,
                    -1,
                    b2,
                    e2,
                    entity_type,
                    text[b2:e2],
                    0.0,
                )
            )
    if extra:
        out = pd.concat(
            [out, pd.DataFrame(extra, columns=list(rows.keys()))], ignore_index=True
        )
        out = out.drop_duplicates(
            subset=["conv_id", "turn_idx", "begin_char", "end_char"]
        )
    return out.astype(
        {
            "turn_idx": "int32",
            "begin_tok": "int32",
            "end_tok": "int32",
            "begin_char": "int32",
            "end_char": "int32",
            "score": "float64",
        }
    )


def detect_mentions(
    turns: DataFrame, model_path: str, entity_type: str = "GENE"
) -> DataFrame:
    """Spark stage: turns -> mentions via ONE fused Arrow-batched pass.

    Selects narrow columns first so Catalyst prunes the scan before the
    Arrow boundary (only conv_id/turn_idx/text cross into Python).
    """
    narrow = turns.select("conv_id", "turn_idx", "text")
    with open(model_path, "rb") as f:
        blob = f.read()
    bc = turns.sparkSession.sparkContext.broadcast(blob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _load_model_bytes(bc.value)
        for pdf in batches:
            if len(pdf):
                yield recognize_batch(pdf, model, entity_type)

    return narrow.mapInPandas(run, schema=schemas.MENTIONS)


def paren_balanced(col: str | Column = "surface") -> Column:
    """ParenthesisPostProcessor twin (P12) as a pure column expression:
    keep mentions whose (), [] and {} counts balance."""
    c = F.col(col) if isinstance(col, str) else col

    def bal(open_ch: str, close_ch: str) -> Column:
        return (
            F.length(c) - F.length(F.replace(c, F.lit(open_ch), F.lit("")))
        ) == (F.length(c) - F.length(F.replace(c, F.lit(close_ch), F.lit(""))))

    return bal("(", ")") & bal("[", "]") & bal("{", "}")


def paren_balanced_py(s: str) -> bool:
    """Python twin of ``paren_balanced`` for the golden generator."""
    return (
        s.count("(") == s.count(")")
        and s.count("[") == s.count("]")
        and s.count("{") == s.count("}")
    )


def tokenize_turns(turns: DataFrame, fine: bool = True) -> DataFrame:
    """Standalone tokenizer stage (P2/P3) -> TOKENS schema DataFrame."""
    narrow = turns.select("conv_id", "turn_idx", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            toks, starts, ends = tokenize_batch(pdf["text"], fine=fine)
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy(),
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "tokens": [
                        [
                            {"tok": t, "start": int(s), "end": int(e)}
                            for t, s, e in zip(ts, ss.tolist(), es.tolist())
                        ]
                        for ts, ss, es in zip(toks, starts, ends)
                    ],
                }
            )

    return narrow.mapInPandas(run, schema=schemas.TOKENS)
