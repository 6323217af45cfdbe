"""BC2GM-format dataset IO (reference: banner.eval.dataset readers [P]).

The reference consumes the BioCreative-II gene-mention corpus as flat text
files [K BC2 task data]:

- sentences: one per line, ``<sentence_id> <text>``;
- gold mentions (``GENE.eval`` / ``ALTGENE.eval``): one per line,
  ``<sentence_id>|<start> <end>|<mention text>`` where start/end are
  *non-whitespace character* offsets (the BC2 convention counts only
  non-space characters).

The engine reads/writes the same format with Spark's text source and pure
column expressions (regexp parsing, no Python), converting BC2's
non-space offsets to/from normal char offsets inside an Arrow batch pass
only where the inverse mapping genuinely needs per-string scanning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_sentences(turns: DataFrame, path: str) -> None:
    """turns -> BC2 sentence file: ``<conv_id>:<turn_idx> <text>``."""
    (
        turns.select(
            F.concat_ws(
                " ",
                F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string")),
                "text",
            ).alias("value")
        ).write.mode("overwrite").text(path)
    )


def read_sentences(spark: SparkSession, path: str) -> DataFrame:
    """BC2 sentence file -> (conv_id, turn_idx, text) via pure exprs."""
    raw = spark.read.text(path)
    sid = F.regexp_extract("value", r"^(\S+) ", 1)
    return raw.select(
        F.split(sid, ":").getItem(0).alias("conv_id"),
        F.split(sid, ":").getItem(1).cast("int").alias("turn_idx"),
        F.expr("substring(value, length(regexp_extract(value, '^(\\\\S+) ', 1)) + 2)").alias(
            "text"
        ),
    )


def _nonspace_offsets(text: str, begin: int, end: int) -> tuple[int, int]:
    """Normal char span -> BC2 non-space offsets (inclusive end)."""
    ns = np.cumsum([0] + [0 if c.isspace() else 1 for c in text])
    # ns[i] = count of non-space chars before position i
    return int(ns[begin]), int(ns[end]) - 1


def _from_nonspace(text: str, b_ns: int, e_ns: int) -> tuple[int, int]:
    """BC2 non-space offsets (inclusive) -> normal char span [begin, end)."""
    pos = [i for i, c in enumerate(text) if not c.isspace()]
    return pos[b_ns], pos[e_ns] + 1


def write_mentions(mentions: DataFrame, turns: DataFrame, path: str) -> None:
    """mentions (+turns for text) -> GENE.eval-style lines."""
    m = mentions.join(
        turns.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
    ).select("conv_id", "turn_idx", "begin_char", "end_char", "text")

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            lines = []
            for c, t, b, e, text in pdf.itertuples(index=False, name=None):
                b_ns, e_ns = _nonspace_offsets(text, int(b), int(e))
                lines.append(f"{c}:{t}|{b_ns} {e_ns}|{text[b:e]}")
            yield pd.DataFrame({"value": lines})

    m.mapInPandas(conv, "value string").write.mode("overwrite").text(path)


def read_mentions(spark: SparkSession, path: str, turns: DataFrame) -> DataFrame:
    """GENE.eval-style lines (+turns for text) -> mention char spans."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.split("value", r"\|").getItem(0).alias("sid"),
        F.split(F.split("value", r"\|").getItem(1), " ").getItem(0)
        .cast("int")
        .alias("b_ns"),
        F.split(F.split("value", r"\|").getItem(1), " ").getItem(1)
        .cast("int")
        .alias("e_ns"),
        F.split("value", r"\|").getItem(2).alias("surface"),
    ).select(
        F.split("sid", ":").getItem(0).alias("conv_id"),
        F.split("sid", ":").getItem(1).cast("int").alias("turn_idx"),
        "b_ns",
        "e_ns",
        "surface",
    )
    joined = parsed.join(
        turns.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
    )

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            for c, t, b_ns, e_ns, surf, text in pdf[
                ["conv_id", "turn_idx", "b_ns", "e_ns", "surface", "text"]
            ].itertuples(index=False, name=None):
                b, e = _from_nonspace(text, int(b_ns), int(e_ns))
                outs.append((c, int(t), b, e, text[b:e]))
            yield pd.DataFrame(
                outs,
                columns=["conv_id", "turn_idx", "begin_char", "end_char", "surface"],
            )

    return joined.mapInPandas(
        conv,
        "conv_id string, turn_idx int, begin_char int, end_char int, surface string",
    )


def read_alt_mentions(
    spark: SparkSession, path: str, turns: DataFrame, gold: DataFrame
) -> DataFrame:
    """ALTGENE.eval-format lines -> alternative spans keyed to their gold.

    The ALTGENE file shares GENE.eval's line format (``<sentence_id>|<start>
    <end>|<text>``, non-space offsets); the BC2 alt_eval protocol associates
    each alternative with the gold gene whose span it OVERLAPS in the same
    sentence. Output columns match ``eval_exact_span(alt=...)``:
    (conv_id, turn_idx, gold_begin, gold_end, begin_char, end_char).
    Alternatives overlapping no gold are dropped (they can credit nothing).
    """
    alts = read_mentions(spark, path, turns)
    g = gold.select(
        "conv_id",
        "turn_idx",
        F.col("begin_char").alias("gold_begin"),
        F.col("end_char").alias("gold_end"),
    )
    return (
        alts.join(g, ["conv_id", "turn_idx"])
        .filter(
            (F.col("begin_char") < F.col("gold_end"))
            & (F.col("gold_begin") < F.col("end_char"))
        )
        .select(
            "conv_id", "turn_idx", "gold_begin", "gold_end", "begin_char", "end_char"
        )
    )
