"""Transcript-turn sources.

Two ways to obtain a ``turns`` table (input_hint schema
``conv_id, turn_idx, role, text, tool, ts``):

- ``synthetic_turns``: the deterministic seeded fixture corpus
  (fixtures.make_turns) materialized through Spark — used by tests/bench;
- ``documents_as_turns``: a deterministic adapter mapping the driver's
  ``documents`` parquet (doc_id, text, lang, source, n_chars) onto the turns
  shape, so the flagship ``entry()`` runs the KG pipeline over real driver
  test data. Mapping is pure column expressions: conversations are keyed by
  ``source``, turn order by ``doc_id`` within source, role/tool derived from
  ``doc_id`` arithmetic — all deterministic and oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import schemas


_SENT_SEP = "\x01"


def break_sentences(
    df: DataFrame, id_cols: tuple[str, ...] = ("doc_id",), text_col: str = "text"
) -> DataFrame:
    """P1 sentence breaking: offset-preserving split at `. ` / `! ` / `? `.

    The boundary space is rewritten to a sentinel of the SAME length before
    splitting, so every sentence's char_offset into the original text is
    exactly the running sum of len(sentence)+1 — the invariant
    ``substr(text, char_offset+1, len(sentence)) == sentence`` holds and is
    pytest-asserted. Pure column expressions + posexplode; the DuckDB twin
    is the identical replace/split/window spelling (no lookbehind regex —
    RE2 lacks it).
    """
    marked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), r"\. ", "." + _SENT_SEP),
            r"! ",
            "!" + _SENT_SEP,
        ),
        r"\? ",
        "?" + _SENT_SEP,
    )
    s = df.select(
        *id_cols, F.posexplode(F.split(marked, _SENT_SEP)).alias("sent_idx", "sentence")
    )
    w = (
        Window.partitionBy(*id_cols)
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return s.select(
        *id_cols,
        F.col("sent_idx").cast("int").alias("sent_idx"),
        "sentence",
        F.coalesce(F.sum(F.length("sentence") + 1).over(w), F.lit(0))
        .cast("int")
        .alias("char_offset"),
    )


def documents_as_turns(
    spark: SparkSession, sf_dir: str, sentences: bool = False
) -> DataFrame:
    from ..caching import cached_scan

    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id")
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    tools = F.array(F.lit(""), F.lit("search"), F.lit("python"), F.lit("browser"))
    turns = docs.select(
        F.col("source").cast("string").alias("conv_id"),
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        F.element_at(roles, (F.col("doc_id") % 4 + 1).cast("int")).alias("role"),
        F.col("text"),
        F.element_at(tools, (F.col("doc_id") % 3 + 1).cast("int")).alias("tool"),
        F.to_timestamp(
            F.lit("2025-01-01 00:00:00")
        ).alias("ts"),
    )
    if not sentences:
        return turns
    # P1 opt-in: whole documents become one unit per SENTENCE; turn_idx is
    # re-densified within the conversation under (orig turn, sent order) so
    # downstream windows stay contiguous.
    sent = break_sentences(
        turns, id_cols=("conv_id", "turn_idx", "role", "tool", "ts"), text_col="text"
    ).filter(F.length("sentence") > 0)
    w2 = Window.partitionBy("conv_id").orderBy("turn_idx", "sent_idx")
    return sent.select(
        "conv_id",
        (F.row_number().over(w2) - F.lit(1)).cast("int").alias("turn_idx"),
        "role",
        F.col("sentence").alias("text"),
        "tool",
        "ts",
    )


def synthetic_turns(spark: SparkSession, n_convs: int = 200,
                    skew_conv_turns: int = 1000, seed: int = 42) -> DataFrame:
    from ..fixtures import make_turns

    turns_pdf, _ = make_turns(n_convs=n_convs, skew_conv_turns=skew_conv_turns, seed=seed)
    return spark.createDataFrame(turns_pdf, schema=schemas.TURNS)
