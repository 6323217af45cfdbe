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


def documents_as_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id")
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    tools = F.array(F.lit(""), F.lit("search"), F.lit("python"), F.lit("browser"))
    return docs.select(
        F.col("source").cast("string").alias("conv_id"),
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        F.element_at(roles, (F.col("doc_id") % 4 + 1).cast("int")).alias("role"),
        F.col("text"),
        F.element_at(tools, (F.col("doc_id") % 3 + 1).cast("int")).alias("tool"),
        F.to_timestamp(
            F.lit("2025-01-01 00:00:00")
        ).alias("ts"),
    )


def synthetic_turns(spark: SparkSession, n_convs: int = 200,
                    skew_conv_turns: int = 1000, seed: int = 42) -> DataFrame:
    from ..fixtures import make_turns

    turns_pdf, _ = make_turns(n_convs=n_convs, skew_conv_turns=skew_conv_turns, seed=seed)
    return spark.createDataFrame(turns_pdf, schema=schemas.TURNS)
