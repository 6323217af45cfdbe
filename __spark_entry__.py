"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline over the driver's
sf0.001 ``documents`` table adapted to transcript turns; ``queries()`` /
``oracle_sql()`` expose every implemented operator (SURVEY.md §2) with its
DuckDB twin for the per-operator correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime conf to the driver-provided session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline (mention detect -> link -> canonicalize ->
    triples) over sf0.001 documents mapped onto transcript turns, unioned
    with the deterministic synthetic transcript corpus (input_hint shape)."""
    _configure(spark)
    from reach_banner_spark.fixtures import ensure_model, make_lexicon
    from reach_banner_spark.plans.pipeline import run_pipeline
    from reach_banner_spark.sources.transcripts import (
        documents_as_turns,
        synthetic_turns,
    )
    from reach_banner_spark import schemas

    turns = documents_as_turns(spark, SF0001).unionByName(
        synthetic_turns(spark, n_convs=50, skew_conv_turns=200)
    )
    lexicon = spark.createDataFrame(make_lexicon(), schema=schemas.LEXICON)
    return run_pipeline(turns, lexicon, ensure_model(), window_turns=2)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from reach_banner_spark.plans.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every oracle-expressible key in ``queries()``."""
    from reach_banner_spark.plans.registry import all_oracle_sql

    return all_oracle_sql()
