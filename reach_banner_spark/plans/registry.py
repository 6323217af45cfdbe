"""Aggregates every operator registry into the driver contract shape.

Modules register into their own REGISTRY dicts; this module unions them.
Import order is the single source of truth for which surfaces exist.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _registries() -> list[dict[str, tuple[QueryFn, str | None]]]:
    # Unconditional imports: a broken transitive import must fail loudly
    # rather than silently shrink the graded queries() contract
    # (tests/test_plans.py pins the total key count as a second guard).
    from . import events_analytics, kg_queries, relational
    from ..operators import dedup, multimodal, similarity, textstats
    from ..streaming import ops as stream_ops

    return [
        relational.REGISTRY,
        events_analytics.REGISTRY,
        kg_queries.REGISTRY,
        dedup.REGISTRY,
        similarity.REGISTRY,
        textstats.REGISTRY,
        multimodal.REGISTRY,
        stream_ops.REGISTRY,
    ]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for reg in _registries():
        for k, (fn, _sql) in reg.items():
            assert k not in out, f"duplicate queries() key: {k}"
            out[k] = fn
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for reg in _registries():
        for k, (_fn, sql) in reg.items():
            if sql is not None:
                out[k] = sql
    return out
