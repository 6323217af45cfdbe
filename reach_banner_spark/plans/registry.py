"""Aggregates every operator registry into the driver contract shape.

Modules register into their own REGISTRY dicts; this module unions them.
Import order is the single source of truth for which surfaces exist.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _registries() -> list[dict[str, tuple[QueryFn, str | None]]]:
    regs = []
    from . import relational

    regs.append(relational.REGISTRY)
    try:
        from . import kg_queries

        regs.append(kg_queries.REGISTRY)
    except ImportError:
        pass
    try:
        from ..operators import dedup, multimodal, similarity, textstats

        regs.extend(
            [
                dedup.REGISTRY,
                similarity.REGISTRY,
                textstats.REGISTRY,
                multimodal.REGISTRY,
            ]
        )
    except ImportError:
        pass
    try:
        from ..streaming import ops as stream_ops

        regs.append(stream_ops.REGISTRY)
    except ImportError:
        pass
    return regs


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
