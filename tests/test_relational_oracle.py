"""Every registered oracle-keyed operator vs DuckDB at sf0.001 + sf0.01.

Mirrors the driver's per-operator gate (SURVEY.md §5.2.1) so failures
surface locally before the round verify.
"""

from __future__ import annotations

import pytest

from .oracle_util import compare, duckdb_con

SF = "/root/testdata/sf0.001"


def _keys():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return sorted(k for k in q if k in o)


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("key", _keys())
def test_oracle_parity(spark, con, key):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[key]
    sql = entrymod.oracle_sql()[key]
    ok, msg = compare(fn(spark, SF), con, sql)
    assert ok, f"{key}: {msg}"


def test_rows_only_keys_run(spark):
    """∅-oracle keys must still execute and return a stable schema."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    for key in sorted(set(q) - set(o)):
        df = q[key](spark, SF)
        assert df.columns, key
        assert df.count() >= 0, key
