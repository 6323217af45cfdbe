"""Local twin of the driver's DuckDB oracle comparison.

Mirrors the documented check: row-count + schema(column names) +
order-insensitive value hash. Values are canonicalized (floats via repr of
round-trip float, timestamps via isoformat) before hashing so engine-side
formatting differences don't cause false mismatches the driver itself would
not produce; genuine value differences still fail.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return repr(round(v, 9))
        return repr(round(v, 9))
    if isinstance(v, (datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_signature(df: pd.DataFrame) -> tuple[int, tuple[str, ...], int]:
    cols = tuple(sorted(df.columns))
    rows = [
        tuple(_canon(v) for v in row)
        for row in df[list(cols)].itertuples(index=False, name=None)
    ]
    rows.sort()
    return len(df), cols, hash(tuple(rows))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    got = spark_df.toPandas()
    want = con.sql(sql).df()
    ns, cs, hs = table_signature(got)
    no, co, ho = table_signature(want)
    if ns != no:
        return False, f"row count {ns} != oracle {no}"
    if cs != co:
        return False, f"columns {cs} != oracle {co}"
    if hs != ho:
        # find a sample difference for debugging
        g = got[list(cs)].copy()
        w = want[list(co)].copy()
        g2 = g.map(_canon).sort_values(list(cs)).reset_index(drop=True)
        w2 = w.map(_canon).sort_values(list(co)).reset_index(drop=True)
        neq = (g2 != w2).any(axis=1)
        idx = neq.idxmax() if neq.any() else None
        detail = (
            f"first diff row {idx}:\n spark={g2.iloc[idx].to_dict()}\n "
            f"oracle={w2.iloc[idx].to_dict()}"
            if idx is not None
            else "hash mismatch (ordering?)"
        )
        return False, f"value hash mismatch; {detail}"
    return True, "ok"
