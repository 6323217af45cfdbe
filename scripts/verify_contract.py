#!/usr/bin/env python
"""Full driver-contract verification: EVERY queries() key, cold.

The driver's CORRECTNESS gate samples keys; this script runs the whole
surface the same way (row count + column set + order-insensitive value
hash vs the DuckDB oracle at sf0.01; rows-only for ∅-oracle keys) and
writes CONTRACT_VERIFY.json so per-key verification is on record even for
keys a sampling driver skips.

Run:  python scripts/verify_contract.py [sf_dir] [key1,key2,...]
(with a key filter, CONTRACT_VERIFY.json is NOT rewritten — targeted runs
print per-key results only)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    import __spark_entry__ as em
    from oracle_util import duckdb_con, compare

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    q, o = em.queries(), em.oracle_sql()
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    if only:
        missing = only - set(q)
        if missing:
            raise SystemExit(f"unknown keys: {sorted(missing)}")
    con = duckdb_con(sf)
    report: dict[str, dict] = {}
    for key in sorted(only or q):
        t0 = time.time()
        try:
            if key in o:
                ok, msg = compare(q[key](spark, sf), con, o[key])
                report[key] = {
                    "mode": "oracle",
                    "ok": bool(ok),
                    "detail": "" if ok else msg[:300],
                }
            else:
                n = q[key](spark, sf).count()
                report[key] = {"mode": "rows_only", "ok": n >= 0, "rows": int(n)}
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            report[key] = {"mode": "err", "ok": False, "detail": repr(e)[:300]}
        report[key]["sec"] = round(time.time() - t0, 2)
        print(key, "OK" if report[key]["ok"] else "FAIL", flush=True)

    n_ok = sum(1 for r in report.values() if r["ok"])
    out = {
        "sf": sf,
        "keys": len(report),
        "ok": n_ok,
        "oracle_keys": len(o),
        "report": report,
    }
    if only is None:  # targeted runs must not masquerade as full records
        with open(os.path.join(REPO, "CONTRACT_VERIFY.json"), "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"keys": len(report), "ok": n_ok}))
    sys.exit(0 if n_ok == len(report) else 1)


if __name__ == "__main__":
    main()
