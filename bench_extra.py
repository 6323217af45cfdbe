#!/usr/bin/env python
"""Per-key isolation bench (guide §1.4): times individual queries() keys
with the noop sink and optionally dumps .explain("formatted") plans.

bench.py is FROZEN for driver measurement; this harness exists so the
optimization round can isolate single keys without touching it.

Usage:
  python bench_extra.py KEY [KEY ...]            # time keys, 3 trials
  RBS_EXTRA_TRIALS=2 python bench_extra.py KEY   # fewer trials
  RBS_EXTRA_PLAN_DIR=plans/r06 RBS_EXTRA_PLAN_SUFFIX=_before \
      python bench_extra.py KEY                  # also dump plans

Env (same contract as bench.py):
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = max(1, int(os.environ.get("RBS_EXTRA_TRIALS", "3")))
PLAN_DIR = os.environ.get("RBS_EXTRA_PLAN_DIR", "")
PLAN_SUFFIX = os.environ.get("RBS_EXTRA_PLAN_SUFFIX", "")


def main() -> None:
    keys = sys.argv[1:]
    if not keys:
        print("usage: bench_extra.py KEY [KEY ...]", file=sys.stderr)
        sys.exit(2)

    from reach_banner_spark.session import build_session

    spark = build_session(
        app_name="rbs-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    q = em.queries()
    spark.range(1000000).selectExpr("sum(id)").collect()  # warm workers

    # epoch control identical to bench.py's, for cross-run comparability
    ctl = []
    for _ in range(2):
        t0 = time.time()
        (
            spark.range(30_000_000)
            .selectExpr("id % 10000 AS k", "id AS v")
            .groupBy("k")
            .agg({"v": "sum"})
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        ctl.append(round(time.time() - t0, 3))

    out: dict[str, object] = {
        "sf": SF_DIR,
        "cpus": CPUS,
        "epoch_control_sec": min(ctl),
        "queries": {},
        "trials": {},
    }
    for key in keys:
        fn = q[key]
        if PLAN_DIR:
            os.makedirs(PLAN_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(PLAN_DIR, f"{key}{PLAN_SUFFIX}.txt"), "w"
            ) as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"bench_extra: {key}")
        ts = []
        for _ in range(TRIALS):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out["trials"][key] = ts
        out["queries"][key] = min(ts)
        print(f"# {key}: min={min(ts)} trials={ts}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
