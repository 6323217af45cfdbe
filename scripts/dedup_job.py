#!/usr/bin/env python
"""Second-operator scaling job: MinHash-LSH near-dup detection.

The north rule's two-cluster-size criterion is evidenced primarily on the
full KG pipeline (scripts/kg_job.py); this job adds an independent
workload class — the shuffle-heavy dedup path (Arrow-batched shingling →
band explode → bucket groupBy → exact-verify join) — so the scaling
record does not rest on a single job shape. Submitted exactly like
kg_job.py: spark-submit --py-files rbs_pkg.zip, conf on the command line,
taskset-pinned by the caller.

Prints ONE JSON line: {job, parallelism, docs, pairs, wall_sec,
docs_per_sec}. The wall covers the dedup computation and its full
materialization (count), not session startup or the input-warm pre-read.
"""
import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="dir containing documents.parquet")
    ap.add_argument("--parallelism", type=int, required=True)
    a = ap.parse_args()
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from reach_banner_spark.operators.dedup import dedup_minhash_lsh

    # input-warm pre-read (same page-cache equalization as kg_job)
    docs = spark.read.parquet(f"{a.input}/documents.parquet")
    n_docs = docs.count()

    t0 = time.time()
    pairs = dedup_minhash_lsh(spark, a.input)
    n_pairs = pairs.count()
    wall = time.time() - t0
    print(json.dumps({
        "job": "dedup_minhash_lsh",
        "parallelism": a.parallelism,
        "docs": n_docs,
        "pairs": n_pairs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
    }))


if __name__ == "__main__":
    main()
