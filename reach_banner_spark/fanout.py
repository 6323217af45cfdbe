"""Scan fan-out for compute-bound map stages.

The test corpora are single-row-group parquet files, and a parquet row
group is the minimum input-split unit — so a file scan yields ONE task no
matter what ``spark.sql.files.maxPartitionBytes`` says, and any key whose
per-row compute dominates (XML parse, regex passes, per-row md5 shingles,
array algebra, try_cast exception paths) runs its whole map stage on one
core of ``local[N]``.

``fan_out`` inserts an explicit hash repartition keyed on a unique column
ahead of the expensive projection:

- sized from ``spark.sql.shuffle.partitions`` — scale-adaptive (the local
  bench sets it to the core count; a cluster sets it to ~2-3x total
  cores), never a hard-coded constant;
- with an EXPLICIT numPartitions, so AQE's partition coalescing cannot
  fold the (byte-wise tiny) local input back into one partition — the
  whole point is task count, not bytes;
- keyed on a unique id column (hash partitioning spreads evenly and
  skips the local sort a round-robin ``repartition(n)`` pays for
  deterministic retries, guide §2.5);
- only when the scan actually under-splits: if the source already yields
  >= that many partitions (the 100 TB layout — many row groups), the
  repartition is skipped and the plan is unchanged, so this never adds a
  shuffle to a well-partitioned input.

The trade is one exchange of the input bytes, which at bench scale is
single-digit MBs against 10-30x more cores applied to the map stage; at
production scale the gate above makes it a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, *cols: str) -> DataFrame:
    """Rebalance ``df`` across ``spark.sql.shuffle.partitions`` tasks by
    hashing ``cols`` (a unique key), unless the plan already yields at
    least that many partitions."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *cols)
