"""Iceberg-or-Parquet table facade (G7, SURVEY.md §4.3).

The north rule materializes graph tables as partitioned Iceberg tables. The
sandbox has no Iceberg runtime jar (verified: absent from /opt/spark/jars),
so this facade writes Iceberg when the catalog is available and otherwise
emulates the layout: hash-bucket partitioned Parquet + a JSON manifest
(snapshot id, partition spec, per-partition row counts + content hashes) —
the pieces of Iceberg metadata the engine actually relies on (partition
pruning + resumability). On a real cluster the same call sites switch to
``writeTo(...).partitionedBy(...)`` with zero pipeline changes.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def iceberg_writer(
    df: DataFrame, table: str, bucket_col: str = "conv_id", n_buckets: int = 64
):
    """The real Iceberg write path: a DataFrameWriterV2 configured with the
    same bucket partition spec the Parquet facade emulates. Construction is
    jar-independent (nothing touches the catalog until create/append), so
    this branch is unit-testable in the jar-less sandbox; on a cluster with
    the Iceberg catalog, ``iceberg_writer(df, t).createOrReplace()`` is the
    whole write."""
    return (
        df.writeTo(table)
        .partitionedBy(F.bucket(n_buckets, F.col(bucket_col)))
        .tableProperty("write.format.default", "parquet")
    )


def write_graph_table(
    df: DataFrame,
    path: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 64,
    snapshot_note: str = "",
    iceberg_table: str | None = None,
) -> dict:
    """Write a bucket-partitioned graph table + manifest; returns manifest.

    Composed of ``write_graph_data`` (the heavy bucketed write) and
    ``finalize_graph_manifest`` (the stats read-back + manifest) — split
    in r6 so the checkpointed pipeline can overlap a stage's manifest
    stats with the NEXT stage's write (guide §2.6); this one-call form
    keeps the original synchronous contract for every other caller."""
    schema_json = write_graph_data(
        df, path, bucket_col=bucket_col, n_buckets=n_buckets,
        iceberg_table=iceberg_table,
    )
    return finalize_graph_manifest(
        df.sparkSession, path, schema_json, df.columns,
        bucket_col=bucket_col, n_buckets=n_buckets,
        snapshot_note=snapshot_note,
    )


def write_graph_data(
    df: DataFrame,
    path: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 64,
    iceberg_table: str | None = None,
) -> str:
    """The data half of ``write_graph_table``: bucketed partitioned
    parquet (or Iceberg when available), returning the schema JSON the
    manifest needs.

    When an Iceberg catalog is on the classpath AND ``iceberg_table`` is
    given, the data goes through ``writeTo(...).partitionedBy(bucket(...))``
    (the manifest is still written beside it for checkpoint lineage);
    otherwise the partitioned-Parquet emulation below."""
    spark = df.sparkSession
    if iceberg_table is not None and iceberg_available(spark):
        iceberg_writer(df, iceberg_table, bucket_col, n_buckets).createOrReplace()
    schema_json = df.schema.json()
    bucketed = df.withColumn(
        "p_bucket", F.pmod(F.hash(F.col(bucket_col)), F.lit(n_buckets))
    )
    # One shuffle on the bucket key before the partitioned write — the
    # parquet twin of Iceberg's write.distribution-mode=hash. Without it
    # every upstream task appends a file into every bucket dir it touches
    # (up to tasks x n_buckets files per stage — measured as the dominant
    # checkpoint overhead); with it each bucket is written by one task,
    # so the table is n_buckets files and the read-back stats scan opens
    # 64 footers instead of ~2k. At sizes where one task per bucket would
    # bottleneck the write, salt the repartition key to a multiple of
    # n_buckets — the manifest hashes are order-insensitive so the layout
    # is free to change.
    (
        bucketed.repartition(n_buckets, F.col("p_bucket"))
        .write.mode("overwrite")
        .partitionBy("p_bucket")
        .parquet(path)
    )
    return schema_json


def finalize_graph_manifest(
    spark: SparkSession,
    path: str,
    schema_json: str,
    columns: list,
    bucket_col: str = "conv_id",
    n_buckets: int = 64,
    snapshot_note: str = "",
) -> dict:
    """The manifest half of ``write_graph_table``: per-bucket row counts
    + order-insensitive content hashes of the DURABLY WRITTEN data (the
    read-back is deliberate: the hash certifies what is on disk), then
    the manifest sidecar."""
    try:
        back = spark.read.parquet(path)
        stats = (
            back.groupBy("p_bucket")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                # order-insensitive content hash: sum of bounded row hashes
                # (bounded to 2^40 so the ANSI-mode long sum can never overflow)
                F.sum(F.pmod(F.xxhash64(*[c for c in columns]), F.lit(1 << 40))).alias(
                    "content_hash"
                ),
            )
            .collect()
        )
    except Exception:
        # an EMPTY input writes no part files, so the read-back cannot
        # infer a schema — a legitimate table state (empty corpus), not
        # an error; the manifest records zero partitions and the stored
        # schema lets read_graph_table reconstruct the empty frame
        stats = []
    manifest = {
        "format": "parquet-bucketed-v1",
        "iceberg": iceberg_available(spark),
        "path": path,
        "schema": schema_json,
        "partition_spec": {"bucket_col": bucket_col, "n_buckets": n_buckets},
        "snapshot_ts": time.time(),
        "note": snapshot_note,
        "partitions": {
            str(r["p_bucket"]): {
                "rows": r["rows"],
                "content_hash": int(r["content_hash"] or 0),
            }
            for r in stats
        },
        "total_rows": int(sum(r["rows"] for r in stats)),
    }
    with open(os.path.join(path, "_rbs_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_graph_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a graph table back (dropping the physical bucket column). An
    empty table has no part files to infer a schema from — the manifest's
    stored schema reconstructs the empty frame instead (an empty corpus
    is a legitimate state everywhere upstream degrades to empty)."""
    m = read_manifest(path)
    if m is not None and m.get("total_rows", -1) == 0 and "schema" in m:
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(m["schema"]))
        )
    return spark.read.parquet(path).drop("p_bucket")


def read_manifest(path: str) -> dict | None:
    p = os.path.join(path, "_rbs_manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
