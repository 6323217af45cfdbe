"""Custom Python DataSource (PySpark 4 ``pyspark.sql.datasource`` API).

The extension point a Spark-native engine must expose: when a corpus
lives in a format no built-in reader speaks (proprietary log framing,
research dump formats, KG interchange files), users plug in a reader
that Spark schedules like any other scan — one InputPartition per file,
readers executing in parallel Python workers, the result a normal
DataFrame that every downstream operator (and Catalyst pruning above
the scan) composes with.

``TsvDocsDataSource`` reads the tab-separated one-line-per-doc text
layout that ``source_text`` stages (and that sink_nquads_text's family
writes) — so the same bytes are read by a built-in reader and by this
plug-in, and the oracle can pin both to the documents view.

Classes live at module top level so they pickle to executors.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _TsvFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _TsvDocsReader(DataSourceReader):
    def __init__(self, root: str):
        self.root = root

    def partitions(self):
        # one partition per data file — the natural parallel grain; at
        # real scale a planner would coalesce small files into splits
        files = sorted(
            f
            for f in os.listdir(self.root)
            if f.startswith("part-") and not f.endswith(".crc")
        )
        return [_TsvFilePartition(os.path.join(self.root, f)) for f in files]

    def read(self, partition: _TsvFilePartition):
        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                doc_id, lang, source, n_chars = line.split("\t")
                yield (int(doc_id), lang, source, int(n_chars))


class TsvDocsDataSource(DataSource):
    """``spark.read.format("rbs_tsv_docs").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "rbs_tsv_docs"

    def schema(self) -> str:
        return "doc_id bigint, lang string, source string, n_chars bigint"

    def reader(self, schema) -> DataSourceReader:
        return _TsvDocsReader(self.options["path"])
