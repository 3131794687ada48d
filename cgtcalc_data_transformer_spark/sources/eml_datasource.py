"""Spark 4 Python DataSource for .eml directories.

``sources/eml.py`` reads mail directories through the built-in
``wholetext`` text source. This module exposes the same rows through
Spark 4's pluggable Python DataSource API (SPARK-44076) — the
idiomatic extension point when a format needs listing/decoding logic
the built-in readers don't have (here: case-insensitive ``.eml``
filtering at LISTING time and explicit control of files-per-task
batching, the two things the reference does imperatively at
`/root/reference/index.js:68-71`).

Scale shape: the driver only LISTS the directory (names, not bytes);
file contents are read inside ``read()`` on executors, one task per
``filesPerPartition`` batch — a directory of millions of emails fans
out across the cluster with bounded per-task memory.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class EmlInputPartition(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class EmlDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("eml datasource requires a directory path")
        self.files_per_partition = int(options.get("filesPerPartition", "64"))

    def partitions(self) -> list[EmlInputPartition]:
        # names only on the driver; case-insensitive .eml like index.js:69-71
        files = sorted(
            f
            for f in glob.glob(os.path.join(self.path, "*"))
            if f.lower().endswith(".eml") and os.path.isfile(f)
        )
        n = self.files_per_partition
        parts = [EmlInputPartition(files[i : i + n]) for i in range(0, len(files), n)]
        return parts or [EmlInputPartition([])]

    def read(self, partition: EmlInputPartition):
        for f in partition.files:
            with open(f, encoding="utf-8", errors="replace") as fh:
                yield (f"file://{os.path.abspath(f)}", fh.read())


class EmlDataSource(DataSource):
    """``spark.read.format("eml").load(dir)`` → (file_name, text)."""

    @classmethod
    def name(cls) -> str:
        return "eml"

    def schema(self) -> str:
        return "file_name string, text string"

    def reader(self, schema) -> EmlDataSourceReader:  # noqa: ANN001
        return EmlDataSourceReader(self.options)


def register(spark) -> None:  # noqa: ANN001
    """Idempotent session-level registration."""
    spark.dataSource.register(EmlDataSource)
