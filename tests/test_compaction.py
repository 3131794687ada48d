"""Small-file compaction: file-shape evidence (the DuckDB oracle pins
content preservation; these pin the layout improvement)."""

from __future__ import annotations

import math
import os

from cgtcalc_data_transformer_spark.sources.compaction import (
    TARGET_FILE_BYTES,
    compact,
    dir_bytes,
    fragment_orders,
)

SF = "/root/testdata/sf0.001"


def _parquet_files(path: str) -> list[str]:
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_compaction_reduces_file_count(spark):
    src = fragment_orders(spark, SF)
    n_before = len(_parquet_files(src))
    assert n_before > 10, "fragmentation fixture must produce many files"

    out = compact(spark, src)
    n_after = len(_parquet_files(out))
    expected = max(1, math.ceil(dir_bytes(src) / TARGET_FILE_BYTES))
    assert n_after == expected
    assert n_after < n_before

    # content preserved through the rewrite
    rows_src = spark.read.parquet(src).count()
    rows_out = spark.read.parquet(out).count()
    assert rows_src == rows_out
