"""Small-file compaction: rewrite a fragmented parquet layout into
size-targeted files.

The classic 100 TB operational problem: streaming/incremental ingest
leaves thousands of KB-scale files per partition; every scan then
pays per-file open/footer costs and the driver pays file-index
memory. The compactor reads the fragmented layout, computes the
target file count from actual on-disk bytes, and rewrites with
``repartition(n)`` — one shuffle, after which scans read few
well-sized files.

The reference has no file management at all (single ``data.txt``
rewrite, `/root/reference/index.js:121-122`); this is pure engine
extension.

Correctness contract: compaction must be CONTENT-PRESERVING. The
registry query re-aggregates content invariants (row count, key sum,
exact decimal money sum) from the compacted layout; the DuckDB
oracle computes the same invariants from the original table, so any
row lost or duplicated by the rewrite breaks the hash match. File-
count and size-shape evidence is pinned in tests/test_compaction.py.
"""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

TARGET_FILE_BYTES = 8 * 1024 * 1024  # demo target; 128-512 MB at scale
FRAGMENT_PARTITIONS = 64             # deliberately fragmented input


def _scratch(name: str) -> str:
    return os.path.join(tempfile.gettempdir(), f"spark_compact_{os.getpid()}", name)


def fragment_orders(spark: SparkSession, sf_dir: str) -> str:
    """Simulate ingest debris: orders as FRAGMENT_PARTITIONS tiny
    files (round-robin repartition ≈ equal-size shards)."""
    path = _scratch("orders_fragmented")
    load_table(spark, sf_dir, "orders").repartition(FRAGMENT_PARTITIONS).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def compact(
    spark: SparkSession, src: str, target_bytes: int = TARGET_FILE_BYTES
) -> str:
    """Rewrite ``src`` into ceil(bytes/target) files.

    Sizing from actual on-disk bytes (not row counts): compression
    ratio varies per dataset, and bytes are what scan latency and
    file-index memory are made of. ``repartition`` (round-robin)
    gives equal-size output shards; a sort-based variant would use
    ``repartitionByRange`` to add clustering while compacting.
    """
    out = _scratch("orders_compacted")
    n_files = max(1, math.ceil(dir_bytes(src) / target_bytes))
    spark.read.parquet(src).repartition(n_files).write.mode("overwrite").parquet(out)
    return out


def compact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: fragment → compact → prove content preserved.

    Returns one row of content invariants computed FROM THE COMPACTED
    FILES; the oracle computes them from the original table. Exact
    decimal money accumulation keeps the sum order-independent."""
    compacted = compact(spark, fragment_orders(spark, sf_dir))
    return spark.read.parquet(compacted).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
        F.count_distinct("o_orderkey").alias("n_keys"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .cast("double")
        .alias("total_price"),
    )


COMPACT_ORDERS_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       COUNT(DISTINCT o_orderkey) AS n_keys,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders
"""
