"""Hive-style partitioned parquet layout + partition pruning.

At 100 TB the cheapest scan is the one that never opens the file: a
fact table written with ``partitionBy(time_key)`` turns a predicate
on that key into directory-level pruning — the planner's
``PartitionFilters`` eliminate whole partitions from the file index
before any parquet footer is read. This is the standard layout for a
time-partitioned ingest (one partition per day/year), complementing
bucketing (sources/bucketed.py: shuffle-free joins) with
scan-elimination for time-ranged queries.

The reference has no table layout at all (one flat ``data.txt``,
`/root/reference/index.js:109-122`); this is pure engine extension.

``tests/test_partitioned.py`` asserts the plan-level evidence: the
pruned scan's ``PartitionFilters`` carry the year predicate and the
scanned file count equals one partition's worth, not the table's.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

PRUNE_YEAR = 1995


def partitioned_path() -> str:
    """Per-process scratch dir (same hygiene as the bucketed-table
    warehouse in session.py: never litter the caller's cwd)."""
    return os.path.join(
        tempfile.gettempdir(), f"spark_part_{os.getpid()}", "orders_by_year"
    )


def write_orders_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """orders → parquet partitioned by o_year (derived from
    o_orderdate). One shuffle-free write; every later query with a
    year predicate prunes to matching directories."""
    path = partitioned_path()
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    orders.write.mode("overwrite").partitionBy("o_year").parquet(path)
    return path


def read_orders_pruned(spark: SparkSession, year: int = PRUNE_YEAR) -> DataFrame:
    """Scan restricted by the partition column — the filter resolves
    against directory names (PartitionFilters), not row groups."""
    return spark.read.parquet(partitioned_path()).filter(F.col("o_year") == year)


def partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: write the partitioned layout, then answer a
    year-scoped monthly rollup from the pruned scan.

    The decimal accumulate → double cast makes the money sum exact
    and engine-portable (same pattern as sources/bucketed.py).
    """
    write_orders_partitioned(spark, sf_dir)
    pruned = read_orders_pruned(spark)
    return (
        pruned.groupBy(F.month("o_orderdate").alias("o_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_month")
    )


PARTITION_PRUNING_SQL = f"""
SELECT month(o_orderdate) AS o_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders
WHERE year(o_orderdate) = {PRUNE_YEAR}
GROUP BY o_month
ORDER BY o_month
"""
