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


# ------------------------------------------ dynamic partition pruning
def campaign_years_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small derived dim: shipping years that saw extreme-discount
    bulk lines (l_discount >= 0.10 AND l_quantity >= 49). At sf0.001
    this keeps 4 of the 7 years — the fact scan must prune the other
    3 directories at RUNTIME, because the qualifying set is data,
    not a literal."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_discount") >= 0.10) & (F.col("l_quantity") >= 49))
        .select(F.year("l_shipdate").alias("y"))
        .distinct()
    )


def dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema probe whose partition filter is NOT a literal: the
    year-partitioned orders fact joins a *derived* year dim (campaign
    years) on the partition column itself, then rolls up revenue.

    Catalyst's dynamic partition pruning inserts the dim as a runtime
    IN-subquery on the fact scan (``dynamicpruning`` expression in
    PartitionFilters — plan-asserted in tests/test_partitioned.py),
    so directories for non-qualifying years are never listed or read.
    The dim side is broadcast (it is a <10-row distinct), and the
    same broadcast exchange is REUSED as the pruning subquery — one
    dim scan total. At 100 TB this is the difference between reading
    every partition of a years-deep fact table and only the ones the
    dim actually references; no static predicate could express it
    because the qualifying years are themselves a query result.
    """
    write_orders_partitioned(spark, sf_dir)
    fact = spark.read.parquet(partitioned_path())
    dim = campaign_years_dim(spark, sf_dir)
    return (
        fact.join(F.broadcast(dim), fact.o_year == dim.y)
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_year")
    )


DPP_SQL = """
WITH dim AS (
  SELECT DISTINCT year(l_shipdate) AS y
  FROM lineitem
  WHERE l_discount >= 0.10 AND l_quantity >= 49
)
SELECT year(o_orderdate) AS o_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders o
JOIN dim ON year(o.o_orderdate) = dim.y
GROUP BY o_year
ORDER BY o_year
"""


# ------------------------------------------ dynamic partition overwrite
UPDATE_FACTOR = 1.1  # the "restated" partition's price adjustment


def dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level restatement via DYNAMIC partition overwrite:
    rewrite ONLY the partitions present in the incoming frame, leave
    every other partition's files untouched.

    This is the warehouse backfill primitive — "re-run one day" — and
    the semantics STATIC overwrite gets catastrophically wrong (it
    truncates the whole table first). The audit result reads the
    table back after overwriting the {prune_year} partition with
    10%-adjusted prices: that year must show adjusted sums with an
    unchanged row count, all other years byte-identical to the
    original — which is exactly what the DuckDB oracle computes from
    the source table with a CASE on the year.

    Scale shape: the overwrite writes one partition's worth of data
    (shuffle-free append to new files + atomic directory swap); the
    untouched partitions cost nothing — no read, no rewrite.
    """
    path = os.path.join(
        tempfile.gettempdir(), f"spark_part_{os.getpid()}", "orders_dpo"
    )
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    sel = ["o_orderkey", "o_totalprice", "o_year"]
    orders.select(*sel).write.mode("overwrite").partitionBy("o_year").parquet(path)

    restated = (
        orders.filter(F.col("o_year") == PRUNE_YEAR)
        .withColumn("o_totalprice", F.col("o_totalprice") * UPDATE_FACTOR)
        .select(*sel)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        restated.write.mode("overwrite").partitionBy("o_year").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.parquet(path)
    return (
        back.groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("price_total"),
        )
        .orderBy("o_year")
    )


DPO_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CASE WHEN year(o_orderdate) = {PRUNE_YEAR}
                          THEN o_totalprice * {UPDATE_FACTOR}
                          ELSE o_totalprice END AS DECIMAL(28,6))) AS DOUBLE) AS price_total
FROM orders
GROUP BY 1
ORDER BY 1
"""
