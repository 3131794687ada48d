"""Bucketed-table write + co-located joins (the zero-shuffle path).

At 100 TB the dominant cost of a fact⋈fact join (orders⋈lineitem) is
shuffling both sides on the key. Bucketing pays that shuffle ONCE at
write time: both tables hash-partitioned into the same number of
buckets on the join key, optionally sorted within buckets. Every
subsequent join or aggregation on that key is exchange-free — the
planner sees matching ``HashPartitioning`` output from the scans and
elides both Exchanges (and, with sorted buckets, both Sorts).

The reference has no table concept at all (one flat ``data.txt``,
`/root/reference/index.js:109-122`); this is pure engine extension.

Bucketed writes need a table catalog (``saveAsTable``); sessions
created by :func:`cgtcalc_data_transformer_spark.session.get_spark`
point the warehouse + Derby metastore at a per-process temp dir so
nothing leaks into the caller's cwd.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """Drop ``table`` from the catalog AND remove its would-be
    warehouse location on disk.

    ``mode("overwrite")`` can only replace a table the catalog knows
    about; a directory left behind by an earlier process (recycled
    pid, persistent /tmp) with a FRESH in-memory catalog makes
    ``saveAsTable`` throw LOCATION_ALREADY_EXISTS — the exact failure
    that zeroed the round-8 driver bench. Belt and braces: DROP IF
    EXISTS covers the known-table case, the rmtree covers the
    stale-orphan-directory case."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir") or ""
    # warehouse.dir may be a plain path, file:/p, or file:///p —
    # urlparse handles all three (.path is the filesystem path)
    path = urlparse(wh).path or wh
    loc = os.path.join(path, table.lower())
    if path and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted)
    by ``key``. One full shuffle now; zero shuffles for every future
    join/agg on ``key``."""
    _clear_stale_location(df.sparkSession, table)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def cobucket_orders_lineitem(
    spark: SparkSession, sf_dir: str, buckets: int = 8
) -> tuple[str, str]:
    """Bucket orders and lineitem by order key into ``buckets`` buckets
    each; returns the two table names."""
    from cgtcalc_data_transformer_spark.sources.tpch import load_table

    write_bucketed(
        load_table(spark, sf_dir, "orders"), "orders_b", "o_orderkey", buckets
    )
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(li, "lineitem_b", "o_orderkey", buckets)
    return "orders_b", "lineitem_b"


def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: co-bucket orders⋈lineitem, then run the
    exchange-free revenue join. The bucketed write is the one-time
    shuffle; the returned plan joins without exchanging either side
    (asserted in tests/test_bucketed.py)."""
    cobucket_orders_lineitem(spark, sf_dir)
    return bucketed_join_revenue(spark)


JOIN_BUCKETED_SQL = """
SELECT o_orderstatus,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def bucketed_join_revenue(spark: SparkSession) -> DataFrame:
    """orders_b⋈lineitem_b on the bucket key → per-status revenue.

    With co-bucketed inputs the plan is Scan→Sort?→SortMergeJoin with
    NO Exchange on either side; the groupBy keys include the bucket
    key's partitioning lineage so the aggregation shuffle is the only
    exchange (and it moves |groups| rows, not |lineitem|).
    """
    from pyspark.sql import functions as F

    orders = spark.table("orders_b").select("o_orderkey", "o_orderstatus")
    li = spark.table("lineitem_b").select(
        "o_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(28,6)")
        .alias("rev"),
    )
    # merge hint: at 100 TB neither side broadcasts; pinning SMJ here
    # keeps the exchange-free bucketed plan observable at test scale
    # (otherwise the tiny side broadcasts and the demo is vacuous)
    return (
        li.join(orders.hint("merge"), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.sum("rev").cast("double").alias("revenue"))
        .orderBy("o_orderstatus")
    )
