"""Schema evolution across parquet snapshots (``mergeSchema``).

A 100 TB table is written over years by pipelines whose schema grows:
new columns appear, old files never get rewritten. The engine must
read the union schema — old files surface the new columns as NULL —
without a backfill. Spark's parquet reader does exactly this with
``mergeSchema=true`` (schema union at planning time, per-file column
resolution at scan time); the cost is footer-merging at planning, so
production tables pin the merged schema in a metastore and keep
per-file pruning.

Here: snapshot v1 (early orders, 3 columns) and snapshot v2 (later
orders, 5 columns — adds ``o_flag`` and ``o_priority_len``) written to
one directory tree, read back as a single evolved table, audited per
snapshot version. The snapshot split is the deterministic md5 bucket
(sampling.hash_bucket), so the DuckDB oracle replays the whole
scenario from the base table.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket
from cgtcalc_data_transformer_spark.sources.tpch import load_table

V1_PCT = 50  # bucket < 50 → written by the v1 pipeline (narrow schema)


def evolution_path() -> str:
    return os.path.join(tempfile.gettempdir(), f"spark_evo_{os.getpid()}", "orders_evo")


def write_snapshots(spark: SparkSession, sf_dir: str) -> str:
    """v1: (o_orderkey, o_orderstatus, o_totalprice). v2: + o_flag,
    o_priority_len. Directory-per-snapshot so the merged read sees
    heterogeneous file schemas, exactly like a grown production table."""
    path = evolution_path()
    orders = load_table(spark, sf_dir, "orders")
    bucket = hash_bucket(F.col("o_orderkey"))
    v1 = orders.filter(bucket < V1_PCT).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = orders.filter(bucket >= V1_PCT).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        (F.col("o_totalprice") > 100000).alias("o_flag"),
        F.length("o_orderpriority").alias("o_priority_len"),
    )
    v1.write.mode("overwrite").parquet(os.path.join(path, "snap=v1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "snap=v2"))
    return path


def schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write both snapshots, read them back merged, and audit the
    evolved table per snapshot: row count, NULL count of each late
    column (all of v1's rows — proof old files resolve to NULL), and
    the money total (proof shared columns survive the merge intact).
    """
    path = write_snapshots(spark, sf_dir)
    evolved = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        evolved.groupBy("snap")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_flag").isNull().cast("long")).alias("flag_nulls"),
            F.sum(F.col("o_priority_len").isNull().cast("long")).alias("len_nulls"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("snap")
    )


SCHEMA_EVOLUTION_SQL = f"""
WITH bucketed AS (
  SELECT o_orderkey, o_totalprice,
         ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 AS b
  FROM orders
), evolved AS (
  SELECT 'v1' AS snap, o_totalprice,
         CAST(NULL AS BOOLEAN) AS o_flag, CAST(NULL AS INTEGER) AS o_priority_len
  FROM bucketed WHERE b < {V1_PCT}
  UNION ALL
  SELECT 'v2', o_totalprice, o_totalprice > 100000, 0
  FROM bucketed WHERE b >= {V1_PCT}
)
SELECT snap, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_flag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS flag_nulls,
       CAST(SUM(CASE WHEN o_priority_len IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS len_nulls,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM evolved
GROUP BY snap
ORDER BY snap
"""
