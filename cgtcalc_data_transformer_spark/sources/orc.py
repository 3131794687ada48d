"""ORC source/sink.

Second columnar format after parquet — Spark ships the ORC reader/
writer natively, and warehouse migrations constantly need the
parquet↔ORC path. Same scan properties (column pruning, predicate
pushdown via ORC's min/max stripes); ``orc_roundtrip`` proves
content-preserving interchange with a DuckDB oracle on the ORIGINAL
parquet: write orders → ORC, read back, aggregate — any loss or type
drift breaks the value hash.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.functions.money import dec as _dec
from cgtcalc_data_transformer_spark.sources.tpch import load_table


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC → read back → per-priority rollup. The aggregate
    runs on the ORC copy; the oracle on the parquet original — equal
    results prove the interchange is lossless (values AND types)."""
    path = os.path.join(
        tempfile.gettempdir(), f"orc_orders_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    write_orc(load_table(spark, sf_dir, "orders"), path)
    back = read_orc(spark, path)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("total_price"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )
        .orderBy("o_orderpriority")
    )


ORC_ROUNDTRIP_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS order_cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price,
       MIN(o_orderdate) AS first_date,
       MAX(o_orderdate) AS last_date
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
