"""Grouped Arrow-batched custom aggregation via applyInPandas.

The escape hatch for per-group logic Spark's built-ins can't express
(iterative fits, per-group models). Demonstrated with per-segment
z-score standardization of customer balances — deliberately something
SQL *can* express, so the whole applyInPandas machinery (grouping,
Arrow transfer, schema contract, determinism) is oracle-checked
against DuckDB rather than taken on faith.

Float discipline (the engine-wide rule, see operators/relational.py):
group moments are accumulated in exact decimal — here Python
``Decimal`` quantized to 6 dp with HALF_UP, mirroring the SQL
``CAST(x AS DECIMAL(28,6))`` — because float64 accumulation order
differs between pandas and any SQL engine. The final mean/var/zscore
arithmetic runs in double on identical inputs, so it is bit-identical
across engines; round(6) can't diverge (no binary double sits exactly
on a decimal tie).

Scale shape: one shuffle on the group key; each group must fit one
executor's memory (fine for per-segment stats; for billions-per-group
use the two-pass agg+join form instead — see relational_ext's
subquery_above_nation_avg for that shape).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from cgtcalc_data_transformer_spark.sources.tpch import load_table

ZSCORE_SCHEMA = (
    "c_mktsegment string, c_custkey long, c_acctbal double, zscore double"
)

_Q6 = Decimal("0.000001")


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    vals = [float(v) for v in pdf["c_acctbal"]]
    n = len(vals)
    # mirror CAST(x AS DECIMAL(28,6)) / CAST(x*x AS DECIMAL(28,6)):
    # quantize the double (resp. double product) to 6 dp, sum exactly.
    # No double ever lands on a decimal tie (5e-7 is not dyadic), so
    # the rounding mode can never diverge between engines.
    s1 = float(sum(Decimal(v).quantize(_Q6, rounding=ROUND_HALF_UP) for v in vals))
    s2 = float(
        sum(Decimal(v * v).quantize(_Q6, rounding=ROUND_HALF_UP) for v in vals)
    )
    mean = s1 / n
    var = s2 / n - mean * mean
    std = var**0.5
    z = [
        round((float(v) - mean) / std, 6) if std > 0 else 0.0
        for v in pdf["c_acctbal"]
    ]
    return pd.DataFrame(
        {
            "c_mktsegment": pdf["c_mktsegment"],
            "c_custkey": pdf["c_custkey"],
            "c_acctbal": pdf["c_acctbal"],
            "zscore": z,
        }
    )


def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", "c_acctbal"
    )
    return (
        cust.groupBy("c_mktsegment")
        .applyInPandas(_zscore, schema=ZSCORE_SCHEMA)
        .orderBy("c_custkey")
    )


GROUPED_ZSCORE_SQL = """
WITH m AS (
  SELECT c_mktsegment,
         COUNT(*) AS n,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS s2
  FROM customer GROUP BY c_mktsegment
)
SELECT c.c_mktsegment, c_custkey, c_acctbal,
       CASE WHEN (s2 / n - (s1 / n) * (s1 / n)) > 0
            THEN ROUND((c_acctbal - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 6)
            ELSE 0.0 END AS zscore
FROM customer c JOIN m ON c.c_mktsegment = m.c_mktsegment
ORDER BY c_custkey
"""
