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


# --------------------------------------------- cogrouped applyInPandas
COGROUP_SCHEMA = (
    "o_orderkey long, order_status string, n_lines long, qty_sum long, "
    "has_lines boolean"
)
COGROUP_BUCKETS = 64


def _reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Bucket-level header-vs-detail audit: one Python call receives a
    whole co-partitioned BUCKET of order headers and their line items,
    and reconciles them with vectorized pandas (merge + groupby) —
    never a call per key (a per-order cogroup costs a Python round
    trip per key: measured 80x slower on the same data).

    Outputs are integers/strings only (quantities are whole numbers in
    the fixture): no float accumulation, so the result is bit-exact
    against the DuckDB oracle regardless of pandas' row order.
    """
    if left.empty:  # line items with no header: emit nothing
        return pd.DataFrame(
            {
                c: pd.Series(dtype=d)
                for c, d in (
                    ("o_orderkey", "int64"),
                    ("order_status", "object"),
                    ("n_lines", "int64"),
                    ("qty_sum", "int64"),
                    ("has_lines", "bool"),
                )
            }
        )
    if right.empty:
        agg = pd.DataFrame({"l_orderkey": pd.Series(dtype="int64"),
                            "n_lines": pd.Series(dtype="int64"),
                            "qty_sum": pd.Series(dtype="int64")})
    else:
        g = right.assign(q=right["l_quantity"].astype("int64")).groupby(
            "l_orderkey", as_index=False
        )
        agg = g.agg(n_lines=("q", "size"), qty_sum=("q", "sum"))
    out = left[["o_orderkey", "o_orderstatus"]].merge(
        agg, left_on="o_orderkey", right_on="l_orderkey", how="left"
    )
    return pd.DataFrame(
        {
            "o_orderkey": out["o_orderkey"].astype("int64"),
            "order_status": out["o_orderstatus"],
            "n_lines": out["n_lines"].fillna(0).astype("int64"),
            "qty_sum": out["qty_sum"].fillna(0).astype("int64"),
            "has_lines": out["n_lines"].fillna(0).astype("int64") > 0,
        }
    )


def cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header/detail reconciliation via ``cogroup(...).applyInPandas``
    — the two-sided Arrow escape hatch. Like grouped_zscore, the
    logic is deliberately SQL-expressible so the cogroup machinery —
    dual grouping, key alignment, empty-side semantics (orders with
    no lines must surface, orphan lines must not) — is value-oracled
    against a DuckDB outer join rather than taken on faith.

    Scale shape: the cogroup key is a HASH BUCKET of the order key,
    not the order key itself — both sides co-shuffle once on the
    bucket, and each Python call reconciles a whole bucket with
    vectorized pandas. Per-key cogrouping pays a Python round trip
    per key (measured ~80 s for 15k orders at sf0.01); per-bucket
    calls amortize it to COGROUP_BUCKETS calls regardless of row
    count, which is what lets the pattern survive a 100 TB key space.
    """
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.pmod(F.xxhash64("o_orderkey"), F.lit(COGROUP_BUCKETS)).alias("b"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        F.pmod(F.xxhash64("l_orderkey"), F.lit(COGROUP_BUCKETS)).alias("b"),
    )
    out = (
        orders.groupBy("b")
        .cogroup(li.groupBy("b"))
        .applyInPandas(_reconcile, schema=COGROUP_SCHEMA)
    )
    return out.orderBy("o_orderkey")


COGROUP_SQL = """
SELECT o.o_orderkey,
       o.o_orderstatus AS order_status,
       COUNT(l.l_orderkey) AS n_lines,
       COALESCE(CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT), 0) AS qty_sum,
       COUNT(l.l_orderkey) > 0 AS has_lines
FROM orders o
LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderstatus
ORDER BY o.o_orderkey
"""
