"""Data-layout operators: Z-order clustering keys for multi-dimension
data skipping.

Parquet prunes row groups with per-column min/max stats, but sorting
by ONE key leaves every OTHER key's per-row-group range at ~full
width. A Z-order (Morton) key interleaves the bits of two keys so
that sorting by it bounds BOTH ranges per row group — the standard
lakehouse layout trick for two-dimensional selective scans at 100 TB.

``zorder_key_expr`` is pure codegen bit arithmetic (32 shift/or
terms — constant-folded offsets, no UDF, no shuffle), mirrored
bit-for-bit in the DuckDB oracle. ``zorder_layout`` aggregates the
keyed rows into Z-buckets and reports per-bucket key ranges: the
locality the layout buys is directly visible in the result (bounded
min/max spans per bucket on BOTH dimensions).

``tests/test_layout.py`` proves the physical claim end-to-end with
pyarrow row-group statistics: a partkey-sorted write leaves suppkey
at ~full width per row group (suppkey predicates prune nothing),
while the Z-sorted write bounds BOTH dimensions materially below
full width — the balanced-pruning property Z-order buys.

No reference analog (single-file text output, ``index.js:121-122``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

Z_BITS = 16           # bits kept per dimension (keys taken mod 2^16)
Z_BUCKET_SHIFT = 14   # z >> 14 → top-level buckets (≈64 at sf0.01 key ranges)


def zorder_key_expr(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """32-bit Morton interleave of the low ``bits`` of two int keys:
    even bit positions take x's bits, odd positions take y's."""
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-bucket locality report over lineitem (l_partkey ⊗ l_suppkey):
    per top-level Z-bucket, the row count and the min/max span of BOTH
    constituent keys. Bounded spans on both dimensions = the row-group
    stats a two-key selective scan would prune with."""
    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_key_expr(F.col("l_partkey"), F.col("l_suppkey"))
    return (
        li.select(
            F.shiftright(z, Z_BUCKET_SHIFT).alias("z_bucket"),
            "l_partkey",
            "l_suppkey",
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("part_min"),
            F.max("l_partkey").alias("part_max"),
            F.min("l_suppkey").alias("supp_min"),
            F.max("l_suppkey").alias("supp_max"),
        )
        .orderBy("z_bucket")
    )


def _interleave_sql(xcol: str, ycol: str, bits: int = Z_BITS) -> str:
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        # fully parenthesized: DuckDB gives | higher precedence than <<
        terms.append(f"(((({xcol} & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({ycol} & {mask}) >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


ZORDER_LAYOUT_SQL = f"""
WITH keyed AS (
  SELECT ({_interleave_sql('l_partkey', 'l_suppkey')}) >> {Z_BUCKET_SHIFT} AS z_bucket,
         l_partkey, l_suppkey
  FROM lineitem
)
SELECT z_bucket, COUNT(*) AS n_rows,
       MIN(l_partkey) AS part_min, MAX(l_partkey) AS part_max,
       MIN(l_suppkey) AS supp_min, MAX(l_suppkey) AS supp_max
FROM keyed
GROUP BY z_bucket
ORDER BY z_bucket
"""
