"""Overflow-routing guard for the n²/d³-scale moment sums
(VERDICT r8 items 2-3).

Ops whose aggregates sum PRODUCTS of unbounded counts (Kendall
concordant pairs, degree-assortativity moments, the daily-grid
centered products, rank sums) overflow int64 long before 100 TB even
though every individual count is a safe BIGINT. The fix is uniform:
cast each factor to DECIMAL(19,0) BEFORE the multiply and sum in
DECIMAL(38,0). These tests pin the recipe itself on inputs where the
raw-BIGINT formulation provably overflows:

- the decimal route returns the EXACT value (checked against Python
  bignum arithmetic),
- the raw-BIGINT route throws under Spark ANSI (the canary the sweep
  relies on — DuckDB silently widens to HUGEINT and would mask it).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

D19 = "decimal(19,0)"

# a hub-degree profile whose d³-scale sums pass 2^63: one vertex of
# degree ~3.1e9 contributes (3.1e9)² ≈ 9.6e18 > 2^63 from a single
# row of the moment aggregation
HUB_DEGREES = [3_100_000_000, 2_000_000_000, 7, 3, 1]


def test_decimal_moment_sums_exact_past_int64(spark):
    rows = [(d, HUB_DEGREES[(i + 1) % len(HUB_DEGREES)])
            for i, d in enumerate(HUB_DEGREES)]
    df = spark.createDataFrame(rows, "dx long, dy long")
    got = df.agg(
        F.sum(F.col("dx").cast(D19) * F.col("dx").cast(D19)).alias("sxx"),
        F.sum(F.col("dx").cast(D19) * F.col("dy").cast(D19)).alias("sxy"),
    ).collect()[0]
    want_sxx = sum(dx * dx for dx, _ in rows)
    want_sxy = sum(dx * dy for dx, dy in rows)
    assert want_sxx > 2**63  # the scenario is real: raw BIGINT can't hold it
    assert int(got.sxx) == want_sxx
    assert int(got.sxy) == want_sxy


def test_raw_bigint_moment_sum_is_a_loud_canary(spark):
    """Under ANSI mode the unrouted formulation must THROW, not wrap —
    if this ever passes silently the sweep's detection story is gone."""
    assert spark.conf.get("spark.sql.ansi.enabled", "true") == "true"
    df = spark.createDataFrame(
        [(d,) for d in HUB_DEGREES], "dx long"
    )
    with pytest.raises(Exception, match="(?i)overflow|out of range"):
        df.agg(F.sum(F.col("dx") * F.col("dx")).alias("sxx")).collect()


def test_decimal_pair_term_cannot_overflow_at_term_level(spark):
    """Kendall cell products: DECIMAL(19,0)×DECIMAL(19,0) terms are
    exact even when a SINGLE product exceeds int64 (two ~3e9 cells)."""
    df = spark.createDataFrame(
        [(3_100_000_000, 3_100_000_000)], "ca long, cb long"
    )
    got = df.agg(
        F.sum(F.col("ca").cast(D19) * F.col("cb").cast(D19)).alias("cc")
    ).collect()[0]
    assert int(got.cc) == 3_100_000_000 * 3_100_000_000
