"""Invariants for the second-wave relational operators (oracle
equivalence is covered by tools/check_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import relational_ext
from cgtcalc_data_transformer_spark.plans import formatted_plan

SF = "/root/testdata/sf0.001"


def test_unpivot_preserves_total(spark):
    long_df = relational_ext.unpivot_status_counts(spark, SF)
    total = long_df.agg(F.sum("cnt")).collect()[0][0]
    assert total == spark.read.parquet(f"{SF}/orders.parquet").count()
    # wide agg + Expand, no second scan
    assert formatted_plan(long_df).count("Scan parquet") <= 2  # op entry + detail


def test_range_frame_at_least_row_frame(spark):
    """The 30-day RANGE frame includes at least the current row's own
    value, and trailing totals never go below the row value."""
    df = relational_ext.window_range_30d(spark, SF)
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    bad = (
        df.join(orders, "o_orderkey")
        .filter(F.col("trailing_30d_value") < F.col("o_totalprice") - 1e-6)
        .count()
    )
    assert bad == 0


def test_ntile_quartiles_balanced(spark):
    df = relational_ext.window_ntile_quartiles(spark, SF)
    sizes = (
        df.groupBy("o_orderpriority", "quartile")
        .count()
        .groupBy("o_orderpriority")
        .agg((F.max("count") - F.min("count")).alias("spread"))
        .agg(F.max("spread"))
        .collect()[0][0]
    )
    assert sizes <= 1  # ntile keeps bucket sizes within 1


def test_salted_join_matches_plain(spark):
    salted = {
        (r.o_orderstatus, r.line_cnt, round(r.revenue, 4))
        for r in relational_ext.join_salted_revenue(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    plain = {
        (r.o_orderstatus, r.line_cnt, round(r.revenue, 4))
        for r in (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("line_cnt"),
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(28,6)"
                    )
                )
                .cast("double")
                .alias("revenue"),
            )
            .collect()
        )
    }
    assert salted == plain


def test_grouped_zscore_moments(spark):
    """Per-group z-scores have ~0 mean and ~1 std within each segment."""
    from cgtcalc_data_transformer_spark.operators.grouped_pandas import grouped_zscore

    df = grouped_zscore(spark, SF)
    stats = (
        df.groupBy("c_mktsegment")
        .agg(
            F.avg("zscore").alias("m"),
            F.stddev_pop("zscore").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for r in stats:
        assert abs(r.m) < 1e-4
        if r.n > 1:
            assert abs(r.s - 1.0) < 1e-3


def test_subquery_scalar_strictly_above_avg(spark):
    df = relational_ext.subquery_above_nation_avg(spark, SF)
    assert df.filter(F.col("c_acctbal") <= F.col("nation_avg")).count() == 0
    # every nation with >1 distinct balance must contribute some rows
    assert df.count() > 0


def test_partial_salting_replicates_only_hot_keys(spark):
    """The partial variant must NOT blow up the dim side: replication
    (explode) happens only on the hot-key subset, and the result
    equals the plain join exactly."""
    from cgtcalc_data_transformer_spark.operators import relational_ext as rx

    import re

    df = rx.skew_join_salted_partial(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the explode feeding the hot join sits above a FILTERED orders
    # scan (o_orderkey restricted to the detected hot keys) — a
    # whole-table replication like full salting's would show an
    # unfiltered orders relation under the Generate
    assert "explode" in plan.lower()
    assert re.search(r"o_orderkey#\d+L? (IN|=) \(?1\)?", plan), plan
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, rx.skew_join_plain(spark, SF).collect()))
    assert got == want
