"""Deterministic hash sampling + profiling invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import sampling

SF = "/root/testdata/sf0.001"


def test_hash_sample_is_rerun_stable(spark):
    a = {tuple(r) for r in sampling.sample_stratified(spark, SF).collect()}
    b = {tuple(r) for r in sampling.sample_stratified(spark, SF).collect()}
    assert a == b


def test_hash_sample_append_stability(spark):
    """A row's in/out fate never changes when the corpus grows — the
    property RNG sampling lacks."""
    orders = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    full = {
        r.o_orderkey
        for r in orders.filter(
            sampling.hash_bucket(F.col("o_orderkey")) < sampling.SAMPLE_PCT
        ).collect()
    }
    half = orders.limit(orders.count() // 2)
    subset = {
        r.o_orderkey
        for r in half.filter(
            sampling.hash_bucket(F.col("o_orderkey")) < sampling.SAMPLE_PCT
        ).collect()
    }
    assert subset == {k for k in subset if k in full}
    assert subset <= full


def test_sample_fraction_near_target(spark):
    rows = sampling.sample_stratified(spark, SF).collect()
    total = sum(r.total for r in rows)
    sampled = sum(r.sampled for r in rows)
    assert 0.05 <= sampled / total <= 0.16  # 10% ± hash noise at 1.5k rows


def test_profile_shape(spark):
    rows = {r.column: r for r in sampling.profile_orders(spark, SF).collect()}
    assert set(rows) == {
        "o_orderstatus",
        "o_orderpriority",
        "o_custkey",
        "o_totalprice",
    }
    assert rows["o_orderstatus"].nulls == 0
    assert rows["o_orderstatus"].n_distinct <= 3
    assert float(rows["o_totalprice"].min_str) <= float(rows["o_totalprice"].max_str)


def test_sample_per_group_fixed_size_and_stable(spark):
    from cgtcalc_data_transformer_spark.operators import sampling

    a = sampling.sample_per_group(spark, SF).collect()
    b = sampling.sample_per_group(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # rerun-stable
    from collections import Counter

    per_src = Counter(r.source for r in a)
    assert all(n == sampling.GROUP_SAMPLE_K for n in per_src.values())


def test_histogram_covers_all_rows(spark):
    from cgtcalc_data_transformer_spark.operators import sampling
    from cgtcalc_data_transformer_spark.sources.tpch import load_table

    rows = sampling.histogram_prices(spark, SF).collect()
    assert sum(r.n for r in rows) == load_table(spark, SF, "orders").count()
    assert all(0 <= r.bin < sampling.HIST_BINS for r in rows)
