"""Partitioned layout: directory-level pruning, asserted against the
physical plan and the file index."""

from __future__ import annotations

import os
import re

from cgtcalc_data_transformer_spark.plans import formatted_plan
from cgtcalc_data_transformer_spark.sources.partitioned import (
    PRUNE_YEAR,
    partition_pruning,
    partitioned_path,
    read_orders_pruned,
    write_orders_partitioned,
)

SF = "/root/testdata/sf0.001"


def test_partition_filters_in_plan(spark):
    write_orders_partitioned(spark, SF)
    plan = formatted_plan(read_orders_pruned(spark))
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m, f"no PartitionFilters in plan:\n{plan}"
    assert f"(o_year#" in m.group(1) or "o_year" in m.group(1)
    assert str(PRUNE_YEAR) in m.group(1)
    # the data filter must NOT degrade to a row-level PushedFilters
    # entry — pruning happens at the directory index, before any
    # parquet footer is opened
    pf = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert pf is None or "o_year" not in pf.group(1)


def test_pruned_scan_reads_one_partition(spark):
    write_orders_partitioned(spark, SF)
    root = partitioned_path()
    years = [d for d in os.listdir(root) if d.startswith("o_year=")]
    assert len(years) > 1, "fixture must span multiple years"
    # the files actually opened by the pruned scan (inputFiles() would
    # list the whole unfiltered index)
    files = [
        r["file_path"]
        for r in read_orders_pruned(spark)
        .select("_metadata.file_path")
        .distinct()
        .collect()
    ]
    assert files, "pruned scan read no files"
    assert all(f"o_year={PRUNE_YEAR}" in f for f in files)


def test_partition_pruning_rollup_shape(spark):
    out = partition_pruning(spark, SF).collect()
    assert 1 <= len(out) <= 12
    assert [r["o_month"] for r in out] == sorted(r["o_month"] for r in out)
    assert all(r["n_orders"] > 0 and r["total_price"] > 0 for r in out)


def test_dynamic_partition_pruning_in_plan(spark):
    from cgtcalc_data_transformer_spark.sources.partitioned import (
        campaign_years_dim,
        dynamic_partition_pruning,
    )

    df = dynamic_partition_pruning(spark, SF)
    plan = formatted_plan(df)
    assert "dynamicpruning" in plan.lower(), (
        f"no dynamic pruning expression in plan:\n{plan}"
    )
    # runtime effect: scan touches exactly the dim's qualifying years
    dim_years = {r.y for r in campaign_years_dim(spark, SF).collect()}
    all_years = {
        int(d.split("=")[1])
        for d in os.listdir(partitioned_path())
        if d.startswith("o_year=")
    }
    assert dim_years < all_years, "fixture must actually prune some years"
    out_years = {r.o_year for r in df.collect()}
    assert out_years <= dim_years


def test_dynamic_partition_overwrite_preserves_other_partitions(spark):
    """Dynamic mode must replace ONLY the restated year: other years
    survive with original totals (static mode would truncate them),
    the restated year keeps its row count with scaled prices."""
    from pyspark.sql import functions as F

    from cgtcalc_data_transformer_spark.sources import partitioned as P
    from cgtcalc_data_transformer_spark.sources.tpch import load_table

    got = {r.o_year: r for r in P.dynamic_partition_overwrite(spark, SF).collect()}
    orig = {
        r.o_year: r
        for r in load_table(spark, SF, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("price_total"),
        )
        .collect()
    }
    assert set(got) == set(orig) and len(got) > 1  # nothing truncated
    for y, o in orig.items():
        assert got[y].n_orders == o.n_orders
        if y == P.PRUNE_YEAR:
            assert got[y].price_total > o.price_total  # restated up 10%
        else:
            assert got[y].price_total == o.price_total  # untouched
