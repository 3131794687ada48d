"""Bucketed co-located join: the write-once-shuffle-never contract,
asserted against the physical plan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.plans import formatted_plan
from cgtcalc_data_transformer_spark.sources.bucketed import (
    bucketed_join_revenue,
    cobucket_orders_lineitem,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_elides_exchanges(spark):
    cobucket_orders_lineitem(spark, SF, buckets=4)
    df = bucketed_join_revenue(spark)
    plan = formatted_plan(df)
    join_ops = re.findall(r"\(\d+\) (\w*SortMergeJoin|\w*ShuffledHashJoin)", plan)
    assert join_ops, f"no shuffle-family join in plan:\n{plan}"
    # the join inputs are co-bucketed → the only Exchange in the plan
    # is the post-join aggregation/sort, never below the join
    join_pos = plan.index(join_ops[0])
    scan_section = plan[join_pos:]  # formatted: operators listed root→leaf
    below_join = scan_section.split("\n\n")[0]
    assert "Exchange" not in below_join

    # numbered-operator check: count Exchanges in the whole plan; a
    # non-bucketed version of the same join has 2 more (one per side)
    n_bucketed = len(re.findall(r"\(\d+\) Exchange", plan))

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(28,6)")
        .alias("rev"),
    )
    plain = (
        li.join(orders.hint("merge"), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.sum("rev").cast("double").alias("revenue"))
        .orderBy("o_orderstatus")
    )
    n_plain = len(re.findall(r"\(\d+\) Exchange", formatted_plan(plain)))
    assert n_bucketed <= n_plain - 2


def test_bucketed_join_result_matches_plain(spark):
    cobucket_orders_lineitem(spark, SF, buckets=4)
    got = {
        (r.o_orderstatus, round(r.revenue, 4))
        for r in bucketed_join_revenue(spark).collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    want = {
        (r.o_orderstatus, round(r.revenue, 4))
        for r in (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(28,6)"
                    )
                )
                .cast("double")
                .alias("revenue")
            )
            .collect()
        )
    }
    assert got == want


def test_write_bucketed_survives_stale_warehouse_location(spark):
    """VERDICT r8 item 1b: a leftover warehouse directory from an
    earlier process (recycled pid, persistent /tmp) whose table the
    fresh catalog has never registered must NOT make saveAsTable throw
    LOCATION_ALREADY_EXISTS — write_bucketed clears both the catalog
    entry and the stale on-disk location first."""
    import os
    from urllib.parse import urlparse

    from cgtcalc_data_transformer_spark.sources.bucketed import write_bucketed

    table = "stale_collision_t"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    path = urlparse(wh).path or wh
    loc = os.path.join(path, table)
    # simulate the round-8 crash: orphan directory, unknown table
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "stale_marker"), "w") as fh:
        fh.write("left behind by a previous process\n")

    df = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    write_bucketed(df, table, "o_orderkey", buckets=2)
    assert spark.table(table).count() == df.count()
    # and a second overwrite (the normal re-run path) still works
    write_bucketed(df, table, "o_orderkey", buckets=2)
    assert spark.table(table).count() == df.count()
    spark.sql(f"DROP TABLE IF EXISTS {table}")
