"""Physical-plan assertions — the scale contract, checked against what
Catalyst actually produced (not what we hope it produced)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import relational
from cgtcalc_data_transformer_spark.plans import (
    has_broadcast_join,
    has_pushed_filters,
    scan_read_schema,
)

SF = "/root/testdata/sf0.001"


def test_q1_filter_pushdown(spark):
    df = relational.q1_pricing_summary(spark, SF)
    assert has_pushed_filters(df, "l_shipdate")


def test_q1_column_pruning(spark):
    df = relational.q1_pricing_summary(spark, SF)
    cols = scan_read_schema(df, "lineitem")
    assert cols, "no lineitem scan found in plan"
    # 11-column table, query touches 7
    assert "l_orderkey" not in cols
    assert "l_partkey" not in cols
    assert "l_quantity" in cols


def test_q6_all_predicates_pushed(spark):
    from cgtcalc_data_transformer_spark.operators import relational_ext

    df = relational_ext.q6_forecast_revenue(spark, SF)
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert has_pushed_filters(df, frag), frag
    cols = scan_read_schema(df, "lineitem")
    assert set(cols) <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q3_broadcasts_customer(spark):
    assert has_broadcast_join(relational.q3_shipping_priority(spark, SF))


def test_q5_broadcasts_dims(spark):
    assert has_broadcast_join(relational.q5_local_supplier_volume(spark, SF))


def test_topk_does_not_global_sort(spark):
    from cgtcalc_data_transformer_spark.plans import formatted_plan

    plan = formatted_plan(relational.topk_global_orders(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_asof_join_is_join_free(spark):
    """The as-of 'join' is a union + window carry-forward — the plan
    must contain no join operator at all (one shuffle on the key)."""
    from cgtcalc_data_transformer_spark.operators import events
    from cgtcalc_data_transformer_spark.plans import formatted_plan

    plan = formatted_plan(events.asof_join_latest_order(spark, SF))
    assert "Join" not in plan
    assert "Window" in plan


def test_minhash_no_cartesian(spark):
    """LSH banding must keep candidate generation an equality join —
    never a cartesian/nested-loop product."""
    from cgtcalc_data_transformer_spark.operators import dedup
    from cgtcalc_data_transformer_spark.plans import formatted_plan

    plan = formatted_plan(dedup.dedup_minhash_lsh(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pivot_single_scan(spark):
    import re

    from cgtcalc_data_transformer_spark.plans import formatted_plan

    plan = formatted_plan(relational.pivot_order_status_by_priority(spark, SF))
    # pinned pivot values → one pass over the data (numbered operator
    # entries, not the detail blocks which repeat the text)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_q4_plans_semi_join_with_pushdown(spark):
    """Q4's EXISTS must become a semi join (no row multiplication) and
    the quarter filter must reach the orders scan."""
    from cgtcalc_data_transformer_spark.operators import tpch_more
    from cgtcalc_data_transformer_spark.plans import formatted_plan

    df = tpch_more.q4_order_priority(spark, SF)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan, plan
    assert has_pushed_filters(df, "o_orderdate")


def test_q14_single_join_two_sums(spark):
    """Q14's two conditional sums must share one part join (a single
    HashAggregate pair, not two scans)."""
    from cgtcalc_data_transformer_spark.operators import tpch_more
    from cgtcalc_data_transformer_spark.plans import formatted_plan

    import re

    plan = formatted_plan(tpch_more.q14_promo_revenue(spark, SF))
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 2, plan  # lineitem + part, once each


def test_q18_broadcasts_filtered_agg(spark):
    """After the HAVING filter the grouped orderkey set is tiny; the
    join back to orders must broadcast it, not shuffle orders."""
    from cgtcalc_data_transformer_spark.operators import tpch_more

    assert has_broadcast_join(tpch_more.q18_large_orders(spark, SF))


def test_q19_disjunct_pushdown_both_sides(spark):
    """Q19's OR-of-ANDs must decompose: the quantity disjunction
    reaches the lineitem scan and the brand/size disjunction reaches
    the part scan (side-local parts of each disjunct pushed)."""
    from cgtcalc_data_transformer_spark.operators import tpch_more

    df = tpch_more.q19_discounted_revenue(spark, SF)
    assert has_pushed_filters(df, "l_quantity")
    assert has_pushed_filters(df, "p_brand")


def test_skew_salted_plan_fans_out(spark):
    """The salted skew join must (a) replicate the dim side
    SALT_BUCKETS x via a Generate (explode) node, (b) join on an
    equality key that includes the salt, and (c) never degrade to a
    nested-loop product."""
    from cgtcalc_data_transformer_spark.operators import relational_ext as rx

    df = rx.skew_join_salted(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan
    assert "salt" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    # fan-out pins: dim side replicated exactly SALT_BUCKETS x, and
    # the salted result equals the unsalted one
    import duckdb

    n_orders = (
        duckdb.sql(f"SELECT count(*) FROM read_parquet('{SF}/orders.parquet')")
        .fetchone()[0]
    )
    from cgtcalc_data_transformer_spark.sources.tpch import load_table

    rep = (
        load_table(spark, SF, "orders")
        .select("o_orderkey")
        .withColumn(
            "salt",
            F.explode(
                F.array(*[F.lit(i) for i in range(rx.SALT_BUCKETS)])
            ),
        )
    )
    assert rep.count() == n_orders * rx.SALT_BUCKETS
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, rx.skew_join_plain(spark, SF).collect())
    )


def test_runtime_bloom_filter_injection(spark):
    """At 100 TB the selective side of a big-big join should prune the
    probe side's shuffle via Catalyst's injected runtime bloom filter
    (InjectRuntimeFilter). The engine must not block the rewrite: with
    broadcast off and the size thresholds admitting the join, the
    optimized plan must contain a might_contain() probe filter.
    Thresholds are conf-driven (size-based at real scale); they're
    pinned here so the rewrite fires at test SF."""
    from cgtcalc_data_transformer_spark.sources.tpch import load_table

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB"
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized, optimized
        # and the rewrite must not change results
        assert j.count() == 1
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_aqe_coalesces_shuffle_partitions(spark):
    """With 32 static shuffle partitions and a tiny aggregate, AQE
    must coalesce the post-shuffle partitions at runtime — the knob
    that makes one static shuffle.partitions setting survive 100x
    data-size swings. Asserted on the EXECUTED plan (what AQE actually
    did, not what it might do)."""
    from cgtcalc_data_transformer_spark.sources.tpch import load_table

    df = (
        load_table(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .count()
    )
    df.collect()  # finalize adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan, plan
