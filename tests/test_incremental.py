"""Incremental operators: semantics + single-shuffle plan contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import incremental
from cgtcalc_data_transformer_spark.plans import formatted_plan
from cgtcalc_data_transformer_spark.sources.tpch import load_events

SF = "/root/testdata/sf0.001"


def test_cdc_latest_is_argmax(spark):
    """The struct-max compaction must agree with the window formulation."""
    from pyspark.sql import Window

    ev = load_events(spark, SF)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    expected = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_id")
    )
    got = incremental.cdc_latest(spark, SF).select(
        "user_id", F.col("last_event_id").alias("event_id")
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_cdc_latest_no_window_sort(spark):
    """The whole point: compaction is an aggregation, not a sorted
    window — the plan must contain no Window operator."""
    plan = formatted_plan(incremental.cdc_latest(spark, SF))
    assert "Window" not in plan


def test_dedup_incremental_consistency(spark):
    rows = incremental.dedup_incremental(spark, SF).collect()
    assert rows, "empty batch"
    for r in rows:
        assert r.kept == (not r.exact_dup)
        assert r.near_candidates >= 0
        # an exact dup's bucket must contain at least its own twin
        if r.exact_dup:
            assert r.near_candidates >= 1


def test_dedup_incremental_no_cartesian(spark):
    plan = formatted_plan(incremental.dedup_incremental(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_intervals_chain(spark):
    """Intervals per user must chain: valid_to of row i equals
    valid_from of row i+1; exactly one open (is_current) interval per
    user; no zero-state repetition (change compression)."""
    rows = incremental.scd2_intervals(spark, SF).collect()
    assert rows, "no intervals"
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, ivs in by_user.items():
        assert sum(1 for r in ivs if r.is_current) == 1, user
        assert ivs[-1].is_current and ivs[-1].valid_to_epoch is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to_epoch == b.valid_from_epoch, user
            assert a.state != b.state, user


def test_scd2_single_exchange(spark):
    """lag-filter and lead-close share partitioning/order → Catalyst
    must plan ONE exchange on user_id (reused), not two."""
    plan = formatted_plan(incremental.scd2_intervals(spark, SF))
    # count hashpartitioning exchanges on user_id; the final orderBy
    # adds a rangepartitioning exchange which is fine
    n_hash = plan.count("hashpartitioning(user_id")
    assert n_hash <= 1, f"expected one user_id exchange, got {n_hash}:\n{plan}"


def test_ivm_refresh_equals_full_recompute(spark):
    """The algebraic state merge must be indistinguishable from a full
    recompute over base ∪ delta."""
    from cgtcalc_data_transformer_spark.functions.money import dec as _dec
    from cgtcalc_data_transformer_spark.operators.incremental import (
        ivm_refresh_revenue,
    )
    from cgtcalc_data_transformer_spark.sources.tpch import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    got = {
        r["o_orderstatus"]: (r["order_cnt"], r["total_price"])
        for r in ivm_refresh_revenue(spark, sf).collect()
    }
    full = {
        r["o_orderstatus"]: (r["cnt"], r["tp"])
        for r in load_table(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("tp"),
        )
        .collect()
    }
    assert got == full
