"""Round-4 operator tests: skyline, multi-touch attribution, DSIR
(DSIR's own test lives in test_curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import events, skyline
from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


def test_pareto_frontier_matches_naive_dominance(spark):
    """The banded sweep must equal the O(n²) textbook definition."""
    pts = {
        (r.price, r.size)
        for r in load_table(spark, SF, "part")
        .select(F.col("p_retailprice").alias("price"), F.col("p_size").alias("size"))
        .distinct()
        .collect()
    }

    def dominated(p):
        return any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pts
        )

    expected = {p for p in pts if not dominated(p)}
    got = {(r.price, r.size) for r in skyline.pareto_frontier(spark, SF).collect()}
    assert got == expected


def test_pareto_frontier_is_strictly_monotone(spark):
    """Skyline shape: as price increases, size strictly increases
    (otherwise the cheaper point would dominate)."""
    rows = skyline.pareto_frontier(spark, SF).collect()
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert b.price > a.price
        assert b.size > a.size


def test_multitouch_credit_sums_to_one_per_purchase(spark):
    rows = events.events_multitouch_attribution(spark, SF).collect()
    assert rows
    by_purchase: dict = {}
    for r in rows:
        by_purchase.setdefault(r.purchase_id, []).append(r)
    for pid, touches in by_purchase.items():
        touches.sort(key=lambda r: r.touch_rank)
        n = touches[0].n_touches
        assert len(touches) == n
        assert [t.touch_rank for t in touches] == list(range(1, n + 1))
        assert abs(sum(t.credit for t in touches) - 1.0) < 1e-9, pid
        if n >= 3:
            assert touches[0].credit == 0.4
            assert touches[-1].credit == 0.4
        elif n == 2:
            assert all(t.credit == 0.5 for t in touches)
        else:
            assert touches[0].credit == 1.0


def test_multitouch_touches_within_window(spark):
    """Every credited click must precede its purchase by at most the
    attribution window."""
    out = events.events_multitouch_attribution(spark, SF)
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    ev = load_events(spark, SF).select("event_id", "ts")
    joined = (
        out.join(ev.withColumnRenamed("event_id", "click_id").withColumnRenamed("ts", "c_ns"), "click_id")
        .join(ev.withColumnRenamed("event_id", "purchase_id").withColumnRenamed("ts", "p_ns"), "purchase_id")
    )
    bad = joined.filter(
        (F.col("p_ns") < F.col("c_ns"))
        | (F.col("p_ns") > F.col("c_ns") + events.MULTITOUCH_WINDOW_NS)
    ).count()
    assert bad == 0
