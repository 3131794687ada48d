"""Streaming semantics vs their batch counterparts on bounded input."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import events as batch_events
from cgtcalc_data_transformer_spark.sources.tpch import load_events
from cgtcalc_data_transformer_spark.streaming import events as sev, joins as sjoin
from cgtcalc_data_transformer_spark.streaming.stateful import streaming_stateful_totals

SF = "/root/testdata/sf0.001"


def test_streaming_tumbling_subset_of_batch(spark):
    stream_rows = {
        (r.window_start_epoch, r.event_type, r.event_cnt)
        for r in sev.streaming_tumbling(spark, SF).collect()
    }
    batch_rows = {
        (r.window_start_epoch, r.event_type, r.event_cnt)
        for r in batch_events.events_tumbling_hourly(spark, SF).collect()
    }
    # append mode + watermark: only closed windows are emitted, and
    # every emitted window must match the batch result exactly
    assert stream_rows <= batch_rows
    assert len(stream_rows) >= len(batch_rows) - 50  # only the tail stays open


def test_streaming_sliding_subset_of_batch(spark):
    stream_rows = {
        (r.window_start_epoch, r.event_type, r.event_cnt)
        for r in sev.streaming_sliding(spark, SF).collect()
    }
    batch_rows = {
        (r.window_start_epoch, r.event_type, r.event_cnt)
        for r in batch_events.events_sliding_hourly(spark, SF).collect()
    }
    assert stream_rows <= batch_rows
    assert len(stream_rows) > 0


def test_streaming_dedup_suppresses_double_delivery(spark):
    """Same file staged twice → every event arrives twice; the
    watermarked dedup must keep each event exactly once."""
    got = {
        r.event_type: (r.n_rows, r.n_distinct)
        for r in sev.streaming_dedup(spark, SF).collect()
    }
    want = {
        r.event_type: r.n
        for r in load_events(spark, SF)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(want)
    for etype, n in want.items():
        assert got[etype] == (n, n)


def test_stream_stream_join_matches_batch(spark):
    """Inner interval join on bounded input: streaming result equals
    the batch twin exactly (inner joins emit only definite matches, and
    processAllAvailable drains every pair within the interval bound)."""
    key = lambda r: (r.click_id, r.purchase_id, r.user_id, r.click_epoch, r.purchase_epoch)
    stream_rows = {key(r) for r in sjoin.streaming_click_attribution(spark, SF).collect()}
    batch_rows = {key(r) for r in sjoin.attribution_batch(spark, SF).collect()}
    assert stream_rows == batch_rows
    assert len(batch_rows) > 0


def test_streaming_stateful_matches_batch_totals(spark):
    """r13: the stream accumulates per-row micro-quantized integers
    (stateful._sum_micros replays Spark's double→DECIMAL(28,6) cast),
    so the totals are EXACTLY the batch decimal sum — no tolerance."""
    got = {
        r.user_id: (r.total_events, r.total_value_micros)
        for r in streaming_stateful_totals(spark, SF).collect()
    }
    want = {
        r.user_id: (r.cnt, r.val)
        for r in load_events(spark, SF)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(F.col("value").cast("decimal(28,6)")) * 1000000)
            .cast("long")
            .alias("val"),
        )
        .collect()
    }
    assert got == want


def test_batch_mismatch_pins_are_zero(spark):
    """Every streaming query embeds a batch_mismatch column counting
    emitted rows its batch twin does not produce — all must be 0."""
    from cgtcalc_data_transformer_spark.registry import REGISTRY

    for name in (
        "streaming_tumbling",
        "streaming_sliding",
        "streaming_session",
        "streaming_stateful",
        "streaming_dedup",
        "streaming_join",
        "streaming_join_outer",
    ):
        fn, _ = REGISTRY[name]
        df = fn(spark, SF)
        assert "batch_mismatch" in df.columns, name
        vals = {r.batch_mismatch for r in df.select("batch_mismatch").distinct().collect()}
        assert vals == {0}, f"{name}: batch_mismatch={vals}"


def test_stream_static_enrich_matches_batch(spark):
    """Stream-static join: stateless per-micro-batch enrichment must
    equal the batch twin exactly, and every event must enrich (the dim
    covers every user by construction)."""
    key = lambda r: (r.event_id, r.user_id, r.event_type, r.user_tier, r.event_epoch)
    stream_rows = {key(r) for r in sjoin.streaming_static_enrich(spark, SF).collect()}
    batch_rows = {key(r) for r in sjoin.static_enrich_batch(spark, SF).collect()}
    assert stream_rows == batch_rows
    assert len(batch_rows) == load_events(spark, SF).count()


def test_stream_stream_left_outer_join_subset_of_batch(spark):
    """LEFT OUTER interval join: matched pairs equal the batch twin
    (definite evidence streams through); NULL-purchase rows are the
    watermark-proven subset of the batch twin's unmatched clicks —
    tail clicks whose no-match proof needs a later watermark are
    withheld, never fabricated."""
    key = lambda r: (r.click_id, r.purchase_id, r.user_id, r.click_epoch, r.purchase_epoch)
    stream_rows = {key(r) for r in sjoin.streaming_click_attribution_outer(spark, SF).collect()}
    batch_rows = {key(r) for r in sjoin.attribution_outer_batch(spark, SF).collect()}
    assert stream_rows <= batch_rows
    matched = lambda rows: {r for r in rows if r[1] is not None}
    assert matched(stream_rows) == matched(batch_rows)
    assert len(matched(batch_rows)) > 0


def test_streaming_complete_totals_equals_batch(spark):
    """COMPLETE mode on bounded input: the final memory-sink table is
    the full aggregate — equal to the batch twin exactly (decimal
    sums, so micro-batch arrival order cannot drift the double)."""
    from cgtcalc_data_transformer_spark.streaming import events as sev

    got = {
        r.event_type: (r.n_events, r.total_value, r.batch_mismatch)
        for r in sev.streaming_complete_totals(spark, SF).collect()
    }
    want = {
        r.event_type: (r.n_events, r.total_value)
        for r in sev.events_type_totals(spark, SF).collect()
    }
    assert set(got) == set(want)
    for t, (n, v) in want.items():
        assert got[t] == (n, v, 0)


def test_streaming_python_source_matches_range_twin(spark):
    """Pluggable Python streaming source: offsets advance per batch,
    the bounded run's final aggregate equals the range() twin exactly."""
    from cgtcalc_data_transformer_spark.streaming import events as sev

    got = {
        r.bucket: (r.n_ticks, r.value_total, r.batch_mismatch)
        for r in sev.streaming_python_source(spark, SF).collect()
    }
    want = {
        r.bucket: (r.n_ticks, r.value_total)
        for r in sev.ticker_totals(spark, SF).collect()
    }
    assert set(got) == set(want) and len(want) == 8
    for b, (n, v) in want.items():
        assert got[b] == (n, v, 0)


def test_streaming_tws_totals_matches_batch(spark):
    """transformWithStateInPandas (typed ValueState over RocksDB) must
    reach the same final per-user state as the GroupState twin."""
    import pytest

    from cgtcalc_data_transformer_spark.streaming.stateful import (
        streaming_tws_totals,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf absent: transformWithState runner cannot init")

    rows = streaming_tws_totals(spark, SF).collect()
    assert rows
    assert {r.batch_mismatch for r in rows} == {0}
    want = {
        r.user_id: r.cnt
        for r in load_events(spark, SF)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    got = {r.user_id: r.total_events for r in rows}
    assert got == want
