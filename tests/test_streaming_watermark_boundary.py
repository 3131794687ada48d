"""Synthetic pins for the stream-stream outer-join emission semantics
the r13 driver oracles encode (streaming/joins.py
STREAMING_JOIN_OUTER_SQL):

1. the joint watermark is the MIN over both sides' per-operator
   watermarks — an EMPTY side holds it at 0 and nothing ever evicts;
2. a click's NULL-purchase row emits iff click_ts < wm − 1h,
   STRICTLY (a click exactly at the boundary is withheld).

These are the fixtures that derived the oracle; keeping them as
tests means a Spark-version change in eviction semantics turns a red
pytest, not a silent driver hash mismatch.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cgtcalc_data_transformer_spark.streaming.events import (
    _event_stream,
    run_stream_to_batch,
)
from cgtcalc_data_transformer_spark.streaming.joins import (
    click_purchase_left_join,
)

T_US = 1_700_000_000_000_000  # anchor timestamp, microseconds


def _write_events(rows, label: str) -> str:
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    d = tempfile.mkdtemp(prefix=f"wmpin_{label}_")
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )
    return d


def _null_click_offsets(spark, rows, label: str) -> set[int]:
    """Run the bounded outer join; return the emitted NULL-purchase
    clicks as seconds-before-T offsets."""
    stream = _event_stream(spark, os.path.join(_write_events(rows, label), "events.parquet"))
    out = run_stream_to_batch(click_purchase_left_join(stream), f"wmpin_{label}")
    return {
        T_US // 1_000_000 - r.click_epoch
        for r in out.collect()
        if r.purchase_id is None
    }


def test_empty_purchase_side_holds_watermark_at_zero(spark):
    """No purchases ever → the purchase-side watermark never advances
    → joint wm stays 0 → NO click may emit its null row, however old."""
    rows = [
        (i + 1, T_US - off * 1_000_000, i + 1, "click", 1.0, "{}")
        for i, off in enumerate(range(7_000, 20_001, 1_000))
    ]
    rows.append((99, T_US, 9_999, "view", 1.0, "{}"))
    assert _null_click_offsets(spark, rows, "nopurchase") == set()


def test_null_emission_boundary_is_strict_wm_minus_interval(spark):
    """With a purchase at T pinning the purchase watermark at T−2h and
    clicks' own max at T−7000s (click wm = T−7000−2h = joint wm),
    null rows emit for clicks with click_ts < wm − 1h = T−17800s:
    the click exactly AT the boundary is withheld (strict <)."""
    rows = []
    eid = 1
    for off in range(7_000, 20_001, 100):
        rows.append((eid, T_US - off * 1_000_000, eid, "click", 1.0, "{}"))
        eid += 1
    rows.append((eid, T_US, 500_000, "purchase", 1.0, "{}"))
    rows.append((eid + 1, T_US, 9_999, "view", 1.0, "{}"))
    emitted = _null_click_offsets(spark, rows, "boundary")
    # joint wm = min(T−7000s, T) − 2h = T−14200s; boundary = wm−1h = T−17800s
    assert emitted == set(range(17_900, 20_001, 100)), sorted(emitted)[:5]
    assert 17_800 not in emitted  # exactly at the boundary: withheld


def test_oracle_sql_matches_empty_side_holdback():
    """ADVICE r13: DuckDB's LEAST ignores NULLs, so the pre-guard
    oracle emitted null-purchase rows on a no-purchase corpus while
    the engine (pinned above) holds the joint watermark at 0 and
    emits nothing. The guarded STREAMING_JOIN_OUTER_SQL must return
    ZERO rows on the same degenerate corpus — and stay non-degenerate
    (emitting the boundary rows) when a purchase exists."""
    import duckdb

    from cgtcalc_data_transformer_spark.streaming.joins import (
        STREAMING_JOIN_OUTER_SQL,
    )

    def run(rows):
        d = _write_events(rows, "oracle_guard")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{os.path.join(d, 'events.parquet')}')"
        )
        return con.execute(STREAMING_JOIN_OUTER_SQL).df()

    no_purchase = [
        (i + 1, T_US - off * 1_000_000, i + 1, "click", 1.0, "{}")
        for i, off in enumerate(range(7_000, 20_001, 1_000))
    ]
    no_purchase.append((99, T_US, 9_999, "view", 1.0, "{}"))
    assert len(run(no_purchase)) == 0

    with_purchase = list(no_purchase)
    with_purchase.append((100, T_US, 500_000, "purchase", 1.0, "{}"))
    out = run(with_purchase)
    # joint wm = min(T-7000s, T) - 2h = T-14200s; nulls iff
    # click_ts < wm - 1h = T-17800s (strict)
    emitted = {
        T_US // 1_000_000 - int(r.click_epoch)
        for r in out.itertuples()
        if pd.isna(r.purchase_id)
    }
    assert emitted == {18_000, 19_000, 20_000}, emitted
