"""Watermark semantics under controlled late data, and the
foreachBatch idempotent-dedup sink — driven through real multi-batch
file streams (one file per micro-batch via maxFilesPerTrigger=1)."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
    dedup_sink_foreachbatch,
    run_stream_to_batch,
)

H = 3_600_000_000_000  # one hour in ns


def _write_events(path: str, rows: list[tuple[int, int]], mtime: float) -> None:
    """rows = [(event_id, ts_ns)]; fixed user/type/value/props."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def _stream(spark, d: str):
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    return raw.withColumn(
        "ts_ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
    )


def test_watermark_drops_too_late_rows(spark, tmp_path):
    """Append-mode finality: once the watermark has passed a window and
    its result is emitted, a later-arriving row for that window is
    discarded — it neither re-emits the window nor changes the count.

    (A late row whose window is still *open* in state does get merged —
    the watermark bounds state retention, it is not an input filter for
    not-yet-emitted windows.)
    """
    d = str(tmp_path / "late_src")
    os.makedirs(d)
    now = time.time()
    # batch 0: one event per hour 00:30..05:30. Watermark after the
    # batch: 05:30 - 2h = 03:30.
    _write_events(
        os.path.join(d, "f1.parquet"),
        [(i, i * H + H // 2) for i in range(6)],
        now - 90,
    )
    # batch 1 (wm=03:30): eviction emits windows 00/01/02/03 with one
    # row each; this fresh event keeps the stream moving
    _write_events(os.path.join(d, "f2.parquet"), [(50, 5 * H + 3 * H // 4)], now - 60)
    # batch 2 (wm=03:45): a too-late event at 01:30 — its window was
    # emitted in batch 1; must be dropped
    _write_events(
        os.path.join(d, "f3.parquet"),
        [(100, 1 * H + H // 2), (101, 6 * H + H // 2)],
        now - 30,
    )

    agg = (
        _stream(spark, d)
        .withWatermark("ts_ts", "2 hours")
        .groupBy(F.window("ts_ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "cnt",
        )
    )
    out = run_stream_to_batch(agg, "late_out")
    rows = out.collect()
    emitted = [r.win_start for r in rows]
    # single emission per window — the late row did not re-open 01:00
    assert sorted(emitted) == sorted(set(emitted))
    counts = {r.win_start: r.cnt for r in rows}
    # and the emitted count for 01:00 excludes the too-late row
    assert counts[3600] == 1


def test_foreachbatch_dedup_sink(spark, tmp_path):
    d = str(tmp_path / "dup_src")
    os.makedirs(d)
    now = time.time()
    # the same 3 logical events twice within one file, plus a second
    # file that repeats one of them (cross-batch dup survives — the
    # sink contract is per-batch idempotency, documented)
    rows = [(1, H), (2, 2 * H), (3, 3 * H)]
    _write_events(os.path.join(d, "f1.parquet"), rows + rows, now - 60)
    _write_events(os.path.join(d, "f2.parquet"), [(4, 4 * H)], now - 30)

    out_path = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "ckpt")
    q = dedup_sink_foreachbatch(_stream(spark, d), out_path, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out_path)
    # 6 input rows in batch 1 → 3 after per-batch dedup; +1 from batch 2
    assert got.count() == 4
    assert got.select("event_id").distinct().count() == 4
