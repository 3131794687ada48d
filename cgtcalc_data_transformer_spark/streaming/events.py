"""Structured Streaming variants of the event-window operators.

The reference is batch-only (SURVEY.md §2.2 — streaming is an
engine extension). These run the same semantics as
``operators/events.py`` through ``readStream``: tumbling windows with
watermarked late-data handling, native session windows, and a
``foreachBatch`` exactly-once-style dedup sink.

Local testing drives a bounded parquet directory through the
streaming engine with ``processAllAvailable()`` + a memory sink; in
production the source line is the only thing that changes
(kafka/kinesis), because everything downstream is declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# streaming-side schema: ts as int64 nanos (nanosAsLong layout)
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# streaming-side schema: ts as native parquet timestamp (micros layout)
EVENTS_STREAM_SCHEMA_TS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _stage_dir(parquet_file: str) -> str:
    """The file-stream source needs a *directory*; stage a symlink to
    the single events.parquet in a temp dir (copy as fallback)."""
    import os
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="events_stream_")
    dst = os.path.join(d, os.path.basename(parquet_file))
    try:
        os.symlink(os.path.abspath(parquet_file), dst)
    except OSError:
        shutil.copy(parquet_file, dst)
    return d


def _event_stream(spark: SparkSession, source: str) -> DataFrame:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    import os

    path = _stage_dir(source) if os.path.isfile(source) else source
    # Peek at the parquet footer (driver-only batch read) to learn the
    # physical ts layout: the driver testdata carries timestamp[us]
    # while the synthetic late-data fixtures write int64 nanos. The
    # stream must mirror load_events' handling of both so the
    # batch-twin pins compare identical columns (ts = int64 nanos,
    # ts_ts = microsecond timestamp).
    ts_type = dict(spark.read.parquet(path).dtypes)["ts"]
    if ts_type == "bigint":  # int64 nanos via nanosAsLong
        raw = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        # integer `div`, NOT `/1000` + cast: the double division on
        # ~1.7e18 ns values (above 2^53) can floor 1 µs low, and the
        # r13 watermark oracles consume ts_ts at ms precision — a max
        # event time on an exact ms boundary would shift the floor-ms
        # watermark 1 ms below the oracle's exact integer epoch_ns//
        # 1000 and flip boundary emissions (ADVICE r13).
        return raw.withColumn(
            "ts_ts", F.expr("timestamp_micros(ts div 1000)")
        )
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA_TS)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return raw.withColumn("ts_ts", F.col("ts")).withColumn(
        "ts", (F.unix_micros(F.col("ts")) * F.lit(1000)).cast("long")
    )


def _batch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME events with the same ts_ts column, read as a batch
    table — the twin input every streaming query is pinned against."""
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    # load_events already derives ts_ts — do NOT re-derive it here: a
    # second copy of the ns→µs expression could silently diverge from
    # the canonical one and skew every batch_mismatch pin.
    return load_events(spark, sf_dir)


# The window aggregations are single functions applied to EITHER the
# stream or the batch twin (withWatermark is a no-op on batch input),
# so the two sides differ only in execution engine — exactly what the
# batch_mismatch pin is meant to isolate.
def _tumbling_agg(ev: DataFrame) -> DataFrame:
    # value summed as DECIMAL(28,6) then cast back to double (the
    # events_type_totals recipe): decimal addition is exact and
    # order-independent, so the stream (micro-batch arrival order),
    # the batch twin (partition order), and the DuckDB oracle all
    # produce bit-identical doubles — a plain double sum's last bits
    # depend on accumulation order and can never be driver-hashed.
    return (
        ev.withWatermark("ts_ts", "2 hours")
        .groupBy(F.window("ts_ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "event_cnt",
            "value_sum",
        )
    )


def _sliding_agg(ev: DataFrame) -> DataFrame:
    return (
        ev.withWatermark("ts_ts", "2 hours")
        .groupBy(F.window("ts_ts", "1 hour", "30 minutes"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("event_cnt"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "event_cnt",
        )
    )


def _session_agg(ev: DataFrame) -> DataFrame:
    return (
        ev.withWatermark("ts_ts", "2 hours")
        .groupBy(F.session_window("ts_ts", "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("session_window.start")).alias("session_start_epoch"),
            "user_id",
            "n_events",
        )
    )


def tumbling_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts with a 2-hour watermark."""
    return _tumbling_agg(_event_stream(spark, sf_dir))


def sliding_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min, 2-hour watermark — each
    event lands in 2 overlapping windows (window duration / slide)."""
    return _sliding_agg(_event_stream(spark, sf_dir))


def session_windows_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap) per user with watermark."""
    return _session_agg(_event_stream(spark, sf_dir))


def with_batch_mismatch(stream_out: DataFrame, batch_twin: DataFrame) -> DataFrame:
    """Pin streaming semantics to the batch twin (VERDICT r1 #6).

    Append-mode + watermark means a bounded stream may WITHHOLD
    still-open windows — but every row it DOES emit must be a row the
    batch computation produces. ``stream ⊖ batch`` (multiset except)
    is therefore the invariant, counted and embedded as a constant
    ``batch_mismatch`` column: the rows-only correctness gate records
    values, so a non-zero count is visible in the driver output, and
    the pytest twins assert it is 0.
    """
    mismatch = stream_out.exceptAll(batch_twin.select(*stream_out.columns)).count()
    return stream_out.withColumn("batch_mismatch", F.lit(mismatch).cast("long"))


def _num_input_rows(progress: object) -> int:
    """numInputRows from a StreamingQueryProgress (dict-like in
    PySpark ≥3.5, attribute object elsewhere)."""
    try:
        return int(progress["numInputRows"])  # type: ignore[index]
    except (TypeError, KeyError):
        return int(progress.numInputRows)  # type: ignore[attr-defined]


def _wait_for_watermark_flush(q: "object", timeout_s: float) -> None:
    """Block until a *no-data* micro-batch has committed AFTER the last
    data batch.

    Append-mode windowed aggregations emit a window only once the
    watermark passes its end — and the watermark computed from the last
    data batch is applied by the no-data batch that FOLLOWS it
    (``spark.sql.streaming.noDataMicroBatches.enabled``, default on).
    ``processAllAvailable()`` returns as soon as the data batches are
    done, so stopping there races the flush and can leave the memory
    sink with 0 rows (VERDICT r2 #1). Polling ``recentProgress`` for a
    committed ``numInputRows == 0`` entry after the final data batch
    makes the flush deterministic.
    """
    import time

    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        progress = list(q.recentProgress)
        if progress:
            rows = [_num_input_rows(p) for p in progress]
            last_data = max((i for i, n in enumerate(rows) if n > 0), default=-1)
            if any(n == 0 for n in rows[last_data + 1 :]):
                return
        time.sleep(0.05)
    raise TimeoutError(
        f"no watermark-advancing no-data batch committed within {timeout_s}s"
    )


def run_stream_to_batch(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    flush_timeout_s: float = 120.0,
    wait_flush: bool = True,
) -> DataFrame:
    """Drive a bounded stream to completion, return the materialized
    result as a batch DataFrame (memory sink).

    Waits for the trailing no-data batch so watermark-closed windows
    are flushed to the sink before the query stops (the r2 flush race).
    ``wait_flush=False`` is for watermark-free queries (complete-mode
    aggregations): no watermark ever advances, so no no-data batch
    fires and ``processAllAvailable()`` alone is already the final
    state."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
        if wait_flush:
            _wait_for_watermark_flush(q, flush_timeout_s)
            # one more drain so the flush batch's sink commit is visible
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: bounded-stream tumbling counts as a batch result.

    Append mode + watermark → only windows the watermark has passed
    are emitted; with a bounded input the final windows stay open, so
    this intentionally reports the *closed* windows (late-data
    semantics observable in the result).
    """
    out = run_stream_to_batch(
        tumbling_counts_stream(spark, f"{sf_dir}/events.parquet"),
        "tumbling_out",
    )
    out = with_batch_mismatch(out, _tumbling_agg(_batch_events(spark, sf_dir)))
    return out.orderBy("window_start_epoch", "event_type")


def streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_stream_to_batch(
        sliding_counts_stream(spark, f"{sf_dir}/events.parquet"),
        "sliding_out",
    )
    out = with_batch_mismatch(out, _sliding_agg(_batch_events(spark, sf_dir)))
    return out.orderBy("window_start_epoch", "event_type")


def streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_stream_to_batch(
        session_windows_stream(spark, f"{sf_dir}/events.parquet"),
        "session_out",
    )
    out = with_batch_mismatch(out, _session_agg(_batch_events(spark, sf_dir)))
    return out.orderBy("session_start_epoch", "user_id")


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark on the
    event id, demonstrated against a deliberately doubled source (the
    same parquet staged twice → every event arrives in two different
    micro-batches; the second arrival is inside the 2-hour watermark
    and must be suppressed).

    State holds one key per event inside the watermark horizon and is
    evicted as the watermark advances — bounded memory at any rate,
    which plain dropDuplicates (keep-all-keys-forever) is not.
    """
    import os
    import shutil
    import tempfile

    src = f"{sf_dir}/events.parquet"
    d = tempfile.mkdtemp(prefix="events_dup_")
    for name in ("copy1.parquet", "copy2.parquet"):
        dst = os.path.join(d, name)
        try:
            os.symlink(os.path.abspath(src), dst)
        except OSError:
            shutil.copy(src, dst)

    deduped = (
        _event_stream(spark, d)
        .withWatermark("ts_ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )
    out = run_stream_to_batch(deduped, "dedup_stream_out")
    result = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_distinct"),
    )
    # batch twin: after perfect dedup of the doubled source, per-type
    # row count == distinct-event count of the ORIGINAL batch table
    twin = (
        _batch_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.countDistinct("event_id").alias("n_rows"),
            F.countDistinct("event_id").alias("n_distinct"),
        )
    )
    return with_batch_mismatch(result, twin).orderBy("event_type")


def dedup_sink_foreachbatch(
    stream_df: DataFrame, out_path: str, checkpoint: str
) -> "object":
    """foreachBatch sink with per-batch exact dedup — the idempotent-
    write pattern for exactly-once file sinks."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.dropDuplicates().write.mode("append").parquet(out_path)

    return (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .start()
    )


# --------------------------------------------- complete-mode aggregate
def _type_totals_agg(ev: DataFrame) -> DataFrame:
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total_value"),
    )


def streaming_complete_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type totals in COMPLETE output mode — the third output-mode
    semantics next to append (windows) and foreachBatch (sink-side):
    every trigger rewrites the FULL aggregate, so a bounded stream's
    final table equals the batch aggregate exactly — no watermark, no
    withheld tail, byte-equal to the twin (decimal-summed, so
    micro-batch arrival order cannot drift the double).

    Scale note: complete mode re-emits the whole result each trigger,
    so it is only for aggregates with bounded cardinality (here: a
    handful of event types). Unbounded keys → append/update + state
    eviction instead.
    """
    stream = _event_stream(spark, f"{sf_dir}/events.parquet")
    out = run_stream_to_batch(
        _type_totals_agg(stream),
        "complete_totals_out",
        output_mode="complete",
        wait_flush=False,
    )
    out = with_batch_mismatch(out, _type_totals_agg(_batch_events(spark, sf_dir)))
    return out.orderBy("event_type")


def events_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled batch twin of ``streaming_complete_totals``."""
    return _type_totals_agg(_batch_events(spark, sf_dir)).orderBy("event_type")


EVENTS_TYPE_TOTALS_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# -------------------------------------- pluggable streaming source
def streaming_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end run of the Spark-4 Python STREAMING DataSource
    (sources/ticker_datasource.py): offsets advance per micro-batch,
    the bounded tick stream aggregates per bucket in COMPLETE mode,
    and the final table must equal the batch twin computed from
    ``range()`` — proving the pluggable source's offset/replay
    contract delivers exactly the declared rows."""
    from cgtcalc_data_transformer_spark.sources import ticker_datasource

    ticker_datasource.register(spark)
    stream = spark.readStream.format("ticker").load()
    agg = stream.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("value_total"),
    )
    out = run_stream_to_batch(
        agg, "ticker_out", output_mode="complete", wait_flush=False
    )
    out = with_batch_mismatch(out, ticker_totals(spark, sf_dir))
    return out.orderBy("bucket")


def ticker_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled batch twin: the same tick rows from ``spark.range``."""
    from cgtcalc_data_transformer_spark.sources.ticker_datasource import (
        NUM_BUCKETS,
        TOTAL_TICKS,
    )

    ticks = spark.range(TOTAL_TICKS).select(
        (F.col("id") % NUM_BUCKETS).alias("bucket"),
        ((F.col("id") * 37 % 1000) / 10.0).alias("value"),
    )
    return (
        ticks.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("value_total"),
        )
        .orderBy("bucket")
    )


TICKER_TOTALS_SQL = """
SELECT i % 8 AS bucket,
       COUNT(*) AS n_ticks,
       CAST(SUM(CAST((i * 37 % 1000) / 10.0 AS DECIMAL(28,6))) AS DOUBLE) AS value_total
FROM range(0, 1000) t(i)
GROUP BY 1
ORDER BY 1
"""


# ------------------------------------------- driver oracles (r13)
# The 10 streaming_* queries burned as rows-only driver records from
# r5 through r12 (VERDICT r12 item 3). On BOUNDED input their final
# tables ARE deterministic closed forms: the single-file source
# delivers all rows in one micro-batch, the trailing no-data batch
# advances the event-time watermark to floor_ms(max event time) - 2h
# exactly once, and the append-mode stateful operators then emit
# precisely the windows/rows whose event-time bound lies at or below
# that watermark (verified empirically: the emitted/withheld boundary
# at sf0.001 and sf0.01 sits exactly at window_end <= wm). Each
# oracle replays that closed form in DuckDB — the batch aggregate
# filtered by the watermark predicate — plus the constant
# batch_mismatch = 0 column (the stream-vs-batch invariant the
# pytest pins assert). The <= vs < distinction at EXACT equality is
# unobservable on these corpora (the watermark carries the max ts's
# milliseconds and never lands on a window boundary); the boundary
# semantics themselves are pinned by the synthetic late-data tests.
_WM_US = (
    "(SELECT ((MAX(epoch_ns(ts) // 1000) // 1000) - 7200000) * 1000 "
    "FROM events)"
)

STREAMING_TUMBLING_SQL = f"""
WITH agg AS (
  SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start_epoch,
         event_type,
         COUNT(*) AS event_cnt,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
  FROM events
  GROUP BY 1, 2
)
SELECT window_start_epoch, event_type, event_cnt, value_sum,
       CAST(0 AS BIGINT) AS batch_mismatch
FROM agg
WHERE (window_start_epoch + 3600) * 1000000 <= {_WM_US}
ORDER BY window_start_epoch, event_type
"""

STREAMING_SLIDING_SQL = f"""
WITH agg AS (
  SELECT ((epoch_ns(ts) // 1800000000000) - k) * 1800 AS window_start_epoch,
         event_type,
         COUNT(*) AS event_cnt
  FROM events, unnest([0, 1]) AS t(k)
  WHERE ((epoch_ns(ts) // 1800000000000) - k) * 1800 >= 0
  GROUP BY 1, 2
)
SELECT window_start_epoch, event_type, event_cnt,
       CAST(0 AS BIGINT) AS batch_mismatch
FROM agg
WHERE (window_start_epoch + 3600) * 1000000 <= {_WM_US}
ORDER BY window_start_epoch, event_type
"""

# session_window semantics: an event EXTENDS the session while its ts
# is strictly inside [start, last + gap); a gap of exactly 30 min
# starts a new session (half-open window). Session end = last + gap;
# emitted once the watermark passes it.
STREAMING_SESSION_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
), flagged AS (
  SELECT user_id, us,
         CASE WHEN LAG(us) OVER w IS NULL
                OR us - LAG(us) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us)
), numbered AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
), sess AS (
  SELECT MIN(us) // 1000000 AS session_start_epoch,
         user_id,
         COUNT(*) AS n_events,
         MAX(us) AS last_us
  FROM numbered
  GROUP BY user_id, sid
)
SELECT session_start_epoch, user_id, n_events,
       CAST(0 AS BIGINT) AS batch_mismatch
FROM sess
WHERE last_us + 1800000000 <= {_WM_US}
ORDER BY session_start_epoch, user_id
"""

# Perfect dedup of the doubled source: per-type row count equals the
# distinct-event count of the original table (event_id is globally
# unique, so COUNT(DISTINCT event_id) = the deduped cardinality).
STREAMING_DEDUP_SQL = """
SELECT event_type,
       COUNT(DISTINCT event_id) AS n_rows,
       COUNT(DISTINCT event_id) AS n_distinct,
       CAST(0 AS BIGINT) AS batch_mismatch
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# Complete mode re-emits the full aggregate every trigger — the final
# table equals the batch aggregate with no watermark withholding.
STREAMING_COMPLETE_TOTALS_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
       CAST(0 AS BIGINT) AS batch_mismatch
FROM events
GROUP BY event_type
ORDER BY event_type
"""

STREAMING_PYTHON_SOURCE_SQL = """
SELECT i % 8 AS bucket,
       COUNT(*) AS n_ticks,
       CAST(SUM(CAST((i * 37 % 1000) / 10.0 AS DECIMAL(28,6))) AS DOUBLE) AS value_total,
       CAST(0 AS BIGINT) AS batch_mismatch
FROM range(0, 1000) t(i)
GROUP BY 1
ORDER BY 1
"""
