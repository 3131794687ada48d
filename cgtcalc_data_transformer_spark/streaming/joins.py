"""Stream-stream join: click→purchase attribution within a time bound.

The canonical Structured Streaming interval join: both sides
watermarked, the join condition carries an event-time range so the
engine can bound state retention on both sides (without the interval,
state grows forever). Semantics are defined by the batch twin
(``attribution_batch``) which the tests compare against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

ATTRIBUTION_WINDOW = "1 hour"


def _typed(stream: DataFrame, etype: str, prefix: str) -> DataFrame:
    return (
        stream.filter(F.col("event_type") == etype)
        .select(
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("ts_ts").alias(f"{prefix}_ts"),
        )
        .withWatermark(f"{prefix}_ts", "2 hours")
    )


def click_purchase_join(events_stream: DataFrame) -> DataFrame:
    """clicks ⋈ purchases of the same user with
    click_ts ≤ purchase_ts ≤ click_ts + 1 h.

    Both inputs watermarked 2 h → the engine evicts click state once
    no qualifying purchase can still arrive (watermark past
    click_ts + 1 h) and vice versa — bounded state at any scale.
    """
    clicks = _typed(events_stream, "click", "click")
    purchases = _typed(events_stream, "purchase", "purchase")
    cond = (
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
    )
    return clicks.join(purchases, cond, "inner").select(
        "click_id",
        "purchase_id",
        F.col("click_user").alias("user_id"),
        F.unix_timestamp("click_ts").alias("click_epoch"),
        F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
    )


def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: run the stream-stream join over the bounded
    events stream and return the attributed pairs."""
    from cgtcalc_data_transformer_spark.streaming.events import (
        _event_stream,
        run_stream_to_batch,
    )

    from cgtcalc_data_transformer_spark.streaming.events import with_batch_mismatch

    stream = _event_stream(spark, f"{sf_dir}/events.parquet")
    out = run_stream_to_batch(
        click_purchase_join(stream), "attribution_out", output_mode="append"
    )
    out = with_batch_mismatch(out, attribution_batch(spark, sf_dir))
    return out.orderBy("click_id", "purchase_id")


def attribution_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: the SAME join code over the batch events table
    (withWatermark is a no-op on batch input), so streaming and batch
    results are comparable row-for-row."""
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    ev = load_events(spark, sf_dir)
    return click_purchase_join(ev).orderBy("click_id", "purchase_id")


# timestamps compared at Spark's native microsecond resolution
# (ts_ts = timestamp_micros(ts div 1000)); epochs are floor-seconds
ATTRIBUTION_SQL = """
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_ns(ts) // 1000 AS c_us
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id, epoch_ns(ts) // 1000 AS p_us
  FROM events WHERE event_type = 'purchase'
)
SELECT click_id, purchase_id, c.user_id AS user_id,
       c_us // 1000000 AS click_epoch,
       p_us // 1000000 AS purchase_epoch
FROM c JOIN p ON c.user_id = p.user_id
             AND p_us >= c_us AND p_us <= c_us + 3600000000
ORDER BY click_id, purchase_id
"""


# --------------------------------------------------- stream-static join
def stream_static_enrich(events_stream: DataFrame, dim: DataFrame) -> DataFrame:
    """Streaming events enriched against a STATIC dimension — the
    third join shape Structured Streaming supports (beside
    stream-stream and stream-batch-twin): the static side needs no
    watermark and holds no state; each micro-batch joins against the
    dim as an ordinary batch join (broadcast when small), so the
    stream side stays append-only with zero join state. This is the
    100 TB enrichment pattern: a slowly-refreshed dim table joined
    into a firehose without any stateful operator.
    """
    return (
        events_stream.join(dim, F.col("user_id") == F.col("dim_user"), "inner")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("tier").alias("user_tier"),
            F.unix_timestamp("ts_ts").alias("event_epoch"),
        )
    )


def _user_tier_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic static dim derived from the events table itself
    (user ids are self-contained): tier by user_id modulo — stands in
    for the externally-maintained profile table."""
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    return (
        load_events(spark, sf_dir)
        .select("user_id")
        .distinct()
        .select(
            F.col("user_id").alias("dim_user"),
            F.when(F.col("user_id") % 3 == 0, F.lit("gold"))
            .when(F.col("user_id") % 3 == 1, F.lit("silver"))
            .otherwise(F.lit("bronze"))
            .alias("tier"),
        )
    )


def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: enrich the bounded event stream against the
    static tier dim; mismatch-pinned against the batch twin."""
    from cgtcalc_data_transformer_spark.streaming.events import (
        _event_stream,
        run_stream_to_batch,
        with_batch_mismatch,
    )

    stream = _event_stream(spark, f"{sf_dir}/events.parquet")
    dim = _user_tier_dim(spark, sf_dir)
    out = run_stream_to_batch(
        stream_static_enrich(stream, dim), "enrich_out", output_mode="append"
    )
    out = with_batch_mismatch(out, static_enrich_batch(spark, sf_dir))
    return out.orderBy("event_id")


def static_enrich_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment (same join code)."""
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    ev = load_events(spark, sf_dir)
    return stream_static_enrich(ev, _user_tier_dim(spark, sf_dir)).orderBy(
        "event_id"
    )


STATIC_ENRICH_SQL = """
WITH dim AS (
  SELECT DISTINCT user_id,
         CASE WHEN user_id % 3 = 0 THEN 'gold'
              WHEN user_id % 3 = 1 THEN 'silver'
              ELSE 'bronze' END AS tier
  FROM events
)
SELECT e.event_id, e.user_id, e.event_type,
       d.tier AS user_tier,
       epoch_ns(e.ts) // 1000 // 1000000 AS event_epoch
FROM events e JOIN dim d ON e.user_id = d.user_id
ORDER BY e.event_id
"""


# ------------------------------------------- stream-stream LEFT OUTER
def click_purchase_left_join(events_stream: DataFrame) -> DataFrame:
    """LEFT OUTER variant of the interval join: every click emits —
    joined rows as matches arrive, and a NULL-purchase row once the
    watermark proves no qualifying purchase can still come
    (watermark > click_ts + 1 h). This is the semantics batch LEFT
    JOIN gives for free but streaming can only produce *watermark-
    delayed*: the NULL side is a negative claim, and the engine may
    assert it only after the interval's state-retention bound expires.
    Same bounded state as the inner form.
    """
    clicks = _typed(events_stream, "click", "click")
    purchases = _typed(events_stream, "purchase", "purchase")
    cond = (
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
    )
    return clicks.join(purchases, cond, "left_outer").select(
        "click_id",
        F.col("purchase_id"),
        F.col("click_user").alias("user_id"),
        F.unix_timestamp("click_ts").alias("click_epoch"),
        F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
    )


def streaming_click_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cgtcalc_data_transformer_spark.streaming.events import (
        _event_stream,
        run_stream_to_batch,
        with_batch_mismatch,
    )

    stream = _event_stream(spark, f"{sf_dir}/events.parquet")
    out = run_stream_to_batch(
        click_purchase_left_join(stream), "attribution_outer_out", output_mode="append"
    )
    out = with_batch_mismatch(out, attribution_outer_batch(spark, sf_dir))
    return out.orderBy("click_id", "purchase_id")


def attribution_outer_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the left-outer interval join (oracled)."""
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    ev = load_events(spark, sf_dir)
    return click_purchase_left_join(ev).orderBy("click_id", "purchase_id")


ATTRIBUTION_OUTER_SQL = """
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_ns(ts) // 1000 AS c_us
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id, epoch_ns(ts) // 1000 AS p_us
  FROM events WHERE event_type = 'purchase'
)
SELECT click_id, purchase_id, c.user_id AS user_id,
       c_us // 1000000 AS click_epoch,
       p_us // 1000000 AS purchase_epoch
FROM c LEFT JOIN p ON c.user_id = p.user_id
                  AND p_us >= c_us AND p_us <= c_us + 3600000000
ORDER BY click_id, purchase_id
"""


# ------------------------------------------- driver oracles (r13)
# Inner stream-stream interval join on bounded input: every matched
# pair is emitted in the micro-batch where both sides are present
# (no watermark withholding on the MATCH side), so the final table
# equals the batch join exactly — the oracle is ATTRIBUTION_SQL plus
# the constant mismatch column.
STREAMING_JOIN_SQL = """
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_ns(ts) // 1000 AS c_us
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id, epoch_ns(ts) // 1000 AS p_us
  FROM events WHERE event_type = 'purchase'
)
SELECT click_id, purchase_id, c.user_id AS user_id,
       c_us // 1000000 AS click_epoch,
       p_us // 1000000 AS purchase_epoch,
       CAST(0 AS BIGINT) AS batch_mismatch
FROM c JOIN p ON c.user_id = p.user_id
             AND p_us >= c_us AND p_us <= c_us + 3600000000
ORDER BY click_id, purchase_id
"""

# LEFT OUTER: a click's NULL-purchase row is a negative claim the
# engine asserts only at state eviction — when the JOINT watermark
# (the MIN over both sides' per-operator watermarks, each
# floor_ms(max side event time) - 2h; an empty or lagging side HOLDS
# THE WATERMARK BACK — verified with a synthetic no-purchase corpus
# where nothing ever evicts) has passed click_ts + 1h. The boundary
# is strict (click_ts < wm - 1h emits; = does not), pinned by a
# synthetic fixture with clicks at exact 100 s offsets.
STREAMING_JOIN_OUTER_SQL = """
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_ns(ts) // 1000 AS c_us
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id, epoch_ns(ts) // 1000 AS p_us
  FROM events WHERE event_type = 'purchase'
), wm AS (
  -- DuckDB LEAST IGNORES NULLs (unlike the joint-watermark MIN it
  -- models): on a corpus where one side is EMPTY, that side's MAX is
  -- NULL and a bare LEAST would fall through to the other side's
  -- watermark and emit null-purchase rows — but Spark's joint
  -- watermark stays pinned at 0 by the empty side and emits NOTHING
  -- (tests/test_streaming_watermark_boundary.py:
  -- test_empty_purchase_side_holds_watermark_at_zero). Guard the
  -- empty-side case to NULL explicitly; the null-emission predicate
  -- below is then NULL -> false, matching the hold-back semantics
  -- (ADVICE r13).
  SELECT CASE
    WHEN (SELECT COUNT(*) FROM c) = 0 OR (SELECT COUNT(*) FROM p) = 0
    THEN NULL
    ELSE LEAST(
      (SELECT ((MAX(c_us) // 1000) - 7200000) * 1000 FROM c),
      (SELECT ((MAX(p_us) // 1000) - 7200000) * 1000 FROM p)
    )
  END AS wm_us
)
SELECT click_id, purchase_id, c.user_id AS user_id,
       c_us // 1000000 AS click_epoch,
       p_us // 1000000 AS purchase_epoch,
       CAST(0 AS BIGINT) AS batch_mismatch
FROM c LEFT JOIN p ON c.user_id = p.user_id
                  AND p_us >= c_us AND p_us <= c_us + 3600000000
WHERE purchase_id IS NOT NULL
   OR c_us + 3600000000 < (SELECT wm_us FROM wm)
ORDER BY click_id, purchase_id
"""

# Stream-static join: stateless per-micro-batch enrichment — every
# event emits, the final table equals the batch twin exactly.
STREAMING_STATIC_ENRICH_SQL = """
WITH dim AS (
  SELECT DISTINCT user_id,
         CASE WHEN user_id % 3 = 0 THEN 'gold'
              WHEN user_id % 3 = 1 THEN 'silver'
              ELSE 'bronze' END AS tier
  FROM events
)
SELECT e.event_id, e.user_id, e.event_type,
       d.tier AS user_tier,
       epoch_ns(e.ts) // 1000 // 1000000 AS event_epoch,
       CAST(0 AS BIGINT) AS batch_mismatch
FROM events e JOIN dim d ON e.user_id = d.user_id
ORDER BY e.event_id
"""
