"""Event-stream operators, batch form (the streaming variants live in
``streaming/events.py``; these batch versions define the semantics and
are what the DuckDB oracle checks — SURVEY.md §2.2 "batch-expressible
versions first").

``events.ts`` is int64 *nanoseconds* (see sources/tpch.py). All window
bucketing uses integer nano arithmetic (``div``), never float division:
epoch nanos exceed 2^53, so a double round-trip would corrupt buckets.
Bucket keys are emitted as epoch *seconds* (bigint) — engine-neutral,
timezone-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_events, load_table

NS_PER_SEC = 1_000_000_000
HOUR_NS = 3600 * NS_PER_SEC
HALF_HOUR_NS = 1800 * NS_PER_SEC
SESSION_GAP_NS = 1800 * NS_PER_SEC
DAY_NS = 86400 * NS_PER_SEC


from cgtcalc_data_transformer_spark.functions.money import dec as _dec


# ------------------------------------------------------ tumbling window
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type: count + value sum.

    Map-side combinable groupBy; the bucket key is a pure projection,
    so the only shuffle is the aggregation itself.
    """
    ev = load_events(spark, sf_dir)
    bucket = (F.expr(f"ts div {HOUR_NS}") * F.lit(3600)).alias("window_start_epoch")
    return (
        ev.groupBy(bucket, F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum(_dec(F.col("value"))).cast("double").alias("value_sum"),
        )
        .orderBy("window_start_epoch", "event_type")
    )


EVENTS_TUMBLING_SQL = f"""
SELECT (epoch_ns(ts) // {HOUR_NS}) * 3600 AS window_start_epoch,
       event_type,
       COUNT(*) AS event_cnt,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
ORDER BY window_start_epoch, event_type
"""


# ------------------------------------------------------- sliding window
def events_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min.

    Each event belongs to exactly 2 windows → explode a literal
    2-element offset array (the standard shuffle-free expansion; the
    streaming engine does the same internally for window()).
    """
    ev = load_events(spark, sf_dir)
    half_bucket = F.expr(f"ts div {HALF_HOUR_NS}")
    expanded = ev.select(
        "event_type",
        "value",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("k"),
        half_bucket.alias("hb"),
    ).select(
        ((F.col("hb") - F.col("k")) * F.lit(1800)).alias("window_start_epoch"),
        "event_type",
        "value",
    ).filter(F.col("window_start_epoch") >= 0)
    return (
        expanded.groupBy("window_start_epoch", "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum(_dec(F.col("value"))).cast("double").alias("value_sum"),
        )
        .orderBy("window_start_epoch", "event_type")
    )


EVENTS_SLIDING_SQL = f"""
SELECT ((epoch_ns(ts) // {HALF_HOUR_NS}) - k) * 1800 AS window_start_epoch,
       event_type,
       COUNT(*) AS event_cnt,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
FROM events, unnest([0, 1]) AS t(k)
WHERE ((epoch_ns(ts) // {HALF_HOUR_NS}) - k) * 1800 >= 0
GROUP BY 1, 2
ORDER BY window_start_epoch, event_type
"""


# ------------------------------------------------------- sessionization
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-min inactivity gap.

    lag → gap flag → running sum = session index (the batch analog of
    ``session_window``; the streaming variant uses the native
    session_window operator). One shuffle on user_id.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        (F.col("ts") - F.lag("ts").over(w)) > SESSION_GAP_NS, 1
    ).otherwise(0)
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = ev.withColumn("new_sess", gap).withColumn(
        "session_idx", F.sum("new_sess").over(wsum)
    )
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.min(F.expr(f"ts div {NS_PER_SEC}"))).alias("session_start_epoch"),
            # integer div, not /: float division + cast truncates in
            # Spark but rounds in DuckDB's BIGINT cast
            F.expr(f"(max(ts) - min(ts)) div {NS_PER_SEC}").alias("duration_sec"),
        )
        .orderBy("user_id", "session_idx")
    )


EVENTS_SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > {SESSION_GAP_NS}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       MIN(epoch_ns(ts) // {NS_PER_SEC}) AS session_start_epoch,
       (MAX(epoch_ns(ts)) - MIN(epoch_ns(ts))) // {NS_PER_SEC} AS duration_sec
FROM numbered
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


# ------------------------------------------------------ JSON extraction
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the props JSON column, grouped stats."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ----------------------------------------------------------- as-of join
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event ↔ the user's latest order on or before
    the event day (Spark has no native as-of join — SURVEY.md §2.2).

    Scalable union trick: tag order-rows and event-rows, sort within
    each key partition by (day, tag), and carry the last seen order
    forward with last_value(ignoreNulls). One shuffle on the key —
    same cost as a regular sort-merge join, no per-group pandas.
    Day-granularity keys are exact integers in both engines.
    """
    ev = load_events(spark, sf_dir).select(
        F.col("user_id").alias("key"),
        F.expr(f"ts div {DAY_NS}").alias("day"),
        F.col("event_id"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast("long").alias("o_orderkey_in"),
    )
    # one representative order per (custkey, day): max orderkey
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("key"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("day"),
            "o_orderkey",
        )
        .groupBy("key", "day")
        .agg(F.max("o_orderkey").alias("o_orderkey_in"))
        .select(
            "key",
            "day",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(0).alias("is_event"),
            "o_orderkey_in",
        )
    )
    unioned = orders.unionByName(ev)
    w = (
        Window.partitionBy("key")
        .orderBy("day", "is_event", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(
            "matched_orderkey", F.last("o_orderkey_in", ignorenulls=True).over(w)
        )
        .filter(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.col("day").alias("event_day"),
            "matched_orderkey",
        )
        .orderBy("event_id")
    )


ASOF_JOIN_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_ns(ts) // {DAY_NS} AS event_day FROM events
), od AS (
  SELECT o_custkey AS key,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
         MAX(o_orderkey) AS o_orderkey_in
  FROM orders GROUP BY 1, 2
)
SELECT ev.event_id, ev.user_id, ev.event_day,
       (SELECT od.o_orderkey_in FROM od
        WHERE od.key = ev.user_id AND od.day <= ev.event_day
        ORDER BY od.day DESC LIMIT 1) AS matched_orderkey
FROM ev
ORDER BY event_id
"""


# ------------------------------------------------------ funnel analysis
FUNNEL_STAGES = ("view", "click", "purchase")


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user
    reaches stage k only via an event strictly AFTER their stage-k-1
    entry time. Per stage: users reached + conversion from the
    previous stage.

    Plan shape: one filtered min-aggregation per stage, each joined to
    the previous stage's entry times on the user key — k-1 equality
    joins on a monotonically SHRINKING key set (never a window over
    the full event log, never a sequential fold, no driver-side
    actions: the whole funnel is ONE lazy plan whose stage counts meet
    in a 1-row cross join). All shuffles are on user_id, so at 100 TB
    the stage frames co-partition and AQE broadcasts the later (small)
    stages.
    """
    ev = load_events(spark, sf_dir)
    stage_times = []  # DataFrame(user_id, t_k) per stage
    prev = None
    for k, stage in enumerate(FUNNEL_STAGES):
        cur = ev.filter(F.col("event_type") == stage)
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(F.col("ts") > F.col("t_prev"))
        entered = cur.groupBy("user_id").agg(F.min("ts").alias(f"t{k}"))
        stage_times.append(entered)
        prev = entered.select("user_id", F.col(f"t{k}").alias("t_prev"))
    counts = stage_times[0].agg(F.count(F.lit(1)).alias("c0"))
    for k, df in enumerate(stage_times[1:], start=1):
        counts = counts.crossJoin(
            F.broadcast(df.agg(F.count(F.lit(1)).alias(f"c{k}")))
        )
    # CACHED (r12 union audit): one row, but every per-stage output
    # row below projects from it — uncached, the whole progressive
    # funnel-join chain re-executed once per stage
    counts = counts.cache()
    stages = []
    for k, stage in enumerate(FUNNEL_STAGES):
        conv = (
            F.lit(1.0)
            if k == 0
            else F.round(F.col(f"c{k}") / F.col(f"c{k - 1}"), 6)
        )
        stages.append(
            counts.select(
                F.lit(k + 1).alias("stage_num"),
                F.lit(stage).alias("stage"),
                F.col(f"c{k}").alias("users_reached"),
                conv.cast("double").alias("conversion"),
            )
        )
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out.orderBy("stage_num")


EVENTS_FUNNEL_SQL = f"""
WITH s0 AS (
  SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
), s1 AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN s0 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts > s0.t0
  GROUP BY e.user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts > s1.t1
  GROUP BY e.user_id
), c AS (
  SELECT (SELECT COUNT(*) FROM s0) AS c0,
         (SELECT COUNT(*) FROM s1) AS c1,
         (SELECT COUNT(*) FROM s2) AS c2
)
SELECT 1 AS stage_num, '{FUNNEL_STAGES[0]}' AS stage, c0 AS users_reached, 1.0::DOUBLE AS conversion FROM c
UNION ALL
SELECT 2, '{FUNNEL_STAGES[1]}', c1, ROUND(c1 / c0, 6) FROM c
UNION ALL
SELECT 3, '{FUNNEL_STAGES[2]}', c2, ROUND(c2 / c1, 6) FROM c
ORDER BY stage_num
"""


# ---------------------------------------------- resample + forward fill
def events_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: per-user daily value totals
    resampled onto a DENSE day spine (every day between the user's
    first and last event) with forward-fill across gap days.

    Spine generation is `sequence` + `explode` from each user's
    [min_day, max_day] — data-dependent width, no driver loop, no
    cross join with a global calendar (which would explode sparse
    users at 100 TB). The fill is `last(value, ignorenulls=True)`
    over an unbounded-preceding ROWS frame: one shuffle on user_id,
    shared by the spine aggregation and the fill window (the
    downstream exchange is reused).
    """
    ev = load_events(spark, sf_dir)
    day = F.expr(f"ts div {DAY_NS}").alias("day")
    daily = ev.groupBy("user_id", day).agg(
        F.sum(_dec(F.col("value"))).cast("double").alias("day_value")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id", F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    return (
        joined.select(
            "user_id",
            "day",
            F.round(F.col("day_value"), 6).alias("day_value"),
            F.round(F.last("day_value", ignorenulls=True).over(w), 6).alias(
                "filled_value"
            ),
            F.col("day_value").isNull().alias("is_gap"),
        )
        .orderBy("user_id", "day")
    )


EVENTS_RESAMPLE_SQL = f"""
WITH daily AS (
  SELECT user_id, epoch_ns(ts) // {DAY_NS} AS day,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS day_value
  FROM events
  GROUP BY user_id, epoch_ns(ts) // {DAY_NS}
), spine AS (
  SELECT user_id, unnest(range(MIN(day), MAX(day) + 1)) AS day
  FROM daily
  GROUP BY user_id
)
SELECT s.user_id, s.day,
       ROUND(d.day_value, 6) AS day_value,
       ROUND(last_value(d.day_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled_value,
       d.day_value IS NULL AS is_gap
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
ORDER BY s.user_id, s.day
"""


# ------------------------------------------------------ cohort retention
RETENTION_MAX_OFFSET = 7  # day-0 .. day-7 retention triangle


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users are cohorted by their first
    active day; for each cohort x day-offset (0..7), the count of
    cohort users active that day and the retention rate.

    Plan shape: one distinct over (user, day) — the only pass over the
    raw events — then everything downstream operates on user-day rows
    (bounded by users x days, orders of magnitude smaller than events
    at 100 TB). The cohort join is an equality join on user_id; the
    cohort-size table is day-cardinality-bounded (one row per calendar
    day), so it broadcasts regardless of corpus size.
    """
    ev = load_events(spark, sf_dir)
    day = F.expr(f"ts div {DAY_NS}").alias("day")
    activity = ev.select("user_id", day).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    offset = (F.col("day") - F.col("cohort_day")).alias("day_offset")
    ret = (
        activity.join(cohorts, "user_id")
        .select("cohort_day", offset)
        .filter(F.col("day_offset").between(0, RETENTION_MAX_OFFSET))
        # activity rows are distinct per (user, day), so count(*) IS
        # the distinct-user count — no countDistinct shuffle needed
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "active_users",
            "cohort_size",
            F.round(F.col("active_users") / F.col("cohort_size"), 6).alias(
                "retention_rate"
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )


EVENTS_RETENTION_SQL = f"""
WITH activity AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // {DAY_NS} AS day FROM events
), cohorts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
), sizes AS (
  SELECT cohort_day, COUNT(*) AS cohort_size FROM cohorts GROUP BY cohort_day
), ret AS (
  SELECT c.cohort_day, a.day - c.cohort_day AS day_offset, COUNT(*) AS active_users
  FROM activity a JOIN cohorts c USING (user_id)
  WHERE a.day - c.cohort_day BETWEEN 0 AND {RETENTION_MAX_OFFSET}
  GROUP BY 1, 2
)
SELECT r.cohort_day, r.day_offset, r.active_users, s.cohort_size,
       ROUND(r.active_users / s.cohort_size, 6) AS retention_rate
FROM ret r JOIN sizes s USING (cohort_day)
ORDER BY r.cohort_day, r.day_offset
"""


# ------------------------------------------- Markov transition matrix
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (event_type -> next_event_type) pair, the
    transition count and its conditional probability P(next | from).

    The behavioral-model counterpart of ``events_funnel`` (which pins
    one fixed path): sequences are ordered per user by (ts, event_id)
    with a single ``lead`` window — ONE shuffle on user_id — then the
    pair counts and the per-from-state totals are two aggregations
    over the same tiny |types|^2-bounded frame. The per-from total
    comes from a window over the aggregated pairs (|types|^2 rows, so
    the window exchange is negligible), not a second scan of events.
    Probabilities are double divisions of exact bigint counts —
    engine-portable bit-for-bit.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("transitions"))
    )
    w_from = Window.partitionBy("from_type")
    return (
        pairs.withColumn("from_total", F.sum("transitions").over(w_from))
        .select(
            "from_type",
            "to_type",
            "transitions",
            "from_total",
            F.round(F.col("transitions") / F.col("from_total"), 6).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


EVENTS_TRANSITION_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), pairs AS (
  SELECT from_type, to_type, COUNT(*) AS transitions
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, transitions,
       CAST(SUM(transitions) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
       ROUND(transitions / SUM(transitions) OVER (PARTITION BY from_type), 6) AS prob
FROM pairs
ORDER BY from_type, to_type
"""


# -------------------------------------------- binned interval join
def interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each purchase event to the browsing session containing
    it: sessions are intervals derived from the NON-purchase events
    (30-min gap rule), purchases are points.

    This is the interval join rewritten as an EQUALITY join — the
    100 TB formulation. A containment predicate alone
    (start <= t <= end) gives Spark no equi-key, so the join falls
    back to BNLJ against the whole interval set. Instead both sides
    are binned onto a fixed HOUR_NS grid: an interval explodes to its
    covered buckets via ``sequence`` (bounded — a session's length is
    gap-bounded, so ≤ duration/W + 1 rows), a point maps to exactly
    ONE bucket, and the join key is (user_id, bucket) with the exact
    containment predicate as a residual filter. Each qualifying pair
    meets in exactly one bucket (the point's), so no post-join dedup
    is needed. One shuffle each side, partitioned by a composite key
    that spreads hot users across their time range.

    The DuckDB oracle runs the UNBINNED containment join — proving
    the rewrite changes the plan, not the semantics.

    Minimum fixture scale: sf0.01. At sf0.001 no purchase falls
    inside a multi-event session, so both sides return 0 rows and the
    oracle gate is vacuous (verified non-vacuous at sf0.01, the
    driver's scale).
    """
    ev = load_events(spark, sf_dir)
    browse = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.when(
        (F.col("ts") - F.lag("ts").over(w)) > SESSION_GAP_NS, 1
    ).otherwise(0)
    sessions = (
        browse.withColumn("new_sess", gap)
        .withColumn("session_idx", F.sum("new_sess").over(wsum))
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    binned_sessions = sessions.select(
        "user_id",
        "session_idx",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.expr(f"s_start div {HOUR_NS}"), F.expr(f"s_end div {HOUR_NS}")
            )
        ).alias("bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.expr(f"ts div {HOUR_NS}").alias("bucket"),
    )
    return (
        purchases.join(binned_sessions, ["user_id", "bucket"])
        .filter((F.col("p_ts") >= F.col("s_start")) & (F.col("p_ts") <= F.col("s_end")))
        .select(
            "user_id",
            "purchase_id",
            "session_idx",
            F.expr(f"p_ts div {NS_PER_SEC}").alias("purchase_epoch"),
            F.expr(f"s_start div {NS_PER_SEC}").alias("session_start_epoch"),
        )
        .orderBy("user_id", "purchase_id")
    )


INTERVAL_JOIN_SQL = f"""
WITH browse AS (
  SELECT user_id, event_id, epoch_ns(ts) AS ts
  FROM events WHERE event_type <> 'purchase'
), flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_NS} THEN 1 ELSE 0 END AS new_sess
  FROM browse
), numbered AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged
), sessions AS (
  SELECT user_id, session_idx, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM numbered GROUP BY user_id, session_idx
)
SELECT p.user_id, p.event_id AS purchase_id, s.session_idx,
       epoch_ns(p.ts) // {NS_PER_SEC} AS purchase_epoch,
       s.s_start // {NS_PER_SEC} AS session_start_epoch
FROM events p
JOIN sessions s
  ON p.user_id = s.user_id
 AND epoch_ns(p.ts) >= s.s_start AND epoch_ns(p.ts) <= s.s_end
WHERE p.event_type = 'purchase'
ORDER BY p.user_id, purchase_id
"""


# ------------------------------------------- clickstream path mining
PATHS_TOP_K = 20


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common within-session event-type paths ('view>click>
    purchase'): sessionize (30-min gap), serialize each session's
    chronological event types, count path shapes, top PATHS_TOP_K.

    Scale shape: the session build is the one user_id window shuffle
    shared with events_sessionize; the path string comes from
    ``array_sort(collect_list(struct(ts, event_id, type)))`` inside
    the per-session aggregation — the sort is session-local (bounded
    by the gap rule), never a global order. The path-shape count is a
    second small aggregation on a key whose cardinality is bounded by
    distinct paths, with the usual top-k orderBy+limit.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.when(
        (F.col("ts") - F.lag("ts").over(w)) > SESSION_GAP_NS, 1
    ).otherwise(0)
    paths = (
        ev.withColumn("new_sess", gap)
        .withColumn("session_idx", F.sum("new_sess").over(wsum))
        .groupBy("user_id", "session_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATHS_TOP_K)
    )


EVENTS_TOP_PATHS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts,
         CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_NS} THEN 1 ELSE 0 END AS new_sess
  FROM events
), numbered AS (
  SELECT user_id, event_id, event_type, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged
), paths AS (
  SELECT user_id, session_idx,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM numbered GROUP BY user_id, session_idx
)
SELECT path, COUNT(*) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {PATHS_TOP_K}
"""


# ---------------------------------------------- rate anomaly detection
ANOMALY_TRAIL = 24   # trailing hours in the baseline window
ANOMALY_Z = 3.0      # flag threshold


def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-rate spike detection per event type: each hour's
    count scored against the trailing ANOMALY_TRAIL hours' mean/std
    (excluding itself), flagged when |z| > ANOMALY_Z.

    Scale shape: the raw stream collapses to an (event_type, hour)
    count frame FIRST (one map-side-combinable aggregation — the only
    pass over the events), and the trailing window runs over that
    tiny frame partitioned by type. Moments come from integer
    sum/sum-of-squares window aggregates, so mean/variance are exact
    integer ratios evaluated identically in both engines — no
    float-accumulation-order nondeterminism; only rows with a full
    baseline window are scored.
    """
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.col("event_type"), F.expr(f"ts div {HOUR_NS}").alias("hour_bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rowsBetween(-ANOMALY_TRAIL, -1)
    )
    scored = hourly.select(
        "event_type",
        (F.col("hour_bucket") * 3600).alias("hour_epoch"),
        "n",
        F.count("n").over(w).alias("w_cnt"),
        F.sum("n").over(w).alias("w_sum"),
        F.sum(F.col("n").cast("decimal(19,0)") * F.col("n").cast("decimal(19,0)")).over(w).alias("w_sum2"),
    ).filter(F.col("w_cnt") == ANOMALY_TRAIL)
    mean = F.col("w_sum").cast("double") / F.col("w_cnt").cast("double")
    var = (
        F.col("w_sum2").cast("double") / F.col("w_cnt").cast("double")
        - mean * mean
    )
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    # constant-baseline guard: var == 0 makes z a division by zero,
    # where Spark (NULL) and DuckDB (inf) disagree — exclude explicitly
    return (
        scored.filter(var > 0).select(
            "event_type",
            "hour_epoch",
            "n",
            F.round(mean, 6).alias("baseline_mean"),
            F.round(z, 6).alias("zscore"),
            (F.abs(z) > ANOMALY_Z).alias("is_anomaly"),
        )
        .orderBy("event_type", "hour_epoch")
    )


EVENTS_ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_ns(ts) // {HOUR_NS} AS hour_bucket, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), windowed AS (
  SELECT event_type, hour_bucket * 3600 AS hour_epoch, n,
         COUNT(n) OVER w AS w_cnt,
         CAST(SUM(n) OVER w AS BIGINT) AS w_sum,
         CAST(SUM(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))) OVER w AS DECIMAL(38,0)) AS w_sum2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_bucket
               ROWS BETWEEN {ANOMALY_TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_epoch, n,
       ROUND(CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE), 6) AS baseline_mean,
       ROUND((CAST(n AS DOUBLE) - CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))
             / sqrt(CAST(w_sum2 AS DOUBLE) / CAST(w_cnt AS DOUBLE)
                    - (CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))
                      * (CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))), 6) AS zscore,
       ABS((CAST(n AS DOUBLE) - CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))
           / sqrt(CAST(w_sum2 AS DOUBLE) / CAST(w_cnt AS DOUBLE)
                  - (CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))
                    * (CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))))
         > {ANOMALY_Z} AS is_anomaly
FROM windowed
WHERE w_cnt = {ANOMALY_TRAIL}
  AND CAST(w_sum2 AS DOUBLE) / CAST(w_cnt AS DOUBLE)
      - (CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))
        * (CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE)) > 0
ORDER BY event_type, hour_epoch
"""


# ------------------------------------------------------ variant (semi-structured)
def events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through the VARIANT datapath: parse_json →
    binary-encoded variant → typed variant_get extraction, aggregated.

    VARIANT (Spark 4) is the scale path for open-schema JSON: parse
    once into a binary encoding, extract fields without per-access
    string re-parsing, and let shredding push column reads down. The
    oracle replays the same extraction with DuckDB's JSON functions on
    the raw strings — equality proves the encode/decode preserves
    values and NULL semantics (``try_variant_get`` on a missing path →
    NULL, counted explicitly).
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    missing = F.try_variant_get(v, "$.absent", "int")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("missing"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.sum((F.col("k") % 2 == 0).cast("long")).alias("k_even"),
            F.sum(F.col("missing").isNull().cast("long")).alias("n_missing"),
        )
        .orderBy("event_type")
    )


EVENTS_VARIANT_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
       CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS k_even,
       COUNT(*) AS n_missing
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ------------------------------------------ robust (median/MAD) anomaly
ROBUST_Z = 3.5  # Iglewicz–Hoaglin modified-z cutoff


def events_rate_anomaly_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rate anomalies via median/MAD instead of mean/σ — the
    robust twin of ``events_rate_anomaly``. A real burst contaminates
    the trailing mean AND inflates σ, so z-scoring can mask a second
    spike (masking effect); the median and the median absolute
    deviation have a 50% breakdown point and don't move.

    Engine-exactness: hourly counts are integers, so each per-type
    median is k or k+0.5 exactly, |n − med| is exact in double, the
    MAD is again a median of exact values, and the modified z
    (0.6745·dev/MAD) is one IEEE multiply+divide — bit-identical in
    DuckDB. Plan: the same single collapse of the stream to
    (type, hour) counts, then two tiny per-type aggregates (median,
    then MAD over the deviations) broadcast back — the raw events are
    scanned once.

    Minimum fixture scale: sf0.01. At sf0.001 no hour clears the
    modified-z threshold, so the query returns 0 rows and the oracle
    gate is vacuous (verified non-vacuous at sf0.01, the driver's
    scale).
    """
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.col("event_type"), F.expr(f"ts div {HOUR_NS}").alias("hour_bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = hourly.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med_n")
    )
    devs = hourly.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("n").cast("double") - F.col("med_n"))
    )
    mad = devs.groupBy("event_type").agg(
        F.expr("percentile(dev, 0.5)").alias("mad_n")
    )
    z = F.lit(0.6745) * F.col("dev") / F.col("mad_n")
    return (
        devs.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad_n") > 0)  # constant-baseline guard, as in the z twin
        .filter(z > ROBUST_Z)
        .select(
            "event_type",
            (F.col("hour_bucket") * 3600).alias("hour_epoch"),
            "n",
            F.col("med_n").alias("median_n"),
            F.col("mad_n").alias("mad_n"),
            F.round(z, 6).alias("robust_z"),
        )
        .orderBy("event_type", "hour_epoch")
    )


EVENTS_ANOMALY_ROBUST_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_ns(ts) // {HOUR_NS} AS hour_bucket, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, quantile_cont(n, 0.5) AS med_n FROM hourly GROUP BY 1
),
devs AS (
  SELECT h.event_type, h.hour_bucket, h.n, m.med_n,
         ABS(CAST(h.n AS DOUBLE) - m.med_n) AS dev
  FROM hourly h JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad_n FROM devs GROUP BY 1
)
SELECT d.event_type,
       d.hour_bucket * 3600 AS hour_epoch,
       d.n, d.med_n AS median_n, a.mad_n,
       ROUND(0.6745 * d.dev / a.mad_n, 6) AS robust_z
FROM devs d JOIN mad a USING (event_type)
WHERE a.mad_n > 0 AND 0.6745 * d.dev / a.mad_n > {ROBUST_Z}
ORDER BY d.event_type, hour_epoch
"""


# ---------------------------------------------- time-decayed trending
DECAY_MAX_AGE_DAYS = 30  # older events contribute 0 (2^-31 < any rank gap)


def events_trending_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed activity score per event type: an event aged
    d days (vs the corpus max day) weighs 2^-d — the trending-items
    primitive where yesterday counts half of today.

    Engine-exactness trick: exp()/pow() are NOT correctly-rounded and
    differ across libms, so the decay is computed entirely in INTEGER
    arithmetic — each event contributes 2^(MAX_AGE − d) to a BIGINT
    sum (map-side combinable; no overflow: count·2^30 ≪ 2^63), and
    one final division by 2^MAX_AGE yields the score as an exact
    dyadic rational, bit-identical in any IEEE engine. Same
    one-collapse plan as the anomaly ops: day counts first, then the
    weighted rollup; the max-day scalar broadcasts.
    """
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        F.col("event_type"), F.expr(f"ts div {DAY_NS}").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    max_day = daily.groupBy().agg(F.max("day").alias("max_day"))
    aged = daily.crossJoin(F.broadcast(max_day)).withColumn(
        "age", F.col("max_day") - F.col("day")
    )
    # shiftleft() only takes a literal bit count; the SQL form takes a column
    scaled = F.expr(f"shiftleft(1L, cast({DECAY_MAX_AGE_DAYS} - age as int))")
    return (
        aged.filter(F.col("age") <= DECAY_MAX_AGE_DAYS)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum(F.col("n") * scaled).alias("score_scaled"),
        )
        .withColumn(
            "decay_score",
            F.col("score_scaled").cast("double") / F.lit(float(2**DECAY_MAX_AGE_DAYS)),
        )
        .orderBy(F.desc("decay_score"), "event_type")
    )


EVENTS_TRENDING_SQL = f"""
WITH daily AS (
  SELECT event_type, epoch_ns(ts) // {DAY_NS} AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
m AS (SELECT MAX(day) AS max_day FROM daily),
aged AS (
  SELECT d.event_type, d.n, m.max_day - d.day AS age FROM daily d, m
)
SELECT event_type,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(n * (CAST(1 AS BIGINT) << CAST({DECAY_MAX_AGE_DAYS} - age AS INT))) AS BIGINT) AS score_scaled,
       CAST(SUM(n * (CAST(1 AS BIGINT) << CAST({DECAY_MAX_AGE_DAYS} - age AS INT))) AS DOUBLE) / {float(2**DECAY_MAX_AGE_DAYS)} AS decay_score
FROM aged
WHERE age <= {DECAY_MAX_AGE_DAYS}
GROUP BY event_type
ORDER BY decay_score DESC, event_type
"""


# ---------------------------------------------------- RFM segmentation
RFM_R_DAYS = (0, 1)   # recency: active today → 3, yesterday → 2, else 1
RFM_HI = 1.15         # frequency/monetary: ≥ 1.15×corpus mean → 3, ≥ mean → 2


def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) user segmentation — the
    classic lifecycle-marketing rollup: score each user 1-3 per axis,
    report segment sizes and value.

    Cut-points are corpus-MEAN-relative (mean and 1.15×mean), not
    quantiles: a mean is one exact integer/decimal ratio — engine-
    deterministic — where a quantile cut over doubles is
    interpolation-order bait for cross-engine drift. Monetary sums in
    decimal so every comparison is exact. One scan → per-user
    aggregate → broadcast 1-row corpus stats → segment projection →
    tiny rollup.
    """
    ev = load_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max(F.expr(f"ts div {DAY_NS}")).alias("last_day"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec(F.col("value"))).cast("double").alias("value_sum"),
    )
    stats = per_user.groupBy().agg(
        F.max("last_day").alias("ref_day"),
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias("mean_n"),
        (
            F.sum(_dec(F.col("value_sum"))).cast("double") / F.count(F.lit(1))
        ).alias("mean_v"),
    )
    scored = per_user.crossJoin(F.broadcast(stats)).select(
        F.when(F.col("ref_day") - F.col("last_day") <= RFM_R_DAYS[0], F.lit(3))
        .when(F.col("ref_day") - F.col("last_day") <= RFM_R_DAYS[1], F.lit(2))
        .otherwise(F.lit(1))
        .alias("r_score"),
        F.when(F.col("n_events") >= F.col("mean_n") * RFM_HI, F.lit(3))
        .when(F.col("n_events") >= F.col("mean_n"), F.lit(2))
        .otherwise(F.lit(1))
        .alias("f_score"),
        F.when(F.col("value_sum") >= F.col("mean_v") * RFM_HI, F.lit(3))
        .when(F.col("value_sum") >= F.col("mean_v"), F.lit(2))
        .otherwise(F.lit(1))
        .alias("m_score"),
        "value_sum",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(_dec(F.col("value_sum"))).cast("double").alias("segment_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


EVENTS_RFM_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         MAX(epoch_ns(ts) // {DAY_NS}) AS last_day,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
  FROM events GROUP BY user_id
),
stats AS (
  SELECT MAX(last_day) AS ref_day,
         CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_n,
         CAST(SUM(CAST(value_sum AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mean_v
  FROM per_user
),
scored AS (
  SELECT CASE WHEN ref_day - last_day <= {RFM_R_DAYS[0]} THEN 3
              WHEN ref_day - last_day <= {RFM_R_DAYS[1]} THEN 2 ELSE 1 END AS r_score,
         CASE WHEN n_events >= mean_n * {RFM_HI} THEN 3
              WHEN n_events >= mean_n THEN 2 ELSE 1 END AS f_score,
         CASE WHEN value_sum >= mean_v * {RFM_HI} THEN 3
              WHEN value_sum >= mean_v THEN 2 ELSE 1 END AS m_score,
         value_sum
  FROM per_user, stats
)
SELECT r_score, f_score, m_score,
       COUNT(*) AS n_users,
       CAST(SUM(CAST(value_sum AS DECIMAL(28,6))) AS DOUBLE) AS segment_value
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ------------------------------------------ multi-touch attribution
MULTITOUCH_WINDOW_NS = 3_600_000_000_000  # 1 h lookback, matches streaming join


def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every click
    of the same user within the hour before a purchase shares that
    purchase's credit — 40% to the first touch, 40% to the last, the
    middle touches split the remaining 20% evenly (single touch takes
    100%, two touches 50/50).

    The single-touch twin is ``streaming/joins.py`` attribution (last
    click wins); this is the batch marketing-science generalization.

    Engine-exactness: timestamps compared in raw int64 nanos; credits
    are 0.4 / 0.5 / 1.0 literals or ``0.2 / (n-2)`` — one correctly
    rounded IEEE division of a literal by an exact integer, identical
    in DuckDB, so no rounding step is needed anywhere.

    Plan (100 TB): the click×purchase pairing is the same user-keyed
    EQUALITY join as the streaming interval join (time bound as a
    residual predicate, never a theta join), then two windows
    partitioned by purchase_id — no global window, no second shuffle
    (rank and count share the purchase_id partitioning).
    """
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ns"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ns"),
    )
    pairs = clicks.join(purchases, "user_id").filter(
        (F.col("purchase_ns") >= F.col("click_ns"))
        & (F.col("purchase_ns") <= F.col("click_ns") + MULTITOUCH_WINDOW_NS)
    )
    by_purchase = Window.partitionBy("purchase_id")
    ordered = by_purchase.orderBy("click_ns", "click_id")
    n = F.col("n_touches")
    r = F.col("touch_rank")
    credit = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when((r == 1) | (r == n), F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2))
    )
    return (
        pairs.withColumn("n_touches", F.count(F.lit(1)).over(by_purchase))
        .withColumn("touch_rank", F.row_number().over(ordered))
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            "touch_rank",
            "n_touches",
            credit.alias("credit"),
        )
        .orderBy("purchase_id", "touch_rank")
    )


MULTITOUCH_SQL = f"""
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_ns(ts) AS click_ns
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id, epoch_ns(ts) AS purchase_ns
  FROM events WHERE event_type = 'purchase'
), pairs AS (
  SELECT purchase_id, click_id, c.user_id AS user_id, click_ns
  FROM c JOIN p ON c.user_id = p.user_id
   AND purchase_ns >= click_ns
   AND purchase_ns <= click_ns + {MULTITOUCH_WINDOW_NS}
), ranked AS (
  SELECT purchase_id, click_id, user_id,
         ROW_NUMBER() OVER (PARTITION BY purchase_id ORDER BY click_ns, click_id) AS touch_rank,
         CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches
  FROM pairs
)
SELECT purchase_id, click_id, user_id, touch_rank, n_touches,
       CASE WHEN n_touches = 1 THEN 1.0::DOUBLE
            WHEN n_touches = 2 THEN 0.5::DOUBLE
            WHEN touch_rank = 1 OR touch_rank = n_touches THEN 0.4::DOUBLE
            ELSE 0.2::DOUBLE / (n_touches - 2)
       END AS credit
FROM ranked
ORDER BY purchase_id, touch_rank
"""


# ---------------------------------------------- session entry/exit stats
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entry-type session quality profile: for sessions grouped by
    their ENTRY event type — sessions, bounce count/rate (single-event
    sessions), exits back to the same type, and mean duration — the
    landing-page analytics primitive (bounce rate, dwell time) on top
    of the same 30-min-gap sessionization as ``events_sessionize``.

    Entry/exit are ``min(struct(ts, event_id, event_type))`` /
    ``max(...)`` — one aggregation, no second window pass; DuckDB
    mirrors with ordered-aggregate FIRST/LAST. All emitted numbers are
    exact integers or correctly-rounded int/int divisions (ROUND x,6),
    so the hash is engine-stable.

    Plan: one user-keyed window shuffle (session index), one
    session-level aggregation, one entry-type aggregation — cardinality
    collapses monotonically; nothing driver-side.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        (F.col("ts") - F.lag("ts").over(w)) > SESSION_GAP_NS, 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("new_sess", gap)
        .withColumn("session_idx", F.sum("new_sess").over(wsum))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.struct("ts", "event_id", "event_type"))["event_type"].alias(
                "entry_type"
            ),
            F.max(F.struct("ts", "event_id", "event_type"))["event_type"].alias(
                "exit_type"
            ),
            F.expr(f"(max(ts) - min(ts)) div {NS_PER_SEC}").alias("duration_sec"),
        )
    )
    return (
        sess.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounces"),
            F.sum((F.col("entry_type") == F.col("exit_type")).cast("long")).alias(
                "n_same_exit"
            ),
            F.sum("duration_sec").alias("total_duration_sec"),
        )
        .select(
            "entry_type",
            "n_sessions",
            "n_bounces",
            F.round(F.col("n_bounces") / F.col("n_sessions"), 6).alias(
                "bounce_rate"
            ),
            "n_same_exit",
            F.round(
                F.col("total_duration_sec") / F.col("n_sessions"), 6
            ).alias("avg_duration_sec"),
        )
        .orderBy("entry_type")
    )


EVENTS_SESSION_STATS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > {SESSION_GAP_NS}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx
  FROM flagged
), sess AS (
  SELECT user_id, session_idx,
         COUNT(*) AS n_events,
         FIRST(event_type ORDER BY ts, event_id) AS entry_type,
         LAST(event_type ORDER BY ts, event_id) AS exit_type,
         (MAX(epoch_ns(ts)) - MIN(epoch_ns(ts))) // {NS_PER_SEC} AS duration_sec
  FROM numbered
  GROUP BY user_id, session_idx
)
SELECT entry_type,
       COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) / COUNT(*), 6)
         AS bounce_rate,
       CAST(SUM(CASE WHEN entry_type = exit_type THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same_exit,
       ROUND(CAST(SUM(duration_sec) AS BIGINT) / COUNT(*), 6)
         AS avg_duration_sec
FROM sess
GROUP BY entry_type
ORDER BY entry_type
"""


# ------------------------------------------------ A/B two-proportion z
AB_Z_SCALE = 10**6
AB_Z_CRIT_INT = 1959964  # floor(1.959964e6): two-sided alpha=0.05


def ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a deterministic 50/50 user split —
    the experimentation readout every product-analytics stack ships:
    arm = md5(user_id) bucket, conversion = purchases make up > 20%
    of the user's events (every user in this corpus fires >= 1
    purchase, so bare did-purchase is vacuous; an above-baseline
    share has real variance at every scale and stays integer-exact),
    z = (p1-p2)/sqrt(p(1-p)(1/n1+1/n2)) with the
    pooled proportion. On a hash split of one population this is an
    A/A test: the audit asserts the pipeline does NOT flag
    significance (|z| <= 1.96) — the standard sanity gate run before
    trusting any real experiment readout.

    One per-user max() aggregation (map-side combinable), one 2-row
    arm rollup pivoted into a single row by conditional aggregation —
    no joins at all. Engine-exactness: all inputs are exact integers;
    /, sqrt, * are IEEE correctly-rounded, so the identical
    expression tree yields the identical double on both engines; the
    significance compare quantizes z to an integer first.
    """
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    events = load_events(spark, sf_dir)
    users = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("np"),
    ).select(
        "user_id", (F.col("np") * 5 > F.col("n_ev")).cast("long").alias("conv")
    )
    arms = users.select(
        F.pmod(hash_bucket(F.col("user_id")), F.lit(2)).alias("arm"), "conv"
    )
    flat = arms.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("c1"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n2"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("c2"),
    )
    p1 = F.col("c1") / F.col("n1")
    p2 = F.col("c2") / F.col("n2")
    pp = (F.col("c1") + F.col("c2")) / (F.col("n1") + F.col("n2"))
    se = F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    z_int = F.floor((p1 - p2) / se * F.lit(float(AB_Z_SCALE)) + F.lit(0.5)).cast(
        "long"
    )
    return flat.select(
        "n1",
        "c1",
        "n2",
        "c2",
        F.round(p1, 6).alias("rate1"),
        F.round(p2, 6).alias("rate2"),
        (z_int / F.lit(float(AB_Z_SCALE))).alias("z"),
        (F.abs(z_int) > F.lit(AB_Z_CRIT_INT)).alias("significant"),
    )


AB_TEST_SQL = f"""
WITH users AS (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5
                   > COUNT(*) THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
), arms AS (
  SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 % 2 AS arm,
         conv
  FROM users
), flat AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c2
  FROM arms
)
SELECT n1, c1, n2, c2,
       ROUND(c1 / n1, 6) AS rate1,
       ROUND(c2 / n2, 6) AS rate2,
       CAST(floor((c1 / n1 - c2 / n2)
         / sqrt(((c1 + c2) / (n1 + n2)) * (1.0 - (c1 + c2) / (n1 + n2))
                * (1.0 / n1 + 1.0 / n2))
         * {AB_Z_SCALE} + 0.5) AS BIGINT) / {AB_Z_SCALE}.0 AS z,
       abs(CAST(floor((c1 / n1 - c2 / n2)
         / sqrt(((c1 + c2) / (n1 + n2)) * (1.0 - (c1 + c2) / (n1 + n2))
                * (1.0 / n1 + 1.0 / n2))
         * {AB_Z_SCALE} + 0.5) AS BIGINT)) > {AB_Z_CRIT_INT} AS significant
FROM flat
"""


# --------------------------------------------- day-of-week seasonality
def seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: event count,
    share of the type's volume, and the seasonal index (observed /
    expected-under-uniform, >1 = over-indexed day) — the calendar
    fingerprint an ops/analytics stack baselines before anomaly
    thresholds, since a Monday spike is only a spike relative to
    Mondays.

    dow comes from pure BIGINT nanos arithmetic ((epoch_days + 4) %
    7 — 1970-01-01 was a Thursday), never from engine-local timezone
    calendars, so the grouping key is engine-exact. One map-side-
    combinable count over (type, dow), a per-type total via a second
    bounded aggregation joined back (|types| rows, broadcast), and
    exact int/int divisions rounded for display.

    The expected-under-uniform denominator is the CONSTANT 7, not the
    count of weekdays the type was observed on — a type absent on
    some weekday previously got an inflated index relative to the
    stated uniform baseline (ADVICE r6), and both engines agreed, so
    only a definition-level fix closes it. n*7 stays exact in BIGINT
    and the single int/int division is correctly-rounded IEEE.
    """
    events = load_events(spark, sf_dir)
    dow = F.pmod(F.expr(f"ts div {DAY_NS}") + F.lit(4), F.lit(7))
    per = events.groupBy(
        "event_type", dow.alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = per.groupBy("event_type").agg(F.sum("n").alias("total"))
    return (
        per.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "dow",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(
                (F.col("n") * F.lit(7)).cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("seasonal_index"),
        )
        .orderBy("event_type", "dow")
    )


SEASONALITY_SQL = """
WITH per AS (
  SELECT event_type,
         (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
         COUNT(*) AS n
  FROM events
  GROUP BY 1, 2
), totals AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS total
  FROM per GROUP BY event_type
)
SELECT per.event_type, dow, n,
       ROUND(n / total, 6) AS share,
       ROUND(CAST(n * 7 AS DOUBLE) / CAST(total AS DOUBLE), 6)
         AS seasonal_index
FROM per JOIN totals ON per.event_type = totals.event_type
ORDER BY per.event_type, dow
"""


# ------------------------------------------- inter-arrival burstiness
def interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási burstiness coefficient B = (σ−μ)/(σ+μ) of
    within-user inter-arrival gaps, per event type — the canonical
    "is this traffic Poisson or bursty" fingerprint (B → −1 metronome,
    0 Poisson, → 1 bursty) that anomaly thresholds and capacity
    models are calibrated against.

    Gaps come from one lag window per (user, type) — a real
    partition key — in whole SECONDS (gap div 1e9): second-granular
    gaps keep Σgap² within int64 for any realistic horizon (ns-scale
    squares overflow at ~3 hours), and burstiness is a shape
    statistic, not a latency metric. μ and σ then derive from three
    exact integer sums (n, Σg, Σg²) so the final B is one identical
    IEEE expression per engine.
    """
    events = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        events.select(
            "event_type",
            (F.col("ts") - F.lag("ts").over(w)).alias("gap_ns"),
        )
        .filter(F.col("gap_ns").isNotNull())
        # integer `div`, NOT double /: a correctly-rounded double
        # quotient and BIGINT floor-div can disagree at boundaries,
        # and the DuckDB twin uses `//`
        .select("event_type", F.expr(f"gap_ns div {NS_PER_SEC}").alias("gap_s"))
    )
    stats = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_s").alias("sg"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("sgg"),
    )
    n = F.col("n_gaps").cast("double")
    mu = F.col("sg").cast("double") / n
    var = (n * F.col("sgg").cast("double") - F.col("sg").cast("double") * F.col("sg").cast("double")) / (n * n)
    sigma = F.sqrt(var)
    return stats.select(
        "event_type",
        "n_gaps",
        F.round(mu, 6).alias("mean_gap_s"),
        F.round(sigma, 6).alias("std_gap_s"),
        F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    ).orderBy("event_type")


BURSTINESS_SQL = """
WITH gaps AS (
  SELECT event_type,
         CAST((epoch_ns(ts) - LAG(epoch_ns(ts)) OVER
               (PARTITION BY user_id, event_type
                ORDER BY epoch_ns(ts), event_id)) // 1000000000 AS BIGINT) AS gap_s
  FROM events
), stats AS (
  SELECT event_type,
         COUNT(*) AS n_gaps,
         CAST(SUM(gap_s) AS BIGINT) AS sg,
         CAST(SUM(gap_s * gap_s) AS BIGINT) AS sgg
  FROM gaps WHERE gap_s IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n_gaps,
       ROUND(CAST(sg AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
       ROUND(sqrt((n_gaps * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                  / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE))), 6) AS std_gap_s,
       ROUND((sqrt((n_gaps * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                   / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
              - CAST(sg AS DOUBLE) / n_gaps)
             / (sqrt((n_gaps * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                     / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
                + CAST(sg AS DOUBLE) / n_gaps), 6) AS burstiness
FROM stats
ORDER BY event_type
"""


# --------------------------------------------- transition entropy rate
TRANS_ENT_S = 10**9


def transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-event entropy per current event type:
    H(next | cur) = −Σ_j p(j|cur)·ln p(j|cur) over the within-user
    first-order transition counts — the predictability summary of
    `events_transition_matrix` (H → 0: the journey is deterministic
    from this state; H → ln|types|: anything can happen). The
    per-state entropy is what session-prefetch and next-action
    models sanity-check before training.

    One lag window per user (real partition key), one (cur, next)
    count aggregation, one |types|²-row rollup. ln inputs are exact
    integer ratios; each −c·ln(c/tot) term is quantized to an
    integer BEFORE the per-state sum (the zipf/woe recipe), making
    the reported nats an exact 1e-9 rational.
    """
    events = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = trans.groupBy("cur").agg(F.sum("c").alias("tot"))
    term_i = F.floor(
        -F.col("c").cast("double")
        * F.log(F.col("c").cast("double") / F.col("tot").cast("double"))
        / F.col("tot").cast("double")
        * F.lit(float(TRANS_ENT_S))
        + F.lit(0.5)
    ).cast("long")
    return (
        trans.join(F.broadcast(tot), "cur")
        .select("cur", "tot", term_i.alias("t_i"))
        .groupBy("cur", "tot")
        .agg(F.sum("t_i").alias("h_i"))
        .select(
            "cur",
            F.col("tot").alias("n_transitions"),
            (F.col("h_i") / F.lit(float(TRANS_ENT_S))).alias("entropy_nats"),
        )
        .orderBy("cur")
    )


TRANSITION_ENTROPY_SQL = f"""
WITH seq AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id) AS nxt
  FROM events
), trans AS (
  SELECT cur, nxt, COUNT(*) AS c FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
), tot AS (
  SELECT cur, CAST(SUM(c) AS BIGINT) AS tot FROM trans GROUP BY cur
), terms AS (
  SELECT t.cur, tot,
         CAST(floor(-CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
                    / CAST(tot AS DOUBLE) * {TRANS_ENT_S} + 0.5) AS BIGINT) AS t_i
  FROM trans t JOIN tot ON t.cur = tot.cur
)
SELECT cur, tot AS n_transitions,
       CAST(SUM(t_i) AS BIGINT) / {TRANS_ENT_S}.0 AS entropy_nats
FROM terms
GROUP BY cur, tot
ORDER BY cur
"""


# ------------------------------------------------ CUSUM changepoint
CUSUM_K_NUM = 21    # reference drift: x - mu*(1 + 1/20)  ->  20nx - 21S
CUSUM_H_MULT = 100  # alarm when scaled CUSUM exceeds 5*mu  (=100*S units)


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM (1954) upper changepoint detector over the daily
    event-count series: S_t = max(0, S_{t-1} + (x_t − μ − k)) with
    slack k = μ/20 and alarm at 5μ — the sequential shift detector
    ops teams run on volume series where a level change, not a single
    spike, is the failure mode (`events_rate_anomaly` flags points;
    CUSUM accumulates small sustained drifts).

    The recurrence is NOT sequential here: S_t = cum_t − min_{j≤t}
    cum_j over the drift prefix sum, so it becomes two bounded
    theta-join prefix scans (b.day ≤ a.day) over the |days|-row
    daily table — the repo's value-domain prefix convention
    (drift_ks_binned), no unpartitioned window, no driver loop.

    Exactness: everything is scaled by 20n — e_i = 20n·x_i − 21S is
    an exact BIGINT, so cum, prefix-min, S_t and the 5μ alarm
    compare (S_t_scaled > 100S) are pure integer arithmetic; the
    reported cusum value is one final division, rounded.
    """
    events = load_events(spark, sf_dir)
    # CACHED (r14 plan audit): daily backs totals + the scaled frame,
    # and cum backs both sides of the prefix-min theta join —
    # uncached, the expansion scanned events 8x
    # (plans/r14/cusum_changepoint_before.txt). Both frames are
    # |days| rows (guide §2.4).
    daily = events.groupBy(F.expr(f"ts div {DAY_NS}").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    ).cache()
    totals = daily.agg(
        F.sum("x").alias("s_tot"), F.count(F.lit(1)).alias("n_days")
    )
    scaled = daily.crossJoin(F.broadcast(totals)).select(
        "day",
        "x",
        "s_tot",
        "n_days",
        (
            F.lit(20) * F.col("n_days") * F.col("x")
            - F.lit(CUSUM_K_NUM) * F.col("s_tot")
        ).alias("e"),
    )
    cum = (
        scaled.alias("a")
        .join(
            F.broadcast(scaled.alias("b")),
            F.col("b.day") <= F.col("a.day"),
        )
        .groupBy(
            F.col("a.day").alias("day"),
            F.col("a.x").alias("x"),
            F.col("a.s_tot").alias("s_tot"),
            F.col("a.n_days").alias("n_days"),
        )
        .agg(F.sum("b.e").alias("cum"))
        .cache()
    )
    smax = (
        cum.alias("a")
        .join(F.broadcast(cum.alias("b")), F.col("b.day") <= F.col("a.day"))
        .groupBy(
            F.col("a.day").alias("day"),
            F.col("a.x").alias("x"),
            F.col("a.s_tot").alias("s_tot"),
            F.col("a.n_days").alias("n_days"),
            F.col("a.cum").alias("cum"),
        )
        .agg(F.min("b.cum").alias("prefix_min"))
    )
    # the empty prefix (cum_0 = 0) participates in the min — without
    # it S_1 would always read 0 and the recurrence identity breaks
    s_scaled = F.greatest(
        F.lit(0), F.col("cum") - F.least(F.lit(0), F.col("prefix_min"))
    )
    return smax.select(
        "day",
        "x",
        F.round(
            s_scaled / (F.lit(20.0) * F.col("n_days").cast("double")), 6
        ).alias("cusum"),
        (s_scaled > F.lit(CUSUM_H_MULT) * F.col("s_tot")).alias("alarm"),
    ).orderBy("day")


CUSUM_SQL = f"""
WITH daily AS (
  SELECT epoch_ns(ts) // {DAY_NS} AS day, COUNT(*) AS x
  FROM events GROUP BY 1
), totals AS (
  SELECT CAST(SUM(x) AS BIGINT) AS s_tot, COUNT(*) AS n_days FROM daily
), scaled AS (
  SELECT day, x, s_tot, n_days,
         CAST(20 * n_days * x - {CUSUM_K_NUM} * s_tot AS BIGINT) AS e
  FROM daily, totals
), cum AS (
  SELECT a.day, a.x, a.s_tot, a.n_days, CAST(SUM(b.e) AS BIGINT) AS cum
  FROM scaled a JOIN scaled b ON b.day <= a.day
  GROUP BY a.day, a.x, a.s_tot, a.n_days
), smax AS (
  SELECT a.day, a.x, a.s_tot, a.n_days, a.cum,
         CAST(MIN(b.cum) AS BIGINT) AS prefix_min
  FROM cum a JOIN cum b ON b.day <= a.day
  GROUP BY a.day, a.x, a.s_tot, a.n_days, a.cum
)
SELECT day, x,
       ROUND(GREATEST(0, cum - LEAST(0, prefix_min)) / (20.0 * n_days), 6) AS cusum,
       GREATEST(0, cum - LEAST(0, prefix_min)) > {CUSUM_H_MULT} * s_tot AS alarm
FROM smax
ORDER BY day
"""


# -------------------------------------------- retention decay curve fit
RET_FIT_S1 = 10**6
RET_FIT_S2 = 10**12


def retention_curve_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-decay fit of the pooled retention curve:
    r(d) ≈ a·e^(−λ·d) over day offsets 1..RETENTION_MAX_OFFSET,
    fitted as a quantized OLS of ln r(d) on d — the one-number
    summary (λ, half-life) growth teams track instead of eyeballing
    the whole `events_retention` triangle. Only COMPLETE cohorts
    (first day early enough to observe every offset) enter the pool,
    so the triangle's truncated tail cannot bias the curve.

    Pooled r(d) values are exact int/int ratios over a bounded
    |offsets|-row table; each ln term is quantized
    floor(x·S + 0.5)::long before the 7-point regression moments
    (the zipf recipe), so λ, half-life and R² are identical IEEE
    expressions on both engines.
    """
    ev = load_events(spark, sf_dir)
    day = F.expr(f"ts div {DAY_NS}").alias("day")
    activity = ev.select("user_id", day).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    max_day = activity.agg(F.max("day").alias("max_day"))
    complete = (
        cohorts.crossJoin(F.broadcast(max_day))
        .filter(
            F.col("cohort_day")
            <= F.col("max_day") - F.lit(RETENTION_MAX_OFFSET)
        )
        .select("user_id", "cohort_day")
    )
    base = complete.agg(F.count(F.lit(1)).alias("n_users"))
    ret = (
        activity.join(complete, "user_id")
        .select((F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .filter(F.col("day_offset").between(1, RETENTION_MAX_OFFSET))
        .groupBy("day_offset")
        .agg(F.count(F.lit(1)).alias("active"))
    )
    pts = ret.crossJoin(F.broadcast(base))
    x = F.col("day_offset").cast("double")
    y = F.log(F.col("active").cast("double") / F.col("n_users").cast("double"))

    def _q(expr, scale):
        return F.floor(expr * F.lit(float(scale)) + F.lit(0.5)).cast("long")

    stats = pts.groupBy("n_users").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(_q(x, RET_FIT_S1)).alias("sx"),
        F.sum(_q(y, RET_FIT_S1)).alias("sy"),
        F.sum(_q(x * y, RET_FIT_S2)).alias("sxy"),
        F.sum(_q(x * x, RET_FIT_S2)).alias("sxx"),
        F.sum(_q(y * y, RET_FIT_S2)).alias("syy"),
    )
    k = F.col("k").cast("double")
    sx = F.col("sx") / F.lit(float(RET_FIT_S1))
    sy = F.col("sy") / F.lit(float(RET_FIT_S1))
    sxy = F.col("sxy") / F.lit(float(RET_FIT_S2))
    sxx = F.col("sxx") / F.lit(float(RET_FIT_S2))
    syy = F.col("syy") / F.lit(float(RET_FIT_S2))
    num = k * sxy - sx * sy
    denx = k * sxx - sx * sx
    deny = k * syy - sy * sy
    lam = -(num / denx)
    return stats.select(
        F.col("n_users"),
        F.col("k").alias("n_points"),
        F.round(lam, 6).alias("decay_lambda"),
        F.round(F.lit(float(__import__("math").log(2))) / lam, 6).alias(
            "halflife_days"
        ),
        F.round(num * num / (denx * deny), 6).alias("r2"),
    )


RETENTION_FIT_SQL = f"""
WITH activity AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // {DAY_NS} AS day FROM events
), cohorts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
), max_day AS (
  SELECT MAX(day) AS max_day FROM activity
), complete AS (
  SELECT user_id, cohort_day FROM cohorts, max_day
  WHERE cohort_day <= max_day - {{RETENTION_MAX_OFFSET}}
), base AS (
  SELECT COUNT(*) AS n_users FROM complete
), ret AS (
  SELECT a.day - c.cohort_day AS day_offset, COUNT(*) AS active
  FROM activity a JOIN complete c ON a.user_id = c.user_id
  WHERE a.day - c.cohort_day BETWEEN 1 AND {{RETENTION_MAX_OFFSET}}
  GROUP BY a.day - c.cohort_day
), pts AS (
  SELECT day_offset, active, n_users,
         CAST(day_offset AS DOUBLE) AS x,
         ln(CAST(active AS DOUBLE) / CAST(n_users AS DOUBLE)) AS y
  FROM ret, base
), stats AS (
  SELECT n_users,
         COUNT(*) AS k,
         CAST(SUM(CAST(floor(x * {RET_FIT_S1} + 0.5) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(floor(y * {RET_FIT_S1} + 0.5) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(floor(x * y * {RET_FIT_S2} + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(SUM(CAST(floor(x * x * {RET_FIT_S2} + 0.5) AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(floor(y * y * {RET_FIT_S2} + 0.5) AS BIGINT)) AS BIGINT) AS syy
  FROM pts GROUP BY n_users
)
SELECT n_users, k AS n_points,
       ROUND(-((k * (sxy / {RET_FIT_S2}.0) - (sx / {RET_FIT_S1}.0) * (sy / {RET_FIT_S1}.0))
               / (k * (sxx / {RET_FIT_S2}.0) - (sx / {RET_FIT_S1}.0) * (sx / {RET_FIT_S1}.0))), 6) AS decay_lambda,
       ROUND({__import__("math").log(2)!r}
             / -((k * (sxy / {RET_FIT_S2}.0) - (sx / {RET_FIT_S1}.0) * (sy / {RET_FIT_S1}.0))
                 / (k * (sxx / {RET_FIT_S2}.0) - (sx / {RET_FIT_S1}.0) * (sx / {RET_FIT_S1}.0))), 6) AS halflife_days,
       ROUND((k * (sxy / {RET_FIT_S2}.0) - (sx / {RET_FIT_S1}.0) * (sy / {RET_FIT_S1}.0))
             * (k * (sxy / {RET_FIT_S2}.0) - (sx / {RET_FIT_S1}.0) * (sy / {RET_FIT_S1}.0))
             / ((k * (sxx / {RET_FIT_S2}.0) - (sx / {RET_FIT_S1}.0) * (sx / {RET_FIT_S1}.0))
                * (k * (syy / {RET_FIT_S2}.0) - (sy / {RET_FIT_S1}.0) * (sy / {RET_FIT_S1}.0))), 6) AS r2
FROM stats
"""
RETENTION_FIT_SQL = RETENTION_FIT_SQL.replace(
    "{RETENTION_MAX_OFFSET}", str(RETENTION_MAX_OFFSET)
)


# --------------------------------------------- Kaplan-Meier survival
KM_CENSOR_GAP = 3   # still active within 3 days of horizon = censored
KM_S = 10**9        # quantization of per-day ln(1 - d/n) terms


def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for user churn (Kaplan & Meier
    1958 — THE censoring-aware time-to-event estimator): duration =
    last-active − first-active day per user; a user whose last
    activity is within KM_CENSOR_GAP days of the observation horizon
    is right-CENSORED (we haven't seen them churn), everyone else is
    a churn event at their duration. Per duration t with >= 1 event:
    n_at_risk, n_churned, n_censored and S(t) = Π_{u<=t}
    (1 − d_u/n_u) — naive churn curves that ignore censoring
    overstate early churn, which is exactly what KM corrects.

    Scale shape: one distinct user-day pass, one per-user min/max
    rollup, then EVERYTHING operates on the bounded duration-domain
    table: at-risk counts and the product via prefix sums over that
    table (the theta-join convention, not a window). The product is
    exp of a prefix sum of per-day ln terms, each quantized
    floor(x·1e9+0.5)::long BEFORE summing, so S(t) is exp of an
    exact integer rational — identical IEEE on both engines after
    round(6).
    """
    ev = load_events(spark, sf_dir)
    day = F.expr(f"ts div {DAY_NS}").alias("day")
    activity = ev.select("user_id", day).distinct()
    return _km_from_activity(activity)


def _risk_table(activity: DataFrame) -> DataFrame:
    """(t, d, c, n_risk) duration-domain risk table from a distinct
    (user_id, day) frame — shared by Kaplan-Meier and Nelson-Aalen:
    duration = last−first active day, censored iff still active
    within KM_CENSOR_GAP of the horizon, at-risk counts via the
    bounded duration-domain theta join."""
    horizon = activity.agg(F.max("day").alias("h"))
    users = (
        activity.groupBy("user_id")
        .agg(F.min("day").alias("first_day"), F.max("day").alias("last_day"))
        .crossJoin(F.broadcast(horizon))
        .select(
            (F.col("last_day") - F.col("first_day")).alias("t"),
            (F.col("last_day") < F.col("h") - F.lit(KM_CENSOR_GAP))
            .cast("long")
            .alias("event"),
        )
    )
    # CACHED (r14 plan audit): per_t backs both sides of the at-risk
    # theta join and the returned table backs both sides of each
    # consumer's prefix-sum join — uncached, KM/NA/Weibull each
    # scanned events 8x (plans/r14/kaplan_meier_churn_before.txt).
    # Both frames are duration-domain rows (guide §2.4).
    per_t = users.groupBy("t").agg(
        F.sum("event").alias("d"),
        F.sum(F.lit(1) - F.col("event")).alias("c"),
    ).cache()
    # n_at_risk(t) = users with duration >= t  (bounded theta join)
    return (
        per_t.alias("a")
        .join(
            F.broadcast(per_t.alias("b")), F.col("b.t") >= F.col("a.t")
        )
        .groupBy(F.col("a.t").alias("t"), F.col("a.d").alias("d"), F.col("a.c").alias("c"))
        .agg(F.sum(F.col("b.d") + F.col("b.c")).alias("n_risk"))
        .cache()
    )


def _km_terms(activity: DataFrame) -> DataFrame:
    """(t, d, c, n_risk, li, zi): the risk table with each day's
    quantized ln(1 − d/n) survival term and the d == n_risk zero
    flag — the KM prefix-sum input shared by _km_from_activity and
    weibull_survival_fit (stats11)."""
    at_risk = _risk_table(activity)
    term_i = F.when(
        (F.col("d") > 0) & (F.col("n_risk") > F.col("d")),
        F.floor(
            F.log(
                F.lit(1.0)
                - F.col("d").cast("double") / F.col("n_risk").cast("double")
            )
            * F.lit(float(KM_S))
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    # S(t) hits exact 0 when every remaining at-risk user churns on
    # one day (d == n_risk, the 1 - d/n = 0 factor ln can't carry).
    # The censor gap makes that unreachable on this corpus, but the
    # assumption is SELF-CHECKING (ADVICE r6): the zero factor is an
    # explicit flag summed over the same prefix, never a silently
    # skipped term that would overstate survival if KM_CENSOR_GAP or
    # the data distribution changes.
    zero_i = (
        ((F.col("d") > 0) & (F.col("n_risk") == F.col("d")))
        .cast("long")
        .alias("zi")
    )
    return at_risk.select("t", "d", "c", "n_risk", term_i.alias("li"), zero_i)


def _km_from_activity(activity: DataFrame) -> DataFrame:
    """KM core over a distinct (user_id, day) frame — split out so the
    d == n_risk → S(t) = 0 branch is unit-testable with synthetic
    activity (the driver corpus never reaches it)."""
    terms = _km_terms(activity)
    # S(t) = exp(prefix sum of li up to and including t), forced to
    # exact 0 once any prefix day carries the zero flag
    surv = (
        terms.alias("a")
        .join(F.broadcast(terms.alias("b")), F.col("b.t") <= F.col("a.t"))
        .groupBy(
            F.col("a.t").alias("t"),
            F.col("a.d").alias("n_churned"),
            F.col("a.c").alias("n_censored"),
            F.col("a.n_risk").alias("n_at_risk"),
        )
        .agg(F.sum("b.li").alias("ls"), F.sum("b.zi").alias("zs"))
        .select(
            "t",
            "n_at_risk",
            "n_churned",
            "n_censored",
            F.when(F.col("zs") > 0, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("ls") / F.lit(float(KM_S))), 6))
            .alias("survival"),
        )
        .orderBy("t")
    )
    return surv


# activity → users → per_t → at_risk → terms CTE chain shared by the
# kaplan_meier_churn and weibull_survival_fit oracles (the Weibull fit
# regresses over exactly this KM prefix-sum frame — one definition).
_KM_TERMS_SQL = f"""activity AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // {DAY_NS} AS day FROM events
), horizon AS (
  SELECT MAX(day) AS h FROM activity
), users AS (
  SELECT last_day - first_day AS t,
         CASE WHEN last_day < h - {KM_CENSOR_GAP} THEN 1 ELSE 0 END AS event
  FROM (SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day
        FROM activity GROUP BY user_id), horizon
), per_t AS (
  SELECT t, CAST(SUM(event) AS BIGINT) AS d,
         CAST(SUM(1 - event) AS BIGINT) AS c
  FROM users GROUP BY t
), at_risk AS (
  SELECT a.t, a.d, a.c, CAST(SUM(b.d + b.c) AS BIGINT) AS n_risk
  FROM per_t a JOIN per_t b ON b.t >= a.t
  GROUP BY a.t, a.d, a.c
), terms AS (
  SELECT t, d, c, n_risk,
         CASE WHEN d > 0 AND n_risk > d
              THEN CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                              * {KM_S} + 0.5) AS BIGINT)
              ELSE 0 END AS li,
         CASE WHEN d > 0 AND n_risk = d THEN 1 ELSE 0 END AS zi
  FROM at_risk
)"""

KAPLAN_MEIER_SQL = f"""
WITH {_KM_TERMS_SQL}
SELECT a.t, a.n_risk AS n_at_risk, a.d AS n_churned, a.c AS n_censored,
       CASE WHEN CAST(SUM(b.zi) AS BIGINT) > 0 THEN 0.0
            ELSE ROUND(exp(CAST(SUM(b.li) AS BIGINT) / {KM_S}.0), 6)
       END AS survival
FROM terms a JOIN terms b ON b.t <= a.t
GROUP BY a.t, a.n_risk, a.d, a.c
ORDER BY a.t
"""

# ------------------------------------------- Nelson-Aalen hazard
NA_S1 = 10**9    # d/n term quantization (cumulative hazard)
NA_S2 = 10**15   # d/n² term quantization (variance)


def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard for user churn (Nelson 1972,
    Aalen 1978): H(t) = Σ_{u≤t} d_u/n_u with variance Σ d_u/n_u² —
    the additive twin of kaplan_meier_churn that survival tooling
    plots for hazard-rate shape (constant slope ⇒ exponential churn,
    bending up ⇒ aging-in). Same censoring convention, same shared
    risk table.

    Scale shape identical to KM: everything after the per-user
    min/max rollup runs on the bounded duration-domain table. Each
    d/n and d/n² term is quantized floor(x·S + 0.5)::BIGINT before
    the prefix-sum theta join, so H(t) and se(t) are exact-integer
    rationals rendered once per engine.
    """
    ev = load_events(spark, sf_dir)
    day = F.expr(f"ts div {DAY_NS}").alias("day")
    at_risk = _risk_table(ev.select("user_id", day).distinct())
    h_i = F.when(
        F.col("d") > 0,
        F.floor(
            F.col("d").cast("double") / F.col("n_risk").cast("double")
            * F.lit(float(NA_S1))
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    v_i = F.when(
        F.col("d") > 0,
        F.floor(
            F.col("d").cast("double")
            / (F.col("n_risk") * F.col("n_risk")).cast("double")
            * F.lit(float(NA_S2))
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    terms = at_risk.select(
        "t", "d", "c", "n_risk", h_i.alias("hi"), v_i.alias("vi")
    )
    return (
        terms.alias("a")
        .join(F.broadcast(terms.alias("b")), F.col("b.t") <= F.col("a.t"))
        .groupBy(
            F.col("a.t").alias("t"),
            F.col("a.d").alias("n_churned"),
            F.col("a.c").alias("n_censored"),
            F.col("a.n_risk").alias("n_at_risk"),
        )
        .agg(F.sum("b.hi").alias("hs"), F.sum("b.vi").alias("vs"))
        .select(
            "t",
            "n_at_risk",
            "n_churned",
            "n_censored",
            F.round(F.col("hs") / F.lit(float(NA_S1)), 6).alias("cum_hazard"),
            F.round(
                F.sqrt(F.col("vs").cast("double") / F.lit(float(NA_S2))), 6
            ).alias("se"),
        )
        .orderBy("t")
    )


NELSON_AALEN_SQL = f"""
WITH activity AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // {DAY_NS} AS day FROM events
), horizon AS (
  SELECT MAX(day) AS h FROM activity
), users AS (
  SELECT last_day - first_day AS t,
         CASE WHEN last_day < h - {KM_CENSOR_GAP} THEN 1 ELSE 0 END AS event
  FROM (SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day
        FROM activity GROUP BY user_id), horizon
), per_t AS (
  SELECT t, CAST(SUM(event) AS BIGINT) AS d,
         CAST(SUM(1 - event) AS BIGINT) AS c
  FROM users GROUP BY t
), at_risk AS (
  SELECT a.t, a.d, a.c, CAST(SUM(b.d + b.c) AS BIGINT) AS n_risk
  FROM per_t a JOIN per_t b ON b.t >= a.t
  GROUP BY a.t, a.d, a.c
), terms AS (
  SELECT t, d, c, n_risk,
         CASE WHEN d > 0
              THEN CAST(floor(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
                              * {NA_S1} + 0.5) AS BIGINT)
              ELSE 0 END AS hi,
         CASE WHEN d > 0
              THEN CAST(floor(CAST(d AS DOUBLE) / CAST(n_risk * n_risk AS DOUBLE)
                              * {NA_S2} + 0.5) AS BIGINT)
              ELSE 0 END AS vi
  FROM at_risk
)
SELECT a.t, a.n_risk AS n_at_risk, a.d AS n_churned, a.c AS n_censored,
       ROUND(CAST(SUM(b.hi) AS BIGINT) / {NA_S1}.0, 6) AS cum_hazard,
       ROUND(sqrt(CAST(SUM(b.vi) AS BIGINT) / {NA_S2}.0), 6) AS se
FROM terms a JOIN terms b ON b.t <= a.t
GROUP BY a.t, a.n_risk, a.d, a.c
ORDER BY a.t
"""


# ------------------------------------- Markov stationary distribution
MARKOV_S = 10**12   # π probability scale (exact-integer iteration)
MARKOV_ITERS = 10


def markov_stationary_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov
    chain: power iteration π ← πP over the transition counts that
    events_transition_matrix reports — the long-run behavioral mix a
    capacity model converges to, independent of today's traffic.

    The chain itself is bounded (|types|² counts from ONE lead-window
    aggregation); the iteration runs DRIVER-SIDE on that collected
    matrix in EXACT integer arithmetic: π is scaled to 10¹², each
    step is Σ_i (π_i·c_ij) div r_i — floor-division rationals that
    both the Python loop and the oracle's {MARKOV_ITERS} unrolled
    CTEs reproduce bit-for-bit (no float drift to converge
    differently). The collect is K² ≤ a few dozen rows — the bounded
    plan-build-state pattern (kmeans centroids, BPE merges); the
    full-data pass is the single pair count.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("i"),
            F.lead("event_type").over(w).alias("j"),
        )
        .filter(F.col("j").isNotNull())
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = pairs.collect()  # bounded: |types|² cells
    states = sorted({r["i"] for r in rows})
    idx = {s: k for k, s in enumerate(states)}
    k = len(states)
    cmat = [[0] * k for _ in range(k)]
    for r in rows:
        if r["j"] in idx:  # drop targets never seen as a source
            cmat[idx[r["i"]]][idx[r["j"]]] += r["cnt"]
    rsum = [sum(row) for row in cmat]
    pi = [MARKOV_S // k] * k
    for _ in range(MARKOV_ITERS):
        pi = [
            sum((pi[i] * cmat[i][j]) // rsum[i] for i in range(k) if rsum[i])
            for j in range(k)
        ]
    out = [(s, pi[idx[s]], pi[idx[s]] / MARKOV_S) for s in states]
    return (
        spark.createDataFrame(out, "event_type string, pi_q long, pi double")
        .orderBy("event_type")
    )


def _markov_sql() -> str:
    iters = "".join(
        f""", it{n} AS (
  SELECT p.j AS s, CAST(SUM((it{n-1}.pi * p.cnt) // p.r) AS BIGINT) AS pi
  FROM pairs p JOIN it{n-1} ON p.i = it{n-1}.s
  GROUP BY p.j
)"""
        for n in range(1, MARKOV_ITERS + 1)
    )
    return f"""
WITH seq AS (
  SELECT event_type AS i,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS j
  FROM events
), raw_pairs AS (
  SELECT i, j, COUNT(*) AS cnt FROM seq WHERE j IS NOT NULL GROUP BY i, j
), states AS (
  SELECT DISTINCT i AS s FROM raw_pairs
), pairs AS MATERIALIZED (
  SELECT rp.i, rp.j, CAST(rp.cnt AS BIGINT) AS cnt,
         CAST(SUM(rp.cnt) OVER (PARTITION BY rp.i) AS BIGINT) AS r
  FROM raw_pairs rp JOIN states ON rp.j = states.s
), it0 AS (
  SELECT s, CAST({MARKOV_S} // (SELECT COUNT(*) FROM states) AS BIGINT) AS pi
  FROM states
){iters}
SELECT states.s AS event_type,
       CAST(COALESCE(fin.pi, 0) AS BIGINT) AS pi_q,
       COALESCE(fin.pi, 0) / {MARKOV_S}.0 AS pi
FROM states LEFT JOIN it{MARKOV_ITERS} fin ON states.s = fin.s
ORDER BY event_type
"""


MARKOV_STATIONARY_SQL = _markov_sql()

# --------------------------------------- Markov chain entropy rate
ENTRATE_S = 10**9


def entropy_rate_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain:
    H = −Σᵢ πᵢ Σⱼ pᵢⱼ ln pᵢⱼ (bits of surprise per step under the
    long-run mix), reported against the ln(K) ceiling — the single
    number that says how predictable user behavior actually is, where
    transition_entropy reports the per-state breakdown and
    markov_stationary_dist the mix itself.

    π comes from the SAME exact-integer power iteration as
    markov_stationary_dist (shared helper, bounded K² driver state);
    each (i,j) term πᵢ·pᵢⱼ·ln(pᵢⱼ) is built from exact rationals and
    quantized ::int before the ≤K² sum — the oracle replays the
    unrolled iteration and the same quantized term sum.
    """
    import math as _m

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("i"),
            F.lead("event_type").over(w).alias("j"),
        )
        .filter(F.col("j").isNotNull())
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = pairs.collect()  # bounded: |types|² cells
    states = sorted({r["i"] for r in rows})
    idx = {s: k for k, s in enumerate(states)}
    k = len(states)
    cmat = [[0] * k for _ in range(k)]
    for r in rows:
        if r["j"] in idx:
            cmat[idx[r["i"]]][idx[r["j"]]] += r["cnt"]
    rsum = [sum(row) for row in cmat]
    pi = [MARKOV_S // k] * k
    for _ in range(MARKOV_ITERS):
        pi = [
            sum((pi[i] * cmat[i][j]) // rsum[i] for i in range(k) if rsum[i])
            for j in range(k)
        ]
    hq = 0
    for i in range(k):
        if not rsum[i]:
            continue
        for j in range(k):
            c = cmat[i][j]
            if c:
                p = c / rsum[i]
                hq += _m.floor(
                    -(pi[i] / MARKOV_S) * p * _m.log(p) * ENTRATE_S + 0.5
                )
    h = hq / ENTRATE_S
    out = [(k, h, _m.log(k), h / _m.log(k))]
    return spark.createDataFrame(
        out,
        "n_states long, entropy_rate double, max_entropy double, efficiency double",
    ).select(
        "n_states",
        F.round("entropy_rate", 6).alias("entropy_rate"),
        F.round("max_entropy", 6).alias("max_entropy"),
        F.round("efficiency", 6).alias("efficiency"),
    )


def _entropy_rate_sql() -> str:
    iters = "".join(
        f""", it{n} AS (
  SELECT p.j AS s, CAST(SUM((it{n-1}.pi * p.cnt) // p.r) AS BIGINT) AS pi
  FROM pairs p JOIN it{n-1} ON p.i = it{n-1}.s
  GROUP BY p.j
)"""
        for n in range(1, MARKOV_ITERS + 1)
    )
    return f"""
WITH seq AS (
  SELECT event_type AS i,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS j
  FROM events
), raw_pairs AS (
  SELECT i, j, COUNT(*) AS cnt FROM seq WHERE j IS NOT NULL GROUP BY i, j
), states AS (
  SELECT DISTINCT i AS s FROM raw_pairs
), pairs AS MATERIALIZED (
  SELECT rp.i, rp.j, CAST(rp.cnt AS BIGINT) AS cnt,
         CAST(SUM(rp.cnt) OVER (PARTITION BY rp.i) AS BIGINT) AS r
  FROM raw_pairs rp JOIN states ON rp.j = states.s
), it0 AS (
  SELECT s, CAST({MARKOV_S} // (SELECT COUNT(*) FROM states) AS BIGINT) AS pi
  FROM states
){iters}, hsum AS (
  SELECT CAST(SUM(CAST(floor(-(CAST(fin.pi AS DOUBLE) / {MARKOV_S})
                             * (CAST(p.cnt AS DOUBLE) / p.r)
                             * ln(CAST(p.cnt AS DOUBLE) / p.r)
                             * {ENTRATE_S} + 0.5) AS BIGINT)) AS BIGINT) AS hq
  FROM pairs p JOIN it{MARKOV_ITERS} fin ON p.i = fin.s
)
SELECT (SELECT COUNT(*) FROM states) AS n_states,
       ROUND(hq / {ENTRATE_S}.0, 6) AS entropy_rate,
       ROUND(ln(CAST((SELECT COUNT(*) FROM states) AS DOUBLE)), 6) AS max_entropy,
       ROUND(hq / {ENTRATE_S}.0
             / ln(CAST((SELECT COUNT(*) FROM states) AS DOUBLE)), 6) AS efficiency
FROM hsum
"""


ENTROPY_RATE_SQL = _entropy_rate_sql()
