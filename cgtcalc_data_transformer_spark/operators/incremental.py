"""Incremental-pipeline operators: CDC compaction, batch-vs-corpus
dedup, SCD2 interval builds.

A 100 TB corpus is never rebuilt — it is appended to. These operators
cover the three recurring incremental shapes:

- ``cdc_latest`` — latest-state compaction (MERGE/upsert semantics):
  one map-side-combinable ``max(struct(...))`` aggregation, no window
  sort, no driver state.
- ``dedup_incremental`` — admit a new batch against an existing
  corpus: exact dup via content-hash anti-lookup, near-dup candidates
  via SimHash prefix blocking. Every join is an equality join against
  a bounded or broadcastable side.
- ``scd2_intervals`` — change-compressed validity intervals
  (slowly-changing-dimension type 2) from an event log: two windows
  over ONE partitioning shuffle (the exchange is reused).

The reference's closest analog is its rescan-merge lifecycle
(``index.js:108-122``: re-read existing output, union, rewrite) —
these are the scale-correct generalizations of that pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.dedup import simhash_col
from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket
from cgtcalc_data_transformer_spark.sources.tpch import load_events, load_table

NS_PER_SEC = 1_000_000_000


# ------------------------------------------------ CDC latest-state
def cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user (CDC upsert compaction), as ONE
    aggregation: ``max(struct(ts, event_id, ...))`` picks the argmax
    with a total tie-break order, combines map-side, and never
    materializes a per-key sorted window — the shape that compacts a
    100 TB changelog with a single shuffle on the key.
    """
    ev = load_events(spark, sf_dir)
    last = F.max(
        F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"), F.col("value"))
    ).alias("last")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), last)
        .select(
            "user_id",
            "n_events",
            F.expr(f"last.ts div {NS_PER_SEC}").alias("last_ts_epoch"),
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_event_type"),
            F.col("last.value").alias("last_value"),
        )
        .orderBy("user_id")
    )


CDC_LATEST_SQL = f"""
WITH ranked AS (
  SELECT user_id, event_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
)
SELECT user_id, n_events,
       epoch_ns(ts) // {NS_PER_SEC} AS last_ts_epoch,
       event_id AS last_event_id,
       event_type AS last_event_type,
       value AS last_value
FROM ranked WHERE rn = 1
ORDER BY user_id
"""


# -------------------------------------- incremental batch-vs-corpus dedup
INCR_EXISTING_PCT = 80  # md5 bucket < 80 → the already-ingested corpus


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admit a new document batch against an existing corpus (split
    deterministically by md5 bucket, so the scenario is reproducible):
    per batch doc, whether its exact content hash already exists, and
    how many existing docs share its SimHash 16-bit prefix bucket
    (the near-dup candidates a verify stage would score).

    Scale shape: signatures are computed in ONE pass over all docs;
    the exact-dup lookup joins on the content hash (existing side is
    a distinct-hash set); the near-dup lookup joins on the prefix
    bucket against a ≤2^16-row count table (broadcastable). The new
    batch never compares against the corpus pairwise.
    """
    docs = load_table(spark, sf_dir, "documents")
    # The signature projection (md5 + the 64-counter SimHash fold) is
    # the expensive part and feeds FOUR branches (existing/batch ×
    # key-set/bucket-counts) — cache it so it is computed once per doc
    # (at 100 TB: persist the signature table to parquet, it is the
    # natural incremental-ingest artifact to keep anyway).
    sig = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_key"),
        F.shiftrightunsigned(simhash_col(F.col("text")), 48).alias("bucket16"),
        (hash_bucket(F.col("doc_id")) < INCR_EXISTING_PCT).alias("is_existing"),
    ).cache()
    existing = sig.filter(F.col("is_existing"))
    batch = sig.filter(~F.col("is_existing"))
    known_keys = existing.select("content_key").distinct()
    bucket_counts = existing.groupBy("bucket16").agg(
        F.count(F.lit(1)).alias("near_candidates")
    )
    return (
        batch.join(
            known_keys.withColumn("known", F.lit(True)), "content_key", "left"
        )
        .join(F.broadcast(bucket_counts), "bucket16", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("known"), F.lit(False)).alias("exact_dup"),
            F.coalesce(F.col("near_candidates"), F.lit(0).cast("long")).alias(
                "near_candidates"
            ),
            (~F.coalesce(F.col("known"), F.lit(False))).alias("kept"),
        )
        .orderBy("doc_id")
    )


DEDUP_INCREMENTAL_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS tok
  FROM documents
), contrib AS (
  SELECT doc_id,
         i * 4 + j AS bit,
         CASE WHEN ((strpos('0123456789abcdef', substr(md5(tok), CAST(i + 1 AS INTEGER), 1)) - 1) >> j) & 1 = 1
              THEN 1 ELSE -1 END AS c
  FROM toks
  CROSS JOIN (SELECT unnest(range(0, 16)) AS i)
  CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
), counters AS (
  SELECT doc_id, bit, SUM(c) AS s FROM contrib GROUP BY doc_id, bit
), sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 AND bit >= 48 THEN (1::BIGINT << (bit - 48)) ELSE 0 END) AS BIGINT) AS bucket16
  FROM counters GROUP BY doc_id
), base AS (
  SELECT d.doc_id, md5(d.text) AS content_key, COALESCE(sig.bucket16, 0) AS bucket16,
         ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100
           < {INCR_EXISTING_PCT} AS is_existing
  FROM documents d LEFT JOIN sig USING (doc_id)
), existing AS (
  SELECT * FROM base WHERE is_existing
), batch AS (
  SELECT * FROM base WHERE NOT is_existing
), known AS (
  SELECT DISTINCT content_key FROM existing
), bc AS (
  SELECT bucket16, COUNT(*) AS near_candidates FROM existing GROUP BY bucket16
)
SELECT b.doc_id,
       (k.content_key IS NOT NULL) AS exact_dup,
       COALESCE(bc.near_candidates, 0) AS near_candidates,
       (k.content_key IS NULL) AS kept
FROM batch b
LEFT JOIN known k USING (content_key)
LEFT JOIN bc USING (bucket16)
ORDER BY b.doc_id
"""


# ------------------------------------------------------ SCD2 intervals
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-compressed SCD2 intervals of each user's event_type:
    consecutive equal states collapse; each surviving change opens an
    interval [valid_from, valid_to) closed by the next change
    (``is_current`` marks the open one).

    Both windows partition by user_id with the same ordering, so
    Catalyst reuses one exchange+sort for the lag-filter and the
    lead-close — one shuffle total, no iteration, no driver state.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.withColumn("next_ts", F.lead("ts").over(w2))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.expr(f"ts div {NS_PER_SEC}").alias("valid_from_epoch"),
            F.expr(f"next_ts div {NS_PER_SEC}").alias("valid_to_epoch"),
            F.col("next_ts").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_epoch")
    )


SCD2_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, event_type, ts,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), changes AS (
  SELECT user_id, event_id, event_type, ts
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
), closed AS (
  SELECT user_id, event_type, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM changes
)
SELECT user_id, event_type AS state,
       epoch_ns(ts) // {NS_PER_SEC} AS valid_from_epoch,
       epoch_ns(next_ts) // {NS_PER_SEC} AS valid_to_epoch,
       (next_ts IS NULL) AS is_current
FROM closed
ORDER BY user_id, valid_from_epoch
"""


# ------------------------------------- incremental view maintenance
IVM_BASE_PCT = 90  # deterministic split: 90% base snapshot, 10% late delta


def ivm_refresh_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental refresh of a per-status revenue rollup: merge the
    stored aggregation STATE with the delta batch's aggregation —
    never re-touching the base facts.

    count and decimal-sum are algebraic (mergeable) states, so
    refresh = unionByName(base_state, delta_state) → re-aggregate the
    handful of state rows. In production the base state is a stored
    table and the refresh cost is O(delta); here both sides derive
    from a deterministic md5 split of orders so the DuckDB oracle —
    a FULL recompute over all orders — proves the merge is lossless.
    This is the missing-view-maintenance counterpart of cdc_latest:
    cdc compacts rows, this maintains an aggregate.
    """
    from cgtcalc_data_transformer_spark.functions.money import dec as _dec

    orders = load_table(spark, sf_dir, "orders")
    bucket = hash_bucket(F.col("o_orderkey"), 100)
    base = orders.filter(bucket < IVM_BASE_PCT)
    delta = orders.filter(bucket >= IVM_BASE_PCT)

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.sum(_dec(F.col("o_totalprice"))).alias("total_dec"),
        )

    return (
        state(base)
        .unionByName(state(delta))
        .groupBy("o_orderstatus")
        .agg(
            F.sum("order_cnt").alias("order_cnt"),
            F.sum("total_dec").cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


IVM_REFRESH_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS order_cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------- MERGE (upsert)
MERGE_BASE_PCT = 90   # bucket < 90  → target snapshot
MERGE_DELTA_PCT = 85  # bucket >= 85 → delta batch (85-89 overlap = matches)


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE INTO semantics (the Delta/Iceberg primitive Spark
    core lacks) over a deterministic md5 split of orders: target =
    buckets [0,90), delta batch = buckets [85,100) carrying an action
    flag — so [85,90) exercises WHEN MATCHED (update or delete) and
    [90,100) exercises WHEN NOT MATCHED (insert, D-actions ignored).

    Spark-first shape: ONE full-outer equality join on the key, then
    pure CASE projections — no window, no driver state. On bucketed/
    partitioned storage the join is exchange-free; at 100 TB this is
    exactly one shuffle of target ∪ delta, and AQE splits any hot key.
    cdc_latest compacts a changelog by argmax; this applies a keyed
    delta WITH delete semantics — the other half of the upsert story.
    """
    orders = load_table(spark, sf_dir, "orders")
    bucket = hash_bucket(F.col("o_orderkey"))
    target = orders.filter(bucket < MERGE_BASE_PCT).select(
        "o_orderkey", F.col("o_totalprice").alias("t_price")
    )
    delta = orders.filter(bucket >= MERGE_DELTA_PCT).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(100.0)).alias("d_price"),
        F.when(bucket % 3 == 0, F.lit("D")).otherwise(F.lit("U")).alias("action"),
    )
    merged = target.join(delta, "o_orderkey", "full_outer")
    matched = F.col("t_price").isNotNull() & F.col("d_price").isNotNull()
    return (
        merged.filter(~(matched & (F.col("action") == "D")))
        # not-matched-by-target deletes are no-ops in MERGE semantics
        .filter(F.col("t_price").isNotNull() | (F.col("action") == "U"))
        .select(
            "o_orderkey",
            F.when(matched, F.col("d_price"))
            .when(F.col("t_price").isNotNull(), F.col("t_price"))
            .otherwise(F.col("d_price"))
            .alias("o_totalprice"),
            F.when(matched, F.lit("updated"))
            .when(F.col("t_price").isNotNull(), F.lit("kept"))
            .otherwise(F.lit("inserted"))
            .alias("merge_action"),
        )
        .orderBy("o_orderkey")
    )


MERGE_UPSERT_SQL = f"""
WITH bucketed AS (
  SELECT o_orderkey, o_totalprice,
         ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 AS b
  FROM orders
), target AS (
  SELECT o_orderkey, o_totalprice AS t_price FROM bucketed WHERE b < {MERGE_BASE_PCT}
), delta AS (
  SELECT o_orderkey, o_totalprice + 100.0 AS d_price,
         CASE WHEN b % 3 = 0 THEN 'D' ELSE 'U' END AS action
  FROM bucketed WHERE b >= {MERGE_DELTA_PCT}
), merged AS (
  SELECT COALESCE(t.o_orderkey, d.o_orderkey) AS o_orderkey,
         t.t_price, d.d_price, d.action,
         (t.t_price IS NOT NULL AND d.d_price IS NOT NULL) AS matched
  FROM target t FULL OUTER JOIN delta d ON t.o_orderkey = d.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN matched THEN d_price
            WHEN t_price IS NOT NULL THEN t_price
            ELSE d_price END AS o_totalprice,
       CASE WHEN matched THEN 'updated'
            WHEN t_price IS NOT NULL THEN 'kept'
            ELSE 'inserted' END AS merge_action
FROM merged
WHERE NOT (matched AND action = 'D')
  AND (t_price IS NOT NULL OR action = 'U')
ORDER BY o_orderkey
"""


# --------------------------------------------------- snapshot diff
DIFF_DELTA_PCT = 20  # md5 bucket < 20 → row differs in snapshot B


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table reconciliation: classify every key across two snapshots
    as unchanged / changed / added / removed in ONE full-outer join —
    the audit every ingest pipeline runs after a backfill, and the
    pure-relational twin of ``cogroup_reconcile`` (which demonstrates
    the cogrouped-UDF route for the same question).

    Snapshot B is derived deterministically from orders: 20% of keys
    get a price bump (changed), keys with bucket%7==0 are dropped
    (removed), and synthetic keys beyond the max are appended (added)
    — so the oracle can replay the exact same derivation. Comparison
    is on xxhash-free md5 of the value tuple (engine-portable).
    Output is the per-status rollup: count + key digest.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    b = hash_bucket(F.col("o_orderkey"))
    snap_a = orders
    snap_b = (
        orders.filter(~(b % 7 == 0))  # removed rows
        .withColumn(
            "o_totalprice",
            F.when(b < DIFF_DELTA_PCT, F.col("o_totalprice") + 50.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(  # added rows: key-shifted clones, disjoint by offset
            orders.filter(b % 13 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000_000)
            )
        )
    )
    val = lambda pfx: F.md5(
        F.concat_ws("|", F.col(f"{pfx}_price").cast("string"), F.col(f"{pfx}_status"))
    )
    a = snap_a.select(
        "o_orderkey",
        F.col("o_totalprice").alias("a_price"),
        F.col("o_orderstatus").alias("a_status"),
    )
    bdf = snap_b.select(
        "o_orderkey",
        F.col("o_totalprice").alias("b_price"),
        F.col("o_orderstatus").alias("b_status"),
    )
    joined = a.join(bdf, "o_orderkey", "full_outer").select(
        "o_orderkey",
        F.when(F.col("a_price").isNull(), F.lit("added"))
        .when(F.col("b_price").isNull(), F.lit("removed"))
        .when(val("a") == val("b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
    return (
        joined.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("o_orderkey").alias("key_digest"),
        )
        .orderBy("status")
    )


SNAPSHOT_DIFF_SQL = f"""
WITH a AS (
  SELECT o_orderkey, o_totalprice AS a_price, o_orderstatus AS a_status FROM orders
),
b AS (
  SELECT o_orderkey,
         CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 < {DIFF_DELTA_PCT}
              THEN o_totalprice + 50.0 ELSE o_totalprice END AS b_price,
         o_orderstatus AS b_status
  FROM orders
  WHERE NOT (('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100) % 7 = 0
  UNION ALL
  SELECT o_orderkey + 10000000000, o_totalprice, o_orderstatus
  FROM orders
  WHERE (('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100) % 13 = 0
),
joined AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k,
         CASE WHEN a.a_price IS NULL THEN 'added'
              WHEN b.b_price IS NULL THEN 'removed'
              WHEN md5(CAST(a.a_price AS VARCHAR) || '|' || a.a_status)
                 = md5(CAST(b.b_price AS VARCHAR) || '|' || b.b_status) THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM a FULL OUTER JOIN b USING (o_orderkey)
)
SELECT status, COUNT(*) AS n_keys, CAST(SUM(k) AS BIGINT) AS key_digest
FROM joined
GROUP BY status
ORDER BY status
"""
