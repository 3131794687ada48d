"""Training-set preparation operators for LLM data pipelines.

The stages that sit between curation (curation.py) and the trainer:

- ``split_assign`` — deterministic train/val/test assignment audited
  per source: a doc's split is a pure function of md5(doc_id), so the
  split is stable across reruns, engines and appends (no RNG state to
  carry, no re-shuffling docs between splits when the corpus grows).
- ``text_repetition`` — per-doc repetition diagnostics (distinct-token
  ratio, top-unigram / top-bigram occupancy) + a Gopher-style pass
  flag; excessive repetition is the canonical LLM-pretraining junk
  signal that plain length/stopword quality scores miss.
- ``length_outliers`` — corpus-relative length-bound filter: exact
  p01/p99 char-length quantiles computed once, broadcast as a 1-row
  scalar frame, every doc flagged against them. Two aggregations and
  one broadcast join — never a driver round-trip per doc.
- ``events_user_sequences`` — behavioral-sequence construction: per
  user, the chronologically-ordered head of their event stream packed
  into one training-example row with a portable fingerprint.

No reference analog (the reference ingests broker CSVs,
``index.js:19-31``); these extend the engine's scan → project →
aggregate discipline to the dataset-assembly stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.dedup import tokens_col
from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket
from cgtcalc_data_transformer_spark.sources.tpch import load_table, scatter

# --------------------------------------------------- train/val/test split
TRAIN_PCT = 90  # md5 bucket < 90            → train
VAL_PCT = 95    # 90 ≤ bucket < 95           → val; rest → test


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split, audited per (source, split).

    The assignment is row-local codegen (md5 bucket of doc_id), so at
    100 TB the split costs one hash per row inside the scan stage; the
    audit is a single partial-agg-friendly groupBy. Appending new docs
    never moves an existing doc between splits.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.groupBy(F.col("source"), split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("source", "split")
    )


SPLIT_ASSIGN_SQL = f"""
WITH assigned AS (
  SELECT source, n_chars, doc_id,
         CASE
           WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 < {TRAIN_PCT} THEN 'train'
           WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 < {VAL_PCT} THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT source, split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM assigned
GROUP BY source, split
ORDER BY source, split
"""


# ----------------------------------------------------- repetition signals
REP_TOP_UNIGRAM_MAX = 0.20  # Gopher-style: top token ≤ 20% of tokens
REP_TOP_BIGRAM_MAX = 0.18   # top bigram ≤ 18% of bigrams
REP_DISTINCT_MIN = 0.30     # ≥ 30% of tokens distinct


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition diagnostics + Gopher-style admission flag.

    Plan shape: tokenize once (cached — at 100 TB, checkpointed), then
    two independent explode → two-level hash-agg branches (unigram,
    bigram) joined back on doc_id. Both branches partial-aggregate
    map-side on (doc_id, gram) so the shuffle carries counts, not
    tokens; nothing is quadratic and no window spans more than one
    doc's grams.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks")).cache()

    uni = (
        toks.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tok"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("top_uni_cnt"),
        )
    )
    # bigram array via two shifted slices zipped JVM-side (no window,
    # no interpreted lambda over scalars — concat is codegen)
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice("toks", 1, n - 1),
        F.slice("toks", 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bi = (
        toks.filter(n >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_bi"), F.max("cnt").alias("top_bi_cnt"))
    )
    top_uni = F.round(F.col("top_uni_cnt") / F.col("n_tok"), 6)
    dist_ratio = F.round(F.col("n_distinct") / F.col("n_tok"), 6)
    top_bi = F.round(F.col("top_bi_cnt") / F.col("n_bi"), 6)
    passes = (
        (top_uni <= REP_TOP_UNIGRAM_MAX)
        & (top_bi <= REP_TOP_BIGRAM_MAX)
        & (dist_ratio >= REP_DISTINCT_MIN)
    )
    return (
        uni.join(bi, "doc_id")
        .select(
            "doc_id",
            "n_tok",
            dist_ratio.alias("distinct_ratio"),
            top_uni.alias("top_unigram_share"),
            top_bi.alias("top_bigram_share"),
            passes.alias("passes_repetition"),
        )
        .orderBy("doc_id")
    )


TEXT_REPETITION_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     x -> x <> '') AS toks
  FROM documents
), uni_c AS (
  SELECT doc_id, tok, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
  GROUP BY doc_id, tok
), uni AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tok,
         COUNT(*) AS n_distinct, MAX(cnt) AS top_uni_cnt
  FROM uni_c GROUP BY doc_id
), bi_c AS (
  SELECT doc_id, bg, COUNT(*) AS cnt
  FROM (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
        FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
        WHERE len(toks) >= 2)
  GROUP BY doc_id, bg
), bi AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bi, MAX(cnt) AS top_bi_cnt
  FROM bi_c GROUP BY doc_id
)
SELECT uni.doc_id, n_tok,
       ROUND(n_distinct / n_tok, 6) AS distinct_ratio,
       ROUND(top_uni_cnt / n_tok, 6) AS top_unigram_share,
       ROUND(top_bi_cnt / n_bi, 6) AS top_bigram_share,
       (ROUND(top_uni_cnt / n_tok, 6) <= {REP_TOP_UNIGRAM_MAX}
        AND ROUND(top_bi_cnt / n_bi, 6) <= {REP_TOP_BIGRAM_MAX}
        AND ROUND(n_distinct / n_tok, 6) >= {REP_DISTINCT_MIN}) AS passes_repetition
FROM uni JOIN bi ON uni.doc_id = bi.doc_id
ORDER BY uni.doc_id
"""


# ------------------------------------------------- length-bound outliers
LEN_LO_Q = 0.01
LEN_HI_Q = 0.99


def length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative length filter: docs outside the exact
    [p01, p99] char-length band, with the bounds they violated.

    The bounds are ONE scalar aggregation broadcast against the scan
    (crossJoin of a 1-row frame — the same shape as a decorrelated
    scalar subquery), so the second pass is still a pure filter over
    the scan: no window, no driver round-trip, no re-partitioning. At
    100 TB swap the exact percentile for approx_percentile and the
    plan is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.expr(f"percentile(n_chars, {LEN_LO_Q})").alias("lo"),
        F.expr(f"percentile(n_chars, {LEN_HI_Q})").alias("hi"),
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .filter((F.col("n_chars") < F.col("lo")) | (F.col("n_chars") > F.col("hi")))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round("lo", 6).alias("lo_bound"),
            F.round("hi", 6).alias("hi_bound"),
            F.when(F.col("n_chars") < F.col("lo"), F.lit("short"))
            .otherwise(F.lit("long"))
            .alias("reason"),
        )
        .orderBy("doc_id")
    )


LENGTH_OUTLIERS_SQL = f"""
WITH bounds AS (
  SELECT quantile_cont(n_chars, {LEN_LO_Q}) AS lo,
         quantile_cont(n_chars, {LEN_HI_Q}) AS hi
  FROM documents
)
SELECT doc_id, source, n_chars,
       ROUND(lo, 6) AS lo_bound, ROUND(hi, 6) AS hi_bound,
       CASE WHEN n_chars < lo THEN 'short' ELSE 'long' END AS reason
FROM documents, bounds
WHERE n_chars < lo OR n_chars > hi
ORDER BY doc_id
"""


# ------------------------------------------- behavioral sequence packing
SEQ_MAX_EVENTS = 20


def events_user_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user training-example construction: the chronologically
    first ``SEQ_MAX_EVENTS`` events packed into one ordered
    action-sequence row (length, truncation flag, value sum, md5
    fingerprint of the ordered type sequence).

    One window (partitioned by user — the same key the aggregation
    reuses, so AQE sees a single exchange) ranks events; collect_list
    gathers (rank, type) structs whose array_sort restores order
    deterministically regardless of task arrival order. The md5-of-
    concat fingerprint keeps the row compact and engine-portable
    instead of shipping a string array.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
    )
    head = ranked.filter(F.col("rn") <= SEQ_MAX_EVENTS)
    seq = F.transform(
        F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
        lambda s: s["event_type"],
    )
    totals = ranked.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    packed = head.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("seq_len"),
        F.round(F.sum("value"), 4).alias("seq_value"),
        F.md5(F.concat_ws("|", seq)).alias("seq_sig"),
    )
    return (
        packed.join(totals, "user_id")
        .select(
            "user_id",
            "seq_len",
            (F.col("n_events") > SEQ_MAX_EVENTS).alias("truncated"),
            "seq_value",
            "seq_sig",
        )
        .orderBy("user_id")
    )


EVENTS_USER_SEQ_SQL = f"""
WITH ranked AS (
  SELECT user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
)
SELECT user_id,
       COUNT(*) AS seq_len,
       MAX(n_events) > {SEQ_MAX_EVENTS} AS truncated,
       CAST(ROUND(SUM(value), 4) AS DOUBLE) AS seq_value,
       md5(string_agg(event_type, '|' ORDER BY rn)) AS seq_sig
FROM ranked
WHERE rn <= {SEQ_MAX_EVENTS}
GROUP BY user_id
ORDER BY user_id
"""


# ------------------------------------------------ cross-split leakage
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval contamination audit: for each held-out split, how
    many docs share a normalized-text fingerprint with ANY train doc.

    This is the check every LLM eval pipeline needs before trusting a
    validation loss: ``split_assign``'s hash split is uniform over
    doc_id, so exact duplicates in the corpus land in different splits
    ~10% of the time and silently leak train text into eval.

    Scale shape: ONE scan projected to (fp, split-indicator counts),
    one map-side-combinable shuffle on fp (each output row is one
    distinct fingerprint, so no countDistinct expand), then a 1-row
    global aggregate unpacked to per-split rows with ``stack``. The
    obvious semi-join formulation reads the corpus three times; this
    reads it once. No reference analog (`index.js:19-31` ingests
    disjoint broker files).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b = hash_bucket(F.col("doc_id"))
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    split = (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per_fp = (
        docs.select(fp.alias("fp"), split.alias("split"))
        .groupBy("fp")
        .agg(
            F.sum((F.col("split") == "train").cast("long")).alias("n_train"),
            F.sum((F.col("split") == "val").cast("long")).alias("n_val"),
            F.sum((F.col("split") == "test").cast("long")).alias("n_test"),
        )
    )
    leaked = F.col("n_train") > 0
    stats = per_fp.agg(
        F.sum("n_val").alias("val_docs"),
        F.sum(F.when(leaked, F.col("n_val")).otherwise(F.lit(0))).alias("val_leaked"),
        F.sum((leaked & (F.col("n_val") > 0)).cast("long")).alias("val_fps"),
        F.sum("n_test").alias("test_docs"),
        F.sum(F.when(leaked, F.col("n_test")).otherwise(F.lit(0))).alias("test_leaked"),
        F.sum((leaked & (F.col("n_test") > 0)).cast("long")).alias("test_fps"),
    )
    return (
        stats.selectExpr(
            "stack(2, 'test', test_docs, test_leaked, test_fps, "
            "'val', val_docs, val_leaked, val_fps) "
            "AS (split, n_docs, n_leaked, n_leaked_fps)"
        )
        .withColumn("leak_rate", F.round(F.col("n_leaked") / F.col("n_docs"), 6))
        .orderBy("split")
    )


SPLIT_LEAKAGE_SQL = rf"""
WITH per_fp AS (
  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         SUM(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 < {TRAIN_PCT} THEN 1 ELSE 0 END) AS n_train,
         SUM(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 >= {TRAIN_PCT}
                   AND ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 < {VAL_PCT} THEN 1 ELSE 0 END) AS n_val,
         SUM(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 >= {VAL_PCT} THEN 1 ELSE 0 END) AS n_test
  FROM documents
  GROUP BY 1
),
stats AS (
  SELECT CAST(SUM(n_val) AS BIGINT) AS val_docs,
         CAST(SUM(CASE WHEN n_train > 0 THEN n_val ELSE 0 END) AS BIGINT) AS val_leaked,
         CAST(SUM(CASE WHEN n_train > 0 AND n_val > 0 THEN 1 ELSE 0 END) AS BIGINT) AS val_fps,
         CAST(SUM(n_test) AS BIGINT) AS test_docs,
         CAST(SUM(CASE WHEN n_train > 0 THEN n_test ELSE 0 END) AS BIGINT) AS test_leaked,
         CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END) AS BIGINT) AS test_fps
  FROM per_fp
)
SELECT split, n_docs, n_leaked, n_leaked_fps,
       ROUND(n_leaked / n_docs, 6) AS leak_rate
FROM (
  SELECT 'test' AS split, test_docs AS n_docs, test_leaked AS n_leaked, test_fps AS n_leaked_fps FROM stats
  UNION ALL
  SELECT 'val', val_docs, val_leaked, val_fps FROM stats
)
ORDER BY split
"""


# --------------------------------------------- contrastive negatives
NEG_BUCKETS = 64            # hash-ring size
NEG_OFFSETS = [7, 19, 33, 49]  # K=4 deterministic ring strides


def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    doc is paired with K negatives drawn from a hash ring — the doc's
    bucket plus K fixed strides, each bucket represented by its
    min-doc_id member.

    Why not rand(): negatives must be stable across reruns/engines
    (rand() re-rolls per retry and per engine, silently changing the
    training set), and must never pair a doc with itself. The ring
    gives uniform-ish coverage with ZERO shuffle of the doc side:
    the representatives table is NEG_BUCKETS rows — broadcast — and
    the K strides are a literal array explode, so the plan is
    scan → explode(K) → broadcast join → aggregate. Self-collisions
    (a doc IS its target bucket's representative) are dropped and
    counted in the audit.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    b = hash_bucket(F.col("doc_id"), NEG_BUCKETS)
    reps = (
        docs.select(b.alias("bucket"), "doc_id")
        .groupBy("bucket")
        .agg(F.min("doc_id").alias("neg_id"))
    )
    pairs = (
        docs.select("doc_id", "source", b.alias("my_bucket"))
        .select(
            "doc_id",
            "source",
            F.explode(
                F.array(*[F.lit(o) for o in NEG_OFFSETS])
            ).alias("stride"),
            "my_bucket",
        )
        .withColumn("bucket", (F.col("my_bucket") + F.col("stride")) % NEG_BUCKETS)
        .join(F.broadcast(reps), "bucket")
    )
    self_hit = F.col("neg_id") == F.col("doc_id")
    return (
        pairs.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum((~self_hit).cast("long")).alias("n_pairs"),
            F.sum(self_hit.cast("long")).alias("n_self_dropped"),
            F.sum(F.when(~self_hit, F.col("neg_id")).otherwise(F.lit(0))).alias(
                "neg_id_digest"
            ),
        )
        .orderBy("source")
    )


CONTRASTIVE_NEGATIVES_SQL = f"""
WITH b AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % {NEG_BUCKETS} AS my_bucket
  FROM documents
),
reps AS (
  SELECT my_bucket AS bucket, MIN(doc_id) AS neg_id FROM b GROUP BY 1
),
pairs AS (
  SELECT d.doc_id, d.source, r.neg_id
  FROM b d
  CROSS JOIN (SELECT unnest([{", ".join(str(o) for o in NEG_OFFSETS)}]) AS stride) s
  JOIN reps r ON r.bucket = (d.my_bucket + s.stride) % {NEG_BUCKETS}
)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN neg_id <> doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN neg_id = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_self_dropped,
       CAST(SUM(CASE WHEN neg_id <> doc_id THEN neg_id ELSE 0 END) AS BIGINT) AS neg_id_digest
FROM pairs
GROUP BY source
ORDER BY source
"""


# ------------------------------------------ deterministic global shuffle
SHUFFLE_EPOCH_SALT = "#ep0"
SHUFFLE_BUCKETS = 256  # top byte of the md5 key — a PREFIX of the sort key


def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training order: every document gets a
    dense 0-based position in the order of md5(doc_id || epoch salt)
    — the seeded-shuffle step before sequence packing (new epoch =
    new salt, no RNG state, rerun/engine-stable).

    100 TB shape — a dense global rank WITHOUT a global sort or a
    single-partition window: the shuffle key's top byte is used as a
    256-way bucket. Hex is lexicographic in value, so bucket order is
    a prefix of key order, and global position = (number of docs in
    strictly-lower buckets) + (rank within the bucket). Ranks are
    per-bucket windows (256-way parallel); bucket offsets come from a
    256-row count table whose prefix sum is a broadcast self-join —
    the same value-domain-bounded trick as pareto_frontier's band
    prune. One corpus shuffle total (the bucket window).

    The DuckDB oracle is the naive global ROW_NUMBER over the same
    key — proving the bucketed rewrite reproduces it exactly.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(SHUFFLE_EPOCH_SALT)))
    keyed = docs.select(
        "doc_id",
        key.alias("k"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("long").alias("bucket"),
    )
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    offsets = (
        counts.alias("a")
        .join(F.broadcast(counts.alias("b")), F.col("b.bucket") < F.col("a.bucket"), "left")
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.coalesce(F.sum("b.n"), F.lit(0)).alias("offset"))
    )
    w = Window.partitionBy("bucket").orderBy("k", "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            (F.col("offset") + F.col("rk") - 1).alias("shuffle_pos"),
        )
        .orderBy("shuffle_pos")
    )


TRAINING_ORDER_SQL = f"""
SELECT doc_id,
       ROW_NUMBER() OVER (
         ORDER BY md5(doc_id::VARCHAR || '{SHUFFLE_EPOCH_SALT}'), doc_id
       ) - 1 AS shuffle_pos
FROM documents
ORDER BY shuffle_pos
"""


# --------------------------------------------------- k-fold CV folds
KFOLD_K = 5


def kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic K-fold cross-validation assignment with the
    per-fold train/eval audit: fold = md5(doc_id) mod K (row-local
    codegen, append-stable like split_assign), and for each fold the
    eval size, the complementary train size, eval character volume,
    and the eval share (quantized int/int ratio) — the balance
    evidence a CV harness needs before trusting fold estimates.

    One groupBy over the scan plus a 1-row broadcast total; the fold
    table is K rows. Appending documents never moves an existing doc
    between folds (the property RNG-based folds lack).
    """
    docs = load_table(spark, sf_dir, "documents")
    fold = F.pmod(hash_bucket(F.col("doc_id"), 1000), F.lit(KFOLD_K))
    per_fold = docs.groupBy(fold.alias("fold")).agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum("n_chars").alias("eval_chars"),
        F.count_distinct("source").alias("n_sources"),
    )
    totals = docs.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        per_fold.crossJoin(F.broadcast(totals))
        .select(
            "fold",
            "n_eval",
            (F.col("n_total") - F.col("n_eval")).alias("n_train"),
            "eval_chars",
            "n_sources",
            F.round(F.col("n_eval") / F.col("n_total"), 6).alias("eval_share"),
        )
        .orderBy("fold")
    )


KFOLD_ASSIGN_SQL = f"""
WITH assigned AS (
  SELECT source, n_chars,
         ((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 1000)
          % {KFOLD_K}) AS fold
  FROM documents
), per_fold AS (
  SELECT fold, COUNT(*) AS n_eval,
         CAST(SUM(n_chars) AS BIGINT) AS eval_chars,
         COUNT(DISTINCT source) AS n_sources
  FROM assigned GROUP BY fold
), totals AS (
  SELECT COUNT(*) AS n_total FROM documents
)
SELECT fold, n_eval, n_total - n_eval AS n_train, eval_chars, n_sources,
       ROUND(n_eval / n_total, 6) AS eval_share
FROM per_fold CROSS JOIN totals
ORDER BY fold
"""


# -------------------------------------- group-leakage-safe split
def group_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split hashed on the GROUP key (source), not the
    row key: every document of a source lands in the same split, so
    near-duplicate documents within a source can never straddle the
    train/test boundary — the group-wise split sklearn calls
    GroupShuffleSplit, as a pure column expression.
    ``split_assign`` (row-hash) optimizes balance; this one optimizes
    leakage-safety; ``split_leakage_check`` measures what row-hash
    splitting leaks. Same md5 bucketing, so the assignment is
    append-stable and engine-exact.

    One row-local hash inside the scan + one map-side-combinable agg;
    the source->split function needs no table, no broadcast, no
    shuffle of its own.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("source"))
    split = (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.groupBy(split.alias("split"))
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


GROUP_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT source, n_chars,
         CASE
           WHEN ('0x' || substr(md5(source), 1, 8))::UBIGINT::BIGINT % 100 < {TRAIN_PCT}
             THEN 'train'
           WHEN ('0x' || substr(md5(source), 1, 8))::UBIGINT::BIGINT % 100 < {VAL_PCT}
             THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT split,
       COUNT(DISTINCT source) AS n_sources,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM assigned
GROUP BY split
ORDER BY split
"""


# ------------------------------------------ temporal holdout split
HOLDOUT_DAYS = 7
_HOLDOUT_NS = HOLDOUT_DAYS * 86_400 * 10**9


def temporal_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/holdout split over events — the evaluation
    protocol for anything forecasting-shaped: train on everything
    before (max_ts - HOLDOUT_DAYS), hold out the final week, and
    report the COLD-START exposure (holdout users never seen in
    train), the number the offline metric silently hinges on.

    All cutoff arithmetic is int64 nanoseconds (epoch nanos exceed
    2^53 — a double round-trip corrupts boundaries). Plan: 1-row max
    scalar broadcast back onto the scan, one per-split agg, and a
    distinct-users anti-join for the cold count — no window, no sort.
    """
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx"))
    flagged = (
        ev.crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("ts") < F.col("mx") - F.lit(_HOLDOUT_NS).cast("long"),
                F.lit("train"),
            )
            .otherwise(F.lit("holdout"))
            .alias("split"),
            "user_id",
            "ts",
        )
        .cache()
    )
    per_split = flagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.expr("MIN(ts) div 1000000000").alias("first_epoch"),
        F.expr("MAX(ts) div 1000000000").alias("last_epoch"),
    )
    cold = (
        flagged.filter(F.col("split") == "holdout")
        .select("user_id")
        .distinct()
        .join(
            flagged.filter(F.col("split") == "train")
            .select("user_id")
            .distinct(),
            "user_id",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("cold"))
    )
    return (
        per_split.crossJoin(F.broadcast(cold))
        .select(
            "split",
            "n_events",
            "n_users",
            "first_epoch",
            "last_epoch",
            F.when(F.col("split") == "holdout", F.col("cold"))
            .otherwise(F.lit(0))
            .alias("n_cold_users"),
        )
        .orderBy("split")
    )


TEMPORAL_HOLDOUT_SQL = f"""
WITH ev AS (
  SELECT epoch_ns(ts) AS tsn, user_id FROM events
), mx AS (
  SELECT MAX(tsn) AS mx FROM ev
), flagged AS (
  SELECT CASE WHEN tsn < mx - {_HOLDOUT_NS} THEN 'train' ELSE 'holdout' END AS split,
         user_id, tsn
  FROM ev, mx
), per_split AS (
  SELECT split, COUNT(*) AS n_events,
         COUNT(DISTINCT user_id) AS n_users,
         MIN(tsn) // 1000000000 AS first_epoch,
         MAX(tsn) // 1000000000 AS last_epoch
  FROM flagged GROUP BY split
), cold AS (
  SELECT COUNT(*) AS cold FROM (
    SELECT DISTINCT user_id FROM flagged WHERE split = 'holdout'
    EXCEPT
    SELECT DISTINCT user_id FROM flagged WHERE split = 'train'
  )
)
SELECT split, n_events, n_users, first_epoch, last_epoch,
       CASE WHEN split = 'holdout' THEN cold ELSE 0 END AS n_cold_users
FROM per_split, cold
ORDER BY split
"""


# -------------------------------------- label-distribution shift test
CHI2_SCALE = 10**6
# chi-square 0.95 quantiles by dof (standard public table) — the CASE
# lookup keeps the drift flag exact on both engines for any label
# cardinality the corpus can produce
_CHI2_CRIT_95 = {
    1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070, 6: 12.592,
    7: 14.067, 8: 15.507, 9: 16.919, 10: 18.307, 11: 19.675,
    12: 21.026, 13: 22.362, 14: 23.685, 15: 24.996, 16: 26.296,
    17: 27.587, 18: 28.869, 19: 30.144,
}


def chi2_label_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of label-distribution homogeneity
    between two deterministic halves of the embeddings table (md5
    split of vec_id) — the drift gate a labeling pipeline runs on
    every new batch: has the class balance moved? One summary row:
    chi2, dof, the alpha=0.05 critical value, and the shift flag.

    The label x split contingency table is ONE map-side-combinable
    aggregation; expected counts come from the 1-row broadcast
    marginals; each cell's (o-e)^2/e term is quantized to an integer
    BEFORE the final sum, so chi2 and its flag are exact
    cross-engine. On the hash-split halves of an unshifted corpus
    the statistic should sit well under the critical value — the
    audit's own sanity check.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    half = (hash_bucket(F.col("vec_id")) < 50).cast("int")
    cells = emb.groupBy(F.col("label")).agg(
        F.sum(half).alias("c1"),
        F.sum(F.lit(1) - half).alias("c2"),
    )
    totals = cells.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.count(F.lit(1)).alias("n_labels"),
    )
    joined = cells.crossJoin(F.broadcast(totals))
    n = (F.col("n1") + F.col("n2")).cast("double")
    row_tot = (F.col("c1") + F.col("c2")).cast("double")
    term = F.lit(0.0)
    for c, m in (("c1", "n1"), ("c2", "n2")):
        e = row_tot * F.col(m).cast("double") / n
        d = F.col(c).cast("double") - e
        term = term + d * d / e
    t_int = F.floor(term * F.lit(float(CHI2_SCALE)) + F.lit(0.5)).cast("long")
    # dof -> critical-value lookup as a 19-element array literal indexed
    # by dof (contiguous from 1), NOT a nested when-chain: the chained
    # CaseWhen tree serializes catastrophically (1.3 GB analyzed-plan
    # JSON at depth 19, breaking the registry plan audit) while the
    # array literal is a single bounded expression
    crit_arr = F.array(*[F.lit(v) for _, v in sorted(_CHI2_CRIT_95.items())])
    dof_col = (F.col("n_labels") - 1).cast("int")
    crit = F.when(
        (dof_col >= 1) & (dof_col <= len(_CHI2_CRIT_95)),
        F.element_at(crit_arr, dof_col),
    ).otherwise(F.lit(0.0))
    return (
        joined.select("n1", "n2", "n_labels", t_int.alias("t_int"))
        .groupBy("n1", "n2", "n_labels")
        .agg(F.sum("t_int").alias("chi2_int"))
        .select(
            "n1",
            "n2",
            (F.col("n_labels") - 1).alias("dof"),
            (F.col("chi2_int") / F.lit(float(CHI2_SCALE))).alias("chi2"),
            crit.alias("crit_95"),
            (
                F.col("chi2_int")
                > F.floor(crit * F.lit(float(CHI2_SCALE)) + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("shifted"),
        )
    )


def _chi2_sql() -> str:
    crit_case = " ".join(
        f"WHEN {dof} THEN {v}" for dof, v in sorted(_CHI2_CRIT_95.items())
    )
    term = " + ".join(
        f"(CAST({c} AS DOUBLE) - (CAST(c1 + c2 AS DOUBLE) * CAST({m} AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)))"
        f" * (CAST({c} AS DOUBLE) - (CAST(c1 + c2 AS DOUBLE) * CAST({m} AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)))"
        f" / (CAST(c1 + c2 AS DOUBLE) * CAST({m} AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
        for c, m in (("c1", "n1"), ("c2", "n2"))
    )
    return f"""
WITH cells AS (
  SELECT label,
         CAST(SUM(CASE WHEN ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 < 50
                  THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 < 50
                  THEN 0 ELSE 1 END) AS BIGINT) AS c2
  FROM embeddings GROUP BY label
), totals AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
         COUNT(*) AS n_labels
  FROM cells
), terms AS (
  SELECT n1, n2, n_labels,
         CAST(floor(({term}) * {CHI2_SCALE} + 0.5) AS BIGINT) AS t_int
  FROM cells, totals
)
SELECT n1, n2, n_labels - 1 AS dof,
       CAST(SUM(t_int) AS BIGINT) / {CHI2_SCALE}.0 AS chi2,
       CAST((CASE n_labels - 1 {crit_case} ELSE 0.0 END) AS DOUBLE) AS crit_95,
       CAST(SUM(t_int) AS BIGINT)
         > CAST(floor(CAST((CASE n_labels - 1 {crit_case} ELSE 0.0 END) AS DOUBLE) * {CHI2_SCALE} + 0.5) AS BIGINT)
         AS shifted
FROM terms
GROUP BY n1, n2, n_labels
"""


CHI2_LABEL_SHIFT_SQL = _chi2_sql()


# ------------------------------------------- WOE / IV feature binning
WOE_BINS = 10
WOE_S1 = 10**6   # quantization of per-bin woe
WOE_S2 = 10**9   # quantization of per-bin IV contributions


def woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value binning of o_totalprice
    against the binary outcome o_orderstatus = 'F' — the classic
    scorecard feature-screening transform (credit-risk lineage, now a
    standard tabular-feature audit): per equal-width bin,
    event/non-event counts and WOE = ln(dist_event/dist_nonevent)
    with 0.5 continuity correction, plus the feature's total IV
    repeated on every row (IV < 0.02 = useless, > 0.5 = suspiciously
    strong — leakage check).

    Equal-WIDTH bins from a 1-row broadcast min/max scalar, NOT
    ntile: decile binning needs a global sort / unpartitioned window,
    the exact thing the registry's scale guard bans; equi-width keeps
    the bin id a pure codegen expression that rides the scan. One
    count aggregation over WOE_BINS rows, a 1-row totals broadcast,
    and a WOE_BINS-row rollup for IV.

    Engine-exactness: counts + 0.5 are exact doubles; each bin's woe
    and IV contribution are quantized to integers BEFORE any
    cross-bin sum (ln is the only non-correctly-rounded op; the
    quantized-term recipe proven by zipf/drift_psi/char_entropy).
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(WOE_BINS))
    bin_col = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(WOE_BINS - 1).cast("long"),
            F.floor((F.col("o_totalprice") - F.col("lo")) / width),
        )
    )
    # CACHED (r14 plan audit): totals + the WOE join read per_bin 2x
    # and binned backs both the IV rollup and the output join —
    # uncached, the expansion scanned orders 8x
    # (plans/r14/woe_iv_binning_before.txt). WOE_BINS rows
    # (guide §2.4).
    per_bin = (
        orders.crossJoin(F.broadcast(bounds))
        .select(bin_col.alias("bin"), "o_orderstatus")
        .groupBy("bin")
        .agg(
            F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("n_event"),
            F.sum((F.col("o_orderstatus") != "F").cast("long")).alias(
                "n_nonevent"
            ),
        )
        .cache()
    )
    totals = per_bin.agg(
        F.sum("n_event").alias("te"), F.sum("n_nonevent").alias("tn")
    )
    j = per_bin.crossJoin(F.broadcast(totals))
    de = (F.col("n_event").cast("double") + F.lit(0.5)) / F.col("te")
    dn = (F.col("n_nonevent").cast("double") + F.lit(0.5)) / F.col("tn")
    woe_int = F.floor(F.log(de / dn) * F.lit(float(WOE_S1)) + F.lit(0.5)).cast(
        "long"
    )
    iv_term_int = F.floor(
        (de - dn) * F.log(de / dn) * F.lit(float(WOE_S2)) + F.lit(0.5)
    ).cast("long")
    binned = j.select(
        "bin",
        "n_event",
        "n_nonevent",
        (woe_int / F.lit(float(WOE_S1))).alias("woe"),
        iv_term_int.alias("iv_term_int"),
    )
    iv = binned.agg(
        (F.sum("iv_term_int") / F.lit(float(WOE_S2))).alias("iv_total")
    )
    return (
        binned.crossJoin(F.broadcast(iv))
        .select("bin", "n_event", "n_nonevent", "woe", "iv_total")
        .orderBy("bin")
    )


WOE_IV_SQL = f"""
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
), per_bin AS (
  SELECT CASE WHEN hi = lo THEN 0
              ELSE LEAST({WOE_BINS - 1},
                         CAST(floor((o_totalprice - lo) / ((hi - lo) / {WOE_BINS})) AS BIGINT))
         END AS bin,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_event,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS n_nonevent
  FROM orders, bounds
  GROUP BY 1
), totals AS (
  SELECT CAST(SUM(n_event) AS BIGINT) AS te,
         CAST(SUM(n_nonevent) AS BIGINT) AS tn
  FROM per_bin
), binned AS (
  SELECT bin, n_event, n_nonevent,
         CAST(floor(ln(((n_event + 0.5) / te) / ((n_nonevent + 0.5) / tn))
                    * {WOE_S1} + 0.5) AS BIGINT) AS woe_int,
         CAST(floor(((n_event + 0.5) / te - (n_nonevent + 0.5) / tn)
                    * ln(((n_event + 0.5) / te) / ((n_nonevent + 0.5) / tn))
                    * {WOE_S2} + 0.5) AS BIGINT) AS iv_term_int
  FROM per_bin, totals
), iv AS (
  SELECT CAST(SUM(iv_term_int) AS BIGINT) / {WOE_S2}.0 AS iv_total FROM binned
)
SELECT bin, n_event, n_nonevent,
       woe_int / {WOE_S1}.0 AS woe,
       iv_total
FROM binned, iv
ORDER BY bin
"""
