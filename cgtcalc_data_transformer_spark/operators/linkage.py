"""Blocked fuzzy record linkage (entity resolution) over customers.

The classic dirty-data join: match records whose keys differ by typos.
The scale-correct shape is block → candidate equality join → verify →
best-match window; NEVER an all-pairs edit-distance cross join (at
100 TB that is 10^16 comparisons; with blocking each record meets only
its block, and the verify step is a per-candidate Levenshtein).

The "dirty" side is derived deterministically from customer names
(drop one character, position keyed on the md5 bucket), so the
scenario is reproducible and the DuckDB oracle replays it exactly —
both engines implement the same unit-cost Levenshtein.

Blocking key = the name's last 3 characters (TPC-H names share the
``Customer#`` prefix, so the discriminating suffix digits are the
honest key; corruption hits the middle of the string and preserves
it). Real deployments block on several keys (phonetic, q-gram,
sorted-neighborhood) and union the candidate sets — same plan shape,
more branches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket
from cgtcalc_data_transformer_spark.sources.tpch import load_table

DIRTY_PCT = 30     # bucket < 30 → this customer emits a dirty record
DROP_POS = 10      # 1-based char position removed ("Customer#0XX..." middle)
MAX_EDIT = 2       # verify threshold


def record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link corrupted customer names back to the master list: for each
    dirty record, the best master candidate in its block within
    Levenshtein distance MAX_EDIT (ties broken by master key).

    One equality join on the block key, Levenshtein only on block-
    local candidates, then a per-dirty-record top-1 window over the
    (distance, key) order — all integer/string outputs, engine-exact.
    """
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.filter(hash_bucket(F.col("c_custkey")) < DIRTY_PCT).select(
        F.col("c_custkey").alias("dirty_id"),
        F.concat(
            F.substring(F.col("c_name"), 1, DROP_POS - 1),
            F.substring(F.col("c_name"), DROP_POS + 1, 1000),
        ).alias("dirty_name"),
    )
    master = cust.select(
        F.col("c_custkey").alias("master_id"), F.col("c_name").alias("master_name")
    )
    cands = dirty.withColumn("blk", F.substring(F.col("dirty_name"), -3, 3)).join(
        master.withColumn("blk", F.substring(F.col("master_name"), -3, 3)), "blk"
    )
    scored = cands.select(
        "dirty_id",
        "dirty_name",
        "master_id",
        F.levenshtein("dirty_name", "master_name").alias("distance"),
    ).filter(F.col("distance") <= MAX_EDIT)
    w = Window.partitionBy("dirty_id").orderBy(
        F.asc("distance"), F.asc("master_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("dirty_id", "dirty_name", "master_id", "distance")
        .orderBy("dirty_id")
    )


RECORD_LINKAGE_SQL = f"""
WITH dirty AS (
  SELECT c_custkey AS dirty_id,
         substr(c_name, 1, {DROP_POS - 1}) || substr(c_name, {DROP_POS + 1}) AS dirty_name
  FROM customer
  WHERE ('0x' || substr(md5(c_custkey::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 < {DIRTY_PCT}
), master AS (
  SELECT c_custkey AS master_id, c_name AS master_name FROM customer
), cands AS (
  SELECT d.dirty_id, d.dirty_name, m.master_id,
         levenshtein(d.dirty_name, m.master_name) AS distance
  FROM dirty d
  JOIN master m
    ON substr(d.dirty_name, -3, 3) = substr(m.master_name, -3, 3)
), verified AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY dirty_id
                               ORDER BY distance ASC, master_id ASC) AS rk
  FROM cands WHERE distance <= {MAX_EDIT}
)
SELECT dirty_id, dirty_name, master_id, distance
FROM verified WHERE rk = 1
ORDER BY dirty_id
"""


# ------------------------------------------- sorted-neighborhood blocking
SNM_WINDOW = 4       # compare each record to its w following neighbors
SNM_BUCKET_CHARS = 2  # sort-key prefix defining the range bucket


def linkage_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER classic ER blocking strategy: sort all records by a
    key, compare each record only to its w neighbors in sort order —
    catches matches whose corruption broke the equality block (e.g.
    the suffix key above) but preserved lexicographic locality.

    Distributed form: records range-group by the sort key's 2-char
    prefix, rank within the bucket (partitioned window — never a
    global one), and pair via an equality join on the bucket with a
    rank-distance ≤ w predicate. The sort key is the REVERSED name:
    TPC-H names share the ``Customer#`` prefix, so a forward prefix
    bucket degenerates to one partition (a one-task window at scale);
    reversing leads with the discriminating digits — ~100 buckets —
    and the corruption (mid-string char drop) preserves the suffix,
    so dirty and master stay adjacent in reverse order. Pairs
    straddling a bucket boundary are out of scope by construction —
    documented ε of the distributed SNM; production unions several
    passes with shifted keys (same plan, more branches), exactly as
    the multi-key note on ``record_linkage`` says.

    Audit output keeps it small: per bucket, records, candidate
    pairs, verified matches (Levenshtein ≤ MAX_EDIT on the full
    name), and a digest of matched ids.
    """
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.filter(hash_bucket(F.col("c_custkey")) < DIRTY_PCT).select(
        F.col("c_custkey").alias("rec_id"),
        F.concat(
            F.substring(F.col("c_name"), 1, DROP_POS - 1),
            F.substring(F.col("c_name"), DROP_POS + 1, 1000),
        ).alias("name"),
        F.lit(1).alias("is_dirty"),
    )
    clean = cust.select(
        F.col("c_custkey").alias("rec_id"),
        F.col("c_name").alias("name"),
        F.lit(0).alias("is_dirty"),
    )
    recs = (
        dirty.unionByName(clean)
        .withColumn("sort_key", F.reverse(F.col("name")))
        .withColumn("bucket", F.substring("sort_key", 1, SNM_BUCKET_CHARS))
    )
    w = Window.partitionBy("bucket").orderBy("sort_key", "is_dirty", "rec_id")
    ranked = recs.withColumn("rn", F.row_number().over(w))
    a = ranked.select(
        "bucket",
        F.col("rec_id").alias("a_id"),
        F.col("name").alias("a_name"),
        F.col("is_dirty").alias("a_dirty"),
        F.col("rn").alias("a_rn"),
    )
    b = ranked.select(
        "bucket",
        F.col("rec_id").alias("b_id"),
        F.col("name").alias("b_name"),
        F.col("is_dirty").alias("b_dirty"),
        F.col("rn").alias("b_rn"),
    )
    pairs = a.join(b, "bucket").filter(
        (F.col("b_rn") > F.col("a_rn"))
        & (F.col("b_rn") <= F.col("a_rn") + SNM_WINDOW)
        & (F.col("a_dirty") != F.col("b_dirty"))  # dirty↔master pairs only
    )
    matched = (F.levenshtein("a_name", "b_name") <= MAX_EDIT).cast("long")
    return (
        pairs.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(matched).alias("n_matched"),
            F.sum(
                F.when(matched == 1, F.col("a_id") + F.col("b_id")).otherwise(F.lit(0))
            ).alias("matched_id_digest"),
        )
        .orderBy("bucket")
    )


SNM_SQL = f"""
WITH dirty AS (
  SELECT c_custkey AS rec_id,
         substr(c_name, 1, {DROP_POS - 1}) || substr(c_name, {DROP_POS + 1}) AS name,
         1 AS is_dirty
  FROM customer
  WHERE ('0x' || substr(md5(c_custkey::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 < {DIRTY_PCT}
), clean AS (
  SELECT c_custkey AS rec_id, c_name AS name, 0 AS is_dirty FROM customer
), recs AS (
  SELECT *, reverse(name) AS sort_key,
         substr(reverse(name), 1, {SNM_BUCKET_CHARS}) AS bucket
  FROM (SELECT * FROM dirty UNION ALL SELECT * FROM clean)
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY sort_key, is_dirty, rec_id) AS rn
  FROM recs
), pairs AS (
  SELECT a.bucket, a.rec_id AS a_id, a.name AS a_name,
         b.rec_id AS b_id, b.name AS b_name,
         CASE WHEN levenshtein(a.name, b.name) <= {MAX_EDIT} THEN 1 ELSE 0 END AS m
  FROM ranked a JOIN ranked b
    ON a.bucket = b.bucket
   AND b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW}
   AND a.is_dirty <> b.is_dirty
)
SELECT bucket,
       COUNT(*) AS n_pairs,
       CAST(SUM(m) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN m = 1 THEN a_id + b_id ELSE 0 END) AS BIGINT) AS matched_id_digest
FROM pairs
GROUP BY bucket
ORDER BY bucket
"""


# ------------------------------------------------ survivorship merge
BAL_REFRESH = 5.25  # deterministic "newer balance" delta on the dirty feed


def golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: collapse each linked cluster (master + its
    matched dirty-feed records from ``record_linkage``) into ONE
    golden record under explicit field-level rules — the step after
    entity resolution that every MDM pipeline needs:

    - ``golden_name``    : SOURCE-PRIORITY — trust the master list
      (the dirty feed's name is, by construction, corrupted).
    - ``golden_acctbal`` : RECENCY — the dirty feed is the newer
      extract (its balance is deterministically refreshed by
      ``BAL_REFRESH``), so the freshest non-null value wins.
    - ``golden_segment`` : RECENCY + COMPLETENESS — the dirty feed
      does not carry the segment (NULL), so the rule falls back to
      the freshest source that HAS one.

    Every rule is one ``max(struct(priority, tiebreak_key, value))``
    aggregation — a single groupBy over the cluster rows, no windows,
    no per-field self-joins; DuckDB mirrors with max(struct_pack(...)).
    Priorities embed a distinct record key so rule selection is total
    and engine-deterministic even with multiple dirty matches.
    """
    links = record_linkage(spark, sf_dir).select("dirty_id", "master_id")
    cust = load_table(spark, sf_dir, "customer")
    master_rows = (
        links.select("master_id")
        .distinct()
        .join(cust, F.col("master_id") == F.col("c_custkey"))
        .select(
            "master_id",
            F.col("c_custkey").alias("rec_key"),
            F.lit(1).alias("recency"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    dirty_rows = links.join(cust, F.col("dirty_id") == F.col("c_custkey")).select(
        "master_id",
        F.col("c_custkey").alias("rec_key"),
        F.lit(2).alias("recency"),
        F.concat(
            F.substring(F.col("c_name"), 1, DROP_POS - 1),
            F.substring(F.col("c_name"), DROP_POS + 1, 1000),
        ).alias("name"),
        (F.col("c_acctbal") + F.lit(BAL_REFRESH)).alias("bal"),
        F.lit(None).cast("string").alias("seg"),
    )
    cluster = master_rows.unionByName(dirty_rows)

    def _rule(pri, value):
        return F.max(
            F.struct(
                pri.alias("p"), F.col("rec_key").alias("k"), value.alias("v")
            )
        )["v"]

    return (
        cluster.groupBy("master_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            _rule(F.lit(3) - F.col("recency"), F.col("name")).alias("golden_name"),
            _rule(
                F.when(F.col("bal").isNotNull(), F.col("recency")).otherwise(-1),
                F.col("bal"),
            ).alias("golden_acctbal"),
            _rule(
                F.when(F.col("seg").isNotNull(), F.col("recency")).otherwise(-1),
                F.col("seg"),
            ).alias("golden_segment"),
        )
        .orderBy("master_id")
    )


GOLDEN_RECORD_SQL = f"""
WITH links AS (
  SELECT dirty_id, master_id FROM ({RECORD_LINKAGE_SQL})
), cluster AS (
  SELECT l.master_id, c.c_custkey AS rec_key, 1 AS recency,
         c.c_name AS name, c.c_acctbal AS bal, c.c_mktsegment AS seg
  FROM (SELECT DISTINCT master_id FROM links) l
  JOIN customer c ON c.c_custkey = l.master_id
  UNION ALL
  SELECT l.master_id, c.c_custkey, 2,
         substr(c.c_name, 1, {DROP_POS - 1}) || substr(c.c_name, {DROP_POS + 1}),
         c.c_acctbal + {BAL_REFRESH},
         NULL
  FROM links l JOIN customer c ON c.c_custkey = l.dirty_id
)
SELECT master_id,
       COUNT(*) AS n_records,
       (MAX(struct_pack(p := 3 - recency, k := rec_key, v := name))).v
         AS golden_name,
       (MAX(struct_pack(p := CASE WHEN bal IS NOT NULL THEN recency ELSE -1 END,
                        k := rec_key, v := bal))).v AS golden_acctbal,
       (MAX(struct_pack(p := CASE WHEN seg IS NOT NULL THEN recency ELSE -1 END,
                        k := rec_key, v := seg))).v AS golden_segment
FROM cluster
GROUP BY master_id
ORDER BY master_id
"""
