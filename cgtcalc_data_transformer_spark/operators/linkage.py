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
