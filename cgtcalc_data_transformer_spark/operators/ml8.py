"""Round-8 ML feature-prep: leakage-free (out-of-fold) target
encoding.

Target encoding replaces a categorical with its target mean — the
single most leakage-prone feature transform in tabular ML. The
out-of-fold discipline (encode fold f's rows using only the OTHER
folds' statistics, plus m-estimate smoothing toward the out-of-fold
global prior) is what makes it trainable; this operator materializes
the (category, fold) encoding table a feature store would publish.

Scale shape: ONE count/sum aggregation over the big table into a
|categories| x |folds| grid; everything after is closed-form
arithmetic on that bounded frame. Folds are the deterministic md5
bucket (kfold_assign convention) — append-stable, no RNG.


Reference parity note: the reference (cgtcalc-data-transformer, ~732 LoC broker-CSV ETL) has no analog for this family — these are engine extensions in the SURVEY.md §2.2 sense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket
from cgtcalc_data_transformer_spark.sources.tpch import load_table

TE_FOLDS = 5
TE_SMOOTH_M = 100.0  # m-estimate pseudo-count


def target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding of o_orderpriority against the
    binary target o_orderstatus = 'F' (fulfilled): for each
    (priority, fold), the smoothed target mean computed WITHOUT that
    fold's rows — the encoding fold f's training rows are allowed to
    see.

    encoded(c, f) = (pos_oof + m·prior_f) / (n_oof + m), where
    pos_oof/n_oof exclude fold f within category c and prior_f is the
    out-of-fold global rate. All counts come from one aggregation;
    the 25-cell grid does the rest.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("cat"),
        F.pmod(hash_bucket(F.col("o_orderkey"), 1000), F.lit(TE_FOLDS)).alias(
            "fold"
        ),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    cells = orders.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    per_cat = cells.groupBy("cat").agg(
        F.sum("n").alias("nc"), F.sum("pos").alias("pc")
    )
    per_fold = cells.groupBy("fold").agg(
        F.sum("n").alias("nf"), F.sum("pos").alias("pf")
    )
    tot = cells.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    j = (
        cells.join(F.broadcast(per_cat), "cat")
        .join(F.broadcast(per_fold), "fold")
        .crossJoin(F.broadcast(tot))
    )
    prior = (F.col("pt") - F.col("pf")).cast("double") / (
        F.col("nt") - F.col("nf")
    ).cast("double")
    n_oof = (F.col("nc") - F.col("n")).cast("double")
    pos_oof = (F.col("pc") - F.col("pos")).cast("double")
    enc = (pos_oof + F.lit(TE_SMOOTH_M) * prior) / (
        n_oof + F.lit(TE_SMOOTH_M)
    )
    return j.select(
        F.col("cat").alias("category"),
        "fold",
        F.col("n").alias("n_rows"),
        F.round(enc, 6).alias("encoded"),
        F.round(prior, 6).alias("oof_prior"),
    ).orderBy("category", "fold")


TARGET_ENCODE_SQL = f"""
WITH rows_t AS (
  SELECT o_orderpriority AS cat,
         ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT::BIGINT % 1000 % {TE_FOLDS} AS fold,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), cells AS (
  SELECT cat, fold, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM rows_t GROUP BY 1, 2
), per_cat AS (
  SELECT cat, CAST(SUM(n) AS BIGINT) AS nc, CAST(SUM(pos) AS BIGINT) AS pc
  FROM cells GROUP BY cat
), per_fold AS (
  SELECT fold, CAST(SUM(n) AS BIGINT) AS nf, CAST(SUM(pos) AS BIGINT) AS pf
  FROM cells GROUP BY fold
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS pt FROM cells
)
SELECT cells.cat AS category, cells.fold, n AS n_rows,
       ROUND((CAST(pc - pos AS DOUBLE) + {TE_SMOOTH_M} * (CAST(pt - pf AS DOUBLE) / (nt - nf)))
             / (CAST(nc - n AS DOUBLE) + {TE_SMOOTH_M}), 6) AS encoded,
       ROUND(CAST(pt - pf AS DOUBLE) / (nt - nf), 6) AS oof_prior
FROM cells
JOIN per_cat USING (cat)
JOIN per_fold USING (fold)
CROSS JOIN tot
ORDER BY category, fold
"""
