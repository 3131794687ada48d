"""Streaming-sketch audits: AMS second-moment (F2) estimation and
linear (bitmap) counting, each validated against the exact answer in
the same query.

Both sketches matter at 100 TB because they replace a key-shuffle
with a constant-size state: AMS estimates self-join size (the
optimizer input for skew planning) from 16 counters; linear counting
estimates distinct keys from one bitmap. The audits quantify the
error a planner would eat by trusting them.

Determinism: engine hash() builtins differ between Spark and DuckDB,
so the sketch hashes are explicit modular arithmetic over the key —
((k mod M)·A + B) mod M with M = 2^31 − 1 and literal odd multipliers
— every intermediate fits BIGINT and both engines compute bit-equal
values.


Reference parity note: the reference (cgtcalc-data-transformer, ~732 LoC broker-CSV ETL) has no analog for this family — these are engine extensions in the SURVEY.md §2.2 sense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

_M = 2_147_483_647  # 2^31 − 1 (Mersenne prime)
AMS_K = 16
# literal multipliers/offsets (odd, < 2^31): fixed public constants,
# embedded identically in the SQL twins
AMS_A = [1_000_003 + 2 * i * 999_983 for i in range(AMS_K)]
AMS_B = [7_919 * i + 13 for i in range(AMS_K)]


def _sign(k, i: int):
    """±1 from the parity of the i-th modular hash — pure BIGINT
    arithmetic, identical on both engines (no engine hash builtin)."""
    h = ((k % _M) * F.lit(AMS_A[i]) + F.lit(AMS_B[i])) % _M
    return F.lit(1) - F.lit(2) * (h % 2)


def _sign_sql(k: str, i: int) -> str:
    return f"(1 - 2 * ((({k} % {_M}) * {AMS_A[i]} + {AMS_B[i]}) % {_M} % 2))"


def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) F2 sketch over o_custkey: estimate
    the second frequency moment Σf² (= the self-join size of orders
    on custkey) from 16 ±1-projection counters, and audit it against
    the exact F2 — the 1996 sketch every skew-aware planner
    descends from.

    One groupBy(key) pass computes the per-key frequencies; the 16
    counters are conditional sums over that bounded frame; the
    estimate is the lower median of the 16 squared counters (a
    16-element array sort — constant work). Exact F2 rides along in
    the same aggregation.
    """
    keys = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("f"))
    )
    aggs = [
        F.sum(F.col("f") * _sign(F.col("k"), i)).alias(f"s{i}")
        for i in range(AMS_K)
    ]
    s = keys.agg(
        F.sum(F.col("f") * F.col("f")).alias("f2_exact"),
        F.count(F.lit(1)).alias("n_keys"),
        *aggs,
    )
    ests = F.array_sort(
        F.array(
            *[
                (F.col(f"s{i}").cast("double") * F.col(f"s{i}").cast("double"))
                for i in range(AMS_K)
            ]
        )
    )
    est = ests[AMS_K // 2 - 1]  # lower median of 16
    return s.select(
        "n_keys",
        "f2_exact",
        F.round(est, 6).alias("f2_est"),
        F.round(
            F.abs(est - F.col("f2_exact").cast("double"))
            / F.col("f2_exact").cast("double"),
            6,
        ).alias("rel_err"),
    )


_AMS_SUMS = ",\n         ".join(
    f"CAST(SUM(f * {_sign_sql('k', i)}) AS BIGINT) AS s{i}"
    for i in range(AMS_K)
)
_AMS_LIST = ", ".join(
    f"CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE)" for i in range(AMS_K)
)

AMS_F2_SQL = f"""
WITH keys AS (
  SELECT o_custkey AS k, COUNT(*) AS f FROM orders GROUP BY 1
), s AS (
  SELECT CAST(SUM(f * f) AS BIGINT) AS f2_exact,
         COUNT(*) AS n_keys,
         {_AMS_SUMS}
  FROM keys
), e AS (
  SELECT n_keys, f2_exact,
         list_sort([{_AMS_LIST}])[{AMS_K // 2}] AS est
  FROM s
)
SELECT n_keys, f2_exact,
       ROUND(est, 6) AS f2_est,
       ROUND(ABS(est - CAST(f2_exact AS DOUBLE)) / f2_exact, 6) AS rel_err
FROM e
"""


# caps table: bitmap size by exact-distinct magnitude, load factor
# kept in [1/64, 1/8] so the estimator stays in its accurate regime
# at every sweep scale (the semdedup count-derived-caps convention;
# the SQL twin mirrors the same CASE).
_LC_CAPS = [
    (1 << 10, 1 << 13),
    (1 << 13, 1 << 16),
    (1 << 16, 1 << 19),
    (1 << 19, 1 << 22),
    (1 << 22, 1 << 25),
]
_LC_MAX = 1 << 28
LC_A, LC_B = 1_664_525, 1_013_904_223


def linear_counting_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (bitmap) counting audit over o_custkey: hash every key
    into an m-bucket bitmap, estimate distinct = m·ln(m/empty)
    (Whang et al. 1990), and report the error vs the exact distinct
    count. m is count-derived from a fixed caps table so the load
    factor stays in the estimator's accurate band at every scale
    factor — a fixed m would saturate (empty → 0) past ~10x data,
    which is exactly the failure mode this audit exists to expose.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    exact = orders.agg(F.countDistinct("k").alias("n_exact"))
    m_expr = F.lit(_LC_MAX)
    for bound, m in reversed(_LC_CAPS):
        m_expr = F.when(F.col("n_exact") < bound, F.lit(m)).otherwise(m_expr)
    sized = exact.select("n_exact", m_expr.alias("m"))
    h = ((F.col("k") % _M) * LC_A + LC_B) % _M
    occupied = (
        orders.crossJoin(F.broadcast(sized))
        .select((h % F.col("m")).alias("b"), "m", "n_exact")
        .groupBy("m", "n_exact")
        .agg(F.countDistinct("b").alias("n_occupied"))
    )
    empty = (F.col("m") - F.col("n_occupied")).cast("double")
    est = F.col("m").cast("double") * F.log(
        F.col("m").cast("double") / empty
    )
    return occupied.select(
        "m",
        "n_exact",
        "n_occupied",
        F.round(est, 6).alias("n_est"),
        F.round(
            F.abs(est - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
            6,
        ).alias("rel_err"),
    )


_LC_CASE = "CASE " + " ".join(
    f"WHEN n_exact < {bound} THEN {m}" for bound, m in _LC_CAPS
) + f" ELSE {_LC_MAX} END"

LINEAR_COUNTING_SQL = f"""
WITH exact AS (
  SELECT COUNT(DISTINCT o_custkey) AS n_exact FROM orders
), sized AS (
  SELECT n_exact, {_LC_CASE} AS m FROM exact
), occupied AS (
  SELECT m, n_exact,
         COUNT(DISTINCT ((o_custkey % {_M}) * {LC_A} + {LC_B}) % {_M} % m) AS n_occupied
  FROM orders CROSS JOIN sized
  GROUP BY m, n_exact
)
SELECT m, n_exact, n_occupied,
       ROUND(m * ln(CAST(m AS DOUBLE) / (m - n_occupied)), 6) AS n_est,
       ROUND(ABS(m * ln(CAST(m AS DOUBLE) / (m - n_occupied)) - CAST(n_exact AS DOUBLE))
             / n_exact, 6) AS rel_err
FROM occupied
"""
