"""Round-8 classical statistical tests over the TPC-H tables.

The round-7 inference family covered rank tests (Mann-Whitney,
Kruskal-Wallis, Mood's median) and regression diagnostics; this
module completes the classical toolbox: parametric location/variance
tests (Welch t, Levene/Brown-Forsythe, Bartlett), normality
(Jarque-Bera), robust shift estimation (Hodges-Lehmann), paired tests
(sign, Wilcoxon signed-rank, Friedman), reliability (Cronbach alpha),
outlier screening (Grubbs), partial correlation, and inter-rater
concordance (Kendall W).

Scale discipline (the repo convention): every statistic reduces to
sufficient statistics via ONE map-side-combinable aggregation over
the big table; all rank machinery runs on the bounded per-VALUE count
grid (l_quantity has <= 50 values, so theta joins cost 50x50
whatever the table size); accumulated sums are exact BIGINT or
DECIMAL(38,6)-summed doubles (order-insensitive on both engines);
transcendentals (ln, sqrt, exp) are single IEEE expressions applied
to bitwise-identical inputs.

Reference parity note: the reference (cgtcalc-data-transformer) has
no statistics surface — these are engine extensions in the
SURVEY.md §2.2 sense, exercising aggregation/join shapes the
reference's row-at-a-time model cannot express.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

Z95 = 1.959964          # two-sided 5% normal critical value
CHI2_CRIT_DF2 = 5.991465
F_CRIT_2_INF = 2.995732  # F(2, inf) upper 5%

# Abramowitz & Stegun 7.1.26 erf constants (repo convention — see
# timeseries.py: identical IEEE closed form on both engines).
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_SQRT2 = math.sqrt(2.0)


def _phi_upper(z):
    """P(Z > z) for z >= 0 via A&S 7.1.26 (|err| < 1.5e-7)."""
    x = z / F.lit(_SQRT2)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    poly = (
        F.lit(_AS_A[0]) * t
        + F.lit(_AS_A[1]) * t * t
        + F.lit(_AS_A[2]) * t * t * t
        + F.lit(_AS_A[3]) * t * t * t * t
        + F.lit(_AS_A[4]) * t * t * t * t * t
    )
    erf = F.lit(1.0) - poly * F.exp(-x * x)
    return (F.lit(1.0) - erf) / F.lit(2.0)


def _phi_upper_sql(z: str) -> str:
    x = f"(({z}) / {_SQRT2!r})"
    t = f"(1.0 / (1.0 + {_AS_P!r} * {x}))"
    poly = (
        f"({_AS_A[0]!r} * {t} + {_AS_A[1]!r} * {t} * {t}"
        f" + {_AS_A[2]!r} * {t} * {t} * {t}"
        f" + {_AS_A[3]!r} * {t} * {t} * {t} * {t}"
        f" + {_AS_A[4]!r} * {t} * {t} * {t} * {t} * {t})"
    )
    return f"((1.0 - (1.0 - {poly} * exp(-{x} * {x}))) / 2.0)"


# ------------------------------------------------------- Welch t-test
def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: does mean l_quantity differ
    between returned ('R') and normal ('N') line items — the
    parametric companion to mannwhitney_u_test, with the
    Welch-Satterthwaite df that makes the test valid when the two
    groups' variances differ.

    One aggregation produces all six sufficient statistics (n, Σx,
    Σx² per group) as exact BIGINTs; t and df are single IEEE
    expressions. The whole test is one map-side-combinable pass —
    the shape that survives 100 TB unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    v = F.col("l_quantity").cast("long")
    r = (F.col("l_returnflag") == "R").cast("long")
    n = (F.col("l_returnflag") == "N").cast("long")
    s = li.agg(
        F.sum(r).alias("n1"),
        F.sum(r * v).alias("s1"),
        F.sum(r * v * v).alias("q1"),
        F.sum(n).alias("n2"),
        F.sum(n * v).alias("s2"),
        F.sum(n * v * v).alias("q2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1
    m2 = F.col("s2").cast("double") / n2
    # var = (Σx² − (Σx)²/n)/(n−1); (Σx)² computed in double — exact
    # BIGINT would overflow past ~sf30, and the double product is the
    # same IEEE operation on both engines.
    v1 = (F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / n1) / (n1 - F.lit(1.0))
    v2 = (F.col("q2").cast("double") - F.col("s2").cast("double") * F.col("s2").cast("double") / n2) / (n2 - F.lit(1.0))
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / F.sqrt(se2)
    df = se2 * se2 / (
        v1 * v1 / (n1 * n1 * (n1 - F.lit(1.0)))
        + v2 * v2 / (n2 * n2 * (n2 - F.lit(1.0)))
    )
    return s.select(
        F.col("n1").alias("n_r"),
        F.col("n2").alias("n_n"),
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("df_welch"),
        (F.abs(t) > F.lit(Z95)).alias("significant"),
    )


WELCH_T_SQL = f"""
WITH s AS (
  SELECT
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s1,
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q1,
    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s2,
    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q2
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
), e AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md,
         (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
         (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2) / (CAST(n2 AS DOUBLE) - 1.0) AS v2
  FROM s
), f AS (
  SELECT n1, n2, md, v1, v2,
         v1 / n1 + v2 / n2 AS se2
  FROM e
)
SELECT n1 AS n_r, n2 AS n_n,
       ROUND(md, 6) AS mean_diff,
       ROUND(md / sqrt(se2), 6) AS t_stat,
       ROUND(se2 * se2 / (v1 * v1 / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1.0))
                          + v2 * v2 / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1.0))), 6) AS df_welch,
       ABS(md / sqrt(se2)) > {Z95} AS significant
FROM f
"""


# ---------------------------------------- Levene test (Brown-Forsythe)
def levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test: are the three
    l_returnflag groups' l_quantity variances homogeneous — the
    gatekeeper test before pooling variances in an ANOVA, in the
    median-centered form that stays valid under skew.

    Group medians come from the per-VALUE rank straddle with the
    FLOORED (n+1)//2 rank (the moods_median_test convention);
    absolute deviations |v − med_g| are exact integers on the
    <= 50-value domain, so the one-way ANOVA F over them runs on
    exact BIGINT sufficient statistics. Two bounded theta joins, one
    full-table aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v"), "l_returnflag"
    )
    vals = li.groupBy("l_returnflag", "v").agg(F.count(F.lit(1)).alias("c"))
    cum = (
        vals.alias("a")
        .join(
            vals.alias("b"),
            (F.col("b.l_returnflag") == F.col("a.l_returnflag"))
            & (F.col("b.v") < F.col("a.v")),
            "left",
        )
        .groupBy(
            F.col("a.l_returnflag").alias("g"),
            F.col("a.v").alias("v"),
            F.col("a.c").alias("c"),
        )
        .agg(F.coalesce(F.sum("b.c"), F.lit(0)).alias("cum"))
    )
    tot = vals.groupBy("l_returnflag").agg(F.sum("c").alias("ng"))
    r = F.floor((F.col("ng") + 1) / 2)
    med = (
        cum.join(
            F.broadcast(tot),
            cum["g"] == tot["l_returnflag"],
        )
        .groupBy("g")
        .agg(
            F.sum(
                F.when(
                    (F.col("cum") < r) & (r <= F.col("cum") + F.col("c")),
                    F.col("v"),
                ).otherwise(F.lit(0))
            ).alias("med")
        )
    )
    z = vals.join(F.broadcast(med), vals["l_returnflag"] == med["g"]).select(
        "g",
        "c",
        F.abs(F.col("v") - F.col("med")).alias("z"),
    )
    suff = z.groupBy("g").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("z")).alias("s"),
        F.sum(F.col("c") * F.col("z") * F.col("z")).alias("q"),
    )
    agg = suff.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum(
            F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n").cast("double")
        ).alias("sg2n"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("nn").cast("double")
    between = (
        F.col("sg2n")
        - F.col("ss").cast("double") * F.col("ss").cast("double") / nd
    ) / (kd - F.lit(1.0))
    within = (F.col("qq").cast("double") - F.col("sg2n")) / (nd - kd)
    fstat = between / within
    return agg.select(
        "k",
        F.col("nn").alias("n"),
        F.round(fstat, 6).alias("f_stat"),
        (fstat > F.lit(F_CRIT_2_INF)).alias("significant"),
    )


LEVENE_SQL = f"""
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, l_returnflag FROM lineitem
), vals AS (
  SELECT l_returnflag AS g, v, COUNT(*) AS c FROM li GROUP BY 1, 2
), cum AS (
  SELECT a.g, a.v, a.c, CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS cum
  FROM vals a LEFT JOIN vals b ON b.g = a.g AND b.v < a.v
  GROUP BY a.g, a.v, a.c
), tot AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS ng FROM vals GROUP BY g
), med AS (
  SELECT cum.g,
         CAST(SUM(CASE WHEN cum < (ng + 1) // 2
                        AND (ng + 1) // 2 <= cum + c
                       THEN v ELSE 0 END) AS BIGINT) AS med
  FROM cum JOIN tot ON tot.g = cum.g
  GROUP BY cum.g
), z AS (
  SELECT vals.g, c, ABS(v - med) AS z
  FROM vals JOIN med ON med.g = vals.g
), suff AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * z) AS BIGINT) AS s,
         CAST(SUM(c * z * z) AS BIGINT) AS q
  FROM z GROUP BY g
), agg AS (
  SELECT COUNT(*) AS k, CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(s) AS BIGINT) AS ss, CAST(SUM(q) AS BIGINT) AS qq,
         SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS sg2n
  FROM suff
)
SELECT k, nn AS n,
       ROUND(((sg2n - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
              / (CAST(k AS DOUBLE) - 1.0))
             / ((CAST(qq AS DOUBLE) - sg2n) / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat,
       ((sg2n - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
        / (CAST(k AS DOUBLE) - 1.0))
       / ((CAST(qq AS DOUBLE) - sg2n) / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
       > {F_CRIT_2_INF} AS significant
FROM agg
"""


# ------------------------------------------------------ Bartlett test
def bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for variance homogeneity across the three
    l_returnflag groups — higher power than Levene under normality,
    the classical pre-ANOVA check.

    Per-group (n, Σx, Σx²) exact BIGINTs from one aggregation; the
    χ² statistic with its small-sample correction C is one closed
    form over three ln() calls on identical-IEEE variance inputs.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v"), "l_returnflag"
    )
    suff = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    nd = F.col("n").cast("double")
    s2 = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - F.lit(1.0))
    agg = suff.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum((nd - F.lit(1.0)) * s2).alias("pooled_num"),
        F.sum((nd - F.lit(1.0)) * F.log(s2)).alias("sum_ln"),
        F.sum(F.lit(1.0) / (nd - F.lit(1.0))).alias("sum_inv"),
    )
    kd = F.col("k").cast("double")
    nmk = F.col("nn").cast("double") - kd
    sp2 = F.col("pooled_num") / nmk
    num = nmk * F.log(sp2) - F.col("sum_ln")
    c = F.lit(1.0) + (F.col("sum_inv") - F.lit(1.0) / nmk) / (
        F.lit(3.0) * (kd - F.lit(1.0))
    )
    chi2 = num / c
    return agg.select(
        "k",
        F.col("nn").alias("n"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(CHI2_CRIT_DF2)).alias("significant"),
    )


BARTLETT_SQL = f"""
WITH suff AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY l_returnflag
), v AS (
  SELECT n, s, q,
         (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
         / (CAST(n AS DOUBLE) - 1.0) AS s2
  FROM suff
), agg AS (
  SELECT COUNT(*) AS k, CAST(SUM(n) AS BIGINT) AS nn,
         SUM((CAST(n AS DOUBLE) - 1.0) * s2) AS pooled_num,
         SUM((CAST(n AS DOUBLE) - 1.0) * ln(s2)) AS sum_ln,
         SUM(1.0 / (CAST(n AS DOUBLE) - 1.0)) AS sum_inv
  FROM v
)
SELECT k, nn AS n,
       ROUND(((CAST(nn AS DOUBLE) - k) * ln(pooled_num / (CAST(nn AS DOUBLE) - k)) - sum_ln)
             / (1.0 + (sum_inv - 1.0 / (CAST(nn AS DOUBLE) - k)) / (3.0 * (CAST(k AS DOUBLE) - 1.0))), 6) AS chi2,
       ((CAST(nn AS DOUBLE) - k) * ln(pooled_num / (CAST(nn AS DOUBLE) - k)) - sum_ln)
       / (1.0 + (sum_inv - 1.0 / (CAST(nn AS DOUBLE) - k)) / (3.0 * (CAST(k AS DOUBLE) - 1.0)))
       > {CHI2_CRIT_DF2} AS significant
FROM agg
"""


# -------------------------------------------------------- Jarque-Bera
def jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on l_quantity: skewness and excess
    kurtosis from exact central moments, JB = n(S²/6 + (K−3)²/24) —
    the screening test that tells a modeling pipeline whether
    Gaussian assumptions are even on the table (on a uniform quantity
    domain the answer is a resounding no: K ≈ 1.8, and the test must
    FLAG it).

    The <= 50-value domain makes the moments exact: per-VALUE counts,
    then Σ c·(v−mean)^k as identically-computed double terms summed
    through DECIMAL(38,6) — 50 terms, order-insensitive, unbounded in
    table size.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v")
    )
    vals = li.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    tot = vals.agg(F.sum("c").alias("n"), F.sum(F.col("c") * F.col("v")).alias("s"))
    j = vals.crossJoin(F.broadcast(tot))
    dv = F.col("v").cast("double") - F.col("s").cast("double") / F.col(
        "n"
    ).cast("double")
    cd = F.col("c").cast("double")
    m = j.groupBy("n").agg(
        F.sum((cd * dv * dv).cast("decimal(38,6)")).alias("m2"),
        F.sum((cd * dv * dv * dv).cast("decimal(38,6)")).alias("m3"),
        F.sum((cd * dv * dv * dv * dv).cast("decimal(38,6)")).alias("m4"),
    )
    nd = F.col("n").cast("double")
    mu2 = F.col("m2").cast("double") / nd
    mu3 = F.col("m3").cast("double") / nd
    mu4 = F.col("m4").cast("double") / nd
    skew = mu3 / F.sqrt(mu2 * mu2 * mu2)
    kurt = mu4 / (mu2 * mu2)
    jb = nd * (
        skew * skew / F.lit(6.0)
        + (kurt - F.lit(3.0)) * (kurt - F.lit(3.0)) / F.lit(24.0)
    )
    return m.select(
        "n",
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis"),
        F.round(jb, 6).alias("jb_stat"),
        (jb > F.lit(CHI2_CRIT_DF2)).alias("non_normal"),
    )


JARQUE_BERA_SQL = f"""
WITH vals AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c FROM lineitem GROUP BY v
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(c * v) AS BIGINT) AS s FROM vals
), m AS (
  SELECT n,
         CAST(SUM(CAST(CAST(c AS DOUBLE) * (v - CAST(s AS DOUBLE) / n) * (v - CAST(s AS DOUBLE) / n) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS m2,
         CAST(SUM(CAST(CAST(c AS DOUBLE) * (v - CAST(s AS DOUBLE) / n) * (v - CAST(s AS DOUBLE) / n) * (v - CAST(s AS DOUBLE) / n) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS m3,
         CAST(SUM(CAST(CAST(c AS DOUBLE) * (v - CAST(s AS DOUBLE) / n) * (v - CAST(s AS DOUBLE) / n) * (v - CAST(s AS DOUBLE) / n) * (v - CAST(s AS DOUBLE) / n) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS m4
  FROM vals CROSS JOIN tot
  GROUP BY n
), e AS (
  SELECT n,
         CAST(m3 AS DOUBLE) / n / sqrt((CAST(m2 AS DOUBLE) / n) * (CAST(m2 AS DOUBLE) / n) * (CAST(m2 AS DOUBLE) / n)) AS skew,
         (CAST(m4 AS DOUBLE) / n) / ((CAST(m2 AS DOUBLE) / n) * (CAST(m2 AS DOUBLE) / n)) AS kurt
  FROM m
)
SELECT n,
       ROUND(skew, 6) AS skewness,
       ROUND(kurt, 6) AS kurtosis,
       ROUND(CAST(n AS DOUBLE) * (skew * skew / 6.0 + (kurt - 3.0) * (kurt - 3.0) / 24.0), 6) AS jb_stat,
       CAST(n AS DOUBLE) * (skew * skew / 6.0 + (kurt - 3.0) * (kurt - 3.0) / 24.0) > {CHI2_CRIT_DF2} AS non_normal
FROM e
"""


# ------------------------------------------- Hodges-Lehmann estimator
def hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann shift estimate between 'R' and 'N' l_quantity:
    the median of all m_A x m_B pairwise differences — the robust
    effect-size companion to mannwhitney_u_test's p-value (the test
    says WHETHER the groups differ; HL says BY HOW MUCH, immune to
    outliers).

    The ~10¹⁸ conceptual pairs never materialize: per-VALUE counts
    give the difference DISTRIBUTION as a 50x50 weighted grid (99
    distinct differences); the weighted lower median comes from the
    doubled-rank straddle 2·cum < T+T%2 <= 2·(cum+w) computed in
    DECIMAL(38,0) (T = m_A·m_B overflows int64 past ~sf60).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v"), "l_returnflag"
    )
    va = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("ca"))
        .select(F.col("v").alias("va_v"), "ca")
    )
    vb = (
        li.filter(F.col("l_returnflag") == "N")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cb"))
        .select(F.col("v").alias("vb_v"), "cb")
    )
    dec = "decimal(19,0)"
    diffs = (
        va.crossJoin(F.broadcast(vb))
        .select(
            (F.col("va_v") - F.col("vb_v")).alias("d"),
            (F.col("ca").cast(dec) * F.col("cb").cast(dec)).alias("w"),
        )
        .groupBy("d")
        .agg(F.sum("w").cast("decimal(38,0)").alias("w"))
    )
    cum = (
        diffs.alias("a")
        .join(diffs.alias("b"), F.col("b.d") < F.col("a.d"), "left")
        .groupBy(F.col("a.d").alias("d"), F.col("a.w").alias("w"))
        .agg(
            F.coalesce(F.sum("b.w"), F.lit(0).cast("decimal(38,0)")).alias(
                "cum"
            )
        )
    )
    tot = li.agg(
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("ma"),
        F.sum((F.col("l_returnflag") == "N").cast("long")).alias("mb"),
    )
    t_total = F.col("ma").cast(dec) * F.col("mb").cast(dec)
    two_r = t_total + (F.col("ma") % 2) * (F.col("mb") % 2)
    hl = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.when(
                    (F.lit(2) * F.col("cum") < two_r)
                    & (two_r <= F.lit(2) * (F.col("cum") + F.col("w"))),
                    F.col("d"),
                ).otherwise(F.lit(0))
            ).alias("hl_shift"),
            F.max("ma").alias("m_a"),
            F.max("mb").alias("m_b"),
        )
    )
    return hl.select("hl_shift", "m_a", "m_b")


HODGES_LEHMANN_SQL = """
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, l_returnflag FROM lineitem
  WHERE l_returnflag IN ('R', 'N')
), va AS (
  SELECT v, COUNT(*) AS ca FROM li WHERE l_returnflag = 'R' GROUP BY v
), vb AS (
  SELECT v, COUNT(*) AS cb FROM li WHERE l_returnflag = 'N' GROUP BY v
), diffs AS (
  SELECT va.v - vb.v AS d,
         CAST(SUM(CAST(ca AS DECIMAL(19,0)) * cb) AS DECIMAL(38,0)) AS w
  FROM va CROSS JOIN vb
  GROUP BY 1
), cum AS (
  SELECT a.d, a.w,
         CAST(COALESCE(SUM(b.w), 0) AS DECIMAL(38,0)) AS cum
  FROM diffs a LEFT JOIN diffs b ON b.d < a.d
  GROUP BY a.d, a.w
), tot AS (
  SELECT CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ma,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS mb
  FROM li
)
SELECT CAST(SUM(CASE WHEN 2 * cum < CAST(ma AS DECIMAL(19,0)) * mb + (ma % 2) * (mb % 2)
                      AND CAST(ma AS DECIMAL(19,0)) * mb + (ma % 2) * (mb % 2) <= 2 * (cum + w)
                     THEN d ELSE 0 END) AS BIGINT) AS hl_shift,
       MAX(ma) AS m_a, MAX(mb) AS m_b
FROM cum CROSS JOIN tot
"""


# ---------------------------------------------------------- sign test
def _order_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, first, last): quantity of the lowest- vs
    highest-l_linenumber line per multi-line order — the natural
    paired sample in TPC-H (did quantities drift within an order?).
    l_linenumber is NOT unique per order in this testdata, so the
    pick is the lexicographic min/max of (linenumber, quantity),
    encoded as the single integer ln·64 + v (valid while v < 64 —
    l_quantity is 1..50): plain integer MIN/MAX aggregates, ~50x
    faster in DuckDB than struct-ordered MIN(struct_pack(...))."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_linenumber").cast("long") * 64
            + F.col("l_quantity").cast("long")
        ).alias("key"),
    )
    return (
        li.groupBy("l_orderkey")
        .agg(
            (F.min("key") % 64).alias("first"),
            (F.max("key") % 64).alias("last"),
            F.count(F.lit(1)).alias("nl"),
        )
        .filter(F.col("nl") >= 2)
    )


_PAIRS_SQL = """
pairs AS MATERIALIZED (
  SELECT l_orderkey,
         MIN(CAST(l_linenumber AS BIGINT) * 64 + CAST(l_quantity AS BIGINT)) % 64 AS "first",
         MAX(CAST(l_linenumber AS BIGINT) * 64 + CAST(l_quantity AS BIGINT)) % 64 AS "last"
  FROM lineitem
  GROUP BY l_orderkey
  HAVING COUNT(*) >= 2
)"""


def sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test: within multi-line orders, is the last line's
    quantity systematically larger than the first's — the
    assumption-free paired location test (only signs, no magnitudes,
    no symmetry requirement).

    One groupBy(l_orderkey) builds the pairs (min_by/max_by on the
    unique linenumber key), one aggregation counts signs; z is exact
    integers through one sqrt.
    """
    pairs = _order_pairs(spark, sf_dir)
    s = pairs.agg(
        F.sum((F.col("last") > F.col("first")).cast("long")).alias("n_pos"),
        F.sum((F.col("last") < F.col("first")).cast("long")).alias("n_neg"),
        F.sum((F.col("last") == F.col("first")).cast("long")).alias("n_tie"),
    )
    nz = (F.col("n_pos") + F.col("n_neg")).cast("double")
    z = (F.col("n_pos") - F.col("n_neg")).cast("double") / F.sqrt(nz)
    return s.select(
        "n_pos",
        "n_neg",
        "n_tie",
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > F.lit(Z95)).alias("significant"),
    )


SIGN_TEST_SQL = f"""
WITH {_PAIRS_SQL}, s AS (
  SELECT
    CAST(SUM(CASE WHEN "last" > "first" THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
    CAST(SUM(CASE WHEN "last" < "first" THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
    CAST(SUM(CASE WHEN "last" = "first" THEN 1 ELSE 0 END) AS BIGINT) AS n_tie
  FROM pairs
)
SELECT n_pos, n_neg, n_tie,
       ROUND(CAST(n_pos - n_neg AS DOUBLE) / sqrt(CAST(n_pos + n_neg AS DOUBLE)), 6) AS z_stat,
       ABS(CAST(n_pos - n_neg AS DOUBLE) / sqrt(CAST(n_pos + n_neg AS DOUBLE))) > {Z95} AS significant
FROM s
"""


# ------------------------------------------- Wilcoxon signed-rank test
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on the within-order (first, last)
    quantity pairs — the magnitude-aware upgrade of sign_test (uses
    ranked |differences|, not just their signs), with tied-rank and
    zero-drop handling.

    |d| lives on a <= 49-value domain, so ranks come from the
    per-VALUE doubled-rank straddle (2r = 2·cum + t + 1); 2W+ is an
    exact BIGINT; the variance's Σ(t³−t) rides the double-term
    DECIMAL(38,6) sum (the mannwhitney recipe) so nothing overflows
    at any scale.
    """
    pairs = _order_pairs(spark, sf_dir).filter(
        F.col("last") != F.col("first")
    )
    d = F.col("last") - F.col("first")
    per = pairs.select(
        F.abs(d).alias("ad"), (d > 0).cast("long").alias("pos")
    ).groupBy("ad").agg(
        F.sum("pos").alias("cpos"), F.count(F.lit(1)).alias("t")
    )
    cum = (
        per.alias("a")
        .join(per.alias("b"), F.col("b.ad") < F.col("a.ad"), "left")
        .groupBy(
            F.col("a.ad").alias("ad"),
            F.col("a.cpos").alias("cpos"),
            F.col("a.t").alias("t"),
        )
        .agg(F.coalesce(F.sum("b.t"), F.lit(0)).alias("cum"))
    )
    td = F.col("t").cast("double")
    # 2W+ ~ n² by nature: per-term products stay far below int64 but
    # the SUM crosses 2^63 around sf200 — sum through DECIMAL(38,0)
    # (each term is an exact BIGINT, so the decimal sum is exact)
    s = cum.agg(
        F.sum("t").alias("n"),
        F.sum(
            (F.col("cpos") * (F.lit(2) * F.col("cum") + F.col("t") + 1))
            .cast("decimal(38,0)")
        ).alias("twowp"),
        F.sum((td * td * td - td).cast("decimal(38,6)")).alias("tsum"),
    )
    nd = F.col("n").cast("double")
    e2 = nd * (nd + F.lit(1.0)) / F.lit(2.0)
    var4 = (
        nd * (nd + F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(1.0)) / F.lit(6.0)
        - F.col("tsum").cast("double") / F.lit(12.0)
    )
    z = (F.col("twowp").cast("double") - e2) / F.sqrt(var4)
    return s.select(
        F.col("n").alias("n_pairs"),
        (F.col("twowp") / F.lit(2.0)).alias("w_plus"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > F.lit(Z95)).alias("significant"),
    )


WILCOXON_SQL = f"""
WITH {_PAIRS_SQL}, per AS (
  SELECT ABS("last" - "first") AS ad,
         CAST(SUM(CASE WHEN "last" > "first" THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
         COUNT(*) AS t
  FROM pairs WHERE "last" <> "first"
  GROUP BY 1
), cum AS (
  SELECT a.ad, a.cpos, a.t, CAST(COALESCE(SUM(b.t), 0) AS BIGINT) AS cum
  FROM per a LEFT JOIN per b ON b.ad < a.ad
  GROUP BY a.ad, a.cpos, a.t
), s AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(CAST(cpos * (2 * cum + t + 1) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS twowp,
         CAST(SUM(CAST(CAST(t AS DOUBLE) * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
                       - CAST(t AS DOUBLE) AS DECIMAL(38,6)))
              AS DECIMAL(38,6)) AS tsum
  FROM cum
)
SELECT n AS n_pairs,
       twowp / 2.0 AS w_plus,
       ROUND((CAST(twowp AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 2.0)
             / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) * (2.0 * CAST(n AS DOUBLE) + 1.0) / 6.0
                    - CAST(tsum AS DOUBLE) / 12.0), 6) AS z_stat,
       ABS((CAST(twowp AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 2.0)
           / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) * (2.0 * CAST(n AS DOUBLE) + 1.0) / 6.0
                  - CAST(tsum AS DOUBLE) / 12.0)) > {Z95} AS significant
FROM s
"""


# ------------------------------------------------------- Friedman test
def _pivot3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocks for repeated-measures tests: per order, the MAX
    quantity at each of linenumbers 1..3 (max = deterministic under
    this testdata's duplicate linenumbers), keeping only orders where
    all three positions exist."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_linenumber") <= 3
    )
    v = F.col("l_quantity").cast("long")
    g = li.groupBy("l_orderkey").agg(
        *[
            F.max(F.when(F.col("l_linenumber") == i, v)).alias(f"q{i}")
            for i in (1, 2, 3)
        ]
    )
    return g.filter(
        F.col("q1").isNotNull()
        & F.col("q2").isNotNull()
        & F.col("q3").isNotNull()
    )


_PIVOT3_SQL = """
blocks AS (
  SELECT l_orderkey,
         MAX(CASE WHEN l_linenumber = 1 THEN CAST(l_quantity AS BIGINT) END) AS q1,
         MAX(CASE WHEN l_linenumber = 2 THEN CAST(l_quantity AS BIGINT) END) AS q2,
         MAX(CASE WHEN l_linenumber = 3 THEN CAST(l_quantity AS BIGINT) END) AS q3
  FROM lineitem WHERE l_linenumber <= 3
  GROUP BY l_orderkey
  HAVING MAX(CASE WHEN l_linenumber = 1 THEN 1 END) IS NOT NULL
     AND MAX(CASE WHEN l_linenumber = 2 THEN 1 END) IS NOT NULL
     AND MAX(CASE WHEN l_linenumber = 3 THEN 1 END) IS NOT NULL
)"""


def _rank2(me, o1, o2):
    """Doubled within-block average rank of `me` among {me,o1,o2}:
    2r = 2·(#less) + (#equal others) + 2 — integer, tie-exact."""
    lt = (o1 < me).cast("long") + (o2 < me).cast("long")
    eq = (o1 == me).cast("long") + (o2 == me).cast("long")
    return F.lit(2) * lt + eq + F.lit(2)


def friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test: across multi-line orders (blocks), do the
    quantities at line positions 1/2/3 (treatments) share a
    distribution — the nonparametric repeated-measures ANOVA, with
    the tie-corrected denominator (Σr² form) so heavy ties can't
    inflate the statistic.

    Within-block ranks of 3 values are pure integer column
    expressions (doubled ranks 2r = 2·lt + eq + 2 — no window, no
    shuffle beyond the one groupBy building the blocks); the χ² is a
    closed form over four exact BIGINT sums.
    """
    b = _pivot3(spark, sf_dir)
    r1 = _rank2(F.col("q1"), F.col("q2"), F.col("q3"))
    r2 = _rank2(F.col("q2"), F.col("q1"), F.col("q3"))
    r3 = _rank2(F.col("q3"), F.col("q1"), F.col("q2"))
    s = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(r1).alias("s1"),
        F.sum(r2).alias("s2"),
        F.sum(r3).alias("s3"),
        F.sum(r1 * r1 + r2 * r2 + r3 * r3).alias("sq4"),
    )
    nd = F.col("n").cast("double")
    k = F.lit(3.0)
    mean2 = nd * (k + F.lit(1.0))  # E[2R_j] = n(k+1)

    def dev(col):
        return (F.col(col).cast("double") - mean2) * (
            F.col(col).cast("double") - mean2
        )

    num = (k - F.lit(1.0)) * (dev("s1") + dev("s2") + dev("s3")) / F.lit(4.0)
    den = F.col("sq4").cast("double") / F.lit(4.0) - nd * k * (
        k + F.lit(1.0)
    ) * (k + F.lit(1.0)) / F.lit(4.0)
    chi2 = num / den
    return s.select(
        F.col("n").alias("n_blocks"),
        F.round(F.col("s1") / F.lit(2.0), 1).alias("rank_sum_1"),
        F.round(F.col("s2") / F.lit(2.0), 1).alias("rank_sum_2"),
        F.round(F.col("s3") / F.lit(2.0), 1).alias("rank_sum_3"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(CHI2_CRIT_DF2)).alias("significant"),
    )


_R2_SQL = {
    "r1": "(2 * ((CASE WHEN q2 < q1 THEN 1 ELSE 0 END) + (CASE WHEN q3 < q1 THEN 1 ELSE 0 END)) + (CASE WHEN q2 = q1 THEN 1 ELSE 0 END) + (CASE WHEN q3 = q1 THEN 1 ELSE 0 END) + 2)",
    "r2": "(2 * ((CASE WHEN q1 < q2 THEN 1 ELSE 0 END) + (CASE WHEN q3 < q2 THEN 1 ELSE 0 END)) + (CASE WHEN q1 = q2 THEN 1 ELSE 0 END) + (CASE WHEN q3 = q2 THEN 1 ELSE 0 END) + 2)",
    "r3": "(2 * ((CASE WHEN q1 < q3 THEN 1 ELSE 0 END) + (CASE WHEN q2 < q3 THEN 1 ELSE 0 END)) + (CASE WHEN q1 = q3 THEN 1 ELSE 0 END) + (CASE WHEN q2 = q3 THEN 1 ELSE 0 END) + 2)",
}

FRIEDMAN_SQL = f"""
WITH {_PIVOT3_SQL}, s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM({_R2_SQL['r1']}) AS BIGINT) AS s1,
         CAST(SUM({_R2_SQL['r2']}) AS BIGINT) AS s2,
         CAST(SUM({_R2_SQL['r3']}) AS BIGINT) AS s3,
         CAST(SUM({_R2_SQL['r1']} * {_R2_SQL['r1']}
                  + {_R2_SQL['r2']} * {_R2_SQL['r2']}
                  + {_R2_SQL['r3']} * {_R2_SQL['r3']}) AS BIGINT) AS sq4
  FROM blocks
), e AS (
  SELECT n, s1, s2, s3,
         2.0 * ((CAST(s1 AS DOUBLE) - 4.0 * n) * (CAST(s1 AS DOUBLE) - 4.0 * n)
                + (CAST(s2 AS DOUBLE) - 4.0 * n) * (CAST(s2 AS DOUBLE) - 4.0 * n)
                + (CAST(s3 AS DOUBLE) - 4.0 * n) * (CAST(s3 AS DOUBLE) - 4.0 * n)) / 4.0 AS num,
         CAST(sq4 AS DOUBLE) / 4.0 - CAST(n AS DOUBLE) * 3.0 * 4.0 * 4.0 / 4.0 AS den
  FROM s
)
SELECT n AS n_blocks,
       ROUND(s1 / 2.0, 1) AS rank_sum_1,
       ROUND(s2 / 2.0, 1) AS rank_sum_2,
       ROUND(s3 / 2.0, 1) AS rank_sum_3,
       ROUND(num / den, 6) AS chi2,
       num / den > {CHI2_CRIT_DF2} AS significant
FROM e
"""


# ------------------------------------------------------ Cronbach alpha
def cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha over the three line-position quantities as
    parallel 'items' per order — the internal-consistency statistic
    every survey/feature-battery pipeline reports (near 0 here:
    TPC-H line quantities are independent, and the statistic must
    say so).

    Item and total variances come from exact BIGINT sums in ONE
    aggregation over the pivoted blocks; alpha is a single closed
    form.
    """
    b = _pivot3(spark, sf_dir)
    tot = F.col("q1") + F.col("q2") + F.col("q3")
    s = b.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col(f"q{i}")).alias(f"s{i}") for i in (1, 2, 3)],
        *[
            F.sum(F.col(f"q{i}") * F.col(f"q{i}")).alias(f"ss{i}")
            for i in (1, 2, 3)
        ],
        F.sum(tot).alias("st"),
        F.sum(tot * tot).alias("sst"),
    )
    nd = F.col("n").cast("double")

    def var(sq, sm):
        return (
            F.col(sq).cast("double")
            - F.col(sm).cast("double") * F.col(sm).cast("double") / nd
        ) / (nd - F.lit(1.0))

    item_var = var("ss1", "s1") + var("ss2", "s2") + var("ss3", "s3")
    tot_var = var("sst", "st")
    alpha = F.lit(1.5) * (F.lit(1.0) - item_var / tot_var)
    return s.select(
        F.col("n").alias("n_blocks"),
        F.round(item_var, 6).alias("sum_item_var"),
        F.round(tot_var, 6).alias("total_var"),
        F.round(alpha, 6).alias("alpha"),
    )


CRONBACH_SQL = f"""
WITH {_PIVOT3_SQL}, s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(q1) AS BIGINT) AS s1, CAST(SUM(q2) AS BIGINT) AS s2,
         CAST(SUM(q3) AS BIGINT) AS s3,
         CAST(SUM(q1 * q1) AS BIGINT) AS ss1,
         CAST(SUM(q2 * q2) AS BIGINT) AS ss2,
         CAST(SUM(q3 * q3) AS BIGINT) AS ss3,
         CAST(SUM(q1 + q2 + q3) AS BIGINT) AS st,
         CAST(SUM((q1 + q2 + q3) * (q1 + q2 + q3)) AS BIGINT) AS sst
  FROM blocks
), v AS (
  SELECT n,
         (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (CAST(n AS DOUBLE) - 1.0)
         + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n) / (CAST(n AS DOUBLE) - 1.0)
         + (CAST(ss3 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / n) / (CAST(n AS DOUBLE) - 1.0) AS item_var,
         (CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n) / (CAST(n AS DOUBLE) - 1.0) AS tot_var
  FROM s
)
SELECT n AS n_blocks,
       ROUND(item_var, 6) AS sum_item_var,
       ROUND(tot_var, 6) AS total_var,
       ROUND(1.5 * (1.0 - item_var / tot_var), 6) AS alpha
FROM v
"""


# ------------------------------------------------- Grubbs max outlier
GRUBBS_SCALE = 10**9


def grubbs_max_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' maximum-studentized-deviation screen on DAILY revenue
    (sum of o_totalprice per o_orderdate): which day deviates most
    from the mean, and does it survive a Bonferroni-corrected normal
    tail test — the one-number answer to "was there a blowout day?".

    Revenue sums ride the exact DECIMAL(28,6) recipe; the per-day
    z-scores are quantized to a 1e-9 grid BEFORE the argmax so the
    (score, day) struct-max is engine-exact; the p-value gate is the
    A&S 7.1.26 closed form. One aggregation + one day-domain pass.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("day")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev"))
    )
    rd = F.col("rev").cast("double")
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("s"),
        F.sum((rd * rd).cast("decimal(38,6)")).alias("q"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double") / nd) / (nd - F.lit(1.0))
    gq = F.floor(
        F.abs(rd - mean) / F.sqrt(var) * F.lit(float(GRUBBS_SCALE)) + F.lit(0.5)
    ).cast("long")
    top = (
        daily.crossJoin(F.broadcast(stats))
        .agg(
            F.max(F.struct(gq.alias("gq"), F.col("day").alias("day"))).alias("m"),
            F.max("n").alias("n_days"),
        )
    )
    g = F.col("m.gq").cast("double") / F.lit(float(GRUBBS_SCALE))
    p_bonf = F.lit(2.0) * F.col("n_days").cast("double") * _phi_upper(g)
    return top.select(
        F.col("m.day").alias("day"),
        # integer div in BOTH engines (the jl_projection/theil_index
        # recipe, ADVICE r8): `/` is double division and the
        # cast-to-long rounds differently across engines
        F.expr("m.gq div 1000").alias("g_micro"),
        F.col("n_days"),
        (p_bonf < F.lit(0.05)).alias("is_outlier"),
    )


GRUBBS_SQL = f"""
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
  FROM orders GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS n, SUM(rev) AS s,
         CAST(SUM(CAST(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS q
  FROM daily
), scored AS (
  SELECT day,
         CAST(floor(ABS(CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / n)
                    / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                           / (CAST(n AS DOUBLE) - 1.0))
                    * {GRUBBS_SCALE}.0 + 0.5) AS BIGINT) AS gq,
         n
  FROM daily CROSS JOIN stats
), top AS (
  SELECT MAX(struct_pack(gq := gq, day := day)) AS m, MAX(n) AS n_days
  FROM scored
)
SELECT struct_extract(m, 'day') AS day,
       struct_extract(m, 'gq') // 1000 AS g_micro,
       n_days,
       2.0 * n_days * {_phi_upper_sql(f"struct_extract(m, 'gq') / {GRUBBS_SCALE}.0")} < 0.05 AS is_outlier
FROM top
"""


# -------------------------------------------------- partial correlation
def partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation r(quantity, extendedprice | discount):
    does the quantity-price relationship survive controlling for the
    discount — the 3-variable causal-screen primitive. On this
    synthetic data price is generated INDEPENDENT of quantity, so the
    correct output is near-zero marginal AND partial r — the screen's
    job is to report that, not to invent structure.

    All nine cross-moments come from ONE aggregation using the q1
    recipe (double products cast DECIMAL(28,6), decimal sums —
    exact for <= 2-decimal inputs); the partial r is a closed form
    over the three pairwise correlations.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("double")
    y = F.col("l_extendedprice").cast("double")
    z = F.col("l_discount").cast("double")

    def dsum(expr, name):
        return F.sum(expr.cast("decimal(28,6)")).alias(name)

    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x, "sx"), dsum(y, "sy"), dsum(z, "sz"),
        dsum(x * x, "sxx"), dsum(y * y, "syy"), dsum(z * z, "szz"),
        dsum(x * y, "sxy"), dsum(x * z, "sxz"), dsum(y * z, "syz"),
    )
    nd = F.col("n").cast("double")

    def r(ab, a, b, aa, bb):
        num = nd * F.col(ab).cast("double") - F.col(a).cast("double") * F.col(b).cast("double")
        da = nd * F.col(aa).cast("double") - F.col(a).cast("double") * F.col(a).cast("double")
        db = nd * F.col(bb).cast("double") - F.col(b).cast("double") * F.col(b).cast("double")
        return num / F.sqrt(da * db)

    rxy = r("sxy", "sx", "sy", "sxx", "syy")
    rxz = r("sxz", "sx", "sz", "sxx", "szz")
    ryz = r("syz", "sy", "sz", "syy", "szz")
    partial = (rxy - rxz * ryz) / F.sqrt(
        (F.lit(1.0) - rxz * rxz) * (F.lit(1.0) - ryz * ryz)
    )
    return s.select(
        "n",
        F.round(rxy, 6).alias("r_xy"),
        F.round(rxz, 6).alias("r_xz"),
        F.round(ryz, 6).alias("r_yz"),
        F.round(partial, 6).alias("r_xy_given_z"),
    )


PARTIAL_CORR_SQL = """
WITH s AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(28,6))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS sy,
         SUM(CAST(l_discount AS DECIMAL(28,6))) AS sz,
         SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) AS DECIMAL(28,6))) AS sxx,
         SUM(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(28,6))) AS syy,
         SUM(CAST(CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE) AS DECIMAL(28,6))) AS szz,
         SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(28,6))) AS sxy,
         SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_discount AS DOUBLE) AS DECIMAL(28,6))) AS sxz,
         SUM(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_discount AS DOUBLE) AS DECIMAL(28,6))) AS syz
  FROM lineitem
), rr AS (
  SELECT n,
         (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
         (n * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
         / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
         (n * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
         / sqrt((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                * (n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz
  FROM s
)
SELECT n,
       ROUND(rxy, 6) AS r_xy,
       ROUND(rxz, 6) AS r_xz,
       ROUND(ryz, 6) AS r_yz,
       ROUND((rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6) AS r_xy_given_z
FROM rr
"""


# ---------------------------------------------- Kendall W concordance
def kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W: do the three
    l_returnflag groups (rankers) agree on the ranking of the seven
    ship-weekdays (objects) by line volume — the inter-rater
    agreement statistic, tie-corrected.

    One count aggregation collapses the table to a 21-cell grid;
    ranks, tie terms, and W are exact-integer arithmetic on that
    bounded frame (doubled ranks, Σ(t³−t) per ranker). Weekday keys
    are pure datediff-mod-7 integers — no timezone, no locale.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (
            F.datediff(
                F.col("l_shipdate"), F.lit("1970-01-01").cast("date")
            )
            % 7
        ).alias("dow"),
    )
    cells = li.groupBy("l_returnflag", "dow").agg(
        F.count(F.lit(1)).alias("c")
    )
    ranked = (
        cells.alias("a")
        .join(
            cells.alias("b"),
            (F.col("b.l_returnflag") == F.col("a.l_returnflag"))
            & (F.col("b.dow") != F.col("a.dow")),
        )
        .groupBy(
            F.col("a.l_returnflag").alias("g"),
            F.col("a.dow").alias("dow"),
        )
        .agg(
            (
                F.lit(2) * F.sum((F.col("b.c") < F.col("a.c")).cast("long"))
                + F.sum((F.col("b.c") == F.col("a.c")).cast("long"))
                + F.lit(2)
            ).alias("r2")
        )
    )
    # k, n and the complete-block check DERIVED from the data
    # (ADVICE r8: the old hardcoded k=3/n=7 constants would go
    # silently wrong if a (returnflag, dow) cell were empty at a
    # tiny scale factor — now a shrunken/ragged grid is visible as
    # complete_block=false and the constants track the actual grid)
    meta = cells.agg(
        F.countDistinct("l_returnflag").alias("k"),
        F.countDistinct("dow").alias("n_obj"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    per_obj = ranked.groupBy("dow").agg(F.sum("r2").alias("r2j"))
    # tie term per ranker: group the n counts by value
    ties = (
        cells.groupBy("l_returnflag", "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tsum")
        )
    )
    # doubled-rank mean per object is k(n+1), an exact integer
    s4 = (
        per_obj.crossJoin(F.broadcast(meta))
        .agg(
            F.sum(
                (F.col("r2j") - F.col("k") * (F.col("n_obj") + 1))
                * (F.col("r2j") - F.col("k") * (F.col("n_obj") + 1))
            ).alias("s4"),
            F.max("k").alias("k"),
            F.max("n_obj").alias("n_obj"),
            F.max("n_cells").alias("n_cells"),
        )
    )
    j = s4.crossJoin(F.broadcast(ties))
    kd = F.col("k").cast("double")
    nd = F.col("n_obj").cast("double")
    # W = 12 S / (k²(n³−n) − k ΣT); S4 = 4S in doubled-rank units
    w = F.lit(3.0) * F.col("s4").cast("double") / (
        kd * kd * (nd * nd * nd - nd) - kd * F.col("tsum").cast("double")
    )
    return j.select(
        F.col("n_obj").alias("n_objects"),
        F.col("k").alias("k_rankers"),
        (F.col("n_cells") == F.col("k") * F.col("n_obj")).alias(
            "complete_block"
        ),
        F.round(w, 6).alias("w"),
        F.round(kd * (nd - F.lit(1.0)) * w, 6).alias("chi2"),
    )


KENDALLS_W_SQL = """
WITH li AS (
  SELECT l_returnflag,
         date_diff('day', DATE '1970-01-01', l_shipdate) % 7 AS dow
  FROM lineitem
), cells AS (
  SELECT l_returnflag, dow, COUNT(*) AS c FROM li GROUP BY 1, 2
), ranked AS (
  SELECT a.l_returnflag AS g, a.dow,
         CAST(2 * SUM(CASE WHEN b.c < a.c THEN 1 ELSE 0 END)
              + SUM(CASE WHEN b.c = a.c THEN 1 ELSE 0 END) + 2 AS BIGINT) AS r2
  FROM cells a JOIN cells b
    ON b.l_returnflag = a.l_returnflag AND b.dow <> a.dow
  GROUP BY a.l_returnflag, a.dow
), meta AS (
  SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS k,
         CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_obj,
         COUNT(*) AS n_cells
  FROM cells
), per_obj AS (
  SELECT dow, CAST(SUM(r2) AS BIGINT) AS r2j FROM ranked GROUP BY dow
), ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tsum
  FROM (SELECT l_returnflag, c, COUNT(*) AS t FROM cells GROUP BY 1, 2)
), s4 AS (
  SELECT CAST(SUM((r2j - k * (n_obj + 1)) * (r2j - k * (n_obj + 1))) AS BIGINT) AS s4,
         MAX(k) AS k, MAX(n_obj) AS n_obj, MAX(n_cells) AS n_cells
  FROM per_obj CROSS JOIN meta
)
SELECT n_obj AS n_objects,
       k AS k_rankers,
       n_cells = k * n_obj AS complete_block,
       ROUND(3.0 * s4 / (CAST(k AS DOUBLE) * k * (CAST(n_obj AS DOUBLE) * n_obj * n_obj - n_obj)
                         - CAST(k AS DOUBLE) * tsum), 6) AS w,
       ROUND(CAST(k AS DOUBLE) * (n_obj - 1.0)
             * (3.0 * s4 / (CAST(k AS DOUBLE) * k * (CAST(n_obj AS DOUBLE) * n_obj * n_obj - n_obj)
                            - CAST(k AS DOUBLE) * tsum)), 6) AS chi2
FROM s4 CROSS JOIN ties
"""


# -------------------------------------------------------- Theil index
THEIL_SCALE = 10**6


def theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil inequality indices over per-customer total spend: T
    (spend-weighted entropy gap) and L (mean log deviation) — the
    decomposable complement to gini_concentration (Theil splits
    exactly into within/between-group terms, which Gini cannot).

    Per-customer totals ride the exact DECIMAL(28,6) sum; each
    customer's (x/μ)ln(x/μ) and ln(μ/x) terms are computed from
    identical-IEEE inputs and quantized to the 1e-6 output grid
    BEFORE the sum (the drift_psi recipe), so the aggregation is
    exact integer arithmetic at any scale.
    """
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("x"))
    )
    tot = spend.agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    j = spend.crossJoin(F.broadcast(tot))
    xr = F.col("x").cast("double") / (
        F.col("s").cast("double") / F.col("n").cast("double")
    )
    # per-entity terms quantize straight to the 1e-6 output grid:
    # |term| is O(10), so micro terms are ~1e7-scale BIGINTs and the
    # sum stays within int64 to beyond sf100000 (a 1e-9 grid + /1000
    # reduction would overflow the sum around sf1000)
    tq = F.floor(xr * F.log(xr) * F.lit(float(THEIL_SCALE)) + F.lit(0.5)).cast("long")
    lq = F.floor(-F.log(xr) * F.lit(float(THEIL_SCALE)) + F.lit(0.5)).cast("long")
    s = j.select(tq.alias("tq"), lq.alias("lq"), "n").groupBy("n").agg(
        F.sum("tq").alias("st"), F.sum("lq").alias("sl")
    )
    # integer `div`, not `/`: double division re-rounds the quantized
    # sums differently across engines at the cast boundary
    return s.select(
        F.col("n").alias("n_entities"),
        F.expr("st div n").alias("theil_t_micro"),
        F.expr("sl div n").alias("theil_l_micro"),
    )


THEIL_SQL = f"""
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS x
  FROM orders GROUP BY o_custkey
), tot AS (
  SELECT SUM(x) AS s, COUNT(*) AS n FROM spend
), terms AS (
  SELECT n,
         CAST(floor((CAST(x AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                    * ln(CAST(x AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                    * {THEIL_SCALE}.0 + 0.5) AS BIGINT) AS tq,
         CAST(floor(-ln(CAST(x AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                    * {THEIL_SCALE}.0 + 0.5) AS BIGINT) AS lq
  FROM spend CROSS JOIN tot
)
SELECT n AS n_entities,
       CAST(SUM(tq) // n AS BIGINT) AS theil_t_micro,
       CAST(SUM(lq) // n AS BIGINT) AS theil_l_micro
FROM terms GROUP BY n
"""


# -------------------------------------------------- Tukey HSD panel
TUKEY_Q_CRIT_3_INF = 3.314493  # studentized range q(0.05, k=3, df=inf)


def tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc panel: all three pairwise l_returnflag mean
    comparisons of l_quantity with the studentized-range critical
    value — the test you run AFTER anova_f_oneway rejects, answering
    WHICH groups differ while holding the family-wise error at 5%.

    One sufficient-statistics aggregation (the welch_t_test shape);
    the three pairwise q statistics are closed forms over the pooled
    MSE on the 3-row group frame joined to itself (9 -> 3 ordered
    pairs — constant work).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v"), "l_returnflag"
    )
    suff = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    pooled = suff.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n").cast("double")
        ).alias("sse"),
    )
    a, b = suff.alias("a"), suff.alias("b")
    pairs = a.join(
        b, F.col("a.l_returnflag") < F.col("b.l_returnflag")
    ).crossJoin(F.broadcast(pooled))
    mse = F.col("sse") / (F.col("nn") - F.col("k")).cast("double")
    ma = F.col("a.s").cast("double") / F.col("a.n").cast("double")
    mb = F.col("b.s").cast("double") / F.col("b.n").cast("double")
    se = F.sqrt(
        mse
        / F.lit(2.0)
        * (
            F.lit(1.0) / F.col("a.n").cast("double")
            + F.lit(1.0) / F.col("b.n").cast("double")
        )
    )
    qstat = F.abs(ma - mb) / se
    return pairs.select(
        F.concat(
            F.col("a.l_returnflag"), F.lit("-"), F.col("b.l_returnflag")
        ).alias("pair"),
        F.round(ma - mb, 6).alias("mean_diff"),
        F.round(qstat, 6).alias("q_stat"),
        (qstat > F.lit(TUKEY_Q_CRIT_3_INF)).alias("significant"),
    ).orderBy("pair")


TUKEY_HSD_SQL = f"""
WITH suff AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY l_returnflag
), pooled AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, COUNT(*) AS k,
         SUM(CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) AS sse
  FROM suff
), pairs AS (
  SELECT a.l_returnflag || '-' || b.l_returnflag AS pair,
         CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n AS md,
         ABS(CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
         / sqrt((sse / (nn - k)) / 2.0 * (1.0 / a.n + 1.0 / b.n)) AS qstat
  FROM suff a JOIN suff b ON a.l_returnflag < b.l_returnflag
  CROSS JOIN pooled
)
SELECT pair, ROUND(md, 6) AS mean_diff, ROUND(qstat, 6) AS q_stat,
       qstat > {TUKEY_Q_CRIT_3_INF} AS significant
FROM pairs ORDER BY pair
"""


# ------------------------------------------- exact two-sample KS test
def ks_test_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov test between the 'R' and
    'N' l_quantity distributions: D = max_v |F_R(v) − F_N(v)| found
    by INTEGER cross-multiplication (|c_R·m_N − c_N·m_R| over the
    50-value cumulative grid — no floating-point sup, no sort), then
    the asymptotic significance gate at α = 0.05.

    The whole test is the per-VALUE count table + one prefix theta
    join; the argmax runs on exact BIGINTs so both engines pick the
    identical D.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    vals = li.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("ca"),
        F.sum((F.col("l_returnflag") == "N").cast("long")).alias("cb"),
    )
    cum = (
        vals.alias("a")
        .join(vals.alias("b"), F.col("b.v") <= F.col("a.v"))
        .groupBy(F.col("a.v").alias("v"))
        .agg(F.sum("b.ca").alias("fa"), F.sum("b.cb").alias("fb"))
    )
    tot = vals.agg(F.sum("ca").alias("ma"), F.sum("cb").alias("mb"))
    j = cum.crossJoin(F.broadcast(tot))
    # |F_R − F_N| scaled by ma·mb: exact integer arithmetic in
    # DECIMAL(38,0) — the BIGINT cross-product fa·mb reaches ~7e18 at
    # sf100 and overflows just past it (the ADVICE-r7 t³ class)
    dec = "decimal(19,0)"
    dnum = F.abs(
        F.col("fa").cast(dec) * F.col("mb").cast(dec)
        - F.col("fb").cast(dec) * F.col("ma").cast(dec)
    ).cast("decimal(38,0)")
    top = j.agg(
        F.max(F.struct(dnum.alias("dnum"), F.col("v").alias("v"))).alias("m"),
        F.max("ma").alias("ma"),
        F.max("mb").alias("mb"),
    )
    mad = F.col("ma").cast("double")
    mbd = F.col("mb").cast("double")
    d = F.col("m.dnum").cast("double") / (mad * mbd)
    ks = d * F.sqrt(mad * mbd / (mad + mbd))
    return top.select(
        F.col("m.v").alias("argmax_v"),
        F.col("ma").alias("m_r"),
        F.col("mb").alias("m_n"),
        F.round(d, 6).alias("d_stat"),
        (ks > F.lit(1.358)).alias("significant"),  # K-S crit, alpha=.05
    )


KS_TEST_SQL = """
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, l_returnflag FROM lineitem
  WHERE l_returnflag IN ('R', 'N')
), vals AS (
  SELECT v,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM li GROUP BY v
), cum AS (
  SELECT a.v, CAST(SUM(b.ca) AS BIGINT) AS fa, CAST(SUM(b.cb) AS BIGINT) AS fb
  FROM vals a JOIN vals b ON b.v <= a.v
  GROUP BY a.v
), tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS ma, CAST(SUM(cb) AS BIGINT) AS mb FROM vals
), top AS (
  SELECT MAX(struct_pack(
           dnum := CAST(ABS(CAST(fa AS DECIMAL(19,0)) * mb
                            - CAST(fb AS DECIMAL(19,0)) * ma) AS DECIMAL(38,0)),
           v := v)) AS m,
         MAX(ma) AS ma, MAX(mb) AS mb
  FROM cum CROSS JOIN tot
)
SELECT struct_extract(m, 'v') AS argmax_v,
       ma AS m_r, mb AS m_n,
       ROUND(CAST(struct_extract(m, 'dnum') AS DOUBLE) / (CAST(ma AS DOUBLE) * mb), 6) AS d_stat,
       CAST(struct_extract(m, 'dnum') AS DOUBLE) / (CAST(ma AS DOUBLE) * mb)
       * sqrt(CAST(ma AS DOUBLE) * mb / (CAST(ma AS DOUBLE) + mb)) > 1.358 AS significant
FROM top
"""


# ------------------------------------------------------- Cochran's Q
def cochran_q_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over k = 3 related binary measurements per order
    (is the quantity at line position j above the domain midpoint?):
    do the three positions share a success rate — the k-sample
    McNemar, the repeated-measures test for binary outcomes.

    Q = k(k−1)·Σ_j(C_j − T/k)² / (k·T − Σ_i R_i²), every term an
    exact BIGINT from ONE aggregation over the pivoted blocks (R_i ∈
    {0..3} so R_i² is a 2-bit table; no windows, no joins).
    """
    b = _pivot3(spark, sf_dir)
    x1 = (F.col("q1") > 25).cast("long")
    x2 = (F.col("q2") > 25).cast("long")
    x3 = (F.col("q3") > 25).cast("long")
    r = x1 + x2 + x3
    s = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("c1"),
        F.sum(x2).alias("c2"),
        F.sum(x3).alias("c3"),
        F.sum(r).alias("t"),
        F.sum(r * r).alias("r2"),
    )
    k = F.lit(3.0)
    td = F.col("t").cast("double")

    def dev(c):
        d = F.col(c).cast("double") - td / k
        return d * d

    q = (
        k
        * (k - F.lit(1.0))
        * (dev("c1") + dev("c2") + dev("c3"))
        / (k * td - F.col("r2").cast("double"))
    )
    return s.select(
        F.col("n").alias("n_blocks"),
        F.col("c1").alias("succ_pos1"),
        F.col("c2").alias("succ_pos2"),
        F.col("c3").alias("succ_pos3"),
        F.round(q, 6).alias("q_stat"),
        (q > F.lit(CHI2_CRIT_DF2)).alias("significant"),
    )


COCHRAN_Q_SQL = f"""
WITH {_PIVOT3_SQL}, s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN q1 > 25 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN q2 > 25 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(SUM(CASE WHEN q3 > 25 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
         CAST(SUM((CASE WHEN q1 > 25 THEN 1 ELSE 0 END)
                  + (CASE WHEN q2 > 25 THEN 1 ELSE 0 END)
                  + (CASE WHEN q3 > 25 THEN 1 ELSE 0 END)) AS BIGINT) AS t,
         CAST(SUM(((CASE WHEN q1 > 25 THEN 1 ELSE 0 END)
                   + (CASE WHEN q2 > 25 THEN 1 ELSE 0 END)
                   + (CASE WHEN q3 > 25 THEN 1 ELSE 0 END))
                  * ((CASE WHEN q1 > 25 THEN 1 ELSE 0 END)
                     + (CASE WHEN q2 > 25 THEN 1 ELSE 0 END)
                     + (CASE WHEN q3 > 25 THEN 1 ELSE 0 END))) AS BIGINT) AS r2
  FROM blocks
)
SELECT n AS n_blocks, c1 AS succ_pos1, c2 AS succ_pos2, c3 AS succ_pos3,
       ROUND(3.0 * 2.0 * ((CAST(c1 AS DOUBLE) - t / 3.0) * (c1 - t / 3.0)
                          + (CAST(c2 AS DOUBLE) - t / 3.0) * (c2 - t / 3.0)
                          + (CAST(c3 AS DOUBLE) - t / 3.0) * (c3 - t / 3.0))
             / (3.0 * t - r2), 6) AS q_stat,
       3.0 * 2.0 * ((CAST(c1 AS DOUBLE) - t / 3.0) * (c1 - t / 3.0)
                    + (CAST(c2 AS DOUBLE) - t / 3.0) * (c2 - t / 3.0)
                    + (CAST(c3 AS DOUBLE) - t / 3.0) * (c3 - t / 3.0))
       / (3.0 * t - r2) > {CHI2_CRIT_DF2} AS significant
FROM s
"""


# ---------------------------------------------------- power analysis
PWR_Z_ALPHA = 1.959964  # two-sided 5%
PWR_Z_BETA = 0.841621   # 80% power


def power_analysis_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed-effect power analysis for the R-vs-N quantity
    comparison: Cohen's d from the pooled variance, then the
    per-group sample size a FUTURE experiment needs to detect that
    effect at α = 5% / 80% power — the planning number an
    experimentation platform reports next to every test result.

    Same sufficient-statistics pass as welch_t_test; n_required =
    2·((z_α + z_β)/d)² is a closed form; the ceiling is an exact
    integer step.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    v = F.col("l_quantity").cast("long")
    r = (F.col("l_returnflag") == "R").cast("long")
    n = (F.col("l_returnflag") == "N").cast("long")
    s = li.agg(
        F.sum(r).alias("n1"),
        F.sum(r * v).alias("s1"),
        F.sum(r * v * v).alias("q1"),
        F.sum(n).alias("n2"),
        F.sum(n * v).alias("s2"),
        F.sum(n * v * v).alias("q2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    ss1 = F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / n1
    ss2 = F.col("q2").cast("double") - F.col("s2").cast("double") * F.col("s2").cast("double") / n2
    sp = F.sqrt((ss1 + ss2) / (n1 + n2 - F.lit(2.0)))
    d = F.abs(
        F.col("s1").cast("double") / n1 - F.col("s2").cast("double") / n2
    ) / sp
    n_req = F.ceil(
        F.lit(2.0)
        * ((F.lit(PWR_Z_ALPHA) + F.lit(PWR_Z_BETA)) / d)
        * ((F.lit(PWR_Z_ALPHA) + F.lit(PWR_Z_BETA)) / d)
    ).cast("long")
    return s.select(
        (F.col("n1") + F.col("n2")).alias("n_observed"),
        F.round(d, 6).alias("cohens_d"),
        n_req.alias("n_required_per_group"),
        ((F.col("n1") >= n_req) & (F.col("n2") >= n_req)).alias(
            "currently_powered"
        ),
    )


POWER_ANALYSIS_SQL = f"""
WITH s AS (
  SELECT
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s1,
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q1,
    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s2,
    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q2
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
), e AS (
  SELECT n1, n2,
         ABS(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
         / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                 + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
                / (CAST(n1 AS DOUBLE) + n2 - 2.0)) AS d
  FROM s
)
SELECT n1 + n2 AS n_observed,
       ROUND(d, 6) AS cohens_d,
       CAST(ceil(2.0 * (({PWR_Z_ALPHA} + {PWR_Z_BETA}) / d) * (({PWR_Z_ALPHA} + {PWR_Z_BETA}) / d)) AS BIGINT) AS n_required_per_group,
       n1 >= ceil(2.0 * (({PWR_Z_ALPHA} + {PWR_Z_BETA}) / d) * (({PWR_Z_ALPHA} + {PWR_Z_BETA}) / d))
       AND n2 >= ceil(2.0 * (({PWR_Z_ALPHA} + {PWR_Z_BETA}) / d) * (({PWR_Z_ALPHA} + {PWR_Z_BETA}) / d)) AS currently_powered
FROM e
"""


# ------------------------------------------------------ Fleiss kappa
def fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over k = 3 raters (line positions 1..3, each
    'rating' the order high/low by whether its quantity exceeds the
    domain midpoint): chance-corrected multi-rater agreement — the
    generalization of Cohen's kappa beyond two raters, and the
    standard quality-audit number for multi-annotator labeling
    pipelines.

    P̄, P̄_e and κ come from two exact BIGINT sums over the pivoted
    blocks (Σr and Σ[r² + (3−r)²]) — one aggregation, closed form.
    """
    b = _pivot3(spark, sf_dir)
    r = (
        (F.col("q1") > 25).cast("long")
        + (F.col("q2") > 25).cast("long")
        + (F.col("q3") > 25).cast("long")
    )
    s = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(r).alias("sr"),
        F.sum(r * r + (F.lit(3) - r) * (F.lit(3) - r)).alias("sq"),
    )
    nd = F.col("n").cast("double")
    k = F.lit(3.0)
    pbar = (F.col("sq").cast("double") - nd * k) / (
        nd * k * (k - F.lit(1.0))
    )
    p1 = F.col("sr").cast("double") / (nd * k)
    pe = p1 * p1 + (F.lit(1.0) - p1) * (F.lit(1.0) - p1)
    kappa = (pbar - pe) / (F.lit(1.0) - pe)
    return s.select(
        F.col("n").alias("n_blocks"),
        F.round(p1, 6).alias("p_high"),
        F.round(pbar, 6).alias("p_bar"),
        F.round(kappa, 6).alias("kappa"),
    )


FLEISS_KAPPA_SQL = f"""
WITH {_PIVOT3_SQL}, s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM((CASE WHEN q1 > 25 THEN 1 ELSE 0 END)
                  + (CASE WHEN q2 > 25 THEN 1 ELSE 0 END)
                  + (CASE WHEN q3 > 25 THEN 1 ELSE 0 END)) AS BIGINT) AS sr,
         CAST(SUM(((CASE WHEN q1 > 25 THEN 1 ELSE 0 END)
                   + (CASE WHEN q2 > 25 THEN 1 ELSE 0 END)
                   + (CASE WHEN q3 > 25 THEN 1 ELSE 0 END))
                  * ((CASE WHEN q1 > 25 THEN 1 ELSE 0 END)
                     + (CASE WHEN q2 > 25 THEN 1 ELSE 0 END)
                     + (CASE WHEN q3 > 25 THEN 1 ELSE 0 END))
                  + (3 - ((CASE WHEN q1 > 25 THEN 1 ELSE 0 END)
                          + (CASE WHEN q2 > 25 THEN 1 ELSE 0 END)
                          + (CASE WHEN q3 > 25 THEN 1 ELSE 0 END)))
                    * (3 - ((CASE WHEN q1 > 25 THEN 1 ELSE 0 END)
                            + (CASE WHEN q2 > 25 THEN 1 ELSE 0 END)
                            + (CASE WHEN q3 > 25 THEN 1 ELSE 0 END)))) AS BIGINT) AS sq
  FROM blocks
), e AS (
  SELECT n,
         CAST(sr AS DOUBLE) / (n * 3.0) AS p1,
         (CAST(sq AS DOUBLE) - n * 3.0) / (n * 3.0 * 2.0) AS pbar
  FROM s
)
SELECT n AS n_blocks,
       ROUND(p1, 6) AS p_high,
       ROUND(pbar, 6) AS p_bar,
       ROUND((pbar - (p1 * p1 + (1.0 - p1) * (1.0 - p1)))
             / (1.0 - (p1 * p1 + (1.0 - p1) * (1.0 - p1))), 6) AS kappa
FROM e
"""


# --------------------------------------------- G-test of independence
def g_test_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Likelihood-ratio G-test of independence for l_returnflag x
    l_linestatus — the χ²'s better-behaved sibling (additive across
    partitions of the table, which Pearson's χ² is not), sharing its
    df-2 critical value.

    G = 2·Σ x·ln x over the contingency cells and margins — one
    count aggregation to the ≤6-cell grid, exact-int inputs into
    identical IEEE ln.
    """
    from cgtcalc_data_transformer_spark.operators.text8 import _xlx

    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("o")
    )
    s = cells.agg(
        F.sum("o").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(_xlx(F.col("o"))).alias("sxo"),
    )
    rows_m = cells.groupBy("l_returnflag").agg(F.sum("o").alias("m"))
    cols_m = cells.groupBy("l_linestatus").agg(F.sum("o").alias("m"))
    sr = rows_m.agg(F.sum(_xlx(F.col("m"))).alias("sxr"))
    sc = cols_m.agg(F.sum(_xlx(F.col("m"))).alias("sxc"))
    j = s.crossJoin(F.broadcast(sr)).crossJoin(F.broadcast(sc))
    g = F.lit(2.0) * (
        F.col("sxo") - F.col("sxr") - F.col("sxc") + _xlx(F.col("n"))
    )
    return j.select(
        F.col("n").alias("n_rows"),
        "n_cells",
        F.round(g, 6).alias("g_stat"),
        (g > F.lit(CHI2_CRIT_DF2)).alias("significant"),
    )


def _xlx_sql(x: str) -> str:
    return f"(CASE WHEN {x} > 0 THEN {x} * ln(CAST({x} AS DOUBLE)) ELSE 0.0 END)"


G_TEST_SQL = f"""
WITH cells AS (
  SELECT l_returnflag, l_linestatus, COUNT(*) AS o
  FROM lineitem GROUP BY 1, 2
), s AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n, COUNT(*) AS n_cells,
         SUM({_xlx_sql('o')}) AS sxo
  FROM cells
), sr AS (
  SELECT SUM({_xlx_sql('m')}) AS sxr
  FROM (SELECT CAST(SUM(o) AS BIGINT) AS m FROM cells GROUP BY l_returnflag)
), sc AS (
  SELECT SUM({_xlx_sql('m')}) AS sxc
  FROM (SELECT CAST(SUM(o) AS BIGINT) AS m FROM cells GROUP BY l_linestatus)
)
SELECT n AS n_rows, n_cells,
       ROUND(2.0 * (sxo - sxr - sxc + {_xlx_sql('n')}), 6) AS g_stat,
       2.0 * (sxo - sxr - sxc + {_xlx_sql('n')}) > {CHI2_CRIT_DF2} AS significant
FROM s CROSS JOIN sr CROSS JOIN sc
"""


# ----------------------------------------- daily-revenue VaR / ES
VAR_PCT = 95


def revenue_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact P{VAR_PCT} value-at-risk and expected shortfall of DAILY
    revenue (the high tail: which days exceed the P95, and how big is
    the average blowout day) — the capacity-planning pair every
    ops dashboard shows, computed EXACTLY without a global sort.

    Daily sums ride the DECIMAL(28,6) recipe; the quantile comes from
    the per-day rank straddle (day-domain-bounded theta join — ~10³
    rows whatever the order volume); ES averages the tail with
    decimal-exact sums.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev"))
    )
    # per-VALUE counts (revenues may tie at low SF): t per value, cum below
    vals = daily.groupBy("rev").agg(F.count(F.lit(1)).alias("t"))
    cum = (
        vals.alias("a")
        .join(vals.alias("b"), F.col("b.rev") < F.col("a.rev"), "left")
        .groupBy(F.col("a.rev").alias("rev"), F.col("a.t").alias("t"))
        .agg(F.coalesce(F.sum("b.t"), F.lit(0)).alias("cum"))
    )
    tot = vals.agg(F.sum("t").alias("n"))
    # ceiling rank r = ceil(0.95 n) via integer arithmetic
    r = F.expr(f"(n * {VAR_PCT} + 99) div 100")
    var_row = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.when(
                (F.col("cum") < r) & (r <= F.col("cum") + F.col("t")),
                F.col("rev"),
            )
        ).alias("var_rev"),
        F.max("n").alias("n_days"),
    )
    tail = daily.crossJoin(F.broadcast(var_row)).filter(
        F.col("rev") >= F.col("var_rev")
    )
    es = tail.agg(
        F.max("var_rev").alias("var_rev"),
        F.max("n_days").alias("n_days"),
        F.count(F.lit(1)).alias("n_tail"),
        F.sum("rev").alias("tail_sum"),
    )
    return es.select(
        "n_days",
        "n_tail",
        F.round(F.col("var_rev").cast("double"), 2).alias("var_p95"),
        F.round(
            F.col("tail_sum").cast("double") / F.col("n_tail").cast("double"),
            6,
        ).alias("es_p95"),
    )


REVENUE_VAR_SQL = f"""
WITH daily AS (
  SELECT o_orderdate, SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
  FROM orders GROUP BY o_orderdate
), vals AS (
  SELECT rev, COUNT(*) AS t FROM daily GROUP BY rev
), cum AS (
  SELECT a.rev, a.t, CAST(COALESCE(SUM(b.t), 0) AS BIGINT) AS cum
  FROM vals a LEFT JOIN vals b ON b.rev < a.rev
  GROUP BY a.rev, a.t
), tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM vals
), var_row AS (
  SELECT MAX(CASE WHEN cum < (n * {VAR_PCT} + 99) // 100
                   AND (n * {VAR_PCT} + 99) // 100 <= cum + t
                  THEN rev END) AS var_rev,
         MAX(n) AS n_days
  FROM cum CROSS JOIN tot
)
SELECT n_days,
       COUNT(*) AS n_tail,
       ROUND(CAST(MAX(var_rev) AS DOUBLE), 2) AS var_p95,
       ROUND(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 6) AS es_p95
FROM daily CROSS JOIN var_row
WHERE rev >= var_rev
GROUP BY n_days
"""


# ------------------------------------------------------- QQ deciles
def qq_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-quantile decile table for 'R' vs 'N' l_quantity: the
    exact d/10-quantile of each group side by side — the
    distribution-shape companion to ks_test_quantity (KS gives one
    sup; the QQ table shows WHERE the CDFs separate).

    Both groups' deciles come from ONE per-value count table and one
    prefix theta join: for each decile the floored rank straddle
    selects the exact order statistic — no sort, no
    percentile_approx nondeterminism, engine-exact integers.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    vals = li.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("ca"),
        F.sum((F.col("l_returnflag") == "N").cast("long")).alias("cb"),
    )
    cum = (
        vals.alias("a")
        .join(vals.alias("b"), F.col("b.v") < F.col("a.v"), "left")
        .groupBy(
            F.col("a.v").alias("v"),
            F.col("a.ca").alias("ca"),
            F.col("a.cb").alias("cb"),
        )
        .agg(
            F.coalesce(F.sum("b.ca"), F.lit(0)).alias("cuma"),
            F.coalesce(F.sum("b.cb"), F.lit(0)).alias("cumb"),
        )
    )
    tot = vals.agg(F.sum("ca").alias("ma"), F.sum("cb").alias("mb"))
    dec = cum.crossJoin(F.broadcast(tot)).select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d")
    )
    ra = F.expr("(ma * d + 9) div 10")  # ceil(d/10 · ma)
    rb = F.expr("(mb * d + 9) div 10")
    out = dec.groupBy("d").agg(
        F.sum(
            F.when(
                (F.col("cuma") < ra) & (ra <= F.col("cuma") + F.col("ca")),
                F.col("v"),
            ).otherwise(0)
        ).alias("q_r"),
        F.sum(
            F.when(
                (F.col("cumb") < rb) & (rb <= F.col("cumb") + F.col("cb")),
                F.col("v"),
            ).otherwise(0)
        ).alias("q_n"),
    )
    return out.select(
        F.col("d").alias("decile"),
        "q_r",
        "q_n",
        (F.col("q_r") - F.col("q_n")).alias("gap"),
    ).orderBy("decile")


QQ_DECILES_SQL = """
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, l_returnflag FROM lineitem
  WHERE l_returnflag IN ('R', 'N')
), vals AS (
  SELECT v,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM li GROUP BY v
), cum AS (
  SELECT a.v, a.ca, a.cb,
         CAST(COALESCE(SUM(b.ca), 0) AS BIGINT) AS cuma,
         CAST(COALESCE(SUM(b.cb), 0) AS BIGINT) AS cumb
  FROM vals a LEFT JOIN vals b ON b.v < a.v
  GROUP BY a.v, a.ca, a.cb
), tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS ma, CAST(SUM(cb) AS BIGINT) AS mb FROM vals
), dec AS (
  SELECT cum.*, ma, mb, UNNEST(generate_series(1, 9)) AS d
  FROM cum CROSS JOIN tot
)
SELECT d AS decile,
       CAST(SUM(CASE WHEN cuma < (ma * d + 9) // 10
                      AND (ma * d + 9) // 10 <= cuma + ca THEN v ELSE 0 END) AS BIGINT) AS q_r,
       CAST(SUM(CASE WHEN cumb < (mb * d + 9) // 10
                      AND (mb * d + 9) // 10 <= cumb + cb THEN v ELSE 0 END) AS BIGINT) AS q_n,
       CAST(SUM(CASE WHEN cuma < (ma * d + 9) // 10
                      AND (ma * d + 9) // 10 <= cuma + ca THEN v ELSE 0 END)
            - SUM(CASE WHEN cumb < (mb * d + 9) // 10
                        AND (mb * d + 9) // 10 <= cumb + cb THEN v ELSE 0 END) AS BIGINT) AS gap
FROM dec
GROUP BY d
ORDER BY decile
"""


# ------------------------------------------------- 2x2 odds ratio CI
def odds_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio with Woolf 95% log-CI for the 2x2 table
    (returnflag R/N) x (linestatus = 'F'): the epidemiology-grade
    association number for two binary columns, with the CI that says
    whether 'no association' (OR = 1) survives.

    One conditional aggregation to four exact BIGINT cells; OR and
    the CI are closed forms over one ln and one sqrt.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    r = (F.col("l_returnflag") == "R").cast("long")
    f = (F.col("l_linestatus") == "F").cast("long")
    s = li.agg(
        F.sum(r * f).alias("a"),
        F.sum(r * (1 - f)).alias("b"),
        F.sum((1 - r) * f).alias("c"),
        F.sum((1 - r) * (1 - f)).alias("d"),
    )
    ad = F.col("a").cast("double")
    bd = F.col("b").cast("double")
    cd = F.col("c").cast("double")
    dd = F.col("d").cast("double")
    orr = ad * dd / (bd * cd)
    se = F.sqrt(
        F.lit(1.0) / ad + F.lit(1.0) / bd + F.lit(1.0) / cd + F.lit(1.0) / dd
    )
    lo = F.exp(F.log(orr) - F.lit(Z95) * se)
    hi = F.exp(F.log(orr) + F.lit(Z95) * se)
    return s.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orr, 6).alias("odds_ratio"),
        F.round(lo, 6).alias("ci_lo"),
        F.round(hi, 6).alias("ci_hi"),
        ((lo > F.lit(1.0)) | (hi < F.lit(1.0))).alias("significant"),
    )


ODDS_RATIO_SQL = f"""
WITH s AS (
  SELECT
    CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_linestatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(SUM(CASE WHEN l_returnflag = 'N' AND l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(SUM(CASE WHEN l_returnflag = 'N' AND l_linestatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
), e AS (
  SELECT a, b, c, d,
         CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c) AS orr,
         sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d) AS se
  FROM s
)
SELECT a, b, c, d,
       ROUND(orr, 6) AS odds_ratio,
       ROUND(exp(ln(orr) - {Z95} * se), 6) AS ci_lo,
       ROUND(exp(ln(orr) + {Z95} * se), 6) AS ci_hi,
       exp(ln(orr) - {Z95} * se) > 1.0 OR exp(ln(orr) + {Z95} * se) < 1.0 AS significant
FROM e
"""
