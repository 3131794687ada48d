"""Round-12 statistics batch: experiment-validity, regression-
diagnostic and heavy-tail operators a production analytics stack
runs next to the tests already here.

- ``ab_srm_check`` — sample-ratio-mismatch χ² on the A/B hash split
  (Fabijan et al. 2019 call SRM "the most useful data-quality check
  in online experimentation"): a biased split invalidates every
  downstream readout BEFORE any effect-size math, so the ratio check
  runs first. Same deterministic md5 arm rule as ``ab_test_ztest``.
- ``white_test_daily`` — White (1980) heteroskedasticity test of the
  per-type daily-count trend residuals: regress the squared
  (mean-normalized) residual on [t, t²]; LM = n·R² ~ χ²(2). The
  companion to durbin_watson/ljung_box that says whether the OLS
  variance (and so every t-stat on the trend) can be trusted.
- ``newey_west_trend`` — trend slope with HAC (Newey-West 1987)
  standard errors at Bartlett lag {NW_LAGS}: daily counts are
  autocorrelated, so the plain OLS t overstates significance; both
  t-stats are reported so the correction is visible.
- ``hill_tail_index`` — Hill (1975) tail-index estimator over the
  top-{HILL_K} order totals: α̂ = k / Σ ln(x_i/x_(k+1)). α ≤ 2 means
  infinite variance — the diagnosis that decides whether mean-based
  revenue monitoring is meaningful at all.

Scale shapes: SRM is one map-side-combinable user rollup; the two
regression tests run entirely on the bounded |types|×|days| grid
(timeseries._daily_grid — day-domain cost, independent of event
volume); Hill is a TakeOrderedAndProject top-(k+1) (no global sort
shuffle) plus a k-row aggregation.

Engine-exactness (repo discipline): counts/moments accumulate as
exact DECIMAL integers; residuals are formed from integer-cleared
numerators (the ACF trick) and divided ONCE in double with an
identical expression tree on both engines; per-term doubles (w²,
x̃·w, ln ratios) are floor-quantized to fixed grids BEFORE any
cross-row sum so no float sum is order-sensitive; the Bartlett
weight collapse derives from NW_LAGS exactly as kpss_stationarity's
does. Residuals are normalized by the series mean (ȳ = Sy/n) before
quantization — R² and both t-stats are invariant under that scaling,
and it keeps every quantized term O(1)-bounded at ANY scale factor
(raw residual⁴ magnitudes would leave DECIMAL(38) near 100 TB).

Reference parity: none — /root/reference is a parse-merge-sort CLI
(index.js:48-130); these extend SURVEY.md §2.2's statistics rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.timeseries import (
    _GRID_SQL,
    _daily_grid,
)
from cgtcalc_data_transformer_spark.sources.tpch import load_events, load_table

MICRO = 10**6
NANO = 10**9
_D38 = "decimal(38,0)"

CHI2_1_CRIT_5PCT = 3.841459  # χ²(1) upper 5% point
CHI2_2_CRIT_5PCT = 5.991465  # χ²(2) upper 5% point
T_CRIT_5PCT = 1.96

NW_LAGS = 4      # Bartlett bandwidth (kpss_stationarity's choice)
HILL_K = 200     # top-k order statistics in the Hill sum


# ------------------------------------------------ sample-ratio mismatch
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² sample-ratio-mismatch check of the 50/50 md5 user split
    (the same arm rule as ab_test_ztest): under H0 the per-user arm
    counts are binomial(n, ½), and χ² = (n1−n2)²/(n1+n2) ~ χ²(1).
    The numerator is an exact DECIMAL integer; one double division.
    One distinct-user rollup, no joins."""
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    users = (
        load_events(spark, sf_dir)
        .select("user_id")
        .distinct()
        .select(F.pmod(hash_bucket(F.col("user_id")), F.lit(2)).alias("arm"))
    )
    flat = users.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n1"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n2"),
    )
    diff = (F.col("n1") - F.col("n2")).cast(_D38)
    chi2 = (diff * diff).cast("double") / (
        F.col("n1") + F.col("n2")
    ).cast("double")
    return flat.select(
        "n1",
        "n2",
        (F.col("n1") - F.col("n2")).alias("delta"),
        F.floor(chi2 * F.lit(float(MICRO)) + F.lit(0.5))
        .cast("long")
        .alias("chi2_micro"),
        (chi2 > F.lit(CHI2_1_CRIT_5PCT)).alias("srm_detected"),
    )


AB_SRM_SQL = f"""
WITH users AS (
  SELECT DISTINCT user_id FROM events
), arms AS (
  SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::UBIGINT::BIGINT
           % 100 % 2 AS arm
  FROM users
), flat AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM arms
)
SELECT n1, n2, n1 - n2 AS delta,
       CAST(floor(CAST(CAST(n1 - n2 AS HUGEINT) * (n1 - n2) AS DOUBLE)
                  / CAST(n1 + n2 AS DOUBLE) * {MICRO} + 0.5) AS BIGINT)
         AS chi2_micro,
       CAST(CAST(n1 - n2 AS HUGEINT) * (n1 - n2) AS DOUBLE)
         / CAST(n1 + n2 AS DOUBLE) > {CHI2_1_CRIT_5PCT} AS srm_detected
FROM flat
"""


# ------------------------------- shared trend-residual helpers (Spark)
def _trend_moments(grid: DataFrame) -> DataFrame:
    """Per-type exact first-stage OLS moments over the day grid:
    n, St, Stt, Sy, Sty plus the slope numerator/denominator
    bn = n·Sty − St·Sy, bd = n·Stt − St² (both exact DECIMAL)."""
    d19 = "decimal(19,0)"
    m = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("d").cast(d19)).alias("st"),
        F.sum(F.col("d").cast(d19) * F.col("d").cast(d19)).alias("stt"),
        F.sum(F.col("y").cast(d19)).alias("sy"),
        F.sum(F.col("d").cast(d19) * F.col("y").cast(d19)).alias("sty"),
    )
    return m.select(
        "event_type",
        "n",
        "st",
        "stt",
        "sy",
        (
            F.col("n").cast(_D38) * F.col("sty").cast(_D38)
            - F.col("st").cast(_D38) * F.col("sy").cast(_D38)
        ).alias("bn"),
        (
            F.col("n").cast(_D38) * F.col("stt").cast(_D38)
            - F.col("st").cast(_D38) * F.col("st").cast(_D38)
        ).alias("bd"),
    )


def _norm_resid(grid: DataFrame, mom: DataFrame):
    """(grid ⋈ moments) rows with w = the mean-normalized OLS
    residual as ONE deterministic double expression over exact
    integer-cleared parts:
    w = (Et / (n·bd)) · (n / Sy),
    Et = bd·(n·y − Sy) − bn·(n·d − St)  (exact DECIMAL)."""
    j = grid.join(F.broadcast(mom), "event_type")
    et = F.col("bd") * (
        F.col("n").cast(_D38) * F.col("y").cast(_D38) - F.col("sy").cast(_D38)
    ) - F.col("bn") * (
        F.col("n").cast(_D38) * F.col("d").cast(_D38) - F.col("st").cast(_D38)
    )
    w = (
        et.cast("double")
        / (F.col("n").cast(_D38) * F.col("bd")).cast("double")
    ) * (F.col("n").cast("double") / F.col("sy").cast("double"))
    return j, w


# The identical SQL spelling of the two helpers above — ONE text used
# by both regression-diagnostic oracles so they cannot drift.
_TREND_SQL = f"""
mom AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(d AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS st,
         CAST(SUM(CAST(d AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS stt,
         CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(d AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sty
  FROM grid GROUP BY event_type
), mom2 AS (
  SELECT *,
         CAST(n * sty - st * sy AS DECIMAL(38,0)) AS bn,
         CAST(n * stt - st * st AS DECIMAL(38,0)) AS bd
  FROM mom
), resid AS (
  SELECT g.event_type, g.d, m.n, m.st, m.stt, m.sy, m.bn, m.bd,
         (CAST(m.bd * (m.n * CAST(g.y AS DECIMAL(38,0)) - m.sy)
               - m.bn * (m.n * CAST(g.d AS DECIMAL(38,0)) - m.st)
               AS DOUBLE)
          / CAST(CAST(m.n AS DECIMAL(38,0)) * m.bd AS DOUBLE))
         * (CAST(m.n AS DOUBLE) / CAST(m.sy AS DOUBLE)) AS w
  FROM grid g JOIN mom2 m ON g.event_type = m.event_type
)"""


# ------------------------------------------------ White (1980) LM test
def white_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """White heteroskedasticity LM test per event type: regress
    z = ⌊w²·10⁶+½⌋ (w the mean-normalized trend residual) on
    [1, t, t²]; LM = n·R² ~ χ²(2) under homoskedasticity. The
    auxiliary regression solves its 3×3 normal equations by Cramer
    determinants in double over exact DECIMAL moments (the
    granger_causality recipe); z is integer-quantized before every
    sum so nothing is order-sensitive."""
    grid = _daily_grid(spark, sf_dir)
    mom = _trend_moments(grid)
    j, w = _norm_resid(grid, mom)
    z = F.floor(w * w * F.lit(float(MICRO)) + F.lit(0.5)).cast(_D38)
    d19 = "decimal(19,0)"
    s = j.select(
        "event_type", "n", "st", "stt", F.col("d").alias("t"), z.alias("z")
    ).groupBy("event_type", "n", "st", "stt").agg(
        F.sum(F.col("t").cast(d19) * F.col("t").cast(d19) * F.col("t").cast(d19)).alias("st3"),
        F.sum(
            (F.col("t").cast(d19) * F.col("t").cast(d19)).cast(_D38)
            * (F.col("t").cast(d19) * F.col("t").cast(d19)).cast(_D38)
        ).alias("st4"),
        F.sum(F.col("z")).alias("sz"),
        F.sum(F.col("z") * F.col("t").cast(_D38)).alias("szt"),
        F.sum(
            F.col("z") * (F.col("t").cast(d19) * F.col("t").cast(d19)).cast(_D38)
        ).alias("sztt"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    # Cramer solve of M·β = r, M = [[n,St,Stt],[St,Stt,St3],[Stt,St3,St4]]
    nd = F.col("n").cast("double")
    a11, a12, a13 = nd, F.col("st").cast("double"), F.col("stt").cast("double")
    a22, a23 = F.col("stt").cast("double"), F.col("st3").cast("double")
    a33 = F.col("st4").cast("double")
    r1 = F.col("sz").cast("double")
    r2 = F.col("szt").cast("double")
    r3 = F.col("sztt").cast("double")
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    b0 = (
        r1 * (a22 * a33 - a23 * a23)
        - a12 * (r2 * a33 - a23 * r3)
        + a13 * (r2 * a23 - a22 * r3)
    ) / det
    b1 = (
        a11 * (r2 * a33 - a23 * r3)
        - r1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * r3 - r2 * a13)
    ) / det
    b2 = (
        a11 * (a22 * r3 - r2 * a23)
        - a12 * (a12 * r3 - r2 * a13)
        + r1 * (a12 * a23 - a22 * a13)
    ) / det
    sse = F.col("szz").cast("double") - (b0 * r1 + b1 * r2 + b2 * r3)
    sst = F.col("szz").cast("double") - r1 * r1 / nd
    r2c = F.when(sst > F.lit(0.0), F.lit(1.0) - sse / sst).otherwise(
        F.lit(0.0)
    )
    lm = nd * r2c
    mic = F.lit(float(MICRO))
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.floor(r2c * mic + F.lit(0.5)).cast("long").alias("r2_micro"),
        F.floor(lm * mic + F.lit(0.5)).cast("long").alias("lm_micro"),
        (lm > F.lit(CHI2_2_CRIT_5PCT)).alias("heteroskedastic"),
    ).orderBy("event_type")


WHITE_TEST_SQL = f"""
WITH {_GRID_SQL}, {_TREND_SQL}, zrows AS (
  SELECT event_type, n, st, stt, d AS t,
         CAST(floor(w * w * {MICRO} + 0.5) AS DECIMAL(38,0)) AS z
  FROM resid
), s AS (
  SELECT event_type, n, st, stt,
         CAST(SUM(CAST(t AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))
                  * CAST(t AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS st3,
         CAST(SUM(CAST(CAST(t AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))
                       AS DECIMAL(38,0))
                  * CAST(CAST(t AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))
                         AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS st4,
         CAST(SUM(z) AS DECIMAL(38,0)) AS sz,
         CAST(SUM(z * CAST(t AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS szt,
         CAST(SUM(z * CAST(CAST(t AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))
                           AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sztt,
         CAST(SUM(z * z) AS DECIMAL(38,0)) AS szz
  FROM zrows GROUP BY event_type, n, st, stt
), solved AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) AS a11, CAST(st AS DOUBLE) AS a12,
         CAST(stt AS DOUBLE) AS a13, CAST(stt AS DOUBLE) AS a22,
         CAST(st3 AS DOUBLE) AS a23, CAST(st4 AS DOUBLE) AS a33,
         CAST(sz AS DOUBLE) AS r1, CAST(szt AS DOUBLE) AS r2,
         CAST(sztt AS DOUBLE) AS r3, CAST(szz AS DOUBLE) AS szz
  FROM s
), stats AS (
  SELECT event_type, n, szz, r1,
         (r1 * (a22 * a33 - a23 * a23)
          - a12 * (r2 * a33 - a23 * r3)
          + a13 * (r2 * a23 - a22 * r3))
         / (a11 * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS b0,
         (a11 * (r2 * a33 - a23 * r3)
          - r1 * (a12 * a33 - a23 * a13)
          + a13 * (a12 * r3 - r2 * a13))
         / (a11 * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS b1,
         (a11 * (a22 * r3 - r2 * a23)
          - a12 * (a12 * r3 - r2 * a13)
          + r1 * (a12 * a23 - a22 * a13))
         / (a11 * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS b2,
         r2 AS rr2, r3 AS rr3
  FROM solved
), fin AS (
  SELECT event_type, n,
         CASE WHEN szz - r1 * r1 / CAST(n AS DOUBLE) > 0.0
              THEN 1.0 - (szz - (b0 * r1 + b1 * rr2 + b2 * rr3))
                         / (szz - r1 * r1 / CAST(n AS DOUBLE))
              ELSE 0.0 END AS r2c
  FROM stats
)
SELECT event_type, n AS n_days,
       CAST(floor(r2c * {MICRO} + 0.5) AS BIGINT) AS r2_micro,
       CAST(floor(CAST(n AS DOUBLE) * r2c * {MICRO} + 0.5) AS BIGINT)
         AS lm_micro,
       CAST(n AS DOUBLE) * r2c > {CHI2_2_CRIT_5PCT} AS heteroskedastic
FROM fin ORDER BY event_type
"""


# --------------------------------------- Newey-West HAC trend t-stat
def newey_west_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-count trend slope with both the plain OLS t and
    the HAC (Newey-West, Bartlett lag {NW_LAGS}) t: v_t = x̃_t·w_t
    quantized to 1e-6 integers, autocovariances Γ_j from exact
    DECIMAL lag-join sums, and the Bartlett collapse
    W = (L+1)Γ₀ + 2Σ(L+1−j)Γ_j derived from NW_LAGS (the
    kpss_stationarity discipline). t_nw = b·Σx̃² / √(W/(L+1)/10¹²)
    with b and w on the mean-normalized scale (t is scale-invariant)."""
    grid = _daily_grid(spark, sf_dir)
    mom = _trend_moments(grid)
    j, w = _norm_resid(grid, mom)
    xc = (
        F.col("n").cast(_D38) * F.col("d").cast(_D38) - F.col("st").cast(_D38)
    ).cast("double") / F.col("n").cast("double")
    v = j.select(
        "event_type",
        "n",
        "sy",
        "bn",
        "bd",
        F.col("d").alias("t"),
        F.floor(xc * w * F.lit(float(MICRO)) + F.lit(0.5))
        .cast(_D38)
        .alias("vq"),
        F.floor(w * w * F.lit(float(MICRO)) + F.lit(0.5))
        .cast(_D38)
        .alias("wq"),
    # CACHED (r14 plan audit): g0 references v once and every one of
    # the NW_LAGS lag joins references it twice — uncached the plan
    # re-ran the daily-grid/moment lineage ~2L+1 times (199 exchanges,
    # plans/r14/newey_west_trend_before.txt). The frame is
    # (event_type x days)-sized (guide §2.4).
    ).cache()
    g0 = v.groupBy("event_type", "n", "sy", "bn", "bd").agg(
        F.sum(F.col("vq") * F.col("vq")).alias("g0"),
        F.sum("wq").alias("sw2"),
    )
    lags = None
    for k in range(1, NW_LAGS + 1):
        gk = (
            v.alias("a")
            .join(
                v.select(
                    F.col("event_type").alias("et"),
                    (F.col("t") + k).alias("tk"),
                    F.col("vq").alias("vk"),
                ),
                (F.col("a.event_type") == F.col("et"))
                & (F.col("a.t") == F.col("tk")),
            )
            .groupBy(F.col("a.event_type").alias("et2"))
            .agg(F.sum(F.col("a.vq") * F.col("vk")).alias(f"g{k}"))
        )
        gk = gk.withColumnRenamed("et2", "et_")
        lags = gk if lags is None else lags.join(gk, "et_")
    s = g0.join(F.broadcast(lags), F.col("event_type") == F.col("et_"))
    _l1 = NW_LAGS + 1
    wsum = F.lit(_l1 - 1).cast(_D38) * F.col("g1")
    for k in range(2, NW_LAGS + 1):
        wsum = wsum + F.lit(_l1 - k).cast(_D38) * F.col(f"g{k}")
    bigw = F.lit(_l1).cast(_D38) * F.col("g0") + F.lit(2).cast(_D38) * wsum
    # HAC long-run variance of Σx̃v terms, de-quantized (vq = 1e6·v)
    s_nw = bigw.cast("double") / F.lit(float(_l1)) / F.lit(1.0e12)
    sxxc = F.col("bd").cast("double") / F.col("n").cast("double")
    b_norm = (
        F.col("bn").cast("double") / F.col("bd").cast("double")
    ) * (F.col("n").cast("double") / F.col("sy").cast("double"))
    sig2 = F.col("sw2").cast("double") / F.lit(float(MICRO)) / (
        F.col("n").cast("double") - F.lit(2.0)
    )
    t_ols = F.when(
        sig2 > F.lit(0.0), b_norm / F.sqrt(sig2 / sxxc)
    ).otherwise(F.lit(0.0))
    t_nw = F.when(
        s_nw > F.lit(0.0), b_norm * sxxc / F.sqrt(s_nw)
    ).otherwise(F.lit(0.0))
    mic = F.lit(float(MICRO))
    slope = F.col("bn").cast("double") / F.col("bd").cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.floor(slope * F.lit(float(NANO)) + F.lit(0.5))
        .cast("long")
        .alias("slope_nano"),
        F.floor(t_ols * mic + F.lit(0.5)).cast("long").alias("t_ols_micro"),
        F.floor(t_nw * mic + F.lit(0.5)).cast("long").alias("t_nw_micro"),
        (F.abs(t_nw) > F.lit(T_CRIT_5PCT)).alias("trend_significant"),
    ).orderBy("event_type")


def _nw_sql() -> str:
    _l1 = NW_LAGS + 1
    lag_ctes = "".join(
        f""", lag{k} AS (
  SELECT a.event_type, CAST(SUM(a.vq * b.vq) AS DECIMAL(38,0)) AS g{k}
  FROM vrows a JOIN vrows b
    ON a.event_type = b.event_type AND a.t = b.t + {k}
  GROUP BY a.event_type
)"""
        for k in range(1, NW_LAGS + 1)
    )
    lag_joins = "".join(
        f"  JOIN lag{k} ON lag{k}.event_type = g.event_type\n"
        for k in range(1, NW_LAGS + 1)
    )
    den = f"{_l1} * g0 + 2 * (" + " + ".join(
        f"{_l1 - k} * g{k}" for k in range(1, NW_LAGS + 1)
    ) + ")"
    return f"""
WITH {_GRID_SQL}, {_TREND_SQL}, vrows AS (
  SELECT event_type, n, sy, bn, bd, d AS t,
         CAST(floor((CAST(n * CAST(d AS DECIMAL(38,0)) - st AS DOUBLE)
                     / CAST(n AS DOUBLE)) * w * {MICRO} + 0.5)
              AS DECIMAL(38,0)) AS vq,
         CAST(floor(w * w * {MICRO} + 0.5) AS DECIMAL(38,0)) AS wq
  FROM resid
), base AS (
  SELECT event_type, ANY_VALUE(n) AS n, ANY_VALUE(sy) AS sy,
         ANY_VALUE(bn) AS bn, ANY_VALUE(bd) AS bd,
         CAST(SUM(vq * vq) AS DECIMAL(38,0)) AS g0,
         CAST(SUM(wq) AS DECIMAL(38,0)) AS sw2
  FROM vrows GROUP BY event_type
){lag_ctes}, s AS (
  SELECT g.event_type, g.n, g.sy, g.bn, g.bd, g.g0, g.sw2,
         {", ".join(f"lag{k}.g{k}" for k in range(1, NW_LAGS + 1))}
  FROM base g
{lag_joins}), fin AS (
  SELECT event_type, n, bn, bd,
         CAST({den} AS DOUBLE) / {_l1}.0 / 1.0e12 AS s_nw,
         CAST(bd AS DOUBLE) / CAST(n AS DOUBLE) AS sxxc,
         (CAST(bn AS DOUBLE) / CAST(bd AS DOUBLE))
           * (CAST(n AS DOUBLE) / CAST(sy AS DOUBLE)) AS b_norm,
         CAST(sw2 AS DOUBLE) / {MICRO} / (CAST(n AS DOUBLE) - 2.0) AS sig2
  FROM s
)
SELECT event_type, n AS n_days,
       CAST(floor(CAST(bn AS DOUBLE) / CAST(bd AS DOUBLE) * {NANO} + 0.5)
            AS BIGINT) AS slope_nano,
       CAST(floor(CASE WHEN sig2 > 0.0
                       THEN b_norm / sqrt(sig2 / sxxc) ELSE 0.0 END
                  * {MICRO} + 0.5) AS BIGINT) AS t_ols_micro,
       CAST(floor(CASE WHEN s_nw > 0.0
                       THEN b_norm * sxxc / sqrt(s_nw) ELSE 0.0 END
                  * {MICRO} + 0.5) AS BIGINT) AS t_nw_micro,
       abs(CASE WHEN s_nw > 0.0
                THEN b_norm * sxxc / sqrt(s_nw) ELSE 0.0 END)
         > {T_CRIT_5PCT} AS trend_significant
FROM fin ORDER BY event_type
"""


NEWEY_WEST_SQL = _nw_sql()


# ---------------------------------------------------- Hill tail index
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the order-total upper tail:
    α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)) over the top-(k+1) order
    totals (deterministic tiebreak by orderkey). The frame is a
    TakeOrderedAndProject — no global sort shuffle, no window: the
    (k+1)-th order statistic is just MIN(price) of the k+1-row frame,
    and its own ln term is exactly 0, so the sum runs over all k+1
    rows. ln terms are floor-quantized to 1e-9 integers before the
    sum (the atkinson_index recipe). 95% CI from α̂·(1 ± 1.96/√k)."""
    top = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_totalprice").cast("decimal(15,2)").alias("x"),
            "o_orderkey",
        )
        .orderBy(F.desc("x"), F.asc("o_orderkey"))
        .limit(HILL_K + 1)
        # shared lineage: both the xmin aggregate and the terms join
        # consume this (k+1)-row frame — cache it so the orders
        # TakeOrdered scan executes once per run, not twice (ADVICE
        # r12; the bounded-frame persist discipline of the r12 union
        # audit). 201 rows — trivially bounded.
        .cache()
    )
    xmin = top.agg(F.min("x").alias("xmin"))
    terms = top.crossJoin(F.broadcast(xmin)).select(
        F.floor(
            F.log(F.col("x").cast("double") / F.col("xmin").cast("double"))
            * F.lit(float(NANO))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lq"),
        "xmin",
    )
    s = terms.groupBy("xmin").agg(F.sum("lq").alias("slq"))
    alpha = F.lit(float(HILL_K)) * F.lit(float(NANO)) / F.col(
        "slq"
    ).cast("double")
    half = F.lit(T_CRIT_5PCT) / F.sqrt(F.lit(float(HILL_K)))
    mic = F.lit(float(MICRO))
    return s.select(
        F.lit(HILL_K).alias("k"),
        (F.col("xmin").cast("decimal(19,2)") * 100)
        .cast("long")
        .alias("xmin_cents"),
        F.floor(alpha * mic + F.lit(0.5)).cast("long").alias("alpha_micro"),
        F.floor(alpha * (F.lit(1.0) - half) * mic + F.lit(0.5))
        .cast("long")
        .alias("alpha_lo_micro"),
        F.floor(alpha * (F.lit(1.0) + half) * mic + F.lit(0.5))
        .cast("long")
        .alias("alpha_hi_micro"),
    )


HILL_TAIL_SQL = f"""
WITH top AS (
  SELECT CAST(o_totalprice AS DECIMAL(15,2)) AS x, o_orderkey
  FROM orders
  ORDER BY x DESC, o_orderkey ASC
  LIMIT {HILL_K + 1}
), xm AS (
  SELECT MIN(x) AS xmin FROM top
), terms AS (
  SELECT CAST(floor(ln(CAST(x AS DOUBLE) / CAST(xmin AS DOUBLE))
                    * {NANO} + 0.5) AS BIGINT) AS lq,
         xmin
  FROM top CROSS JOIN xm
), s AS (
  SELECT xmin, CAST(SUM(lq) AS BIGINT) AS slq FROM terms GROUP BY xmin
)
SELECT {HILL_K} AS k,
       CAST(CAST(xmin AS DECIMAL(19,2)) * 100 AS BIGINT) AS xmin_cents,
       CAST(floor({HILL_K}.0 * {NANO} / CAST(slq AS DOUBLE) * {MICRO} + 0.5)
            AS BIGINT) AS alpha_micro,
       CAST(floor({HILL_K}.0 * {NANO} / CAST(slq AS DOUBLE)
                  * (1.0 - {T_CRIT_5PCT} / sqrt({HILL_K}.0))
                  * {MICRO} + 0.5) AS BIGINT) AS alpha_lo_micro,
       CAST(floor({HILL_K}.0 * {NANO} / CAST(slq AS DOUBLE)
                  * (1.0 + {T_CRIT_5PCT} / sqrt({HILL_K}.0))
                  * {MICRO} + 0.5) AS BIGINT) AS alpha_hi_micro
FROM s
"""


# --------------------------------- Mondrian split-conformal intervals
CONF_ALPHA_PCT = 10      # 90% target coverage
CONF_BINS = 1024         # selection-pass resolution (exact_median's)


def mondrian_conformal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-conditional (Mondrian) split-conformal prediction
    intervals for order totals (Vovk et al.; the distribution-free
    interval recipe modern ML pipelines ship around ANY point
    predictor): per priority group, fit ŷ = train-split mean, take
    q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest |y−ŷ| on the calibration
    split, and AUDIT the guarantee on the held-out eval split —
    coverage(|y−ŷ| ≤ q̂) should read ≥ 1−α.

    Scale shape: the order statistic is the exact_median_2pass
    distributed-selection recipe verbatim (bounded bin histogram +
    prefix window per group + in-bin rank — no global sort at any
    volume); the md5 split is append-stable; the oracle is the
    INDEPENDENT direct formulation (per-group ROW_NUMBER at rank k),
    so the hash match cross-checks the whole selection machinery.
    Residuals are floor-quantized to 1e-6 before ranking/comparison,
    so selection and coverage decide on exact integers."""
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        "o_totalprice",
        hash_bucket(F.col("o_orderkey")).alias("b"),
    )
    tr = (
        orders.filter(F.col("b") < 50)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("mu"),
        )
    )
    rq = F.floor(
        F.abs(F.col("o_totalprice").cast("double") - F.col("mu"))
        * F.lit(float(MICRO))
        + F.lit(0.5)
    ).cast("long")
    # CACHED (r14 plan audit): cal backs the bin bounds, the
    # histogram branch AND the in-bin rank branch; uncached, the
    # lineage expansion scanned orders 19x
    # (plans/r14/mondrian_conformal_audit_before.txt). Three narrow
    # columns of the 25% calibration split (guide §2.4).
    cal = (
        orders.filter((F.col("b") >= 50) & (F.col("b") < 75))
        .join(F.broadcast(tr), "grp")
        .select("grp", "o_orderkey", rq.alias("rq"))
        .cache()
    )
    bounds = cal.agg(F.min("rq").alias("lo"), F.max("rq").alias("hi"))
    width = (F.col("hi") - F.col("lo")).cast("double") / F.lit(
        float(CONF_BINS)
    )
    bin_col = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(CONF_BINS - 1).cast("long"),
            F.floor((F.col("rq") - F.col("lo")).cast("double") / width),
        )
    )
    binned = cal.crossJoin(F.broadcast(bounds)).withColumn("bin", bin_col)
    per_bin = binned.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_grp = Window.partitionBy("grp")
    # k = ceil((n_cal+1)(1-alpha)), clamped to n_cal (k > n_cal means
    # the distribution-free interval is infinite; the clamp keeps the
    # audit finite and is the standard practical fallback)
    k_expr = F.least(
        F.expr(
            f"({100 - CONF_ALPHA_PCT} * (n + 1) + 99) div 100"
        ),
        F.col("n"),
    )
    located = (
        per_bin.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(w_grp))
        .withColumn("k", k_expr)
        .filter(
            (F.col("cum") - F.col("cnt") < F.col("k"))
            & (F.col("cum") >= F.col("k"))
        )
        .select(
            F.col("grp").alias("lgrp"),
            F.col("bin").alias("target_bin"),
            (F.col("cum") - F.col("cnt")).alias("before"),
            "k",
            F.col("n").alias("n_cal"),
        )
    )
    in_bin = binned.join(
        F.broadcast(located),
        (F.col("grp") == F.col("lgrp")) & (F.col("bin") == F.col("target_bin")),
    )
    w_rank = Window.partitionBy("grp").orderBy("rq", "o_orderkey")
    qhat = (
        in_bin.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == F.col("k") - F.col("before"))
        .select("grp", "n_cal", F.col("rq").alias("qhat_micro"))
    )
    ev = (
        orders.filter(F.col("b") >= 75)
        .join(F.broadcast(tr), "grp")
        .select("grp", rq.alias("rq"))
    )
    cov = (
        ev.join(F.broadcast(qhat.select("grp", "qhat_micro")), "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                (F.col("rq") <= F.col("qhat_micro")).cast("long")
            ).alias("covered"),
        )
    )
    return (
        tr.join(qhat, "grp")
        .join(cov, "grp")
        .select(
            "grp",
            "n_train",
            "n_cal",
            "n_eval",
            "qhat_micro",
            F.expr("covered * 1000000 div n_eval").alias("coverage_micro"),
            (
                F.expr("covered * 1000000 div n_eval")
                >= F.lit((100 - CONF_ALPHA_PCT) * 10**4)
            ).alias("meets_alpha"),
        )
        .orderBy("grp")
    )


MONDRIAN_CONFORMAL_SQL = f"""
WITH split AS (
  SELECT o_orderpriority AS grp, o_orderkey, o_totalprice,
         ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT::BIGINT
           % 100 AS b
  FROM orders
), tr AS (
  SELECT grp, COUNT(*) AS n_train,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
           / COUNT(*) AS mu
  FROM split WHERE b < 50 GROUP BY grp
), cal AS (
  SELECT s.grp, s.o_orderkey,
         CAST(floor(abs(CAST(o_totalprice AS DOUBLE) - mu) * {MICRO} + 0.5)
              AS BIGINT) AS rq
  FROM split s JOIN tr ON s.grp = tr.grp
  WHERE b >= 50 AND b < 75
), ranked AS (
  SELECT grp, rq,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY rq, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n_cal
  FROM cal
), qhat AS (
  SELECT grp, n_cal, rq AS qhat_micro
  FROM ranked
  WHERE rn = LEAST(({100 - CONF_ALPHA_PCT} * (n_cal + 1) + 99) // 100, n_cal)
), ev AS (
  SELECT s.grp,
         CAST(floor(abs(CAST(o_totalprice AS DOUBLE) - mu) * {MICRO} + 0.5)
              AS BIGINT) AS rq
  FROM split s JOIN tr ON s.grp = tr.grp
  WHERE b >= 75
), cov AS (
  SELECT e.grp, COUNT(*) AS n_eval,
         CAST(SUM(CASE WHEN e.rq <= q.qhat_micro THEN 1 ELSE 0 END)
              AS BIGINT) AS covered
  FROM ev e JOIN qhat q ON e.grp = q.grp GROUP BY e.grp
)
SELECT t.grp, t.n_train, q.n_cal, c.n_eval, q.qhat_micro,
       covered * {MICRO} // n_eval AS coverage_micro,
       covered * {MICRO} // n_eval >= {(100 - CONF_ALPHA_PCT) * 10**4}
         AS meets_alpha
FROM tr t JOIN qhat q ON t.grp = q.grp JOIN cov c ON t.grp = c.grp
ORDER BY t.grp
"""


# ------------------------------------- language-fairness of the gate
FOUR_FIFTHS_MICRO = 800_000


def fairness_selection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disparate-impact audit of the corpus QUALITY gate (quality
    score ≥ threshold AND exact-dedup survivor — curate_corpus's
    admission WITHOUT its language filter, which would make the
    question vacuous) across languages: per-language selection rate,
    the ratio to the overall rate, and the EEOC four-fifths flag
    (ratio < 0.8 = the filter disparately excludes that language —
    the bias check multilingual-corpus pipelines publish).

    Counting only: rates and ratios are exact integer cross-products
    (DECIMAL, then one identical double division), one broadcast of
    the 1-row totals. Composition, not reimplementation: the gate is
    the existing text_quality + dedup_exact operators, so any fix
    there flows through (the curate_corpus discipline)."""
    from cgtcalc_data_transformer_spark.operators import dedup, textops

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    quality = textops.text_quality(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    survivors = dedup.dedup_exact(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    from cgtcalc_data_transformer_spark.operators.curation import (
        CURATE_MIN_QUALITY,
    )

    kept = (
        quality.filter(F.col("quality_score") >= CURATE_MIN_QUALITY)
        .join(survivors, "doc_id")
        .select("doc_id", F.lit(1).alias("is_kept"))
    )
    per = (
        docs.join(kept, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("is_kept", F.lit(0))).alias("n_kept"),
        )
    )
    tot = per.agg(
        F.sum("n_docs").alias("t_docs"), F.sum("n_kept").alias("t_kept")
    )
    j = per.crossJoin(F.broadcast(tot))
    ratio = F.when(
        F.col("t_kept") > 0,
        F.floor(
            (
                F.col("n_kept").cast(_D38)
                * F.col("t_docs").cast(_D38)
                * F.lit(MICRO).cast(_D38)
            ).cast("double")
            / (F.col("n_docs").cast(_D38) * F.col("t_kept").cast(_D38)).cast(
                "double"
            )
        ).cast("long"),
    ).otherwise(F.lit(-1))
    return j.select(
        "lang",
        "n_docs",
        "n_kept",
        F.expr("n_kept * 1000000 div n_docs").alias("rate_micro"),
        ratio.alias("impact_ratio_micro"),
        (ratio < F.lit(FOUR_FIFTHS_MICRO)).alias("four_fifths_flag"),
    ).orderBy("lang")


def _fairness_sql() -> str:
    from cgtcalc_data_transformer_spark.operators import dedup, textops
    from cgtcalc_data_transformer_spark.operators.curation import (
        CURATE_MIN_QUALITY,
    )

    return f"""
WITH q AS ({textops.TEXT_QUALITY_SQL}),
     d AS ({dedup.DEDUP_EXACT_SQL}),
     kept AS (
  SELECT q.doc_id FROM q JOIN d ON d.keep_doc_id = q.doc_id
  WHERE q.quality_score >= {CURATE_MIN_QUALITY}
), per AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_kept
  FROM documents doc LEFT JOIN kept k ON doc.doc_id = k.doc_id
  GROUP BY lang
), tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS t_docs,
         CAST(SUM(n_kept) AS BIGINT) AS t_kept
  FROM per
)
SELECT lang, n_docs, n_kept,
       n_kept * {MICRO} // n_docs AS rate_micro,
       CASE WHEN t_kept > 0
            THEN CAST(floor(
              CAST(CAST(n_kept AS HUGEINT) * t_docs * {MICRO} AS DOUBLE)
              / CAST(CAST(n_docs AS HUGEINT) * t_kept AS DOUBLE))
              AS BIGINT)
            ELSE -1 END AS impact_ratio_micro,
       CASE WHEN t_kept > 0
            THEN CAST(floor(
              CAST(CAST(n_kept AS HUGEINT) * t_docs * {MICRO} AS DOUBLE)
              / CAST(CAST(n_docs AS HUGEINT) * t_kept AS DOUBLE))
              AS BIGINT)
            ELSE -1 END < {FOUR_FIFTHS_MICRO} AS four_fifths_flag
FROM per CROSS JOIN tot
ORDER BY lang
"""


FAIRNESS_SELECTION_SQL = _fairness_sql()
