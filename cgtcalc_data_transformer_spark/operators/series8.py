"""Round-8 time-series diagnostics over the events daily grid:
portmanteau whiteness (Ljung-Box), fixed-frequency periodogram,
moving-average seasonal decomposition, and lagged cross-correlation.

All four ride `timeseries._daily_grid` (per-type daily counts on the
zero-filled full day grid): the only full-data pass is the one
map-side-combinable count; everything after is day-domain-bounded.
Determinism: the exact-integer ACF trick (D-scale centering so every
product is BIGINT), PRECOMPUTED quantized cos/sin weight tables
(engine trig never runs inside the sum), and round-half-up scaling
for the one rational seasonal index.


Reference parity note: the reference (cgtcalc-data-transformer, ~732 LoC broker-CSV ETL) has no analog for this family — these are engine extensions in the SURVEY.md §2.2 sense.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.similarity import (
    lit_double_array,
)
from cgtcalc_data_transformer_spark.operators.timeseries import (
    _GRID_SQL,
    _daily_grid,
)


def _d19(col: str):
    """Centered daily counts cy = nd*y - s are n-scale, so their
    product sums are n²-scale — past 2^63 once per-day deviations
    reach ~1e9 (ADVICE r8). Cast each factor to DECIMAL(19,0) before
    the multiply and sum in DECIMAL(38,0): exact, order-insensitive,
    loud-overflow-free in both engines."""
    return F.col(col).cast("decimal(19,0)")


CHI2_CRIT_DF7 = 14.067140
LB_MAX_LAG = 7


def ljung_box_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test per event type: are the first 7
    daily-count autocorrelations jointly zero — the whiteness test
    run before fitting any forecasting model (a significant Q says
    'there is structure worth modeling'; acf_daily_counts shows
    WHERE, this says WHETHER).

    Q = n(n+2) Σ r_k²/(n−k) reuses the exact-integer ACF machinery:
    centered products scaled by the day count are BIGINTs, each r_k
    is one int-ratio division, and Q is a 7-term closed form on the
    bounded (types × days) frame.
    """
    grid = _daily_grid(spark, sf_dir)
    tot = grid.groupBy("event_type").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("nd")
    )
    g = grid.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "d",
        (F.col("nd") * F.col("y") - F.col("s")).alias("cy"),
        "nd",
    )
    den = g.groupBy("event_type").agg(
        F.sum(_d19("cy") * _d19("cy")).alias("den"),
        F.max("nd").alias("nd"),
    )
    lags = g.select(
        "event_type",
        "d",
        "cy",
        F.explode(
            F.sequence(F.lit(1), F.least(F.lit(LB_MAX_LAG), F.col("nd") - 1))
        ).alias("lag"),
    )
    num = (
        lags.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") == F.col("a.d") + F.col("a.lag")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.lag").alias("lag"),
        )
        .agg(F.sum(_d19("a.cy") * _d19("b.cy")).alias("num"))
    )
    r2 = num.join(F.broadcast(den), "event_type").select(
        "event_type",
        "nd",
        "lag",
        (
            F.col("num").cast("double") / F.col("den").cast("double")
        ).alias("r"),
    )
    nd = F.col("nd").cast("double")
    q = r2.groupBy("event_type", "nd").agg(
        F.sum(
            F.col("r") * F.col("r") / (nd - F.col("lag").cast("double"))
        ).alias("srq"),
        F.count(F.lit(1)).alias("n_lags"),
    )
    qstat = nd * (nd + F.lit(2.0)) * F.col("srq")
    return q.select(
        "event_type",
        F.col("nd").alias("n_days"),
        "n_lags",
        F.round(qstat, 6).alias("q_stat"),
        (qstat > F.lit(CHI2_CRIT_DF7)).alias("significant"),
    ).orderBy("event_type")


LJUNG_BOX_SQL = f"""
WITH {_GRID_SQL}, tot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS s, COUNT(*) AS nd
  FROM grid GROUP BY event_type
), g AS (
  SELECT grid.event_type, d, nd * y - s AS cy, nd
  FROM grid JOIN tot ON tot.event_type = grid.event_type
), den AS (
  SELECT event_type, CAST(SUM(CAST(cy AS DECIMAL(19,0)) * CAST(cy AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS den, MAX(nd) AS nd
  FROM g GROUP BY event_type
), lags AS (
  SELECT g.event_type, d, cy,
         UNNEST(generate_series(1, LEAST({LB_MAX_LAG}, nd - 1))) AS lag
  FROM g
), num AS (
  SELECT a.event_type, a.lag, CAST(SUM(CAST(a.cy AS DECIMAL(19,0)) * CAST(b.cy AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS num
  FROM lags a JOIN g b
    ON b.event_type = a.event_type AND b.d = a.d + a.lag
  GROUP BY a.event_type, a.lag
), r2 AS (
  SELECT num.event_type, den.nd, num.lag,
         CAST(num AS DOUBLE) / den AS r
  FROM num JOIN den ON den.event_type = num.event_type
), q AS (
  SELECT event_type, nd,
         SUM(r * r / (CAST(nd AS DOUBLE) - lag)) AS srq,
         COUNT(*) AS n_lags
  FROM r2 GROUP BY event_type, nd
)
SELECT event_type, nd AS n_days, n_lags,
       ROUND(CAST(nd AS DOUBLE) * (nd + 2.0) * srq, 6) AS q_stat,
       CAST(nd AS DOUBLE) * (nd + 2.0) * srq > {CHI2_CRIT_DF7} AS significant
FROM q
ORDER BY event_type
"""


# -------------------------------------------- fixed-freq periodogram
PG_PERIODS = [7, 14, 30]
PG_SCALE = 10**9
_PG_COS = {
    p: [int(math.floor(math.cos(2 * math.pi * i / p) * PG_SCALE + 0.5))
        for i in range(p)]
    for p in PG_PERIODS
}
_PG_SIN = {
    p: [int(math.floor(math.sin(2 * math.pi * i / p) * PG_SCALE + 0.5))
        for i in range(p)]
    for p in PG_PERIODS
}


def periodogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-frequency periodogram: spectral amplitude of each event
    type's daily counts at periods 7/14/30 days — the weekly and
    monthly rhythm detector (a Fourier projection, not a full FFT:
    at 100 TB you test the frequencies you care about, each one a
    single weighted aggregation).

    cos/sin weights are PRECOMPUTED integer literals quantized to
    1e-9 (element_at lookup by d mod p — engine trig never runs in
    the sum), so C_p and S_p are exact BIGINTs; the amplitude is one
    sqrt on identical inputs. rel_amp divides by the mean daily count
    so the number is comparable across types.
    """
    # CACHED (r12 union audit): one weighted aggregation PER period
    # reads this |types|×|days| frame — uncached, the events rollup
    # re-executed once per tested frequency
    grid = _daily_grid(spark, sf_dir).cache()
    out = None
    for p in PG_PERIODS:
        wc = lit_double_array(_PG_COS[p])
        ws = lit_double_array(_PG_SIN[p])
        idx = (F.col("d") % p + 1).cast("int")
        agg = grid.groupBy("event_type").agg(
            F.sum(F.col("y") * F.element_at(wc, idx)).alias("c"),
            F.sum(F.col("y") * F.element_at(ws, idx)).alias("s"),
            F.sum("y").alias("tot"),
            F.count(F.lit(1)).alias("nd"),
        )
        amp = (
            F.sqrt(
                F.col("c").cast("double") * F.col("c").cast("double")
                + F.col("s").cast("double") * F.col("s").cast("double")
            )
            / F.lit(float(PG_SCALE))
            / F.col("nd").cast("double")
        )
        row = agg.select(
            "event_type",
            F.lit(p).alias("period"),
            F.round(amp, 6).alias("amp"),
            F.round(
                amp
                / (F.col("tot").cast("double") / F.col("nd").cast("double")),
                6,
            ).alias("rel_amp"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("event_type", "period")


def _pg_branch_sql(p: int) -> str:
    cos_list = ", ".join(str(v) for v in _PG_COS[p])
    sin_list = ", ".join(str(v) for v in _PG_SIN[p])
    return f"""
SELECT event_type, {p} AS period,
       ROUND(sqrt(CAST(c AS DOUBLE) * c + CAST(s AS DOUBLE) * s) / {PG_SCALE}.0 / nd, 6) AS amp,
       ROUND(sqrt(CAST(c AS DOUBLE) * c + CAST(s AS DOUBLE) * s) / {PG_SCALE}.0 / nd
             / (CAST(tot AS DOUBLE) / nd), 6) AS rel_amp
FROM (
  SELECT event_type,
         CAST(SUM(y * ([{cos_list}])[(d % {p}) + 1]) AS BIGINT) AS c,
         CAST(SUM(y * ([{sin_list}])[(d % {p}) + 1]) AS BIGINT) AS s,
         CAST(SUM(y) AS BIGINT) AS tot,
         COUNT(*) AS nd
  FROM grid GROUP BY event_type
)""".strip()


PERIODOGRAM_SQL = (
    f"WITH {_GRID_SQL}\n"
    + "\nUNION ALL\n".join(_pg_branch_sql(p) for p in PG_PERIODS)
    + "\nORDER BY event_type, period"
)


# --------------------------------------- MA seasonal decomposition
SD_SCALE = 10**6


def seasonal_decompose_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition, additive, per event type:
    detrend with a 7-day centered moving average, then average the
    detrended residual per weekday — the per-weekday seasonal index
    a capacity planner subtracts before alerting.

    The MA is a 7-row window SUM (kept as the integer 7y − Σwindow so
    no division happens until the final index); only full windows
    participate; the index is round-half-up quantized to micro-units
    (floor(x·1e6 + 0.5) — the repo's cross-engine rounding recipe).
    """
    grid = _daily_grid(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    detr = grid.select(
        "event_type",
        "d",
        (F.lit(7) * F.col("y") - F.sum("y").over(w)).alias("detr7"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).filter(F.col("wn") == 7)
    out = detr.groupBy(
        "event_type", (F.col("d") % 7).alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.floor(
            F.sum("detr7").cast("double")
            / (F.lit(7.0) * F.count(F.lit(1)).cast("double"))
            * F.lit(float(SD_SCALE))
            + F.lit(0.5)
        ).cast("long").alias("seas_micro"),
    )
    return out.orderBy("event_type", "dow")


SEASONAL_MA_SQL = f"""
WITH {_GRID_SQL}, detr AS (
  SELECT event_type, d,
         7 * y - SUM(y) OVER (PARTITION BY event_type ORDER BY d
                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS detr7,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY d
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
  FROM grid
)
SELECT event_type, d % 7 AS dow,
       COUNT(*) AS n_days,
       CAST(floor(CAST(SUM(detr7) AS DOUBLE) / (7.0 * COUNT(*)) * {SD_SCALE}.0 + 0.5) AS BIGINT) AS seas_micro
FROM detr WHERE wn = 7
GROUP BY event_type, d % 7
ORDER BY event_type, dow
"""


# ---------------------------------------- lagged cross-correlation
CCF_MAX_LAG = 3
CCF_X, CCF_Y = "view", "purchase"


def ccf_lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of daily 'view' vs 'purchase' counts at lags
    0..3: does today's browsing predict purchases k days later — the
    lead-lag screen behind every attribution-window choice.

    Exact-integer centering (the ACF D-scale trick applied to both
    series on the shared day grid); one equality join on d+lag; each
    r_l is an int-ratio divided by the sqrt of two exact integer
    sums.
    """
    grid = _daily_grid(spark, sf_dir).filter(
        F.col("event_type").isin(CCF_X, CCF_Y)
    )
    tot = grid.groupBy("event_type").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("nd")
    )
    g = grid.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "d",
        (F.col("nd") * F.col("y") - F.col("s")).alias("cy"),
    )
    x = g.filter(F.col("event_type") == CCF_X).select(
        F.col("d").alias("d"), F.col("cy").alias("cx")
    )
    y = g.filter(F.col("event_type") == CCF_Y).select(
        F.col("d").alias("dy"), F.col("cy").alias("cyv")
    )
    dens = (
        x.agg(F.sum(_d19("cx") * _d19("cx")).alias("dx"))
        .crossJoin(y.agg(F.sum(_d19("cyv") * _d19("cyv")).alias("dy2")))
    )
    lagged = x.select(
        "d",
        "cx",
        F.explode(
            F.sequence(F.lit(0), F.lit(CCF_MAX_LAG))
        ).alias("lag"),
    )
    num = (
        lagged.join(y, F.col("dy") == F.col("d") + F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(_d19("cx") * _d19("cyv")).alias("num"))
    )
    r = num.crossJoin(F.broadcast(dens)).select(
        "lag",
        F.round(
            F.col("num").cast("double")
            / F.sqrt(
                F.col("dx").cast("double") * F.col("dy2").cast("double")
            ),
            6,
        ).alias("ccf"),
    )
    return r.orderBy("lag")


CCF_SQL = f"""
WITH {_GRID_SQL}, tot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS s, COUNT(*) AS nd
  FROM grid WHERE event_type IN ('{CCF_X}', '{CCF_Y}')
  GROUP BY event_type
), g AS (
  SELECT grid.event_type, d, nd * y - s AS cy
  FROM grid JOIN tot ON tot.event_type = grid.event_type
), x AS (
  SELECT d, cy AS cx FROM g WHERE event_type = '{CCF_X}'
), yy AS (
  SELECT d AS dy, cy AS cyv FROM g WHERE event_type = '{CCF_Y}'
), dens AS (
  SELECT (SELECT CAST(SUM(CAST(cx AS DECIMAL(19,0)) * CAST(cx AS DECIMAL(19,0))) AS DECIMAL(38,0)) FROM x) AS dx,
         (SELECT CAST(SUM(CAST(cyv AS DECIMAL(19,0)) * CAST(cyv AS DECIMAL(19,0))) AS DECIMAL(38,0)) FROM yy) AS dy2
), lagged AS (
  SELECT d, cx, UNNEST(generate_series(0, {CCF_MAX_LAG})) AS lag FROM x
), num AS (
  SELECT lag, CAST(SUM(CAST(cx AS DECIMAL(19,0)) * CAST(cyv AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS num
  FROM lagged JOIN yy ON dy = d + lag
  GROUP BY lag
)
SELECT lag, ROUND(CAST(num AS DOUBLE) / sqrt(CAST(dx AS DOUBLE) * dy2), 6) AS ccf
FROM num CROSS JOIN dens
ORDER BY lag
"""


# ------------------------------------------------- PACF (lags 1..3)
def pacf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation at lags 1..3 per event type via the
    Durbin-Levinson closed forms — the AR-order picker (ACF says how
    far memory reaches, PACF says how many AR terms actually carry
    it; PACF cutting off after lag 1 = fit AR(1) and stop).

    Reuses the exact-integer ACF machinery for r1..r3 (centered
    BIGINT products on the day grid), pivots the three lags into one
    row per type, and evaluates the textbook level-2/level-3
    recursions as plain column algebra — identical IEEE on both
    engines.
    """
    grid = _daily_grid(spark, sf_dir)
    tot = grid.groupBy("event_type").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("nd")
    )
    g = grid.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "d",
        (F.col("nd") * F.col("y") - F.col("s")).alias("cy"),
    )
    den = g.groupBy("event_type").agg(
        F.sum(_d19("cy") * _d19("cy")).alias("den")
    )
    lags = g.select(
        "event_type", "d", "cy",
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("lag"),
    )
    num = (
        lags.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") == F.col("a.d") + F.col("a.lag")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.lag").alias("lag"),
        )
        .agg(F.sum(_d19("a.cy") * _d19("b.cy")).alias("num"))
    )
    r = num.join(F.broadcast(den), "event_type").select(
        "event_type",
        "lag",
        (F.col("num").cast("double") / F.col("den").cast("double")).alias("r"),
    )
    wide = r.groupBy("event_type").agg(
        F.max(F.when(F.col("lag") == 1, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("r"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("r"))).alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    v1 = F.lit(1.0) - r1 * r1
    p22 = (r2 - r1 * r1) / v1
    p21 = r1 * (F.lit(1.0) - p22)
    v2 = v1 * (F.lit(1.0) - p22 * p22)
    p33 = (r3 - p21 * r2 - p22 * r1) / v2
    return wide.select(
        "event_type",
        F.round(r1, 6).alias("pacf1"),
        F.round(p22, 6).alias("pacf2"),
        F.round(p33, 6).alias("pacf3"),
    ).orderBy("event_type")


PACF_SQL = f"""
WITH {_GRID_SQL}, tot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS s, COUNT(*) AS nd
  FROM grid GROUP BY event_type
), g AS (
  SELECT grid.event_type, d, nd * y - s AS cy
  FROM grid JOIN tot ON tot.event_type = grid.event_type
), den AS (
  SELECT event_type, CAST(SUM(CAST(cy AS DECIMAL(19,0)) * CAST(cy AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS den FROM g GROUP BY event_type
), lags AS (
  SELECT event_type, d, cy, UNNEST([1, 2, 3]) AS lag FROM g
), num AS (
  SELECT a.event_type, a.lag, CAST(SUM(CAST(a.cy AS DECIMAL(19,0)) * CAST(b.cy AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS num
  FROM lags a JOIN g b ON b.event_type = a.event_type AND b.d = a.d + a.lag
  GROUP BY a.event_type, a.lag
), wide AS (
  SELECT num.event_type,
         MAX(CASE WHEN lag = 1 THEN CAST(num AS DOUBLE) / den END) AS r1,
         MAX(CASE WHEN lag = 2 THEN CAST(num AS DOUBLE) / den END) AS r2,
         MAX(CASE WHEN lag = 3 THEN CAST(num AS DOUBLE) / den END) AS r3
  FROM num JOIN den ON den.event_type = num.event_type
  GROUP BY num.event_type
), dl AS (
  SELECT event_type, r1, r2, r3,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
  FROM wide
)
SELECT event_type,
       ROUND(r1, 6) AS pacf1,
       ROUND(p22, 6) AS pacf2,
       ROUND((r3 - (r1 * (1.0 - p22)) * r2 - p22 * r1)
             / ((1.0 - r1 * r1) * (1.0 - p22 * p22)), 6) AS pacf3
FROM dl
ORDER BY event_type
"""


# --------------------------------------------- Mann-Kendall trend test
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per event type: S = Σ_{i<j}
    sign(y_j − y_i) over the daily series with the tie-corrected
    normal approximation — the TEST companion to theil_sen_trend's
    estimate (same pair machinery; this one answers 'is the trend
    real?').

    The pair enumeration is the |days|²-bounded theta join (day
    domain, independent of event volume); S and the tie term are
    exact BIGINTs; z applies the standard continuity correction.
    """
    grid = _daily_grid(spark, sf_dir)
    s = (
        grid.alias("a")
        .join(
            grid.alias("b"),
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.d") > F.col("a.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.signum(
                    (F.col("b.y") - F.col("a.y")).cast("double")
                ).cast("long")
            ).alias("s")
        )
    )
    ties = grid.groupBy("event_type", "y").agg(
        F.count(F.lit(1)).alias("t")
    ).groupBy("event_type").agg(
        F.sum("t").alias("n"),
        F.sum(
            F.col("t") * (F.col("t") - 1) * (F.lit(2) * F.col("t") + 5)
        ).alias("tie_term"),
    )
    j = s.join(F.broadcast(ties), "event_type")
    nd = F.col("n").cast("double")
    var = (
        nd * (nd - F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(5.0))
        - F.col("tie_term").cast("double")
    ) / F.lit(18.0)
    sd = F.col("s").cast("double")
    z = (sd - F.signum(sd)) / F.sqrt(var)
    return j.select(
        "event_type",
        F.col("n").alias("n_days"),
        "s",
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > F.lit(1.959964)).alias("trending"),
    ).orderBy("event_type")


MANN_KENDALL_SQL = f"""
WITH {_GRID_SQL}, s AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM grid a JOIN grid b
    ON b.event_type = a.event_type AND b.d > a.d
  GROUP BY a.event_type
), ties AS (
  SELECT event_type, CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, y, COUNT(*) AS t FROM grid GROUP BY 1, 2)
  GROUP BY event_type
)
SELECT s.event_type, n AS n_days, s,
       ROUND((CAST(s AS DOUBLE) - sign(CAST(s AS DOUBLE)))
             / sqrt((CAST(n AS DOUBLE) * (n - 1.0) * (2.0 * n + 5.0) - tie_term) / 18.0), 6) AS z_stat,
       ABS((CAST(s AS DOUBLE) - sign(CAST(s AS DOUBLE)))
           / sqrt((CAST(n AS DOUBLE) * (n - 1.0) * (2.0 * n + 5.0) - tie_term) / 18.0)) > 1.959964 AS trending
FROM s JOIN ties ON ties.event_type = s.event_type
ORDER BY s.event_type
"""


# ------------------------------------------- single changepoint split
CP_SCALE = 10**6


def changepoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single changepoint per event type: the split day s
    maximizing the between-segment sum of squares
    L²/s + R²/(n−s) − T²/n — binary segmentation's first step (and
    the exact-optimal single-break detector under a piecewise-mean
    model), complementing cusum_changepoint's sequential detector.

    Prefix sums come from the |days|²-bounded theta join; the gain is
    quantized to a 1e-6 grid BEFORE the argmax so the (gain, day)
    struct-max picks the same split on both engines.
    """
    grid = _daily_grid(spark, sf_dir)
    pre = (
        grid.alias("a")
        .join(
            grid.alias("b"),
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.d") <= F.col("a.d")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.d").alias("d"),
        )
        .agg(F.sum("b.y").alias("lsum"))
    )
    tot = grid.groupBy("event_type").agg(
        F.sum("y").alias("t"), F.count(F.lit(1)).alias("n")
    )
    j = pre.join(F.broadcast(tot), "event_type").filter(
        F.col("d") < F.col("n") - 1
    )
    s = (F.col("d") + 1).cast("double")
    nd = F.col("n").cast("double")
    ld = F.col("lsum").cast("double")
    td = F.col("t").cast("double")
    gain = (
        ld * ld / s
        + (td - ld) * (td - ld) / (nd - s)
        - td * td / nd
    )
    gq = F.floor(gain * F.lit(float(CP_SCALE)) + F.lit(0.5)).cast("long")
    top = j.groupBy("event_type").agg(
        F.max(
            F.struct(gq.alias("gq"), (F.col("d") + 1).alias("split"))
        ).alias("m"),
        F.max("n").alias("n_days"),
    )
    return top.select(
        "event_type",
        F.col("m.split").alias("split_day"),
        F.col("m.gq").alias("gain_q"),
        "n_days",
    ).orderBy("event_type")


CHANGEPOINT_SQL = f"""
WITH {_GRID_SQL}, pre AS (
  SELECT a.event_type, a.d, CAST(SUM(b.y) AS BIGINT) AS lsum
  FROM grid a JOIN grid b
    ON b.event_type = a.event_type AND b.d <= a.d
  GROUP BY a.event_type, a.d
), tot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS t, COUNT(*) AS n
  FROM grid GROUP BY event_type
), scored AS (
  SELECT pre.event_type, pre.d + 1 AS split, n,
         CAST(floor((CAST(lsum AS DOUBLE) * lsum / (pre.d + 1)
                     + (CAST(t AS DOUBLE) - lsum) * (t - lsum) / (n - pre.d - 1)
                     - CAST(t AS DOUBLE) * t / n) * {CP_SCALE}.0 + 0.5) AS BIGINT) AS gq
  FROM pre JOIN tot ON tot.event_type = pre.event_type
  WHERE pre.d < n - 1
), top AS (
  SELECT event_type, MAX(struct_pack(gq := gq, split := split)) AS m,
         MAX(n) AS n_days
  FROM scored GROUP BY event_type
)
SELECT event_type,
       struct_extract(m, 'split') AS split_day,
       struct_extract(m, 'gq') AS gain_q,
       n_days
FROM top
ORDER BY event_type
"""
