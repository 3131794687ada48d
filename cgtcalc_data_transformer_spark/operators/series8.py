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
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.timeseries import (
    _GRID_SQL,
    _daily_grid,
)

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
        F.sum(F.col("cy") * F.col("cy")).alias("den"),
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
        .agg(F.sum(F.col("a.cy") * F.col("b.cy")).alias("num"))
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
  SELECT event_type, CAST(SUM(cy * cy) AS BIGINT) AS den, MAX(nd) AS nd
  FROM g GROUP BY event_type
), lags AS (
  SELECT g.event_type, d, cy,
         UNNEST(generate_series(1, LEAST({LB_MAX_LAG}, nd - 1))) AS lag
  FROM g
), num AS (
  SELECT a.event_type, a.lag, CAST(SUM(a.cy * b.cy) AS BIGINT) AS num
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
    grid = _daily_grid(spark, sf_dir)
    out = None
    for p in PG_PERIODS:
        wc = F.array(*[F.lit(v) for v in _PG_COS[p]])
        ws = F.array(*[F.lit(v) for v in _PG_SIN[p]])
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
        x.agg(F.sum(F.col("cx") * F.col("cx")).alias("dx"))
        .crossJoin(y.agg(F.sum(F.col("cyv") * F.col("cyv")).alias("dy2")))
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
        .agg(F.sum(F.col("cx") * F.col("cyv")).alias("num"))
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
  SELECT (SELECT CAST(SUM(cx * cx) AS BIGINT) FROM x) AS dx,
         (SELECT CAST(SUM(cyv * cyv) AS BIGINT) FROM yy) AS dy2
), lagged AS (
  SELECT d, cx, UNNEST(generate_series(0, {CCF_MAX_LAG})) AS lag FROM x
), num AS (
  SELECT lag, CAST(SUM(cx * cyv) AS BIGINT) AS num
  FROM lagged JOIN yy ON dy = d + lag
  GROUP BY lag
)
SELECT lag, ROUND(CAST(num AS DOUBLE) / sqrt(CAST(dx AS DOUBLE) * dy2), 6) AS ccf
FROM num CROSS JOIN dens
ORDER BY lag
"""
