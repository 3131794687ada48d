"""Time-series diagnostics over the events stream: autocorrelation,
EWMA control charts, robust Theil-Sen trend, and multiple-testing
(Benjamini-Hochberg) rate-change screening.

All four operators share one shape: collapse events to PER-DAY counts
per event type on the FULL day grid (absent days are real zeros — a
gap is signal, not a missing row), then run the statistic on the
bounded (types × days) frame. The grid self-joins are |days|²-bounded
— day-domain cost, independent of event volume, which is what lets
exact time-series statistics run over a 100 TB event table: the only
full-data pass is the first map-side-combinable count.

Determinism follows the repo discipline: day keys are pure BIGINT
nanos arithmetic; centered sums are multiplied through by the day
count so every accumulated term is an exact integer (the ACF trick);
EWMA weights are PRECOMPUTED integer literals (engine pow() never
runs); Theil-Sen slope comparisons are exact integer cross-multiplies;
the only transcendentals (exp in the normal-tail approximation) are
single identical IEEE expressions per engine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_events

DAY_NS = 86400 * 1_000_000_000


def _daily_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, d, y): per-type daily counts on the full
    [0 .. dmax−dmin] index grid, zeros filled. One count aggregation
    over events + a types × days expand from two bounded frames.

    The returned frame is CACHED (r14 plan audit): one evaluation
    scans events 2x (counts + bounds), and the ~20 daily-series
    consumers reference their grid 2-15x (lag joins, pairwise
    self-joins, rank windows) — uncached, kendall_tau_daily expanded
    to 16 events scans and hurst_rescaled_range to 18
    (plans/r14/kendall_tau_daily_before.txt). The frame is
    |types| x |days| rows — bounded by the calendar (guide §2.4)."""
    ev = load_events(spark, sf_dir).select(
        "event_type", F.expr(f"ts div {DAY_NS}").alias("day")
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("y")
    )
    bounds = ev.agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
    days = bounds.select(
        F.explode(F.sequence(F.lit(0), F.col("dmax") - F.col("dmin"))).alias(
            "d"
        )
    )
    types = counts.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(days))
    return (
        grid.join(
            counts.crossJoin(F.broadcast(bounds)).select(
                "event_type",
                (F.col("day") - F.col("dmin")).alias("d"),
                "y",
            ),
            ["event_type", "d"],
            "left",
        )
        .select(
            "event_type", "d", F.coalesce("y", F.lit(0)).alias("y")
        )
        .cache()
    )


_GRID_SQL = f"""
ev AS (
  SELECT event_type, epoch_ns(ts) // {DAY_NS} AS day FROM events
), counts AS (
  SELECT event_type, day, COUNT(*) AS y FROM ev GROUP BY 1, 2
), bounds AS (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM ev
), grid AS (
  SELECT t.event_type, gs.d,
         CAST(COALESCE(c.y, 0) AS BIGINT) AS y
  FROM (SELECT DISTINCT event_type FROM counts) t
  CROSS JOIN (SELECT UNNEST(generate_series(0, (SELECT dmax - dmin FROM bounds))) AS d) gs
  LEFT JOIN (SELECT event_type, day - (SELECT dmin FROM bounds) AS d, y
             FROM counts) c
    ON t.event_type = c.event_type AND gs.d = c.d
)"""


# ----------------------------------------------- autocorrelation (ACF)
ACF_MAX_LAG = 7


def acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type autocorrelation of daily counts at lags 1..7 —
    the weekly-rhythm fingerprint: a spike at lag 7 means day-of-week
    seasonality, slow decay means trending volume, all-near-zero
    means Poisson-like traffic. The standing companion to
    seasonality_profile for anomaly-threshold calibration.

    Exact-integer ACF: with D days and type total S, the centered
    product (y_t − S/D)(y_{t+k} − S/D) scaled by D² is
    (D·y_t − S)(D·y_{t+k} − S) — an exact BIGINT per term, so the
    numerator and denominator sums are order-insensitive integers and
    r_k is one int-ratio division. The lag pairing is an equality
    self-join of the bounded grid on (type, d+k); no window, no sort.
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
        F.sum(F.col("cy").cast("decimal(19,0)") * F.col("cy").cast("decimal(19,0)")).alias("den")
    )
    lags = g.select(
        "event_type",
        "d",
        "cy",
        F.explode(
            F.sequence(F.lit(1), F.least(F.lit(ACF_MAX_LAG), F.col("nd") - 1))
        ).alias("lag"),
    )
    num = (
        lags.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") == F.col("a.d") + F.col("a.lag")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), F.col("a.lag").alias("lag"))
        .agg(F.sum(F.col("a.cy").cast("decimal(19,0)") * F.col("b.cy").cast("decimal(19,0)")).alias("num"))
    )
    return (
        num.join(F.broadcast(den), "event_type")
        .select(
            "event_type",
            "lag",
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


ACF_SQL = f"""
WITH {_GRID_SQL}, tot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS s, COUNT(*) AS nd
  FROM grid GROUP BY event_type
), g AS (
  SELECT grid.event_type, d, nd * y - s AS cy, nd
  FROM grid JOIN tot ON grid.event_type = tot.event_type
), den AS (
  SELECT event_type, CAST(SUM(CAST(cy AS DECIMAL(19,0)) * CAST(cy AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS den
  FROM g GROUP BY event_type
), num AS (
  SELECT a.event_type, lag.lag,
         CAST(SUM(CAST(a.cy AS DECIMAL(19,0)) * CAST(b.cy AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS num
  FROM g a
  JOIN (SELECT UNNEST(generate_series(1, {ACF_MAX_LAG})) AS lag) lag
    ON lag.lag <= a.nd - 1
  JOIN g b ON a.event_type = b.event_type AND b.d = a.d + lag.lag
  GROUP BY a.event_type, lag.lag
)
SELECT num.event_type, lag,
       ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
FROM num JOIN den ON num.event_type = den.event_type
ORDER BY num.event_type, lag
"""


# ------------------------------------------------ EWMA control chart
EWMA_ALPHA_NUM = 2      # α = 0.2 as a ratio (weights precomputed below)
EWMA_ALPHA_DEN = 10
EWMA_S = 10**12         # weight quantization
EWMA_MAX_J = 120        # weight horizon: 0.8^120·1e12 ≈ 2 — beyond it
                        # a day's influence is below the quantum
EWMA_L = 3.0            # control limit in σ units

# w[j] = round(α·(1−α)^j · S): influence of y_{t−1−j} on z_{t−1};
# b[t] = round((1−α)^t · S): the z_0 = y_0 boundary carry. Computed
# once in exact-enough Python and baked as INTEGER literals so no
# engine ever evaluates pow() — the same discipline as the bootstrap
# Poisson CDF table.
_EWMA_W = [
    round(
        (EWMA_ALPHA_NUM / EWMA_ALPHA_DEN)
        * (1 - EWMA_ALPHA_NUM / EWMA_ALPHA_DEN) ** j
        * EWMA_S
    )
    for j in range(EWMA_MAX_J + 1)
]
_EWMA_B = [
    round((1 - EWMA_ALPHA_NUM / EWMA_ALPHA_DEN) ** t * EWMA_S)
    for t in range(EWMA_MAX_J + 1)
]


def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart on per-type daily counts (Roberts 1959):
    each day is compared against the exponentially weighted mean of
    its HISTORY (z_{t−1}, α = 0.2), flagging |y_t − z_{t−1}| > 3σ̂ —
    the drift-sensitive complement to the Shewhart-style
    events_rate_anomaly (EWMA catches slow ramps that per-day
    z-scores miss).

    z_{t−1} unrolls to Σ_j α(1−α)^j·y_{t−1−j} + (1−α)^{t−1}·y_0; the
    weights are precomputed INTEGER literals (·10¹²), so z is an
    exact BIGINT dot product over a bounded theta join of the day
    grid with itself — no recursion, no window, no engine pow(). The
    horizon is capped at {EWMA_MAX_J} days where the weight falls
    below the quantum (documented truncation). σ̂ comes from exact
    (n, Σy, Σy²); the flag compares identical IEEE doubles.
    """
    grid = _daily_grid(spark, sf_dir)
    w_arr = F.array(*[F.lit(w) for w in _EWMA_W])
    b_arr = F.array(*[F.lit(b) for b in _EWMA_B])
    y0 = grid.filter(F.col("d") == 0).select(
        "event_type", F.col("y").alias("y0")
    )
    cur = grid.filter(F.col("d") >= 1)
    hist = (
        cur.alias("a")
        .join(
            grid.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") >= 1)
            & (F.col("b.d") <= F.col("a.d") - 1)
            & (F.col("a.d") - 1 - F.col("b.d") <= F.lit(EWMA_MAX_J)),
            "left",
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.d").alias("d"),
            F.col("a.y").alias("y"),
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.element_at(
                        w_arr, (F.col("a.d") - 1 - F.col("b.d") + 1).cast("int")
                    )
                    * F.col("b.y")
                ),
                F.lit(0),
            ).alias("zq_hist")
        )
    )
    boundary = F.when(
        F.col("d") - 1 <= F.lit(EWMA_MAX_J),
        F.element_at(b_arr, (F.col("d") - 1 + 1).cast("int")) * F.col("y0"),
    ).otherwise(F.lit(0))
    sig = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)")).alias("syy"),
    )
    sigma = F.sqrt(
        (
            F.col("nd").cast("double") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        )
        / (F.col("nd").cast("double") * F.col("nd").cast("double"))
    )
    z = hist.join(F.broadcast(y0), "event_type").select(
        "event_type",
        "d",
        "y",
        (F.col("zq_hist") + boundary).alias("zq"),
    )
    return (
        z.join(F.broadcast(sig), "event_type")
        .select(
            "event_type",
            "d",
            "y",
            # truncate-to-micro then exact /1e6: avoids ROUND's
            # cross-engine .5-tie hazard on int/1e12 quotients
            (F.expr("zq div 1000000") / F.lit(1e6)).alias("ewma_prev"),
            F.round(sigma, 6).alias("sigma"),
            (
                F.abs(
                    F.col("y").cast("double")
                    - F.col("zq").cast("double") / F.lit(float(EWMA_S))
                )
                > F.lit(EWMA_L) * sigma
            ).alias("out_of_control"),
        )
        .orderBy("event_type", "d")
    )


def _sql_int_list(vals: list[int]) -> str:
    return ", ".join(str(v) for v in vals)


EWMA_SQL = f"""
WITH {_GRID_SQL}, w(j, w) AS (
  SELECT UNNEST(generate_series(0, {EWMA_MAX_J})),
         UNNEST([{_sql_int_list(_EWMA_W)}])
), bb(t, b) AS (
  SELECT UNNEST(generate_series(0, {EWMA_MAX_J})),
         UNNEST([{_sql_int_list(_EWMA_B)}])
), y0 AS (
  SELECT event_type, y AS y0 FROM grid WHERE d = 0
), hist AS (
  SELECT a.event_type, a.d, a.y,
         CAST(COALESCE(SUM(w.w * b.y), 0) AS BIGINT) AS zq_hist
  FROM grid a
  LEFT JOIN grid b
    ON a.event_type = b.event_type AND b.d >= 1 AND b.d <= a.d - 1
       AND a.d - 1 - b.d <= {EWMA_MAX_J}
  LEFT JOIN w ON w.j = a.d - 1 - b.d
  WHERE a.d >= 1
  GROUP BY a.event_type, a.d, a.y
), sig AS (
  SELECT event_type, COUNT(*) AS nd,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS syy
  FROM grid GROUP BY event_type
), z AS (
  SELECT hist.event_type, d, y,
         zq_hist + CASE WHEN d - 1 <= {EWMA_MAX_J}
                        THEN (SELECT b FROM bb WHERE t = d - 1) * y0
                        ELSE 0 END AS zq
  FROM hist JOIN y0 ON hist.event_type = y0.event_type
)
SELECT z.event_type, d, y,
       (zq // 1000000) / 1e6 AS ewma_prev,
       ROUND(sqrt((CAST(nd AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE))), 6) AS sigma,
       ABS(CAST(y AS DOUBLE) - CAST(zq AS DOUBLE) / {EWMA_S})
         > {EWMA_L} * sqrt((CAST(nd AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE)))
         AS out_of_control
FROM z JOIN sig ON z.event_type = sig.event_type
ORDER BY z.event_type, d
"""


# --------------------------------------------------- Theil-Sen trend
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily event volume per type: the
    MEDIAN of all pairwise slopes (y_j − y_i)/(j − i) — up to ~29%
    corrupted days cannot move it, unlike the OLS slope reported
    beside it for contrast (Theil 1950, Sen 1968).

    Day-domain bounded: D days → D(D−1)/2 slope pairs per type,
    independent of event volume. Median selection never compares
    doubles: slope fractions are ranked by exact integer
    cross-multiplication (num_a·den_b vs num_b·den_a, denominators
    positive) with the (i, j) pair id as the total-order tiebreak —
    the bounded theta-join rank convention. The selected fractions'
    double division is the only float, identical on both engines.
    """
    grid = _daily_grid(spark, sf_dir)
    pairs = (
        grid.alias("a")
        .join(
            grid.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") > F.col("a.d")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.d").alias("i"),
            F.col("b.d").alias("j"),
            (F.col("b.y") - F.col("a.y")).alias("num"),
            (F.col("b.d") - F.col("a.d")).alias("den"),
        )
    )
    lt = (
        pairs.alias("p")
        .join(
            pairs.alias("q"),
            (F.col("q.event_type") == F.col("p.event_type"))
            & (
                (F.col("q.num") * F.col("p.den") < F.col("p.num") * F.col("q.den"))
                | (
                    (F.col("q.num") * F.col("p.den") == F.col("p.num") * F.col("q.den"))
                    & (
                        (F.col("q.i") < F.col("p.i"))
                        | ((F.col("q.i") == F.col("p.i")) & (F.col("q.j") < F.col("p.j")))
                    )
                )
            ),
            "left",
        )
        .groupBy(
            F.col("p.event_type").alias("event_type"),
            F.col("p.i").alias("i"),
            F.col("p.j").alias("j"),
            F.col("p.num").alias("num"),
            F.col("p.den").alias("den"),
        )
        .agg(F.count(F.col("q.num")).alias("n_lt"))
    )
    m = pairs.groupBy("event_type").agg(F.count(F.lit(1)).alias("m"))
    ranked = lt.join(F.broadcast(m), "event_type")
    slope = F.col("num").cast("double") / F.col("den").cast("double")
    sel = ranked.groupBy("event_type", "m").agg(
        F.sum(
            F.when(
                F.col("n_lt") + 1 == F.expr("(m + 1) div 2"), slope
            ).otherwise(F.lit(0.0))
        ).alias("s_lo"),
        F.sum(
            F.when(
                F.col("n_lt") + 1 == F.expr("(m + 2) div 2"), slope
            ).otherwise(F.lit(0.0))
        ).alias("s_hi"),
    )
    # OLS slope for contrast, from exact integer sums on the grid
    tot = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("d").alias("sd"),
        F.sum("y").alias("sy"),
        F.sum(F.col("d") * F.col("y")).alias("sdy"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    )
    ols = (
        (F.col("nd") * F.col("sdy") - F.col("sd") * F.col("sy")).cast("double")
        / (F.col("nd") * F.col("sdd") - F.col("sd") * F.col("sd")).cast("double")
    )
    return (
        sel.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.col("nd").alias("n_days"),
            F.col("m").alias("n_pairs"),
            F.round((F.col("s_lo") + F.col("s_hi")) / F.lit(2.0), 6).alias(
                "theil_sen_slope"
            ),
            F.round(ols, 6).alias("ols_slope"),
        )
        .orderBy("event_type")
    )


THEIL_SEN_SQL = f"""
WITH {_GRID_SQL}, pairs AS (
  SELECT a.event_type, a.d AS i, b.d AS j,
         b.y - a.y AS num, b.d - a.d AS den
  FROM grid a JOIN grid b
    ON a.event_type = b.event_type AND b.d > a.d
), lt AS (
  SELECT p.event_type, p.i, p.j, p.num, p.den,
         CAST(COUNT(q.num) AS BIGINT) AS n_lt
  FROM pairs p LEFT JOIN pairs q
    ON q.event_type = p.event_type
   AND (q.num * p.den < p.num * q.den
        OR (q.num * p.den = p.num * q.den
            AND (q.i < p.i OR (q.i = p.i AND q.j < p.j))))
  GROUP BY p.event_type, p.i, p.j, p.num, p.den
), m AS (
  SELECT event_type, COUNT(*) AS m FROM pairs GROUP BY event_type
), sel AS (
  SELECT lt.event_type, ANY_VALUE(m.m) AS m,
         SUM(CASE WHEN n_lt + 1 = (m.m + 1) // 2
                  THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                  ELSE 0.0 END) AS s_lo,
         SUM(CASE WHEN n_lt + 1 = (m.m + 2) // 2
                  THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                  ELSE 0.0 END) AS s_hi
  FROM lt JOIN m ON lt.event_type = m.event_type
  GROUP BY lt.event_type
), tot AS (
  SELECT event_type, COUNT(*) AS nd,
         CAST(SUM(d) AS BIGINT) AS sd,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(d * y) AS BIGINT) AS sdy,
         CAST(SUM(d * d) AS BIGINT) AS sdd
  FROM grid GROUP BY event_type
)
SELECT sel.event_type, nd AS n_days, m AS n_pairs,
       ROUND((s_lo + s_hi) / 2.0, 6) AS theil_sen_slope,
       ROUND(CAST(nd * sdy - sd * sy AS DOUBLE)
             / CAST(nd * sdd - sd * sd AS DOUBLE), 6) AS ols_slope
FROM sel JOIN tot ON sel.event_type = tot.event_type
ORDER BY sel.event_type
"""

# -------------------------------------- Benjamini-Hochberg FDR screen
BH_Q = 0.05
# Abramowitz & Stegun 7.1.26 erf approximation constants (|err| <
# 1.5e-7) — a fixed algebraic formula (one exp + a degree-5
# polynomial) so both engines evaluate the identical IEEE expression;
# no erf() builtin exists in either engine.
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_SQRT2 = math.sqrt(2.0)


def rate_change_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, c1, c2, m, z, p, rank): the per-type half-vs-half
    rate-change test panel with A&S 7.1.26 two-sided p-values and
    ascending-p ranks (ties broken by event_type) — the shared input
    of bh_fdr_control, holm_bonferroni_panel and
    fisher_combined_meta. One count aggregation over events; ranks
    via the m-row bounded theta join."""
    ev = load_events(spark, sf_dir).select(
        "event_type", F.expr(f"ts div {DAY_NS}").alias("day")
    )
    bounds = ev.agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
    halves = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            F.col("day") <= F.expr("(dmin + dmax) div 2"), F.lit(1)
        ).otherwise(F.lit(2)).alias("h"),
    )
    # CACHED (r14 plan audit): tot + the crossJoin branch reference
    # per 2x, the rank theta-join references scored 2x, and the
    # bh/holm step scans reference the returned frame 2x — uncached
    # the multiplications compounded to 16 events scans per panel
    # query (plans/r14/holm_bonferroni_panel_before.txt). Both cached
    # frames are m = |event types| rows (guide §2.4).
    per = halves.groupBy("event_type").agg(
        F.sum((F.col("h") == 1).cast("long")).alias("c1"),
        F.sum((F.col("h") == 2).cast("long")).alias("c2"),
    ).cache()
    tot = per.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.count(F.lit(1)).alias("m"),
    )
    j = per.crossJoin(F.broadcast(tot))
    p1 = F.col("c1").cast("double") / F.col("n1").cast("double")
    p2 = F.col("c2").cast("double") / F.col("n2").cast("double")
    pp = (F.col("c1") + F.col("c2")).cast("double") / (
        F.col("n1") + F.col("n2")
    ).cast("double")
    z = (p1 - p2) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n1").cast("double")
            + F.lit(1.0) / F.col("n2").cast("double")
        )
    )
    x = F.abs(z) / F.lit(_SQRT2)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    poly = (
        F.lit(_AS_A[0]) * t
        + F.lit(_AS_A[1]) * t * t
        + F.lit(_AS_A[2]) * t * t * t
        + F.lit(_AS_A[3]) * t * t * t * t
        + F.lit(_AS_A[4]) * t * t * t * t * t
    )
    pval = poly * F.exp(-x * x)  # = 1 − erf(x) = two-sided p of |z|
    scored = j.select(
        "event_type", "c1", "c2", "m", z.alias("z"), pval.alias("p")
    )
    ranked = (
        scored.alias("a")
        .join(
            scored.alias("b"),
            (F.col("b.p") < F.col("a.p"))
            | (
                (F.col("b.p") == F.col("a.p"))
                & (F.col("b.event_type") < F.col("a.event_type"))
            ),
            "left",
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.c1").alias("c1"),
            F.col("a.c2").alias("c2"),
            F.col("a.m").alias("m"),
            F.col("a.z").alias("z"),
            F.col("a.p").alias("p"),
        )
        .agg((F.count(F.col("b.p")) + 1).alias("rank"))
    )
    return ranked.cache()


def bh_fdr_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control (1995) over per-type rate-change
    tests: each event type's share of traffic in the first half of
    the horizon vs the second (two-proportion z-test), then the BH
    step-up rule at q = 0.05 picks which changes survive multiple
    testing — the correction every metrics platform needs the moment
    it watches more than one counter.

    The m tests come from ONE count aggregation (type × half); the
    normal tail is the A&S 7.1.26 closed form (identical IEEE per
    engine — no erf builtin, no p-value lookup service); ranks and
    the step-up max run on the m-row bounded frame via the theta-join
    convention. Adding event types grows m, never the data passes.
    """
    ranked = rate_change_ranked(spark, sf_dir)
    ok = F.col("p") <= F.lit(BH_Q) * F.col("rank").cast("double") / F.col(
        "m"
    ).cast("double")
    kmax = ranked.agg(
        F.max(F.when(ok, F.col("rank")).otherwise(F.lit(0))).alias("kmax")
    )
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select(
            "event_type",
            "c1",
            "c2",
            F.round(F.col("z"), 6).alias("z_stat"),
            F.round(F.col("p"), 6).alias("p_value"),
            "rank",
            (F.col("rank") <= F.col("kmax")).alias("rejected"),
        )
        .orderBy("rank", "event_type")
    )


# ev → per → scored → pv → ranked CTE chain shared by the
# bh_fdr_control / holm_bonferroni_panel / fisher_combined_meta
# oracles (one definition — the multiple-testing twins must score
# and rank identically by construction).
_RATE_RANKED_SQL = f"""ev AS (
  SELECT event_type, epoch_ns(ts) // {DAY_NS} AS day FROM events
), bounds AS (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM ev
), per AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN day <= (SELECT (dmin + dmax) // 2 FROM bounds)
                       THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN day <= (SELECT (dmin + dmax) // 2 FROM bounds)
                       THEN 0 ELSE 1 END) AS BIGINT) AS c2
  FROM ev GROUP BY event_type
), tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
         COUNT(*) AS m
  FROM per
), scored AS (
  SELECT event_type, c1, c2, m,
         (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
         / sqrt((CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                * (1.0 - CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))) AS z
  FROM per CROSS JOIN tot
), pv AS (
  SELECT event_type, c1, c2, m, z,
         ({_AS_A[0]} * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
          + {_AS_A[1]} * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
                       * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
          + {_AS_A[2]} * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
                       * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
                       * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
          + {_AS_A[3]} * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
                       * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
                       * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
                       * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
          + {_AS_A[4]} * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
                       * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
                       * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
                       * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r})))
                       * (1.0 / (1.0 + {_AS_P} * (ABS(z) / {_SQRT2!r}))))
         * exp(-(ABS(z) / {_SQRT2!r}) * (ABS(z) / {_SQRT2!r})) AS p
  FROM scored
), ranked AS (
  SELECT a.event_type, a.c1, a.c2, a.m, a.z, a.p,
         CAST(COUNT(b.p) + 1 AS BIGINT) AS rank
  FROM pv a LEFT JOIN pv b
    ON b.p < a.p OR (b.p = a.p AND b.event_type < a.event_type)
  GROUP BY a.event_type, a.c1, a.c2, a.m, a.z, a.p
)"""

BH_FDR_SQL = f"""
WITH {_RATE_RANKED_SQL}, kmax AS (
  SELECT MAX(CASE WHEN p <= {BH_Q} * CAST(rank AS DOUBLE) / CAST(m AS DOUBLE)
                  THEN rank ELSE 0 END) AS kmax
  FROM ranked
)
SELECT event_type, c1, c2,
       ROUND(z, 6) AS z_stat,
       ROUND(p, 6) AS p_value,
       rank,
       rank <= kmax AS rejected
FROM ranked CROSS JOIN kmax
ORDER BY rank, event_type
"""

# --------------------------------------------- Page-Hinkley drift
PH_DELTA_NUM = 1   # δ = 1/2 (tolerated drift per step, count units)
PH_DELTA_DEN = 2
PH_LAMBDA = 5      # alarm threshold in count units


def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detector (Page 1954; Hinkley 1971) on
    per-type daily counts: PH_t = Σ_{i≤t}(y_i − ȳ − δ) with alarm
    when PH_t − min_{i≤t} PH_i > λ — the classic upward mean-shift
    detector that complements cusum_changepoint's two-sided split
    with an online-style monitoring statistic.

    ENTIRELY exact integer arithmetic: multiplying through by 2D
    turns every term into 2D·y_i − 2S − D (BIGINT), so the prefix
    sums, the running minimum, and the alarm comparison
    (PH' − min' > 2D·λ) never touch a float; both prefix aggregates
    are bounded theta joins on the day grid. The displayed ph/ph_min
    are the scaled integers divided once.
    """
    grid = _daily_grid(spark, sf_dir)
    tot = grid.groupBy("event_type").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("nd")
    )
    g = grid.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "d",
        "y",
        "nd",
        (
            F.lit(2 * PH_DELTA_DEN) * F.col("nd") * F.col("y")
            - F.lit(2 * PH_DELTA_DEN) * F.col("s")
            - F.lit(2 * PH_DELTA_NUM) * F.col("nd")
        ).alias("term"),
    )
    pre = (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") <= F.col("a.d")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.d").alias("d"),
            F.col("a.y").alias("y"),
            F.col("a.nd").alias("nd"),
        )
        .agg(F.sum("b.term").alias("ph_q"))
    )
    mins = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") <= F.col("a.d")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.d").alias("d"),
            F.col("a.y").alias("y"),
            F.col("a.nd").alias("nd"),
            F.col("a.ph_q").alias("ph_q"),
        )
        .agg(F.min("b.ph_q").alias("min_q"))
    )
    scale = (F.lit(2 * PH_DELTA_DEN) * F.col("nd")).cast("double")
    return mins.select(
        "event_type",
        "d",
        "y",
        (F.col("ph_q") / scale).alias("ph"),
        (F.col("min_q") / scale).alias("ph_min"),
        (
            F.col("ph_q") - F.col("min_q")
            > F.lit(2 * PH_DELTA_DEN * PH_LAMBDA) * F.col("nd")
        ).alias("alarm"),
    ).orderBy("event_type", "d")


PAGE_HINKLEY_SQL = f"""
WITH {_GRID_SQL}, tot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS s, COUNT(*) AS nd
  FROM grid GROUP BY event_type
), g AS (
  SELECT grid.event_type, d, y, nd,
         {2 * PH_DELTA_DEN} * nd * y - {2 * PH_DELTA_DEN} * s
           - {2 * PH_DELTA_NUM} * nd AS term
  FROM grid JOIN tot ON grid.event_type = tot.event_type
), pre AS (
  SELECT a.event_type, a.d, a.y, a.nd,
         CAST(SUM(b.term) AS BIGINT) AS ph_q
  FROM g a JOIN g b ON a.event_type = b.event_type AND b.d <= a.d
  GROUP BY a.event_type, a.d, a.y, a.nd
), mins AS (
  SELECT a.event_type, a.d, a.y, a.nd, a.ph_q,
         CAST(MIN(b.ph_q) AS BIGINT) AS min_q
  FROM pre a JOIN pre b ON a.event_type = b.event_type AND b.d <= a.d
  GROUP BY a.event_type, a.d, a.y, a.nd, a.ph_q
)
SELECT event_type, d, y,
       ph_q / CAST({2 * PH_DELTA_DEN} * nd AS DOUBLE) AS ph,
       min_q / CAST({2 * PH_DELTA_DEN} * nd AS DOUBLE) AS ph_min,
       ph_q - min_q > {2 * PH_DELTA_DEN * PH_LAMBDA} * nd AS alarm
FROM mins
ORDER BY event_type, d
"""


# --------------------------------------- capture-recapture estimate
def capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln-Petersen / Chapman capture-recapture estimate of the
    active-user population from two "captures" (users seen in the
    first vs second half of the horizon): N̂ = n₁n₂/m, Chapman's
    bias-corrected (n₁+1)(n₂+1)/(m+1) − 1 — the ecology estimator
    that data platforms reuse to sanity-check "how many users exist
    that we have NOT yet observed", reported against the true
    distinct count this synthetic corpus can actually reveal.

    Three distinct-count aggregations (first half, second half,
    intersection via min/max day per user — one user-level rollup);
    the estimates are exact integer rationals. One output row.
    """
    ev = load_events(spark, sf_dir).select(
        "user_id", F.expr(f"ts div {DAY_NS}").alias("day")
    )
    bounds = ev.agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            (F.col("day") <= F.expr("(dmin + dmax) div 2")).cast("long").alias(
                "h1"
            ),
        )
        .groupBy("user_id")
        .agg(F.max("h1").alias("in1"), F.max(1 - F.col("h1")).alias("in2"))
    )
    s = per_user.agg(
        F.count(F.lit(1)).alias("true_n"),
        F.sum("in1").alias("n1"),
        F.sum("in2").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).alias("m"),
    )
    lp = (F.col("n1") * F.col("n2")).cast("double") / F.col("m").cast("double")
    chap = ((F.col("n1") + 1) * (F.col("n2") + 1)).cast("double") / (
        F.col("m") + 1
    ).cast("double") - F.lit(1.0)
    return s.select(
        "n1",
        "n2",
        F.col("m").alias("recaptured"),
        F.round(lp, 6).alias("n_hat_lp"),
        F.round(chap, 6).alias("n_hat_chapman"),
        "true_n",
    )


CAPTURE_RECAPTURE_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_ns(ts) // {DAY_NS} AS day FROM events
), bounds AS (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM ev
), per_user AS (
  SELECT user_id,
         MAX(CASE WHEN day <= (SELECT (dmin + dmax) // 2 FROM bounds)
                  THEN 1 ELSE 0 END) AS in1,
         MAX(CASE WHEN day <= (SELECT (dmin + dmax) // 2 FROM bounds)
                  THEN 0 ELSE 1 END) AS in2
  FROM ev GROUP BY user_id
), s AS (
  SELECT COUNT(*) AS true_n,
         CAST(SUM(in1) AS BIGINT) AS n1,
         CAST(SUM(in2) AS BIGINT) AS n2,
         CAST(SUM(in1 * in2) AS BIGINT) AS m
  FROM per_user
)
SELECT n1, n2, m AS recaptured,
       ROUND(CAST(n1 * n2 AS DOUBLE) / CAST(m AS DOUBLE), 6) AS n_hat_lp,
       ROUND(CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(m + 1 AS DOUBLE) - 1.0, 6)
         AS n_hat_chapman,
       true_n
FROM s
"""

# ------------------------------------------- Wald-Wolfowitz runs test
RUNS_Z_CRIT = 1.96


def runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the above/below-mean sequence of
    per-type daily counts: too FEW runs means positive serial
    dependence (trending/bursty days), too MANY means oscillation —
    the nonparametric randomness check that validates (or indicts)
    the iid assumption every control chart above quietly makes.

    The above-mean indicator is the exact integer compare D·y > S;
    runs count via the (d, d+1) adjacency EQUALITY join on the
    bounded grid — no window, no sort; E[R]/Var[R] are closed forms
    over the two exact counts, with the degenerate all-one-side case
    pinned to z = 0 deterministically on both engines.
    """
    grid = _daily_grid(spark, sf_dir)
    tot = grid.groupBy("event_type").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("nd")
    )
    g = grid.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "d",
        (F.col("nd") * F.col("y") > F.col("s")).cast("long").alias("up"),
    )
    adj = (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") == F.col("a.d") + 1),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                (F.col("a.up") != F.col("b.up")).cast("long")
            ).alias("switches")
        )
    )
    counts = g.groupBy("event_type").agg(
        F.sum("up").alias("n1"),
        F.sum(1 - F.col("up")).alias("n2"),
    )
    j = counts.join(adj, "event_type")
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    runs = (F.col("switches") + 1).cast("double")
    er = F.lit(1.0) + F.lit(2.0) * n1 * n2 / n
    vr = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n)
        / (n * n * (n - F.lit(1.0)))
    )
    z = F.when(
        (F.col("n1") == 0) | (F.col("n2") == 0), F.lit(0.0)
    ).otherwise((runs - er) / F.sqrt(vr))
    return j.select(
        "event_type",
        "n1",
        "n2",
        (F.col("switches") + 1).alias("runs"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > F.lit(RUNS_Z_CRIT)).alias("nonrandom"),
    ).orderBy("event_type")


RUNS_TEST_SQL = f"""
WITH {_GRID_SQL}, tot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS s, COUNT(*) AS nd
  FROM grid GROUP BY event_type
), g AS (
  SELECT grid.event_type, d,
         CASE WHEN nd * y > s THEN 1 ELSE 0 END AS up
  FROM grid JOIN tot ON grid.event_type = tot.event_type
), adj AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN a.up <> b.up THEN 1 ELSE 0 END) AS BIGINT) AS switches
  FROM g a JOIN g b ON a.event_type = b.event_type AND b.d = a.d + 1
  GROUP BY a.event_type
), ud AS (
  SELECT event_type, CAST(SUM(up) AS BIGINT) AS n1,
         CAST(SUM(1 - up) AS BIGINT) AS n2
  FROM g GROUP BY event_type
)
SELECT ud.event_type, n1, n2, switches + 1 AS runs,
       ROUND(CASE WHEN n1 = 0 OR n2 = 0 THEN 0.0
                  ELSE (CAST(switches + 1 AS DOUBLE)
                        - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                                 / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
                       / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                              * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                                 - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                              / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))
             END, 6) AS z_stat,
       ABS(CASE WHEN n1 = 0 OR n2 = 0 THEN 0.0
                ELSE (CAST(switches + 1 AS DOUBLE)
                      - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                               / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
                     / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                            * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                               - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                            / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                               * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                               * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))
           END) > {RUNS_Z_CRIT} AS nonrandom
FROM ud JOIN adj ON ud.event_type = adj.event_type
ORDER BY ud.event_type
"""


# ------------------------------------------- Poisson dispersion test
DISP_OVER = 1.5   # documented overdispersion band


def poisson_dispersion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean dispersion index of per-type daily counts —
    Fisher's Poisson overdispersion screen: ≈1 means Poisson traffic
    (events_rate_anomaly's z-thresholds are honest), ≫1 means
    clumped/bursty arrivals (they will over-alarm and need the
    negative-binomial correction this index quantifies).

    s²/ȳ = Σ(D·y − S)² / (D·(D−1)·S): one exact-integer ratio per
    type from the D-scaled centering trick; the companion χ² is
    (D−1)·s²/ȳ. The flag compares the identical double to a literal
    band. One count pass + day-domain arithmetic.
    """
    grid = _daily_grid(spark, sf_dir)
    tot = grid.groupBy("event_type").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("nd")
    )
    g = grid.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "nd",
        "s",
        (F.col("nd") * F.col("y") - F.col("s")).alias("cy"),
    )
    s2 = g.groupBy("event_type", "nd", "s").agg(
        F.sum(F.col("cy").cast("decimal(19,0)") * F.col("cy").cast("decimal(19,0)")).alias("ss")
    )
    disp = F.col("ss").cast("double") / (
        F.col("nd") * (F.col("nd") - 1) * F.col("s")
    ).cast("double")
    return s2.select(
        "event_type",
        F.col("nd").alias("n_days"),
        F.round(F.col("s") / F.col("nd"), 6).alias("mean_daily"),
        F.round(disp, 6).alias("dispersion_index"),
        F.round((F.col("nd") - 1).cast("double") * disp, 6).alias("chi2"),
        (disp > F.lit(DISP_OVER)).alias("overdispersed"),
    ).orderBy("event_type")


POISSON_DISPERSION_SQL = f"""
WITH {_GRID_SQL}, tot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS s, COUNT(*) AS nd
  FROM grid GROUP BY event_type
), s2 AS (
  SELECT grid.event_type, nd, s,
         CAST(SUM(CAST(nd * y - s AS DECIMAL(19,0)) * CAST(nd * y - s AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS ss
  FROM grid JOIN tot ON grid.event_type = tot.event_type
  GROUP BY grid.event_type, nd, s
)
SELECT event_type, nd AS n_days,
       ROUND(s / nd, 6) AS mean_daily,
       ROUND(CAST(ss AS DOUBLE) / CAST(nd * (nd - 1) * s AS DOUBLE), 6) AS dispersion_index,
       ROUND(CAST(nd - 1 AS DOUBLE)
             * (CAST(ss AS DOUBLE) / CAST(nd * (nd - 1) * s AS DOUBLE)), 6) AS chi2,
       CAST(ss AS DOUBLE) / CAST(nd * (nd - 1) * s AS DOUBLE) > {DISP_OVER} AS overdispersed
FROM s2
ORDER BY event_type
"""

# -------------------------------------------------- Durbin-Watson
DW_POS_BAND = 1.5   # DW below ⇒ positive serial correlation
DW_NEG_BAND = 2.5   # DW above ⇒ negative serial correlation


def durbin_watson_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic on mean-detrended per-type daily
    counts: DW = Σ(e_t − e_{t−1})²/Σe_t², the regression-residual
    serial-correlation screen (≈2 independent, →0 positively
    correlated, →4 alternating) — the one-number confirmation of what
    acf_daily_counts shows lag by lag.

    With e_t = D·y_t − S the D² scale cancels in the ratio, so both
    sums are exact BIGINT over the grid and its (d, d+1) adjacency
    equality join; DW is one exact-integer ratio and the band flags
    compare that identical double to literals.
    """
    grid = _daily_grid(spark, sf_dir)
    tot = grid.groupBy("event_type").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("nd")
    )
    g = grid.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "d",
        (F.col("nd") * F.col("y") - F.col("s")).alias("e"),
    )
    den = g.groupBy("event_type").agg(
        F.sum(F.col("e").cast("decimal(19,0)") * F.col("e").cast("decimal(19,0)")).alias("see"),
        F.count(F.lit(1)).alias("nd"),
    )
    num = (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") == F.col("a.d") + 1),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                (F.col("b.e") - F.col("a.e")).cast("decimal(19,0)")
                * (F.col("b.e") - F.col("a.e")).cast("decimal(19,0)")
            ).alias("sdd")
        )
    )
    j = num.join(den, "event_type")
    dw = F.col("sdd").cast("double") / F.col("see").cast("double")
    return j.select(
        "event_type",
        F.col("nd").alias("n_days"),
        F.round(dw, 6).alias("dw"),
        (dw < F.lit(DW_POS_BAND)).alias("positive_autocorr"),
        (dw > F.lit(DW_NEG_BAND)).alias("negative_autocorr"),
    ).orderBy("event_type")


DURBIN_WATSON_SQL = f"""
WITH {_GRID_SQL}, tot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS s, COUNT(*) AS nd
  FROM grid GROUP BY event_type
), g AS (
  SELECT grid.event_type, d, nd * y - s AS e
  FROM grid JOIN tot ON grid.event_type = tot.event_type
), den AS (
  SELECT event_type, CAST(SUM(CAST(e AS DECIMAL(19,0)) * CAST(e AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS see, COUNT(*) AS nd
  FROM g GROUP BY event_type
), num AS (
  SELECT a.event_type,
         CAST(SUM(CAST(b.e - a.e AS DECIMAL(19,0)) * CAST(b.e - a.e AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sdd
  FROM g a JOIN g b ON a.event_type = b.event_type AND b.d = a.d + 1
  GROUP BY a.event_type
)
SELECT num.event_type, nd AS n_days,
       ROUND(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE), 6) AS dw,
       CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE) < {DW_POS_BAND} AS positive_autocorr,
       CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE) > {DW_NEG_BAND} AS negative_autocorr
FROM num JOIN den ON num.event_type = den.event_type
ORDER BY num.event_type
"""


# ------------------------------------------------ variance-ratio test
VR_QS = [2, 5]
VR_TREND = 1.2     # documented regime bands
VR_REVERT = 0.8


def variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test on per-type daily counts:
    VR(q) = Var(q-day block sums)/(q·Var(daily)) ≈ 1 for serially
    independent days, > 1 when shocks persist (trending), < 1 when
    they mean-revert — the horizon-scaling complement to
    durbin_watson_stat's one-lag view.

    On the truncated complete-block series (L = B·q days) the ratio
    ALGEBRAICALLY collapses to ΣE_b²/Σe_t² with e_t = L·y_t − S' and
    E_b the per-block sums of e — every scale factor cancels, so VR
    is an exact BIGINT ratio with zero quantization. Blocks come from
    d div q on the bounded grid; both q values ride one explode.
    """
    grid = _daily_grid(spark, sf_dir)
    qs = F.explode(F.array(*[F.lit(q) for q in VR_QS])).alias("q")
    gq = grid.select("event_type", "d", "y", qs)
    nd = grid.groupBy("event_type").agg(F.count(F.lit(1)).alias("nd"))
    trunc = (
        gq.join(F.broadcast(nd), "event_type")
        .filter(F.col("d") < F.col("q") * F.expr("nd div q"))
        .select("event_type", "q", "d", "y")
    )
    tot = trunc.groupBy("event_type", "q").agg(
        F.sum("y").alias("sp"), F.count(F.lit(1)).alias("ll")
    )
    e = trunc.join(F.broadcast(tot), ["event_type", "q"]).select(
        "event_type",
        "q",
        F.expr("d div q").alias("b"),
        (F.col("ll") * F.col("y") - F.col("sp")).alias("e"),
    )
    den = e.groupBy("event_type", "q").agg(
        F.sum(F.col("e").cast("decimal(19,0)") * F.col("e").cast("decimal(19,0)")).alias("see")
    )
    blocks = e.groupBy("event_type", "q", "b").agg(F.sum("e").alias("eb"))
    num = blocks.groupBy("event_type", "q").agg(
        F.sum(F.col("eb").cast("decimal(19,0)") * F.col("eb").cast("decimal(19,0)")).alias("sbb"),
        F.count(F.lit(1)).alias("n_blocks"),
    )
    j = num.join(den, ["event_type", "q"])
    vr = F.col("sbb").cast("double") / F.col("see").cast("double")
    return j.select(
        "event_type",
        "q",
        "n_blocks",
        F.round(vr, 6).alias("vr"),
        F.when(vr > F.lit(VR_TREND), F.lit("trending"))
        .when(vr < F.lit(VR_REVERT), F.lit("mean_reverting"))
        .otherwise(F.lit("random_walk"))
        .alias("regime"),
    ).orderBy("event_type", "q")


VARIANCE_RATIO_SQL = f"""
WITH {_GRID_SQL}, nd AS (
  SELECT event_type, COUNT(*) AS nd FROM grid GROUP BY event_type
), gq AS (
  SELECT grid.event_type, q.q, d, y, nd.nd
  FROM grid
  CROSS JOIN (SELECT UNNEST([{", ".join(str(q) for q in VR_QS)}]) AS q) q
  JOIN nd ON grid.event_type = nd.event_type
  WHERE d < q.q * (nd.nd // q.q)
), tot AS (
  SELECT event_type, q, CAST(SUM(y) AS BIGINT) AS sp, COUNT(*) AS ll
  FROM gq GROUP BY event_type, q
), e AS (
  SELECT gq.event_type, gq.q, gq.d // gq.q AS b,
         tot.ll * gq.y - tot.sp AS e
  FROM gq JOIN tot ON gq.event_type = tot.event_type AND gq.q = tot.q
), den AS (
  SELECT event_type, q, CAST(SUM(CAST(e AS DECIMAL(19,0)) * CAST(e AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS see
  FROM e GROUP BY event_type, q
), blocks AS (
  SELECT event_type, q, b, CAST(SUM(e) AS BIGINT) AS eb
  FROM e GROUP BY event_type, q, b
), num AS (
  SELECT event_type, q, CAST(SUM(CAST(eb AS DECIMAL(19,0)) * CAST(eb AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sbb,
         COUNT(*) AS n_blocks
  FROM blocks GROUP BY event_type, q
)
SELECT num.event_type, num.q, n_blocks,
       ROUND(CAST(sbb AS DOUBLE) / CAST(see AS DOUBLE), 6) AS vr,
       CASE WHEN CAST(sbb AS DOUBLE) / CAST(see AS DOUBLE) > {VR_TREND} THEN 'trending'
            WHEN CAST(sbb AS DOUBLE) / CAST(see AS DOUBLE) < {VR_REVERT} THEN 'mean_reverting'
            ELSE 'random_walk' END AS regime
FROM num JOIN den ON num.event_type = den.event_type AND num.q = den.q
ORDER BY num.event_type, num.q
"""
