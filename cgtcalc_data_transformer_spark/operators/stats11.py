"""Round-11 engine staples: distribution distances (Wasserstein-1,
Jensen-Shannon / Hellinger / total-variation panel), rank dispersion
(Ansari-Bradley), ordinal association (gamma + Somers' d), inequality
(Atkinson), privacy audits (l-diversity, t-closeness), long-memory
(Hurst rescaled range), parametric survival (Weibull fit over the
Kaplan-Meier curve), sequential testing (SPRT), and multiple-testing
machinery (Holm step-down, Fisher's combined meta-test).

Reference parity note: the reference (cgtcalc-data-transformer,
~732 LoC broker-CSV ETL, `/root/reference/index.js`) has no analytics
surface — these are engine extensions in the SURVEY.md §2.2 sense,
each riding machinery already proven here (the 50-value quantity
grid, the duration-domain risk table, the A&S normal tail, the
bounded theta-join convention).

Engine-exactness discipline (stats_ext conventions): bounded grids
(50 quantity values, 11 balance bands, ≤125 quasi-identifier groups,
power-of-2 R/S blocks), integer counts everywhere, int/int division
and sqrt as the only unquantized double ops, floor(x·S + 0.5)
quantization BEFORE every cross-engine sum of ln/rational terms.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.operators.events import KM_S
from cgtcalc_data_transformer_spark.operators.stats9 import NAT_S
from cgtcalc_data_transformer_spark.operators.stats10 import (
    MICRO,
    _D19,
    _quantity_value_counts,
    _VALS_SQL,
)
from cgtcalc_data_transformer_spark.operators.timeseries import (
    DAY_NS,
    rate_change_ranked,
    _RATE_RANKED_SQL,
)
from cgtcalc_data_transformer_spark.sources.tpch import load_events, load_table

Z_CRIT_5PCT = 1.959964  # two-sided 5% normal critical value


# ------------------------------------------------- Wasserstein-1 (EMD)
def wasserstein_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance between the 'F' and 'O'
    lineitem quantity distributions: W₁ = ∫|F_A(x) − F_B(x)|dx — the
    distribution-shift measure that, unlike KS/CvM/AD, reads in the
    UNITS of the variable ("the distributions are ~0.3 quantity units
    apart"), which is what drift dashboards actually want to show.

    On the bounded 50-value grid the integral is the exact finite sum
    Σ_v |CA_v/n_a − CB_v/n_b| · (next(v) − v) over cells with a
    successor (the top cell's CDF gap is identically 0). Inclusive
    cumulative counts and the successor both come from broadcast
    theta joins over the 50-row frame; each cell term is quantized
    floor(x·1e6 + 0.5) before the DECIMAL(38,0) sum, so the total is
    exact at any row count and the only data-sized work is the one
    value-count aggregation.
    """
    vals = _quantity_value_counts(spark, sf_dir)
    cum = (
        vals.alias("p")
        .join(F.broadcast(vals.alias("q")), F.col("q.v") <= F.col("p.v"))
        .groupBy(F.col("p.v").alias("v"))
        .agg(
            F.sum("q.ca").alias("cum_a"),
            F.sum("q.cb").alias("cum_b"),
        )
    )
    nxt = (
        vals.alias("p")
        .join(F.broadcast(vals.alias("r")), F.col("r.v") > F.col("p.v"))
        .groupBy(F.col("p.v").alias("v"))
        .agg(F.min("r.v").alias("nv"))
    )
    tots = vals.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = cum.join(nxt, "v").crossJoin(F.broadcast(tots))
    gap = (
        F.abs(
            F.col("cum_a").cast("double") / F.col("na").cast("double")
            - F.col("cum_b").cast("double") / F.col("nb").cast("double")
        )
        * (F.col("nv") - F.col("v")).cast("double")
    )
    termq = F.floor(gap * F.lit(float(MICRO)) + F.lit(0.5)).cast("decimal(38,0)")
    return (
        j.groupBy("na", "nb")
        .agg(F.sum(termq).alias("wq"))
        .select(
            "na",
            "nb",
            F.col("wq").cast("long").alias("w1_micro"),
        )
    )


WASSERSTEIN_SQL = f"""
WITH {_VALS_SQL}, cum AS (
  SELECT p.v, CAST(SUM(q.ca) AS BIGINT) AS cum_a,
         CAST(SUM(q.cb) AS BIGINT) AS cum_b
  FROM vals p JOIN vals q ON q.v <= p.v
  GROUP BY p.v
), nxt AS (
  SELECT p.v, MIN(r.v) AS nv FROM vals p JOIN vals r ON r.v > p.v GROUP BY p.v
), tots AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM vals
)
SELECT na, nb,
       CAST(CAST(SUM(CAST(floor(
         abs(CAST(cum_a AS DOUBLE) / na - CAST(cum_b AS DOUBLE) / nb)
         * (nv - cum.v) * {MICRO} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0))
       AS BIGINT) AS w1_micro
FROM cum JOIN nxt ON cum.v = nxt.v CROSS JOIN tots
GROUP BY na, nb
"""


# ------------------------------- JS / Hellinger / total-variation panel
def distribution_distance_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-divergence panel between the 'F' and 'O' quantity
    distributions: total variation (the worst-case probability gap),
    Hellinger (the geometric middle ground), and Jensen-Shannon
    divergence in nats (the symmetrized, always-finite KL that
    corpus-mix monitoring standardizes on). Three views of the same
    pair: TV bounds decision regret, JS bounds TV² (Pinsker-style),
    Hellinger² sits between halved TV and JS.

    One pass: per-cell (p_v, q_v) shares on the 50-value grid from
    one count aggregation + a 1-row totals broadcast; each term is
    quantized to the 1e-9 grid before the exact integer sum (zero
    shares contribute 0 by the standard 0·ln 0 = 0 convention —
    F.when guards, no NaN path). Final sqrt for Hellinger is
    correctly-rounded IEEE over an exact rational.
    """
    vals = _quantity_value_counts(spark, sf_dir)
    tots = vals.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = vals.crossJoin(F.broadcast(tots))
    p = F.col("ca").cast("double") / F.col("na").cast("double")
    q = F.col("cb").cast("double") / F.col("nb").cast("double")
    m = (p + q) / F.lit(2.0)
    sc = F.lit(float(NAT_S))

    def q9(x):
        return F.floor(x * sc + F.lit(0.5)).cast("long")

    tv_t = q9(F.abs(p - q) / F.lit(2.0))
    hl_t = q9((F.sqrt(p) - F.sqrt(q)) * (F.sqrt(p) - F.sqrt(q)) / F.lit(2.0))
    js_t = q9(
        F.when(p > 0, p / F.lit(2.0) * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(q > 0, q / F.lit(2.0) * F.log(q / m)).otherwise(F.lit(0.0))
    )
    s = j.groupBy("na", "nb").agg(
        F.sum(tv_t).alias("tvq"),
        F.sum(hl_t).alias("hlq"),
        F.sum(js_t).alias("jsq"),
    )
    mic = F.lit(float(MICRO))
    return s.select(
        "na",
        "nb",
        F.floor(F.col("tvq").cast("double") / sc * mic + F.lit(0.5))
        .cast("long")
        .alias("tv_micro"),
        F.floor(F.sqrt(F.col("hlq").cast("double") / sc) * mic + F.lit(0.5))
        .cast("long")
        .alias("hellinger_micro"),
        F.floor(F.col("jsq").cast("double") / sc * mic + F.lit(0.5))
        .cast("long")
        .alias("js_micro"),
    )


DIST_PANEL_SQL = f"""
WITH {_VALS_SQL}, tots AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM vals
), terms AS (
  SELECT na, nb,
         CAST(floor(abs(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                    / 2.0 * {NAT_S} + 0.5) AS BIGINT) AS tvq,
         CAST(floor((sqrt(CAST(ca AS DOUBLE) / na) - sqrt(CAST(cb AS DOUBLE) / nb))
                    * (sqrt(CAST(ca AS DOUBLE) / na) - sqrt(CAST(cb AS DOUBLE) / nb))
                    / 2.0 * {NAT_S} + 0.5) AS BIGINT) AS hlq,
         CAST(floor(
           (CASE WHEN ca > 0 THEN CAST(ca AS DOUBLE) / na / 2.0
                 * ln((CAST(ca AS DOUBLE) / na)
                      / ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2.0))
            ELSE 0.0 END
            +
            CASE WHEN cb > 0 THEN CAST(cb AS DOUBLE) / nb / 2.0
                 * ln((CAST(cb AS DOUBLE) / nb)
                      / ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2.0))
            ELSE 0.0 END) * {NAT_S} + 0.5) AS BIGINT) AS jsq
  FROM vals CROSS JOIN tots
)
SELECT na, nb,
       CAST(floor(CAST(SUM(tvq) AS DOUBLE) / {NAT_S} * {MICRO} + 0.5) AS BIGINT)
         AS tv_micro,
       CAST(floor(sqrt(CAST(SUM(hlq) AS DOUBLE) / {NAT_S}) * {MICRO} + 0.5) AS BIGINT)
         AS hellinger_micro,
       CAST(floor(CAST(SUM(jsq) AS DOUBLE) / {NAT_S} * {MICRO} + 0.5) AS BIGINT)
         AS js_micro
FROM terms GROUP BY na, nb
"""


# ------------------------------------------------ Ansari-Bradley test
def ansari_bradley_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley rank dispersion test between the 'F' and 'O'
    quantity samples (Ansari & Bradley 1960): score every pooled
    observation a_j = min(rank_j, N+1−rank_j) — scores peak at the
    center and fall toward both extremes — and test whether group A's
    score sum W is what random assignment predicts. Small W ⇒ group A
    sits in the tails ⇒ larger spread; the rank-based answer to "same
    scale?" that needs no normality (Levene/Bartlett's assumption).

    Tie handling is exact, not approximate: a tied value block
    occupies ranks lo..hi, and the block's TOTAL score B_v =
    S(hi) − S(lo−1) has the closed form S(k) = k(k+1)/2 for k ≤
    ⌊(N+1)/2⌋ else S(h) + ((N−h)(N−h+1) − (N−k)(N−k+1))/2 — exact
    integers, so midrank averaging never touches a double until the
    final W. Permutation moments come from the same blocks
    (E[W] = n_a·T₁/N, Var[W] = n_a·n_b(Σa² − T₁²/N)/(N(N−1)) — the
    finite-sampling-without-replacement identity), making the z-gate
    tie-correct by construction.

    Overflow routing: S(k) ~ N²/4 crosses int64 around N ≈ 6e9 rows,
    so the closed form runs DOUBLED (2·S(k), no /2 anywhere) with
    DECIMAL(19,0)-cast factors and DECIMAL(38,0) block scores — exact
    at any SF; doubles appear only in the per-cell quantized terms.
    """
    vals = _quantity_value_counts(spark, sf_dir)
    below = (
        vals.alias("p")
        .join(F.broadcast(vals.alias("q")), F.col("q.v") < F.col("p.v"), "left")
        .groupBy(
            F.col("p.v").alias("v"),
            F.col("p.ca").alias("ca"),
            F.col("p.cb").alias("cb"),
        )
        .agg(
            F.coalesce(F.sum(F.col("q.ca") + F.col("q.cb")), F.lit(0)).alias(
                "nbel"
            )
        )
    )
    tots = vals.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = below.crossJoin(F.broadcast(tots))
    n = F.col("na") + F.col("nb")
    h = F.expr("(na + nb + 1) div 2")
    lo1 = F.col("nbel")  # = lo − 1
    hi = F.col("nbel") + F.col("ca") + F.col("cb")
    t = F.col("ca") + F.col("cb")
    nd19, hd19 = n.cast(_D19), h.cast(_D19)

    def s2_of(k):
        # 2·S(k), S(k) = sum_{j=1..k} min(j, N+1-j) — exact decimal
        kd = k.cast(_D19)
        return F.when(k <= h, kd * (kd + 1)).otherwise(
            hd19 * (hd19 + 1)
            + (nd19 - hd19) * (nd19 - hd19 + 1)
            - (nd19 - kd) * (nd19 - kd + 1)
        )

    bv2 = (s2_of(hi) - s2_of(lo1)).alias("bv2")  # 2·(block score sum)
    cells = j.select("v", "ca", "cb", "na", "nb", t.alias("t"), bv2)
    mic = F.lit(float(MICRO))
    bvd = F.col("bv2").cast("double") / F.lit(2.0)
    wq = F.floor(
        F.col("ca").cast("double") * bvd / F.col("t").cast("double") * mic
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    sq2 = F.floor(
        bvd * bvd / F.col("t").cast("double") * mic + F.lit(0.5)
    ).cast("decimal(38,0)")
    s = cells.groupBy("na", "nb").agg(
        F.sum(wq).alias("wq"),
        F.sum(sq2).alias("sq2"),
        F.sum("bv2").alias("t12"),
    )
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    nd = nad + nbd
    w = F.col("wq").cast("double") / mic
    sumsq = F.col("sq2").cast("double") / mic
    t1d = F.col("t12").cast("double") / F.lit(2.0)
    ew = nad * t1d / nd
    varw = nad * nbd * (sumsq - t1d * t1d / nd) / (nd * (nd - F.lit(1.0)))
    z = (w - ew) / F.sqrt(varw)
    return s.select(
        "na",
        "nb",
        F.floor(w * mic + F.lit(0.5)).cast("long").alias("w_micro"),
        F.floor(ew * mic + F.lit(0.5)).cast("long").alias("ew_micro"),
        F.floor(z * mic + F.lit(0.5)).cast("long").alias("z_micro"),
        (F.abs(z) > F.lit(Z_CRIT_5PCT)).alias("significant"),
    )


ANSARI_BRADLEY_SQL = f"""
WITH {_VALS_SQL}, below AS (
  SELECT p.v, p.ca, p.cb,
         CAST(COALESCE(SUM(q.ca + q.cb), 0) AS BIGINT) AS nbel
  FROM vals p LEFT JOIN vals q ON q.v < p.v
  GROUP BY p.v, p.ca, p.cb
), tots AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM vals
), cells AS (
  SELECT v, ca, cb, na, nb, ca + cb AS t,
         (CASE WHEN nbel + ca + cb <= (na + nb + 1) // 2
               THEN CAST(nbel + ca + cb AS HUGEINT) * (nbel + ca + cb + 1)
               ELSE CAST((na + nb + 1) // 2 AS HUGEINT) * ((na + nb + 1) // 2 + 1)
                    + CAST(na + nb - (na + nb + 1) // 2 AS HUGEINT)
                      * (na + nb - (na + nb + 1) // 2 + 1)
                    - CAST(na + nb - nbel - ca - cb AS HUGEINT)
                      * (na + nb - nbel - ca - cb + 1)
          END
          -
          CASE WHEN nbel <= (na + nb + 1) // 2
               THEN CAST(nbel AS HUGEINT) * (nbel + 1)
               ELSE CAST((na + nb + 1) // 2 AS HUGEINT) * ((na + nb + 1) // 2 + 1)
                    + CAST(na + nb - (na + nb + 1) // 2 AS HUGEINT)
                      * (na + nb - (na + nb + 1) // 2 + 1)
                    - CAST(na + nb - nbel AS HUGEINT) * (na + nb - nbel + 1)
          END) AS bv2
  FROM below CROSS JOIN tots
), s AS (
  SELECT na, nb,
         CAST(SUM(CAST(floor(CAST(ca AS DOUBLE) * (CAST(bv2 AS DOUBLE) / 2.0)
                             / t * {MICRO} + 0.5)
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS wq,
         CAST(SUM(CAST(floor((CAST(bv2 AS DOUBLE) / 2.0) * (CAST(bv2 AS DOUBLE) / 2.0)
                             / t * {MICRO} + 0.5)
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq2,
         SUM(bv2) AS t12
  FROM cells GROUP BY na, nb
)
SELECT na, nb,
       CAST(floor(CAST(wq AS DOUBLE) / {MICRO} * {MICRO} + 0.5) AS BIGINT) AS w_micro,
       CAST(floor(CAST(na AS DOUBLE) * (CAST(t12 AS DOUBLE) / 2.0) / (na + nb)
                  * {MICRO} + 0.5) AS BIGINT) AS ew_micro,
       CAST(floor(
         (CAST(wq AS DOUBLE) / {MICRO}
          - CAST(na AS DOUBLE) * (CAST(t12 AS DOUBLE) / 2.0) / (na + nb))
         / sqrt(CAST(na AS DOUBLE) * nb
                * (CAST(sq2 AS DOUBLE) / {MICRO}
                   - (CAST(t12 AS DOUBLE) / 2.0) * (CAST(t12 AS DOUBLE) / 2.0)
                     / (na + nb))
                / (CAST(na + nb AS DOUBLE) * (na + nb - 1.0)))
         * {MICRO} + 0.5) AS BIGINT) AS z_micro,
       abs((CAST(wq AS DOUBLE) / {MICRO}
            - CAST(na AS DOUBLE) * (CAST(t12 AS DOUBLE) / 2.0) / (na + nb))
           / sqrt(CAST(na AS DOUBLE) * nb
                  * (CAST(sq2 AS DOUBLE) / {MICRO}
                     - (CAST(t12 AS DOUBLE) / 2.0) * (CAST(t12 AS DOUBLE) / 2.0)
                       / (na + nb))
                  / (CAST(na + nb AS DOUBLE) * (na + nb - 1.0))))
         > {Z_CRIT_5PCT} AS significant
FROM s
"""


# ------------------------------- gamma / Somers' d ordinal association
_DK = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"  # stats_ext._DK


def ordinal_association_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma and both Somers' d coefficients for
    l_quantity × l_discount — the ordinal-association panel that
    completes kendall_tau_binned: gamma ignores ties entirely
    ((C−D)/(C+D)), Somers' d penalizes ties on the DEPENDENT side
    only (d_yx = (C−D)/(pairs not tied on X)) — the directional
    effect size ordinal-outcome models report.

    Same exact-pair-accounting shape as kendall_tau_binned: all
    counting on the bounded 50×11 cell grid (two theta self-joins
    for C and D, marginal tie sums), DECIMAL(19,0)-cast factors and
    DECIMAL(38,0) sums so nothing overflows at any SF; every pair
    of rows falls in exactly one of {concordant, discordant, tied-X,
    tied-Y-only} and the three denominators are assembled from the
    doubled tie identities, no window, no sort.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.expr(_DK).alias("y"),
    )
    cells = li.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    pair_term = F.col("a.c").cast(_D19) * F.col("b.c").cast(_D19)
    a, b = cells.alias("a"), cells.alias("b")
    conc = a.join(
        b, (F.col("b.x") > F.col("a.x")) & (F.col("b.y") > F.col("a.y"))
    ).agg(F.sum(pair_term).alias("cc"))
    disc = a.join(
        b, (F.col("b.x") > F.col("a.x")) & (F.col("b.y") < F.col("a.y"))
    ).agg(F.sum(pair_term).alias("dd"))
    mx = cells.groupBy("x").agg(F.sum("c").alias("cx"))
    my = cells.groupBy("y").agg(F.sum("c").alias("cy"))
    tx = mx.agg(
        F.sum("cx").alias("n"),
        F.sum(F.col("cx").cast(_D19) * (F.col("cx") - 1).cast(_D19)).alias(
            "t1x2"
        ),
    )
    ty = my.agg(
        F.sum(F.col("cy").cast(_D19) * (F.col("cy") - 1).cast(_D19)).alias(
            "t1y2"
        )
    )
    s = (
        conc.crossJoin(F.broadcast(disc))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    cd = (F.col("cc") - F.col("dd")).cast("double")
    n0x2 = F.col("n").cast(_D19) * (F.col("n") - 1).cast(_D19)
    gamma = cd / (F.col("cc") + F.col("dd")).cast("double")
    d_yx = cd / ((n0x2 - F.col("t1x2")).cast("double") / F.lit(2.0))
    d_xy = cd / ((n0x2 - F.col("t1y2")).cast("double") / F.lit(2.0))
    return s.select(
        F.lit("l_quantity~l_discount").alias("pair"),
        "n",
        # BIGINT, not DOUBLE (ADVICE r11): pair counts scale N²/2 and
        # lose integer exactness past 2^53 as doubles; as BIGINT they
        # stay exact to 2^63 (N ≈ 4.3e9 rows) and past that the ANSI
        # decimal→long cast fails LOUDLY instead of silently rounding
        # — widen to DECIMAL(38,0) output if that SF is ever real.
        F.col("cc").cast("long").alias("concordant"),
        F.col("dd").cast("long").alias("discordant"),
        F.round(gamma, 6).alias("gamma"),
        F.round(d_yx, 6).alias("somers_d_yx"),
        F.round(d_xy, 6).alias("somers_d_xy"),
    )


ORDINAL_ASSOC_SQL = f"""
WITH rows_kv AS (
  SELECT CAST(l_quantity AS BIGINT) AS x, {_DK} AS y FROM lineitem
), cells AS (
  SELECT x, y, COUNT(*) AS c FROM rows_kv GROUP BY x, y
), conc AS (
  SELECT CAST(SUM(CAST(a.c AS DECIMAL(19,0)) * CAST(b.c AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS cc
  FROM cells a JOIN cells b ON b.x > a.x AND b.y > a.y
), disc AS (
  SELECT CAST(SUM(CAST(a.c AS DECIMAL(19,0)) * CAST(b.c AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS dd
  FROM cells a JOIN cells b ON b.x > a.x AND b.y < a.y
), tx AS (
  SELECT CAST(SUM(cx) AS BIGINT) AS n,
         CAST(SUM(CAST(cx AS DECIMAL(19,0)) * CAST(cx - 1 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS t1x2
  FROM (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM cells GROUP BY x)
), ty AS (
  SELECT CAST(SUM(CAST(cy AS DECIMAL(19,0)) * CAST(cy - 1 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS t1y2
  FROM (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM cells GROUP BY y)
)
SELECT 'l_quantity~l_discount' AS pair, n,
       CAST(cc AS BIGINT) AS concordant, CAST(dd AS BIGINT) AS discordant,
       ROUND(CAST(cc - dd AS DOUBLE) / CAST(cc + dd AS DOUBLE), 6) AS gamma,
       ROUND(CAST(cc - dd AS DOUBLE)
             / (CAST(CAST(n AS DECIMAL(19,0)) * CAST(n - 1 AS DECIMAL(19,0))
                     - t1x2 AS DOUBLE) / 2.0), 6) AS somers_d_yx,
       ROUND(CAST(cc - dd AS DOUBLE)
             / (CAST(CAST(n AS DECIMAL(19,0)) * CAST(n - 1 AS DECIMAL(19,0))
                     - t1y2 AS DOUBLE) / 2.0), 6) AS somers_d_xy
FROM conc, disc, tx, ty
"""


# ---------------------------------------------------- Atkinson index
ATK_S = 10**9  # per-entity term quantization (theil_index recipe)


def atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality indices over per-customer total spend at
    three inequality aversions (Atkinson 1970): A(0.5) = 1 −
    (mean(√(x/μ)))², A(1) = 1 − geomean(x)/μ, A(2) = 1 −
    harmonic_mean(x)/μ — the welfare-grounded complement to
    gini_concentration and theil_index ("what fraction of total
    spend could be given up if it were split equally, at aversion
    ε"), and the only inequality family whose parameter states WHOSE
    inequality you care about (ε→0 top-sensitive, ε→2 bottom-
    sensitive).

    theil_index shape exactly: one per-customer DECIMAL(28,6) spend
    rollup, a 1-row totals broadcast, then each entity's √(x/μ),
    ln(x/μ) and μ/x terms quantized to the 1e-9 grid BEFORE the
    exact integer sums; the three indices are closed forms over
    those sums. All O(customers), one shuffle.
    """
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("x"))
    )
    tot = spend.agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
    j = spend.crossJoin(F.broadcast(tot))
    xr = F.col("x").cast("double") / (
        F.col("s").cast("double") / F.col("n").cast("double")
    )
    sc = F.lit(float(ATK_S))
    hq = F.floor(F.sqrt(xr) * sc + F.lit(0.5)).cast("long")  # √(x/μ)
    gq = F.floor(F.log(xr) * sc + F.lit(0.5)).cast("long")   # ln(x/μ)
    iq = F.floor(F.lit(1.0) / xr * sc + F.lit(0.5)).cast("long")  # μ/x
    s = (
        j.select(hq.alias("hq"), gq.alias("gq"), iq.alias("iq"), "n")
        .groupBy("n")
        .agg(
            F.sum("hq").alias("sh"),
            F.sum("gq").alias("sg"),
            F.sum("iq").alias("si"),
        )
    )
    nd = F.col("n").cast("double")
    mean_h = F.col("sh").cast("double") / sc / nd
    mean_g = F.col("sg").cast("double") / sc / nd
    mean_i = F.col("si").cast("double") / sc / nd
    mic = F.lit(float(MICRO))
    return s.select(
        F.col("n").alias("n_entities"),
        F.floor((F.lit(1.0) - mean_h * mean_h) * mic + F.lit(0.5))
        .cast("long")
        .alias("atkinson_05_micro"),
        F.floor((F.lit(1.0) - F.exp(mean_g)) * mic + F.lit(0.5))
        .cast("long")
        .alias("atkinson_1_micro"),
        F.floor((F.lit(1.0) - F.lit(1.0) / mean_i) * mic + F.lit(0.5))
        .cast("long")
        .alias("atkinson_2_micro"),
    )


ATKINSON_SQL = f"""
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS x
  FROM orders GROUP BY o_custkey
), tot AS (
  SELECT SUM(x) AS s, COUNT(*) AS n FROM spend
), terms AS (
  SELECT n,
         CAST(floor(sqrt(CAST(x AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                    * {ATK_S} + 0.5) AS BIGINT) AS hq,
         CAST(floor(ln(CAST(x AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                    * {ATK_S} + 0.5) AS BIGINT) AS gq,
         CAST(floor(1.0 / (CAST(x AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                    * {ATK_S} + 0.5) AS BIGINT) AS iq
  FROM spend CROSS JOIN tot
), s AS (
  SELECT n, SUM(hq) AS sh, SUM(gq) AS sg, SUM(iq) AS si
  FROM terms GROUP BY n
)
SELECT n AS n_entities,
       CAST(floor((1.0 - (CAST(sh AS DOUBLE) / {ATK_S} / CAST(n AS DOUBLE))
                         * (CAST(sh AS DOUBLE) / {ATK_S} / CAST(n AS DOUBLE)))
                  * {MICRO} + 0.5) AS BIGINT) AS atkinson_05_micro,
       CAST(floor((1.0 - exp(CAST(sg AS DOUBLE) / {ATK_S} / CAST(n AS DOUBLE)))
                  * {MICRO} + 0.5) AS BIGINT) AS atkinson_1_micro,
       CAST(floor((1.0 - 1.0 / (CAST(si AS DOUBLE) / {ATK_S} / CAST(n AS DOUBLE)))
                  * {MICRO} + 0.5) AS BIGINT) AS atkinson_2_micro
FROM s
"""


# ------------------------------------------------- l-diversity audit
BAL_BAND = "CAST(floor(c_acctbal / 1000.0) AS BIGINT)"  # −1..9, 11 bands
L_MIN = 3  # required distinct sensitive values per equivalence class


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007) over
    the customer table: quasi-identifier = (nation, market segment),
    sensitive attribute = account-balance band (floor(bal/1000), the
    bounded 11-value domain). k-anonymity (k_anonymity_audit) stops
    homogeneity attacks ONLY if every equivalence class also carries
    ≥ l distinct sensitive values — this reports the l histogram:
    for each observed diversity level l, how many classes sit at
    that level, their total population, and whether the level fails
    the l ≥ {L_MIN} policy.

    Two strict aggregations (class → distinct-band count → histogram)
    over equality shuffles; the sensitive domain is bounded so
    count_distinct is exact and cheap at any SF. Output is ≤ 11 rows.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", F.expr(BAL_BAND).alias("band")
    )
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.countDistinct("band").alias("l"),
        F.count(F.lit(1)).alias("size"),
    )
    return (
        classes.groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("size").alias("n_rows"),
            F.min("size").alias("min_class_size"),
        )
        .select(
            "l",
            "n_classes",
            "n_rows",
            "min_class_size",
            (F.col("l") < F.lit(L_MIN)).alias("violates_policy"),
        )
        .orderBy("l")
    )


L_DIVERSITY_SQL = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(DISTINCT {BAL_BAND}) AS BIGINT) AS l,
         COUNT(*) AS size
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT l, COUNT(*) AS n_classes,
       CAST(SUM(size) AS BIGINT) AS n_rows,
       CAST(MIN(size) AS BIGINT) AS min_class_size,
       l < {L_MIN} AS violates_policy
FROM classes GROUP BY l ORDER BY l
"""


# ------------------------------------------------- t-closeness audit
T_CLOSE = 0.2  # EMD threshold (Li, Li & Venkatasubramanian 2007)


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) over the
    same (nation, segment) classes: even an l-diverse class leaks if
    its sensitive-value DISTRIBUTION diverges from the table-wide
    one (skewness attack), so the class-vs-global distance must stay
    ≤ t. Sensitive attribute = the ordinal balance band; distance =
    the ordinal EMD of the t-closeness paper, Σ_k |cumulative
    share gap| / (m−1), on the bounded 11-band domain.

    Shape: one (class × band) count aggregation, the global band
    marginal broadcast onto it, cumulative gaps via the bounded
    band-domain theta join, one row per equivalence class (≤ 125) —
    per-class EMD micro-quantized from exact share rationals, gated
    against t = {T_CLOSE}.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", F.expr(BAL_BAND).alias("band")
    )
    cells = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("c")
    )
    sizes = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("c").alias("sz")
    )
    glob = cust.groupBy("band").agg(F.count(F.lit(1)).alias("g"))
    gtot = glob.agg(F.sum("g").alias("gn"), F.count(F.lit(1)).alias("m"))
    # class × band full grid (bands a class never hits still carry
    # global mass into the cumulative gap) — glob is 11 rows,
    # broadcast onto the ≤125-class key frame
    filled = (
        sizes.join(F.broadcast(glob), F.lit(True))
        .join(cells, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "sz",
            "band",
            "g",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    # cumulative class/global counts up to each band: equality join on
    # the class key + band inequality — per-class 11×11, any SF
    cum = (
        filled.alias("p")
        .join(
            filled.alias("q"),
            (F.col("q.c_nationkey") == F.col("p.c_nationkey"))
            & (F.col("q.c_mktsegment") == F.col("p.c_mktsegment"))
            & (F.col("q.band") <= F.col("p.band")),
        )
        .groupBy(
            F.col("p.c_nationkey").alias("nat"),
            F.col("p.c_mktsegment").alias("seg"),
            F.col("p.sz").alias("sz"),
            F.col("p.band").alias("band"),
        )
        .agg(F.sum("q.c").alias("cum_c"), F.sum("q.g").alias("cum_g"))
    )
    j = cum.crossJoin(F.broadcast(gtot))
    sc = F.lit(float(NAT_S))
    term = F.floor(
        F.abs(
            F.col("cum_c").cast("double") / F.col("sz").cast("double")
            - F.col("cum_g").cast("double") / F.col("gn").cast("double")
        )
        / (F.col("m") - F.lit(1)).cast("double")
        * sc
        + F.lit(0.5)
    ).cast("long")
    mic = F.lit(float(MICRO))
    return (
        j.select("nat", "seg", "sz", term.alias("tq"))
        .groupBy("nat", "seg", "sz")
        .agg(F.sum("tq").alias("eq"))
        .select(
            "nat",
            "seg",
            "sz",
            F.floor(F.col("eq").cast("double") / sc * mic + F.lit(0.5))
            .cast("long")
            .alias("emd_micro"),
            (
                F.col("eq").cast("double") / sc > F.lit(T_CLOSE)
            ).alias("exceeds_t"),
        )
        .orderBy("nat", "seg")
    )


T_CLOSENESS_SQL = f"""
WITH cust AS (
  SELECT c_nationkey, c_mktsegment, {BAL_BAND} AS band FROM customer
), cells AS (
  SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS c
  FROM cust GROUP BY c_nationkey, c_mktsegment, band
), sizes AS (
  SELECT c_nationkey, c_mktsegment, CAST(SUM(c) AS BIGINT) AS sz
  FROM cells GROUP BY c_nationkey, c_mktsegment
), gband AS (
  SELECT band, COUNT(*) AS g FROM cust GROUP BY band
), gtot AS (
  SELECT CAST(SUM(g) AS BIGINT) AS gn, COUNT(*) AS m FROM gband
), filled AS (
  SELECT s.c_nationkey, s.c_mktsegment, s.sz, gl.band, gl.g,
         COALESCE(c.c, 0) AS c
  FROM sizes s CROSS JOIN gband gl
  LEFT JOIN cells c ON c.c_nationkey = s.c_nationkey
   AND c.c_mktsegment = s.c_mktsegment AND c.band = gl.band
), cum AS (
  SELECT p.c_nationkey AS nat, p.c_mktsegment AS seg, p.sz, p.band,
         CAST(SUM(q.c) AS BIGINT) AS cum_c,
         CAST(SUM(q.g) AS BIGINT) AS cum_g
  FROM filled p JOIN filled q
    ON q.c_nationkey = p.c_nationkey AND q.c_mktsegment = p.c_mktsegment
   AND q.band <= p.band
  GROUP BY p.c_nationkey, p.c_mktsegment, p.sz, p.band
), terms AS (
  SELECT nat, seg, sz,
         CAST(floor(abs(CAST(cum_c AS DOUBLE) / sz - CAST(cum_g AS DOUBLE) / gn)
                    / CAST(m - 1 AS DOUBLE) * {NAT_S} + 0.5) AS BIGINT) AS tq
  FROM cum CROSS JOIN gtot
)
SELECT nat, seg, sz,
       CAST(floor(CAST(SUM(tq) AS DOUBLE) / {NAT_S} * {MICRO} + 0.5) AS BIGINT)
         AS emd_micro,
       CAST(SUM(tq) AS DOUBLE) / {NAT_S} > {T_CLOSE} AS exceeds_t
FROM terms GROUP BY nat, seg, sz
ORDER BY nat, seg
"""


# --------------------------------------------- Hurst rescaled range
HURST_SIZES = (4, 8, 16, 32)  # powers of 2: block means are EXACT
# ln(block size) as Python-computed literals so both engines consume
# the identical IEEE constant (never re-derived per engine)
_LN_SIZE_N = {s: math.floor(math.log(float(s)) * 1e9 + 0.5) for s in HURST_SIZES}


def hurst_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily event-count series via rescaled-
    range (R/S) analysis (Hurst 1951; Mandelbrot & Wallis 1969):
    split the zero-filled day series into blocks of 4/8/16/32 days,
    compute each block's R (range of cumulative deviations from the
    block mean) over S (population std), and read H as the slope of
    ln(R/S) against ln(block size). H ≈ 0.5 ⇒ no long memory;
    H > 0.5 ⇒ persistent load (capacity planning must model it);
    H < 0.5 ⇒ mean reversion.

    Engine-exactness by construction: block sizes are powers of two,
    so R/S = R_num/√V_num with R_num = max−min over s·cum_j −
    rank_j·Σy (exact DECIMAL integers) and V_num = s·Σy² − (Σy)²
    (exact) — the ONLY doubles are one correctly-rounded √, one
    ln quantized to 1e-9 per block, and the final 4-point slope
    assembled from integer nano sums through exact DECIMAL products.
    Work: one day rollup, a ×4 literal expand, within-block prefix
    sums via a (block-key equality + day ≤ day) join bounded by 32².
    """
    ev = load_events(spark, sf_dir).select(
        F.expr(f"ts div {DAY_NS}").alias("day")
    )
    bounds = ev.agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
    counts = ev.groupBy("day").agg(F.count(F.lit(1)).alias("y"))
    days = bounds.select(
        F.explode(F.sequence(F.lit(0), F.col("dmax") - F.col("dmin"))).alias(
            "d"
        )
    )
    grid = (
        days.join(
            counts.crossJoin(F.broadcast(bounds)).select(
                (F.col("day") - F.col("dmin")).alias("d"), "y"
            ),
            "d",
            "left",
        )
        .select("d", F.coalesce("y", F.lit(0)).alias("y"))
    )
    sizes = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(s).cast("long") for s in HURST_SIZES])
        ).alias("s")
    )
    # CACHED (r14 plan audit): blocks + both sides of the in-block
    # prefix-sum theta-join reference sized 3x, and pts is re-read by
    # the slope aggregate and the output join — uncached the lineage
    # expansion scanned events 18x
    # (plans/r14/hurst_rescaled_range_before.txt). sized is
    # |days| x |HURST_SIZES| rows, pts is 4 (guide §2.4).
    sized = grid.crossJoin(F.broadcast(sizes)).select(
        "s", "d", "y", F.expr("d div s").alias("b")
    ).cache()
    blocks = (
        sized.groupBy("s", "b")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("y").alias("sum_y"),
            F.sum(F.col("y").cast(_D19) * F.col("y").cast(_D19)).alias(
                "sumsq"
            ),
        )
        .filter(F.col("cnt") == F.col("s"))
    )
    cums = (
        sized.alias("a")
        .join(
            sized.alias("j"),
            (F.col("j.s") == F.col("a.s"))
            & (F.col("j.b") == F.col("a.b"))
            & (F.col("j.d") <= F.col("a.d")),
        )
        .groupBy(
            F.col("a.s").alias("s"), F.col("a.b").alias("b"),
            F.col("a.d").alias("d"),
        )
        .agg(F.sum("j.y").alias("cum"))
    )
    cd = cums.join(blocks, ["s", "b"]).select(
        "s",
        "b",
        "sum_y",
        "sumsq",
        (
            F.col("s").cast(_D19) * F.col("cum").cast(_D19)
            - (F.col("d") - F.col("b") * F.col("s") + 1).cast(_D19)
            * F.col("sum_y").cast(_D19)
        ).alias("cd_num"),
    )
    rb = cd.groupBy("s", "b", "sum_y", "sumsq").agg(
        (F.max("cd_num") - F.min("cd_num")).alias("r_num")
    )
    v_num = (
        F.col("s").cast(_D19) * F.col("sumsq")
        - F.col("sum_y").cast(_D19) * F.col("sum_y").cast(_D19)
    )
    sc = F.lit(float(NAT_S))
    lq = F.floor(
        F.log(
            F.col("r_num").cast("double") / F.sqrt(v_num.cast("double"))
        )
        * sc
        + F.lit(0.5)
    ).cast("long")
    per_s = (
        rb.filter((F.col("r_num") > 0) & (v_num > 0))
        .select("s", lq.alias("lq"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n_blocks"), F.sum("lq").alias("sq"))
    )
    # round-half-up mean in nano units via double floor((2a+n)/(2n)) —
    # identical IEEE both engines, no integer-division sign semantics
    y_nano = F.floor(
        (F.lit(2.0) * F.col("sq").cast("double") + F.col("n_blocks").cast("double"))
        / (F.lit(2.0) * F.col("n_blocks").cast("double"))
    ).cast("long")
    x_nano = F.coalesce(
        *[
            F.when(F.col("s") == s, F.lit(n).cast("long"))
            for s, n in _LN_SIZE_N.items()
        ]
    )
    pts = per_s.select(
        "s", "n_blocks", x_nano.alias("xq"), y_nano.alias("yq")
    ).cache()
    reg = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq").cast(_D19) * F.col("yq").cast(_D19)).alias("sxy"),
        F.sum(F.col("xq").cast(_D19) * F.col("xq").cast(_D19)).alias("sxx"),
    )
    num = (
        F.col("k").cast("decimal(38,0)") * F.col("sxy")
        - F.col("sx").cast(_D19) * F.col("sy").cast(_D19)
    )
    den = (
        F.col("k").cast("decimal(38,0)") * F.col("sxx")
        - F.col("sx").cast(_D19) * F.col("sx").cast(_D19)
    )
    hurst = num.cast("double") / den.cast("double")
    mic = F.lit(float(MICRO))
    h1 = reg.select(
        F.floor(hurst * mic + F.lit(0.5)).cast("long").alias("hurst_micro")
    )
    return (
        pts.crossJoin(F.broadcast(h1))
        .select(
            F.col("s").alias("block_size"),
            "n_blocks",
            F.col("yq").alias("avg_log_rs_nano"),
            "hurst_micro",
        )
        .orderBy("block_size")
    )


_HURST_X_CASE = "CASE s " + " ".join(
    f"WHEN {s} THEN {n}" for s, n in _LN_SIZE_N.items()
) + " END"

HURST_SQL = f"""
WITH ev AS (
  SELECT epoch_ns(ts) // {DAY_NS} AS day FROM events
), bounds AS (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM ev
), counts AS (
  SELECT day, COUNT(*) AS y FROM ev GROUP BY day
), grid AS (
  SELECT gs.d, COALESCE(c.y, 0) AS y
  FROM (SELECT unnest(generate_series(0,
          (SELECT dmax - dmin FROM bounds))) AS d) gs
  LEFT JOIN (SELECT day - (SELECT dmin FROM bounds) AS d, y
             FROM counts) c ON c.d = gs.d
), sized AS (
  SELECT s.s, g.d, g.y, g.d // s.s AS b
  FROM grid g CROSS JOIN (SELECT unnest([{", ".join(str(s) for s in HURST_SIZES)}]) AS s) s
), blocks AS (
  SELECT s, b, COUNT(*) AS cnt, CAST(SUM(y) AS BIGINT) AS sum_y,
         SUM(CAST(y AS HUGEINT) * y) AS sumsq
  FROM sized GROUP BY s, b HAVING COUNT(*) = s
), cums AS (
  SELECT a.s, a.b, a.d, CAST(SUM(j.y) AS BIGINT) AS cum
  FROM sized a JOIN sized j ON j.s = a.s AND j.b = a.b AND j.d <= a.d
  GROUP BY a.s, a.b, a.d
), cd AS (
  SELECT c.s, c.b, bl.sum_y, bl.sumsq,
         CAST(c.s AS HUGEINT) * c.cum
         - CAST(c.d - c.b * c.s + 1 AS HUGEINT) * bl.sum_y AS cd_num
  FROM cums c JOIN blocks bl ON bl.s = c.s AND bl.b = c.b
), rb AS (
  SELECT s, b, sum_y, sumsq, MAX(cd_num) - MIN(cd_num) AS r_num
  FROM cd GROUP BY s, b, sum_y, sumsq
), per_s AS (
  SELECT s, COUNT(*) AS n_blocks,
         CAST(SUM(CAST(floor(ln(CAST(r_num AS DOUBLE)
                  / sqrt(CAST(CAST(s AS HUGEINT) * sumsq
                              - CAST(sum_y AS HUGEINT) * sum_y AS DOUBLE)))
               * {NAT_S} + 0.5) AS BIGINT)) AS BIGINT) AS sq
  FROM rb
  WHERE r_num > 0 AND CAST(s AS HUGEINT) * sumsq - CAST(sum_y AS HUGEINT) * sum_y > 0
  GROUP BY s
), pts AS (
  SELECT s, n_blocks,
         CAST({_HURST_X_CASE} AS BIGINT) AS xq,
         CAST(floor((2.0 * sq + n_blocks) / (2.0 * n_blocks)) AS BIGINT) AS yq
  FROM per_s
), reg AS (
  SELECT COUNT(*) AS k, CAST(SUM(xq) AS BIGINT) AS sx,
         CAST(SUM(yq) AS BIGINT) AS sy,
         SUM(CAST(xq AS HUGEINT) * yq) AS sxy,
         SUM(CAST(xq AS HUGEINT) * xq) AS sxx
  FROM pts
)
SELECT s AS block_size, n_blocks, yq AS avg_log_rs_nano,
       CAST(floor(CAST(k * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / CAST(k * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                  * {MICRO} + 0.5) AS BIGINT) AS hurst_micro
FROM pts CROSS JOIN reg
ORDER BY block_size
"""


# --------------------------------------------- Weibull survival fit
def weibull_survival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric Weibull fit over the Kaplan-Meier TIME-TO-FIRST-
    PURCHASE curve via the classic probability-plot regression:
    S(t) = exp(−(t/λ)^k) ⇔ ln(−ln S(t)) = k·ln t − k·ln λ, so an OLS
    line through the KM points gives shape k (k < 1: conversion
    hazard falls with tenure; k > 1: ripening-to-purchase) and scale
    λ (the characteristic time-to-convert) — the 2-parameter summary
    that lets forecasting EXTRAPOLATE beyond the observed horizon,
    which the non-parametric KM curve cannot. Durations follow the
    logrank_test convention (first purchase − first active day,
    never-purchasers censored at the horizon): churn durations are
    degenerate at small SFs (zero events — the logrank docstring's
    documented trap), purchases exist at every SF.

    KM discipline is events._km_terms' exactly: per-day
    ln(1 − d/n) quantized to 1e-9 before the prefix sum, so ln S(t)
    is an exact integer rational; y = ln(−ls/1e9) and x = ln t are
    re-quantized to nano-units and the OLS closed form runs on exact
    DECIMAL(38,0) sums — the slope is a ratio of exact integers cast
    to double. Points: t ≥ 1, no zero-survival flag, S < 1 (ls < 0).
    """
    ev = load_events(spark, sf_dir)
    act = ev.select(
        "user_id",
        F.expr(f"ts div {DAY_NS}").alias("day"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    horizon = act.agg(F.max("day").alias("h"))
    users = (
        act.groupBy("user_id")
        .agg(
            F.min("day").alias("fd"),
            F.min(F.when(F.col("is_p") == 1, F.col("day"))).alias("pd"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            (F.coalesce(F.col("pd"), F.col("h")) - F.col("fd")).alias("t"),
            F.col("pd").isNotNull().cast("long").alias("event"),
        )
    )
    per_t = users.groupBy("t").agg(
        F.sum("event").alias("d"),
        F.sum(F.lit(1) - F.col("event")).alias("c"),
    )
    risk = (
        per_t.alias("a")
        .join(F.broadcast(per_t.alias("b")), F.col("b.t") >= F.col("a.t"))
        .groupBy(F.col("a.t").alias("t"), F.col("a.d").alias("d"))
        .agg(F.sum(F.col("b.d") + F.col("b.c")).alias("n_risk"))
    )
    li = F.when(
        (F.col("d") > 0) & (F.col("n_risk") > F.col("d")),
        F.floor(
            F.log(
                F.lit(1.0)
                - F.col("d").cast("double") / F.col("n_risk").cast("double")
            )
            * F.lit(float(KM_S))
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    zi = ((F.col("d") > 0) & (F.col("n_risk") == F.col("d"))).cast("long")
    terms = risk.select("t", li.alias("li"), zi.alias("zi"))
    pref = (
        terms.alias("a")
        .join(F.broadcast(terms.alias("b")), F.col("b.t") <= F.col("a.t"))
        .groupBy(F.col("a.t").alias("t"))
        .agg(F.sum("b.li").alias("ls"), F.sum("b.zi").alias("zs"))
    )
    pts = pref.filter(
        (F.col("t") >= 1) & (F.col("zs") == 0) & (F.col("ls") < 0)
    )
    sc = F.lit(float(NAT_S))
    x = F.log(F.col("t").cast("double"))
    y = F.log(-F.col("ls").cast("double") / F.lit(float(KM_S)))
    xq = F.floor(x * sc + F.lit(0.5)).cast("long")
    yq = F.floor(y * sc + F.lit(0.5)).cast("long")
    q = pts.select(xq.alias("xq"), yq.alias("yq"))
    reg = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq").cast(_D19) * F.col("yq").cast(_D19)).alias("sxy"),
        F.sum(F.col("xq").cast(_D19) * F.col("xq").cast(_D19)).alias("sxx"),
        F.sum(F.col("yq").cast(_D19) * F.col("yq").cast(_D19)).alias("syy"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    num = n38 * F.col("sxy") - F.col("sx").cast(_D19) * F.col("sy").cast(_D19)
    den = n38 * F.col("sxx") - F.col("sx").cast(_D19) * F.col("sx").cast(_D19)
    dyy = n38 * F.col("syy") - F.col("sy").cast(_D19) * F.col("sy").cast(_D19)
    k = num.cast("double") / den.cast("double")
    intercept = (
        F.col("sy").cast("double") / sc
        - k * (F.col("sx").cast("double") / sc)
    ) / F.col("n").cast("double")
    lam = F.exp(-intercept / k)
    r2 = (
        num.cast("double")
        * num.cast("double")
        / (den.cast("double") * dyy.cast("double"))
    )
    mic = F.lit(float(MICRO))
    return reg.select(
        F.col("n").alias("n_points"),
        F.floor(k * mic + F.lit(0.5)).cast("long").alias("shape_micro"),
        F.floor(lam * mic + F.lit(0.5)).cast("long").alias("scale_micro"),
        F.floor(r2 * mic + F.lit(0.5)).cast("long").alias("r2_micro"),
    )


WEIBULL_SQL = f"""
WITH act AS (
  SELECT user_id, epoch_ns(ts) // {DAY_NS} AS day,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events
), horizon AS (
  SELECT MAX(day) AS h FROM act
), users AS (
  SELECT COALESCE(pd, h) - fd AS t,
         CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM (SELECT user_id, MIN(day) AS fd,
               MIN(CASE WHEN is_p = 1 THEN day END) AS pd
        FROM act GROUP BY user_id), horizon
), per_t AS (
  SELECT t, CAST(SUM(event) AS BIGINT) AS d,
         CAST(SUM(1 - event) AS BIGINT) AS c
  FROM users GROUP BY t
), risk AS (
  SELECT a.t, a.d, CAST(SUM(b.d + b.c) AS BIGINT) AS n_risk
  FROM per_t a JOIN per_t b ON b.t >= a.t
  GROUP BY a.t, a.d
), terms AS (
  SELECT t,
         CASE WHEN d > 0 AND n_risk > d
              THEN CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                              * {KM_S} + 0.5) AS BIGINT)
              ELSE 0 END AS li,
         CASE WHEN d > 0 AND n_risk = d THEN 1 ELSE 0 END AS zi
  FROM risk
), pref AS (
  SELECT a.t, CAST(SUM(b.li) AS BIGINT) AS ls, CAST(SUM(b.zi) AS BIGINT) AS zs
  FROM terms a JOIN terms b ON b.t <= a.t
  GROUP BY a.t
), q AS (
  SELECT CAST(floor(ln(CAST(t AS DOUBLE)) * {NAT_S} + 0.5) AS BIGINT) AS xq,
         CAST(floor(ln(-CAST(ls AS DOUBLE) / {KM_S}) * {NAT_S} + 0.5) AS BIGINT) AS yq
  FROM pref WHERE t >= 1 AND zs = 0 AND ls < 0
), reg AS (
  SELECT COUNT(*) AS n, CAST(SUM(xq) AS BIGINT) AS sx,
         CAST(SUM(yq) AS BIGINT) AS sy,
         SUM(CAST(xq AS HUGEINT) * yq) AS sxy,
         SUM(CAST(xq AS HUGEINT) * xq) AS sxx,
         SUM(CAST(yq AS HUGEINT) * yq) AS syy
  FROM q
)
SELECT n AS n_points,
       CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                  * {MICRO} + 0.5) AS BIGINT) AS shape_micro,
       CAST(floor(exp(-((CAST(sy AS DOUBLE) / {NAT_S}
                         - (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                            / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                           * (CAST(sx AS DOUBLE) / {NAT_S}))
                        / CAST(n AS DOUBLE))
                      / (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                         / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)))
                  * {MICRO} + 0.5) AS BIGINT) AS scale_micro,
       CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / (CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                     * CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))
                  * {MICRO} + 0.5) AS BIGINT) AS r2_micro
FROM reg
"""


# ------------------------------------------------- SPRT sequential
SPRT_P0 = 0.18   # H0 conversion (purchase share) rate
SPRT_P1 = 0.22   # H1 conversion rate
SPRT_ALPHA = 0.05
SPRT_BETA = 0.05
# LLR increments and Wald boundaries as Python-computed nano literals
# — both twins consume the identical IEEE constants
SPRT_L1_N = math.floor(math.log(SPRT_P1 / SPRT_P0) * 1e9 + 0.5)
SPRT_L0_N = math.floor(math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * 1e9 + 0.5)
SPRT_A_N = math.floor(math.log((1 - SPRT_BETA) / SPRT_ALPHA) * 1e9 + 0.5)
SPRT_B_N = math.floor(math.log(SPRT_BETA / (1 - SPRT_ALPHA)) * 1e9 + 0.5)


def sprt_sequential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test (Wald 1945) replayed
    over the event stream, per deterministic A/B user bucket: the
    cumulative log-likelihood ratio of the daily purchase-conversion
    counts under H1 (p = {SPRT_P1}) vs H0 (p = {SPRT_P0}), walked
    day by day until it crosses a Wald boundary (ln((1−β)/α) above ⇒
    accept H1, ln(β/(1−α)) below ⇒ accept H0) — the "peek as often
    as you like" test every experimentation platform needs because
    fixed-horizon z-tests inflate false positives under continuous
    monitoring.

    Fully integer: the two LLR increments and both boundaries are
    Python-computed nano-unit literals, the cumulative walk is
    counts × constants through DECIMAL(38,0) (exact at any SF), and
    first-crossing days are MIN aggregates over the bounded day
    domain (theta-join prefix convention, no window).
    """
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.expr(f"ts div {DAY_NS}").alias("day"),
    )
    bounds = ev.agg(F.min("day").alias("dmin"))
    variant = F.when(hash_bucket(F.col("user_id"), 2) == 0, "A").otherwise(
        "B"
    )
    daily = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            variant.alias("variant"),
            (F.col("day") - F.col("dmin")).alias("d"),
            (F.col("event_type") == "purchase").cast("long").alias("conv"),
        )
        .groupBy("variant", "d")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c"))
    )
    cum = (
        daily.alias("a")
        .join(
            daily.alias("b"),
            (F.col("b.variant") == F.col("a.variant"))
            & (F.col("b.d") <= F.col("a.d")),
        )
        .groupBy(F.col("a.variant").alias("variant"), F.col("a.d").alias("d"))
        .agg(F.sum("b.n").alias("ncum"), F.sum("b.c").alias("ccum"))
    )
    llr = (
        F.col("ccum").cast(_D19) * F.lit(SPRT_L1_N).cast(_D19)
        + (F.col("ncum") - F.col("ccum")).cast(_D19)
        * F.lit(SPRT_L0_N).cast(_D19)
    ).alias("llr_n")
    walked = cum.select("variant", "d", "ncum", "ccum", llr)
    s = walked.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("ncum").alias("n_total"),
        F.max("ccum").alias("conv_total"),
        F.min(
            F.when(F.col("llr_n") >= F.lit(SPRT_A_N), F.col("d"))
        ).alias("first_h1"),
        F.min(
            F.when(F.col("llr_n") <= F.lit(SPRT_B_N), F.col("d"))
        ).alias("first_h0"),
        F.expr("max_by(llr_n, d)").alias("llr_last"),
    )
    mic = F.lit(float(MICRO))
    decision = (
        F.when(
            F.col("first_h1").isNotNull()
            & (
                F.col("first_h0").isNull()
                | (F.col("first_h1") < F.col("first_h0"))
            ),
            F.lit("accept_h1"),
        )
        .when(F.col("first_h0").isNotNull(), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
    )
    return s.select(
        "variant",
        "n_days",
        "n_total",
        "conv_total",
        decision.alias("decision"),
        F.coalesce(
            F.least(F.col("first_h1"), F.col("first_h0")),
            F.coalesce(F.col("first_h1"), F.col("first_h0"), F.lit(-1)),
        ).alias("cross_day"),
        F.floor(
            F.col("llr_last").cast("double") / F.lit(1e9) * mic + F.lit(0.5)
        )
        .cast("long")
        .alias("llr_final_micro"),
    ).orderBy("variant")


SPRT_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_ns(ts) // {DAY_NS} AS day FROM events
), bounds AS (
  SELECT MIN(day) AS dmin FROM ev
), daily AS (
  SELECT CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::UBIGINT::BIGINT
                   % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         day - (SELECT dmin FROM bounds) AS d,
         COUNT(*) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
), cum AS (
  SELECT a.variant, a.d,
         CAST(SUM(b.n) AS BIGINT) AS ncum, CAST(SUM(b.c) AS BIGINT) AS ccum,
         CAST(SUM(b.c) AS HUGEINT) * {SPRT_L1_N}
         + (CAST(SUM(b.n) AS HUGEINT) - CAST(SUM(b.c) AS HUGEINT)) * {SPRT_L0_N}
           AS llr_n
  FROM daily a JOIN daily b ON b.variant = a.variant AND b.d <= a.d
  GROUP BY a.variant, a.d
), s AS (
  SELECT variant, COUNT(*) AS n_days, MAX(ncum) AS n_total,
         MAX(ccum) AS conv_total,
         MIN(CASE WHEN llr_n >= {SPRT_A_N} THEN d END) AS first_h1,
         MIN(CASE WHEN llr_n <= {SPRT_B_N} THEN d END) AS first_h0,
         max_by(llr_n, d) AS llr_last
  FROM cum GROUP BY variant
)
SELECT variant, n_days, n_total, conv_total,
       CASE WHEN first_h1 IS NOT NULL
                 AND (first_h0 IS NULL OR first_h1 < first_h0)
            THEN 'accept_h1'
            WHEN first_h0 IS NOT NULL THEN 'accept_h0'
            ELSE 'continue' END AS decision,
       COALESCE(LEAST(first_h1, first_h0),
                COALESCE(first_h1, first_h0, -1)) AS cross_day,
       CAST(floor(CAST(llr_n_final AS DOUBLE) / 1000000000.0 * {MICRO} + 0.5)
            AS BIGINT) AS llr_final_micro
FROM (SELECT *, llr_last AS llr_n_final FROM s)
ORDER BY variant
"""


# ------------------------------------------- Holm step-down control
HOLM_ALPHA = 0.05


def holm_bonferroni_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down FWER control (Holm 1979) over the same per-type
    rate-change panel as bh_fdr_control — the uniformly-more-powerful
    replacement for plain Bonferroni when the guarantee needed is
    family-wise error (no false rejection at all), not BH's FDR
    (a controlled FRACTION of false rejections): sort p ascending,
    compare p_(i) against α/(m−i+1), stop at the first failure.

    Shares timeseries.rate_change_ranked verbatim (one scoring +
    ranking definition for all three multiple-testing twins); the
    step-down running max — adj_p(r) = max_{i≤r}(m−i+1)·p_(i), reject
    iff adj_p ≤ α — is the bounded m-row theta join, mirroring BH's
    step-up kmax scan.
    """
    ranked = rate_change_ranked(spark, sf_dir)
    adj = (
        ranked.alias("a")
        .join(F.broadcast(ranked.alias("b")), F.col("b.rank") <= F.col("a.rank"))
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.c1").alias("c1"),
            F.col("a.c2").alias("c2"),
            F.col("a.z").alias("z"),
            F.col("a.p").alias("p"),
            F.col("a.rank").alias("rank"),
        )
        .agg(
            F.max(
                (F.col("b.m") - F.col("b.rank") + 1).cast("double")
                * F.col("b.p")
            ).alias("adj_raw")
        )
    )
    return adj.select(
        "event_type",
        "c1",
        "c2",
        F.round(F.col("z"), 6).alias("z_stat"),
        F.round(F.col("p"), 6).alias("p_value"),
        "rank",
        F.round(F.least(F.lit(1.0), F.col("adj_raw")), 6).alias("adj_p"),
        (F.col("adj_raw") <= F.lit(HOLM_ALPHA)).alias("rejected"),
    ).orderBy("rank", "event_type")


HOLM_SQL = f"""
WITH {_RATE_RANKED_SQL}
SELECT a.event_type, a.c1, a.c2,
       ROUND(a.z, 6) AS z_stat,
       ROUND(a.p, 6) AS p_value,
       a.rank,
       ROUND(LEAST(1.0, MAX(CAST(b.m - b.rank + 1 AS DOUBLE) * b.p)), 6) AS adj_p,
       MAX(CAST(b.m - b.rank + 1 AS DOUBLE) * b.p) <= {HOLM_ALPHA} AS rejected
FROM ranked a JOIN ranked b ON b.rank <= a.rank
GROUP BY a.event_type, a.c1, a.c2, a.z, a.p, a.rank
ORDER BY a.rank, a.event_type
"""


# --------------------------------------- Fisher's combined meta-test
# χ²(df) 5% critical values for the reachable even dof (df = 2m, m =
# |event types|); published 6-dp table values (cross-checked against
# the df=10 value stats9 pins), Wilson-Hilferty cube only beyond.
FISHER_CHI2_CRIT_95 = {
    2: 5.991465, 4: 9.487729, 6: 12.591587, 8: 15.507313,
    10: 18.307038, 12: 21.026070, 14: 23.684791, 16: 26.296228,
    18: 28.869299, 20: 31.410433,
}
_Z95_1SIDED = 1.644854


def fisher_combined_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's combined probability test (Fisher 1932) over the m
    per-type rate-change p-values: X = −2·Σ ln p_i ~ χ²(2m) under the
    global null — the meta-analytic "is ANYTHING moving" gate that
    complements bh_fdr_control/holm (which ask WHICH type moved).
    Sensitive to one strong signal among many nulls, which is the
    regression-detection case monitoring cares about.

    Per-type ln p quantized to the 1e-9 grid before the m-term sum
    (p > 0 always: the A&S 7.1.26 tail is a positive closed form);
    the 5% gate uses exact critical values for the reachable even
    dof and Wilson-Hilferty only beyond the table (the stats9
    cramers_v discipline).
    """
    ranked = rate_change_ranked(spark, sf_dir)
    sc = F.lit(float(NAT_S))
    lq = F.floor(F.log(F.col("p")) * sc + F.lit(0.5)).cast("long")
    s = ranked.select("m", lq.alias("lq")).groupBy("m").agg(
        F.sum("lq").alias("slq")
    )
    x_stat = F.lit(-2.0) * (F.col("slq").cast("double") / sc)
    dof = (F.lit(2) * F.col("m")).cast("long")
    wh_dof = dof.cast("double")
    wh = (
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * wh_dof)
        + F.lit(_Z95_1SIDED) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * wh_dof))
    )
    crit = F.coalesce(
        *[
            F.when(dof == d, F.lit(v))
            for d, v in FISHER_CHI2_CRIT_95.items()
        ],
        wh_dof * wh * wh * wh,
    )
    mic = F.lit(float(MICRO))
    return s.select(
        F.col("m").alias("n_tests"),
        dof.alias("dof"),
        F.floor(x_stat * mic + F.lit(0.5)).cast("long").alias("x_stat_micro"),
        F.floor(crit * mic + F.lit(0.5)).cast("long").alias("crit_micro"),
        (x_stat > crit).alias("significant"),
    )


_FISHER_CRIT_CASE = (
    "CASE dof "
    + " ".join(f"WHEN {d} THEN {v!r}" for d, v in FISHER_CHI2_CRIT_95.items())
    + f" ELSE CAST(dof AS DOUBLE)"
      f" * (1.0 - 2.0 / (9.0 * CAST(dof AS DOUBLE))"
      f"    + {_Z95_1SIDED} * sqrt(2.0 / (9.0 * CAST(dof AS DOUBLE))))"
      f" * (1.0 - 2.0 / (9.0 * CAST(dof AS DOUBLE))"
      f"    + {_Z95_1SIDED} * sqrt(2.0 / (9.0 * CAST(dof AS DOUBLE))))"
      f" * (1.0 - 2.0 / (9.0 * CAST(dof AS DOUBLE))"
      f"    + {_Z95_1SIDED} * sqrt(2.0 / (9.0 * CAST(dof AS DOUBLE)))) END"
)

FISHER_META_SQL = f"""
WITH {_RATE_RANKED_SQL}, s AS (
  SELECT m, CAST(SUM(CAST(floor(ln(p) * {NAT_S} + 0.5) AS BIGINT)) AS BIGINT) AS slq
  FROM ranked GROUP BY m
), f AS (
  SELECT m, CAST(2 * m AS BIGINT) AS dof,
         -2.0 * (CAST(slq AS DOUBLE) / {NAT_S}) AS x_stat
  FROM s
)
SELECT m AS n_tests, dof,
       CAST(floor(x_stat * {MICRO} + 0.5) AS BIGINT) AS x_stat_micro,
       CAST(floor(({_FISHER_CRIT_CASE}) * {MICRO} + 0.5) AS BIGINT) AS crit_micro,
       x_stat > ({_FISHER_CRIT_CASE}) AS significant
FROM f
"""


# ------------------------------- negative-binomial overdispersion fit
def negbin_overdispersion_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments negative-binomial fit of the per-type daily
    count distribution: r = m²/(v−m), p = m/v — the overdispersion
    model a Poisson rate monitor upgrades to the moment v > m says
    arrivals cluster (poisson_dispersion_test DETECTS the
    overdispersion; this op FITS the model you'd then simulate /
    set control limits from). Per event type on the zero-filled day
    grid.

    Everything reduces to exact integers: with sy = Σy and num =
    n·Σy² − sy² (both DECIMAL-exact), the gate v > m is the integer
    compare num > n·sy, r = sy²/(num − n·sy) and p = n·sy/num are
    exact-integer ratios, and mean/variance are the usual int/int
    doubles. One grid aggregation per type, closed forms after.
    """
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
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(
            counts.crossJoin(F.broadcast(bounds)).select(
                "event_type",
                (F.col("day") - F.col("dmin")).alias("d"),
                "y",
            ),
            ["event_type", "d"],
            "left",
        )
        .select("event_type", "d", F.coalesce("y", F.lit(0)).alias("y"))
    )
    s = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y").cast(_D19) * F.col("y").cast(_D19)).alias("syy"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    sy38 = F.col("sy").cast(_D19)
    num = n38 * F.col("syy") - sy38 * sy38  # n²·variance, exact
    nsy = n38 * sy38                        # n²·mean, exact
    mean = F.col("sy").cast("double") / F.col("n").cast("double")
    var = num.cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    over = num > nsy  # v > m, exact integer compare
    r = (sy38 * sy38).cast("double") / (num - nsy).cast("double")
    p = nsy.cast("double") / num.cast("double")
    mic = F.lit(float(MICRO))
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.floor(mean * mic + F.lit(0.5)).cast("long").alias("mean_micro"),
        F.floor(var * mic + F.lit(0.5)).cast("long").alias("var_micro"),
        over.alias("overdispersed"),
        F.when(over, F.floor(r * mic + F.lit(0.5)).cast("long"))
        .otherwise(F.lit(-1))
        .alias("r_micro"),
        F.when(over, F.floor(p * mic + F.lit(0.5)).cast("long"))
        .otherwise(F.lit(-1))
        .alias("p_micro"),
    ).orderBy("event_type")


NEGBIN_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_ns(ts) // {DAY_NS} AS day FROM events
), counts AS (
  SELECT event_type, day, COUNT(*) AS y FROM ev GROUP BY 1, 2
), bounds AS (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM ev
), grid AS (
  SELECT t.event_type, gs.d, CAST(COALESCE(c.y, 0) AS BIGINT) AS y
  FROM (SELECT DISTINCT event_type FROM counts) t
  CROSS JOIN (SELECT UNNEST(generate_series(0,
      (SELECT dmax - dmin FROM bounds))) AS d) gs
  LEFT JOIN (SELECT event_type, day - (SELECT dmin FROM bounds) AS d, y
             FROM counts) c
    ON t.event_type = c.event_type AND gs.d = c.d
), s AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM grid GROUP BY event_type
)
SELECT event_type, n AS n_days,
       CAST(floor(CAST(sy AS DOUBLE) / n * {MICRO} + 0.5) AS BIGINT) AS mean_micro,
       CAST(floor(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                  * {MICRO} + 0.5) AS BIGINT) AS var_micro,
       n * syy - CAST(sy AS HUGEINT) * sy > CAST(n AS HUGEINT) * sy
         AS overdispersed,
       CASE WHEN n * syy - CAST(sy AS HUGEINT) * sy > CAST(n AS HUGEINT) * sy
            THEN CAST(floor(CAST(CAST(sy AS HUGEINT) * sy AS DOUBLE)
                            / CAST(n * syy - CAST(sy AS HUGEINT) * sy
                                   - CAST(n AS HUGEINT) * sy AS DOUBLE)
                            * {MICRO} + 0.5) AS BIGINT)
            ELSE -1 END AS r_micro,
       CASE WHEN n * syy - CAST(sy AS HUGEINT) * sy > CAST(n AS HUGEINT) * sy
            THEN CAST(floor(CAST(CAST(n AS HUGEINT) * sy AS DOUBLE)
                            / CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
                            * {MICRO} + 0.5) AS BIGINT)
            ELSE -1 END AS p_micro
FROM s ORDER BY event_type
"""


# ----------------------------------------------- KPSS stationarity
KPSS_LAGS = 4           # Bartlett-kernel lags (fixed, bounded)
KPSS_CRIT_5PCT = 0.463  # level-stationarity 5% point (KPSS 1992)


def kpss_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test (Kwiatkowski, Phillips, Schmidt &
    Shin 1992) on the total daily event-count series — the
    stationarity NULL companion to the trend tests already here
    (mann_kendall_trend rejects when a trend exists; KPSS rejects
    when the LEVEL wanders, i.e. unit-root-ish behavior): η =
    n⁻²ΣS_t² over the Bartlett long-run variance with {KPSS_LAGS}
    lags. Run both before fitting anything AR-flavored to daily
    volume.

    Exact-integer construction: E_t = n·y_t − Σy clears the mean
    without a double, partial sums and lag products stay DECIMAL,
    and with L = {KPSS_LAGS} and w_j = (L+1−j)/(L+1) the statistic
    collapses to the exact integer ratio (L+1)·ΣSS_t² /
    (n·((L+1)γ₀ + 2Σ(L+1−j)γ_j)) — one double division at the end,
    micro-quantized. Both twins DERIVE the weight collapse from
    KPSS_LAGS, so retuning the bandwidth regrows the lag loop and
    the denominator together.
    """
    ev = load_events(spark, sf_dir).select(
        F.expr(f"ts div {DAY_NS}").alias("day")
    )
    bounds = ev.agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
    counts = ev.groupBy("day").agg(F.count(F.lit(1)).alias("y"))
    grid = (
        bounds.select(
            F.explode(
                F.sequence(F.lit(0), F.col("dmax") - F.col("dmin"))
            ).alias("d")
        )
        .join(
            counts.crossJoin(F.broadcast(bounds)).select(
                (F.col("day") - F.col("dmin")).alias("d"), "y"
            ),
            "d",
            "left",
        )
        .select("d", F.coalesce("y", F.lit(0)).alias("y"))
        # CACHED (r14 plan audit): grid feeds tot AND the demeaned
        # series; e below feeds the partial-sum theta-join (2 refs),
        # γ₀ and every one of the KPSS_LAGS lag joins (2 refs each) —
        # uncached, the lineage expansion scanned events 66x with 264
        # exchanges (plans/r14/kpss_stationarity_before.txt). Both
        # frames are calendar-days-sized (guide §2.4).
        .cache()
    )
    tot = grid.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy"))
    e = grid.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        (
            F.col("n").cast(_D19) * F.col("y").cast(_D19)
            - F.col("sy").cast(_D19)
        ).alias("e"),
    ).cache()
    ss = (
        e.alias("a")
        .join(F.broadcast(e.alias("b")), F.col("b.d") <= F.col("a.d"))
        .groupBy(F.col("a.d").alias("d"), F.col("a.n").alias("n"))
        .agg(F.sum("b.e").alias("ss"))
    )
    num = ss.groupBy("n").agg(
        F.sum(F.col("ss") * F.col("ss")).alias("ss2")
    )
    g0 = e.groupBy("n").agg(F.sum(F.col("e") * F.col("e")).alias("g0"))
    lags = None
    for j in range(1, KPSS_LAGS + 1):
        gj = (
            e.alias("a")
            .join(
                e.alias("b").select(
                    (F.col("d") + j).alias("dj"), F.col("e").alias("ej")
                ),
                F.col("a.d") == F.col("dj"),
            )
            .groupBy("a.n")
            .agg(F.sum(F.col("a.e") * F.col("ej")).alias(f"g{j}"))
            .withColumnRenamed("n", "n_")
        )
        lags = gj if lags is None else lags.join(
            gj.withColumnRenamed("n_", "n_"), "n_"
        )
    s = (
        num.join(g0, "n")
        .join(F.broadcast(lags), F.col("n") == F.col("n_"))
    )
    # Bartlett weights w_j = (L+1-j)/(L+1) cleared of the divisor:
    # den = n * ((L+1)*g0 + 2*SUM_j (L+1-j)*g_j), num scaled by L+1.
    # DERIVED from KPSS_LAGS (ADVICE r11) so editing the constant
    # regrows the lag loop AND the denominator together.
    _L1 = KPSS_LAGS + 1
    wsum = F.lit(_L1 - 1).cast("decimal(38,0)") * F.col("g1")
    for j in range(2, KPSS_LAGS + 1):
        wsum = wsum + F.lit(_L1 - j).cast("decimal(38,0)") * F.col(f"g{j}")
    den = F.col("n").cast("decimal(38,0)") * (
        F.lit(_L1).cast("decimal(38,0)") * F.col("g0")
        + F.lit(2).cast("decimal(38,0)") * wsum
    )
    kpss = (
        F.lit(float(_L1)) * F.col("ss2").cast("double") / den.cast("double")
    )
    mic = F.lit(float(MICRO))
    return s.select(
        F.col("n").alias("n_days"),
        F.floor(kpss * mic + F.lit(0.5)).cast("long").alias("kpss_micro"),
        (kpss < F.lit(KPSS_CRIT_5PCT)).alias("level_stationary"),
    )


# SQL-twin fragments, derived from the same KPSS_LAGS constant as the
# Spark expression above (ADVICE r11 — no hardcoded weight collapse):
_KPSS_GSUBS = ",\n".join(
    f"         (SELECT SUM(a.e * b.e) FROM e a JOIN e b "
    f"ON a.d = b.d + {j}) AS g{j}"
    for j in range(1, KPSS_LAGS + 1)
)
_KPSS_DEN = f"{KPSS_LAGS + 1} * g0 + 2 * (" + " + ".join(
    f"{KPSS_LAGS + 1 - j} * g{j}" for j in range(1, KPSS_LAGS + 1)
) + ")"

KPSS_SQL = f"""
WITH ev AS (
  SELECT epoch_ns(ts) // {DAY_NS} AS day FROM events
), bounds AS (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM ev
), counts AS (
  SELECT day, COUNT(*) AS y FROM ev GROUP BY day
), grid AS (
  SELECT gs.d, CAST(COALESCE(c.y, 0) AS BIGINT) AS y
  FROM (SELECT UNNEST(generate_series(0,
      (SELECT dmax - dmin FROM bounds))) AS d) gs
  LEFT JOIN (SELECT day - (SELECT dmin FROM bounds) AS d, y FROM counts) c
    ON c.d = gs.d
), tot AS (
  SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS sy FROM grid
), e AS (
  SELECT d, n, CAST(n AS HUGEINT) * y - sy AS e FROM grid CROSS JOIN tot
), ss AS (
  SELECT a.d, a.n, SUM(b.e) AS ss FROM e a JOIN e b ON b.d <= a.d
  GROUP BY a.d, a.n
), parts AS (
  SELECT n,
         (SELECT SUM(ss * ss) FROM ss) AS ss2,
         (SELECT SUM(e * e) FROM e) AS g0,
{_KPSS_GSUBS}
  FROM tot
)
SELECT n AS n_days,
       CAST(floor({KPSS_LAGS + 1}.0 * CAST(ss2 AS DOUBLE)
                  / CAST(CAST(n AS HUGEINT)
                         * ({_KPSS_DEN})
                         AS DOUBLE)
                  * {MICRO} + 0.5) AS BIGINT) AS kpss_micro,
       {KPSS_LAGS + 1}.0 * CAST(ss2 AS DOUBLE)
         / CAST(CAST(n AS HUGEINT)
                * ({_KPSS_DEN})
                AS DOUBLE)
         < {KPSS_CRIT_5PCT} AS level_stationary
FROM parts
"""


# -------------------------------------------- Granger causality (lag 1)
GRANGER_F_CRIT = 3.841459  # asymptotic chi2(1) 5% bound for the 1-df F


def granger_causality_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-causality screen between the daily 'view' and
    'purchase' count series, both directions at lag 1: does
    yesterday's x improve today's y prediction beyond yesterday's y
    (F-test of the restricted vs unrestricted OLS)? The standard
    lead-lag triage before anyone claims funnel causality from two
    dashboard lines. The gate uses the asymptotic χ²(1) 5% bound
    {GRANGER_F_CRIT} — at production day counts the F(1, n−3)
    critical value converges to it from above, so the gate is
    mildly conservative at small n (documented, not hidden).

    One zero-filled two-series day grid, ONE lag-1 equality
    self-join, then both directions are closed forms over the same
    nine exact integer moment sums (counts and count products —
    DECIMAL-routed, exact at any SF); the centered-moment Cramer
    solve runs in doubles over those exact integers (a fixed
    expression tree — no aggregation-order nondeterminism).
    """
    ev = load_events(spark, sf_dir).select(
        "event_type", F.expr(f"ts div {DAY_NS}").alias("day")
    )
    bounds = ev.agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("c")
    )
    wide = (
        counts.crossJoin(F.broadcast(bounds))
        .select(
            (F.col("day") - F.col("dmin")).alias("d"),
            F.when(F.col("event_type") == "view", F.col("c"))
            .otherwise(F.lit(0))
            .alias("xv"),
            F.when(F.col("event_type") == "purchase", F.col("c"))
            .otherwise(F.lit(0))
            .alias("yp"),
        )
        .groupBy("d")
        .agg(F.sum("xv").alias("x"), F.sum("yp").alias("y"))
    )
    grid = (
        bounds.select(
            F.explode(
                F.sequence(F.lit(0), F.col("dmax") - F.col("dmin"))
            ).alias("d")
        )
        .join(wide, "d", "left")
        .select(
            "d",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    obs = (
        grid.alias("t")
        .join(
            grid.alias("p").select(
                (F.col("d") + 1).alias("dp"),
                F.col("x").alias("xl"),
                F.col("y").alias("yl"),
            ),
            F.col("t.d") == F.col("dp"),
        )
        .select("t.x", "t.y", "xl", "yl")
    )

    def d19(c):
        return c.cast(_D19)

    s = obs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xl").alias("sxl"),
        F.sum("yl").alias("syl"),
        F.sum(d19(F.col("x")) * d19(F.col("xl"))).alias("sxxl"),
        F.sum(d19(F.col("x")) * d19(F.col("yl"))).alias("sxyl"),
        F.sum(d19(F.col("y")) * d19(F.col("xl"))).alias("syxl"),
        F.sum(d19(F.col("y")) * d19(F.col("yl"))).alias("syyl"),
        F.sum(d19(F.col("x")) * d19(F.col("x"))).alias("sxx"),
        F.sum(d19(F.col("y")) * d19(F.col("y"))).alias("syy"),
        F.sum(d19(F.col("xl")) * d19(F.col("xl"))).alias("sxlxl"),
        F.sum(d19(F.col("yl")) * d19(F.col("yl"))).alias("sylyl"),
        F.sum(d19(F.col("xl")) * d19(F.col("yl"))).alias("sxlyl"),
    )

    def direction(tag, y_, sy_, syy_, own_l, s_own, s_ownown, s_y_own,
                  cross_l, s_cross, s_crosscross, s_y_cross, s_own_cross):
        """F stat for 'cross_l Granger-causes y_' given own lag."""
        md = F.col("m").cast("double")
        syd = F.col(sy_).cast("double")
        cyy = md * F.col(syy_).cast("double") - syd * syd
        col_ = F.col(s_own).cast("double")
        cll = md * F.col(s_ownown).cast("double") - col_ * col_
        cly = md * F.col(s_y_own).cast("double") - col_ * syd
        cxd = F.col(s_cross).cast("double")
        cxx = md * F.col(s_crosscross).cast("double") - cxd * cxd
        cxy = md * F.col(s_y_cross).cast("double") - cxd * syd
        clx = md * F.col(s_own_cross).cast("double") - col_ * cxd
        rss_r = (cyy * cll - cly * cly) / (md * cll)
        det = cll * cxx - clx * clx
        b1 = (cly * cxx - cxy * clx) / det
        b2 = (cxy * cll - cly * clx) / det
        rss_u = (cyy - b1 * cly - b2 * cxy) / md
        f = (rss_r - rss_u) * (md - F.lit(3.0)) / rss_u
        return F.struct(
            F.lit(tag).alias("direction"),
            F.col("m").alias("n_obs"),
            F.floor(f * F.lit(float(MICRO)) + F.lit(0.5))
            .cast("long")
            .alias("f_micro"),
            (f > F.lit(GRANGER_F_CRIT)).alias("significant"),
        )

    both = s.select(
        F.explode(
            F.array(
                direction(
                    "view->purchase", "y", "sy", "syy",
                    "yl", "syl", "sylyl", "syyl",
                    "xl", "sxl", "sxlxl", "syxl", "sxlyl",
                ),
                direction(
                    "purchase->view", "x", "sx", "sxx",
                    "xl", "sxl", "sxlxl", "sxxl",
                    "yl", "syl", "sylyl", "sxyl", "sxlyl",
                ),
            )
        ).alias("r")
    )
    return both.select("r.*").orderBy("direction")


_GRANGER_DIR_SQL = """
  SELECT '{tag}' AS direction, m AS n_obs,
         CAST(floor(
           ((({cyy}) * ({cll}) - ({cly}) * ({cly})) / (CAST(m AS DOUBLE) * ({cll}))
            - (({cyy})
               - (({cly}) * ({cxx}) - ({cxy}) * ({clx}))
                 / (({cll}) * ({cxx}) - ({clx}) * ({clx})) * ({cly})
               - (({cxy}) * ({cll}) - ({cly}) * ({clx}))
                 / (({cll}) * ({cxx}) - ({clx}) * ({clx})) * ({cxy}))
              / CAST(m AS DOUBLE))
           * (CAST(m AS DOUBLE) - 3.0)
           / ((({cyy})
               - (({cly}) * ({cxx}) - ({cxy}) * ({clx}))
                 / (({cll}) * ({cxx}) - ({clx}) * ({clx})) * ({cly})
               - (({cxy}) * ({cll}) - ({cly}) * ({clx}))
                 / (({cll}) * ({cxx}) - ({clx}) * ({clx})) * ({cxy}))
              / CAST(m AS DOUBLE))
           * {MICRO} + 0.5) AS BIGINT) AS f_micro,
         ((({cyy}) * ({cll}) - ({cly}) * ({cly})) / (CAST(m AS DOUBLE) * ({cll}))
          - (({cyy})
             - (({cly}) * ({cxx}) - ({cxy}) * ({clx}))
               / (({cll}) * ({cxx}) - ({clx}) * ({clx})) * ({cly})
             - (({cxy}) * ({cll}) - ({cly}) * ({clx}))
               / (({cll}) * ({cxx}) - ({clx}) * ({clx})) * ({cxy}))
            / CAST(m AS DOUBLE))
         * (CAST(m AS DOUBLE) - 3.0)
         / ((({cyy})
             - (({cly}) * ({cxx}) - ({cxy}) * ({clx}))
               / (({cll}) * ({cxx}) - ({clx}) * ({clx})) * ({cly})
             - (({cxy}) * ({cll}) - ({cly}) * ({clx}))
               / (({cll}) * ({cxx}) - ({clx}) * ({clx})) * ({cxy}))
            / CAST(m AS DOUBLE))
         > {crit} AS significant
  FROM s
"""


def _granger_dir(tag, sy_, syy_, s_own, s_ownown, s_y_own,
                 s_cross, s_crosscross, s_y_cross, s_own_cross):
    md = "CAST(m AS DOUBLE)"
    sub = {
        "cyy": f"{md} * CAST({syy_} AS DOUBLE) - CAST({sy_} AS DOUBLE) * CAST({sy_} AS DOUBLE)",
        "cll": f"{md} * CAST({s_ownown} AS DOUBLE) - CAST({s_own} AS DOUBLE) * CAST({s_own} AS DOUBLE)",
        "cly": f"{md} * CAST({s_y_own} AS DOUBLE) - CAST({s_own} AS DOUBLE) * CAST({sy_} AS DOUBLE)",
        "cxx": f"{md} * CAST({s_crosscross} AS DOUBLE) - CAST({s_cross} AS DOUBLE) * CAST({s_cross} AS DOUBLE)",
        "cxy": f"{md} * CAST({s_y_cross} AS DOUBLE) - CAST({s_cross} AS DOUBLE) * CAST({sy_} AS DOUBLE)",
        "clx": f"{md} * CAST({s_own_cross} AS DOUBLE) - CAST({s_own} AS DOUBLE) * CAST({s_cross} AS DOUBLE)",
    }
    return _GRANGER_DIR_SQL.format(
        tag=tag, MICRO=MICRO, crit=GRANGER_F_CRIT, **sub
    )


GRANGER_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_ns(ts) // {DAY_NS} AS day FROM events
), bounds AS (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM ev
), counts AS (
  SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2
), wide AS (
  SELECT day - (SELECT dmin FROM bounds) AS d,
         CAST(SUM(CASE WHEN event_type = 'view' THEN c ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END) AS BIGINT) AS y
  FROM counts GROUP BY 1
), grid AS (
  SELECT gs.d, COALESCE(w.x, 0) AS x, COALESCE(w.y, 0) AS y
  FROM (SELECT UNNEST(generate_series(0,
      (SELECT dmax - dmin FROM bounds))) AS d) gs
  LEFT JOIN wide w ON w.d = gs.d
), obs AS (
  SELECT t.x, t.y, p.x AS xl, p.y AS yl
  FROM grid t JOIN grid p ON t.d = p.d + 1
), s AS (
  SELECT COUNT(*) AS m,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(xl) AS BIGINT) AS sxl, CAST(SUM(yl) AS BIGINT) AS syl,
         SUM(CAST(x AS HUGEINT) * xl) AS sxxl,
         SUM(CAST(x AS HUGEINT) * yl) AS sxyl,
         SUM(CAST(y AS HUGEINT) * xl) AS syxl,
         SUM(CAST(y AS HUGEINT) * yl) AS syyl,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         SUM(CAST(xl AS HUGEINT) * xl) AS sxlxl,
         SUM(CAST(yl AS HUGEINT) * yl) AS sylyl,
         SUM(CAST(xl AS HUGEINT) * yl) AS sxlyl
  FROM obs
)
{_granger_dir("view->purchase", "sy", "syy", "syl", "sylyl", "syyl",
              "sxl", "sxlxl", "syxl", "sxlyl")}
UNION ALL
{_granger_dir("purchase->view", "sx", "sxx", "sxl", "sxlxl", "sxxl",
              "syl", "sylyl", "sxyl", "sxlyl")}
ORDER BY direction
"""


# ------------------------------------------------ frequent triples
TRIPLE_MIN_SUPPORT = 2
TRIPLE_TOP_K = 20


def frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket frequent-TRIPLE mining over order baskets — the
    A-priori step above frequent_pairs: top-{TRIPLE_TOP_K} part
    triples by co-occurrence support with their independence lift
    sup(abc)·N²/(sup(a)·sup(b)·sup(c)) — the bundle / combo-offer
    primitive that pairs can't see (three items can co-occur far
    above what all three pairwise lifts predict).

    Plan shape mirrors frequent_pairs: triple generation is a
    two-step ordered self-equality-join on l_orderkey (a < b < c),
    fan-out bounded by C(basket, 3) — TPC-H baskets are ≤ 7 lines,
    so ≤ 35 triples per order; the same heavy-tailed-retail basket
    cap caveat applies upstream. Item supports and N reuse the ONE
    cached distinct basket table; lift factors go through double
    BEFORE multiplying (the collocations_pmi overflow discipline);
    final top-K is a TakeOrderedAndProject with full deterministic
    tie-breaking.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .cache()
    )
    n_baskets = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item_sup = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("sup_i"))
    triples = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .join(
            li.alias("c"),
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("b.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
            F.col("c.l_partkey").alias("part_c"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= TRIPLE_MIN_SUPPORT)
    )
    scored = (
        triples.join(
            item_sup.select(
                F.col("l_partkey").alias("part_a"),
                F.col("sup_i").alias("sup_a"),
            ),
            "part_a",
        )
        .join(
            item_sup.select(
                F.col("l_partkey").alias("part_b"),
                F.col("sup_i").alias("sup_b"),
            ),
            "part_b",
        )
        .join(
            item_sup.select(
                F.col("l_partkey").alias("part_c"),
                F.col("sup_i").alias("sup_c"),
            ),
            "part_c",
        )
        .crossJoin(F.broadcast(n_baskets))
        .withColumn(
            "lift_micro",
            F.floor(
                F.col("support").cast("double")
                * F.col("n_baskets").cast("double")
                * F.col("n_baskets").cast("double")
                / (
                    F.col("sup_a").cast("double")
                    * F.col("sup_b").cast("double")
                    * F.col("sup_c").cast("double")
                )
                * F.lit(float(MICRO))
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    return (
        scored.select(
            "part_a", "part_b", "part_c", "support", "lift_micro"
        )
        .orderBy(
            F.desc("support"),
            F.desc("lift_micro"),
            F.asc("part_a"),
            F.asc("part_b"),
            F.asc("part_c"),
        )
        .limit(TRIPLE_TOP_K)
    )


FREQUENT_TRIPLES_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM li
), item_sup AS (
  SELECT l_partkey, COUNT(*) AS sup_i FROM li GROUP BY l_partkey
), triples AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, c.l_partkey AS part_c,
         COUNT(*) AS support
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN li c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
  GROUP BY 1, 2, 3
  HAVING COUNT(*) >= {TRIPLE_MIN_SUPPORT}
)
SELECT part_a, part_b, part_c, support,
       CAST(floor(CAST(support AS DOUBLE)
                  * CAST(n_baskets AS DOUBLE) * CAST(n_baskets AS DOUBLE)
                  / (CAST(sa.sup_i AS DOUBLE) * CAST(sb.sup_i AS DOUBLE)
                     * CAST(sc.sup_i AS DOUBLE))
                  * {MICRO} + 0.5) AS BIGINT) AS lift_micro
FROM triples
JOIN item_sup sa ON sa.l_partkey = part_a
JOIN item_sup sb ON sb.l_partkey = part_b
JOIN item_sup sc ON sc.l_partkey = part_c
CROSS JOIN n
ORDER BY support DESC, lift_micro DESC, part_a ASC, part_b ASC, part_c ASC
LIMIT {TRIPLE_TOP_K}
"""


# ------------------------------------- classifier quality panel (MCC)
def classifier_quality_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass quality panel for the nearest-centroid classifier:
    accuracy, macro-F1 and the multiclass Matthews correlation (the
    R_k statistic — Gorodkin 2004), all from ONE confusion-matrix
    aggregation over the shared per-vector prediction frame
    (embedding_ops._nearest_centroid_pred, the same scoring
    ece_calibration consumes). Accuracy hides class imbalance,
    macro-F1 hides correlation structure; MCC is the single number
    that only rewards doing well on EVERY class — the triple a
    training-data curation loop should watch together.

    MCC = (c·s − Σₖ pₖtₖ) / √((s² − Σpₖ²)(s² − Σtₖ²)) with c = trace,
    s = total, pₖ/tₖ the predicted/actual marginals — all exact
    DECIMAL-routed integers, one √ at the end; per-class F1 terms
    are exact count rationals quantized to 1e-9 before the bounded
    |classes|-row macro average.
    """
    from cgtcalc_data_transformer_spark.operators.embedding_ops import (
        _nearest_centroid_pred,
    )

    pred = _nearest_centroid_pred(spark, sf_dir)
    # CACHED (r14 plan audit): t_m / p_m / diag reference this frame
    # 3x and each reference re-executed the whole per-vector centroid
    # scoring (5 embeddings scans in the physical plan,
    # plans/r14/classifier_quality_panel_before.txt). The frame is
    # bounded (|labels| x |preds| rows), so materializing it once is
    # the guide §2.4 shuffle/pass removal at near-zero memory cost.
    cells = (
        pred.groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    t_m = cells.groupBy("label").agg(F.sum("c").alias("t"))
    p_m = cells.groupBy("pred").agg(F.sum("c").alias("p"))
    diag = cells.filter(F.col("label") == F.col("pred")).select(
        F.col("label").alias("k"), F.col("c").alias("tp")
    )
    per_class = (
        t_m.select(F.col("label").alias("k"), "t")
        .join(p_m.select(F.col("pred").alias("k"), "p"), "k", "left")
        .join(diag, "k", "left")
        .select(
            "k",
            "t",
            F.coalesce("p", F.lit(0)).alias("p"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    sc = F.lit(float(NAT_S))
    f1_q = F.floor(
        F.lit(2.0)
        * F.col("tp").cast("double")
        / (F.col("t") + F.col("p")).cast("double")
        * sc
        + F.lit(0.5)
    ).cast("long")
    agg = per_class.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("t").alias("s"),
        F.sum("tp").alias("trace"),
        F.sum(F.col("p").cast(_D19) * F.col("t").cast(_D19)).alias("spt"),
        F.sum(F.col("p").cast(_D19) * F.col("p").cast(_D19)).alias("spp"),
        F.sum(F.col("t").cast(_D19) * F.col("t").cast(_D19)).alias("stt"),
        F.sum(f1_q).alias("f1q"),
    )
    s38 = F.col("s").cast("decimal(38,0)")
    num = F.col("trace").cast("decimal(38,0)") * s38 - F.col("spt")
    den = (
        (s38 * s38 - F.col("spp")).cast("double")
        * (s38 * s38 - F.col("stt")).cast("double")
    )
    mcc = num.cast("double") / F.sqrt(den)
    mic = F.lit(float(MICRO))
    return agg.select(
        F.col("s").alias("n_vecs"),
        "n_classes",
        F.floor(
            F.col("trace").cast("double") / F.col("s").cast("double") * mic
            + F.lit(0.5)
        )
        .cast("long")
        .alias("accuracy_micro"),
        F.floor(
            F.col("f1q").cast("double")
            / sc
            / F.col("n_classes").cast("double")
            * mic
            + F.lit(0.5)
        )
        .cast("long")
        .alias("macro_f1_micro"),
        F.floor(mcc * mic + F.lit(0.5)).cast("long").alias("mcc_micro"),
    )


# DuckDB twin: derive the prediction CTE from the SHARED per-vector
# scoring prefix (stats10._PER_VEC_SQL — itself pinned to
# embedding_ops.ECE_SQL), so all four consumers score identically by
# construction.
from cgtcalc_data_transformer_spark.operators.embedding_ops import ECE_SC
from cgtcalc_data_transformer_spark.operators.stats10 import _PER_VEC_SQL

_PRED_CTE = _PER_VEC_SQL.split("), flat AS (")[0] + """), predflat AS (
  SELECT vec_id, label, -m.nl AS pred FROM per_vec
)"""

CLASSIFIER_QUALITY_SQL = f"""
WITH {_PRED_CTE}, cells AS (
  SELECT label, pred, COUNT(*) AS c FROM predflat GROUP BY label, pred
), t_m AS (
  SELECT label AS k, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY label
), p_m AS (
  SELECT pred AS k, CAST(SUM(c) AS BIGINT) AS p FROM cells GROUP BY pred
), diag AS (
  SELECT label AS k, c AS tp FROM cells WHERE label = pred
), per_class AS (
  SELECT t_m.k, t, COALESCE(p, 0) AS p, COALESCE(tp, 0) AS tp
  FROM t_m LEFT JOIN p_m ON p_m.k = t_m.k LEFT JOIN diag ON diag.k = t_m.k
), agg AS (
  SELECT COUNT(*) AS n_classes, CAST(SUM(t) AS BIGINT) AS s,
         CAST(SUM(tp) AS BIGINT) AS trace,
         SUM(CAST(p AS HUGEINT) * t) AS spt,
         SUM(CAST(p AS HUGEINT) * p) AS spp,
         SUM(CAST(t AS HUGEINT) * t) AS stt,
         CAST(SUM(CAST(floor(2.0 * tp / (t + p) * {NAT_S} + 0.5) AS BIGINT))
              AS BIGINT) AS f1q
  FROM per_class
)
SELECT s AS n_vecs, n_classes,
       CAST(floor(CAST(trace AS DOUBLE) / s * {MICRO} + 0.5) AS BIGINT)
         AS accuracy_micro,
       CAST(floor(CAST(f1q AS DOUBLE) / {NAT_S} / CAST(n_classes AS DOUBLE)
                  * {MICRO} + 0.5) AS BIGINT) AS macro_f1_micro,
       CAST(floor(CAST(CAST(trace AS HUGEINT) * s - spt AS DOUBLE)
                  / sqrt(CAST(CAST(s AS HUGEINT) * s - spp AS DOUBLE)
                         * CAST(CAST(s AS HUGEINT) * s - stt AS DOUBLE))
                  * {MICRO} + 0.5) AS BIGINT) AS mcc_micro
FROM agg
"""


# --------------------------------------- silhouette (label clusters)
def silhouette_labels_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based, cosine-distance) silhouette of the
    LABEL partition of embedding space (Rousseeuw 1987; the
    medoid-free variant production uses at scale): per vector,
    a = 1 − cos(own centroid), b = 1 − cos(best other centroid),
    s = (b − a)/max(a, b) ∈ [−1, 1] — near 1: labels form tight,
    separated clusters (embedding space supports the labels); near
    0/negative: label boundaries don't exist geometrically, so any
    classifier or semdedup built on these regions is fighting the
    geometry. Per-label mean silhouette + fraction s > 0.

    Rides the FULL score table (embedding_ops._centroid_cosines —
    one aggregation pass, |labels| cosines per vector); own/best-
    other collapse per vector, per-vector s quantized to 1e-9 from
    exact 1e-6-rational cosines, then one bounded per-label rollup.
    """
    from cgtcalc_data_transformer_spark.operators.embedding_ops import (
        _centroid_cosines,
    )

    cosines = _centroid_cosines(spark, sf_dir)
    per_vec = cosines.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.col("cos_i"))
        ).alias("own_i"),
        F.max(
            F.when(F.col("clabel") != F.col("label"), F.col("cos_i"))
        ).alias("oth_i"),
    )
    sc6 = F.lit(1e6)
    a = (sc6 - F.col("own_i").cast("double")) / sc6
    b = (sc6 - F.col("oth_i").cast("double")) / sc6
    sil = F.when(
        F.greatest(a, b) > 0, (b - a) / F.greatest(a, b)
    ).otherwise(F.lit(0.0))
    sq = F.floor(sil * F.lit(float(NAT_S)) + F.lit(0.5)).cast("long")
    per = per_vec.select(
        "label", sq.alias("sq"), (sq > 0).cast("long").alias("pos")
    )
    mic = F.lit(float(MICRO))
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("sq").alias("ssq"),
            F.sum("pos").alias("npos"),
        )
        .select(
            "label",
            "n_vecs",
            F.floor(
                F.col("ssq").cast("double")
                / F.lit(float(NAT_S))
                / F.col("n_vecs").cast("double")
                * mic
                + F.lit(0.5)
            )
            .cast("long")
            .alias("mean_sil_micro"),
            F.floor(
                F.col("npos").cast("double") / F.col("n_vecs").cast("double")
                * mic
                + F.lit(0.5)
            )
            .cast("long")
            .alias("frac_separated_micro"),
        )
        .orderBy("label")
    )


# scored-prefix slice of the shared per-vector SQL (everything up to
# and including the `scored` CTE), then the cosine expression exactly
# as per_vec spells it — one scoring definition across consumers.
_SCORED_PREFIX = _PER_VEC_SQL.split("), per_vec AS (")[0] + ")"

SILHOUETTE_SQL = f"""
WITH {_SCORED_PREFIX}, cosines AS (
  SELECT vec_id, label, clabel,
         CAST(floor(dot_i / sqrt(CAST(cc_i AS DOUBLE) * CAST(xx_i AS DOUBLE))
                    * {ECE_SC} + 0.5) AS BIGINT) AS cos_i
  FROM scored
), per_vec2 AS (
  SELECT vec_id, label,
         MAX(CASE WHEN clabel = label THEN cos_i END) AS own_i,
         MAX(CASE WHEN clabel <> label THEN cos_i END) AS oth_i
  FROM cosines GROUP BY vec_id, label
), per AS (
  SELECT label,
         CAST(floor(CASE WHEN GREATEST((1000000.0 - own_i) / 1000000.0,
                                       (1000000.0 - oth_i) / 1000000.0) > 0
                    THEN ((1000000.0 - oth_i) / 1000000.0
                          - (1000000.0 - own_i) / 1000000.0)
                         / GREATEST((1000000.0 - own_i) / 1000000.0,
                                    (1000000.0 - oth_i) / 1000000.0)
                    ELSE 0.0 END * {NAT_S} + 0.5) AS BIGINT) AS sq
  FROM per_vec2
)
SELECT label, COUNT(*) AS n_vecs,
       CAST(floor(CAST(SUM(sq) AS DOUBLE) / {NAT_S} / COUNT(*)
                  * {MICRO} + 0.5) AS BIGINT) AS mean_sil_micro,
       CAST(floor(CAST(SUM(CASE WHEN sq > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                  / COUNT(*) * {MICRO} + 0.5) AS BIGINT)
         AS frac_separated_micro
FROM per GROUP BY label ORDER BY label
"""


# --------------------------------------------- quantile shift panel
def quantile_shift_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile quantile shift between the 'F' and 'O' quantity
    distributions: for d = 10%..90%, the exact order statistic of
    each group and their difference — the localization companion to
    wasserstein_quantity (W₁ says HOW MUCH total mass moved; this
    says WHERE: a tail-only shift shows zeros through the middle
    deciles and spikes at d=90).

    Exact order statistics with NO global sort: q_d = min{v :
    cum(v) ≥ ⌈d·n/10⌉} over the 50-value inclusive cumulative grid
    (the exact_median_2pass selection rule generalized to the decile
    vector), thresholds in pure integer arithmetic ((n·d + 9) div 10
    on positives — identical truncation both engines), one broadcast
    theta join of the 9-row decile frame against the bounded grid.
    """
    vals = _quantity_value_counts(spark, sf_dir)
    cum = (
        vals.alias("p")
        .join(F.broadcast(vals.alias("q")), F.col("q.v") <= F.col("p.v"))
        .groupBy(F.col("p.v").alias("v"))
        .agg(F.sum("q.ca").alias("cum_a"), F.sum("q.cb").alias("cum_b"))
    )
    tots = vals.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    dec = (
        tots.select(
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d"),
            "na",
            "nb",
        )
        .select(
            "d",
            F.expr("(na * d + 9) div 10").alias("ka"),
            F.expr("(nb * d + 9) div 10").alias("kb"),
        )
    )
    j = F.broadcast(dec).join(
        cum,
        (F.col("cum_a") >= F.col("ka")) | (F.col("cum_b") >= F.col("kb")),
    )
    picked = j.groupBy("d").agg(
        F.min(F.when(F.col("cum_a") >= F.col("ka"), F.col("v"))).alias("qa"),
        F.min(F.when(F.col("cum_b") >= F.col("kb"), F.col("v"))).alias("qb"),
    )
    return picked.select(
        (F.col("d") * 10).alias("percentile"),
        F.col("qa").alias("q_f"),
        F.col("qb").alias("q_o"),
        (F.col("qb") - F.col("qa")).alias("shift"),
    ).orderBy("percentile")


QUANTILE_SHIFT_SQL = f"""
WITH {_VALS_SQL}, cum AS (
  SELECT p.v, CAST(SUM(q.ca) AS BIGINT) AS cum_a,
         CAST(SUM(q.cb) AS BIGINT) AS cum_b
  FROM vals p JOIN vals q ON q.v <= p.v
  GROUP BY p.v
), tots AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM vals
), dec AS (
  SELECT d, (na * d + 9) // 10 AS ka, (nb * d + 9) // 10 AS kb
  FROM (SELECT UNNEST(generate_series(1, 9)) AS d) CROSS JOIN tots
)
SELECT d * 10 AS percentile,
       MIN(CASE WHEN cum_a >= ka THEN v END) AS q_f,
       MIN(CASE WHEN cum_b >= kb THEN v END) AS q_o,
       MIN(CASE WHEN cum_b >= kb THEN v END)
         - MIN(CASE WHEN cum_a >= ka THEN v END) AS shift
FROM dec JOIN cum ON cum_a >= ka OR cum_b >= kb
GROUP BY d
ORDER BY percentile
"""
