"""Round-9 classical statistics: ordered-alternative and robust rank
tests (Jonckheere-Terpstra, Brunner-Munzel), stratified epidemiology
(Mantel-Haenszel + CMH + Woolf), experimentation variance reduction
(CUPED), and the nominal-association panel (Cramér's V, mutual
information / Theil's U, Goodman-Kruskal λ, Bowker symmetry,
Adjusted Rand Index).

Reference parity note: the reference (cgtcalc-data-transformer,
~732 LoC broker-CSV ETL) has no analytics surface — these are engine
extensions in the SURVEY.md §2.2 sense.

Engine-exactness discipline (stats_ext conventions):
- rank machinery runs on bounded VALUE domains (quantity 50 values,
  ship-delay ~130 days, priority 5, returnflag 3, nation 25,
  segment 5), so every pair/rank table is |domain|²-bounded at any
  row count;
- products of unbounded counts are cast to DECIMAL(19,0) per factor
  and summed in DECIMAL(38,0) (the r8/r9 overflow recipe); n³-scale
  terms are computed in double (exact < 2^53, identical IEEE above)
  and summed through DECIMAL(38,6);
- derived-double per-group terms entering a cross-group sum are
  quantized floor(x·SCALE + 0.5)::BIGINT first (drift_psi recipe);
- the final statistic is ONE identical IEEE expression per engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

Z_CRIT = 1.96          # two-sided 5% normal
CHI2_CRIT_DF1 = 3.841459
CHI2_CRIT_DF4 = 9.487729
CHI2_CRIT_DF96 = 119.870943  # Cramér's V contingency (5-1)(25-1)

_D19 = "decimal(19,0)"
_D38 = "decimal(38,6)"
MH_S = 10**6           # per-stratum term quantization grid
NAT_S = 10**9          # per-cell ln/entropy quantization grid

# Exact chi-square 0.95 quantiles for the dof values the segment ×
# nation grid can reach with all 25 nations present (nr = 2..5
# segments → dof = (nr−1)·24). Computed once offline by bisection on
# the regularized incomplete gamma to 1e-6 (cross-checked against the
# published df=1/2/10 values 3.841459/5.991465/18.307038); both twins
# use these literals and fall back to Wilson-Hilferty only for
# unlisted dof (ADVICE r10).
CHI2_CRIT_95 = {24: 36.415029, 48: 65.170769, 72: 92.80827, 96: 119.870939}
_CHI2_CRIT_CASE = (
    "CASE dof "
    + " ".join(f"WHEN {d} THEN {v!r}" for d, v in CHI2_CRIT_95.items())
    + " ELSE CAST(dof AS DOUBLE) * wh * wh * wh END"
)


def _d19(c):
    return c.cast(_D19)


# ----------------------------------------- Jonckheere-Terpstra trend
def jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative test: does shipping
    delay (l_shipdate − o_orderdate, days) trend monotonically across
    the ORDERED priority groups 1-URGENT … 5-LOW — the test to run
    instead of Kruskal-Wallis when the grouping has a natural order
    (K-W throws the order away and loses power).

    With ties, JT's centered statistic equals Kendall's S between the
    group index and the response, so the z-score uses the standard
    tie-corrected Kendall variance (the scipy/R formulation). All
    pair accounting runs on the 5×|delay-domain| CELL table: C, D and
    the equal-y sums are DECIMAL-routed cell-count products; the
    marginal tie terms t(t−1)(2t+5) and t(t−1)(t−2) are n³-scale and
    ride the double-term→DECIMAL(38,6) recipe (mannwhitney tsum).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("x"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("y"),
    )
    # ONE pass builds the bounded cell table (≤ 5·|delay-domain| rows),
    # cached: it feeds the pair join and both marginal rollups — the
    # uncached form re-ran the lineitem⋈orders aggregation five times
    # (21.6 s at sf0.1; ~2 s cached+fused).
    cells = j.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c")).cache()
    a, b = cells.alias("a"), cells.alias("b")
    pair = _d19(F.col("a.c")) * _d19(F.col("b.c"))
    # one theta join on the group order alone; the three y-relations
    # become conditional sums (same pairs, one pass)
    pairs = a.join(F.broadcast(b), F.col("b.x") > F.col("a.x")).agg(
        F.sum(F.when(F.col("b.y") > F.col("a.y"), pair)).alias("cc"),
        F.sum(F.when(F.col("b.y") < F.col("a.y"), pair)).alias("dd"),
        F.sum(F.when(F.col("b.y") == F.col("a.y"), pair)).alias("ee"),
    )
    tdbl = F.col("t").cast("double")
    tx = cells.groupBy("x").agg(F.sum("c").alias("t")).agg(
        F.sum("t").alias("n"),
        F.sum(_d19(F.col("t")) * _d19(F.col("t") - 1)).alias("t2x"),
        F.sum((tdbl * (tdbl - 1) * (2 * tdbl + 5)).cast(_D38)).alias("vtx"),
        F.sum((tdbl * (tdbl - 1) * (tdbl - 2)).cast(_D38)).alias("t3x"),
    )
    ty = cells.groupBy("y").agg(F.sum("c").alias("t")).agg(
        F.sum(_d19(F.col("t")) * _d19(F.col("t") - 1)).alias("t2y"),
        F.sum((tdbl * (tdbl - 1) * (2 * tdbl + 5)).cast(_D38)).alias("vty"),
        F.sum((tdbl * (tdbl - 1) * (tdbl - 2)).cast(_D38)).alias("t3y"),
    )
    s = pairs.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    nd = F.col("n").cast("double")
    v0 = nd * (nd - 1) * (2 * nd + 5)
    var = (
        (v0 - F.col("vtx").cast("double") - F.col("vty").cast("double"))
        / F.lit(18.0)
        + F.col("t3x").cast("double") * F.col("t3y").cast("double")
        / (F.lit(9.0) * nd * (nd - 1) * (nd - 2))
        + F.col("t2x").cast("double") * F.col("t2y").cast("double")
        / (F.lit(2.0) * nd * (nd - 1))
    )
    sstat = (F.col("cc") - F.col("dd")).cast("double")
    z = sstat / F.sqrt(var)
    jt2 = (F.lit(2) * F.col("cc") + F.col("ee")).cast("double")
    return s.select(
        "n",
        jt2.alias("jt2"),
        sstat.alias("s_stat"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > F.lit(Z_CRIT)).alias("significant"),
    )


JONCKHEERE_SQL = f"""
WITH j AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x,
         date_diff('day', o_orderdate, l_shipdate) AS y
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), cells AS MATERIALIZED (
  SELECT x, y, COUNT(*) AS c FROM j GROUP BY x, y
), pairs AS (
  SELECT CAST(SUM(CASE WHEN b.y > a.y THEN CAST(a.c AS DECIMAL(19,0)) * CAST(b.c AS DECIMAL(19,0)) END)
              AS DECIMAL(38,0)) AS cc,
         CAST(SUM(CASE WHEN b.y < a.y THEN CAST(a.c AS DECIMAL(19,0)) * CAST(b.c AS DECIMAL(19,0)) END)
              AS DECIMAL(38,0)) AS dd,
         CAST(SUM(CASE WHEN b.y = a.y THEN CAST(a.c AS DECIMAL(19,0)) * CAST(b.c AS DECIMAL(19,0)) END)
              AS DECIMAL(38,0)) AS ee
  FROM cells a JOIN cells b ON b.x > a.x
), tx AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(CAST(t AS DECIMAL(19,0)) * CAST(t - 1 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS t2x,
         CAST(SUM(CAST(CAST(t AS DOUBLE) * (t - 1) * (2 * t + 5) AS DECIMAL(38,6)))
              AS DECIMAL(38,6)) AS vtx,
         CAST(SUM(CAST(CAST(t AS DOUBLE) * (t - 1) * (t - 2) AS DECIMAL(38,6)))
              AS DECIMAL(38,6)) AS t3x
  FROM (SELECT x, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY x)
), ty AS (
  SELECT CAST(SUM(CAST(t AS DECIMAL(19,0)) * CAST(t - 1 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS t2y,
         CAST(SUM(CAST(CAST(t AS DOUBLE) * (t - 1) * (2 * t + 5) AS DECIMAL(38,6)))
              AS DECIMAL(38,6)) AS vty,
         CAST(SUM(CAST(CAST(t AS DOUBLE) * (t - 1) * (t - 2) AS DECIMAL(38,6)))
              AS DECIMAL(38,6)) AS t3y
  FROM (SELECT y, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY y)
)
SELECT n,
       CAST(2 * cc + ee AS DOUBLE) AS jt2,
       CAST(cc - dd AS DOUBLE) AS s_stat,
       ROUND(CAST(cc - dd AS DOUBLE)
             / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                     - CAST(vtx AS DOUBLE) - CAST(vty AS DOUBLE)) / 18.0
                    + CAST(t3x AS DOUBLE) * CAST(t3y AS DOUBLE)
                      / (9.0 * CAST(n AS DOUBLE) * (n - 1) * (n - 2))
                    + CAST(t2x AS DOUBLE) * CAST(t2y AS DOUBLE)
                      / (2.0 * CAST(n AS DOUBLE) * (n - 1))), 6) AS z,
       ABS(CAST(cc - dd AS DOUBLE)
           / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                   - CAST(vtx AS DOUBLE) - CAST(vty AS DOUBLE)) / 18.0
                  + CAST(t3x AS DOUBLE) * CAST(t3y AS DOUBLE)
                    / (9.0 * CAST(n AS DOUBLE) * (n - 1) * (n - 2))
                  + CAST(t2x AS DOUBLE) * CAST(t2y AS DOUBLE)
                    / (2.0 * CAST(n AS DOUBLE) * (n - 1)))) > {Z_CRIT} AS significant
FROM pairs, tx, ty
"""


# --------------------------------------------- Brunner-Munzel test
def brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel generalized Wilcoxon test: P(quantity of an
    'F'-status line < quantity of an 'O'-status line) ≠ ½ — the
    rank test that stays valid when the two groups have DIFFERENT
    dispersion (Mann-Whitney silently assumes equal shapes; BM is
    what modern guidance says to run instead).

    Doubled midranks on the 50-value quantity domain keep everything
    integer: overall R2(v) and within-group R2k(v) come from one
    cumulative theta join; p̂ and the two placement variances S_k²
    reduce to DECIMAL-routed Σc·d and double-term Σc·d² sums
    (d = R2 − R2k is the doubled Glivenko placement). W follows the
    Brunner-Munzel (2000) studentization; with millions of rows per
    group the t reference is the normal, so the gate is |W| > 1.96.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v"), "l_linestatus"
    )
    vals = li.groupBy("v").agg(
        F.sum((F.col("l_linestatus") == "F").cast("long")).alias("ca"),
        F.sum((F.col("l_linestatus") == "O").cast("long")).alias("cb"),
    )
    cum = (
        vals.alias("p")
        .join(F.broadcast(vals.alias("q")), F.col("q.v") < F.col("p.v"), "left")
        .groupBy(
            F.col("p.v").alias("v"),
            F.col("p.ca").alias("ca"),
            F.col("p.cb").alias("cb"),
        )
        .agg(
            F.coalesce(F.sum("q.ca"), F.lit(0)).alias("cuma"),
            F.coalesce(F.sum("q.cb"), F.lit(0)).alias("cumb"),
        )
    )
    r2 = F.lit(2) * (F.col("cuma") + F.col("cumb")) + (F.col("ca") + F.col("cb")) + 1
    r2a = F.lit(2) * F.col("cuma") + F.col("ca") + 1
    r2b = F.lit(2) * F.col("cumb") + F.col("cb") + 1
    da = (r2 - r2a).alias("da")
    db = (r2 - r2b).alias("db")
    g = cum.select("v", "ca", "cb", da, db, r2.alias("r2"))
    dad = F.col("da").cast("double")
    dbd = F.col("db").cast("double")
    s = g.agg(
        F.sum("ca").alias("ma"),
        F.sum("cb").alias("mb"),
        F.sum(_d19(F.col("ca")) * _d19(F.col("r2"))).alias("ra2"),
        F.sum(_d19(F.col("cb")) * _d19(F.col("r2"))).alias("rb2"),
        F.sum(_d19(F.col("ca")) * _d19(F.col("da"))).alias("ada"),
        F.sum(_d19(F.col("cb")) * _d19(F.col("db"))).alias("adb"),
        F.sum((F.col("ca").cast("double") * dad * dad).cast(_D38)).alias("qa"),
        F.sum((F.col("cb").cast("double") * dbd * dbd).cast(_D38)).alias("qb"),
    )
    ma = F.col("ma").cast("double")
    mb = F.col("mb").cast("double")
    sa2 = (
        F.col("qa").cast("double")
        - F.col("ada").cast("double") * F.col("ada").cast("double") / ma
    ) / (F.lit(4.0) * (ma - 1))
    sb2 = (
        F.col("qb").cast("double")
        - F.col("adb").cast("double") * F.col("adb").cast("double") / mb
    ) / (F.lit(4.0) * (mb - 1))
    rbar_diff = F.col("rb2").cast("double") / (F.lit(2.0) * mb) - F.col(
        "ra2"
    ).cast("double") / (F.lit(2.0) * ma)
    p_hat = (F.col("rb2").cast("double") - mb * (mb + 1)) / (
        F.lit(2.0) * ma * mb
    )
    w = ma * mb * rbar_diff / ((ma + mb) * F.sqrt(ma * sa2 + mb * sb2))
    return s.select(
        F.col("ma").alias("m_f"),
        F.col("mb").alias("m_o"),
        F.round(p_hat, 6).alias("p_hat"),
        F.round(w, 6).alias("w_stat"),
        (F.abs(w) > F.lit(Z_CRIT)).alias("significant"),
    )


BRUNNER_MUNZEL_SQL = f"""
WITH vals AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM lineitem GROUP BY 1
), cum AS (
  SELECT p.v, p.ca, p.cb,
         CAST(COALESCE(SUM(q.ca), 0) AS BIGINT) AS cuma,
         CAST(COALESCE(SUM(q.cb), 0) AS BIGINT) AS cumb
  FROM vals p LEFT JOIN vals q ON q.v < p.v
  GROUP BY p.v, p.ca, p.cb
), g AS (
  SELECT v, ca, cb,
         2 * (cuma + cumb) + ca + cb + 1 AS r2,
         2 * cumb + (ca + cb) - cb AS da_base,
         (2 * (cuma + cumb) + ca + cb + 1) - (2 * cuma + ca + 1) AS da,
         (2 * (cuma + cumb) + ca + cb + 1) - (2 * cumb + cb + 1) AS db
  FROM cum
), s AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS ma, CAST(SUM(cb) AS BIGINT) AS mb,
         CAST(SUM(CAST(ca AS DECIMAL(19,0)) * CAST(r2 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS ra2,
         CAST(SUM(CAST(cb AS DECIMAL(19,0)) * CAST(r2 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS rb2,
         CAST(SUM(CAST(ca AS DECIMAL(19,0)) * CAST(da AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS ada,
         CAST(SUM(CAST(cb AS DECIMAL(19,0)) * CAST(db AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS adb,
         CAST(SUM(CAST(CAST(ca AS DOUBLE) * CAST(da AS DOUBLE) * CAST(da AS DOUBLE)
                       AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS qa,
         CAST(SUM(CAST(CAST(cb AS DOUBLE) * CAST(db AS DOUBLE) * CAST(db AS DOUBLE)
                       AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS qb
  FROM g
)
SELECT ma AS m_f, mb AS m_o,
       ROUND((CAST(rb2 AS DOUBLE) - CAST(mb AS DOUBLE) * (mb + 1))
             / (2.0 * CAST(ma AS DOUBLE) * CAST(mb AS DOUBLE)), 6) AS p_hat,
       ROUND(CAST(ma AS DOUBLE) * CAST(mb AS DOUBLE)
             * (CAST(rb2 AS DOUBLE) / (2.0 * CAST(mb AS DOUBLE))
                - CAST(ra2 AS DOUBLE) / (2.0 * CAST(ma AS DOUBLE)))
             / ((CAST(ma AS DOUBLE) + CAST(mb AS DOUBLE))
                * sqrt(CAST(ma AS DOUBLE)
                       * ((CAST(qa AS DOUBLE) - CAST(ada AS DOUBLE) * CAST(ada AS DOUBLE)
                           / CAST(ma AS DOUBLE)) / (4.0 * (CAST(ma AS DOUBLE) - 1)))
                       + CAST(mb AS DOUBLE)
                       * ((CAST(qb AS DOUBLE) - CAST(adb AS DOUBLE) * CAST(adb AS DOUBLE)
                           / CAST(mb AS DOUBLE)) / (4.0 * (CAST(mb AS DOUBLE) - 1))))), 6) AS w_stat,
       ABS(CAST(ma AS DOUBLE) * CAST(mb AS DOUBLE)
           * (CAST(rb2 AS DOUBLE) / (2.0 * CAST(mb AS DOUBLE))
              - CAST(ra2 AS DOUBLE) / (2.0 * CAST(ma AS DOUBLE)))
           / ((CAST(ma AS DOUBLE) + CAST(mb AS DOUBLE))
              * sqrt(CAST(ma AS DOUBLE)
                     * ((CAST(qa AS DOUBLE) - CAST(ada AS DOUBLE) * CAST(ada AS DOUBLE)
                         / CAST(ma AS DOUBLE)) / (4.0 * (CAST(ma AS DOUBLE) - 1)))
                     + CAST(mb AS DOUBLE)
                     * ((CAST(qb AS DOUBLE) - CAST(adb AS DOUBLE) * CAST(adb AS DOUBLE)
                         / CAST(mb AS DOUBLE)) / (4.0 * (CAST(mb AS DOUBLE) - 1)))))) > {Z_CRIT} AS significant
FROM s
"""


# ------------------------------------- Mantel-Haenszel / CMH / Woolf
def mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 2×2 analysis over order-priority strata: exposure =
    order placed in H1 (month ≤ 6), outcome = order fulfilled
    (o_orderstatus = 'F'). Reports the Mantel-Haenszel common odds
    ratio, the Cochran-Mantel-Haenszel χ² (1 df, no continuity
    correction), and Woolf's χ² test that the per-stratum odds ratios
    are homogeneous — the three numbers every stratified A/B or
    case-control readout leads with. Priority is independent of
    order date in this corpus, so the expected readout is OR ≈ 1,
    CMH n.s., Woolf homogeneous — the A/A-style null contract.

    One count aggregation collapses orders to ≤5 stratum rows; every
    per-stratum double term (ad/n, bc/n, CMH numerator/variance,
    Woolf weights and log-odds) is quantized to the 1e-6 grid before
    the DECIMAL(38,0) cross-stratum sums, so the aggregation is exact
    integer arithmetic at any scale. Strata with an empty 2×2 cell
    are excluded (logged via n_strata) — Woolf's ln is undefined
    there.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("stratum"),
        (F.month("o_orderdate") <= 6).cast("long").alias("e"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    cells = orders.groupBy("stratum").agg(
        F.sum(F.col("e") * F.col("y")).alias("a"),
        F.sum(F.col("e") * (1 - F.col("y"))).alias("b"),
        F.sum((1 - F.col("e")) * F.col("y")).alias("c"),
        F.sum((1 - F.col("e")) * (1 - F.col("y"))).alias("d"),
    ).filter(
        (F.col("a") > 0) & (F.col("b") > 0) & (F.col("c") > 0) & (F.col("d") > 0)
    )
    ad, bd_, cd_, dd_ = (F.col(x).cast("double") for x in ("a", "b", "c", "d"))
    nd = ad + bd_ + cd_ + dd_
    r1, r0 = ad + bd_, cd_ + dd_
    c1, c0 = ad + cd_, bd_ + dd_
    mhs = F.lit(float(MH_S))

    def q6(x):
        return F.floor(x * mhs + F.lit(0.5)).cast("decimal(38,0)")

    lor = F.log(ad * dd_ / (bd_ * cd_))
    wgt = F.lit(1.0) / (1 / ad + 1 / bd_ + 1 / cd_ + 1 / dd_)
    s = cells.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(q6(ad * dd_ / nd)).alias("adn"),
        F.sum(q6(bd_ * cd_ / nd)).alias("bcn"),
        F.sum(q6(ad - r1 * c1 / nd)).alias("num"),
        F.sum(q6(r1 * r0 * c1 * c0 / (nd * nd * (nd - 1)))).alias("var"),
        F.sum(q6(wgt)).alias("sw"),
        F.sum(q6(wgt * lor)).alias("swl"),
        F.sum(q6(wgt * lor * lor)).alias("swl2"),
    )
    or_mh = F.col("adn").cast("double") / F.col("bcn").cast("double")
    numd = F.col("num").cast("double") / mhs
    chi2 = numd * numd / (F.col("var").cast("double") / mhs)
    woolf = (
        F.col("swl2").cast("double")
        - F.col("swl").cast("double") * F.col("swl").cast("double")
        / F.col("sw").cast("double")
    ) / mhs
    return s.select(
        "n_strata",
        F.round(or_mh, 6).alias("or_mh"),
        F.round(chi2, 6).alias("cmh_chi2"),
        (chi2 > F.lit(CHI2_CRIT_DF1)).alias("cmh_significant"),
        F.round(woolf, 6).alias("woolf_chi2"),
        (woolf <= F.lit(CHI2_CRIT_DF4)).alias("or_homogeneous"),
    )


MANTEL_HAENSZEL_SQL = f"""
WITH o AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS stratum,
         CASE WHEN month(o_orderdate) <= 6 THEN 1 ELSE 0 END AS e,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), cells AS (
  SELECT stratum,
         CAST(SUM(e * y) AS BIGINT) AS a,
         CAST(SUM(e * (1 - y)) AS BIGINT) AS b,
         CAST(SUM((1 - e) * y) AS BIGINT) AS c,
         CAST(SUM((1 - e) * (1 - y)) AS BIGINT) AS d
  FROM o GROUP BY stratum
  HAVING SUM(e * y) > 0 AND SUM(e * (1 - y)) > 0
     AND SUM((1 - e) * y) > 0 AND SUM((1 - e) * (1 - y)) > 0
), terms AS (
  SELECT CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd,
         CAST(c AS DOUBLE) AS cd, CAST(d AS DOUBLE) AS dd,
         CAST(a + b + c + d AS DOUBLE) AS nd
  FROM cells
), s AS (
  SELECT COUNT(*) AS n_strata,
         CAST(SUM(CAST(floor(ad * dd / nd * {MH_S} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS adn,
         CAST(SUM(CAST(floor(bd * cd / nd * {MH_S} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS bcn,
         CAST(SUM(CAST(floor((ad - (ad + bd) * (ad + cd) / nd) * {MH_S} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS num,
         CAST(SUM(CAST(floor((ad + bd) * (cd + dd) * (ad + cd) * (bd + dd)
                             / (nd * nd * (nd - 1)) * {MH_S} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS var,
         CAST(SUM(CAST(floor(1.0 / (1 / ad + 1 / bd + 1 / cd + 1 / dd) * {MH_S} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sw,
         CAST(SUM(CAST(floor(1.0 / (1 / ad + 1 / bd + 1 / cd + 1 / dd)
                             * ln(ad * dd / (bd * cd)) * {MH_S} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS swl,
         CAST(SUM(CAST(floor(1.0 / (1 / ad + 1 / bd + 1 / cd + 1 / dd)
                             * ln(ad * dd / (bd * cd)) * ln(ad * dd / (bd * cd))
                             * {MH_S} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS swl2
  FROM terms
)
SELECT n_strata,
       ROUND(CAST(adn AS DOUBLE) / CAST(bcn AS DOUBLE), 6) AS or_mh,
       ROUND((CAST(num AS DOUBLE) / {MH_S}) * (CAST(num AS DOUBLE) / {MH_S})
             / (CAST(var AS DOUBLE) / {MH_S}), 6) AS cmh_chi2,
       (CAST(num AS DOUBLE) / {MH_S}) * (CAST(num AS DOUBLE) / {MH_S})
         / (CAST(var AS DOUBLE) / {MH_S}) > {CHI2_CRIT_DF1} AS cmh_significant,
       ROUND((CAST(swl2 AS DOUBLE) - CAST(swl AS DOUBLE) * CAST(swl AS DOUBLE)
              / CAST(sw AS DOUBLE)) / {MH_S}, 6) AS woolf_chi2,
       (CAST(swl2 AS DOUBLE) - CAST(swl AS DOUBLE) * CAST(swl AS DOUBLE)
        / CAST(sw AS DOUBLE)) / {MH_S} <= {CHI2_CRIT_DF4} AS or_homogeneous
FROM s
"""


# --------------------------------------------------- CUPED adjustment
def cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data, Deng
    et al. 2013): how much experiment variance does the pre-period
    covariate remove? Covariate X = per-user event count in the first
    half of the observation window, metric Y = count in the second
    half; θ* = cov(X,Y)/var(X) and the variance reduction is exactly
    ρ² — the single number that says how much smaller the A/B sample
    could be.

    One per-user aggregation (map-side combinable) → five moment sums
    with per-factor DECIMAL(19,0) routing; θ, ρ², and the adjusted
    variance ratio are one closed form. The split day is derived from
    the data's own min/max day (broadcast scalar), so the operator is
    rerun-stable on any window.
    """
    from cgtcalc_data_transformer_spark.operators.events import DAY_NS
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", F.expr(f"ts div {DAY_NS}").alias("day")
    )
    # Integer division in BOTH twins (ADVICE r9): `/` is double
    # division and cast-to-long truncates toward zero in Spark but
    # the DuckDB CAST rounds to nearest — odd mn+mx picked different
    # mid days (the jl_projection/theil `div` rule).
    bounds = ev.agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    ).select(F.expr("(mn + mx) div 2").alias("mid"))
    per_user = ev.crossJoin(F.broadcast(bounds)).groupBy("user_id").agg(
        F.sum((F.col("day") <= F.col("mid")).cast("long")).alias("x"),
        F.sum((F.col("day") > F.col("mid")).cast("long")).alias("y"),
    )
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(_d19(F.col("x")) * _d19(F.col("y"))).alias("sxy"),
        F.sum(_d19(F.col("x")) * _d19(F.col("x"))).alias("sxx"),
        F.sum(_d19(F.col("y")) * _d19(F.col("y"))).alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / nd
    vx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / nd
    vy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double") / nd
    theta = cov / vx
    rho2 = cov * cov / (vx * vy)
    return s.select(
        F.col("n").alias("n_users"),
        F.round(theta, 6).alias("theta"),
        F.round(rho2, 6).alias("rho2"),
        F.round(F.lit(1.0) - rho2, 6).alias("adjusted_var_ratio"),
    )


CUPED_SQL = """
WITH ev AS (
  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events
), bounds AS (
  SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM ev
), per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN day <= mid THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN day > mid THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM ev CROSS JOIN bounds GROUP BY user_id
), s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS syy
  FROM per_user
)
SELECT n AS n_users,
       ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n), 6) AS theta,
       ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 6) AS rho2,
       ROUND(1.0 - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 6) AS adjusted_var_ratio
FROM s
"""


# ------------------------------------------- nominal association panel
def _seg_nation_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CACHED (r14 plan audit): the four consumers each read this
    # frame 3-5x (marginals, total, scored join) and uncached every
    # reference re-scanned customer (8 scans in
    # plans/r14/mutual_information_nominal_before.txt at r14-pre).
    # ≤ |segments|x|nations| = 125 cells (guide §2.4).
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
    ).agg(F.count(F.lit(1)).alias("o")).cache()


_SEG_NATION_CELLS_SQL = """
cells AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat, COUNT(*) AS o
  FROM customer GROUP BY 1, 2
), rows_m AS (
  SELECT seg, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY seg
), cols_m AS (
  SELECT nat, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY nat
), tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells
)"""


def cramers_v_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for the c_mktsegment × c_nationkey contingency —
    THE normalized effect size for nominal×nominal association (χ²
    alone grows with n; V is comparable across datasets). Segments
    are assigned independently of nation in this corpus, so the
    expected readout is V ≈ 0 with a non-significant χ² — the
    null-effect contract shared with ols_regression.

    One count aggregation → ≤125 cells; each cell's χ² term
    (n·o − r·c)²/(n·r·c) is computed from exact integers in double
    and quantized to the 1e-6 grid before the bounded sum. Cells
    ABSENT from the count table (o = 0) still owe their expected
    count e = r·c/n to χ² — rather than generating them, use
    Σ_all e = n, so the missing-cell contribution is exactly
    n − Σ_observed r·c/n (ADVICE r9). The significance gate uses the
    EXACT chi2(0.95) critical value from the CHI2_CRIT_95 literal
    table for the reachable dof values (24/48/72/96 — ADVICE r10:
    Wilson-Hilferty is ~0.01 off at df = 96, enough to flip a
    boundary verdict), falling back to the Wilson-Hilferty cube
    approximation (x·x·x, not pow — multiplication is
    correctly-rounded IEEE in both engines) only for unlisted dof.
    """
    cells = _seg_nation_cells(spark, sf_dir)
    rows_m = cells.groupBy("seg").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("nat").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("seg").alias("nr"),
        F.count_distinct("nat").alias("nc"),
    )
    j = (
        cells.join(F.broadcast(rows_m), "seg")
        .join(F.broadcast(cols_m), "nat")
        .crossJoin(F.broadcast(tot))
    )
    ndl, od, rd, cd = (F.col(x).cast("double") for x in ("n", "o", "r", "c"))
    term = (ndl * od - rd * cd) * (ndl * od - rd * cd) / (ndl * rd * cd)
    ecov = rd * cd / ndl

    def q6(x):
        return F.floor(x * F.lit(float(MH_S)) + F.lit(0.5)).cast("decimal(38,0)")

    s = j.groupBy("n", "nr", "nc").agg(
        F.sum(q6(term)).alias("chi2q"),
        F.sum(q6(ecov)).alias("ecovq"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    mhs = F.lit(float(MH_S))
    chi2 = (
        F.col("chi2q").cast("double") / mhs
        + (F.col("n").cast("double") - F.col("ecovq").cast("double") / mhs)
    )
    dof = (F.col("nr") - 1) * (F.col("nc") - 1)
    dofd = dof.cast("double")
    wh = (
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dofd)
        + F.lit(1.644854) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dofd))
    )
    # exact chi2(0.95) critical values for the dof this grid can
    # actually reach with all 25 nations present (nr = 2..5 segments);
    # Wilson-Hilferty only for unlisted dof (ADVICE r10 — WH is ~0.01
    # off at df = 96, enough to flip a boundary verdict)
    crit = dofd * wh * wh * wh
    for d, cv in CHI2_CRIT_95.items():
        crit = F.when(dof == F.lit(d), F.lit(cv)).otherwise(crit)
    kmin = F.least(F.col("nr"), F.col("nc")) - 1
    v = F.sqrt(chi2 / (F.col("n").cast("double") * kmin.cast("double")))
    return s.select(
        "n",
        dof.alias("dof"),
        (F.col("n_cells") == F.col("nr") * F.col("nc")).alias("complete_grid"),
        F.round(chi2, 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
        (chi2 > crit).alias("significant"),
    )


CRAMERS_V_SQL = f"""
WITH {_SEG_NATION_CELLS_SQL}, meta AS (
  SELECT CAST(COUNT(DISTINCT seg) AS BIGINT) AS nr,
         CAST(COUNT(DISTINCT nat) AS BIGINT) AS nc
  FROM cells
), s AS (
  SELECT n, nr, nc,
         CAST(SUM(CAST(floor((CAST(n AS DOUBLE) * o - CAST(r AS DOUBLE) * c)
                             * (CAST(n AS DOUBLE) * o - CAST(r AS DOUBLE) * c)
                             / (CAST(n AS DOUBLE) * r * c) * {MH_S} + 0.5)
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS chi2q,
         CAST(SUM(CAST(floor(CAST(r AS DOUBLE) * c / n * {MH_S} + 0.5)
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ecovq,
         COUNT(*) AS n_cells
  FROM cells JOIN rows_m USING (seg) JOIN cols_m USING (nat)
  CROSS JOIN tot CROSS JOIN meta
  GROUP BY n, nr, nc
), f AS (
  SELECT n, nr, nc, n_cells,
         CAST(chi2q AS DOUBLE) / {MH_S}
           + (CAST(n AS DOUBLE) - CAST(ecovq AS DOUBLE) / {MH_S}) AS chi2,
         (nr - 1) * (nc - 1) AS dof,
         1.0 - 2.0 / (9.0 * ((nr - 1) * (nc - 1)))
           + 1.644854 * sqrt(2.0 / (9.0 * ((nr - 1) * (nc - 1)))) AS wh
  FROM s
)
SELECT n, dof,
       n_cells = nr * nc AS complete_grid,
       ROUND(chi2, 6) AS chi2,
       ROUND(sqrt(chi2 / (CAST(n AS DOUBLE) * (LEAST(nr, nc) - 1))), 6) AS cramers_v,
       chi2 > {_CHI2_CRIT_CASE} AS significant
FROM f
"""


def mutual_information_nominal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information, entropies, normalized MI and Theil's
    uncertainty coefficients for segment × nation — the
    information-theoretic association panel (what fraction of one
    label's entropy the other explains). Independent assignment in
    this corpus ⇒ MI ≈ 0 and both U coefficients ≈ 0.

    Cell and marginal −p·ln p / p·ln(lift) terms are quantized to the
    1e-9 grid before the ≤125-term bounded sums (theil_index recipe);
    the five outputs are single divisions of those exact integers.
    """
    cells = _seg_nation_cells(spark, sf_dir)
    rows_m = cells.groupBy("seg").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("nat").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    sc = F.lit(float(NAT_S))

    def q9(x):
        return F.floor(x * sc + F.lit(0.5)).cast("decimal(38,0)")

    j = (
        cells.join(F.broadcast(rows_m), "seg")
        .join(F.broadcast(cols_m), "nat")
        .crossJoin(F.broadcast(tot))
    )
    ndl, od, rd, cd = (F.col(x).cast("double") for x in ("n", "o", "r", "c"))
    mi_q = j.groupBy("n").agg(
        F.sum(q9(od / ndl * F.log(ndl * od / (rd * cd)))).alias("miq")
    )
    hx_q = rows_m.crossJoin(F.broadcast(tot)).groupBy("n").agg(
        F.sum(
            q9(-(F.col("r").cast("double") / F.col("n").cast("double"))
               * F.log(F.col("r").cast("double") / F.col("n").cast("double")))
        ).alias("hxq")
    )
    hy_q = cols_m.crossJoin(F.broadcast(tot)).groupBy("n").agg(
        F.sum(
            q9(-(F.col("c").cast("double") / F.col("n").cast("double"))
               * F.log(F.col("c").cast("double") / F.col("n").cast("double")))
        ).alias("hyq")
    )
    s = mi_q.join(F.broadcast(hx_q), "n").join(F.broadcast(hy_q), "n")
    mi = F.col("miq").cast("double") / sc
    hx = F.col("hxq").cast("double") / sc
    hy = F.col("hyq").cast("double") / sc
    return s.select(
        "n",
        F.round(mi, 6).alias("mi_nats"),
        F.round(hx, 6).alias("h_segment"),
        F.round(hy, 6).alias("h_nation"),
        F.round(mi / F.least(hx, hy), 6).alias("nmi"),
        F.round(mi / hx, 6).alias("u_segment"),
        F.round(mi / hy, 6).alias("u_nation"),
    )


MUTUAL_INFORMATION_SQL = f"""
WITH {_SEG_NATION_CELLS_SQL}, miq AS (
  SELECT n,
         CAST(SUM(CAST(floor(CAST(o AS DOUBLE) / n
                             * ln(CAST(n AS DOUBLE) * o / (CAST(r AS DOUBLE) * c))
                             * {NAT_S} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS miq
  FROM cells JOIN rows_m USING (seg) JOIN cols_m USING (nat) CROSS JOIN tot
  GROUP BY n
), hxq AS (
  SELECT n,
         CAST(SUM(CAST(floor(-(CAST(r AS DOUBLE) / n) * ln(CAST(r AS DOUBLE) / n)
                             * {NAT_S} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS hxq
  FROM rows_m CROSS JOIN tot GROUP BY n
), hyq AS (
  SELECT n,
         CAST(SUM(CAST(floor(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
                             * {NAT_S} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS hyq
  FROM cols_m CROSS JOIN tot GROUP BY n
)
SELECT n,
       ROUND(CAST(miq AS DOUBLE) / {NAT_S}, 6) AS mi_nats,
       ROUND(CAST(hxq AS DOUBLE) / {NAT_S}, 6) AS h_segment,
       ROUND(CAST(hyq AS DOUBLE) / {NAT_S}, 6) AS h_nation,
       ROUND((CAST(miq AS DOUBLE) / {NAT_S})
             / LEAST(CAST(hxq AS DOUBLE) / {NAT_S}, CAST(hyq AS DOUBLE) / {NAT_S}), 6) AS nmi,
       ROUND((CAST(miq AS DOUBLE) / {NAT_S}) / (CAST(hxq AS DOUBLE) / {NAT_S}), 6) AS u_segment,
       ROUND((CAST(miq AS DOUBLE) / {NAT_S}) / (CAST(hyq AS DOUBLE) / {NAT_S}), 6) AS u_nation
FROM miq JOIN hxq USING (n) JOIN hyq USING (n)
"""


def goodman_kruskal_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal λ for segment × nation: the
    proportional-reduction-in-error of guessing one label given the
    other (λ = 0: knowing nation never improves a segment guess) —
    the PRE companion to Cramér's V, and EXACT integer arithmetic
    end-to-end (max-count sums, no doubles until the final division).
    """
    cells = _seg_nation_cells(spark, sf_dir)
    by_nat = cells.groupBy("nat").agg(F.max("o").alias("mx"))
    by_seg = cells.groupBy("seg").agg(F.max("o").alias("my"))
    rows_m = cells.groupBy("seg").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("nat").agg(F.sum("o").alias("c"))
    s = (
        by_nat.agg(F.sum("mx").alias("sum_mx"))
        .crossJoin(F.broadcast(by_seg.agg(F.sum("my").alias("sum_my"))))
        .crossJoin(F.broadcast(rows_m.agg(
            F.max("r").alias("max_r"), F.sum("r").alias("n"))))
        .crossJoin(F.broadcast(cols_m.agg(F.max("c").alias("max_c"))))
    )
    nd = F.col("n").cast("double")
    lam_seg = (F.col("sum_mx") - F.col("max_r")).cast("double") / (
        nd - F.col("max_r").cast("double")
    )
    lam_nat = (F.col("sum_my") - F.col("max_c")).cast("double") / (
        nd - F.col("max_c").cast("double")
    )
    lam_sym = (
        F.col("sum_mx") + F.col("sum_my") - F.col("max_r") - F.col("max_c")
    ).cast("double") / (
        F.lit(2.0) * nd - F.col("max_r").cast("double") - F.col("max_c").cast("double")
    )
    return s.select(
        "n",
        F.round(lam_seg, 6).alias("lambda_segment"),
        F.round(lam_nat, 6).alias("lambda_nation"),
        F.round(lam_sym, 6).alias("lambda_symmetric"),
    )


GK_LAMBDA_SQL = f"""
WITH {_SEG_NATION_CELLS_SQL}, agg AS (
  SELECT (SELECT CAST(SUM(mx) AS BIGINT)
          FROM (SELECT nat, MAX(o) AS mx FROM cells GROUP BY nat)) AS sum_mx,
         (SELECT CAST(SUM(my) AS BIGINT)
          FROM (SELECT seg, MAX(o) AS my FROM cells GROUP BY seg)) AS sum_my,
         (SELECT CAST(MAX(r) AS BIGINT) FROM rows_m) AS max_r,
         (SELECT CAST(MAX(c) AS BIGINT) FROM cols_m) AS max_c,
         (SELECT n FROM tot) AS n
)
SELECT n,
       ROUND(CAST(sum_mx - max_r AS DOUBLE) / (CAST(n AS DOUBLE) - max_r), 6) AS lambda_segment,
       ROUND(CAST(sum_my - max_c AS DOUBLE) / (CAST(n AS DOUBLE) - max_c), 6) AS lambda_nation,
       ROUND(CAST(sum_mx + sum_my - max_r - max_c AS DOUBLE)
             / (2.0 * CAST(n AS DOUBLE) - max_r - max_c), 6) AS lambda_symmetric
FROM agg
"""


# ------------------------------------------------ Bowker symmetry test
def bowker_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker's test of symmetry (the k×k generalization of McNemar):
    for multi-line orders, does the return flag of an order's FIRST
    line predict its LAST line symmetrically — i.e. are A→R
    transitions as common as R→A? χ² = Σ_{i<j} (n_ij − n_ji)² /
    (n_ij + n_ji), df = #pairs with traffic.

    The first/last pick uses the deterministic lexicographic BIGINT
    encode ((linenumber·64 + quantity)·4 + flag) — l_linenumber is
    NOT unique within an order in this corpus, so the tie-break is
    part of the operator contract. The 3×3 transition table is
    bounded; per-pair terms are exact rationals quantized to 1e-6.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            (F.col("l_linenumber") * 64 + F.col("l_quantity").cast("long")) * 4
            + F.when(F.col("l_returnflag") == "A", 0)
            .when(F.col("l_returnflag") == "N", 1)
            .otherwise(2)
        ).alias("key"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.min("key").alias("mn"),
        F.max("key").alias("mx"),
        F.count(F.lit(1)).alias("nl"),
    ).filter(F.col("nl") >= 2)
    table = per_order.groupBy(
        F.pmod(F.col("mn"), F.lit(4)).alias("i"),
        F.pmod(F.col("mx"), F.lit(4)).alias("j"),
    ).agg(F.count(F.lit(1)).alias("nij"))
    # Symmetrize BEFORE pairing (ADVICE r9): the old upper-triangle
    # LEFT JOIN dropped any (i,j) pair whose n_ij row was absent but
    # whose n_ji row existed — losing a chi2 contribution of exactly
    # n_ji and a dof. Re-key every off-diagonal cell on
    # (least(i,j), greatest(i,j)) and aggregate both orientations.
    off = table.filter(F.col("i") != F.col("j")).select(
        F.least("i", "j").alias("lo"),
        F.greatest("i", "j").alias("hi"),
        F.when(F.col("i") < F.col("j"), F.col("nij")).otherwise(F.lit(0)).alias("fwd"),
        F.when(F.col("i") > F.col("j"), F.col("nij")).otherwise(F.lit(0)).alias("bwd"),
    )
    pairs = off.groupBy("lo", "hi").agg(
        F.sum("fwd").alias("nij"), F.sum("bwd").alias("nji")
    )
    diff = (F.col("nij") - F.col("nji")).cast("double")
    tot = (F.col("nij") + F.col("nji")).cast("double")
    s = pairs.agg(
        F.count(F.lit(1)).alias("dof"),
        F.sum(
            F.floor(diff * diff / tot * F.lit(float(MH_S)) + F.lit(0.5))
            .cast("decimal(38,0)")
        ).alias("chi2q"),
    )
    chi2 = F.col("chi2q").cast("double") / F.lit(float(MH_S))
    # dof = 0 (no off-diagonal traffic at all) must not feed
    # element_at index 0 — 1-based lookup throws under ANSI. Clamp
    # the index and gate the verdict on dof > 0 (chi2 is NULL there,
    # and false-AND-NULL is false in both engines).
    crit = F.element_at(
        F.array(F.lit(3.841459), F.lit(5.991465), F.lit(7.814728)),
        F.greatest(F.col("dof"), F.lit(1)).cast("int"),
    )
    return s.select(
        "dof",
        F.round(chi2, 6).alias("chi2"),
        ((F.col("dof") > 0) & (chi2 > crit)).alias("asymmetric"),
    )


BOWKER_SQL = f"""
WITH li AS (
  SELECT l_orderkey,
         (l_linenumber * 64 + CAST(l_quantity AS BIGINT)) * 4
         + CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS key
  FROM lineitem
), per_order AS (
  SELECT l_orderkey, MIN(key) AS mn, MAX(key) AS mx, COUNT(*) AS nl
  FROM li GROUP BY l_orderkey HAVING COUNT(*) >= 2
), tbl AS (
  SELECT mn % 4 AS i, mx % 4 AS j, COUNT(*) AS nij
  FROM per_order GROUP BY 1, 2
), off AS (
  SELECT LEAST(i, j) AS lo, GREATEST(i, j) AS hi,
         CASE WHEN i < j THEN nij ELSE 0 END AS fwd,
         CASE WHEN i > j THEN nij ELSE 0 END AS bwd
  FROM tbl WHERE i <> j
), pairs AS (
  SELECT lo, hi, CAST(SUM(fwd) AS BIGINT) AS nij, CAST(SUM(bwd) AS BIGINT) AS nji
  FROM off GROUP BY lo, hi
), s AS (
  SELECT COUNT(*) AS dof,
         CAST(SUM(CAST(floor(CAST(nij - nji AS DOUBLE) * (nij - nji)
                             / (nij + nji) * {MH_S} + 0.5) AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS chi2q
  FROM pairs
)
SELECT dof,
       ROUND(CAST(chi2q AS DOUBLE) / {MH_S}, 6) AS chi2,
       dof > 0 AND CAST(chi2q AS DOUBLE) / {MH_S}
         > [3.841459, 5.991465, 7.814728][GREATEST(dof, 1)] AS asymmetric
FROM s
"""


# -------------------------------------------- Adjusted Rand Index
def adjusted_rand_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand Index between the two natural partitions of the
    customer base — by nation vs by market segment (Hubert & Arabie
    1985): the chance-corrected pair-agreement score every clustering
    evaluation reports. Independent labels ⇒ ARI ≈ 0 while the raw
    Rand index sits high — exactly the correction the adjusted form
    exists to make, so the pair is the operator's own sanity check.

    Σ n_ij(n_ij−1), Σ a_i(a_i−1), Σ b_j(b_j−1) and n(n−1) are
    DECIMAL-routed (pair counts are n²-scale by definition); ARI and
    RI are single closed forms over the four exact sums.
    """
    cells = _seg_nation_cells(spark, sf_dir)
    sij = cells.agg(
        F.sum(_d19(F.col("o")) * _d19(F.col("o") - 1)).alias("sij2"),
        F.sum("o").alias("n"),
    )
    sa = (
        cells.groupBy("seg").agg(F.sum("o").alias("a"))
        .agg(F.sum(_d19(F.col("a")) * _d19(F.col("a") - 1)).alias("sa2"))
    )
    sb = (
        cells.groupBy("nat").agg(F.sum("o").alias("b"))
        .agg(F.sum(_d19(F.col("b")) * _d19(F.col("b") - 1)).alias("sb2"))
    )
    s = sij.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
    n2 = F.col("n").cast("double") * (F.col("n") - 1).cast("double")
    sij2 = F.col("sij2").cast("double")
    sa2 = F.col("sa2").cast("double")
    sb2 = F.col("sb2").cast("double")
    expected = sa2 * sb2 / n2
    ari = (sij2 - expected) / ((sa2 + sb2) / 2 - expected)
    ri = (n2 + 2 * sij2 - sa2 - sb2) / n2
    return s.select(
        "n",
        F.round(ari, 6).alias("ari"),
        F.round(ri, 6).alias("rand_index"),
    )


ARI_SQL = """
WITH cells AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat, COUNT(*) AS o
  FROM customer GROUP BY 1, 2
), sij AS (
  SELECT CAST(SUM(CAST(o AS DECIMAL(19,0)) * CAST(o - 1 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sij2,
         CAST(SUM(o) AS BIGINT) AS n
  FROM cells
), sa AS (
  SELECT CAST(SUM(CAST(a AS DECIMAL(19,0)) * CAST(a - 1 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sa2
  FROM (SELECT seg, CAST(SUM(o) AS BIGINT) AS a FROM cells GROUP BY seg)
), sb AS (
  SELECT CAST(SUM(CAST(b AS DECIMAL(19,0)) * CAST(b - 1 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sb2
  FROM (SELECT nat, CAST(SUM(o) AS BIGINT) AS b FROM cells GROUP BY nat)
)
SELECT n,
       ROUND((CAST(sij2 AS DOUBLE) - CAST(sa2 AS DOUBLE) * CAST(sb2 AS DOUBLE)
              / (CAST(n AS DOUBLE) * (n - 1)))
             / ((CAST(sa2 AS DOUBLE) + CAST(sb2 AS DOUBLE)) / 2
                - CAST(sa2 AS DOUBLE) * CAST(sb2 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * (n - 1))), 6) AS ari,
       ROUND((CAST(n AS DOUBLE) * (n - 1) + 2 * CAST(sij2 AS DOUBLE)
              - CAST(sa2 AS DOUBLE) - CAST(sb2 AS DOUBLE))
             / (CAST(n AS DOUBLE) * (n - 1)), 6) AS rand_index
FROM sij, sa, sb
"""
