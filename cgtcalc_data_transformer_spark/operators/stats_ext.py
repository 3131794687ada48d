"""Classical-statistics operators over warehouse tables: rank tests,
association measures, robust location/scale, and variance analysis.

The reference has no analytics surface at all (SURVEY.md §2.2); these
extend the engine with the hypothesis-test / EDA staples a data
platform runs next to its curation pipeline. Every operator follows
the repo's cross-engine determinism discipline:

- aggregations carry EXACT integers (counts, per-value-count rank
  sums, decimal(28,6)-cast sums of sub-2^53 double products);
- value ranks come from per-VALUE count tables + bounded theta-join
  prefix sums (the gini_concentration convention), NEVER a global
  sort or an unpartitioned window;
- derived-double terms that enter a cross-group sum are quantized
  floor(x·SCALE + 0.5)::BIGINT BEFORE the sum (the drift_psi recipe);
- final statistics are ONE identical IEEE expression per engine.

All tests here run on bounded value domains (l_quantity has 50
values, l_discount 11, categorical dims ≤ 5), so the rank machinery
is |domain|²-bounded regardless of row count — the property that
makes exact rank statistics feasible at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.functions.money import dec as _dec
from cgtcalc_data_transformer_spark.sources.tpch import load_table

# Discount pennies: floor(d*100 + 0.5) maps the 11 distinct stored
# doubles (0.00..0.10) onto exact integers identically on both
# engines (the stored double for 0.01 times 100 is 1.0000000000000002
# — a plain CAST truncates differently than the engines' round).
_DK = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"


# ----------------------------------------------- Mann-Whitney U test
MW_Z_CRIT = 1.96  # two-sided 5%


def mannwhitney_u_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test: does l_quantity differ
    in distribution between returned ('R') and normal ('N') line
    items — the nonparametric two-sample location test run when a
    t-test's normality assumption is indefensible (it always is on
    order quantities).

    Heavy ties are the whole game on a 50-value domain, so U and the
    tie-corrected variance come from per-VALUE counts: 2·U_A =
    Σ_v cA(v)·(2·cumB<(v) + cB(v)) and T = Σ(t³−t), both exact
    BIGINT (t³ < 2^63 holds to ~2.1M rows per value; at larger scale
    the same identity runs on DECIMAL sums). One 50-row theta join +
    one single-row rollup — the shuffle carries ≤ 50 rows whatever
    the table size. z = (2U − mA·mB)/(2·σ) is one IEEE expression.
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
        .agg(F.coalesce(F.sum("b.cb"), F.lit(0)).alias("cumb"))
    )
    t = F.col("ca") + F.col("cb")
    s = cum.agg(
        F.sum("ca").alias("ma"),
        F.sum("cb").alias("mb"),
        F.sum(F.col("ca") * (F.lit(2) * F.col("cumb") + F.col("cb"))).alias(
            "u2a"
        ),
        F.sum(t * t * t - t).alias("tsum"),
    )
    ma = F.col("ma").cast("double")
    mb = F.col("mb").cast("double")
    n = F.col("ma") + F.col("mb")
    var = (
        ma
        * mb
        * (
            (n + F.lit(1)).cast("double")
            - F.col("tsum").cast("double")
            / (n * (n - F.lit(1))).cast("double")
        )
        / F.lit(12.0)
    )
    z = (F.col("u2a") - F.col("ma") * F.col("mb")).cast("double") / (
        F.lit(2.0) * F.sqrt(var)
    )
    return s.select(
        F.col("ma").alias("m_a"),
        F.col("mb").alias("m_b"),
        (F.col("u2a") / F.lit(2.0)).alias("u_a"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > F.lit(MW_Z_CRIT)).alias("significant"),
    )


MANNWHITNEY_SQL = f"""
WITH vals AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
  GROUP BY 1
), cum AS (
  SELECT a.v, a.ca, a.cb, CAST(COALESCE(SUM(b.cb), 0) AS BIGINT) AS cumb
  FROM vals a LEFT JOIN vals b ON b.v < a.v
  GROUP BY a.v, a.ca, a.cb
), s AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS ma,
         CAST(SUM(cb) AS BIGINT) AS mb,
         CAST(SUM(ca * (2 * cumb + cb)) AS BIGINT) AS u2a,
         CAST(SUM((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS BIGINT) AS tsum
  FROM cum
)
SELECT ma AS m_a, mb AS m_b,
       u2a / 2.0 AS u_a,
       ROUND(CAST(u2a - ma * mb AS DOUBLE)
             / (2.0 * sqrt(CAST(ma AS DOUBLE) * CAST(mb AS DOUBLE)
                           * (CAST(ma + mb + 1 AS DOUBLE)
                              - CAST(tsum AS DOUBLE)
                                / CAST((ma + mb) * (ma + mb - 1) AS DOUBLE))
                           / 12.0)), 6) AS z_stat,
       ABS(CAST(u2a - ma * mb AS DOUBLE)
           / (2.0 * sqrt(CAST(ma AS DOUBLE) * CAST(mb AS DOUBLE)
                         * (CAST(ma + mb + 1 AS DOUBLE)
                            - CAST(tsum AS DOUBLE)
                              / CAST((ma + mb) * (ma + mb - 1) AS DOUBLE))
                         / 12.0))) > {MW_Z_CRIT} AS significant
FROM s
"""


# --------------------------------------------- Spearman rank correlation
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman ρ between l_quantity and l_discount — Pearson on
    tied-average ranks, the monotone-association staple that is
    immune to the marginal distributions.

    Exact WITHOUT sorting: both columns live on bounded domains (50 /
    11 values), so tied ranks come from per-value counts; the
    CENTERED doubled rank dx = 2·cum< + c − n (an exact integer that
    sums to zero by construction) joins back to rows via two
    broadcast maps, and ρ's three sums follow the corr_matrix recipe
    — per-row products dx·dy < n² < 2^53 are exact in DOUBLE, cast
    decimal(28,6) before the order-insensitive sums. One row-scan +
    one aggregation; the doubled-rank scale cancels in ρ.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.expr(_DK).alias("y"),
    )
    n1 = li.count()  # noqa: F841 — (kept for clarity; n from marginals)
    mx = li.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    my = li.groupBy("y").agg(F.count(F.lit(1)).alias("c"))

    def centered(marg: DataFrame, key: str) -> DataFrame:
        cum = (
            marg.alias("a")
            .join(marg.alias("b"), F.col(f"b.{key}") < F.col(f"a.{key}"), "left")
            .groupBy(F.col(f"a.{key}").alias(key), F.col("a.c").alias("c"))
            .agg(F.coalesce(F.sum("b.c"), F.lit(0)).alias("cum"))
        )
        tot = cum.agg(F.sum("c").alias("n"))
        return cum.crossJoin(F.broadcast(tot)).select(
            key,
            (F.lit(2) * F.col("cum") + F.col("c") - F.col("n")).alias(
                f"d{key}"
            ),
        )

    rx = F.broadcast(centered(mx, "x"))
    ry = F.broadcast(centered(my, "y"))
    joined = li.join(rx, "x").join(ry, "y")
    dd = F.col("dx").cast("double") * F.col("dy").cast("double")
    sums = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(dd)).alias("sxy"),
        F.sum(_dec(F.col("dx").cast("double") * F.col("dx").cast("double"))).alias("sxx"),
        F.sum(_dec(F.col("dy").cast("double") * F.col("dy").cast("double"))).alias("syy"),
    )
    rho = F.col("sxy").cast("double") / F.sqrt(
        F.col("sxx").cast("double") * F.col("syy").cast("double")
    )
    return sums.select(
        F.lit("l_quantity~l_discount").alias("pair"),
        "n",
        F.round(rho, 6).alias("rho"),
    )


SPEARMAN_SQL = f"""
WITH rows_kv AS (
  SELECT CAST(l_quantity AS BIGINT) AS x, {_DK} AS y FROM lineitem
), mx AS (
  SELECT x, COUNT(*) AS c FROM rows_kv GROUP BY x
), my AS (
  SELECT y, COUNT(*) AS c FROM rows_kv GROUP BY y
), cx AS (
  SELECT a.x, a.c, CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS cum
  FROM mx a LEFT JOIN mx b ON b.x < a.x GROUP BY a.x, a.c
), cy AS (
  SELECT a.y, a.c, CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS cum
  FROM my a LEFT JOIN my b ON b.y < a.y GROUP BY a.y, a.c
), nx AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM mx
), rx AS (
  SELECT x, 2 * cum + c - n AS dx FROM cx, nx
), ry AS (
  SELECT y, 2 * cum + c - n AS dy FROM cy, nx
), sums AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE) AS DECIMAL(28,6))) AS sxy,
         SUM(CAST(CAST(dx AS DOUBLE) * CAST(dx AS DOUBLE) AS DECIMAL(28,6))) AS sxx,
         SUM(CAST(CAST(dy AS DOUBLE) * CAST(dy AS DOUBLE) AS DECIMAL(28,6))) AS syy
  FROM rows_kv JOIN rx USING (x) JOIN ry USING (y)
)
SELECT 'l_quantity~l_discount' AS pair, n,
       ROUND(CAST(sxy AS DOUBLE)
             / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)), 6) AS rho
FROM sums
"""


# ------------------------------------------------- Kendall tau-b
def kendall_tau_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b between l_quantity and l_discount — concordant /
    discordant pair counting with the tie correction, exact at any
    row count because both domains are bounded: all pair accounting
    runs on the 50×11 CELL table (c_xy counts), so the "all pairs of
    rows" O(n²) definition collapses to a 550×550 cell theta join.
    C = Σ c_a·c_b over cell pairs with both coordinates increasing,
    D with coordinates opposing; tie terms from the marginals. Every
    sum is exact BIGINT (Σ c_a·c_b ≤ n²); τ-b is one IEEE expression.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.expr(_DK).alias("y"),
    )
    cells = li.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    a, b = cells.alias("a"), cells.alias("b")
    conc = (
        a.join(
            b,
            (F.col("b.x") > F.col("a.x")) & (F.col("b.y") > F.col("a.y")),
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("cc"))
    )
    disc = (
        a.join(
            b,
            (F.col("b.x") > F.col("a.x")) & (F.col("b.y") < F.col("a.y")),
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("dd"))
    )
    mx = cells.groupBy("x").agg(F.sum("c").alias("cx"))
    my = cells.groupBy("y").agg(F.sum("c").alias("cy"))
    tx = mx.agg(
        F.sum("cx").alias("n"),
        F.sum(F.col("cx") * (F.col("cx") - 1)).alias("t1x2"),
    )
    ty = my.agg(F.sum(F.col("cy") * (F.col("cy") - 1)).alias("t1y2"))
    s = (
        conc.crossJoin(F.broadcast(disc))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    n0x2 = F.col("n") * (F.col("n") - 1)  # 2·n0, matches 2·n1/2·n2 scale
    tau = (F.col("cc") - F.col("dd")).cast("double") / (
        F.sqrt(
            (n0x2 - F.col("t1x2")).cast("double")
            * (n0x2 - F.col("t1y2")).cast("double")
        )
        / F.lit(2.0)
    )
    return s.select(
        F.lit("l_quantity~l_discount").alias("pair"),
        "n",
        F.col("cc").alias("concordant"),
        F.col("dd").alias("discordant"),
        F.round(tau, 6).alias("tau_b"),
    )


KENDALL_SQL = f"""
WITH rows_kv AS (
  SELECT CAST(l_quantity AS BIGINT) AS x, {_DK} AS y FROM lineitem
), cells AS (
  SELECT x, y, COUNT(*) AS c FROM rows_kv GROUP BY x, y
), conc AS (
  SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS cc
  FROM cells a JOIN cells b ON b.x > a.x AND b.y > a.y
), disc AS (
  SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS dd
  FROM cells a JOIN cells b ON b.x > a.x AND b.y < a.y
), tx AS (
  SELECT CAST(SUM(cx) AS BIGINT) AS n,
         CAST(SUM(cx * (cx - 1)) AS BIGINT) AS t1x2
  FROM (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM cells GROUP BY x)
), ty AS (
  SELECT CAST(SUM(cy * (cy - 1)) AS BIGINT) AS t1y2
  FROM (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM cells GROUP BY y)
)
SELECT 'l_quantity~l_discount' AS pair, n, cc AS concordant, dd AS discordant,
       ROUND(CAST(cc - dd AS DOUBLE)
             / (sqrt(CAST(n * (n - 1) - t1x2 AS DOUBLE)
                     * CAST(n * (n - 1) - t1y2 AS DOUBLE)) / 2.0), 6) AS tau_b
FROM conc, disc, tx, ty
"""


# ------------------------------------------------- one-way ANOVA F
ANOVA_S = 1  # quantization scale for s_i²/n_i terms (price² units —
             # integer-unit rounding on ~1e12+ sums of squares keeps
             # the cross-group sum exact without overflowing BIGINT)


def anova_f_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean l_extendedprice differ across
    l_returnflag groups — F statistic and effect size η² from the
    per-group sufficient statistics (n_i, Σy, Σy²), the in-warehouse
    decomposition SST = SSB + SSW.

    Per-group sums are exact decimal(28,6) (sub-2^53 double products,
    the corr_matrix recipe). The cross-GROUP combination Σ s_i²/n_i
    sums k engine-ordered doubles, so each group's term is quantized
    floor(x·S + 0.5)::BIGINT first (drift_psi discipline) — the final
    F and η² are then one IEEE expression over exact integers and two
    exact decimal totals.
    """
    li = load_table(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice")
    per = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum(_dec(y)).alias("si"),
        F.sum(_dec(y * y)).alias("ssi"),
    )
    term = F.floor(
        F.col("si").cast("double")
        * F.col("si").cast("double")
        / F.col("ni").cast("double")
        * F.lit(float(ANOVA_S))
        + F.lit(0.5)
    ).cast("long")
    tot = per.select("ni", "si", "ssi", term.alias("qi")).agg(
        F.sum("ni").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("si").alias("s"),
        F.sum("ssi").alias("ss"),
        F.sum("qi").alias("q"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    q = F.col("q").cast("double") / F.lit(float(ANOVA_S))
    ssb = q - sd * sd / nd
    ssw = F.col("ss").cast("double") - q
    fstat = (ssb / (F.col("k") - F.lit(1)).cast("double")) / (
        ssw / (F.col("n") - F.col("k")).cast("double")
    )
    return tot.select(
        "n",
        "k",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(fstat, 6).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 6).alias("eta_sq"),
    )


ANOVA_SQL = f"""
WITH per AS (
  SELECT l_returnflag,
         COUNT(*) AS ni,
         SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS si,
         SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS ssi
  FROM lineitem GROUP BY l_returnflag
), tot AS (
  SELECT CAST(SUM(ni) AS BIGINT) AS n,
         COUNT(*) AS k,
         CAST(SUM(si) AS DECIMAL(28,6)) AS s,
         CAST(SUM(ssi) AS DECIMAL(28,6)) AS ss,
         CAST(SUM(CAST(floor(CAST(si AS DOUBLE) * CAST(si AS DOUBLE)
                             / CAST(ni AS DOUBLE) * {ANOVA_S} + 0.5) AS BIGINT))
              AS BIGINT) AS q
  FROM per
)
SELECT n, k,
       ROUND(CAST(q AS DOUBLE) / {ANOVA_S}
             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ss_between,
       ROUND(CAST(ss AS DOUBLE) - CAST(q AS DOUBLE) / {ANOVA_S}, 6) AS ss_within,
       ROUND((CAST(q AS DOUBLE) / {ANOVA_S}
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(k - 1 AS DOUBLE)
             / ((CAST(ss AS DOUBLE) - CAST(q AS DOUBLE) / {ANOVA_S})
                / CAST(n - k AS DOUBLE)), 6) AS f_stat,
       ROUND((CAST(q AS DOUBLE) / {ANOVA_S}
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / ((CAST(q AS DOUBLE) / {ANOVA_S}
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                + (CAST(ss AS DOUBLE) - CAST(q AS DOUBLE) / {ANOVA_S})), 6) AS eta_sq
FROM tot
"""
