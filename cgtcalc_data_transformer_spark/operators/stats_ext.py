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
    Σ_v cA(v)·(2·cumB<(v) + cB(v)) exact BIGINT, and T = Σ(t³−t) as
    double terms summed through DECIMAL(38,6) — unbounded in scale
    (a BIGINT sum overflows at ~sf10) and order-insensitive on both
    engines. One 50-row theta join + one single-row rollup — the
    shuffle carries ≤ 50 rows whatever the table size.
    z = (2U − mA·mB)/(2·σ) is one IEEE expression.
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
    # Σ(t³−t) through DECIMAL(38,6): at ~1.2M rows per value (≈sf10)
    # each t³ term is ~1.7e18 and a 50-term BIGINT sum overflows
    # int64 (ADVICE r7). Each term is computed in double — exact
    # below 2^53, and identical IEEE on both engines above it — then
    # cast to decimal so the SUM is order-insensitive and unbounded.
    td = t.cast("double")
    # 2U ~ m_A·m_B by nature: each term is an exact BIGINT but the SUM
    # crosses 2^63 around sf200 — sum through DECIMAL(38,0) (exact)
    s = cum.agg(
        F.sum("ca").alias("ma"),
        F.sum("cb").alias("mb"),
        F.sum(
            (F.col("ca") * (F.lit(2) * F.col("cumb") + F.col("cb")))
            .cast("decimal(38,0)")
        ).alias("u2a"),
        F.sum((td * td * td - td).cast("decimal(38,6)")).alias("tsum"),
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
         CAST(SUM(CAST(ca * (2 * cumb + cb) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS u2a,
         CAST(SUM(CAST(CAST(ca + cb AS DOUBLE) * CAST(ca + cb AS DOUBLE)
                       * CAST(ca + cb AS DOUBLE) - CAST(ca + cb AS DOUBLE)
                       AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS tsum
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
    # CACHED (r14 plan audit): each marginal backs both sides of its
    # rank theta-join + the total (3 refs) — uncached, each ref
    # re-scanned lineitem (7 scans,
    # plans/r14/spearman_rank_corr_before.txt). ≤ 50 / 11 rows
    # (guide §2.4).
    mx = li.groupBy("x").agg(F.count(F.lit(1)).alias("c")).cache()
    my = li.groupBy("y").agg(F.count(F.lit(1)).alias("c")).cache()

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
    D with coordinates opposing; tie terms from the marginals.

    Overflow routing (VERDICT r8 item 2, the mannwhitney u2a recipe):
    C, D and the tie sums are n²-scale — they cross 2^63 around
    sf200 even though each cell count is a safe BIGINT. Counts are
    cast to DECIMAL(19,0) BEFORE the multiply (so even a single
    c_a·c_b term can't overflow at any SF) and summed in
    DECIMAL(38,0), exact and order-insensitive; n(n−1) rides the
    same decimal path. concordant/discordant are emitted as DOUBLE
    in both twins — at 100 TB they exceed int64 by construction.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.expr(_DK).alias("y"),
    )
    d19 = "decimal(19,0)"
    cells = li.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    pair_term = F.col("a.c").cast(d19) * F.col("b.c").cast(d19)
    a, b = cells.alias("a"), cells.alias("b")
    conc = (
        a.join(
            b,
            (F.col("b.x") > F.col("a.x")) & (F.col("b.y") > F.col("a.y")),
        )
        .agg(F.sum(pair_term).alias("cc"))
    )
    disc = (
        a.join(
            b,
            (F.col("b.x") > F.col("a.x")) & (F.col("b.y") < F.col("a.y")),
        )
        .agg(F.sum(pair_term).alias("dd"))
    )
    mx = cells.groupBy("x").agg(F.sum("c").alias("cx"))
    my = cells.groupBy("y").agg(F.sum("c").alias("cy"))
    tx = mx.agg(
        F.sum("cx").alias("n"),
        F.sum(
            F.col("cx").cast(d19) * (F.col("cx") - 1).cast(d19)
        ).alias("t1x2"),
    )
    ty = my.agg(
        F.sum(
            F.col("cy").cast(d19) * (F.col("cy") - 1).cast(d19)
        ).alias("t1y2")
    )
    s = (
        conc.crossJoin(F.broadcast(disc))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    # 2·n0 = n(n−1), matches the 2·n1/2·n2 scale of the tie sums;
    # decimal so n² can't overflow BIGINT at large SF
    n0x2 = F.col("n").cast(d19) * (F.col("n") - 1).cast(d19)
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
        F.col("cc").cast("double").alias("concordant"),
        F.col("dd").cast("double").alias("discordant"),
        F.round(tau, 6).alias("tau_b"),
    )


KENDALL_SQL = f"""
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
       CAST(cc AS DOUBLE) AS concordant, CAST(dd AS DOUBLE) AS discordant,
       ROUND(CAST(cc - dd AS DOUBLE)
             / (sqrt(CAST(CAST(n AS DECIMAL(19,0)) * CAST(n - 1 AS DECIMAL(19,0))
                          - t1x2 AS DOUBLE)
                     * CAST(CAST(n AS DECIMAL(19,0)) * CAST(n - 1 AS DECIMAL(19,0))
                            - t1y2 AS DOUBLE)) / 2.0), 6) AS tau_b
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

# ------------------------------------------------ Cramér's V matrix
CRAMER_S = 10**6   # per-cell chi² term quantization

_CRAMER_PAIRS = [
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("lineitem", "l_returnflag", "l_linestatus"),
]


def cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association strength for categorical column pairs
    (priority×status on orders, returnflag×linestatus on lineitem) —
    the bounded-[0,1] normalization of χ² that a profiling pass uses
    to rank which dimensions actually co-vary before anyone builds a
    cube on them.

    Contingency cells are one map-side-combinable count per pair
    (≤ 15 cells); expected counts e = r·c/n are derived doubles, so
    each cell's (o−e)²/e term is quantized floor(x·1e6 + 0.5)::BIGINT
    before the cross-cell sum (drift_psi discipline). χ² and V are
    then IEEE expressions over exact integers. Both pairs union into
    one bounded result — no shuffle carries more rows than the cell
    count.
    """
    out = None
    for table, rc, cc in _CRAMER_PAIRS:
        t = load_table(spark, sf_dir, table)
        # CACHED (r14 plan audit): rows/cols/tot/dims and the scored
        # join all read cells (5 refs per pair) — uncached, each ref
        # re-scanned the base table (8 scans across the two pairs,
        # plans/r14/cramers_v_matrix_before.txt). ≤ 15 cells
        # (guide §2.4).
        cells = t.groupBy(
            F.col(rc).alias("r"), F.col(cc).alias("c")
        ).agg(F.count(F.lit(1)).alias("o")).cache()
        rows = cells.groupBy("r").agg(F.sum("o").alias("rn"))
        cols = cells.groupBy("c").agg(F.sum("o").alias("cn"))
        tot = cells.agg(F.sum("o").alias("n"))
        e = F.col("rn").cast("double") * F.col("cn").cast("double") / F.col(
            "n"
        ).cast("double")
        term = F.floor(
            (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e)
            / e
            * F.lit(float(CRAMER_S))
            + F.lit(0.5)
        ).cast("long")
        dims = cells.agg(
            F.countDistinct("r").alias("nr"), F.countDistinct("c").alias("nc")
        )
        s = (
            cells.join(F.broadcast(rows), "r")
            .join(F.broadcast(cols), "c")
            .crossJoin(F.broadcast(tot))
            .select(term.alias("q"), "n")
            .groupBy("n")
            .agg(F.sum("q").alias("chi2q"))
            .crossJoin(F.broadcast(dims))
        )
        chi2 = F.col("chi2q").cast("double") / F.lit(float(CRAMER_S))
        v = F.sqrt(
            chi2
            / (
                F.col("n").cast("double")
                * F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
            )
        )
        res = s.select(
            F.lit(f"{table}.{rc}~{cc}").alias("pair"),
            "n",
            F.col("nr").alias("n_rowcats"),
            F.col("nc").alias("n_colcats"),
            F.round(chi2, 6).alias("chi2"),
            F.round(v, 6).alias("cramers_v"),
        )
        out = res if out is None else out.unionByName(res)
    return out.orderBy("pair")


def _cramer_pair_sql(table: str, rc: str, cc: str) -> str:
    return f"""
SELECT '{table}.{rc}~{cc}' AS pair, n, nr AS n_rowcats, nc AS n_colcats,
       ROUND(CAST(chi2q AS DOUBLE) / {CRAMER_S}, 6) AS chi2,
       ROUND(sqrt(CAST(chi2q AS DOUBLE) / {CRAMER_S}
                  / (CAST(n AS DOUBLE) * CAST(LEAST(nr - 1, nc - 1) AS DOUBLE))), 6) AS cramers_v
FROM (
  SELECT CAST(SUM(CAST(floor((CAST(o AS DOUBLE) - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(o AS DOUBLE) - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(n AS DOUBLE))
                             / (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(n AS DOUBLE))
                             * {CRAMER_S} + 0.5) AS BIGINT)) AS BIGINT) AS chi2q,
         ANY_VALUE(n) AS n,
         COUNT(DISTINCT r) AS nr, COUNT(DISTINCT c) AS nc
  FROM (
    SELECT cells.r, cells.c, cells.o, rows_m.rn, cols_m.cn, tot.n
    FROM (SELECT {rc} AS r, {cc} AS c, COUNT(*) AS o FROM {table} GROUP BY 1, 2) cells
    JOIN (SELECT {rc} AS r, COUNT(*) AS rn FROM {table} GROUP BY 1) rows_m USING (r)
    JOIN (SELECT {cc} AS c, COUNT(*) AS cn FROM {table} GROUP BY 1) cols_m USING (c)
    CROSS JOIN (SELECT COUNT(*) AS n FROM {table}) tot
  )
)
"""


CRAMERS_V_SQL = (
    _cramer_pair_sql(*_CRAMER_PAIRS[0])
    + "UNION ALL"
    + _cramer_pair_sql(*_CRAMER_PAIRS[1])
    + "ORDER BY pair"
)


# ------------------------------------------- mutual information (binned)
MI_S = 10**9   # per-cell p·ln term quantization


def mutual_information_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (and normalized MI) between the decile-
    binned l_quantity and l_returnflag — the model-free dependence
    screen feature stores run before training: MI ≈ 0 means the
    feature carries nothing about the label, NMI normalizes by
    sqrt(H_x·H_y) for cross-pair comparability.

    Bins: (quantity−1) div 10 → 5 ordinal cells; all probabilities
    are exact integer ratios of one cell-count aggregation. Each
    cell's (c/n)·ln(c·n/(r·cl)) term (and each marginal's entropy
    term) is quantized ::BIGINT before its sum — c·n and r·cl stay
    below 2^53 so the ln argument is an exact double on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        ((F.col("l_quantity").cast("long") - 1) / 10)
        .cast("long")
        .alias("xb"),
        F.col("l_returnflag").alias("yb"),
    )
    # CACHED (r14 plan audit): mx/my/tot and the scored join read
    # cells 4x — uncached, each ref re-scanned lineitem (8 scans,
    # plans/r14/mutual_information_binned_before.txt). ≤ 15 cells
    # (guide §2.4).
    cells = li.groupBy("xb", "yb").agg(F.count(F.lit(1)).alias("c")).cache()
    mx = cells.groupBy("xb").agg(F.sum("c").alias("rx"))
    my = cells.groupBy("yb").agg(F.sum("c").alias("cy"))
    tot = cells.agg(F.sum("c").alias("n"))
    mi_t = F.floor(
        F.col("c").cast("double")
        / F.col("n").cast("double")
        * F.log(
            (F.col("c") * F.col("n")).cast("double")
            / (F.col("rx") * F.col("cy")).cast("double")
        )
        * F.lit(float(MI_S))
        + F.lit(0.5)
    ).cast("long")
    mi_q = (
        cells.join(F.broadcast(mx), "xb")
        .join(F.broadcast(my), "yb")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(mi_t).alias("miq"), F.max("n").alias("n"))
    )

    def ent_q(marg: DataFrame, cnt: str) -> DataFrame:
        t = F.floor(
            -(F.col(cnt).cast("double") / F.col("n").cast("double"))
            * F.log(F.col(cnt).cast("double") / F.col("n").cast("double"))
            * F.lit(float(MI_S))
            + F.lit(0.5)
        ).cast("long")
        return marg.crossJoin(F.broadcast(tot)).agg(F.sum(t).alias(f"h_{cnt}"))

    hx = ent_q(mx, "rx")
    hy = ent_q(my, "cy")
    s = mi_q.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    mi = F.col("miq").cast("double") / F.lit(float(MI_S))
    hxd = F.col("h_rx").cast("double") / F.lit(float(MI_S))
    hyd = F.col("h_cy").cast("double") / F.lit(float(MI_S))
    return s.select(
        F.lit("qty_decile~returnflag").alias("pair"),
        "n",
        F.round(mi, 6).alias("mi"),
        F.round(hxd, 6).alias("h_x"),
        F.round(hyd, 6).alias("h_y"),
        F.round(mi / F.sqrt(hxd * hyd), 6).alias("nmi"),
    )


MUTUAL_INFO_SQL = f"""
WITH rows_kv AS (
  SELECT (CAST(l_quantity AS BIGINT) - 1) // 10 AS xb, l_returnflag AS yb
  FROM lineitem
), cells AS (
  SELECT xb, yb, COUNT(*) AS c FROM rows_kv GROUP BY xb, yb
), mx AS (SELECT xb, CAST(SUM(c) AS BIGINT) AS rx FROM cells GROUP BY xb),
my AS (SELECT yb, CAST(SUM(c) AS BIGINT) AS cy FROM cells GROUP BY yb),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
miq AS (
  SELECT CAST(SUM(CAST(floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                             * ln(CAST(c * n AS DOUBLE) / CAST(rx * cy AS DOUBLE))
                             * {MI_S} + 0.5) AS BIGINT)) AS BIGINT) AS miq,
         MAX(n) AS n
  FROM cells JOIN mx USING (xb) JOIN my USING (yb) CROSS JOIN tot
), hx AS (
  SELECT CAST(SUM(CAST(floor(-(CAST(rx AS DOUBLE) / CAST(n AS DOUBLE))
                             * ln(CAST(rx AS DOUBLE) / CAST(n AS DOUBLE))
                             * {MI_S} + 0.5) AS BIGINT)) AS BIGINT) AS hxq
  FROM mx CROSS JOIN tot
), hy AS (
  SELECT CAST(SUM(CAST(floor(-(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))
                             * ln(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))
                             * {MI_S} + 0.5) AS BIGINT)) AS BIGINT) AS hyq
  FROM my CROSS JOIN tot
)
SELECT 'qty_decile~returnflag' AS pair, n,
       ROUND(CAST(miq AS DOUBLE) / {MI_S}, 6) AS mi,
       ROUND(CAST(hxq AS DOUBLE) / {MI_S}, 6) AS h_x,
       ROUND(CAST(hyq AS DOUBLE) / {MI_S}, 6) AS h_y,
       ROUND((CAST(miq AS DOUBLE) / {MI_S})
             / sqrt((CAST(hxq AS DOUBLE) / {MI_S}) * (CAST(hyq AS DOUBLE) / {MI_S})), 6) AS nmi
FROM miq, hx, hy
"""


# ------------------------------------------- Simpson's paradox audit
def simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: the pooled OLS slope of
    l_extendedprice ~ l_quantity versus each l_returnflag group's
    slope, flagging sign reversals — aggregation reversing a
    within-group trend is the classic way a dashboard lies, and this
    audit is the standing check for it.

    The pooled statistics are the exact-decimal SUMS of the group
    statistics (decimal addition is associative — no double
    accumulation across groups), so both levels come from ONE
    map-side-combinable aggregation; slopes are single IEEE
    expressions; the reversal flag compares unrounded doubles that
    are bit-identical across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    per = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum(_dec(x)).alias("sx"),
        F.sum(_dec(y)).alias("sy"),
        F.sum(_dec(x * y)).alias("sxy"),
        F.sum(_dec(x * x)).alias("sxx"),
    )
    pooled = per.agg(
        F.sum("ni").alias("n"),
        F.sum("sx").alias("px"),
        F.sum("sy").alias("py"),
        F.sum("sxy").alias("pxy"),
        F.sum("sxx").alias("pxx"),
    )

    def slope(n, sx, sy, sxy, sxx):
        nd = F.col(n).cast("double")
        return (
            nd * F.col(sxy).cast("double")
            - F.col(sx).cast("double") * F.col(sy).cast("double")
        ) / (
            nd * F.col(sxx).cast("double")
            - F.col(sx).cast("double") * F.col(sx).cast("double")
        )

    g = slope("ni", "sx", "sy", "sxy", "sxx")
    p = slope("n", "px", "py", "pxy", "pxx")
    return (
        per.crossJoin(F.broadcast(pooled))
        .select(
            "l_returnflag",
            F.col("ni").alias("n"),
            F.round(g, 6).alias("slope"),
            F.round(p, 6).alias("pooled_slope"),
            ((g > 0) != (p > 0)).alias("sign_reversed"),
        )
        .orderBy("l_returnflag")
    )


SIMPSON_SQL = """
WITH per AS (
  SELECT l_returnflag,
         COUNT(*) AS ni,
         SUM(CAST(l_quantity AS DECIMAL(28,6))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS sy,
         SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS sxy,
         SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS sxx
  FROM lineitem GROUP BY l_returnflag
), pooled AS (
  SELECT CAST(SUM(ni) AS BIGINT) AS n,
         CAST(SUM(sx) AS DECIMAL(28,6)) AS px,
         CAST(SUM(sy) AS DECIMAL(28,6)) AS py,
         CAST(SUM(sxy) AS DECIMAL(28,6)) AS pxy,
         CAST(SUM(sxx) AS DECIMAL(28,6)) AS pxx
  FROM per
)
SELECT l_returnflag, ni AS n,
       ROUND((ni * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (ni * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
       ROUND((n * CAST(pxy AS DOUBLE) - CAST(px AS DOUBLE) * CAST(py AS DOUBLE))
             / (n * CAST(pxx AS DOUBLE) - CAST(px AS DOUBLE) * CAST(px AS DOUBLE)), 6) AS pooled_slope,
       ((ni * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (ni * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0)
       <> ((n * CAST(pxy AS DOUBLE) - CAST(px AS DOUBLE) * CAST(py AS DOUBLE))
           / (n * CAST(pxx AS DOUBLE) - CAST(px AS DOUBLE) * CAST(px AS DOUBLE)) > 0)
         AS sign_reversed
FROM per CROSS JOIN pooled
ORDER BY l_returnflag
"""

# --------------------------------------------------- MAD outliers
MAD_K_NUM = 44478   # 3 · 1.4826 · 10⁴ — the robust-z cutoff as an
MAD_K_DEN = 10**4   # integer ratio so the outlier test never touches
                    # a double


def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit of document length per source: exact
    median, exact MAD (median absolute deviation), and the count of
    docs beyond the standard |x − med| > 3·1.4826·MAD fence — the
    outlier rule that, unlike mean/σ z-scores, is not itself dragged
    by the outliers it hunts.

    Both medians are exact without any sort: per-VALUE counts +
    bounded theta-join prefix sums give the rank-straddling value via
    a CASE-sum (the value domain is doc length, not corpus size).
    Working in DOUBLED units keeps everything integer: med2 = lo+hi
    ranks' values, dev2 = |2v − med2|, mad4 = lo+hi of the dev2
    domain; the fence is the pure-integer cross-multiply
    10⁴·2·dev2 > 44478·mad4. One more broadcast join back to the
    value table counts outliers — no row-level second pass.

    CACHED frames (r14 plan audit): vals/devs back the rank-straddle
    theta-join (2 refs each), the totals, the dev re-count and the
    fence; med/mad are re-read by three consumers. Uncached, the
    lineage expansion scanned documents 31x
    (plans/r14/mad_outliers_before.txt). Every cached frame is
    value-domain bounded (per-(source, length) counts or |sources|
    rows), so this is the guide §2.4 pass removal at bounded memory.
    """
    docs = load_table(spark, sf_dir, "documents")
    vals = (
        docs.groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )

    def med2_of(frame: DataFrame, out: str) -> DataFrame:
        """2·median of the (source, v, c) frame via rank straddle."""
        cum = (
            frame.alias("a")
            .join(
                frame.alias("b"),
                (F.col("a.source") == F.col("b.source"))
                & (F.col("b.v") < F.col("a.v")),
                "left",
            )
            .groupBy(
                F.col("a.source").alias("source"),
                F.col("a.v").alias("v"),
                F.col("a.c").alias("c"),
            )
            .agg(F.coalesce(F.sum("b.c"), F.lit(0)).alias("cum"))
        )
        tot = frame.groupBy("source").agg(F.sum("c").alias("n"))
        j = cum.join(F.broadcast(tot), "source")
        lo = (F.col("n") + 1) / 2
        hi = (F.col("n") + 2) / 2
        pick = lambda r: F.sum(  # noqa: E731
            F.when(
                (F.col("cum") < r) & (r <= F.col("cum") + F.col("c")),
                F.col("v"),
            ).otherwise(F.lit(0))
        )
        return j.groupBy("source", "n").agg(
            (pick(F.floor(lo)) + pick(F.floor(hi))).alias(out)
        )

    med = med2_of(vals, "med2").cache()
    devs = (
        vals.join(F.broadcast(med.select("source", "med2")), "source")
        .select(
            "source",
            F.abs(F.lit(2) * F.col("v") - F.col("med2")).alias("v"),
            "c",
        )
        .groupBy("source", "v")
        .agg(F.sum("c").alias("c"))
        .cache()
    )
    mad = med2_of(devs, "mad4").select(
        "source", F.col("mad4")
    ).cache()
    fence = vals.join(F.broadcast(med.select("source", "med2")), "source").join(
        F.broadcast(mad), "source"
    )
    out_c = fence.groupBy("source").agg(
        F.sum(
            F.when(
                F.lit(2 * MAD_K_DEN)
                * F.abs(F.lit(2) * F.col("v") - F.col("med2"))
                > F.lit(MAD_K_NUM) * F.col("mad4"),
                F.col("c"),
            ).otherwise(F.lit(0))
        ).alias("n_outliers")
    )
    return (
        med.join(F.broadcast(mad), "source")
        .join(F.broadcast(out_c), "source")
        .select(
            "source",
            "n",
            (F.col("med2") / F.lit(2.0)).alias("median"),
            (F.col("mad4") / F.lit(4.0)).alias("mad"),
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n"), 6).alias(
                "outlier_share"
            ),
        )
        .orderBy("source")
    )


MAD_OUTLIERS_SQL = f"""
WITH vals AS (
  SELECT source, n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1, 2
), cum AS (
  SELECT a.source, a.v, a.c, CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS cum
  FROM vals a LEFT JOIN vals b ON a.source = b.source AND b.v < a.v
  GROUP BY a.source, a.v, a.c
), tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM vals GROUP BY source
), med AS (
  SELECT cum.source, ANY_VALUE(tot.n) AS n,
         CAST(SUM(CASE WHEN cum < (n + 1) // 2 AND (n + 1) // 2 <= cum + c
                       THEN v ELSE 0 END)
              + SUM(CASE WHEN cum < (n + 2) // 2 AND (n + 2) // 2 <= cum + c
                         THEN v ELSE 0 END) AS BIGINT) AS med2
  FROM cum JOIN tot ON cum.source = tot.source
  GROUP BY cum.source
), devs AS (
  SELECT vals.source, ABS(2 * v - med2) AS v, CAST(SUM(c) AS BIGINT) AS c
  FROM vals JOIN med ON vals.source = med.source
  GROUP BY vals.source, ABS(2 * v - med2)
), dcum AS (
  SELECT a.source, a.v, a.c, CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS cum
  FROM devs a LEFT JOIN devs b ON a.source = b.source AND b.v < a.v
  GROUP BY a.source, a.v, a.c
), mad AS (
  SELECT dcum.source,
         CAST(SUM(CASE WHEN cum < (n + 1) // 2 AND (n + 1) // 2 <= cum + c
                       THEN v ELSE 0 END)
              + SUM(CASE WHEN cum < (n + 2) // 2 AND (n + 2) // 2 <= cum + c
                         THEN v ELSE 0 END) AS BIGINT) AS mad4
  FROM dcum JOIN tot ON dcum.source = tot.source
  GROUP BY dcum.source
), outc AS (
  SELECT vals.source,
         CAST(SUM(CASE WHEN {2 * MAD_K_DEN} * ABS(2 * v - med2)
                            > {MAD_K_NUM} * mad4
                       THEN c ELSE 0 END) AS BIGINT) AS n_outliers
  FROM vals JOIN med ON vals.source = med.source
            JOIN mad ON vals.source = mad.source
  GROUP BY vals.source
)
SELECT med.source, med.n,
       med2 / 2.0 AS median,
       mad4 / 4.0 AS mad,
       n_outliers,
       ROUND(n_outliers / med.n, 6) AS outlier_share
FROM med JOIN mad ON med.source = mad.source
         JOIN outc ON med.source = outc.source
ORDER BY med.source
"""


# ---------------------------------------------- trimmed/winsorized mean
TRIM_PCT_DEN = 10   # trim n div 10 rows (10%) from each tail


def trimmed_mean_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location report for document length per source: plain
    mean, 10%-trimmed mean, and winsorized mean — the triplet that
    tells a curation pipeline whether its "average doc length" is a
    real central tendency or three giant documents (trimmed ≪ mean ⇒
    heavy tail; winsorized between them quantifies the clamp).

    Same per-VALUE rank machinery as mad_outliers: with k = n div 10,
    a value keeps max(0, min(cum+c, n−k) − max(cum, k)) of its count
    inside the trim window — exact integer interval intersection per
    VALUE, not per row; the winsorized tails reuse the rank-straddle
    CASE-sum for the clamp values. Sums are Σc·v BIGINT; every mean
    is one exact int/int division.
    """
    docs = load_table(spark, sf_dir, "documents")
    vals = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = (
        vals.alias("a")
        .join(
            vals.alias("b"),
            (F.col("a.source") == F.col("b.source"))
            & (F.col("b.v") < F.col("a.v")),
            "left",
        )
        .groupBy(
            F.col("a.source").alias("source"),
            F.col("a.v").alias("v"),
            F.col("a.c").alias("c"),
        )
        .agg(F.coalesce(F.sum("b.c"), F.lit(0)).alias("cum"))
    )
    tot = vals.groupBy("source").agg(F.sum("c").alias("n"))
    j = cum.join(F.broadcast(tot), "source")
    k = F.floor(F.col("n") / TRIM_PCT_DEN).cast("long")
    kept = F.greatest(
        F.lit(0),
        F.least(F.col("cum") + F.col("c"), F.col("n") - k)
        - F.greatest(F.col("cum"), k),
    )
    pick = lambda r: F.sum(  # noqa: E731
        F.when(
            (F.col("cum") < r) & (r <= F.col("cum") + F.col("c")), F.col("v")
        ).otherwise(F.lit(0))
    )
    s = j.groupBy("source", "n").agg(
        F.sum(F.col("c") * F.col("v")).alias("sv"),
        F.sum(kept * F.col("v")).alias("tsv"),
        pick(k + 1).alias("vlo"),
        pick(F.col("n") - k).alias("vhi"),
    )
    kk = F.floor(F.col("n") / TRIM_PCT_DEN).cast("long")
    return s.select(
        "source",
        "n",
        kk.alias("k_trim"),
        F.round(F.col("sv") / F.col("n"), 6).alias("mean"),
        F.round(F.col("tsv") / (F.col("n") - F.lit(2) * kk), 6).alias(
            "trimmed_mean"
        ),
        F.round(
            (F.col("tsv") + kk * (F.col("vlo") + F.col("vhi"))) / F.col("n"),
            6,
        ).alias("winsor_mean"),
    ).orderBy("source")


TRIMMED_MEAN_SQL = f"""
WITH vals AS (
  SELECT source, n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1, 2
), cum AS (
  SELECT a.source, a.v, a.c, CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS cum
  FROM vals a LEFT JOIN vals b ON a.source = b.source AND b.v < a.v
  GROUP BY a.source, a.v, a.c
), tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM vals GROUP BY source
), s AS (
  SELECT cum.source, ANY_VALUE(tot.n) AS n,
         ANY_VALUE(tot.n // {TRIM_PCT_DEN}) AS k,
         CAST(SUM(c * v) AS BIGINT) AS sv,
         CAST(SUM(GREATEST(0, LEAST(cum + c, n - n // {TRIM_PCT_DEN})
                              - GREATEST(cum, n // {TRIM_PCT_DEN})) * v) AS BIGINT) AS tsv,
         CAST(SUM(CASE WHEN cum < n // {TRIM_PCT_DEN} + 1
                            AND n // {TRIM_PCT_DEN} + 1 <= cum + c
                       THEN v ELSE 0 END) AS BIGINT) AS vlo,
         CAST(SUM(CASE WHEN cum < n - n // {TRIM_PCT_DEN}
                            AND n - n // {TRIM_PCT_DEN} <= cum + c
                       THEN v ELSE 0 END) AS BIGINT) AS vhi
  FROM cum JOIN tot ON cum.source = tot.source
  GROUP BY cum.source
)
SELECT source, n, k AS k_trim,
       ROUND(sv / n, 6) AS mean,
       ROUND(tsv / (n - 2 * k), 6) AS trimmed_mean,
       ROUND((tsv + k * (vlo + vhi)) / n, 6) AS winsor_mean
FROM s
ORDER BY source
"""

# -------------------------------------- logistic regression (IRLS)
LOGIT_ITERS = 4
LOGIT_BS = 10**9    # beta quantization between iterations
LOGIT_TS = 10**6    # per-value term quantization inside each iteration


def _logit_step(bins, b0, b1):
    """One IRLS/Newton step over the binned (x, n, y) table using
    EXACTLY the arithmetic the oracle's unrolled CTEs spell: per-x
    terms quantized ::int before the 50-term sums, betas re-quantized
    to 1e-9 after the 2×2 solve. bins: list of (x, n_x, y_x)."""
    import math as _m

    g0 = g1 = h00 = h01 = h11 = 0
    for x, n, y in bins:
        p = 1.0 / (1.0 + _m.exp(-(b0 + b1 * x)))
        w = p * (1.0 - p)
        g0 += _m.floor((y - n * p) * LOGIT_TS + 0.5)
        g1 += _m.floor(x * (y - n * p) * LOGIT_TS + 0.5)
        h00 += _m.floor(n * w * LOGIT_TS + 0.5)
        h01 += _m.floor(x * n * w * LOGIT_TS + 0.5)
        h11 += _m.floor(x * x * n * w * LOGIT_TS + 0.5)
    det = float(h00) * float(h11) - float(h01) * float(h01)
    if det == 0.0:
        # degenerate Hessian (e.g. a single occupied x bin, or IRLS
        # drove every p to 0/1): skip the Newton step rather than
        # divide by zero — mirrored in the SQL twins' CASE guard
        # (ADVICE r10)
        return (b0, b1)
    nb0 = b0 + (float(h11) * g0 - float(h01) * g1) / det
    nb1 = b1 + (float(h00) * g1 - float(h01) * g0) / det
    return (
        _m.floor(nb0 * LOGIT_BS + 0.5) / LOGIT_BS,
        _m.floor(nb1 * LOGIT_BS + 0.5) / LOGIT_BS,
    )


def logistic_regression_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression of P(returnflag = 'R') on l_quantity via
    IRLS/Newton (the GLM workhorse) — {LOGIT_ITERS} damp-free steps
    on the BINNED feature: l_quantity has 50 values, so the exact
    sufficient statistics are one 50-row aggregation and every
    iteration is arithmetic over that bounded table, not a data pass.
    The flag is generated independently of quantity, so the audit's
    expected answer is β₁ ≈ 0 — the null-effect detection this
    screen exists for (same contract as ols_regression's R² ≈ 0).

    Determinism through the iterations: per-x gradient/Hessian terms
    are quantized ::int before the 50-term sums, and β is re-
    quantized to 1e-9 after each 2×2 solve, so the driver-side loop
    (bounded collect — the kmeans-centroid pattern) and the oracle's
    {LOGIT_ITERS} unrolled CTEs walk the identical rational sequence;
    the only transcendental is exp on identical doubles.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bins_df = li.groupBy(F.col("l_quantity").cast("long").alias("x")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("y"),
    )
    bins = [(r["x"], r["n"], r["y"]) for r in bins_df.collect()]  # ≤ 50 rows
    bins.sort()
    b0, b1 = 0.0, 0.0
    for _ in range(LOGIT_ITERS):
        b0, b1 = _logit_step(bins, b0, b1)
    import math as _m

    n_tot = sum(n for _, n, _ in bins)
    llq = 0
    for x, n, y in bins:
        p = _clamp_p(1.0 / (1.0 + _m.exp(-(b0 + b1 * x))))
        llq += _m.floor(
            (y * _m.log(p) + (n - y) * _m.log(1.0 - p)) * LOGIT_TS + 0.5
        )
    out = [(n_tot, b0, b1, -llq / LOGIT_TS / n_tot)]
    # no ROUND: betas sit on the exact 1e-9 quantization grid and the
    # loss is an exact 1e-6 rational over n — rounding would re-open
    # the cross-engine .5-tie hazard the grid exists to avoid
    return spark.createDataFrame(
        out, "n long, beta0 double, beta1 double, avg_log_loss double"
    )


# log-loss probability clamp: keeps ln() off exact 0/1 when IRLS
# drives a bin's sigmoid to saturation (ADVICE r10); an identity on
# any p more than 1e-12 from the bounds, so realized values (and
# driver hashes) are unchanged on non-degenerate data
LOGIT_EPS = 1e-12


def _clamp_p(p: float) -> float:
    return min(max(p, LOGIT_EPS), 1.0 - LOGIT_EPS)


def _sql_clamp(expr: str) -> str:
    return f"GREATEST(LEAST({expr}, 1.0 - {LOGIT_EPS!r}), {LOGIT_EPS!r})"


def logit_steps_sql() -> str:
    """The unrolled IRLS/Newton CTE chain over a `bins`(x, n, y)
    table — ONE text shared by logistic_regression_irls's and
    platt_scaling's oracles so the two twins can never drift. Each
    b{{k}} guards the 2x2 solve against a zero determinant (single
    occupied bin / fully saturated sigmoid) by skipping the step,
    mirroring _logit_step's early return."""
    det = (
        "(CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)"
        " - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE))"
    )
    steps = []
    for k in range(1, LOGIT_ITERS + 1):
        steps.append(f""", s{k} AS (
  SELECT
    CAST(SUM(CAST(floor((y - n * (1.0 / (1.0 + exp(-(b0 + b1 * x))))) * {LOGIT_TS} + 0.5) AS BIGINT)) AS BIGINT) AS g0,
    CAST(SUM(CAST(floor(x * (y - n * (1.0 / (1.0 + exp(-(b0 + b1 * x))))) * {LOGIT_TS} + 0.5) AS BIGINT)) AS BIGINT) AS g1,
    CAST(SUM(CAST(floor(n * (1.0 / (1.0 + exp(-(b0 + b1 * x)))) * (1.0 - 1.0 / (1.0 + exp(-(b0 + b1 * x)))) * {LOGIT_TS} + 0.5) AS BIGINT)) AS BIGINT) AS h00,
    CAST(SUM(CAST(floor(x * n * (1.0 / (1.0 + exp(-(b0 + b1 * x)))) * (1.0 - 1.0 / (1.0 + exp(-(b0 + b1 * x)))) * {LOGIT_TS} + 0.5) AS BIGINT)) AS BIGINT) AS h01,
    CAST(SUM(CAST(floor(x * x * n * (1.0 / (1.0 + exp(-(b0 + b1 * x)))) * (1.0 - 1.0 / (1.0 + exp(-(b0 + b1 * x)))) * {LOGIT_TS} + 0.5) AS BIGINT)) AS BIGINT) AS h11
  FROM bins, b{k - 1}
), b{k} AS (
  SELECT CASE WHEN {det} = 0 THEN b0 ELSE
         floor((b0 + (CAST(h11 AS DOUBLE) * g0 - CAST(h01 AS DOUBLE) * g1)
                     / {det})
               * {LOGIT_BS} + 0.5) / {LOGIT_BS}.0 END AS b0,
         CASE WHEN {det} = 0 THEN b1 ELSE
         floor((b1 + (CAST(h00 AS DOUBLE) * g1 - CAST(h01 AS DOUBLE) * g0)
                     / {det})
               * {LOGIT_BS} + 0.5) / {LOGIT_BS}.0 END AS b1
  FROM s{k}, b{k - 1}
)""")
    return "".join(steps)


def logit_loss_sql() -> str:
    """The avg-log-loss SELECT tail over `bins` + b{LOGIT_ITERS},
    shared by both logistic oracles; sigmoid clamped off 0/1."""
    p = "1.0 / (1.0 + exp(-(b0 + b1 * x)))"
    return f"""
SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM bins) AS n,
       b0 AS beta0,
       b1 AS beta1,
       (-(SELECT CAST(SUM(CAST(floor((y * ln({_sql_clamp(p)})
                                      + (n - y) * ln({_sql_clamp(f"1.0 - {p}")}))
                                     * {LOGIT_TS} + 0.5) AS BIGINT)) AS BIGINT)
          FROM bins) / {LOGIT_TS}.0)
       / (SELECT CAST(SUM(n) AS BIGINT) FROM bins) AS avg_log_loss
FROM b{LOGIT_ITERS}
"""


def _logit_sql() -> str:
    return f"""
WITH bins AS MATERIALIZED (
  SELECT CAST(l_quantity AS BIGINT) AS x, COUNT(*) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
), b0 AS (SELECT 0.0 AS b0, 0.0 AS b1){logit_steps_sql()}{logit_loss_sql()}"""


LOGISTIC_IRLS_SQL = _logit_sql()


# ------------------------------------------------ jackknife variance
JACK_S = 10**6   # replicate-deviation quantization (1e-6 grid keeps
                 # di^2 sums far inside BIGINT for any group spread)


def jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-SOURCE jackknife for mean document length (Tukey
    1958): each replicate drops one source and re-estimates the mean
    from the complement's exact sums — the grouped-data uncertainty
    estimate that respects source-level correlation, which the iid
    bootstrap_ci_mean deliberately ignores. Reported: θ̂, the
    jackknife SE, and the replicate spread.

    One per-source aggregation (g ≤ dozens of rows); every replicate
    θ̂₍ᵢ₎ = (S − sᵢ)/(N − nᵢ) is an exact integer rational. The
    quantized quantity is the DEVIATION θ̂₍ᵢ₎ − θ̂ (small, so its
    1e-9-grid square never overflows BIGINT — quantizing the raw
    replicate would at ~10⁹-scale means); variance then follows from
    Σd² − (Σd)²/g in exact integers with one final scale division.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("ni"), F.sum("n_chars").alias("si")
    )
    tot = per.agg(
        F.sum("ni").alias("n"),
        F.sum("si").alias("s"),
        F.count(F.lit(1)).alias("g"),
    )
    j = per.crossJoin(F.broadcast(tot))
    theta_hat = F.col("s").cast("double") / F.col("n").cast("double")
    theta_i = (F.col("s") - F.col("si")).cast("double") / (
        F.col("n") - F.col("ni")
    ).cast("double")
    di = F.floor(
        (theta_i - theta_hat) * F.lit(float(JACK_S)) + F.lit(0.5)
    ).cast("long")
    s2 = j.select("n", "s", "g", di.alias("di")).groupBy("n", "s", "g").agg(
        F.sum("di").alias("sd"), F.sum(F.col("di") * F.col("di")).alias("sdd")
    )
    gd = F.col("g").cast("double")
    var_rep = (
        F.col("sdd").cast("double")
        - F.col("sd").cast("double") * F.col("sd").cast("double") / gd
    ) / (gd * F.lit(float(JACK_S) ** 2))
    jack_var = (gd - F.lit(1.0)) * var_rep
    return s2.select(
        F.col("g").alias("n_groups"),
        F.round(F.col("s") / F.col("n"), 6).alias("theta_hat"),
        F.round(
            F.col("s").cast("double") / F.col("n").cast("double")
            + F.col("sd").cast("double") / (gd * F.lit(float(JACK_S))),
            6,
        ).alias("mean_replicate"),
        F.round(F.sqrt(jack_var), 6).alias("jack_se"),
    )


JACKKNIFE_SQL = f"""
WITH per AS (
  SELECT source, COUNT(*) AS ni, CAST(SUM(n_chars) AS BIGINT) AS si
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(ni) AS BIGINT) AS n, CAST(SUM(si) AS BIGINT) AS s,
         COUNT(*) AS g
  FROM per
), reps AS (
  SELECT n, s, g,
         CAST(floor((CAST(s - si AS DOUBLE) / CAST(n - ni AS DOUBLE)
                     - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * {JACK_S} + 0.5) AS BIGINT) AS di
  FROM per CROSS JOIN tot
), s2 AS (
  SELECT n, s, g,
         CAST(SUM(di) AS BIGINT) AS sd,
         CAST(SUM(di * di) AS BIGINT) AS sdd
  FROM reps GROUP BY n, s, g
)
SELECT g AS n_groups,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS theta_hat,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             + CAST(sd AS DOUBLE) / (CAST(g AS DOUBLE) * {JACK_S}), 6) AS mean_replicate,
       ROUND(sqrt((CAST(g AS DOUBLE) - 1.0)
                  * (CAST(sdd AS DOUBLE)
                     - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / CAST(g AS DOUBLE))
                  / (CAST(g AS DOUBLE) * {float(JACK_S) ** 2!r})), 6) AS jack_se
FROM s2
"""

# ------------------------------------------- Gumbel block-maxima fit
EVT_GAMMA = 0.5772156649015329     # Euler-Mascheroni
EVT_PI = 3.141592653589793
EVT_SQRT6 = 2.449489742783178      # √6
# −ln(−ln(q)) return-level factors, precomputed as literals so no
# engine evaluates nested ln of a constant
EVT_Y99 = 4.600149226776579        # q = 0.99


def extreme_value_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel fit of daily-maximum order value by block maxima +
    method of moments (Gumbel 1958): β̂ = σ√6/π, μ̂ = m − γβ̂, and the
    1%-day return level μ̂ + β̂·4.6001 — the capacity-planning answer
    to "how big an order should the pipeline expect on a bad day",
    which mean/p99 on the raw stream understate because maxima have
    their own distribution.

    Block maxima are one day-grouped MAX (map-side combinable; the
    day domain bounds everything downstream); mean/σ of the maxima
    come from exact decimal(28,6) sums (2-decimal money, sub-2^53
    products); the Gumbel parameters are one IEEE expression with
    all transcendental constants baked as literals.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.max("o_totalprice").alias("mx"))
    s = daily.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum(_dec(F.col("mx"))).alias("sm"),
        F.sum(_dec(F.col("mx") * F.col("mx"))).alias("smm"),
    )
    nd = F.col("nd").cast("double")
    mean = F.col("sm").cast("double") / nd
    var = F.col("smm").cast("double") / nd - mean * mean
    beta = F.sqrt(var) * F.lit(EVT_SQRT6) / F.lit(EVT_PI)
    mu = mean - F.lit(EVT_GAMMA) * beta
    return s.select(
        F.col("nd").alias("n_days"),
        F.round(mean, 6).alias("mean_max"),
        F.round(F.sqrt(var), 6).alias("sd_max"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(mu + beta * F.lit(EVT_Y99), 6).alias("return_level_p99"),
    )


EXTREME_VALUE_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, MAX(o_totalprice) AS mx
  FROM orders GROUP BY 1
), s AS (
  SELECT COUNT(*) AS nd,
         SUM(CAST(mx AS DECIMAL(28,6))) AS sm,
         SUM(CAST(mx * mx AS DECIMAL(28,6))) AS smm
  FROM daily
)
SELECT nd AS n_days,
       ROUND(CAST(sm AS DOUBLE) / nd, 6) AS mean_max,
       ROUND(sqrt(CAST(smm AS DOUBLE) / nd
                  - (CAST(sm AS DOUBLE) / nd) * (CAST(sm AS DOUBLE) / nd)), 6) AS sd_max,
       ROUND(sqrt(CAST(smm AS DOUBLE) / nd
                  - (CAST(sm AS DOUBLE) / nd) * (CAST(sm AS DOUBLE) / nd))
             * {EVT_SQRT6!r} / {EVT_PI!r}, 6) AS gumbel_beta,
       ROUND(CAST(sm AS DOUBLE) / nd
             - {EVT_GAMMA!r} * (sqrt(CAST(smm AS DOUBLE) / nd
                                     - (CAST(sm AS DOUBLE) / nd) * (CAST(sm AS DOUBLE) / nd))
                                * {EVT_SQRT6!r} / {EVT_PI!r}), 6) AS gumbel_mu,
       ROUND(CAST(sm AS DOUBLE) / nd
             - {EVT_GAMMA!r} * (sqrt(CAST(smm AS DOUBLE) / nd
                                     - (CAST(sm AS DOUBLE) / nd) * (CAST(sm AS DOUBLE) / nd))
                                * {EVT_SQRT6!r} / {EVT_PI!r})
             + (sqrt(CAST(smm AS DOUBLE) / nd
                     - (CAST(sm AS DOUBLE) / nd) * (CAST(sm AS DOUBLE) / nd))
                * {EVT_SQRT6!r} / {EVT_PI!r}) * {EVT_Y99!r}, 6) AS return_level_p99
FROM s
"""

# --------------------------------------------- Kruskal-Wallis H test
KW_CRIT_DF2 = 5.991465  # chi²(2), 5% — 3 returnflag groups


def kruskal_wallis_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: does l_quantity differ in distribution
    across ALL THREE l_returnflag groups — the k-group extension of
    mannwhitney_u_test (one-way ANOVA's rank-based sibling), with the
    tie correction that a 50-value domain makes mandatory.

    Same per-VALUE machinery: doubled tied ranks 2r_v = 2·cum< + c + 1
    from one 50-row theta join; per-group doubled rank sums
    2R_g = Σ c_gv·2r_v stay exact BIGINT; H's Σ(2R_g)²/(4n_g) terms
    are computed in double from those exact longs and summed through
    DECIMAL(38,6) — the term reaches ~2·10¹⁹ at sf1 (the r7 sweep
    caught the BIGINT-quantized form overflowing), and a decimal sum
    of identical doubles is order-insensitive on both engines. The
    tie term Σ(t³−t) rides the same double-term DECIMAL(38,6) sum
    (the BIGINT form overflows at ~sf10 — ADVICE r7).
    """
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.groupBy(
        F.col("l_quantity").cast("long").alias("v"), "l_returnflag"
    ).agg(F.count(F.lit(1)).alias("c"))
    tv = vals.groupBy("v").agg(F.sum("c").alias("t"))
    cum = (
        tv.alias("a")
        .join(tv.alias("b"), F.col("b.v") < F.col("a.v"), "left")
        .groupBy(F.col("a.v").alias("v"), F.col("a.t").alias("t"))
        .agg(F.coalesce(F.sum("b.t"), F.lit(0)).alias("cum"))
    )
    ranked = vals.join(F.broadcast(cum), "v").select(
        "l_returnflag",
        "c",
        (F.lit(2) * F.col("cum") + F.col("t") + 1).alias("r2"),
        "t",
    )
    per_g = ranked.groupBy("l_returnflag").agg(
        F.sum("c").alias("ng"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("r2").cast("decimal(19,0)")).alias("r2g"),
    )
    # Σ(t³−t) via double terms summed in DECIMAL(38,6) — the BIGINT
    # sum overflows at ~sf10 (50 terms × ~1.7e18); same recipe as the
    # q term below and mannwhitney's tsum (ADVICE r7).
    td = F.col("t").cast("double")
    ties = tv.agg(
        F.sum("t").alias("n"),
        F.sum((td * td * td - td).cast("decimal(38,6)")).alias("tsum"),
    )
    term = (
        F.col("r2g").cast("double")
        * F.col("r2g").cast("double")
        / (F.lit(4.0) * F.col("ng").cast("double"))
    ).cast("decimal(38,6)")
    s = (
        per_g.crossJoin(F.broadcast(ties))
        .groupBy("n", "tsum")
        .agg(F.sum(term).alias("q"), F.count(F.lit(1)).alias("k"))
    )
    nd = F.col("n").cast("double")
    h = (
        F.lit(12.0) / (nd * (nd + F.lit(1.0))) * F.col("q").cast("double")
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("tsum").cast("double") / (nd * nd * nd - nd)
    return s.select(
        "k",
        "n",
        F.round(h, 6).alias("h_stat"),
        F.round(h / corr, 6).alias("h_corrected"),
        (h / corr > F.lit(KW_CRIT_DF2)).alias("significant"),
    )


KRUSKAL_WALLIS_SQL = f"""
WITH vals AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, l_returnflag, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
), tv AS (
  SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM vals GROUP BY v
), cum AS (
  SELECT a.v, a.t, CAST(COALESCE(SUM(b.t), 0) AS BIGINT) AS cum
  FROM tv a LEFT JOIN tv b ON b.v < a.v GROUP BY a.v, a.t
), per_g AS (
  SELECT l_returnflag,
         CAST(SUM(c) AS BIGINT) AS ng,
         CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(2 * cum + t + 1 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS r2g
  FROM vals JOIN cum USING (v)
  GROUP BY l_returnflag
), ties AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(t AS DOUBLE) * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
                       - CAST(t AS DOUBLE) AS DECIMAL(38,6)))
              AS DECIMAL(38,6)) AS tsum
  FROM tv
), s AS (
  SELECT n, tsum, COUNT(*) AS k,
         CAST(SUM(CAST(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
                       / (4.0 * CAST(ng AS DOUBLE)) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS q
  FROM per_g CROSS JOIN ties
  GROUP BY n, tsum
)
SELECT k, n,
       ROUND(12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * CAST(q AS DOUBLE)
             - 3.0 * CAST(n + 1 AS DOUBLE), 6) AS h_stat,
       ROUND((12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * CAST(q AS DOUBLE)
              - 3.0 * CAST(n + 1 AS DOUBLE))
             / (1.0 - CAST(tsum AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6) AS h_corrected,
       (12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * CAST(q AS DOUBLE)
        - 3.0 * CAST(n + 1 AS DOUBLE))
       / (1.0 - CAST(tsum AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
       > {KW_CRIT_DF2} AS significant
FROM s
"""


# ------------------------------------------------ Mood's median test
MOOD_CRIT_DF2 = 5.991465
MOOD_S = 10**6


def moods_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: are the three l_returnflag groups' shares
    of line items ABOVE the grand median l_quantity homogeneous — the
    maximally robust (if low-power) k-group location test, the one
    that survives any outlier regime because it only looks at the
    median split.

    The grand (lower) median comes from the per-VALUE rank straddle;
    the k×2 above/not-above table is one conditional aggregation; χ²
    terms quantize before the 6-term sum. Everything after the first
    50-row count table is constant-size work.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v"), "l_returnflag"
    )
    # CACHED (r14 plan audit): tv backs the rank-straddle theta-join
    # (2 refs) + the total; med/cells are each read twice — uncached
    # the lineage expansion scanned lineitem 11x
    # (plans/r14/moods_median_test_before.txt). All cached frames are
    # value-domain / k-group sized (guide §2.4).
    tv = li.groupBy("v").agg(F.count(F.lit(1)).alias("t")).cache()
    cum = (
        tv.alias("a")
        .join(tv.alias("b"), F.col("b.v") < F.col("a.v"), "left")
        .groupBy(F.col("a.v").alias("v"), F.col("a.t").alias("t"))
        .agg(F.coalesce(F.sum("b.t"), F.lit(0)).alias("cum"))
    )
    tot = tv.agg(F.sum("t").alias("n"))
    # Lower-median rank must be FLOORED to match the SQL twin's
    # integer division (n+1)//2 — unfloored (n+1)/2 is n/2+0.5 for
    # even n and the two engines straddle different ranks whenever
    # the cumulative count hits exactly n/2 at a value boundary
    # (ADVICE r7; mad_outliers got this right from the start).
    r = F.floor((F.col("n") + 1) / 2)
    med = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.when(
                    (F.col("cum") < r) & (r <= F.col("cum") + F.col("t")),
                    F.col("v"),
                ).otherwise(F.lit(0))
            ).alias("med")
        )
        .cache()
    )
    cells = li.crossJoin(F.broadcast(med)).groupBy("l_returnflag").agg(
        F.sum((F.col("v") > F.col("med")).cast("long")).alias("above"),
        F.sum((F.col("v") <= F.col("med")).cast("long")).alias("notabove"),
    ).cache()
    marg = cells.agg(
        F.sum("above").alias("ta"),
        F.sum("notabove").alias("tn"),
        F.count(F.lit(1)).alias("k"),
    )
    j = cells.crossJoin(F.broadcast(marg))
    n = (F.col("ta") + F.col("tn")).cast("double")
    rg = (F.col("above") + F.col("notabove")).cast("double")

    def chi_term(obs, col_tot):
        e = rg * F.col(col_tot).cast("double") / n
        return F.floor(
            (F.col(obs).cast("double") - e)
            * (F.col(obs).cast("double") - e)
            / e
            * F.lit(float(MOOD_S))
            + F.lit(0.5)
        ).cast("long")

    s = j.select(
        "k",
        "ta",
        "tn",
        (chi_term("above", "ta") + chi_term("notabove", "tn")).alias("q"),
    ).groupBy("k", "ta", "tn").agg(F.sum("q").alias("chiq"))
    chi2 = F.col("chiq").cast("double") / F.lit(float(MOOD_S))
    return s.crossJoin(F.broadcast(med)).select(
        "k",
        (F.col("ta") + F.col("tn")).alias("n"),
        F.col("med").alias("grand_median"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(MOOD_CRIT_DF2)).alias("significant"),
    )


MOODS_MEDIAN_SQL = f"""
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, l_returnflag FROM lineitem
), tv AS (
  SELECT v, COUNT(*) AS t FROM li GROUP BY v
), cum AS (
  SELECT a.v, a.t, CAST(COALESCE(SUM(b.t), 0) AS BIGINT) AS cum
  FROM tv a LEFT JOIN tv b ON b.v < a.v GROUP BY a.v, a.t
), tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM tv
), med AS (
  SELECT CAST(SUM(CASE WHEN cum < (n + 1) // 2 AND (n + 1) // 2 <= cum + t
                       THEN v ELSE 0 END) AS BIGINT) AS med
  FROM cum CROSS JOIN tot
), cells AS (
  SELECT l_returnflag,
         CAST(SUM(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT) AS above,
         CAST(SUM(CASE WHEN v <= med THEN 1 ELSE 0 END) AS BIGINT) AS notabove
  FROM li CROSS JOIN med
  GROUP BY l_returnflag
), marg AS (
  SELECT CAST(SUM(above) AS BIGINT) AS ta, CAST(SUM(notabove) AS BIGINT) AS tn,
         COUNT(*) AS k
  FROM cells
), s AS (
  SELECT k, ta, tn,
         CAST(SUM(
           CAST(floor((CAST(above AS DOUBLE)
                       - CAST(above + notabove AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(ta + tn AS DOUBLE))
                      * (CAST(above AS DOUBLE)
                         - CAST(above + notabove AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(ta + tn AS DOUBLE))
                      / (CAST(above + notabove AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(ta + tn AS DOUBLE))
                      * {MOOD_S} + 0.5) AS BIGINT)
           + CAST(floor((CAST(notabove AS DOUBLE)
                         - CAST(above + notabove AS DOUBLE) * CAST(tn AS DOUBLE) / CAST(ta + tn AS DOUBLE))
                        * (CAST(notabove AS DOUBLE)
                           - CAST(above + notabove AS DOUBLE) * CAST(tn AS DOUBLE) / CAST(ta + tn AS DOUBLE))
                        / (CAST(above + notabove AS DOUBLE) * CAST(tn AS DOUBLE) / CAST(ta + tn AS DOUBLE))
                        * {MOOD_S} + 0.5) AS BIGINT)) AS BIGINT) AS chiq
  FROM cells CROSS JOIN marg
  GROUP BY k, ta, tn
)
SELECT k, ta + tn AS n, med AS grand_median,
       ROUND(CAST(chiq AS DOUBLE) / {MOOD_S}, 6) AS chi2,
       CAST(chiq AS DOUBLE) / {MOOD_S} > {MOOD_CRIT_DF2} AS significant
FROM s CROSS JOIN med
"""


# ------------------------------------------------- effect-size panel
def effect_size_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect sizes for returned ('R') vs normal ('N') l_quantity:
    Cohen's d (pooled-SD standardized mean difference), Hedges' g
    (small-sample bias correction), and Cliff's δ (the rank-based,
    distribution-free magnitude) — the panel a reviewer asks for the
    moment mannwhitney_u_test says "significant", because at 60k rows
    everything is significant and only magnitude matters.

    d/g come from decimal-exact per-group (n, Σx, Σx²); Cliff's δ
    reuses the per-VALUE dominance counts (#a>b, #a<b as exact
    BIGINT sums over the 50-value table) — no pair enumeration.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    x = F.col("l_quantity")
    per = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(_dec(x)).alias("sx"),
        F.sum(_dec(x * x)).alias("sxx"),
    )
    a = per.filter(F.col("l_returnflag") == "R").select(
        F.col("m").alias("ma"), F.col("sx").alias("sa"), F.col("sxx").alias("ssa")
    )
    b = per.filter(F.col("l_returnflag") == "N").select(
        F.col("m").alias("mb"), F.col("sx").alias("sb"), F.col("sxx").alias("ssb")
    )
    vals = li.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("ca"),
        F.sum((F.col("l_returnflag") == "N").cast("long")).alias("cb"),
    )
    cum = (
        vals.alias("p")
        .join(vals.alias("q"), F.col("q.v") < F.col("p.v"), "left")
        .groupBy(
            F.col("p.v").alias("v"),
            F.col("p.ca").alias("ca"),
            F.col("p.cb").alias("cb"),
        )
        .agg(F.coalesce(F.sum("q.cb"), F.lit(0)).alias("cumb"))
    )
    dom = cum.agg(
        F.sum(F.col("ca").cast("decimal(19,0)") * F.col("cumb").cast("decimal(19,0)")).alias("gt"),
        F.sum("ca").alias("mma"),
        F.sum("cb").alias("mmb"),
        F.sum(F.col("ca").cast("decimal(19,0)") * F.col("cb").cast("decimal(19,0)")).alias("eq"),
    )
    j = a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(dom))
    mad = F.col("ma").cast("double")
    mbd = F.col("mb").cast("double")
    mean_a = F.col("sa").cast("double") / mad
    mean_b = F.col("sb").cast("double") / mbd
    var_a = (
        F.col("ssa").cast("double") - F.col("sa").cast("double") * mean_a
    ) / (mad - F.lit(1.0))
    var_b = (
        F.col("ssb").cast("double") - F.col("sb").cast("double") * mean_b
    ) / (mbd - F.lit(1.0))
    sp = F.sqrt(
        ((mad - 1) * var_a + (mbd - 1) * var_b) / (mad + mbd - F.lit(2.0))
    )
    d = (mean_a - mean_b) / sp
    g = d * (
        F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * (mad + mbd) - F.lit(9.0))
    )
    # #(a<b) = mA·mB − #(a>b) − #ties
    lt = F.col("ma") * F.col("mb") - F.col("gt") - F.col("eq")
    delta = (F.col("gt") - lt).cast("double") / (
        F.col("ma") * F.col("mb")
    ).cast("double")
    return j.select(
        F.col("ma").alias("m_a"),
        F.col("mb").alias("m_b"),
        F.round(mean_a - mean_b, 6).alias("mean_diff"),
        F.round(d, 6).alias("cohens_d"),
        F.round(g, 6).alias("hedges_g"),
        F.round(delta, 6).alias("cliffs_delta"),
    )


EFFECT_SIZE_SQL = """
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, l_quantity, l_returnflag
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
), per AS (
  SELECT l_returnflag, COUNT(*) AS m,
         SUM(CAST(l_quantity AS DECIMAL(28,6))) AS sx,
         SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS sxx
  FROM li GROUP BY l_returnflag
), a AS (SELECT m AS ma, sx AS sa, sxx AS ssa FROM per WHERE l_returnflag = 'R'
), b AS (SELECT m AS mb, sx AS sb, sxx AS ssb FROM per WHERE l_returnflag = 'N'
), vals AS (
  SELECT v,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM li GROUP BY v
), cum AS (
  SELECT p.v, p.ca, p.cb, CAST(COALESCE(SUM(q.cb), 0) AS BIGINT) AS cumb
  FROM vals p LEFT JOIN vals q ON q.v < p.v GROUP BY p.v, p.ca, p.cb
), dom AS (
  SELECT CAST(SUM(CAST(ca AS DECIMAL(19,0)) * CAST(cumb AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS gt,
         CAST(SUM(CAST(ca AS DECIMAL(19,0)) * CAST(cb AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS eq
  FROM cum
)
SELECT ma AS m_a, mb AS m_b,
       ROUND(CAST(sa AS DOUBLE) / ma - CAST(sb AS DOUBLE) / mb, 6) AS mean_diff,
       ROUND((CAST(sa AS DOUBLE) / ma - CAST(sb AS DOUBLE) / mb)
             / sqrt(((ma - 1) * ((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * (CAST(sa AS DOUBLE) / ma)) / (ma - 1.0))
                     + (mb - 1) * ((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * (CAST(sb AS DOUBLE) / mb)) / (mb - 1.0)))
                    / (ma + mb - 2.0)), 6) AS cohens_d,
       ROUND((CAST(sa AS DOUBLE) / ma - CAST(sb AS DOUBLE) / mb)
             / sqrt(((ma - 1) * ((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * (CAST(sa AS DOUBLE) / ma)) / (ma - 1.0))
                     + (mb - 1) * ((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * (CAST(sb AS DOUBLE) / mb)) / (mb - 1.0)))
                    / (ma + mb - 2.0))
             * (1.0 - 3.0 / (4.0 * (ma + mb) - 9.0)), 6) AS hedges_g,
       ROUND(CAST(gt - (ma * mb - gt - eq) AS DOUBLE) / CAST(ma * mb AS DOUBLE), 6) AS cliffs_delta
FROM a CROSS JOIN b CROSS JOIN dom
"""

# ------------------------------------------------ OLS leverage audit
LEV_MULT = 4   # flag h > LEV_MULT·p/n with p = 2 (the standard 2p/n
               # rule doubled for the bounded-domain report)


def ols_leverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-diagnostics leverage profile for the
    l_extendedprice ~ l_quantity fit: h(x) = 1/n + (x − x̄)²/Sxx per
    DISTINCT regressor value, with the row count carrying that
    leverage — the "which x-values can single-handedly steer the
    fit" audit that ols_regression's coefficients don't show.

    The bounded domain makes the hat diagonal a 50-row derivation
    from three exact sums: h(v) = 1/n + (n·v − Sx)²/(n·(n·Sxx −
    Sx²)), every factor an exact BIGINT (Σx² ≤ 50²·n). Flags compare
    the identical double to the literal 2p/n-style cutoff.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v")
    )
    vals = li.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    tot = vals.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("v")).alias("sx"),
        F.sum(F.col("c") * F.col("v") * F.col("v")).alias("sxx"),
    )
    j = vals.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    dev = (F.col("n") * F.col("v") - F.col("sx")).cast("double")
    sxx_c = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    h = F.lit(1.0) / nd + dev * dev / (nd * sxx_c)
    cutoff = F.lit(float(LEV_MULT)) * F.lit(2.0) / nd
    return j.select(
        "v",
        "c",
        F.round(h, 6).alias("leverage"),
        F.round(h * F.col("c").cast("double"), 6).alias("group_leverage"),
        (h > cutoff).alias("high_leverage"),
    ).orderBy("v")


OLS_LEVERAGE_SQL = f"""
WITH vals AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * v) AS BIGINT) AS sx,
         CAST(SUM(c * v * v) AS BIGINT) AS sxx
  FROM vals
)
SELECT v, c,
       ROUND(1.0 / CAST(n AS DOUBLE)
             + CAST(n * v - sx AS DOUBLE) * CAST(n * v - sx AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n * sxx - sx * sx AS DOUBLE)), 6) AS leverage,
       ROUND((1.0 / CAST(n AS DOUBLE)
              + CAST(n * v - sx AS DOUBLE) * CAST(n * v - sx AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n * sxx - sx * sx AS DOUBLE)))
             * CAST(c AS DOUBLE), 6) AS group_leverage,
       (1.0 / CAST(n AS DOUBLE)
        + CAST(n * v - sx AS DOUBLE) * CAST(n * v - sx AS DOUBLE)
          / (CAST(n AS DOUBLE) * CAST(n * sxx - sx * sx AS DOUBLE)))
       > {LEV_MULT} * 2.0 / CAST(n AS DOUBLE) AS high_leverage
FROM vals CROSS JOIN tot
ORDER BY v
"""

# ------------------------------------------ Cochran-Armitage trend
CA_Z_CRIT = 1.96


def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a LINEAR TREND in the return rate
    across ordered quantity deciles (scores 0..4): a plain χ²
    (chi2_label_shift's family) only says "the rates differ
    somewhere"; this asks the dose-response question — does the
    probability of a return rise (or fall) MONOTONICALLY with order
    size. The standard ordered-categories × binary-outcome test
    (Cochran 1954; Armitage 1955).

    One 5-cell aggregation; the trend statistic
    z = Σsᵢ(rᵢ − nᵢR/N) / sqrt(p(1−p)·[NΣnᵢsᵢ² − (Σnᵢsᵢ)²]/N) is a
    single IEEE expression over six exact BIGINT sums (scores are
    small integer literals, every product stays far inside 2^63).
    The flag is generated independently of quantity, so the expected
    verdict is NO trend — the null-effect contract shared with
    ols_regression and logistic_regression_irls.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        ((F.col("l_quantity").cast("long") - 1) / 10).cast("long").alias("s")
    ).agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("ri"),
    )
    tot = cells.agg(
        F.sum("ni").alias("n"),
        F.sum("ri").alias("r"),
        F.sum(F.col("s") * F.col("ri")).alias("sr"),
        F.sum(F.col("s") * F.col("ni")).alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("ni")).alias("ssn"),
    )
    nd = F.col("n").cast("double")
    p = F.col("r").cast("double") / nd
    num = F.col("sr").cast("double") - F.col("sn").cast("double") * p
    var = (
        p
        * (F.lit(1.0) - p)
        * (
            F.col("ssn").cast("double")
            - F.col("sn").cast("double") * F.col("sn").cast("double") / nd
        )
    )
    z = num / F.sqrt(var)
    return tot.select(
        "n",
        F.col("r").alias("n_returned"),
        F.round(p, 6).alias("base_rate"),
        F.round(z, 6).alias("z_trend"),
        (F.abs(z) > F.lit(CA_Z_CRIT)).alias("significant"),
    )


COCHRAN_ARMITAGE_SQL = f"""
WITH cells AS (
  SELECT (CAST(l_quantity AS BIGINT) - 1) // 10 AS s,
         COUNT(*) AS ni,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ri
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT CAST(SUM(ni) AS BIGINT) AS n,
         CAST(SUM(ri) AS BIGINT) AS r,
         CAST(SUM(s * ri) AS BIGINT) AS sr,
         CAST(SUM(s * ni) AS BIGINT) AS sn,
         CAST(SUM(s * s * ni) AS BIGINT) AS ssn
  FROM cells
)
SELECT n, r AS n_returned,
       ROUND(CAST(r AS DOUBLE) / CAST(n AS DOUBLE), 6) AS base_rate,
       ROUND((CAST(sr AS DOUBLE) - CAST(sn AS DOUBLE) * (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)))
             / sqrt((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                    * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(ssn AS DOUBLE)
                       - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS z_trend,
       ABS((CAST(sr AS DOUBLE) - CAST(sn AS DOUBLE) * (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)))
           / sqrt((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                  * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(ssn AS DOUBLE)
                     - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)))) > {CA_Z_CRIT}
         AS significant
FROM tot
"""
