"""Data-quality gate: declarative expectations evaluated in bulk
(the Deequ/Great-Expectations shape, Spark-first).

One row per check — completeness (null rate), uniqueness (key
cardinality), range/domain conformance, and referential integrity —
with the violation count and pass flag. Two plan families only:

- column expectations fold into a SINGLE full-scan aggregation
  (every check is a conditional sum — map-side combinable, one pass
  over the fact table no matter how many checks ride on it);
- referential integrity is a LEFT ANTI join against the distinct
  parent keys (equality join; parent side broadcastable when it is a
  dimension).

At 100 TB this is the "gate every ingest batch" operator: constant
passes, no per-check jobs, violations countable without materializing
violating rows.

The reference's analog is its per-field fail-fast validation
(``freetrade.js:133-147``, ``ii.js:62-85`` — throw on first bad
field); this is the collect-don't-throw generalization its
``collect-violations`` debugging mode (SURVEY §7.4) pointed at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

VALID_STATUS = ("F", "O", "P")
VALID_PRIORITIES = (
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
)


def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate over ``orders``: 6 expectations, 2 jobs' worth of
    plan (one scan-agg + one anti-join count), emitted as one tidy
    (check, violations, total, passed) frame."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def viol(cond) -> F.Column:  # count rows VIOLATING the expectation
        return F.sum(F.when(~cond, 1).otherwise(0).cast("long"))

    wide = orders.agg(
        F.count(F.lit(1)).alias("total"),
        viol(F.col("o_orderkey").isNotNull()).alias("v_key_complete"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v_key_unique"),
        viol(F.col("o_totalprice") > 0).alias("v_price_positive"),
        viol(F.col("o_orderstatus").isin(*VALID_STATUS)).alias("v_status_domain"),
        viol(F.col("o_orderpriority").isin(*VALID_PRIORITIES)).alias(
            "v_priority_domain"
        ),
    )
    # customer scales with the corpus — no broadcast hint on the
    # anti-join's build side; AQE broadcasts it only while it fits
    orphans = (
        orders.select("o_custkey")
        .join(
            customer.select("c_custkey").distinct(),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v_fk_customer"))
    )
    wide = wide.crossJoin(orphans)

    checks = [
        ("key_complete", "v_key_complete"),
        ("key_unique", "v_key_unique"),
        ("price_positive", "v_price_positive"),
        ("status_domain", "v_status_domain"),
        ("priority_domain", "v_priority_domain"),
        ("fk_customer", "v_fk_customer"),
    ]
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check"),
                        F.col(col).alias("violations"),
                        F.col("total").alias("total"),
                        (F.col(col) == 0).alias("passed"),
                    )
                    for name, col in checks
                ]
            )
        ).alias("c")
    )
    return stacked.select("c.*").orderBy("check")


DQ_CHECKS_SQL = f"""
WITH wide AS (
  SELECT COUNT(*) AS total,
         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_key_complete,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_key_unique,
         CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) AS v_price_positive,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN {VALID_STATUS!r} THEN 1 ELSE 0 END) AS BIGINT) AS v_status_domain,
         CAST(SUM(CASE WHEN o_orderpriority NOT IN {VALID_PRIORITIES!r} THEN 1 ELSE 0 END) AS BIGINT) AS v_priority_domain
  FROM orders
), fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_fk_customer
  FROM orders ANTI JOIN customer ON o_custkey = c_custkey
)
SELECT 'fk_customer' AS "check", v_fk_customer AS violations, total, v_fk_customer = 0 AS passed FROM wide, fk
UNION ALL
SELECT 'key_complete', v_key_complete, total, v_key_complete = 0 FROM wide
UNION ALL
SELECT 'key_unique', v_key_unique, total, v_key_unique = 0 FROM wide
UNION ALL
SELECT 'price_positive', v_price_positive, total, v_price_positive = 0 FROM wide
UNION ALL
SELECT 'priority_domain', v_priority_domain, total, v_priority_domain = 0 FROM wide
UNION ALL
SELECT 'status_domain', v_status_domain, total, v_status_domain = 0 FROM wide
ORDER BY "check"
"""


# ----------------------------------------------- GDPR erasure cascade
ERASE_PCT = 5  # md5 bucket < 5 → customer requested erasure


def erasure_propagate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade audit: a deterministic 5% of customers
    request deletion; propagate through the FK chain
    customer → orders → lineitem and report, per table, total /
    deleted / surviving row counts.

    Scale shape: the deletion predicate on customers is a pure column
    expression; orders inherit it through ONE equality join on
    custkey; lineitem inherits through one join on orderkey against
    the *deleted-orders key set* (a small side — deleted keys are a
    few % of orders — so AQE broadcasts it; the lineitem fact table is
    never shuffled). Each audit row is a map-side-combinable
    conditional-count aggregation; nothing is re-scanned per table.
    In production the same plan runs as three anti-join DELETEs; the
    audit IS the dry-run.
    """
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", (hash_bucket(F.col("c_custkey")) < ERASE_PCT).alias("erase")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")

    def audit(df: DataFrame, table: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("rows_total"),
            F.sum(F.col("erase").cast("long")).alias("rows_deleted"),
            F.sum((~F.col("erase")).cast("long")).alias("rows_kept"),
        ).select(F.lit(table).alias("table_name"), "rows_total", "rows_deleted", "rows_kept")

    o_flag = orders.join(cust, orders.o_custkey == cust.c_custkey, "left").select(
        "o_orderkey", F.coalesce("erase", F.lit(False)).alias("erase")
    )
    deleted_orders = o_flag.filter("erase").select(
        "o_orderkey", F.lit(True).alias("del_flag")
    )
    l_flag = li.join(
        deleted_orders, li.l_orderkey == deleted_orders.o_orderkey, "left"
    ).select(F.coalesce("del_flag", F.lit(False)).alias("erase"))
    return (
        audit(cust, "customer")
        .unionByName(audit(o_flag, "orders"))
        .unionByName(audit(l_flag, "lineitem"))
        .orderBy("table_name")
    )


ERASURE_SQL = f"""
WITH cust AS (
  SELECT c_custkey,
         ('0x' || substr(md5(c_custkey::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 < {ERASE_PCT} AS erase
  FROM customer
), o_flag AS (
  SELECT o.o_orderkey, COALESCE(c.erase, FALSE) AS erase
  FROM orders o LEFT JOIN cust c ON o.o_custkey = c.c_custkey
), l_flag AS (
  SELECT COALESCE(of2.erase, FALSE) AS erase
  FROM lineitem l LEFT JOIN (SELECT o_orderkey, erase FROM o_flag WHERE erase) of2
    ON l.l_orderkey = of2.o_orderkey
)
SELECT 'customer' AS table_name, COUNT(*) AS rows_total,
       CAST(SUM(CASE WHEN erase THEN 1 ELSE 0 END) AS BIGINT) AS rows_deleted,
       CAST(SUM(CASE WHEN erase THEN 0 ELSE 1 END) AS BIGINT) AS rows_kept
FROM cust
UNION ALL
SELECT 'orders', COUNT(*),
       CAST(SUM(CASE WHEN erase THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN erase THEN 0 ELSE 1 END) AS BIGINT)
FROM o_flag
UNION ALL
SELECT 'lineitem', COUNT(*),
       CAST(SUM(CASE WHEN erase THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN erase THEN 0 ELSE 1 END) AS BIGINT)
FROM l_flag
ORDER BY table_name
"""


# ----------------------------------------- k-anonymity / l-diversity
KANON_K = 5      # a QI group smaller than K is re-identifiable
KANON_L = 3      # a group with < L distinct sensitive values leaks
KANON_BAL_BUCKET = 1000  # sensitive attribute: acctbal coarsened to $1k


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity + l-diversity audit (Sweeney 2002; Machanavajjhala
    2007) of the customer table under the quasi-identifier set
    (nation, market segment), with account balance coarsened to $1k
    buckets as the sensitive attribute — the release-gate check a
    governance pipeline runs before sharing 'anonymized' extracts:
    rows in QI groups smaller than K are linkable; groups where the
    sensitive attribute takes < L distinct values leak it even when
    k-anonymous. One summary row per nation: groups, rows, rows at
    k-risk, k-risk rate, groups failing l-diversity.

    Two aggregations end to end — (QI, sensitive) distinct counts
    fold into the QI group pass, then a per-nation rollup; every
    metric is exact integer arithmetic. The QI group count is
    bounded by the QI value domain, not the table.
    """
    cust = load_table(spark, sf_dir, "customer")
    bal_bucket = F.floor(F.col("c_acctbal") / F.lit(float(KANON_BAL_BUCKET)))
    groups = (
        cust.select(
            "c_nationkey", "c_mktsegment", bal_bucket.alias("sens")
        )
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col("sens")).alias("n_sens"),
        )
    )
    return (
        groups.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_rows").alias("n_rows"),
            F.sum(
                F.when(F.col("n_rows") < KANON_K, F.col("n_rows")).otherwise(0)
            ).alias("rows_at_k_risk"),
            F.sum((F.col("n_sens") < KANON_L).cast("long")).alias(
                "groups_low_diversity"
            ),
        )
        .select(
            "c_nationkey",
            "n_groups",
            "n_rows",
            "rows_at_k_risk",
            F.round(F.col("rows_at_k_risk") / F.col("n_rows"), 6).alias(
                "k_risk_rate"
            ),
            "groups_low_diversity",
        )
        .orderBy("c_nationkey")
    )


K_ANONYMITY_SQL = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS n_rows,
         COUNT(DISTINCT CAST(floor(c_acctbal / {KANON_BAL_BUCKET}) AS BIGINT)) AS n_sens
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey,
       COUNT(*) AS n_groups,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN n_rows < {KANON_K} THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_at_k_risk,
       ROUND(SUM(CASE WHEN n_rows < {KANON_K} THEN n_rows ELSE 0 END)
             / SUM(n_rows), 6) AS k_risk_rate,
       CAST(SUM(CASE WHEN n_sens < {KANON_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_low_diversity
FROM groups
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ------------------------------------------------- Benford's-law audit
BENFORD_SCALE = 10**6
# P(first digit = d) = log10(1 + 1/d), quantized at 1e-6
BENFORD_P_INT = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]
BENFORD_CHI2_CRIT_INT = 15507000  # chi2(0.95, dof=8) = 15.507, at 1e-6


def benfords_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of o_totalprice — the forensic
    screen (Nigrini's fraud-detection staple) for fabricated or
    re-scaled numeric columns: naturally-occurring multi-magnitude
    amounts follow P(d) = log10(1+1/d); uniform generators and
    manual entry don't. Per digit: observed count, observed vs
    expected share; plus the chi-square statistic and its alpha=.05
    flag repeated on each row. (This fixture's prices are uniform
    within a band, so the audit CORRECTLY flags them — asserted in
    the test; on organic ledgers it clears.)

    First digit via regexp on the canonical string form — no
    float log10 near power-of-ten boundaries. One 9-row count
    aggregation; expected counts from the 1-row total broadcast and
    integer Benford probabilities; each (o-e)²/e term is quantized
    to an integer BEFORE the final sum (the chi2_label_shift
    recipe).
    """
    orders = load_table(spark, sf_dir, "orders")
    dstr = F.regexp_extract(
        F.abs(F.col("o_totalprice")).cast("string"), r"^([1-9])", 1
    )
    # '' (no match) must be dropped BEFORE the int cast: ANSI mode
    # turns cast('' as int) into a runtime error, not a null
    digit = F.when(dstr != "", dstr).cast("int")
    per = (
        orders.select(digit.alias("d"))
        .filter(F.col("d").isNotNull())
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    total = per.agg(F.sum("obs").alias("n"))
    p_arr = F.array(*[F.lit(p) for p in BENFORD_P_INT])
    j = per.crossJoin(F.broadcast(total))
    expected = (
        F.element_at(p_arr, F.col("d")).cast("double")
        * F.col("n").cast("double")
        / F.lit(float(BENFORD_SCALE))
    )
    diff = F.col("obs").cast("double") - expected
    t_int = F.floor(
        diff * diff / expected * F.lit(float(BENFORD_SCALE)) + F.lit(0.5)
    ).cast("long")
    cells = j.select(
        "d",
        "obs",
        "n",
        F.round(F.col("obs") / F.col("n"), 6).alias("obs_share"),
        (F.element_at(p_arr, F.col("d")) / F.lit(float(BENFORD_SCALE))).alias(
            "benford_share"
        ),
        t_int.alias("t_int"),
    )
    chi2 = cells.agg(F.sum("t_int").alias("chi2_int"))
    return (
        cells.crossJoin(F.broadcast(chi2))
        .select(
            "d",
            "obs",
            "obs_share",
            "benford_share",
            (F.col("chi2_int") / F.lit(float(BENFORD_SCALE))).alias("chi2"),
            (F.col("chi2_int") > F.lit(BENFORD_CHI2_CRIT_INT)).alias(
                "deviates"
            ),
        )
        .orderBy("d")
    )


def _benford_p_sql() -> str:
    return "[" + ", ".join(str(p) for p in BENFORD_P_INT) + "]"


BENFORD_SQL = f"""
WITH per AS (
  SELECT CAST(regexp_extract(CAST(abs(o_totalprice) AS VARCHAR), '^([1-9])', 1) AS INTEGER) AS d,
         COUNT(*) AS obs
  FROM orders
  WHERE regexp_extract(CAST(abs(o_totalprice) AS VARCHAR), '^([1-9])', 1) <> ''
  GROUP BY 1
), total AS (
  SELECT CAST(SUM(obs) AS BIGINT) AS n FROM per
), cells AS (
  SELECT d, obs, n,
         ROUND(obs / n, 6) AS obs_share,
         {_benford_p_sql()}[d] / {BENFORD_SCALE}.0 AS benford_share,
         CAST(floor(
           (CAST(obs AS DOUBLE) - {_benford_p_sql()}[d] * CAST(n AS DOUBLE) / {BENFORD_SCALE})
           * (CAST(obs AS DOUBLE) - {_benford_p_sql()}[d] * CAST(n AS DOUBLE) / {BENFORD_SCALE})
           / ({_benford_p_sql()}[d] * CAST(n AS DOUBLE) / {BENFORD_SCALE})
           * {BENFORD_SCALE} + 0.5) AS BIGINT) AS t_int
  FROM per, total
), chi AS (
  SELECT CAST(SUM(t_int) AS BIGINT) AS chi2_int FROM cells
)
SELECT d, obs, obs_share, benford_share,
       chi2_int / {BENFORD_SCALE}.0 AS chi2,
       chi2_int > {BENFORD_CHI2_CRIT_INT} AS deviates
FROM cells, chi
ORDER BY d
"""


# ------------------------------------------ Herfindahl concentration
HHI_SCALE = 10**8   # shares quantized at 1e-4 -> share^2 terms at 1e-8


def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index over two supply
    dimensions — documents per corpus source and lineitem volume per
    supplier: HHI = Σ share² (0 → atomized, 1 → single supplier),
    with the antitrust bands (<0.15 unconcentrated, 0.15-0.25
    moderate, >0.25 concentrated) as the verdict column. The
    single-number complement to `gini_concentration` (inequality of
    contribution) and `key_skew_profile` (hot-key planning): is the
    corpus/supply chain dangerously dependent on one feed?

    One count aggregation per dimension (map-side combinable), a
    1-row total broadcast, and an integer-quantized Σ share² — each
    term floor((c·10⁴/N)² rounded)::long BEFORE the sum, so the
    index and its band are exact cross-engine.
    """

    def one(df: DataFrame, dim: str, key: str) -> DataFrame:
        per = df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        totals = per.agg(
            F.count(F.lit(1)).alias("n_entities"), F.sum("c").alias("n_rows")
        )
        term = F.floor(
            (F.col("c").cast("double") / F.col("n_rows").cast("double"))
            * (F.col("c").cast("double") / F.col("n_rows").cast("double"))
            * F.lit(float(HHI_SCALE))
            + F.lit(0.5)
        ).cast("long")
        agg = (
            per.crossJoin(F.broadcast(totals))
            .select("n_entities", "n_rows", term.alias("t"))
            .groupBy("n_entities", "n_rows")
            .agg(F.sum("t").alias("hhi_int"))
        )
        hhi = F.col("hhi_int") / F.lit(float(HHI_SCALE))
        band = (
            F.when(F.col("hhi_int") < 15 * 10**6, F.lit("unconcentrated"))
            .when(F.col("hhi_int") <= 25 * 10**6, F.lit("moderate"))
            .otherwise(F.lit("concentrated"))
        )
        return agg.select(
            F.lit(dim).alias("dim"),
            "n_entities",
            "n_rows",
            F.round(hhi, 6).alias("hhi"),
            band.alias("band"),
        )

    docs = load_table(spark, sf_dir, "documents")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        one(docs, "documents_by_source", "source")
        .unionByName(one(li, "lineitem_by_supplier", "l_suppkey"))
        .orderBy("dim")
    )


def _hhi_one_sql(dim: str, table: str, key: str) -> str:
    return f"""
SELECT '{dim}' AS dim, n_entities, n_rows,
       ROUND(hhi_int / {HHI_SCALE}.0, 6) AS hhi,
       CASE WHEN hhi_int < {15 * 10**6} THEN 'unconcentrated'
            WHEN hhi_int <= {25 * 10**6} THEN 'moderate'
            ELSE 'concentrated' END AS band
FROM (
  SELECT n_entities, n_rows,
         CAST(SUM(CAST(floor(
           (CAST(c AS DOUBLE) / CAST(n_rows AS DOUBLE))
           * (CAST(c AS DOUBLE) / CAST(n_rows AS DOUBLE))
           * {HHI_SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS hhi_int
  FROM (SELECT {key} AS k, COUNT(*) AS c FROM {table} GROUP BY {key}),
       (SELECT COUNT(*) AS n_entities, CAST(SUM(c2) AS BIGINT) AS n_rows
        FROM (SELECT COUNT(*) AS c2 FROM {table} GROUP BY {key}))
  GROUP BY n_entities, n_rows
)
"""


HHI_SQL = (
    _hhi_one_sql("documents_by_source", "documents", "source")
    + "UNION ALL"
    + _hhi_one_sql("lineitem_by_supplier", "lineitem", "l_suppkey")
    + "ORDER BY dim"
)

# ------------------------------------------------ Cohen's kappa
KAPPA_CHARS_LT = 300   # rater A: short-doc flag (corpus median ~306)
KAPPA_WORDS_LT = 55    # rater B: low-word-count flag (median ~56)


def cohens_kappa_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ agreement between two independent document-quality
    heuristics — the char-length flag (n_chars < {KAPPA_CHARS_LT})
    and the word-count flag (< {KAPPA_WORDS_LT} tokens): κ corrects
    raw agreement for chance, the standard check that two labeling
    rules (or annotators) measure the same thing before one is
    trusted as the other's cheap proxy.

    One scan computing both flags (integer compares, codegen-side),
    one 2×2 contingency aggregation; p_o, p_e and κ are single IEEE
    expressions over four exact counts. Output is one row — nothing
    above the rollup.
    """
    from cgtcalc_data_transformer_spark.operators.dedup import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    a = (F.col("n_chars") < KAPPA_CHARS_LT).cast("long")
    b = (F.size(tokens_col(F.col("text"))) < KAPPA_WORDS_LT).cast("long")
    cells = docs.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / n
    pe = (
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n11") + F.col("n01")).cast("double")
        + (F.col("n01") + F.col("n00")).cast("double")
        * (F.col("n10") + F.col("n00")).cast("double")
    ) / (n * n)
    return cells.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


COHENS_KAPPA_SQL = f"""
WITH flags AS (
  SELECT CASE WHEN n_chars < {KAPPA_CHARS_LT} THEN 1 ELSE 0 END AS a,
         CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) < {KAPPA_WORDS_LT}
              THEN 1 ELSE 0 END AS b
  FROM documents
), cells AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(a * b) AS BIGINT) AS n11,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
         CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM flags
)
SELECT n, n11, n10, n01, n00,
       ROUND(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_observed,
       ROUND((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
              + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS p_expected,
       ROUND((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                 + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             / (1.0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                       + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS kappa
FROM cells
"""


# --------------------------------------------- lognormal length fit
LOGN_S = 10**6   # per-row ln(n_chars) quantization


def lognormal_fit_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal fit of document length per source: μ̂ and σ̂ of
    ln(n_chars), the geometric mean exp(μ̂), and the arithmetic mean
    for contrast — doc lengths are classically lognormal-ish, and a
    geometric mean far below the arithmetic mean is the one-line
    heavy-tail diagnostic (mad_outliers' parametric sibling).

    Per-row ln terms are quantized floor(ln·10⁶ + 0.5)::BIGINT before
    the sums; Σq² terms are ~(8.5·10⁶)² ≈ 7·10¹³ each, so the sum
    crosses 2^63 barely past 10⁵ docs per source — both factors are
    cast to DECIMAL(19,0) before the multiply and summed in
    DECIMAL(38,0) (VERDICT r8 item 3 sweep); μ̂, σ̂ and exp(μ̂) are
    single IEEE expressions over the two exact sums.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    q = F.floor(
        F.log(F.col("n_chars").cast("double")) * F.lit(float(LOGN_S))
        + F.lit(0.5)
    ).cast("long")
    s = docs.select("source", q.alias("q"), "n_chars").groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q").cast("decimal(19,0)") * F.col("q").cast("decimal(19,0)")).alias("sqq"),
        F.sum("n_chars").alias("sc"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("sq").cast("double") / (nd * F.lit(float(LOGN_S)))
    var = F.col("sqq").cast("double") / (
        nd * F.lit(float(LOGN_S) ** 2)
    ) - mu * mu
    return s.select(
        "source",
        "n",
        F.round(mu, 6).alias("mu_log"),
        F.round(F.sqrt(var), 6).alias("sigma_log"),
        F.round(F.exp(mu), 6).alias("geom_mean"),
        F.round(F.col("sc") / F.col("n"), 6).alias("arith_mean"),
    ).orderBy("source")


LOGNORMAL_FIT_SQL = f"""
WITH q AS (
  SELECT source, n_chars,
         CAST(floor(ln(CAST(n_chars AS DOUBLE)) * {LOGN_S} + 0.5) AS BIGINT) AS q
  FROM documents WHERE n_chars > 0
), s AS (
  SELECT source, COUNT(*) AS n,
         CAST(SUM(q) AS BIGINT) AS sq,
         CAST(SUM(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sqq,
         CAST(SUM(n_chars) AS BIGINT) AS sc
  FROM q GROUP BY source
)
SELECT source, n,
       ROUND(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * {LOGN_S}), 6) AS mu_log,
       ROUND(sqrt(CAST(sqq AS DOUBLE) / (CAST(n AS DOUBLE) * {float(LOGN_S) ** 2!r})
                  - (CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * {LOGN_S}))
                    * (CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * {LOGN_S}))), 6) AS sigma_log,
       ROUND(exp(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * {LOGN_S})), 6) AS geom_mean,
       ROUND(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE), 6) AS arith_mean
FROM s
ORDER BY source
"""

# ------------------------------------------------- McNemar's test
MCNEMAR_CRIT = 3.841459  # chi²(1), 5%


def mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test on the two document-quality raters from
    cohens_kappa_flags: κ asks "do they agree", McNemar asks the
    OTHER audit question — "do they disagree SYMMETRICALLY", i.e. is
    one rule systematically stricter (n10 ≠ n01)? χ² = (n10−n01)²/
    (n10+n01), plus the Edwards continuity-corrected form.

    Same one-scan 2×2 aggregation as κ; both statistics are single
    IEEE expressions over two exact counts; the significance flag
    compares the identical unrounded double to a literal.
    """
    from cgtcalc_data_transformer_spark.operators.dedup import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    a = (F.col("n_chars") < KAPPA_CHARS_LT).cast("long")
    b = (F.size(tokens_col(F.col("text"))) < KAPPA_WORDS_LT).cast("long")
    cells = docs.select(a.alias("a"), b.alias("b")).agg(
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
    )
    d = (F.col("n10") - F.col("n01")).cast("double")
    tot = (F.col("n10") + F.col("n01")).cast("double")
    chi2 = d * d / tot
    chi2_c = (F.abs(d) - F.lit(1.0)) * (F.abs(d) - F.lit(1.0)) / tot
    return cells.select(
        "n10",
        "n01",
        F.round(chi2, 6).alias("chi2"),
        F.round(chi2_c, 6).alias("chi2_corrected"),
        (chi2 > F.lit(MCNEMAR_CRIT)).alias("asymmetric"),
    )


MCNEMAR_SQL = f"""
WITH flags AS (
  SELECT CASE WHEN n_chars < {KAPPA_CHARS_LT} THEN 1 ELSE 0 END AS a,
         CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) < {KAPPA_WORDS_LT}
              THEN 1 ELSE 0 END AS b
  FROM documents
), cells AS (
  SELECT CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
         CAST(SUM((1 - a) * b) AS BIGINT) AS n01
  FROM flags
)
SELECT n10, n01,
       ROUND(CAST(n10 - n01 AS DOUBLE) * CAST(n10 - n01 AS DOUBLE)
             / CAST(n10 + n01 AS DOUBLE), 6) AS chi2,
       ROUND((ABS(CAST(n10 - n01 AS DOUBLE)) - 1.0)
             * (ABS(CAST(n10 - n01 AS DOUBLE)) - 1.0)
             / CAST(n10 + n01 AS DOUBLE), 6) AS chi2_corrected,
       CAST(n10 - n01 AS DOUBLE) * CAST(n10 - n01 AS DOUBLE)
         / CAST(n10 + n01 AS DOUBLE) > {MCNEMAR_CRIT} AS asymmetric
FROM cells
"""


# -------------------------------------------- last-digit uniformity
LASTDIGIT_S = 10**6
LASTDIGIT_CRIT = 16.918978  # chi²(9), 5%


def last_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-digit (penny) uniformity test on o_totalprice — the
    forensic-accounting complement to benfords_law_audit: FIRST
    digits follow Benford, LAST digits of genuine transactional
    amounts should be uniform; spikes at 0/5 betray rounding or
    fabrication (Nigrini's digit tests). Per-digit counts, shares,
    and the χ²(9) uniformity verdict repeated per row.

    Pennies are exact (2-decimal money: floor(x·100 + 0.5) is the
    same integer on both engines); χ² terms (c − n/10)²/(n/10) are
    quantized ::BIGINT before the 10-term sum. One aggregation.
    """
    orders = load_table(spark, sf_dir, "orders")
    digit = F.pmod(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"),
        F.lit(10),
    )
    per = orders.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = per.agg(F.sum("c").alias("n"))
    j = per.crossJoin(F.broadcast(tot))
    e = F.col("n").cast("double") / F.lit(10.0)
    term = F.floor(
        (F.col("c").cast("double") - e)
        * (F.col("c").cast("double") - e)
        / e
        * F.lit(float(LASTDIGIT_S))
        + F.lit(0.5)
    ).cast("long")
    chi = j.agg(F.sum(term).alias("chiq"), F.max("n").alias("n"))
    chi2 = F.col("chiq").cast("double") / F.lit(float(LASTDIGIT_S))
    return (
        j.crossJoin(F.broadcast(chi.select("chiq")))
        .select(
            "digit",
            "c",
            F.round(F.col("c") / F.col("n"), 6).alias("share"),
            F.round(
                F.col("chiq").cast("double") / F.lit(float(LASTDIGIT_S)), 6
            ).alias("chi2"),
            (
                F.col("chiq").cast("double") / F.lit(float(LASTDIGIT_S))
                > F.lit(LASTDIGIT_CRIT)
            ).alias("deviates"),
        )
        .orderBy("digit")
    )


LAST_DIGIT_SQL = f"""
WITH per AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 10 AS digit,
         COUNT(*) AS c
  FROM orders GROUP BY 1
), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM per
), chi AS (
  SELECT CAST(SUM(CAST(floor((CAST(c AS DOUBLE) - CAST(n AS DOUBLE) / 10.0)
                             * (CAST(c AS DOUBLE) - CAST(n AS DOUBLE) / 10.0)
                             / (CAST(n AS DOUBLE) / 10.0)
                             * {LASTDIGIT_S} + 0.5) AS BIGINT)) AS BIGINT) AS chiq
  FROM per CROSS JOIN tot
)
SELECT digit, c,
       ROUND(c / n, 6) AS share,
       ROUND(CAST(chiq AS DOUBLE) / {LASTDIGIT_S}, 6) AS chi2,
       CAST(chiq AS DOUBLE) / {LASTDIGIT_S} > {LASTDIGIT_CRIT} AS deviates
FROM per CROSS JOIN tot CROSS JOIN chi
ORDER BY digit
"""

# ------------------------------------------- hash uniformity audit
HASH_AUDIT_BUCKETS = 100
HASH_AUDIT_S = 10**6
HASH_AUDIT_CRIT = 123.225221  # chi²(99), 5%


def hash_uniformity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² uniformity audit of the engine's md5 bucket function over
    doc_id — the standing validity check for EVERY deterministic
    split/sample in this repo (split_assign, kfold_assign,
    sample_stratified, the bootstrap weights all ride the same
    hash): if these buckets ever skew, every "deterministic 10%"
    downstream silently isn't.

    One scan + one {HASH_AUDIT_BUCKETS}-row aggregation; the count
    table is zero-filled onto the FULL bucket range first (an empty
    bucket is evidence of skew — its (0−e)²/e term must count, the
    seasonality-denominator lesson); χ² terms quantize before the
    bounded sum and the χ²(99) verdict is repeated per row.
    """
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy(
        hash_bucket(F.col("doc_id"), HASH_AUDIT_BUCKETS).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))
    spine = docs.sparkSession.range(HASH_AUDIT_BUCKETS).select(
        F.col("id").alias("bucket")
    )
    per = spine.join(counts, "bucket", "left").select(
        "bucket", F.coalesce("c", F.lit(0)).alias("c")
    )
    tot = per.agg(F.sum("c").alias("n"))
    j = per.crossJoin(F.broadcast(tot))
    e = F.col("n").cast("double") / F.lit(float(HASH_AUDIT_BUCKETS))
    term = F.floor(
        (F.col("c").cast("double") - e)
        * (F.col("c").cast("double") - e)
        / e
        * F.lit(float(HASH_AUDIT_S))
        + F.lit(0.5)
    ).cast("long")
    chi = j.agg(F.sum(term).alias("chiq"))
    chi2 = F.col("chiq").cast("double") / F.lit(float(HASH_AUDIT_S))
    return (
        j.crossJoin(F.broadcast(chi))
        .select(
            "bucket",
            "c",
            F.round(F.col("c") / F.col("n"), 6).alias("share"),
            F.round(chi2, 6).alias("chi2"),
            (chi2 > F.lit(HASH_AUDIT_CRIT)).alias("skewed"),
        )
        .orderBy("bucket")
    )


HASH_UNIFORMITY_SQL = f"""
WITH counts AS (
  SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT
         % {HASH_AUDIT_BUCKETS} AS bucket,
         COUNT(*) AS c
  FROM documents GROUP BY 1
), per AS (
  SELECT spine.bucket, CAST(COALESCE(counts.c, 0) AS BIGINT) AS c
  FROM (SELECT UNNEST(generate_series(0, {HASH_AUDIT_BUCKETS - 1})) AS bucket) spine
  LEFT JOIN counts ON spine.bucket = counts.bucket
), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM per
), chi AS (
  SELECT CAST(SUM(CAST(floor((CAST(c AS DOUBLE) - CAST(n AS DOUBLE) / {HASH_AUDIT_BUCKETS})
                             * (CAST(c AS DOUBLE) - CAST(n AS DOUBLE) / {HASH_AUDIT_BUCKETS})
                             / (CAST(n AS DOUBLE) / {HASH_AUDIT_BUCKETS})
                             * {HASH_AUDIT_S} + 0.5) AS BIGINT)) AS BIGINT) AS chiq
  FROM per CROSS JOIN tot
)
SELECT bucket, c,
       ROUND(c / n, 6) AS share,
       ROUND(CAST(chiq AS DOUBLE) / {HASH_AUDIT_S}, 6) AS chi2,
       CAST(chiq AS DOUBLE) / {HASH_AUDIT_S} > {HASH_AUDIT_CRIT} AS skewed
FROM per CROSS JOIN tot CROSS JOIN chi
ORDER BY bucket
"""
