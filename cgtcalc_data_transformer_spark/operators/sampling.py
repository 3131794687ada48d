"""Deterministic sampling + data profiling.

Training-data pipelines sample constantly; ``df.sample``/``sampleBy``
use partition-seeded RNG, so results change with the physical split
layout — useless for reproducible curation at 100 TB. The scale-
correct pattern is HASH sampling: a row is in the sample iff
``hash(key) mod N < k``, which is stable across reruns, engines,
repartitioning, and incremental appends (a row's fate never changes).
md5 is the portable hash here (same bytes in Spark and DuckDB).

Profiling: the per-column summary every ingestion step should emit
(nulls / distinct / min / max) as ONE aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

SAMPLE_PCT = 10  # keep 10 of every 100 hash buckets


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from md5(key) — engine-portable."""
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(buckets),
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of orders, stratified check grouped
    by priority: per stratum, sampled count and kept-fraction.

    The sample predicate is a pure column expression → pushes into the
    scan's codegen; no RNG, no driver state, append-stable.
    """
    orders = load_table(spark, sf_dir, "orders")
    in_sample = hash_bucket(F.col("o_orderkey")) < SAMPLE_PCT
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(in_sample.cast("long")).alias("sampled"),
            F.round(
                F.sum(in_sample.cast("long")) / F.count(F.lit(1)), 6
            ).alias("kept_fraction"),
        )
        .orderBy("o_orderpriority")
    )


SAMPLE_STRATIFIED_SQL = f"""
WITH flagged AS (
  SELECT o_orderpriority,
         CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100 < {SAMPLE_PCT}
              THEN 1 ELSE 0 END AS in_sample
  FROM orders
)
SELECT o_orderpriority, COUNT(*) AS total,
       CAST(SUM(in_sample) AS BIGINT) AS sampled,
       CAST(ROUND(SUM(in_sample) / COUNT(*), 6) AS DOUBLE) AS kept_fraction
FROM flagged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of orders: nulls, distinct, min, max
    per profiled column, unpivoted to one row per column.

    One aggregation (all stats partial-aggregated map-side), then a
    zero-shuffle unpivot — the shape a 100 TB profiling job needs
    (never one job per column).
    """
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"]

    def _fmt(c: str, agg) -> Column:
        # min/max over the NATIVE type (lexicographic string min of a
        # number is wrong), then an engine-portable string form:
        # doubles via DECIMAL(18,2) (Spark prints 1e7+ in scientific
        # notation, DuckDB doesn't — decimal prints plainly in both).
        v = agg(F.col(c))
        if c == "o_totalprice":
            return v.cast("decimal(18,2)").cast("string")
        return v.cast("string")

    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            _fmt(c, F.min).alias(f"{c}__min"),
            _fmt(c, F.max).alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"{c}__nulls").alias("nulls"),
                        F.col(f"{c}__distinct").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_str"),
                        F.col(f"{c}__max").alias("max_str"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*").orderBy("column")


PROFILE_SQL = """
WITH wide AS (
  SELECT
    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls,
    COUNT(DISTINCT o_orderstatus) AS s_distinct,
    MIN(o_orderstatus) AS s_min, MAX(o_orderstatus) AS s_max,
    CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
    COUNT(DISTINCT o_orderpriority) AS p_distinct,
    MIN(o_orderpriority) AS p_min, MAX(o_orderpriority) AS p_max,
    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nulls,
    COUNT(DISTINCT o_custkey) AS c_distinct,
    MIN(o_custkey)::VARCHAR AS c_min, MAX(o_custkey)::VARCHAR AS c_max,
    CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_nulls,
    COUNT(DISTINCT o_totalprice) AS t_distinct,
    MIN(o_totalprice)::DECIMAL(18,2)::VARCHAR AS t_min,
    MAX(o_totalprice)::DECIMAL(18,2)::VARCHAR AS t_max
  FROM orders
)
SELECT 'o_custkey' AS "column", c_nulls AS nulls, c_distinct AS n_distinct,
       c_min AS min_str, c_max AS max_str FROM wide
UNION ALL
SELECT 'o_orderpriority', p_nulls, p_distinct, p_min, p_max FROM wide
UNION ALL
SELECT 'o_orderstatus', s_nulls, s_distinct, s_min, s_max FROM wide
UNION ALL
SELECT 'o_totalprice', t_nulls, t_distinct, t_min, t_max FROM wide
ORDER BY "column"
"""


# ------------------------------------------- per-group fixed-size sample
GROUP_SAMPLE_K = 5


def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample: the K documents per source
    with the smallest md5(doc_id) — a hash-ordered top-k window, so
    membership is rerun/engine/partitioning-stable (a per-group
    'reservoir' without RNG state). One shuffle on the group key;
    the window never sees more than a group's rows.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GROUP_SAMPLE_K)
        .select("source", "doc_id", "rk")
        .orderBy("source", "rk")
    )


SAMPLE_PER_GROUP_SQL = f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(doc_id::VARCHAR) ASC, doc_id ASC) AS rk
  FROM documents
)
SELECT source, doc_id, rk FROM ranked
WHERE rk <= {GROUP_SAMPLE_K}
ORDER BY source, rk
"""


# ------------------------------------------------- equi-width histogram
HIST_BINS = 20


def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of o_totalprice in HIST_BINS bins over the
    observed [min, max]: two passes (one tiny min/max agg joined as a
    1-row broadcast literal, then one bucketing agg). Bin edges are
    computed identically in both engines; the max value is clamped
    into the last bin.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    with_b = orders.crossJoin(F.broadcast(bounds))
    bin_ix = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("lo"))
            / ((F.col("hi") - F.col("lo")) / HIST_BINS)
        ).cast("long"),
        F.lit(HIST_BINS - 1).cast("long"),
    )
    return (
        with_b.groupBy(bin_ix.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin")
    )


HISTOGRAM_SQL = f"""
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
)
SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / {HIST_BINS})) AS BIGINT),
             {HIST_BINS - 1}) AS bin,
       COUNT(*) AS n
FROM orders, bounds
GROUP BY 1
ORDER BY bin
"""


# ------------------------------------------------ equi-depth histogram
EQUIDEPTH_BINS = 10


def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram of o_totalprice: exact interior
    quantile boundaries from ONE ``percentile(..., array(...))``
    aggregation, broadcast as a 1-row literal, then one bucketing
    aggregation — the same two-scan shape as the equi-width variant,
    with NO global sort/ntile (an ntile formulation funnels the whole
    table through one window partition; this never shuffles the fact
    table at all). At 100 TB swap ``percentile`` for
    ``approx_percentile`` and the plan is unchanged.

    Bin index = number of interior boundaries strictly below the
    value, an O(bins) array fold inside codegen.
    """
    orders = load_table(spark, sf_dir, "orders")
    probs = ", ".join(
        str(i / EQUIDEPTH_BINS) for i in range(1, EQUIDEPTH_BINS)
    )
    bounds = orders.agg(
        F.expr(f"percentile(o_totalprice, array({probs}))").alias("qs")
    )
    bin_ix = F.expr(
        "aggregate(qs, 0, (acc, q) -> acc + IF(o_totalprice > q, 1, 0))"
    )
    return (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy(bin_ix.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bin")
    )


HISTOGRAM_EQUIDEPTH_SQL = f"""
WITH bounds AS (
  SELECT quantile_cont(o_totalprice,
           [{", ".join(str(i / EQUIDEPTH_BINS) for i in range(1, EQUIDEPTH_BINS))}]) AS qs
  FROM orders
)
SELECT len(list_filter(qs, q -> o_totalprice > q)) AS bin,
       COUNT(*) AS n,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi
FROM orders, bounds
GROUP BY 1
ORDER BY bin
"""


# -------------------------------------------- weighted Bernoulli sample
WEIGHTED_TARGET_N = 150  # expected sample size


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli sample of orders (expected size
    WEIGHTED_TARGET_N, inclusion probability ∝ floor(o_totalprice)):
    keep a row iff its 32-bit md5 draw falls below n·w·2^32/W.

    Scale shape: the total weight W is ONE integer aggregation
    broadcast as a scalar; selection is then a pure filter on the
    scan — no global prefix sum, no sort, append-stable (a row's
    draw never depends on other rows). The exact-size alternative
    (systematic sampling over a weight cumsum) needs a distributed
    prefix-sum pass; for curation pipelines the expected-size hash
    variant is the standard because it composes with incremental
    ingest. Weights are integer dollars so W is exact; the threshold
    compare is one identically-computed double per row on both
    engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = F.greatest(F.lit(1).cast("long"), F.floor("o_totalprice").cast("long"))
    draw = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    total = orders.agg(F.sum(w).alias("w_total"))
    return (
        orders.crossJoin(F.broadcast(total))
        .filter(
            draw.cast("double")
            < F.lit(float(WEIGHTED_TARGET_N))
            * w.cast("double")
            * F.lit(4294967296.0)
            / F.col("w_total").cast("double")
        )
        .select("o_orderkey", w.alias("weight"))
        .orderBy("o_orderkey")
    )


SAMPLE_WEIGHTED_SQL = f"""
WITH weighted AS (
  SELECT o_orderkey,
         GREATEST(1, CAST(FLOOR(o_totalprice) AS BIGINT)) AS weight,
         ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT::BIGINT AS draw
  FROM orders
), total AS (
  SELECT SUM(weight)::BIGINT AS w_total FROM weighted
)
SELECT o_orderkey, weight
FROM weighted, total
WHERE CAST(draw AS DOUBLE)
      < {WEIGHTED_TARGET_N}.0 * CAST(weight AS DOUBLE) * 4294967296.0
        / CAST(w_total AS DOUBLE)
ORDER BY o_orderkey
"""


# ------------------------------------- exact median without a global sort
MEDIAN_BINS = 65536  # histogram resolution of pass 1


def exact_median_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median (lower order statistic, rank
    ``(n+1) div 2`` under the total order (o_totalprice, o_orderkey))
    of orders — computed WITHOUT a global sort via the classic
    distributed-selection recipe:

    pass 1: per (group, equi-width bin) counts — one map-side-combined
    aggregation over MEDIAN_BINS bins between the broadcast global
    (min, max); a prefix-sum window over the BOUNDED bin table
    (#groups x occupied bins) locates the bin containing the target
    rank and the number of rows strictly before it.

    pass 2: only rows landing in their group's target bin are ranked
    (window partitioned by group over ~n/MEDIAN_BINS rows — at 1e10
    rows/group that is ~150k rows, executor-memory bounded; one more
    refinement level generalizes log_B(n)-deep, which is the standard
    production form) and the row at rank ``k - rows_before_bin`` is
    the exact median element.

    Engine-exactness: the emitted median is a raw stored DOUBLE (no
    arithmetic), counts are integers. The oracle is the INDEPENDENT
    direct formulation — ROW_NUMBER selection at the same rank under
    the same total order — so the hash match cross-checks the entire
    two-pass selection machinery.

    Ties are bin-consistent: equal values share one bin (floor of the
    same double expression), so global (value, key) rank equals
    rows-before-bin + in-bin rank.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(MEDIAN_BINS))
    bin_col = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(MEDIAN_BINS - 1).cast("long"),
            F.floor((F.col("o_totalprice") - F.col("lo")) / width),
        )
    )
    binned = orders.crossJoin(F.broadcast(bounds)).withColumn("bin", bin_col)
    from pyspark.sql import Window

    per_bin = binned.groupBy("o_orderpriority", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_grp = Window.partitionBy("o_orderpriority")
    located = (
        per_bin.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(w_grp))
        .withColumn("k", F.expr("(n + 1) div 2"))
        .filter((F.col("cum") - F.col("cnt") < F.col("k")) & (F.col("cum") >= F.col("k")))
        .select(
            # renamed: `located` shares lineage with `binned`, and a
            # same-name equality condition is ambiguous to Catalyst
            F.col("o_orderpriority").alias("grp"),
            F.col("bin").alias("target_bin"),
            (F.col("cum") - F.col("cnt")).alias("before"),
            "k",
            "n",
        )
    )
    in_bin = binned.join(
        F.broadcast(located),
        (F.col("o_orderpriority") == F.col("grp"))
        & (F.col("bin") == F.col("target_bin")),
    ).select(
        "o_orderpriority",
        "o_totalprice",
        "o_orderkey",
        "before",
        "k",
        "n",
    )
    w_rank = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        in_bin.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == F.col("k") - F.col("before"))
        .select("o_orderpriority", "n", F.col("o_totalprice").alias("median_price"))
        .orderBy("o_orderpriority")
    )


# Independent direct formulation: global rank selection.
EXACT_MEDIAN_SQL = """
WITH r AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority, n, o_totalprice AS median_price
FROM r
WHERE rn = (n + 1) // 2
ORDER BY o_orderpriority
"""


# ------------------------------------- two-sample KS drift detection
KS_BINS = 256  # value-domain resolution of the binned statistic
KS_CRIT_COEF = 1.358  # alpha = 0.05 two-sample coefficient


def drift_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov drift check between the
    o_totalprice distributions of open ('O') vs finished ('F') orders
    — the training-data drift monitor (is this week's corpus shaped
    like last week's?) in one summary row: segment sizes, the binned
    KS statistic D, the alpha=0.05 critical value, and the drift flag.

    Exact-D needs a global sort; the BINNED statistic (sup over
    KS_BINS equi-width bin boundaries) needs only one count
    aggregation over the bounded bin table and a prefix sum — D_binned
    <= D_exact with error bounded by the max per-bin mass, the
    standard monitoring tradeoff. The prefix sum over the bounded bin
    table is a theta SELF-JOIN (b.bin <= a.bin), NOT a window — the
    repo's convention for value-domain-bounded prefix scans (see
    pareto_frontier), keeping the plan free of unpartitioned windows;
    the BNLJ is 256x256 at worst.

    Engine-exactness: counts are integers; each |cdf1-cdf2| is a
    difference of two correctly-rounded int/int divisions quantized
    floor(x·1e9+0.5) BEFORE the max, so sup selection is integer;
    the critical value is one sqrt of an exact ratio — correctly
    rounded, identical in DuckDB — quantized the same way.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("O", "F")
    )
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(KS_BINS))
    bin_col = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(KS_BINS - 1).cast("long"),
            F.floor((F.col("o_totalprice") - F.col("lo")) / width),
        )
    )
    per_bin = (
        orders.crossJoin(F.broadcast(bounds))
        .select(bin_col.alias("bin"), "o_orderstatus")
        .groupBy("bin")
        .agg(
            F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("c1"),
            F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("c2"),
        )
    )
    cum = (
        per_bin.alias("a")
        .join(F.broadcast(per_bin.alias("b")), F.col("b.bin") <= F.col("a.bin"))
        .groupBy(F.col("a.bin").alias("bin"))
        .agg(
            F.sum(F.col("b.c1")).alias("cum1"),
            F.sum(F.col("b.c2")).alias("cum2"),
        )
    )
    totals = per_bin.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    diffs = cum.crossJoin(F.broadcast(totals)).select(
        "n1",
        "n2",
        F.floor(
            F.abs(
                F.col("cum1") / F.col("n1") - F.col("cum2") / F.col("n2")
            )
            * 1e9
            + 0.5
        )
        .cast("long")
        .alias("d_int"),
    )
    crit_int = F.floor(
        F.lit(KS_CRIT_COEF)
        * F.sqrt(
            (F.col("n1") + F.col("n2")).cast("double")
            / (F.col("n1").cast("double") * F.col("n2").cast("double"))
        )
        * 1e9
        + 0.5
    ).cast("long")
    return (
        diffs.groupBy("n1", "n2")
        .agg(F.max("d_int").alias("ks_int"))
        .select(
            "n1",
            "n2",
            (F.col("ks_int") / F.lit(1e9)).alias("ks_d"),
            (crit_int / F.lit(1e9)).alias("d_crit"),
            (F.col("ks_int") > crit_int).alias("drifted"),
        )
    )


DRIFT_KS_SQL = f"""
WITH seg AS (
  SELECT o_totalprice, o_orderstatus
  FROM orders WHERE o_orderstatus IN ('O', 'F')
), bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM seg
), binned AS (
  SELECT CASE WHEN hi = lo THEN 0
              ELSE LEAST({KS_BINS - 1},
                         CAST(FLOOR((o_totalprice - lo)
                                    / ((hi - lo) / {KS_BINS}.0)) AS BIGINT))
         END AS bin,
         o_orderstatus
  FROM seg CROSS JOIN bounds
), per_bin AS (
  SELECT bin,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM binned GROUP BY bin
), cum AS (
  SELECT a.bin,
         CAST(SUM(b.c1) AS BIGINT) AS cum1,
         CAST(SUM(b.c2) AS BIGINT) AS cum2
  FROM per_bin a JOIN per_bin b ON b.bin <= a.bin
  GROUP BY a.bin
), totals AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM per_bin
), diffs AS (
  SELECT n1, n2,
         CAST(FLOOR(ABS(cum1 / n1 - cum2 / n2) * 1e9 + 0.5) AS BIGINT) AS d_int
  FROM cum CROSS JOIN totals
)
SELECT n1, n2,
       MAX(d_int) / 1e9 AS ks_d,
       CAST(FLOOR({KS_CRIT_COEF} * sqrt(CAST(n1 + n2 AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) * 1e9 + 0.5)
            AS BIGINT) / 1e9 AS d_crit,
       MAX(d_int) > CAST(FLOOR({KS_CRIT_COEF} * sqrt(CAST(n1 + n2 AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) * 1e9 + 0.5)
            AS BIGINT) AS drifted
FROM diffs
GROUP BY n1, n2
"""


# ------------------------------- fixed-size weighted sample (WOR)
WOR_K = 100  # sample size
_WOR_U_BUCKETS = 4294967296.0  # 2^32 — md5-derived uniform resolution


def weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement via the
    Efraimidis-Spirakis exponential-keys method (IPL 2006): each row
    draws key u^(1/w) for uniform u and the global top-K keys form
    the sample — the fixed-budget companion to the Bernoulli
    ``sample_weighted`` above (that one's size is only ~TARGET in
    expectation; a training-data budget is usually exact).

    Determinism + engine-portability: u derives from md5(o_orderkey)
    (same bytes in both engines) as (bucket+0.5)/2^32; the ordering
    key uses the monotone-equivalent form ln(u)/w, QUANTIZED to
    floor(x·1e8+0.5) because ln is a libm call (not IEEE-guaranteed
    across engines — the repo's standard derived-double recipe, same
    as collocations_pmi), with o_orderkey as the total-order
    tiebreak. The quantized key is part of the operator's spec, so
    both engines select the identical sample.

    Plan: one row-local codegen projection (hash, ln, divide) and a
    global top-K = TakeOrderedAndProject — no shuffle of the
    population, no RNG state, append-stable except at the key-K
    boundary (the WOR tradeoff).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = F.greatest(F.lit(1), F.floor(F.col("o_totalprice")).cast("long"))
    bucket = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (bucket.cast("double") + F.lit(0.5)) / F.lit(_WOR_U_BUCKETS)
    key_int = F.floor(F.log(u) / w.cast("double") * 1e8 + 0.5).cast("long")
    return (
        orders.select(
            "o_orderkey",
            w.alias("weight"),
            key_int.alias("key_int"),
        )
        .orderBy(F.desc("key_int"), F.asc("o_orderkey"))
        .limit(WOR_K)
    )


WEIGHTED_WOR_SQL = f"""
WITH keyed AS (
  SELECT o_orderkey,
         GREATEST(1, CAST(FLOOR(o_totalprice) AS BIGINT)) AS weight,
         CAST(FLOOR(
           ln((('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT::BIGINT
               + 0.5) / {_WOR_U_BUCKETS})
           / CAST(GREATEST(1, CAST(FLOOR(o_totalprice) AS BIGINT)) AS DOUBLE)
           * 1e8 + 0.5) AS BIGINT) AS key_int
  FROM orders
)
SELECT o_orderkey, weight, key_int
FROM keyed
ORDER BY key_int DESC, o_orderkey ASC
LIMIT {WOR_K}
"""


# --------------------- per-group fixed-k weighted sample (WOR)
GROUP_WOR_K = 5   # docs kept per source


def weighted_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k-PER-GROUP weighted sampling without replacement — the
    everyday "k example docs per source" curation primitive (VERDICT
    r10 item 4): Efraimidis-Spirakis exponential keys exactly as
    ``weighted_sample_wor`` above (each row's key is a deterministic
    md5-uniform raised to 1/weight, monotone form ln(u)/w quantized
    to 1e-8), but ranked WITHIN each source instead of globally, so
    every source contributes exactly min(k, |source|) docs no matter
    how skewed the corpus mix is — the global top-K would let one
    giant source crowd out the tail.

    Plan: one row-local codegen projection (hash, ln, divide), then
    a per-group top-k window — Spark rewrites rank-filter windows
    into WindowGroupLimit (partial per-partition top-k BEFORE the
    shuffle, kmv_distinct's shape), so the exchange moves at most
    k rows per (source, partition), not the corpus. Weight =
    n_chars: longer docs are proportionally more likely, the
    length-balanced panel a curation reviewer actually wants.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = F.greatest(F.lit(1), F.col("n_chars")).cast("long")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (bucket.cast("double") + F.lit(0.5)) / F.lit(_WOR_U_BUCKETS)
    key_int = F.floor(F.log(u) / w.cast("double") * 1e8 + 0.5).cast("long")
    keyed = docs.select(
        "source",
        "doc_id",
        w.alias("weight"),
        key_int.alias("key_int"),
    )
    win = Window.partitionBy("source").orderBy(
        F.desc("key_int"), F.asc("doc_id")
    )
    return (
        keyed.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= GROUP_WOR_K)
        .orderBy("source", "rn")
    )


WEIGHTED_GROUP_WOR_SQL = f"""
WITH keyed AS (
  SELECT source, doc_id,
         GREATEST(1, n_chars) AS weight,
         CAST(FLOOR(
           ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT
               + 0.5) / {_WOR_U_BUCKETS})
           / CAST(GREATEST(1, n_chars) AS DOUBLE)
           * 1e8 + 0.5) AS BIGINT) AS key_int
  FROM documents
), ranked AS (
  SELECT source, doc_id, weight, key_int,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY key_int DESC, doc_id ASC) AS INT) AS rn
  FROM keyed
)
SELECT source, doc_id, weight, key_int, rn
FROM ranked
WHERE rn <= {GROUP_WOR_K}
ORDER BY source, rn
"""


# -------------------------- PSI / Jensen-Shannon binned drift twins
PSI_BINS = 64          # value-domain resolution of the binned divergences
PSI_SCALE = 10**6      # per-bin term quantization (see below)
PSI_ALERT_INT = int(0.2 * PSI_SCALE)   # the standard PSI "major shift" bar
JS_ALERT_INT = int(0.05 * PSI_SCALE)   # JS (nats) alert bar


def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-Stability-Index + Jensen-Shannon drift between the
    o_totalprice distributions of open ('O') vs finished ('F') orders
    — the divergence-valued twins of ``drift_ks_binned``'s sup-norm
    statistic, over the same equi-width binning. PSI is the industry
    monitoring standard (sum over bins of (p-q)·ln(p/q)); JS is the
    bounded symmetric KL mixture. Both use add-one (Laplace)
    smoothing p_i=(c_i+1)/(n+B) so empty bins are defined, and the
    full B-row bin table is generated (range ⨝ left-join) so absent
    bins still contribute their smoothed mass.

    Engine-exactness: p and q are correctly-rounded int/int
    divisions; each bin's term is quantized floor(x·PSI_SCALE + 0.5)
    BEFORE summation, so the reported divergence is an exact integer
    SUM (no float-aggregation-order hazard) and the drift flags are
    integer comparisons. Bounded state everywhere: a B=64-row bin
    table, 1-row bounds/totals scalars (audited in BNLJ_OK).
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("O", "F")
    )
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(PSI_BINS))
    bin_col = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(PSI_BINS - 1).cast("long"),
            F.floor((F.col("o_totalprice") - F.col("lo")) / width),
        )
    )
    per_bin = (
        orders.crossJoin(F.broadcast(bounds))
        .select(bin_col.alias("bin"), "o_orderstatus")
        .groupBy("bin")
        .agg(
            F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("c1"),
            F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("c2"),
        )
    )
    totals = per_bin.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    bins = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    full = (
        bins.join(per_bin, "bin", "left")
        .fillna(0, subset=["c1", "c2"])
        .crossJoin(F.broadcast(totals))
    )
    p = (F.col("c1") + 1) / (F.col("n1") + F.lit(PSI_BINS))
    q = (F.col("c2") + 1) / (F.col("n2") + F.lit(PSI_BINS))
    m = (p + q) / F.lit(2.0)

    def _q(x):
        return F.floor(x * F.lit(float(PSI_SCALE)) + F.lit(0.5)).cast("long")

    terms = full.select(
        "n1",
        "n2",
        _q((p - q) * F.log(p / q)).alias("psi_t"),
        _q(F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * q * F.log(q / m)).alias(
            "js_t"
        ),
    )
    return terms.groupBy("n1", "n2").agg(
        (F.sum("psi_t") / F.lit(float(PSI_SCALE))).alias("psi"),
        (F.sum("js_t") / F.lit(float(PSI_SCALE))).alias("js_div"),
        (F.sum("psi_t") > F.lit(PSI_ALERT_INT)).alias("psi_drifted"),
        (F.sum("js_t") > F.lit(JS_ALERT_INT)).alias("js_drifted"),
    )


DRIFT_PSI_SQL = f"""
WITH src AS (
  SELECT o_totalprice, o_orderstatus FROM orders WHERE o_orderstatus IN ('O','F')
), bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM src
), per_bin AS (
  SELECT CASE WHEN hi = lo THEN 0
              ELSE LEAST({PSI_BINS - 1},
                         CAST(floor((o_totalprice - lo) / ((hi - lo) / {PSI_BINS}.0)) AS BIGINT))
         END AS bin,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM src, bounds GROUP BY 1
), totals AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM per_bin
), full_bins AS (
  SELECT r.range AS bin, COALESCE(p.c1, 0) AS c1, COALESCE(p.c2, 0) AS c2, n1, n2
  FROM range({PSI_BINS}) r LEFT JOIN per_bin p ON p.bin = r.range, totals
), terms AS (
  SELECT n1, n2,
         CAST(floor(((c1 + 1) / (n1 + {PSI_BINS}.0) - (c2 + 1) / (n2 + {PSI_BINS}.0))
                    * ln(((c1 + 1) / (n1 + {PSI_BINS}.0)) / ((c2 + 1) / (n2 + {PSI_BINS}.0)))
                    * {PSI_SCALE} + 0.5) AS BIGINT) AS psi_t,
         CAST(floor((0.5 * ((c1 + 1) / (n1 + {PSI_BINS}.0))
                       * ln(((c1 + 1) / (n1 + {PSI_BINS}.0))
                            / ((((c1 + 1) / (n1 + {PSI_BINS}.0)) + ((c2 + 1) / (n2 + {PSI_BINS}.0))) / 2.0))
                     + 0.5 * ((c2 + 1) / (n2 + {PSI_BINS}.0))
                       * ln(((c2 + 1) / (n2 + {PSI_BINS}.0))
                            / ((((c1 + 1) / (n1 + {PSI_BINS}.0)) + ((c2 + 1) / (n2 + {PSI_BINS}.0))) / 2.0)))
                    * {PSI_SCALE} + 0.5) AS BIGINT) AS js_t
  FROM full_bins
)
SELECT n1, n2,
       CAST(SUM(psi_t) AS BIGINT) / {PSI_SCALE}.0 AS psi,
       CAST(SUM(js_t) AS BIGINT) / {PSI_SCALE}.0 AS js_div,
       CAST(SUM(psi_t) AS BIGINT) > {PSI_ALERT_INT} AS psi_drifted,
       CAST(SUM(js_t) AS BIGINT) > {JS_ALERT_INT} AS js_drifted
FROM terms GROUP BY n1, n2
"""


# ---------------------------------------------- Gini concentration
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Gini coefficient of document length (n_chars) per
    source — the inequality audit a curation pipeline runs on corpus
    composition: G ≈ 0 means uniform contribution, G → 1 means a few
    giant docs dominate the source's token budget (length-outlier /
    boilerplate risk that mean/p99 profiling understates).

    Exactness WITHOUT a global sort: Gini needs value ranks, but
    n_chars is an integer with a bounded value domain (a document
    length), so ranks come from the per-VALUE count table — for each
    distinct value v with count c and cum-below C, the tied-average-
    rank contribution is c·v·(2C + c + 1), an exact integer. The
    cum-below prefix sum uses the repo's value-domain-bounded theta
    self-join convention (b.v < a.v within source — see
    drift_ks_binned/pareto_frontier), NOT an unpartitioned window;
    the join is |distinct lengths|² per source, bounded by the length
    cap, not the corpus. Final G = (2R - (n+1)S) / (nS) is one
    integer-ratio division per source.
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
        .agg(F.coalesce(F.sum("b.c"), F.lit(0)).alias("cum_below"))
    )
    # 2R = sum over values of c*v*(2*cum_below + c + 1)  (exact BIGINT)
    per_src = cum.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("v")).alias("s"),
        F.sum(
            (F.col("c") * F.col("v")).cast("decimal(19,0)")
            * (F.lit(2) * F.col("cum_below") + F.col("c") + F.lit(1)).cast("decimal(19,0)")
        ).alias("two_r"),
    )
    g = (
        F.col("two_r").cast("double")
        - (F.col("n") + F.lit(1)).cast("double") * F.col("s").cast("double")
    ) / (F.col("n").cast("double") * F.col("s").cast("double"))
    return per_src.select(
        "source",
        "n",
        F.col("s").alias("total_chars"),
        F.round(g, 6).alias("gini"),
    ).orderBy("source")


GINI_SQL = """
WITH vals AS (
  SELECT source, n_chars AS v, COUNT(*) AS c
  FROM documents GROUP BY source, n_chars
), cum AS (
  SELECT a.source, a.v, a.c,
         CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS cum_below
  FROM vals a LEFT JOIN vals b
    ON a.source = b.source AND b.v < a.v
  GROUP BY a.source, a.v, a.c
), per_src AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * v) AS BIGINT) AS s,
         CAST(SUM(CAST(c * v AS DECIMAL(19,0)) * CAST(2 * cum_below + c + 1 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS two_r
  FROM cum GROUP BY source
)
SELECT source, n, s AS total_chars,
       ROUND((CAST(two_r AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS gini
FROM per_src
ORDER BY source
"""


# --------------------------------------------- Poisson bootstrap CI
BOOT_B = 32                 # resamples
BOOT_U = 10**6              # md5-uniform resolution
# Poisson(1) CDF cutoffs at 1e-6 resolution: weight k iff u < cut[k]
BOOT_POISSON_CUTS = [367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989]


def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for mean document
    length (Chamandy et al. 2012, "Estimating Uncertainty for
    Massive Data Streams" — the bootstrap that works at warehouse
    scale): each of BOOT_B resamples weights every doc by an
    independent Poisson(1) draw, so a resample is one weighted
    aggregation instead of a shuffle-the-corpus resample; the CI is
    the 2nd-smallest / 2nd-largest of the 32 resample means
    (rank-based 93.75% coverage, reported as-is).

    Determinism at scale: the Poisson draw is an integer CDF-table
    lookup on md5(doc_id‖b) — no RNG state, append-stable, identical
    on every engine. The per-resample means are exact-integer
    ratios; rank selection over the bounded 32-row resample table
    uses the theta-join count convention (no unpartitioned window).
    """
    docs = load_table(spark, sf_dir, "documents")
    b_ids = F.explode(F.array(*[F.lit(b) for b in range(BOOT_B)])).alias("b")
    u = hash_bucket(
        F.concat(
            F.col("doc_id").cast("string"), F.lit("#boot"), F.col("b").cast("string")
        ),
        BOOT_U,
    )
    w = F.lit(len(BOOT_POISSON_CUTS))
    for k in range(len(BOOT_POISSON_CUTS) - 1, -1, -1):
        w = F.when(u < BOOT_POISSON_CUTS[k], F.lit(k)).otherwise(w)
    means = (
        docs.select("doc_id", "n_chars", b_ids)
        .select("b", w.alias("w"), "n_chars")
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("n_chars")).alias("ws"),
            F.sum("w").alias("wn"),
        )
        .select("b", (F.col("ws") / F.col("wn")).alias("m"))
    )
    ranked = (
        means.alias("a")
        .join(
            F.broadcast(means.alias("b2")),
            (F.col("b2.m") < F.col("a.m"))
            | ((F.col("b2.m") == F.col("a.m")) & (F.col("b2.b") < F.col("a.b"))),
            "left",
        )
        .groupBy(F.col("a.b").alias("b"), F.col("a.m").alias("m"))
        .agg((F.count(F.col("b2.b")) + F.lit(1)).alias("rk"))
    )
    lo = ranked.filter(F.col("rk") == 2).select(F.round("m", 6).alias("ci_lo"))
    hi = ranked.filter(F.col("rk") == BOOT_B - 1).select(
        F.round("m", 6).alias("ci_hi")
    )
    full = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("n_chars") / F.count(F.lit(1)), 6).alias("mean_chars"),
    )
    return (
        full.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_docs",
            "mean_chars",
            "ci_lo",
            "ci_hi",
            F.lit(BOOT_B).alias("n_resamples"),
        )
    )


def _boot_weight_sql() -> str:
    cases = " ".join(
        f"WHEN u < {c} THEN {k}" for k, c in enumerate(BOOT_POISSON_CUTS)
    )
    return f"CASE {cases} ELSE {len(BOOT_POISSON_CUTS)} END"


BOOTSTRAP_CI_SQL = f"""
WITH reps AS (
  SELECT unnest(range(0, {BOOT_B})) AS b
), drawn AS (
  SELECT b, n_chars,
         ('0x' || substr(md5(doc_id::VARCHAR || '#boot' || b::VARCHAR), 1, 8))::UBIGINT::BIGINT
           % {BOOT_U} AS u
  FROM documents, reps
), weighted AS (
  SELECT b, {_boot_weight_sql()} AS w, n_chars FROM drawn
), means AS (
  SELECT b,
         CAST(SUM(w * n_chars) AS BIGINT) / CAST(SUM(w) AS BIGINT) AS m
  FROM weighted GROUP BY b
), ranked AS (
  SELECT a.b, a.m, COUNT(b2.b) + 1 AS rk
  FROM means a LEFT JOIN means b2
    ON b2.m < a.m OR (b2.m = a.m AND b2.b < a.b)
  GROUP BY a.b, a.m
), whole AS (
  SELECT COUNT(*) AS n_docs,
         ROUND(CAST(SUM(n_chars) AS BIGINT) / COUNT(*), 6) AS mean_chars
  FROM documents
)
SELECT n_docs, mean_chars,
       (SELECT ROUND(m, 6) FROM ranked WHERE rk = 2) AS ci_lo,
       (SELECT ROUND(m, 6) FROM ranked WHERE rk = {BOOT_B - 1}) AS ci_hi,
       {BOOT_B} AS n_resamples
FROM whole
"""
