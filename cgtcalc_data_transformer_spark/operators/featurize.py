"""Text featurization for training pipelines: feature hashing and
count-min sketching over the ``documents`` table.

Both are the mergeable, fixed-width primitives a 100 TB corpus needs
where exact vocabularies don't fit: the hashing trick gives a
constant-dimension feature vector with no vocabulary broadcast at
all, and the count-min sketch gives frequency estimates from a
d×w matrix that merges associatively across partitions (every cell is
a plain SUM — Spark's map-side partial aggregation IS the sketch
merge).

Hashes are md5-derived (first 8 hex chars → uint32), the repo-wide
portable-hash convention (dedup.py minhash, sampling.hash_bucket) —
reproducible in any engine, which keeps both operators value-oracled
in DuckDB rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.operators.dedup import tokens_col
from cgtcalc_data_transformer_spark.sources.tpch import load_table, scatter

HASH_DIM = 64          # feature-hashed vector width
CMS_DEPTH = 4          # count-min rows (independent hash functions)
CMS_WIDTH = 32         # count-min columns
CMS_TOP_N = 10         # tokens to audit against the sketch


def _h32(col: Column, salt: str = "") -> Column:
    """Portable uint32 from md5 (optionally salted)."""
    salted = F.concat(col, F.lit(salt)) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")


def text_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed feature-hashed term frequencies, sparse (doc, slot, w).

    The hashing trick (Weinberger et al. 2009): slot = h(tok) mod D,
    sign = ±1 from an independent hash bit; collisions cancel in
    expectation instead of biasing upward. Emitted SPARSE — the dense
    D-vector is a fixed-width reshape, but sparse rows are what a
    downstream trainer shuffles and what stays linear in corpus size.
    No vocabulary, no broadcast, one explode + one aggregation.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    hashed = toks.select(
        "doc_id",
        F.pmod(_h32(F.col("tok")), F.lit(HASH_DIM)).alias("slot"),
        F.when(
            _h32(F.col("tok"), "#sign").bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1)).alias("sign"),
    )
    return (
        hashed.groupBy("doc_id", "slot")
        .agg(F.sum("sign").alias("weight"))
        .filter(F.col("weight") != 0)  # exact cancellations drop, as in sparse libs
        .orderBy("doc_id", "slot")
    )


HASHING_TF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT::BIGINT % {HASH_DIM} AS BIGINT) AS slot,
         CASE WHEN ('0x' || substr(md5(tok || '#sign'), 1, 8))::UBIGINT::BIGINT % 2 = 1
              THEN 1 ELSE -1 END AS sign
  FROM toks
)
SELECT doc_id, slot, CAST(SUM(sign) AS BIGINT) AS weight
FROM hashed
GROUP BY doc_id, slot
HAVING SUM(sign) <> 0
ORDER BY doc_id, slot
"""


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over corpus tokens + a heavy-hitter audit.

    Builds the d×w sketch as CMS_DEPTH×CMS_WIDTH SUM cells (one
    aggregation; partial aggregation merges sketches map-side exactly
    like a distributed CMS union), then estimates the top-N exact
    tokens through the sketch: est = min over rows of the addressed
    cell. Emits (token, exact_cnt, cms_est, overestimate_ok) — the
    defining CMS guarantee est >= exact must hold on every row, and
    the oracle checks the estimates value-for-value.

    At 100 TB you keep ONLY the sketch (d×w longs); the exact side
    here exists to audit it at calibration scale.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("tok"))

    # exact heavy hitters (audit side)
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("tok"))
        .limit(CMS_TOP_N)
    )

    # sketch: one row per (depth, column) with summed counts
    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            F.pmod(_h32(F.col("tok"), f"#cms{r}"), F.lit(CMS_WIDTH)).alias(
                                "c"
                            ),
                        )
                        for r in range(CMS_DEPTH)
                    ]
                )
            ).alias("rc")
        )
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    # audit: address each top token's d cells, take the min
    addressed = exact.select(
        "tok",
        "exact_cnt",
        *[
            F.pmod(_h32(F.col("tok"), f"#cms{r}"), F.lit(CMS_WIDTH)).alias(f"c{r}")
            for r in range(CMS_DEPTH)
        ],
    )
    for r in range(CMS_DEPTH):
        addressed = addressed.join(
            F.broadcast(cells.filter(F.col("r") == r).select(
                F.col("c").alias(f"c{r}"), F.col("cnt").alias(f"cnt{r}")
            )),
            f"c{r}",
        )
    return addressed.select(
        "tok",
        "exact_cnt",
        F.least(*[F.col(f"cnt{r}") for r in range(CMS_DEPTH)]).alias("cms_est"),
        (
            F.least(*[F.col(f"cnt{r}") for r in range(CMS_DEPTH)])
            >= F.col("exact_cnt")
        ).alias("overestimate_ok"),
    ).orderBy(F.desc("exact_cnt"), F.asc("tok"))


def _cms_sql() -> str:
    cell_cols = ", ".join(
        f"CAST(('0x' || substr(md5(tok || '#cms{r}'), 1, 8))::UBIGINT::BIGINT % {CMS_WIDTH} AS BIGINT) AS c{r}"
        for r in range(CMS_DEPTH)
    )
    joins = "\n".join(
        f"JOIN cells s{r} ON s{r}.r = {r} AND s{r}.c = a.c{r}"
        for r in range(CMS_DEPTH)
    )
    least = "LEAST(" + ", ".join(f"s{r}.cnt" for r in range(CMS_DEPTH)) + ")"
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
), exact AS (
  SELECT tok, COUNT(*) AS exact_cnt
  FROM toks GROUP BY tok
  ORDER BY exact_cnt DESC, tok ASC LIMIT {CMS_TOP_N}
), cells AS (
  SELECT r, c, COUNT(*) AS cnt FROM (
    SELECT u.r,
           CAST(('0x' || substr(md5(tok || '#cms' || u.r), 1, 8))::UBIGINT::BIGINT % {CMS_WIDTH} AS BIGINT) AS c
    FROM toks CROSS JOIN (SELECT unnest(range(0, {CMS_DEPTH})) AS r) u
  ) GROUP BY r, c
), addressed AS (
  SELECT tok, exact_cnt, {cell_cols} FROM exact
)
SELECT a.tok, a.exact_cnt,
       {least} AS cms_est,
       {least} >= a.exact_cnt AS overestimate_ok
FROM addressed a
{joins}
ORDER BY a.exact_cnt DESC, a.tok ASC
"""


CMS_SQL = _cms_sql()


# ------------------------------------------ mergeable HLL sketch union
HLL_TOL = 0.06  # 3-4x the lgK=12 Datasketches rsd (~1.6%)


def hll_segment_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order-year via Datasketches HLL, plus a
    GLOBAL estimate obtained by UNIONING the per-segment sketches —
    never re-scanning the facts.

    This is the production pattern for distinct-counting at 100 TB:
    each ingest partition/day persists a fixed-size sketch (here
    ``hll_sketch_agg``, lgK=12 → 4 KB), and any rollup — month, year,
    all-time — is ``hll_union_agg`` over the stored sketches, an
    algebraic merge whose cost is segments × 4 KB, independent of row
    count. COUNT(DISTINCT) at the same granularities would shuffle
    the full key set per query.

    Gate-checkable like agg_approx (sketch bytes are engine-specific,
    estimates are deterministic for fixed input): emit the exact
    distinct counts plus booleans pinning each estimate within
    HLL_TOL; the DuckDB oracle computes the exact sides and literal
    TRUEs. The exact sides here are the audit, not part of the
    pattern under test.
    """
    orders = load_table(spark, sf_dir, "orders")
    # CACHED (r12 union audit): the per-segment branch and the merged
    # rollup both read this |years|-row sketch frame — uncached, the
    # sketch build re-scanned orders once per branch, breaking the
    # "never re-scanning the facts" promise below
    seg = orders.groupBy(F.year("o_orderdate").alias("segment_year")).agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk"),
        F.count_distinct("o_custkey").alias("exact_customers"),
    ).cache()
    per_seg = seg.select(
        F.col("segment_year").cast("string").alias("segment"),
        "exact_customers",
        (
            F.abs(
                F.expr("hll_sketch_estimate(sk)") - F.col("exact_customers")
            )
            / F.col("exact_customers")
            < HLL_TOL
        ).alias("sketch_ok"),
    )
    global_exact = orders.agg(
        F.count_distinct("o_custkey").alias("exact_customers")
    )
    merged = (
        seg.agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("_est"))
        .crossJoin(F.broadcast(global_exact))
        .select(
            F.lit("(merged)").alias("segment"),
            "exact_customers",
            (
                F.abs(F.col("_est") - F.col("exact_customers"))
                / F.col("exact_customers")
                < HLL_TOL
            ).alias("sketch_ok"),
        )
    )
    return per_seg.unionByName(merged).orderBy("segment")


HLL_SEGMENT_SQL = """
SELECT CAST(year(o_orderdate) AS VARCHAR) AS segment,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       TRUE AS sketch_ok
FROM orders
GROUP BY 1
UNION ALL
SELECT '(merged)', COUNT(DISTINCT o_custkey), TRUE
FROM orders
ORDER BY segment
"""


# ----------------------------------------------- KMV distinct sketch
KMV_K = 64  # sketch size; rel. error ~ 1/sqrt(k-2) ≈ 13%


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch per event_type, audited
    against the exact count in the same result row.

    Third sketch of the family (count-min → frequencies, HLL →
    distincts via Spark's built-in): KMV keeps the k smallest hash
    values of the key set; the k-th smallest h_k estimates the
    distinct count as (k-1)/h_k. Unlike HLL the sketch is a plain
    sorted sample, so two KMVs intersect/union by merging value
    lists — the primitive for distinct-intersection estimates that
    HLL cannot give. md5-derived hashes keep it engine-portable and
    value-oracled (Spark's approx_count_distinct seed is not).

    Scale shape: distinct (type, user) collapse, then a rank-≤-k
    window that Spark 4 rewrites to WindowGroupLimit — per-partition
    partial top-k BEFORE the shuffle, so the full key set is never
    sorted; only k rows per group cross the wire.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    # uniform (0,1]: 32-bit md5 prefix + 1, scaled — exact in double
    h = (
        (F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast("long") + 1)
        / F.lit(4294967296.0)
    ).alias("h")
    ranked = ev.select("event_type", "user_id", h).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("h", "user_id")
        ),
    )
    kth = (
        ranked.filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("h_k"), F.count(F.lit(1)).alias("n_kept"))
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    est = F.when(
        F.col("n_kept") < KMV_K, F.col("n_kept").cast("double")  # small set: exact
    ).otherwise((F.lit(KMV_K) - 1) / F.col("h_k"))
    return (
        exact.join(kth, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.round(est, 4).alias("kmv_estimate"),
            (F.abs(est - F.col("n_exact")) / F.col("n_exact") < 0.4).alias(
                "within_bound"
            ),
        )
        .orderBy("event_type")
    )


KMV_DISTINCT_SQL = f"""
WITH dk AS (
  SELECT DISTINCT event_type, user_id FROM events
),
hashed AS (
  SELECT event_type, user_id,
         (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::UBIGINT::BIGINT + 1) / 4294967296.0 AS h
  FROM dk
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, user_id) AS rn
  FROM hashed
),
kth AS (
  SELECT event_type, MAX(h) AS h_k, COUNT(*) AS n_kept
  FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM dk GROUP BY event_type
)
SELECT e.event_type, e.n_exact,
       ROUND(CASE WHEN k.n_kept < {KMV_K} THEN CAST(k.n_kept AS DOUBLE)
                  ELSE ({KMV_K} - 1) / k.h_k END, 4) AS kmv_estimate,
       ABS(CASE WHEN k.n_kept < {KMV_K} THEN CAST(k.n_kept AS DOUBLE)
                ELSE ({KMV_K} - 1) / k.h_k END - e.n_exact) / e.n_exact < 0.4 AS within_bound
FROM exact e JOIN kth k USING (event_type)
ORDER BY e.event_type
"""


def kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch ALGEBRA: estimate |A ∩ B| for two user sets (click
    users vs purchase users) from the merged sketch — the operation
    the kmv_distinct docstring promises and HLL cannot do.

    Method: take the k smallest hashes of A ∪ B (a global
    orderBy+limit — Spark compiles it to TakeOrderedAndProject, a
    per-partition partial top-k then a k-row merge, never a full
    sort); within those k, the fraction ρ present in BOTH sets
    estimates |A∩B| = ρ · (k-1)/h_k. The audit row carries the exact
    intersection alongside, with a 3σ-ish tolerance flag.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    flags = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("in_a"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("in_b"),
        )
    )
    h = (
        (F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast("long") + 1)
        / F.lit(4294967296.0)
    ).alias("h")
    sketch = flags.select("user_id", "in_a", "in_b", h).orderBy("h", "user_id").limit(KMV_K)
    merged = sketch.groupBy().agg(
        F.max("h").alias("h_k"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum((F.col("in_a") + F.col("in_b") == 2).cast("long")).alias("n_both"),
    )
    exact = flags.groupBy().agg(
        F.sum("in_a").alias("n_a_exact"),
        F.sum("in_b").alias("n_b_exact"),
        F.sum((F.col("in_a") + F.col("in_b") == 2).cast("long")).alias("n_inter_exact"),
    )
    union_est = F.when(
        F.col("n_kept") < KMV_K, F.col("n_kept").cast("double")
    ).otherwise((F.lit(KMV_K) - 1) / F.col("h_k"))
    inter_est = F.round(F.col("n_both") / F.col("n_kept") * union_est, 4)
    return exact.crossJoin(F.broadcast(merged)).select(
        "n_a_exact",
        "n_b_exact",
        "n_inter_exact",
        F.round(union_est, 4).alias("union_est"),
        inter_est.alias("inter_est"),
        (
            F.abs(inter_est - F.col("n_inter_exact"))
            / F.greatest(F.col("n_inter_exact"), F.lit(1))
            < 0.5
        ).alias("within_bound"),
    )


KMV_INTERSECTION_SQL = f"""
WITH flags AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY user_id
),
hashed AS (
  SELECT user_id, in_a, in_b,
         (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::UBIGINT::BIGINT + 1) / 4294967296.0 AS h
  FROM flags
),
sketch AS (
  SELECT * FROM hashed ORDER BY h, user_id LIMIT {KMV_K}
),
merged AS (
  SELECT MAX(h) AS h_k, COUNT(*) AS n_kept,
         SUM(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END) AS n_both
  FROM sketch
),
exact AS (
  SELECT CAST(SUM(in_a) AS BIGINT) AS n_a_exact,
         CAST(SUM(in_b) AS BIGINT) AS n_b_exact,
         CAST(SUM(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_inter_exact
  FROM flags
)
SELECT n_a_exact, n_b_exact, n_inter_exact,
       ROUND(CASE WHEN n_kept < {KMV_K} THEN CAST(n_kept AS DOUBLE) ELSE ({KMV_K} - 1) / h_k END, 4) AS union_est,
       ROUND(n_both / n_kept * (CASE WHEN n_kept < {KMV_K} THEN CAST(n_kept AS DOUBLE) ELSE ({KMV_K} - 1) / h_k END), 4) AS inter_est,
       ABS(ROUND(n_both / n_kept * (CASE WHEN n_kept < {KMV_K} THEN CAST(n_kept AS DOUBLE) ELSE ({KMV_K} - 1) / h_k END), 4) - n_inter_exact)
         / GREATEST(n_inter_exact, 1) < 0.5 AS within_bound
FROM exact, merged
"""
