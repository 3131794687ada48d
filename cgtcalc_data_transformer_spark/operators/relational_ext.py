"""Second wave of relational operators: reshaping, advanced window
frames, skew-aware joins, and subquery patterns.

The reference has none of these (SURVEY.md §2.2 — it has no joins or
aggregations at all); they round out the engine's relational surface
so a warehouse-style workload ports cleanly. Scale notes per operator
in the docstrings; every result is deterministic and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table, scatter


from cgtcalc_data_transformer_spark.functions.money import dec as _dec


# ------------------------------------------------------------ unpivot
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt): per-priority status counts as rows.

    ``DataFrame.unpivot`` is a zero-shuffle Expand node — the wide
    aggregate (one shuffle) is the only exchange in the plan.
    """
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("F"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("O"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("P"),
        )
    )
    return (
        wide.unpivot("o_orderpriority", ["F", "O", "P"], "status", "cnt")
        .orderBy("o_orderpriority", "status")
    )


UNPIVOT_SQL = """
WITH wide AS (
  SELECT o_orderpriority,
         COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
         COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
         COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, status, cnt FROM (
  SELECT o_orderpriority, 'F' AS status, f_cnt AS cnt FROM wide
  UNION ALL
  SELECT o_orderpriority, 'O' AS status, o_cnt AS cnt FROM wide
  UNION ALL
  SELECT o_orderpriority, 'P' AS status, p_cnt AS cnt FROM wide
)
ORDER BY o_orderpriority, status
"""


# ------------------------------------------------- range-frame window
def window_range_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per customer, order value accumulated over the
    trailing 30 days (inclusive), ordered by day.

    RANGE (value-based) frames differ from ROWS frames when several
    orders share a day — all same-day rows enter the frame together.
    The frame key is epoch-days (integer) so both engines evaluate an
    identical numeric RANGE; one shuffle, partitioned by customer.
    """
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            day.alias("order_day"),
            F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias("trailing_30d_value"),
        )
        .orderBy("o_custkey", "order_day", "o_orderkey")
    )


WINDOW_RANGE_SQL = """
SELECT o_custkey, o_orderkey,
       date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS order_day,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
            PARTITION BY o_custkey
            ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d_value
FROM orders
ORDER BY o_custkey, order_day, o_orderkey
"""


# -------------------------------------------- distribution window fns
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank + cume_dist per priority, deterministic
    tiebreak on orderkey so ranks are engine-exact."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


WINDOW_NTILE_SQL = """
SELECT o_orderpriority, o_orderkey,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderpriority, o_orderkey
"""


# ---------------------------------------------------- salted skew join
SALT_BUCKETS = 4  # mechanics demo on uniform keys: every bucket multiplies
#                   the replicated side's shuffle volume; 4 shows the shape
#                   without paying 8x (real salting sizes this to the skew)
PARTIAL_SALT_BUCKETS = 32  # hot-key-only replication → fan out to every core


def join_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join: per-orderstatus lineitem revenue.

    The salting pattern for a hot-key fact⋈fact join: the big side
    gets a salt derived from a non-join column (here l_linenumber, so
    one order's rows spread over SALT_BUCKETS reducers), the smaller
    side is replicated SALT_BUCKETS× via explode, and the join key
    becomes (key, salt). Deterministic salt keeps the result
    oracle-checkable; production salting with rand() has the same
    plan shape. AQE's skew-join split handles moderate skew without
    this; explicit salting is for the pathological keys AQE can't
    split (a single key bigger than an executor).
    """
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_linenumber"), F.lit(SALT_BUCKETS)).cast("int")
    )
    orders_rep = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .withColumn(
            "salt",
            F.explode(F.array(*[F.lit(i).cast("int") for i in range(SALT_BUCKETS)])),
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            orders_rep,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li["salt"] == orders_rep["salt"]),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            F.sum(_dec(revenue)).cast("double").alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


JOIN_SALTED_SQL = """
SELECT o_orderstatus, COUNT(*) AS line_cnt,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ------------------------------------- skewed-key join demonstration
# A deterministically PATHOLOGICAL fact table: ~60% of lineitem rows
# remapped onto one hot orderkey. This is the fixture VERDICT r1 #5
# asked for — join_salted_revenue above shows the salt mechanics on
# uniform keys; these variants let the bench measure salted vs plain
# vs AQE-skew-split on a key distribution that actually hurts.
SKEW_HOT_KEY = 1     # exists in orders at every SF
SKEW_HOT_PCT = 6     # 6 of 10 hash buckets → ~60% of rows on the hot key
SKEW_REPL = 8        # fact-side replication so the straggler is measurable
#                      (sf0.1 alone puts only ~360k rows on the hot key —
#                      noise for 32 local cores; ×8 makes it ~2.9M)


def skewed_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(SKEW_REPL)))
    )
    hot = (
        F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber"), F.lit(10))
        < SKEW_HOT_PCT
    )
    return li.withColumn(
        "sk_orderkey",
        F.when(hot, F.lit(SKEW_HOT_KEY)).otherwise(F.col("l_orderkey")),
    )


def _skew_agg(joined: DataFrame) -> DataFrame:
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            F.sum(_dec(revenue)).cast("double").alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


def skew_join_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled join straight on the hot key — the baseline that
    stalls on one straggler task holding ~60% of the fact side.
    (The bench disables auto-broadcast for this comparison: at real
    scale neither side broadcasts.)"""
    li = skewed_lineitem(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return _skew_agg(li.join(orders, F.col("sk_orderkey") == F.col("o_orderkey")))


def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted variant on the same pathological keys: fact side salts
    on a non-join column, dim side replicates SALT_BUCKETS× via
    explode, join key becomes (key, salt) — the hot key's rows spread
    over SALT_BUCKETS reducers. This is the mitigation for keys AQE
    cannot split (a single key larger than an executor)."""
    li = skewed_lineitem(spark, sf_dir).withColumn(
        "salt",
        F.pmod(F.col("l_partkey") + F.col("rep"), F.lit(SALT_BUCKETS)).cast("int"),
    )
    orders_rep = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .withColumn(
            "salt",
            F.explode(F.array(*[F.lit(i).cast("int") for i in range(SALT_BUCKETS)])),
        )
    )
    return _skew_agg(
        li.join(
            orders_rep,
            (F.col("sk_orderkey") == F.col("o_orderkey"))
            & (li["salt"] == orders_rep["salt"]),
        )
    )


def skew_join_salted_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial salting — the production form: detect the hot keys at
    runtime (one count-aggregate; the list crossing the driver is
    bounded by the skew itself, a handful of keys), salt ONLY those,
    and join the cold majority plainly. The dim side replicates
    SALT_BUCKETS× for the hot keys alone (a few rows), not the whole
    table — full salting's dim blow-up (|dim|×SALT_BUCKETS rows) is
    what makes it lose to AQE at scale; this variant keeps the salted
    path's straggler-free property without that cost."""
    li = skewed_lineitem(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    # Hot-key detection on a 1% DETERMINISTIC hash sample: a key worth
    # salting holds ≥10% of the fact side, so a 1% sample sees it
    # thousands of times — full-scan counting would cost more than the
    # skew itself. xxhash64 (native, no string cast) rather than the
    # oracle-portable md5 bucketing: detection is internal, only the
    # JOIN RESULT must match the oracle, and md5-of-string over the
    # fact side would cost more than the sample saves. One cheap
    # aggregate; the driver list is bounded by the 10% threshold
    # (≤10 keys).
    sample = li.filter(
        F.pmod(F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber")), F.lit(100))
        < 1
    )
    # Sample total as a broadcast 1-row scalar, NOT a global window:
    # Window.partitionBy() funnels every distinct sampled key through
    # one partition (billions of rows at 100 TB); the crossJoin of a
    # broadcast single-row aggregate keeps the threshold comparison
    # fully parallel, and AQE reuses the groupBy exchange for both
    # branches (VERDICT r2 #2).
    counts = sample.groupBy("sk_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("n_sample"))
    hot_rows = (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n_sample") / 10)
        .collect()
    )
    hot_keys = [r.sk_orderkey for r in hot_rows]
    if not hot_keys:
        return _skew_agg(li.join(orders, F.col("sk_orderkey") == F.col("o_orderkey")))
    # Wide fan-out: replication cost is per-HOT-key (a handful of dim
    # rows), so the salt can spread each hot key across every core —
    # unlike full salting, where the dim blow-up scales with buckets.
    li_cold = li.filter(~F.col("sk_orderkey").isin(hot_keys))
    li_hot = li.filter(F.col("sk_orderkey").isin(hot_keys)).withColumn(
        "salt",
        F.pmod(
            F.col("l_partkey") + F.col("rep"), F.lit(PARTIAL_SALT_BUCKETS)
        ).cast("int"),
    )
    orders_hot = (
        orders.filter(F.col("o_orderkey").isin(hot_keys))
        .withColumn(
            "salt",
            F.explode(
                F.array(
                    *[F.lit(i).cast("int") for i in range(PARTIAL_SALT_BUCKETS)]
                )
            ),
        )
    )
    cold = li_cold.join(orders, F.col("sk_orderkey") == F.col("o_orderkey")).select(
        "o_orderstatus", "l_extendedprice", "l_discount"
    )
    hot = li_hot.join(
        orders_hot,
        (F.col("sk_orderkey") == F.col("o_orderkey"))
        & (li_hot["salt"] == orders_hot["salt"]),
    ).select("o_orderstatus", "l_extendedprice", "l_discount")
    return _skew_agg(cold.unionByName(hot))


SKEW_JOIN_SQL = f"""
WITH sk AS (
  SELECT CASE WHEN (l_orderkey * 7 + l_linenumber) % 10 < {SKEW_HOT_PCT}
              THEN {SKEW_HOT_KEY} ELSE l_orderkey END AS sk_orderkey,
         l_extendedprice, l_discount
  FROM lineitem CROSS JOIN generate_series(1, {SKEW_REPL})
)
SELECT o_orderstatus, COUNT(*) AS line_cnt,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM sk JOIN orders ON sk_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ------------------------------------------------------------ TPC-H Q6
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter-scan-agg, zero joins.

    The benchmark's pushdown probe: all three predicates reach the
    parquet scan (min/max row-group pruning at scale), the agg is a
    single partial+final sum — the cheapest possible plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.coalesce(
                F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount"))).cast(
                    "double"
                ),
                F.lit(0.0),
            ).alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


Q6_SQL = """
SELECT CAST(COALESCE(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))), 0) AS DOUBLE) AS revenue,
       COUNT(*) AS line_cnt
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ------------------------------------------------------ full outer join
def join_full_outer_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two daily aggregates (orders placed vs
    lineitems shipped per day) — unmatched days survive from both
    sides with explicit null handling."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    placed = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("orders_placed"))
    shipped = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("lines_shipped"))
    return (
        placed.join(shipped, "day", "full_outer")
        .select(
            "day",
            F.coalesce("orders_placed", F.lit(0)).alias("orders_placed"),
            F.coalesce("lines_shipped", F.lit(0)).alias("lines_shipped"),
        )
        .orderBy("day")
    )


JOIN_FULL_OUTER_SQL = """
SELECT COALESCE(p.day, s.day) AS day,
       COALESCE(orders_placed, 0) AS orders_placed,
       COALESCE(lines_shipped, 0) AS lines_shipped
FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, COUNT(*) AS orders_placed
      FROM orders GROUP BY 1) p
FULL OUTER JOIN
     (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day, COUNT(*) AS lines_shipped
      FROM lineitem GROUP BY 1) s
  ON p.day = s.day
ORDER BY day
"""


# --------------------------------------------- correlated scalar subquery
def subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with balance above their nation's average.

    The correlated scalar subquery decorrelates to agg + equi-join;
    we declare that shape directly (nation aggregate is 25 rows →
    broadcast, zero shuffle on the customer side). The average is
    computed as exact-decimal sum / count in both engines so the
    comparison boundary is bit-identical.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation_avg = (
        cust.groupBy("c_nationkey")
        .agg(
            (F.sum(_dec(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias(
                "nation_avg"
            )
        )
    )
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.round("nation_avg", 6).alias("nation_avg"),
        )
        .orderBy("c_custkey")
    )


SUBQUERY_SCALAR_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       ROUND(nation_avg, 6) AS nation_avg
FROM (
  SELECT c_custkey, c_nationkey, c_acctbal,
         (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
          FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey) AS nation_avg
  FROM customer c
)
WHERE c_acctbal > nation_avg
ORDER BY c_custkey
"""


# ------------------------------------- runtime bloom-filter semi-join
BLOOM_PRICE_MIN = 300000.0


def bloom_filter_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dim fact join shaped for Catalyst's runtime Bloom
    filter: revenue by return flag for lineitems of very expensive
    urgent orders (~1% of orders).

    At production scan sizes Spark's InjectRuntimeFilter rewrites
    this to ``bloom_filter_might_contain(l_orderkey)`` ON THE FACT
    SCAN — a compact bitmap built from the filtered dim side that
    discards most fact rows BEFORE the join shuffle (the
    shuffle-join counterpart of dynamic partition pruning, which
    needs a partition column; the bloom prunes on any key). The
    injection thresholds are sized for real tables
    (application side ≥ 10 GB by default), so at fixture scale the
    plan is a plain SMJ/broadcast — tests/test_round3_ops.py tunes
    the thresholds down and asserts the injected
    ``bloom_filter_might_contain`` plus result equality with the
    un-bloomed plan. The query itself is the honest production
    shape either way: filter pushed to the dim scan, equality join,
    one aggregation.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > BLOOM_PRICE_MIN)
    ).select("o_orderkey")
    return (
        li.join(dim, li.l_orderkey == dim.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


BLOOM_JOIN_SQL = f"""
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_totalprice > {BLOOM_PRICE_MIN}
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ------------------------------------------- join strategy hint demo
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment order stats with an explicit ``shuffle_hash`` hint
    on the build side: Catalyst picks SortMergeJoin for two
    non-broadcastable sides by default (sort both, merge — robust,
    spillable), but when the BUILD side fits executor memory a
    shuffled hash join skips BOTH sorts. The hint is the operator-
    level control a tuned 100 TB pipeline uses when it knows the
    dim-after-filter is hash-table-sized but above the broadcast
    threshold; AQE cannot always infer this pre-shuffle.
    tests/test_round3_ops.py pins the physical strategy:
    ShuffledHashJoin with the hint, and result equality with the
    unhinted SMJ plan under a disabled broadcast threshold.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


JOIN_SHJ_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------- collated aggregation
def collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive aggregation via Spark 4 COLLATE (UTF8_LCASE)
    instead of key-mangling with lower().

    Collations move comparison semantics into the TYPE, so every
    downstream comparison — grouping here, but equally joins and
    DISTINCT — inherits them without wrapping each key expression
    (wrap-forgetting is the classic silent-wrong-count bug). The demo
    corrupts p_brand's case deterministically by key parity, then
    groups under UTF8_LCASE: case variants merge back. The emitted
    key is lower()ed because a collated group's representative is an
    arbitrary member — the collation defines equality, not the
    canonical form (same reason the oracle groups by lower()).
    Plan-wise this stays one map-side-combinable hash aggregate; the
    collation key is computed in codegen.
    """
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.upper(F.col("p_brand"))
    ).otherwise(F.col("p_brand"))
    return (
        part.select(mixed.alias("brand_mixed"))
        .groupBy(F.collate(F.col("brand_mixed"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct(
                F.collate(F.col("brand_mixed"), "UTF8_BINARY")
            ).alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("k")).alias("brand_ci"),
            "n_parts",
            "n_case_variants",
        )
        .orderBy("brand_ci")
    )


COLLATED_GROUP_SQL = """
WITH mixed AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand) ELSE p_brand END AS brand_mixed
  FROM part
)
SELECT lower(brand_mixed) AS brand_ci,
       COUNT(*) AS n_parts,
       CAST(COUNT(DISTINCT brand_mixed) AS BIGINT) AS n_case_variants
FROM mixed
GROUP BY lower(brand_mixed)
ORDER BY brand_ci
"""


# ------------------------------------------------ frequent pair mining
PAIR_MIN_SUPPORT = 2
PAIR_TOP_K = 50


def frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket frequent-pair mining (the A-priori candidate
    step) over order baskets: top-K part pairs by co-occurrence
    support with their lift — the recommendation / affinity primitive.

    lift(a,b) = sup(a,b)·N / (sup(a)·sup(b)), computed with each
    factor cast to double BEFORE multiplying (exact below 2^53 and
    overflow-safe beyond — same discipline as collocations_pmi) and
    quantized floor(x·1e6 + 0.5) so ordering carries no libm risk.

    Plan shape: the pair generation is a self-equality-join on
    l_orderkey — fan-out bounded by basket size (TPC-H baskets are
    <=7 lines; cost O(sum s_i^2), the standard A-priori bound — a
    99.9th-percentile basket cap belongs upstream for heavy-tailed
    retail data). Item supports are one aggregation of the SAME
    distinct basket table (cached: pair side + two marginal lookups);
    N is a broadcast 1-row scalar; final top-K is
    TakeOrderedAndProject.
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
    item_sup = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("sup_item"))
    pairs = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= PAIR_MIN_SUPPORT)
    )
    scored = (
        pairs.join(
            item_sup.select(
                F.col("l_partkey").alias("part_a"),
                F.col("sup_item").alias("sup_a"),
            ),
            "part_a",
        )
        .join(
            item_sup.select(
                F.col("l_partkey").alias("part_b"),
                F.col("sup_item").alias("sup_b"),
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .withColumn(
            "lift_int",
            F.floor(
                (
                    F.col("support").cast("double")
                    * F.col("n_baskets").cast("double")
                )
                / (F.col("sup_a").cast("double") * F.col("sup_b").cast("double"))
                * 1e6
                + 0.5
            ).cast("long"),
        )
    )
    return (
        scored.select(
            "part_a",
            "part_b",
            "support",
            "sup_a",
            "sup_b",
            (F.col("lift_int") / F.lit(1e6)).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(PAIR_TOP_K)
    )


FREQUENT_PAIRS_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM li
), item_sup AS (
  SELECT l_partkey, COUNT(*) AS sup_item FROM li GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {PAIR_MIN_SUPPORT}
)
SELECT part_a, part_b, support,
       sa.sup_item AS sup_a, sb.sup_item AS sup_b,
       CAST(floor((CAST(support AS DOUBLE) * CAST(n.n_baskets AS DOUBLE))
                  / (CAST(sa.sup_item AS DOUBLE) * CAST(sb.sup_item AS DOUBLE))
                  * 1e6 + 0.5) AS BIGINT) / 1e6 AS lift
FROM pairs
JOIN item_sup sa ON sa.l_partkey = part_a
JOIN item_sup sb ON sb.l_partkey = part_b
CROSS JOIN n
ORDER BY support DESC, part_a, part_b
LIMIT {PAIR_TOP_K}
"""


# ------------------------------------------- Pearson correlation matrix
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's numeric
    measures — the standard profiling step before feature selection
    or drift baselining (collinear measures, broken derivations).
    One row per unordered column pair with n and corr.

    ONE aggregation computes all sufficient statistics (Σx, Σx²,
    Σxy for every pair) map-side-combinable; the matrix assembly is a
    literal 6-row projection, no second scan, no shuffle beyond the
    single agg. Exactness (the repo's q1 recipe): products are
    computed in DOUBLE — exact, not merely correctly rounded, because
    every input has <= 2 decimals and every product < 2^53 — then
    cast to decimal(28,6) before SUM, so the cross-partition sum is
    associative integer arithmetic and order-insensitive; the
    closed-form corr is then one identical IEEE expression per engine
    (/, sqrt, * correctly rounded). decimal(38,6) headroom covers
    ~1e24 of summed price²-scale mass — far past 100 TB.
    """
    # r15 adjudication of the r14 0.41x row (VERDICT r14 item 4): the
    # regression is REAL, not drift — the r14 single-pass plan is
    # strictly better in scans/Exchanges (12→2), but its map-side
    # aggregation (15 decimal(28,6) sums = interpreted BigDecimal
    # adds, ~9M updates) runs on the scan's task count, and an 11 MB
    # local parquet file splits into only ~3 tasks — the pre-r14
    # union-of-6 shape was faster locally ONLY because its 6
    # duplicated scan branches ran concurrently (6x the tasks, 6x
    # the scanned bytes). scatter() round-robins the 4 measure
    # columns across the full core count before the CPU-bound
    # aggregation (its partition guard makes it a no-op at cluster
    # scale, where the table is thousands of splits); sums are
    # decimal — associative and order-insensitive, values unchanged.
    li = scatter(
        load_table(spark, sf_dir, "lineitem").select(*_CORR_COLS)
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(_dec(F.col(c))).alias(f"s_{c}"))
        aggs.append(F.sum(_dec(F.col(c) * F.col(c))).alias(f"ss_{c}"))
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(F.sum(_dec(F.col(a) * F.col(b))).alias(f"sp_{a}_{b}"))
    stats = li.agg(*aggs)

    # ONE projection over the single stats row, exploded to the 6
    # pair rows (r14 plan audit): the pre-r14 union of 6 per-pair
    # projections re-executed the whole aggregation per branch — the
    # physical plan scanned lineitem 6x, contradicting the "no second
    # scan" contract above (plans/r14/corr_matrix_lineitem_before.txt;
    # guide §2.4). Same expressions per pair, identical values.
    pair_structs = []
    for a, b in pairs:
        n = F.col("n").cast("double")
        sa = F.col(f"s_{a}").cast("double")
        sb = F.col(f"s_{b}").cast("double")
        ssa = F.col(f"ss_{a}").cast("double")
        ssb = F.col(f"ss_{b}").cast("double")
        sab = F.col(f"sp_{a}_{b}").cast("double")
        corr = (n * sab - sa * sb) / F.sqrt(
            (n * ssa - sa * sa) * (n * ssb - sb * sb)
        )
        pair_structs.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n").alias("n"),
                F.round(corr, 6).alias("corr"),
            )
        )
    return (
        stats.select(F.explode(F.array(*pair_structs)).alias("p"))
        .select("p.col_a", "p.col_b", "p.n", "p.corr")
        .orderBy("col_a", "col_b")
    )


def _corr_sql() -> str:
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    sums = ",\n         ".join(
        f"SUM(CAST({c} AS DECIMAL(28,6))) AS s_{c},\n         "
        f"SUM(CAST({c} * {c} AS DECIMAL(28,6))) AS ss_{c}"
        for c in _CORR_COLS
    )
    prods = ",\n         ".join(
        f"SUM(CAST({a} * {b} AS DECIMAL(28,6))) AS sp_{a}_{b}"
        for a, b in pairs
    )
    selects = "\nUNION ALL\n".join(
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b, n,
       ROUND((CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)
              - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)
                     - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)
                       - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 6) AS corr
FROM stats"""
        for a, b in pairs
    )
    return f"""
WITH stats AS (
  SELECT COUNT(*) AS n,
         {sums},
         {prods}
  FROM lineitem
)
{selects}
ORDER BY col_a, col_b
"""


CORR_MATRIX_SQL = _corr_sql()


# ---------------------------------------------- join-key skew profile
SKEW_HOT_MULT = 10  # a key holding > 10x the mean group size is "hot"


def _one_key_profile(df: DataFrame, table: str, key: str) -> DataFrame:
    sizes = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    totals = sizes.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("sz").alias("n_rows")
    )
    flagged = sizes.crossJoin(F.broadcast(totals)).select(
        "sz",
        "n_keys",
        "n_rows",
        # sz > MULT * n_rows/n_keys, integer-exact multiply form
        (F.col("sz") * F.col("n_keys") > F.lit(SKEW_HOT_MULT) * F.col("n_rows"))
        .cast("long")
        .alias("hot"),
    )
    return flagged.groupBy("n_keys", "n_rows").agg(
        F.max("sz").alias("max_size"),
        F.sum(F.col("hot") * F.col("sz")).alias("hot_rows"),
        F.sum("hot").alias("hot_keys"),
    ).select(
        F.lit(table).alias("tbl"),
        F.lit(key).alias("key"),
        "n_keys",
        "n_rows",
        "max_size",
        F.round(F.col("max_size") / F.col("n_rows"), 6).alias("top_share"),
        "hot_keys",
        F.round(F.col("hot_rows") / F.col("n_rows"), 6).alias("hot_row_share"),
    )


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for the fact tables' main join keys —
    the pre-flight check behind every skew mitigation this repo
    ships (`skew_join_salted`, AQE split): per (table, key), the key
    count, max group size, the top key's row share, and how many
    rows sit in 'hot' keys (> 10x the mean group size). A planner
    reads this BEFORE choosing broadcast/salt/AQE, instead of
    discovering the hot key from a straggler task at hour three.

    One count aggregation per key (map-side combinable — the shuffle
    carries one row per key) + a 1-row totals broadcast; the hot
    test is an integer cross-multiply, no division, no quantiles.
    All three profiles union into one bounded result.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    out = _one_key_profile(li, "lineitem", "l_orderkey")
    out = out.unionByName(_one_key_profile(li, "lineitem", "l_suppkey"))
    out = out.unionByName(_one_key_profile(orders, "orders", "o_custkey"))
    return out.orderBy("tbl", "key")


def _skew_profile_sql(table: str, key: str) -> str:
    return f"""
SELECT '{table}' AS tbl, '{key}' AS key, n_keys, n_rows, max_size,
       ROUND(max_size / n_rows, 6) AS top_share,
       hot_keys,
       ROUND(hot_rows / n_rows, 6) AS hot_row_share
FROM (
  SELECT COUNT(*) AS n_keys,
         CAST(SUM(sz) AS BIGINT) AS n_rows,
         MAX(sz) AS max_size,
         CAST(SUM(CASE WHEN hot THEN 1 ELSE 0 END) AS BIGINT) AS hot_keys,
         CAST(SUM(CASE WHEN hot THEN sz ELSE 0 END) AS BIGINT) AS hot_rows
  FROM (
    SELECT sz,
           sz * (SELECT COUNT(*) FROM
                 (SELECT {key} FROM {table} GROUP BY {key}))
             > {SKEW_HOT_MULT} * (SELECT COUNT(*) FROM {table}) AS hot
    FROM (SELECT {key}, COUNT(*) AS sz FROM {table} GROUP BY {key})
  )
)
"""


KEY_SKEW_SQL = (
    _skew_profile_sql("lineitem", "l_orderkey")
    + "UNION ALL"
    + _skew_profile_sql("lineitem", "l_suppkey")
    + "UNION ALL"
    + _skew_profile_sql("orders", "o_custkey")
    + "ORDER BY tbl, key"
)


# ------------------------------------------------ closed-form OLS fit
def ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (closed form):
    l_extendedprice ~ l_quantity within each l_returnflag — slope,
    intercept and R² straight from the five sufficient statistics,
    the normal-equations shape every in-warehouse regression uses.
    On real TPC-H data extendedprice = unitprice·quantity, so R²
    would be high; this driver fixture generates the two columns
    INDEPENDENTLY and the fit correctly reports R² ≈ 0 — the broken
    derived-column detection this audit exists for, demonstrated.

    ONE map-side-combinable aggregation per group; like
    `corr_matrix_lineitem`, products are computed in DOUBLE (exact:
    <= 2-decimal inputs, < 2^53) and cast decimal(28,6) BEFORE the
    sums, so the statistics are order-insensitive integers and the
    closed-form coefficients are one identical IEEE expression per
    engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(x)).alias("sx"),
        F.sum(_dec(y)).alias("sy"),
        F.sum(_dec(x * y)).alias("sxy"),
        F.sum(_dec(x * x)).alias("sxx"),
        F.sum(_dec(y * y)).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    slope = num / denx
    return stats.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(num * num / (denx * deny), 6).alias("r2"),
    ).orderBy("l_returnflag")


OLS_REGRESSION_SQL = """
WITH stats AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(28,6))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS sy,
         SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS sxy,
         SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS sxx,
         SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
       ROUND((CAST(sy AS DOUBLE)
              - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
FROM stats
ORDER BY l_returnflag
"""

# -------------------------------------------- association-rule metrics
RULE_MIN_SUPPORT = 4      # directional rules need more evidence than
                          # frequent_pairs' candidate floor
RULE_CONVICTION_CAP = 999999.0  # conviction is +inf at confidence 1


def assoc_rules_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules over order baskets: for each
    frequent part pair, confidence(a→b) = sup(ab)/sup(a) and
    conviction(a→b) = (1 − sup(b)/N)/(1 − conf) in BOTH directions —
    the rule-quality metrics (Brin et al. 1997) that frequent_pairs'
    symmetric lift cannot express: lift says the pair co-occurs,
    confidence/conviction say WHICH WAY the implication runs.

    Same A-priori-bounded self-join as frequent_pairs (Σ basket²
    pair generation, marginals from one aggregation of the same
    distinct-basket table); confidences are exact int/int divisions;
    conviction is one IEEE expression with the conf = 1 pole capped
    at a literal (deterministically, on both engines).
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .cache()
    )
    n_baskets = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    item_sup = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("sup"))
    pairs = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= RULE_MIN_SUPPORT)
    )
    j = (
        pairs.join(
            item_sup.select(
                F.col("l_partkey").alias("part_a"), F.col("sup").alias("sup_a")
            ),
            "part_a",
        )
        .join(
            item_sup.select(
                F.col("l_partkey").alias("part_b"), F.col("sup").alias("sup_b")
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    conf_ab = F.col("support").cast("double") / F.col("sup_a").cast("double")
    conf_ba = F.col("support").cast("double") / F.col("sup_b").cast("double")

    def conviction(conf, sup_other):
        return F.when(
            F.col("support") == sup_other_col(sup_other), F.lit(RULE_CONVICTION_CAP)
        ).otherwise(
            (F.lit(1.0) - F.col(sup_other).cast("double") / F.col("n").cast("double"))
            / (F.lit(1.0) - conf)
        )

    def sup_other_col(name):
        # conf == 1 ⇔ support == sup_a (integer test — no float pole probe)
        return F.col("sup_a") if name == "sup_b" else F.col("sup_b")

    return j.select(
        "part_a",
        "part_b",
        "support",
        F.round(conf_ab, 6).alias("conf_a_to_b"),
        F.round(conf_ba, 6).alias("conf_b_to_a"),
        F.round(conviction(conf_ab, "sup_b"), 6).alias("conviction_a_to_b"),
        F.round(conviction(conf_ba, "sup_a"), 6).alias("conviction_b_to_a"),
    ).orderBy("part_a", "part_b")


ASSOC_RULES_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM baskets
), sup AS (
  SELECT l_partkey, COUNT(*) AS sup FROM baskets GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {RULE_MIN_SUPPORT}
)
SELECT part_a, part_b, support,
       ROUND(CAST(support AS DOUBLE) / CAST(sa.sup AS DOUBLE), 6) AS conf_a_to_b,
       ROUND(CAST(support AS DOUBLE) / CAST(sb.sup AS DOUBLE), 6) AS conf_b_to_a,
       ROUND(CASE WHEN support = sa.sup THEN {RULE_CONVICTION_CAP}
                  ELSE (1.0 - CAST(sb.sup AS DOUBLE) / CAST(n AS DOUBLE))
                       / (1.0 - CAST(support AS DOUBLE) / CAST(sa.sup AS DOUBLE))
             END, 6) AS conviction_a_to_b,
       ROUND(CASE WHEN support = sb.sup THEN {RULE_CONVICTION_CAP}
                  ELSE (1.0 - CAST(sa.sup AS DOUBLE) / CAST(n AS DOUBLE))
                       / (1.0 - CAST(support AS DOUBLE) / CAST(sb.sup AS DOUBLE))
             END, 6) AS conviction_b_to_a
FROM pairs
JOIN sup sa ON pairs.part_a = sa.l_partkey
JOIN sup sb ON pairs.part_b = sb.l_partkey
CROSS JOIN nb
ORDER BY part_a, part_b
"""
