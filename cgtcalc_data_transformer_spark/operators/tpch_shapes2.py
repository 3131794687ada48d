"""Third wave of TPC-H query shapes: q2/q9/q11/q16/q17/q20/q21.

These exercise the decorrelation paths the earlier set does not
(VERDICT r1 #8): correlated scalar aggregates (q2, q17), scalar
subquery in HAVING (q11), NOT IN with a subquery (q16), nested
correlated aggregates behind a semi-join (q20), and the double
correlated EXISTS / NOT EXISTS (q21).

The driver's synthetic schema has no ``partsupp`` table, so the
part↔supplier relationships that TPC-H routes through it are derived
from the DISTINCT (l_partkey, l_suppkey) pairs of ``lineitem`` — the
same join *shapes* on the available tables. Every query is expressed
DECORRELATED by construction (group-aggregate then equality join —
what Catalyst rewrites correlated subqueries into), with dimension
sides broadcast-hinted. All money aggregation is exact-decimal first,
double at the boundary, so results are partition-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table


from cgtcalc_data_transformer_spark.functions.money import dec as _dec


def _part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp stand-in: DISTINCT (l_partkey, l_suppkey)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey"), F.col("l_suppkey"))
        .distinct()
    )


# --------------------------------------------------------------- Q2
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (`SELECT ... WHERE x = (SELECT min(..) ... correlated)`):
    for each LARGE part of size 10-20, the EUROPEAN supplier with the
    MINIMUM account balance among those who ship it.

    Decorrelated: per-part min via groupBy, equality-joined back —
    one shuffle on partkey. Broadcast hints only on the fixture-sized
    region→nation chain; the filtered part and the supplier side
    scale with SF, so AQE picks their strategy.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    euro_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load_table(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        _part_suppliers(spark, sf_dir)
        .join(part.select("p_partkey", "p_type", "p_size"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(euro_supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    min_bal = cand.groupBy(F.col("p_partkey").alias("mb_partkey")).agg(
        F.min("s_acctbal").alias("min_acctbal")
    )
    return (
        cand.join(
            min_bal,
            (F.col("p_partkey") == F.col("mb_partkey"))
            & (F.col("s_acctbal") == F.col("min_acctbal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "p_size")
        .orderBy(F.asc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), es AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), cand AS (
  SELECT p_partkey, p_type, p_size, s_acctbal, s_name, n_name
  FROM ps
  JOIN part ON l_partkey = p_partkey
  JOIN es ON l_suppkey = s_suppkey
  WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, p_size
FROM cand c
WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2
                   WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal ASC, s_name, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------- Q9
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: revenue on name-matched parts, grouped by the
    SUPPLIER's nation and order year — a 5-way join where only
    lineitem⋈orders is big⋈big (shuffles on orderkey). Only the
    fixture-sized nation table carries a broadcast HINT; part and
    supplier scale with SF, so their strategy is left to AQE, which
    broadcasts them at small scale and switches to shuffle join when
    they outgrow the threshold (a hard hint would force an OOM
    broadcast at 100×)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    amount = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------- Q11
Q11_FRACTION = 0.001


def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (scalar subquery in HAVING): per-part shipped value
    from NATION_7's suppliers, keeping parts whose value exceeds
    FRACTION x the nation's total. The global total is a one-row
    aggregate broadcast into the filter (cross-join of a scalar) —
    no recomputation per group."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    value = _dec(F.col("l_extendedprice") * F.col("l_quantity"))
    # supp (one nation's suppliers) scales with SF — AQE decides
    national = li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    per_part = national.groupBy("l_partkey").agg(
        F.sum(value).cast("double").alias("part_value")
    )
    total = national.agg(
        (F.sum(value).cast("double") * F.lit(Q11_FRACTION)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = f"""
WITH national AS (
  SELECT l_partkey, CAST(l_extendedprice * l_quantity AS DECIMAL(28,6)) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS part_value
FROM national
GROUP BY l_partkey
HAVING CAST(SUM(v) AS DOUBLE) >
       (SELECT CAST(SUM(v) AS DOUBLE) * {Q11_FRACTION} FROM national)
ORDER BY part_value DESC, l_partkey
"""


# --------------------------------------------------------------- Q16
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (NOT IN subquery + distinct agg): distinct supplier
    count per (brand, type, size) over selected sizes, excluding
    Brand#9 and excluding "complaint" suppliers (negative balance
    stands in for the comment-text filter). NOT IN a subquery is an
    anti-join in the plan; the excluded-supplier set and the filtered
    part both scale with SF, so no hard hints — AQE broadcasts them
    while they fit."""
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        _part_suppliers(spark, sf_dir)
        .join(excluded, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            part.select("p_partkey", "p_brand", "p_type", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------- Q17
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape (correlated scalar AVG): revenue from Brand#13
    lineitems whose quantity is below half the part's average
    quantity. Decorrelated: per-part avg once (sum/count in double,
    identical op order to the oracle), equality-join, filter — vs the
    naive per-row subquery that recomputes the aggregate. No
    broadcast hints: the brand-filtered part and the per-part avg
    both scale with SF, so join strategy is AQE's call (broadcast at
    small scale, shuffle beyond the threshold)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    brand_li = li.join(
        part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = brand_li.groupBy(F.col("l_partkey").alias("aq_partkey")).agg(
        (
            F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        brand_li.join(avg_qty, F.col("l_partkey") == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0), 6
            ).alias("avg_yearly")
        )
    )


Q17_SQL = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
), aq AS (
  SELECT l_partkey AS aq_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM brand_li GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM brand_li JOIN aq ON l_partkey = aq_partkey
WHERE l_quantity < 0.5 * avg_qty
"""


# --------------------------------------------------------------- Q20
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (nested correlated aggregate behind a semi-join):
    suppliers who shipped more than 30% of the 1996 volume of some
    'bolt' part. Inner aggregates decorrelate to two groupBys joined
    on partkey; the supplier list is then a LEFT SEMI join — the
    whole correlated-NOT-EXISTS tower becomes three shuffles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    # bolt_parts scales with SF — no broadcast hint, AQE decides
    bolt_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("bolt")
    ).select("p_partkey")
    li96 = li.join(bolt_parts, F.col("l_partkey") == F.col("p_partkey"))
    per_part = li96.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(_dec(F.col("l_quantity"))).cast("double").alias("total_qty")
    )
    per_supp_part = li96.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec(F.col("l_quantity"))).cast("double").alias("supp_qty")
    )
    excess = (
        per_supp_part.join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("supp_qty") > 0.3 * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name", "s_suppkey")
    )


Q20_SQL = """
WITH li96 AS (
  SELECT l_suppkey, l_partkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%bolt%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
), per_part AS (
  SELECT l_partkey AS t_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
  FROM li96 GROUP BY l_partkey
), excess AS (
  SELECT DISTINCT l_suppkey
  FROM (SELECT l_suppkey, l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS supp_qty
        FROM li96 GROUP BY l_suppkey, l_partkey) sp
  JOIN per_part ON l_partkey = t_partkey
  WHERE supp_qty > 0.3 * total_qty
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM excess)
ORDER BY s_name, s_suppkey
"""


# --------------------------------------------------------------- Q21
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (correlated EXISTS + NOT EXISTS on the same table):
    per supplier, count 'F' orders where THIS supplier shipped late
    (>60 days after the order date), at least one OTHER supplier was
    on the order (EXISTS → left-semi with a non-equal suppkey
    predicate), and NO other supplier shipped late (NOT EXISTS →
    left-anti, same shape). Both probes shuffle on orderkey — the
    correlation key — so the three scans co-partition."""
    # Decorrelated AGGREGATION form, not self-joins: both probes
    # correlate only on l_orderkey, so per order the whole predicate
    # collapses to counters — EXISTS(other supplier) ⇔ n_supp > 1,
    # NOT EXISTS(other late supplier) ⇔ the late-supplier set is
    # exactly {this supplier} ⇔ n_late_supp == 1, and the COUNT(*)
    # over l1 rows is that supplier's late-line count. One
    # (orderkey, suppkey) aggregation + one orderkey aggregation
    # replace two lineitem⋈lineitem shuffle joins and a repeated
    # lineitem⋈orders build — at 100 TB that is one exchange of
    # per-supplier-per-order rows instead of three fact-sized ones.
    li = load_table(spark, sf_dir, "lineitem")
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")

    per_supp = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.cast("int").alias("is_late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max("is_late").alias("supp_late"),
            F.sum("is_late").alias("late_lines"),
        )
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
        F.max(F.when(F.col("supp_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
        F.sum(F.when(F.col("supp_late") == 1, F.col("late_lines"))).alias(
            "n_late_lines"
        ),
    )
    qual = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qual.join(supp, F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH l1 AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND o3.o_orderstatus = 'F'
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# --------------------------------------------------------------- Q8
Q8_NATION = "NATION_3"
Q8_REGION = "EUROPE"
Q8_PTYPE = "STANDARD"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (national market share): NATION_3 suppliers' share of
    STANDARD-part volume sold into EUROPE customers' 1996-97 orders.

    Seven-way join where the only big⋈big edge is lineitem⋈orders
    (shuffles on orderkey). Broadcast hints only on the fixture-sized
    nation⋈region chain; part, supplier⋈nation and customer scale
    with SF and are left to AQE. The share is a conditional-sum over
    total-sum on the SAME aggregated rows — one aggregation, no
    second pass. Decimal sums, double at the boundary.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_PTYPE)
    supp = load_table(spark, sf_dir, "supplier")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    eur_nations = n1.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nkey"))
    volume = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    nat_volume = F.when(F.col("supp_nation") == Q8_NATION, volume).otherwise(
        F.lit(0).cast("decimal(28,6)")
    )
    return (
        li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            supp.select("s_suppkey", "s_nationkey").join(
                n2, F.col("s_nationkey") == F.col("s_nkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(eur_nations), F.col("c_nationkey") == F.col("c_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(nat_volume).cast("double") / F.sum(volume).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       ROUND(
         CAST(SUM(CASE WHEN n2.n_name = '{Q8_NATION}'
                       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
                       ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
WHERE p_type = '{Q8_PTYPE}'
  AND r_name = '{Q8_REGION}'
  AND EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
GROUP BY EXTRACT(YEAR FROM o_orderdate)
ORDER BY o_year
"""


# --------------------------------------------------------------- Q13
Q13_EXCLUDED_PRIORITY = "1-URGENT"


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (customer order-count distribution): LEFT OUTER join
    with a predicate INSIDE the join condition (customers keep their
    row even when every order is filtered away — the classic
    outer-join-with-ON-filter trap), then a two-level aggregation:
    orders per customer, customers per order-count.

    The synthetic schema has no o_comment, so the ON-clause filter
    excludes a priority class instead (same plan shape:
    reference TPC-H Q13 `not like '%special%requests%'`).
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ------------------------------------------------- SQL-frontend twin
def sql_frontend_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Q13 oracle SQL executed VERBATIM through ``spark.sql`` —
    one dialect-neutral SQL text is the single source of truth for
    both engines (Spark SQL front end here, DuckDB as the oracle).
    Demonstrates that the engine's SQL surface is first-class: same
    Catalyst plan as the DataFrame formulation (left outer join with
    ON-predicate, two-level aggregation), arrived at from SQL.
    """
    from cgtcalc_data_transformer_spark.sources.tpch import load_table

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(Q13_SQL)
