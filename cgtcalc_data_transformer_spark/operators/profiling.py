"""Data-profiling / schema-discovery operators: foreign-key
containment, functional-dependency audit, join-cardinality estimation
audit, and candidate-key discovery.

These are the queries a catalog/discovery service runs over a fresh
100 TB lake to recover the relational structure nobody documented:
which columns reference which tables, which columns determine which,
which columns are keys, and how well the optimizer's cardinality
model would predict real join sizes.

Scale shape: every audit is DISTINCT-aggregations plus (for
containment) distinct-key semi joins — the canonical
map-side-combinable shapes; nothing is driver-side, nothing is
quadratic. Candidate lists are fixed literals (the discovery-service
pattern: a profiler enumerates candidates from the schema, the engine
evaluates each as one distributed pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

# (label, child_table, child_col, parent_table, parent_col)
FK_CANDIDATES = [
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    # deliberate NON-key: order keys mostly exceed the customer domain
    ("orders.o_orderkey->customer.c_custkey", "orders", "o_orderkey",
     "customer", "c_custkey"),
]


def fk_containment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key discovery by value containment: for each candidate
    (child column -> parent column), what fraction of DISTINCT child
    values exists in the parent — containment 1.0 flags a real FK,
    the deliberate negative candidate stays far below.

    Per candidate: one distinct-aggregate on the child (map-side
    combinable), one LEFT SEMI join of those distinct keys against
    the parent — the sizes are key-domain-bounded, never row-counts.
    """
    out = None
    for label, ct, cc, pt, pc in FK_CANDIDATES:
        # CACHED (r14 plan audit): the semi-join branch and the
        # d_child count both read the distinct child keys — uncached,
        # every candidate scanned+deduped its child table twice (10
        # scans across the 5 candidates,
        # plans/r14/fk_containment_audit_before.txt). Key-domain
        # bounded (guide §2.4).
        child = (
            load_table(spark, sf_dir, ct)
            .select(F.col(cc).alias("k"))
            .distinct()
            .cache()
        )
        parent = load_table(spark, sf_dir, pt).select(
            F.col(pc).alias("k")
        )
        matched = child.join(parent, "k", "left_semi")
        row = child.agg(F.count(F.lit(1)).alias("d_child")).crossJoin(
            matched.agg(F.count(F.lit(1)).alias("d_matched"))
        ).select(
            F.lit(label).alias("candidate"),
            "d_child",
            "d_matched",
            F.round(
                F.col("d_matched").cast("double")
                / F.col("d_child").cast("double"),
                6,
            ).alias("containment"),
            (F.col("d_matched") == F.col("d_child")).alias("is_fk"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("candidate")


FK_CONTAINMENT_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{label}' AS candidate,
       (SELECT COUNT(DISTINCT {cc}) FROM {ct}) AS d_child,
       (SELECT COUNT(*) FROM (SELECT DISTINCT {cc} AS k FROM {ct}) c
        WHERE k IN (SELECT {pc} FROM {pt})) AS d_matched,
       ROUND(CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {cc} AS k FROM {ct}) c
                   WHERE k IN (SELECT {pc} FROM {pt})) AS DOUBLE)
             / (SELECT COUNT(DISTINCT {cc}) FROM {ct}), 6) AS containment,
       (SELECT COUNT(*) FROM (SELECT DISTINCT {cc} AS k FROM {ct}) c
        WHERE k IN (SELECT {pc} FROM {pt}))
       = (SELECT COUNT(DISTINCT {cc}) FROM {ct}) AS is_fk
""".strip()
    for label, ct, cc, pt, pc in FK_CANDIDATES
) + "\nORDER BY candidate"


# (label, table, lhs expression, rhs expression) — expressions must be
# spelled identically in Spark and the SQL twin
FD_CANDIDATES = [
    ("orders: o_orderkey -> o_custkey", "orders", "o_orderkey", "o_custkey"),
    ("nation: n_nationkey -> n_regionkey", "nation", "n_nationkey",
     "n_regionkey"),
    ("part: p_brand -> p_type", "part", "p_brand", "p_type"),
    ("lineitem: l_orderkey -> l_returnflag", "lineitem", "l_orderkey",
     "l_returnflag"),
    ("customer: c_nationkey -> c_mktsegment", "customer", "c_nationkey",
     "c_mktsegment"),
]


def fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery: does LHS determine RHS —
    |distinct(LHS)| == |distinct(LHS, RHS)|. Finds the real
    dependencies (order -> customer, nation -> region) and rejects
    the non-dependencies, giving a normalizer/optimizer the ground
    truth it needs for decomposition and join elimination.

    Two distinct-aggregations per candidate, both map-side
    combinable; no joins at all.
    """
    out = None
    for label, t, lhs, rhs in FD_CANDIDATES:
        df = load_table(spark, sf_dir, t)
        row = (
            df.select(F.col(lhs).alias("a"), F.col(rhs).alias("b"))
            .agg(
                F.countDistinct("a").alias("n_lhs"),
                F.countDistinct("a", "b").alias("n_pairs"),
            )
            .select(
                F.lit(label).alias("candidate"),
                "n_lhs",
                "n_pairs",
                (F.col("n_lhs") == F.col("n_pairs")).alias("holds"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("candidate")


FD_AUDIT_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{label}' AS candidate,
       COUNT(DISTINCT {lhs}) AS n_lhs,
       COUNT(DISTINCT ({lhs}, {rhs})) AS n_pairs,
       COUNT(DISTINCT {lhs}) = COUNT(DISTINCT ({lhs}, {rhs})) AS holds
FROM {t}
""".strip()
    for label, t, lhs, rhs in FD_CANDIDATES
) + "\nORDER BY candidate"


JOIN_CARD_CANDIDATES = [
    ("lineitem x orders on orderkey", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("orders x customer on custkey", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem x part on partkey", "lineitem", "l_partkey",
     "part", "p_partkey"),
]


def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit: the textbook estimator
    |A ⋈ B| ≈ |A|·|B| / max(d_A, d_B) versus the ACTUAL join count,
    per candidate key — the calibration loop for any cost-based
    optimizer's join model (ratio 1.0 = uniform keys; drift flags
    skew the estimator can't see).

    Per candidate: one stats aggregation per side + the real join
    count (a key-shuffle count — the thing being modeled, measured
    once).
    """
    out = None
    for label, ta, ca, tb, cb in JOIN_CARD_CANDIDATES:
        a = load_table(spark, sf_dir, ta).select(F.col(ca).alias("k"))
        b = load_table(spark, sf_dir, tb).select(F.col(cb).alias("k"))
        sa = a.agg(
            F.count(F.lit(1)).alias("n_a"),
            F.countDistinct("k").alias("d_a"),
        )
        sb = b.agg(
            F.count(F.lit(1)).alias("n_b"),
            F.countDistinct("k").alias("d_b"),
        )
        actual = a.join(b, "k").agg(F.count(F.lit(1)).alias("actual"))
        est = (
            F.col("n_a").cast("double")
            * F.col("n_b").cast("double")
            / F.greatest(F.col("d_a"), F.col("d_b")).cast("double")
        )
        row = sa.crossJoin(sb).crossJoin(actual).select(
            F.lit(label).alias("candidate"),
            "n_a",
            "n_b",
            "actual",
            F.round(est, 6).alias("estimated"),
            F.round(F.col("actual").cast("double") / est, 6).alias(
                "actual_over_est"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("candidate")


JOIN_CARD_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{label}' AS candidate,
       (SELECT COUNT(*) FROM {ta}) AS n_a,
       (SELECT COUNT(*) FROM {tb}) AS n_b,
       (SELECT COUNT(*) FROM {ta} JOIN {tb} ON {ca} = {cb}) AS actual,
       ROUND(CAST((SELECT COUNT(*) FROM {ta}) AS DOUBLE)
             * (SELECT COUNT(*) FROM {tb})
             / GREATEST((SELECT COUNT(DISTINCT {ca}) FROM {ta}),
                        (SELECT COUNT(DISTINCT {cb}) FROM {tb})), 6) AS estimated,
       ROUND((SELECT COUNT(*) FROM {ta} JOIN {tb} ON {ca} = {cb})
             / (CAST((SELECT COUNT(*) FROM {ta}) AS DOUBLE)
                * (SELECT COUNT(*) FROM {tb})
                / GREATEST((SELECT COUNT(DISTINCT {ca}) FROM {ta}),
                           (SELECT COUNT(DISTINCT {cb}) FROM {tb}))), 6) AS actual_over_est
""".strip()
    for label, ta, ca, tb, cb in JOIN_CARD_CANDIDATES
) + "\nORDER BY candidate"


KEY_AUDIT_COLUMNS = ["o_orderkey", "o_custkey", "o_orderdate",
                     "o_orderpriority"]


def candidate_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery on orders: per column, distinct count
    vs row count — is_unique flags the real key (o_orderkey), and
    avg_multiplicity sizes the fan-out of everything else (the number
    a partitioner or index designer reads first).

    One pass per column (count + distinct-count, map-side
    combinable); output is |columns| rows.
    """
    df = load_table(spark, sf_dir, "orders")
    out = None
    for c in KEY_AUDIT_COLUMNS:
        row = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(c).alias("n_distinct"),
        ).select(
            F.lit(c).alias("column"),
            "n_rows",
            "n_distinct",
            (F.col("n_distinct") == F.col("n_rows")).alias("is_unique"),
            F.round(
                F.col("n_rows").cast("double")
                / F.col("n_distinct").cast("double"),
                6,
            ).alias("avg_multiplicity"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("column")


CANDIDATE_KEY_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{c}' AS "column",
       COUNT(*) AS n_rows,
       COUNT(DISTINCT {c}) AS n_distinct,
       COUNT(DISTINCT {c}) = COUNT(*) AS is_unique,
       ROUND(COUNT(*) / CAST(COUNT(DISTINCT {c}) AS DOUBLE), 6) AS avg_multiplicity
FROM orders
""".strip()
    for c in KEY_AUDIT_COLUMNS
) + '\nORDER BY "column"'
