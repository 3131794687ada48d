"""Skyline / Pareto-frontier operator (preference queries).

``pareto_frontier`` computes the 2-D skyline of the ``part`` table —
minimize ``p_retailprice``, maximize ``p_size`` — the classic
"cheapest for its quality" preference query (Börzsönyi et al., "The
Skyline Operator", ICDE 2001). A point survives iff no other point is
at most as expensive AND at least as large, with strict advantage in
one dimension.

No reference analog (the reference is a parse-merge-sort CLI,
``/root/reference/index.js``); this extends SURVEY.md §2.2 with a new
operator family the naive formulation of which is O(n²).

100 TB shape — the textbook NOT-EXISTS dominance self-join is a
quadratic theta join, so the plan is the distributed sort-sweep
rewrite with NO global sort and NO pairwise join on the data side:

1. collapse to one candidate per distinct price (groupBy price →
   max size; within a price, anything below the max is dominated) —
   one map-side-combining shuffle, the only corpus-sized exchange;
2. intra-band sweep: partition prices into fixed-width bands; inside
   each band a window ordered by price keeps a point only if its size
   strictly exceeds the running max of all cheaper points — the
   partition spec is the band, so no single-task global window;
3. cross-band prune: per-band max sizes form a bounded table (one row
   per occupied band of the VALUE DOMAIN, independent of row count);
   its prefix-max is computed by a broadcast self-join and each
   candidate must strictly beat the cumulative max of all cheaper
   bands. The only non-equi join in the plan runs on this bounded
   band table, never on the data.

The DuckDB oracle runs the naive NOT-EXISTS dominance predicate —
proving the banded sweep changes the plan, not the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

BAND_WIDTH = 100.0  # price units per band; bounded by the price domain


def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of (min p_retailprice, max p_size) with per-point part
    count and representative key."""
    part = load_table(spark, sf_dir, "part")
    g = part.groupBy(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("rep_partkey"),
    )
    # one candidate per distinct price: the max-size point (same-price
    # smaller sizes are dominated outright)
    per_price = Window.partitionBy("price").orderBy(F.desc("size"))
    cand = (
        g.withColumn("rn", F.row_number().over(per_price))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumn("band", F.floor(F.col("price") / BAND_WIDTH))
    )
    # intra-band sweep: strictly beat every cheaper point in the band
    sweep = (
        Window.partitionBy("band")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = cand.withColumn("prev_in_band", F.max("size").over(sweep))
    # cross-band prefix max over the bounded band table
    band_max = cand.groupBy("band").agg(F.max("size").alias("band_best"))
    prev_bands = (
        band_max.alias("a")
        .join(
            F.broadcast(band_max.alias("b")),
            F.col("b.band") < F.col("a.band"),
            "left",
        )
        .groupBy(F.col("a.band").alias("band"))
        .agg(F.max("b.band_best").alias("prev_band_max"))
    )
    out = (
        cand.join(F.broadcast(prev_bands), "band")
        .filter(
            (
                F.col("prev_in_band").isNull()
                | (F.col("size") > F.col("prev_in_band"))
            )
            & (
                F.col("prev_band_max").isNull()
                | (F.col("size") > F.col("prev_band_max"))
            )
        )
        .select("price", "size", "n_parts", "rep_partkey")
        .orderBy("price")
    )
    return out


PARETO_SQL = """
WITH g AS (
  SELECT p_retailprice AS price, p_size AS size,
         COUNT(*) AS n_parts, MIN(p_partkey) AS rep_partkey
  FROM part
  GROUP BY 1, 2
)
SELECT price, size, n_parts, rep_partkey
FROM g p
WHERE NOT EXISTS (
  SELECT 1 FROM g q
  WHERE q.price <= p.price AND q.size >= p.size
    AND (q.price < p.price OR q.size > p.size)
)
ORDER BY price
"""
