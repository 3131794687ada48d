"""PageRank: invariants a rank vector must satisfy, independent of
the DuckDB hash oracle (which pins exact values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators.graph import (
    PR_TOP_K,
    _edges,
    pagerank_suppliers,
)

SF = "/root/testdata/sf0.001"


def test_pagerank_topk_shape_and_order(spark):
    rows = pagerank_suppliers(spark, SF).collect()
    # sf0.001 has fewer suppliers than PR_TOP_K; the limit caps, never pads
    assert 0 < len(rows) <= PR_TOP_K
    assert all(r["node"].startswith("S") for r in rows)
    ranks = [r["pagerank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)


def test_pagerank_follows_degree_signal(spark):
    """With a uniform prior and one iteration dominated by in-degree,
    the top-ranked supplier must be among the highest-degree ones —
    a sanity link between graph structure and the rank output."""
    edges = _edges(spark, SF)
    sup_deg = (
        edges.filter(F.col("src").startswith("S"))
        .groupBy("src")
        .count()
        .orderBy(F.desc("count"), F.asc("src"))
        .limit(PR_TOP_K)
        .collect()
    )
    top_by_degree = {r["src"] for r in sup_deg}
    top_ranked = pagerank_suppliers(spark, SF).collect()[0]["node"]
    assert top_ranked in top_by_degree
