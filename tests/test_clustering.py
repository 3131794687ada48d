"""k-means invariants independent of the DuckDB value oracle
(tools/check_oracle.py pins exact centroids/counts at sf0.01)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators.clustering import (
    KMEANS_K,
    _assign,
    _init_centroids,
    _update,
    kmeans_embeddings,
)
from cgtcalc_data_transformer_spark.operators.similarity import _as_double
from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


def test_kmeans_output_shape(spark):
    rows = kmeans_embeddings(spark, SF).collect()
    assert len(rows) == KMEANS_K
    assert [r["cell"] for r in rows] == list(range(KMEANS_K))
    # centroid renders as a 64-component %.6f CSV string (scalar-only
    # output contract: driver canon crashes on array cells)
    assert all(len(r["centroid_csv"].split(",")) == 64 for r in rows)
    n = load_table(spark, SF, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n


def test_kmeans_update_moves_centroids_toward_members(spark):
    """One Lloyd update strictly reduces (or keeps) total quantized
    within-cluster distance — the monotone-improvement invariant."""
    emb = _as_double(load_table(spark, SF, "embeddings")).select("vec_id", "v")
    c0 = _init_centroids()
    c1 = _update(_assign(emb, c0), c0)

    def wcss(cents):
        a = _assign(emb, cents)
        vecs = {r["vec_id"]: (r["v"], r["cell"]) for r in a.collect()}
        return sum(
            sum((x - c) ** 2 for x, c in zip(v, cents[cell]))
            for v, cell in vecs.values()
        )

    assert wcss(c1) <= wcss(c0) + 1e-6


def test_kmeans_assignment_is_nearest(spark):
    """Every vector's assigned cell is its true argmin centroid
    (checked in python at full precision up to the 1e-6 quantizer)."""
    emb = _as_double(load_table(spark, SF, "embeddings")).select("vec_id", "v")
    cents = _init_centroids()
    for r in _assign(emb, cents).limit(50).collect():
        d2s = [
            sum((x - c) ** 2 for x, c in zip(r["v"], cent)) for cent in cents
        ]
        best = min(d2s)
        assert math.isclose(d2s[r["cell"]], best, abs_tol=2e-6)
