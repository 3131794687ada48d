"""Embedding operators: math invariants + the broadcast contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import embedding_ops
from cgtcalc_data_transformer_spark.plans import formatted_plan, has_broadcast_join

SF = "/root/testdata/sf0.001"


def test_normalize_invariants(spark):
    rows = embedding_ops.emb_normalize(spark, SF).collect()
    assert rows, "empty embeddings"
    for r in rows:
        assert r.dim == 64
        assert r.l2_norm > 0
        # |sum of unit components| <= sqrt(dim) (Cauchy-Schwarz)
        assert abs(r.unit_sum) <= 8.0 + 1e-6


def test_quantize_error_bound(spark):
    """floor(x/s + 0.5) rounds to nearest code: per-component error
    <= scale/2, so micro-MSE <= (scale/2)^2 * 1e6."""
    rows = embedding_ops.emb_quantize(spark, SF).collect()
    assert rows, "empty embeddings"
    for r in rows:
        assert r.scale > 0
        bound = (r.scale / 2) ** 2 * 1e6
        assert 0 <= r.mse_micro <= bound + 1e-6, (r.vec_id, r.mse_micro, bound)


def test_quantize_codes_in_range(spark):
    """Max |code| is exactly 127 by construction (symmetric scale)."""
    from cgtcalc_data_transformer_spark.operators.similarity import _as_double
    from cgtcalc_data_transformer_spark.sources.tpch import load_table

    emb = _as_double(load_table(spark, SF, "embeddings"))
    amax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    q = F.transform(F.col("v"), lambda x: F.floor(x / scale + F.lit(0.5)))
    out = emb.select(
        F.array_max(F.transform(q, lambda c: F.abs(c))).alias("max_abs_code")
    )
    mx = out.agg(F.max("max_abs_code")).collect()[0][0]
    assert mx == 127


def test_centroid_broadcasts_and_disperses(spark):
    df = embedding_ops.emb_centroid_stats(spark, SF)
    assert has_broadcast_join(df)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert len(rows) == 10
    for r in rows:
        assert r.n_vecs > 0
        assert 0 <= r.avg_dist <= r.max_dist
