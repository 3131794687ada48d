"""PCA invariants independent of the DuckDB value oracle."""

from __future__ import annotations

import math

from cgtcalc_data_transformer_spark.operators.pca import PCA_DIM, emb_pca_power

SF = "/root/testdata/sf0.001"


def test_pca_shape_and_unit_norm(spark):
    rows = emb_pca_power(spark, SF).collect()
    assert len(rows) == PCA_DIM
    assert [r["dim_idx"] for r in rows] == list(range(PCA_DIM))
    norm = math.sqrt(sum(r["pc1_weight"] ** 2 for r in rows))
    assert math.isclose(norm, 1.0, abs_tol=1e-3)  # 1e-6 quantized weights
    assert all(r["variance"] >= 0 for r in rows)


def test_pca_rayleigh_quotient_monotone_from_start_axis(spark):
    """Power iteration's Rayleigh quotient is non-decreasing on a PSD
    matrix, so vᵀΣv after the iterations must be >= the quotient of
    the e1 start vector, i.e. the variance of dimension 0 (up to
    quantization slack)."""
    rows = emb_pca_power(spark, SF).collect()
    captured = rows[0]["pc1_score_var"]
    assert captured >= rows[0]["variance"] - 1e-3
    assert captured >= 0
