"""Sparse TF-IDF doc-doc similarity: structural invariants (the
DuckDB oracle pins exact values; these pin the semantics)."""

from __future__ import annotations

from cgtcalc_data_transformer_spark.operators.textops import (
    DOC_SIM_TOP_K,
    doc_similarity_tfidf,
)

SF = "/root/testdata/sf0.001"


def test_doc_similarity_pairs_ranked(spark):
    rows = doc_similarity_tfidf(spark, SF).collect()
    assert 0 < len(rows) <= DOC_SIM_TOP_K
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)
    # cosine of nonnegative tf-idf vectors is in [0, 1]
    assert all(0.0 <= c <= 1.0 + 1e-9 for c in cosines)
    # canonical pair orientation, no self-pairs
    assert all(r["doc_a"] < r["doc_b"] for r in rows)
