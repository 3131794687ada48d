"""Invariants for feature hashing / CMS / inverted-index search
(tools/check_oracle.py pins exact values against DuckDB at sf0.01)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators.dedup import tokens_col
from cgtcalc_data_transformer_spark.operators.featurize import (
    CMS_TOP_N,
    HASH_DIM,
    cms_heavy_hitters,
    text_hashing_tf,
)
from cgtcalc_data_transformer_spark.operators.search import (
    QUERY_TERMS,
    SEARCH_TOP_K,
    text_search_and,
)
from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


def test_hashing_tf_slots_bounded_and_weights_conserve(spark):
    rows = text_hashing_tf(spark, SF).collect()
    assert rows, "corpus produced no features"
    assert all(0 <= r["slot"] < HASH_DIM for r in rows)
    assert all(r["weight"] != 0 for r in rows)
    # |sum of signed weights per doc| <= token count (signs conserve mass)
    tok_counts = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF, "documents")
        .select("doc_id", F.size(tokens_col(F.col("text"))).alias("n"))
        .collect()
    }
    per_doc: dict[int, int] = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + abs(r["weight"])
    for doc, total in per_doc.items():
        assert total <= tok_counts[doc]


def test_cms_estimates_never_undercount(spark):
    rows = cms_heavy_hitters(spark, SF).collect()
    assert 0 < len(rows) <= CMS_TOP_N
    for r in rows:
        assert r["overestimate_ok"] is True
        assert r["cms_est"] >= r["exact_cnt"]


def test_search_hits_contain_all_terms(spark):
    rows = text_search_and(spark, SF).collect()
    assert len(rows) <= SEARCH_TOP_K
    texts = {
        r["doc_id"]: r["text"].lower()
        for r in load_table(spark, SF, "documents").collect()
    }
    for r in rows:
        for t in QUERY_TERMS:
            assert t in texts[r["doc_id"]]
    # ranking is tf-sum desc
    tfs = [r["tf_sum"] for r in rows]
    assert tfs == sorted(tfs, reverse=True)
