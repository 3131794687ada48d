"""Corpus LM signals + composed curation gate: structural invariants
(the DuckDB oracles pin exact values)."""

from __future__ import annotations

from cgtcalc_data_transformer_spark.operators.corpus_lm import (
    VOCAB_TOP_K,
    text_perplexity_bigram,
    vocab_topk,
)
from cgtcalc_data_transformer_spark.operators.curation import (
    CURATE_LANG,
    CURATE_MIN_QUALITY,
    curate_corpus,
)

SF = "/root/testdata/sf0.001"


def test_perplexity_bounds(spark):
    rows = text_perplexity_bigram(spark, SF).collect()
    assert rows, "every sf0.001 doc has >= 2 tokens"
    # a bigram seen c12 times out of c1 contexts has P <= 1, so
    # ppl >= 1; and ppl can't exceed the distinct-context count
    assert all(r["ppl"] >= 1.0 for r in rows)
    assert all(r["n_bigrams"] >= 1 for r in rows)


def test_vocab_topk_ordered(spark):
    rows = vocab_topk(spark, SF).collect()
    assert 0 < len(rows) <= VOCAB_TOP_K
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert len({r["piece"] for r in rows}) == len(rows)


def test_curate_gate_filters(spark):
    rows = curate_corpus(spark, SF).collect()
    assert rows, "gate should admit some documents"
    assert all(r["quality_score"] >= CURATE_MIN_QUALITY for r in rows)
    assert all(r["pred_lang"] == CURATE_LANG for r in rows)
    ids = [r["doc_id"] for r in rows]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
