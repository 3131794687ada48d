"""Curation operators: semantics + the plan shapes that make them
survive corpus scale (equality joins only, deterministic membership)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import curation
from cgtcalc_data_transformer_spark.plans import formatted_plan

SF = "/root/testdata/sf0.001"


def test_normalize_idempotent(spark):
    """Normalizing an already-normal text is the identity — required
    for the write-once-normalize-on-ingest pattern."""
    out = curation.text_normalize(spark, SF)
    renorm = out.select(
        "doc_id",
        "norm_text",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("norm_text")), "[^a-z0-9]+", " "),
                " +",
                " ",
            )
        ).alias("again"),
    )
    assert renorm.filter(F.col("again") != F.col("norm_text")).count() == 0


def test_normalize_char_accounting(spark):
    rows = curation.text_normalize(spark, SF).collect()
    assert rows, "empty corpus"
    for r in rows:
        assert r.norm_chars == len(r.norm_text)
        assert r.chars_removed == r.orig_chars - r.norm_chars
        assert "  " not in r.norm_text


def test_mix_deterministic_and_bounded(spark):
    a = {r.source: r for r in curation.mix_sources(spark, SF).collect()}
    b = {r.source: r for r in curation.mix_sources(spark, SF).collect()}
    assert a.keys() == b.keys()
    for src, r in a.items():
        assert (r.kept, r.total) == (b[src].kept, b[src].total), src
        assert 0 <= r.kept <= r.total
        assert r.target_fraction in {1.0, 0.5, 0.25, 0.1}


def test_contamination_no_cartesian(spark):
    """The benchmark overlap must be an equality join on the shingle —
    a nested-loop/cartesian here would be quadratic in corpus size."""
    plan = formatted_plan(curation.contamination_check(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_contamination_ratio_bounds(spark):
    for r in curation.contamination_check(spark, SF).collect():
        assert 0 < r.n_overlap <= r.n_sh
        assert 0.0 < r.overlap_ratio <= 1.0
        assert r.contaminated == (r.overlap_ratio >= curation.CONTAM_THRESHOLD)


def test_boilerplate_ratio_bounds(spark):
    rows = curation.boilerplate_score(spark, SF).collect()
    assert rows, "empty corpus"
    assert any(r.n_common > 0 for r in rows), "no common shingles found"
    for r in rows:
        assert 0 <= r.n_common <= r.n_sh
        assert 0.0 <= r.boilerplate_ratio <= 1.0


def test_pii_redact_injected_docs_flagged(spark):
    rows = curation.pii_redact(spark, SF).collect()
    for r in rows:
        if r.doc_id % curation.PII_INJECT_MOD == 0:
            assert r.had_pii and r.n_emails >= 1 and r.n_phones >= 1, r.doc_id
            assert "<EMAIL>" in r.clean_text and "<PHONE>" in r.clean_text
        else:
            assert not r.had_pii, r.doc_id
        assert "@" not in r.clean_text


def test_pack_batches_budget_respected(spark):
    """A doc's batch is where its first token lands: within each
    source, batch_ids are non-decreasing and every batch except
    possibly the last STARTS under budget."""
    rows = curation.pack_batches(spark, SF).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r.doc_id)
        cum = 0
        for d in docs:
            assert d.batch_id == cum // curation.PACK_BUDGET, (src, d.doc_id)
            cum += d.n_tokens
        assert [d.batch_id for d in docs] == sorted(d.batch_id for d in docs)


def test_dsir_selects_target_like_docs(spark):
    """DSIR invariants: exactly K rows, ranked by non-increasing
    importance weight, and the TARGET source is over-represented in
    the admitted set relative to its corpus share (the whole point of
    importance resampling toward a target domain)."""
    from cgtcalc_data_transformer_spark.sources.tpch import load_table

    rows = curation.dsir_importance_resample(spark, SF).collect()
    assert len(rows) == curation.DSIR_KEEP
    weights = [r.log_weight for r in rows]
    assert weights == sorted(weights, reverse=True)
    docs = load_table(spark, SF, "documents")
    n_total = docs.count()
    n_target = docs.filter(F.col("source") == curation.DSIR_TARGET_SOURCE).count()
    sel_target = sum(1 for r in rows if r.source == curation.DSIR_TARGET_SOURCE)
    assert sel_target / len(rows) > n_target / n_total
    # broadcast λ-table join: the corpus-sized side must not shuffle
    # for the join (one equality shuffle for the groupBy is expected)
    plan = formatted_plan(curation.dsir_importance_resample(spark, SF))
    assert "BroadcastHashJoin" in plan
