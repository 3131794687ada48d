"""Training-set prep operators: split determinism, repetition
diagnostics, length-bound filtering, sequence construction — plus the
plan shapes that keep them linear at corpus scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import mlprep
from cgtcalc_data_transformer_spark.plans import formatted_plan

SF = "/root/testdata/sf0.001"


def test_split_partitions_whole_corpus(spark):
    """Every doc lands in exactly one split; ratios near 90/5/5."""
    rows = mlprep.split_assign(spark, SF).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        assert r.split in {"train", "val", "test"}
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    total = sum(by_split.values())
    from cgtcalc_data_transformer_spark.sources.tpch import load_table

    assert total == load_table(spark, SF, "documents").count()
    assert by_split["train"] / total > 0.75  # md5-uniform ≈ .90
    assert 0 < by_split.get("val", 0) + by_split.get("test", 0) < total * 0.4


def test_split_deterministic(spark):
    a = [tuple(r) for r in mlprep.split_assign(spark, SF).collect()]
    b = [tuple(r) for r in mlprep.split_assign(spark, SF).collect()]
    assert a == b


def test_repetition_bounds_and_synthetic_junk(spark):
    """Ratios in (0,1]; a pathologically repetitive doc must fail the
    gate while a diverse doc passes."""
    out = {r.doc_id: r for r in mlprep.text_repetition(spark, SF).collect()}
    assert out, "empty corpus"
    for r in out.values():
        assert 0 < r.distinct_ratio <= 1
        assert 0 < r.top_unigram_share <= 1
        assert 0 < r.top_bigram_share <= 1

    junk = spark.createDataFrame(
        [(1, "spam " * 50), (2, " ".join(f"w{i}" for i in range(100)))],
        "doc_id long, text string",
    )
    import unittest.mock as mock

    with mock.patch.object(
        mlprep, "load_table", lambda spark, sf, name: junk
    ):
        rows = {r.doc_id: r for r in mlprep.text_repetition(spark, SF).collect()}
    assert not rows[1].passes_repetition
    assert rows[2].passes_repetition


def test_length_outliers_band(spark):
    """Everything reported is genuinely outside [lo, hi], and the
    bounds frame is broadcast (no shuffle of the corpus by a scalar)."""
    df = mlprep.length_outliers(spark, SF)
    for r in df.collect():
        assert (r.n_chars < r.lo_bound) or (r.n_chars > r.hi_bound)
        assert r.reason == ("short" if r.n_chars < r.lo_bound else "long")
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_user_sequences_truncation_and_order(spark):
    """seq_len caps at SEQ_MAX_EVENTS; truncated iff the user had
    more; fingerprint matches an independently-ordered recompute."""
    from cgtcalc_data_transformer_spark.sources.tpch import load_table

    out = {r.user_id: r for r in mlprep.events_user_sequences(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    counts = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert out.keys() == counts.keys()
    for uid, r in out.items():
        assert r.seq_len == min(counts[uid], mlprep.SEQ_MAX_EVENTS)
        assert r.truncated == (counts[uid] > mlprep.SEQ_MAX_EVENTS)

    # independent driver-side recompute of one user's fingerprint
    uid = min(out)
    import hashlib

    rows = (
        ev.filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .limit(mlprep.SEQ_MAX_EVENTS)
        .collect()
    )
    sig = hashlib.md5("|".join(r.event_type for r in rows).encode()).hexdigest()
    assert out[uid].seq_sig == sig


def test_retention_triangle_invariants(spark):
    """Day-0 retention is 100% of the cohort; offsets within bounds;
    active_users never exceeds cohort_size."""
    from cgtcalc_data_transformer_spark.operators import events as ev_ops

    rows = ev_ops.events_retention(spark, SF).collect()
    assert rows, "no cohorts"
    day0 = {r.cohort_day: r for r in rows if r.day_offset == 0}
    for r in rows:
        assert 0 <= r.day_offset <= ev_ops.RETENTION_MAX_OFFSET
        assert 0 < r.active_users <= r.cohort_size
        assert abs(r.retention_rate - round(r.active_users / r.cohort_size, 6)) < 1e-9
    # every user is active on their own first day
    for cd, r in day0.items():
        assert r.active_users == r.cohort_size, cd
