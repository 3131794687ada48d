"""Semantic invariants for the late-round-3 additions: temperature
language rebalancing, cross-split leakage audit, XML interchange,
VARIANT semi-structured extraction. (The value-level equality gate is
the DuckDB oracle in the registry; these pin the semantics the oracle
can't express — monotonicity, split disjointness, roundtrip identity.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import curation, events, mlprep
from cgtcalc_data_transformer_spark.sources import xml as xml_src
from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------- temperature_resample
def test_temperature_resample_rates(spark):
    rows = curation.temperature_resample(spark, SF).collect()
    docs_total = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == docs_total
    for r in rows:
        assert 0.0 < r.p_keep <= 1.0
        assert 0 <= r.n_kept <= r.n_docs
        # realized hash-bucket rate tracks the target within sampling noise
        assert abs(r.realized_rate - r.p_keep) < 0.15
    # temperature upsampling is monotone: rarer language → higher keep rate
    by_size = sorted(rows, key=lambda r: r.n_docs)
    for a, b in zip(by_size, by_size[1:]):
        assert a.p_keep >= b.p_keep


# ------------------------------------------- split_leakage_check
def test_split_leakage_bounds(spark):
    rows = {r.split: r for r in mlprep.split_leakage_check(spark, SF).collect()}
    assert set(rows) <= {"val", "test"}
    docs_total = load_table(spark, SF, "documents").count()
    n_eval = sum(r.n_docs for r in rows.values())
    assert 0 < n_eval < docs_total  # train split holds the rest
    for r in rows.values():
        assert 0 <= r.n_leaked_fps <= r.n_leaked <= r.n_docs
        assert r.leak_rate == round(r.n_leaked / r.n_docs, 6)


def test_split_leakage_counts_match_direct_recompute(spark):
    """Independent recompute with a different plan shape (full outer
    fp-level aggregation instead of semi join) must agree."""
    docs = load_table(spark, SF, "documents")
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    b = hash_bucket(F.col("doc_id"))
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    split = (
        F.when(b < mlprep.TRAIN_PCT, F.lit("train"))
        .when(b < mlprep.VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    tagged = docs.select(split.alias("split"), fp.alias("fp"))
    per_fp = tagged.groupBy("fp").agg(
        F.sum((F.col("split") == "train").cast("long")).alias("n_train"),
        F.sum((F.col("split") == "val").cast("long")).alias("n_val"),
        F.sum((F.col("split") == "test").cast("long")).alias("n_test"),
    )
    expected = per_fp.filter(F.col("n_train") > 0).agg(
        F.sum("n_val").alias("val_leaked"),
        F.sum("n_test").alias("test_leaked"),
    ).collect()[0]
    rows = {r.split: r for r in mlprep.split_leakage_check(spark, SF).collect()}
    assert rows.get("val", None) is None or rows["val"].n_leaked == (
        expected.val_leaked or 0
    )
    assert rows.get("test", None) is None or rows["test"].n_leaked == (
        expected.test_leaked or 0
    )


# ------------------------------------------------- xml_roundtrip
def test_xml_roundtrip_identity(spark):
    got = {r.s_nationkey: r for r in xml_src.xml_roundtrip(spark, SF).collect()}
    direct = {
        r.s_nationkey: r
        for r in load_table(spark, SF, "supplier")
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(28,6)"))
            .cast("double")
            .alias("acctbal_total"),
            F.min("s_name").alias("first_name"),
            F.max("s_suppkey").alias("max_suppkey"),
        )
        .collect()
    }
    assert set(got) == set(direct)
    for k, g in got.items():
        d = direct[k]
        assert g.n_suppliers == d.n_suppliers
        assert g.acctbal_total == d.acctbal_total  # exact: decimal-summed
        assert g.first_name == d.first_name
        assert g.max_suppkey == d.max_suppkey


# ------------------------------------------------- events_variant
def test_events_variant_matches_json_path(spark):
    rows = {r.event_type: r for r in events.events_variant(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    direct = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(k).alias("k_sum"))
        .collect()
    }
    assert set(rows) == set(direct)
    for t, r in rows.items():
        assert r.n == direct[t].n
        assert r.k_sum == direct[t].k_sum
        assert r.n_missing == r.n  # $.absent is NULL on every row
        assert 0 <= r.k_even <= r.n


# ------------------------------------------------- jsonl_roundtrip
def test_jsonl_roundtrip_identity(spark):
    from cgtcalc_data_transformer_spark.sources import jsonl

    got = {
        (r.source, r.lang): r for r in jsonl.jsonl_roundtrip(spark, SF).collect()
    }
    digest = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
    direct = {
        (r.source, r.lang): r
        for r in load_table(spark, SF, "documents")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(digest).alias("text_digest_sum"),
        )
        .collect()
    }
    assert set(got) == set(direct)
    for k, g in got.items():
        d = direct[k]
        assert (g.n_docs, g.total_chars, g.text_digest_sum) == (
            d.n_docs,
            d.total_chars,
            d.text_digest_sum,
        )


# ------------------------------------------------- cap_per_source
def test_cap_per_source_caps(spark):
    rows = curation.cap_per_source(spark, SF).collect()
    assert rows, "documents table has sources"
    for r in rows:
        assert r.n_admitted == min(r.n_docs, curation.CAP_PER_SOURCE)
        assert r.capped == (r.n_docs > curation.CAP_PER_SOURCE)
        assert 0 < r.admitted_id_sum


# ------------------------------------------------- kmv_distinct
def test_kmv_distinct_estimates(spark):
    from cgtcalc_data_transformer_spark.operators import featurize

    rows = featurize.kmv_distinct(spark, SF).collect()
    assert rows
    for r in rows:
        if r.n_exact < featurize.KMV_K:
            # sketch kept the whole key set: estimate IS the exact count
            assert r.kmv_estimate == float(r.n_exact)
        assert r.within_bound  # 0.4 bound ≈ 3σ for k=64


def test_kmv_plan_uses_window_group_limit(spark):
    """The rank-≤-k filter must compile to WindowGroupLimit (partial
    per-partition top-k BEFORE the shuffle) — the property that makes
    the sketch build scale."""
    from cgtcalc_data_transformer_spark.operators import featurize
    from cgtcalc_data_transformer_spark.plans import formatted_plan

    assert "WindowGroupLimit" in formatted_plan(featurize.kmv_distinct(spark, SF))


# ------------------------------------------------- collated_group
def test_collated_group_merges_case_variants(spark):
    from cgtcalc_data_transformer_spark.operators import relational_ext

    rows = relational_ext.collated_group(spark, SF).collect()
    assert rows
    direct = {
        r.k: r.n
        for r in load_table(spark, SF, "part")
        .groupBy(F.lower("p_brand").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.brand_ci == r.brand_ci.lower()
        assert r.n_parts == direct[r.brand_ci]  # collation ≡ lower() grouping
        assert 1 <= r.n_case_variants <= 2  # parity corruption makes ≤2 forms


# ------------------------------------------------- contrastive_negatives
def test_contrastive_negatives_invariants(spark):
    rows = mlprep.contrastive_negatives(spark, SF).collect()
    assert rows
    for r in rows:
        # K pairs per doc minus the dropped self-collisions
        assert r.n_pairs + r.n_self_dropped == r.n_docs * len(mlprep.NEG_OFFSETS)
        assert r.n_pairs > 0 and r.neg_id_digest > 0


# ------------------------------------------------- containment_dedup
def test_containment_directed_vs_jaccard(spark):
    """Containment is directed and dominates Jaccard: for every
    emitted A→B pair, C(A→B) ≥ J(A,B); and every exact duplicate pair
    (same text) must appear with containment 1.0 in both directions."""
    from cgtcalc_data_transformer_spark.operators import dedup

    rows = dedup.containment_dedup(spark, SF).collect()
    assert rows
    pairs = {(r.a_id, r.b_id): r for r in rows}
    for (a, b), r in pairs.items():
        assert a != b
        assert 0.8 <= r.containment <= 1.0
        assert r.containment == round(r.n_common / r.n_a, 6)
        assert r.n_common <= r.n_a
    # directedness: an emitted A→B needs no emitted B→A (and when both
    # exist the pair is a mutual near-duplicate, containment-consistent)
    mutual = [(a, b) for (a, b) in pairs if (b, a) in pairs]
    for a, b in mutual:
        assert pairs[(a, b)].n_common == pairs[(b, a)].n_common


# ------------------------------------------------- kmv_intersection
def test_kmv_intersection_estimates(spark):
    from cgtcalc_data_transformer_spark.operators import featurize

    r = featurize.kmv_intersection(spark, SF).collect()[0]
    assert r.n_inter_exact <= min(r.n_a_exact, r.n_b_exact)
    assert r.within_bound
    assert r.inter_est <= r.union_est


# ----------------------------------------- linkage_sorted_neighborhood
def test_snm_finds_matches_across_buckets(spark):
    from cgtcalc_data_transformer_spark.operators import linkage

    rows = linkage.linkage_sorted_neighborhood(spark, SF).collect()
    assert len(rows) > 10  # reversed-name bucketing actually distributes
    total_matched = sum(r.n_matched for r in rows)
    assert total_matched > 0  # neighborhood recovers dirty→master links
    for r in rows:
        assert 0 <= r.n_matched <= r.n_pairs
        assert (r.matched_id_digest > 0) == (r.n_matched > 0)


# ------------------------------------------------- segment_dedup
def test_segment_dedup_fractions(spark):
    rows = curation.segment_dedup(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_segments <= r.n_segments
        assert r.dup_fraction == round(r.n_dup_segments / r.n_segments, 6)
    # exact whole-doc duplicates guarantee duplicated segments exist
    # somewhere in the corpus whenever dedup_exact finds dup_count > 1
    from cgtcalc_data_transformer_spark.operators import dedup

    has_doc_dups = (
        dedup.dedup_exact(spark, SF).filter(F.col("dup_count") > 1).count() > 0
    )
    if has_doc_dups:
        assert sum(r.n_dup_segments for r in rows) > 0


# -------------------------------------------- events_rate_anomaly_robust
def test_robust_anomaly_flags_are_extreme_hours(spark):
    """Every flagged hour's count must sit beyond the modified-z
    cutoff relative to ITS type's median/MAD, recomputed directly."""
    rows = events.events_rate_anomaly_robust(spark, SF).collect()
    import statistics

    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    hourly = (
        load_events(spark, SF)
        .groupBy("event_type", F.expr(f"ts div {events.HOUR_NS}").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_type = {}
    for r in hourly:
        by_type.setdefault(r.event_type, []).append(r.n)
    for r in rows:
        ns = by_type[r.event_type]
        med = statistics.median(ns)
        mad = statistics.median([abs(x - med) for x in ns])
        assert r.median_n == med and r.mad_n == mad
        assert 0.6745 * abs(r.n - med) / mad > events.ROBUST_Z


# ------------------------------------------------- snapshot_diff
def test_snapshot_diff_partitions_keyspace(spark):
    from cgtcalc_data_transformer_spark.operators import incremental
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    rows = {r.status: r for r in incremental.snapshot_diff(spark, SF).collect()}
    assert set(rows) == {"added", "changed", "removed", "unchanged"}
    orders = load_table(spark, SF, "orders")
    n = orders.count()
    buckets = [
        r.b for r in orders.select(hash_bucket(F.col("o_orderkey")).alias("b")).collect()
    ]
    removed = sum(1 for b in buckets if b % 7 == 0)
    added = sum(1 for b in buckets if b % 13 == 0)
    changed = sum(1 for b in buckets if b % 7 != 0 and b < incremental.DIFF_DELTA_PCT)
    assert rows["removed"].n_keys == removed
    assert rows["added"].n_keys == added
    assert rows["changed"].n_keys == changed
    assert rows["unchanged"].n_keys == n - removed - changed


# --------------------------------------------- events_trending_decay
def test_trending_decay_exact_dyadic(spark):
    """The decayed score must equal the python-float recompute exactly
    (2^-d weights are dyadic rationals — no libm, no ulp drift)."""
    rows = events.events_trending_decay(spark, SF).collect()
    assert rows
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    daily = (
        load_events(spark, SF)
        .groupBy("event_type", F.expr(f"ts div {events.DAY_NS}").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    max_day = max(r.day for r in daily)
    want = {}
    for r in daily:
        age = max_day - r.day
        if age <= events.DECAY_MAX_AGE_DAYS:
            want[r.event_type] = want.get(r.event_type, 0.0) + r.n * 2.0 ** (-age)
    got = {r.event_type: r.decay_score for r in rows}
    assert set(got) == set(want)
    for t, v in want.items():
        assert got[t] == v  # exact equality, not approx


# ------------------------------------------------- events_rfm_segments
def test_rfm_segments_cover_all_users(spark):
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = events.events_rfm_segments(spark, SF).collect()
    assert len(rows) > 1  # mean-relative cutpoints actually segment
    n_users = load_events(spark, SF).select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert r.r_score in (1, 2, 3) and r.f_score in (1, 2, 3) and r.m_score in (1, 2, 3)
