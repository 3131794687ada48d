"""Round-5 operator tests + round-5 contract fixes.

Covers: the vacuous-oracle named exceptions (VERDICT r4 item 6), the
agg_approx bounded-sample audit rework (item 3), and the new round-5
operators as they land.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# ---------------------------------------- sparse-result named exceptions
def test_sparse_ops_nonempty_at_driver_scale(spark):
    """NAMED EXCEPTION (VERDICT r4 item 6): `interval_join_binned` and
    `events_rate_anomaly_robust` legitimately emit 0 rows at sf0.001
    (too few events per user for a purchase-in-session containment /
    too few hours beyond the robust-z cutoff), which makes their
    sf0.001 equivalence tests vacuous at that scale. This test pins
    the fixture-scale floor: at sf0.01 — the scale the DRIVER runs the
    oracle gate at — both must produce rows, so the driver hash row is
    never an empty-vs-empty match."""
    from cgtcalc_data_transformer_spark.operators import events

    assert events.interval_join_binned(spark, SF01).count() > 0
    assert events.events_rate_anomaly_robust(spark, SF01).count() > 0


def test_no_other_registry_query_empty_at_its_scale(spark):
    """Every oracled registry query in the round-5 window (the ones
    the driver will hash this round) returns >=1 row at sf0.01.
    Streaming entries are exercised by their own tests."""
    from cgtcalc_data_transformer_spark import registry

    slow_or_streaming = set(registry._STREAMING_ENGINE_RUNS) | {
        # quadratic calibration composition — minutes at sf0.01;
        # its non-emptiness is pinned by test_dedup_lsh_quality
        "dedup_lsh_quality",
    }
    names = [
        n
        for n in registry._ROUND_WINDOW
        if n not in slow_or_streaming
    ][:8]
    # spot-check the first 8 (full coverage comes from the per-op
    # tests + tools/check_oracle.py sweep recorded in PROGRESS.jsonl)
    qs = registry.queries()
    for n in names:
        assert qs[n](spark, SF01).limit(1).count() > 0, n


# ---------------------------------------------------- agg_approx rework
def test_agg_approx_sample_bounded_and_exact_at_small_n(spark):
    """The exact-percentile audit side must (a) equal the full-data
    exact percentile when every group is below the sample target —
    the oracle-scale regime — and (b) carry genuinely-true tolerance
    booleans."""
    from cgtcalc_data_transformer_spark.operators.relational import (
        AGG_APPROX_SAMPLE_TARGET,
        agg_approx_sketches,
    )

    orders = load_table(spark, SF, "orders")
    max_group = (
        orders.groupBy("o_orderpriority").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_group <= AGG_APPROX_SAMPLE_TARGET, (
        "fixture regression: sf0.001 groups must sit below the sample "
        "target so the emitted percentiles are full-data exact"
    )
    rows = agg_approx_sketches(spark, SF).collect()
    assert len(rows) == 5
    exact = {
        r["o_orderpriority"]: r["p"]
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.round(
                F.percentile("o_totalprice", F.lit(0.5)), 6
            ).alias("p")
        )
        .collect()
    }
    for r in rows:
        assert r.price_p50 == exact[r.o_orderpriority]
        assert r.approx_customers_ok and r.p50_ok and r.p95_ok and r.p99_ok


def test_agg_approx_sample_rate_adapts(spark):
    """At sf0.01 the largest priority group (~3k) is still under the
    4096 target; force the bounded-sample path by checking the filter
    keeps ~TARGET rows when n greatly exceeds it (synthetic: treat the
    whole orders table as one group)."""
    from cgtcalc_data_transformer_spark.operators.relational import (
        AGG_APPROX_SAMPLE_TARGET,
        _AGG_APPROX_BUCKETS,
    )
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    orders = load_table(spark, SF01, "orders")
    n = orders.count()
    kept = orders.filter(
        hash_bucket(F.col("o_orderkey"), _AGG_APPROX_BUCKETS) * F.lit(n)
        < F.lit(AGG_APPROX_SAMPLE_TARGET).cast("long")
        * F.lit(_AGG_APPROX_BUCKETS).cast("long")
    ).count()
    assert n > AGG_APPROX_SAMPLE_TARGET
    # md5 buckets are uniform: kept ~ Binomial(n, TARGET/n)
    assert abs(kept - AGG_APPROX_SAMPLE_TARGET) < 6 * (AGG_APPROX_SAMPLE_TARGET**0.5)


# ------------------------------------- quality_fair_select singleton fix
def test_quality_fair_singleton_source_kept(spark):
    """ADVICE r4: a source with exactly one document has
    percent_rank 0.0 and must still be KEPT (dropping it would delete
    100% of that source — the batch effect the operator exists to
    prevent). The fixture has no singleton source, so assert the
    predicate directly on a constructed frame mirroring the operator's
    keep expression."""
    from pyspark.sql import Window

    from cgtcalc_data_transformer_spark.operators.curation import (
        FAIR_DROP_FRACTION,
    )

    df = spark.createDataFrame(
        [("d1", "solo", 0.1), ("d2", "big", 0.2), ("d3", "big", 0.9)],
        "doc_id string, source string, quality_score double",
    )
    w = Window.partitionBy("source").orderBy("quality_score", "doc_id")
    out = {
        r.doc_id: r.keep
        for r in df.withColumn("pct_rank", F.percent_rank().over(w))
        .withColumn("n_src", F.count(F.lit(1)).over(Window.partitionBy("source")))
        .select(
            "doc_id",
            (
                (F.col("n_src") == 1)
                | (F.col("pct_rank") >= FAIR_DROP_FRACTION)
            ).alias("keep"),
        )
        .collect()
    }
    assert out["d1"] is True  # singleton kept
    assert out["d2"] is False  # bottom of a 2-doc source dropped
    assert out["d3"] is True


# ---------------------------------------------- round-5 new operators
def test_simjoin_prefix_equals_quadratic(spark):
    """Prefix filtering is LOSSLESS: the candidate-restricted exact
    join must produce byte-identical pairs to the full quadratic
    shingle self-join at the same threshold."""
    from cgtcalc_data_transformer_spark.operators import dedup

    fast = {tuple(r) for r in dedup.simjoin_prefix(spark, SF).collect()}
    slow = {tuple(r) for r in dedup.dedup_ngram_jaccard(spark, SF).collect()}
    assert fast == slow
    assert len(fast) > 0, "fixture must contain at least one near-dup pair"


def test_bfs_reach_hop_counts(spark):
    """hop-0 row = seed count; every node is accounted for exactly
    once (reached hops + unreached); hop-1 equals the directly
    computed neighbor set of the seeds."""
    from cgtcalc_data_transformer_spark.operators import graph

    rows = {r.hop: r.n_nodes for r in graph.bfs_reach(spark, SF).collect()}
    seeds = {
        f"S{r.s_suppkey}"
        for r in load_table(spark, SF, "supplier")
        .filter(F.col("s_suppkey") <= graph.BFS_SEED_MAX_SUPPKEY)
        .collect()
    }
    assert rows[0] == len(seeds)
    edges = graph._edges(spark, SF)
    n_nodes = edges.select("src").distinct().count()
    assert sum(rows.values()) == n_nodes
    hop1_direct = {
        r.dst
        for r in edges.filter(F.col("src").isin(*seeds)).select("dst").collect()
    } - seeds
    assert rows.get(1, 0) == len(hop1_direct)


def test_exact_median_2pass_matches_direct_selection(spark):
    """The two-pass selection must equal the direct global-rank
    formulation computed independently in Spark."""
    from pyspark.sql import Window

    from cgtcalc_data_transformer_spark.operators.sampling import (
        exact_median_2pass,
    )

    got = {
        r.o_orderpriority: (r.n, r.median_price)
        for r in exact_median_2pass(spark, SF).collect()
    }
    orders = load_table(spark, SF, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    direct = (
        orders.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority"))
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("o_orderpriority", "n", "o_totalprice")
        .collect()
    )
    assert got == {r.o_orderpriority: (r.n, r.o_totalprice) for r in direct}
    assert len(got) == 5


def test_events_session_stats_consistency(spark):
    """Session totals must reconcile with events_sessionize; bounce
    rows are exactly the single-event sessions."""
    from cgtcalc_data_transformer_spark.operators import events

    stats = events.events_session_stats(spark, SF).collect()
    sessions = events.events_sessionize(spark, SF)
    assert sum(r.n_sessions for r in stats) == sessions.count()
    assert sum(r.n_bounces for r in stats) == sessions.filter(
        F.col("n_events") == 1
    ).count()
    for r in stats:
        assert 0.0 <= r.bounce_rate <= 1.0
        assert r.n_same_exit >= r.n_bounces  # bounces enter==exit trivially


def test_frequent_pairs_support_and_order(spark):
    from cgtcalc_data_transformer_spark.operators.relational_ext import (
        PAIR_MIN_SUPPORT,
        frequent_pairs,
    )

    rows = frequent_pairs(spark, SF).collect()
    assert rows, "fixture must contain at least one frequent pair"
    sups = [r.support for r in rows]
    assert sups == sorted(sups, reverse=True)
    for r in rows:
        assert r.part_a < r.part_b
        assert r.support >= PAIR_MIN_SUPPORT
        assert r.lift > 0
    # spot-verify the top pair's support directly
    top = rows[0]
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    both = (
        li.filter(F.col("l_partkey") == top.part_a)
        .select("l_orderkey")
        .intersect(li.filter(F.col("l_partkey") == top.part_b).select("l_orderkey"))
        .count()
    )
    assert both == top.support


def test_drift_ks_binned_summary(spark):
    from cgtcalc_data_transformer_spark.operators.sampling import drift_ks_binned

    [r] = drift_ks_binned(spark, SF).collect()
    orders = load_table(spark, SF, "orders")
    assert r.n1 == orders.filter(F.col("o_orderstatus") == "O").count()
    assert r.n2 == orders.filter(F.col("o_orderstatus") == "F").count()
    assert 0.0 <= r.ks_d <= 1.0
    assert r.drifted == (r.ks_d > r.d_crit)


def test_bpe_apply_matches_naive_python(spark):
    """Tokenizer application must equal a naive Python BPE encode of
    the same rules on sample documents."""
    import re

    from cgtcalc_data_transformer_spark.operators.corpus_lm import (
        _learn_bpe_rules,
        bpe_apply,
    )

    rules = _learn_bpe_rules(spark, SF)
    assert rules, "learning must find at least one merge rule"
    got = {r.doc_id: r for r in bpe_apply(spark, SF).collect()}
    docs = load_table(spark, SF, "documents").limit(5).collect()
    for d in docs:
        words = re.findall(r"[a-z0-9]+", d.text.lower())
        n_tokens = 0
        for w in words:
            syms = list(w)
            for _, a, b, merged, _ in rules:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            n_tokens += len(syms)
        r = got[d.doc_id]
        assert r.n_words == len(words)
        assert r.n_chars == sum(len(w) for w in words)
        assert r.n_tokens == n_tokens
        assert r.n_tokens <= r.n_chars


def test_golden_record_rules(spark):
    """Survivorship rules recomputed directly from the linkage result:
    name from master, balance from the freshest (highest-key) linked
    dirty record, segment from master (dirty carries none)."""
    from cgtcalc_data_transformer_spark.operators.linkage import (
        BAL_REFRESH,
        golden_record,
        record_linkage,
    )

    golden = {r.master_id: r for r in golden_record(spark, SF).collect()}
    links = record_linkage(spark, SF).collect()
    assert golden and links
    cust = {
        r.c_custkey: r for r in load_table(spark, SF, "customer").collect()
    }
    by_master: dict[int, list[int]] = {}
    for lk in links:
        by_master.setdefault(lk.master_id, []).append(lk.dirty_id)
    assert set(golden) == set(by_master)
    for mid, dirties in by_master.items():
        g = golden[mid]
        assert g.n_records == 1 + len(dirties)
        assert g.golden_name == cust[mid].c_name
        freshest = max(dirties)
        assert g.golden_acctbal == cust[freshest].c_acctbal + BAL_REFRESH
        assert g.golden_segment == cust[mid].c_mktsegment


def test_weighted_sample_wor_properties(spark):
    """Exactly K rows; keys recompute correctly for the selected rows;
    selection favors heavy weights vs the unweighted baseline."""
    import math

    from cgtcalc_data_transformer_spark.operators.sampling import (
        WOR_K,
        weighted_sample_wor,
    )

    rows = weighted_sample_wor(spark, SF).collect()
    orders = load_table(spark, SF, "orders")
    n = orders.count()
    assert len(rows) == min(WOR_K, n)
    import hashlib

    for r in rows[:10]:
        bucket = int(hashlib.md5(str(r.o_orderkey).encode()).hexdigest()[:8], 16)
        u = (bucket + 0.5) / 4294967296.0
        expect = math.floor(math.log(u) / r.weight * 1e8 + 0.5)
        assert r.key_int == expect
    # weighted sample's mean weight should exceed the population mean
    pop_mean = orders.agg(
        F.avg(F.greatest(F.lit(1), F.floor(F.col("o_totalprice")).cast("long")))
    ).collect()[0][0]
    samp_mean = sum(r.weight for r in rows) / len(rows)
    assert samp_mean > pop_mean


def test_kfold_assign_partition(spark):
    from cgtcalc_data_transformer_spark.operators.mlprep import (
        KFOLD_K,
        kfold_assign,
    )

    rows = kfold_assign(spark, SF).collect()
    docs_n = load_table(spark, SF, "documents").count()
    assert {r.fold for r in rows} == set(range(KFOLD_K))
    assert sum(r.n_eval for r in rows) == docs_n
    for r in rows:
        assert r.n_train == docs_n - r.n_eval
        assert abs(r.eval_share - r.n_eval / docs_n) < 1e-6
