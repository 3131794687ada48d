"""Semantic invariants for the round-3 mid-round operator additions:
MERGE upsert, Markov transitions, equi-depth histogram, weighted
sampling, record linkage, erasure cascade, BM25, schema evolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import (
    events,
    incremental,
    linkage,
    quality,
    sampling,
    search,
)
from cgtcalc_data_transformer_spark.sources import evolution
from cgtcalc_data_transformer_spark.sources.tpch import load_events, load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------- merge_upsert
def test_merge_upsert_partitions_and_prices(spark):
    rows = incremental.merge_upsert(spark, SF).collect()
    orders = load_table(spark, SF, "orders")
    bucket = sampling.hash_bucket(F.col("o_orderkey"))
    by_key = {
        r.o_orderkey: r.b
        for r in orders.select("o_orderkey", bucket.alias("b")).collect()
    }
    price = {
        r.o_orderkey: r.o_totalprice
        for r in orders.select("o_orderkey", "o_totalprice").collect()
    }
    seen = {r.o_orderkey: r for r in rows}
    assert len(seen) == len(rows)  # key-unique result
    for k, b in by_key.items():
        if b < incremental.MERGE_DELTA_PCT:  # target-only
            assert seen[k].merge_action == "kept"
            assert seen[k].o_totalprice == price[k]
        elif b < incremental.MERGE_BASE_PCT:  # matched
            if b % 3 == 0:
                assert k not in seen  # WHEN MATCHED DELETE
            else:
                assert seen[k].merge_action == "updated"
                assert seen[k].o_totalprice == price[k] + 100.0
        else:  # source-only
            if b % 3 == 0:
                assert k not in seen  # delete of a non-match: no-op
            else:
                assert seen[k].merge_action == "inserted"


# ------------------------------------------------ transition matrix
def test_transition_probs_sum_to_one(spark):
    rows = events.events_transition_matrix(spark, SF).collect()
    from collections import defaultdict

    by_from = defaultdict(float)
    totals = {}
    for r in rows:
        by_from[r.from_type] += r.transitions / r.from_total
        totals[r.from_type] = r.from_total
    for ft, p in by_from.items():
        assert abs(p - 1.0) < 1e-9
    # total transitions = events - one per user (the last has no next)
    ev = load_events(spark, SF)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(totals.values()) == n_events - n_users


# ------------------------------------------- equi-depth histogram
def test_equidepth_bins_balanced(spark):
    rows = sampling.histogram_equidepth(spark, SF).collect()
    n_total = load_table(spark, SF, "orders").count()
    assert sum(r.n for r in rows) == n_total
    target = n_total / sampling.EQUIDEPTH_BINS
    for r in rows:
        assert 0.5 * target <= r.n <= 1.5 * target  # depth within 50%
    los = [r.lo for r in sorted(rows, key=lambda r: r.bin)]
    assert los == sorted(los)  # bins ordered by value range


# ------------------------------------------------ weighted sampling
def test_weighted_sample_biased_and_stable(spark):
    a = sampling.sample_weighted(spark, SF).collect()
    b = sampling.sample_weighted(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # expected size: WEIGHTED_TARGET_N ± hash noise
    assert 0.5 * sampling.WEIGHTED_TARGET_N <= len(a) <= 1.6 * sampling.WEIGHTED_TARGET_N
    # weight-proportional: sampled rows' mean weight exceeds corpus mean
    orders = load_table(spark, SF, "orders")
    pop_mean = orders.agg(F.avg(F.floor("o_totalprice"))).first()[0]
    samp_mean = sum(r.weight for r in a) / len(a)
    assert samp_mean > pop_mean


# ------------------------------------------------- record linkage
def test_record_linkage_resolves_identities(spark):
    rows = linkage.record_linkage(spark, SF).collect()
    assert rows, "some dirty records must link"
    self_hits = sum(1 for r in rows if r.master_id == r.dirty_id)
    assert self_hits / len(rows) >= 0.9  # the true identity wins blocks
    assert all(r.distance <= linkage.MAX_EDIT for r in rows)
    assert all(r.distance >= 1 for r in rows)  # corruption really happened


# ------------------------------------------------- erasure cascade
def test_erasure_counts_consistent(spark):
    rows = {r.table_name: r for r in quality.erasure_propagate(spark, SF).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    for r in rows.values():
        assert r.rows_deleted + r.rows_kept == r.rows_total
    # cascade really reaches the fact tables
    assert rows["customer"].rows_deleted > 0
    assert rows["orders"].rows_deleted > 0
    assert rows["lineitem"].rows_deleted > 0
    # orders deletion must equal a direct recount through the FK
    cust = load_table(spark, SF, "customer")
    erased = cust.filter(
        sampling.hash_bucket(F.col("c_custkey")) < quality.ERASE_PCT
    ).select("c_custkey")
    orders = load_table(spark, SF, "orders")
    direct = orders.join(erased, orders.o_custkey == erased.c_custkey, "left_semi").count()
    assert rows["orders"].rows_deleted == direct


# ----------------------------------------------------------- BM25
def test_bm25_ranked_and_bounded(spark):
    rows = search.bm25_rank(spark, SF).collect()
    assert 0 < len(rows) <= search.SEARCH_TOP_K
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # AND-search hits are a subset of OR-ranked candidates' doc space:
    # every conjunctive hit must also score under BM25
    and_ids = {r.doc_id for r in search.text_search_and(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    assert and_ids <= {r.doc_id for r in docs.select("doc_id").collect()}


# ------------------------------------------------ schema evolution
def test_schema_evolution_null_resolution(spark):
    rows = {r.snap: r for r in evolution.schema_evolution(spark, SF).collect()}
    assert set(rows) == {"v1", "v2"}
    assert rows["v1"].flag_nulls == rows["v1"].n_rows  # old files → NULL
    assert rows["v1"].len_nulls == rows["v1"].n_rows
    assert rows["v2"].flag_nulls == 0
    assert rows["v2"].len_nulls == 0
    n_orders = load_table(spark, SF, "orders").count()
    assert rows["v1"].n_rows + rows["v2"].n_rows == n_orders


# ------------------------------------------------ binned interval join
def test_interval_join_binned_matches_unbinned(spark):
    """The binned equality-join must equal a direct containment join
    built with Spark itself (independent of the DuckDB oracle)."""
    from cgtcalc_data_transformer_spark.operators.events import (
        SESSION_GAP_NS,
        interval_join_binned,
    )
    from pyspark.sql import Window

    binned = {tuple(r) for r in interval_join_binned(spark, SF).collect()}
    ev = load_events(spark, SF)
    browse = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.when((F.col("ts") - F.lag("ts").over(w)) > SESSION_GAP_NS, 1).otherwise(0)
    sessions = (
        browse.withColumn("g", gap)
        .withColumn("sidx", F.sum("g").over(wsum))
        .groupBy("user_id", "sidx")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    direct = {
        tuple(r)
        for r in p.join(sessions, "user_id")
        .filter((F.col("pts") >= F.col("s")) & (F.col("pts") <= F.col("e")))
        .select(
            "user_id",
            "pid",
            "sidx",
            F.expr("pts div 1000000000"),
            F.expr("s div 1000000000"),
        )
        .collect()
    }
    assert binned == direct


# ------------------------------------------------------ HLL sketches
def test_hll_union_estimates_within_tolerance(spark):
    from cgtcalc_data_transformer_spark.operators.featurize import hll_segment_union

    rows = hll_segment_union(spark, SF).collect()
    assert any(r.segment == "(merged)" for r in rows)
    assert all(r.sketch_ok for r in rows)
    merged = next(r for r in rows if r.segment == "(merged)")
    per_seg = [r for r in rows if r.segment != "(merged)"]
    # union is a distinct-union, not a sum: merged <= sum of segments
    assert merged.exact_customers <= sum(r.exact_customers for r in per_seg)


# ------------------------------------------------- triangle counting
def test_triangle_count_matches_bruteforce(spark):
    from cgtcalc_data_transformer_spark.operators.graph import triangle_count_parts

    row = triangle_count_parts(spark, SF).first()
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import defaultdict
    from itertools import combinations

    per_order = defaultdict(set)
    for r in li:
        per_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in per_order.values():
        for x, y in combinations(sorted(parts), 2):
            edges.add((x, y))
    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    tri = 0
    for x, y in edges:
        tri += len([z for z in adj[x] & adj[y] if z > y])
    nodes = {n for e in edges for n in e}
    assert row.n_nodes == len(nodes)
    assert row.n_edges == len(edges)
    assert row.n_triangles == tri


# --------------------------------------------- runtime bloom filter
def test_runtime_bloom_filter_injection(spark):
    """With thresholds sized to the fixture, InjectRuntimeFilter must
    add bloom_filter_might_contain on the fact side, and the bloomed
    plan must return exactly the default plan's rows."""
    from cgtcalc_data_transformer_spark.operators.relational_ext import (
        bloom_filter_pruned_join,
    )
    from cgtcalc_data_transformer_spark.plans import formatted_plan

    baseline = {tuple(r) for r in bloom_filter_pruned_join(spark, SF).collect()}
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        # broadcast joins bypass the bloom rewrite — force a shuffle join
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = bloom_filter_pruned_join(spark, SF)
        plan = formatted_plan(df)
        # physical plan spells the injected pair as might_contain(...)
        # on the fact filter + bloom_filter_agg(...) in the subquery
        assert "might_contain" in plan and "bloom_filter_agg" in plan, (
            f"no runtime bloom filter injected:\n{plan}"
        )
        assert {tuple(r) for r in df.collect()} == baseline
    finally:
        for k, v in saved.items():
            conf.set(k, v)


# --------------------------------------------------- top session paths
def test_events_top_paths_shape(spark):
    rows = events.events_top_paths(spark, SF).collect()
    assert 0 < len(rows) <= events.PATHS_TOP_K
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    types = {"signup", "click", "error", "view", "purchase"}
    for r in rows:
        assert set(r.path.split(">")) <= types
    # total sessions across ALL paths >= sessions covered by top-k
    n_sessions = events.events_sessionize(spark, SF).count()
    assert sum(counts) <= n_sessions


# --------------------------------------------- cogrouped applyInPandas
def test_cogroup_reconcile_matches_join_twin(spark):
    from cgtcalc_data_transformer_spark.operators.grouped_pandas import (
        cogroup_reconcile,
    )

    got = {tuple(r) for r in cogroup_reconcile(spark, SF).collect()}
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    twin = {
        tuple(r)
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count("l_orderkey").alias("n_lines"),
            F.coalesce(
                F.sum(F.col("l_quantity").cast("long")), F.lit(0).cast("long")
            ).alias("qty_sum"),
            (F.count("l_orderkey") > 0).alias("has_lines"),
        )
        .select(
            "o_orderkey", F.col("o_orderstatus").alias("order_status"),
            "n_lines", "qty_sum", "has_lines",
        )
        .collect()
    }
    assert got == twin


# ------------------------------------------------- join strategy hint
def test_shuffle_hash_hint_changes_strategy(spark):
    from cgtcalc_data_transformer_spark.operators.relational_ext import (
        join_shuffle_hash_hint,
    )
    from cgtcalc_data_transformer_spark.plans import formatted_plan

    conf = spark.conf
    saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        hinted = join_shuffle_hash_hint(spark, SF)
        plan = formatted_plan(hinted)
        assert "ShuffledHashJoin" in plan, f"hint ignored:\n{plan}"
        # unhinted twin under the same confs falls back to SMJ
        orders = load_table(spark, SF, "orders")
        cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert "SortMergeJoin" in formatted_plan(plain)
        assert {tuple(r) for r in hinted.collect()} == {
            tuple(r)
            for r in plain.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
                .cast("double")
                .alias("total_price"),
            )
            .collect()
        }
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


# ------------------------------------------------- rate anomaly
def test_rate_anomaly_windows_and_flags(spark):
    rows = events.events_rate_anomaly(spark, SF).collect()
    assert rows, "must score some hours"
    for r in rows:
        # z-score recomputable from emitted mean and count
        assert r.baseline_mean > 0
        assert (abs(r.zscore) > events.ANOMALY_Z) == r.is_anomaly
    # scored hours are a subset of all hourly buckets per type
    ev = load_events(spark, SF)
    hourly = ev.groupBy(
        "event_type", F.expr("ts div 3600000000000").alias("hb")
    ).count()
    assert len(rows) <= hourly.count()


# ------------------------------------------------- source divergence
def test_source_divergence_properties(spark):
    from cgtcalc_data_transformer_spark.operators import corpus_lm

    rows = corpus_lm.source_divergence(spark, SF).collect()
    n = len(corpus_lm.DIV_SOURCES)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r.src_a < r.src_b
        # JS divergence bounds: [0, ln 2]
        assert 0.0 <= r.js_divergence <= 0.6931472
