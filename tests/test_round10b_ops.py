"""Round-10 staple-operator tests: independent naive-Python
reimplementations for stats10 (PAV isotonic, label propagation,
PrefixSpan, forecast-error audit, quantile sketch) — textbook
loop/sort formulations sharing no plan machinery with the Spark
bounded-grid implementations.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


def test_isotonic_matches_pav_loop(spark):
    """The minimax closed form must equal the classic sequential
    pool-adjacent-violators algorithm, and the fit must be monotone."""
    from cgtcalc_data_transformer_spark.operators.embedding_ops import (
        ECE_BINS,
        ECE_SC,
        _nearest_centroid_scores,
    )
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        isotonic_calibration,
    )

    per_vec = _nearest_centroid_scores(spark, SF).collect()
    bins = defaultdict(lambda: [0, 0])  # bin -> [n, correct]
    for r in per_vec:
        b = min(ECE_BINS - 1, max(0, r["conf_i"] * ECE_BINS // ECE_SC))
        bins[b][0] += 1
        bins[b][1] += r["correct"]
    order = sorted(bins)
    # classic PAV: pool adjacent blocks while a violation exists
    blocks = [[bins[b][0], bins[b][1], [b]] for b in order]  # n, c, members
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            n1, c1, m1 = blocks[i]
            n2, c2, m2 = blocks[i + 1]
            if c1 / n1 > c2 / n2:
                blocks[i : i + 2] = [[n1 + n2, c1 + c2, m1 + m2]]
                changed = True
                break
    iso = {}
    for n, c, members in blocks:
        for b in members:
            iso[b] = c / n
    rows = isotonic_calibration(spark, SF).collect()
    assert [r["bin"] for r in rows] == order
    prev = -1
    for r in rows:
        b = r["bin"]
        assert r["n"] == bins[b][0]
        want_acc = int(bins[b][1] * 10**6 / bins[b][0] + 0.5)
        assert abs(r["acc_micro"] - want_acc) <= 1
        want_iso = int(iso[b] * 10**6 + 0.5)
        assert abs(r["iso_micro"] - want_iso) <= 1
        assert r["iso_micro"] >= prev  # monotone by construction
        prev = r["iso_micro"]


def test_label_propagation_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        LPA_ROUNDS,
        _lpa_edges,
        label_propagation,
    )

    edges = [(r["src"], r["dst"]) for r in _lpa_edges(spark, SF).collect()]
    nbrs = defaultdict(list)
    for s, d in edges:
        nbrs[s].append(d)
    labels = {n: n for n in nbrs}
    for _ in range(LPA_ROUNDS):
        new = {}
        for n in nbrs:
            votes = Counter(labels[d] for d in nbrs[n])
            votes[labels[n]] += 1  # self vote
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    comms = Counter(labels.values())
    top = sorted(comms.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = label_propagation(spark, SF).collect()
    assert [(r["community"], r["size"]) for r in rows] == top
    assert rows[0]["n_communities"] == len(comms)
    assert rows[0]["n_nodes"] == len(labels)


def _sessions(spark):
    from cgtcalc_data_transformer_spark.operators.events import SESSION_GAP_NS
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = (
        load_events(spark, SF)
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    sessions = []
    for u in by_user:
        evs = sorted(by_user[u])
        cur = [evs[0]]
        for prev, nxt in zip(evs, evs[1:]):
            if nxt[0] - prev[0] > SESSION_GAP_NS:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
    return sessions


def test_prefixspan_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        SEQ_TOP_K,
        prefixspan_topk,
    )

    sessions = _sessions(spark)
    support = Counter()
    for s in sessions:
        types = [t for _, _, t in s]  # already time-ordered
        found = set()
        n = len(types)
        for i in range(n):
            found.add((types[i],))
            for j in range(i + 1, n):
                found.add((types[i], types[j]))
                for k in range(j + 1, n):
                    found.add((types[i], types[j], types[k]))
        for pat in found:
            support[pat] += 1
    ranked = sorted(
        ((">".join(p), len(p), c) for p, c in support.items()),
        key=lambda x: (-x[2], x[0]),
    )[:SEQ_TOP_K]
    rows = prefixspan_topk(spark, SF).collect()
    assert [(r["pattern"], r["length"], r["support"]) for r in rows] == ranked
    assert rows[0]["n_sessions"] == len(sessions)


def test_forecast_error_audit_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        FC_EVAL_MIN_D,
        FC_SEASON,
        forecast_error_audit,
    )
    from cgtcalc_data_transformer_spark.operators.timeseries import (
        _daily_grid,
    )

    grid = defaultdict(dict)
    for r in _daily_grid(spark, SF).collect():
        grid[r["event_type"]][r["d"]] = r["y"]
    rows = {r["event_type"]: r for r in forecast_error_audit(spark, SF).collect()}
    alpha = 0.2
    for t, days in grid.items():
        dmax = max(days)
        # exact float SES recursion z_t = alpha*y_t + (1-alpha)*z_{t-1}
        z = {0: float(days[0])}
        for d in range(1, dmax + 1):
            z[d] = alpha * days[d] + (1 - alpha) * z[d - 1]
        ae_n = ae_s = ae_e = 0.0
        n_eval = 0
        for d in range(FC_EVAL_MIN_D, dmax + 1):
            n_eval += 1
            ae_n += abs(days[d] - days[d - 1])
            ae_s += abs(days[d] - days[d - FC_SEASON])
            ae_e += abs(days[d] - z[d - 1])
        r = rows[t]
        assert r["n_eval"] == n_eval
        assert r["mae_naive"] == ae_n / n_eval  # exact integer ratio
        assert r["mae_snaive"] == ae_s / n_eval
        # SES weights are 1e-12-grid literals truncated at 120 days —
        # ppm-level drift vs the float recursion
        assert abs(r["mae_ses"] - ae_e / n_eval) < 1e-3
        assert abs(r["mase_naive"] - ae_n / ae_s) < 1e-6
        assert abs(r["mase_ses"] - ae_e / ae_s) < 1e-3


def test_quantile_sketch_audit_matches_sorted_truth(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        QS_BINS,
        quantile_sketch_audit,
    )

    vals = sorted(
        (r["o_totalprice"], r["o_orderkey"])
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    n = len(vals)
    lo, hi = vals[0][0], vals[-1][0]
    width = (hi - lo) / QS_BINS
    rows = {r["qt"]: r for r in quantile_sketch_audit(spark, SF).collect()}
    assert set(rows) == {50, 95}
    for qt, r in rows.items():
        k = (qt * n + 99) // 100  # ceiling rank
        assert r["n"] == n and r["k"] == k
        assert r["exact"] == vals[k - 1][0]  # exact order statistic
        # the sketch's error bound is one bin width
        assert abs(r["est"] - r["exact"]) <= width + 1e-9
        assert r["err_micro"] == int(abs(r["est"] - r["exact"]) * 10**6 + 0.5)


def _quant_by_status(spark):
    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_linestatus")
        .collect()
    )
    a = [int(r["l_quantity"]) for r in rows if r["l_linestatus"] == "F"]
    b = [int(r["l_quantity"]) for r in rows if r["l_linestatus"] == "O"]
    return a, b


def test_energy_distance_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        energy_distance_test,
    )

    a, b = _quant_by_status(spark)
    ca, cb = Counter(a), Counter(b)
    sab = sum(ca[u] * cb[v] * abs(u - v) for u in ca for v in cb)
    saa = sum(ca[u] * ca[v] * abs(u - v) for u in ca for v in ca)
    sbb = sum(cb[u] * cb[v] * abs(u - v) for u in cb for v in cb)
    na, nb = len(a), len(b)
    e = 2 * sab / (na * nb) - saa / (na * na) - sbb / (nb * nb)
    t = na * nb / (na + nb) * e
    row = energy_distance_test(spark, SF).collect()[0]
    assert row["na"] == na and row["nb"] == nb
    assert abs(row["e_dist_micro"] - int(e * 10**6 + 0.5)) <= 1
    assert abs(row["t_stat_micro"] - int(t * 10**6 + 0.5)) <= 1


def test_cramer_von_mises_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        cramer_von_mises,
    )

    a, b = _quant_by_status(spark)
    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    nn = na + nb
    vals = sorted(set(a) | set(b))
    cum_a = cum_b = 0
    s = 0.0
    for v in vals:
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        d = cum_a / na - cum_b / nb
        s += (ca.get(v, 0) + cb.get(v, 0)) * d * d
    t = (na / nn) * (nb / nn) * s
    row = cramer_von_mises(spark, SF).collect()[0]
    assert row["na"] == na and row["nb"] == nb
    assert abs(row["cvm_t_micro"] - int(t * 10**6 + 0.5)) <= 2
    assert row["significant"] == (t > 0.461)


def test_transitivity_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        transitivity_parts,
    )

    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in rows:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = 0
    for u, v in edges:
        tri += len(adj[u] & adj[v])
    tri //= 3  # each triangle seen from its 3 edges
    wedges = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in adj)
    row = transitivity_parts(spark, SF).collect()[0]
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri
    assert row["n_wedges"] == wedges
    assert row["transitivity_micro"] == int(3 * tri / wedges * 10**6 + 0.5)


def test_hampel_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        HAMPEL_HALF,
        HAMPEL_K_X10K,
        hampel_filter_daily,
    )
    from cgtcalc_data_transformer_spark.operators.timeseries import _daily_grid

    grid = defaultdict(dict)
    for r in _daily_grid(spark, SF).collect():
        grid[r["event_type"]][r["d"]] = r["y"]
    rows = {r["event_type"]: r for r in hampel_filter_daily(spark, SF).collect()}
    for t, days in grid.items():
        dmax = max(days)
        n_eval = n_out = 0
        max_dev = 0
        for d in range(HAMPEL_HALF, dmax - HAMPEL_HALF + 1):
            win = sorted(days[i] for i in range(d - HAMPEL_HALF, d + HAMPEL_HALF + 1))
            med = win[HAMPEL_HALF]
            mad = sorted(abs(x - med) for x in win)[HAMPEL_HALF]
            dev = abs(days[d] - med)
            n_eval += 1
            max_dev = max(max_dev, dev)
            if (mad > 0 and dev * 10**4 > HAMPEL_K_X10K * mad) or (
                mad == 0 and dev > 0
            ):
                n_out += 1
        r = rows[t]
        assert r["n_eval"] == n_eval
        assert r["n_outliers"] == n_out
        assert r["max_abs_dev"] == max_dev


def test_platt_scaling_matches_naive_irls(spark):
    from cgtcalc_data_transformer_spark.operators.embedding_ops import (
        _nearest_centroid_scores,
    )
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        PLATT_BIN,
        platt_scaling,
    )
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        LOGIT_ITERS,
        _logit_step,
    )

    per_vec = _nearest_centroid_scores(spark, SF).collect()
    bins = Counter()
    wins = Counter()
    for r in per_vec:
        x = max(r["conf_i"], 0) // PLATT_BIN
        bins[x] += 1
        wins[x] += r["correct"]
    table = sorted((x, bins[x], wins[x]) for x in bins)
    b0, b1 = 0.0, 0.0
    for _ in range(LOGIT_ITERS):
        b0, b1 = _logit_step(table, b0, b1)
    row = platt_scaling(spark, SF).collect()[0]
    assert row["n"] == sum(bins.values())
    assert row["beta0"] == b0  # identical quantized rational walk
    assert row["beta1"] == b1
    # the sigmoid slope should be positive: higher confidence, more
    # correct (the calibration signal Platt exists to capture)
    assert b1 > 0


def test_bloom_fpr_realized_close_to_theory(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        BLOOM_K,
        BLOOM_M,
        bloom_fpr_audit,
    )

    row = bloom_fpr_audit(spark, SF).collect()[0]
    assert row["m_bits"] == BLOOM_M and row["k_hashes"] == BLOOM_K
    assert row["n_false_pos"] <= row["n_probes"]
    # bits_set sanity: at most k*n distinct positions
    assert row["bits_set"] <= BLOOM_K * row["n_members"]
    import math

    theory = (1 - math.exp(-BLOOM_K * row["n_members"] / BLOOM_M)) ** BLOOM_K
    assert abs(row["fpr_theory_micro"] / 10**6 - theory) < 2e-6
    # realized FPR within an order of magnitude of theory (tiny n at
    # sf0.001 → wide binomial noise; the audit's job is the COMPARISON)
    assert row["fpr_real"] <= max(10 * theory, 0.01)


def test_logrank_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.events import DAY_NS
    from cgtcalc_data_transformer_spark.operators.stats10 import logrank_test
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = (
        load_events(spark, SF).select("user_id", "ts", "event_type").collect()
    )
    first = {}
    first_p = {}
    horizon = 0
    for r in rows:
        d = r["ts"] // DAY_NS
        horizon = max(horizon, d)
        u = r["user_id"]
        first[u] = min(first.get(u, d), d)
        if r["event_type"] == "purchase":
            first_p[u] = min(first_p.get(u, d), d)
    users = []  # (group, duration, event)
    for u in first:
        if u in first_p:
            users.append((u % 2, first_p[u] - first[u], 1))
        else:
            users.append((u % 2, horizon - first[u], 0))
    times = sorted({t for _, t, e in users if True})
    o0 = sum(e for g, _, e in users if g == 0)
    o1 = sum(e for g, _, e in users if g == 1)
    e0 = v = 0.0
    for t in times:
        d0 = sum(e for g, tt, e in users if g == 0 and tt == t)
        d1 = sum(e for g, tt, e in users if g == 1 and tt == t)
        n0 = sum(1 for g, tt, _ in users if g == 0 and tt >= t)
        n1 = sum(1 for g, tt, _ in users if g == 1 and tt >= t)
        d, n = d0 + d1, n0 + n1
        if d == 0 or n <= 1:
            continue
        e0 += d * n0 / n
        v += d * (n0 / n) * (n1 / n) * (n - d) / (n - 1)
    chi2 = (o0 - e0) ** 2 / v
    row = logrank_test(spark, SF).collect()[0]
    assert row["o0"] == o0 and row["o1"] == o1
    assert abs(row["e0_micro"] - int(e0 * 10**6 + 0.5)) <= 2
    assert abs(row["chi2_micro"] / 10**6 - chi2) < 1e-3
    assert row["significant"] == (row["chi2_micro"] / 10**6 > 3.841459)


def test_chow_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import chow_test
    from cgtcalc_data_transformer_spark.operators.timeseries import _daily_grid

    grid = defaultdict(dict)
    for r in _daily_grid(spark, SF).collect():
        grid[r["event_type"]][r["d"]] = r["y"]
    rows = {r["event_type"]: r for r in chow_test(spark, SF).collect()}

    def ssr(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts) - sx * sx / n
        sxy = sum(x * y for x, y in pts) - sx * sy / n
        syy = sum(y * y for _, y in pts) - sy * sy / n
        return syy - sxy * sxy / sxx

    for t, dd in grid.items():
        dmax = max(dd)
        brk = dmax // 2
        pts = [(d, dd[d]) for d in sorted(dd)]
        s1 = [(x, y) for x, y in pts if x < brk]
        s2 = [(x, y) for x, y in pts if x >= brk]
        f = ((ssr(pts) - ssr(s1) - ssr(s2)) / 2) / (
            (ssr(s1) + ssr(s2)) / (len(pts) - 4)
        )
        r = rows[t]
        assert r["n_days"] == len(pts)
        assert abs(r["f_micro"] / 10**6 - f) < 1e-4
        assert r["break_detected"] == (r["f_micro"] / 10**6 > 2.9957)


def test_dunn_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        DUNN_Z_CRIT,
        dunn_posthoc_test,
    )

    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_returnflag")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r["l_returnflag"]].append(int(r["l_quantity"]))
    pooled = sorted(v for g in groups.values() for v in g)
    nn = len(pooled)
    # midrank per value
    mid = {}
    i = 0
    while i < nn:
        j = i
        while j < nn and pooled[j] == pooled[i]:
            j += 1
        mid[pooled[i]] = (i + 1 + j) / 2
        i = j
    ties = sum(
        c**3 - c for c in Counter(pooled).values()
    )
    bv = nn * (nn + 1) / 12 - ties / (12 * (nn - 1))
    got = {r["pair"]: r for r in dunn_posthoc_test(spark, SF).collect()}
    for g1, g2 in (("A", "N"), ("A", "R"), ("N", "R")):
        m1 = sum(mid[v] for v in groups[g1]) / len(groups[g1])
        m2 = sum(mid[v] for v in groups[g2]) / len(groups[g2])
        import math

        z = (m1 - m2) / math.sqrt(bv * (1 / len(groups[g1]) + 1 / len(groups[g2])))
        r = got[f"{g1}-{g2}"]
        assert r["n1"] == len(groups[g1]) and r["n2"] == len(groups[g2])
        assert abs(r["z_micro"] / 10**6 - z) < 1e-5
        assert r["significant"] == (abs(z) > DUNN_Z_CRIT)


def test_spectral_entropy_matches_naive(spark):
    import math

    from cgtcalc_data_transformer_spark.operators.series8 import (
        _PG_COS,
        _PG_SIN,
        PG_PERIODS,
    )
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        spectral_entropy_daily,
    )
    from cgtcalc_data_transformer_spark.operators.timeseries import _daily_grid

    grid = defaultdict(dict)
    for r in _daily_grid(spark, SF).collect():
        grid[r["event_type"]][r["d"]] = r["y"]
    rows = {r["event_type"]: r for r in spectral_entropy_daily(spark, SF).collect()}
    for t, dd in grid.items():
        powers = {}
        for p in PG_PERIODS:
            c = sum(y * _PG_COS[p][d % p] for d, y in dd.items())
            s = sum(y * _PG_SIN[p][d % p] for d, y in dd.items())
            powers[p] = c * c + s * s
        tot = sum(powers.values())
        shares = {p: powers[p] / tot for p in PG_PERIODS}
        h = -sum(s * math.log(s) for s in shares.values() if s > 0) / math.log(
            len(PG_PERIODS)
        )
        r = rows[t]
        for p in PG_PERIODS:
            assert abs(r[f"share{p}_micro"] / 10**6 - shares[p]) < 2e-6
        assert abs(r["entropy_micro"] / 10**6 - h) < 2e-6
        assert 0 <= r["entropy_micro"] <= 10**6


def test_weighted_kappa_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        weighted_kappa_transitions,
    )

    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .collect()
    )
    flag_code = {"A": 0, "N": 1, "R": 2}
    per_order = defaultdict(list)
    for r in rows:
        per_order[r["l_orderkey"]].append(
            (int(r["l_linenumber"]), int(r["l_quantity"]), flag_code[r["l_returnflag"]])
        )
    table = Counter()
    for lines in per_order.values():
        if len(lines) < 2:
            continue
        lines.sort()
        table[(lines[0][2], lines[-1][2])] += 1
    n = sum(table.values())
    rm = Counter()
    cm = Counter()
    for (i, j), c in table.items():
        rm[i] += c
        cm[j] += c
    po = sum(c for (i, j), c in table.items() if i == j) / n
    pe = sum(rm[i] * cm[i] for i in rm if i in cm) / n**2
    kappa = (po - pe) / (1 - pe)
    wo = sum(abs(i - j) * c for (i, j), c in table.items()) / n
    we = sum(abs(i - j) * rm[i] * cm[j] for i in rm for j in cm) / n**2
    kw = 1 - wo / we
    row = weighted_kappa_transitions(spark, SF).collect()[0]
    assert row["n"] == n
    assert abs(row["po_micro"] / 10**6 - po) < 2e-6
    assert abs(row["pe_micro"] / 10**6 - pe) < 2e-6
    assert abs(row["kappa_micro"] / 10**6 - kappa) < 1e-5
    assert abs(row["kappa_w_micro"] / 10**6 - kw) < 1e-5


def test_anderson_darling_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        AD_CRIT_5PCT,
        anderson_darling_2sample,
    )

    a, b = _quant_by_status(spark)
    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    nn = na + nb
    vals = sorted(set(a) | set(b))
    ma = mb = 0
    a2 = 0.0
    for v in vals:
        ma += ca.get(v, 0)
        mb += cb.get(v, 0)
        bt = ma + mb
        if bt >= nn:
            continue
        ll = ca.get(v, 0) + cb.get(v, 0)
        a2 += (ll / nn) * (nn * ma - na * bt) ** 2 / (bt * (nn - bt)) / na
        a2 += (ll / nn) * (nn * mb - nb * bt) ** 2 / (bt * (nn - bt)) / nb
    row = anderson_darling_2sample(spark, SF).collect()[0]
    assert row["na"] == na and row["nb"] == nb
    assert abs(row["a2_micro"] / 10**6 - a2) < 1e-4
    assert row["significant"] == (row["a2_micro"] / 10**6 > AD_CRIT_5PCT)
