"""Round-10 operator tests: independent naive-Python cross-checks for
the stats9 family (ordered/robust rank tests, stratified epidemiology,
CUPED, nominal association) — textbook dict/loop formulations sharing
no code with the Spark cell-table plans. Includes named regression
tests for the three ADVICE r9 defects (CUPED split-day division,
Cramér missing-cell correction, Bowker one-sided-pair drop) and the
warehouse-dir leak.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


def _priority_delay_pairs(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    rows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_orderpriority", "o_orderdate", "l_shipdate")
        .collect()
    )
    return [
        (int(r["o_orderpriority"][0]), (r["l_shipdate"] - r["o_orderdate"]).days)
        for r in rows
    ]


def test_jonckheere_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats9 import (
        jonckheere_terpstra,
    )

    data = _priority_delay_pairs(spark)
    cells = Counter(data)  # (x, y) -> count; ≤ 5 × |delay domain|
    items = list(cells.items())
    cc = dd = ee = 0
    for (x1, y1), c1 in items:
        for (x2, y2), c2 in items:
            if x2 > x1:
                if y2 > y1:
                    cc += c1 * c2
                elif y2 < y1:
                    dd += c1 * c2
                else:
                    ee += c1 * c2
    n = len(data)
    tx = Counter(x for x, _ in data)
    ty = Counter(y for _, y in data)

    def v_terms(t):
        return (
            sum(c * (c - 1) * (2 * c + 5) for c in t.values()),
            sum(c * (c - 1) * (c - 2) for c in t.values()),
            sum(c * (c - 1) for c in t.values()),
        )

    vtx, t3x, t2x = v_terms(tx)
    vty, t3y, t2y = v_terms(ty)
    var = (
        (n * (n - 1) * (2 * n + 5) - vtx - vty) / 18.0
        + t3x * t3y / (9.0 * n * (n - 1) * (n - 2))
        + t2x * t2y / (2.0 * n * (n - 1))
    )
    z = (cc - dd) / math.sqrt(var)
    row = jonckheere_terpstra(spark, SF).collect()[0]
    assert row["n"] == n
    assert int(row["s_stat"]) == cc - dd
    assert int(row["jt2"]) == 2 * cc + ee
    assert abs(row["z"] - z) < 1e-5
    assert row["significant"] == (abs(z) > 1.96)


def test_brunner_munzel_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats9 import brunner_munzel

    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_linestatus")
        .collect()
    )
    a = sorted(int(r["l_quantity"]) for r in rows if r["l_linestatus"] == "F")
    b = sorted(int(r["l_quantity"]) for r in rows if r["l_linestatus"] == "O")

    def midranks(universe_counts):
        """value -> midrank of that value within the multiset."""
        out, below = {}, 0
        for v in sorted(universe_counts):
            c = universe_counts[v]
            out[v] = below + (c + 1) / 2.0
            below += c
        return out

    ca, cb = Counter(a), Counter(b)
    r_all = midranks(ca + cb)
    r_a = midranks(ca)
    r_b = midranks(cb)
    ma, mb = len(a), len(b)
    pa = [r_all[v] - r_a[v] for v in a]  # placements of F sample
    pb = [r_all[v] - r_b[v] for v in b]
    rbar_a = sum(r_all[v] for v in a) / ma
    rbar_b = sum(r_all[v] for v in b) / mb
    sa2 = sum((x - sum(pa) / ma) ** 2 for x in pa) / (ma - 1)
    sb2 = sum((x - sum(pb) / mb) ** 2 for x in pb) / (mb - 1)
    p_hat = (rbar_b - (mb + 1) / 2.0) / ma
    w = ma * mb * (rbar_b - rbar_a) / ((ma + mb) * math.sqrt(ma * sa2 + mb * sb2))
    row = brunner_munzel(spark, SF).collect()[0]
    assert row["m_f"] == ma and row["m_o"] == mb
    assert abs(row["p_hat"] - p_hat) < 1e-6
    assert abs(row["w_stat"] - w) < 1e-5


def test_mantel_haenszel_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats9 import (
        mantel_haenszel_or,
    )

    rows = (
        load_table(spark, SF, "orders")
        .select("o_orderpriority", "o_orderdate", "o_orderstatus")
        .collect()
    )
    cells = defaultdict(lambda: [0, 0, 0, 0])  # a, b, c, d
    for r in rows:
        s = int(r["o_orderpriority"][0])
        e = 1 if r["o_orderdate"].month <= 6 else 0
        y = 1 if r["o_orderstatus"] == "F" else 0
        cells[s][(1 - e) * 2 + (1 - y)] += 1
    strata = [v for v in cells.values() if all(x > 0 for x in v)]
    sum_adn = sum(a * d / (a + b + c + d) for a, b, c, d in strata)
    sum_bcn = sum(b * c / (a + b + c + d) for a, b, c, d in strata)
    num = sum(a - (a + b) * (a + c) / (a + b + c + d) for a, b, c, d in strata)
    var = sum(
        (a + b) * (c + d) * (a + c) * (b + d) / ((a + b + c + d) ** 2 * (a + b + c + d - 1))
        for a, b, c, d in strata
    )
    sw = swl = swl2 = 0.0
    for a, b, c, d in strata:
        w = 1.0 / (1 / a + 1 / b + 1 / c + 1 / d)
        lor = math.log(a * d / (b * c))
        sw += w
        swl += w * lor
        swl2 += w * lor * lor
    row = mantel_haenszel_or(spark, SF).collect()[0]
    assert row["n_strata"] == len(strata)
    assert abs(row["or_mh"] - sum_adn / sum_bcn) < 1e-4
    assert abs(row["cmh_chi2"] - num * num / var) < 1e-3
    assert abs(row["woolf_chi2"] - (swl2 - swl * swl / sw)) < 1e-3


def test_cuped_matches_naive_with_floor_div_split(spark):
    """Named ADVICE r9 regression: the split day must be the INTEGER
    division (mn+mx) div 2 in both engine twins — truncating double
    division picked a different mid day whenever mn+mx was odd."""
    from cgtcalc_data_transformer_spark.operators.events import DAY_NS
    from cgtcalc_data_transformer_spark.operators.stats9 import cuped_adjustment
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = load_events(spark, SF).select("user_id", "ts").collect()
    days = [(r["user_id"], r["ts"] // DAY_NS) for r in rows]
    mn = min(d for _, d in days)
    mx = max(d for _, d in days)
    mid = (mn + mx) // 2  # floor division — the contract under test
    per = defaultdict(lambda: [0, 0])
    for u, d in days:
        per[u][0 if d <= mid else 1] += 1
    xs = [x for x, _ in per.values()]
    ys = [y for _, y in per.values()]
    n = len(per)
    mx_, my_ = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx_) * (y - my_) for x, y in zip(xs, ys))
    vx = sum((x - mx_) ** 2 for x in xs)
    vy = sum((y - my_) ** 2 for y in ys)
    theta = cov / vx
    rho2 = cov * cov / (vx * vy)
    row = cuped_adjustment(spark, SF).collect()[0]
    assert row["n_users"] == n
    assert abs(row["theta"] - theta) < 1e-5
    assert abs(row["rho2"] - rho2) < 1e-5
    assert abs(row["adjusted_var_ratio"] - (1 - rho2)) < 1e-5


def _seg_nation(spark):
    rows = (
        load_table(spark, SF, "customer")
        .select("c_mktsegment", "c_nationkey")
        .collect()
    )
    return [(r["c_mktsegment"], int(r["c_nationkey"])) for r in rows]


def test_cramers_v_counts_unobserved_cells(spark):
    """Named ADVICE r9 regression: χ² must include the e = r·c/n
    contribution of every ABSENT cell (o = 0). sf0.001 has 150
    customers over a 5×25 grid, so the grid is guaranteed incomplete
    and the old observed-only sum would undercount."""
    from cgtcalc_data_transformer_spark.operators.stats9 import (
        cramers_v_segment_nation,
    )

    data = _seg_nation(spark)
    n = len(data)
    obs = Counter(data)
    rmarg = Counter(s for s, _ in data)
    cmarg = Counter(t for _, t in data)
    chi2 = 0.0
    for s in rmarg:
        for t in cmarg:
            e = rmarg[s] * cmarg[t] / n
            o = obs.get((s, t), 0)
            chi2 += (o - e) ** 2 / e
    kmin = min(len(rmarg), len(cmarg)) - 1
    v = math.sqrt(chi2 / (n * kmin))
    row = cramers_v_segment_nation(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["dof"] == (len(rmarg) - 1) * (len(cmarg) - 1)
    assert row["complete_grid"] == (len(obs) == len(rmarg) * len(cmarg))
    assert not row["complete_grid"]  # the scenario the fix exists for
    assert abs(row["chi2"] - chi2) < 1e-3
    assert abs(row["cramers_v"] - v) < 1e-5


def test_mutual_information_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats9 import (
        mutual_information_nominal,
    )

    data = _seg_nation(spark)
    n = len(data)
    obs = Counter(data)
    rmarg = Counter(s for s, _ in data)
    cmarg = Counter(t for _, t in data)
    mi = sum(
        o / n * math.log(n * o / (rmarg[s] * cmarg[t]))
        for (s, t), o in obs.items()
    )
    hx = -sum(r / n * math.log(r / n) for r in rmarg.values())
    hy = -sum(c / n * math.log(c / n) for c in cmarg.values())
    row = mutual_information_nominal(spark, SF).collect()[0]
    assert row["n"] == n
    assert abs(row["mi_nats"] - mi) < 1e-5
    assert abs(row["h_segment"] - hx) < 1e-5
    assert abs(row["h_nation"] - hy) < 1e-5
    assert abs(row["nmi"] - mi / min(hx, hy)) < 1e-4
    assert abs(row["u_segment"] - mi / hx) < 1e-4
    assert abs(row["u_nation"] - mi / hy) < 1e-4


def test_gk_lambda_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats9 import (
        goodman_kruskal_lambda,
    )

    data = _seg_nation(spark)
    n = len(data)
    obs = Counter(data)
    rmarg = Counter(s for s, _ in data)
    cmarg = Counter(t for _, t in data)
    sum_mx = sum(
        max(obs.get((s, t), 0) for s in rmarg) for t in cmarg
    )  # best segment guess per nation
    sum_my = sum(max(obs.get((s, t), 0) for t in cmarg) for s in rmarg)
    lam_seg = (sum_mx - max(rmarg.values())) / (n - max(rmarg.values()))
    lam_nat = (sum_my - max(cmarg.values())) / (n - max(cmarg.values()))
    lam_sym = (
        sum_mx + sum_my - max(rmarg.values()) - max(cmarg.values())
    ) / (2 * n - max(rmarg.values()) - max(cmarg.values()))
    row = goodman_kruskal_lambda(spark, SF).collect()[0]
    assert row["n"] == n
    assert abs(row["lambda_segment"] - lam_seg) < 1e-6
    assert abs(row["lambda_nation"] - lam_nat) < 1e-6
    assert abs(row["lambda_symmetric"] - lam_sym) < 1e-6


def test_bowker_matches_naive_symmetrized(spark):
    """Named ADVICE r9 regression: pairs where n_ij = 0 but n_ji > 0
    must still contribute (their χ² term equals n_ji, plus a dof).
    The naive twin symmetrizes the FULL transition table from scratch
    with tuple ordering, not the BIGINT encode."""
    from cgtcalc_data_transformer_spark.operators.stats9 import bowker_symmetry

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
    pairs = defaultdict(lambda: [0, 0])
    for (i, j), c in table.items():
        if i < j:
            pairs[(i, j)][0] += c
        elif i > j:
            pairs[(j, i)][1] += c
    dof = len(pairs)
    chi2 = sum((f - b) ** 2 / (f + b) for f, b in pairs.values())
    row = bowker_symmetry(spark, SF).collect()[0]
    assert row["dof"] == dof
    assert abs(row["chi2"] - chi2) < 1e-4
    crit = [3.841459, 5.991465, 7.814728][dof - 1]
    assert row["asymmetric"] == (chi2 > crit)


def test_adjusted_rand_index_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats9 import (
        adjusted_rand_index,
    )

    data = _seg_nation(spark)
    n = len(data)
    obs = Counter(data)
    rmarg = Counter(s for s, _ in data)
    cmarg = Counter(t for _, t in data)
    sij2 = sum(o * (o - 1) for o in obs.values())
    sa2 = sum(a * (a - 1) for a in rmarg.values())
    sb2 = sum(b * (b - 1) for b in cmarg.values())
    n2 = n * (n - 1)
    expected = sa2 * sb2 / n2
    ari = (sij2 - expected) / ((sa2 + sb2) / 2 - expected)
    ri = (n2 + 2 * sij2 - sa2 - sb2) / n2
    row = adjusted_rand_index(spark, SF).collect()[0]
    assert row["n"] == n
    assert abs(row["ari"] - ari) < 1e-6
    assert abs(row["rand_index"] - ri) < 1e-6
    # the panel's own sanity contract: raw RI high, chance-corrected
    # ARI near zero on independent labels
    assert ri > 0.5 and abs(ari) < 0.05


def test_warehouse_dir_registers_atexit_cleanup(monkeypatch):
    """Named ADVICE r9 regression: every process used to leak its
    spark_wh_* dir (bucketed parquet copies) into a /tmp that persists
    across runs — _warehouse_dir must register best-effort removal."""
    import shutil

    from cgtcalc_data_transformer_spark import session as sess

    captured = []
    monkeypatch.setattr(sess, "_WAREHOUSE_DIR", None)
    import atexit

    monkeypatch.setattr(
        atexit, "register", lambda fn, *a, **kw: captured.append((fn, a, kw))
    )
    wh = sess._warehouse_dir()
    assert sess._warehouse_dir() == wh  # memoized: registered once
    assert len(captured) == 1
    fn, args, kwargs = captured[0]
    assert fn is shutil.rmtree and args == (wh,)
    assert kwargs.get("ignore_errors") is True
    shutil.rmtree(wh, ignore_errors=True)
