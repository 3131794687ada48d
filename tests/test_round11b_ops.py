"""Round-11 batch-2 operator tests: independent naive-Python
cross-checks (textbook loop/dict formulations, no shared plan
machinery) for the stats11 panel, the two new graph operators and
stupid-backoff scoring, plus parity pins for the factored shared SQL
prefixes (the ADVICE r10 _PER_VEC_SQL discipline).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


# --------------------------------------------------- shared helpers
def _quantity_groups(spark):
    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_linestatus")
        .collect()
    )
    a = [int(r["l_quantity"]) for r in rows if r["l_linestatus"] == "F"]
    b = [int(r["l_quantity"]) for r in rows if r["l_linestatus"] == "O"]
    return a, b


def _hash_bucket(key, buckets=100):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % buckets


def _tokens(text):
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


# ------------------------------------------------------ wasserstein
def test_wasserstein_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        wasserstein_quantity,
    )

    a, b = _quantity_groups(spark)
    vals = sorted(set(a) | set(b))
    ca = Counter(a)
    cb = Counter(b)
    w1 = 0.0
    cum_a = cum_b = 0
    for v, nv in zip(vals, vals[1:]):
        cum_a += ca[v]
        cum_b += cb[v]
        w1 += abs(cum_a / len(a) - cum_b / len(b)) * (nv - v)
    row = wasserstein_quantity(spark, SF).collect()[0]
    assert row["na"] == len(a) and row["nb"] == len(b)
    assert abs(row["w1_micro"] / 1e6 - w1) < 2e-6


# ------------------------------------------------ divergence panel
def test_distribution_distance_panel_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        distribution_distance_panel,
    )

    a, b = _quantity_groups(spark)
    ca, cb = Counter(a), Counter(b)
    vals = sorted(set(a) | set(b))
    tv = hl2 = js = 0.0
    for v in vals:
        p, q = ca[v] / len(a), cb[v] / len(b)
        tv += abs(p - q) / 2
        hl2 += (math.sqrt(p) - math.sqrt(q)) ** 2 / 2
        m = (p + q) / 2
        if p > 0:
            js += p / 2 * math.log(p / m)
        if q > 0:
            js += q / 2 * math.log(q / m)
    row = distribution_distance_panel(spark, SF).collect()[0]
    assert abs(row["tv_micro"] / 1e6 - tv) < 2e-6
    assert abs(row["hellinger_micro"] / 1e6 - math.sqrt(hl2)) < 2e-6
    assert abs(row["js_micro"] / 1e6 - js) < 2e-6
    # sanity: Hellinger² between TV²-flavored bounds, JS ≥ 0
    assert 0 <= row["tv_micro"] and 0 <= row["js_micro"]


# ------------------------------------------------- Ansari-Bradley
def test_ansari_bradley_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        ansari_bradley_test,
    )

    a, b = _quantity_groups(spark)
    pooled = sorted(a + b)
    n = len(pooled)
    # per-rank AB scores with midrank tie averaging: group equal
    # values, average min(r, N+1-r) across the tied rank block
    scores = {}
    i = 0
    while i < n:
        jx = i
        while jx < n and pooled[jx] == pooled[i]:
            jx += 1
        block = [min(r, n + 1 - r) for r in range(i + 1, jx + 1)]
        scores[pooled[i]] = sum(block) / len(block)
        i = jx
    w = sum(scores[v] for v in a)
    all_scores = [scores[v] for v in pooled]
    t1 = sum(all_scores)
    ew = len(a) * t1 / n
    var = (
        len(a)
        * len(b)
        * (sum(s * s for s in all_scores) - t1 * t1 / n)
        / (n * (n - 1))
    )
    z = (w - ew) / math.sqrt(var)
    row = ansari_bradley_test(spark, SF).collect()[0]
    assert abs(row["w_micro"] / 1e6 - w) < 5e-5 * max(1.0, abs(w))
    assert abs(row["ew_micro"] / 1e6 - ew) < 5e-5 * max(1.0, abs(ew))
    assert abs(row["z_micro"] / 1e6 - z) < 1e-4
    assert row["significant"] == (abs(z) > 1.959964)


# ----------------------------------------- gamma / Somers' d panel
def test_ordinal_association_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        ordinal_association_panel,
    )

    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_discount")
        .collect()
    )
    data = [
        (int(r["l_quantity"]), int(math.floor(float(r["l_discount"]) * 100 + 0.5)))
        for r in rows
    ]
    cells = Counter(data)
    items = list(cells.items())
    cc = dd = 0
    for (x1, y1), c1 in items:
        for (x2, y2), c2 in items:
            if x2 > x1 and y2 > y1:
                cc += c1 * c2
            elif x2 > x1 and y2 < y1:
                dd += c1 * c2
    n = len(data)
    tx = Counter(x for x, _ in data)
    ty = Counter(y for _, y in data)
    t1x2 = sum(c * (c - 1) for c in tx.values())
    t1y2 = sum(c * (c - 1) for c in ty.values())
    n0x2 = n * (n - 1)
    gamma = (cc - dd) / (cc + dd)
    d_yx = (cc - dd) / ((n0x2 - t1x2) / 2)
    d_xy = (cc - dd) / ((n0x2 - t1y2) / 2)
    row = ordinal_association_panel(spark, SF).collect()[0]
    assert row["concordant"] == float(cc) and row["discordant"] == float(dd)
    assert abs(row["gamma"] - round(gamma, 6)) < 2e-6
    assert abs(row["somers_d_yx"] - round(d_yx, 6)) < 2e-6
    assert abs(row["somers_d_xy"] - round(d_xy, 6)) < 2e-6


# ------------------------------------------------------- Atkinson
def test_atkinson_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import atkinson_index

    rows = (
        load_table(spark, SF, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    spend = defaultdict(float)
    for r in rows:
        spend[r["o_custkey"]] += float(r["o_totalprice"])
    xs = list(spend.values())
    mu = sum(xs) / len(xs)
    a05 = 1 - (sum(math.sqrt(x / mu) for x in xs) / len(xs)) ** 2
    a1 = 1 - math.exp(sum(math.log(x / mu) for x in xs) / len(xs))
    a2 = 1 - 1 / (sum(mu / x for x in xs) / len(xs))
    row = atkinson_index(spark, SF).collect()[0]
    assert row["n_entities"] == len(xs)
    assert abs(row["atkinson_05_micro"] / 1e6 - a05) < 5e-6
    assert abs(row["atkinson_1_micro"] / 1e6 - a1) < 5e-6
    assert abs(row["atkinson_2_micro"] / 1e6 - a2) < 5e-6
    # Atkinson ordering: more aversion => larger index on skewed data
    assert row["atkinson_05_micro"] <= row["atkinson_1_micro"] <= row["atkinson_2_micro"]


# ---------------------------------------------------- l-diversity
def test_l_diversity_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        l_diversity_audit,
    )

    rows = (
        load_table(spark, SF, "customer")
        .select("c_nationkey", "c_mktsegment", "c_acctbal")
        .collect()
    )
    classes = defaultdict(list)
    for r in rows:
        band = math.floor(float(r["c_acctbal"]) / 1000.0)
        classes[(r["c_nationkey"], r["c_mktsegment"])].append(band)
    hist = defaultdict(lambda: [0, 0, None])  # l -> [n_classes, n_rows, min]
    for vals in classes.values():
        l = len(set(vals))
        h = hist[l]
        h[0] += 1
        h[1] += len(vals)
        h[2] = len(vals) if h[2] is None else min(h[2], len(vals))
    got = {r["l"]: r for r in l_diversity_audit(spark, SF).collect()}
    assert set(got) == set(hist)
    for l, (nc, nr, mn) in hist.items():
        assert got[l]["n_classes"] == nc
        assert got[l]["n_rows"] == nr
        assert got[l]["min_class_size"] == mn
        assert got[l]["violates_policy"] == (l < 3)


# ---------------------------------------------------- t-closeness
def test_t_closeness_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        t_closeness_audit,
    )

    rows = (
        load_table(spark, SF, "customer")
        .select("c_nationkey", "c_mktsegment", "c_acctbal")
        .collect()
    )
    classes = defaultdict(Counter)
    glob = Counter()
    for r in rows:
        band = math.floor(float(r["c_acctbal"]) / 1000.0)
        classes[(r["c_nationkey"], r["c_mktsegment"])][band] += 1
        glob[band] += 1
    bands = sorted(glob)
    m = len(bands)
    gn = sum(glob.values())
    got = {
        (r["nat"], r["seg"]): r for r in t_closeness_audit(spark, SF).collect()
    }
    assert set(got) == set(classes)
    for key, cnts in classes.items():
        sz = sum(cnts.values())
        emd = 0.0
        cum_c = cum_g = 0
        for bd in bands:
            cum_c += cnts[bd]
            cum_g += glob[bd]
            emd += abs(cum_c / sz - cum_g / gn) / (m - 1)
        assert got[key]["sz"] == sz
        assert abs(got[key]["emd_micro"] / 1e6 - emd) < 2e-5
        assert got[key]["exceeds_t"] == (
            (got[key]["emd_micro"] > 0.2e6)
            if abs(emd - 0.2) > 1e-4
            else got[key]["exceeds_t"]
        )


# -------------------------------------------------------- Hurst R/S
def test_hurst_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.events import DAY_NS
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        HURST_SIZES,
        hurst_rescaled_range,
    )
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    days = [
        r["day"]
        for r in load_events(spark, SF)
        .selectExpr(f"ts div {DAY_NS} as day")
        .collect()
    ]
    dmin, dmax = min(days), max(days)
    series = [0] * (dmax - dmin + 1)
    for d in days:
        series[d - dmin] += 1
    per_size = {}
    for s in HURST_SIZES:
        logs = []
        for b0 in range(0, len(series) - s + 1, s):
            block = series[b0 : b0 + s]
            mean = sum(block) / s
            cum, cums = 0.0, []
            for y in block:
                cum += y - mean
                cums.append(cum)
            r = max(cums) - min(cums)
            var = sum((y - mean) ** 2 for y in block) / s
            if r > 0 and var > 0:
                logs.append(math.log(r / math.sqrt(var)))
        if logs:
            per_size[s] = sum(logs) / len(logs)
    xs = [math.log(float(s)) for s in per_size]
    ys = [per_size[s] for s in per_size]
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    rows = hurst_rescaled_range(spark, SF).collect()
    assert [r["block_size"] for r in rows] == sorted(per_size)
    for r in rows:
        assert abs(r["avg_log_rs_nano"] / 1e9 - per_size[r["block_size"]]) < 1e-6
        assert abs(r["hurst_micro"] / 1e6 - slope) < 1e-4


# ------------------------------------------------------ Weibull fit
def test_weibull_fit_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.events import DAY_NS
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        weibull_survival_fit,
    )
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = (
        load_events(spark, SF)
        .selectExpr("user_id", "event_type", f"ts div {DAY_NS} as day")
        .collect()
    )
    first_day = {}
    first_purchase = {}
    for r in rows:
        u = r["user_id"]
        first_day[u] = min(first_day.get(u, r["day"]), r["day"])
        if r["event_type"] == "purchase":
            first_purchase[u] = min(first_purchase.get(u, r["day"]), r["day"])
    horizon = max(r["day"] for r in rows)
    durs = []
    for u, fd in first_day.items():
        if u in first_purchase:
            durs.append((first_purchase[u] - fd, 1))
        else:
            durs.append((horizon - fd, 0))
    # naive KM, then ln(-ln S) on ln t
    per_t = defaultdict(lambda: [0, 0])
    for t, e in durs:
        per_t[t][0] += e
        per_t[t][1] += 1 - e
    pts = []
    s = 1.0
    zero = False  # S(t) hits exact 0 once every at-risk user converts
    for t in sorted(per_t):
        d = per_t[t][0]
        n_risk = sum(dd + cc for u, (dd, cc) in per_t.items() if u >= t)
        if d > 0 and n_risk == d:
            zero = True
        if d > 0 and n_risk > d:
            s *= 1 - d / n_risk
        if not zero and t >= 1 and 0 < s < 1:
            pts.append((math.log(t), math.log(-math.log(s))))
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    shape = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    intercept = (sy - shape * sx) / k
    scale = math.exp(-intercept / shape)
    row = weibull_survival_fit(spark, SF).collect()[0]
    assert row["n_points"] == k
    assert abs(row["shape_micro"] / 1e6 - shape) < 1e-3
    assert abs(row["scale_micro"] / 1e6 - scale) / scale < 1e-3
    assert 0 <= row["r2_micro"] <= 10**6


# ------------------------------------------------------------- SPRT
def test_sprt_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.events import DAY_NS
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        SPRT_A_N,
        SPRT_B_N,
        SPRT_L0_N,
        SPRT_L1_N,
        sprt_sequential_audit,
    )
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = (
        load_events(spark, SF)
        .selectExpr("user_id", "event_type", f"ts div {DAY_NS} as day")
        .collect()
    )
    dmin = min(r["day"] for r in rows)
    daily = defaultdict(lambda: [0, 0])  # (variant, d) -> [n, conv]
    for r in rows:
        v = "A" if _hash_bucket(r["user_id"], 2) == 0 else "B"
        cell = daily[(v, r["day"] - dmin)]
        cell[0] += 1
        cell[1] += 1 if r["event_type"] == "purchase" else 0
    got = {r["variant"]: r for r in sprt_sequential_audit(spark, SF).collect()}
    for variant in ("A", "B"):
        ds = sorted(d for v, d in daily if v == variant)
        ncum = ccum = 0
        first_h1 = first_h0 = None
        llr = 0
        for d in ds:
            n, c = daily[(variant, d)]
            ncum += n
            ccum += c
            llr = ccum * SPRT_L1_N + (ncum - ccum) * SPRT_L0_N
            if first_h1 is None and llr >= SPRT_A_N:
                first_h1 = d
            if first_h0 is None and llr <= SPRT_B_N:
                first_h0 = d
        if first_h1 is not None and (first_h0 is None or first_h1 < first_h0):
            decision = "accept_h1"
        elif first_h0 is not None:
            decision = "accept_h0"
        else:
            decision = "continue"
        cross = min(
            x for x in (first_h1, first_h0, 10**9) if x is not None
        )
        cross = -1 if cross == 10**9 else cross
        g = got[variant]
        assert g["n_days"] == len(ds)
        assert g["n_total"] == ncum and g["conv_total"] == ccum
        assert g["decision"] == decision
        assert g["cross_day"] == cross
        assert abs(g["llr_final_micro"] / 1e6 - llr / 1e9) < 2e-6


# ----------------------------------------------- Holm / Fisher meta
def _naive_pvalues(spark):
    from cgtcalc_data_transformer_spark.operators.events import DAY_NS
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = (
        load_events(spark, SF)
        .selectExpr("event_type", f"ts div {DAY_NS} as day")
        .collect()
    )
    dmin = min(r["day"] for r in rows)
    dmax = max(r["day"] for r in rows)
    mid = (dmin + dmax) // 2
    per = defaultdict(lambda: [0, 0])
    for r in rows:
        per[r["event_type"]][0 if r["day"] <= mid else 1] += 1
    n1 = sum(v[0] for v in per.values())
    n2 = sum(v[1] for v in per.values())
    out = {}
    for et, (c1, c2) in per.items():
        p1, p2 = c1 / n1, c2 / n2
        pp = (c1 + c2) / (n1 + n2)
        z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
        # A&S 7.1.26 tail, the same closed form both engines use
        x = abs(z) / math.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (
            0.254829592 * t
            - 0.284496736 * t**2
            + 1.421413741 * t**3
            - 1.453152027 * t**4
            + 1.061405429 * t**5
        )
        out[et] = (z, poly * math.exp(-x * x))
    return out


def test_holm_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        holm_bonferroni_panel,
    )

    pv = _naive_pvalues(spark)
    m = len(pv)
    order = sorted(pv, key=lambda et: (pv[et][1], et))
    adj = {}
    running = 0.0
    for i, et in enumerate(order):
        running = max(running, (m - i) * pv[et][1])
        adj[et] = running
    got = {r["event_type"]: r for r in holm_bonferroni_panel(spark, SF).collect()}
    assert set(got) == set(pv)
    for et in pv:
        assert abs(got[et]["p_value"] - round(pv[et][1], 6)) < 2e-6
        assert abs(got[et]["adj_p"] - round(min(1.0, adj[et]), 6)) < 2e-6
        assert got[et]["rejected"] == (adj[et] <= 0.05)
    # step-down monotonicity: rejections form a prefix of the ranking
    flags = [got[et]["rejected"] for et in order]
    assert flags == sorted(flags, reverse=True)


def test_fisher_meta_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        FISHER_CHI2_CRIT_95,
        fisher_combined_meta,
    )

    pv = _naive_pvalues(spark)
    x = -2.0 * sum(math.log(p) for _, p in pv.values())
    row = fisher_combined_meta(spark, SF).collect()[0]
    assert row["n_tests"] == len(pv)
    assert row["dof"] == 2 * len(pv)
    assert abs(row["x_stat_micro"] / 1e6 - x) < 5e-6
    crit = FISHER_CHI2_CRIT_95[row["dof"]]
    assert abs(row["crit_micro"] / 1e6 - crit) < 2e-6
    assert row["significant"] == (x > crit)


# ------------------------------------------------- Jaccard links
def test_jaccard_links_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.graph import (
        AA_MIN_COMMON,
        AA_MIN_ORDERS,
        jaccard_link_prediction,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    rows = li.join(orders, li.l_orderkey == orders.o_orderkey).collect()
    per = defaultdict(set)
    for r in rows:
        per[(r["o_custkey"], r["l_suppkey"])].add(r["l_orderkey"])
    nbrs = defaultdict(set)
    for (c, s), orders_ in per.items():
        if len(orders_) >= AA_MIN_ORDERS:
            nbrs[s].add(c)
    sups = sorted(nbrs)
    expect = {}
    for i, s1 in enumerate(sups):
        for s2 in sups[i + 1 :]:
            common = len(nbrs[s1] & nbrs[s2])
            if common >= AA_MIN_COMMON:
                union = len(nbrs[s1] | nbrs[s2])
                expect[(s1, s2)] = (
                    common,
                    len(nbrs[s1]),
                    len(nbrs[s2]),
                    math.floor(common / union * 1e6 + 0.5),
                )
    got = {
        (r["s1"], r["s2"]): (
            r["common_customers"],
            r["deg1"],
            r["deg2"],
            r["jaccard_micro"],
        )
        for r in jaccard_link_prediction(spark, SF).collect()
    }
    assert got == expect


# ------------------------------------------- local clustering topk
def test_local_clustering_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.graph import (
        LCC_TOP_K,
        local_clustering_topk,
    )

    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    per_order = defaultdict(set)
    for r in rows:
        per_order[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in per_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                adj[u].add(v)
                adj[v].add(u)
    scored = []
    for v in adj:
        deg = len(adj[v])
        if deg < 2:
            continue
        ns = sorted(adj[v])
        tri = sum(
            1
            for i, x in enumerate(ns)
            for y in ns[i + 1 :]
            if y in adj[x]
        )
        coef = math.floor(2.0 * tri / (deg * (deg - 1)) * 1e6 + 0.5)
        scored.append((coef, tri, v, deg))
    scored.sort(key=lambda t: (-t[0], -t[1], t[2]))
    expect = [
        (v, deg, tri, coef) for coef, tri, v, deg in scored[:LCC_TOP_K]
    ]
    got = [
        (r["node"], r["deg"], r["triangles"], r["coef_micro"])
        for r in local_clustering_topk(spark, SF).collect()
    ]
    assert got == expect


# ------------------------------------------------- stupid backoff
def test_stupid_backoff_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.corpus_lm import (
        NOVELTY_TRAIN_PCT,
        SB_ALPHA,
        SB_ALPHA2,
        stupid_backoff_score,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    t3 = defaultdict(Counter)
    b2 = defaultdict(Counter)
    u1 = defaultdict(Counter)
    held = defaultdict(list)
    for r in docs:
        toks = _tokens(r["text"])
        train = _hash_bucket(r["doc_id"]) < NOVELTY_TRAIN_PCT
        if train:
            for w in toks:
                u1[r["lang"]][w] += 1
            for x, y in zip(toks, toks[1:]):
                b2[r["lang"]][f"{x} {y}"] += 1
            for x, y, z in zip(toks, toks[1:], toks[2:]):
                t3[r["lang"]][f"{x} {y} {z}"] += 1
        else:
            for x, y, z in zip(toks, toks[1:], toks[2:]):
                held[r["lang"]].append((x, y, z))
    got = {r["lang"]: r for r in stupid_backoff_score(spark, SF).collect()}
    for lang, tris in held.items():
        n_tok = sum(u1[lang].values())
        counts = Counter()
        total = 0.0
        for x, y, z in tris:
            if t3[lang][f"{x} {y} {z}"] > 0:
                counts["tri"] += 1
                total += t3[lang][f"{x} {y} {z}"] / b2[lang][f"{x} {y}"]
            elif b2[lang][f"{y} {z}"] > 0:
                counts["bi"] += 1
                total += SB_ALPHA * b2[lang][f"{y} {z}"] / u1[lang][y]
            elif u1[lang][z] > 0:
                counts["uni"] += 1
                total += SB_ALPHA2 * u1[lang][z] / n_tok
            else:
                counts["unseen"] += 1
        g = got[lang]
        assert g["n_positions"] == len(tris)
        assert g["n_tri"] == counts["tri"]
        assert g["n_bi"] == counts["bi"]
        assert g["n_uni"] == counts["uni"]
        assert g["n_unseen"] == counts["unseen"]
        assert abs(g["avg_score_micro"] / 1e6 - total / len(tris)) < 2e-6


# ------------------------------------- shared-SQL-prefix parity pins
def test_rate_ranked_prefix_pinned():
    """_RATE_RANKED_SQL must stay the literal prefix of BH_FDR_SQL —
    the one-definition guarantee for the three multiple-testing
    twins (the ADVICE r10 _PER_VEC_SQL discipline)."""
    from cgtcalc_data_transformer_spark.operators import stats11, timeseries

    assert timeseries._RATE_RANKED_SQL in timeseries.BH_FDR_SQL
    assert timeseries._RATE_RANKED_SQL in stats11.HOLM_SQL
    assert timeseries._RATE_RANKED_SQL in stats11.FISHER_META_SQL


def test_km_terms_prefix_pinned():
    from cgtcalc_data_transformer_spark.operators import events

    assert events._KM_TERMS_SQL in events.KAPLAN_MEIER_SQL


def test_per_vec_sql_prefix_pinned():
    """ADVICE r10 item 4: stats10._PER_VEC_SQL must stay in sync with
    ece_calibration's scoring prefix in embedding_ops.ECE_SQL."""
    from cgtcalc_data_transformer_spark.operators import embedding_ops, stats10

    assert stats10._PER_VEC_SQL.strip() in embedding_ops.ECE_SQL
