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


# -------------------------------------------- negbin / KPSS / Granger
def _daily_series(spark, by_type=False):
    from cgtcalc_data_transformer_spark.operators.events import DAY_NS
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = (
        load_events(spark, SF)
        .selectExpr("event_type", f"ts div {DAY_NS} as day")
        .collect()
    )
    dmin = min(r["day"] for r in rows)
    dmax = max(r["day"] for r in rows)
    n = dmax - dmin + 1
    if not by_type:
        series = [0] * n
        for r in rows:
            series[r["day"] - dmin] += 1
        return series
    out = defaultdict(lambda: [0] * n)
    for r in rows:
        out[r["event_type"]][r["day"] - dmin] += 1
    return out


def test_negbin_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        negbin_overdispersion_fit,
    )

    per = _daily_series(spark, by_type=True)
    got = {r["event_type"]: r for r in negbin_overdispersion_fit(spark, SF).collect()}
    assert set(got) == set(per)
    for et, ys in per.items():
        n = len(ys)
        m = sum(ys) / n
        v = sum((y - m) ** 2 for y in ys) / n
        g = got[et]
        assert g["n_days"] == n
        assert abs(g["mean_micro"] / 1e6 - m) < 2e-6
        assert abs(g["var_micro"] / 1e6 - v) < 5e-6
        assert g["overdispersed"] == (v > m)
        if v > m:
            assert abs(g["r_micro"] / 1e6 - m * m / (v - m)) < 1e-4
            assert abs(g["p_micro"] / 1e6 - m / v) < 2e-6
        else:
            assert g["r_micro"] == -1 and g["p_micro"] == -1


def test_kpss_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        KPSS_CRIT_5PCT,
        KPSS_LAGS,
        kpss_stationarity,
    )

    ys = _daily_series(spark)
    n = len(ys)
    mean = sum(ys) / n
    e = [y - mean for y in ys]
    s_cum, ss2 = 0.0, 0.0
    for x in e:
        s_cum += x
        ss2 += s_cum * s_cum
    eta = ss2 / (n * n)
    g = [sum(e[t] * e[t - j] for t in range(j, n)) / n for j in range(KPSS_LAGS + 1)]
    s2 = g[0] + 2 * sum((1 - j / (KPSS_LAGS + 1)) * g[j] for j in range(1, KPSS_LAGS + 1))
    kpss = eta / s2
    row = kpss_stationarity(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert abs(row["kpss_micro"] / 1e6 - kpss) < 1e-4
    assert row["level_stationary"] == (kpss < KPSS_CRIT_5PCT)


def test_granger_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        GRANGER_F_CRIT,
        granger_causality_daily,
    )

    import numpy as np

    per = _daily_series(spark, by_type=True)
    xs, ys = per["view"], per["purchase"]

    def fstat(y, own, cross):
        rows_ = list(zip(y[1:], own[:-1], cross[:-1]))
        m = len(rows_)

        def ols_rss(cols):
            # textbook least-squares residual via numpy lstsq
            X = np.column_stack([np.ones(m)] + cols)
            yv = np.array([r[0] for r in rows_], dtype=float)
            beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
            pred = X @ beta
            return float(((yv - pred) ** 2).sum())

        own_c = [np.array([r[1] for r in rows_], dtype=float)]
        both = own_c + [np.array([r[2] for r in rows_], dtype=float)]
        rss_r = ols_rss(own_c)
        rss_u = ols_rss(both)
        return (rss_r - rss_u) * (m - 3) / rss_u, m

    f_vp, m = fstat(ys, ys, xs)   # does view cause purchase
    f_pv, _ = fstat(xs, xs, ys)
    got = {r["direction"]: r for r in granger_causality_daily(spark, SF).collect()}
    assert got["view->purchase"]["n_obs"] == m
    assert abs(got["view->purchase"]["f_micro"] / 1e6 - f_vp) < 1e-3 * max(1.0, abs(f_vp))
    assert abs(got["purchase->view"]["f_micro"] / 1e6 - f_pv) < 1e-3 * max(1.0, abs(f_pv))
    assert got["view->purchase"]["significant"] == (f_vp > GRANGER_F_CRIT)
    assert got["purchase->view"]["significant"] == (f_pv > GRANGER_F_CRIT)


def test_frequent_triples_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        TRIPLE_MIN_SUPPORT,
        TRIPLE_TOP_K,
        frequent_triples,
    )
    from itertools import combinations

    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    item_sup = Counter()
    tri_sup = Counter()
    for parts in baskets.values():
        for p in parts:
            item_sup[p] += 1
        for t in combinations(sorted(parts), 3):
            tri_sup[t] += 1
    n = len(baskets)
    scored = []
    for (a, b, c), sup in tri_sup.items():
        if sup < TRIPLE_MIN_SUPPORT:
            continue
        lift = math.floor(
            sup * float(n) * float(n)
            / (item_sup[a] * item_sup[b] * item_sup[c])
            * 1e6
            + 0.5
        )
        scored.append((-sup, -lift, a, b, c))
    scored.sort()
    expect = [
        (a, b, c, -msup, -mlift)
        for msup, mlift, a, b, c in scored[:TRIPLE_TOP_K]
    ]
    got = [
        (r["part_a"], r["part_b"], r["part_c"], r["support"], r["lift_micro"])
        for r in frequent_triples(spark, SF).collect()
    ]
    assert got == expect


# ----------------------------- classifier quality / silhouette audit
def _naive_centroid_cosines(spark):
    """Replicate the shared quantized scoring: per-dim centroid =
    round(avg, 6); per-pair sums of floor(term·1e6+0.5); cosine
    floor(dot/sqrt(cc·xx)·1e6+0.5)."""
    import numpy as np

    rows = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    vecs = {
        r["vec_id"]: (r["label"], np.array([float(x) for x in r["embedding"]]))
        for r in rows
    }
    labels = sorted({l for l, _ in vecs.values()})
    dims = len(next(iter(vecs.values()))[1])
    def round6_half_away(x):
        # Spark/DuckDB ROUND(x, 6) is HALF-AWAY-FROM-ZERO; Python's
        # round() is banker's — a half-tie centroid coordinate would
        # silently diverge the whole cosine chain
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    cents = {}
    for cl in labels:
        members = [v for l, v in vecs.values() if l == cl]
        cents[cl] = np.array(
            [round6_half_away(float(sum(m[i] for m in members)) / len(members))
             for i in range(dims)]
        )
    out = {}
    for vid, (label, v) in vecs.items():
        for cl in labels:
            c = cents[cl]
            dot = sum(math.floor(x * y * 1e12 + 0.5) for x, y in zip(v, c))
            cc = sum(math.floor(y * y * 1e12 + 0.5) for y in c)
            xx = sum(math.floor(x * x * 1e12 + 0.5) for x in v)
            cos_i = math.floor(dot / math.sqrt(cc * xx) * 1e6 + 0.5)
            out[(vid, cl)] = (label, cos_i)
    return out, labels


def test_classifier_quality_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        classifier_quality_panel,
    )

    cosines, labels = _naive_centroid_cosines(spark)
    vids = sorted({vid for vid, _ in cosines})
    pred = {}
    actual = {}
    for vid in vids:
        best = max(
            (cosines[(vid, cl)][1], -cl) for cl in labels
        )
        pred[vid] = -best[1]
        actual[vid] = cosines[(vid, labels[0])][0]
    s = len(vids)
    trace = sum(1 for v in vids if pred[v] == actual[v])
    t = Counter(actual.values())
    p = Counter(pred.values())
    spt = sum(p[k] * t[k] for k in t)
    spp = sum(x * x for x in p.values())
    stt = sum(x * x for x in t.values())
    mcc = (trace * s - spt) / math.sqrt((s * s - spp) * (s * s - stt))
    f1s = [
        2 * sum(1 for v in vids if pred[v] == k and actual[v] == k)
        / (t[k] + p.get(k, 0))
        for k in sorted(t)
    ]
    row = classifier_quality_panel(spark, SF).collect()[0]
    assert row["n_vecs"] == s and row["n_classes"] == len(t)
    assert abs(row["accuracy_micro"] / 1e6 - trace / s) < 2e-6
    assert abs(row["macro_f1_micro"] / 1e6 - sum(f1s) / len(f1s)) < 2e-6
    assert abs(row["mcc_micro"] / 1e6 - mcc) < 2e-6


def test_silhouette_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        silhouette_labels_audit,
    )

    cosines, labels = _naive_centroid_cosines(spark)
    vids = sorted({vid for vid, _ in cosines})
    per_label = defaultdict(list)
    for vid in vids:
        label = cosines[(vid, labels[0])][0]
        own = cosines[(vid, label)][1]
        oth = max(cosines[(vid, cl)][1] for cl in labels if cl != label)
        a = (1e6 - own) / 1e6
        b = (1e6 - oth) / 1e6
        sil = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        per_label[label].append(sil)
    got = {r["label"]: r for r in silhouette_labels_audit(spark, SF).collect()}
    assert set(got) == set(per_label)
    for label, sils in per_label.items():
        g = got[label]
        assert g["n_vecs"] == len(sils)
        assert abs(g["mean_sil_micro"] / 1e6 - sum(sils) / len(sils)) < 1e-5
        assert abs(
            g["frac_separated_micro"] / 1e6
            - sum(1 for x in sils if x > 1e-9) / len(sils)
        ) < 2e-6


def test_quantile_shift_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats11 import (
        quantile_shift_panel,
    )

    a, b = _quantity_groups(spark)
    a.sort()
    b.sort()
    got = {r["percentile"]: r for r in quantile_shift_panel(spark, SF).collect()}
    assert set(got) == {10, 20, 30, 40, 50, 60, 70, 80, 90}
    for d in range(1, 10):
        qa = a[math.ceil(len(a) * d / 10) - 1]
        qb = b[math.ceil(len(b) * d / 10) - 1]
        g = got[d * 10]
        assert g["q_f"] == qa and g["q_o"] == qb and g["shift"] == qb - qa
