"""Round-7 operator tests: independent Python/numpy reimplementations
for the classical-statistics family (stats_ext) and the other round-7
additions — every operator's math is recomputed from collected rows
with a formulation that shares NO code with the Spark plan (naive
sort-based ranks vs per-value-count theta joins, scipy-free textbook
formulas vs quantized integer sums).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


def _ranks(values):
    """Naive tied-average ranks (1-based) by sorting — the textbook
    formulation the engine's per-value-count machinery must match."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        avg = (i + j + 2) / 2  # ranks i+1 .. j+1 averaged
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def _li_xy(spark):
    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_discount", "l_returnflag")
        .collect()
    )
    xs = [int(r["l_quantity"]) for r in rows]
    ys = [int(math.floor(r["l_discount"] * 100 + 0.5)) for r in rows]
    flags = [r["l_returnflag"] for r in rows]
    return xs, ys, flags


# ------------------------------------------------ mannwhitney_u_test
def test_mannwhitney_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        MW_Z_CRIT,
        mannwhitney_u_test,
    )

    xs, _, flags = _li_xy(spark)
    a = [x for x, f in zip(xs, flags) if f == "R"]
    b = [x for x, f in zip(xs, flags) if f == "N"]
    pooled = a + b
    ranks = _ranks(pooled)
    ra = sum(ranks[: len(a)])
    ma, mb = len(a), len(b)
    u_a = ra - ma * (ma + 1) / 2
    n = ma + mb
    tie = Counter(pooled)
    tsum = sum(t**3 - t for t in tie.values())
    var = ma * mb / 12 * ((n + 1) - tsum / (n * (n - 1)))
    z = (u_a - ma * mb / 2) / math.sqrt(var)
    got = mannwhitney_u_test(spark, SF).collect()[0]
    assert (got["m_a"], got["m_b"]) == (ma, mb)
    assert got["u_a"] == u_a
    assert abs(got["z_stat"] - z) < 1e-6
    assert got["significant"] == (abs(z) > MW_Z_CRIT)


# ------------------------------------------------ spearman_rank_corr
def test_spearman_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        spearman_rank_corr,
    )

    xs, ys, _ = _li_xy(spark)
    rx, ry = _ranks(xs), _ranks(ys)
    n = len(xs)
    mrx = sum(rx) / n
    mry = sum(ry) / n
    num = sum((a - mrx) * (b - mry) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mrx) ** 2 for a in rx) * sum((b - mry) ** 2 for b in ry)
    )
    got = spearman_rank_corr(spark, SF).collect()[0]
    assert got["n"] == n
    assert abs(got["rho"] - num / den) < 1e-6


# ------------------------------------------------ kendall_tau_binned
def test_kendall_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        kendall_tau_binned,
    )

    xs, ys, _ = _li_xy(spark)
    cells = Counter(zip(xs, ys))
    items = list(cells.items())
    cc = dd = 0
    for i, ((x1, y1), c1) in enumerate(items):
        for (x2, y2), c2 in items:
            if x2 > x1 and y2 > y1:
                cc += c1 * c2
            elif x2 > x1 and y2 < y1:
                dd += c1 * c2
    n = len(xs)
    tx = Counter(xs)
    ty = Counter(ys)
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in tx.values())
    n2 = sum(t * (t - 1) / 2 for t in ty.values())
    tau = (cc - dd) / math.sqrt((n0 - n1) * (n0 - n2))
    got = kendall_tau_binned(spark, SF).collect()[0]
    assert (got["concordant"], got["discordant"]) == (cc, dd)
    assert got["n"] == n
    assert abs(got["tau_b"] - tau) < 1e-6


# --------------------------------------------------- anova_f_oneway
def test_anova_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        anova_f_oneway,
    )

    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r["l_returnflag"]].append(r["l_extendedprice"])
    n = sum(len(g) for g in groups.values())
    k = len(groups)
    grand = sum(sum(g) for g in groups.values()) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups.values())
    ssw = sum(
        sum((v - sum(g) / len(g)) ** 2 for v in g) for g in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = anova_f_oneway(spark, SF).collect()[0]
    assert (got["n"], got["k"]) == (n, k)
    # python accumulates in a different order: agree to relative 1e-9
    assert abs(got["ss_between"] - ssb) < 1e-6 * max(1.0, ssb)
    assert abs(got["ss_within"] - ssw) < 1e-6 * max(1.0, ssw)
    assert abs(got["f_stat"] - f) < 1e-4 * max(1.0, abs(f))
    assert abs(got["eta_sq"] - ssb / (ssb + ssw)) < 1e-6
    # independently generated price vs flag: no real effect expected
    assert got["eta_sq"] < 0.05


# ------------------------------------------------- cramers_v_matrix
def test_cramers_v_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        _CRAMER_PAIRS,
        cramers_v_matrix,
    )

    got = {r["pair"]: r for r in cramers_v_matrix(spark, SF).collect()}
    assert len(got) == len(_CRAMER_PAIRS)
    for table, rc, cc in _CRAMER_PAIRS:
        rows = load_table(spark, SF, table).select(rc, cc).collect()
        cells = Counter((r[rc], r[cc]) for r in rows)
        rm = Counter(r[rc] for r in rows)
        cm = Counter(r[cc] for r in rows)
        n = len(rows)
        chi2 = 0.0
        for rcat in rm:
            for ccat in cm:
                e = rm[rcat] * cm[ccat] / n
                o = cells.get((rcat, ccat), 0)
                chi2 += (o - e) ** 2 / e
        v = math.sqrt(chi2 / (n * min(len(rm) - 1, len(cm) - 1)))
        g = got[f"{table}.{rc}~{cc}"]
        assert g["n"] == n
        assert (g["n_rowcats"], g["n_colcats"]) == (len(rm), len(cm))
        assert abs(g["chi2"] - chi2) < 1e-4 * max(1.0, chi2)
        assert abs(g["cramers_v"] - v) < 1e-5


# ---------------------------------------- mutual_information_binned
def test_mutual_information_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        mutual_information_binned,
    )

    xs, _, flags = _li_xy(spark)
    xb = [(x - 1) // 10 for x in xs]
    cells = Counter(zip(xb, flags))
    mx = Counter(xb)
    my = Counter(flags)
    n = len(xs)
    mi = sum(
        c / n * math.log(c * n / (mx[x] * my[y]))
        for (x, y), c in cells.items()
    )
    hx = -sum(c / n * math.log(c / n) for c in mx.values())
    hy = -sum(c / n * math.log(c / n) for c in my.values())
    got = mutual_information_binned(spark, SF).collect()[0]
    assert got["n"] == n
    assert abs(got["mi"] - mi) < 1e-6
    assert abs(got["h_x"] - hx) < 1e-6
    assert abs(got["h_y"] - hy) < 1e-6
    assert abs(got["nmi"] - mi / math.sqrt(hx * hy)) < 1e-5


# --------------------------------------------- simpson_paradox_audit
def test_simpson_audit_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        simpson_paradox_audit,
    )

    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )

    def slope(pts):
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)

    by_flag = defaultdict(list)
    for r in rows:
        by_flag[r["l_returnflag"]].append(
            (r["l_quantity"], r["l_extendedprice"])
        )
    pooled = slope([p for g in by_flag.values() for p in g])
    got = {r["l_returnflag"]: r for r in simpson_paradox_audit(spark, SF).collect()}
    assert set(got) == set(by_flag)
    for flag, pts in by_flag.items():
        g = got[flag]
        s = slope(pts)
        assert g["n"] == len(pts)
        assert abs(g["slope"] - s) < 1e-4 * max(1.0, abs(s))
        assert abs(g["pooled_slope"] - pooled) < 1e-4 * max(1.0, abs(pooled))
        assert g["sign_reversed"] == ((s > 0) != (pooled > 0))


# ------------------------------------------------------ mad_outliers
def _median(sorted_vals):
    n = len(sorted_vals)
    lo = sorted_vals[(n + 1) // 2 - 1]
    hi = sorted_vals[(n + 2) // 2 - 1]
    return (lo + hi) / 2


def test_mad_outliers_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        mad_outliers,
    )

    rows = load_table(spark, SF, "documents").select("source", "n_chars").collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r["n_chars"])
    got = {r["source"]: r for r in mad_outliers(spark, SF).collect()}
    assert set(got) == set(by_src)
    for src, vals in by_src.items():
        vals.sort()
        med = _median(vals)
        devs = sorted(abs(v - med) for v in vals)
        mad = _median(devs)
        n_out = sum(1 for v in vals if abs(v - med) > 3 * 1.4826 * mad)
        g = got[src]
        assert g["n"] == len(vals)
        assert g["median"] == med
        assert g["mad"] == mad
        assert g["n_outliers"] == n_out
        assert g["outlier_share"] == round(n_out / len(vals), 6)


# ----------------------------------------------- trimmed_mean_robust
def test_trimmed_mean_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        trimmed_mean_robust,
    )

    rows = load_table(spark, SF, "documents").select("source", "n_chars").collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r["n_chars"])
    got = {r["source"]: r for r in trimmed_mean_robust(spark, SF).collect()}
    assert set(got) == set(by_src)
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        k = n // 10
        trimmed = vals[k : n - k]
        winsor = [vals[k]] * k + trimmed + [vals[n - k - 1]] * k
        g = got[src]
        assert (g["n"], g["k_trim"]) == (n, k)
        assert g["mean"] == round(sum(vals) / n, 6)
        assert g["trimmed_mean"] == round(sum(trimmed) / len(trimmed), 6)
        assert g["winsor_mean"] == round(sum(winsor) / n, 6)


# ------------------------------------------------- daily grid helpers
def _daily_counts(spark):
    from cgtcalc_data_transformer_spark.operators.timeseries import DAY_NS
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = load_events(spark, SF).select("event_type", "ts").collect()
    days = [(r["event_type"], r["ts"] // DAY_NS) for r in rows]
    dmin = min(d for _, d in days)
    dmax = max(d for _, d in days)
    nd = dmax - dmin + 1
    series = defaultdict(lambda: [0] * nd)
    for t, d in days:
        series[t][d - dmin] += 1
    return series, nd


# --------------------------------------------------- acf_daily_counts
def test_acf_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.timeseries import (
        ACF_MAX_LAG,
        acf_daily_counts,
    )

    series, nd = _daily_counts(spark)
    got = defaultdict(dict)
    for r in acf_daily_counts(spark, SF).collect():
        got[r["event_type"]][r["lag"]] = r["acf"]
    assert set(got) == set(series)
    for t, ys in series.items():
        ybar = sum(ys) / nd
        den = sum((y - ybar) ** 2 for y in ys)
        for k in range(1, min(ACF_MAX_LAG, nd - 1) + 1):
            num = sum(
                (ys[i] - ybar) * (ys[i + k] - ybar) for i in range(nd - k)
            )
            assert abs(got[t][k] - num / den) < 1e-6, (t, k)
        # lag-0 would be 1; all reported lags bounded
        assert all(abs(v) <= 1.0 + 1e-9 for v in got[t].values())


# ------------------------------------------------- ewma_control_chart
def test_ewma_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.timeseries import (
        EWMA_ALPHA_DEN,
        EWMA_ALPHA_NUM,
        EWMA_L,
        ewma_control_chart,
    )

    series, nd = _daily_counts(spark)
    alpha = EWMA_ALPHA_NUM / EWMA_ALPHA_DEN
    got = defaultdict(dict)
    for r in ewma_control_chart(spark, SF).collect():
        got[r["event_type"]][r["d"]] = r
    for t, ys in series.items():
        mean = sum(ys) / nd
        sigma = math.sqrt(sum((y - mean) ** 2 for y in ys) / nd)
        z = ys[0]
        for d in range(1, nd):
            g = got[t][d]
            assert g["y"] == ys[d]
            # engine reports z_{t-1} (micro-truncated); recursive float
            # EWMA agrees within the quantization error budget
            assert abs(g["ewma_prev"] - z) < 1e-4
            assert abs(g["sigma"] - sigma) < 1e-5
            assert g["out_of_control"] == (abs(ys[d] - z) > EWMA_L * sigma) or (
                abs(abs(ys[d] - z) - EWMA_L * sigma) < 1e-6
            )
            z = alpha * ys[d] + (1 - alpha) * z


# ---------------------------------------------------- theil_sen_trend
def test_theil_sen_matches_python_reference(spark):
    import statistics

    from cgtcalc_data_transformer_spark.operators.timeseries import (
        theil_sen_trend,
    )

    series, nd = _daily_counts(spark)
    got = {r["event_type"]: r for r in theil_sen_trend(spark, SF).collect()}
    assert set(got) == set(series)
    for t, ys in series.items():
        slopes = [
            (ys[j] - ys[i]) / (j - i)
            for i in range(nd)
            for j in range(i + 1, nd)
        ]
        ts = statistics.median(slopes)
        xs = list(range(nd))
        n = nd
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        g = got[t]
        assert g["n_days"] == nd
        assert g["n_pairs"] == len(slopes)
        assert abs(g["theil_sen_slope"] - ts) < 1e-6
        assert abs(g["ols_slope"] - ols) < 1e-6


# ----------------------------------------------------- bh_fdr_control
def test_bh_fdr_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.timeseries import (
        BH_Q,
        DAY_NS,
        bh_fdr_control,
    )
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = load_events(spark, SF).select("event_type", "ts").collect()
    days = [(r["event_type"], r["ts"] // DAY_NS) for r in rows]
    dmin = min(d for _, d in days)
    dmax = max(d for _, d in days)
    mid = (dmin + dmax) // 2
    c1 = Counter(t for t, d in days if d <= mid)
    c2 = Counter(t for t, d in days if d > mid)
    types = sorted(set(c1) | set(c2))
    n1, n2 = sum(c1.values()), sum(c2.values())
    stats = {}
    for t in types:
        p1, p2 = c1[t] / n1, c2[t] / n2
        pp = (c1[t] + c2[t]) / (n1 + n2)
        z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
        p = math.erfc(abs(z) / math.sqrt(2))  # exact tail, vs A&S approx
        stats[t] = (z, p)
    order = sorted(types, key=lambda t: (stats[t][1], t))
    m = len(types)
    kmax = 0
    for r, t in enumerate(order, 1):
        if stats[t][1] <= BH_Q * r / m:
            kmax = r
    got = {r["event_type"]: r for r in bh_fdr_control(spark, SF).collect()}
    assert set(got) == set(types)
    for r, t in enumerate(order, 1):
        g = got[t]
        assert (g["c1"], g["c2"]) == (c1[t], c2[t])
        assert abs(g["z_stat"] - stats[t][0]) < 1e-6
        # A&S 7.1.26 bound (1.5e-7) + the 6-decimal display rounding
        assert abs(g["p_value"] - stats[t][1]) < 7e-7
        assert g["rank"] == r
        assert g["rejected"] == (r <= kmax)


# ------------------------------------------------ nelson_aalen_hazard
def test_nelson_aalen_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.events import (
        DAY_NS,
        KM_CENSOR_GAP,
        nelson_aalen_hazard,
    )
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = load_events(spark, SF).select("user_id", "ts").collect()
    days = defaultdict(set)
    for r in rows:
        days[r["user_id"]].add(r["ts"] // DAY_NS)
    h = max(d for ds in days.values() for d in ds)
    users = [
        (max(ds) - min(ds), 1 if max(ds) < h - KM_CENSOR_GAP else 0)
        for ds in days.values()
    ]
    per_t = defaultdict(lambda: [0, 0])
    for t, e in users:
        per_t[t][0] += e
        per_t[t][1] += 1 - e
    got = {r["t"]: r for r in nelson_aalen_hazard(spark, SF).collect()}
    assert set(got) == set(per_t)
    prev_h = 0.0
    for t in sorted(per_t):
        n_risk = sum(d + c for tt, (d, c) in per_t.items() if tt >= t)
        H = 0.0
        V = 0.0
        for tt in sorted(per_t):
            if tt > t:
                continue
            dd = per_t[tt][0]
            nn = sum(x + y for t3, (x, y) in per_t.items() if t3 >= tt)
            H += dd / nn
            V += dd / nn**2
        g = got[t]
        assert g["n_at_risk"] == n_risk
        assert (g["n_churned"], g["n_censored"]) == tuple(per_t[t])
        assert abs(g["cum_hazard"] - H) < 1e-6
        assert abs(g["se"] - math.sqrt(V)) < 1e-6
        assert g["cum_hazard"] >= prev_h - 1e-9  # monotone
        prev_h = g["cum_hazard"]


# -------------------------------------------- markov_stationary_dist
def test_markov_stationary_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.events import (
        markov_stationary_dist,
    )
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = (
        load_events(spark, SF)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = Counter()
    for seq in by_user.values():
        seq.sort()
        for a, b in zip(seq, seq[1:]):
            trans[(a[2], b[2])] += 1
    states = sorted({i for i, _ in trans})
    trans = {(i, j): c for (i, j), c in trans.items() if j in set(states)}
    rsum = Counter()
    for (i, _), c in trans.items():
        rsum[i] += c
    # float power iteration as the independent formulation
    pi = {s: 1 / len(states) for s in states}
    for _ in range(50):
        pi = {
            j: sum(
                pi[i] * trans.get((i, j), 0) / rsum[i]
                for i in states
                if rsum[i]
            )
            for j in states
        }
    got = {r["event_type"]: r for r in markov_stationary_dist(spark, SF).collect()}
    assert set(got) == set(states)
    total = sum(r["pi"] for r in got.values())
    assert abs(total - 1.0) < 1e-6  # floor drift bounded
    for s in states:
        # 10 exact-integer iterations vs converged float fixpoint:
        # the chain mixes fast (dense 5x5), agree to 1e-3
        assert abs(got[s]["pi"] - pi[s]) < 1e-3
        assert got[s]["pi_q"] == int(round(got[s]["pi"] * 10**12))


# ----------------------------------------------- corpus-LM additions
def _lang_tokens(spark):
    import re

    rows = load_table(spark, SF, "documents").select("lang", "text").collect()
    return [
        (r["lang"], re.findall(r"[a-z0-9]+", r["text"].lower())) for r in rows
    ]


def test_kneser_ney_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.corpus_lm import (
        KN_D,
        kneser_ney_bigram,
    )

    docs = _lang_tokens(spark)
    c12 = Counter()
    for lang, toks in docs:
        for a, b in zip(toks, toks[1:]):
            c12[(lang, a, b)] += 1
    c1 = Counter()
    fanout = Counter()
    fanin = Counter()
    ntypes = Counter()
    for (lang, a, b), c in c12.items():
        c1[(lang, a)] += c
        fanout[(lang, a)] += 1
        fanin[(lang, b)] += 1
        ntypes[lang] += 1
    ll = Counter()
    nn = Counter()
    for (lang, a, b), c in c12.items():
        p = (c - KN_D) / c1[(lang, a)] + KN_D * fanout[(lang, a)] / c1[
            (lang, a)
        ] * fanin[(lang, b)] / ntypes[lang]
        ll[lang] += c * math.log(p)
        nn[lang] += c
    got = {r["lang"]: r for r in kneser_ney_bigram(spark, SF).collect()}
    assert set(got) == set(nn)
    for lang in nn:
        g = got[lang]
        assert g["n_bigrams"] == nn[lang]
        assert g["n_types"] == ntypes[lang]
        ppl = math.exp(-ll[lang] / nn[lang])
        assert abs(g["ppl_kn"] - ppl) < 1e-4 * max(1.0, ppl)
        # a smoothed LM on its own training corpus: finite, > 1
        assert 1.0 < g["ppl_kn"] < 10_000


def test_good_turing_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.corpus_lm import (
        GT_MAX_R,
        good_turing_mass,
    )

    docs = _lang_tokens(spark)
    cw = Counter()
    for lang, toks in docs:
        for w in toks:
            cw[(lang, w)] += 1
    nr = Counter()
    ntok = Counter()
    f1 = Counter()
    for (lang, _), r in cw.items():
        nr[(lang, r)] += 1
        ntok[lang] += r
        if r == 1:
            f1[lang] += 1
    got = {(r["lang"], r["r"]): r for r in good_turing_mass(spark, SF).collect()}
    expected_keys = {(l, r) for (l, r) in nr if r <= GT_MAX_R}
    assert set(got) == expected_keys
    for (lang, r), g in got.items():
        assert g["n_r"] == nr[(lang, r)]
        r_star = (r + 1) * nr.get((lang, r + 1), 0) / nr[(lang, r)]
        assert abs(g["r_star"] - r_star) < 1e-6
        assert g["p0_unseen"] == round(f1[lang] / ntok[lang], 6)


def test_chao1_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.corpus_lm import (
        chao1_vocab_richness,
    )

    docs = _lang_tokens(spark)
    c12 = Counter()
    for lang, toks in docs:
        for a, b in zip(toks, toks[1:]):
            c12[(lang, f"{a} {b}")] += 1
    per = defaultdict(lambda: [0, 0, 0, 0])  # occ, types, f1, f2
    for (lang, _), c in c12.items():
        per[lang][0] += c
        per[lang][1] += 1
        if c == 1:
            per[lang][2] += 1
        elif c == 2:
            per[lang][3] += 1
    got = {r["lang"]: r for r in chao1_vocab_richness(spark, SF).collect()}
    assert set(got) == set(per)
    for lang, (occ, v, f1, f2) in per.items():
        g = got[lang]
        assert (g["n_occurrences"], g["v_observed"], g["f1"], g["f2"]) == (
            occ,
            v,
            f1,
            f2,
        )
        chao1 = v + f1 * (f1 - 1) / (2 * (f2 + 1))
        assert abs(g["chao1"] - chao1) < 1e-6
        assert g["chao1"] >= v  # estimator is a lower-bound ADD-ON


def test_vocab_coverage_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.corpus_lm import (
        COVERAGE_THRESHOLDS,
        vocab_coverage_curve,
    )

    docs = _lang_tokens(spark)
    cw = Counter()
    ntok = Counter()
    for lang, toks in docs:
        for w in toks:
            cw[(lang, w)] += 1
            ntok[lang] += 1
    got = defaultdict(dict)
    for r in vocab_coverage_curve(spark, SF).collect():
        got[r["lang"]][r["threshold"]] = r
    for lang in ntok:
        prev_share = None
        for t in COVERAGE_THRESHOLDS:
            keep = [c for (l, _), c in cw.items() if l == lang and c >= t]
            if not keep:
                assert t not in got[lang]
                continue
            g = got[lang][t]
            assert g["n_types"] == len(keep)
            assert g["token_share"] == round(sum(keep) / ntok[lang], 6)
            # monotone non-increasing coverage as the cutoff rises
            if prev_share is not None:
                assert g["token_share"] <= prev_share + 1e-9
            prev_share = g["token_share"]


def test_readability_flesch_matches_python_reference(spark):
    import re

    from cgtcalc_data_transformer_spark.operators.textops import (
        FRE_EASY,
        FRE_HARD,
        readability_flesch,
    )

    rows = load_table(spark, SF, "documents").select("source", "text").collect()
    per = defaultdict(list)
    for r in rows:
        text = r["text"]
        words = len(re.findall(r"[a-z0-9]+", text.lower()))
        if words == 0:
            continue
        syll = len(re.findall(r"[aeiouy]+", text.lower()))
        sent = max(len(re.findall(r"[.!?]+", text)), 1)
        fre = 206.835 - 1.015 * words / sent - 84.6 * syll / words
        per[r["source"]].append(fre)
    got = {r["source"]: r for r in readability_flesch(spark, SF).collect()}
    assert set(got) == set(per)
    for src, fres in per.items():
        g = got[src]
        assert g["n_docs"] == len(fres)
        assert abs(g["avg_fre"] - sum(fres) / len(fres)) < 1e-5
        easy = sum(1 for f in fres if f >= FRE_EASY)
        hard = sum(1 for f in fres if f < FRE_HARD)
        assert g["easy_share"] == round(easy / len(fres), 6)
        assert g["hard_share"] == round(hard / len(fres), 6)


# ------------------------------------------- hits_hubs_authorities
def test_hits_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.graph import (
        HITS_ITERS,
        HITS_S,
        hits_hubs_authorities,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    edges = {
        (r["o_custkey"], r["l_suppkey"])
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey).collect()
    }
    custs = sorted({c for c, _ in edges})
    supps = sorted({s for _, s in edges})
    by_s = defaultdict(list)
    by_c = defaultdict(list)
    for c, s in edges:
        by_s[s].append(c)
        by_c[c].append(s)
    hub = {c: HITS_S for c in custs}
    auth = {}
    for _ in range(HITS_ITERS):
        raw = {s: sum(hub[c] for c in by_s[s]) for s in supps}
        nrm = math.sqrt(sum(float(x) * float(x) for x in raw.values()))
        auth = {s: math.floor(x / nrm * HITS_S + 0.5) for s, x in raw.items()}
        raw = {c: sum(auth[s] for s in by_c[c]) for c in custs}
        nrm = math.sqrt(sum(float(x) * float(x) for x in raw.values()))
        hub = {c: math.floor(x / nrm * HITS_S + 0.5) for c, x in raw.items()}
    got = {r["s_suppkey"]: r for r in hits_hubs_authorities(spark, SF).collect()}
    assert set(got) == set(supps)
    for s in supps:
        # integer-exact through the sums; the only float is the norm
        # division, identical per engine — python agrees to 1 quantum
        assert abs(got[s]["authority_q"] - auth[s]) <= 1
        assert abs(got[s]["authority"] - auth[s] / HITS_S) < 1e-8
    # scores are a unit-ish vector: norm close to 1 after quantization
    total = sum((g["authority"]) ** 2 for g in got.values())
    assert abs(total - 1.0) < 1e-3


# ----------------------------------------------- adamic_adar_links
def test_adamic_adar_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.graph import (
        AA_MIN_COMMON,
        AA_MIN_ORDERS,
        AA_S,
        adamic_adar_links,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).collect()
    ord_count = defaultdict(set)
    for r in j:
        ord_count[(r["o_custkey"], r["l_suppkey"])].add(r["l_orderkey"])
    repeat = {(c, s) for (c, s), o in ord_count.items() if len(o) >= AA_MIN_ORDERS}
    deg = Counter(c for c, _ in repeat)
    pairs = defaultdict(lambda: [0, 0])  # cn, aa_q
    by_c = defaultdict(list)
    for c, s in repeat:
        by_c[c].append(s)
    for c, ss in by_c.items():
        if deg[c] < 2:
            continue
        w = math.floor(AA_S / math.log(deg[c]) + 0.5)
        ss.sort()
        for i, s1 in enumerate(ss):
            for s2 in ss[i + 1 :]:
                pairs[(s1, s2)][0] += 1
                pairs[(s1, s2)][1] += w
    expected = {k: v for k, v in pairs.items() if v[0] >= AA_MIN_COMMON}
    got = {
        (r["s1"], r["s2"]): r for r in adamic_adar_links(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for k, (cn, aaq) in expected.items():
        assert got[k]["common_customers"] == cn
        assert got[k]["aa_score"] == aaq / AA_S


# ------------------------------------------- assoc_rules_confidence
def test_assoc_rules_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.relational_ext import (
        RULE_CONVICTION_CAP,
        RULE_MIN_SUPPORT,
        assoc_rules_confidence,
    )

    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    sup = Counter()
    pair_sup = Counter()
    for items in baskets.values():
        s = sorted(items)
        for p in s:
            sup[p] += 1
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                pair_sup[(a, b)] += 1
    n = len(baskets)
    expected = {k: v for k, v in pair_sup.items() if v >= RULE_MIN_SUPPORT}
    got = {
        (r["part_a"], r["part_b"]): r
        for r in assoc_rules_confidence(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for (a, b), s_ab in expected.items():
        g = got[(a, b)]
        assert g["support"] == s_ab
        assert g["conf_a_to_b"] == round(s_ab / sup[a], 6)
        assert g["conf_b_to_a"] == round(s_ab / sup[b], 6)
        conv = (
            RULE_CONVICTION_CAP
            if s_ab == sup[a]
            else (1 - sup[b] / n) / (1 - s_ab / sup[a])
        )
        assert abs(g["conviction_a_to_b"] - conv) < 1e-5


# ------------------------------------------- brier_decomposition
def test_brier_decomposition_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.embedding_ops import (
        ECE_BINS,
        ECE_SC,
        _nearest_centroid_scores,
        brier_decomposition,
    )

    pv = _nearest_centroid_scores(spark, SF).collect()
    scores = [(r["conf_i"] / ECE_SC, r["correct"]) for r in pv]
    n = len(scores)
    brier = sum((p - o) ** 2 for p, o in scores) / n
    bins = defaultdict(list)
    for p, o in scores:
        b = min(ECE_BINS - 1, max(0, int(p * ECE_BINS)))
        bins[b].append((p, o))
    obar = sum(o for _, o in scores) / n
    rel = sum(
        len(g) * (sum(p for p, _ in g) / len(g) - sum(o for _, o in g) / len(g)) ** 2
        for g in bins.values()
    ) / n
    res = sum(
        len(g) * (sum(o for _, o in g) / len(g) - obar) ** 2
        for g in bins.values()
    ) / n
    got = brier_decomposition(spark, SF).collect()[0]
    assert got["n"] == n
    assert abs(got["brier"] - brier) < 1e-6
    assert abs(got["reliability"] - rel) < 1e-6
    assert abs(got["resolution"] - res) < 1e-6
    assert abs(got["uncertainty"] - obar * (1 - obar)) < 1e-6
    # Murphy identity holds up to within-bin variance (>= 0)
    wbv = brier - (got["reliability"] - got["resolution"] + got["uncertainty"])
    assert wbv < 1e-6 or wbv >= -1e-6


# ------------------------------------------- cohens_kappa_flags
def test_cohens_kappa_matches_python_reference(spark):
    import re

    from cgtcalc_data_transformer_spark.operators.quality import (
        KAPPA_CHARS_LT,
        KAPPA_WORDS_LT,
        cohens_kappa_flags,
    )

    rows = (
        load_table(spark, SF, "documents")
        .select("n_chars", "text")
        .collect()
    )
    n11 = n10 = n01 = n00 = 0
    for r in rows:
        a = r["n_chars"] < KAPPA_CHARS_LT
        b = len(re.findall(r"[a-z0-9]+", r["text"].lower())) < KAPPA_WORDS_LT
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    n = len(rows)
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n**2
    got = cohens_kappa_flags(spark, SF).collect()[0]
    assert (got["n"], got["n11"], got["n10"], got["n01"], got["n00"]) == (
        n,
        n11,
        n10,
        n01,
        n00,
    )
    assert got["p_observed"] == round(po, 6)
    assert abs(got["kappa"] - (po - pe) / (1 - pe)) < 1e-5
    # the two length heuristics must actually agree beyond chance
    assert got["kappa"] > 0.5


# ------------------------------------------- lognormal_fit_doclen
def test_lognormal_fit_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.quality import (
        lognormal_fit_doclen,
    )

    rows = load_table(spark, SF, "documents").select("source", "n_chars").collect()
    per = defaultdict(list)
    for r in rows:
        if r["n_chars"] > 0:
            per[r["source"]].append(r["n_chars"])
    got = {r["source"]: r for r in lognormal_fit_doclen(spark, SF).collect()}
    assert set(got) == set(per)
    for src, vals in per.items():
        logs = [math.log(v) for v in vals]
        mu = sum(logs) / len(logs)
        var = sum(x * x for x in logs) / len(logs) - mu * mu
        g = got[src]
        assert g["n"] == len(vals)
        assert abs(g["mu_log"] - mu) < 1e-5
        assert abs(g["sigma_log"] - math.sqrt(var)) < 1e-4
        assert abs(g["geom_mean"] - math.exp(mu)) < 1e-2
        assert g["arith_mean"] == round(sum(vals) / len(vals), 6)
        # lognormal sanity: geometric mean below arithmetic mean
        assert g["geom_mean"] < g["arith_mean"]


# ------------------------------------- logistic_regression_irls
def test_logistic_irls_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        logistic_regression_irls,
    )

    xs, _, flags = _li_xy(spark)
    ys = [1 if f == "R" else 0 for f in flags]
    n = len(xs)
    # independent check: full Newton on RAW rows with float sums —
    # the engine's binned/quantized walk must land within the
    # quantization budget of the exact optimum after 4 steps
    b0 = b1 = 0.0
    for _ in range(8):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for x, y in zip(xs, ys):
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
            w = p * (1 - p)
            g0 += y - p
            g1 += x * (y - p)
            h00 += w
            h01 += x * w
            h11 += x * x * w
        det = h00 * h11 - h01 * h01
        b0 += (h11 * g0 - h01 * g1) / det
        b1 += (h00 * g1 - h01 * g0) / det
    got = logistic_regression_irls(spark, SF).collect()[0]
    assert got["n"] == n
    assert abs(got["beta0"] - b0) < 1e-3
    assert abs(got["beta1"] - b1) < 1e-4
    # returnflag is generated independently of quantity: no effect
    assert abs(got["beta1"]) < 0.01
    ll = -sum(
        y * math.log(1 / (1 + math.exp(-(b0 + b1 * x))))
        + (1 - y) * math.log(1 - 1 / (1 + math.exp(-(b0 + b1 * x))))
        for x, y in zip(xs, ys)
    ) / n
    assert abs(got["avg_log_loss"] - ll) < 1e-4


# ------------------------------------------- jackknife_variance
def test_jackknife_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        jackknife_variance,
    )

    rows = load_table(spark, SF, "documents").select("source", "n_chars").collect()
    per = defaultdict(lambda: [0, 0])
    for r in rows:
        per[r["source"]][0] += 1
        per[r["source"]][1] += r["n_chars"]
    g = len(per)
    n = sum(v[0] for v in per.values())
    s = sum(v[1] for v in per.values())
    thetas = [(s - si) / (n - ni) for ni, si in per.values()]
    tbar = sum(thetas) / g
    jack_var = (g - 1) / g * sum((t - tbar) ** 2 for t in thetas)
    got = jackknife_variance(spark, SF).collect()[0]
    assert got["n_groups"] == g
    assert got["theta_hat"] == round(s / n, 6)
    assert abs(got["mean_replicate"] - tbar) < 1e-5
    assert abs(got["jack_se"] - math.sqrt(jack_var)) < 1e-4


# -------------------------------------------- extreme_value_fit
def test_extreme_value_fit_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        EVT_GAMMA,
        extreme_value_fit,
    )

    rows = (
        load_table(spark, SF, "orders")
        .select(F.to_date("o_orderdate").alias("day"), "o_totalprice")
        .collect()
    )
    daily = {}
    for r in rows:
        daily[r["day"]] = max(daily.get(r["day"], 0.0), r["o_totalprice"])
    vals = list(daily.values())
    nd = len(vals)
    mean = sum(vals) / nd
    var = sum(v * v for v in vals) / nd - mean * mean
    beta = math.sqrt(var) * math.sqrt(6) / math.pi
    mu = mean - EVT_GAMMA * beta
    y99 = -math.log(-math.log(0.99))
    got = extreme_value_fit(spark, SF).collect()[0]
    assert got["n_days"] == nd
    assert abs(got["mean_max"] - mean) < 1e-4
    assert abs(got["gumbel_beta"] - beta) < 1e-3
    assert abs(got["gumbel_mu"] - mu) < 1e-3
    assert abs(got["return_level_p99"] - (mu + beta * y99)) < 1e-2
    # a p99-day maximum sits above the mean daily maximum
    assert got["return_level_p99"] > got["mean_max"]


# -------------------------------------------- page_hinkley_drift
def test_page_hinkley_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.timeseries import (
        PH_DELTA_DEN,
        PH_DELTA_NUM,
        PH_LAMBDA,
        page_hinkley_drift,
    )

    series, nd = _daily_counts(spark)
    got = defaultdict(dict)
    for r in page_hinkley_drift(spark, SF).collect():
        got[r["event_type"]][r["d"]] = r
    delta = PH_DELTA_NUM / PH_DELTA_DEN
    for t, ys in series.items():
        mean = sum(ys) / nd
        ph = 0.0
        mn = math.inf
        for d in range(nd):
            ph += ys[d] - mean - delta
            mn = min(mn, ph)
            g = got[t][d]
            assert abs(g["ph"] - ph) < 1e-9
            assert abs(g["ph_min"] - mn) < 1e-9
            assert g["alarm"] == (ph - mn > PH_LAMBDA)


# -------------------------------------------- capture_recapture
def test_capture_recapture_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.timeseries import (
        DAY_NS,
        capture_recapture,
    )
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = load_events(spark, SF).select("user_id", "ts").collect()
    days = [(r["user_id"], r["ts"] // DAY_NS) for r in rows]
    dmin = min(d for _, d in days)
    dmax = max(d for _, d in days)
    mid = (dmin + dmax) // 2
    s1 = {u for u, d in days if d <= mid}
    s2 = {u for u, d in days if d > mid}
    n1, n2, m = len(s1), len(s2), len(s1 & s2)
    got = capture_recapture(spark, SF).collect()[0]
    assert (got["n1"], got["n2"], got["recaptured"]) == (n1, n2, m)
    assert got["true_n"] == len(s1 | s2)
    assert got["n_hat_lp"] == round(n1 * n2 / m, 6)
    assert got["n_hat_chapman"] == round((n1 + 1) * (n2 + 1) / (m + 1) - 1, 6)
    # estimator must land in the right ballpark of the truth
    assert 0.5 * got["true_n"] < got["n_hat_chapman"] < 2.0 * got["true_n"]


# ------------------------------------------------- mcnemar_test
def test_mcnemar_matches_python_reference(spark):
    import re

    from cgtcalc_data_transformer_spark.operators.quality import (
        KAPPA_CHARS_LT,
        KAPPA_WORDS_LT,
        MCNEMAR_CRIT,
        mcnemar_test,
    )

    rows = load_table(spark, SF, "documents").select("n_chars", "text").collect()
    n10 = n01 = 0
    for r in rows:
        a = r["n_chars"] < KAPPA_CHARS_LT
        b = len(re.findall(r"[a-z0-9]+", r["text"].lower())) < KAPPA_WORDS_LT
        if a and not b:
            n10 += 1
        elif b and not a:
            n01 += 1
    got = mcnemar_test(spark, SF).collect()[0]
    assert (got["n10"], got["n01"]) == (n10, n01)
    chi2 = (n10 - n01) ** 2 / (n10 + n01)
    assert abs(got["chi2"] - chi2) < 1e-6
    assert abs(got["chi2_corrected"] - (abs(n10 - n01) - 1) ** 2 / (n10 + n01)) < 1e-6
    assert got["asymmetric"] == (chi2 > MCNEMAR_CRIT)


# ------------------------------------------ last_digit_uniformity
def test_last_digit_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.quality import (
        LASTDIGIT_CRIT,
        last_digit_uniformity,
    )

    rows = load_table(spark, SF, "orders").select("o_totalprice").collect()
    digits = Counter(
        int(math.floor(r["o_totalprice"] * 100 + 0.5)) % 10 for r in rows
    )
    n = len(rows)
    chi2 = sum((digits.get(d, 0) - n / 10) ** 2 / (n / 10) for d in range(10))
    got = {r["digit"]: r for r in last_digit_uniformity(spark, SF).collect()}
    assert set(got) == set(digits)
    for d, c in digits.items():
        g = got[d]
        assert g["c"] == c
        assert g["share"] == round(c / n, 6)
        assert abs(g["chi2"] - chi2) < 1e-4
        assert g["deviates"] == (g["chi2"] > LASTDIGIT_CRIT) or abs(
            g["chi2"] - LASTDIGIT_CRIT
        ) < 1e-5


# --------------------------------------- gains_curve_calibration
def test_gains_curve_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.embedding_ops import (
        ECE_BINS,
        ECE_SC,
        _nearest_centroid_scores,
        gains_curve_calibration,
    )

    pv = _nearest_centroid_scores(spark, SF).collect()
    bins = defaultdict(lambda: [0, 0])
    for r in pv:
        b = min(ECE_BINS - 1, max(0, (r["conf_i"] * ECE_BINS) // ECE_SC))
        bins[b][0] += 1
        bins[b][1] += r["correct"]
    n = sum(v[0] for v in bins.values())
    c = sum(v[1] for v in bins.values())
    got = {r["bin"]: r for r in gains_curve_calibration(spark, SF).collect()}
    assert set(got) == set(bins)
    for b, (nk, ck) in bins.items():
        cum_n = sum(v[0] for bb, v in bins.items() if bb >= b)
        cum_c = sum(v[1] for bb, v in bins.items() if bb >= b)
        g = got[b]
        assert g["nk"] == nk
        assert g["bin_precision"] == round(ck / nk, 6)
        assert g["reviewed_share"] == round(cum_n / n, 6)
        assert g["captured_share"] == round(cum_c / c, 6)
        assert abs(g["lift"] - (cum_c * n) / (cum_n * c)) < 1e-5
    # reviewing everything captures everything at lift 1
    bottom = got[min(bins)]
    assert bottom["reviewed_share"] == 1.0
    assert bottom["captured_share"] == 1.0


# --------------------------------------------- kruskal_wallis_test
def test_kruskal_wallis_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        kruskal_wallis_test,
    )

    xs, _, flags = _li_xy(spark)
    ranks = _ranks(xs)
    groups = defaultdict(list)
    for r, f in zip(ranks, flags):
        groups[f].append(r)
    n = len(xs)
    h = 12 / (n * (n + 1)) * sum(
        sum(g) ** 2 / len(g) for g in groups.values()
    ) - 3 * (n + 1)
    ties = Counter(xs)
    corr = 1 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    got = kruskal_wallis_test(spark, SF).collect()[0]
    assert (got["k"], got["n"]) == (len(groups), n)
    assert abs(got["h_stat"] - h) < 1e-3
    assert abs(got["h_corrected"] - h / corr) < 1e-3


# ----------------------------------------------- moods_median_test
def test_moods_median_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        moods_median_test,
    )

    xs, _, flags = _li_xy(spark)
    sv = sorted(xs)
    med = sv[(len(xs) + 1) // 2 - 1]
    cells = defaultdict(lambda: [0, 0])
    for x, f in zip(xs, flags):
        cells[f][0 if x > med else 1] += 1
    ta = sum(v[0] for v in cells.values())
    tn = sum(v[1] for v in cells.values())
    n = ta + tn
    chi2 = 0.0
    for a, na in cells.values():
        rg = a + na
        chi2 += (a - rg * ta / n) ** 2 / (rg * ta / n)
        chi2 += (na - rg * tn / n) ** 2 / (rg * tn / n)
    got = moods_median_test(spark, SF).collect()[0]
    assert (got["k"], got["n"], got["grand_median"]) == (len(cells), n, med)
    assert abs(got["chi2"] - chi2) < 1e-4


# ----------------------------------------------- effect_size_panel
def test_effect_size_panel_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        effect_size_panel,
    )

    xs, _, flags = _li_xy(spark)
    a = [x for x, f in zip(xs, flags) if f == "R"]
    b = [x for x, f in zip(xs, flags) if f == "N"]
    ma, mb = len(a), len(b)
    mean_a, mean_b = sum(a) / ma, sum(b) / mb
    var_a = sum((v - mean_a) ** 2 for v in a) / (ma - 1)
    var_b = sum((v - mean_b) ** 2 for v in b) / (mb - 1)
    sp = math.sqrt(((ma - 1) * var_a + (mb - 1) * var_b) / (ma + mb - 2))
    d = (mean_a - mean_b) / sp
    g = d * (1 - 3 / (4 * (ma + mb) - 9))
    ca, cb = Counter(a), Counter(b)
    gt = sum(cna * cnb for va, cna in ca.items() for vb, cnb in cb.items() if va > vb)
    lt = sum(cna * cnb for va, cna in ca.items() for vb, cnb in cb.items() if va < vb)
    delta = (gt - lt) / (ma * mb)
    got = effect_size_panel(spark, SF).collect()[0]
    assert (got["m_a"], got["m_b"]) == (ma, mb)
    assert abs(got["mean_diff"] - (mean_a - mean_b)) < 1e-6
    assert abs(got["cohens_d"] - d) < 1e-6
    assert abs(got["hedges_g"] - g) < 1e-6
    assert got["cliffs_delta"] == round(delta, 6)
    # independently generated flag: tiny effect expected
    assert abs(got["cohens_d"]) < 0.1


# -------------------------------------------- runs_test_randomness
def test_runs_test_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.timeseries import (
        RUNS_Z_CRIT,
        runs_test_randomness,
    )

    series, nd = _daily_counts(spark)
    got = {r["event_type"]: r for r in runs_test_randomness(spark, SF).collect()}
    assert set(got) == set(series)
    for t, ys in series.items():
        mean = sum(ys) / nd
        ups = [1 if y > mean else 0 for y in ys]
        runs = 1 + sum(1 for a, b in zip(ups, ups[1:]) if a != b)
        n1 = sum(ups)
        n2 = nd - n1
        g = got[t]
        assert (g["n1"], g["n2"], g["runs"]) == (n1, n2, runs)
        if n1 and n2:
            n = n1 + n2
            er = 1 + 2 * n1 * n2 / n
            vr = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
            z = (runs - er) / math.sqrt(vr)
            assert abs(g["z_stat"] - z) < 1e-6
            assert g["nonrandom"] == (abs(z) > RUNS_Z_CRIT)


# --------------------------------------- poisson_dispersion_test
def test_poisson_dispersion_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.timeseries import (
        DISP_OVER,
        poisson_dispersion_test,
    )

    series, nd = _daily_counts(spark)
    got = {
        r["event_type"]: r
        for r in poisson_dispersion_test(spark, SF).collect()
    }
    assert set(got) == set(series)
    for t, ys in series.items():
        mean = sum(ys) / nd
        s2 = sum((y - mean) ** 2 for y in ys) / (nd - 1)
        disp = s2 / mean
        g = got[t]
        assert g["n_days"] == nd
        assert abs(g["mean_daily"] - mean) < 1e-6
        assert abs(g["dispersion_index"] - disp) < 1e-6
        assert abs(g["chi2"] - (nd - 1) * disp) < 1e-4
        assert g["overdispersed"] == (disp > DISP_OVER)


# ------------------------------------------------ auc_roc_centroid
def test_auc_roc_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.embedding_ops import (
        _nearest_centroid_scores,
        auc_roc_centroid,
    )

    pv = _nearest_centroid_scores(spark, SF).collect()
    # engine ranks on the coarsened grid (conf_i div 100): mirror it
    pos = [r["conf_i"] // 100 for r in pv if r["correct"]]
    neg = [r["conf_i"] // 100 for r in pv if not r["correct"]]
    gt = sum(1 for p in pos for q in neg if p > q)
    eq = sum(1 for p in pos for q in neg if p == q)
    auc = (gt + 0.5 * eq) / (len(pos) * len(neg))
    got = auc_roc_centroid(spark, SF).collect()[0]
    assert (got["n_correct"], got["n_wrong"]) == (len(pos), len(neg))
    assert abs(got["auc"] - auc) < 1e-6
    assert abs(got["gini"] - (2 * auc - 1)) < 1e-5
    # a classifier better than coin-flip on its own training corpus
    assert got["auc"] > 0.5


# --------------------------------------------- entropy_rate_markov
def test_entropy_rate_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.events import (
        entropy_rate_markov,
    )
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = (
        load_events(spark, SF)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = Counter()
    for seq in by_user.values():
        seq.sort()
        for a, b in zip(seq, seq[1:]):
            trans[(a[2], b[2])] += 1
    states = sorted({i for i, _ in trans})
    trans = {(i, j): c for (i, j), c in trans.items() if j in set(states)}
    rsum = Counter()
    for (i, _), c in trans.items():
        rsum[i] += c
    pi = {s: 1 / len(states) for s in states}
    for _ in range(50):
        pi = {
            j: sum(
                pi[i] * trans.get((i, j), 0) / rsum[i]
                for i in states
                if rsum[i]
            )
            for j in states
        }
    h = -sum(
        pi[i] * (c / rsum[i]) * math.log(c / rsum[i])
        for (i, j), c in trans.items()
    )
    got = entropy_rate_markov(spark, SF).collect()[0]
    assert got["n_states"] == len(states)
    # engine uses 10 exact-int iterations vs converged float: 1e-3
    assert abs(got["entropy_rate"] - h) < 1e-3
    assert abs(got["max_entropy"] - math.log(len(states))) < 1e-6
    assert 0.0 < got["efficiency"] <= 1.0


# -------------------------------------------- durbin_watson_stat
def test_durbin_watson_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.timeseries import (
        DW_NEG_BAND,
        DW_POS_BAND,
        durbin_watson_stat,
    )

    series, nd = _daily_counts(spark)
    got = {r["event_type"]: r for r in durbin_watson_stat(spark, SF).collect()}
    assert set(got) == set(series)
    for t, ys in series.items():
        mean = sum(ys) / nd
        e = [y - mean for y in ys]
        dw = sum((a - b) ** 2 for a, b in zip(e[1:], e)) / sum(x * x for x in e)
        g = got[t]
        assert g["n_days"] == nd
        assert abs(g["dw"] - dw) < 1e-6
        assert g["positive_autocorr"] == (dw < DW_POS_BAND)
        assert g["negative_autocorr"] == (dw > DW_NEG_BAND)
        assert 0.0 <= g["dw"] <= 4.0


# ------------------------------------------- variance_ratio_test
def test_variance_ratio_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.timeseries import (
        VR_QS,
        variance_ratio_test,
    )

    series, nd = _daily_counts(spark)
    got = defaultdict(dict)
    for r in variance_ratio_test(spark, SF).collect():
        got[r["event_type"]][r["q"]] = r
    for t, ys in series.items():
        for q in VR_QS:
            b = nd // q
            trunc = ys[: b * q]
            mean = sum(trunc) / len(trunc)
            v1 = sum((y - mean) ** 2 for y in trunc) / len(trunc)
            zs = [sum(trunc[i * q : (i + 1) * q]) for i in range(b)]
            vq = sum((z - q * mean) ** 2 for z in zs) / b
            vr = vq / (q * v1)
            g = got[t][q]
            assert g["n_blocks"] == b
            assert abs(g["vr"] - vr) < 1e-6


# ------------------------------------------- ols_leverage_audit
def test_ols_leverage_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        LEV_MULT,
        ols_leverage_audit,
    )

    xs, _, _ = _li_xy(spark)
    n = len(xs)
    xbar = sum(xs) / n
    sxx = sum((x - xbar) ** 2 for x in xs)
    counts = Counter(xs)
    got = {r["v"]: r for r in ols_leverage_audit(spark, SF).collect()}
    assert set(got) == set(counts)
    total_h = 0.0
    for v, c in counts.items():
        h = 1 / n + (v - xbar) ** 2 / sxx
        g = got[v]
        assert g["c"] == c
        assert abs(g["leverage"] - h) < 1e-6
        assert abs(g["group_leverage"] - h * c) < 1e-4
        assert g["high_leverage"] == (h > LEV_MULT * 2 / n)
        total_h += h * c
    # hat-matrix trace identity: Σ h_i = p = 2
    assert abs(total_h - 2.0) < 1e-9


# ---------------------------------------- hash_uniformity_audit
def test_hash_uniformity_matches_python_reference(spark):
    import hashlib

    from cgtcalc_data_transformer_spark.operators.quality import (
        HASH_AUDIT_BUCKETS,
        HASH_AUDIT_CRIT,
        hash_uniformity_audit,
    )

    rows = load_table(spark, SF, "documents").select("doc_id").collect()
    buckets = Counter(
        int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        % HASH_AUDIT_BUCKETS
        for r in rows
    )
    n = len(rows)
    e = n / HASH_AUDIT_BUCKETS
    chi2 = sum(
        (buckets.get(b, 0) - e) ** 2 / e for b in range(HASH_AUDIT_BUCKETS)
    )
    got = {r["bucket"]: r for r in hash_uniformity_audit(spark, SF).collect()}
    # engine zero-fills the full range: EMPTY buckets count as skew
    assert set(got) == set(range(HASH_AUDIT_BUCKETS))
    for b in range(HASH_AUDIT_BUCKETS):
        c = buckets.get(b, 0)
        g = got[b]
        assert g["c"] == c
        assert g["share"] == round(c / n, 6)
        assert abs(g["chi2"] - chi2) < 1e-4
        assert g["skewed"] == (g["chi2"] > HASH_AUDIT_CRIT)
    # a real md5 must not skew on sequential ids
    assert chi2 < 2.0 * HASH_AUDIT_CRIT


# --------------------------------------- cochran_armitage_trend
def test_cochran_armitage_matches_python_reference(spark):
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        CA_Z_CRIT,
        cochran_armitage_trend,
    )

    xs, _, flags = _li_xy(spark)
    cells = defaultdict(lambda: [0, 0])
    for x, f in zip(xs, flags):
        s = (x - 1) // 10
        cells[s][0] += 1
        if f == "R":
            cells[s][1] += 1
    n = sum(v[0] for v in cells.values())
    r = sum(v[1] for v in cells.values())
    p = r / n
    num = sum(s * (ri - ni * p) for s, (ni, ri) in cells.items())
    sn = sum(s * ni for s, (ni, _) in cells.items())
    ssn = sum(s * s * ni for s, (ni, _) in cells.items())
    z = num / math.sqrt(p * (1 - p) * (ssn - sn * sn / n))
    got = cochran_armitage_trend(spark, SF).collect()[0]
    assert (got["n"], got["n_returned"]) == (n, r)
    assert got["base_rate"] == round(p, 6)
    assert abs(got["z_trend"] - z) < 1e-6
    assert got["significant"] == (abs(z) > CA_Z_CRIT)


# --------------------------- rank-machinery property (hypothesis)
def test_per_value_rank_identities_match_sorting():
    """Property test for the foundation every round-7 rank statistic
    stands on: on ANY multiset, the per-value-count formulations must
    equal the sort-based textbook definitions —
    - doubled tied rank 2r(v) = 2·cum<(v) + c(v) + 1,
    - Mann-Whitney 2U_A = Σ cA(2·cumB< + cB),
    - dominance counts (Cliff's δ numerator).
    Pure-Python integers vs naive sorting; no Spark session needed.
    """
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 12), st.booleans()),
            min_size=2,
            max_size=80,
        )
    )
    def check(pairs):
        values = [v for v, _ in pairs]
        counts = Counter(values)
        # tied-average ranks via sorting (reference)
        ref_ranks = _ranks(values)
        # per-value doubled rank
        for v in counts:
            cum = sum(c for w, c in counts.items() if w < v)
            r2 = 2 * cum + counts[v] + 1
            naive = [ref_ranks[i] for i, w in enumerate(values) if w == v][0]
            assert r2 == int(2 * naive)
        # Mann-Whitney U via ranks vs via per-value counts
        a = [v for v, f in pairs if f]
        b = [v for v, f in pairs if not f]
        if a and b:
            ca, cb = Counter(a), Counter(b)
            u2 = sum(
                c * (2 * sum(cb[w] for w in cb if w < v) + cb.get(v, 0))
                for v, c in ca.items()
            )
            pooled = a + b
            rr = _ranks(pooled)
            ra = sum(rr[: len(a)])
            u_ref = ra - len(a) * (len(a) + 1) / 2
            assert u2 == int(2 * u_ref)
            # dominance counts
            gt = sum(
                cna * cnb
                for va, cna in ca.items()
                for vb, cnb in cb.items()
                if va > vb
            )
            gt2 = sum(
                c * sum(cb[w] for w in cb if w < v) for v, c in ca.items()
            )
            assert gt == gt2

    check()
