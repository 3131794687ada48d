"""Round-8 operator tests: independent naive-Python reimplementations
for the classical-test family (stats8) — textbook sort/loop
formulations sharing no code with the Spark per-value-count plans.
"""

from __future__ import annotations

import math
from collections import defaultdict

from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


def _quant_flags(spark):
    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_returnflag")
        .collect()
    )
    return [(int(r["l_quantity"]), r["l_returnflag"]) for r in rows]


def _mean_var(xs):
    n = len(xs)
    m = sum(xs) / n
    v = sum((x - m) ** 2 for x in xs) / (n - 1)
    return n, m, v


def test_welch_t_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import welch_t_test

    data = _quant_flags(spark)
    a = [v for v, f in data if f == "R"]
    b = [v for v, f in data if f == "N"]
    n1, m1, v1 = _mean_var(a)
    n2, m2, v2 = _mean_var(b)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / (
        v1 * v1 / (n1 * n1 * (n1 - 1)) + v2 * v2 / (n2 * n2 * (n2 - 1))
    )
    row = welch_t_test(spark, SF).collect()[0]
    assert row["n_r"] == n1 and row["n_n"] == n2
    assert abs(row["t_stat"] - t) < 1e-5
    assert abs(row["df_welch"] - df) < 1e-3


def test_levene_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import levene_test

    data = _quant_flags(spark)
    groups = defaultdict(list)
    for v, f in data:
        groups[f].append(v)
    zs = []
    for g, xs in groups.items():
        xs.sort()
        med = xs[(len(xs) + 1) // 2 - 1]  # lower median, floored rank
        zs.append([abs(x - med) for x in xs])
    k = len(zs)
    nn = sum(len(z) for z in zs)
    gm = sum(sum(z) for z in zs) / nn
    between = sum(len(z) * (sum(z) / len(z) - gm) ** 2 for z in zs) / (k - 1)
    within = sum(
        sum((x - sum(z) / len(z)) ** 2 for x in z) for z in zs
    ) / (nn - k)
    row = levene_test(spark, SF).collect()[0]
    assert row["k"] == k and row["n"] == nn
    assert abs(row["f_stat"] - between / within) < 1e-5


def test_bartlett_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import bartlett_test

    data = _quant_flags(spark)
    groups = defaultdict(list)
    for v, f in data:
        groups[f].append(v)
    ks = list(groups.values())
    k = len(ks)
    nn = sum(len(x) for x in ks)
    sp2 = sum((len(x) - 1) * _mean_var(x)[2] for x in ks) / (nn - k)
    num = (nn - k) * math.log(sp2) - sum(
        (len(x) - 1) * math.log(_mean_var(x)[2]) for x in ks
    )
    c = 1 + (sum(1 / (len(x) - 1) for x in ks) - 1 / (nn - k)) / (3 * (k - 1))
    row = bartlett_test(spark, SF).collect()[0]
    assert abs(row["chi2"] - num / c) < 1e-5


def test_jarque_bera_flags_uniform_quantities(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import jarque_bera

    data = [v for v, _ in _quant_flags(spark)]
    n = len(data)
    m = sum(data) / n
    mu2 = sum((x - m) ** 2 for x in data) / n
    mu3 = sum((x - m) ** 3 for x in data) / n
    mu4 = sum((x - m) ** 4 for x in data) / n
    skew = mu3 / mu2**1.5
    kurt = mu4 / mu2**2
    jb = n * (skew**2 / 6 + (kurt - 3) ** 2 / 24)
    row = jarque_bera(spark, SF).collect()[0]
    assert abs(row["skewness"] - skew) < 1e-5
    assert abs(row["kurtosis"] - kurt) < 1e-5
    assert abs(row["jb_stat"] - jb) < max(1e-4 * jb, 1e-4)
    # a uniform 1..50 domain has kurtosis ~1.8 — the test must reject
    assert row["non_normal"] is True and row["kurtosis"] < 2.5


def test_hodges_lehmann_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import (
        hodges_lehmann_shift,
    )

    data = _quant_flags(spark)
    a = [v for v, f in data if f == "R"]
    b = [v for v, f in data if f == "N"]
    diffs = sorted(x - y for x in a for y in b)
    hl = diffs[(len(diffs) + 1) // 2 - 1]  # lower median
    row = hodges_lehmann_shift(spark, SF).collect()[0]
    assert row["hl_shift"] == hl
    assert row["m_a"] == len(a) and row["m_b"] == len(b)


def _naive_pairs(spark):
    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .collect()
    )
    per = defaultdict(list)
    for r in rows:
        per[r["l_orderkey"]].append(
            (int(r["l_linenumber"]), int(r["l_quantity"]))
        )
    pairs = []
    for k, lines in per.items():
        if len(lines) >= 2:
            pairs.append((min(lines)[1], max(lines)[1]))
    return pairs


def test_sign_test_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import sign_test

    pairs = _naive_pairs(spark)
    npos = sum(1 for f, l in pairs if l > f)
    nneg = sum(1 for f, l in pairs if l < f)
    ntie = len(pairs) - npos - nneg
    row = sign_test(spark, SF).collect()[0]
    assert (row["n_pos"], row["n_neg"], row["n_tie"]) == (npos, nneg, ntie)
    assert abs(row["z_stat"] - (npos - nneg) / math.sqrt(npos + nneg)) < 1e-5


def test_wilcoxon_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import (
        wilcoxon_signed_rank,
    )

    pairs = [(f, l) for f, l in _naive_pairs(spark) if f != l]
    ds = [l - f for f, l in pairs]
    ads = sorted(abs(d) for d in ds)
    # tied-average ranks of |d|
    rank_of = {}
    i = 0
    while i < len(ads):
        j = i
        while j + 1 < len(ads) and ads[j + 1] == ads[i]:
            j += 1
        rank_of[ads[i]] = (i + j + 2) / 2
        i = j + 1
    wplus = sum(rank_of[abs(d)] for d in ds if d > 0)
    n = len(ds)
    from collections import Counter

    tc = Counter(abs(d) for d in ds)
    tsum = sum(t**3 - t for t in tc.values())
    var = n * (n + 1) * (2 * n + 1) / 24 - tsum / 48
    z = (wplus - n * (n + 1) / 4) / math.sqrt(var)
    row = wilcoxon_signed_rank(spark, SF).collect()[0]
    assert row["n_pairs"] == n
    assert abs(row["w_plus"] - wplus) < 1e-9
    assert abs(row["z_stat"] - z) < 1e-5


def _naive_blocks(spark):
    rows = (
        load_table(spark, SF, "lineitem")
        .filter("l_linenumber <= 3")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .collect()
    )
    per = defaultdict(dict)
    for r in rows:
        ln, v = int(r["l_linenumber"]), int(r["l_quantity"])
        per[r["l_orderkey"]][ln] = max(per[r["l_orderkey"]].get(ln, 0), v)
    return [
        (d[1], d[2], d[3]) for d in per.values() if {1, 2, 3} <= set(d)
    ]


def test_friedman_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import friedman_test

    blocks = _naive_blocks(spark)
    n, k = len(blocks), 3
    rank_sums = [0.0] * k
    sq = 0.0
    for b in blocks:
        s = sorted(b)
        ranks = []
        for x in b:
            lt = sum(1 for y in b if y < x)
            eq = sum(1 for y in b if y == x)
            ranks.append(lt + (eq + 1) / 2)
        for j in range(k):
            rank_sums[j] += ranks[j]
            sq += ranks[j] ** 2
        assert s is not None
    num = (k - 1) * sum((r - n * (k + 1) / 2) ** 2 for r in rank_sums)
    den = sq - n * k * (k + 1) ** 2 / 4
    row = friedman_test(spark, SF).collect()[0]
    assert row["n_blocks"] == n
    for j in range(k):
        assert abs(row[f"rank_sum_{j+1}"] - rank_sums[j]) < 1e-9
    assert abs(row["chi2"] - num / den) < 1e-5


def test_cronbach_alpha_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import cronbach_alpha

    blocks = _naive_blocks(spark)
    k = 3
    item_var = sum(
        _mean_var([b[j] for b in blocks])[2] for j in range(k)
    )
    tot_var = _mean_var([sum(b) for b in blocks])[2]
    alpha = k / (k - 1) * (1 - item_var / tot_var)
    row = cronbach_alpha(spark, SF).collect()[0]
    assert row["n_blocks"] == len(blocks)
    assert abs(row["alpha"] - alpha) < 1e-5
    # independent items => alpha near zero, far from the 0.7 bar
    assert abs(row["alpha"]) < 0.4


def test_grubbs_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import (
        grubbs_max_outlier,
    )

    rows = load_table(spark, SF, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    daily = defaultdict(float)
    import datetime

    epoch = datetime.date(1970, 1, 1)
    for r in rows:
        d = r["o_orderdate"]
        day = ((d.date() if hasattr(d, "date") else d) - epoch).days
        daily[day] += float(r["o_totalprice"])
    xs = list(daily.values())
    n, m, v = _mean_var(xs)
    sd = math.sqrt(v)
    best = max(daily.items(), key=lambda kv: (abs(kv[1] - m) / sd, kv[0]))
    row = grubbs_max_outlier(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["day"] == best[0]
    assert abs(row["g_micro"] / 1e6 - abs(best[1] - m) / sd) < 1e-4


def test_partial_correlation_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import (
        partial_correlation,
    )

    rows = load_table(spark, SF, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount"
    ).collect()
    xs = [float(r[0]) for r in rows]
    ys = [float(r[1]) for r in rows]
    zs = [float(r[2]) for r in rows]

    def corr(a, b):
        n = len(a)
        ma, mb = sum(a) / n, sum(b) / n
        num = sum((u - ma) * (w - mb) for u, w in zip(a, b))
        return num / math.sqrt(
            sum((u - ma) ** 2 for u in a) * sum((w - mb) ** 2 for w in b)
        )

    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    row = partial_correlation(spark, SF).collect()[0]
    assert abs(row["r_xy"] - rxy) < 1e-5
    assert abs(row["r_xz"] - rxz) < 1e-5
    assert abs(row["r_yz"] - ryz) < 1e-5
    assert abs(row["r_xy_given_z"] - part) < 1e-5
    # this synthetic data generates price INDEPENDENT of quantity
    # (the OLS-R² corpus quirk): the screen must report near-zero
    # both marginally and partially, not invent a relationship
    assert abs(row["r_xy_given_z"]) < 0.1


def test_kendalls_w_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import kendalls_w

    rows = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_shipdate"
    ).collect()
    import datetime

    epoch = datetime.date(1970, 1, 1)
    cells = defaultdict(int)
    for r in rows:
        d = r["l_shipdate"]
        day = ((d.date() if hasattr(d, "date") else d) - epoch).days
        cells[(r["l_returnflag"], day % 7)] += 1
    flags = sorted({g for g, _ in cells})
    dows = sorted({j for _, j in cells})
    k, n = len(flags), len(dows)
    rank_sums = defaultdict(float)
    tsum = 0
    for g in flags:
        counts = [cells.get((g, j), 0) for j in dows]
        from collections import Counter

        for t in Counter(counts).values():
            tsum += t**3 - t
        for j, c in zip(dows, counts):
            lt = sum(1 for c2 in counts if c2 < c)
            eq = sum(1 for c2 in counts if c2 == c)
            rank_sums[j] += lt + (eq + 1) / 2
    s = sum((r - k * (n + 1) / 2) ** 2 for r in rank_sums.values())
    w = 12 * s / (k * k * (n**3 - n) - k * tsum)
    row = kendalls_w(spark, SF).collect()[0]
    assert row["n_objects"] == n and row["k_rankers"] == k
    assert abs(row["w"] - w) < 1e-5


# --------------------------------------------------- profiling module
def test_fk_containment_flags_real_and_fake_fks(spark):
    from cgtcalc_data_transformer_spark.operators.profiling import (
        fk_containment_audit,
    )

    rows = {r["candidate"]: r for r in fk_containment_audit(spark, SF).collect()}
    assert rows["lineitem.l_orderkey->orders.o_orderkey"]["is_fk"] is True
    assert rows["orders.o_custkey->customer.c_custkey"]["is_fk"] is True
    assert rows["customer.c_nationkey->nation.n_nationkey"]["is_fk"] is True
    neg = rows["orders.o_orderkey->customer.c_custkey"]
    assert neg["is_fk"] is False and neg["containment"] < 0.5


def test_fd_audit_flags_real_and_fake_dependencies(spark):
    from cgtcalc_data_transformer_spark.operators.profiling import fd_audit

    rows = {r["candidate"]: r for r in fd_audit(spark, SF).collect()}
    assert rows["orders: o_orderkey -> o_custkey"]["holds"] is True
    assert rows["nation: n_nationkey -> n_regionkey"]["holds"] is True
    assert rows["lineitem: l_orderkey -> l_returnflag"]["holds"] is False
    assert rows["part: p_brand -> p_type"]["holds"] is False


def test_join_cardinality_estimator_close_on_uniform_keys(spark):
    from cgtcalc_data_transformer_spark.operators.profiling import (
        join_cardinality_audit,
    )

    for r in join_cardinality_audit(spark, SF).collect():
        # FK joins on (near-)uniform key distributions: the textbook
        # estimator should land within 2x of the truth
        assert 0.5 < r["actual_over_est"] < 2.0, r


def test_candidate_key_audit_finds_the_key(spark):
    from cgtcalc_data_transformer_spark.operators.profiling import (
        candidate_key_audit,
    )

    rows = {r["column"]: r for r in candidate_key_audit(spark, SF).collect()}
    assert rows["o_orderkey"]["is_unique"] is True
    assert rows["o_orderkey"]["avg_multiplicity"] == 1.0
    assert rows["o_custkey"]["is_unique"] is False
    assert rows["o_orderpriority"]["n_distinct"] <= 10


# ------------------------------------------------------ sketch module
def test_ams_f2_exact_and_estimate(spark):
    from collections import Counter

    from cgtcalc_data_transformer_spark.operators.sketch8 import (
        AMS_A,
        AMS_B,
        AMS_K,
        _M,
        ams_f2_sketch,
    )

    keys = [
        r["o_custkey"]
        for r in load_table(spark, SF, "orders").select("o_custkey").collect()
    ]
    freq = Counter(keys)
    f2 = sum(f * f for f in freq.values())
    ests = []
    for i in range(AMS_K):
        s = sum(
            f * (1 - 2 * (((k % _M) * AMS_A[i] + AMS_B[i]) % _M % 2))
            for k, f in freq.items()
        )
        ests.append(float(s * s))
    est = sorted(ests)[AMS_K // 2 - 1]
    row = ams_f2_sketch(spark, SF).collect()[0]
    assert row["f2_exact"] == f2
    assert abs(row["f2_est"] - est) < 1e-6
    # median-of-16 AMS should land within a small constant factor
    assert row["rel_err"] < 1.0


def test_linear_counting_close_to_exact(spark):
    from cgtcalc_data_transformer_spark.operators.sketch8 import (
        linear_counting_audit,
    )

    exact = (
        load_table(spark, SF, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    row = linear_counting_audit(spark, SF).collect()[0]
    assert row["n_exact"] == exact
    assert row["n_occupied"] < row["m"]  # never saturated
    assert row["rel_err"] < 0.05


# ------------------------------------------------------ series module
def _naive_grid(spark):
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    rows = load_events(spark, SF).select("event_type", "ts").collect()
    DAY = 86400 * 10**9
    days = [int(r["ts"]) // DAY for r in rows]
    dmin, dmax = min(days), max(days)
    grid = defaultdict(lambda: [0] * (dmax - dmin + 1))
    for r, d in zip(rows, days):
        grid[r["event_type"]][d - dmin] += 1
    return dict(grid)


def test_ljung_box_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.series8 import (
        LB_MAX_LAG,
        ljung_box_test,
    )

    grid = _naive_grid(spark)
    rows = {r["event_type"]: r for r in ljung_box_test(spark, SF).collect()}
    for et, ys in grid.items():
        n = len(ys)
        m = sum(ys) / n
        den = sum((y - m) ** 2 for y in ys)
        srq = 0.0
        for k in range(1, min(LB_MAX_LAG, n - 1) + 1):
            num = sum(
                (ys[t] - m) * (ys[t + k] - m) for t in range(n - k)
            )
            srq += (num / den) ** 2 / (n - k)
        q = n * (n + 2) * srq
        assert abs(rows[et]["q_stat"] - q) < max(1e-4, 1e-5 * abs(q))
        assert rows[et]["n_days"] == n


def test_periodogram_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.series8 import (
        _PG_COS,
        _PG_SIN,
        PG_SCALE,
        periodogram_fixed,
    )

    grid = _naive_grid(spark)
    rows = {
        (r["event_type"], r["period"]): r
        for r in periodogram_fixed(spark, SF).collect()
    }
    for et, ys in grid.items():
        for p in (7, 14, 30):
            c = sum(y * _PG_COS[p][t % p] for t, y in enumerate(ys))
            s = sum(y * _PG_SIN[p][t % p] for t, y in enumerate(ys))
            amp = math.sqrt(c * c + s * s) / PG_SCALE / len(ys)
            got = rows[(et, p)]
            assert abs(got["amp"] - amp) < 1e-5
            assert abs(got["rel_amp"] - amp / (sum(ys) / len(ys))) < 1e-5


def test_seasonal_decompose_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.series8 import (
        SD_SCALE,
        seasonal_decompose_ma,
    )

    grid = _naive_grid(spark)
    rows = {
        (r["event_type"], r["dow"]): r
        for r in seasonal_decompose_ma(spark, SF).collect()
    }
    for et, ys in grid.items():
        per_dow = defaultdict(list)
        for t in range(3, len(ys) - 3):
            ma = sum(ys[t - 3:t + 4]) / 7
            per_dow[t % 7].append(ys[t] - ma)
        for dow, vals in per_dow.items():
            got = rows[(et, dow)]
            assert got["n_days"] == len(vals)
            want = math.floor(sum(vals) / len(vals) * SD_SCALE + 0.5)
            assert got["seas_micro"] == want


def test_ccf_lag0_matches_naive_pearson(spark):
    from cgtcalc_data_transformer_spark.operators.series8 import ccf_lagged

    grid = _naive_grid(spark)
    xs, ys = grid["view"], grid["purchase"]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    for lag in range(4):
        num = sum(
            (xs[t] - mx) * (ys[t + lag] - my) for t in range(n - lag)
        )
        den = math.sqrt(
            sum((x - mx) ** 2 for x in xs) * sum((y - my) ** 2 for y in ys)
        )
        got = [r for r in ccf_lagged(spark, SF).collect() if r["lag"] == lag]
        assert len(got) == 1
        assert abs(got[0]["ccf"] - num / den) < 1e-5


# ------------------------------------------------------ text8 module
def test_monroe_log_odds_matches_naive(spark):
    from collections import Counter
    import re

    from cgtcalc_data_transformer_spark.operators.text8 import (
        LO_A,
        LO_ALPHA0,
        LO_B,
        LO_TOP_K,
        monroe_log_odds,
    )

    docs = load_table(spark, SF, "documents").select("lang", "text").collect()
    c1, c2 = Counter(), Counter()
    for r in docs:
        toks = re.findall(r"[a-z0-9]+", r["text"].lower())
        if r["lang"] == LO_A:
            c1.update(toks)
        elif r["lang"] == LO_B:
            c2.update(toks)
    n1, n2 = sum(c1.values()), sum(c2.values())
    scored = []
    for w in set(c1) | set(c2):
        y1, y2 = c1.get(w, 0), c2.get(w, 0)
        aw = LO_ALPHA0 * (y1 + y2) / (n1 + n2)
        d = math.log((y1 + aw) / (n1 + LO_ALPHA0 - y1 - aw)) - math.log(
            (y2 + aw) / (n2 + LO_ALPHA0 - y2 - aw)
        )
        z = d / math.sqrt(1 / (y1 + aw) + 1 / (y2 + aw))
        scored.append((round(z, 6), w, y1, y2))
    scored.sort(key=lambda t: (-abs(t[0]), t[1]))
    rows = monroe_log_odds(spark, SF).collect()
    assert len(rows) == LO_TOP_K
    for row, (z, w, y1, y2) in zip(rows, scored[:LO_TOP_K]):
        assert row["word"] == w
        assert abs(row["z_log_odds"] - z) < 2e-6
        assert (row[f"c_{LO_A}"], row[f"c_{LO_B}"]) == (y1, y2)


def test_word_burstiness_matches_naive(spark):
    from collections import Counter
    import re

    from cgtcalc_data_transformer_spark.operators.text8 import (
        WB_TOP_WORDS,
        word_burstiness,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    per_doc = {
        r["doc_id"]: Counter(re.findall(r"[a-z0-9]+", r["text"].lower()))
        for r in docs
    }
    n = len(per_doc)
    tot = Counter()
    for c in per_doc.values():
        tot.update(c)
    top = sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[:WB_TOP_WORDS]
    rows = {r["word"]: r for r in word_burstiness(spark, SF).collect()}
    assert len(rows) == WB_TOP_WORDS
    for w, total in top:
        counts = [per_doc[d].get(w, 0) for d in per_doc]
        mean = sum(counts) / n
        var = sum((c - mean) ** 2 for c in counts) / n
        assert rows[w]["total"] == total
        assert abs(rows[w]["vmr"] - var / mean) < 1e-5


def test_dedup_levenshtein_summary(spark):
    from cgtcalc_data_transformer_spark.operators.text8 import (
        dedup_levenshtein,
    )

    row = dedup_levenshtein(spark, SF).collect()[0]
    # prefix blocking keeps candidates tiny on this corpus; the audit
    # must report honestly rather than inventing pairs
    assert row["n_near_dups"] <= row["n_candidates"]
    assert row["n_candidates"] >= 0


def test_shuffle_run_audit_covers_all_docs(spark):
    from cgtcalc_data_transformer_spark.operators.text8 import (
        shuffle_run_audit,
    )

    rows = shuffle_run_audit(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 1 <= r["max_run"] <= r["n_docs"]
        assert r["n_runs"] <= r["n_docs"]
        # a seeded shuffle of a ~5%-share source should never produce
        # a pathological same-source run
        assert r["max_run"] <= 12


def test_jl_projection_distortion_concentrates(spark):
    from cgtcalc_data_transformer_spark.operators.embedding_ops import (
        jl_projection_audit,
    )

    row = jl_projection_audit(spark, SF).collect()[0]
    assert row["n_pairs"] > 0
    # JL with k=16: mean ratio near 1, spread within ~3x
    assert 0.7 < row["mean_ratio_micro"] / 1e6 < 1.3
    assert row["min_ratio_micro"] > 0
    assert row["max_ratio_micro"] / 1e6 < 4.0


def test_degree_assortativity_matches_naive(spark):
    from collections import Counter

    from cgtcalc_data_transformer_spark.operators.graph import (
        degree_assortativity,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey").collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, SF, "orders").collect()
    }
    pairs = {
        (f"C{orders[r['l_orderkey']]}", f"S{r['l_suppkey']}")
        for r in li
        if r["l_orderkey"] in orders
    }
    edges = [(c, s) for c, s in pairs] + [(s, c) for c, s in pairs]
    deg = Counter(src for src, _ in edges)
    xs = [deg[u] for u, v in edges]
    ys = [deg[v] for u, v in edges]
    m = len(edges)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    r = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    row = degree_assortativity(spark, SF).collect()[0]
    assert row["n_edge_ends"] == m
    assert abs(row["assortativity"] - r) < 1e-5


def test_theil_index_matches_naive(spark):
    from collections import defaultdict as dd

    from cgtcalc_data_transformer_spark.operators.stats8 import theil_index

    spend = dd(float)
    for r in load_table(spark, SF, "orders").collect():
        spend[r["o_custkey"]] += float(r["o_totalprice"])
    xs = list(spend.values())
    n = len(xs)
    mu = sum(xs) / n
    t = sum((x / mu) * math.log(x / mu) for x in xs) / n
    l = sum(math.log(mu / x) for x in xs) / n
    row = theil_index(spark, SF).collect()[0]
    assert row["n_entities"] == n
    assert abs(row["theil_t_micro"] / 1e6 - t) < 1e-4
    assert abs(row["theil_l_micro"] / 1e6 - l) < 1e-4
    assert row["theil_t_micro"] >= 0


# ------------------------------------------------------ wave-5 ops
def test_pacf_matches_naive_durbin_levinson(spark):
    from cgtcalc_data_transformer_spark.operators.series8 import (
        pacf_daily_counts,
    )

    grid = _naive_grid(spark)
    rows = {r["event_type"]: r for r in pacf_daily_counts(spark, SF).collect()}
    for et, ys in grid.items():
        n = len(ys)
        m = sum(ys) / n
        den = sum((y - m) ** 2 for y in ys)
        r = [
            sum((ys[t] - m) * (ys[t + k] - m) for t in range(n - k)) / den
            for k in (1, 2, 3)
        ]
        p11 = r[0]
        v1 = 1 - r[0] ** 2
        p22 = (r[1] - r[0] ** 2) / v1
        p21 = r[0] * (1 - p22)
        v2 = v1 * (1 - p22**2)
        p33 = (r[2] - p21 * r[1] - p22 * r[0]) / v2
        got = rows[et]
        assert abs(got["pacf1"] - p11) < 1e-5
        assert abs(got["pacf2"] - p22) < 1e-5
        assert abs(got["pacf3"] - p33) < 1e-5


def test_mann_kendall_matches_naive(spark):
    from collections import Counter

    from cgtcalc_data_transformer_spark.operators.series8 import (
        mann_kendall_trend,
    )

    grid = _naive_grid(spark)
    rows = {r["event_type"]: r for r in mann_kendall_trend(spark, SF).collect()}
    for et, ys in grid.items():
        n = len(ys)
        s = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values()
        )
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18
        z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(var)
        got = rows[et]
        assert got["s"] == s and got["n_days"] == n
        assert abs(got["z_stat"] - z) < 1e-5


def test_changepoint_split_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.series8 import (
        CP_SCALE,
        changepoint_split,
    )

    grid = _naive_grid(spark)
    rows = {r["event_type"]: r for r in changepoint_split(spark, SF).collect()}
    for et, ys in grid.items():
        n = len(ys)
        t = sum(ys)
        best = None
        for s in range(1, n - 1 + 1):
            if s >= n:
                break
            ls = sum(ys[:s])
            if n - s == 0:
                continue
            gain = ls * ls / s + (t - ls) ** 2 / (n - s) - t * t / n
            gq = math.floor(gain * CP_SCALE + 0.5)
            key = (gq, s)
            if best is None or key > best:
                best = key
        # the op excludes s = n (empty right side) via d < n-1 → s <= n-1
        got = rows[et]
        assert (got["gain_q"], got["split_day"]) == best
        assert got["n_days"] == n


def test_target_encode_oof_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.ml8 import (
        TE_FOLDS,
        TE_SMOOTH_M,
        target_encode_oof,
    )
    import hashlib

    rows_in = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    ).collect()
    data = []
    for r in rows_in:
        h = int(hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:8], 16)
        data.append(
            (r["o_orderpriority"], h % 1000 % TE_FOLDS,
             1 if r["o_orderstatus"] == "F" else 0)
        )
    cells = defaultdict(lambda: [0, 0])
    for c, f, y in data:
        cells[(c, f)][0] += 1
        cells[(c, f)][1] += y
    got = {
        (r["category"], r["fold"]): r
        for r in target_encode_oof(spark, SF).collect()
    }
    nt = len(data)
    pt = sum(y for _, _, y in data)
    for (c, f), (n, pos) in cells.items():
        nc = sum(v[0] for (cc, _), v in cells.items() if cc == c)
        pc = sum(v[1] for (cc, _), v in cells.items() if cc == c)
        nf = sum(v[0] for (_, ff), v in cells.items() if ff == f)
        pf = sum(v[1] for (_, ff), v in cells.items() if ff == f)
        prior = (pt - pf) / (nt - nf)
        enc = (pc - pos + TE_SMOOTH_M * prior) / (nc - n + TE_SMOOTH_M)
        assert got[(c, f)]["n_rows"] == n
        assert abs(got[(c, f)]["encoded"] - enc) < 1e-5
    # leakage check: encodings must differ across folds (they exclude
    # different slices) but stay near the category mean
    assert len({r["encoded"] for r in got.values()}) > 1


def test_collocations_llr_matches_naive(spark):
    import re
    from collections import Counter

    from cgtcalc_data_transformer_spark.operators.text8 import (
        LLR_MIN_COUNT,
        LLR_TOP_K,
        collocations_llr,
    )

    docs = load_table(spark, SF, "documents").select("text").collect()
    bg = Counter()
    for r in docs:
        toks = re.findall(r"[a-z0-9]+", r["text"].lower())
        bg.update(" ".join(p) for p in zip(toks, toks[1:]))
    n = sum(bg.values())
    c1, c2 = Counter(), Counter()
    for b, k in bg.items():
        w1, w2 = b.split(" ")
        c1[w1] += k
        c2[w2] += k

    def xlx(x):
        return x * math.log(x) if x > 0 else 0.0

    scored = []
    for b, k11 in bg.items():
        if k11 < LLR_MIN_COUNT:
            continue
        w1, w2 = b.split(" ")
        r_, c_ = c1[w1], c2[w2]
        k12, k21, k22 = r_ - k11, c_ - k11, n - r_ - c_ + k11
        llr = 2 * (
            xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
            - xlx(r_) - xlx(n - r_) - xlx(c_) - xlx(n - c_) + xlx(n)
        )
        scored.append((round(llr, 6), b, k11))
    scored.sort(key=lambda t: (-t[0], t[1]))
    rows = collocations_llr(spark, SF).collect()
    assert len(rows) == min(LLR_TOP_K, len(scored))
    for row, (llr, b, k11) in zip(rows, scored[: len(rows)]):
        assert row["bigram"] == b
        assert abs(row["llr"] - llr) < 2e-6
        assert row["count"] == k11


def test_harmonic_centrality_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.graph import (
        harmonic_centrality_nations,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey").collect()
    orders = {r["o_orderkey"]: r["o_custkey"] for r in load_table(spark, SF, "orders").collect()}
    cust = {r["c_custkey"]: r["c_nationkey"] for r in load_table(spark, SF, "customer").collect()}
    supp = {r["s_suppkey"]: r["s_nationkey"] for r in load_table(spark, SF, "supplier").collect()}
    names = {r["n_nationkey"]: r["n_name"] for r in load_table(spark, SF, "nation").collect()}
    edges = defaultdict(set)
    for r in li:
        ok = r["l_orderkey"]
        if ok not in orders:
            continue
        a = cust[orders[ok]]
        b = supp[r["l_suppkey"]]
        if a != b:
            edges[a].add(b)
            edges[b].add(a)
    # BFS up to depth 3 from every node
    want = {}
    for v in edges:
        dist = {v: 0}
        frontier = [v]
        for d in (1, 2, 3):
            nxt = []
            for u in frontier:
                for w in edges[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        n1 = sum(1 for d in dist.values() if d == 1)
        n2 = sum(1 for d in dist.values() if d == 2)
        n3 = sum(1 for d in dist.values() if d == 3)
        want[names[v]] = (n1, n2, n3, n1 + n2 / 2 + n3 / 3)
    rows = {r["nation"]: r for r in harmonic_centrality_nations(spark, SF).collect()}
    assert set(rows) == set(want)
    for nation, (n1, n2, n3, h) in want.items():
        got = rows[nation]
        assert (got["n1"], got["n2"], got["n3"]) == (n1, n2, n3)
        assert abs(got["harmonic"] - h) < 1e-6


# ------------------------------------------------------ wave-6 ops
def test_tukey_hsd_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import tukey_hsd

    data = _quant_flags(spark)
    groups = defaultdict(list)
    for v, f in data:
        groups[f].append(v)
    nn = sum(len(x) for x in groups.values())
    k = len(groups)
    sse = sum(
        sum((x - sum(xs) / len(xs)) ** 2 for x in xs)
        for xs in groups.values()
    )
    mse = sse / (nn - k)
    rows = {r["pair"]: r for r in tukey_hsd(spark, SF).collect()}
    flags = sorted(groups)
    n_pairs = 0
    for i, a in enumerate(flags):
        for b in flags[i + 1:]:
            ma = sum(groups[a]) / len(groups[a])
            mb = sum(groups[b]) / len(groups[b])
            se = math.sqrt(mse / 2 * (1 / len(groups[a]) + 1 / len(groups[b])))
            got = rows[f"{a}-{b}"]
            assert abs(got["mean_diff"] - (ma - mb)) < 1e-5
            assert abs(got["q_stat"] - abs(ma - mb) / se) < 1e-5
            n_pairs += 1
    assert len(rows) == n_pairs == 3


def test_ks_test_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import (
        ks_test_quantity,
    )

    data = _quant_flags(spark)
    a = sorted(v for v, f in data if f == "R")
    b = sorted(v for v, f in data if f == "N")
    ma, mb = len(a), len(b)
    best = None
    for v in range(1, 51):
        fa = sum(1 for x in a if x <= v)
        fb = sum(1 for x in b if x <= v)
        dnum = abs(fa * mb - fb * ma)
        key = (dnum, v)
        if best is None or key > best:
            best = key
    d = best[0] / (ma * mb)
    row = ks_test_quantity(spark, SF).collect()[0]
    assert row["argmax_v"] == best[1]
    assert abs(row["d_stat"] - d) < 1e-6
    assert (row["m_r"], row["m_n"]) == (ma, mb)


def test_cochran_q_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import cochran_q_test

    blocks = _naive_blocks(spark)
    xs = [tuple(int(q > 25) for q in b) for b in blocks]
    n = len(xs)
    c = [sum(x[j] for x in xs) for j in range(3)]
    t = sum(sum(x) for x in xs)
    r2 = sum(sum(x) ** 2 for x in xs)
    q = 3 * 2 * sum((cj - t / 3) ** 2 for cj in c) / (3 * t - r2)
    row = cochran_q_test(spark, SF).collect()[0]
    assert row["n_blocks"] == n
    assert (row["succ_pos1"], row["succ_pos2"], row["succ_pos3"]) == tuple(c)
    assert abs(row["q_stat"] - q) < 1e-5


def test_power_analysis_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import (
        PWR_Z_ALPHA,
        PWR_Z_BETA,
        power_analysis_quantity,
    )

    data = _quant_flags(spark)
    a = [v for v, f in data if f == "R"]
    b = [v for v, f in data if f == "N"]
    n1, n2 = len(a), len(b)
    m1, m2 = sum(a) / n1, sum(b) / n2
    ss = sum((x - m1) ** 2 for x in a) + sum((x - m2) ** 2 for x in b)
    sp = math.sqrt(ss / (n1 + n2 - 2))
    d = abs(m1 - m2) / sp
    n_req = math.ceil(2 * ((PWR_Z_ALPHA + PWR_Z_BETA) / d) ** 2)
    row = power_analysis_quantity(spark, SF).collect()[0]
    assert row["n_observed"] == n1 + n2
    assert abs(row["cohens_d"] - d) < 1e-6
    assert row["n_required_per_group"] == n_req
    assert row["currently_powered"] == (n1 >= n_req and n2 >= n_req)


# ------------------------------------------------------ wave-7 ops
def test_fleiss_kappa_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import fleiss_kappa

    blocks = _naive_blocks(spark)
    n, k = len(blocks), 3
    rs = [sum(1 for q in b if q > 25) for b in blocks]
    pbar = sum(r * r + (k - r) ** 2 - k for r in rs) / (n * k * (k - 1))
    p1 = sum(rs) / (n * k)
    pe = p1 * p1 + (1 - p1) ** 2
    kappa = (pbar - pe) / (1 - pe)
    row = fleiss_kappa(spark, SF).collect()[0]
    assert row["n_blocks"] == n
    assert abs(row["p_high"] - p1) < 1e-6
    assert abs(row["kappa"] - kappa) < 1e-5
    # independent positions => agreement ~ chance
    assert abs(row["kappa"]) < 0.2


def test_g_test_matches_naive(spark):
    from collections import Counter

    from cgtcalc_data_transformer_spark.operators.stats8 import (
        g_test_independence,
    )

    rows_in = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).collect()
    cells = Counter((r[0], r[1]) for r in rows_in)
    n = sum(cells.values())
    rm = Counter()
    cm = Counter()
    for (a, b), c in cells.items():
        rm[a] += c
        cm[b] += c

    def xlx(x):
        return x * math.log(x) if x > 0 else 0.0

    g = 2 * (
        sum(xlx(c) for c in cells.values())
        - sum(xlx(c) for c in rm.values())
        - sum(xlx(c) for c in cm.values())
        + xlx(n)
    )
    row = g_test_independence(spark, SF).collect()[0]
    assert row["n_rows"] == n and row["n_cells"] == len(cells)
    assert abs(row["g_stat"] - g) < max(1e-4, 1e-6 * abs(g))


def test_revenue_var_es_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import (
        VAR_PCT,
        revenue_var_es,
    )

    daily = defaultdict(float)
    for r in load_table(spark, SF, "orders").collect():
        daily[r["o_orderdate"]] += float(r["o_totalprice"])
    xs = sorted(daily.values())
    n = len(xs)
    r_rank = -(-n * VAR_PCT // 100)  # ceil
    var = xs[r_rank - 1]
    tail = [x for x in xs if x >= var]
    row = revenue_var_es(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["n_tail"] == len(tail)
    assert abs(row["var_p95"] - var) < 0.02
    assert abs(row["es_p95"] - sum(tail) / len(tail)) < 1e-3


def test_source_diversity_matches_naive(spark):
    from collections import Counter

    from cgtcalc_data_transformer_spark.operators.text8 import (
        source_diversity_indices,
    )

    srcs = Counter(
        r["source"]
        for r in load_table(spark, SF, "documents").select("source").collect()
    )
    n = sum(srcs.values())
    s = len(srcs)
    h = -sum(c / n * math.log(c / n) for c in srcs.values())
    simpson = sum(c * c for c in srcs.values()) / (n * n)
    row = source_diversity_indices(spark, SF).collect()[0]
    assert (row["n_sources"], row["n_docs"]) == (s, n)
    assert abs(row["shannon_micro"] / 1e6 - h) < 1e-4
    assert abs(row["simpson"] - simpson) < 1e-6
    assert abs(row["pielou_j"] - h / math.log(s)) < 1e-4


def test_modularity_regions_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.graph import (
        modularity_regions,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey").collect()
    orders = {r["o_orderkey"]: r["o_custkey"] for r in load_table(spark, SF, "orders").collect()}
    cust = {r["c_custkey"]: r["c_nationkey"] for r in load_table(spark, SF, "customer").collect()}
    supp = {r["s_suppkey"]: r["s_nationkey"] for r in load_table(spark, SF, "supplier").collect()}
    region = {r["n_nationkey"]: r["n_regionkey"] for r in load_table(spark, SF, "nation").collect()}
    pairs = set()
    for r in li:
        ok = r["l_orderkey"]
        if ok not in orders:
            continue
        a, b = cust[orders[ok]], supp[r["l_suppkey"]]
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    m = len(pairs)
    intra = sum(1 for a, b in pairs if region[a] == region[b])
    deg = defaultdict(int)
    for a, b in pairs:
        deg[region[a]] += 1
        deg[region[b]] += 1
    q = intra / m - sum(d * d / (4 * m * m) for d in deg.values())
    row = modularity_regions(spark, SF).collect()[0]
    assert (row["n_edges"], row["intra_edges"]) == (m, intra)
    assert abs(row["modularity_q"] - q) < 1e-6


# ------------------------------------------------------ wave-8 ops
def test_qq_deciles_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.stats8 import qq_deciles

    data = _quant_flags(spark)
    a = sorted(v for v, f in data if f == "R")
    b = sorted(v for v, f in data if f == "N")
    rows = {r["decile"]: r for r in qq_deciles(spark, SF).collect()}
    assert set(rows) == set(range(1, 10))
    for d in range(1, 10):
        qa = a[-(-len(a) * d // 10) - 1]  # ceil rank, 1-based
        qb = b[-(-len(b) * d // 10) - 1]
        assert rows[d]["q_r"] == qa
        assert rows[d]["q_n"] == qb
        assert rows[d]["gap"] == qa - qb


def test_odds_ratio_matches_naive(spark):
    from collections import Counter

    from cgtcalc_data_transformer_spark.operators.stats8 import odds_ratio_ci

    rows_in = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).collect()
    c = Counter(
        (r["l_returnflag"] == "R", r["l_linestatus"] == "F")
        for r in rows_in
        if r["l_returnflag"] in ("R", "N")
    )
    a, b = c[(True, True)], c[(True, False)]
    cc, d = c[(False, True)], c[(False, False)]
    orr = a * d / (b * cc)
    se = math.sqrt(1 / a + 1 / b + 1 / cc + 1 / d)
    row = odds_ratio_ci(spark, SF).collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, cc, d)
    assert abs(row["odds_ratio"] - orr) < 1e-6
    assert abs(row["ci_lo"] - math.exp(math.log(orr) - 1.959964 * se)) < 1e-5
    assert abs(row["ci_hi"] - math.exp(math.log(orr) + 1.959964 * se)) < 1e-5
