"""Round-14 new-operator tests: independent naive-Python
reimplementations (textbook loops, no shared plan machinery) for the
drift / rank-test / concentration / dedup-audit batch.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

from cgtcalc_data_transformer_spark.operators import stats14 as s14
from cgtcalc_data_transformer_spark.sources.tpch import load_events, load_table

SF = "/root/testdata/sf0.001"
DAY_NS = 86400 * 10**9
MICRO = 10**6


def _daily(spark):
    """(type -> [y_0..y_D-1]) zero-filled daily counts, naive."""
    ev = load_events(spark, SF).select("event_type", "ts").collect()
    days = [int(r.ts) // DAY_NS for r in ev]
    dmin, dmax = min(days), max(days)
    nd = dmax - dmin + 1
    series: dict[str, list[int]] = defaultdict(lambda: [0] * nd)
    for r, d in zip(ev, days):
        series[r.event_type][d - dmin] += 1
    return series


def _tokens(text: str) -> list[str]:
    return [
        w
        for w in re.split(r"\s+", re.sub(r"[^a-zA-Z0-9 ]", " ", text).lower())
        if w
    ]


def _shingles(text: str) -> set[str]:
    w = _tokens(text)
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


# ------------------------------------------------------------ CUSUM
def test_cusum_matches_naive(spark):
    series = _daily(spark)
    got = {r.event_type: r for r in s14.cusum_drift_detector(spark, SF).collect()}
    assert set(got) == set(series)
    for t, ys in series.items():
        nd, s = len(ys), sum(ys)
        p = 0
        run_min = run_max = 0
        c_pos = c_neg = 0
        peak = None
        prefix = []
        for y in ys:
            p += nd * y - s
            prefix.append(p)
        run_min = run_max = prefix[0]
        best_pos = None
        for d, p in enumerate(prefix):
            run_min = min(run_min, p)
            run_max = max(run_max, p)
            c_pos = max(c_pos, p - run_min)
            c_neg = max(c_neg, run_max - p)
        for d, p in enumerate(prefix):
            rm = min(prefix[: d + 1])
            if p - rm == c_pos:
                best_pos = d
                break
        r = got[t]
        assert (r.n_days, r.cusum_pos, r.cusum_neg, r.pos_peak_d) == (
            nd,
            c_pos,
            c_neg,
            best_pos,
        )


# ----------------------------------------------------- Kendall τ-b
def test_kendall_tau_matches_naive(spark):
    series = _daily(spark)
    got = {
        (r.type_a, r.type_b): r
        for r in s14.kendall_tau_daily(spark, SF).collect()
    }
    types = sorted(series)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            ya, yb = series[ta], series[tb]
            nd = len(ya)
            c = d = tie_a = tie_b = tie_both = 0
            for x in range(nd):
                for y in range(x + 1, nd):
                    da, db = ya[y] - ya[x], yb[y] - yb[x]
                    if da == 0 and db == 0:
                        tie_both += 1
                    elif da == 0:
                        tie_a += 1
                    elif db == 0:
                        tie_b += 1
                    elif (da > 0) == (db > 0):
                        c += 1
                    else:
                        d += 1
            n_pairs = nd * (nd - 1) // 2
            den_a = n_pairs - tie_a - tie_both
            den_b = n_pairs - tie_b - tie_both
            tau_milli = math.floor(
                (c - d) * 1000.0 / (math.sqrt(den_a) * math.sqrt(den_b)) + 0.5
            )
            r = got[(ta, tb)]
            assert (
                r.n_pairs,
                r.concordant,
                r.discordant,
                r.tie_a,
                r.tie_b,
                r.tie_both,
                r.tau_b_milli,
            ) == (n_pairs, c, d, tie_a, tie_b, tie_both, tau_milli)


# ------------------------------------------------ Wilcoxon signed
def test_wilcoxon_matches_naive(spark):
    series = _daily(spark)
    got = {
        (r.type_a, r.type_b): r
        for r in s14.wilcoxon_signed_rank_daily(spark, SF).collect()
    }
    types = sorted(series)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            diffs = [
                a - b for a, b in zip(series[ta], series[tb]) if a != b
            ]
            if not diffs:
                assert (ta, tb) not in got
                continue
            n = len(diffs)
            order = sorted(range(n), key=lambda j: abs(diffs[j]))
            # 2x average ranks with ties
            r2 = [0] * n
            j = 0
            while j < n:
                k = j
                while (
                    k + 1 < n
                    and abs(diffs[order[k + 1]]) == abs(diffs[order[j]])
                ):
                    k += 1
                # ranks j+1..k+1 → 2·avg = (j+1) + (k+1)
                for m in range(j, k + 1):
                    r2[order[m]] = (j + 1) + (k + 1)
                j = k + 1
            w_plus = sum(r for r, dd in zip(r2, diffs) if dd > 0)
            w_minus = sum(r for r, dd in zip(r2, diffs) if dd < 0)
            ties = Counter(abs(d) for d in diffs)
            tie_term = sum(t**3 - t for t in ties.values())
            var48 = 2 * n * (n + 1) * (2 * n + 1) - tie_term
            z = (
                float(2 * w_plus - n * (n + 1))
                * math.sqrt(3.0)
                / math.sqrt(var48)
            )
            z_milli = math.floor(z * 1000.0 + 0.5)
            r = got[(ta, tb)]
            assert (
                r.n_nonzero,
                r.w_plus_x2,
                r.w_minus_x2,
                r.tie_term,
                r.z_milli,
            ) == (n, w_plus, w_minus, tie_term, z_milli)


# --------------------------------------------------- Lorenz / Gini
def test_lorenz_matches_naive(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    toks = sorted(
        (len(_tokens(r.text)), int(r.doc_id)) for r in docs
    )
    n = len(toks)
    tt = sum(t for t, _ in toks)
    wsum = sum((2 * (i + 1) - 1) * t for i, (t, _) in enumerate(toks))
    gini_micro = (wsum - (n + 1) * tt) * MICRO // (n * tt)
    # ntile(10) boundaries: first (n % 10) tiles get one extra row
    base, extra = divmod(n, 10)
    got = {r.decile: r for r in s14.lorenz_curve_tokens(spark, SF).collect()}
    idx = 0
    cum = 0
    for dec in range(1, 11):
        size = base + (1 if dec <= extra else 0)
        chunk = toks[idx : idx + size]
        idx += size
        cum += sum(t for t, _ in chunk)
        r = got[dec]
        assert (r.n_docs, r.cum_tokens) == (size, cum)
        assert r.cum_share_micro == cum * MICRO // tt
        assert r.gini_micro == gini_micro


# --------------------------------------------------- n-gram novelty
def test_novelty_matches_naive(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    sh = {int(r.doc_id): _shingles(r.text) for r in docs}
    df = Counter()
    for s in sh.values():
        df.update(s)
    got = {r.doc_id: r for r in s14.ngram_novelty_score(spark, SF).collect()}
    expect = {d for d, s in sh.items() if s}
    assert set(got) == expect
    for d, s in sh.items():
        if not s:
            continue
        uniq = sum(1 for g in s if df[g] == 1)
        r = got[d]
        assert (r.n_shingles, r.n_unique) == (len(s), uniq)
        assert r.novelty_micro == uniq * MICRO // len(s)


# --------------------------------------------- MinHash estimate audit
def test_minhash_estimate_audit_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.dedup import (
        LSH_BANDS,
        MINHASH_K,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    sh = {int(r.doc_id): _shingles(r.text) for r in docs}

    def h(g, k):
        return hashlib.md5(f"{g}#seed{k}".encode()).hexdigest()

    sig = {
        d: [min(h(g, k) for g in s) for k in range(MINHASH_K)]
        for d, s in sh.items()
        if s
    }
    rpb = MINHASH_K // LSH_BANDS
    buckets = defaultdict(list)
    for d, hs in sig.items():
        for b in range(LSH_BANDS):
            key = (b, hashlib.md5(
                "|".join(hs[b * rpb : (b + 1) * rpb]).encode()
            ).hexdigest())
            buckets[key].append(d)
    cands = set()
    for ds in buckets.values():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                cands.add((a, b))
    got = {
        (r.doc_a, r.doc_b): r
        for r in s14.minhash_estimate_audit(spark, SF).collect()
    }
    assert set(got) == cands
    for a, b in cands:
        m = sum(1 for k in range(MINHASH_K) if sig[a][k] == sig[b][k])
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        est_micro = m * MICRO // MINHASH_K
        jac_micro = inter * MICRO // union
        r = got[(a, b)]
        assert (r.est_matches, r.est_micro, r.jaccard_micro) == (
            m,
            est_micro,
            jac_micro,
        )
        assert r.abs_err_micro == abs(est_micro - jac_micro)


# --------------------------------------- dup cluster size histogram
def test_dup_histogram_matches_naive(spark):
    docs = load_table(spark, SF, "documents").select("text").collect()
    sizes = Counter(Counter(r.text for r in docs).values())
    got = {
        r.cluster_size: r
        for r in s14.dup_cluster_size_histogram(spark, SF).collect()
    }
    assert set(got) == set(sizes)
    for sz, nc in sizes.items():
        assert (got[sz].n_clusters, got[sz].n_docs) == (nc, sz * nc)
