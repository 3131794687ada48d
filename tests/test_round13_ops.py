"""Round-13 new-operator tests: independent naive-Python/numpy
reimplementations (textbook loops, no shared plan machinery) for the
resampling / calibration / linkage / trend batch, plus structural
cross-checks for the nprobe sweep.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from cgtcalc_data_transformer_spark.operators import stats13 as s13
from cgtcalc_data_transformer_spark.sources.tpch import load_events, load_table

SF = "/root/testdata/sf0.001"
DAY_NS = 86400 * 10**9
MICRO = 10**6


def _md5_word(key: str, lo: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[lo : lo + 8], 16)


def _sq(x: float, scale: float) -> int:
    return int(math.floor(abs(x) * scale + 0.5)) * (-1 if x < 0 else 1)


# ------------------------------------------------- permutation test
def test_permutation_test_matches_naive(spark):
    rows = (
        load_table(spark, SF, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    from decimal import Decimal

    data = [
        (int(r.o_custkey), Decimal(repr(float(r.o_totalprice))).quantize(Decimal("0.01")))
        for r in rows
    ]
    n = len(data)
    s_all = sum(p for _, p in data)

    def diff_for(bits):
        s1 = sum(p for (ck, p), b in zip(data, bits) if b)
        n1 = sum(bits)
        return float(s1) / n1 - float(s_all - s1) / (n - n1)

    obs_bits = [
        1 if _md5_word(str(ck), 0) % 100 % 2 == 1 else 0 for ck, _ in data
    ]
    obs = diff_for(obs_bits)
    extreme = 0
    for k in range(s13.K_PERM):
        lo = 0 if k < 32 else 8
        bits = [
            (_md5_word(f"{ck}:perm", lo) >> (k % 32)) & 1 for ck, _ in data
        ]
        if _sq(abs(diff_for(bits)), MICRO) >= _sq(abs(obs), MICRO):
            extreme += 1
    got = s13.permutation_test_revenue(spark, SF).collect()[0]
    assert got.n_orders == n
    assert got.obs_diff_micro == _sq(obs, MICRO)
    assert got.n_extreme == extreme
    assert got.p_micro == (extreme + 1) * MICRO // (s13.K_PERM + 1)


# --------------------------------------------- Spiegelhalter Z test
def test_spiegelhalter_z_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.embedding_ops import (
        ECE_SC,
        _nearest_centroid_scores,
    )

    pv = _nearest_centroid_scores(spark, SF).collect()
    num = den = 0
    for r in pv:
        c = max(0, min(ECE_SC, int(r.conf_i)))
        num += (int(r.correct) * ECE_SC - c) * (ECE_SC - 2 * c)
        den += (ECE_SC - 2 * c) ** 2 * c * (ECE_SC - c)
    z = num / math.sqrt(den) if den > 0 else 0.0
    got = s13.spiegelhalter_z_calibration(spark, SF).collect()[0]
    assert got.n == len(pv)
    assert got.z_micro == _sq(z, MICRO)
    assert got.miscalibrated == (abs(z) > 1.96)


# ------------------------------------- confident learning matrix
def test_confident_learning_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.embedding_ops import (
        _centroid_cosines,
    )

    cc = _centroid_cosines(spark, SF).collect()
    tsum: dict[int, int] = defaultdict(int)
    tn: dict[int, int] = defaultdict(int)
    for r in cc:
        if r.label == r.clabel:
            tsum[r.clabel] += r.cos_i
            tn[r.clabel] += 1
    best: dict[int, tuple] = {}
    noisy: dict[int, int] = {}
    for r in cc:
        noisy[r.vec_id] = r.label
        if r.cos_i * tn[r.clabel] >= tsum[r.clabel]:
            key = (r.cos_i, -r.clabel)
            if r.vec_id not in best or key > best[r.vec_id]:
                best[r.vec_id] = key
    mat: dict[tuple, int] = defaultdict(int)
    for vid, (ci, nl) in best.items():
        mat[(noisy[vid], -nl)] += 1
    total = sum(mat.values())
    got = {
        (r.noisy_label, r.pred_label): (r.n_confident, r.joint_micro)
        for r in s13.confident_learning_noise_audit(spark, SF).collect()
    }
    assert set(got) == set(mat)
    for k, n in mat.items():
        assert got[k] == (n, n * MICRO // total)


# --------------------------------------------- tokenizer fertility
def _naive_bpe_tokens(word: str, rules) -> int:
    """Textbook greedy BPE application: per rule in learned order,
    merge leftmost non-overlapping adjacent (a, b) occurrences."""
    syms = list(word)
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
    return len(syms)


def test_tokenizer_fertility_matches_naive(spark):
    """r14: fertility now measures the repo's own LEARNED BPE
    tokenizer (VERDICT r13 item 4) over the tokens_col-normalized
    word stream; the old fixed-chunk stand-in survives as the
    explicitly labelled fertility_chunk_micro column. The naive twin
    re-applies the learned rules with the textbook per-word greedy
    merge loop — independent of the regex formulation."""
    import re

    from cgtcalc_data_transformer_spark.operators.corpus_lm import (
        _learn_bpe_rules,
    )

    rules = _learn_bpe_rules(spark, SF)
    docs = load_table(spark, SF, "documents").select("lang", "text").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs,words,chars,bpe,chunk
    for r in docs:
        norm = re.sub(r"[^a-zA-Z0-9 ]", " ", r.text).lower()
        words = [w for w in re.split(r"\s+", norm) if w]
        a = agg[r.lang]
        a[0] += 1
        a[1] += len(words)
        a[2] += sum(len(w) for w in words)
        a[3] += sum(_naive_bpe_tokens(w, rules) for w in words)
        a[4] += sum(
            (len(w) + s13.SUBWORD_LEN - 1) // s13.SUBWORD_LEN for w in words
        )
    got = {r.lang: r for r in s13.tokenizer_fertility_audit(spark, SF).collect()}
    assert set(got) == set(agg)
    for lang, (nd, nw, nc, nt, nchunk) in agg.items():
        r = got[lang]
        assert (r.n_docs, r.n_words, r.n_tokens) == (nd, nw, nt)
        assert r.fertility_micro == nt * MICRO // max(nw, 1)
        assert r.chars_per_token_micro == nc * MICRO // max(nt, 1)
        assert r.fertility_chunk_micro == nchunk * MICRO // max(nw, 1)
        # the learned tokenizer must actually compress vs characters
        assert nt < nc


# --------------------------------------------------- daily grid
def _grid(spark):
    ev = load_events(spark, SF).select("event_type", "ts").collect()
    days = [int(r.ts) // DAY_NS for r in ev]
    dmin, dmax = min(days), max(days)
    counts: dict[tuple, int] = defaultdict(int)
    types = set()
    for r, d in zip(ev, days):
        counts[(r.event_type, d - dmin)] += 1
        types.add(r.event_type)
    return {
        t: [counts.get((t, d), 0) for d in range(dmax - dmin + 1)]
        for t in sorted(types)
    }


def test_theil_u_matches_naive(spark):
    grid = _grid(spark)
    got = {r.event_type: r for r in s13.theil_u_forecast(spark, SF).collect()}
    for t, ys in grid.items():
        sm = sn = 0
        for i in range(3, len(ys)):
            em = 3 * ys[i] - (ys[i - 1] + ys[i - 2] + ys[i - 3])
            en = 3 * (ys[i] - ys[i - 1])
            sm += em * em
            sn += en * en
        r = got[t]
        assert (r.sse_model, r.sse_naive, r.n_eval) == (sm, sn, len(ys) - 3)
        if sn > 0:
            assert r.theil_u_micro == math.floor(
                math.sqrt(sm / sn) * MICRO + 0.5
            )
            assert r.model_beats_naive == (sm < sn)


def test_seasonal_mann_kendall_matches_naive(spark):
    grid = _grid(spark)
    got = {
        r.event_type: r for r in s13.seasonal_mann_kendall(spark, SF).collect()
    }
    for t, ys in grid.items():
        S = 0
        var18 = 0
        for s in range(7):
            vals = [y for d, y in enumerate(ys) if d % 7 == s]
            n = len(vals)
            for i in range(n):
                for j in range(i + 1, n):
                    S += (vals[j] > vals[i]) - (vals[j] < vals[i])
            var18 += n * (n - 1) * (2 * n + 5)
            tie: dict[int, int] = defaultdict(int)
            for v in vals:
                tie[v] += 1
            var18 -= sum(c * (c - 1) * (2 * c + 5) for c in tie.values())
        zc = S - 1 if S > 0 else (S + 1 if S < 0 else 0)
        z = zc / math.sqrt(var18 / 18.0) if var18 > 0 else 0.0
        r = got[t]
        assert (r.s_stat, r.var18) == (S, var18)
        assert r.z_micro == _sq(z, MICRO)
        assert r.trend_detected == (abs(z) > 1.96)


def test_engle_granger_matches_naive(spark):
    grid = _grid(spark)
    xs = grid["view"]
    got = {
        r.event_type: r
        for r in s13.engle_granger_cointegration(spark, SF).collect()
    }
    for t, ys in grid.items():
        if t == "view":
            continue
        n = len(ys)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        dd = n * sxx - sx * sx
        an = sy * sxx - sx * sxy
        bn = n * sxy - sx * sy
        v = [
            _sq((y * dd - an - bn * x) * float(n) / (float(dd) * float(sy)), MICRO)
            for x, y in zip(xs, ys)
        ]
        v1 = v[:-1]
        dv = [b - a for a, b in zip(v[:-1], v[1:])]
        svv = sum(a * a for a in v1)
        svd = sum(a * b for a, b in zip(v1, dv))
        rho = svd / svv
        se2 = sum(
            math.floor((b - rho * a) * (b - rho * a) + 0.5)
            for a, b in zip(v1, dv)
        )
        m = len(dv)
        tstat = (
            rho / math.sqrt((se2 / (m - 2.0)) / svv)
            if svv > 0 and se2 > 0
            else 0.0
        )
        r = got[t]
        assert r.n_diffs == m
        assert r.beta_nano == _sq(bn / dd, 10**9)
        assert r.rho_nano == _sq(rho, 10**9)
        assert r.adf_t_micro == _sq(tstat, MICRO)
        assert r.cointegrated_5pct == (tstat < s13.EG_CRIT_5PCT)


# -------------------------------------------- Fellegi-Sunter EM
def test_fellegi_sunter_matches_naive(spark):
    """Pairs replayed with pandas sorting, patterns counted naively,
    and the EM recomputed by the (already pure-Python) _fs_em — the
    Spark result's posterior/ratio must match the literal-param
    expressions applied to the naive counts."""
    import pandas as pd

    from cgtcalc_data_transformer_spark.operators.linkage import (
        DIRTY_PCT,
        DROP_POS,
        MAX_EDIT,
        SNM_WINDOW,
    )

    cust = (
        load_table(spark, SF, "customer")
        .select("c_custkey", "c_name")
        .collect()
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    recs = []
    for r in cust:
        ck, name = int(r.c_custkey), r.c_name
        recs.append((ck, name, 0))
        if _md5_word(str(ck), 0) % 100 < DIRTY_PCT:
            recs.append((ck, name[: DROP_POS - 1] + name[DROP_POS:], 1))
    df = pd.DataFrame(recs, columns=["rec_id", "name", "is_dirty"])
    df["sort_key"] = df["name"].map(lambda x: x[::-1])
    df["bucket"] = df["sort_key"].str[:2]
    df = df.sort_values(["bucket", "sort_key", "is_dirty", "rec_id"])
    df["rn"] = df.groupby("bucket").cumcount() + 1
    counts: dict[tuple, int] = defaultdict(int)
    for bucket, grp in df.groupby("bucket"):
        rows = grp.to_dict("records")
        for i, a in enumerate(rows):
            for b in rows[i + 1 : i + 1 + SNM_WINDOW]:
                if b["rn"] - a["rn"] > SNM_WINDOW or a["is_dirty"] == b["is_dirty"]:
                    continue
                g = (
                    int(lev(a["name"], b["name"]) <= MAX_EDIT),
                    int(a["name"][-3:] == b["name"][-3:]),
                    int(len(a["name"]) == len(b["name"])),
                )
                counts[g] += 1
    pat = sorted((g1, g2, g3, n) for (g1, g2, g3), n in counts.items())
    p_n, m_n, u_n = s13._fs_em(pat)
    p = p_n / 1e9
    m = [v / 1e9 for v in m_n]
    u = [v / 1e9 for v in u_n]
    got = {
        (r.g_lev, r.g_suffix, r.g_len): r
        for r in s13.fellegi_sunter_em(spark, SF).collect()
    }
    assert set(got) == set(counts)
    for (g1, g2, g3), n in counts.items():
        pm = ((m[0] if g1 else 1.0 - m[0]) * (m[1] if g2 else 1.0 - m[1])) * (
            m[2] if g3 else 1.0 - m[2]
        )
        pu = ((u[0] if g1 else 1.0 - u[0]) * (u[1] if g2 else 1.0 - u[1])) * (
            u[2] if g3 else 1.0 - u[2]
        )
        w = (p * pm) / ((p * pm) + ((1.0 - p) * pu))
        r = got[(g1, g2, g3)]
        assert r.n_pairs == n
        assert r.posterior_micro == math.floor(w * MICRO + 0.5)
        assert r.mu_ratio_milli == math.floor((pm / pu) * 1000.0 + 0.5)
        assert r.p_match_nano == p_n


# ---------------------------------------------- nprobe sweep shape
def test_nprobe_sweep_consistent_with_recall_audit(spark):
    """The sweep's np=IVF_NPROBE row must reproduce ivfpq_recall_audit
    exactly (same training, same probe rule at that depth), and every
    row covers all N_QUERIES·TOP_K exact pairs."""
    from cgtcalc_data_transformer_spark.operators.ivfpq import (
        ivfpq_nprobe_sweep,
        ivfpq_recall_audit,
    )
    from cgtcalc_data_transformer_spark.operators.similarity import (
        IVF_NPROBE,
        N_QUERIES,
        TOP_K,
    )

    sweep = {r.np: r for r in ivfpq_nprobe_sweep(spark, SF).collect()}
    assert sorted(sweep) == [1, 2, 4, 8]
    assert all(r.n_exact_pairs == N_QUERIES * TOP_K for r in sweep.values())
    assert all(0 <= r.n_hits <= r.n_exact_pairs for r in sweep.values())
    audit_hits = sum(
        r.n_hit for r in ivfpq_recall_audit(spark, SF).collect()
    )
    assert IVF_NPROBE in sweep
    assert sweep[IVF_NPROBE].n_hits == audit_hits
