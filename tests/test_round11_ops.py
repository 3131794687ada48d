"""Round-11 new-operator tests: independent naive-Python/numpy
reimplementations (textbook loop formulations, no shared plan
machinery) for product-quantization ANN, per-group weighted
sampling, and the sim-join monitoring summary.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import numpy as np

from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    rows = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    return {r["vec_id"]: np.array([float(x) for x in r["embedding"]]) for r in rows}


def _naive_train_encode(vecs):
    """Textbook PQ: per-subspace Lloyd with the repo's quantization
    discipline (round-6 distances, ties to lowest code, decimal-free
    float means rounded to 6 — within 1e-9 of the decimal-exact path
    on this data, and assignments compare quantized values)."""
    from cgtcalc_data_transformer_spark.operators.pq import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        PQ_SUB,
        _pq_init,
    )

    cb = [[list(cw) for cw in mrow] for mrow in _pq_init()]
    subs = {
        (vid, m): v[m * PQ_SUB : (m + 1) * PQ_SUB]
        for vid, v in vecs.items()
        for m in range(PQ_M)
    }

    def assign():
        out = {}
        for (vid, m), sv in subs.items():
            best = None
            for k in range(PQ_K):
                c = np.array(cb[m][k])
                nsq = sum(x * x for x in cb[m][k])
                d2 = round(float(sv @ sv) - 2.0 * float(sv @ c) + nsq, 6)
                if best is None or (d2, k) < best[:2]:
                    best = (d2, k)
            out[(vid, m)] = best[1]
        return out

    for _ in range(PQ_ITERS):
        a = assign()
        members = defaultdict(list)
        for (vid, m), code in a.items():
            members[(m, code)].append(subs[(vid, m)])
        for (m, code), svs in members.items():
            # fsum ≈ the decimal(38,12)-exact engine sums (exact for
            # these magnitudes), THEN the same /n + round(·,6)
            cb[m][code] = [
                round(math.fsum(sv[p] for sv in svs) / len(svs), 6)
                for p in range(PQ_SUB)
            ]
    return cb, assign()


def _naive_pq_topk(vecs):
    """query → ordered [(adc, cand_id)] top-K via the naive codebook."""
    from cgtcalc_data_transformer_spark.operators.pq import (
        PQ_M,
        PQ_SCALE,
        PQ_SUB,
    )
    from cgtcalc_data_transformer_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )

    cb, codes = _naive_train_encode(vecs)
    want = {}
    for q in range(N_QUERIES):
        luts = []
        for m in range(PQ_M):
            sv = vecs[q][m * PQ_SUB : (m + 1) * PQ_SUB]
            row = []
            for cw in cb[m]:
                c = np.array(cw)
                nsq = sum(x * x for x in cw)
                d2 = round(float(sv @ sv) - 2.0 * float(sv @ c) + nsq, 6)
                row.append(math.floor(d2 * PQ_SCALE + 0.5))
            luts.append(row)
        scored = sorted(
            (
                sum(luts[m][codes[(vid, m)]] for m in range(PQ_M)),
                vid,
            )
            for vid in vecs
            if vid != q
        )
        want[q] = scored[:TOP_K]
    return want


def test_pq_ann_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.pq import pq_ann
    from cgtcalc_data_transformer_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )

    want = _naive_pq_topk(_vectors(spark))
    rows = pq_ann(spark, SF).collect()
    assert len(rows) == N_QUERIES * TOP_K
    for r in rows:
        adc, vid = want[r["query_id"]][r["rank"] - 1]
        assert (r["cand_id"], r["adc_d2_micro"]) == (vid, adc), r


def test_pq_recall_audit_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.pq import (
        PQ_SCALE,
        pq_recall_audit,
    )
    from cgtcalc_data_transformer_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )

    vecs = _vectors(spark)
    pq_top = _naive_pq_topk(vecs)
    rows = pq_recall_audit(spark, SF).collect()
    assert [r["query_id"] for r in rows] == list(range(N_QUERIES))
    for r in rows:
        q = vecs[r["query_id"]]
        exact = sorted(
            (
                math.floor(
                    round(
                        float(q @ q) - 2.0 * float(q @ v) + float(v @ v), 6
                    )
                    * PQ_SCALE
                    + 0.5
                ),
                vid,
            )
            for vid, v in vecs.items()
            if vid != r["query_id"]
        )[:TOP_K]
        exact_ids = {vid for _, vid in exact}
        pq_ids = {vid for _, vid in pq_top[r["query_id"]]}
        assert r["n_exact"] == TOP_K
        assert r["n_hit"] == len(exact_ids & pq_ids)
        assert r["recall_micro"] == r["n_hit"] * PQ_SCALE // TOP_K


def test_weighted_sample_per_group_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.sampling import (
        _WOR_U_BUCKETS,
        GROUP_WOR_K,
        weighted_sample_per_group,
    )

    docs = load_table(spark, SF, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect()
    per = defaultdict(list)
    for r in docs:
        w = max(1, r["n_chars"])
        bucket = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        u = (bucket + 0.5) / _WOR_U_BUCKETS
        key = math.floor(math.log(u) / w * 1e8 + 0.5)
        per[r["source"]].append((-key, r["doc_id"], w))
    want = {}
    for src, lst in per.items():
        lst.sort()
        want[src] = [
            (doc, w, -negk, i + 1)
            for i, (negk, doc, w) in enumerate(lst[:GROUP_WOR_K])
        ]
    rows = weighted_sample_per_group(spark, SF).collect()
    got = defaultdict(list)
    for r in rows:
        got[r["source"]].append(
            (r["doc_id"], r["weight"], r["key_int"], r["rn"])
        )
    assert got == want
    for src, lst in got.items():
        assert len(lst) <= GROUP_WOR_K


def _naive_pairs():
    """Quadratic exact 3-gram Jaccard over sf0.001 documents."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    sh = {}
    for doc_id, text in rows:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        s = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        if s:
            sh[doc_id] = s
    ids = sorted(sh)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a]) + len(sh[b]) - inter
            if union and inter >= 0.5 * union:
                out.append((a, b, inter, union))
    return out


def test_simjoin_summary_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.dedup import (
        SIMJOIN_SUMMARY_K,
        simjoin_prefix_summary,
    )

    pairs = _naive_pairs()
    bands = defaultdict(int)
    scored = []
    for a, b, inter, union in pairs:
        bands[10 * inter // union] += 1
        scored.append((-(10**6 * inter // union), a, b, 10 * inter // union))
    scored.sort()
    examples = [
        ("example", band, -1, a, b, -negj)
        for negj, a, b, band in scored[:SIMJOIN_SUMMARY_K]
    ]
    want = sorted(
        [("band", band, n, -1, -1, -1) for band, n in bands.items()]
        + examples
    )
    rows = simjoin_prefix_summary(spark, SF).collect()
    got = [
        (
            r["kind"],
            r["band"],
            r["n_pairs"],
            r["doc_a"],
            r["doc_b"],
            r["jaccard_micro"],
        )
        for r in rows
    ]
    assert got == want
