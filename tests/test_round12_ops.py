"""Round-12 new-operator tests: independent naive-Python/numpy
reimplementations (textbook loops, no shared plan machinery) for the
IVF-PQ composite index and the two quantization recall audits.
"""

from __future__ import annotations

import math
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
    return {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]])
        for r in rows
    }


def _naive_cells(vecs):
    """ann_ivf's coarse rule re-derived: cosine vs the RAW random
    directions, ties to the larger cell id."""
    from cgtcalc_data_transformer_spark.operators.similarity import (
        IVF_NPROBE,
        _ivf_centroids,
    )

    cents = [np.array(c) for c in _ivf_centroids()]
    norms = [math.sqrt(float(c @ c)) for c in cents]
    cell, probes = {}, {}
    for vid, v in vecs.items():
        scored = sorted(
            ((float(v @ cents[i]) / norms[i], i) for i in range(len(cents))),
            reverse=True,
        )
        cell[vid] = scored[0][1]
        probes[vid] = [i for _, i in scored[:IVF_NPROBE]]
    return cell, probes


def _naive_residuals(vecs, cell):
    from cgtcalc_data_transformer_spark.operators.ivfpq import _norm_centroids

    nc = [np.array(c) for c in _norm_centroids()]
    return {vid: v - nc[cell[vid]] for vid, v in vecs.items()}


def _naive_train_encode(res):
    """Textbook residual-PQ Lloyd (the round-11 naive recipe, ivfpq
    init): round-6 distances, ties to lowest code, fsum means."""
    from cgtcalc_data_transformer_spark.operators.ivfpq import _ivfpq_init
    from cgtcalc_data_transformer_spark.operators.pq import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        PQ_SUB,
    )

    cb = [[list(cw) for cw in mrow] for mrow in _ivfpq_init()]
    subs = {
        (vid, m): v[m * PQ_SUB : (m + 1) * PQ_SUB]
        for vid, v in res.items()
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
            cb[m][code] = [
                round(math.fsum(sv[p] for sv in svs) / len(svs), 6)
                for p in range(PQ_SUB)
            ]
    return cb, assign(), subs


def _naive_ivfpq_topk(vecs):
    from cgtcalc_data_transformer_spark.operators.pq import (
        PQ_K,
        PQ_M,
        PQ_SCALE,
    )
    from cgtcalc_data_transformer_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )

    cell, probes = _naive_cells(vecs)
    res = _naive_residuals(vecs, cell)
    cb, codes, subs = _naive_train_encode(res)
    out = {}
    for q in range(N_QUERIES):
        # per probed cell: residual LUT for the query
        luts = {}
        for pc in probes[q]:
            from cgtcalc_data_transformer_spark.operators.ivfpq import (
                _norm_centroids,
            )

            rq = vecs[q] - np.array(_norm_centroids()[pc])
            from cgtcalc_data_transformer_spark.operators.pq import PQ_SUB

            for m in range(PQ_M):
                sv = rq[m * PQ_SUB : (m + 1) * PQ_SUB]
                for k in range(PQ_K):
                    c = np.array(cb[m][k])
                    nsq = sum(x * x for x in cb[m][k])
                    d2 = round(
                        float(sv @ sv) - 2.0 * float(sv @ c) + nsq, 6
                    )
                    luts[(pc, m, k)] = math.floor(d2 * PQ_SCALE + 0.5)
        scored = []
        for vid in vecs:
            if vid == q or cell[vid] not in probes[q]:
                continue
            adc = sum(
                luts[(cell[vid], m, codes[(vid, m)])] for m in range(PQ_M)
            )
            scored.append((adc, vid))
        scored.sort()
        out[q] = scored[:TOP_K]
    return out


def test_ivfpq_ann_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.ivfpq import ivfpq_ann

    vecs = _vectors(spark)
    naive = _naive_ivfpq_topk(vecs)
    got = defaultdict(list)
    for r in ivfpq_ann(spark, SF).collect():
        got[r["query_id"]].append((r["adc_d2_micro"], r["cand_id"]))
    assert dict(got) == {q: v for q, v in naive.items() if v}


def test_ivfpq_recall_audit_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.ivfpq import (
        ivfpq_recall_audit,
    )
    from cgtcalc_data_transformer_spark.operators.pq import PQ_SCALE
    from cgtcalc_data_transformer_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )

    vecs = _vectors(spark)
    approx = _naive_ivfpq_topk(vecs)
    rows = {r["query_id"]: r for r in ivfpq_recall_audit(spark, SF).collect()}
    for q in range(N_QUERIES):
        exact = sorted(
            (
                math.floor(
                    round(float((vecs[q] - v) @ (vecs[q] - v)), 6) * PQ_SCALE
                    + 0.5
                ),
                vid,
            )
            for vid, v in vecs.items()
            if vid != q
        )[:TOP_K]
        hits = {vid for _, vid in exact} & {vid for _, vid in approx[q]}
        r = rows[q]
        assert r["n_exact"] == len(exact)
        assert r["n_hit"] == len(hits)
        assert r["recall_micro"] == len(hits) * PQ_SCALE // TOP_K


def test_emb_quantize_recall_matches_naive(spark):
    from cgtcalc_data_transformer_spark.operators.ivfpq import (
        emb_quantize_recall,
    )
    from cgtcalc_data_transformer_spark.operators.pq import PQ_SCALE
    from cgtcalc_data_transformer_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )

    vecs = _vectors(spark)
    codes = {}
    for vid, v in vecs.items():
        scale = float(np.max(np.abs(v))) / 127.0
        codes[vid] = np.array([math.floor(x / scale + 0.5) for x in v])

    def topk(table, score):
        out = {}
        for q in range(N_QUERIES):
            scored = sorted(
                ((-score(q, vid), vid) for vid in table if vid != q)
            )[:TOP_K]
            out[q] = {vid for _, vid in scored}
        return out

    def cos_exact(q, c):
        a, b = vecs[q], vecs[c]
        return round(
            float(a @ b)
            / (math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))),
            6,
        )

    def cos_q(q, c):
        a, b = codes[q], codes[c]
        return round(
            float(a @ b)
            / (math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))),
            6,
        )

    exact, quant = topk(vecs, cos_exact), topk(vecs, cos_q)
    rows = {
        r["query_id"]: r for r in emb_quantize_recall(spark, SF).collect()
    }
    for q in range(N_QUERIES):
        hits = exact[q] & quant[q]
        assert rows[q]["n_exact"] == TOP_K
        assert rows[q]["n_hit"] == len(hits)
        assert rows[q]["recall_micro"] == len(hits) * PQ_SCALE // TOP_K


def test_ivfpq_partitioned_probe_prunes_and_matches(spark):
    """The cell-partitioned code layout must (a) answer identically
    to ivfpq_ann — the layout changes the scan, not the math — and
    (b) show directory-level pruning: PartitionFilters carry the
    probed-cell IN list and the scanned partition set is exactly the
    probed cells, not all NLIST."""
    import re

    from cgtcalc_data_transformer_spark.operators.ivfpq import (
        ivfpq_ann,
        ivfpq_partitioned_probe,
    )

    df = ivfpq_partitioned_probe(spark, SF)
    got = [tuple(r) for r in df.collect()]
    want = [tuple(r) for r in ivfpq_ann(spark, SF).collect()]
    assert got == want

    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:1500]
