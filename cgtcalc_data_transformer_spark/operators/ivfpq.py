"""IVF-PQ (IVFADC) composite index + quantization recall audits.

The production vector-search index shape at 100 TB (Jégou, Douze,
Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
2011, §IV: IVFADC): a coarse inverted-file quantizer prunes the
corpus to NPROBE of NLIST cells per query, and a product quantizer
over the RESIDUAL v − c(cell) compresses what remains to M 4-bit
codes scanned by asymmetric distance. Both halves already exist here
— IVF coarse probing (``similarity.ann_ivf``) and PQ/ADC
(``pq.pq_ann``) — this module composes them, plus the recall audits
that must ship next to ANY quantized index:

- ``ivfpq_ann``       — residual-PQ ADC scan over probed cells only
- ``ivfpq_recall_audit`` — recall@5 of ivfpq vs the exact Euclidean
  ranking (the fourth ranking next to exact / IVF / PQ)
- ``emb_quantize_recall`` — recall@5 of the int8 symmetric
  quantization (``embedding_ops.emb_quantize``) vs exact cosine —
  closes the audit gap between the two quantization paths (VERDICT
  r11 item 5)

Spark-first shape (inherited from the two halves, unchanged):
- coarse assignment and probing are pure per-row expressions against
  plan literals (no shuffle, ann_ivf's exact rule — same cells);
- the residual is one ``zip_with`` against the broadcast-free
  unit-normalized centroid literal (for the unit-norm corpus,
  cosine-nearest-raw-direction ≡ L2-nearest-unit-centroid, so the
  residual norm is bounded by √2 — subtracting the RAW random
  direction (norm ≈ 8) would swamp the signal);
- residual codebook training reuses ``pq.py``'s Lloyd chain verbatim
  (bounded M·K·SUB = 1024-row driver state);
- ADC scoring is an equality join on (cell, m, code) against the
  broadcast per-(query, probed-cell) M×K lookup table — the cell key
  is what makes it IVFADC: a candidate is scored ONLY if its cell is
  probed, so ~NPROBE/NLIST of the code table enters the join. At
  100 TB the codes (4 B/vec) are written partitioned by cell and the
  probe prunes at the scan.

Determinism: the pq.py recipe end-to-end — round-6 centroid/distance
quantization, ties to the lowest code id, per-subspace ADC terms
floor-quantized to 1e-6 integers before the M-term sum, seeded
scale-matched inits (residual component sd ≈ 0.15 for best-of-16
random cells on a unit-norm corpus). The int8 audit needs no scale
plumbing at all: symmetric per-vector scales cancel in the cosine,
so the quantized ranking is the exact-integer code-vector cosine.

Reference parity: none — /root/reference is a parse-merge-sort CLI
(index.js:48-130); this extends SURVEY.md §2.2's similarity-search
row with the VERDICT r11 item-3 and item-5 mandates.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.pq import (
    PQ_ITERS,
    PQ_K,
    PQ_M,
    PQ_SCALE,
    PQ_SUB,
    Codebook,
    _adc_term,
    _assign,
    _cb_values,
    _codebook_lit,
    _subvectors,
    _update,
)
from cgtcalc_data_transformer_spark.operators.similarity import (
    IVF_NPROBE,
    N_QUERIES,
    TOP_K,
    _as_double,
    _centroid_scores,
    _ivf_centroids,
    _sql_array,
    dot_expr,
    lit_double_array,
)
from cgtcalc_data_transformer_spark.sources.tpch import load_table

DIM = 64
IVFPQ_SEED = 31
IVFPQ_INIT_SD = 0.15  # residual component sd (≈ √(2−2·E[best cos])/8)


def _norm_centroids() -> list[list[float]]:
    """The IVF coarse centroids unit-normalized and rounded to 6 —
    the subtraction target for residuals. Cell ASSIGNMENT still uses
    ann_ivf's exact raw-direction cosine rule (same ranking: norms
    are per-cell constants), so ivfpq probes the same cells ann_ivf
    does."""
    out = []
    for c in _ivf_centroids():
        n = math.sqrt(sum(x * x for x in c))
        out.append([round(x / n, 6) for x in c])
    return out


def _ivfpq_init() -> Codebook:
    rng = np.random.default_rng(IVFPQ_SEED)
    return (
        rng.standard_normal((PQ_M, PQ_K, PQ_SUB)) * IVFPQ_INIT_SD
    ).round(6).tolist()


def _nc_lit():
    return F.array(
        *[lit_double_array(c) for c in _norm_centroids()]
    )


def _cells(emb: DataFrame) -> DataFrame:
    """(vec_id, v, cell): ann_ivf's exact assignment — nearest coarse
    cell by cosine vs the raw directions, ties to the larger id
    (array_sort-last)."""
    scores = _centroid_scores("v", _ivf_centroids())
    return emb.select(
        "vec_id",
        "v",
        F.element_at(F.array_sort(scores), -1)["i"].alias("cell"),
    )


def _residual(df: DataFrame, *keep: str) -> DataFrame:
    """Replace ``v`` with the residual v − ĉ(cell) (unit-normalized
    centroid literal); pure zip_with, no shuffle."""
    return df.select(
        *keep,
        F.zip_with(
            "v",
            F.element_at(_nc_lit(), F.col("cell") + 1),
            lambda x, c: x - c,
        ).alias("v"),
    )


def _train_residual_codebooks(res: DataFrame) -> Codebook:
    """pq.py's Lloyd chain over RESIDUAL subvectors — same bounded
    driver state (≤ M·K·SUB = 1024 rows per update)."""
    sub = _subvectors(res).cache()
    cb = _ivfpq_init()
    for _ in range(PQ_ITERS):
        cb = _update(_assign(sub, cb), cb)
    sub.unpersist()
    return cb


def ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC top-5 per query vector (vec_id < N_QUERIES): coarse-
    assign every vector to its IVF cell, PQ-encode the residual
    v − ĉ(cell) to M 4-bit codes, and score each query against ONLY
    its NPROBE probed cells via the per-(query, cell) residual ADC
    lookup table — an equality join on (cell, m, code) against a
    broadcast N_QUERIES·NPROBE·M·K-row LUT, then one groupBy sum.
    The raw vectors never enter the scoring join; the cell key prunes
    it to ~NPROBE/NLIST of the code table."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "v"
    )
    cells = _cells(emb)
    res = _residual(cells, "vec_id", "cell")
    cb = _train_residual_codebooks(res.select("vec_id", "v"))
    codes = (
        _assign(_subvectors(res.select("vec_id", "v")), cb)
        .select("vec_id", "m", "code")
        .join(cells.select("vec_id", "cell"), "vec_id")
    )
    # per-query probe list: ann_ivf's exact rule (top-NPROBE cells by
    # raw-direction cosine, descending, ties to the larger id)
    scores = _centroid_scores("v", _ivf_centroids())
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            "v",
            F.explode(
                F.transform(
                    F.slice(F.reverse(F.array_sort(scores)), 1, IVF_NPROBE),
                    lambda s: s["i"],
                )
            ).alias("cell"),
        )
    )
    qres = _residual(probes, "query_id", "cell")
    qsub = qres.select(
        "query_id",
        "cell",
        F.posexplode(
            F.array(
                *[F.slice("v", m * PQ_SUB + 1, PQ_SUB) for m in range(PQ_M)]
            )
        ).alias("m", "sv"),
    )
    kws = F.element_at(_codebook_lit(cb), F.col("m") + 1)
    luts = qsub.select(
        "query_id",
        "cell",
        "m",
        F.explode(
            F.transform(
                kws,
                lambda s: F.struct(
                    s["k"].alias("k"), _adc_term(F.col("sv"), s).alias("dq")
                ),
            )
        ).alias("e"),
    ).select("query_id", "cell", "m", F.col("e.k").alias("k"), F.col("e.dq").alias("dq"))
    scored = (
        codes.join(
            F.broadcast(luts),
            (codes["cell"] == luts["cell"])
            & (codes["m"] == luts["m"])
            & (codes["code"] == luts["k"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("dq").alias("adc_d2_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_d2_micro"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "adc_d2_micro", "rank")
        .orderBy("query_id", "rank")
    )


def ivfpq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVFADC ranking against the EXACT Euclidean
    top-5 — the fourth ranking in the audit family (exact / IVF / PQ
    / IVF-PQ), measuring what the coarse pruning + residual
    quantization jointly cost. Union + flag aggregation, NOT a join
    between the two result frames (the retrieval_recall_audit
    lesson: both share the embeddings scan lineage and a self-join
    would force Catalyst's attribute dedup to rewrite the whole
    subtree)."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "v"
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cands = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv")
    )
    ed2 = F.round(
        dot_expr(F.col("qv"), F.col("qv"))
        - 2.0 * dot_expr(F.col("qv"), F.col("cv"))
        + dot_expr(F.col("cv"), F.col("cv")),
        6,
    )
    we = Window.partitionBy("query_id").orderBy(
        F.asc("ed2_micro"), F.asc("cand_id")
    )
    exact = (
        F.broadcast(queries)
        .join(cands, F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.floor(ed2 * F.lit(float(PQ_SCALE)) + F.lit(0.5))
            .cast("long")
            .alias("ed2_micro"),
        )
        .withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "cand_id",
            F.lit(1).alias("in_exact"),
            F.lit(0).alias("in_approx"),
        )
    )
    approx = ivfpq_ann(spark, sf_dir).select(
        "query_id",
        "cand_id",
        F.lit(0).alias("in_exact"),
        F.lit(1).alias("in_approx"),
    )
    flags = (
        exact.unionByName(approx)
        .groupBy("query_id", "cand_id")
        .agg(
            F.max("in_exact").alias("in_exact"),
            F.max("in_approx").alias("in_approx"),
        )
    )
    return (
        flags.filter(F.col("in_exact") == 1)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum("in_approx").alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            (F.col("n_hit") * F.lit(PQ_SCALE) / F.lit(TOP_K))
            .cast("long")
            .alias("recall_micro"),
        )
        .orderBy("query_id")
    )


def emb_quantize_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the int8 symmetric-quantization cosine ranking
    (``emb_quantize``'s codes: scale = max|x|/127, q = ⌊x/scale+½⌋)
    against the exact cosine top-5 — the quality audit the int8 path
    was missing next to ``pq_recall_audit`` (VERDICT r11 item 5).

    The per-vector scales CANCEL in the cosine (cos(s_a·qa, s_b·qb)
    = cos(qa, qb)), so the quantized ranking is the cosine over
    integer code vectors: exact-integer dot and norms² (codes ≤ 127,
    dim 64 ⇒ |dot| ≤ 2²⁰, exact in long), one double division
    rounded to 6 — engine-exact with no scale plumbing. Union + flag
    shape as above; the candidate side carries the 64-byte code
    vector, not the raw floats."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "v"
    )
    scale = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))) / F.lit(
        127.0
    )
    # zero guard (ADVICE r12): an all-zero vector has scale 0; without
    # the guard x/scale yields NaN codes whose ordering semantics
    # diverge between Spark and DuckDB. Emit all-zero codes instead
    # (the SQL twin carries the same CASE) — a no-op on the real
    # corpus, which has no zero vectors.
    quantized = emb.select(
        "vec_id",
        F.transform(
            F.col("v"),
            lambda x: F.when(
                scale > 0, F.floor(x / scale + F.lit(0.5))
            ).otherwise(F.lit(0).cast("bigint")),
        ).alias("q"),
    )
    iq = quantized.select(
        "vec_id",
        "q",
        F.aggregate(
            F.col("q"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).alias("n2"),
    )
    queries = iq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("n2").alias("qn2"),
    )
    cands = iq.select(
        F.col("vec_id").alias("cand_id"),
        F.col("q").alias("cq"),
        F.col("n2").alias("cn2"),
    )
    idot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # zero-norm pairs score -2.0 (below any real cosine) so a
    # hypothetical all-zero vector ranks last deterministically in
    # both engines instead of via NaN ordering.
    cos_q = F.when(
        (F.col("qn2") > 0) & (F.col("cn2") > 0),
        F.round(
            idot.cast("double")
            / (
                F.sqrt(F.col("qn2").cast("double"))
                * F.sqrt(F.col("cn2").cast("double"))
            ),
            6,
        ),
    ).otherwise(F.lit(-2.0))
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("cos_q"), F.asc("cand_id")
    )
    quant_top = (
        F.broadcast(queries)
        .join(cands, F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cos_q.alias("cos_q"))
        .withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "cand_id",
            F.lit(0).alias("in_exact"),
            F.lit(1).alias("in_approx"),
        )
    )
    fqueries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    fcands = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv")
    )
    cos_e = F.round(
        dot_expr(F.col("qv"), F.col("cv"))
        / (
            F.sqrt(dot_expr(F.col("qv"), F.col("qv")))
            * F.sqrt(dot_expr(F.col("cv"), F.col("cv")))
        ),
        6,
    )
    we = Window.partitionBy("query_id").orderBy(
        F.desc("cos_e"), F.asc("cand_id")
    )
    exact = (
        F.broadcast(fqueries)
        .join(fcands, F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cos_e.alias("cos_e"))
        .withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "cand_id",
            F.lit(1).alias("in_exact"),
            F.lit(0).alias("in_approx"),
        )
    )
    flags = (
        exact.unionByName(quant_top)
        .groupBy("query_id", "cand_id")
        .agg(
            F.max("in_exact").alias("in_exact"),
            F.max("in_approx").alias("in_approx"),
        )
    )
    return (
        flags.filter(F.col("in_exact") == 1)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum("in_approx").alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            (F.col("n_hit") * F.lit(PQ_SCALE) / F.lit(TOP_K))
            .cast("long")
            .alias("recall_micro"),
        )
        .orderBy("query_id")
    )


IVFPQ_SWEEP = (1, 2, 4, 8)
IVFPQ_SWEEP_MAX = 8


def ivfpq_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the IVFADC ranking as a function of
    IVF_NPROBE ∈ {IVFPQ_SWEEP} — the recall-vs-probe CURVE the
    r12 verdict asked for (item 6): ``ivfpq_recall_audit``'s single
    probe-bounded number could not separate tuning from defect; the
    curve separates the coarse-pruning cost (the np-dependent part)
    from the residual-quantization ceiling (where it saturates). On
    the driver corpus at sf0.01 the curve is 5%→12.5% recall@5 with
    saturation from np=2: probing deeper buys nothing because the
    PQ error, not the pruning, is the binding constraint on an
    isotropic unit-norm corpus — tuning (np) vs defect
    (quantization resolution) made visible, which is the audit's
    point. Small-SF readings can even dip non-monotonically: with
    ~200 candidate vectors the ADC noise reorders a 5-deep list
    freely.

    One pipeline, not four: cells are probed once to depth
    {IVFPQ_SWEEP_MAX} with their probe rank rc carried through the
    LUT and the ADC join (a candidate's rc is its cell's rank in the
    query's probe order — unique, since each candidate lives in one
    cell), then the (np) dimension is a 4-literal explode filtered
    by rc ≤ np: the expensive train/encode/score work is shared
    across the whole curve. Same determinism recipe as ivfpq_ann."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "v"
    )
    cells = _cells(emb)
    res = _residual(cells, "vec_id", "cell")
    cb = _train_residual_codebooks(res.select("vec_id", "v"))
    codes = (
        _assign(_subvectors(res.select("vec_id", "v")), cb)
        .select("vec_id", "m", "code")
        .join(cells.select("vec_id", "cell"), "vec_id")
    )
    scores = _centroid_scores("v", _ivf_centroids())
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            "v",
            F.posexplode(
                F.transform(
                    F.slice(
                        F.reverse(F.array_sort(scores)), 1, IVFPQ_SWEEP_MAX
                    ),
                    lambda s: s["i"],
                )
            ).alias("rc0", "cell"),
        )
        .select(
            "query_id", "v", "cell", (F.col("rc0") + 1).alias("rc")
        )
    )
    qres = _residual(probes, "query_id", "cell", "rc")
    qsub = qres.select(
        "query_id",
        "cell",
        "rc",
        F.posexplode(
            F.array(
                *[F.slice("v", m * PQ_SUB + 1, PQ_SUB) for m in range(PQ_M)]
            )
        ).alias("m", "sv"),
    )
    kws = F.element_at(_codebook_lit(cb), F.col("m") + 1)
    luts = qsub.select(
        "query_id",
        "cell",
        "rc",
        "m",
        F.explode(
            F.transform(
                kws,
                lambda s: F.struct(
                    s["k"].alias("k"), _adc_term(F.col("sv"), s).alias("dq")
                ),
            )
        ).alias("e"),
    ).select(
        "query_id", "cell", "rc", "m",
        F.col("e.k").alias("k"), F.col("e.dq").alias("dq"),
    )
    scored = (
        codes.join(
            F.broadcast(luts),
            (codes["cell"] == luts["cell"])
            & (codes["m"] == luts["m"])
            & (codes["code"] == luts["k"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.min("rc").alias("rc"), F.sum("dq").alias("d2"))
    )
    nps = F.explode(F.array(*[F.lit(n) for n in IVFPQ_SWEEP])).alias("np")
    swept = scored.select("query_id", "cand_id", "rc", "d2", nps).filter(
        F.col("rc") <= F.col("np")
    )
    wq = Window.partitionBy("np", "query_id").orderBy(
        F.asc("d2"), F.asc("cand_id")
    )
    approx = (
        swept.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "np", "query_id", "cand_id",
            F.lit(0).alias("in_exact"), F.lit(1).alias("in_approx"),
        )
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cands = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv")
    )
    ed2 = F.round(
        dot_expr(F.col("qv"), F.col("qv"))
        - 2.0 * dot_expr(F.col("qv"), F.col("cv"))
        + dot_expr(F.col("cv"), F.col("cv")),
        6,
    )
    we = Window.partitionBy("query_id").orderBy(
        F.asc("ed2_micro"), F.asc("cand_id")
    )
    exact = (
        F.broadcast(queries)
        .join(cands, F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.floor(ed2 * F.lit(float(PQ_SCALE)) + F.lit(0.5))
            .cast("long")
            .alias("ed2_micro"),
        )
        .withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "cand_id", nps,
            F.lit(1).alias("in_exact"), F.lit(0).alias("in_approx"),
        )
    )
    flags = (
        exact.unionByName(approx.select(*exact.columns))
        .groupBy("np", "query_id", "cand_id")
        .agg(
            F.max("in_exact").alias("in_exact"),
            F.max("in_approx").alias("in_approx"),
        )
    )
    return (
        flags.filter(F.col("in_exact") == 1)
        .groupBy("np")
        .agg(
            F.count(F.lit(1)).alias("n_exact_pairs"),
            F.sum("in_approx").alias("n_hits"),
        )
        .select(
            F.col("np").cast("long").alias("np"),
            "n_exact_pairs",
            "n_hits",
            F.floor(
                F.col("n_hits") * F.lit(PQ_SCALE) / F.col("n_exact_pairs")
            )
            .cast("long")
            .alias("recall_micro"),
        )
        .orderBy("np")
    )


_CODES_LOCK_FH = None  # module-held: the flock lives as long as we do
_CODES_PATH: str | None = None  # memoized — must not change mid-process


def ivfpq_codes_path() -> str:
    """Scratch dir for the cell-partitioned code table, reused with
    overwrite semantics across runs (the per-PID variant accumulated
    one orphan codes_by_cell tree per session in tempdir, ADVICE r12).
    The fixed path is guarded against CONCURRENT writers (ADVICE r13:
    a bench run racing a pytest run would corrupt the overwrite): the
    first caller in a process takes a non-blocking flock on a
    uid-keyed lockfile and keeps it for the process lifetime; if
    another live process holds it, this process falls back to a
    private per-PID dir registered for atexit cleanup — no orphans,
    no shared-overwrite race. The decision is memoized so the path
    never flips between writes and reads within one process."""
    global _CODES_LOCK_FH, _CODES_PATH
    if _CODES_PATH is not None:
        return _CODES_PATH
    import os
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(), f"spark_ivfpq_scratch_uid{os.getuid()}"
    )
    os.makedirs(base, exist_ok=True)
    import fcntl

    fh = open(os.path.join(base, ".writer.lock"), "w")
    try:
        fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
        _CODES_LOCK_FH = fh  # hold for process lifetime
        _CODES_PATH = os.path.join(base, "codes_by_cell")
    except OSError:  # another live process owns the shared dir
        fh.close()
        import atexit
        import shutil

        private = os.path.join(base, f"pid{os.getpid()}")
        atexit.register(shutil.rmtree, private, ignore_errors=True)
        _CODES_PATH = os.path.join(private, "codes_by_cell")
    return _CODES_PATH


def ivfpq_partitioned_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB layout claim of ``ivfpq_ann`` MATERIALIZED: write
    the (vec_id, m, code) table partitioned BY CELL, then answer the
    probe from the stored layout — the probed-cell predicate becomes
    directory-level ``PartitionFilters`` (≤ NPROBE·N_QUERIES of
    NLIST directories opened; the unprobed corpus is never read, not
    even its parquet footers). Same ADC scoring join as ivfpq_ann,
    identical output — the oracle IS the ivfpq_ann oracle; the
    layout evidence is plan-asserted in tests/test_round12_ops.py.

    The probed-cell set is collected at plan-build time — bounded by
    min(NLIST, N_QUERIES·NPROBE) rows (the pca.py/pq.py bounded-
    driver-state discipline) — so the scan filter is a static IN
    list, prunable without runtime DPP machinery."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "v"
    )
    cells = _cells(emb)
    res = _residual(cells, "vec_id", "cell")
    cb = _train_residual_codebooks(res.select("vec_id", "v"))
    codes = (
        _assign(_subvectors(res.select("vec_id", "v")), cb)
        .select("vec_id", "m", "code")
        .join(cells.select("vec_id", "cell"), "vec_id")
    )
    path = ivfpq_codes_path()
    codes.write.mode("overwrite").partitionBy("cell").parquet(path)

    scores = _centroid_scores("v", _ivf_centroids())
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            "v",
            F.explode(
                F.transform(
                    F.slice(F.reverse(F.array_sort(scores)), 1, IVF_NPROBE),
                    lambda s: s["i"],
                )
            ).alias("cell"),
        )
    )
    probed_cells = sorted(
        r["cell"] for r in probes.select("cell").distinct().collect()
    )
    qres = _residual(probes, "query_id", "cell")
    qsub = qres.select(
        "query_id",
        "cell",
        F.posexplode(
            F.array(
                *[F.slice("v", m * PQ_SUB + 1, PQ_SUB) for m in range(PQ_M)]
            )
        ).alias("m", "sv"),
    )
    kws = F.element_at(_codebook_lit(cb), F.col("m") + 1)
    luts = qsub.select(
        "query_id",
        "cell",
        "m",
        F.explode(
            F.transform(
                kws,
                lambda s: F.struct(
                    s["k"].alias("k"), _adc_term(F.col("sv"), s).alias("dq")
                ),
            )
        ).alias("e"),
    ).select(
        "query_id", "cell", "m",
        F.col("e.k").alias("k"), F.col("e.dq").alias("dq"),
    )
    stored = spark.read.parquet(path).filter(
        F.col("cell").isin(probed_cells)
    )
    scored = (
        stored.join(
            F.broadcast(luts),
            (stored["cell"] == luts["cell"])
            & (stored["m"] == luts["m"])
            & (stored["code"] == luts["k"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("dq").alias("adc_d2_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_d2_micro"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "adc_d2_micro", "rank")
        .orderBy("query_id", "rank")
    )


# ------------------------------------------------------------- oracles
def _ivfpq_train_sql() -> str:
    """Shared IVFADC CTE chain for both ivfpq oracles: coarse assign
    (ann_ivf's exact rule), residuals vs the unit-normalized centroid
    literal, pq.py's Lloyd iterations over residual subvectors, final
    codes, per-(query, probed-cell) residual LUTs, ADC rollup. Ends
    with ``ranked`` = the IVFADC ranking."""
    raw_rows = ",\n    ".join(
        f"({i}, {_sql_array(c)}, {sum(x * x for x in c)!r})"
        for i, c in enumerate(_ivf_centroids())
    )
    nc_rows = ",\n    ".join(
        f"({i}, {_sql_array(c)})" for i, c in enumerate(_norm_centroids())
    )
    sql = f"""
rawcent(i, c, norm_sq) AS (
  VALUES
    {raw_rows}
), ncent(i, c) AS (
  VALUES
    {nc_rows}
), emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), cscores AS (
  SELECT vec_id, v, i,
         list_dot_product(v, c) / sqrt(norm_sq) AS cos
  FROM emb CROSS JOIN rawcent
), ranked_cells AS (
  SELECT vec_id, v, i,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, i DESC) AS rn
  FROM cscores
), cells AS (
  SELECT vec_id, v, i AS cell FROM ranked_cells WHERE rn = 1
), res AS MATERIALIZED (
  SELECT a.vec_id, a.cell,
         list_transform(range(1, {DIM} + 1), j -> a.v[j] - nc.c[j]) AS v
  FROM cells a JOIN ncent nc ON nc.i = a.cell
), sub AS MATERIALIZED (
  SELECT vec_id, t.m,
         list_slice(v, t.m * {PQ_SUB} + 1, t.m * {PQ_SUB} + {PQ_SUB}) AS sv
  FROM res CROSS JOIN (SELECT UNNEST(range({PQ_M})) AS m) t
), cb0(m, k, c, nsq) AS (
  VALUES
    {_cb_values(_ivfpq_init())}
)"""
    prev = "cb0"
    for it in range(1, PQ_ITERS + 1):
        sql += f"""
, scored{it} AS (
  SELECT s.vec_id, s.m, s.sv, cb.k,
         ROUND(list_dot_product(s.sv, s.sv)
               - 2 * list_dot_product(s.sv, cb.c) + cb.nsq, 6) AS d2
  FROM sub s JOIN {prev} cb ON s.m = cb.m
), assigned{it} AS (
  SELECT vec_id, m, sv, k AS code FROM (
    SELECT vec_id, m, sv, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m
                              ORDER BY d2 ASC, k ASC) AS rn
    FROM scored{it})
  WHERE rn = 1
), means{it} AS (
  SELECT m, code, i AS pos,
         ROUND(CAST(SUM(CAST(list_extract(sv, i + 1) AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*), 6) AS v
  FROM assigned{it} CROSS JOIN range({PQ_SUB}) t(i)
  GROUP BY m, code, i
), cb{it} AS (
  SELECT p.m, p.k,
         COALESCE(u.c, p.c) AS c,
         COALESCE(u.nsq, p.nsq) AS nsq
  FROM {prev} p LEFT JOIN (
    SELECT m, code, list(v ORDER BY pos) AS c,
           list_dot_product(list(v ORDER BY pos), list(v ORDER BY pos)) AS nsq
    FROM means{it} GROUP BY m, code) u
  ON p.m = u.m AND p.k = u.code
)"""
        prev = f"cb{it}"
    sql += f"""
, fscored AS (
  SELECT s.vec_id, s.m, cb.k,
         ROUND(list_dot_product(s.sv, s.sv)
               - 2 * list_dot_product(s.sv, cb.c) + cb.nsq, 6) AS d2
  FROM sub s JOIN {prev} cb ON s.m = cb.m
), codes AS (
  SELECT f.vec_id, cl.cell, f.m, f.k AS code FROM (
    SELECT vec_id, m, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m
                              ORDER BY d2 ASC, k ASC) AS rn
    FROM fscored) f
  JOIN cells cl ON cl.vec_id = f.vec_id
  WHERE f.rn = 1
), qres AS (
  SELECT p.vec_id AS query_id, p.i AS cell,
         list_transform(range(1, {DIM} + 1), j -> p.v[j] - nc.c[j]) AS v
  FROM ranked_cells p JOIN ncent nc ON nc.i = p.i
  WHERE p.vec_id < {N_QUERIES} AND p.rn <= {IVF_NPROBE}
), qsub AS (
  SELECT query_id, cell, t.m,
         list_slice(v, t.m * {PQ_SUB} + 1, t.m * {PQ_SUB} + {PQ_SUB}) AS sv
  FROM qres CROSS JOIN (SELECT UNNEST(range({PQ_M})) AS m) t
), luts AS (
  SELECT s.query_id, s.cell, s.m, cb.k,
         CAST(FLOOR(ROUND(list_dot_product(s.sv, s.sv)
                          - 2 * list_dot_product(s.sv, cb.c) + cb.nsq, 6)
                    * {PQ_SCALE} + 0.5) AS BIGINT) AS dq
  FROM qsub s JOIN {prev} cb ON s.m = cb.m
), adc AS (
  SELECT l.query_id, c.vec_id AS cand_id,
         CAST(SUM(l.dq) AS BIGINT) AS adc_d2_micro
  FROM codes c
  JOIN luts l ON c.cell = l.cell AND c.m = l.m AND c.code = l.k
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
), ranked AS (
  SELECT query_id, cand_id, adc_d2_micro,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_d2_micro ASC, cand_id ASC) AS INT) AS rank
  FROM adc
)"""
    return sql


IVFPQ_ANN_SQL = f"""
WITH {_ivfpq_train_sql()}
SELECT query_id, cand_id, adc_d2_micro, rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


IVFPQ_RECALL_SQL = f"""
WITH {_ivfpq_train_sql()}, exact AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(FLOOR(ROUND(list_dot_product(q.v, q.v)
                                       - 2 * list_dot_product(q.v, c.v)
                                       + list_dot_product(c.v, c.v), 6)
                                 * {PQ_SCALE} + 0.5) AS BIGINT) ASC,
                      c.vec_id ASC) AS rank
    FROM emb q JOIN emb c
      ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id)
  WHERE rank <= {TOP_K}
)
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN p.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       CAST(SUM(CASE WHEN p.cand_id IS NOT NULL THEN 1 ELSE 0 END)
            * {PQ_SCALE} // {TOP_K} AS BIGINT) AS recall_micro
FROM exact e
LEFT JOIN (SELECT query_id, cand_id FROM ranked WHERE rank <= {TOP_K}) p
  ON e.query_id = p.query_id AND e.cand_id = p.cand_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


# Everything through the final `codes` CTE is shared verbatim with
# the ivfpq_ann/ivfpq_recall oracles; the sweep re-derives the probe
# LUTs at depth IVFPQ_SWEEP_MAX carrying the probe rank rc, then the
# np dimension is a 4-value join filtered by rc <= np.
_SWEEP_PREFIX = _ivfpq_train_sql().split("), qres AS (")[0] + ")"

IVFPQ_NPROBE_SWEEP_SQL = f"""
WITH {_SWEEP_PREFIX}, qres8 AS (
  SELECT p.vec_id AS query_id, p.i AS cell, CAST(p.rn AS BIGINT) AS rc,
         list_transform(range(1, {DIM} + 1), j -> p.v[j] - nc.c[j]) AS v
  FROM ranked_cells p JOIN ncent nc ON nc.i = p.i
  WHERE p.vec_id < {N_QUERIES} AND p.rn <= {IVFPQ_SWEEP_MAX}
), qsub8 AS (
  SELECT query_id, cell, rc, t.m,
         list_slice(v, t.m * {PQ_SUB} + 1, t.m * {PQ_SUB} + {PQ_SUB}) AS sv
  FROM qres8 CROSS JOIN (SELECT UNNEST(range({PQ_M})) AS m) t
), luts8 AS (
  SELECT s.query_id, s.cell, s.rc, s.m, cb.k,
         CAST(FLOOR(ROUND(list_dot_product(s.sv, s.sv)
                          - 2 * list_dot_product(s.sv, cb.c) + cb.nsq, 6)
                    * {PQ_SCALE} + 0.5) AS BIGINT) AS dq
  FROM qsub8 s JOIN cb{PQ_ITERS} cb ON s.m = cb.m
), adc8 AS (
  SELECT l.query_id, c.vec_id AS cand_id,
         CAST(MIN(l.rc) AS BIGINT) AS rc,
         CAST(SUM(l.dq) AS BIGINT) AS d2
  FROM codes c
  JOIN luts8 l ON c.cell = l.cell AND c.m = l.m AND c.code = l.k
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
), swept AS (
  SELECT s.np, a.query_id, a.cand_id,
         ROW_NUMBER() OVER (PARTITION BY s.np, a.query_id
                            ORDER BY a.d2 ASC, a.cand_id ASC) AS rank
  FROM adc8 a JOIN (VALUES (1), (2), (4), (8)) s(np) ON a.rc <= s.np
), approx AS (
  SELECT np, query_id, cand_id FROM swept WHERE rank <= {TOP_K}
), exact AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(FLOOR(ROUND(list_dot_product(q.v, q.v)
                                       - 2 * list_dot_product(q.v, c.v)
                                       + list_dot_product(c.v, c.v), 6)
                                 * {PQ_SCALE} + 0.5) AS BIGINT) ASC,
                      c.vec_id ASC) AS rank
    FROM emb q JOIN emb c
      ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id)
  WHERE rank <= {TOP_K}
), expanded AS (
  SELECT s.np, e.query_id, e.cand_id
  FROM exact e CROSS JOIN (VALUES (1), (2), (4), (8)) s(np)
)
SELECT CAST(x.np AS BIGINT) AS np,
       CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       CAST(SUM(CASE WHEN p.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST(SUM(CASE WHEN p.cand_id IS NOT NULL THEN 1 ELSE 0 END)
            * {PQ_SCALE} // COUNT(*) AS BIGINT) AS recall_micro
FROM expanded x
LEFT JOIN approx p
  ON x.np = p.np AND x.query_id = p.query_id AND x.cand_id = p.cand_id
GROUP BY x.np
ORDER BY np
"""


EMB_QUANTIZE_RECALL_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), quantized AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(v, y -> abs(y))) > 0
              THEN list_transform(v, x -> floor(
                x / (list_max(list_transform(v, y -> abs(y))) / 127.0) + 0.5))
              ELSE list_transform(v, x -> 0.0) END AS q
  FROM emb
), iq AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
  FROM quantized
), quant_top AS (
  SELECT query_id, cand_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id
             ORDER BY CASE WHEN a.n2 > 0 AND b.n2 > 0
                           THEN ROUND(CAST(list_dot_product(a.q, b.q) AS DOUBLE)
                                      / (sqrt(CAST(a.n2 AS DOUBLE))
                                         * sqrt(CAST(b.n2 AS DOUBLE))), 6)
                           ELSE -2.0 END DESC,
                      b.vec_id ASC) AS rank
    FROM iq a JOIN iq b
      ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id)
  WHERE rank <= {TOP_K}
), exact AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY ROUND(list_dot_product(q.v, c.v)
                            / (sqrt(list_dot_product(q.v, q.v))
                               * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
                      c.vec_id ASC) AS rank
    FROM emb q JOIN emb c
      ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id)
  WHERE rank <= {TOP_K}
)
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN p.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       CAST(SUM(CASE WHEN p.cand_id IS NOT NULL THEN 1 ELSE 0 END)
            * {PQ_SCALE} // {TOP_K} AS BIGINT) AS recall_micro
FROM exact e
LEFT JOIN quant_top p
  ON e.query_id = p.query_id AND e.cand_id = p.cand_id
GROUP BY e.query_id
ORDER BY e.query_id
"""
