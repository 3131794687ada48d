"""Product-quantization ANN over the ``embeddings`` table.

The compression path production vector search actually runs at
100 TB (Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011): split each 64-dim vector into M = 8
contiguous 8-dim subvectors, learn a K = 16-codeword codebook per
subspace with Lloyd k-means, and store each vector as M 4-bit codes
(4 bytes instead of 256) — queries then rank candidates by
ASYMMETRIC distance (exact query subvector vs candidate codeword)
through an M×K lookup table, never touching the raw corpus vectors.

Spark-first shape:
- codebook TRAINING reuses clustering.py's kmeans discipline — ONE
  chain where the unit of assignment is the (vector, subspace) pair:
  subvectors are a posexplode projection, assignment is a pure
  per-row expression against the (M·K)-row codeword literal,
  the update is one groupBy (m, code, pos) decimal-exact mean, and
  the only driver state is the M×K×8 codebook (bounded, tiny).
- ENCODING is a per-row expression (no shuffle); at 100 TB you'd
  write the M code columns next to the data and drop the raw
  vectors from the hot path (8 bytes/vec vs 256).
- ADC SCORING is an equality join of the (vec, m, code) table
  against the broadcast (query, m, k, dist) lookup table plus one
  groupBy sum — table lookups, not O(dim) arithmetic, per candidate.
  No cross product, no per-row Python.

Determinism (the oracle-checkable-iterative-float recipe from
clustering.py): decimal(38,12) subspace-mean sums, round(·,6)
centroid and distance quantization, ties to the lowest code id,
seeded scale-matched init literals (component sd 0.125 — the
corpus is unit-norm, so subvectors have norm ~0.354; standard-normal
inits would sit 8× outside the data and collapse cells, the
semdedup_embedding lesson). Per-subspace ADC terms are quantized to
1e-6 integers BEFORE the M-term sum, so the final distance is an
exact integer in both engines.

Reference parity: none — /root/reference is a parse-merge-sort CLI
(index.js:48-130); this extends SURVEY.md §2.2's similarity-search
row with the VERDICT r10 item-3 mandate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    _as_double,
    dot_expr,
    lit_double_array,
)
from cgtcalc_data_transformer_spark.sources.tpch import load_table

DIM = 64
PQ_M = 8          # subspaces
PQ_SUB = DIM // PQ_M
PQ_K = 16         # codewords per subspace (4-bit codes)
PQ_ITERS = 2      # Lloyd iterations per subspace
PQ_SEED = 29
PQ_SCALE = 10**6  # per-subspace ADC term quantization

Codebook = list[list[list[float]]]  # [m][k][PQ_SUB]


def _pq_init(m: int = PQ_M) -> Codebook:
    """m × K × (DIM//m) seeded init codewords, scale-matched to the
    corpus (unit-norm 64-dim ⇒ component sd 1/8). The same 1024-value
    seeded draw reshaped per m, so the m=PQ_M sweep point reproduces
    pq_ann's codebook bit-exactly."""
    rng = np.random.default_rng(PQ_SEED)
    return (
        (rng.standard_normal((m, PQ_K, DIM // m)) * 0.125).round(6).tolist()
    )


def _subvectors(emb: DataFrame, n_sub: int = PQ_M) -> DataFrame:
    """(vec_id, m, sv): the n_sub contiguous (DIM//n_sub)-dim slices
    per vector — a pure projection + posexplode, no shuffle."""
    width = DIM // n_sub
    return emb.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("v", m * width + 1, width)
                    for m in range(n_sub)
                ]
            )
        ).alias("m", "sv"),
    )


def _codebook_lit(cb: Codebook) -> Column:
    """array[m] of array[k] of struct(c, nsq, k) plan literals."""
    return F.array(
        *[
            F.array(
                *[
                    F.struct(
                        lit_double_array(cw).alias("c"),
                        F.lit(sum(x * x for x in cw)).alias("nsq"),
                        F.lit(k).alias("k"),
                    )
                    for k, cw in enumerate(cb[m])
                ]
            )
            for m in range(len(cb))
        ]
    )


def _assign(sub: DataFrame, cb: Codebook) -> DataFrame:
    """(vec_id, m, sv, code): nearest codeword in the row's OWN
    subspace by round(d²,6), ties to the lowest code id. d² =
    |sv|² − 2·sv·c + |c|² with |c|² a literal (kmeans recipe)."""
    kws = F.element_at(_codebook_lit(cb), F.col("m") + 1)
    svsv = dot_expr(F.col("sv"), F.col("sv"))
    scored = F.transform(
        kws,
        lambda s: F.struct(
            F.round(svsv - 2.0 * dot_expr(F.col("sv"), s["c"]) + s["nsq"], 6).alias(
                "d2"
            ),
            s["k"].alias("k"),
        ),
    )
    return sub.select(
        "vec_id", "m", "sv", F.array_min(scored)["k"].alias("code")
    )


def _update(assigned: DataFrame, prev: Codebook) -> Codebook:
    """One Lloyd update across ALL subspaces at once: per
    (m, code, pos) decimal-exact mean rounded to 6; empty cells keep
    their previous codeword. Driver state: ≤ M·K·SUB = 1024 rows."""
    rows = (
        assigned.select("m", "code", F.posexplode("sv").alias("pos", "x"))
        .groupBy("m", "code", "pos")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("v")
        )
        .collect()
    )
    cb = [[list(cw) for cw in mrow] for mrow in prev]
    for r in rows:
        cb[r["m"]][r["code"]][r["pos"]] = r["v"]
    return cb


def train_codebooks(spark: SparkSession, sf_dir: str) -> Codebook:
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "v"
    )
    sub = _subvectors(emb).cache()
    cb = _pq_init()
    for _ in range(PQ_ITERS):
        cb = _update(_assign(sub, cb), cb)
    sub.unpersist()
    return cb


def _adc_term(sv: Column, s: Column) -> Column:
    """Quantized asymmetric-distance term: exact 1e-6 integer."""
    d2 = F.round(
        dot_expr(sv, sv) - 2.0 * dot_expr(sv, s["c"]) + s["nsq"], 6
    )
    return F.floor(d2 * F.lit(float(PQ_SCALE)) + F.lit(0.5)).cast("long")


def pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-5 per query vector (vec_id < N_QUERIES): encode the
    corpus to M 4-bit codes, expand each query into its M×K distance
    lookup table, and rank candidates by the exact-integer sum of M
    table lookups — an equality join on (m, code) against a
    1024-row broadcast, then one groupBy sum. The corpus side
    carries only (vec_id, m, code); the raw vectors never enter the
    scoring join."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "v"
    )
    cb = train_codebooks(spark, sf_dir)
    codes = _assign(_subvectors(emb), cb).select("vec_id", "m", "code")
    kws = F.element_at(_codebook_lit(cb), F.col("m") + 1)
    luts = (
        _subvectors(emb.filter(F.col("vec_id") < N_QUERIES))
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            F.explode(
                F.transform(
                    kws,
                    lambda s: F.struct(
                        s["k"].alias("k"),
                        _adc_term(F.col("sv"), s).alias("dq"),
                    ),
                )
            ).alias("e"),
        )
        .select("query_id", "m", "e.k", "e.dq")
    )
    scored = (
        codes.join(
            F.broadcast(luts),
            (codes["m"] == luts["m"]) & (codes["code"] == luts["k"]),
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


def pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the PQ/ADC ranking against the EXACT Euclidean
    top-5 (the metric ADC approximates) — the quality gate that must
    ship next to any quantized index. Union + flag aggregation, NOT
    a join between the two result frames: both share the embeddings
    scan lineage and a self-join would force Catalyst's attribute
    dedup to rewrite the whole PQ subtree (the retrieval_recall_audit
    lesson, similarity.py:361)."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "v"
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cands = emb.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
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
            F.lit(0).alias("in_pq"),
        )
    )
    pq = pq_ann(spark, sf_dir).select(
        "query_id",
        "cand_id",
        F.lit(0).alias("in_exact"),
        F.lit(1).alias("in_pq"),
    )
    flags = (
        exact.unionByName(pq)
        .groupBy("query_id", "cand_id")
        .agg(F.max("in_exact").alias("in_exact"), F.max("in_pq").alias("in_pq"))
    )
    return (
        flags.filter(F.col("in_exact") == 1)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum("in_pq").alias("n_hit"),
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


# ------------------------------------------------------------- oracles
def _cb_values(cb: Codebook) -> str:
    return ",\n    ".join(
        "({}, {}, [{}]::DOUBLE[], {!r})".format(
            m, k, ", ".join(repr(x) for x in cw), sum(x * x for x in cw)
        )
        for m in range(len(cb))
        for k, cw in enumerate(cb[m])
    )


def _train_sql(n_sub: int = PQ_M, sfx: str = "", include_emb: bool = True) -> str:
    """The shared training + encoding CTE chain (`codes{sfx}` is the
    final (vec_id, m, code) table, `cb{PQ_ITERS}{sfx}` the final
    codebook) — ONE text used by all PQ oracles so they cannot
    drift. ``n_sub``/``sfx`` parameterize the subquantizer count for
    the r14 pq_m_sweep (suffix renames every CTE so several chains
    coexist in one WITH; the first chain owns the shared `emb`)."""
    width = DIM // n_sub
    emb_cte = """
emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), """ if include_emb else "\n"
    sql = f"""{emb_cte}sub{sfx} AS MATERIALIZED (
  SELECT vec_id, t.m,
         list_slice(v, t.m * {width} + 1, t.m * {width} + {width}) AS sv
  FROM emb CROSS JOIN (SELECT UNNEST(range({n_sub})) AS m) t
), cb0{sfx}(m, k, c, nsq) AS (
  VALUES
    {_cb_values(_pq_init(n_sub))}
)"""
    prev = f"cb0{sfx}"
    for it in range(1, PQ_ITERS + 1):
        sql += f"""
, scored{it}{sfx} AS (
  SELECT s.vec_id, s.m, s.sv, cb.k,
         ROUND(list_dot_product(s.sv, s.sv)
               - 2 * list_dot_product(s.sv, cb.c) + cb.nsq, 6) AS d2
  FROM sub{sfx} s JOIN {prev} cb ON s.m = cb.m
), assigned{it}{sfx} AS (
  SELECT vec_id, m, sv, k AS code FROM (
    SELECT vec_id, m, sv, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m
                              ORDER BY d2 ASC, k ASC) AS rn
    FROM scored{it}{sfx})
  WHERE rn = 1
), means{it}{sfx} AS (
  SELECT m, code, i AS pos,
         ROUND(CAST(SUM(CAST(list_extract(sv, i + 1) AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*), 6) AS v
  FROM assigned{it}{sfx} CROSS JOIN range({width}) t(i)
  GROUP BY m, code, i
), cb{it}{sfx} AS (
  SELECT p.m, p.k,
         COALESCE(u.c, p.c) AS c,
         COALESCE(u.nsq, p.nsq) AS nsq
  FROM {prev} p LEFT JOIN (
    SELECT m, code, list(v ORDER BY pos) AS c,
           list_dot_product(list(v ORDER BY pos), list(v ORDER BY pos)) AS nsq
    FROM means{it}{sfx} GROUP BY m, code) u
  ON p.m = u.m AND p.k = u.code
)"""
        prev = f"cb{it}{sfx}"
    sql += f"""
, fscored{sfx} AS (
  SELECT s.vec_id, s.m, cb.k,
         ROUND(list_dot_product(s.sv, s.sv)
               - 2 * list_dot_product(s.sv, cb.c) + cb.nsq, 6) AS d2
  FROM sub{sfx} s JOIN {prev} cb ON s.m = cb.m
), codes{sfx} AS (
  SELECT vec_id, m, k AS code FROM (
    SELECT vec_id, m, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m
                              ORDER BY d2 ASC, k ASC) AS rn
    FROM fscored{sfx})
  WHERE rn = 1
), luts{sfx} AS (
  SELECT s.vec_id AS query_id, s.m, cb.k,
         CAST(FLOOR(ROUND(list_dot_product(s.sv, s.sv)
                          - 2 * list_dot_product(s.sv, cb.c) + cb.nsq, 6)
                    * {PQ_SCALE} + 0.5) AS BIGINT) AS dq
  FROM sub{sfx} s JOIN {prev} cb ON s.m = cb.m
  WHERE s.vec_id < {N_QUERIES}
), adc{sfx} AS (
  SELECT l.query_id, c.vec_id AS cand_id,
         CAST(SUM(l.dq) AS BIGINT) AS adc_d2_micro
  FROM codes{sfx} c JOIN luts{sfx} l ON c.m = l.m AND c.code = l.k
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
), pq_ranked{sfx} AS (
  SELECT query_id, cand_id, adc_d2_micro,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_d2_micro ASC, cand_id ASC) AS INT) AS rank
  FROM adc{sfx}
)"""
    return sql


PQ_ANN_SQL = f"""
WITH {_train_sql()}
SELECT query_id, cand_id, adc_d2_micro, rank
FROM pq_ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


PQ_RECALL_SQL = f"""
WITH {_train_sql()}, exact AS (
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
LEFT JOIN (SELECT query_id, cand_id FROM pq_ranked WHERE rank <= {TOP_K}) p
  ON e.query_id = p.query_id AND e.cand_id = p.cand_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


# ----------------------------------------- PQ-resolution sweep (r14)
PQ_M_SWEEP = (4, 8, 16)  # subquantizers; code bytes/vec = m/2 at 4 bits


def pq_m_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the PQ/ADC ranking as a function of the
    SUBQUANTIZER COUNT m ∈ {PQ_M_SWEEP} — the resolution companion to
    ``ivfpq_nprobe_sweep`` (VERDICT r13 item 6): that curve proved
    recall saturates from np=2 because the QUANTIZATION floor binds,
    so this sweep moves the floor itself. m subquantizers at 4 bits
    = m/2 bytes per vector; doubling m halves each subspace (finer
    reconstruction) at 2x the code storage — the storage/recall
    trade a 100 TB index actually tunes. The m = {PQ_M} point
    reproduces pq_ann's codebook bit-exactly (same seeded 1024-value
    draw, reshaped), so the curve is anchored to the audited config.

    One shared exact-Euclidean baseline; per m, the full train/
    encode/LUT/ADC pipeline (pq.py recipe verbatim — bounded
    K·DIM = 1024-value driver state per Lloyd update regardless of
    m). Output: one row per m with pooled recall@{TOP_K} over the
    {N_QUERIES} queries. Training runs at plan-build (bench
    BUILD_TIME_NOTES).
    """
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "v"
    )
    approx = None
    for m in PQ_M_SWEEP:
        sub = _subvectors(emb, m).cache()
        cb = _pq_init(m)
        for _ in range(PQ_ITERS):
            cb = _update(_assign(sub, cb), cb)
        sub.unpersist()
        codes = _assign(_subvectors(emb, m), cb).select(
            "vec_id", "m", "code"
        )
        kws = F.element_at(_codebook_lit(cb), F.col("m") + 1)
        luts = (
            _subvectors(emb.filter(F.col("vec_id") < N_QUERIES), m)
            .select(
                F.col("vec_id").alias("query_id"),
                "m",
                F.explode(
                    F.transform(
                        kws,
                        lambda s: F.struct(
                            s["k"].alias("k"),
                            _adc_term(F.col("sv"), s).alias("dq"),
                        ),
                    )
                ).alias("e"),
            )
            .select("query_id", "m", "e.k", "e.dq")
        )
        scored = (
            codes.join(
                F.broadcast(luts),
                (codes["m"] == luts["m"]) & (codes["code"] == luts["k"]),
            )
            .filter(F.col("vec_id") != F.col("query_id"))
            .groupBy("query_id", F.col("vec_id").alias("cand_id"))
            .agg(F.sum("dq").alias("adc_d2_micro"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.asc("adc_d2_micro"), F.asc("cand_id")
        )
        am = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select(
                F.lit(m).alias("pq_m"),
                "query_id",
                "cand_id",
                F.lit(0).alias("in_exact"),
                F.lit(1).alias("in_approx"),
            )
        )
        approx = am if approx is None else approx.unionByName(am)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cands = emb.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    ed2 = F.round(
        dot_expr(F.col("qv"), F.col("qv"))
        - 2.0 * dot_expr(F.col("qv"), F.col("cv"))
        + dot_expr(F.col("cv"), F.col("cv")),
        6,
    )
    we = Window.partitionBy("query_id").orderBy(
        F.asc("ed2_micro"), F.asc("cand_id")
    )
    ms = F.explode(F.array(*[F.lit(m) for m in PQ_M_SWEEP])).alias("pq_m")
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
            "query_id", "cand_id", ms,
            F.lit(1).alias("in_exact"), F.lit(0).alias("in_approx"),
        )
    )
    flags = (
        exact.unionByName(approx.select(*exact.columns))
        .groupBy("pq_m", "query_id", "cand_id")
        .agg(
            F.max("in_exact").alias("in_exact"),
            F.max("in_approx").alias("in_approx"),
        )
    )
    return (
        flags.filter(F.col("in_exact") == 1)
        .groupBy("pq_m")
        .agg(
            F.count(F.lit(1)).alias("n_exact_pairs"),
            F.sum("in_approx").alias("n_hits"),
        )
        .select(
            F.col("pq_m").cast("long").alias("pq_m"),
            "n_exact_pairs",
            "n_hits",
            F.floor(
                F.col("n_hits") * F.lit(PQ_SCALE) / F.col("n_exact_pairs")
            )
            .cast("long")
            .alias("recall_micro"),
        )
        .orderBy("pq_m")
    )


def _pq_m_sweep_sql() -> str:
    chains = ", ".join(
        _train_sql(m, f"_m{m}", include_emb=(i == 0))
        for i, m in enumerate(PQ_M_SWEEP)
    )
    approx_union = "\n  UNION ALL\n".join(
        f"  SELECT {m} AS pq_m, query_id, cand_id"
        f" FROM pq_ranked_m{m} WHERE rank <= {TOP_K}"
        for m in PQ_M_SWEEP
    )
    m_values = ", ".join(f"({m})" for m in PQ_M_SWEEP)
    return f"""
WITH {chains}, approx AS (
{approx_union}
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
), sweep_ms(pq_m) AS (VALUES {m_values})
SELECT m.pq_m,
       CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END)
            * {PQ_SCALE} // COUNT(*) AS BIGINT) AS recall_micro
FROM exact e CROSS JOIN sweep_ms m
LEFT JOIN approx a
  ON a.pq_m = m.pq_m AND a.query_id = e.query_id AND a.cand_id = e.cand_id
GROUP BY m.pq_m
ORDER BY m.pq_m
"""


PQ_M_SWEEP_SQL = _pq_m_sweep_sql()
