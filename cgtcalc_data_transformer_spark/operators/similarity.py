"""Similarity search over the ``embeddings`` table (64-dim float).

Baseline: brute-force cosine top-k — exact, one broadcast of the
query set, no shuffle of the candidate side. Scale path: random-
hyperplane LSH bucketing — candidates restricted to colliding
buckets (with multi-probe via bucket neighbors), ~1/2^bits of the
data scanned per query at 100 TB.

Dot products are computed in double with a sequential left-to-right
fold (``F.aggregate``) so results are bit-deterministic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table, scatter

TOP_K = 5
N_QUERIES = 8          # vec_id < 8 are the demo query vectors
LSH_TABLES = 8         # L independent hash tables...
LSH_BITS = 4           # ...of k hyperplane bits each
LSH_SEED = 42


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


# The embeddings tables' fixed vector width (pq.DIM / ivfpq.DIM twin).
EMB_DIM = 64


def lit_double_array(vals) -> Column:
    """array<double> literal built from ONE parsed expression.

    Drop-in for ``F.array(*[F.lit(x) for x in vals])``, which costs
    one py4j round-trip PER ELEMENT — the r14 adjudication measured
    7 s of pure driver-side plan CONSTRUCTION for the 96×64 LSH
    hyperplane literals in dedup_embedding_cosine, re-paid on every
    fresh-plan run (tools/scaling_notes_r14.md). Values are exact:
    ``repr(float)`` is the shortest round-trip decimal and Spark's
    string→double cast is correctly rounded, so the parsed doubles
    are bit-identical to the F.lit binaries (0 diffs verified over
    all 96 projections)."""
    body = ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals)
    return F.expr(f"array({body})")


def dot_expr_unrolled(a: Column, b: Column, dim: int = EMB_DIM) -> Column:
    """Bit-identical to ``dot_expr`` — same left-associated summation
    seeded at 0.0, so every intermediate double is the one the HOF
    form (and DuckDB's sequential list_dot_product) produces — but
    UNROLLED into plain codegen arithmetic. ``F.aggregate``/
    ``zip_with`` lambdas are INTERPRETED per element (~40 µs each,
    the shingle_rows lesson); measured on the r14 LSH bucketing
    stage the unrolled form is >2x faster and stays inside
    whole-stage codegen. Only valid for FIXED-width vectors (an
    element_at past the end nulls the sum; the HOF form would just
    stop), which the embeddings tables guarantee by schema."""
    expr = F.lit(0.0)
    for i in range(dim):
        expr = expr + F.element_at(a, i + 1) * F.element_at(b, i + 1)
    return expr


def lit_array_sql_text(vals) -> str:
    """SQL text of an array<double> literal (lit_double_array's rule)."""
    return "array(" + ", ".join(
        f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals
    ) + ")"


def dot_sql_text(a_sql: str, b_sql: str) -> str:
    """SQL text of dot_expr(a, b) — the identical HOF expression
    (same lambdas, same CAST(0.0 AS DOUBLE) seed), for composing
    several dots into ONE F.expr call (each py4j round-trip is ~4 ms
    on this driver; a 96-projection plan pays seconds in pure calls
    — tools/scaling_notes_r14.md)."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def dot_unrolled_sql_text(a_sql: str, b_sql: str, dim: int = EMB_DIM) -> str:
    """SQL text of dot_expr_unrolled(a, b): left-assoc codegen
    arithmetic, bit-identical summation order to the HOF form."""
    terms = "".join(
        f" + element_at({a_sql}, {i + 1}) * element_at({b_sql}, {i + 1})"
        for i in range(dim)
    )
    return f"CAST(0.0 AS DOUBLE){terms}"


def dot_lit_sql(col_sql: str, vals) -> Column:
    """``dot_expr(F.col(col_sql), <literal array>)`` as ONE parsed
    expression. The HOF builders (``zip_with``/``aggregate``) cost
    ~20 ms of py4j lambda plumbing PER CALL at plan-build — 3.8 s for
    dedup_embedding_cosine's 96 projections (r14 profile); this emits
    the identical expression tree (same lambdas, same CAST(0.0 AS
    DOUBLE) seed, literals via the lit_double_array round-trip rule)
    through one driver call. ``col_sql`` is the column's SQL name —
    the caller guarantees it resolves in the consuming select."""
    return F.expr(dot_sql_text(col_sql, lit_array_sql_text(vals)))


def dot_lit_unrolled(v: Column, p: list[float]) -> Column:
    """``dot_expr(v, F.array(*lits))`` unrolled for a LITERAL plane
    vector (LSH hyperplanes, fixed rotations): same order and seed as
    the HOF form, multiplication operand order v·p preserved."""
    expr = F.lit(0.0)
    for i, x in enumerate(p):
        expr = expr + F.element_at(v, i + 1) * F.lit(x)
    return expr


def cosine_expr_unrolled(a: Column, b: Column, dim: int = EMB_DIM) -> Column:
    """``cosine_expr`` with every dot unrolled (see dot_expr_unrolled
    for the exactness argument)."""
    return dot_expr_unrolled(a, b, dim) / (
        F.sqrt(dot_expr_unrolled(a, a, dim))
        * F.sqrt(dot_expr_unrolled(b, b, dim))
    )


def _as_double(df: DataFrame) -> DataFrame:
    # scatter: packed float vectors are byte-small but every consumer
    # does O(dim) arithmetic per row (dot products, bucket hashes) —
    # don't let the byte-packed scan pin that work to 1-2 tasks.
    return scatter(df).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        "label",
    )


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for each query vector (vec_id < N_QUERIES).

    Queries ⨝ candidates is a broadcast nested loop (queries are tiny
    by construction); ranking is a per-query window. Candidate side
    streams: no shuffle until the final per-query top-k.
    """
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cands = emb.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    scored = (
        F.broadcast(queries)
        .join(cands, F.col("query_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


KNN_BRUTEFORCE_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         ROUND(list_dot_product(q.v, c.v) /
               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
  FROM emb q JOIN emb c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cand_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _hyperplanes(dim: int = 64) -> list[list[list[float]]]:
    """LSH_TABLES × LSH_BITS × dim, deterministic from LSH_SEED."""
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((LSH_TABLES, LSH_BITS, dim)).round(6).tolist()


def _table_bucket_expr(v_sql: str, table_planes: list[list[float]]) -> Column:
    bucket = F.lit(0)
    for i, p in enumerate(table_planes):
        proj = dot_lit_sql(v_sql, p)
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


IVF_NLIST = 16         # inverted lists (coarse cells)
IVF_NPROBE = 4         # cells probed per query
IVF_SEED = 7


def _ivf_centroids(dim: int = 64) -> list[list[float]]:
    """NLIST × dim deterministic coarse centroids.

    Random directions (seeded) instead of trained k-means: assignment
    balance on isotropic data is equivalent, everything stays a plan
    literal, and the oracle-facing pipeline has no fit step. On real
    clustered data you'd swap in `pyspark.ml.clustering.KMeans`
    centers — only this list changes, the plan shape doesn't.
    """
    rng = np.random.default_rng(IVF_SEED)
    return rng.standard_normal((IVF_NLIST, dim)).round(6).tolist()


def _centroid_scores(v_sql: str, centroids: list[list[float]]) -> Column:
    """array<struct<c: double, i: int>> of cosine-vs-centroid, ascending
    sortable (struct compares field-by-field). ``v_sql`` is the vector
    column's SQL name (dot_lit_sql: one parsed expression per centroid
    instead of ~20 ms of py4j HOF plumbing each)."""
    return F.array(
        *[
            F.struct(
                (
                    dot_lit_sql(v_sql, c)
                    / F.sqrt(F.lit(sum(x * x for x in c)))
                ).alias("c"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF: coarse-quantize every vector to its
    nearest of NLIST centroid cells; each query probes its NPROBE
    nearest cells and scores only those cells' vectors.

    The scale shape of FAISS-style IVF on Spark: cell assignment is a
    pure per-row expression (no shuffle), the probe⋈cell match is an
    equality join on the cell id, and ~NPROBE/NLIST of the corpus is
    scored per query. The inverted "lists" are just a partitioning of
    the candidate side — at 100 TB you'd write the corpus partitioned
    by cell so probes prune at the scan.
    """
    centroids = _ivf_centroids()
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    scores = _centroid_scores("v", centroids)
    # nearest cell = last element after ascending struct sort
    assigned = emb.select(
        "vec_id",
        "v",
        F.element_at(F.array_sort(scores), -1)["i"].alias("cell"),
    )
    queries = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.slice(F.reverse(F.array_sort(scores)), 1, IVF_NPROBE).alias("probes"),
        )
        .select(
            "query_id",
            "qv",
            F.explode(F.transform("probes", lambda s: s["i"])).alias("cell"),
        )
    )
    scored = (
        F.broadcast(queries)
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(cosine_expr(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5: multi-table random-hyperplane LSH
    (L=8 tables × k=4 bits, seed 42).

    Multiple independent short codes instead of one long code — the
    same banding principle as MinHash-LSH: P(candidate) =
    1-(1-p^k)^L, which keeps recall high for genuinely-near
    neighbors while each table's equality join on (table, bucket)
    touches ~1/2^k of the data. Hyperplanes are plan literals
    (deterministic, no driver-state closures). This equality-join
    shape survives 100 TB; the brute-force cross product does not.
    """
    planes = _hyperplanes()
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    # melt: one row per (vec, table) with that table's bucket
    bucketed = emb.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_idx"),
                        _table_bucket_expr("v", planes[t]).alias("bucket"),
                    )
                    for t in range(LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "v", "tb.table_idx", "tb.bucket")

    queries = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        "table_idx",
        "bucket",
    )
    cands = bucketed.select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), "table_idx", "bucket"
    )
    pairs = (
        F.broadcast(queries)
        .join(cands, ["table_idx", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "qv", "cand_id", "cv")
        .distinct()
    )
    scored = pairs.select(
        "query_id",
        "cand_id",
        F.round(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------- ANN oracles
# Both ANN variants are deterministic (seeded hyperplanes / centroids,
# embedded as plan literals) — so they oracle-check exactly like the
# brute-force query: the SQL embeds the SAME rounded literals and the
# same tie-breaking order.
def _sql_array(vals: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in vals) + "]::DOUBLE[]"


def _ann_ivf_sql() -> str:
    cent_rows = ",\n    ".join(
        f"({i}, {_sql_array(c)}, {sum(x * x for x in c)!r})"
        for i, c in enumerate(_ivf_centroids())
    )
    return f"""
WITH cent(i, c, norm_sq) AS (
  VALUES
    {cent_rows}
), emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), scores AS (
  SELECT vec_id, v, i,
         list_dot_product(v, c) / sqrt(norm_sq) AS cos
  FROM emb CROSS JOIN cent
), ranked_cells AS (
  SELECT vec_id, v, i,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, i DESC) AS rn
  FROM scores
), assigned AS (
  SELECT vec_id, v, i AS cell FROM ranked_cells WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, v AS qv, i AS cell
  FROM ranked_cells WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
), scored AS (
  SELECT query_id, a.vec_id AS cand_id,
         ROUND(list_dot_product(qv, a.v) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(a.v, a.v))), 6) AS cosine
  FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.query_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT query_id, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
  FROM scored)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _ann_lsh_sql() -> str:
    planes = _hyperplanes()
    plane_rows = ",\n    ".join(
        f"({t}, {b}, {_sql_array(planes[t][b])})"
        for t in range(LSH_TABLES)
        for b in range(LSH_BITS)
    )
    return f"""
WITH planes(table_idx, bit_idx, p) AS (
  VALUES
    {plane_rows}
), emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), bucketed AS (
  SELECT vec_id, table_idx,
         SUM(CASE WHEN list_dot_product(v, p) > 0 THEN (1 << bit_idx) ELSE 0 END) AS bucket
  FROM emb CROSS JOIN planes
  GROUP BY vec_id, table_idx
), pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
  FROM bucketed q
  JOIN bucketed c ON q.table_idx = c.table_idx AND q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
), scored AS (
  SELECT query_id, cand_id,
         ROUND(list_dot_product(qe.v, ce.v) /
               (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cosine
  FROM pairs
  JOIN emb qe ON qe.vec_id = query_id
  JOIN emb ce ON ce.vec_id = cand_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT query_id, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
  FROM scored)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


ANN_IVF_SQL = _ann_ivf_sql()
ANN_LSH_SQL = _ann_lsh_sql()


# ------------------------------------------------ recall audit (ANN QA)
def retrieval_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of both ANN paths against the exact brute-force top-k
    — the quality gate a production two-stage retrieval system ships
    with: per query and per method ('lsh' / 'ivf'), how many of the
    true top-k made it through the approximate stage.

    At 100 TB the exact side is infeasible corpus-wide, so this audit
    runs on the (tiny, broadcast) query panel only.

    Plan shape — UNION + flag aggregation, deliberately JOIN-FREE
    between the three result sets: all three share the same base
    lineage (the embeddings scan with ~2k hyperplane/centroid literal
    expressions), and joining two frames derived from one lineage
    forces Catalyst's self-join attribute deduplication to rewrite
    one whole subtree — measured MINUTES of driver-side analysis on
    this plan before it was restructured. Union branches keep their
    attribute ids, so the same semantics cost zero analysis work:
    tag each (query, cand) row with membership flags, one groupBy
    collapses the three sets, a second computes per-query hit counts
    (exact rows always exist, so zero-hit queries still report), and
    a literal 2-element explode emits one row per method.
    """
    exact = knn_bruteforce(spark, sf_dir).select(
        "query_id",
        "cand_id",
        F.lit(1).alias("in_exact"),
        F.lit(0).alias("in_lsh"),
        F.lit(0).alias("in_ivf"),
    )
    lsh = ann_lsh(spark, sf_dir).select(
        "query_id",
        "cand_id",
        F.lit(0).alias("in_exact"),
        F.lit(1).alias("in_lsh"),
        F.lit(0).alias("in_ivf"),
    )
    ivf = ann_ivf(spark, sf_dir).select(
        "query_id",
        "cand_id",
        F.lit(0).alias("in_exact"),
        F.lit(0).alias("in_lsh"),
        F.lit(1).alias("in_ivf"),
    )
    flags = (
        exact.unionByName(lsh)
        .unionByName(ivf)
        .groupBy("query_id", "cand_id")
        .agg(
            F.max("in_exact").alias("in_exact"),
            F.max("in_lsh").alias("in_lsh"),
            F.max("in_ivf").alias("in_ivf"),
        )
    )
    per_q = (
        flags.filter(F.col("in_exact") == 1)
        .groupBy("query_id")
        .agg(
            F.sum("in_lsh").alias("lsh"),
            F.sum("in_ivf").alias("ivf"),
        )
    )
    return (
        per_q.select(
            "query_id",
            F.explode(
                F.array(
                    F.struct(F.lit("ivf").alias("method"), F.col("ivf").alias("n_hits")),
                    F.struct(F.lit("lsh").alias("method"), F.col("lsh").alias("n_hits")),
                )
            ).alias("mh"),
        )
        .select(
            "query_id",
            F.col("mh.method").alias("method"),
            F.col("mh.n_hits").alias("n_hits"),
            (F.col("mh.n_hits") / F.lit(TOP_K)).alias("recall_at_k"),
        )
        .orderBy("query_id", "method")
    )


RECALL_AUDIT_SQL = f"""
WITH exact AS (
  SELECT query_id, cand_id FROM ({KNN_BRUTEFORCE_SQL})
), lsh AS (
  SELECT query_id, cand_id FROM ({ANN_LSH_SQL})
), ivf AS (
  SELECT query_id, cand_id FROM ({ANN_IVF_SQL})
), spine AS (
  SELECT DISTINCT query_id, m AS method
  FROM exact, (SELECT unnest(['lsh', 'ivf']) AS m)
), hits AS (
  SELECT e.query_id, 'lsh' AS method, COUNT(*) AS n_hits
  FROM exact e JOIN lsh USING (query_id, cand_id) GROUP BY 1
  UNION ALL
  SELECT e.query_id, 'ivf' AS method, COUNT(*) AS n_hits
  FROM exact e JOIN ivf USING (query_id, cand_id) GROUP BY 1
)
SELECT s.query_id, s.method,
       COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) / {TOP_K} AS recall_at_k
FROM spine s LEFT JOIN hits h ON s.query_id = h.query_id AND s.method = h.method
ORDER BY s.query_id, s.method
"""


# ------------------------------------- kNN label-consistency audit
KNN_EVAL_QUERIES = 64   # vec_id < 64 form the leave-one-out eval set
KNN_EVAL_K = 5


def knn_label_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality audit via leave-one-out kNN classification:
    for each eval vector, majority-vote the labels of its K nearest
    neighbors (cosine) and score against its true label, reported
    per label. A sane embedding space classifies well above the
    label-frequency baseline; a collapsed or shuffled one doesn't —
    this is the standard "are these embeddings worth their bytes"
    gate before ANN indexing or embedding dedup.

    Determinism: cosine rounded at 6 before ranking, doc_id
    tiebreaks, majority = (count desc, label asc) — every decision
    integer. Scale shape: the eval set is a bounded broadcast
    (KNN_EVAL_QUERIES rows); candidates stream past it with no
    shuffle until the per-query top-K window (keyed by query_id);
    vote/majority/accuracy aggregations are eval-sized.
    """
    from pyspark.sql import Window

    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("true_label"),
    )
    cands = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("v").alias("cv"),
        F.col("label").alias("cand_label"),
    )
    scored = (
        F.broadcast(queries)
        .join(cands, F.col("query_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    top = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= KNN_EVAL_K
    )
    votes = top.groupBy("query_id", "true_label", "cand_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    w_maj = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("cand_label")
    )
    majority = votes.withColumn("mrk", F.row_number().over(w_maj)).filter(
        F.col("mrk") == 1
    )
    return (
        majority.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                (F.col("cand_label") == F.col("true_label")).cast("long")
            ).alias("n_correct"),
        )
        .withColumn(
            "accuracy", F.round(F.col("n_correct") / F.col("n_eval"), 6)
        )
        .orderBy("true_label")
    )


KNN_LABEL_AUDIT_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, q.label AS true_label,
         c.vec_id AS cand_id, c.label AS cand_label,
         ROUND(list_dot_product(q.v, c.v) /
               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
  FROM emb q JOIN emb c ON q.vec_id < {KNN_EVAL_QUERIES} AND c.vec_id <> q.vec_id
), top AS (
  SELECT query_id, true_label, cand_label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, cand_id ASC) AS rk
  FROM scored
  QUALIFY rk <= {KNN_EVAL_K}
), votes AS (
  SELECT query_id, true_label, cand_label, COUNT(*) AS votes
  FROM top GROUP BY query_id, true_label, cand_label
), majority AS (
  SELECT query_id, true_label, cand_label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, cand_label ASC) AS mrk
  FROM votes
  QUALIFY mrk = 1
)
SELECT true_label,
       COUNT(*) AS n_eval,
       CAST(SUM(CASE WHEN cand_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(SUM(CASE WHEN cand_label = true_label THEN 1 ELSE 0 END) / COUNT(*), 6)
         AS accuracy
FROM majority
GROUP BY true_label
ORDER BY true_label
"""
