"""Iterative k-means clustering over the ``embeddings`` table.

The missing member of the iterative-algorithm family (PageRank and
connected-components live in graph.py / dedup.py): Lloyd's algorithm
expressed as DataFrame ops — assignment is a pure per-row expression
against centroid literals (no shuffle), the update step is one
groupBy over (cell, dim) rows, and the only driver-side state is the
K×dim centroid matrix (tiny and BOUNDED, exactly what Spark ML's own
KMeans collects per iteration). At 100 TB the per-iteration cost is
one scan + one 512-group aggregation; nothing grows with the data on
the driver.

Reference has nothing comparable (`/root/reference/index.js` is a
parse-merge-sort CLI); this extends SURVEY.md §2.2's "iterative graph
algorithms" row to centroid-model fitting.

Determinism (what makes an ITERATIVE float pipeline oracle-checkable
— same trick as graph.PAGERANK_SQL's unrolled CTEs):

- per-dim means are summed as DECIMAL(38,12): decimal addition is
  exact, so the sum is independent of partition/visit order in both
  engines; the single decimal→double conversion and the /n divide are
  then identical IEEE ops.
- centroids are ROUND(·, 6)-quantized after every update, and
  distances are ROUND(·, 6)-quantized before the argmin, with ties
  broken by lowest cell id — ulp-level engine differences in
  dot-product accumulation order cannot flip an assignment.
- init centroids are seeded plan literals (same pattern as
  similarity._ivf_centroids).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.operators.similarity import _as_double, dot_expr
from cgtcalc_data_transformer_spark.sources.tpch import load_table

KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_SEED = 19
DIM = 64


def _init_centroids(dim: int = DIM) -> list[list[float]]:
    rng = np.random.default_rng(KMEANS_SEED)
    return rng.standard_normal((KMEANS_K, dim)).round(6).tolist()


def _assign(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, v, cell): nearest centroid by quantized squared
    distance, ties to the lowest cell id. d2 = |v|² − 2·v·c + |c|²
    with |c|² folded into a literal — one fold over v per centroid."""
    vv = dot_expr(F.col("v"), F.col("v"))
    scored = F.array(
        *[
            F.struct(
                F.round(
                    vv
                    - 2.0 * dot_expr(F.col("v"), F.array(*[F.lit(x) for x in c]))
                    + F.lit(sum(x * x for x in c)),
                    6,
                ).alias("d2"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(cents)
        ]
    )
    return emb.select("vec_id", "v", F.array_min(scored)["cell"].alias("cell"))


def _update(assigned: DataFrame, prev: list[list[float]]) -> list[list[float]]:
    """One Lloyd update: per-(cell, dim) decimal-exact mean, rounded
    to 6; empty cells keep their previous centroid."""
    rows = (
        assigned.select("cell", F.posexplode("v").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("m")
        )
        .collect()
    )
    cents = [list(c) for c in prev]
    for r in rows:
        cents[r["cell"]][r["pos"]] = r["m"]
    return cents


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=8 Lloyd k-means, 3 iterations from seeded literals; returns
    per-cell membership count and the final centroid rendered as a
    comma-joined ``%.6f`` string — components are round(·,6)-quantized
    so the fixed-point render is exact, and a scalar string survives
    the driver canonicalizer where ``array<double>`` crashes it.

    NOTE: like dedup_clusters/pagerank, the iteration runs at
    plan-BUILD time (each update collects the K×dim matrix), so the
    returned frame's own execution re-runs only the final assignment.
    """
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).select("vec_id", "v")
    cents = _init_centroids()
    for _ in range(KMEANS_ITERS):
        cents = _update(_assign(emb, cents), cents)
    final = _assign(emb, cents)
    counts = final.groupBy("cell").agg(F.count(F.lit(1)).alias("n_members"))
    cent_df = final.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cell int, centroid array<double>"
    )
    return (
        cent_df.join(counts, "cell", "left")
        .select(
            "cell",
            F.coalesce("n_members", F.lit(0)).alias("n_members"),
            F.concat_ws(
                ",",
                F.transform("centroid", lambda x: F.format_string("%.6f", x)),
            ).alias("centroid_csv"),
        )
        .orderBy("cell")
    )


def _cent_values(cents: list[list[float]]) -> str:
    return ",\n    ".join(
        "({}, [{}]::DOUBLE[], {!r})".format(
            i, ", ".join(repr(x) for x in c), sum(x * x for x in c)
        )
        for i, c in enumerate(cents)
    )


def _kmeans_sql() -> str:
    """The full 3-iteration unroll as chained CTEs — assignment and
    decimal-mean update per round, numerically identical to the Spark
    path (see module docstring)."""
    sql = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), cent0(cell, c, norm_sq) AS (
  VALUES
    {_cent_values(_init_centroids())}
)"""
    prev = "cent0"
    for it in range(1, KMEANS_ITERS + 1):
        sql += f"""
, scored{it} AS (
  SELECT vec_id, v, cell,
         ROUND(list_dot_product(v, v) - 2 * list_dot_product(v, c) + norm_sq, 6) AS d2
  FROM emb CROSS JOIN {prev}
), assigned{it} AS (
  SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM scored{it})
  WHERE rn = 1
), means{it} AS (
  SELECT cell, i AS pos,
         ROUND(CAST(SUM(CAST(list_extract(v, i + 1) AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*), 6) AS m
  FROM assigned{it} CROSS JOIN range({DIM}) t(i)
  GROUP BY cell, i
), cent{it} AS (
  SELECT p.cell,
         COALESCE(u.c, p.c) AS c,
         COALESCE(u.norm_sq, p.norm_sq) AS norm_sq
  FROM {prev} p LEFT JOIN (
    SELECT cell, list(m ORDER BY pos) AS c, list_dot_product(list(m ORDER BY pos), list(m ORDER BY pos)) AS norm_sq
    FROM means{it} GROUP BY cell) u
  ON p.cell = u.cell
)"""
        prev = f"cent{it}"
    k = KMEANS_ITERS + 1
    sql += f"""
, scored{k} AS (
  SELECT vec_id, cell,
         ROUND(list_dot_product(v, v) - 2 * list_dot_product(v, c) + norm_sq, 6) AS d2
  FROM emb CROSS JOIN {prev}
), final_assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM scored{k})
  WHERE rn = 1
)
SELECT p.cell,
       COALESCE(n.n_members, 0) AS n_members,
       array_to_string(list_transform(p.c, x -> printf('%.6f', x)), ',') AS centroid_csv
FROM {prev} p
LEFT JOIN (SELECT cell, COUNT(*) AS n_members FROM final_assign GROUP BY cell) n
  ON p.cell = n.cell
ORDER BY p.cell
"""
    return sql


KMEANS_SQL = _kmeans_sql()
