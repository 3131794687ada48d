"""Distributed PCA (top principal direction) over the ``embeddings``
table: covariance accumulation + power iteration.

The DataFrame shape that scales: the Gram/covariance matrix is built
by exploding each vector to (i, x_i) rows, self-pairing WITHIN a row
to (i, j, x_i*x_j), and running ONE groupBy(i, j) aggregation —
partial aggregation compresses every partition to at most dim² rows
before the shuffle, so the exchange is O(dim² × partitions)
regardless of corpus size. Power iteration then multiplies the
dim×dim matrix (collected to the driver — bounded, like Spark ML's
own ``RowMatrix.computePrincipalComponents``) against a vector,
entirely driver-side.

Determinism (the oracle contract, same toolkit as clustering.py):
decimal-exact covariance sums, ROUND(·, 6) quantization of the
centered covariance and of each power-iteration vector, fixed
iteration count from a fixed start vector — the unrolled DuckDB CTE
oracle reproduces every float bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.operators.similarity import _as_double
from cgtcalc_data_transformer_spark.sources.tpch import load_table

PCA_DIM = 64
PCA_ITERS = 3


def pca_covariance(emb: DataFrame) -> DataFrame:
    """(i, j, cov) for the full dim×dim matrix."""
    with_v = emb.select("vec_id", "v")
    xs = with_v.select("vec_id", "v", F.posexplode("v").alias("i", "xi"))
    pairs = xs.select(
        "i",
        "xi",
        F.posexplode("v").alias("j", "xj"),
    )
    n = with_v.count()
    sums = pairs.groupBy("i", "j").agg(
        F.sum((F.col("xi") * F.col("xj")).cast("decimal(38,12)")).alias("sxx"),
        F.sum(F.col("xi").cast("decimal(38,12)")).alias("sx"),
        F.sum(F.col("xj").cast("decimal(38,12)")).alias("sy"),
    )
    return sums.select(
        "i",
        "j",
        F.round(
            F.col("sxx").cast("double") / n
            - (F.col("sx").cast("double") / n) * (F.col("sy").cast("double") / n),
            6,
        ).alias("cov"),
    )


def _power_iterate(cov: list[list[float]], iters: int = PCA_ITERS) -> list[float]:
    """Driver-side power iteration on the collected dim×dim matrix,
    with the same 1e-6 quantization both engines apply."""
    dim = len(cov)
    v = [1.0] + [0.0] * (dim - 1)  # deterministic start
    for _ in range(iters):
        w = [sum(cov[i][k] * v[k] for k in range(dim)) for i in range(dim)]
        norm = sum(x * x for x in w) ** 0.5
        v = [round(x / norm, 6) for x in w]
    return v


def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding cloud + per-dimension
    variance: (dim_idx, variance, pc1_weight, pc1_score_var).

    ``pc1_score_var`` — the variance captured along the principal
    direction (vᵀΣv), the same scalar on every row — lets the oracle
    check the eigen-estimate numerically, not just the weights.
    """
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).select("vec_id", "v")
    cov_df = pca_covariance(emb)
    cov_rows = cov_df.collect()
    dim = PCA_DIM
    cov = [[0.0] * dim for _ in range(dim)]
    for r in cov_rows:
        cov[r["i"]][r["j"]] = r["cov"]
    v = _power_iterate(cov)
    captured = round(
        sum(v[i] * cov[i][j] * v[j] for i in range(dim) for j in range(dim)), 6
    )
    out = spark.createDataFrame(
        [(i, cov[i][i], v[i], captured) for i in range(dim)],
        "dim_idx int, variance double, pc1_weight double, pc1_score_var double",
    )
    return out.orderBy("dim_idx")


def _pca_sql() -> str:
    """Unrolled oracle: covariance CTE + PCA_ITERS power-iteration
    rounds, all in SQL. Vectors live as (idx, val) rows; the
    matrix-vector product is a join-aggregate per round."""
    sql = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT COUNT(*) AS n FROM emb
), xs AS (
  SELECT vec_id, i, list_extract(v, i + 1) AS xi
  FROM emb CROSS JOIN range({PCA_DIM}) t(i)
), cov AS (
  SELECT a.i AS i, b.i AS j,
         ROUND(CAST(SUM(CAST(a.xi * b.xi AS DECIMAL(38,12))) AS DOUBLE) / ANY_VALUE(n.n)
               - (CAST(SUM(CAST(a.xi AS DECIMAL(38,12))) AS DOUBLE) / ANY_VALUE(n.n))
                 * (CAST(SUM(CAST(b.xi AS DECIMAL(38,12))) AS DOUBLE) / ANY_VALUE(n.n)), 6) AS cov
  FROM xs a JOIN xs b ON a.vec_id = b.vec_id CROSS JOIN n
  GROUP BY a.i, b.i
), v0(idx, val) AS (
  SELECT i, CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END FROM range({PCA_DIM}) t(i)
)"""
    prev = "v0"
    for it in range(1, PCA_ITERS + 1):
        sql += f"""
, w{it} AS (
  SELECT cov.i AS idx, SUM(cov.cov * p.val) AS val
  FROM cov JOIN {prev} p ON cov.j = p.idx
  GROUP BY cov.i
), v{it}(idx, val) AS (
  SELECT idx, ROUND(val / (SELECT sqrt(SUM(val * val)) FROM w{it}), 6)
  FROM w{it}
)"""
        prev = f"v{it}"
    sql += f"""
, captured AS (
  SELECT ROUND(SUM(a.val * cov.cov * b.val), 6) AS s
  FROM cov JOIN {prev} a ON cov.i = a.idx JOIN {prev} b ON cov.j = b.idx
)
SELECT d.i AS dim_idx,
       cv.cov AS variance,
       p.val AS pc1_weight,
       captured.s AS pc1_score_var
FROM range({PCA_DIM}) d(i)
JOIN cov cv ON cv.i = d.i AND cv.j = d.i
JOIN {prev} p ON p.idx = d.i
CROSS JOIN captured
ORDER BY dim_idx
"""
    return sql


PCA_SQL = _pca_sql()
