"""Embedding-column operators: normalization, int8 quantization,
per-label centroid statistics.

The array-math discipline mirrors ``similarity.py``: dot products and
folds are sequential left-to-right ``F.aggregate`` expressions in
double (bit-deterministic per row, no shuffle-order dependence), and
every query returns SCALAR audit columns (the correctness gate's
value hasher cannot canonicalize array cells — r1 ``agg_approx``
lesson).

All three are row-local or label-bounded plans: normalization and
quantization are zero-shuffle scans; centroid stats shuffle once on
(label, idx) and broadcast the label-count-bounded centroid table —
nothing here grows super-linearly with corpus size.

No reference analog (broker CSVs, ``index.js:19-31``); these are the
vector-side prerequisites of the similarity/dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.operators.similarity import (
    _as_double,
    dot_expr,
    lit_double_array,
    norm_expr,
)
from cgtcalc_data_transformer_spark.sources.tpch import load_table

QUANT_BITS_MAX = 127  # symmetric int8: codes in [-127, 127]


def emb_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm + unit-vector audit per embedding: the norm, the sum of
    normalized components (a scalar fingerprint of the unit vector),
    and the dimension. Pure row-local codegen — at 100 TB this is a
    single scan writing a normalized copy alongside the raw column.
    """
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    norm = norm_expr(F.col("v"))
    unit_sum = F.aggregate(
        F.col("v"), F.lit(0.0), lambda acc, x: acc + x
    ) / norm
    return emb.select(
        "vec_id",
        "label",
        F.size("v").alias("dim"),
        F.round(norm, 6).alias("l2_norm"),
        F.round(unit_sum, 6).alias("unit_sum"),
    ).orderBy("vec_id")


EMB_NORMALIZE_SQL = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
)
SELECT vec_id, label,
       len(v) AS dim,
       ROUND(sqrt(list_dot_product(v, v)), 6) AS l2_norm,
       ROUND(list_sum(v) / sqrt(list_dot_product(v, v)), 6) AS unit_sum
FROM e
ORDER BY vec_id
"""


def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit: per-vector scale
    (max|x| / 127), the sum of quantized codes, and the reconstruction
    error in micro-MSE units.

    Rounding is spelled as ``floor(x/scale + 0.5)`` — identical
    integer semantics in Spark and DuckDB (plain ``round`` differs
    between engines on half-way cases). Row-local, zero shuffle; the
    100 TB shape is a rewrite pass producing the int8 column + one
    float scale per vector (4× smaller than float32).
    """
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    # Staged through materialized columns: inlining `scale` (itself an
    # array_max HOF) into every lambda makes the interpreted HOF path
    # re-derive it per element — O(dim^2) work per row, measured ~5x
    # slower. Two hazards the staging must respect: (1) higher-order
    # lambdas don't whole-stage-codegen, so single evaluation matters;
    # (2) the final select must NOT alias the rounded output back to
    # the name "scale" next to expressions reading col("scale") —
    # lateral column alias resolution binds them to the ROUNDED value
    # and silently changes mse (hence the separate rounding select).
    s1 = emb.select(
        "vec_id",
        "v",
        (
            F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
            / F.lit(float(QUANT_BITS_MAX))
        ).alias("scale"),
    )
    s2 = s1.select(
        "vec_id",
        "v",
        "scale",
        F.transform(
            F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5))
        ).alias("q"),
    )
    qsum = F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda acc, x: acc + x)
    sqerr = F.aggregate(
        F.zip_with(
            F.col("q"),
            F.col("v"),
            lambda qi, x: (qi * F.col("scale") - x) * (qi * F.col("scale") - x),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    core = s2.select(
        "vec_id",
        "scale",
        qsum.alias("qsum"),
        (sqerr / F.size("v") * F.lit(1_000_000.0)).alias("mse_raw"),
    )
    return core.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        "qsum",
        F.round("mse_raw", 6).alias("mse_micro"),
    ).orderBy("vec_id")


EMB_QUANTIZE_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), scaled AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / {QUANT_BITS_MAX}.0 AS scale
  FROM e
), q AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> floor(x / scale + 0.5)) AS codes
  FROM scaled
)
SELECT vec_id,
       ROUND(scale, 9) AS scale,
       CAST(list_sum(codes) AS BIGINT) AS qsum,
       ROUND(list_sum(list_transform(range(1, len(v) + 1),
                                     i -> (codes[i] * scale - v[i]) * (codes[i] * scale - v[i])))
             / len(v) * 1000000.0, 6) AS mse_micro
FROM q
ORDER BY vec_id
"""


def emb_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + dispersion: member count, centroid L2
    norm, mean and max member distance to the centroid.

    Centroid: posexplode → one (label, idx) aggregation (map-side
    partial, 64·|labels| result rows) → reassembled into an array
    ordered by idx. Distances: the centroid table is label-count-
    bounded, so it is broadcast — the member side never shuffles. The
    per-row distance is a sequential fold (deterministic); only the
    final label-level avg/max aggregates cross partitions, rounded
    past float noise.
    """
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    exploded = emb.select(
        "label", F.posexplode(F.col("v")).alias("idx", "x")
    )
    centroid_rows = exploded.groupBy("label", "idx").agg(F.avg("x").alias("c"))
    centroids = centroid_rows.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        emb.join(F.broadcast(centroids), "label")
        .select("label", norm_expr(F.col("cv")).alias("cnorm"), dist.alias("dist"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.first("cnorm"), 6).alias("centroid_norm"),
            F.round(F.avg("dist"), 6).alias("avg_dist"),
            F.round(F.max("dist"), 6).alias("max_dist"),
        )
        .orderBy("label")
    )


EMB_CENTROID_SQL = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), comp0 AS (
  SELECT label, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e
), comp AS (
  SELECT label, i, AVG(x) AS c
  FROM comp0
  GROUP BY label, i
), cent AS (
  SELECT label, list(c ORDER BY i) AS cv FROM comp GROUP BY label
), dists AS (
  SELECT e.label,
         sqrt(list_dot_product(cent.cv, cent.cv)) AS cnorm,
         sqrt(list_sum(list_transform(range(1, len(e.v) + 1),
                                      i -> (e.v[i] - cent.cv[i]) * (e.v[i] - cent.cv[i])))) AS dist
  FROM e JOIN cent USING (label)
)
SELECT label, COUNT(*) AS n_vecs,
       ROUND(ANY_VALUE(cnorm), 6) AS centroid_norm,
       ROUND(AVG(dist), 6) AS avg_dist,
       ROUND(MAX(dist), 6) AS max_dist
FROM dists
GROUP BY label
ORDER BY label
"""


# -------------------------------------------- calibration audit (ECE)
ECE_BINS = 10
ECE_SD = 10**12   # quantization of per-component dot/norm terms
ECE_SC = 10**6    # quantization of cosine confidence


def _centroid_cosines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, clabel, cos_i): exact 1e-6-rational cosine of
    EVERY vector against EVERY label centroid — the full score table
    behind _nearest_centroid_pred (argmax) and the stats11
    silhouette audit (own-vs-best-other margin)."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    exploded = emb.select(
        "vec_id", "label", F.posexplode(F.col("v")).alias("idx", "x")
    )
    # CACHED (r14 plan audit): the centroid table is |labels| x dim
    # rows, but uncached every evaluation of this helper scanned
    # embeddings TWICE (once for the centroid branch, once for the
    # scoring join) — and the stats10/11/13 consumers that reference
    # their downstream frames 2-4x multiplied that into 3-7 scans per
    # query (plans/r14/isotonic_calibration_before.txt,
    # .../classifier_quality_panel_before.txt). Guide §2.4.
    cent = (
        exploded.groupBy(F.col("label").alias("clabel"), "idx")
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .cache()
    )

    def _q(expr):
        return F.floor(expr * F.lit(float(ECE_SD)) + F.lit(0.5)).cast("long")

    scored = (
        exploded.join(F.broadcast(cent), "idx")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(_q(F.col("x") * F.col("c"))).alias("dot_i"),
            F.sum(_q(F.col("c") * F.col("c"))).alias("cc_i"),
            F.sum(_q(F.col("x") * F.col("x"))).alias("xx_i"),
        )
    )
    cos = F.col("dot_i") / F.sqrt(
        F.col("cc_i").cast("double") * F.col("xx_i").cast("double")
    )
    cos_i = F.floor(cos * F.lit(float(ECE_SC)) + F.lit(0.5)).cast("long")
    return scored.select("vec_id", "label", "clabel", cos_i.alias("cos_i"))


def _nearest_centroid_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, pred, conf_i): nearest-centroid prediction per
    vector with exact 1e-6-rational cosine confidence — the shared
    scoring core of ece_calibration, brier_decomposition and the
    stats11 classifier-quality panels (same quantization discipline,
    documented at ece_calibration)."""
    cos_i = F.col("cos_i")
    return (
        _centroid_cosines(spark, sf_dir).select(
            "vec_id",
            "label",
            F.struct(
                cos_i.alias("ci"), (-F.col("clabel")).alias("nl")
            ).alias("s"),
        )
        .groupBy("vec_id", "label")
        .agg(F.max("s").alias("m"))
        .select(
            "vec_id",
            "label",
            (-F.col("m.nl")).alias("pred"),
            F.col("m.ci").alias("conf_i"),
        )
    )


def _nearest_centroid_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, conf_i, correct): the _nearest_centroid_pred frame
    projected to the hit/miss shape ece_calibration and
    brier_decomposition consume."""
    return _nearest_centroid_pred(spark, sf_dir).select(
        "vec_id",
        "conf_i",
        (F.col("pred") == F.col("label")).cast("long").alias("correct"),
    )


def ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error of the nearest-centroid classifier
    over the embedding space: per confidence bin, count, accuracy,
    mean confidence and |acc − conf|, plus the corpus ECE repeated on
    every row — the reliability-diagram audit (Guo et al. 2017,
    "On Calibration of Modern Neural Networks") that tells a
    labeling/routing pipeline whether its scores can be thresholded.

    Scale shape: centroids are a |labels|·dim aggregate (broadcast);
    scoring joins the exploded component stream against them on idx
    (fan-out = |labels|, bounded); argmax/conf is one max(struct)
    per vector; bins are an ECE_BINS-row rollup. No windows, no
    driver state.

    Engine-exactness: centroid components are rounded(6) once, then
    every per-component product is quantized floor(x·c·1e12+0.5) to
    an integer BEFORE the sums, so dot/norms are exact integers, the
    cosine is one identical IEEE expression, the confidence is an
    exact 1e-6 rational, and per-bin |acc − conf| reduces to integer
    arithmetic: ece = Σ_b |corr_b·1e6 − Σconf_b| / (1e6·N) with one
    final division.
    """
    per_vec = _nearest_centroid_scores(spark, sf_dir)
    bin_col = F.least(
        F.lit(ECE_BINS - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor(F.col("conf_i") * F.lit(ECE_BINS) / F.lit(ECE_SC)),
        ),
    )
    # CACHED (r14 plan audit): totals + the crossJoin branch reference
    # bins 2x and each re-ran the per-vector scoring; the frame is
    # ≤ ECE_BINS rows (guide §2.4).
    bins = (
        per_vec.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("correct").alias("n_correct"),
            F.sum("conf_i").alias("sum_conf_i"),
        )
        .cache()
    )
    totals = bins.agg(
        F.sum("n").alias("n_total"),
        F.sum(
            F.abs(F.col("n_correct") * F.lit(ECE_SC) - F.col("sum_conf_i"))
        ).alias("gap_i"),
    )
    return (
        bins.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n",
            F.round(F.col("n_correct") / F.col("n"), 6).alias("accuracy"),
            F.round(
                F.col("sum_conf_i") / (F.col("n") * F.lit(ECE_SC)), 6
            ).alias("avg_conf"),
            F.round(
                F.col("gap_i") / (F.col("n_total") * F.lit(ECE_SC)), 6
            ).alias("ece_total"),
        )
        .orderBy("bin")
    )


ECE_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), exploded AS (
  SELECT vec_id, label, generate_subscripts(v, 1) AS idx, unnest(v) AS x FROM e
), cent AS (
  SELECT label AS clabel, idx, ROUND(AVG(x), 6) AS c
  FROM exploded GROUP BY label, idx
), scored AS (
  SELECT vec_id, label, clabel,
         CAST(SUM(CAST(floor(x * c * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS dot_i,
         CAST(SUM(CAST(floor(c * c * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS cc_i,
         CAST(SUM(CAST(floor(x * x * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS xx_i
  FROM exploded JOIN cent USING (idx)
  GROUP BY vec_id, label, clabel
), per_vec AS (
  SELECT vec_id, label,
         MAX(struct_pack(
           ci := CAST(floor(dot_i / sqrt(CAST(cc_i AS DOUBLE) * CAST(xx_i AS DOUBLE))
                            * {ECE_SC} + 0.5) AS BIGINT),
           nl := -clabel)) AS m
  FROM scored GROUP BY vec_id, label
), flat AS (
  SELECT vec_id, m.ci AS conf_i,
         CASE WHEN -m.nl = label THEN 1 ELSE 0 END AS correct
  FROM per_vec
), bins AS (
  SELECT LEAST({ECE_BINS - 1}, GREATEST(0,
           CAST(floor(conf_i * {ECE_BINS} / {ECE_SC}) AS BIGINT))) AS bin,
         COUNT(*) AS n,
         CAST(SUM(correct) AS BIGINT) AS n_correct,
         CAST(SUM(conf_i) AS BIGINT) AS sum_conf_i
  FROM flat GROUP BY 1
), totals AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(abs(n_correct * {ECE_SC} - sum_conf_i)) AS BIGINT) AS gap_i
  FROM bins
)
SELECT bin, n,
       ROUND(n_correct / n, 6) AS accuracy,
       ROUND(sum_conf_i / (n * {ECE_SC}.0), 6) AS avg_conf,
       ROUND(gap_i / (n_total * {ECE_SC}.0), 6) AS ece_total
FROM bins, totals
ORDER BY bin
"""

# -------------------------------------------- Brier decomposition
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score for the
    nearest-centroid classifier: BRIER = reliability − resolution +
    uncertainty (up to within-bin variance), over the same 10
    confidence bins as ece_calibration — reliability isolates the
    miscalibration ECE reports, resolution says whether the scores
    separate outcomes at all, uncertainty is the outcome base rate's
    intrinsic floor. One row, the whole reliability story.

    Shares _nearest_centroid_scores: confidence is an exact 1e-6
    rational, outcomes are 0/1, so the raw Brier numerator
    Σ(conf_i − 10⁶·o)² and every per-bin numerator
    (Σconf − 10⁶·correct)² are exact BIGINT (bounded by N·10¹² —
    beyond ~9M rows the same sums run as decimal). Bin terms are
    n_k-weighted exact-integer squares divided once; the cross-bin
    sums run over ≤ 10 values quantized by construction.
    """
    per_vec = _nearest_centroid_scores(spark, sf_dir)
    bin_col = F.least(
        F.lit(ECE_BINS - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor(F.col("conf_i") * F.lit(ECE_BINS) / F.lit(ECE_SC)),
        ),
    )
    d = F.col("conf_i") - F.lit(ECE_SC) * F.col("correct")
    bins = per_vec.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("nk"),
        F.sum("correct").alias("ck"),
        F.sum("conf_i").alias("sk"),
        F.sum(d * d).alias("bk"),
    )
    tot = bins.agg(
        F.sum("nk").alias("n"),
        F.sum("ck").alias("c"),
        F.sum("bk").alias("b"),
        # reliability numerator per bin: (Σconf − 10⁶·correct)²/n_k —
        # exact-integer square over one division, summed across ≤ 10
        # bins after flooring to the 1e-12 quantum of the outer scale
        F.sum(
            (
                (F.col("sk") - F.lit(ECE_SC) * F.col("ck")).cast("double")
                * (F.col("sk") - F.lit(ECE_SC) * F.col("ck")).cast("double")
                / F.col("nk").cast("double")
            ).cast("decimal(38,6)")
        ).alias("rel_num"),
        F.sum(
            (
                F.col("ck").cast("double")
                * F.col("ck").cast("double")
                / F.col("nk").cast("double")
            ).cast("decimal(38,6)")
        ).alias("res_aux"),
    )
    n = F.col("n").cast("double")
    obar = F.col("c").cast("double") / n
    brier = F.col("b").cast("double") / (n * F.lit(float(ECE_SC) ** 2))
    reliability = F.col("rel_num").cast("double") / (
        n * F.lit(float(ECE_SC) ** 2)
    )
    # Σ n_k(ō_k − ō)² = Σ c_k²/n_k − c²/n  (exact-integer identity)
    resolution = (
        F.col("res_aux").cast("double")
        - F.col("c").cast("double") * F.col("c").cast("double") / n
    ) / n
    return tot.select(
        "n",
        F.round(brier, 6).alias("brier"),
        F.round(reliability, 6).alias("reliability"),
        F.round(resolution, 6).alias("resolution"),
        F.round(obar * (F.lit(1.0) - obar), 6).alias("uncertainty"),
    )


BRIER_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), exploded AS (
  SELECT vec_id, label, generate_subscripts(v, 1) AS idx, unnest(v) AS x FROM e
), cent AS (
  SELECT label AS clabel, idx, ROUND(AVG(x), 6) AS c
  FROM exploded GROUP BY label, idx
), scored AS (
  SELECT vec_id, label, clabel,
         CAST(SUM(CAST(floor(x * c * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS dot_i,
         CAST(SUM(CAST(floor(c * c * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS cc_i,
         CAST(SUM(CAST(floor(x * x * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS xx_i
  FROM exploded JOIN cent USING (idx)
  GROUP BY vec_id, label, clabel
), per_vec AS (
  SELECT vec_id, label,
         MAX(struct_pack(
           ci := CAST(floor(dot_i / sqrt(CAST(cc_i AS DOUBLE) * CAST(xx_i AS DOUBLE))
                            * {ECE_SC} + 0.5) AS BIGINT),
           nl := -clabel)) AS m
  FROM scored GROUP BY vec_id, label
), flat AS (
  SELECT vec_id, m.ci AS conf_i,
         CASE WHEN -m.nl = label THEN 1 ELSE 0 END AS correct
  FROM per_vec
), bins AS (
  SELECT LEAST({ECE_BINS - 1}, GREATEST(0, CAST(floor(conf_i * {ECE_BINS} / {ECE_SC}) AS BIGINT))) AS bin,
         COUNT(*) AS nk,
         CAST(SUM(correct) AS BIGINT) AS ck,
         CAST(SUM(conf_i) AS BIGINT) AS sk,
         CAST(SUM((conf_i - {ECE_SC} * correct) * (conf_i - {ECE_SC} * correct)) AS BIGINT) AS bk
  FROM flat GROUP BY 1
), tot AS (
  SELECT CAST(SUM(nk) AS BIGINT) AS n,
         CAST(SUM(ck) AS BIGINT) AS c,
         CAST(SUM(bk) AS BIGINT) AS b,
         CAST(SUM(CAST(CAST(sk - {ECE_SC} * ck AS DOUBLE) * CAST(sk - {ECE_SC} * ck AS DOUBLE)
                       / CAST(nk AS DOUBLE) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS rel_num,
         CAST(SUM(CAST(CAST(ck AS DOUBLE) * CAST(ck AS DOUBLE)
                       / CAST(nk AS DOUBLE) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS res_aux
  FROM bins
)
SELECT n,
       ROUND(CAST(b AS DOUBLE) / (CAST(n AS DOUBLE) * {float(ECE_SC) ** 2!r}), 6) AS brier,
       ROUND(CAST(rel_num AS DOUBLE) / (CAST(n AS DOUBLE) * {float(ECE_SC) ** 2!r}), 6) AS reliability,
       ROUND((CAST(res_aux AS DOUBLE)
              - CAST(c AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS resolution,
       ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             * (1.0 - CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS uncertainty
FROM tot
"""

# ------------------------------------------------- cumulative gains
def gains_curve_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains curve for the nearest-centroid classifier:
    bins ordered by DESCENDING confidence, each row reporting the
    cumulative share of examples reviewed and of correct predictions
    captured, plus lift vs the base rate — the triage answer ("route
    the top-X% to auto-accept") that ECE/Brier's per-bin views don't
    give directly.

    Reuses the factored nearest-centroid scorer; cumulation over the
    ≤ 10 confidence bins is the bounded theta-join prefix convention
    (b.bin >= a.bin under descending order), and every reported
    number is an exact int/int division.
    """
    per_vec = _nearest_centroid_scores(spark, sf_dir)
    bin_col = F.least(
        F.lit(ECE_BINS - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor(F.col("conf_i") * F.lit(ECE_BINS) / F.lit(ECE_SC)),
        ),
    )
    # CACHED (r14 plan audit): tot + both sides of the prefix theta
    # join read bins 3x, each re-running the per-vector scoring;
    # ≤ ECE_BINS rows (guide §2.4).
    bins = per_vec.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("nk"), F.sum("correct").alias("ck")
    ).cache()
    tot = bins.agg(F.sum("nk").alias("n"), F.sum("ck").alias("c"))
    cum = (
        bins.alias("a")
        .join(F.broadcast(bins.alias("b")), F.col("b.bin") >= F.col("a.bin"))
        .groupBy(
            F.col("a.bin").alias("bin"),
            F.col("a.nk").alias("nk"),
            F.col("a.ck").alias("ck"),
        )
        .agg(F.sum("b.nk").alias("cum_n"), F.sum("b.ck").alias("cum_c"))
    )
    j = cum.crossJoin(F.broadcast(tot))
    return j.select(
        "bin",
        "nk",
        F.round(F.col("ck") / F.col("nk"), 6).alias("bin_precision"),
        F.round(F.col("cum_n") / F.col("n"), 6).alias("reviewed_share"),
        F.round(F.col("cum_c") / F.col("c"), 6).alias("captured_share"),
        F.round(
            (F.col("cum_c") * F.col("n")).cast("double")
            / (F.col("cum_n") * F.col("c")).cast("double"),
            6,
        ).alias("lift"),
    ).orderBy(F.col("bin").desc())


GAINS_CURVE_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), exploded AS (
  SELECT vec_id, label, generate_subscripts(v, 1) AS idx, unnest(v) AS x FROM e
), cent AS (
  SELECT label AS clabel, idx, ROUND(AVG(x), 6) AS c
  FROM exploded GROUP BY label, idx
), scored AS (
  SELECT vec_id, label, clabel,
         CAST(SUM(CAST(floor(x * c * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS dot_i,
         CAST(SUM(CAST(floor(c * c * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS cc_i,
         CAST(SUM(CAST(floor(x * x * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS xx_i
  FROM exploded JOIN cent USING (idx)
  GROUP BY vec_id, label, clabel
), per_vec AS (
  SELECT vec_id, label,
         MAX(struct_pack(
           ci := CAST(floor(dot_i / sqrt(CAST(cc_i AS DOUBLE) * CAST(xx_i AS DOUBLE))
                            * {ECE_SC} + 0.5) AS BIGINT),
           nl := -clabel)) AS m
  FROM scored GROUP BY vec_id, label
), flat AS (
  SELECT vec_id, m.ci AS conf_i,
         CASE WHEN -m.nl = label THEN 1 ELSE 0 END AS correct
  FROM per_vec
), bins AS (
  SELECT LEAST({ECE_BINS - 1}, GREATEST(0, CAST(floor(conf_i * {ECE_BINS} / {ECE_SC}) AS BIGINT))) AS bin,
         COUNT(*) AS nk,
         CAST(SUM(correct) AS BIGINT) AS ck
  FROM flat GROUP BY 1
), tot AS (
  SELECT CAST(SUM(nk) AS BIGINT) AS n, CAST(SUM(ck) AS BIGINT) AS c FROM bins
), cum AS (
  SELECT a.bin, a.nk, a.ck,
         CAST(SUM(b.nk) AS BIGINT) AS cum_n,
         CAST(SUM(b.ck) AS BIGINT) AS cum_c
  FROM bins a JOIN bins b ON b.bin >= a.bin
  GROUP BY a.bin, a.nk, a.ck
)
SELECT bin, nk,
       ROUND(ck / nk, 6) AS bin_precision,
       ROUND(cum_n / n, 6) AS reviewed_share,
       ROUND(cum_c / c, 6) AS captured_share,
       ROUND(CAST(cum_c * n AS DOUBLE) / CAST(cum_n * c AS DOUBLE), 6) AS lift
FROM cum CROSS JOIN tot
ORDER BY bin DESC
"""

# ----------------------------------------------------- ROC AUC
def auc_roc_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the nearest-centroid classifier's confidence as a
    correctness score: AUC = P(conf_correct > conf_wrong) + ½ties —
    computed exactly by the Mann-Whitney identity over per-CONFIDENCE
    counts, never by sorting predictions. The threshold-free
    companion to ece/brier/gains: those ask "are the scores honest",
    AUC asks "do they rank at all".

    Ranking runs on the COARSENED confidence grid conf_i div 100
    (≤ 10⁴ distinct ranks): the raw 10⁶-point grid would make the
    prefix theta join |grid|² = 10¹² at saturation, while 10⁴ caps it
    at 10⁸ regardless of corpus size — the r7 sf1 sweep flagged the
    fine-grid join as this op's scale wall. Coarsening only moves
    within-cell comparisons into the ½-tie term (binned AUC, the
    standard estimator); 2·U = Σ_v cP(v)·(2·cumN<(v) + cN(v)) stays
    exact BIGINT and AUC is one exact-integer ratio. Gini = 2·AUC − 1.
    """
    per_vec = _nearest_centroid_scores(spark, sf_dir)
    vals = per_vec.groupBy(F.expr("conf_i div 100").alias("v")).agg(
        F.sum("correct").alias("cp"),
        F.sum(1 - F.col("correct")).alias("cn"),
    )
    cum = (
        vals.alias("a")
        .join(F.broadcast(vals.alias("b")), F.col("b.v") < F.col("a.v"), "left")
        .groupBy(
            F.col("a.v").alias("v"),
            F.col("a.cp").alias("cp"),
            F.col("a.cn").alias("cn"),
        )
        .agg(F.coalesce(F.sum("b.cn"), F.lit(0)).alias("cumn"))
    )
    s = cum.agg(
        F.sum("cp").alias("mp"),
        F.sum("cn").alias("mn"),
        F.sum(
            F.col("cp") * (F.lit(2) * F.col("cumn") + F.col("cn"))
        ).alias("u2"),
    )
    auc = F.col("u2").cast("double") / (
        F.lit(2.0) * (F.col("mp") * F.col("mn")).cast("double")
    )
    return s.select(
        F.col("mp").alias("n_correct"),
        F.col("mn").alias("n_wrong"),
        F.round(auc, 6).alias("auc"),
        F.round(F.lit(2.0) * auc - F.lit(1.0), 6).alias("gini"),
    )


AUC_ROC_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), exploded AS (
  SELECT vec_id, label, generate_subscripts(v, 1) AS idx, unnest(v) AS x FROM e
), cent AS (
  SELECT label AS clabel, idx, ROUND(AVG(x), 6) AS c
  FROM exploded GROUP BY label, idx
), scored AS (
  SELECT vec_id, label, clabel,
         CAST(SUM(CAST(floor(x * c * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS dot_i,
         CAST(SUM(CAST(floor(c * c * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS cc_i,
         CAST(SUM(CAST(floor(x * x * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS xx_i
  FROM exploded JOIN cent USING (idx)
  GROUP BY vec_id, label, clabel
), per_vec AS (
  SELECT vec_id, label,
         MAX(struct_pack(
           ci := CAST(floor(dot_i / sqrt(CAST(cc_i AS DOUBLE) * CAST(xx_i AS DOUBLE))
                            * {ECE_SC} + 0.5) AS BIGINT),
           nl := -clabel)) AS m
  FROM scored GROUP BY vec_id, label
), flat AS (
  SELECT vec_id, m.ci AS conf_i,
         CASE WHEN -m.nl = label THEN 1 ELSE 0 END AS correct
  FROM per_vec
), vals AS (
  SELECT conf_i // 100 AS v,
         CAST(SUM(correct) AS BIGINT) AS cp,
         CAST(SUM(1 - correct) AS BIGINT) AS cn
  FROM flat GROUP BY conf_i // 100
), cum AS (
  SELECT a.v, a.cp, a.cn, CAST(COALESCE(SUM(b.cn), 0) AS BIGINT) AS cumn
  FROM vals a LEFT JOIN vals b ON b.v < a.v GROUP BY a.v, a.cp, a.cn
), s AS (
  SELECT CAST(SUM(cp) AS BIGINT) AS mp,
         CAST(SUM(cn) AS BIGINT) AS mn,
         CAST(SUM(cp * (2 * cumn + cn)) AS BIGINT) AS u2
  FROM cum
)
SELECT mp AS n_correct, mn AS n_wrong,
       ROUND(CAST(u2 AS DOUBLE) / (2.0 * CAST(mp * mn AS DOUBLE)), 6) AS auc,
       ROUND(2.0 * (CAST(u2 AS DOUBLE) / (2.0 * CAST(mp * mn AS DOUBLE))) - 1.0, 6) AS gini
FROM s
"""


# ----------------------------------- Johnson-Lindenstrauss projection
import random as _random

JL_OUT_DIM = 16
JL_EVAL_N = 400  # bounded eval set: pairs (2i, 2i+1) for 2i < JL_EVAL_N
_jl_rng = _random.Random(20250815)
JL_SIGNS = [
    [_jl_rng.choice((-1.0, 1.0)) for _ in range(64)]
    for _ in range(JL_OUT_DIM)
]


def jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distance-preservation audit: project the
    64-d embeddings to 16-d with a fixed ±1 (Achlioptas) matrix and
    measure, over a bounded eval set of pairs, the ratio
    |R(a−b)|²/(k·|a−b|²) — the distortion a 4x-cheaper ANN index
    built on the projection would inherit. JL says the ratio
    concentrates near 1.

    The eval set is constant-size (the knn_label_audit convention),
    so the audit costs O(1) whatever the corpus; distances use the
    dot-identity |a−b|² = |a|²+|b|²−2a·b and per-pair sequential
    folds (bit-identical across engines); per-pair ratios quantize to
    a 1e-9 grid before the integer mean/max/min.
    """
    emb = _as_double(load_table(spark, sf_dir, "embeddings")).filter(
        F.col("vec_id") < JL_EVAL_N
    )
    a = emb.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    pairs = a.join(
        b, (F.col("ib") == F.col("ia") + 1) & (F.col("ia") % 2 == 0)
    )
    d2 = (
        dot_expr(F.col("va"), F.col("va"))
        + dot_expr(F.col("vb"), F.col("vb"))
        - F.lit(2.0) * dot_expr(F.col("va"), F.col("vb"))
    )
    dp2 = None
    for row in JL_SIGNS:
        r = lit_double_array(row)
        term = dot_expr(F.col("va"), r) - dot_expr(F.col("vb"), r)
        term2 = term * term
        dp2 = term2 if dp2 is None else dp2 + term2
    ratio = dp2 / (F.lit(float(JL_OUT_DIM)) * d2)
    rq = F.floor(ratio * F.lit(1e9) + F.lit(0.5)).cast("long")
    s = pairs.select(rq.alias("rq")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("rq").alias("srq"),
        F.min("rq").alias("mnq"),
        F.max("rq").alias("mxq"),
    )
    # integer `div`, not `/`: double division re-rounds the 1e-9-grid
    # integers differently across engines at the cast boundary
    return s.select(
        "n_pairs",
        F.expr("srq div (n_pairs * 1000)").alias("mean_ratio_micro"),
        F.expr("mnq div 1000").alias("min_ratio_micro"),
        F.expr("mxq div 1000").alias("max_ratio_micro"),
    )


_JL_TERMS = " + ".join(
    "(list_dot_product(av, [{r}]) - list_dot_product(bv, [{r}]))"
    "* (list_dot_product(av, [{r}]) - list_dot_product(bv, [{r}]))".format(
        r=", ".join(repr(x) for x in row)
    )
    for row in JL_SIGNS
)

JL_PROJECTION_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id < {JL_EVAL_N}
), pairs AS (
  SELECT a.v AS av, b.v AS bv
  FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0
), scored AS (
  SELECT CAST(floor(({_JL_TERMS})
                    / ({JL_OUT_DIM}.0 * (list_dot_product(av, av)
                                         + list_dot_product(bv, bv)
                                         - 2.0 * list_dot_product(av, bv)))
                    * 1e9 + 0.5) AS BIGINT) AS rq
  FROM pairs
)
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(rq) // (COUNT(*) * 1000) AS BIGINT) AS mean_ratio_micro,
       MIN(rq) // 1000 AS min_ratio_micro,
       MAX(rq) // 1000 AS max_ratio_micro
FROM scored
"""
