"""Round-14 batch: drift detection, rank-based paired tests,
concentration/novelty curves for corpus curation, and dedup-quality
audits — the monitoring panels a production training-data pipeline
runs beside the r7–r13 stats families.

- ``cusum_drift_detector`` — per-event-type CUSUM of daily counts in
  exact integers: with D days and type total S, the residual
  D·y_t − S is an exact BIGINT, and the classic one-sided CUSUM with
  zero allowance equals prefix(P_t) minus its running minimum — so
  the statistic is two window functions, no recurrence. The
  changepoint screen that catches slow drifts the per-day anomaly
  gates (events_rate_anomaly) miss.
- ``kendall_tau_daily`` — Kendall's τ-b between every pair of event
  types' daily-count series: exact concordant/discordant/tie counts
  over the day-pair domain (D²/2 pairs per type pair — bounded by
  the CALENDAR, not the data), τ-b via two correctly-rounded sqrts.
  The distribution-free "do these activity streams co-move" gate.
- ``wilcoxon_signed_rank_daily`` — Wilcoxon signed-rank test between
  paired daily series: tie-averaged ranks carried as exact 2×
  integers, tie-corrected variance as the exact integer
  48·Var = 2n(n+1)(2n+1) − Σ(t³−t), z from one sqrt. The paired
  companion to the two-sample tests (anderson_darling_2sample).
- ``lorenz_curve_tokens`` — token-count concentration across
  documents: per-decile cumulative token share + the exact-integer
  Gini Σ(2r−n−1)·t_r / (n·T). The "is the training mix dominated by
  a few huge documents" audit that sizes per-doc caps.
- ``ngram_novelty_score`` — per document, the fraction of its
  3-gram shingles that appear NOWHERE else in the corpus (df = 1):
  high novelty = unique content worth keeping, low = boilerplate/
  near-dup residue. One df aggregation + one equality join.
- ``minhash_estimate_audit`` — for every LSH candidate pair, the
  MinHash similarity ESTIMATE (matching components / K) against the
  exact Jaccard: the estimator-calibration table that says whether
  MINHASH_K is adequate before trusting banding at scale.
- ``dup_cluster_size_histogram`` — distribution of exact-duplicate
  cluster sizes (how MANY copies each duplicated text has): the
  monitoring rollup over dedup_exact that distinguishes "2x
  boilerplate everywhere" from "one 1000x-copied page".

Exactness: the r7+ discipline — integer-cleared numerators, 1e-6 /
1e-3 fixed-point via FLOOR(+0.5) in double (deterministic, both
engines), sqrt only (IEEE correctly-rounded — never log of
data-dependent values), ties broken on ids. Scale shapes documented
per operator.

Reference parity: none — /root/reference is a parse-merge-sort CLI;
this extends SURVEY.md §2.2's text-analysis/dedup rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.dedup import (
    LSH_BANDS,
    MINHASH_K,
    _pair_overlap,
    _SHINGLES_CTE,
    shingle_rows,
    tokens_col,
)
from cgtcalc_data_transformer_spark.operators.timeseries import (
    _GRID_SQL,
    _daily_grid,
)
from cgtcalc_data_transformer_spark.sources.tpch import load_table, scatter

MICRO = 10**6


# ------------------------------------------------------ CUSUM drift
def cusum_drift_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type CUSUM statistics of daily counts (module docstring).

    With P_t = Σ_{s≤t} (D·y_s − S) (note P_D = 0 exactly), the
    one-sided CUSUMs with zero allowance are
    C⁺ = max_t (P_t − min_{s≤t} P_s) and C⁻ = max_t (max_{s≤t} P_s −
    P_t); peak_d is the earliest day attaining C⁺. All integers; the
    only shuffle is the per-type window sort over the day domain.
    """
    g = _daily_grid(spark, sf_dir)
    tot = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("y").alias("s")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = g.join(tot, "event_type").withColumn(
        "p", F.sum(F.col("nd") * F.col("y") - F.col("s")).over(w)
    )
    r = (
        r.withColumn("c_pos", F.col("p") - F.min("p").over(w))
        .withColumn("c_neg", F.max("p").over(w) - F.col("p"))
        .withColumn(
            "c_pos_max",
            F.max("c_pos").over(Window.partitionBy("event_type")),
        )
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.max("nd").alias("n_days"),
            F.max("c_pos").alias("cusum_pos"),
            F.max("c_neg").alias("cusum_neg"),
            F.min(
                F.when(F.col("c_pos") == F.col("c_pos_max"), F.col("d"))
            ).alias("pos_peak_d"),
        )
        .orderBy("event_type")
    )


CUSUM_SQL = f"""
WITH {_GRID_SQL.lstrip()},
tot AS (
  SELECT event_type, COUNT(*) AS nd, CAST(SUM(y) AS BIGINT) AS s
  FROM grid GROUP BY event_type
), p AS (
  SELECT g.event_type, g.d, t.nd,
         SUM(t.nd * g.y - t.s) OVER (
           PARTITION BY g.event_type ORDER BY g.d
           ROWS UNBOUNDED PRECEDING) AS p
  FROM grid g JOIN tot t USING (event_type)
), c AS (
  SELECT event_type, d, nd,
         p - MIN(p) OVER (PARTITION BY event_type ORDER BY d
                          ROWS UNBOUNDED PRECEDING) AS c_pos,
         MAX(p) OVER (PARTITION BY event_type ORDER BY d
                      ROWS UNBOUNDED PRECEDING) - p AS c_neg
  FROM p
), c2 AS (
  SELECT *, MAX(c_pos) OVER (PARTITION BY event_type) AS c_pos_max FROM c
)
SELECT event_type,
       CAST(MAX(nd) AS BIGINT) AS n_days,
       CAST(MAX(c_pos) AS BIGINT) AS cusum_pos,
       CAST(MAX(c_neg) AS BIGINT) AS cusum_neg,
       CAST(MIN(CASE WHEN c_pos = c_pos_max THEN d END) AS BIGINT)
         AS pos_peak_d
FROM c2
GROUP BY event_type
ORDER BY event_type
"""


# ------------------------------------------------- Kendall tau-b
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """τ-b between every (type_a < type_b) pair of daily series
    (module docstring). Day pairs d1 < d2 are a self-join of the
    paired frame on the type pair — D(D−1)/2 rows per pair, bounded
    by the calendar; exact integer concordance counts; τ-b's two
    sqrts are IEEE correctly-rounded, so the milli-quantized value is
    engine-exact."""
    g = _daily_grid(spark, sf_dir)
    paired = (
        g.alias("a")
        .join(g.alias("b"), F.col("a.d") == F.col("b.d"))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.d").alias("d"),
            F.col("a.y").alias("ya"),
            F.col("b.y").alias("yb"),
        )
    )
    pp = (
        paired.alias("x")
        .join(
            paired.alias("y"),
            (F.col("x.type_a") == F.col("y.type_a"))
            & (F.col("x.type_b") == F.col("y.type_b"))
            & (F.col("x.d") < F.col("y.d")),
        )
        .select(
            F.col("x.type_a").alias("type_a"),
            F.col("x.type_b").alias("type_b"),
            (F.col("y.ya") - F.col("x.ya")).alias("da"),
            (F.col("y.yb") - F.col("x.yb")).alias("db"),
        )
    )
    agg = pp.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            ((F.col("da") > 0) & (F.col("db") > 0)).cast("long")
            + ((F.col("da") < 0) & (F.col("db") < 0)).cast("long")
        ).alias("concordant"),
        F.sum(
            ((F.col("da") > 0) & (F.col("db") < 0)).cast("long")
            + ((F.col("da") < 0) & (F.col("db") > 0)).cast("long")
        ).alias("discordant"),
        F.sum(((F.col("da") == 0) & (F.col("db") != 0)).cast("long")).alias(
            "tie_a"
        ),
        F.sum(((F.col("da") != 0) & (F.col("db") == 0)).cast("long")).alias(
            "tie_b"
        ),
        F.sum(((F.col("da") == 0) & (F.col("db") == 0)).cast("long")).alias(
            "tie_both"
        ),
    )
    s = F.col("concordant") - F.col("discordant")
    den_a = F.col("n_pairs") - F.col("tie_a") - F.col("tie_both")
    den_b = F.col("n_pairs") - F.col("tie_b") - F.col("tie_both")
    return agg.select(
        "type_a",
        "type_b",
        "n_pairs",
        "concordant",
        "discordant",
        "tie_a",
        "tie_b",
        "tie_both",
        F.floor(
            s
            * F.lit(1000.0)
            / (F.sqrt(den_a.cast("double")) * F.sqrt(den_b.cast("double")))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("tau_b_milli"),
    ).orderBy("type_a", "type_b")


KENDALL_SQL = f"""
WITH {_GRID_SQL.lstrip()},
paired AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.d AS d, a.y AS ya, b.y AS yb
  FROM grid a JOIN grid b ON a.d = b.d AND a.event_type < b.event_type
), pp AS (
  SELECT x.type_a, x.type_b, y.ya - x.ya AS da, y.yb - x.yb AS db
  FROM paired x JOIN paired y
    ON x.type_a = y.type_a AND x.type_b = y.type_b AND x.d < y.d
), agg AS (
  SELECT type_a, type_b, COUNT(*) AS n_pairs,
         CAST(SUM(CASE WHEN da > 0 AND db > 0 THEN 1 ELSE 0 END)
            + SUM(CASE WHEN da < 0 AND db < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS concordant,
         CAST(SUM(CASE WHEN da > 0 AND db < 0 THEN 1 ELSE 0 END)
            + SUM(CASE WHEN da < 0 AND db > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS discordant,
         CAST(SUM(CASE WHEN da = 0 AND db <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS tie_a,
         CAST(SUM(CASE WHEN da <> 0 AND db = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS tie_b,
         CAST(SUM(CASE WHEN da = 0 AND db = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS tie_both
  FROM pp GROUP BY type_a, type_b
)
SELECT type_a, type_b, CAST(n_pairs AS BIGINT) AS n_pairs,
       concordant, discordant, tie_a, tie_b, tie_both,
       CAST(FLOOR((concordant - discordant) * 1000.0
                  / (sqrt(CAST(n_pairs - tie_a - tie_both AS DOUBLE))
                     * sqrt(CAST(n_pairs - tie_b - tie_both AS DOUBLE)))
                  + 0.5) AS BIGINT) AS tau_b_milli
FROM agg
ORDER BY type_a, type_b
"""


# ------------------------------------------- Wilcoxon signed-rank
def wilcoxon_signed_rank_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank between paired daily series per type pair
    (module docstring). Tie-averaged ranks carried as exact 2×
    integers: 2·avgrank = 2·rank(|d|) + (tiecount − 1) — rank() gives
    the tie group's FIRST row number and the average of first..last
    is (2·first + t − 1)/2. 48·Var = 2n(n+1)(2n+1) − Σ(t³−t) is an
    exact BIGINT; z needs one sqrt."""
    g = _daily_grid(spark, sf_dir)
    diff = (
        g.alias("a")
        .join(g.alias("b"), F.col("a.d") == F.col("b.d"))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            (F.col("a.y") - F.col("b.y")).alias("diff"),
        )
        .filter(F.col("diff") != 0)
        .withColumn("ad", F.abs(F.col("diff")))
    )
    wr = Window.partitionBy("type_a", "type_b").orderBy("ad")
    wt = Window.partitionBy("type_a", "type_b", "ad")
    ranked = diff.withColumn("rk", F.rank().over(wr)).withColumn(
        "tc", F.count(F.lit(1)).over(wt)
    )
    # 2 x average rank of the tie group (exact integer)
    r2 = 2 * F.col("rk") + F.col("tc") - 1
    agg = ranked.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_nonzero"),
        F.sum(F.when(F.col("diff") > 0, r2).otherwise(F.lit(0))).alias(
            "w_plus_x2"
        ),
        F.sum(F.when(F.col("diff") < 0, r2).otherwise(F.lit(0))).alias(
            "w_minus_x2"
        ),
        # Σ(t³−t) over tie groups: each row contributes (t²−1), since
        # the group has t rows summing to t·(t²−1) = t³−t
        F.sum(F.col("tc") * F.col("tc") - 1).alias("tie_term"),
    )
    n = F.col("n_nonzero")
    var48 = 2 * n * (n + 1) * (2 * n + 1) - F.col("tie_term")
    num = (2 * F.col("w_plus_x2") - n * (n + 1)).cast("double")
    return agg.select(
        "type_a",
        "type_b",
        "n_nonzero",
        "w_plus_x2",
        "w_minus_x2",
        "tie_term",
        F.floor(
            num * F.sqrt(F.lit(3.0)) / F.sqrt(var48.cast("double"))
            * F.lit(1000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("z_milli"),
    ).orderBy("type_a", "type_b")


WILCOXON_SQL = f"""
WITH {_GRID_SQL.lstrip()},
diff AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.y - b.y AS diff, abs(a.y - b.y) AS ad
  FROM grid a JOIN grid b ON a.d = b.d AND a.event_type < b.event_type
  WHERE a.y <> b.y
), ranked AS (
  SELECT type_a, type_b, diff,
         RANK() OVER (PARTITION BY type_a, type_b ORDER BY ad) AS rk,
         COUNT(*) OVER (PARTITION BY type_a, type_b, ad) AS tc
  FROM diff
), agg AS (
  SELECT type_a, type_b,
         COUNT(*) AS n_nonzero,
         CAST(SUM(CASE WHEN diff > 0 THEN 2 * rk + tc - 1 ELSE 0 END)
              AS BIGINT) AS w_plus_x2,
         CAST(SUM(CASE WHEN diff < 0 THEN 2 * rk + tc - 1 ELSE 0 END)
              AS BIGINT) AS w_minus_x2,
         CAST(SUM(tc * tc - 1) AS BIGINT) AS tie_term
  FROM ranked GROUP BY type_a, type_b
)
SELECT type_a, type_b, CAST(n_nonzero AS BIGINT) AS n_nonzero,
       w_plus_x2, w_minus_x2, tie_term,
       CAST(FLOOR(CAST(2 * w_plus_x2 - n_nonzero * (n_nonzero + 1) AS DOUBLE)
                  * sqrt(3.0)
                  / sqrt(CAST(2 * n_nonzero * (n_nonzero + 1)
                              * (2 * n_nonzero + 1) - tie_term AS DOUBLE))
                  * 1000.0 + 0.5) AS BIGINT) AS z_milli
FROM agg
ORDER BY type_a, type_b
"""


# --------------------------------------------------- Lorenz / Gini
def lorenz_curve_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-concentration Lorenz curve + Gini (module docstring).

    One global rank window over docs (at 100 TB the decile CUTOFFS
    would come from an approx-quantile sketch broadcast back — one
    agg, no full sort; ntile keeps the semantics the oracle replays
    exactly at gate scale — the ppl_bucket_ccnet precedent). Gini =
    Σ(2r−n−1)·t_r / (n·T): numerator and denominator exact BIGINTs,
    non-negative, so integer division is floor on both engines.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.size(tokens_col(F.col("text"))).cast("long").alias("t")
    )
    wr = Window.orderBy("t", "doc_id")
    ranked = toks.withColumn("r", F.row_number().over(wr)).withColumn(
        "decile", F.ntile(10).over(wr)
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("tt"),
        F.sum((2 * F.col("r") - 1) * F.col("t")).alias("wsum"),
    )
    per_dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("t").alias("tok_sum")
    )
    wd = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_dec.withColumn("cum_tokens", F.sum("tok_sum").over(wd))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_docs",
            "tok_sum",
            "cum_tokens",
            F.expr(f"cum_tokens * {MICRO} div tt").alias("cum_share_micro"),
            # Σ(2r−1)t − (n+1)T = Σ(2r−n−1)t ≥ 0 ⇒ floor int div OK
            F.expr(
                f"(wsum - (n + 1) * tt) * {MICRO} div (n * tt)"
            ).alias("gini_micro"),
        )
        .orderBy("decile")
    )


LORENZ_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                              x -> x <> '')) AS BIGINT) AS t
  FROM documents
), ranked AS (
  SELECT doc_id, t,
         ROW_NUMBER() OVER (ORDER BY t, doc_id) AS r,
         NTILE(10) OVER (ORDER BY t, doc_id) AS decile
  FROM toks
), tot AS (
  SELECT COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS tt,
         CAST(SUM((2 * r - 1) * t) AS BIGINT) AS wsum
  FROM ranked
), per_dec AS (
  SELECT decile, COUNT(*) AS n_docs, CAST(SUM(t) AS BIGINT) AS tok_sum
  FROM ranked GROUP BY decile
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_docs AS BIGINT) AS n_docs,
       tok_sum,
       CAST(SUM(tok_sum) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_tokens,
       CAST(SUM(tok_sum) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
            * 1000000 // tt AS BIGINT) AS cum_share_micro,
       CAST((wsum - (n + 1) * tt) * 1000000 // (n * tt) AS BIGINT)
         AS gini_micro
FROM per_dec CROSS JOIN tot
ORDER BY decile
"""


# ------------------------------------------------- n-gram novelty
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of corpus-unique shingles (module docstring).
    One df aggregation over exploded shingles + one equality join
    back; docs with no shingles (< 3 tokens) emit no row, matching
    the shingle-domain semantics of the dedup family."""
    docs = scatter(load_table(spark, sf_dir, "documents"))
    sh = shingle_rows(docs)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            F.expr(f"n_unique * {MICRO} div n_shingles").alias(
                "novelty_micro"
            ),
        )
        .orderBy("doc_id")
    )


NOVELTY_SQL = (
    _SHINGLES_CTE
    + """
, exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
), dfc AS (
  SELECT shingle, COUNT(*) AS df FROM exploded GROUP BY shingle
)
SELECT e.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS novelty_micro
FROM exploded e JOIN dfc d USING (shingle)
GROUP BY e.doc_id
ORDER BY e.doc_id
"""
)


# -------------------------------------------- MinHash estimate audit
def minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimate vs exact Jaccard per LSH candidate pair
    (module docstring). Reuses dedup_minhash_lsh's signature/banding
    machinery shapes: signature = one groupBy of md5 mins; candidates
    = one equality join on (band, bucket); exact verify via the
    shared set-array ``_pair_overlap``. est_micro uses FLOOR int
    division (non-negative); the error column is milli-quantized."""
    docs = scatter(load_table(spark, sf_dir, "documents"))
    sh = shingle_rows(docs).cache()
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.col("shingle"), F.lit(f"#seed{k}")))
            ).alias(f"h{k}")
            for k in range(MINHASH_K)
        ]
    )
    rows_per_band = MINHASH_K // LSH_BANDS
    banded = sig.select(
        "doc_id",
        *[F.col(f"h{k}") for k in range(MINHASH_K)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"h{b * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", *[f"h{k}" for k in range(MINHASH_K)], "bb.band_idx", "bb.bucket")
    cands = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[
                (F.col(f"a.h{k}") == F.col(f"b.h{k}"))
                .cast("long")
                .alias(f"m{k}")
                for k in range(MINHASH_K)
            ],
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = cands.select(
        "doc_a",
        "doc_b",
        sum(
            (F.col(f"m{k}") for k in range(MINHASH_K)), F.lit(0)
        ).alias("est_matches"),
    )
    ov = _pair_overlap(est.select("doc_a", "doc_b"), sh)
    out = est.join(ov, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "est_matches",
        F.expr(f"est_matches * {MICRO} div {MINHASH_K}").alias("est_micro"),
        F.expr(
            f"inter * {MICRO} div (n_a + n_b - inter)"
        ).alias("jaccard_micro"),
    )
    return out.select(
        "doc_a",
        "doc_b",
        "est_matches",
        "est_micro",
        "jaccard_micro",
        F.abs(F.col("est_micro") - F.col("jaccard_micro")).alias(
            "abs_err_micro"
        ),
    ).orderBy("doc_a", "doc_b")


_MINHASH_EST_SIG = ",\n".join(
    f"         MIN(md5(shingle || '#seed{k}')) AS h{k}"
    for k in range(MINHASH_K)
)
_MINHASH_EST_BANDS = "\n  UNION ALL\n".join(
    "  SELECT doc_id, {b} AS band_idx, md5({cat}) AS bucket, {hs} FROM sig".format(
        b=b,
        cat=" || '|' || ".join(
            f"h{b * (MINHASH_K // LSH_BANDS) + r}"
            for r in range(MINHASH_K // LSH_BANDS)
        ),
        hs=", ".join(f"h{k}" for k in range(MINHASH_K)),
    )
    for b in range(LSH_BANDS)
)
MINHASH_EST_SQL = (
    _SHINGLES_CTE
    + f"""
, nonempty AS (
  SELECT doc_id, shingles FROM shingled WHERE len(shingles) > 0
), exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM nonempty
), sig AS (
  SELECT doc_id,
{_MINHASH_EST_SIG}
  FROM exploded GROUP BY doc_id
), banded AS (
{_MINHASH_EST_BANDS}
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         {", ".join(f"CASE WHEN a.h{k} = b.h{k} THEN 1 ELSE 0 END AS m{k}" for k in range(MINHASH_K))}
  FROM banded a
  JOIN banded b ON a.band_idx = b.band_idx AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
), est AS (
  SELECT doc_a, doc_b,
         CAST({" + ".join(f"m{k}" for k in range(MINHASH_K))} AS BIGINT)
           AS est_matches
  FROM cands
), sizes AS (
  SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM nonempty
), inter AS (
  SELECT e.doc_a, e.doc_b, CAST(COUNT(*) AS BIGINT) AS i
  FROM est e
  JOIN exploded xa ON xa.doc_id = e.doc_a
  JOIN exploded xb ON xb.doc_id = e.doc_b AND xb.shingle = xa.shingle
  GROUP BY e.doc_a, e.doc_b
)
SELECT e.doc_a, e.doc_b, e.est_matches,
       CAST(e.est_matches * {MICRO} // {MINHASH_K} AS BIGINT) AS est_micro,
       CAST(COALESCE(i.i, 0) * {MICRO} // (sa.n_sh + sb.n_sh - COALESCE(i.i, 0))
            AS BIGINT) AS jaccard_micro,
       CAST(abs(CAST(e.est_matches * {MICRO} // {MINHASH_K} AS BIGINT)
                - CAST(COALESCE(i.i, 0) * {MICRO}
                       // (sa.n_sh + sb.n_sh - COALESCE(i.i, 0)) AS BIGINT))
            AS BIGINT) AS abs_err_micro
FROM est e
LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN sizes sa ON sa.doc_id = e.doc_a
JOIN sizes sb ON sb.doc_id = e.doc_b
ORDER BY e.doc_a, e.doc_b
"""
)


# --------------------------------------- dup cluster size histogram
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of exact-duplicate cluster sizes (module docstring).
    Two aggregations; output bounded by the distinct cluster sizes."""
    docs = scatter(load_table(spark, sf_dir, "documents"))
    clusters = docs.groupBy(F.md5(F.col("text")).alias("h")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        clusters.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("sz").alias("cluster_size"),
            "n_clusters",
            (F.col("sz") * F.col("n_clusters")).alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


DUP_HISTOGRAM_SQL = """
WITH clusters AS (
  SELECT md5(text) AS h, COUNT(*) AS sz FROM documents GROUP BY md5(text)
)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(sz * COUNT(*) AS BIGINT) AS n_docs
FROM clusters
GROUP BY sz
ORDER BY cluster_size
"""
