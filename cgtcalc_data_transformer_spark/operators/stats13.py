"""Round-13 batch: resampling inference, linkage-weight estimation,
calibration/label-noise audits, tokenizer fertility, and two
forecast/trend diagnostics a production pipeline runs beside the
existing panels.

- ``permutation_test_revenue`` — exact-arithmetic permutation test of
  the md5 A/B split's mean-order-value difference: 64 deterministic
  pseudo-permutations drawn from one md5 per customer (bits of the
  128-bit digest), each a full sign-assignment of the corpus; p-value
  = (1 + #extreme)/(K+1) (Phipson & Smyth 2010's add-one rule). The
  nonparametric companion to ab_test_ztest for heavy-tailed revenue.
- ``spiegelhalter_z_calibration`` — Spiegelhalter (1986) Z test of
  nearest-centroid confidence calibration: Z = Σ(o−p)(1−2p) /
  √Σ(1−2p)²p(1−p), the hypothesis-test companion to the descriptive
  ece_calibration / brier_decomposition rows (same scoring core).
- ``confident_learning_noise_audit`` — Northcutt et al. 2021
  confident-learning joint: count matrix C[noisy, pred] over samples
  whose class-confidence clears the class's mean self-confidence
  threshold — the label-noise-rate estimate that decides whether a
  labeled corpus needs cleaning before training.
- ``tokenizer_fertility_audit`` — tokens-per-word / chars-per-token
  by language under the repo's own LEARNED BPE merges (r14; the
  fixed 4-char-chunk stand-in survives as the labelled
  ``fertility_chunk_micro`` comparison column): the fertility table
  that decides per-language token budgets for a multilingual mix.
- ``theil_u_forecast`` — Theil's U of an MA(3) day-ahead forecast
  against the naive carry-forward, per event type: U < 1 means the
  model earns its keep; exact integer numerators (×3-cleared).
- ``seasonal_mann_kendall`` — Hirsch & Slack (1984) seasonal MK trend
  test (weekday-stratified sign statistic with tie-corrected
  variance): the distribution-free trend gate robust to the weekly
  cycle that plain mann_kendall_trend conflates with trend.
- ``engle_granger_cointegration`` — Engle & Granger (1987) two-step:
  OLS of each event type's daily counts on the view series, then a
  Dickey-Fuller t on the integer-cleared, mean-normalized residuals.
  Says whether two activity series share a long-run equilibrium (so
  one can monitor their SPREAD) or merely co-trend.
- ``fellegi_sunter_em`` — Fellegi & Sunter (1969) record-linkage
  match weights fit by EM (Winkler 1988) over the sorted-neighborhood
  comparison vectors of linkage.py's corruption scenario: per-pattern
  match posterior and m/u likelihood ratio — the principled weights
  behind record_linkage's ad-hoc distance threshold.

Scale shapes: the permutation test is ONE pass over orders with 130
map-side-combinable conditional aggregates (no explode — a 64-way
row inflation would put 64× the rows through the hash-agg at 100 TB);
the calibration/noise audits reuse the bounded |labels|·dim centroid
machinery; fertility is one map-side-combinable rollup; the
trend/forecast/cointegration ops run on the bounded |types|×|days|
daily grid (day-domain cost, independent of event volume); FS-EM
aggregates pairs to ≤8 pattern counts and iterates on that bounded
frame (an 8-row driver collect — the platt/pq bounded-state
discipline), with the pair generation linear via sorted-neighborhood
blocking (never all-pairs).

Engine-exactness: every cross-row float sum is either an exact
DECIMAL/BIGINT or per-term floor-quantized to a fixed grid first;
signed quantities quantize via floor(|x|·s+½)·sign(x) (Spark round()
is half-away, Python banker's — avoided entirely); EM parameters are
carried as 1e-9 integers between iterations so both engines rebuild
identical doubles; integer→double divisions stay below 2^53 at any
realistic pattern-count scale (documented at fellegi_sunter_em).

Reference parity: none — /root/reference is a parse-merge-sort CLI
(index.js:48-130); these extend SURVEY.md §2.2's statistics rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.embedding_ops import (
    ECE_SC,
    _centroid_cosines,
    _nearest_centroid_scores,
)
from cgtcalc_data_transformer_spark.operators.linkage import (
    DIRTY_PCT,
    DROP_POS,
    MAX_EDIT,
    SNM_WINDOW,
)
from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket
from cgtcalc_data_transformer_spark.operators.stats10 import _PER_VEC_SQL
from cgtcalc_data_transformer_spark.operators.timeseries import (
    _GRID_SQL,
    _daily_grid,
)
from cgtcalc_data_transformer_spark.sources.tpch import load_table

MICRO = 10**6
NANO = 10**9
_D38 = "decimal(38,0)"
T_CRIT_5PCT = 1.96
# Engle-Granger 5% critical value, 2 variables with constant
# (MacKinnon 1991 asymptotic)
EG_CRIT_5PCT = -3.37

K_PERM = 64          # pseudo-permutations (md5 digest bits)
SUBWORD_LEN = 4      # fixed-chunk BPE stand-in
FS_ITERS = 4         # EM iterations (unrolled identically in SQL)


def _squant(x: Column, scale: float) -> Column:
    """Signed fixed-grid quantization: floor(|x|·s + ½)·sign(x) —
    identical on Spark/DuckDB/Python for any sign (the repo's
    copysign recipe; plain floor(x·s+½) skews negatives)."""
    return (
        F.floor(F.abs(x) * F.lit(scale) + F.lit(0.5))
        * F.when(x < 0, F.lit(-1)).otherwise(F.lit(1))
    ).cast("long")


def _squant_sql(expr: str, scale: str) -> str:
    return (
        f"CAST(floor(abs({expr}) * {scale} + 0.5) "
        f"* (CASE WHEN ({expr}) < 0 THEN -1 ELSE 1 END) AS BIGINT)"
    )


# ------------------------------------------------- permutation test
def permutation_test_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test of mean order value between the md5 A/B arms.

    The observed split is ab_test_ztest's rule (md5 bucket % 2); the
    64 permutations re-assign every CUSTOMER by one bit of
    md5(custkey || ':perm') — all 64 derive from a single digest, so
    the whole test is ONE scan of orders with 2+2·64 conditional
    aggregates (map-side combinable; no row inflation, no shuffle
    beyond the final 1-row combine). Sums are exact DECIMAL(15,2);
    each mean difference is two exact-decimal→double divisions;
    |diff| is quantized to 1e-6 before comparison so the extreme
    count is integer-exact on both engines.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").cast("decimal(15,2)").alias("p"),
    )
    h = F.md5(F.concat(F.col("ck").cast("string"), F.lit(":perm")))
    rows = o.select(
        "p",
        F.pmod(hash_bucket(F.col("ck")), F.lit(2)).alias("arm"),
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("w1"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("w2"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("p").alias("s"),
        F.sum(F.when(F.col("arm") == 1, F.col("p"))).alias("s_obs"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_obs"),
    ]
    for k in range(K_PERM):
        word = F.col("w1") if k < 32 else F.col("w2")
        bit = F.shiftright(word, k % 32).bitwiseAND(F.lit(1))
        aggs.append(F.sum(F.when(bit == 1, F.col("p"))).alias(f"s{k}"))
        aggs.append(F.sum((bit == 1).cast("long")).alias(f"n{k}"))
    flat = rows.agg(*aggs)

    def diff(s1: Column, n1: Column) -> Column:
        return s1.cast("double") / n1.cast("double") - (
            F.col("s") - s1
        ).cast("double") / (F.col("n") - n1).cast("double")

    def qabs(x: Column) -> Column:
        return F.floor(F.abs(x) * F.lit(float(MICRO)) + F.lit(0.5)).cast("long")

    obs = diff(F.col("s_obs"), F.col("n_obs"))
    extreme = None
    for k in range(K_PERM):
        hit = (qabs(diff(F.col(f"s{k}"), F.col(f"n{k}"))) >= qabs(obs)).cast(
            "long"
        )
        extreme = hit if extreme is None else extreme + hit
    return flat.select(
        F.col("n").alias("n_orders"),
        F.lit(K_PERM).cast("long").alias("n_perm"),
        _squant(obs, float(MICRO)).alias("obs_diff_micro"),
        extreme.alias("n_extreme"),
        F.floor((extreme + 1) * F.lit(MICRO) / F.lit(K_PERM + 1))
        .cast("long")
        .alias("p_micro"),
    )


def _perm_sql() -> str:
    return f"""
WITH o AS (
  SELECT o_custkey AS ck, CAST(o_totalprice AS DECIMAL(15,2)) AS p
  FROM orders
), tagged AS (
  SELECT p,
         ('0x' || substr(md5(ck::VARCHAR), 1, 8))::UBIGINT::BIGINT
           % 100 % 2 AS arm,
         ('0x' || substr(md5(ck::VARCHAR || ':perm'), 1, 8))::UBIGINT AS w1,
         ('0x' || substr(md5(ck::VARCHAR || ':perm'), 9, 8))::UBIGINT AS w2
  FROM o
), base AS (
  SELECT COUNT(*) AS n, SUM(p) AS s,
         SUM(CASE WHEN arm = 1 THEN p END) AS s_obs,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_obs
  FROM tagged
), perm AS (
  SELECT k,
         SUM(CASE WHEN b = 1 THEN p END) AS s1,
         CAST(SUM(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM (
    SELECT p, k,
           CASE WHEN k < 32 THEN (w1 >> k) & 1
                ELSE (w2 >> (k - 32)) & 1 END AS b
    FROM tagged CROSS JOIN range({K_PERM}) t(k)
  ) GROUP BY k
), diffs AS (
  SELECT CAST(floor(abs(CAST(p.s1 AS DOUBLE) / CAST(p.n1 AS DOUBLE)
                        - CAST(b.s - p.s1 AS DOUBLE)
                          / CAST(b.n - p.n1 AS DOUBLE)) * {MICRO} + 0.5)
              AS BIGINT) AS adiff
  FROM perm p CROSS JOIN base b
), obs AS (
  SELECT n,
         CAST(s_obs AS DOUBLE) / CAST(n_obs AS DOUBLE)
           - CAST(s - s_obs AS DOUBLE) / CAST(n - n_obs AS DOUBLE) AS d
  FROM base
), ext AS (
  SELECT CAST(SUM(CASE WHEN adiff >=
                (SELECT CAST(floor(abs(d) * {MICRO} + 0.5) AS BIGINT) FROM obs)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM diffs
)
SELECT o.n AS n_orders,
       CAST({K_PERM} AS BIGINT) AS n_perm,
       {_squant_sql("o.d", str(MICRO))} AS obs_diff_micro,
       e.n_extreme,
       CAST((e.n_extreme + 1) * {MICRO} // {K_PERM + 1} AS BIGINT) AS p_micro
FROM obs o CROSS JOIN ext e
"""


PERMUTATION_TEST_SQL = _perm_sql()


# ------------------------------------------- Spiegelhalter Z test
def spiegelhalter_z_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spiegelhalter (1986) calibration Z over the nearest-centroid
    scores: with p̂ the (clamped-to-[0,1]) confidence and o the 0/1
    outcome, Z = Σ(o−p̂)(1−2p̂) / √Σ(1−2p̂)²p̂(1−p̂) ~ N(0,1) under
    perfect calibration. Confidences are exact 1e-6 rationals, so
    both the numerator and the variance are exact integer sums (each
    term ≤ 1e24 — DECIMAL(38,0) holds ~10¹³ rows) with ONE final
    double division. Clamping matters only for the (empirically
    absent) negative-cosine confidences, where p̂(1−p̂)=0 terms
    contribute nothing."""
    pv = _nearest_centroid_scores(spark, sf_dir)
    S = F.lit(ECE_SC)
    c = F.least(F.lit(ECE_SC).cast("long"), F.greatest(F.lit(0).cast("long"), F.col("conf_i")))
    one_2p = (S - 2 * c).cast(_D38)
    num_t = (F.col("correct") * S - c).cast(_D38) * one_2p
    den_t = one_2p * one_2p * c.cast(_D38) * (S - c).cast(_D38)
    tot = pv.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(num_t).alias("num"),
        F.sum(den_t).alias("den"),
    )
    z = F.when(
        F.col("den") > 0,
        F.col("num").cast("double") / F.sqrt(F.col("den").cast("double")),
    ).otherwise(F.lit(0.0))
    return tot.select(
        "n",
        _squant(z, float(MICRO)).alias("z_micro"),
        (F.abs(z) > F.lit(T_CRIT_5PCT)).alias("miscalibrated"),
    )


SPIEGELHALTER_SQL = f"""
WITH {_PER_VEC_SQL}, clamped AS (
  SELECT LEAST({ECE_SC}, GREATEST(0, conf_i)) AS c, correct FROM flat
), tot AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(correct * {ECE_SC} - c AS HUGEINT)
                  * ({ECE_SC} - 2 * c)) AS HUGEINT) AS num,
         CAST(SUM(CAST({ECE_SC} - 2 * c AS HUGEINT)
                  * ({ECE_SC} - 2 * c) * c * ({ECE_SC} - c))
              AS HUGEINT) AS den
  FROM clamped
)
SELECT n,
       {_squant_sql(
           "CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)) ELSE 0.0 END",
           str(MICRO),
       )} AS z_micro,
       abs(CASE WHEN den > 0
                THEN CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE))
                ELSE 0.0 END) > {T_CRIT_5PCT} AS miscalibrated
FROM tot
"""


# ------------------------------------- confident-learning noise audit
def confident_learning_noise_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Confident-learning count matrix C[noisy label, predicted
    label] (Northcutt, Jiang & Chuang 2021): a sample x with noisy
    label ỹ counts toward (ỹ, ŷ) when its confidence toward ŷ clears
    the class threshold t_ŷ = mean self-confidence of class ŷ, with
    ŷ the argmax among clearing classes. Off-diagonal mass estimates
    the label-noise rate.

    Thresholds stay EXACT rationals: eligibility is the integer
    cross-multiplication cos_i·n_j ≥ Σconf_j (never a divided mean);
    argmax is the max(struct) recipe shared with ece_calibration; the
    output is the bounded |labels|² matrix with 1e-6 joint shares.
    """
    cc = _centroid_cosines(spark, sf_dir)
    thr = (
        cc.filter(F.col("label") == F.col("clabel"))
        .groupBy("clabel")
        .agg(F.sum("cos_i").alias("tsum"), F.count(F.lit(1)).alias("tn"))
    )
    elig = cc.join(F.broadcast(thr), "clabel").filter(
        F.col("cos_i") * F.col("tn") >= F.col("tsum")
    )
    pred = (
        elig.select(
            "vec_id",
            "label",
            F.struct(
                F.col("cos_i").alias("ci"), (-F.col("clabel")).alias("nl")
            ).alias("s"),
        )
        .groupBy("vec_id", "label")
        .agg(F.max("s").alias("m"))
        .select("vec_id", "label", (-F.col("m.nl")).alias("pred"))
    )
    # CACHED (r14 plan audit): tot + the crossJoin branch reference
    # mat 2x and each re-ran the whole eligibility/argmax scoring
    # chain (7 embeddings scans,
    # plans/r14/confident_learning_noise_audit_before.txt); the frame
    # is the bounded |labels|² matrix (guide §2.4).
    mat = (
        pred.groupBy(
            F.col("label").alias("noisy_label"),
            F.col("pred").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).alias("n_confident"))
        .cache()
    )
    tot = mat.agg(F.sum("n_confident").alias("n_total"))
    return (
        mat.crossJoin(F.broadcast(tot))
        .select(
            "noisy_label",
            "pred_label",
            "n_confident",
            F.floor(
                F.col("n_confident") * F.lit(MICRO) / F.col("n_total")
            )
            .cast("long")
            .alias("joint_micro"),
            (F.col("noisy_label") != F.col("pred_label")).alias("off_diagonal"),
        )
        .orderBy("noisy_label", "pred_label")
    )


_SCORED_PREFIX = _PER_VEC_SQL.split("), per_vec AS (")[0] + ")"

CONFIDENT_LEARNING_SQL = f"""
WITH {_SCORED_PREFIX}, cosq AS (
  SELECT vec_id, label, clabel,
         CAST(floor(dot_i / sqrt(CAST(cc_i AS DOUBLE) * CAST(xx_i AS DOUBLE))
                    * {ECE_SC} + 0.5) AS BIGINT) AS cos_i
  FROM scored
), thr AS (
  SELECT clabel, CAST(SUM(cos_i) AS BIGINT) AS tsum,
         COUNT(*) AS tn
  FROM cosq WHERE label = clabel GROUP BY clabel
), elig AS (
  SELECT c.vec_id, c.label, c.clabel, c.cos_i
  FROM cosq c JOIN thr t USING (clabel)
  WHERE c.cos_i * t.tn >= t.tsum
), pred0 AS (
  SELECT vec_id, label,
         MAX(struct_pack(ci := cos_i, nl := -clabel)) AS m
  FROM elig GROUP BY vec_id, label
), pred AS (
  SELECT vec_id, label, -m.nl AS pred FROM pred0
), mat AS (
  SELECT label AS noisy_label, pred AS pred_label, COUNT(*) AS n_confident
  FROM pred GROUP BY 1, 2
)
SELECT noisy_label, pred_label, n_confident,
       CAST(n_confident * {MICRO} // (SELECT SUM(n_confident) FROM mat)
            AS BIGINT) AS joint_micro,
       noisy_label <> pred_label AS off_diagonal
FROM mat
ORDER BY noisy_label, pred_label
"""


# ---------------------------------------------- tokenizer fertility
def tokenizer_fertility_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens-per-word (fertility) and chars-per-token by language,
    measured with the repo's OWN learned BPE tokenizer (r14, VERDICT
    r13 item 4 — the r13 version chunked words into fixed
    {SUBWORD_LEN}-char pieces, a stand-in whose numbers answered a
    question nobody asks; that series survives as the explicitly
    labelled ``fertility_chunk_micro`` comparison column).

    Word stream and merges are exactly ``bpe_apply``'s: normalized
    words (``tokens_col``), merge rules from the shared
    ``_learn_bpe_rules`` loop (bounded driver state, learned at
    plan-build — see bench BUILD_TIME_NOTES), applied as
    {{BPE_MERGE_ROUNDS}} chained lookaround-free ``regexp_replace``
    column expressions — zero Python in the hot path. Fertility here
    aggregates that per-word token count BY LANGUAGE, the table that
    sets per-language token budgets for a multilingual mix and shows
    which languages the learned vocabulary serves worst.

    The DuckDB oracle RE-LEARNS the rules (shared
    ``bpe_learn_prefix_ctes`` recurrence — no literals smuggled) and
    re-applies them, so the hash gate covers learning + application +
    rollup end-to-end. n_docs counts ALL documents per language
    (docs-level agg left-joined to the word-level agg); ratios are
    integer-division 1e-6 fixed-point with GREATEST(1) denominators
    so a wordless language degrades identically on both engines."""
    from cgtcalc_data_transformer_spark.operators.corpus_lm import (
        _learn_bpe_rules,
    )
    from cgtcalc_data_transformer_spark.operators.dedup import tokens_col

    rules = _learn_bpe_rules(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    lw = docs.select("lang", F.explode(tokens_col(F.col("text"))).alias("w"))
    # r15 (guide §1.2 "per-task work", §2.3 "aggregate before you
    # shuffle"): the merge regexes ran on EVERY word OCCURRENCE —
    # 3 chained regexp_replace + split over the full token stream.
    # Token/char/chunk counts depend only on the WORD, so aggregate
    # to the (lang, word) vocabulary first (map-side-combinable
    # count) and run the regex chain once per distinct word per
    # language; the per-language sums weight each distinct word by
    # its multiplicity k. Exact: all terms are int64 sums regrouped
    # by word — associative integer arithmetic, same totals.
    lwc = lw.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("k"))
    sym = F.concat(F.lit("  "), F.regexp_replace(F.col("w"), "(.)", "$1  "))
    for _, a, b, _, _ in rules:
        sym = F.regexp_replace(sym, f" {a}  {b} ", f" {a + b} ")
    per_word = lwc.select(
        "lang",
        F.col("k"),
        F.length("w").cast("long").alias("c"),
        F.size(F.split(F.trim(sym), "  ")).cast("long").alias("t"),
        F.floor(
            (F.length("w").cast("long") + F.lit(SUBWORD_LEN - 1))
            / F.lit(SUBWORD_LEN)
        )
        .cast("long")
        .alias("tc"),
    )
    wagg = per_word.groupBy("lang").agg(
        F.sum("k").alias("n_words"),
        F.sum(F.col("c") * F.col("k")).alias("n_chars"),
        F.sum(F.col("t") * F.col("k")).alias("n_tokens"),
        F.sum(F.col("tc") * F.col("k")).alias("n_chunk"),
    )
    dl = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    agg = dl.join(wagg, "lang", "left").select(
        "lang",
        "n_docs",
        *[
            F.coalesce(F.col(c), F.lit(0).cast("long")).alias(c)
            for c in ("n_words", "n_chars", "n_tokens", "n_chunk")
        ],
    )
    safe_w = F.greatest(F.col("n_words"), F.lit(1).cast("long"))
    safe_t = F.greatest(F.col("n_tokens"), F.lit(1).cast("long"))
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_tokens",
        F.floor(F.col("n_tokens") * F.lit(MICRO) / safe_w)
        .cast("long")
        .alias("fertility_micro"),
        F.floor(F.col("n_chars") * F.lit(MICRO) / safe_t)
        .cast("long")
        .alias("chars_per_token_micro"),
        F.floor(F.col("n_chunk") * F.lit(MICRO) / safe_w)
        .cast("long")
        .alias("fertility_chunk_micro"),
    ).orderBy("lang")


def _tokenizer_fertility_sql() -> str:
    from cgtcalc_data_transformer_spark.operators.corpus_lm import (
        BPE_MERGE_ROUNDS,
        bpe_learn_prefix_ctes,
    )

    sql = bpe_learn_prefix_ctes()
    sql += r"""
, lw AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
), ls0 AS (
  SELECT lang, length(w) AS n_chars,
         '  ' || regexp_replace(w, '(.)', '\1  ', 'g') AS s,
"""
    sql += (
        f"         (length(w) + {SUBWORD_LEN - 1}) // {SUBWORD_LEN}"
        " AS chunk_t\n  FROM lw\n)"
    )
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        sql += f"""
, ls{r} AS (
  SELECT lang, n_chars, chunk_t,
         regexp_replace(s, ' ' || t.a || '  ' || t.b || ' ', ' ' || t.a || t.b || ' ', 'g') AS s
  FROM ls{r - 1} CROSS JOIN top{r} t
)"""
    sql += f"""
, wagg AS (
  SELECT lang, COUNT(*) AS n_words,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         CAST(SUM(len(string_split(trim(s), '  '))) AS BIGINT) AS n_tokens,
         CAST(SUM(chunk_t) AS BIGINT) AS n_chunk
  FROM ls{BPE_MERGE_ROUNDS} GROUP BY lang
), dl AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
)
SELECT dl.lang AS lang, n_docs,
       COALESCE(n_words, 0) AS n_words,
       COALESCE(n_tokens, 0) AS n_tokens,
       CAST(COALESCE(n_tokens, 0) * {MICRO}
            // GREATEST(COALESCE(n_words, 0), 1) AS BIGINT)
         AS fertility_micro,
       CAST(COALESCE(n_chars, 0) * {MICRO}
            // GREATEST(COALESCE(n_tokens, 0), 1) AS BIGINT)
         AS chars_per_token_micro,
       CAST(COALESCE(n_chunk, 0) * {MICRO}
            // GREATEST(COALESCE(n_words, 0), 1) AS BIGINT)
         AS fertility_chunk_micro
FROM dl LEFT JOIN wagg ON dl.lang = wagg.lang
ORDER BY lang
"""
    return sql


TOKENIZER_FERTILITY_SQL = _tokenizer_fertility_sql()


# --------------------------------------------------- Theil's U
def theil_u_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U of an MA(3) one-day-ahead forecast vs the naive
    carry-forward, per event type, on the zero-filled daily grid:
    U = √(Σe_model² / Σe_naive²). Errors are ×3-cleared exact
    integers (3y_t − Σ₃ lags; 3(y_t − y_{t−1})), so both sums are
    exact and U is one double division+sqrt. Day-domain cost."""
    g = _daily_grid(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    rows = g.select(
        "event_type",
        "d",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 2).over(w).alias("y2"),
        F.lag("y", 3).over(w).alias("y3"),
    ).filter(F.col("y3").isNotNull())
    em = 3 * F.col("y") - (F.col("y1") + F.col("y2") + F.col("y3"))
    en = 3 * (F.col("y") - F.col("y1"))
    agg = rows.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum((em.cast(_D38) * em.cast(_D38))).alias("sse_model"),
        F.sum((en.cast(_D38) * en.cast(_D38))).alias("sse_naive"),
    )
    u = F.sqrt(
        F.col("sse_model").cast("double") / F.col("sse_naive").cast("double")
    )
    return agg.select(
        "event_type",
        "n_eval",
        F.col("sse_model").cast("long").alias("sse_model"),
        F.col("sse_naive").cast("long").alias("sse_naive"),
        F.when(
            F.col("sse_naive") > 0,
            F.floor(u * F.lit(float(MICRO)) + F.lit(0.5)).cast("long"),
        )
        .otherwise(F.lit(-1).cast("long"))
        .alias("theil_u_micro"),
        (
            (F.col("sse_naive") > 0)
            & (F.col("sse_model") < F.col("sse_naive"))
        ).alias("model_beats_naive"),
    ).orderBy("event_type")


THEIL_U_SQL = f"""
WITH {_GRID_SQL}, lagged AS (
  SELECT event_type, d, y,
         LAG(y, 1) OVER w AS y1,
         LAG(y, 2) OVER w AS y2,
         LAG(y, 3) OVER w AS y3
  FROM grid
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
), agg AS (
  SELECT event_type, COUNT(*) AS n_eval,
         CAST(SUM(CAST(3 * y - (y1 + y2 + y3) AS HUGEINT)
                  * (3 * y - (y1 + y2 + y3))) AS BIGINT) AS sse_model,
         CAST(SUM(CAST(3 * (y - y1) AS HUGEINT)
                  * (3 * (y - y1))) AS BIGINT) AS sse_naive
  FROM lagged WHERE y3 IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n_eval, sse_model, sse_naive,
       CASE WHEN sse_naive > 0
            THEN CAST(floor(sqrt(CAST(sse_model AS DOUBLE)
                                 / CAST(sse_naive AS DOUBLE))
                            * {MICRO} + 0.5) AS BIGINT)
            ELSE CAST(-1 AS BIGINT) END AS theil_u_micro,
       sse_naive > 0 AND sse_model < sse_naive AS model_beats_naive
FROM agg
ORDER BY event_type
"""


# -------------------------------------------- seasonal Mann-Kendall
def seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hirsch-Slack seasonal Mann-Kendall on the daily grid with
    weekday seasons: S = Σ_s Σ_{i<j in s} sign(y_j − y_i), variance
    Σ_s [n_s(n_s−1)(2n_s+5) − Σ_t t(t−1)(2t+5)]/18 (tie-corrected),
    Z with continuity correction. The pair join is an equality join
    on (type, season) filtered to j>i — day-domain bounded (the
    |days/7|² per-season pair count is a constant of the horizon,
    not the data volume)."""
    g = _daily_grid(spark, sf_dir).select(
        "event_type", "d", "y", F.pmod(F.col("d"), F.lit(7)).alias("s")
    )
    a = g.select("event_type", "s", F.col("d").alias("da"), F.col("y").alias("ya"))
    b = g.select("event_type", "s", F.col("d").alias("db"), F.col("y").alias("yb"))
    sgn = F.when(F.col("yb") > F.col("ya"), 1).when(
        F.col("yb") < F.col("ya"), -1
    ).otherwise(0)
    s_stat = (
        a.join(b, ["event_type", "s"])
        .filter(F.col("db") > F.col("da"))
        .groupBy("event_type")
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    ns = g.groupBy("event_type", "s").agg(F.count(F.lit(1)).alias("n_s"))
    var_n = ns.groupBy("event_type").agg(
        F.sum(
            F.col("n_s") * (F.col("n_s") - 1) * (2 * F.col("n_s") + 5)
        ).alias("v_n")
    )
    ties = (
        g.groupBy("event_type", "s", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).alias(
                "v_t"
            )
        )
    )
    joined = (
        s_stat.join(var_n, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "s_stat",
            (F.col("v_n") - F.col("v_t")).cast("long").alias("var18"),
        )
    )
    zc = F.when(F.col("s_stat") > 0, F.col("s_stat") - 1).when(
        F.col("s_stat") < 0, F.col("s_stat") + 1
    ).otherwise(F.lit(0))
    z = F.when(
        F.col("var18") > 0,
        zc.cast("double")
        / F.sqrt(F.col("var18").cast("double") / F.lit(18.0)),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "event_type",
        "s_stat",
        "var18",
        _squant(z, float(MICRO)).alias("z_micro"),
        (F.abs(z) > F.lit(T_CRIT_5PCT)).alias("trend_detected"),
    ).orderBy("event_type")


_SMK_Z = (
    "CASE WHEN var18 > 0 THEN (CASE WHEN s_stat > 0 THEN s_stat - 1 "
    "WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END)::DOUBLE "
    "/ sqrt(CAST(var18 AS DOUBLE) / 18.0) ELSE 0.0 END"
)

SEASONAL_MK_SQL = f"""
WITH {_GRID_SQL}, sg AS (
  SELECT event_type, d, y, d % 7 AS s FROM grid
), spairs AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM sg a JOIN sg b
    ON a.event_type = b.event_type AND a.s = b.s AND b.d > a.d
  GROUP BY a.event_type
), vn AS (
  SELECT event_type,
         CAST(SUM(n_s * (n_s - 1) * (2 * n_s + 5)) AS BIGINT) AS v_n
  FROM (SELECT event_type, s, COUNT(*) AS n_s FROM sg GROUP BY 1, 2)
  GROUP BY event_type
), vt AS (
  SELECT event_type,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS v_t
  FROM (SELECT event_type, s, y, COUNT(*) AS t FROM sg GROUP BY 1, 2, 3)
  GROUP BY event_type
), fin AS (
  SELECT s.event_type, s.s_stat, v_n - v_t AS var18
  FROM spairs s JOIN vn USING (event_type) JOIN vt USING (event_type)
)
SELECT event_type, s_stat, var18,
       {_squant_sql(_SMK_Z, str(MICRO))} AS z_micro,
       abs({_SMK_Z}) > {T_CRIT_5PCT} AS trend_detected
FROM fin
ORDER BY event_type
"""


# ------------------------------------- Engle-Granger cointegration
def engle_granger_cointegration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Engle-Granger two-step per event type against the 'view'
    series: (1) OLS y_t = a + b·x_t with exact DECIMAL sums; the
    residual is integer-cleared (R_t = y_t·D − A_n − B_n·x_t with
    D = nΣx²−(Σx)², all exact), then mean-normalized and quantized —
    v_t = ⌊R_t·n/(D·Σy)·10⁶ + ½⌋·sign — so residual magnitudes stay
    O(10⁶) at ANY scale factor (raw R_t² would leave DECIMAL(38)
    near 100 TB event volumes). (2) Dickey-Fuller on v_t: ρ =
    Σv_{t−1}Δ_t/Σv_{t−1}² from exact integer products; the t-stat's
    per-term squared errors are floor-quantized before the sum.
    t < {EG_CRIT_5PCT} rejects no-cointegration at 5% (MacKinnon)."""
    g = _daily_grid(spark, sf_dir)
    x = g.filter(F.col("event_type") == "view").select(
        "d", F.col("y").alias("x")
    )
    y = g.filter(F.col("event_type") != "view").select("event_type", "d", "y")
    xy = y.join(x, "d")
    d38 = lambda col: col.cast(_D38)  # noqa: E731
    sums = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38(F.col("x"))).alias("sx"),
        F.sum(d38(F.col("y"))).alias("sy"),
        F.sum(d38(F.col("x")) * d38(F.col("x"))).alias("sxx"),
        F.sum(d38(F.col("x")) * d38(F.col("y"))).alias("sxy"),
    )
    dd = (F.col("n").cast(_D38) * F.col("sxx") - F.col("sx") * F.col("sx")).alias("dd")
    an = (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).alias("an")
    bn = (F.col("n").cast(_D38) * F.col("sxy") - F.col("sx") * F.col("sy")).alias("bn")
    params = sums.select("event_type", "n", "sy", dd, an, bn)
    r = xy.join(params, "event_type")
    rr = (
        F.col("y").cast(_D38) * F.col("dd")
        - F.col("an")
        - F.col("bn") * F.col("x").cast(_D38)
    )
    vnorm = (
        rr.cast("double")
        * F.col("n").cast("double")
        / (F.col("dd").cast("double") * F.col("sy").cast("double"))
    )
    vrows = r.select("event_type", "d", _squant(vnorm, float(MICRO)).alias("v"))
    w = Window.partitionBy("event_type").orderBy("d")
    diffs = vrows.select(
        "event_type",
        F.lag("v", 1).over(w).alias("v1"),
        (F.col("v") - F.lag("v", 1).over(w)).alias("dv"),
    ).filter(F.col("v1").isNotNull())
    base = diffs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("v1") * F.col("v1")).alias("svv"),
        F.sum(F.col("v1") * F.col("dv")).alias("svd"),
    )
    rho = F.col("svd").cast("double") / F.col("svv").cast("double")
    # second pass for the residual variance: per-term quantized e²
    err = diffs.join(base.select("event_type", "svv", "svd"), "event_type")
    e = F.col("dv").cast("double") - (
        F.col("svd").cast("double") / F.col("svv").cast("double")
    ) * F.col("v1").cast("double")
    eq = err.groupBy("event_type").agg(
        F.sum(F.floor(e * e + F.lit(0.5)).cast("long")).alias("se2")
    )
    fin = base.join(eq, "event_type").join(
        params.select("event_type", "dd", "bn"), "event_type"
    )
    beta = F.col("bn").cast("double") / F.col("dd").cast("double")
    s2 = F.col("se2").cast("double") / (F.col("m").cast("double") - F.lit(2.0))
    tstat = F.when(
        (F.col("svv") > 0) & (F.col("se2") > 0),
        rho / F.sqrt(s2 / F.col("svv").cast("double")),
    ).otherwise(F.lit(0.0))
    return fin.select(
        "event_type",
        F.col("m").alias("n_diffs"),
        _squant(beta, float(NANO)).alias("beta_nano"),
        _squant(rho, float(NANO)).alias("rho_nano"),
        _squant(tstat, float(MICRO)).alias("adf_t_micro"),
        (tstat < F.lit(EG_CRIT_5PCT)).alias("cointegrated_5pct"),
    ).orderBy("event_type")


_EG_T = (
    "CASE WHEN svv > 0 AND se2 > 0 THEN "
    "(CAST(svd AS DOUBLE) / CAST(svv AS DOUBLE)) "
    "/ sqrt((CAST(se2 AS DOUBLE) / (CAST(m AS DOUBLE) - 2.0)) "
    "/ CAST(svv AS DOUBLE)) ELSE 0.0 END"
)

ENGLE_GRANGER_SQL = f"""
WITH {_GRID_SQL}, xs AS (
  SELECT d, y AS x FROM grid WHERE event_type = 'view'
), xy AS (
  SELECT g.event_type, g.d, g.y, xs.x
  FROM grid g JOIN xs USING (d)
  WHERE g.event_type <> 'view'
), sums AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM xy GROUP BY event_type
), params AS (
  SELECT event_type, n, sy,
         n * sxx - sx * sx AS dd,
         sy * sxx - sx * sxy AS an,
         n * sxy - sx * sy AS bn
  FROM sums
), vrows AS (
  SELECT xy.event_type, xy.d,
         {_squant_sql(
             "CAST(CAST(xy.y AS HUGEINT) * p.dd - p.an "
             "- p.bn * xy.x AS DOUBLE) * CAST(p.n AS DOUBLE) "
             "/ (CAST(p.dd AS DOUBLE) * CAST(p.sy AS DOUBLE))",
             str(MICRO),
         )} AS v
  FROM xy JOIN params p USING (event_type)
), diffs AS (
  SELECT event_type,
         LAG(v) OVER w AS v1,
         v - LAG(v) OVER w AS dv
  FROM vrows
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
), base AS (
  SELECT event_type, COUNT(*) AS m,
         CAST(SUM(v1 * v1) AS BIGINT) AS svv,
         CAST(SUM(v1 * dv) AS BIGINT) AS svd
  FROM diffs WHERE v1 IS NOT NULL GROUP BY event_type
), eq AS (
  SELECT d.event_type,
         CAST(SUM(CAST(floor(
           (CAST(d.dv AS DOUBLE) - (CAST(b.svd AS DOUBLE)
              / CAST(b.svv AS DOUBLE)) * CAST(d.v1 AS DOUBLE))
           * (CAST(d.dv AS DOUBLE) - (CAST(b.svd AS DOUBLE)
              / CAST(b.svv AS DOUBLE)) * CAST(d.v1 AS DOUBLE))
           + 0.5) AS BIGINT)) AS BIGINT) AS se2
  FROM diffs d JOIN base b USING (event_type)
  WHERE d.v1 IS NOT NULL
  GROUP BY d.event_type
), fin AS (
  SELECT b.event_type, b.m, b.svv, b.svd, e.se2, p.dd, p.bn
  FROM base b JOIN eq e USING (event_type) JOIN params p USING (event_type)
)
SELECT event_type, m AS n_diffs,
       {_squant_sql("CAST(bn AS DOUBLE) / CAST(dd AS DOUBLE)", str(NANO))}
         AS beta_nano,
       {_squant_sql("CAST(svd AS DOUBLE) / CAST(svv AS DOUBLE)", str(NANO))}
         AS rho_nano,
       {_squant_sql(_EG_T, str(MICRO))} AS adf_t_micro,
       {_EG_T} < {EG_CRIT_5PCT} AS cointegrated_5pct
FROM fin
ORDER BY event_type
"""


# -------------------------------------------- Fellegi-Sunter EM
# initial parameters, 1e-9 fixed-point (m = P(agree | match),
# u = P(agree | non-match), p = match prevalence)
FS_INIT_P = 100_000_000          # 0.1
FS_INIT_M = (900_000_000, 800_000_000, 700_000_000)
FS_INIT_U = (100_000_000, 200_000_000, 300_000_000)
FS_CLAMP_LO = 1                  # 1e-9 — keeps every likelihood finite
FS_CLAMP_HI = NANO - 1


def _fs_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dirty↔master candidate pairs with the
    three comparison fields: Levenshtein ≤ {MAX_EDIT}, 3-char suffix
    agreement, length agreement. Same corruption scenario and
    blocking as linkage.py:104 (linear, never all-pairs)."""
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.filter(hash_bucket(F.col("c_custkey")) < DIRTY_PCT).select(
        F.col("c_custkey").alias("rec_id"),
        F.concat(
            F.substring(F.col("c_name"), 1, DROP_POS - 1),
            F.substring(F.col("c_name"), DROP_POS + 1, 1000),
        ).alias("name"),
        F.lit(1).alias("is_dirty"),
    )
    clean = cust.select(
        F.col("c_custkey").alias("rec_id"),
        F.col("c_name").alias("name"),
        F.lit(0).alias("is_dirty"),
    )
    recs = (
        dirty.unionByName(clean)
        .withColumn("sort_key", F.reverse(F.col("name")))
        .withColumn("bucket", F.substring("sort_key", 1, 2))
    )
    w = Window.partitionBy("bucket").orderBy("sort_key", "is_dirty", "rec_id")
    ranked = recs.withColumn("rn", F.row_number().over(w))
    a = ranked.select(
        "bucket",
        F.col("name").alias("a_name"),
        F.col("is_dirty").alias("a_dirty"),
        F.col("rn").alias("a_rn"),
    )
    b = ranked.select(
        "bucket",
        F.col("name").alias("b_name"),
        F.col("is_dirty").alias("b_dirty"),
        F.col("rn").alias("b_rn"),
    )
    pairs = a.join(b, "bucket").filter(
        (F.col("b_rn") > F.col("a_rn"))
        & (F.col("b_rn") <= F.col("a_rn") + SNM_WINDOW)
        & (F.col("a_dirty") != F.col("b_dirty"))
    )
    return pairs.select(
        (F.levenshtein("a_name", "b_name") <= MAX_EDIT)
        .cast("long")
        .alias("g_lev"),
        (
            F.substring(F.col("a_name"), -3, 3)
            == F.substring(F.col("b_name"), -3, 3)
        )
        .cast("long")
        .alias("g_suffix"),
        (F.length("a_name") == F.length("b_name")).cast("long").alias("g_len"),
    )


def _fs_em(counts: list[tuple[int, int, int, int]]) -> tuple[int, list[int], list[int]]:
    """EM on the ≤8 pattern counts, parameters carried as 1e-9
    integers between iterations and per-pattern weights quantized to
    1e-6 BEFORE every sum — the exact arithmetic the unrolled SQL
    replays (same parenthesization, same floor+½ grids). Integer→
    double conversions stay exact below 2^53 ≈ 9·10¹⁵; with weights
    in 1e-6 units that bounds the corpus at ~9·10⁹ pairs per run —
    beyond that, re-grid to 1e-3 (documented, not silently wrong)."""
    p_n, m_n, u_n = FS_INIT_P, list(FS_INIT_M), list(FS_INIT_U)
    n_total = sum(n for _, _, _, n in counts)
    clamp = lambda v: max(FS_CLAMP_LO, min(FS_CLAMP_HI, v))  # noqa: E731
    for _ in range(FS_ITERS):
        p = p_n / 1e9
        m = [v / 1e9 for v in m_n]
        u = [v / 1e9 for v in u_n]
        t_sum = 0
        tg = [0, 0, 0]
        sg = [0, 0, 0]
        s_sum = 0
        for g1, g2, g3, n in counts:
            gs = (g1, g2, g3)
            pm = (
                (m[0] if g1 else 1.0 - m[0]) * (m[1] if g2 else 1.0 - m[1])
            ) * (m[2] if g3 else 1.0 - m[2])
            pu = (
                (u[0] if g1 else 1.0 - u[0]) * (u[1] if g2 else 1.0 - u[1])
            ) * (u[2] if g3 else 1.0 - u[2])
            w = (p * pm) / ((p * pm) + ((1.0 - p) * pu))
            t = math.floor(n * w * 1e6 + 0.5)
            s = n * 10**6 - t
            t_sum += t
            s_sum += s
            for j in range(3):
                tg[j] += t * gs[j]
                sg[j] += s * gs[j]
        # degenerate-input guard (ADVICE r13): if every per-pattern
        # weight rounds to 0 (or to the full n·1e6), t_sum/s_sum hits
        # 0 and the division raises — clamp to 1 here AND in the
        # unrolled SQL twin (GREATEST(..., 1) in agg{it}) so both
        # engines degrade identically instead of ZeroDivisionError
        # vs inf/NaN. The pinned corpus never triggers it (both sums
        # >= 1 at every iteration), so green rows are unaffected.
        t_sum = max(1, t_sum)
        s_sum = max(1, s_sum)
        p_n = clamp(math.floor(t_sum / (n_total * 1e6) * 1e9 + 0.5))
        m_n = [clamp(math.floor(tg[j] / t_sum * 1e9 + 0.5)) for j in range(3)]
        u_n = [clamp(math.floor(sg[j] / s_sum * 1e9 + 0.5)) for j in range(3)]
    return p_n, m_n, u_n


def fellegi_sunter_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter match weights by EM over the SNM comparison
    patterns: per observed pattern γ, the pair count, the final match
    posterior P(M|γ), and the m/u likelihood ratio (the FS decision
    weight, emitted as a quantized RATIO — log-weights would hinge on
    cross-engine libm log parity). The EM runs on the collected ≤8
    pattern counts (bounded driver state, the platt/pq discipline);
    the DuckDB oracle unrolls the identical {FS_ITERS} quantized
    iterations in SQL."""
    pat = (
        _fs_pairs(spark, sf_dir)
        .groupBy("g_lev", "g_suffix", "g_len")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    counts = sorted(
        (int(r.g_lev), int(r.g_suffix), int(r.g_len), int(r.n_pairs))
        for r in pat.collect()
    )
    p_n, m_n, u_n = _fs_em(counts)
    p = p_n / 1e9
    m = [v / 1e9 for v in m_n]
    u = [v / 1e9 for v in u_n]

    def lik(vals: list[float], cols: list[str]) -> Column:
        term = lambda j: F.when(  # noqa: E731
            F.col(cols[j]) == 1, F.lit(vals[j])
        ).otherwise(F.lit(1.0 - vals[j]))
        return (term(0) * term(1)) * term(2)

    gcols = ["g_lev", "g_suffix", "g_len"]
    pm = lik(m, gcols)
    pu = lik(u, gcols)
    w = (F.lit(p) * pm) / ((F.lit(p) * pm) + ((F.lit(1.0) - F.lit(p)) * pu))
    return pat.select(
        "g_lev",
        "g_suffix",
        "g_len",
        "n_pairs",
        F.floor(w * F.lit(float(MICRO)) + F.lit(0.5))
        .cast("long")
        .alias("posterior_micro"),
        F.floor((pm / pu) * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("mu_ratio_milli"),
        F.lit(p_n).alias("p_match_nano"),
    ).orderBy("g_lev", "g_suffix", "g_len")


def _fs_sql() -> str:
    def lik(pre: str) -> str:
        """Π over the 3 fields of (param if agree else 1−param), the
        exact parenthesization _fs_em uses: ((t1 * t2)) * t3, with
        each parameter rebuilt as <int>/1e9 so both engines hold the
        identical double."""
        t = lambda j, g: (  # noqa: E731
            f"(CASE WHEN {g} = 1 THEN q.{pre}{j}_n / 1e9"
            f" ELSE 1.0 - q.{pre}{j}_n / 1e9 END)"
        )
        return (
            f"(({t(1, 'g_lev')} * {t(2, 'g_suffix')}) * {t(3, 'g_len')})"
        )
    sql = f"""
WITH dirty AS (
  SELECT c_custkey AS rec_id,
         substr(c_name, 1, {DROP_POS - 1}) || substr(c_name, {DROP_POS + 1})
           AS name,
         1 AS is_dirty
  FROM customer
  WHERE ('0x' || substr(md5(c_custkey::VARCHAR), 1, 8))::UBIGINT::BIGINT
          % 100 < {DIRTY_PCT}
), recs AS (
  SELECT rec_id, name, is_dirty, reverse(name) AS sort_key,
         substr(reverse(name), 1, 2) AS bucket
  FROM (SELECT * FROM dirty
        UNION ALL
        SELECT c_custkey, c_name, 0 FROM customer)
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
                               ORDER BY sort_key, is_dirty, rec_id) AS rn
  FROM recs
), pat AS (
  SELECT CASE WHEN levenshtein(a.name, b.name) <= {MAX_EDIT}
              THEN 1 ELSE 0 END AS g_lev,
         CASE WHEN substr(a.name, -3, 3) = substr(b.name, -3, 3)
              THEN 1 ELSE 0 END AS g_suffix,
         CASE WHEN length(a.name) = length(b.name) THEN 1 ELSE 0 END AS g_len,
         COUNT(*) AS n_pairs
  FROM ranked a JOIN ranked b
    ON a.bucket = b.bucket
   AND b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW}
   AND a.is_dirty <> b.is_dirty
  GROUP BY 1, 2, 3
), ntot AS (
  SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_total FROM pat
), params0 AS (
  SELECT CAST({FS_INIT_P} AS BIGINT) AS p_n,
         CAST({FS_INIT_M[0]} AS BIGINT) AS m1_n,
         CAST({FS_INIT_M[1]} AS BIGINT) AS m2_n,
         CAST({FS_INIT_M[2]} AS BIGINT) AS m3_n,
         CAST({FS_INIT_U[0]} AS BIGINT) AS u1_n,
         CAST({FS_INIT_U[1]} AS BIGINT) AS u2_n,
         CAST({FS_INIT_U[2]} AS BIGINT) AS u3_n
)"""
    prev = "params0"
    for it in range(1, FS_ITERS + 1):
        sql += f"""
, w{it} AS (
  SELECT g_lev, g_suffix, g_len, n_pairs,
         CAST(floor(n_pairs * ((q.p_n / 1e9 * {lik('m')})
             / ((q.p_n / 1e9 * {lik('m')})
                + ((1.0 - q.p_n / 1e9) * {lik('u')})))
           * 1e6 + 0.5) AS BIGINT) AS t
  FROM pat CROSS JOIN {prev} q
), agg{it} AS (
  SELECT GREATEST(CAST(SUM(t) AS BIGINT), 1) AS t_sum,
         GREATEST(CAST(SUM(n_pairs * 1000000 - t) AS BIGINT), 1) AS s_sum,
         CAST(SUM(t * g_lev) AS BIGINT) AS tg1,
         CAST(SUM(t * g_suffix) AS BIGINT) AS tg2,
         CAST(SUM(t * g_len) AS BIGINT) AS tg3,
         CAST(SUM((n_pairs * 1000000 - t) * g_lev) AS BIGINT) AS sg1,
         CAST(SUM((n_pairs * 1000000 - t) * g_suffix) AS BIGINT) AS sg2,
         CAST(SUM((n_pairs * 1000000 - t) * g_len) AS BIGINT) AS sg3
  FROM w{it}
), params{it} AS (
  SELECT GREATEST({FS_CLAMP_LO}, LEAST({FS_CLAMP_HI},
           CAST(floor(t_sum / (n_total * 1e6) * 1e9 + 0.5) AS BIGINT))) AS p_n,
         GREATEST({FS_CLAMP_LO}, LEAST({FS_CLAMP_HI},
           CAST(floor(tg1 / t_sum * 1e9 + 0.5) AS BIGINT))) AS m1_n,
         GREATEST({FS_CLAMP_LO}, LEAST({FS_CLAMP_HI},
           CAST(floor(tg2 / t_sum * 1e9 + 0.5) AS BIGINT))) AS m2_n,
         GREATEST({FS_CLAMP_LO}, LEAST({FS_CLAMP_HI},
           CAST(floor(tg3 / t_sum * 1e9 + 0.5) AS BIGINT))) AS m3_n,
         GREATEST({FS_CLAMP_LO}, LEAST({FS_CLAMP_HI},
           CAST(floor(sg1 / s_sum * 1e9 + 0.5) AS BIGINT))) AS u1_n,
         GREATEST({FS_CLAMP_LO}, LEAST({FS_CLAMP_HI},
           CAST(floor(sg2 / s_sum * 1e9 + 0.5) AS BIGINT))) AS u2_n,
         GREATEST({FS_CLAMP_LO}, LEAST({FS_CLAMP_HI},
           CAST(floor(sg3 / s_sum * 1e9 + 0.5) AS BIGINT))) AS u3_n
  FROM agg{it} CROSS JOIN ntot
)"""
        prev = f"params{it}"
    sql += f"""
SELECT g_lev, g_suffix, g_len, n_pairs,
       CAST(floor(((q.p_n / 1e9 * {lik('m')})
           / ((q.p_n / 1e9 * {lik('m')})
              + ((1.0 - q.p_n / 1e9) * {lik('u')})))
         * {MICRO} + 0.5) AS BIGINT) AS posterior_micro,
       CAST(floor(({lik('m')} / {lik('u')}) * 1000.0 + 0.5) AS BIGINT)
         AS mu_ratio_milli,
       q.p_n AS p_match_nano
FROM pat CROSS JOIN {prev} q
ORDER BY g_lev, g_suffix, g_len
"""
    return sql


FELLEGI_SUNTER_SQL = _fs_sql()
