"""Round-8 corpus analytics: Monroe log-odds keyword extraction,
word burstiness, blocked edit-distance dedup, and a training-order
run audit.

All four are curation-pipeline primitives: log-odds finds the words
that genuinely distinguish two slices (the `fightin' words` method —
Monroe, Colaresi & Quinn 2008), burstiness separates topical words
from function words, blocked Levenshtein is the surgical near-dup
pass LSH hands its candidates to, and the run audit checks that the
seeded training shuffle didn't leave long same-source runs (the
thing that skews gradient mixing).


Reference parity note: the reference (cgtcalc-data-transformer, ~732 LoC broker-CSV ETL) has no analog for this family — these are engine extensions in the SURVEY.md §2.2 sense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.dedup import tokens_col
from cgtcalc_data_transformer_spark.operators.mlprep import (
    SHUFFLE_EPOCH_SALT,
    training_order_shuffle,
)
from cgtcalc_data_transformer_spark.sources.tpch import load_table, scatter

_TOK_SQL = (
    "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok"
)

# ---------------------------------------------- Monroe log-odds ratio
LO_A, LO_B = "en", "zh"
LO_ALPHA0 = 500.0  # total informative-prior mass
LO_TOP_K = 20


def monroe_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-odds ratio with informative Dirichlet prior (Monroe et al.
    2008): which words distinguish the '{a}' slice from the '{b}'
    slice of the corpus, z-scored so rare-word noise doesn't top the
    list — the curation-grade replacement for raw tf-idf deltas when
    comparing two sources/languages.

    One tokenize pass → per-word conditional counts; the prior is
    proportional to corpus frequency (one broadcast totals row); the
    z-score is a closed form per word; top-K by the ROUNDED |z| with
    a word tiebreak (TakeOrderedAndProject — no global sort).
    """
    docs = scatter(
        load_table(spark, sf_dir, "documents").filter(
            F.col("lang").isin(LO_A, LO_B)
        )
    )
    toks = docs.select(
        "lang", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(
        F.sum((F.col("lang") == LO_A).cast("long")).alias("y1"),
        F.sum((F.col("lang") == LO_B).cast("long")).alias("y2"),
    )
    tot = counts.agg(
        F.sum("y1").alias("n1"),
        F.sum("y2").alias("n2"),
    )
    j = counts.crossJoin(F.broadcast(tot))
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    y1 = F.col("y1").cast("double")
    y2 = F.col("y2").cast("double")
    aw = F.lit(LO_ALPHA0) * (y1 + y2) / (n1 + n2)
    d1 = F.log((y1 + aw) / (n1 + F.lit(LO_ALPHA0) - y1 - aw))
    d2 = F.log((y2 + aw) / (n2 + F.lit(LO_ALPHA0) - y2 - aw))
    var = F.lit(1.0) / (y1 + aw) + F.lit(1.0) / (y2 + aw)
    z = (d1 - d2) / F.sqrt(var)
    scored = j.select(
        F.col("tok").alias("word"),
        F.col("y1").alias(f"c_{LO_A}"),
        F.col("y2").alias(f"c_{LO_B}"),
        F.round(z, 6).alias("z_log_odds"),
    )
    return scored.orderBy(
        F.desc(F.abs(F.col("z_log_odds"))), F.asc("word")
    ).limit(LO_TOP_K)


MONROE_SQL = f"""
WITH toks AS (
  SELECT lang, {_TOK_SQL}
  FROM documents WHERE lang IN ('{LO_A}', '{LO_B}')
), counts AS (
  SELECT tok,
         CAST(SUM(CASE WHEN lang = '{LO_A}' THEN 1 ELSE 0 END) AS BIGINT) AS y1,
         CAST(SUM(CASE WHEN lang = '{LO_B}' THEN 1 ELSE 0 END) AS BIGINT) AS y2
  FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(SUM(y1) AS BIGINT) AS n1, CAST(SUM(y2) AS BIGINT) AS n2 FROM counts
), scored AS (
  SELECT tok AS word, y1 AS c_{LO_A}, y2 AS c_{LO_B},
         ROUND((ln((y1 + {LO_ALPHA0} * (y1 + y2) / (CAST(n1 AS DOUBLE) + n2))
                   / (n1 + {LO_ALPHA0} - y1 - {LO_ALPHA0} * (y1 + y2) / (CAST(n1 AS DOUBLE) + n2)))
                - ln((y2 + {LO_ALPHA0} * (y1 + y2) / (CAST(n1 AS DOUBLE) + n2))
                     / (n2 + {LO_ALPHA0} - y2 - {LO_ALPHA0} * (y1 + y2) / (CAST(n1 AS DOUBLE) + n2))))
               / sqrt(1.0 / (y1 + {LO_ALPHA0} * (y1 + y2) / (CAST(n1 AS DOUBLE) + n2))
                      + 1.0 / (y2 + {LO_ALPHA0} * (y1 + y2) / (CAST(n1 AS DOUBLE) + n2))), 6) AS z_log_odds
  FROM counts CROSS JOIN tot
)
SELECT * FROM scored
ORDER BY ABS(z_log_odds) DESC, word ASC
LIMIT {LO_TOP_K}
"""


# ------------------------------------------------------ word burstiness
WB_TOP_WORDS = 30


def word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean ratio of per-document counts for the top-30
    corpus words (Church & Gale burstiness): VMR ≈ 1 is Poisson
    scatter (function words), VMR >> 1 marks topical words that clump
    into few documents — the signal a keyword extractor or stopword
    list builder reads first.

    One tokenize pass → (word, doc) counts; zero-count documents
    enter the moments via N_docs (never materialized); everything is
    exact BIGINT sums through one division.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    n_docs = docs.count()  # scalar literal (text_tfidf convention)
    wd = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    per_word = wd.groupBy("tok").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    top = per_word.orderBy(F.desc("total"), F.asc("tok")).limit(WB_TOP_WORDS)
    nd = F.lit(float(n_docs))
    mean = F.col("total").cast("double") / nd
    var = (
        F.col("sq").cast("double")
        - F.col("total").cast("double") * F.col("total").cast("double") / nd
    ) / nd
    return top.select(
        F.col("tok").alias("word"),
        "total",
        F.round(var / mean, 6).alias("vmr"),
    ).orderBy(F.desc("total"), F.asc("word"))


WORD_BURSTINESS_SQL = f"""
WITH nd AS (SELECT COUNT(*) AS n FROM documents),
wd AS (
  SELECT tok, doc_id, COUNT(*) AS c
  FROM (SELECT doc_id, {_TOK_SQL} FROM documents)
  GROUP BY tok, doc_id
), per_word AS (
  SELECT tok, CAST(SUM(c) AS BIGINT) AS total,
         CAST(SUM(c * c) AS BIGINT) AS sq
  FROM wd GROUP BY tok
), top AS (
  SELECT * FROM per_word ORDER BY total DESC, tok ASC LIMIT {WB_TOP_WORDS}
)
SELECT tok AS word, total,
       ROUND(((CAST(sq AS DOUBLE) - CAST(total AS DOUBLE) * total / n) / n)
             / (CAST(total AS DOUBLE) / n), 6) AS vmr
FROM top CROSS JOIN nd
ORDER BY total DESC, word ASC
"""


# --------------------------------------------- blocked Levenshtein dedup
LEV_MAX = 10
LEV_PREFIX = 8
LEV_LEN_BUCKET = 16


def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance near-dup audit: candidate pairs share
    (lang, length bucket, first-{LEV_PREFIX} chars), survivors have
    levenshtein <= {LEV_MAX} — the exact verification pass an LSH
    pipeline hands its candidates to, here with deterministic prefix
    blocking (scale-honest: block sizes are bounded by real prefix
    collisions, never all-pairs; this corpus has almost none, and the
    summary says so instead of inventing pairs).

    Both engines implement classic unit-cost Levenshtein, so the
    distances are engine-exact integers.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / LEV_LEN_BUCKET).cast("long").alias("lb"),
        F.substring(F.lower(F.col("text")), 1, LEV_PREFIX).alias("pre"),
        F.lower(F.col("text")).alias("norm"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    cand = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.lb") == F.col("b.lb"))
        & (F.col("a.pre") == F.col("b.pre"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.levenshtein(F.col("a.norm"), F.col("b.norm")).alias("dist"),
    )
    return cand.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum((F.col("dist") <= LEV_MAX).cast("long")).alias("n_near_dups"),
        F.coalesce(F.min("dist"), F.lit(-1)).alias("min_dist"),
    )


DEDUP_LEVENSHTEIN_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, n_chars // {LEV_LEN_BUCKET} AS lb,
         substr(lower(text), 1, {LEV_PREFIX}) AS pre,
         lower(text) AS norm
  FROM documents
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         levenshtein(a.norm, b.norm) AS dist
  FROM d a JOIN d b
    ON a.lang = b.lang AND a.lb = b.lb AND a.pre = b.pre
   AND a.doc_id < b.doc_id
)
SELECT COUNT(*) AS n_candidates,
       CAST(COALESCE(SUM(CASE WHEN dist <= {LEV_MAX} THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_near_dups,
       COALESCE(MIN(dist), -1) AS min_dist
FROM cand
"""


# --------------------------------------------- training-order run audit
def shuffle_run_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-source run-length audit of the seeded training order:
    per source, how many contiguous runs the shuffle produced and the
    longest one — the check that the md5 shuffle actually interleaved
    sources (a long run = correlated gradients; expected max run for
    a 1/20 share is O(log N)).

    Reuses training_order_shuffle's bucketed global rank, then the
    gaps-and-islands identity (pos − per-source rank) with windows
    partitioned by SOURCE — 20-way parallelism over narrow
    (id, source, pos) metadata rows, never the corpus text.
    """
    pos = training_order_shuffle(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ordered = pos.join(src, "doc_id")
    w = Window.partitionBy("source").orderBy("shuffle_pos")
    islands = ordered.select(
        "source",
        (F.col("shuffle_pos") - F.row_number().over(w)).alias("island"),
    )
    runs = islands.groupBy("source", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("source")
        .agg(
            F.sum("run_len").alias("n_docs"),
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").alias("max_run"),
        )
        .orderBy("source")
    )


SHUFFLE_RUN_SQL = f"""
WITH pos AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || '{SHUFFLE_EPOCH_SALT}'), doc_id) - 1 AS shuffle_pos
  FROM documents
), ordered AS (
  SELECT d.source, pos.shuffle_pos
  FROM pos JOIN documents d USING (doc_id)
), islands AS (
  SELECT source,
         shuffle_pos - ROW_NUMBER() OVER (PARTITION BY source ORDER BY shuffle_pos) AS island
  FROM ordered
), runs AS (
  SELECT source, island, COUNT(*) AS run_len
  FROM islands GROUP BY source, island
)
SELECT source,
       CAST(SUM(run_len) AS BIGINT) AS n_docs,
       COUNT(*) AS n_runs,
       CAST(MAX(run_len) AS BIGINT) AS max_run
FROM runs GROUP BY source
ORDER BY source
"""


# --------------------------------------------- log-likelihood ratio
LLR_MIN_COUNT = 5
LLR_TOP_K = 20


def _xlx(x):
    xd = x.cast("double")
    return F.when(x > 0, xd * F.log(xd)).otherwise(F.lit(0.0))


def collocations_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio collocations: the top-20 bigrams
    whose co-occurrence beats independence by the G² test — the
    statistically calibrated cousin of collocations_pmi (PMI
    over-rewards rare pairs; LLR weighs the evidence mass, which is
    why phrase tables are built on it).

    One bigram-count aggregation; margins c(w1·), c(·w2) and N are
    model-sized reductions of that same table (never a corpus
    rescan); G² = 2·Σ x·ln x over the 2x2 table margins — exact-int
    inputs into identical IEEE ln.
    """
    from cgtcalc_data_transformer_spark.operators.corpus_lm import _bigrams

    docs = scatter(load_table(spark, sf_dir, "documents"))
    c12 = _bigrams(docs).groupBy("bg").agg(F.count(F.lit(1)).alias("k11"))
    w1 = F.substring_index(F.col("bg"), " ", 1)
    w2 = F.substring_index(F.col("bg"), " ", -1)
    c1 = c12.groupBy(w1.alias("w1")).agg(F.sum("k11").alias("r"))
    c2 = c12.groupBy(w2.alias("w2")).agg(F.sum("k11").alias("c"))
    tot = c12.agg(F.sum("k11").alias("n"))
    j = (
        c12.filter(F.col("k11") >= LLR_MIN_COUNT)
        .join(c1, w1 == c1["w1"])
        .join(c2, w2 == c2["w2"])
        .crossJoin(F.broadcast(tot))
    )
    k11 = F.col("k11")
    k12 = F.col("r") - k11
    k21 = F.col("c") - k11
    k22 = F.col("n") - F.col("r") - F.col("c") + k11
    llr = F.lit(2.0) * (
        _xlx(k11) + _xlx(k12) + _xlx(k21) + _xlx(k22)
        - _xlx(F.col("r")) - _xlx(F.col("n") - F.col("r"))
        - _xlx(F.col("c")) - _xlx(F.col("n") - F.col("c"))
        + _xlx(F.col("n"))
    )
    scored = j.select(
        F.col("bg").alias("bigram"),
        F.col("k11").alias("count"),
        F.round(llr, 6).alias("llr"),
    )
    return scored.orderBy(F.desc("llr"), F.asc("bigram")).limit(LLR_TOP_K)


COLLOCATIONS_LLR_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     x -> x <> '') AS t
  FROM documents
), b AS (
  SELECT doc_id, z[1] || ' ' || z[2] AS bg
  FROM (SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
        FROM toks WHERE len(t) >= 2)
), c12 AS (
  SELECT bg, COUNT(*) AS k11 FROM b GROUP BY bg
), c1 AS (
  SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(k11) AS BIGINT) AS r
  FROM c12 GROUP BY 1
), c2 AS (
  SELECT split_part(bg, ' ', 2) AS w2, CAST(SUM(k11) AS BIGINT) AS c
  FROM c12 GROUP BY 1
), tot AS (
  SELECT CAST(SUM(k11) AS BIGINT) AS n FROM c12
), j AS (
  SELECT bg, k11, r, c, n,
         r - k11 AS k12, c - k11 AS k21, n - r - c + k11 AS k22
  FROM c12
  JOIN c1 ON split_part(bg, ' ', 1) = c1.w1
  JOIN c2 ON split_part(bg, ' ', 2) = c2.w2
  CROSS JOIN tot
  WHERE k11 >= {LLR_MIN_COUNT}
), scored AS (
  SELECT bg AS bigram, k11 AS count,
         ROUND(2.0 * (
           (CASE WHEN k11 > 0 THEN k11 * ln(CAST(k11 AS DOUBLE)) ELSE 0.0 END)
           + (CASE WHEN k12 > 0 THEN k12 * ln(CAST(k12 AS DOUBLE)) ELSE 0.0 END)
           + (CASE WHEN k21 > 0 THEN k21 * ln(CAST(k21 AS DOUBLE)) ELSE 0.0 END)
           + (CASE WHEN k22 > 0 THEN k22 * ln(CAST(k22 AS DOUBLE)) ELSE 0.0 END)
           - (CASE WHEN r > 0 THEN r * ln(CAST(r AS DOUBLE)) ELSE 0.0 END)
           - (CASE WHEN n - r > 0 THEN (n - r) * ln(CAST(n - r AS DOUBLE)) ELSE 0.0 END)
           - (CASE WHEN c > 0 THEN c * ln(CAST(c AS DOUBLE)) ELSE 0.0 END)
           - (CASE WHEN n - c > 0 THEN (n - c) * ln(CAST(n - c AS DOUBLE)) ELSE 0.0 END)
           + (CASE WHEN n > 0 THEN n * ln(CAST(n AS DOUBLE)) ELSE 0.0 END)
         ), 6) AS llr
  FROM j
)
SELECT * FROM scored
ORDER BY llr DESC, bigram ASC
LIMIT {LLR_TOP_K}
"""


# ------------------------------------------- source diversity indices
DIV_SCALE = 10**9


def source_diversity_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix diversity panel over document sources: Shannon
    entropy H, Simpson concentration D = Σp², and Pielou evenness
    J = H/ln(S) — the three numbers a data-mixing report opens with
    (H for information, D for collision probability, J for how far
    the mix sits from uniform).

    One count aggregation to the |sources|-row frame; per-source
    −p·ln p terms quantize to a 1e-9 grid before the integer sum
    (the theil_index recipe); Simpson is an exact integer ratio.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    tot = per.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("s")
    )
    j = per.crossJoin(F.broadcast(tot))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    hq = F.floor(-p * F.log(p) * F.lit(float(DIV_SCALE)) + F.lit(0.5)).cast("long")
    agg = j.groupBy("n", "s").agg(
        F.sum(hq).alias("hsum"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c").cast("decimal(19,0)")).alias("c2"),
    )
    h = F.col("hsum").cast("double") / F.lit(float(DIV_SCALE))
    simpson = F.col("c2").cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    return agg.select(
        F.col("s").alias("n_sources"),
        F.col("n").alias("n_docs"),
        F.expr("hsum div 1000").alias("shannon_micro"),
        F.round(simpson, 6).alias("simpson"),
        F.round(h / F.log(F.col("s").cast("double")), 6).alias("pielou_j"),
    )


SOURCE_DIVERSITY_SQL = f"""
WITH per AS (
  SELECT source, COUNT(*) AS c FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS s FROM per
), terms AS (
  SELECT n, s, c,
         CAST(floor(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
                    * {DIV_SCALE}.0 + 0.5) AS BIGINT) AS hq
  FROM per CROSS JOIN tot
), agg AS (
  SELECT n, s, CAST(SUM(hq) AS BIGINT) AS hsum,
         CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS c2
  FROM terms GROUP BY n, s
)
SELECT s AS n_sources, n AS n_docs,
       hsum // 1000 AS shannon_micro,
       ROUND(CAST(c2 AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS simpson,
       ROUND((CAST(hsum AS DOUBLE) / {DIV_SCALE}.0) / ln(CAST(s AS DOUBLE)), 6) AS pielou_j
FROM agg
"""
