"""Corpus-curation operators for LLM training-data pipelines.

First-class curation stages over the ``documents`` table, each a
pure-codegen / equality-join Spark plan with a 1:1 DuckDB oracle:

- ``text_normalize`` — deterministic text canonicalization (the step
  every dedup/quality stage assumes has already run).
- ``contamination_check`` — benchmark n-gram overlap: does a training
  document contain shingles from a held-out eval set? Equality join on
  shingle, never a cross product.
- ``mix_sources`` — deterministic source-weighted subsampling (the
  "data mixture" step): a doc's fate is a pure function of its id, so
  the mixture is stable across reruns, engines and appends.
- ``boilerplate_score`` — corpus-frequent n-gram coverage per doc
  (headers/footers/templates show up as shingles shared by a large
  fraction of documents).
- ``pii_redact`` — regex PII scrubbing with per-doc hit counts.
- ``pack_batches`` — token-budget sequence packing via windowed
  cumsum (no sequential loop).

No reference analog (the reference ingests broker CSVs —
``index.js:19-31`` — and has no corpus stage); these extend the same
scan → project → join → aggregate discipline to curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.operators.dedup import shingle_rows, shingle_sizes
from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket
from cgtcalc_data_transformer_spark.sources.tpch import load_table, scatter

# ------------------------------------------------------ normalization


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text form: lowercase, non-alnum → space, collapse
    runs of whitespace, trim. Zero-shuffle row-local codegen — the
    100 TB shape is "normalize on ingest, write once, every later
    stage reads the canonical column".
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length("text").alias("orig_chars"),
        F.length(norm).alias("norm_chars"),
        (F.length("text") - F.length(norm)).alias("chars_removed"),
    ).orderBy("doc_id")


TEXT_NORMALIZE_SQL = """
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id, norm_text,
       length(text) AS orig_chars,
       length(norm_text) AS norm_chars,
       length(text) - length(norm_text) AS chars_removed
FROM n
ORDER BY doc_id
"""


# ------------------------------------------- benchmark contamination
CONTAM_N = 5            # shingle width: 5-gram overlap = near-verbatim
CONTAM_BENCH_PCT = 5    # md5 bucket < 5 of 100 → the held-out "eval" docs
CONTAM_THRESHOLD = 0.2  # flag when ≥20% of a doc's shingles are eval shingles


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: per training doc, the fraction of
    its 5-gram shingles that appear in a held-out benchmark subset
    (chosen by the same deterministic md5 bucketing as the sampler, so
    the split is rerun/append-stable).

    Plan shape: both sides shingled once (posexplode + lead window),
    distinct benchmark shingles, one EQUALITY join on the shingle
    string, per-doc ratio agg. Candidate volume is bounded by shared
    shingles — no pairwise doc×doc comparison anywhere, so the plan
    survives a 100 TB corpus (the benchmark side stays eval-sized and
    its distinct-shingle set is broadcastable in practice; the hint is
    left to the size-based planner).
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    is_bench = hash_bucket(F.col("doc_id")) < CONTAM_BENCH_PCT
    bench_sh = (
        shingle_rows(docs.filter(is_bench), n=CONTAM_N)
        .select("shingle")
        .distinct()
    )
    # train shingles feed both the overlap join and the size agg;
    # cache (at 100 TB: checkpoint to parquet) so the posexplode +
    # window shingling runs once, not per branch.
    train_sh = shingle_rows(docs.filter(~is_bench), n=CONTAM_N).cache()
    overlap = (
        train_sh.join(bench_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    sizes = shingle_sizes(train_sh)
    ratio = F.round(F.col("n_overlap") / F.col("n_sh"), 6)
    return (
        sizes.join(overlap, "doc_id")
        .select(
            "doc_id",
            "n_sh",
            "n_overlap",
            ratio.alias("overlap_ratio"),
            (ratio >= CONTAM_THRESHOLD).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


CONTAMINATION_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100
           < {CONTAM_BENCH_PCT} AS is_bench,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     t -> t <> '') AS w
  FROM documents
), shingled AS (
  SELECT doc_id, is_bench,
         CASE WHEN len(w) >= {CONTAM_N}
              THEN list_distinct([array_to_string(w[i:i+{CONTAM_N - 1}], ' ')
                                  FOR i IN range(1, len(w) - {CONTAM_N - 2})])
              ELSE [] END AS shingles
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM shingled WHERE is_bench
), train AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled WHERE NOT is_bench
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM train GROUP BY doc_id
), overlap AS (
  SELECT t.doc_id, COUNT(*) AS n_overlap
  FROM train t JOIN bench b USING (shingle)
  GROUP BY t.doc_id
)
SELECT s.doc_id, s.n_sh, o.n_overlap,
       ROUND(o.n_overlap / s.n_sh, 6) AS overlap_ratio,
       ROUND(o.n_overlap / s.n_sh, 6) >= {CONTAM_THRESHOLD} AS contaminated
FROM sizes s JOIN overlap o USING (doc_id)
ORDER BY s.doc_id
"""


# ------------------------------------------------- source-weighted mix
# mixture spec: source srcN keeps weight w(N) = [1.0, 0.5, 0.25, 0.1][N % 4]
MIX_RATES_PCT = [100, 50, 25, 10]


def _mix_rate_pct(src_num):  # Column → Column (percent kept, 0-100)
    rate = F.lit(MIX_RATES_PCT[0])
    for i, pct in enumerate(MIX_RATES_PCT[1:], start=1):
        rate = F.when(src_num % 4 == i, F.lit(pct)).otherwise(rate)
    return rate


def mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-weighted mixture: each source keeps a
    configured fraction of its docs, membership decided by md5 bucket
    of doc_id (rerun/append/repartition-stable — ``df.sample`` is
    none of those). Per-source audit row: total, kept, kept_fraction
    vs target weight.

    The keep predicate is a pure column expression, so at 100 TB it
    pushes into the scan and the mixture costs one pass, no RNG
    state, no driver coordination.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    src_num = F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("int")
    rate = _mix_rate_pct(src_num)
    kept = hash_bucket(F.col("doc_id")) < rate
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(kept.cast("long")).alias("kept"),
            F.round(F.sum(kept.cast("long")) / F.count(F.lit(1)), 6).alias("kept_fraction"),
            F.round(F.first(rate) / 100.0, 6).alias("target_fraction"),
        )
        .orderBy("source")
    )


MIX_SOURCES_SQL = rf"""
WITH flagged AS (
  SELECT source,
         CASE (regexp_extract(source, '(\d+)', 1)::INT) % 4
           WHEN 1 THEN {MIX_RATES_PCT[1]} WHEN 2 THEN {MIX_RATES_PCT[2]}
           WHEN 3 THEN {MIX_RATES_PCT[3]} ELSE {MIX_RATES_PCT[0]} END AS rate,
         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100
                   < (CASE (regexp_extract(source, '(\d+)', 1)::INT) % 4
                        WHEN 1 THEN {MIX_RATES_PCT[1]} WHEN 2 THEN {MIX_RATES_PCT[2]}
                        WHEN 3 THEN {MIX_RATES_PCT[3]} ELSE {MIX_RATES_PCT[0]} END)
              THEN 1 ELSE 0 END AS kept
  FROM documents
)
SELECT source, COUNT(*) AS total,
       CAST(SUM(kept) AS BIGINT) AS kept,
       CAST(ROUND(SUM(kept) / COUNT(*), 6) AS DOUBLE) AS kept_fraction,
       CAST(ROUND(ANY_VALUE(rate) / 100.0, 6) AS DOUBLE) AS target_fraction
FROM flagged
GROUP BY source
ORDER BY source
"""


# --------------------------------------------------- boilerplate score
BOILER_DF_FRAC = 0.01   # a shingle in ≥1% of docs is "boilerplate"


def boilerplate_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate coverage per document: the fraction of a
    doc's 3-gram shingles that occur in ≥BOILER_DF_FRAC (1%) of ALL
    documents (site
    chrome, licence headers, navigation text — the C4-style cleanup
    signal).

    Two aggregations over ONE shingling pass (document frequency per
    shingle, then per-doc coverage through an equality join on the
    shingle). The df table is vocabulary-sized; the join is size-based
    (vocabulary grows with the corpus — no broadcast pin).
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    n_docs = docs.count()  # scalar literal, folded into the threshold
    # (doc_id, shingle) feeds three branches (df, coverage, sizes);
    # cache it — at 100 TB checkpoint to parquet instead of memory
    # (same pattern as dedup_minhash_lsh).
    sh = shingle_rows(docs).cache()  # distinct (doc_id, shingle), n=3
    min_df = max(2, int(n_docs * BOILER_DF_FRAC))
    common = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("shingle")
    )
    covered = (
        sh.join(common, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ratio = F.round(
        F.coalesce(F.col("n_common"), F.lit(0)) / F.col("n_sh"), 6
    )
    return (
        shingle_sizes(sh)
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_sh",
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
            ratio.alias("boilerplate_ratio"),
        )
        .orderBy("doc_id")
    )


def _boilerplate_sql() -> str:
    from cgtcalc_data_transformer_spark.operators.dedup import _SHINGLES_CTE

    return (
        _SHINGLES_CTE
        + f"""
, sh AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled WHERE len(shingles) > 0
), n AS (
  SELECT GREATEST(2, FLOOR(COUNT(*) * {BOILER_DF_FRAC})::BIGINT) AS min_df FROM documents
), common AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) >= (SELECT min_df FROM n)
), covered AS (
  SELECT doc_id, COUNT(*) AS n_common FROM sh JOIN common USING (shingle) GROUP BY doc_id
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
)
SELECT s.doc_id, s.n_sh,
       COALESCE(c.n_common, 0) AS n_common,
       ROUND(COALESCE(c.n_common, 0) / s.n_sh, 6) AS boilerplate_ratio
FROM sizes s LEFT JOIN covered c USING (doc_id)
ORDER BY s.doc_id
"""
    )


BOILERPLATE_SQL = _boilerplate_sql()


# ------------------------------------------------------- PII redaction
PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE_RE = r"\+[0-9]{2}-[0-9]{3}-[0-9]{4}"
PII_INJECT_MOD = 7  # doc_id % 7 == 0 gets synthetic PII (see docstring)


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: redact email addresses and phone-shaped
    tokens, report per-doc hit counts.

    The synthetic corpus contains no organic PII, so the query first
    INJECTS a deterministic email + phone into every 7th document —
    the injection is part of the query (both engines apply it), which
    keeps the oracle exact while making the redaction measurably
    non-trivial. Row-local codegen regex work — at 100 TB this is a
    rewrite pass fused into the normalize-on-ingest scan.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    injected = F.when(
        F.col("doc_id") % PII_INJECT_MOD == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com or +44-555-0101"),
        ),
    ).otherwise(F.col("text"))
    n_emails = F.size(F.regexp_extract_all(injected, F.lit(PII_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(injected, F.lit(PII_PHONE_RE), 0))
    clean = F.regexp_replace(
        F.regexp_replace(injected, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        (n_emails + n_phones > 0).alias("had_pii"),
        clean.alias("clean_text"),
    ).orderBy("doc_id")


PII_REDACT_SQL = rf"""
WITH injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % {PII_INJECT_MOD} = 0
              THEN text || ' contact user' || doc_id || '@example.com or +44-555-0101'
              ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS n_phones,
       len(regexp_extract_all(t, '{PII_EMAIL_RE}')) + len(regexp_extract_all(t, '{PII_PHONE_RE}')) > 0 AS had_pii,
       regexp_replace(regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'), '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text
FROM injected
ORDER BY doc_id
"""


# -------------------------------------------- token-budget batch packing
PACK_BUDGET = 256  # tokens per training batch


def pack_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: assign documents (in stable
    doc_id order) to fixed token-budget batches via a running token
    cumsum — batch_id = floor((cumsum - n_tokens) / budget), i.e. a
    doc joins the batch its FIRST token lands in (greedy packing
    without a sequential loop).

    One window over a single global ordering. At 100 TB you partition
    the cumsum by shard (source, day) so the window never sees a
    global sort — emitted here per source for exactly that shape.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    from cgtcalc_data_transformer_spark.operators.dedup import tokens_col
    from pyspark.sql import Window

    n_tok = F.size(tokens_col(F.col("text")))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = docs.select(
        "doc_id", "source", n_tok.alias("n_tokens")
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        with_cum.select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor(
                (F.col("cum_tokens") - F.col("n_tokens")) / PACK_BUDGET
            ).cast("long").alias("batch_id"),
        )
        .orderBy("source", "doc_id")
    )


PACK_BATCHES_SQL = rf"""
WITH sized AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                         t -> t <> '')) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM sized
)
SELECT doc_id, source, n_tokens,
       CAST(FLOOR((cum_tokens - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS batch_id
FROM cum
ORDER BY source, doc_id
"""


# ------------------------------------------- end-to-end curation gate
CURATE_MIN_QUALITY = 0.6
CURATE_LANG = "en"


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed admission gate an LLM ingest runs per batch:
    quality score ≥ threshold AND predicted language AND exact-dedup
    survivor — three existing registry operators chained into ONE
    lazy plan (Catalyst sees the whole composition: the three
    documents scans share the cached relation, filters push into each
    branch, and the id-joins are plain equality shuffles).

    Composition, not reimplementation: any fix to text_quality /
    text_langid / dedup_exact flows through here automatically, and
    the oracle composes the same three SQL bodies as CTEs.
    """
    from cgtcalc_data_transformer_spark.operators import dedup, textops

    quality = textops.text_quality(spark, sf_dir).select("doc_id", "quality_score")
    lang = textops.text_langid(spark, sf_dir).select("doc_id", "pred_lang")
    survivors = dedup.dedup_exact(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    return (
        quality.join(lang, "doc_id")
        .join(survivors, "doc_id")
        # filter on the ROUNDED score: that is the operator's public
        # output (and what the composed oracle filters on)
        .filter(
            (F.col("quality_score") >= CURATE_MIN_QUALITY)
            & (F.col("pred_lang") == CURATE_LANG)
        )
        .select("doc_id", "pred_lang", "quality_score")
        .orderBy("doc_id")
    )


def _curate_sql() -> str:
    from cgtcalc_data_transformer_spark.operators import dedup, textops

    return f"""
WITH q AS ({textops.TEXT_QUALITY_SQL}),
     l AS ({textops.TEXT_LANGID_SQL}),
     d AS ({dedup.DEDUP_EXACT_SQL})
SELECT q.doc_id, l.pred_lang, q.quality_score
FROM q JOIN l USING (doc_id) JOIN d ON d.keep_doc_id = q.doc_id
WHERE q.quality_score >= {CURATE_MIN_QUALITY} AND l.pred_lang = '{CURATE_LANG}'
ORDER BY q.doc_id
"""


# --------------------------------------- temperature rebalance (langs)
RESAMPLE_BASE = 0.5  # keep-rate scale; rare langs saturate at 1.0


def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (the multilingual-LM
    upsampling recipe: keep-rate ∝ (N/n_lang)^(1/T) with T=2, capped
    at 1) with a per-language audit of the realized rate.

    Engine-portability note: the keep probability is deliberately
    ``min(1, BASE·sqrt(N/n_l))`` — per-language only, never normalized
    across languages. A cross-language normalizer sums doubles whose
    accumulation order differs between engines; sqrt and the division
    of two exact integers are correctly-rounded IEEE ops, so this form
    is bit-identical in Spark and DuckDB and the per-doc keep decision
    (md5 bucket < p·10^6) never straddles an ulp.

    Scale shape: pass 1 is a partial-agg language count (a few rows);
    pass 2 re-scans docs, broadcast-joins the rates on lang, and
    reduces to the audit — no shuffle of the doc texts, no RNG state,
    append-stable keeps. No reference analog (the reference ingests
    broker CSVs whole, `index.js:19-31`).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    lang_counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = docs.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    rates = lang_counts.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        F.least(
            F.lit(1.0),
            F.lit(RESAMPLE_BASE)
            * F.sqrt(F.col("n_total").cast("double") / F.col("n_docs").cast("double")),
        ).alias("p_keep"),
    )
    kept = hash_bucket(F.col("doc_id"), 1000000).cast("double") < (
        F.col("p_keep") * F.lit(1000000.0)
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.round(F.max("p_keep"), 6).alias("p_keep"),
            F.sum(kept.cast("long")).alias("n_kept"),
        )
        .withColumn(
            "realized_rate", F.round(F.col("n_kept") / F.col("n_docs"), 6)
        )
        .orderBy("lang")
    )


TEMPERATURE_RESAMPLE_SQL = f"""
WITH lc AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
),
tot AS (SELECT COUNT(*) AS n_total FROM documents),
rates AS (
  SELECT lang, n_docs,
         LEAST(1.0, {RESAMPLE_BASE} * sqrt(CAST(n_total AS DOUBLE) / CAST(n_docs AS DOUBLE))) AS p_keep
  FROM lc, tot
)
SELECT d.lang,
       MAX(r.n_docs) AS n_docs,
       ROUND(MAX(r.p_keep), 6) AS p_keep,
       CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 1000000 AS DOUBLE)
                          < r.p_keep * 1000000.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(SUM(CASE WHEN CAST(('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 1000000 AS DOUBLE)
                           < r.p_keep * 1000000.0
                      THEN 1 ELSE 0 END) / MAX(r.n_docs), 6) AS realized_rate
FROM documents d JOIN rates r USING (lang)
GROUP BY d.lang
ORDER BY d.lang
"""


# ------------------------------------------------ per-source frequency cap
CAP_PER_SOURCE = 40  # max docs admitted per source


def cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency capping: admit at most K docs per source, chosen by a
    deterministic hash order (NOT arrival order — append-stable and
    engine-portable), audited per source.

    The head-of-crawl problem this solves: a handful of giant sources
    (one domain, one dump) otherwise dominate the token budget. The
    per-group selection is a rank over (source, md5-order) — one
    shuffle on source; skew-safe because rank's window frames never
    exceed a partition's own group, and sources at 100 TB are many.
    The audit output keeps the result small and hash-checkable: the
    admitted count, the cap, and an order-independent digest of WHICH
    docs were admitted (sum of admitted doc_ids — any selection drift
    flips it).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    from pyspark.sql import Window

    order_key = F.md5(F.col("doc_id").cast("string"))
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(order_key, "doc_id")
    )
    ranked = docs.withColumn("rn", rn)
    admitted = F.col("rn") <= CAP_PER_SOURCE
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(admitted.cast("long")).alias("n_admitted"),
            F.sum(F.when(admitted, F.col("doc_id")).otherwise(F.lit(0))).alias(
                "admitted_id_sum"
            ),
        )
        .withColumn("capped", F.col("n_docs") > F.lit(CAP_PER_SOURCE))
        .orderBy("source")
    )


CAP_PER_SOURCE_SQL = f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn <= {CAP_PER_SOURCE} THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       CAST(SUM(CASE WHEN rn <= {CAP_PER_SOURCE} THEN doc_id ELSE 0 END) AS BIGINT) AS admitted_id_sum,
       COUNT(*) > {CAP_PER_SOURCE} AS capped
FROM ranked
GROUP BY source
ORDER BY source
"""


# --------------------------------------------- segment-level dedup
SEG_TOKENS = 8  # pseudo-paragraph width (synthetic docs have no \n\n)


def segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup at SEGMENT granularity — the CCNet recipe:
    hash fixed spans (here 8-token windows standing in for the
    paragraphs the synthetic corpus lacks) and measure how much of
    each source is text that also appears in OTHER documents. Doc-
    level dedup misses this entirely: two distinct docs sharing one
    boilerplate paragraph are untouched by any whole-doc fingerprint.

    Plan: tokenize once, integer-div positions into segments, rebuild
    each segment's text inside the doc-partitioned window shuffle the
    tokenizer already pays, md5 the segment, then ONE aggregation per
    granularity: segment-text → distinct-doc count (map-side
    combinable), joined back and rolled up per source. No pairwise
    doc×doc anything.
    """
    from pyspark.sql import Window

    docs = scatter(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    tok = docs.select(
        "doc_id",
        "source",
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("pos", "tok"),
    )
    segs = (
        tok.withColumn("seg_no", F.floor(F.col("pos") / SEG_TOKENS))
        .groupBy("doc_id", "source", "seg_no")
        .agg(
            F.md5(F.array_join(F.array_sort(F.collect_list(F.struct("pos", "tok"))).tok, " ")).alias(
                "seg_hash"
            ),
            F.count(F.lit(1)).alias("seg_len"),
        )
        .filter(F.col("seg_len") == SEG_TOKENS)  # drop ragged tails
    )
    cross_doc = segs.groupBy("seg_hash").agg(
        F.countDistinct("doc_id").alias("n_docs_with_seg")
    )
    return (
        segs.join(cross_doc, "seg_hash")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_segments"),
            F.sum((F.col("n_docs_with_seg") > 1).cast("long")).alias("n_dup_segments"),
        )
        .withColumn(
            "dup_fraction", F.round(F.col("n_dup_segments") / F.col("n_segments"), 6)
        )
        .orderBy("source")
    )


SEGMENT_DEDUP_SQL = rf"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     t -> t <> '') AS w
  FROM documents
), segs AS (
  SELECT doc_id, source,
         md5(array_to_string(w[(s.seg * {SEG_TOKENS} + 1):(s.seg * {SEG_TOKENS} + {SEG_TOKENS})], ' ')) AS seg_hash
  FROM toks,
       LATERAL (SELECT unnest(range(0, CAST(floor(len(w) / {SEG_TOKENS}) AS BIGINT))) AS seg) s
), cross_doc AS (
  SELECT seg_hash, COUNT(DISTINCT doc_id) AS n_docs_with_seg FROM segs GROUP BY 1
)
SELECT source,
       CAST(COUNT(DISTINCT s.doc_id) AS BIGINT) AS n_docs,
       COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN c.n_docs_with_seg > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments,
       ROUND(SUM(CASE WHEN c.n_docs_with_seg > 1 THEN 1 ELSE 0 END) / COUNT(*), 6) AS dup_fraction
FROM segs s JOIN cross_doc c USING (seg_hash)
GROUP BY source
ORDER BY source
"""


# --------------------------------- DSIR-style importance resampling
# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score every raw document by how much more likely
# its hashed n-gram features are under a small TARGET domain than
# under the RAW corpus distribution, then keep the top-K. The public
# recipe hashes features into a small bucket space so both
# distributions are dense multinomials — no vocabulary state.
DSIR_BUCKETS = 64          # hashed feature space (public DSIR uses 10k)
DSIR_TARGET_SOURCE = "src0"  # the "curated domain" exemplar slice
DSIR_KEEP = 150            # top-K admitted documents


def dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K documents by hashed-unigram importance weight
    log p_target(d) − log p_corpus(d).

    Engine-exactness: the only libm calls are the 2·B per-BUCKET
    ``ln`` evaluations; each per-bucket log-ratio is quantized to an
    INTEGER λ = floor(x·1e8 + 0.5) (the emb_quantize recipe — NOT
    round(double, 8), whose shortest-repr-vs-binary tie behavior
    differs between engines), so the per-document score Σ c_b·λ_b is
    exact BIGINT arithmetic — partition/visit order cannot drift it.
    The final /1e8 is one correctly-rounded IEEE division. Smoothing
    is +1 on counts, +B on totals: every probability is a ratio of
    exact integers.

    Plan shape (100 TB): one tokenize+explode pass → per-(doc,
    bucket) counts (the only corpus-sized shuffle, map-side partial);
    the two distributions are B-row aggregates with 1-row scalar
    totals crossJoined on (bounded broadcast); the λ table joins back
    broadcast, and the final top-K compiles to TakeOrderedAndProject
    — never a global sort.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")), " "
            )
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    feat = toks.select(
        "doc_id", "source", hash_bucket(F.col("tok"), DSIR_BUCKETS).alias("b")
    )
    # CACHED (r14 plan audit): corpus, target and the scored rollup
    # reference doc_counts 3x, and corpus/target each feed both λ and
    # their scalar totals — the old comment said "cache" but no cache
    # was applied, so the plan re-ran the tokenize+explode pass 4x
    # (plans/r14/dsir_importance_resample_before.txt; guide §2.4).
    doc_counts = feat.groupBy("doc_id", "source", "b").agg(
        F.count(F.lit(1)).alias("c")
    ).cache()
    # corpus + target bucket distributions (B rows; cached — each
    # feeds the λ join AND its scalar total)
    corpus = doc_counts.groupBy("b").agg(F.sum("c").alias("cs")).cache()
    target = (
        doc_counts.filter(F.col("source") == DSIR_TARGET_SOURCE)
        .groupBy("b")
        .agg(F.sum("c").alias("ct"))
        .cache()
    )
    n_s = corpus.agg(F.sum("cs").alias("ns"))
    n_t = target.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    lam = (
        corpus.join(target, "b", "left")
        .crossJoin(F.broadcast(n_s))
        .crossJoin(F.broadcast(n_t))
        .select(
            "b",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                        / (F.col("nt") + DSIR_BUCKETS)
                    )
                    - F.log(
                        (F.col("cs") + 1).cast("double")
                        / (F.col("ns") + DSIR_BUCKETS)
                    )
                )
                * 1e8
                + 0.5
            )
            .cast("long")
            .alias("lam"),
        )
    )
    scored = (
        doc_counts.join(F.broadcast(lam), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").alias("n_toks"),
            F.sum(F.col("c") * F.col("lam")).alias("logw_int"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "source",
            "n_toks",
            (F.col("logw_int") / F.lit(1e8)).alias("log_weight"),
        )
        .orderBy(F.desc("log_weight"), "doc_id")
        .limit(DSIR_KEEP)
    )


DSIR_SQL = rf"""
WITH toks AS (
  SELECT doc_id, source, tok
  FROM (
    SELECT doc_id, source,
           unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
    FROM documents)
  WHERE tok <> ''
), feat AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(tok), 1, 8))::UBIGINT::BIGINT % {DSIR_BUCKETS} AS b
  FROM toks
), doc_counts AS (
  SELECT doc_id, source, b, COUNT(*) AS c FROM feat GROUP BY 1, 2, 3
), corpus AS (
  SELECT b, CAST(SUM(c) AS BIGINT) AS cs FROM doc_counts GROUP BY b
), target AS (
  SELECT b, CAST(SUM(c) AS BIGINT) AS ct FROM doc_counts
  WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY b
), tot AS (
  SELECT (SELECT CAST(SUM(cs) AS BIGINT) FROM corpus) AS ns,
         (SELECT COALESCE(CAST(SUM(ct) AS BIGINT), 0) FROM target) AS nt
), lam AS (
  SELECT corpus.b,
         CAST(floor((ln((COALESCE(target.ct, 0) + 1) / CAST(tot.nt + {DSIR_BUCKETS} AS DOUBLE))
                     - ln((corpus.cs + 1) / CAST(tot.ns + {DSIR_BUCKETS} AS DOUBLE))) * 1e8
                    + 0.5) AS BIGINT) AS lam
  FROM corpus LEFT JOIN target USING (b) CROSS JOIN tot
), scored AS (
  SELECT d.doc_id, d.source,
         CAST(SUM(d.c) AS BIGINT) AS n_toks,
         CAST(SUM(d.c * l.lam) AS BIGINT) AS logw_int
  FROM doc_counts d JOIN lam l USING (b)
  GROUP BY 1, 2
)
SELECT doc_id, source, n_toks,
       logw_int / 1e8 AS log_weight
FROM scored
ORDER BY log_weight DESC, doc_id
LIMIT {DSIR_KEEP}
"""


# ------------------------------------- per-source fair quality filter
FAIR_DROP_FRACTION = 0.2  # drop the bottom 20% of each source


def quality_fair_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rank-normalized quality filtering: every document is
    ranked WITHIN its source by the composite quality score and the
    bottom FAIR_DROP_FRACTION of each source is dropped — the
    batch-effect-safe form of quality filtering. A single global
    threshold silently deletes whole sources whose scorer calibration
    differs (one source's median is another's floor); rank
    normalization removes exactly the same fraction everywhere, so
    the corpus mixture is preserved.

    Engine-exactness: percent_rank is (rank-1)/(n-1) — exact integers
    and one correctly-rounded division, identical in DuckDB; ranking
    ties break on doc_id. Plan: one window shuffle partitioned BY
    SOURCE (never a global sort) over the quality projection.

    Singleton sources are kept: percent_rank of a 1-row partition is
    0.0, which would otherwise drop 100% of a single-document source —
    the exact batch effect this operator exists to prevent (ADVICE r4).
    """
    from cgtcalc_data_transformer_spark.operators import textops
    from pyspark.sql import Window

    quality = textops.text_quality(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy("quality_score", "doc_id")
    w_n = Window.partitionBy("source")
    return (
        quality.join(src, "doc_id")
        .withColumn("q_rank", F.row_number().over(w))
        .withColumn("pct_rank", F.percent_rank().over(w))
        .withColumn("n_src", F.count(F.lit(1)).over(w_n))
        .select(
            "doc_id",
            "source",
            "quality_score",
            "q_rank",
            "pct_rank",
            (
                (F.col("n_src") == 1)
                | (F.col("pct_rank") >= FAIR_DROP_FRACTION)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


def _quality_fair_sql() -> str:
    from cgtcalc_data_transformer_spark.operators.textops import TEXT_QUALITY_SQL

    return f"""
WITH q AS (
  SELECT doc_id, quality_score FROM ({TEXT_QUALITY_SQL})
), ranked AS (
  SELECT q.doc_id, d.source, q.quality_score,
         ROW_NUMBER() OVER w AS q_rank,
         PERCENT_RANK() OVER w AS pct_rank,
         COUNT(*) OVER (PARTITION BY d.source) AS n_src
  FROM q JOIN documents d USING (doc_id)
  WINDOW w AS (PARTITION BY d.source ORDER BY q.quality_score, q.doc_id)
)
SELECT doc_id, source, quality_score, q_rank, pct_rank,
       (n_src = 1 OR pct_rank >= {FAIR_DROP_FRACTION}) AS keep
FROM ranked
ORDER BY doc_id
"""


QUALITY_FAIR_SQL = _quality_fair_sql()


# ----------------------------- MinHash benchmark contamination
# Banding: 12 minhashes as 12 single-row bands — a train doc becomes
# a candidate against a bench doc iff ANY minhash agrees. At 5-gram
# granularity P(candidate) = 1-(1-j)^12, so even j~0.2 partial
# contamination surfaces with ~93% probability, vs the steep j^3
# curve of the dedup-tuned 4x3 banding; recall is the point for a
# contamination gate, and the exact containment verify keeps
# precision. The band count is the recall/cost dial at 100 TB.
CONTAM_MH_K = 12


def contamination_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-based benchmark contamination at n-gram granularity —
    the probabilistic companion of ``contamination_check``'s exact
    join. Signatures (min(md5(shingle||seed)), CONTAM_N-grams) for
    every doc; train x bench candidates from single-hash band
    collisions; candidates verified with EXACT containment
    |train ∩ bench| / |train| — the directional measure that flags a
    doc which swallowed an eval item whole even when Jaccard is
    diluted by surrounding text.

    Scale shape: signature is one map-side-combinable groupBy over
    the shingle rows already shuffled by doc_id; banding turns
    train x bench into equality joins on (band, hash); only the
    candidate pairs — bounded by actual signature agreement — pay
    the exact verify. The bench side is eval-sized (~5%), so its
    postings broadcast in practice. Verify stage (r14, the
    `_pair_overlap` discipline from operators/dedup.py — guide §2.3
    "shuffle fewer bytes"): shingles aggregate ONCE into a bounded
    per-doc set per side and candidates equality-join to those rows;
    the containment numerator is `size(array_intersect(...))` per
    pair JVM-side. The pre-r14 shape joined candidates against the
    EXPLODED shingle rows — |cands| x avg_shingles shuffled rows, the
    exact pattern that made simjoin_prefix super-linear at sf1 —
    now it is |cands| + |docs| rows. Exactness: shingle_rows is
    DISTINCT per doc, so set cardinalities equal the old join-count
    aggregates; zero-overlap pairs get 0 from the empty intersection
    (the old LEFT join + coalesce). Plans:
    plans/r14/contamination_minhash_{before,after}.txt.
    """
    from cgtcalc_data_transformer_spark.operators.dedup import shingle_rows

    docs = scatter(load_table(spark, sf_dir, "documents"))
    is_bench = hash_bucket(F.col("doc_id")) < CONTAM_BENCH_PCT
    sh = shingle_rows(docs, n=CONTAM_N).withColumn(
        "is_bench", is_bench
    ).cache()
    sig = sh.groupBy("doc_id", "is_bench").agg(
        *[
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#seed{k}")))).alias(
                f"h{k}"
            )
            for k in range(CONTAM_MH_K)
        ]
    )
    banded = sig.select(
        "doc_id",
        "is_bench",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"), F.col(f"h{k}").alias("hval")
                    )
                    for k in range(CONTAM_MH_K)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "is_bench", "bh.band", "bh.hval")
    cands = (
        banded.filter(~F.col("is_bench"))
        .alias("t")
        .join(
            banded.filter(F.col("is_bench")).alias("b"),
            (F.col("t.band") == F.col("b.band"))
            & (F.col("t.hval") == F.col("b.hval")),
        )
        .select(
            F.col("t.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("bench_doc_id"),
        )
        .distinct()
    )
    train_sets = (
        sh.filter(~F.col("is_bench"))
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("t_set"))
        .select(
            "doc_id",
            "t_set",
            # cast to long: the pre-r14 shape produced count(*) longs
            F.size("t_set").cast("long").alias("n_sh"),
        )
    )
    bench_sets = (
        sh.filter(F.col("is_bench"))
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("b_set"))
        .select(F.col("doc_id").alias("bench_doc_id"), "b_set")
    )
    ratio = F.round(F.col("n_overlap") / F.col("n_sh"), 6)
    return (
        cands.join(train_sets, "doc_id")
        .join(bench_sets, "bench_doc_id")
        .select(
            "doc_id",
            "bench_doc_id",
            "n_sh",
            F.size(F.array_intersect("t_set", "b_set"))
            .cast("long")
            .alias("n_overlap"),
        )
        .select(
            "doc_id",
            "bench_doc_id",
            "n_sh",
            "n_overlap",
            ratio.alias("containment"),
            (ratio >= CONTAM_THRESHOLD).alias("contaminated"),
        )
        .orderBy("doc_id", "bench_doc_id")
    )


def _contam_mh_sql() -> str:
    sig_cols = ",\n         ".join(
        f"MIN(md5(shingle || '#seed{k}')) AS h{k}" for k in range(CONTAM_MH_K)
    )
    cand_unions = "\n  UNION\n".join(
        f"""  SELECT t.doc_id AS doc_id, b.doc_id AS bench_doc_id
  FROM sig t JOIN sig b ON NOT t.is_bench AND b.is_bench AND t.h{k} = b.h{k}"""
        for k in range(CONTAM_MH_K)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100
           < {CONTAM_BENCH_PCT} AS is_bench,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     t -> t <> '') AS w
  FROM documents
), shingled AS (
  SELECT doc_id, is_bench,
         CASE WHEN len(w) >= {CONTAM_N}
              THEN list_distinct([array_to_string(w[i:i+{CONTAM_N - 1}], ' ')
                                  FOR i IN range(1, len(w) - {CONTAM_N - 2})])
              ELSE [] END AS shingles
  FROM toks
), exploded AS (
  SELECT doc_id, is_bench, unnest(shingles) AS shingle
  FROM shingled WHERE len(shingles) > 0
), sig AS (
  SELECT doc_id, is_bench,
         {sig_cols}
  FROM exploded GROUP BY doc_id, is_bench
), cands AS (
{cand_unions}
), inter AS (
  SELECT c.doc_id, c.bench_doc_id, COUNT(*) AS n_overlap
  FROM cands c
  JOIN exploded t ON t.doc_id = c.doc_id
  JOIN exploded b ON b.doc_id = c.bench_doc_id AND b.shingle = t.shingle
  GROUP BY c.doc_id, c.bench_doc_id
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM exploded WHERE NOT is_bench GROUP BY doc_id
)
SELECT c.doc_id, c.bench_doc_id, s.n_sh,
       COALESCE(i.n_overlap, 0) AS n_overlap,
       ROUND(COALESCE(i.n_overlap, 0) / s.n_sh, 6) AS containment,
       ROUND(COALESCE(i.n_overlap, 0) / s.n_sh, 6) >= {CONTAM_THRESHOLD}
         AS contaminated
FROM cands c
LEFT JOIN inter i USING (doc_id, bench_doc_id)
JOIN sizes s ON s.doc_id = c.doc_id
ORDER BY c.doc_id, c.bench_doc_id
"""


CONTAM_MINHASH_SQL = _contam_mh_sql()


# ------------------------------------ Gopher-style quality rule gate
# Rule thresholds after Rae et al. 2021 (Gopher, arXiv:2112.11446
# table A1), adapted to the corpus scale: each rule is an INTEGER
# comparison (mean bounds cross-multiplied), so the gate is exact
# cross-engine with no float in any predicate.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3   # mean word length bounds (chars)
GOPHER_MAX_MEAN_WL = 10
GOPHER_MIN_STOPWORDS = 2  # distinct stopword hits required
GOPHER_MAX_SYMBOL_PER10 = 1  # '#'/'...' symbols per 10 words allowed


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule gate: named pass/fail heuristics per document
    (word-count bounds, mean-word-length bounds, stopword presence,
    symbol density), rolled up per source. ``text_quality``
    (textops.py) emits a continuous composite score; this is the
    hard-rule GATE a production pipeline runs first — each rule named
    so the rollup answers "what are we dropping and why".

    All predicates are integer arithmetic: mean-word-length bounds as
    sum_len vs bound*word_count cross-multiplications, symbol density
    as 10*symbols vs word_count — no division anywhere until the one
    display ratio. Zero-shuffle per-doc scan + one rollup aggregation.
    """
    from cgtcalc_data_transformer_spark.operators.dedup import tokens_col
    from cgtcalc_data_transformer_spark.operators.textops import STOPWORDS

    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = tokens_col(F.col("text"))
    wc = F.size(toks)
    sum_len = F.length(F.concat_ws("", toks))  # total token chars
    n_stop = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS]))
    )  # distinct stopwords present
    n_sym = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"#|\.\.\."), 0)
    )
    flags = docs.select(
        "source",
        (
            (wc >= GOPHER_MIN_WORDS) & (wc <= GOPHER_MAX_WORDS)
        ).alias("ok_words"),
        (
            (sum_len >= GOPHER_MIN_MEAN_WL * wc)
            & (sum_len <= GOPHER_MAX_MEAN_WL * wc)
        ).alias("ok_mean_wl"),
        (n_stop >= GOPHER_MIN_STOPWORDS).alias("ok_stopwords"),
        (n_sym * 10 <= wc * GOPHER_MAX_SYMBOL_PER10).alias("ok_symbols"),
    )
    pass_all = (
        F.col("ok_words")
        & F.col("ok_mean_wl")
        & F.col("ok_stopwords")
        & F.col("ok_symbols")
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((~F.col("ok_words")).cast("long")).alias("fail_words"),
            F.sum((~F.col("ok_mean_wl")).cast("long")).alias("fail_mean_wl"),
            F.sum((~F.col("ok_stopwords")).cast("long")).alias(
                "fail_stopwords"
            ),
            F.sum((~F.col("ok_symbols")).cast("long")).alias("fail_symbols"),
            F.sum(pass_all.cast("long")).alias("n_pass"),
        )
        .withColumn(
            "pass_rate", F.round(F.col("n_pass") / F.col("n_docs"), 6)
        )
        .orderBy("source")
    )


def _gopher_sql() -> str:
    from cgtcalc_data_transformer_spark.operators.textops import STOPWORDS

    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return rf"""
WITH t AS (
  SELECT source,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     x -> x <> '') AS toks,
         len(regexp_extract_all(text, '#|\.\.\.')) AS n_sym
  FROM documents
), f AS (
  SELECT source,
         len(toks) AS wc,
         length(array_to_string(toks, '')) AS sum_len,
         len(list_intersect(toks, {stop_list})) AS n_stop,
         n_sym
  FROM t
), flags AS (
  SELECT source,
         wc >= {GOPHER_MIN_WORDS} AND wc <= {GOPHER_MAX_WORDS} AS ok_words,
         sum_len >= {GOPHER_MIN_MEAN_WL} * wc
           AND sum_len <= {GOPHER_MAX_MEAN_WL} * wc AS ok_mean_wl,
         n_stop >= {GOPHER_MIN_STOPWORDS} AS ok_stopwords,
         n_sym * 10 <= wc * {GOPHER_MAX_SYMBOL_PER10} AS ok_symbols
  FROM f
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN NOT ok_words THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
       CAST(SUM(CASE WHEN NOT ok_mean_wl THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_wl,
       CAST(SUM(CASE WHEN NOT ok_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopwords,
       CAST(SUM(CASE WHEN NOT ok_symbols THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbols,
       CAST(SUM(CASE WHEN ok_words AND ok_mean_wl AND ok_stopwords AND ok_symbols
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       ROUND(SUM(CASE WHEN ok_words AND ok_mean_wl AND ok_stopwords AND ok_symbols
                 THEN 1 ELSE 0 END) / COUNT(*), 6) AS pass_rate
FROM flags
GROUP BY source
ORDER BY source
"""


GOPHER_QUALITY_SQL = _gopher_sql()


# ------------------------------------- per-domain source extraction
# The synthetic corpus carries no URL column, so one is DERIVED
# deterministically (both engines build the identical string) and the
# OPERATOR under test is the web-pipeline extraction+rollup itself:
# host/path parsing, registered-domain grouping, per-domain stats.
_TLD_BY_LANG = {"en": "com", "de": "de", "fr": "fr", "es": "es", "zh": "cn"}


def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain crawl statistics — the "what did we ingest, from
    where" rollup every web-scale corpus needs before mixing: docs,
    distinct subdomains and path prefixes, char volume per registered
    domain. Host comes from Spark's ``parse_url`` builtin (JVM-side
    codegen); the registered domain is the last two host labels
    (``substring_index(host, '.', -2)``); the oracle replays the same
    extraction with regexes.

    Scale shape: URL synthesis + parsing is row-local codegen inside
    the scan; ONE map-side-combinable aggregation on the domain key.
    At 100 TB the domain key is heavy-tailed (real crawls: ~50% of
    docs under a few thousand domains) — the count-distinct on
    subdomains is the shuffle to watch; swap in approx_count_distinct
    per the agg_approx pattern when exactness isn't required.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    tld = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(t))
            for lang, t in _TLD_BY_LANG.items()
        ],
        F.lit("org"),
    )
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example."),
        tld,
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit(".html"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    path = F.parse_url(url, F.lit("PATH"))
    domain = F.substring_index(host, ".", -2)
    subdomain = F.substring_index(host, ".", 1)
    section = F.regexp_extract(path, r"^/([^/]+)/", 1)
    ext = F.regexp_extract(path, r"\.([a-z0-9]+)$", 1)
    return (
        docs.select(
            domain.alias("domain"),
            subdomain.alias("subdomain"),
            section.alias("section"),
            ext.alias("ext"),
            "n_chars",
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("subdomain").alias("n_subdomains"),
            F.countDistinct("section").alias("n_sections"),
            F.countDistinct("ext").alias("n_exts"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.sum("n_chars") / F.count(F.lit(1)), 6).alias(
                "avg_chars"
            ),
        )
        .orderBy("domain")
    )


def _domain_stats_sql() -> str:
    tld_case = " ".join(
        f"WHEN '{lang}' THEN '{t}'" for lang, t in _TLD_BY_LANG.items()
    )
    return rf"""
WITH urls AS (
  SELECT 'https://' || source || '.example.' ||
         (CASE lang {tld_case} ELSE 'org' END) ||
         '/' || lang || '/doc-' || doc_id || '.html' AS url,
         n_chars
  FROM documents
), parsed AS (
  SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
         regexp_extract(url, '^https://[^/]+(/.*)$', 1) AS path,
         n_chars
  FROM urls
), parts AS (
  SELECT array_to_string(string_split(host, '.')[-2:], '.') AS domain,
         string_split(host, '.')[1] AS subdomain,
         regexp_extract(path, '^/([^/]+)/', 1) AS section,
         regexp_extract(path, '\.([a-z0-9]+)$', 1) AS ext,
         n_chars
  FROM parsed
)
SELECT domain,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT subdomain) AS n_subdomains,
       COUNT(DISTINCT section) AS n_sections,
       COUNT(DISTINCT ext) AS n_exts,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(SUM(n_chars) / COUNT(*), 6) AS avg_chars
FROM parts
GROUP BY domain
ORDER BY domain
"""


DOMAIN_STATS_SQL = _domain_stats_sql()


# ------------------------------------------ source vocabulary overlap
def source_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between every pair of ingest
    sources — the redundancy map a curation pipeline draws before
    setting mix weights: two feeds with near-1 vocabulary overlap are
    probably mirrors of each other (candidates for source-level
    dedup), near-0 means genuinely complementary coverage.
    `source_divergence` measures distributional *shape* on a fixed
    panel; this measures set overlap across ALL sources.

    Plan shape: one tokenize pass collapsed to distinct
    (source, token) with map-side partial dedup; per-source vocab
    sizes are a bounded aggregate (|sources| rows, broadcast twice);
    the intersection is ONE equality self-join on token. Per-token
    fan-out is bounded by |sources|² — the join output is
    intersection-sized, never corpus-sized. Jaccard from exact
    integers, rounded for display.
    """
    from cgtcalc_data_transformer_spark.operators.dedup import tokens_col

    docs = scatter(load_table(spark, sf_dir, "documents"))
    vocab = (
        docs.select("source", F.explode(tokens_col(F.col("text"))).alias("tok"))
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n_vocab"))
    inter = (
        vocab.alias("a")
        .join(
            vocab.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("source", "source_a")).withColumnRenamed(
                "n_vocab", "vocab_a"
            ),
            "source_a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("source", "source_b")).withColumnRenamed(
                "n_vocab", "vocab_b"
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "n_inter",
            F.round(
                F.col("n_inter")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


SOURCE_OVERLAP_SQL = r"""
WITH vocab AS (
  SELECT DISTINCT source, tok
  FROM (SELECT source,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents)
), sizes AS (
  SELECT source, COUNT(*) AS n_vocab FROM vocab GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_inter
  FROM vocab a JOIN vocab b
    ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b,
       sa.n_vocab AS vocab_a, sb.n_vocab AS vocab_b, n_inter,
       ROUND(n_inter / (sa.n_vocab + sb.n_vocab - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
ORDER BY source_a, source_b
"""
