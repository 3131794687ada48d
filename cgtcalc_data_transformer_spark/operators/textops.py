"""Text-analysis operators over the ``documents`` table.

Language ID (marker-word heuristic), quality scoring, token counting
(whitespace + BPE-ish regex) and document fingerprinting — all as
pure column expressions (codegen, no UDFs) so they run at fact-table
scale, and all mirrored 1:1 in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.operators.dedup import tokens_col
from cgtcalc_data_transformer_spark.sources.tpch import load_table, scatter

# tiny high-frequency marker sets per language (public common words)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "a"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "is", "in", "it", "that", "on"]

# BPE-ish word/number/punct segmentation (GPT-2-style, simplified)
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


# --------------------------------------------------------- token stats
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """whitespace tokens, distinct tokens, BPE-ish piece count."""
    docs = scatter(load_table(spark, sf_dir, "documents"))
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    return docs.select(
        "doc_id",
        F.size(ws).alias("ws_tokens"),
        F.size(F.array_distinct(tokens_col(F.col("text")))).alias("distinct_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).alias("bpe_pieces"),
        F.length("text").alias("chars"),
    ).orderBy("doc_id")


TEXT_TOKEN_SQL = rf"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS ws_tokens,
       len(list_distinct(list_filter(
             string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
             t -> t <> ''))) AS distinct_tokens,
       len(regexp_extract_all(text, '{BPE_RE}')) AS bpe_pieces,
       length(text) AS chars
FROM documents
ORDER BY doc_id
"""


# ------------------------------------------------------ quality score
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword heuristics + composite score.

    score = 0.4·min(1, ws_tokens/50) + 0.3·stop_ratio·3 (capped 0.3)
            + 0.3·(1 − punct_ratio), rounded to 6.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    toks = tokens_col(F.col("text"))
    n_tok = F.size(toks)
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    )
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^\w\s]"), 0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.length("text") > 0, n_punct / F.length("text")
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), F.size(ws) / F.lit(50.0))
        + F.least(F.lit(0.3), F.lit(0.9) * stop_ratio)
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
    )
    return docs.select(
        "doc_id",
        F.size(ws).alias("ws_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality_score"),
    ).orderBy("doc_id")


_STOP_LIST_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

TEXT_QUALITY_SQL = rf"""
WITH t AS (
  SELECT doc_id, text,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_ws,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     x -> x <> '') AS toks,
         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
  FROM documents
), r AS (
  SELECT doc_id, n_ws,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> list_contains({_STOP_LIST_SQL}, x))) / len(toks)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(text) > 0 THEN n_punct / length(text) ELSE 0.0 END AS punct_ratio
  FROM t
)
SELECT doc_id, n_ws AS ws_tokens,
       ROUND(stop_ratio, 6) AS stop_ratio,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(0.4 * least(1.0, n_ws / 50.0)
             + least(0.3, 0.9 * stop_ratio)
             + 0.3 * (1.0 - punct_ratio), 6) AS quality_score
FROM r
ORDER BY doc_id
"""


# -------------------------------------------------------- language ID
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language guess; 'und' when no markers hit.

    Distinct-token ∩ marker-set sizes per language, argmax with a
    fixed language order for ties.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = F.array_distinct(tokens_col(F.col("text")))
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        pred = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(pred)
    return docs.select("doc_id", "lang", pred.alias("pred_lang")).orderBy("doc_id")


def _markers_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"


TEXT_LANGID_SQL = rf"""
WITH t AS (
  SELECT doc_id, lang,
         list_distinct(list_filter(
           string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
           x -> x <> '')) AS toks
  FROM documents
), s AS (
  SELECT doc_id, lang,
         len(list_intersect(toks, {_markers_sql('en')})) AS s_en,
         len(list_intersect(toks, {_markers_sql('es')})) AS s_es,
         len(list_intersect(toks, {_markers_sql('de')})) AS s_de,
         len(list_intersect(toks, {_markers_sql('fr')})) AS s_fr
  FROM t
)
SELECT doc_id, lang,
       CASE
         WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
         WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
         WHEN s_fr > 0 THEN 'fr'
         ELSE 'und'
       END AS pred_lang
FROM s
ORDER BY doc_id
"""


# ------------------------------------------------------------ tf-idf
TFIDF_TOP_K = 3


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    Classic two-aggregate shape: term counts per doc (one shuffle on
    (doc, term)) ⋈ document frequency per term ⋈ doc sizes; idf =
    ln(N/df) in double on identical inputs. No broadcast hint on the
    doc-frequency side: vocabulary grows with the corpus (Heaps' law),
    so the size-based planner must be free to shuffle-join it at
    scale. Ranking window partitions by doc.
    """
    from pyspark.sql import Window

    docs = scatter(load_table(spark, sf_dir, "documents"))
    n_docs = docs.count()  # scalar: one cheap count, folded as literal
    toks = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    term_counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    # doc total from a window over term_counts, NOT a second groupBy
    # over raw tokens: the (doc_id, tok) exchange is then byte-identical
    # in both branches and Catalyst reuses it (ReusedExchange), so the
    # corpus is tokenized ONCE. The window partition is bounded by a
    # single document's distinct terms — safe at any corpus scale.
    w_doc = Window.partitionBy("doc_id")
    sized = term_counts.withColumn("total", F.sum("cnt").over(w_doc))
    # document frequency: same reused exchange feeds the vocabulary agg;
    # the join stays size-based (vocabulary grows with the corpus —
    # Heaps' law — so no broadcast pin).
    doc_freq = term_counts.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = sized.join(doc_freq, "tok").select(
        "doc_id",
        "tok",
        F.round(
            (F.col("cnt") / F.col("total"))
            * F.log(F.lit(float(n_docs)) / F.col("df")),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "tok", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    )


TEXT_TFIDF_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
           x -> x <> '')) AS tok
  FROM documents
), tc AS (
  SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
), sizes AS (
  SELECT doc_id, COUNT(*) AS total FROM toks GROUP BY doc_id
), dfreq AS (
  SELECT tok, COUNT(*) AS df FROM tc GROUP BY tok
), n AS (
  SELECT COUNT(*)::DOUBLE AS n_docs FROM documents
), scored AS (
  SELECT tc.doc_id, tc.tok,
         ROUND((tc.cnt / sizes.total) * ln(n.n_docs / dfreq.df), 6) AS tfidf
  FROM tc JOIN sizes USING (doc_id) JOIN dfreq USING (tok), n
), ranked AS (
  SELECT doc_id, tok, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rank
  FROM scored
)
SELECT doc_id, tok, tfidf, rank FROM ranked
WHERE rank <= {TFIDF_TOP_K}
ORDER BY doc_id, rank
"""


# ------------------------------------------------- rolling hash
# polynomial fingerprint h = Σ tok_hash_i · B^(n-1-i)  (mod P) over the
# first MAX_FP_TOKENS tokens — order-SENSITIVE (unlike fp_token_bag)
FP_BASE = 131
FP_MOD = 1_000_000_007
MAX_FP_TOKENS = 4096

_POWERS: list[int] = [1] * MAX_FP_TOKENS
for _i in range(1, MAX_FP_TOKENS):
    _POWERS[_i] = (_POWERS[_i - 1] * FP_BASE) % FP_MOD


def rolling_hash_df(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text) → (doc_id, rolling_hash).

    Stays in whole-stage codegen: posexplode the (capped) token array,
    per-row term = tok_hash · B^(n-1-pos) mod P with the power table
    as a plan literal, then one groupBy-sum per doc — the classic
    "rolling hash as a distributed aggregation" shape. An F.aggregate
    fold would be the natural spelling but HOF lambdas are interpreted
    per element (≈40 µs each — minutes at sf0.1); this plan is pure
    codegen + one doc_id shuffle.
    """
    capped = F.slice(tokens_col(F.col("text")), 1, MAX_FP_TOKENS)
    exploded = docs.select(
        "doc_id",
        F.size(capped).alias("n"),
        F.posexplode_outer(capped).alias("pos", "tok"),
    )
    tok_hash = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    pow_arr = F.array(*[F.lit(p).cast("long") for p in _POWERS])
    term = F.pmod(tok_hash, F.lit(FP_MOD)) * F.element_at(
        pow_arr, (F.col("n") - F.col("pos")).cast("int")
    ) % F.lit(FP_MOD)
    return exploded.groupBy("doc_id").agg(
        F.coalesce(F.pmod(F.sum(term), F.lit(FP_MOD)), F.lit(0)).alias("rolling_hash")
    )


def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial (Rabin-Karp-style) document hash."""
    return rolling_hash_df(scatter(load_table(spark, sf_dir, "documents"))).orderBy("doc_id")


TEXT_ROLLING_SQL = rf"""
WITH RECURSIVE pows AS (
  SELECT 0 AS k, 1::BIGINT AS p
  UNION ALL
  SELECT k + 1, (p * {FP_BASE}) % {FP_MOD} FROM pows WHERE k < {MAX_FP_TOKENS - 1}
), toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     x -> x <> '')[1:{MAX_FP_TOKENS}] AS t
  FROM documents
), exploded AS (
  SELECT doc_id, len(t) AS n, unnest(t) AS tok,
         unnest(range(1, len(t) + 1)) AS pos
  FROM toks
), terms AS (
  SELECT doc_id,
         ((('0x' || substr(md5(tok), 1, 8))::UBIGINT::BIGINT % {FP_MOD})
           * pows.p) % {FP_MOD} AS term
  FROM exploded JOIN pows ON pows.k = n - pos
)
SELECT d.doc_id,
       CAST(COALESCE(s.h, 0) AS BIGINT) AS rolling_hash
FROM documents d
LEFT JOIN (SELECT doc_id, SUM(term) % {FP_MOD} AS h FROM terms GROUP BY doc_id) s
  ON d.doc_id = s.doc_id
ORDER BY d.doc_id
"""


# ----------------------------------------------------- fingerprinting
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two md5 fingerprints: normalized text, and the sorted distinct
    token bag (whitespace/punctuation/case-insensitive identity)."""
    docs = scatter(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    bag = F.array_join(F.array_sort(F.array_distinct(tokens_col(F.col("text")))), " ")
    return docs.select(
        "doc_id",
        F.md5(F.trim(norm)).alias("fp_normalized"),
        F.md5(bag).alias("fp_token_bag"),
    ).orderBy("doc_id")


TEXT_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_normalized,
       md5(array_to_string(list_sort(list_distinct(list_filter(
             string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
             x -> x <> ''))), ' ')) AS fp_token_bag
FROM documents
ORDER BY doc_id
"""


# -------------------------------------------------- chunking UDTF
CHUNK_TOKENS = 16  # tokens per training chunk


def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunks per document via a Python UDTF
    (lateral join) — the context-window chunking step of a training
    pipeline, one output row per chunk.

    The UDTF exercises the table-function API surface (the reference
    has no pluggable function surface at all, SURVEY.md §2.2);
    Arrow-batched (``useArrow``) so the exchange is columnar, not
    pickled rows. The same result is expressible with builtin
    slice/sequence list ops — which is the 100 TB shape (codegen, no
    Python workers); the UDTF form is the extensibility demo.
    """
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(
        returnType="chunk_idx int, chunk string, n_tokens int",
        useArrow=True,
    )
    class TokenChunk:
        def eval(self, text: str):  # noqa: ANN001 - UDTF protocol
            if text is None:
                return
            toks = [t for t in _re.split(r"\s+", text) if t]
            for i in range(0, len(toks), CHUNK_TOKENS):
                piece = toks[i : i + CHUNK_TOKENS]
                yield i // CHUNK_TOKENS, " ".join(piece), len(piece)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    spark.udtf.register("token_chunk", TokenChunk)
    docs.createOrReplaceTempView("docs_for_chunks")
    return spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM docs_for_chunks,
             LATERAL token_chunk(text) AS c
        ORDER BY doc_id, chunk_idx
        """
    )


# chunk_idx comes from the list position (indexed lambda / range), NOT
# a window over unnest output — unnest emission order is not a
# guaranteed ordering to window over.
TEXT_CHUNKS_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
  FROM documents
  WHERE doc_id < 50
), numbered AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, CAST(ceil(len(w) / {CHUNK_TOKENS}.0) AS BIGINT)),
           i -> struct_pack(
             chunk_idx := i,
             chunk := array_to_string(w[i * {CHUNK_TOKENS} + 1 : i * {CHUNK_TOKENS} + {CHUNK_TOKENS}], ' '),
             n_tokens := len(w[i * {CHUNK_TOKENS} + 1 : i * {CHUNK_TOKENS} + {CHUNK_TOKENS}])))) AS s
  FROM toks
  WHERE len(w) > 0
)
SELECT doc_id,
       CAST(s.chunk_idx AS INTEGER) AS chunk_idx,
       s.chunk AS chunk,
       CAST(s.n_tokens AS INTEGER) AS n_tokens
FROM numbered
ORDER BY doc_id, chunk_idx
"""


# ------------------------------------------- sparse doc-doc similarity
# TF-IDF cosine over an inverted index (posting-list self-join) — the
# sparse complement to the dense-embedding kNN/ANN operators in
# operators/similarity.py. The document-frequency cutoff is the scale
# lever: a term appearing in p documents fans out to p^2 candidate
# pairs in the self-join, so common terms (which carry near-zero idf
# anyway) are dropped BEFORE the join. The cap must be ABSOLUTE, not
# a corpus fraction: a fractional cap lets posting lists grow with N
# and the join is quadratic again (measured 131x wall for 10x data at
# sf1 before the absolute cap; 200-long lists bound every term to
# ≤ 40k pairs regardless of corpus size — the standard bound that
# keeps inverted-index similarity subquadratic on a 100 TB corpus).
DOC_SIM_TOP_K = 20
DF_MIN = 2            # a term in one doc can't create a pair
DF_FRACTION = 0.2     # small-corpus cap: >20% of docs ⇒ not discriminative
DF_ABS_MAX = 200      # scale cap: posting lists never exceed this


def doc_similarity_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 most similar document pairs by TF-IDF cosine.

    One tokenization shuffle on (doc_id, tok) reused for term counts,
    doc totals (window), and document frequency (ReusedExchange, same
    pattern as text_tfidf_top_terms). Norms are computed over the
    df-pruned vector space so the cosine is exact for the pruned
    vectors; the join is equality on tok — no broadcast pin, the
    vocabulary grows with the corpus.
    """
    from pyspark.sql import Window

    docs = scatter(load_table(spark, sf_dir, "documents"))
    n_docs = docs.count()  # scalar literal, like text_tfidf_top_terms
    df_max = max(DF_MIN, min(int(n_docs * DF_FRACTION), DF_ABS_MAX))

    toks = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    term_counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w_doc = Window.partitionBy("doc_id")
    sized = term_counts.withColumn("total", F.sum("cnt").over(w_doc))
    doc_freq = term_counts.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    weighted = (
        sized.join(doc_freq, "tok")
        .filter((F.col("df") >= DF_MIN) & (F.col("df") <= df_max))
        .select(
            "tok",
            "doc_id",
            (
                (F.col("cnt") / F.col("total"))
                * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("w"),
        )
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )

    a = weighted.select(
        F.col("tok"), F.col("doc_id").alias("doc_a"), F.col("w").alias("wa")
    )
    b = weighted.select(
        F.col("tok"), F.col("doc_id").alias("doc_b"), F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("norm").alias("norm_b"))
    scored = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6).alias(
                "cosine"
            ),
        )
    )
    return scored.orderBy(
        F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(DOC_SIM_TOP_K)


DOC_SIM_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
           x -> x <> '')) AS tok
  FROM documents
), tc AS (
  SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
), sizes AS (
  SELECT doc_id, COUNT(*) AS total FROM toks GROUP BY doc_id
), dfreq AS (
  SELECT tok, COUNT(*) AS df FROM tc GROUP BY tok
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), weighted AS (
  SELECT tc.tok, tc.doc_id,
         (tc.cnt / CAST(sizes.total AS DOUBLE))
           * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS w
  FROM tc JOIN sizes USING (doc_id) JOIN dfreq USING (tok), n
  WHERE dfreq.df >= {DF_MIN}
    AND dfreq.df <= greatest({DF_MIN},
                             least(CAST(floor(n.n_docs * {DF_FRACTION}) AS BIGINT), {DF_ABS_MAX}))
), norms AS (
  SELECT doc_id, sqrt(SUM(w * w)) AS norm FROM weighted GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
  FROM weighted a JOIN weighted b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(dot / (na.norm * nb.norm), 6) AS cosine
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
ORDER BY cosine DESC, doc_a ASC, doc_b ASC
LIMIT {DOC_SIM_TOP_K}
"""


# ------------------------------------------- character-level entropy
ENTROPY_SCALE = 10**6       # per-char-class term quantization
ENTROPY_LOW_BAR = 3.5       # bits; below = suspiciously repetitive


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy (bits) —
    the CCNet/Gopher-family "is this text or noise" signal: natural
    prose sits ~4 bits/char, while repeated boilerplate, padding, or
    generator loops collapse toward 0.

    H = log2(n) - (1/n)·Σ_c n_c·log2(n_c). The Σ over a doc's char
    classes is an AGGREGATION, so each class term is quantized
    floor(n_c·log2(n_c)·SCALE + 0.5) to an integer BEFORE the sum —
    the per-doc state is exact and engine-portable regardless of
    aggregation order. One explode (linear in corpus chars — at
    100 TB this is the mapper-side histogram you'd fold into the
    ingest scan), one (doc, char) agg that reuses the doc_id
    partitioning, one per-doc rollup.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    chars = docs.select(
        "doc_id", F.explode(F.regexp_extract_all(F.col("text"), F.lit("."), 0)).alias("ch")
    )
    per_class = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("n_c")
    )
    term_int = F.floor(
        F.col("n_c").cast("double")
        * F.log2(F.col("n_c").cast("double"))
        * F.lit(float(ENTROPY_SCALE))
        + F.lit(0.5)
    ).cast("long")
    per_doc = per_class.groupBy("doc_id").agg(
        F.sum("n_c").alias("n_chars"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(term_int).alias("t_int"),
    )
    entropy = F.log2(F.col("n_chars").cast("double")) - F.col("t_int") / (
        F.col("n_chars").cast("double") * F.lit(float(ENTROPY_SCALE))
    )
    return (
        per_doc.select(
            "doc_id",
            "n_chars",
            "n_classes",
            F.round(entropy, 6).alias("entropy_bits"),
            (entropy < F.lit(ENTROPY_LOW_BAR)).alias("low_entropy"),
        )
        .orderBy("doc_id")
    )


CHAR_ENTROPY_SQL = f"""
WITH chars AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch FROM documents
), per_class AS (
  SELECT doc_id, ch, COUNT(*) AS n_c FROM chars GROUP BY doc_id, ch
), per_doc AS (
  SELECT doc_id,
         CAST(SUM(n_c) AS BIGINT) AS n_chars,
         COUNT(*) AS n_classes,
         CAST(SUM(CAST(floor(CAST(n_c AS DOUBLE) * log2(CAST(n_c AS DOUBLE))
                             * {ENTROPY_SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS t_int
  FROM per_class GROUP BY doc_id
)
SELECT doc_id, n_chars, n_classes,
       ROUND(log2(CAST(n_chars AS DOUBLE))
             - t_int / (CAST(n_chars AS DOUBLE) * {ENTROPY_SCALE}.0), 6)
         AS entropy_bits,
       (log2(CAST(n_chars AS DOUBLE))
        - t_int / (CAST(n_chars AS DOUBLE) * {ENTROPY_SCALE}.0))
         < {ENTROPY_LOW_BAR} AS low_entropy
FROM per_doc
ORDER BY doc_id
"""


# ----------------------------------- char-ngram language ID (textcat)
NGRAM_LANGID_TRAIN_PCT = 90   # md5(doc_id) < 90 trains the profiles
NGRAM_LANGID_TOP = 64         # profile size per language (Cavnar-Trenkle)


def langid_ngram_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID (Cavnar & Trenkle 1994 textcat,
    the recipe behind fastText-era langid baselines) evaluated as a
    confusion matrix: per-language trigram profiles are learned from
    the 90% md5 train split, every held-out doc is classified by
    profile-overlap argmax, and the output is (true lang, predicted
    lang, n) — the mislabeled-language audit for a corpus whose
    `lang` column came from an upstream crawler. `text_langid` is the
    marker-word heuristic; this is the statistical path.

    Scale shape: trigram explode is codegen (sequence + substring, no
    HOF lambdas); profiles are a per-lang top-P window (real
    partition key) collapsed to a P·|langs|-row broadcast; scoring is
    ONE equality join on the trigram + a per-doc argmax window keyed
    by doc_id. Counts are integers end to end.
    """
    from pyspark.sql import Window

    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    docs = scatter(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        F.lower(F.col("text")).alias("t"),
        (hash_bucket(F.col("doc_id")) < NGRAM_LANGID_TRAIN_PCT).alias(
            "is_train"
        ),
    )
    grams = docs.select(
        "doc_id",
        "lang",
        "is_train",
        "t",
        F.explode(F.expr("sequence(1, greatest(char_length(t) - 2, 0))")).alias(
            "p"
        ),
    ).select(
        "doc_id",
        "lang",
        "is_train",
        F.expr("substring(t, p, 3)").alias("g"),
    )
    w = Window.partitionBy("plang").orderBy(F.desc("cnt"), F.asc("g"))
    profile = (
        grams.filter(F.col("is_train"))
        .groupBy(F.col("lang").alias("plang"), "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= NGRAM_LANGID_TOP)
        .select("plang", "g")
    )
    held = grams.filter(~F.col("is_train")).select("doc_id", "lang", "g").distinct()
    hits = (
        held.join(F.broadcast(profile), "g")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.desc("overlap"), F.asc("plang")
    )
    pred = (
        hits.withColumn("rk", F.row_number().over(w_doc))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("plang").alias("pred_lang"))
    )
    held_docs = docs.filter(~F.col("is_train")).select("doc_id", "lang")
    return (
        held_docs.join(pred, "doc_id", "left")
        .groupBy(
            F.col("lang").alias("true_lang"),
            F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


LANGID_NGRAM_SQL = f"""
WITH docs AS (
  SELECT doc_id, lang, lower(text) AS t,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT % 100
           < {NGRAM_LANGID_TRAIN_PCT} AS is_train
  FROM documents
), grams AS (
  SELECT doc_id, lang, is_train, substr(t, i, 3) AS g
  FROM docs, unnest(range(1, GREATEST(len(t) - 2, 0) + 1)) AS u(i)
), profile AS (
  SELECT plang, g FROM (
    SELECT lang AS plang, g, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, g ASC) AS rk
    FROM grams WHERE is_train GROUP BY lang, g)
  WHERE rk <= {NGRAM_LANGID_TOP}
), held AS (
  SELECT DISTINCT doc_id, lang, g FROM grams WHERE NOT is_train
), hits AS (
  SELECT doc_id, lang, plang, COUNT(*) AS overlap
  FROM held JOIN profile USING (g)
  GROUP BY doc_id, lang, plang
), pred AS (
  SELECT doc_id, plang AS pred_lang FROM (
    SELECT doc_id, plang,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY overlap DESC, plang ASC) AS rk
    FROM hits)
  WHERE rk = 1
), held_docs AS (
  SELECT doc_id, lang FROM docs WHERE NOT is_train
)
SELECT h.lang AS true_lang,
       COALESCE(p.pred_lang, 'und') AS pred_lang,
       COUNT(*) AS n
FROM held_docs h LEFT JOIN pred p ON h.doc_id = p.doc_id
GROUP BY h.lang, COALESCE(p.pred_lang, 'und')
ORDER BY true_lang, pred_lang
"""

# ------------------------------------------------ Flesch readability
FRE_S = 10**6         # per-doc score quantization for the exact mean
FRE_EASY = 60.0       # standard Flesch bands
FRE_HARD = 30.0


def readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease per source (Flesch 1948): 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words), with the
    classic corpus-scale proxies — syllables ≈ vowel-group runs
    ([aeiouy]+), sentences ≈ terminal-punctuation runs (min 1) — the
    readability screen curation stacks run beside Gopher rules to
    segment a corpus by audience complexity.

    Three regexp_extract_all counts per doc, all codegen-side; the
    per-doc score is one IEEE expression over three ints, quantized
    ::BIGINT before the per-source mean (drift_psi discipline); the
    easy/hard band flags compare the identical unrounded double on
    both engines. One scan, one aggregation — nothing above the
    source rollup.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    words = F.size(tokens_col(F.col("text")))
    syll = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    )
    sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)),
        F.lit(1),
    )
    fre = (
        F.lit(206.835)
        - F.lit(1.015) * words.cast("double") / sent.cast("double")
        - F.lit(84.6) * syll.cast("double") / words.cast("double")
    )
    q = F.floor(fre * F.lit(float(FRE_S)) + F.lit(0.5)).cast("long")
    return (
        docs.filter(words > 0)
        .select(
            "source",
            q.alias("q"),
            (fre >= F.lit(FRE_EASY)).cast("long").alias("easy"),
            (fre < F.lit(FRE_HARD)).cast("long").alias("hard"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("q").cast("double")
                / F.lit(float(FRE_S))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_fre"),
            F.round(F.sum("easy") / F.count(F.lit(1)), 6).alias("easy_share"),
            F.round(F.sum("hard") / F.count(F.lit(1)), 6).alias("hard_share"),
        )
        .orderBy("source")
    )


READABILITY_SQL = rf"""
WITH scored AS (
  SELECT source,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS words,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syll,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sent
  FROM documents
), q AS (
  SELECT source,
         206.835 - 1.015 * CAST(words AS DOUBLE) / CAST(sent AS DOUBLE)
                 - 84.6 * CAST(syll AS DOUBLE) / CAST(words AS DOUBLE) AS fre
  FROM scored WHERE words > 0
)
SELECT source, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(floor(fre * {FRE_S} + 0.5) AS BIGINT)) AS BIGINT)
             / {FRE_S}.0 / COUNT(*), 6) AS avg_fre,
       ROUND(CAST(SUM(CASE WHEN fre >= {FRE_EASY} THEN 1 ELSE 0 END) AS BIGINT)
             / COUNT(*), 6) AS easy_share,
       ROUND(CAST(SUM(CASE WHEN fre < {FRE_HARD} THEN 1 ELSE 0 END) AS BIGINT)
             / COUNT(*), 6) AS hard_share
FROM q
GROUP BY source
ORDER BY source
"""
