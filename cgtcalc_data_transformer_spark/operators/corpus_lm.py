"""Corpus-level language-model signals for training-data curation.

Two standard quality levers an LLM data pipeline runs at corpus
scale:

- **Bigram perplexity** (`text_perplexity_bigram`): score every
  document under the corpus's own bigram LM — filtering on LM
  perplexity is the classic statistical-quality gate. The corpus
  counts are two aggregations over one exploded bigram stream (the
  conditional denominator reuses the bigram-count aggregate, not a
  second pass over raw tokens); the per-doc score is one join back
  and a log-sum. No smoothing needed: every document's bigrams are
  part of the corpus counts by construction, so probabilities are
  never zero.
- **Vocab induction** (`vocab_topk`): global top-K tokenizer pieces
  by frequency — the seed step of a wordpiece/BPE vocabulary build.

The reference has no corpus-level analysis at all; this extends the
text-analysis family (operators/textops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.operators.dedup import tokens_col
from cgtcalc_data_transformer_spark.operators.textops import BPE_RE
from cgtcalc_data_transformer_spark.sources.tpch import load_table, scatter

VOCAB_TOP_K = 100


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, 'w1 w2') with one row per bigram OCCURRENCE (an LM
    counts repeats). zip_with over two slices keeps token order
    without a per-token shuffle; the lambda is a shallow concat, so
    the interpreted-HOF cost is one string op per bigram."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return docs.filter(n >= 2).select("doc_id", F.explode(pairs).alias("bg"))


def _doc_ppl(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, ppl): per-doc perplexity under the corpus
    bigram model — the shared scoring core of
    ``text_perplexity_bigram`` and ``ppl_bucket_ccnet``."""
    # cache: the bigram stream feeds the count model AND the per-doc
    # scoring join — without it the tokenize+lead pipeline (the
    # expensive part) runs twice end to end (same pattern as the
    # cached shingle frames in dedup.py)
    b = _bigrams(docs).cache()
    c12 = b.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    # denominator from the bigram aggregate (|vocab^2| rows), not a
    # second pass over the token stream (|corpus| rows)
    c1 = (
        c12.groupBy(F.substring_index("bg", " ", 1).alias("w1"))
        .agg(F.sum("c12").alias("c1"))
    )
    # fold both counts into ONE vocab²-sized model table carrying the
    # log-probability, so the |corpus|-sized bigram stream is joined
    # once, not twice (the c12⨝c1 join is model-sized — cheap)
    model = c12.join(
        c1, F.substring_index(F.col("bg"), " ", 1) == F.col("w1")
    ).select("bg", F.log(F.col("c12") / F.col("c1")).alias("lp"))
    return (
        b.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.exp(-F.sum("lp") / F.count(F.lit(1))),
                6,
            ).alias("ppl"),
        )
    )


def text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc perplexity under the corpus bigram model:
    ppl(d) = exp(-mean_{(w1,w2) in d} ln(c(w1 w2) / c(w1 ·)))."""
    docs = scatter(load_table(spark, sf_dir, "documents"))
    return _doc_ppl(docs).orderBy("doc_id")


TEXT_PPL_SQL = r"""
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
  SELECT bg, COUNT(*) AS c FROM b GROUP BY bg
), c1 AS (
  SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(c) AS BIGINT) AS c FROM c12 GROUP BY w1
)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(exp(-SUM(ln(CAST(c12.c AS DOUBLE) / c1.c)) / COUNT(*)), 6) AS ppl
FROM b JOIN c12 USING (bg) JOIN c1 ON split_part(b.bg, ' ', 1) = c1.w1
GROUP BY b.doc_id
ORDER BY b.doc_id
"""


def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K BPE-ish pieces by corpus frequency — one explode,
    one aggregation, a bounded global top-k (orderBy+limit compiles
    to TakeOrderedAndProject, never a single-partition window)."""
    docs = scatter(load_table(spark, sf_dir, "documents"))
    pieces = docs.select(
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).alias("piece")
    )
    return (
        pieces.groupBy("piece")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(VOCAB_TOP_K)
    )


VOCAB_TOPK_SQL = f"""
SELECT piece, COUNT(*) AS cnt
FROM (SELECT unnest(regexp_extract_all(text, '{BPE_RE}')) AS piece FROM documents)
GROUP BY piece
ORDER BY cnt DESC, piece ASC
LIMIT {VOCAB_TOP_K}
"""


# ------------------------------------------ source distribution drift
DIV_SOURCES = ["src0", "src1", "src2", "src3"]
DIV_ALPHA = 0.5  # additive smoothing


def source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram
    distributions of a fixed source panel — the mixing diagnostic
    that tells a curation pipeline when two ingest feeds drift apart
    (or duplicate each other: JS → 0).

    One tokenize pass → (token, per-source count) via conditional
    aggregation (never a per-pair rescan); corpus totals and the
    union-vocab size are ONE 1-row broadcast aggregate; all 6 pair
    contributions are computed per token row in a single projection
    and summed in one aggregation. Distributions are
    additive-smoothed (alpha=DIV_ALPHA) over the union vocab, and the
    metric is defined over tokens observed in ANY panel source
    (absent-everywhere tokens are excluded by construction).
    ln/division inputs are exact integers, so per-token terms are
    bit-identical across engines; the final sums carry ~1e-13
    accumulation noise absorbed by round(6).
    """
    docs = scatter(load_table(spark, sf_dir, "documents")).filter(
        F.col("source").isin(DIV_SOURCES)
    )
    toks = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(
        *[
            F.sum((F.col("source") == s).cast("long")).alias(f"c{i}")
            for i, s in enumerate(DIV_SOURCES)
        ]
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("v"),
        *[F.sum(f"c{i}").alias(f"n{i}") for i in range(len(DIV_SOURCES))],
    )
    a = F.lit(DIV_ALPHA)

    def prob(i: int):
        return (F.col(f"c{i}").cast("double") + a) / (
            F.col(f"n{i}").cast("double") + a * F.col("v").cast("double")
        )

    pairs = [
        (i, j)
        for i in range(len(DIV_SOURCES))
        for j in range(i + 1, len(DIV_SOURCES))
    ]
    contribs = []
    for i, j in pairs:
        pi, pj = prob(i), prob(j)
        m = (pi + pj) / F.lit(2.0)
        contribs.append(
            F.sum(
                F.lit(0.5) * (pi * F.log(pi / m) + pj * F.log(pj / m))
            ).alias(f"js_{i}_{j}")
        )
    wide = counts.crossJoin(F.broadcast(stats)).agg(*contribs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(DIV_SOURCES[i]).alias("src_a"),
                        F.lit(DIV_SOURCES[j]).alias("src_b"),
                        F.round(F.col(f"js_{i}_{j}"), 6).alias("js_divergence"),
                    )
                    for i, j in pairs
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*").orderBy("src_a", "src_b")


def _divergence_sql() -> str:
    n = len(DIV_SOURCES)
    srcs = ", ".join(repr(s) for s in DIV_SOURCES)
    c_defs = ",\n         ".join(
        f"CAST(SUM(CASE WHEN source = {DIV_SOURCES[i]!r} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        for i in range(n)
    )
    n_defs = ",\n         ".join(
        f"CAST(SUM(c{i}) AS BIGINT) AS n{i}" for i in range(n)
    )
    def p(i):
        return (
            f"(CAST(c{i} AS DOUBLE) + {DIV_ALPHA}) / "
            f"(CAST(n{i} AS DOUBLE) + {DIV_ALPHA} * CAST(v AS DOUBLE))"
        )
    selects = []
    for i in range(n):
        for j in range(i + 1, n):
            pi, pj = p(i), p(j)
            m = f"(({pi}) + ({pj})) / 2.0"
            selects.append(
                f"SELECT {DIV_SOURCES[i]!r} AS src_a, {DIV_SOURCES[j]!r} AS src_b, "
                f"ROUND(SUM(0.5 * (({pi}) * ln(({pi}) / ({m})) "
                f"+ ({pj}) * ln(({pj}) / ({m})))), 6) AS js_divergence "
                f"FROM counts, stats"
            )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents WHERE source IN ({srcs})
), counts AS (
  SELECT tok,
         {c_defs}
  FROM toks GROUP BY tok
), stats AS (
  SELECT COUNT(*) AS v,
         {n_defs}
  FROM counts
)
{union}
ORDER BY src_a, src_b
"""


SOURCE_DIVERGENCE_SQL = _divergence_sql()


# ------------------------------------------------ PMI collocations
PMI_MIN_COUNT = 5
PMI_TOP_K = 50


def collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K collocations by pointwise mutual information:
    pmi(w1,w2) = ln(c12·N / (c1·c2)) over the corpus bigram stream,
    restricted to bigrams seen ≥ PMI_MIN_COUNT times — the phrase-
    mining primitive (word2vec's phrase pass, tokenizer merge-rule
    candidates).

    Engine-exactness: the ln argument is a correctly-rounded ratio of
    correctly-rounded double products (exact below 2^53, and overflow-
    safe where a BIGINT product is not), and the score is quantized to
    an integer with floor(x·1e8 + 0.5) — the repo's portable-
    quantization recipe — so ordering and emitted values carry no
    libm tie risk. Plan: ONE bigram explode feeds both the pair
    counts and (via two model-sized re-aggregations of the count
    table) the unigram marginals; N is a 1-row broadcast scalar; the
    final top-K is TakeOrderedAndProject.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    b = _bigrams(docs)
    # ONE corpus-sized aggregation; the filtered pair table and both
    # marginals are model-sized derivations of it (cache: three
    # consumers, vocab²-sized — tiny next to the bigram stream)
    full = b.groupBy("bg").agg(F.count(F.lit(1)).alias("c")).cache()
    c12 = full.filter(F.col("c") >= PMI_MIN_COUNT).select(
        "bg", F.col("c").alias("c12")
    )
    w1 = full.groupBy(F.substring_index("bg", " ", 1).alias("w1")).agg(
        F.sum("c").alias("c1")
    )
    w2 = full.groupBy(F.substring_index("bg", " ", -1).alias("w2")).agg(
        F.sum("c").alias("c2")
    )
    n = full.agg(F.sum("c").alias("n_bigrams"))
    scored = (
        c12.withColumn("w1", F.substring_index("bg", " ", 1))
        .withColumn("w2", F.substring_index("bg", " ", -1))
        .join(w1, "w1")
        .join(w2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "bg",
            "c12",
            "c1",
            "c2",
            # each factor cast to double BEFORE multiplying: a BIGINT
            # c12*N (or c1*c2) product overflows int64 at corpus scale
            # (N ~ 1e13, hot-bigram c12 ~ 1e9) and Spark's non-ANSI
            # wrap would silently corrupt the score (ADVICE r4); the
            # double products are correctly rounded and engine-
            # identical (exact whenever the product < 2^53, i.e. at
            # every oracle-checked scale)
            F.floor(
                F.log(
                    (F.col("c12").cast("double") * F.col("n_bigrams").cast("double"))
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                )
                * 1e8
                + 0.5
            )
            .cast("long")
            .alias("pmi_int"),
        )
    )
    return (
        scored.select(
            "bg", "c12", "c1", "c2", (F.col("pmi_int") / F.lit(1e8)).alias("pmi")
        )
        .orderBy(F.desc("pmi"), F.asc("bg"))
        .limit(PMI_TOP_K)
    )


COLLOCATIONS_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     x -> x <> '') AS t
  FROM documents
), b AS (
  SELECT z[1] || ' ' || z[2] AS bg
  FROM (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
        FROM toks WHERE len(t) >= 2)
), full_counts AS (
  SELECT bg, COUNT(*) AS c FROM b GROUP BY bg
), w1 AS (
  SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(c) AS BIGINT) AS c1
  FROM full_counts GROUP BY 1
), w2 AS (
  SELECT split_part(bg, ' ', 2) AS w2, CAST(SUM(c) AS BIGINT) AS c2
  FROM full_counts GROUP BY 1
), n AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_bigrams FROM full_counts
), scored AS (
  SELECT bg, CAST(c AS BIGINT) AS c12, c1, c2,
         CAST(floor(ln((CAST(c AS DOUBLE) * CAST(n_bigrams AS DOUBLE))
                       / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) * 1e8 + 0.5) AS BIGINT) AS pmi_int
  FROM full_counts
  JOIN w1 ON split_part(bg, ' ', 1) = w1.w1
  JOIN w2 ON split_part(bg, ' ', 2) = w2.w2
  CROSS JOIN n
  WHERE c >= {PMI_MIN_COUNT}
)
SELECT bg, c12, c1, c2, pmi_int / 1e8 AS pmi
FROM scored
ORDER BY pmi DESC, bg ASC
LIMIT {PMI_TOP_K}
"""


# ------------------------------------------------ BPE merge learning
BPE_MERGE_ROUNDS = 3


def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first BPE_MERGE_ROUNDS byte-pair-encoding merge rules
    from the corpus — tokenizer TRAINING as a DataFrame program
    (Sennrich et al. 2016, arXiv:1508.07909): count adjacent symbol
    pairs over the word-frequency table, merge the most frequent
    pair, recount, repeat. Output: one row per learned rule
    (round, left, right, merged, pair_count).

    Plan shape — the classic algorithm's own trick keeps this
    corpus-scale-safe: the raw corpus is scanned ONCE to build the
    (word, count) table; every merge round then runs on that
    vocab-sized table (pair explode weighted by count → one
    aggregation → global top-1 via TakeOrdered). The selected rule is
    the round's only driver state (same bounded-scalar discipline as
    kmeans' centroids), so this is a plan-build-time iterative op.

    Merge application is ONE regexp_replace per round with NO
    lookarounds (DuckDB's RE2 has none): symbols are joined with TWO
    spaces and the pattern ' a  b ' consumes one flanking space on
    each side, so leftmost non-overlapping replacement — exactly
    BPE's greedy semantics — leaves every neighbour's separator
    intact ('a a a' + (a,a) → 'aa a', adjacent pairs 'a b a b' both
    merge). The DuckDB oracle replays the identical recurrence with
    the round's top-1 pair as a correlated scalar instead of a
    collected literal; the deterministic (count DESC, pair ASC)
    tiebreak makes both engines pick the same rule.
    """
    rules = _learn_bpe_rules(spark, sf_dir)
    return spark.createDataFrame(
        rules, "round int, left string, right string, merged string, pair_count bigint"
    ).orderBy("round")


def _learn_bpe_rules(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, str, str, str, int]]:
    """The Sennrich learning loop (see bpe_learn_merges docstring);
    returns the bounded rule list — the only driver state — so both
    the learning op and the tokenizer-APPLICATION op share it."""
    docs = scatter(load_table(spark, sf_dir, "documents"))
    words = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # '  a  b  c  ' — leading separator + one per char (double spaces)
    sym = words.select(
        F.concat(
            F.lit("  "), F.regexp_replace(F.col("w"), "(.)", "$1  ")
        ).alias("s"),
        "cnt",
    ).localCheckpoint()  # rounds reference the frame twice; truncate lineage

    rules: list[tuple[int, str, str, str, int]] = []
    for rnd in range(1, BPE_MERGE_ROUNDS + 1):
        toks = F.split(F.trim(F.col("s")), "  ")
        pairs = sym.select(
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("pair"),
            "cnt",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.desc("pc"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["pair"].split(" ")
        pc = top[0]["pc"]
        rules.append((rnd, a, b, a + b, pc))
        sym = sym.select(
            F.regexp_replace(
                F.col("s"), f" {a}  {b} ", f" {a + b} "
            ).alias("s"),
            "cnt",
        ).localCheckpoint()
    return rules


def _bpe_sql() -> str:
    sql = r"""
WITH words AS MATERIALIZED (
  SELECT w, COUNT(*) AS cnt
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                              x -> x <> '')) AS w
    FROM documents)
  GROUP BY w
), sym0 AS MATERIALIZED (
  SELECT '  ' || regexp_replace(w, '(.)', '\1  ', 'g') AS s, cnt FROM words
)"""
    prev = "sym0"
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        sql += f"""
, pairs{r} AS (
  SELECT z[1] || ' ' || z[2] AS pair, cnt
  FROM (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z, cnt
        FROM (SELECT string_split(trim(s), '  ') AS t, cnt FROM {prev}))
), top{r} AS MATERIALIZED (
  SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b,
         CAST(SUM(cnt) AS BIGINT) AS pc
  FROM pairs{r} GROUP BY pair
  ORDER BY SUM(cnt) DESC, pair ASC
  LIMIT 1
), sym{r} AS MATERIALIZED (
  SELECT regexp_replace(s, ' ' || t.a || '  ' || t.b || ' ', ' ' || t.a || t.b || ' ', 'g') AS s, cnt
  FROM {prev} CROSS JOIN top{r} t
)"""
        prev = f"sym{r}"
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, a AS left, b AS right, a || b AS merged, pc AS pair_count FROM top{r}"
        for r in range(1, BPE_MERGE_ROUNDS + 1)
    )
    sql += f"\n{unions}\nORDER BY round\n"
    return sql


BPE_MERGES_SQL = _bpe_sql()


# ------------------------------------------------ BPE application
def bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the learned BPE merge rules to the corpus — tokenizer
    INFERENCE as a DataFrame program, completing the train/apply pair
    with ``bpe_learn_merges``: per document, word count, character
    count, and the post-merge token count, with the resulting
    tokens-per-char compression ratio (quantized).

    The rules come from the shared learning loop (bounded driver
    state: BPE_MERGE_ROUNDS rows); application is the same
    lookaround-free double-space merge regex per rule, over the
    per-document word stream this time — R chained codegen
    ``regexp_replace`` column expressions, zero Python in the hot
    path, embarrassingly parallel over documents.

    The DuckDB oracle re-learns the rules with the identical
    recurrence (same MATERIALIZED top-1 CTEs as BPE_MERGES_SQL) and
    applies them via CROSS JOINs of those 1-row rule tables — no
    literals smuggled across engines, so the hash match covers
    learning AND application end-to-end.
    """
    rules = _learn_bpe_rules(spark, sf_dir)
    docs = scatter(load_table(spark, sf_dir, "documents"))
    dw = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("w")
    )
    sym = F.concat(F.lit("  "), F.regexp_replace(F.col("w"), "(.)", "$1  "))
    for _, a, b, _, _ in rules:
        sym = F.regexp_replace(sym, f" {a}  {b} ", f" {a + b} ")
    per_word = dw.select(
        "doc_id",
        F.length("w").alias("n_chars"),
        F.size(F.split(F.trim(sym), "  ")).cast("long").alias("n_tokens"),
    )
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_chars",
            "n_tokens",
            (
                F.floor(
                    F.col("n_tokens") / F.col("n_chars") * 1e6 + 0.5
                ).cast("long")
                / F.lit(1e6)
            ).alias("tokens_per_char"),
        )
        .orderBy("doc_id")
    )


def bpe_learn_prefix_ctes() -> str:
    """The shared DuckDB learning prefix (words → sym0 → top1..topR):
    every oracle that consumes the LEARNED merges (bpe_apply, the r14
    tokenizer_fertility_audit) re-derives the identical top{r} rule
    tables from this one recurrence instead of smuggling literals —
    the hash match then covers learning AND application end-to-end."""
    sql = r"""
WITH words AS MATERIALIZED (
  SELECT w, COUNT(*) AS cnt
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                              x -> x <> '')) AS w
    FROM documents)
  GROUP BY w
), sym0 AS MATERIALIZED (
  SELECT '  ' || regexp_replace(w, '(.)', '\1  ', 'g') AS s, cnt FROM words
)"""
    prev = "sym0"
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        sql += f"""
, pairs{r} AS (
  SELECT z[1] || ' ' || z[2] AS pair, cnt
  FROM (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z, cnt
        FROM (SELECT string_split(trim(s), '  ') AS t, cnt FROM {prev}))
), top{r} AS MATERIALIZED (
  SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b,
         CAST(SUM(cnt) AS BIGINT) AS pc
  FROM pairs{r} GROUP BY pair
  ORDER BY SUM(cnt) DESC, pair ASC
  LIMIT 1
), sym{r} AS MATERIALIZED (
  SELECT regexp_replace(s, ' ' || t.a || '  ' || t.b || ' ', ' ' || t.a || t.b || ' ', 'g') AS s, cnt
  FROM {prev} CROSS JOIN top{r} t
)"""
        prev = f"sym{r}"
    return sql


def _bpe_apply_sql() -> str:
    # learning prefix: identical recurrence to BPE_MERGES_SQL
    sql = bpe_learn_prefix_ctes()
    # application: per-document word stream through the same rules
    sql += r"""
, dw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
), ds0 AS (
  SELECT doc_id, length(w) AS n_chars,
         '  ' || regexp_replace(w, '(.)', '\1  ', 'g') AS s
  FROM dw
)"""
    prev = "ds0"
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        sql += f"""
, ds{r} AS (
  SELECT doc_id, n_chars,
         regexp_replace(s, ' ' || t.a || '  ' || t.b || ' ', ' ' || t.a || t.b || ' ', 'g') AS s
  FROM ds{r - 1} CROSS JOIN top{r} t
)"""
        prev = f"ds{r}"
    sql += f"""
SELECT doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(len(string_split(trim(s), '  '))) AS BIGINT) AS n_tokens,
       CAST(FLOOR(CAST(SUM(len(string_split(trim(s), '  '))) AS BIGINT)
                  / CAST(SUM(n_chars) AS BIGINT) * 1e6 + 0.5) AS BIGINT) / 1e6
         AS tokens_per_char
FROM {prev}
GROUP BY doc_id
ORDER BY doc_id
"""
    return sql


BPE_APPLY_SQL = _bpe_apply_sql()


# ----------------------------------- CCNet perplexity bucketing
PPL_BUCKETS = 3       # head / middle / tail
PPL_SCALE = 10**6     # per-doc ppl quantization for the exact sum


def ppl_bucket_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): per LANGUAGE, split documents into
    head/middle/tail terciles by LM perplexity — head (lowest ppl)
    is the "looks like the LM's training domain" slice that CCNet
    keeps preferentially. Buckets come from ntile(3) over
    (ppl, doc_id) inside each language partition, so assignment is
    exact and deterministic; the rollup reports per-(lang, bucket)
    counts, the ppl range, and an exact integer sum of quantized
    ppls (mean derivable without a float-order hazard).

    Scale shape: one window shuffle partitioned by lang. Language
    cardinality is tiny but skewed ('en' dominates) — at 100 TB the
    tercile CUTOFFS would come from a per-lang percentile sketch
    broadcast back (one agg, no full sort); ntile keeps the exact
    semantics the oracle can replay at gate scale.
    """
    from pyspark.sql import Window

    docs = scatter(load_table(spark, sf_dir, "documents"))
    scored = _doc_ppl(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(F.asc("ppl"), F.asc("doc_id"))
    bucketed = scored.withColumn("bucket", F.ntile(PPL_BUCKETS).over(w))
    ppl_q = F.floor(F.col("ppl") * F.lit(float(PPL_SCALE)) + F.lit(0.5)).cast(
        "long"
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ppl").alias("ppl_lo"),
            F.max("ppl").alias("ppl_hi"),
            F.sum(ppl_q).alias("sum_ppl_q"),
        )
        .orderBy("lang", "bucket")
    )


PPL_BUCKET_SQL = rf"""
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
  SELECT bg, COUNT(*) AS c FROM b GROUP BY bg
), c1 AS (
  SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(c) AS BIGINT) AS c FROM c12 GROUP BY w1
), scored AS (
  SELECT b.doc_id,
         ROUND(exp(-SUM(ln(CAST(c12.c AS DOUBLE) / c1.c)) / COUNT(*)), 6) AS ppl
  FROM b JOIN c12 USING (bg) JOIN c1 ON split_part(b.bg, ' ', 1) = c1.w1
  GROUP BY b.doc_id
), bucketed AS (
  SELECT d.lang, s.ppl,
         NTILE({PPL_BUCKETS}) OVER (PARTITION BY d.lang
                                    ORDER BY s.ppl ASC, s.doc_id ASC) AS bucket
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT lang, bucket,
       COUNT(*) AS n_docs,
       MIN(ppl) AS ppl_lo,
       MAX(ppl) AS ppl_hi,
       CAST(SUM(CAST(floor(ppl * {PPL_SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS sum_ppl_q
FROM bucketed
GROUP BY lang, bucket
ORDER BY lang, bucket
"""


# --------------------------------------------- Zipf tail exponent
ZIPF_TOP = 500        # regression over the top-N ranks per language
ZIPF_S1 = 10**6       # quantization of ln terms
ZIPF_S2 = 10**12      # quantization of ln-product terms


def zipf_tail_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf exponent: least-squares slope of
    ln(freq) ~ ln(rank) over the top ZIPF_TOP token ranks — the
    classic corpus health check (natural language sits near
    alpha ≈ 1; generator loops, boilerplate floods, or broken
    tokenization bend the tail). Emits alpha = -slope and R² per
    language.

    Engine-exactness: ln inputs are exact integers (rank, count), and
    every regression moment (x, y, xy, x², y²) is quantized to an
    integer PER TERM before the SUM, so the five sufficient
    statistics are exact integers and the closed-form slope/R² are
    identical IEEE expressions on both engines. Scale shape: one
    token aggregation, a per-lang top-N window (real partition key —
    lang), and a 5-number-per-lang rollup; nothing global.
    """
    from pyspark.sql import Window

    docs = scatter(load_table(spark, sf_dir, "documents"))
    counts = (
        docs.select("lang", F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tok"))
    ranked = counts.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= ZIPF_TOP
    )
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("cnt").cast("double"))

    def _q(expr, scale):
        return F.floor(expr * F.lit(float(scale)) + F.lit(0.5)).cast("long")

    stats = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(_q(x, ZIPF_S1)).alias("sx"),
        F.sum(_q(y, ZIPF_S1)).alias("sy"),
        F.sum(_q(x * y, ZIPF_S2)).alias("sxy"),
        F.sum(_q(x * x, ZIPF_S2)).alias("sxx"),
        F.sum(_q(y * y, ZIPF_S2)).alias("syy"),
    )
    n = F.col("n_terms").cast("double")
    sx = F.col("sx") / F.lit(float(ZIPF_S1))
    sy = F.col("sy") / F.lit(float(ZIPF_S1))
    sxy = F.col("sxy") / F.lit(float(ZIPF_S2))
    sxx = F.col("sxx") / F.lit(float(ZIPF_S2))
    syy = F.col("syy") / F.lit(float(ZIPF_S2))
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    return stats.select(
        "lang",
        "n_terms",
        F.round(-(num / denx), 6).alias("alpha"),
        F.round(num * num / (denx * deny), 6).alias("r2"),
    ).orderBy("lang")


ZIPF_SQL = rf"""
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
), counts AS (
  SELECT lang, tok, COUNT(*) AS cnt FROM toks GROUP BY lang, tok
), ranked AS (
  SELECT lang, cnt,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, tok ASC) AS r
  FROM counts
  QUALIFY r <= {ZIPF_TOP}
), terms AS (
  SELECT lang,
         ln(CAST(r AS DOUBLE)) AS x,
         ln(CAST(cnt AS DOUBLE)) AS y
  FROM ranked
), stats AS (
  SELECT lang,
         COUNT(*) AS n_terms,
         CAST(SUM(CAST(floor(x * {ZIPF_S1} + 0.5) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(floor(y * {ZIPF_S1} + 0.5) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(floor(x * y * {ZIPF_S2} + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(SUM(CAST(floor(x * x * {ZIPF_S2} + 0.5) AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(floor(y * y * {ZIPF_S2} + 0.5) AS BIGINT)) AS BIGINT) AS syy
  FROM terms GROUP BY lang
)
SELECT lang, n_terms,
       ROUND(-(
         (n_terms * (sxy / {ZIPF_S2}.0) - (sx / {ZIPF_S1}.0) * (sy / {ZIPF_S1}.0))
         / (n_terms * (sxx / {ZIPF_S2}.0) - (sx / {ZIPF_S1}.0) * (sx / {ZIPF_S1}.0))
       ), 6) AS alpha,
       ROUND(
         (n_terms * (sxy / {ZIPF_S2}.0) - (sx / {ZIPF_S1}.0) * (sy / {ZIPF_S1}.0))
         * (n_terms * (sxy / {ZIPF_S2}.0) - (sx / {ZIPF_S1}.0) * (sy / {ZIPF_S1}.0))
         / ((n_terms * (sxx / {ZIPF_S2}.0) - (sx / {ZIPF_S1}.0) * (sx / {ZIPF_S1}.0))
            * (n_terms * (syy / {ZIPF_S2}.0) - (sy / {ZIPF_S1}.0) * (sy / {ZIPF_S1}.0))),
       6) AS r2
FROM stats
ORDER BY lang
"""


# ------------------------------------------- Heaps' law vocab growth
HEAPS_BUCKETS = 32    # corpus-growth checkpoints per language
HEAPS_S1 = 10**6      # quantization of ln terms
HEAPS_S2 = 10**12     # quantization of ln-product terms


def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Heaps'-law exponent: least-squares slope beta of
    ln V(N) ~ ln N over HEAPS_BUCKETS cumulative corpus checkpoints,
    where N is tokens ingested and V distinct types seen — the
    vocabulary-growth twin of `zipf_tail_alpha`. Natural text sits
    near beta ≈ 0.5; beta → 1 means near-disjoint shards (no shared
    vocabulary: OCR noise, random IDs), beta → 0 a vocabulary that
    stopped growing (template/boilerplate floods). Emits beta, R²,
    and the endpoint totals per language.

    Checkpoint order is md5(doc_id) — a deterministic random-like
    ingest order, exactly what a growth fit wants. Scale shape: one
    (lang, bucket) occurrence count, one per-type min(bucket) ("first
    seen") aggregation, and cumulative sums via the repo's bounded
    theta self-join convention (b.bucket <= a.bucket on the
    32-row-per-lang checkpoint table — see drift_ks_binned), NOT an
    unpartitioned window; the OLS rollup is 32 rows per lang.

    Engine-exactness: checkpoint counts are exact integers; each ln
    term is quantized floor(x*S + 0.5)::long BEFORE the sums, so the
    five regression moments are exact integers and slope/R² are the
    same IEEE expression on both engines.
    """
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "lang",
        hash_bucket(F.col("doc_id"), HEAPS_BUCKETS).alias("bucket"),
        F.explode(tokens_col(F.col("text"))).alias("tok"),
    )
    per_bucket = toks.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("nb")
    )
    new_types = (
        toks.groupBy("lang", "tok")
        .agg(F.min("bucket").alias("fb"))
        .groupBy("lang", F.col("fb").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("vb"))
    )
    ck = per_bucket.join(new_types, ["lang", "bucket"], "left").select(
        "lang", "bucket", "nb", F.coalesce(F.col("vb"), F.lit(0)).alias("vb")
    )
    cum = (
        ck.alias("a")
        .join(
            F.broadcast(ck.alias("b")),
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("b.bucket") <= F.col("a.bucket")),
        )
        .groupBy(F.col("a.lang").alias("lang"), F.col("a.bucket").alias("bucket"))
        .agg(F.sum("b.nb").alias("cum_n"), F.sum("b.vb").alias("cum_v"))
    )
    x = F.log(F.col("cum_n").cast("double"))
    y = F.log(F.col("cum_v").cast("double"))

    def _q(expr, scale):
        return F.floor(expr * F.lit(float(scale)) + F.lit(0.5)).cast("long")

    stats = cum.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_checkpoints"),
        F.max("cum_n").alias("total_tokens"),
        F.max("cum_v").alias("total_types"),
        F.sum(_q(x, HEAPS_S1)).alias("sx"),
        F.sum(_q(y, HEAPS_S1)).alias("sy"),
        F.sum(_q(x * y, HEAPS_S2)).alias("sxy"),
        F.sum(_q(x * x, HEAPS_S2)).alias("sxx"),
        F.sum(_q(y * y, HEAPS_S2)).alias("syy"),
    )
    n = F.col("n_checkpoints").cast("double")
    sx = F.col("sx") / F.lit(float(HEAPS_S1))
    sy = F.col("sy") / F.lit(float(HEAPS_S1))
    sxy = F.col("sxy") / F.lit(float(HEAPS_S2))
    sxx = F.col("sxx") / F.lit(float(HEAPS_S2))
    syy = F.col("syy") / F.lit(float(HEAPS_S2))
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    return stats.select(
        "lang",
        "n_checkpoints",
        "total_tokens",
        "total_types",
        F.round(num / denx, 6).alias("beta"),
        F.round(num * num / (denx * deny), 6).alias("r2"),
    ).orderBy("lang")


HEAPS_SQL = rf"""
WITH toks AS (
  SELECT lang,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT
           % {HEAPS_BUCKETS} AS bucket,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
), per_bucket AS (
  SELECT lang, bucket, COUNT(*) AS nb FROM toks GROUP BY lang, bucket
), first_seen AS (
  SELECT lang, tok, MIN(bucket) AS fb FROM toks GROUP BY lang, tok
), new_types AS (
  SELECT lang, fb AS bucket, COUNT(*) AS vb FROM first_seen GROUP BY lang, fb
), ck AS (
  SELECT p.lang, p.bucket, p.nb, COALESCE(n.vb, 0) AS vb
  FROM per_bucket p LEFT JOIN new_types n
    ON p.lang = n.lang AND p.bucket = n.bucket
), cum AS (
  SELECT a.lang, a.bucket,
         CAST(SUM(b.nb) AS BIGINT) AS cum_n,
         CAST(SUM(b.vb) AS BIGINT) AS cum_v
  FROM ck a JOIN ck b ON a.lang = b.lang AND b.bucket <= a.bucket
  GROUP BY a.lang, a.bucket
), terms AS (
  SELECT lang, cum_n, cum_v,
         ln(CAST(cum_n AS DOUBLE)) AS x,
         ln(CAST(cum_v AS DOUBLE)) AS y
  FROM cum
), stats AS (
  SELECT lang,
         COUNT(*) AS n_checkpoints,
         CAST(MAX(cum_n) AS BIGINT) AS total_tokens,
         CAST(MAX(cum_v) AS BIGINT) AS total_types,
         CAST(SUM(CAST(floor(x * {HEAPS_S1} + 0.5) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(floor(y * {HEAPS_S1} + 0.5) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(floor(x * y * {HEAPS_S2} + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(SUM(CAST(floor(x * x * {HEAPS_S2} + 0.5) AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(floor(y * y * {HEAPS_S2} + 0.5) AS BIGINT)) AS BIGINT) AS syy
  FROM terms GROUP BY lang
)
SELECT lang, n_checkpoints, total_tokens, total_types,
       ROUND(
         (n_checkpoints * (sxy / {HEAPS_S2}.0) - (sx / {HEAPS_S1}.0) * (sy / {HEAPS_S1}.0))
         / (n_checkpoints * (sxx / {HEAPS_S2}.0) - (sx / {HEAPS_S1}.0) * (sx / {HEAPS_S1}.0)),
       6) AS beta,
       ROUND(
         (n_checkpoints * (sxy / {HEAPS_S2}.0) - (sx / {HEAPS_S1}.0) * (sy / {HEAPS_S1}.0))
         * (n_checkpoints * (sxy / {HEAPS_S2}.0) - (sx / {HEAPS_S1}.0) * (sy / {HEAPS_S1}.0))
         / ((n_checkpoints * (sxx / {HEAPS_S2}.0) - (sx / {HEAPS_S1}.0) * (sx / {HEAPS_S1}.0))
            * (n_checkpoints * (syy / {HEAPS_S2}.0) - (sy / {HEAPS_S1}.0) * (sy / {HEAPS_S1}.0))),
       6) AS r2
FROM stats
ORDER BY lang
"""


# --------------------------------------------- held-out n-gram novelty
NOVELTY_TRAIN_PCT = 90   # md5(doc_id) bucket < 90 -> train, else heldout


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out n-gram novelty: split the corpus 90/10 by md5(doc_id),
    then measure, per language, what fraction of the held-out split's
    distinct word trigrams never appear in the train split — the
    memorization-risk / generalization-pressure audit run before eval
    harness construction (novelty ~ 0 means every eval n-gram is in
    the training set: the eval measures recall, not generalization;
    `contamination_check`/`contamination_minhash` detect *injected*
    eval text, this quantifies *organic* overlap).

    Scale shape (r14 rewrite — guide §2.4 "remove shuffles
    outright"): the per-(lang, shingle) membership flags and the
    per-lang counts are ONE aggregation each. The r13 formulation
    built per-split distinct frames and anti-joined them, which (a)
    recomputed the whole trigram subtree once per split branch — the
    two `.filter(...)` lineages share no exchange — and (b) paid two
    (lang, shingle) distinct shuffles, an anti-join shuffle and three
    lang rollups. Here the trigram stream is scanned ONCE
    (posexplode + doc_id-window lead, the shingle_rows shape with
    lang/is_train carried through), collapsed by ONE map-side-
    combinable groupBy(lang, shingle) into boolean split-membership
    flags, and rolled up per lang. Plan: 8 Exchange → 3 (window +
    fused agg + lang rollup), 2 trigram subtrees → 1, anti-join
    gone — plans/r14/ngram_novelty_{before,after}.txt.

    Result-identical by set algebra: distinct-(lang, shingle)-per-
    split == the membership flags (max(is_train), max(NOT is_train))
    over occurrence rows; "novel" == has_held AND NOT has_train;
    langs appear iff they have ≥1 held gram (the held_counts base in
    the r13 join tree == the n_held_grams > 0 filter here). All
    counts stay BIGINT; the rate is the same int/int division.
    """
    from pyspark.sql import Window

    from cgtcalc_data_transformer_spark.operators.dedup import (
        SHINGLE_N,
        tokens_col,
    )
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    docs = scatter(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        "lang",
        F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", i).over(w) for i in range(1, SHINGLE_N)
    ]
    grams = tok.select(
        "lang",
        (hash_bucket(F.col("doc_id")) < NOVELTY_TRAIN_PCT).alias("is_train"),
        F.when(parts[-1].isNotNull(), F.concat_ws(" ", *parts)).alias(
            "shingle"
        ),
    ).filter(F.col("shingle").isNotNull())
    membership = grams.groupBy("lang", "shingle").agg(
        F.max("is_train").alias("has_train"),
        F.max(~F.col("is_train")).alias("has_held"),
    )
    return (
        membership.groupBy("lang")
        .agg(
            F.sum(F.when(F.col("has_train"), 1).otherwise(0)).alias(
                "n_train_grams"
            ),
            F.sum(F.when(F.col("has_held"), 1).otherwise(0)).alias(
                "n_held_grams"
            ),
            F.sum(
                F.when(F.col("has_held") & ~F.col("has_train"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .filter(F.col("n_held_grams") > 0)
        .select(
            "lang",
            "n_train_grams",
            "n_held_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_held_grams"), 6).alias(
                "novelty_rate"
            ),
        )
        .orderBy("lang")
    )


NGRAM_NOVELTY_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT
           % 100 < {NOVELTY_TRAIN_PCT} AS is_train,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     t -> t <> '') AS w
  FROM documents
), grams AS (
  SELECT DISTINCT lang, is_train, sh
  FROM (SELECT lang, is_train,
               unnest(CASE WHEN len(w) >= 3
                      THEN [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
                      ELSE [] END) AS sh
        FROM toks)
), train_g AS (
  SELECT DISTINCT lang, sh FROM grams WHERE is_train
), held_g AS (
  SELECT DISTINCT lang, sh FROM grams WHERE NOT is_train
), novel AS (
  SELECT h.lang, h.sh FROM held_g h ANTI JOIN train_g t USING (lang, sh)
)
SELECT h.lang,
       COALESCE(t.n_train_grams, 0) AS n_train_grams,
       h.n_held_grams,
       COALESCE(n.n_novel, 0) AS n_novel,
       ROUND(COALESCE(n.n_novel, 0) / h.n_held_grams, 6) AS novelty_rate
FROM (SELECT lang, COUNT(*) AS n_held_grams FROM held_g GROUP BY lang) h
LEFT JOIN (SELECT lang, COUNT(*) AS n_train_grams FROM train_g GROUP BY lang) t
  ON h.lang = t.lang
LEFT JOIN (SELECT lang, COUNT(*) AS n_novel FROM novel GROUP BY lang) n
  ON h.lang = n.lang
ORDER BY h.lang
"""

# ---------------------------------------------- Kneser-Ney bigram LM
KN_D = 0.75       # absolute discount (Kneser-Ney 1995 standard)
KN_S = 10**9      # per-bigram-type c·ln P quantization

_TOKS_SQL = r"""
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     x -> x <> '') AS t
  FROM documents
"""


def _lang_bigrams(docs: DataFrame) -> DataFrame:
    """(lang, bg) one row per bigram OCCURRENCE, for per-language
    models (same zip_with shape as _bigrams)."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return docs.filter(n >= 2).select("lang", F.explode(pairs).alias("bg"))


def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity per language (Kneser
    & Ney 1995; Chen & Goodman 1999 — the reference smoothing for
    n-gram LMs): P(w2|w1) = max(c12−D,0)/c1 + D·N1+(w1·)/c1 ·
    N1+(·w2)/N1+(··), the model whose continuation probability fixes
    the "San Francisco problem" that raw-count backoff gets wrong.
    The upgrade path from text_perplexity_bigram's unsmoothed MLE.

    All five count tables (c12, c1, fan-outs N1+(w1·), fan-ins
    N1+(·w2), total bigram types) are aggregations over the one
    exploded bigram stream, combined at MODEL size (|bigram types|),
    never corpus size. Per-type c12·ln P is quantized ::BIGINT before
    the per-lang sum (doubles from exact ints + a binary-exact 0.75
    literal are identical IEEE per engine); ppl = exp of an exact
    rational. Evaluated on the training corpus itself, so observed
    bigrams always have c12 ≥ 1 and P > 0.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    b = _lang_bigrams(docs)
    # CACHED (r14 plan audit): c1/cont/ntypes and the model join all
    # derive from c12 (4 refs) — uncached, each re-ran the bigram
    # explode over documents (plans/r14/kneser_ney_bigram_before.txt).
    # The frame is |bigram types| rows — model-sized (guide §2.4).
    c12 = b.groupBy("lang", "bg").agg(F.count(F.lit(1)).alias("c12")).cache()
    w1 = F.substring_index(F.col("bg"), " ", 1)
    w2 = F.substring_index(F.col("bg"), " ", -1)
    c1 = c12.groupBy(F.col("lang").alias("lang1"), w1.alias("w1")).agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("fanout")
    )
    cont = c12.groupBy(F.col("lang").alias("lang2"), w2.alias("w2")).agg(
        F.count(F.lit(1)).alias("fanin")
    )
    ntypes = c12.groupBy("lang").agg(F.count(F.lit(1)).alias("ntypes"))
    model = (
        c12.join(
            c1, (F.col("lang") == F.col("lang1")) & (w1 == F.col("w1"))
        )
        .join(
            cont, (F.col("lang") == F.col("lang2")) & (w2 == F.col("w2"))
        )
        .join(F.broadcast(ntypes), "lang")
    )
    p = (
        (F.col("c12").cast("double") - F.lit(KN_D)) / F.col("c1").cast("double")
        + F.lit(KN_D)
        * F.col("fanout").cast("double")
        / F.col("c1").cast("double")
        * F.col("fanin").cast("double")
        / F.col("ntypes").cast("double")
    )
    q = F.floor(
        F.col("c12").cast("double") * F.log(p) * F.lit(float(KN_S)) + F.lit(0.5)
    ).cast("long")
    return (
        model.select("lang", "c12", q.alias("q"))
        .groupBy("lang")
        .agg(
            F.sum("c12").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_types"),
            F.round(
                F.exp(
                    -(F.sum("q").cast("double") / F.lit(float(KN_S)))
                    / F.sum("c12").cast("double")
                ),
                6,
            ).alias("ppl_kn"),
        )
        .orderBy("lang")
    )


KNESER_NEY_SQL = rf"""
WITH toks AS ({_TOKS_SQL}
), b AS (
  SELECT lang, z[1] || ' ' || z[2] AS bg
  FROM (SELECT lang, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
        FROM toks WHERE len(t) >= 2)
), c12 AS (
  SELECT lang, bg, COUNT(*) AS c12 FROM b GROUP BY lang, bg
), c1 AS (
  SELECT lang, split_part(bg, ' ', 1) AS w1,
         CAST(SUM(c12) AS BIGINT) AS c1, COUNT(*) AS fanout
  FROM c12 GROUP BY lang, w1
), cont AS (
  SELECT lang, split_part(bg, ' ', -1) AS w2, COUNT(*) AS fanin
  FROM c12 GROUP BY lang, w2
), ntypes AS (
  SELECT lang, COUNT(*) AS ntypes FROM c12 GROUP BY lang
), model AS (
  SELECT c12.lang, c12.c12,
         CAST(floor(CAST(c12.c12 AS DOUBLE)
                    * ln((CAST(c12.c12 AS DOUBLE) - {KN_D}) / CAST(c1.c1 AS DOUBLE)
                         + {KN_D} * CAST(c1.fanout AS DOUBLE) / CAST(c1.c1 AS DOUBLE)
                           * CAST(cont.fanin AS DOUBLE) / CAST(ntypes.ntypes AS DOUBLE))
                    * {KN_S} + 0.5) AS BIGINT) AS q
  FROM c12
  JOIN c1 ON c12.lang = c1.lang AND split_part(c12.bg, ' ', 1) = c1.w1
  JOIN cont ON c12.lang = cont.lang AND split_part(c12.bg, ' ', -1) = cont.w2
  JOIN ntypes ON c12.lang = ntypes.lang
)
SELECT lang,
       CAST(SUM(c12) AS BIGINT) AS n_bigrams,
       COUNT(*) AS n_types,
       ROUND(exp(-(CAST(SUM(q) AS BIGINT) / {KN_S}.0)
                 / CAST(SUM(c12) AS BIGINT)), 6) AS ppl_kn
FROM model
GROUP BY lang
ORDER BY lang
"""


# ------------------------------------------------ Good-Turing mass
GT_MAX_R = 5


def good_turing_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency-of-frequencies estimates per language
    (Good 1953): the unseen-token mass p₀ = N₁/N and the smoothed
    counts r* = (r+1)·N_{r+1}/N_r for r = 1..{GT_MAX_R} — the
    coverage math behind "how much of the live distribution will my
    tokenizer's vocab miss", which raw counts cannot answer.

    Three nested aggregations, each a strict reduction: token counts
    → count-of-counts N_r → the bounded (lang × r) report. r* and p₀
    are exact integer ratios. N_{r+1} comes from a self-join of the
    tiny N_r table on r+1 (no window, no sort).
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "lang", F.explode(tokens_col(F.col("text"))).alias("w")
    )
    cw = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("r"))
    nr = cw.groupBy("lang", "r").agg(F.count(F.lit(1)).alias("n_r"))
    tot = cw.groupBy("lang").agg(
        F.sum("r").alias("n_tokens"),
        F.sum(F.when(F.col("r") == 1, 1).otherwise(0)).alias("f1"),
    )
    nxt = nr.select(
        "lang", (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    return (
        nr.filter(F.col("r") <= GT_MAX_R)
        .join(nxt, ["lang", "r"], "left")
        .join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "r",
            "n_r",
            F.round(
                (F.col("r") + 1).cast("double")
                * F.coalesce(F.col("n_r1"), F.lit(0)).cast("double")
                / F.col("n_r").cast("double"),
                6,
            ).alias("r_star"),
            F.round(
                F.col("f1").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ).alias("p0_unseen"),
        )
        .orderBy("lang", "r")
    )


GOOD_TURING_SQL = rf"""
WITH toks AS ({_TOKS_SQL}
), tok AS (
  SELECT lang, unnest(t) AS w FROM toks
), cw AS (
  SELECT lang, w, COUNT(*) AS r FROM tok GROUP BY lang, w
), nr AS (
  SELECT lang, r, COUNT(*) AS n_r FROM cw GROUP BY lang, r
), tot AS (
  SELECT lang, CAST(SUM(r) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1
  FROM cw GROUP BY lang
)
SELECT nr.lang, nr.r, nr.n_r,
       ROUND(CAST(nr.r + 1 AS DOUBLE) * CAST(COALESCE(nxt.n_r, 0) AS DOUBLE)
             / CAST(nr.n_r AS DOUBLE), 6) AS r_star,
       ROUND(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS p0_unseen
FROM nr
LEFT JOIN nr nxt ON nr.lang = nxt.lang AND nxt.r = nr.r + 1
JOIN tot ON nr.lang = tot.lang
WHERE nr.r <= {GT_MAX_R}
ORDER BY nr.lang, nr.r
"""


# --------------------------------------------- Chao1 richness (bigrams)
def chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate over BIGRAM types per language
    (Chao 1984): V̂ = V + f₁(f₁−1)/(2(f₂+1)) from singleton/doubleton
    counts — the lower bound on how many bigram types exist that the
    corpus hasn't seen yet, i.e. how far from saturated a language's
    coverage is (the bias-corrected form stays finite when f₂ = 0).

    Bigram types, not unigrams: the synthetic corpus's unigram vocab
    is tiny and fully saturated (f₁ = 0 → V̂ = V, a correct but
    vacuous answer); the bigram space is where the estimator works.
    Two aggregations over the exploded bigram stream; the estimate is
    one IEEE expression over four exact integers.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    b = _lang_bigrams(docs)
    c12 = b.groupBy("lang", "bg").agg(F.count(F.lit(1)).alias("c"))
    s = c12.groupBy("lang").agg(
        F.sum("c").alias("n_occurrences"),
        F.count(F.lit(1)).alias("v_observed"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
    )
    chao1 = F.col("v_observed").cast("double") + F.col("f1").cast("double") * (
        F.col("f1") - 1
    ).cast("double") / (F.lit(2.0) * (F.col("f2") + 1).cast("double"))
    return s.select(
        "lang",
        "n_occurrences",
        "v_observed",
        "f1",
        "f2",
        F.round(chao1, 6).alias("chao1"),
    ).orderBy("lang")


CHAO1_SQL = rf"""
WITH toks AS ({_TOKS_SQL}
), b AS (
  SELECT lang, z[1] || ' ' || z[2] AS bg
  FROM (SELECT lang, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
        FROM toks WHERE len(t) >= 2)
), c12 AS (
  SELECT lang, bg, COUNT(*) AS c FROM b GROUP BY lang, bg
)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_occurrences,
       COUNT(*) AS v_observed,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
       ROUND(COUNT(*)
             + CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1 AS DOUBLE)
               / (2.0 * CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1 AS DOUBLE)),
             6) AS chao1
FROM c12
GROUP BY lang
ORDER BY lang
"""


# ------------------------------------------- vocab coverage by min-count
COVERAGE_THRESHOLDS = [1, 2, 4, 8, 16, 32, 64]


def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-occurrence coverage of count-thresholded vocabularies per
    language: for each min-count T, how many token TYPES survive
    c(w) ≥ T and what share of all token OCCURRENCES they cover — the
    pruning curve a tokenizer build reads to pick its frequency
    cutoff (coverage ≥ 99.9% at T=8 ⇒ prune everything rarer).

    Deliberately threshold-based, NOT top-k-rank-based: ranking a
    100 TB corpus's vocabulary needs a tie-broken total order over
    |vocab| (a vocab²-bounded theta join, fine here but wasteful at
    scale), while threshold coverage is a pure second aggregation
    over the count table — the freq-of-freq shape that scales to any
    vocabulary. Shares are exact int/int divisions.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "lang", F.explode(tokens_col(F.col("text"))).alias("w")
    )
    cw = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = cw.groupBy("lang").agg(F.sum("c").alias("n_tokens"))
    th = cw.select(
        "lang",
        "c",
        F.explode(
            F.array(*[F.lit(t) for t in COVERAGE_THRESHOLDS])
        ).alias("threshold"),
    ).filter(F.col("c") >= F.col("threshold"))
    return (
        th.groupBy("lang", "threshold")
        .agg(F.count(F.lit(1)).alias("n_types"), F.sum("c").alias("covered"))
        .join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "threshold",
            "n_types",
            F.round(F.col("covered") / F.col("n_tokens"), 6).alias(
                "token_share"
            ),
        )
        .orderBy("lang", "threshold")
    )


VOCAB_COVERAGE_SQL = rf"""
WITH toks AS ({_TOKS_SQL}
), tok AS (
  SELECT lang, unnest(t) AS w FROM toks
), cw AS (
  SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY lang, w
), tot AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens FROM cw GROUP BY lang
), th AS (
  SELECT lang, c, t.threshold
  FROM cw CROSS JOIN (SELECT UNNEST([{", ".join(str(t) for t in COVERAGE_THRESHOLDS)}]) AS threshold) t
  WHERE c >= t.threshold
)
SELECT th.lang, threshold, COUNT(*) AS n_types,
       ROUND(CAST(SUM(c) AS BIGINT) / ANY_VALUE(n_tokens), 6) AS token_share
FROM th JOIN tot ON th.lang = tot.lang
GROUP BY th.lang, threshold
ORDER BY th.lang, threshold
"""


# ------------------------------------------- stupid backoff scoring
SB_ALPHA = 0.4                 # Brants et al. 2007 backoff weight
SB_ALPHA2 = SB_ALPHA * SB_ALPHA  # two backoff hops (Python-exact literal)
SB_S = 10**9                   # per-trigram-type score quantization


def _lang_trigrams(docs: DataFrame) -> DataFrame:
    """(lang, tg) one row per trigram OCCURRENCE (the _lang_bigrams
    zip_with shape, one more zip)."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 2),
        F.slice(toks, 2, n - 2),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tris = F.zip_with(
        pairs,
        F.slice(toks, 3, n - 2),
        lambda p, c: F.concat_ws(" ", p, c),
    )
    return docs.filter(n >= 3).select("lang", F.explode(tris).alias("tg"))


def stupid_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram scoring (Brants et al. 2007 — the
    smoothing Google's "Large Language Models in Machine
    Translation" showed beats Kneser-Ney at web scale because it
    needs NO discount tuning): score(w3|w1w2) = c(w1w2w3)/c(w1w2),
    else α·c(w2w3)/c(w2), else α²·c(w3)/N, on a 90/10 md5 doc split
    (train counts, held-out scoring — the ngram_novelty convention).
    Per language: positions resolved at each backoff level and the
    mean next-token score — the cheap LM-quality probe you run on a
    corpus slice before paying for a real perplexity eval.

    Scale shape: three train count tables (tri/bi/uni) and the held
    trigram stream are aggregations over one tokenized pass each;
    scoring is FOUR left equality joins at (lang, gram) granularity
    on the DISTINCT held trigram types (scores depend only on the
    type, so occurrences ride an integer multiplier). Per-type
    scores are exact count rationals quantized to 1e-9 before the
    occurrence-weighted DECIMAL sum — engine-exact at any SF. A
    language whose docs all fall in the held split still surfaces —
    as an all-unseen row (train totals are LEFT-joined), never a
    silent drop.
    """
    from cgtcalc_data_transformer_spark.operators.sampling import hash_bucket

    docs = scatter(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        "text",
        (hash_bucket(F.col("doc_id")) < NOVELTY_TRAIN_PCT).alias("is_train"),
    )
    train = docs.filter(F.col("is_train"))
    held = docs.filter(~F.col("is_train"))
    t3 = _lang_trigrams(train).groupBy("lang", "tg").agg(
        F.count(F.lit(1)).alias("c3")
    )
    # CACHED (r14 plan audit): b2 backs two join branches (ab / bc)
    # and u1 three (b / c / ntot); uncached, every branch re-ran the
    # train-split explode+count — 7 documents scans in the physical
    # plan (plans/r14/stupid_backoff_score_before.txt). Both frames
    # are model tables (bigram-type / vocab sized), the standard
    # materialize-the-LM-once shape (guide §2.4).
    b2 = (
        _lang_bigrams(train)
        .groupBy("lang", "bg")
        .agg(F.count(F.lit(1)).alias("c2"))
        .cache()
    )
    u1 = (
        train.select("lang", F.explode(tokens_col(F.col("text"))).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c1"))
        .cache()
    )
    ntot = u1.groupBy("lang").agg(F.sum("c1").alias("n_tok"))
    held_t = _lang_trigrams(held).groupBy("lang", "tg").agg(
        F.count(F.lit(1)).alias("occ")
    )
    ab = F.substring_index(F.col("tg"), " ", 2)
    bc = F.substring_index(F.col("tg"), " ", -2)
    bmid = F.substring_index(bc, " ", 1)
    cw = F.substring_index(F.col("tg"), " ", -1)
    parts = held_t.select(
        "lang",
        "tg",
        "occ",
        ab.alias("ab"),
        bc.alias("bc"),
        bmid.alias("b"),
        cw.alias("c"),
    )
    j = (
        parts.join(t3, ["lang", "tg"], "left")
        .join(
            b2.select(
                "lang", F.col("bg").alias("ab"), F.col("c2").alias("c2ab")
            ),
            ["lang", "ab"],
            "left",
        )
        .join(
            b2.select(
                "lang", F.col("bg").alias("bc"), F.col("c2").alias("c2bc")
            ),
            ["lang", "bc"],
            "left",
        )
        .join(
            u1.select("lang", F.col("w").alias("b"), F.col("c1").alias("c1b")),
            ["lang", "b"],
            "left",
        )
        .join(
            u1.select("lang", F.col("w").alias("c"), F.col("c1").alias("c1c")),
            ["lang", "c"],
            "left",
        )
        # LEFT join (ADVICE r11): a language whose docs ALL land in
        # the 10% held split has no train rows, so an inner join here
        # would silently DROP its held positions instead of reporting
        # them as n_unseen. n_tok is only read inside the uni branch,
        # which is guarded by c1c IS NOT NULL — impossible when the
        # language has no train unigrams — so the null never divides.
        .join(F.broadcast(ntot), "lang", "left")
    )
    sc = F.lit(float(SB_S))
    score = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3").cast("double") / F.col("c2ab").cast("double"),
        )
        .when(
            F.col("c2bc").isNotNull(),
            F.lit(SB_ALPHA)
            * F.col("c2bc").cast("double")
            / F.col("c1b").cast("double"),
        )
        .when(
            F.col("c1c").isNotNull(),
            F.lit(SB_ALPHA2)
            * F.col("c1c").cast("double")
            / F.col("n_tok").cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    level = (
        F.when(F.col("c3").isNotNull(), F.lit("tri"))
        .when(F.col("c2bc").isNotNull(), F.lit("bi"))
        .when(F.col("c1c").isNotNull(), F.lit("uni"))
        .otherwise(F.lit("unseen"))
    )
    sq = F.floor(score * sc + F.lit(0.5)).cast("long")
    terms = j.select(
        "lang",
        "occ",
        level.alias("level"),
        (F.col("occ").cast("decimal(19,0)") * sq.cast("decimal(19,0)")).alias(
            "wq"
        ),
    )
    s = terms.groupBy("lang").agg(
        F.sum("occ").alias("n_positions"),
        F.sum(F.when(F.col("level") == "tri", F.col("occ")).otherwise(0)).alias(
            "n_tri"
        ),
        F.sum(F.when(F.col("level") == "bi", F.col("occ")).otherwise(0)).alias(
            "n_bi"
        ),
        F.sum(F.when(F.col("level") == "uni", F.col("occ")).otherwise(0)).alias(
            "n_uni"
        ),
        F.sum(
            F.when(F.col("level") == "unseen", F.col("occ")).otherwise(0)
        ).alias("n_unseen"),
        F.sum("wq").alias("swq"),
    )
    mic = F.lit(float(10**6))
    return s.select(
        "lang",
        "n_positions",
        "n_tri",
        "n_bi",
        "n_uni",
        "n_unseen",
        F.floor(
            F.col("swq").cast("double")
            / sc
            / F.col("n_positions").cast("double")
            * mic
            + F.lit(0.5)
        )
        .cast("long")
        .alias("avg_score_micro"),
    ).orderBy("lang")


STUPID_BACKOFF_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::BIGINT
           % 100 < {NOVELTY_TRAIN_PCT} AS is_train,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     t -> t <> '') AS w
  FROM documents
), tri_occ AS (
  SELECT lang, is_train, unnest(
           CASE WHEN len(w) >= 3
                THEN [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
                ELSE [] END) AS tg
  FROM toks
), bi_occ AS (
  SELECT lang, is_train, unnest(
           CASE WHEN len(w) >= 2
                THEN [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
                ELSE [] END) AS bg
  FROM toks
), uni_occ AS (
  SELECT lang, is_train, unnest(w) AS u FROM toks
), t3 AS (
  SELECT lang, tg, COUNT(*) AS c3 FROM tri_occ WHERE is_train GROUP BY lang, tg
), b2 AS (
  SELECT lang, bg, COUNT(*) AS c2 FROM bi_occ WHERE is_train GROUP BY lang, bg
), u1 AS (
  SELECT lang, u, COUNT(*) AS c1 FROM uni_occ WHERE is_train GROUP BY lang, u
), ntot AS (
  SELECT lang, CAST(SUM(c1) AS BIGINT) AS n_tok FROM u1 GROUP BY lang
), held_t AS (
  SELECT lang, tg, COUNT(*) AS occ FROM tri_occ WHERE NOT is_train
  GROUP BY lang, tg
), parts AS (
  SELECT lang, tg, occ,
         array_to_string(string_split(tg, ' ')[1:2], ' ') AS ab,
         array_to_string(string_split(tg, ' ')[2:3], ' ') AS bc,
         string_split(tg, ' ')[2] AS b,
         string_split(tg, ' ')[3] AS c
  FROM held_t
), j AS (
  SELECT p.lang, p.occ,
         CASE WHEN t3.c3 IS NOT NULL THEN 'tri'
              WHEN bbc.c2 IS NOT NULL THEN 'bi'
              WHEN uc.c1 IS NOT NULL THEN 'uni'
              ELSE 'unseen' END AS level,
         CAST(p.occ AS DECIMAL(19,0)) * CAST(CAST(floor(
           CASE WHEN t3.c3 IS NOT NULL
                THEN CAST(t3.c3 AS DOUBLE) / CAST(bab.c2 AS DOUBLE)
                WHEN bbc.c2 IS NOT NULL
                THEN {SB_ALPHA!r} * CAST(bbc.c2 AS DOUBLE) / CAST(ub.c1 AS DOUBLE)
                WHEN uc.c1 IS NOT NULL
                THEN {SB_ALPHA2!r} * CAST(uc.c1 AS DOUBLE) / CAST(ntot.n_tok AS DOUBLE)
                ELSE 0.0 END * {SB_S} + 0.5) AS BIGINT) AS DECIMAL(19,0)) AS wq
  FROM parts p
  LEFT JOIN t3 ON t3.lang = p.lang AND t3.tg = p.tg
  LEFT JOIN b2 bab ON bab.lang = p.lang AND bab.bg = p.ab
  LEFT JOIN b2 bbc ON bbc.lang = p.lang AND bbc.bg = p.bc
  LEFT JOIN u1 ub ON ub.lang = p.lang AND ub.u = p.b
  LEFT JOIN u1 uc ON uc.lang = p.lang AND uc.u = p.c
  LEFT JOIN ntot ON ntot.lang = p.lang
)
SELECT lang,
       CAST(SUM(occ) AS BIGINT) AS n_positions,
       CAST(SUM(CASE WHEN level = 'tri' THEN occ ELSE 0 END) AS BIGINT) AS n_tri,
       CAST(SUM(CASE WHEN level = 'bi' THEN occ ELSE 0 END) AS BIGINT) AS n_bi,
       CAST(SUM(CASE WHEN level = 'uni' THEN occ ELSE 0 END) AS BIGINT) AS n_uni,
       CAST(SUM(CASE WHEN level = 'unseen' THEN occ ELSE 0 END) AS BIGINT) AS n_unseen,
       CAST(floor(CAST(SUM(wq) AS DOUBLE) / {SB_S}
                  / CAST(SUM(occ) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS avg_score_micro
FROM j GROUP BY lang ORDER BY lang
"""
