"""Deduplication operators over the ``documents`` table.

The reference *intends* exact dedup but never implements it (the
"construct a Set for exact deduplication" comment at
`/root/reference/index.js:110` builds no Set). This module provides
the real thing, plus the near-dup family a training-data pipeline
needs at 100 TB:

- exact dedup (hash-groupBy, keep smallest doc_id)
- n-gram (shingle) exact Jaccard pairs — the ground-truth near-dup
  measure; quadratic in the worst case, used at calibration scale
- MinHash + LSH banding — the scale path: candidate pairs only from
  band-bucket collisions, then exact Jaccard verification on the
  (tiny) candidate set. The hash family is ``min(md5(shingle || seed))``
  per doc — lexicographic min of a cryptographic hex string is a
  perfectly serviceable min-hash and is reproducible in any engine,
  which makes the whole LSH pipeline oracle-checkable in SQL.
- SimHash (64-bit) — Hamming-bucket near-dup, portable bit
  arithmetic from md5 hex nibbles.
- embedding-cosine near-dup over the ``embeddings`` table.

All shingling/tokenization is lower-cased ``[a-z0-9]`` word tokens;
shingles are ``SHINGLE_N``-grams joined by single spaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table, scatter

SHINGLE_N = 3
MINHASH_K = 12          # hashes in the signature
LSH_BANDS = 4           # bands of MINHASH_K // LSH_BANDS rows each
JACCARD_THRESHOLD = 0.5


def tokens_col(text: Column) -> Column:
    """lower-case word tokens ([a-z0-9] runs).

    ``regexp_extract_all`` instead of split+filter: the filter HOF
    lambda is interpreted per element; extract_all stays in codegen.
    Equivalent to lower → non-alnum→space → split → drop-empty (the
    formulation the DuckDB oracles spell out).
    """
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z0-9]+"), 0)


def shingle_rows(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """documents → distinct (doc_id, shingle) rows.

    Fully codegen shape: posexplode tokens → window ``lead`` to form
    n-grams → distinct. Deliberately NOT a higher-order-function
    ``transform``: HOF lambdas are interpreted (~40 µs/element — a
    measured 15 s for 260k shingles on this corpus vs <1 s for this
    plan). The window shuffle partitions by doc_id, which the
    downstream per-doc aggregations reuse.
    """
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    grams = tok.select(
        "doc_id",
        F.when(
            parts[-1].isNotNull(), F.concat_ws(" ", *parts)
        ).alias("shingle"),
    )
    return grams.filter(F.col("shingle").isNotNull()).distinct()


def shingle_sizes(shingles: DataFrame) -> DataFrame:
    """(doc_id, shingle) rows → (doc_id, n_sh)."""
    return shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))


# --------------------------------------------------------- exact dedup
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup: one survivor (min doc_id) per distinct text.

    groupBy on the full text shuffles long strings; at scale you
    group on ``xxhash64(text)`` first and only compare texts within
    a colliding bucket — the md5 variant here keeps the oracle exact.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .filter(F.col("dup_count") >= 1)
        .orderBy("keep_doc_id")
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS dup_count
FROM documents
GROUP BY md5(text)
ORDER BY keep_doc_id
"""


# ----------------------------------------------- exact n-gram Jaccard
def _pair_overlap(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """(doc_a, doc_b, inter, n_a, n_b) exact integer overlap stats
    for given pairs via per-doc shingle SETS and ``array_intersect``
    (zero-overlap pairs get inter = 0 from the empty intersection).

    Shape (r14 rewrite — VERDICT r13 item 1): the old formulation
    joined ``pairs`` against the exploded shingle rows and hash-
    aggregated the intersections, shuffling |pairs| × avg_shingles
    rows (measured 211M rows for 3.1M sf1 candidates → the one
    super-linear sweep entry, 9.4× wall at 10× data, spilling through
    any partition count). This plan instead aggregates shingles once
    into one bounded set-valued row per doc (set size ≤ doc token
    count by construction, ~52 here) and equality-joins ``pairs`` to
    those rows twice; the intersection is computed per pair row
    JVM-side with no re-shuffle or re-aggregation. Shuffle volume is
    |pairs| + 2·|docs| rows — linear in candidates, not candidates ×
    shingles. Arrays never reach driver output (driver-output rule).

    Exactness: shingle rows are DISTINCT per doc (shingle_rows), so
    size(collect_set) == the old count(*) and size(array_intersect)
    is the exact set-intersection cardinality.
    """
    sets = (
        shingles.groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh_set"))
        .withColumn("n_sh", F.size("sh_set"))
    )
    return (
        pairs.join(
            sets.select(
                F.col("doc_id").alias("doc_a"),
                F.col("sh_set").alias("sh_a"),
                F.col("n_sh").alias("n_a"),
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"),
                F.col("sh_set").alias("sh_b"),
                F.col("n_sh").alias("n_b"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            # cast to long: the pre-r14 formulation produced count(*)
            # longs and downstream integer expressions must not change
            # type (driver schema hash, `div` semantics)
            F.size(F.array_intersect("sh_a", "sh_b"))
            .cast("long")
            .alias("inter"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
        )
    )


def _jaccard_for_pairs(
    pairs: DataFrame, shingles: DataFrame, threshold: float | None = None
) -> DataFrame:
    """Exact Jaccard for given (doc_a, doc_b) pairs (see
    ``_pair_overlap`` for the integer machinery).

    ``threshold`` filters on the UNROUNDED ratio via the multiply
    form ``inter >= t * union`` — exact in double for t=0.5 (power of
    two) and integer operands < 2^53, so the emitted predicate
    coincides with the prefix/length filters' "true jaccard >= t"
    guarantee (ADVICE r5: filtering the ROUND(...,6) value admitted
    pairs in [t - 5e-7, t) that the lossless filters may prune).
    ``jaccard`` stays rounded for display only.
    """
    out = _pair_overlap(pairs, shingles)
    if threshold is not None:
        out = out.filter(
            F.col("inter")
            >= F.lit(threshold)
            * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
    return out.withColumn(
        "jaccard",
        F.round(
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
        ),
    ).select("doc_a", "doc_b", "jaccard")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (≥ 0.5).

    The shingle self-join is the textbook exact method — fine at
    calibration scale, quadratic on hot shingles at 100 TB (that's
    what the MinHash variant below is for).
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    shingles = shingle_rows(docs).cache()
    sizes = shingle_sizes(shingles)
    pairs = (
        shingles.alias("a")
        .join(
            shingles.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "n_b"}), "doc_b")
        # unrounded threshold (multiply form, exact for t=0.5) — the
        # display column rounds, the predicate must not (ADVICE r5)
        .filter(
            F.col("inter")
            >= F.lit(JACCARD_THRESHOLD)
            * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
            ),
        )
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


_SHINGLES_CTE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\\s+'),
                     t -> t <> '') AS w
  FROM documents
), shingled AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)])
              ELSE [] END AS shingles
  FROM toks
)
"""

DEDUP_NGRAM_SQL = (
    _SHINGLES_CTE
    + """
, sizes AS (
  SELECT doc_id, len(shingles) AS n_sh FROM shingled WHERE len(shingles) > 0
), exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM exploded a JOIN exploded b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
-- unrounded threshold (multiply form, exact for t=0.5): must match
-- the Spark predicate AND the prefix/length filters' true-jaccard
-- guarantee; ROUND is display-only (ADVICE r5)
WHERE inter >= 0.5 * (sa.n_sh + sb.n_sh - inter)
ORDER BY doc_a, doc_b
"""
)


# --------------------------------- prefix-filtering exact sim join
def simjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard similarity join at scale via prefix filtering
    (the AllPairs/PPJoin recipe, Bayardo et al., WWW'07) — the
    non-quadratic exact path beside the quadratic calibration join
    above and the approximate MinHash-LSH path.

    Guarantee: if jaccard(A, B) >= t, then A and B must share at
    least one shingle within each document's PREFIX — its
    ``n - ceil(t*n) + 1`` globally RAREST shingles (global df
    ascending, shingle as tiebreak). So the candidate join runs only
    over prefix postings, whose fan-out is bounded by construction:
    the prefix deliberately keeps the rare end of the df
    distribution, which is exactly where posting lists are short.
    Verification then computes exact Jaccard for candidates only.

    Result set is IDENTICAL to ``dedup_ngram_jaccard`` (the filter is
    lossless) — the oracle is therefore the INDEPENDENT quadratic
    formulation, the strongest cross-check shape in the registry, and
    ``test_simjoin_prefix_equals_quadratic`` pins it in-engine too.

    Plan: shingles → df counts (one agg) → per-doc rank window
    (partitioned by doc_id) → prefix filter → equality join on
    shingle → pair dedup + PPJoin positional filter (one agg) →
    set-array verify (_pair_overlap: two equality joins against
    per-doc shingle sets, per-row array_intersect). No doc×doc
    product anywhere; every join is an equality join, and the r13
    super-linear verify explode (|cands| × avg_shingles shuffled
    rows) is gone — verify shuffles |cands| + 2·|docs| rows.
    """
    cands, shingles = _prefix_candidates(spark, sf_dir)
    return _jaccard_for_pairs(
        cands, shingles, threshold=JACCARD_THRESHOLD
    ).orderBy("doc_a", "doc_b")


def _prefix_candidates(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(candidate pairs, cached shingles) — the shared AllPairs
    prefix+length filter machinery behind simjoin_prefix and
    simjoin_prefix_summary."""
    from pyspark.sql import Window

    docs = scatter(load_table(spark, sf_dir, "documents"))
    shingles = shingle_rows(docs).cache()
    df_counts = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    sizes = shingle_sizes(shingles)
    ranked = (
        shingles.join(df_counts, "shingle")
        .join(sizes, "doc_id")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
    )
    prefix = ranked.filter(
        F.col("rnk")
        <= F.col("n_sh") - F.ceil(F.lit(JACCARD_THRESHOLD) * F.col("n_sh")) + 1
    ).select("doc_id", "shingle", "df", "rnk", "n_sh")
    # length filter (also lossless): jaccard(A,B) >= t requires
    # t*|A| <= |B| <= |A|/t, so size-mismatched prefix collisions are
    # dropped BEFORE the distinct/verify stages (the other half of the
    # AllPairs bound; prunes the hot-shingle fan-out further)
    cands = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.col("b.n_sh")
                >= F.ceil(F.lit(JACCARD_THRESHOLD) * F.col("a.n_sh"))
            )
            & (
                F.col("b.n_sh") * F.lit(JACCARD_THRESHOLD)
                <= F.col("a.n_sh")
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.struct(
                F.col("a.df").alias("df"),
                F.col("a.shingle").alias("shingle"),
                F.col("a.rnk").alias("rnk_a"),
                F.col("b.rnk").alias("rnk_b"),
                F.col("a.n_sh").alias("n_a"),
                F.col("b.n_sh").alias("n_b"),
            ).alias("tok"),
        )
        # PPJoin positional filter (Xiao et al., WWW'08 §3.2), folded
        # into the dedup that used to be a plain .distinct() — same
        # shuffle, vastly fewer survivors. min(struct) under the
        # (df, shingle) rank order picks each pair's globally FIRST
        # common shingle s*; every common shingle of the pair sorts
        # >= s*, so inter <= min(n_a - rnk_a + 1, n_b - rnk_b + 1).
        # jaccard >= t forces inter >= t/(1+t)·(n_a+n_b), so pairs
        # whose positional upper bound misses that overlap floor can
        # be dropped LOSSLESSLY before verification. s* is provably
        # visible to this prefix-only join for every qualifying pair:
        # AllPairs guarantees SOME common shingle inside both
        # prefixes, and s* sorts <= it, hence sits inside both
        # prefixes too. Multiply form keeps the predicate exact for
        # t = 0.5 (power of two, integer operands < 2^53) — same
        # discipline as _jaccard_for_pairs. Measured at sf1: 3.10M
        # candidate pairs -> 1.25M verified inputs (and the count
        # still scales exactly 10.0x vs sf0.1's 125k, so the filter
        # stays scale-correct); with the set-array verify this takes
        # the sweep row from 9.4x wall at 10x data to ~3.6x
        # (tools/scaling_notes_r14.md).
        .groupBy("doc_a", "doc_b")
        .agg(F.min("tok").alias("m"))
        .filter(
            (F.lit(1.0) + F.lit(JACCARD_THRESHOLD))
            * F.least(
                F.col("m.n_a") - F.col("m.rnk_a") + 1,
                F.col("m.n_b") - F.col("m.rnk_b") + 1,
            )
            >= F.lit(JACCARD_THRESHOLD) * (F.col("m.n_a") + F.col("m.n_b"))
        )
        .select("doc_a", "doc_b")
    )
    return cands, shingles


# Lossless filter ⇒ same rows as the quadratic ground truth; using the
# independent quadratic SQL as the oracle cross-checks the whole
# prefix machinery, not just the arithmetic.
SIMJOIN_PREFIX_SQL = DEDUP_NGRAM_SQL


# ------------------------- monitoring summary of the exact sim join
SIMJOIN_SUMMARY_K = 5   # example pairs reported


def simjoin_prefix_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-only/top-K summary of the exact prefix-filtered
    similarity join (VERDICT r10 item 6): per Jaccard DECILE BAND the
    number of qualifying pairs, plus the SIMJOIN_SUMMARY_K
    highest-similarity example pairs — the monitoring-shaped output
    whose size is bounded by (bands + K) rows no matter the corpus,
    unlike ``simjoin_prefix`` whose full pair LIST is the product
    (output-bound ~10× at 10× data, SCALING.md). Run THIS when the
    question is "how much near-duplication is there", and the full
    join only when materializing pairs is the point.

    Same lossless candidate machinery (one shared implementation,
    ``_prefix_candidates``); the band index and jaccard_micro are
    exact integer divisions of the overlap counts (no float compare
    anywhere), sentinel −1 fills the columns the other row kind
    doesn't use (NULL-free: both engines' pandas bridges widen
    nullable int64 to float64, which the type-strict driver hash
    would flag).
    """
    cands, shingles = _prefix_candidates(spark, sf_dir)
    ov = (
        _pair_overlap(cands, shingles)
        .filter(
            F.col("inter")
            >= F.lit(JACCARD_THRESHOLD)
            * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
        .withColumn("ub", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("10 * inter div ub").cast("long").alias("band"),
            F.expr("1000000 * inter div ub").cast("long").alias(
                "jaccard_micro"
            ),
        )
        # Both output branches (the per-band rollup AND the top-K
        # examples) derive from THIS frame; without the persist the
        # union re-executes the candidate join + overlap aggregation
        # once per branch — and exchange reuse can never recover it,
        # because the self-join attribute dedup makes the duplicated
        # subtrees non-identical (VERDICT r11: confirmed 2x execution,
        # 9.87 s vs simjoin_prefix's 4.42 s at sf0.1). Same discipline
        # as the shingles cache above; ov is band+pair-bounded, tiny.
        .persist()
    )
    bands = ov.groupBy("band").agg(F.count(F.lit(1)).alias("n_pairs")).select(
        F.lit("band").alias("kind"),
        "band",
        "n_pairs",
        F.lit(-1).cast("long").alias("doc_a"),
        F.lit(-1).cast("long").alias("doc_b"),
        F.lit(-1).cast("long").alias("jaccard_micro"),
    )
    examples = (
        ov.orderBy(F.desc("jaccard_micro"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(SIMJOIN_SUMMARY_K)
        .select(
            F.lit("example").alias("kind"),
            "band",
            F.lit(-1).cast("long").alias("n_pairs"),
            "doc_a",
            "doc_b",
            "jaccard_micro",
        )
    )
    return bands.unionByName(examples).orderBy(
        "kind", "band", "doc_a", "doc_b"
    )


SIMJOIN_SUMMARY_SQL = (
    _SHINGLES_CTE
    + """
, sizes AS (
  SELECT doc_id, len(shingles) AS n_sh FROM shingled WHERE len(shingles) > 0
), exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
), ipairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM exploded a JOIN exploded b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), ov AS (
  SELECT doc_a, doc_b,
         CAST(10 * inter // (sa.n_sh + sb.n_sh - inter) AS BIGINT) AS band,
         CAST({MICRO} * inter // (sa.n_sh + sb.n_sh - inter) AS BIGINT)
           AS jaccard_micro
  FROM ipairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE inter >= 0.5 * (sa.n_sh + sb.n_sh - inter)
)
SELECT * FROM (
  SELECT 'band' AS kind, band, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(-1 AS BIGINT) AS doc_a, CAST(-1 AS BIGINT) AS doc_b,
         CAST(-1 AS BIGINT) AS jaccard_micro
  FROM ov GROUP BY band
  UNION ALL
  SELECT 'example' AS kind, band, CAST(-1 AS BIGINT) AS n_pairs,
         doc_a, doc_b, jaccard_micro
  FROM (SELECT * FROM ov
        ORDER BY jaccard_micro DESC, doc_a ASC, doc_b ASC
        LIMIT {K})
)
ORDER BY kind, band, doc_a, doc_b
"""
).format(MICRO=10**6, K=SIMJOIN_SUMMARY_K)


# ---------------------------------- repeated-substring (span) dedup
SUBSTR_K = 8  # minimum duplicated span length, in tokens


def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SUBSTRING detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): find every maximal span of >= SUBSTR_K tokens
    that occurs at more than one site in the corpus (cross-doc or
    within-doc) and report per-doc span statistics. ``segment_dedup``
    (curation.py) hashes FIXED 8-token aligned segments; this is the
    sliding-window form, which catches arbitrary-length repeats at
    arbitrary offsets — any repeated substring of length L >= K shows
    up as a run of L-K+1 consecutive duplicated K-grams, so merging
    consecutive duplicated positions reconstructs the maximal spans
    Lee et al.'s suffix array emits, without ever building one.

    Plan: posexplode tokens → K-gram per position via lead() inside
    the doc-partitioned window (one shuffle by doc_id, reused by the
    island windows below) → md5 the gram so the big shuffle moves
    32-byte hashes, not K-token strings → ONE map-side-combinable
    count per gram → duplicated positions join (equality, shingle-
    rarity-bounded fan-out) → per-doc interval merge (lag/cumsum
    windows, doc-bounded partitions) → per-doc rollup. Linear in
    corpus tokens with a K× working-set blowup at the gram stage —
    the classic space/shuffle tradeoff vs. the O(n) suffix array,
    which is the single-machine formulation, not the distributed one.

    Two positions join the same island iff their K-gram windows
    OVERLAP (pos - prev < K); merely adjacent duplicated spans stay
    separate spans.
    """
    from pyspark.sql import Window

    docs = scatter(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, SUBSTR_K)]
    grams = (
        tok.select(
            "doc_id",
            "pos",
            F.when(parts[-1].isNotNull(), F.md5(F.concat_ws(" ", *parts))).alias(
                "g"
            ),
        )
        .filter(F.col("g").isNotNull())
        .cache()  # feeds the dup-count agg AND the join back
    )
    dup_g = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("sites"))
        .filter(F.col("sites") > 1)
        .select("g")
    )
    dpos = grams.join(dup_g, "g").select("doc_id", "pos")
    islands = (
        dpos.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "new_island",
            (
                F.col("prev").isNull()
                | (F.col("pos") - F.col("prev") >= SUBSTR_K)
            ).cast("long"),
        )
        .withColumn("island", F.sum("new_island").over(w))
    )
    spans = islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + F.lit(SUBSTR_K - 1)).alias("e"),
    )
    # positions run 0..n-K, so n_tokens = max(pos) + K — read it off
    # the cached gram frame instead of a second tokenize pass (docs
    # with < K tokens have no grams, no spans, and no output row)
    n_toks = grams.groupBy("doc_id").agg(
        (F.max("pos") + F.lit(SUBSTR_K)).alias("n_tokens")
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
        )
        .join(n_toks, "doc_id")
        .select(
            "doc_id",
            "n_dup_spans",
            "dup_tokens",
            "n_tokens",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias(
                "dup_fraction"
            ),
        )
        .orderBy("doc_id")
    )


SUBSTRING_DEDUP_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     t -> t <> '') AS w
  FROM documents
), grams AS (
  SELECT doc_id, s.i - 1 AS pos,
         md5(array_to_string(w[s.i:s.i + {SUBSTR_K - 1}], ' ')) AS g
  FROM toks,
       LATERAL (SELECT unnest(range(1, len(w) - {SUBSTR_K} + 2)) AS i) s
  WHERE len(w) >= {SUBSTR_K}
), dup_g AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 1
), dpos AS (
  SELECT doc_id, pos FROM grams JOIN dup_g USING (g)
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos - lag(pos) OVER w >= {SUBSTR_K}
              THEN 1 ELSE 0 END AS new_island
  FROM dpos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), isl2 AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
), spans AS (
  SELECT doc_id, island, MIN(pos) AS lo, MAX(pos) + {SUBSTR_K - 1} AS hi
  FROM isl2 GROUP BY doc_id, island
), n_toks AS (
  SELECT doc_id, MAX(pos) + {SUBSTR_K} AS n_tokens FROM grams GROUP BY doc_id
)
SELECT sp.doc_id,
       COUNT(*) AS n_dup_spans,
       CAST(SUM(hi - lo + 1) AS BIGINT) AS dup_tokens,
       ANY_VALUE(n_tokens) AS n_tokens,
       ROUND(CAST(SUM(hi - lo + 1) AS BIGINT) / ANY_VALUE(n_tokens), 6) AS dup_fraction
FROM spans sp JOIN n_toks USING (doc_id)
GROUP BY sp.doc_id
ORDER BY sp.doc_id
"""


# --------------------------------------------------- MinHash + LSH
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(12) + LSH(4 bands × 3 rows) candidate pairs, verified
    with exact Jaccard.

    Scale shape: per-doc signature is one groupBy over exploded
    shingles (map-side combinable mins); banding turns the quadratic
    all-pairs into equality joins on (band, bucket); only candidate
    pairs — a vanishing fraction — pay the exact-verify cost.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    # (doc_id, shingle) rows are reused by three branches (signature,
    # verify-a, verify-b); cache them — at 100 TB you would checkpoint
    # to parquet instead of memory.
    exploded = shingle_rows(docs).cache()

    sig = exploded.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#seed{k}")))).alias(f"h{k}")
            for k in range(MINHASH_K)
        ]
    )
    rows_per_band = MINHASH_K // LSH_BANDS

    def _band_bucket(b: int):
        return F.md5(
            F.concat_ws(
                "|", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        )

    # melt bands to rows → ONE equality self-join on (band_idx, bucket)
    # instead of LSH_BANDS separate joins over recomputed signatures
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"), _band_bucket(b).alias("bucket")
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band_idx", "bb.bucket").cache()

    cands = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # exact-verify candidates only
    return _jaccard_for_pairs(cands, exploded).orderBy("doc_a", "doc_b")


_MINHASH_CTES = (
    _SHINGLES_CTE
    + """
, nonempty AS (
  SELECT doc_id, shingles FROM shingled WHERE len(shingles) > 0
), exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM nonempty
), sig AS (
  SELECT doc_id,
"""
    + ",\n".join(
        f"         MIN(md5(shingle || '#seed{k}')) AS h{k}" for k in range(MINHASH_K)
    )
    + """
  FROM exploded GROUP BY doc_id
), banded AS (
  SELECT doc_id,
"""
    + ",\n".join(
        "         md5("
        + " || '|' || ".join(f"h{b * (MINHASH_K // LSH_BANDS) + r}" for r in range(MINHASH_K // LSH_BANDS))
        + f") AS band{b}"
        for b in range(LSH_BANDS)
    )
    + """
  FROM sig
), cands AS (
"""
    + "\n  UNION\n".join(
        f"""  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"""
        for b in range(LSH_BANDS)
    )
    + """
)
"""
)

_JACCARD_SELECT = """
SELECT doc_a, doc_b,
       ROUND(len(list_intersect(sa.shingles, sb.shingles)) /
             (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
FROM cands
JOIN nonempty sa ON sa.doc_id = doc_a
JOIN nonempty sb ON sb.doc_id = doc_b
"""

DEDUP_MINHASH_SQL = _MINHASH_CTES + _JACCARD_SELECT + "ORDER BY doc_a, doc_b\n"

# Connected components as a recursive transitive closure over the
# same LSH pair set: reach = edges UNION reach⋈edges; component label
# = min reachable doc_id. Safe on near-dup graphs (components are
# small); the Spark side's iterative label propagation scales instead.
DEDUP_CLUSTERS_SQL = (
    _MINHASH_CTES.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + ", pairs AS (\n  SELECT * FROM ("
    + _JACCARD_SELECT
    + f"""  ) WHERE jaccard >= {JACCARD_THRESHOLD}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT a AS n, b AS m FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
), comp AS (
  SELECT n AS doc_id, LEAST(n, MIN(m)) AS cluster_id FROM reach GROUP BY n
)
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       (d.doc_id = COALESCE(c.cluster_id, d.doc_id)) AS is_representative
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
ORDER BY d.doc_id
"""
)


# --------------------------------------------- dedup cluster resolution
def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(doc_a, doc_b) undirected pairs → (doc_id, cluster_id) where
    cluster_id = min doc_id of the connected component.

    Iterative min-label propagation (the GraphX/large-star shape as
    plain DataFrame ops): each round every node takes the min of its
    own label and its neighbors' labels; converges in O(diameter)
    rounds. The driver loop checks a scalar convergence count per
    round — the standard pattern for iterative algorithms on Spark
    (the data never visits the driver). Near-dup components are tiny,
    so this converges in 2-3 rounds at any corpus size.
    """
    # one mirror pass (r12 union audit): the fwd/rev self-union
    # executed the caller's pair lineage — for dedup_clusters the
    # whole MinHash-LSH candidate join — once per branch before the
    # cache materialized
    from cgtcalc_data_transformer_spark.operators.graph import mirror_edges

    edges = mirror_edges(pairs, "doc_a", "doc_b").distinct().cache()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .cache()
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["doc_id"] == neighbor_min["src"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Silent partial propagation would diverge from the
        # transitive-closure oracle — fail loudly instead (ADVICE r1).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); component diameter exceeds "
            f"max_iter — raise max_iter for this graph"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution: MinHash-LSH pairs (jaccard ≥ 0.5)
    → connected components → one representative (min doc_id) per
    cluster; singletons keep themselves.

    Spark side: driver-looped min-label propagation (O(diameter)
    rounds, each a self-join — scales to big graphs). Oracle side:
    the same components via a recursive-CTE transitive closure
    (fine for small near-dup components, quadratic per component).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_minhash_lsh(spark, sf_dir).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    comp = connected_components(pairs.select("doc_a", "doc_b"))
    return (
        docs.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_representative", (F.col("doc_id") == F.col("cluster_id")))
        .orderBy("doc_id")
    )


# ------------------------------------------------------------ SimHash
def simhash_col(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash from md5 nibbles of each distinct token.

    Pure higher-order-function arithmetic (no UDF): for each of 16
    hex nibbles of each token's md5, add ±1 per bit into 64 counters,
    then take sign bits. Portable: the same nibble arithmetic runs in
    any engine with md5 + list ops.
    """
    toks = F.array_distinct(tokens_col(text))
    # per token: 16 nibbles → 64 ±1 contributions
    nib = lambda t, i: F.conv(F.substring(F.md5(t), i + 1, 1), 16, 10).cast("int")
    contribs = F.transform(
        toks,
        lambda t: F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda i: F.array(
                    *[
                        F.when(
                            F.shiftright(nib(t, i), j).bitwiseAND(F.lit(1)) == 1,
                            F.lit(1),
                        ).otherwise(F.lit(-1))
                        for j in range(4)
                    ]
                ),
            )
        ),
    )
    counters = F.aggregate(
        contribs,
        F.array_repeat(F.lit(0), bits),
        lambda acc, c: F.zip_with(acc, c, lambda a, b: a + b),
    )
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(bits - 1)])
    low_bits = F.zip_with(
        F.slice(counters, 1, bits - 1),
        weights,
        lambda c, w: F.when(c > 0, w).otherwise(F.lit(0).cast("long")),
    )
    top = F.when(F.element_at(counters, bits) > 0, F.lit(-(1 << 63)).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    return F.aggregate(low_bits, F.lit(0).cast("long"), lambda a, b: a + b) + top


def simhash_agg(docs: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash) via explode → codegen aggregate.

    Same nibble arithmetic as :func:`simhash_col`, different physical
    shape: higher-order-function lambdas are excluded from whole-stage
    codegen, so the row-local column evaluates its ~64 contributions
    per token on the interpreted expression path (measured ~10 s for
    5k docs at sf0.1 — 20x the rest of the dedup family). Exploding to
    one row per (doc, token) turns the same math into 64 plain SUM
    aggregates: fully codegen'd, map-side partial aggregation, one
    shuffle of 64 small longs per doc — the formulation that scales to
    a 100 TB corpus (and mirrors DEDUP_SIMHASH_SQL's shape exactly).

    ``explode_outer`` + a null guard keeps token-less documents in the
    aggregate with all-zero counters → signature 0, identical to the
    row-local column and the SQL oracle's COALESCE.
    """
    toks = scatter(docs).select(
        "doc_id",
        F.explode_outer(F.array_distinct(tokens_col(F.col("text")))).alias("tok"),
    )
    # Parse the 16-hex-char md5 prefix ONCE per row into two unsigned
    # 32-bit halves, then aggregate 64 pure-integer bit sums. The ±1
    # counter never needs materializing: over n tokens,
    # c_b = 2*s_b - n where s_b = Σ bit_b — so "c_b > 0" is
    # "2*s_b > n". The earlier shape re-did conv(substring(hex,·,1))
    # string parsing inside every one of the 64 aggregate expressions
    # (no CSE across aggregates) — ~4x slower on the same plan.
    hashed = toks.select(
        "doc_id", F.md5("tok").alias("h")
    ).select(
        "doc_id",
        F.conv(F.substring("h", 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring("h", 9, 8), 16, 10).cast("long").alias("lo"),
    )
    # Hex char at 1-based position i+1 is the (7-i)th nibble of `hi`
    # (i<8) / the (15-i)th nibble of `lo` (i>=8); bit j within the
    # nibble is bit (nib*4 + j) of the half. Same b = i*4+j indexing
    # as the SQL oracle.
    aggs = [F.count("hi").alias("n")]
    for i in range(16):
        for j in range(4):
            b = i * 4 + j
            half, nib = ("hi", 7 - i) if i < 8 else ("lo", 15 - i)
            aggs.append(
                F.sum(F.shiftright(F.col(half), nib * 4 + j).bitwiseAND(F.lit(1))).alias(
                    f"s{b}"
                )
            )
    counters = hashed.groupBy("doc_id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        bit_set = (F.coalesce(F.col(f"s{b}"), F.lit(0)) * 2) > F.col("n")
        val = F.lit(-(1 << 63)) if b == bits - 1 else F.lit(1 << b)
        sig = sig + F.when(bit_set, val.cast("long")).otherwise(F.lit(0).cast("long"))
    return counters.select("doc_id", sig.alias("simhash"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 64-bit SimHash + 16-bit prefix bucket for blocking.

    Near-dup candidates share a prefix bucket; Hamming distance on
    the full signature refines. Emitted per-doc (not pairs) so the
    oracle can hash-match the signatures themselves.
    """
    docs = load_table(spark, sf_dir, "documents")
    return simhash_agg(docs).select(
        "doc_id",
        "simhash",
        F.shiftrightunsigned("simhash", 48).alias("bucket16"),
    ).orderBy("doc_id")


# Portable nibble arithmetic: the identical ±1/sign-bit computation
# spelled out in SQL (md5 nibbles via strpos on the hex alphabet).
DEDUP_SIMHASH_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS tok
  FROM documents
), contrib AS (
  SELECT doc_id,
         i * 4 + j AS bit,
         CASE WHEN ((strpos('0123456789abcdef', substr(md5(tok), CAST(i + 1 AS INTEGER), 1)) - 1) >> j) & 1 = 1
              THEN 1 ELSE -1 END AS c
  FROM toks
  CROSS JOIN (SELECT unnest(range(0, 16)) AS i)
  CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
), counters AS (
  SELECT doc_id, bit, SUM(c) AS s FROM contrib GROUP BY doc_id, bit
), sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN
              CASE WHEN bit = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
                   ELSE CAST(1::BIGINT << bit AS HUGEINT) END
              ELSE 0 END) AS BIGINT) AS simhash,
         CAST(SUM(CASE WHEN s > 0 AND bit >= 48 THEN (1::BIGINT << (bit - 48)) ELSE 0 END) AS BIGINT) AS bucket16
  FROM counters GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(sig.simhash, 0) AS simhash, COALESCE(sig.bucket16, 0) AS bucket16
FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id
ORDER BY d.doc_id
"""


# ------------------------------------------- embedding-cosine near-dup
COSINE_DUP_THRESHOLD = 0.4  # demo threshold — real near-dup pipelines use ~0.95;
# the driver's synthetic embeddings are random (max pairwise cosine ≈ 0.48)

# Blocking parameters, tuned for dedup (all-pairs) rather than top-k
# search: more bits per table than similarity.ann_lsh because the
# candidate count per bucket is what's quadratic. L tables of k bits:
# P(pair collides) = 1-(1-p^k)^L with p = 1 - angle/pi.
#
# k must grow with log2(n): expected bucket occupancy is n/2^k and
# candidate volume ~ L·n²/2^k, so a FIXED k is quadratic in n — the
# round-4 sf1 bench caught exactly that (k=6 → 64 buckets/table was
# 55× wall for 10× data; 20k vectors ≈ 312 per bucket). k=12 keeps
# occupancy O(1) through the bench scales; at 100 TB, size
# k ≈ log2(n) − log2(target_occupancy) when writing the bucketed
# index. Chance collisions vanish with sparser buckets while
# genuinely-near pairs still collide via hyperplane agreement — only
# the (documented, oracle-mirrored) low-cosine recall drops.
EMB_LSH_TABLES = 8
EMB_LSH_BITS = 12
EMB_LSH_SEED = 101


def _emb_hyperplanes(dim: int = 64) -> list:
    """EMB_LSH_TABLES × EMB_LSH_BITS × dim, deterministic plan literals."""
    import numpy as np

    rng = np.random.default_rng(EMB_LSH_SEED)
    return rng.standard_normal((EMB_LSH_TABLES, EMB_LSH_BITS, dim)).round(6).tolist()


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold, LSH-blocked.

    Candidate pairs come from random-hyperplane LSH bucket collisions
    (equality self-join on (table, bucket) — the only join shape that
    survives 100 TB); exact cosine runs only on colliding pairs. The
    deliberately-approximate recall (hyperplanes are seeded plan
    literals) is mirrored exactly by the DuckDB oracle, so the gate
    checks the full candidate-generation + verify pipeline.

    Minimum fixture scale: sf0.01 (k=12 buckets leave ~1 surviving
    pair there; sf0.001 can be empty → vacuous gate). The old
    all-pairs variant (BroadcastNestedLoopJoin, O(n²) HOF cosines)
    was the one scale-killer in the repo — replaced per VERDICT r1.
    """
    from cgtcalc_data_transformer_spark.operators.similarity import (
        dot_sql_text,
        dot_unrolled_sql_text,
        lit_array_sql_text,
    )

    planes = _emb_hyperplanes()
    emb = scatter(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # r15 (VERDICT r14 item 2 trim): the two verify re-attach sides
    # only need (vec_id, v) for a broadcast build — the scatter()
    # round-robin repartition is justified ONLY ahead of the
    # CPU-heavy 96-dot-product bucket projections, so rebuilding it
    # under each re-attach branch paid two extra Exchanges + scans
    # for nothing (guide §2.4 "remove shuffles outright"; plan pair
    # plans/r15/dedup_embedding_cosine_{before,after}.txt).
    emb_raw = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )

    # r14 plan shape (same values, adjudication of the 6.2x sf1 sweep
    # row): (1) the bucket self-join and pair dedup carry IDS ONLY —
    # the 64-double vectors rejoin for the exact-cosine verify (the
    # _pair_overlap discipline), whose cosine is UNROLLED codegen
    # (bit-identical summation order — similarity.dot_expr_unrolled).
    # The 96 bucket projections deliberately STAY in the compact HOF
    # form: unrolling them too was measured 2x faster per stage in
    # isolation, but the ~12k-node tree duplicated across the
    # self-join branches sent Catalyst optimization time to minutes —
    # driver-side plan cost is part of the scale budget too.
    def bucket_expr(table_planes):
        # ONE parsed expression for the whole 12-bit bucket: each py4j
        # round-trip is ~4 ms and fresh-plan bench runs re-pay plan
        # construction every time (tools/scaling_notes_r14.md). The
        # compact HOF dot text keeps the Catalyst tree small (the
        # unrolled variant duplicated across the self-join branches
        # sent optimization time to minutes).
        terms = " + ".join(
            f"(CASE WHEN {dot_sql_text('v', lit_array_sql_text(p))} > 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(table_planes)
        )
        return F.expr(f"0 + {terms}")

    bucketed = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_idx"),
                        bucket_expr(planes[t]).alias("bucket"),
                    )
                    for t in range(EMB_LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "tb.table_idx", "tb.bucket")

    a = bucketed.select(F.col("vec_id").alias("vec_a"), "table_idx", "bucket")
    b = bucketed.select(F.col("vec_id").alias("vec_b"), "table_idx", "bucket")
    pairs = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        # same pair can collide in several tables — dedup BEFORE the
        # exact cosine so each candidate is scored once
        .dropDuplicates(["vec_a", "vec_b"])
    )
    verify = pairs.join(
        emb_raw.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va")),
        "vec_a",
    ).join(
        emb_raw.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")),
        "vec_b",
    )
    cosine_text = (
        f"round(({dot_unrolled_sql_text('va', 'vb')}) / "
        f"(sqrt({dot_unrolled_sql_text('va', 'va')}) * "
        f"sqrt({dot_unrolled_sql_text('vb', 'vb')})), 6)"
    )
    return (
        verify.withColumn("cosine", F.expr(cosine_text))
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


def _dedup_embedding_sql() -> str:
    planes = _emb_hyperplanes()
    plane_rows = ",\n    ".join(
        "({t}, {b}, [{vals}]::DOUBLE[])".format(
            t=t, b=b, vals=", ".join(repr(x) for x in planes[t][b])
        )
        for t in range(EMB_LSH_TABLES)
        for b in range(EMB_LSH_BITS)
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
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bucketed a
  JOIN bucketed b ON a.table_idx = b.table_idx AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT p.vec_a, p.vec_b,
       ROUND(list_dot_product(ea.v, eb.v) /
             (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
FROM pairs p
JOIN emb ea ON p.vec_a = ea.vec_id
JOIN emb eb ON p.vec_b = eb.vec_id
WHERE ROUND(list_dot_product(ea.v, eb.v) /
            (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6) >= {COSINE_DUP_THRESHOLD}
ORDER BY vec_a, vec_b
"""


DEDUP_EMBEDDING_SQL = _dedup_embedding_sql()


# --------------------------------------------- asymmetric containment
CONTAIN_THRESHOLD = 0.8  # ≥80% of A's shingles inside B → A ⊂~ B
CONTAIN_MIN_SH = 5       # ignore trivially small docs


def containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed near-SUBSET detection: C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)|.

    Jaccard (dedup_ngram_jaccard) is symmetric and misses the
    copy-paste inclusion case: a short doc quoted whole inside a long
    one has tiny Jaccard but containment ≈ 1. This is the dedup
    signal for boilerplate wrappers and quote-expansion chains.

    Same candidate discipline as the Jaccard twin: pairs exist ONLY
    via the shared-shingle equality join (never doc×doc), per-pair
    intersection is one map-side-combinable count, and — like the
    Jaccard op — this exact form is the calibration-scale ground
    truth; at 100 TB the LSH path generates the candidates and this
    containment verify runs on candidates only.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    sh = shingle_rows(docs).cache()
    sizes = shingle_sizes(sh)
    a = sh.select(F.col("doc_id").alias("a_id"), "shingle")
    b = sh.select(F.col("doc_id").alias("b_id"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cont = F.round(F.col("n_common") / F.col("n_a"), 6)
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("n_a")), "a_id")
        .filter(F.col("n_a") >= CONTAIN_MIN_SH)
        .select("a_id", "b_id", "n_common", "n_a", cont.alias("containment"))
        .filter(F.col("containment") >= CONTAIN_THRESHOLD)
        .orderBy("a_id", "b_id")
    )


CONTAINMENT_SQL = (
    _SHINGLES_CTE
    + f"""
, sizes AS (
  SELECT doc_id, len(shingles) AS n_sh FROM shingled WHERE len(shingles) > 0
), exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
  FROM exploded a JOIN exploded b
    ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, n_common, s.n_sh AS n_a,
       ROUND(n_common / s.n_sh, 6) AS containment
FROM inter JOIN sizes s ON s.doc_id = a_id
WHERE s.n_sh >= {CONTAIN_MIN_SH}
  AND ROUND(n_common / s.n_sh, 6) >= {CONTAIN_THRESHOLD}
ORDER BY a_id, b_id
"""
)


# --------------------------------------------- LSH banding quality audit
def dedup_lsh_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of the MinHash-LSH banding against the exact
    n-gram Jaccard ground truth: one summary row with candidate
    volume, verified-duplicate count, RECALL of the banding (true
    near-dup pairs that survived into some shared bucket) and
    candidate precision (verified / candidates).

    This is the number that justifies shipping the LSH path at
    100 TB: banding with 4 bands × 3 rows admits a pair with
    P = 1-(1-j^3)^4, and this audit measures the realized recall on
    real data. The exact side is the documented quadratic
    calibration op (dedup_ngram_jaccard) — this audit inherits its
    calibration-scale-only status and is excluded from the bench
    headline with it.

    Composition is UNION + flag aggregation on the pair key, not a
    join of the two result frames — both share the cached shingle
    lineage, and self-joining shared lineage pays Catalyst's
    attribute-dedup rewrite (see retrieval_recall_audit).
    """
    exact = dedup_ngram_jaccard(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_exact"), F.lit(0).alias("in_lsh")
    )
    lsh_all = dedup_minhash_lsh(spark, sf_dir)
    lsh_pos = lsh_all.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.lit(0).alias("in_exact"), F.lit(1).alias("in_lsh")
    )
    flags = (
        exact.unionByName(lsh_pos)
        .groupBy("doc_a", "doc_b")
        .agg(F.max("in_exact").alias("e"), F.max("in_lsh").alias("l"))
    )
    summary = flags.agg(
        F.sum("e").alias("n_exact_pairs"),
        F.sum("l").alias("n_verified_dups"),
        F.sum(F.col("e") * F.col("l")).alias("n_common"),
    )
    n_cands = lsh_all.agg(F.count(F.lit(1)).alias("n_candidates"))
    return summary.crossJoin(F.broadcast(n_cands)).select(
        "n_exact_pairs",
        "n_candidates",
        "n_verified_dups",
        "n_common",
        (F.col("n_common") / F.col("n_exact_pairs")).alias("recall"),
        (F.col("n_verified_dups") / F.col("n_candidates")).alias("candidate_precision"),
    )


DEDUP_LSH_QUALITY_SQL = f"""
WITH exact_pairs AS (
  SELECT doc_a, doc_b FROM ({DEDUP_NGRAM_SQL})
), lsh_all AS (
  SELECT doc_a, doc_b, jaccard FROM ({DEDUP_MINHASH_SQL})
), lsh_pos AS (
  SELECT doc_a, doc_b FROM lsh_all WHERE jaccard >= {JACCARD_THRESHOLD}
), flags AS (
  SELECT doc_a, doc_b, MAX(e) AS e, MAX(l) AS l
  FROM (
    SELECT doc_a, doc_b, 1 AS e, 0 AS l FROM exact_pairs
    UNION ALL
    SELECT doc_a, doc_b, 0 AS e, 1 AS l FROM lsh_pos)
  GROUP BY doc_a, doc_b
)
SELECT CAST(SUM(e) AS BIGINT) AS n_exact_pairs,
       (SELECT COUNT(*) FROM lsh_all) AS n_candidates,
       CAST(SUM(l) AS BIGINT) AS n_verified_dups,
       CAST(SUM(e * l) AS BIGINT) AS n_common,
       SUM(e * l) / SUM(e) AS recall,
       SUM(l) / (SELECT COUNT(*) FROM lsh_all) AS candidate_precision
FROM flags
"""


# ----------------------------------------- winnowing fingerprints
WINNOW_K = 5   # gram width (tokens)
WINNOW_W = 4   # winnowing window (grams)


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03 — the MOSS algorithm): from each doc's K-gram hash
    sequence, select the RIGHTMOST MINIMUM of every W-gram window;
    the selected set is a position-robust fingerprint with the
    guarantee that any shared run of >= W+K-1 tokens yields a shared
    fingerprint. Reported per doc: grams, fingerprints selected,
    fingerprints shared with other docs, and the shared ratio — the
    plagiarism/overlap signal.

    The per-window argmin loop is re-expressed CLOSED-FORM so no
    per-window iteration exists anywhere: position q is selected iff
    some window admits it, which reduces to
    ``max(q-di+1, 0) <= min(q+dj-w, n-w)`` where di/dj are the
    distances (capped at W) to the nearest strictly-smaller hash on
    the left / smaller-or-equal hash on the right — both read from W-1
    lag/lead columns inside the doc-partitioned window the gram
    builder already shuffled for. Proof sketch in the test's naive
    reference; identical lag/lead logic in the DuckDB oracle.
    """
    from pyspark.sql import Window

    docs = scatter(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", i).over(w_doc) for i in range(1, WINNOW_K)
    ]
    grams = (
        tok.select(
            "doc_id",
            "pos",
            F.when(parts[-1].isNotNull(), F.md5(F.concat_ws(" ", *parts))).alias(
                "h"
            ),
        )
        .filter(F.col("h").isNotNull())
        .cache()
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))

    h = F.col("h")
    di = F.lit(WINNOW_W)
    dj = F.lit(WINNOW_W)
    # nearest left strictly-smaller / right smaller-or-equal hash
    # (null lag/lead comparisons are null -> when() skips them)
    for d in range(WINNOW_W - 1, 0, -1):
        di = F.when(F.lag("h", d).over(w_doc) < h, F.lit(d)).otherwise(di)
        dj = F.when(F.lead("h", d).over(w_doc) <= h, F.lit(d)).otherwise(dj)
    annotated = (
        grams.join(sizes, "doc_id")
        .withColumn("di", di)
        .withColumn("dj", dj)
    )
    selected = annotated.filter(
        (F.col("n_grams") >= WINNOW_W)
        & (
            F.greatest(F.col("pos") - F.col("di") + 1, F.lit(0))
            <= F.least(
                F.col("pos") + F.col("dj") - F.lit(WINNOW_W),
                F.col("n_grams") - F.lit(WINNOW_W),
            )
        )
    )
    fp = selected.select("doc_id", "h").distinct().cache()
    sharing = fp.groupBy("h").agg(F.countDistinct("doc_id").alias("n_docs_fp"))
    per_doc = (
        fp.join(sharing, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fp"),
            F.sum((F.col("n_docs_fp") > 1).cast("long")).alias("n_shared_fp"),
        )
    )
    return (
        per_doc.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_fp",
            "n_shared_fp",
            F.round(F.col("n_shared_fp") / F.col("n_fp"), 6).alias(
                "shared_ratio"
            ),
        )
        .orderBy("doc_id")
    )


def _winnow_sql() -> str:
    di = f"{WINNOW_W}"
    dj = f"{WINNOW_W}"
    for d in range(WINNOW_W - 1, 0, -1):
        di = f"CASE WHEN lag(h, {d}) OVER w < h THEN {d} ELSE {di} END"
        dj = f"CASE WHEN lead(h, {d}) OVER w <= h THEN {d} ELSE {dj} END"
    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\s+'),
                     t -> t <> '') AS w
  FROM documents
), grams AS (
  SELECT doc_id, s.i - 1 AS pos,
         md5(array_to_string(w[s.i:s.i + {WINNOW_K - 1}], ' ')) AS h
  FROM toks,
       LATERAL (SELECT unnest(range(1, len(w) - {WINNOW_K} + 2)) AS i) s
  WHERE len(w) >= {WINNOW_K}
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id
), annotated AS (
  SELECT g.doc_id, g.pos, g.h, s.n_grams,
         {di} AS di,
         {dj} AS dj
  FROM grams g JOIN sizes s USING (doc_id)
  WINDOW w AS (PARTITION BY g.doc_id ORDER BY g.pos)
), fp AS (
  SELECT DISTINCT doc_id, h
  FROM annotated
  WHERE n_grams >= {WINNOW_W}
    AND GREATEST(pos - di + 1, 0)
        <= LEAST(pos + dj - {WINNOW_W}, n_grams - {WINNOW_W})
), sharing AS (
  SELECT h, COUNT(DISTINCT doc_id) AS n_docs_fp FROM fp GROUP BY h
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_fp,
         CAST(SUM(CASE WHEN n_docs_fp > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_fp
  FROM fp JOIN sharing USING (h) GROUP BY doc_id
)
SELECT p.doc_id, s.n_grams, p.n_fp, p.n_shared_fp,
       ROUND(p.n_shared_fp / p.n_fp, 6) AS shared_ratio
FROM per_doc p JOIN sizes s USING (doc_id)
ORDER BY p.doc_id
"""


WINNOW_FP_SQL = _winnow_sql()
