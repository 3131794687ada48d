"""Inverted-index text retrieval over the ``documents`` table.

The serving-side counterpart of doc_similarity_tfidf's posting lists:
build a (token → doc) posting table once, then answer conjunctive
(AND) keyword queries as posting-list intersections — a groupBy
counting matched DISTINCT terms, never a rescan of the raw text per
query. At 100 TB the posting table is the thing you materialize
(partitioned/bucketed by token); each query touches only its terms'
postings, and the intersection is one equality-shuffle aggregation.

Ranking is deterministic tf-sum (total occurrences of the query terms
in the doc) with doc_id as the tiebreak, so the whole pipeline is
value-oracled in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.operators.dedup import tokens_col
from cgtcalc_data_transformer_spark.sources.tpch import load_table, scatter

# fixed demo query: frequent corpus words, so matches exist at every SF
QUERY_TERMS = ["data", "join", "scan"]
SEARCH_TOP_K = 20


def text_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing ALL of QUERY_TERMS, ranked by total term
    frequency (desc, doc_id asc), top SEARCH_TOP_K.

    Postings are built filtered to the query terms — the IN-filter
    applies directly on the generator's output inside the same stage,
    so only matching (doc, term) rows ever reach the shuffle; with a
    pre-materialized posting table the same plan is a partition-pruned
    scan of |terms| token groups.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    postings = (
        docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
        .filter(F.col("tok").isin(QUERY_TERMS))
    )
    hits = (
        postings.groupBy("doc_id")
        .agg(
            F.count_distinct("tok").alias("matched"),
            F.count(F.lit(1)).alias("tf_sum"),
        )
        .filter(F.col("matched") == len(QUERY_TERMS))
    )
    return (
        hits.select("doc_id", "tf_sum")
        .orderBy(F.desc("tf_sum"), F.asc("doc_id"))
        .limit(SEARCH_TOP_K)
    )


def _terms_sql() -> str:
    return ", ".join(repr(t) for t in QUERY_TERMS)


TEXT_SEARCH_SQL = f"""
WITH postings AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
    FROM documents)
  WHERE tok IN ({_terms_sql()})
), hits AS (
  SELECT doc_id,
         COUNT(DISTINCT tok) AS matched,
         COUNT(*) AS tf_sum
  FROM postings GROUP BY doc_id
)
SELECT doc_id, tf_sum FROM hits
WHERE matched = {len(QUERY_TERMS)}
ORDER BY tf_sum DESC, doc_id ASC
LIMIT {SEARCH_TOP_K}
"""


# ------------------------------------------------------- BM25 ranking
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive (OR) BM25-ranked retrieval for QUERY_TERMS: the
    scoring companion of ``text_search_and``'s boolean intersection.

    One token-explode pass builds per-doc (length, per-term tf) via
    conditional aggregation — no per-(doc,term) shuffle rows beyond
    the single groupBy. Corpus stats (N, total length, per-term df)
    are ONE aggregation over that per-doc frame, broadcast as a 1-row
    scalar. The per-term score sum is UNROLLED in fixed term order
    (s1+s2+s3 left-to-right), so every double on both engines is
    computed by the identical IEEE expression tree — no aggregation-
    order nondeterminism; ln() inputs are exact integers. At scale
    the per-doc frame is the materialized index; queries touch it
    with a broadcast stats row and a filter.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    tf_cols = [
        F.sum((F.col("tok") == t).cast("long")).alias(f"tf{i}")
        for i, t in enumerate(QUERY_TERMS)
    ]
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"), *tf_cols)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )

    def term_score(i: int):
        tf = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}").cast("double")
        n = F.col("n_docs").cast("double")
        avgdl = F.col("sum_dl").cast("double") / n
        idf = F.log(
            F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        norm = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl").cast("double") / avgdl
        )
        return F.when(
            F.col(f"tf{i}") > 0, idf * tf * F.lit(BM25_K1 + 1.0) / norm
        ).otherwise(F.lit(0.0))

    score = term_score(0)
    for i in range(1, len(QUERY_TERMS)):
        score = score + term_score(i)
    matched = None
    for i in range(len(QUERY_TERMS)):
        c = F.col(f"tf{i}") > 0
        matched = c if matched is None else (matched | c)
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .filter(matched)
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(SEARCH_TOP_K)
    )


def _bm25_sql() -> str:
    k1, b = BM25_K1, BM25_B
    tf_defs = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tok = {t!r} THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(QUERY_TERMS)
    )
    df_defs = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(QUERY_TERMS))
    )
    terms = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        f"ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df{i} AS DOUBLE) + 0.5))"
        f" * CAST(tf{i} AS DOUBLE) * {k1 + 1.0}"
        f" / (CAST(tf{i} AS DOUBLE) + {k1} * ({1.0 - b} + {b}"
        f" * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"
        f" ELSE 0.0 END)"
        for i in range(len(QUERY_TERMS))
    )
    any_match = " OR ".join(f"tf{i} > 0" for i in range(len(QUERY_TERMS)))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
), per_doc AS (
  SELECT doc_id, COUNT(*) AS dl,
         {tf_defs}
  FROM toks GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
         {df_defs}
  FROM per_doc
)
SELECT doc_id, ROUND({terms}, 6) AS bm25
FROM per_doc, stats
WHERE {any_match}
ORDER BY bm25 DESC, doc_id ASC
LIMIT {SEARCH_TOP_K}
"""


BM25_RANK_SQL = _bm25_sql()
