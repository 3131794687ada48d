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
