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


# ------------------------------------------------- ranking evaluation
EVAL_KS = [5, 10, 20]
# binary-relevance DCG discounts 1/log2(rank+1), integer-quantized
# (floor(x*1e8+0.5)) so every metric sum is exact BIGINT arithmetic
# and NO libm call happens at query time in either engine
_DCG_INT = [
    int((10**8) / __import__("math").log2(r + 1) + 0.5) for r in range(1, SEARCH_TOP_K + 1)
]
_IDCG_PREFIX = [0]
for _d in _DCG_INT:
    _IDCG_PREFIX.append(_IDCG_PREFIX[-1] + _d)


def rank_eval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR-metrics audit of the BM25 ranking: per cutoff k ∈ {5,10,20},
    precision@k, recall@k, NDCG@k (binary relevance) and the global
    MRR, where the relevance oracle is the deterministic conjunctive
    match set (docs containing ALL query terms — text_search_and's
    predicate, unbounded).

    This closes the retrieval loop the way retrieval_recall_audit
    closes the ANN loop: the ranked list is the operator under test,
    the relevance set is exact, and every metric is a ratio of exact
    integers (DCG discounts are integer-quantized literals), so the
    whole audit hash-matches across engines.

    Plan: the ranked list is ≤ SEARCH_TOP_K rows by construction, so
    the rank window (constant partition key) and the k-explode run on
    a bounded frame; the relevance set is one aggregation over the
    posting explode; everything joins broadcast.
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    postings = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).filter(F.col("tok").isin(QUERY_TERMS))
    # CACHED (r14 plan audit): rel backs n_rel AND the flags join,
    # flags backs the MRR aggregate AND the per-k rollup — uncached,
    # each reference re-ran the posting explode / BM25 chain (7
    # documents scans, plans/r14/rank_eval_bm25_before.txt). rel is
    # the conjunctive match set, flags ≤ SEARCH_TOP_K rows
    # (guide §2.4).
    rel = (
        postings.groupBy("doc_id")
        .agg(F.count_distinct("tok").alias("matched"))
        .filter(F.col("matched") == len(QUERY_TERMS))
        .select("doc_id")
        .cache()
    )
    n_rel = rel.agg(F.count(F.lit(1)).alias("n_relevant"))

    from pyspark.sql import Window

    ranked = bm25_rank(spark, sf_dir)
    # bounded frame (LIMIT above): constant partition key is safe here
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("bm25"), F.asc("doc_id"))
    flags = (
        ranked.withColumn("r", F.row_number().over(w))
        .join(F.broadcast(rel.withColumn("is_rel", F.lit(1))), "doc_id", "left")
        .select("r", F.coalesce("is_rel", F.lit(0)).alias("is_rel"))
        .cache()
    )
    dcg_lit = F.array(*[F.lit(d) for d in _DCG_INT])
    idcg_lit = F.array(*[F.lit(p) for p in _IDCG_PREFIX[1:]])
    mrr_row = flags.agg(
        F.coalesce(
            F.lit(1.0) / F.min(F.when(F.col("is_rel") == 1, F.col("r"))),
            F.lit(0.0),
        ).alias("mrr")
    )
    per_k = (
        flags.select(
            "r", "is_rel", F.explode(F.array(*[F.lit(k) for k in EVAL_KS])).alias("k")
        )
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("k"), F.col("is_rel")).otherwise(0)).alias(
                "hits"
            ),
            F.sum(
                F.when(
                    (F.col("r") <= F.col("k")) & (F.col("is_rel") == 1),
                    F.element_at(dcg_lit, F.col("r").cast("int")),
                ).otherwise(F.lit(0))
            ).alias("dcg_int"),
        )
    )
    return (
        per_k.crossJoin(F.broadcast(n_rel))
        .crossJoin(F.broadcast(mrr_row))
        .select(
            "k",
            "n_relevant",
            "hits",
            (F.col("hits") / F.col("k")).alias("precision_at_k"),
            (F.col("hits") / F.col("n_relevant")).alias("recall_at_k"),
            F.when(F.col("n_relevant") == 0, F.lit(0.0))
            .otherwise(
                F.col("dcg_int")
                / F.element_at(idcg_lit, F.least(F.col("k"), F.col("n_relevant")).cast("int"))
            )
            .alias("ndcg_at_k"),
            "mrr",
        )
        .orderBy("k")
    )


def _rank_eval_sql() -> str:
    dcg_list = ", ".join(str(d) for d in _DCG_INT)
    idcg_list = ", ".join(str(p) for p in _IDCG_PREFIX[1:])
    return f"""
WITH ranked AS (
  SELECT doc_id, bm25,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r
  FROM ({BM25_RANK_SQL})
), toks AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents)
  WHERE tok IN ({_terms_sql()})
), rel AS (
  SELECT doc_id FROM toks GROUP BY doc_id
  HAVING COUNT(DISTINCT tok) = {len(QUERY_TERMS)}
), n_rel AS (
  SELECT COUNT(*) AS n_relevant FROM rel
), flags AS (
  SELECT ranked.r,
         CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
  FROM ranked LEFT JOIN rel USING (doc_id)
), mrr_row AS (
  SELECT COALESCE(1.0::DOUBLE / MIN(CASE WHEN is_rel = 1 THEN r END), 0.0::DOUBLE) AS mrr
  FROM flags
), dcg(arr) AS (SELECT [{dcg_list}]), idcg(arr) AS (SELECT [{idcg_list}]),
per_k AS (
  SELECT k,
         CAST(SUM(CASE WHEN r <= k THEN is_rel ELSE 0 END) AS BIGINT) AS hits,
         CAST(SUM(CASE WHEN r <= k AND is_rel = 1 THEN dcg.arr[r] ELSE 0 END) AS BIGINT) AS dcg_int
  FROM flags, (SELECT unnest([{", ".join(str(k) for k in EVAL_KS)}]) AS k), dcg
  GROUP BY k
)
SELECT k, n_relevant, hits,
       hits / k AS precision_at_k,
       hits / n_relevant AS recall_at_k,
       CASE WHEN n_relevant = 0 THEN 0.0::DOUBLE
            ELSE dcg_int / idcg.arr[LEAST(k, n_relevant)]
       END AS ndcg_at_k,
       mrr
FROM per_k, n_rel, mrr_row, idcg
ORDER BY k
"""


RANK_EVAL_SQL = _rank_eval_sql()


# ------------------------------------------- reciprocal-rank fusion
RRF_C = 60          # the standard RRF constant (Cormack et al., SIGIR'09)
RRF_TOP = 20        # fused list size
RRF_DENSE_TOP = 50  # dense candidate list size
RRF_SCALE = 10**8   # integer quantization of 1/(C+rank)


def _rrf_contrib(rank: "Column") -> "Column":
    """floor(SCALE/(C+rank) + 0.5) as BIGINT — the RRF term as exact
    integer arithmetic (one correctly-rounded double division of two
    integers, identically computed by DuckDB), so the fused score is
    an integer SUM with no float-aggregation-order hazard. rank = 0
    encodes 'absent from this list' and contributes nothing."""
    return F.when(
        rank > 0,
        F.floor(F.lit(RRF_SCALE) / (F.lit(RRF_C) + rank) + F.lit(0.5)).cast(
            "long"
        ),
    ).otherwise(F.lit(0).cast("long"))


def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the lexical BM25
    ranking (``bm25_rank``, QUERY_TERMS) with a dense embedding
    ranking (cosine against the vec_id=0 query vector — ``vec_id``
    is the documents table's parallel vector key). score(d) =
    sum over lists of 1/(C + rank_list(d)), the Cormack et al.
    SIGIR'09 recipe that needs no score calibration between rankers.

    Scale shape: each ranker ends in TakeOrdered (orderBy+limit — no
    global sort, no unpartitioned window over unbounded input); rank
    assignment happens on the BOUNDED top lists (<= 50 rows), the
    fusion join is list-sized, and at 100 TB the dense side swaps in
    ann_lsh/ann_ivf candidates without touching the fusion. RRF terms
    are integer-quantized so the fused score is exact cross-engine.
    """
    from pyspark.sql import Window

    from cgtcalc_data_transformer_spark.operators.similarity import (
        _as_double,
        cosine_expr,
    )
    from cgtcalc_data_transformer_spark.sources.tpch import load_table as _lt

    lex_top = bm25_rank(spark, sf_dir)  # <= SEARCH_TOP_K rows
    # lit(0) partition over a LIMIT-bounded (<=20 row) frame — audited
    # in WINDOW_CONST_OK (same idiom as rank_eval_bm25)
    w_lex = Window.partitionBy(F.lit(0)).orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )

    emb = _as_double(_lt(spark, sf_dir, "embeddings"))
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    dense_top = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(RRF_DENSE_TOP)
    )
    w_dense = Window.partitionBy(F.lit(0)).orderBy(
        F.desc("cosine"), F.asc("doc_id")
    )
    dense = dense_top.select(
        "doc_id", F.row_number().over(w_dense).alias("dense_rank")
    )

    fused = (
        lex.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("dense_rank", F.lit(0)).alias("dense_rank"),
        )
        .withColumn(
            "rrf_score",
            _rrf_contrib(F.col("lex_rank")) + _rrf_contrib(F.col("dense_rank")),
        )
    )
    return (
        fused.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(RRF_TOP)
        .select("doc_id", "lex_rank", "dense_rank", "rrf_score")
    )


def _rrf_sql() -> str:
    def contrib(col: str) -> str:
        return (
            f"CASE WHEN {col} > 0 THEN "
            f"CAST(floor({RRF_SCALE} / ({RRF_C} + {col}) + 0.5) AS BIGINT) "
            f"ELSE 0 END"
        )

    return f"""
WITH lex AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INTEGER)
           AS lex_rank
  FROM ({BM25_RANK_SQL})
), dense_scored AS (
  SELECT c.vec_id AS doc_id,
         ROUND(list_dot_product(q.v, c.v) /
               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
               6) AS cosine
  FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0) q,
       (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0) c
), dense AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS INTEGER)
           AS dense_rank
  FROM dense_scored
  QUALIFY dense_rank <= {RRF_DENSE_TOP}
), fused AS (
  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
         COALESCE(l.lex_rank, 0) AS lex_rank,
         COALESCE(d.dense_rank, 0) AS dense_rank
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, lex_rank, dense_rank,
       ({contrib('lex_rank')} + {contrib('dense_rank')}) AS rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {RRF_TOP}
"""


RRF_FUSION_SQL = _rrf_sql()
