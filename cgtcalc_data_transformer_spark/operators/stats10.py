"""Round-10 engine staples: isotonic (PAV) calibration, label
propagation communities, PrefixSpan-style sequential patterns,
forecast-error audit (naive / seasonal-naive / SES), and a mergeable
histogram quantile sketch audited against the exact order statistic.

Reference parity note: the reference (cgtcalc-data-transformer,
~732 LoC broker-CSV ETL, `/root/reference/index.js`) has no analytics
surface — these are engine extensions in the SURVEY.md §2.2 sense,
each paired with machinery that already exists here (ece_calibration,
dedup_clusters, events_top_paths, ewma_control_chart,
exact_median_2pass).

Engine-exactness discipline (stats_ext conventions): bounded grids
(10 confidence bins, |event-type| ≤ 6 patterns, day grid, 256
histogram bins), integer counts everywhere, int/int division and
sqrt as the only double ops (correctly-rounded IEEE, identical across
engines), floor(x·1e6 + 0.5) micro-quantization for derived rationals
that would otherwise hit the ROUND-ties hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cgtcalc_data_transformer_spark.operators.embedding_ops import (
    ECE_BINS,
    ECE_SC,
    ECE_SD,
    _nearest_centroid_scores,
)
from cgtcalc_data_transformer_spark.operators.events import SESSION_GAP_NS
from cgtcalc_data_transformer_spark.operators.timeseries import (
    _EWMA_B,
    _EWMA_W,
    EWMA_MAX_J,
    EWMA_S,
    _daily_grid,
    _GRID_SQL,
)
from cgtcalc_data_transformer_spark.sources.tpch import load_table

MICRO = 10**6

# Shared DuckDB CTE: per-vector (conf_i, correct) of the
# nearest-centroid classifier — the exact text of ECE_SQL's prefix
# (embedding_ops.py) so isotonic_calibration's oracle scores vectors
# identically to ece_calibration's.
_PER_VEC_SQL = f"""
e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), exploded AS (
  SELECT vec_id, label, generate_subscripts(v, 1) AS idx, unnest(v) AS x FROM e
), cent AS (
  SELECT label AS clabel, idx, ROUND(AVG(x), 6) AS c
  FROM exploded GROUP BY label, idx
), scored AS (
  SELECT vec_id, label, clabel,
         CAST(SUM(CAST(floor(x * c * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS dot_i,
         CAST(SUM(CAST(floor(c * c * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS cc_i,
         CAST(SUM(CAST(floor(x * x * {ECE_SD} + 0.5) AS BIGINT)) AS BIGINT) AS xx_i
  FROM exploded JOIN cent USING (idx)
  GROUP BY vec_id, label, clabel
), per_vec AS (
  SELECT vec_id, label,
         MAX(struct_pack(
           ci := CAST(floor(dot_i / sqrt(CAST(cc_i AS DOUBLE) * CAST(xx_i AS DOUBLE))
                            * {ECE_SC} + 0.5) AS BIGINT),
           nl := -clabel)) AS m
  FROM scored GROUP BY vec_id, label
), flat AS (
  SELECT vec_id, m.ci AS conf_i,
         CASE WHEN -m.nl = label THEN 1 ELSE 0 END AS correct
  FROM per_vec
)"""


# ------------------------------------------ isotonic (PAV) calibration
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic-regression recalibration of the nearest-centroid
    classifier's confidence (Zadrozny & Elkan 2002): the
    weighted-least-squares MONOTONE fit of accuracy against the 10
    ece_calibration confidence bins — what you apply when the
    reliability diagram says the scores are miscalibrated but their
    ORDER is trustworthy.

    Computed via the minimax characterization of PAV — iso(i) =
    max_{j≤i} min_{k≥i} avg(y over bins j..k) — instead of the
    sequential pool-adjacent loop: the bin grid is bounded (≤10
    occupied bins), so the interval table is ≤B² rows and the two
    nested extrema are two grouped aggregations over ≤B³ bounded
    rows. No driver state, no iteration; the same closed form runs
    as three CTEs in any engine, and at 100 TB the only unbounded
    work is the one per-vector scoring aggregation shared with
    ece_calibration.

    Engine-exactness: interval averages are int/int double divisions
    (correctly-rounded IEEE, identical across engines); min/max over
    identical double sets are exact; outputs are micro-unit BIGINTs
    (floor(x·1e6 + 0.5)) because C/N rationals can land exactly on
    half-microunit ROUND ties (the 1/128 hazard).
    """
    per_vec = _nearest_centroid_scores(spark, sf_dir)
    bin_col = F.least(
        F.lit(ECE_BINS - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor(F.col("conf_i") * F.lit(ECE_BINS) / F.lit(ECE_SC)),
        ),
    )
    bins = per_vec.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("correct").alias("c"),
    )
    # interval table: (j, k, N_jk, C_jk) for every occupied j ≤ k
    jk = (
        bins.alias("j")
        .join(F.broadcast(bins.alias("k")), F.col("k.bin") >= F.col("j.bin"))
        .select(F.col("j.bin").alias("j"), F.col("k.bin").alias("k"))
        .join(
            F.broadcast(bins.alias("m")),
            (F.col("m.bin") >= F.col("j")) & (F.col("m.bin") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg(F.sum("m.n").alias("nn"), F.sum("m.c").alias("cc"))
    )
    avg_jk = F.col("cc").cast("double") / F.col("nn").cast("double")
    # iso(i) = max_{j≤i} min_{k≥i} avg(j..k)
    inner = (
        bins.select(F.col("bin").alias("i"), "n", "c")
        .join(
            F.broadcast(jk),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "n", "c", "j")
        .agg(F.min(avg_jk).alias("mn"))
    )
    iso = inner.groupBy("i", "n", "c").agg(F.max("mn").alias("iso"))
    return iso.select(
        F.col("i").alias("bin"),
        "n",
        F.floor(
            F.col("c").cast("double") * F.lit(float(MICRO)) / F.col("n").cast("double")
            + F.lit(0.5)
        ).cast("long").alias("acc_micro"),
        F.floor(F.col("iso") * F.lit(float(MICRO)) + F.lit(0.5))
        .cast("long")
        .alias("iso_micro"),
    ).orderBy("bin")


ISOTONIC_SQL = f"""
WITH {_PER_VEC_SQL}, bins AS (
  SELECT LEAST({ECE_BINS - 1}, GREATEST(0,
           CAST(floor(conf_i * {ECE_BINS} / {ECE_SC}) AS BIGINT))) AS bin,
         COUNT(*) AS n,
         CAST(SUM(correct) AS BIGINT) AS c
  FROM flat GROUP BY 1
), jk AS (
  SELECT j.bin AS j, k.bin AS k,
         CAST(SUM(m.n) AS BIGINT) AS nn, CAST(SUM(m.c) AS BIGINT) AS cc
  FROM bins j JOIN bins k ON k.bin >= j.bin
  JOIN bins m ON m.bin >= j.bin AND m.bin <= k.bin
  GROUP BY j.bin, k.bin
), inner_min AS (
  SELECT b.bin AS i, b.n, b.c, jk.j,
         MIN(CAST(jk.cc AS DOUBLE) / CAST(jk.nn AS DOUBLE)) AS mn
  FROM bins b JOIN jk ON jk.j <= b.bin AND jk.k >= b.bin
  GROUP BY b.bin, b.n, b.c, jk.j
)
SELECT i AS bin, n,
       CAST(floor(CAST(c AS DOUBLE) * {MICRO} / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS acc_micro,
       CAST(floor(MAX(mn) * {MICRO} + 0.5) AS BIGINT) AS iso_micro
FROM inner_min
GROUP BY i, n, c
ORDER BY bin
"""


# ------------------------------------------ label propagation (LPA)
LPA_ROUNDS = 3
LPA_TOP_K = 10


def _lpa_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected customer–supplier edges with INTEGER node
    ids (cust → 2·custkey, supp → 2·suppkey+1 — the key ranges
    overlap; graph.py:30 uses string prefixes, integers keep the
    argmax tie-break pure arithmetic)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    rev = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    return fwd.unionByName(rev)


def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the customer–supplier bipartite graph — the
    near-linear companion to dedup_clusters' min-label connected
    components: LPA finds DENSE groups inside one giant component,
    where connected components would collapse everything to a single
    cluster.

    Deterministic variant: every node votes for itself plus each
    neighbor's label; the new label is the most frequent with ties
    broken toward the SMALLEST label (max(struct(count, −label)) —
    the self-vote also damps the bipartite two-coloring oscillation
    synchronous LPA is known for). Exactly LPA_ROUNDS rounds — a
    fixed-round contract is deterministic at any scale and mirrors as
    unrolled materialized CTEs in the oracle. Each round is one
    equality join + two grouped aggregations (map-side combinable);
    the driver loop holds no data, and labels are localCheckpointed
    per round so the plan does not double per iteration (the r4
    iterative-loop lesson).

    Output: the LPA_TOP_K largest communities (size desc, label asc)
    with the global community/node counts on every row.
    """
    edges = _lpa_edges(spark, sf_dir).cache()
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(LPA_ROUNDS):
        votes = (
            edges.join(labels, edges["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "label")
            .unionByName(labels.select("node", "label"))
        )
        cnt = votes.groupBy("node", "label").agg(F.count(F.lit(1)).alias("cv"))
        best = cnt.groupBy("node").agg(
            F.max(F.struct(F.col("cv"), (-F.col("label")).alias("nl"))).alias("m")
        )
        labels = best.select(
            "node", (-F.col("m.nl")).alias("label")
        ).localCheckpoint()
    comms = labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))
    tot = comms.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum("size").alias("n_nodes"),
    )
    return (
        comms.crossJoin(F.broadcast(tot))
        .orderBy(F.desc("size"), F.asc("label"))
        .limit(LPA_TOP_K)
        .select(
            F.col("label").alias("community"),
            "size",
            "n_communities",
            "n_nodes",
        )
    )


def _lpa_round_sql(r: int) -> str:
    return f"""
, v{r} AS MATERIALIZED (
  SELECT e.src AS node, l.label
  FROM edges e JOIN lbl{r - 1} l ON l.node = e.dst
  UNION ALL SELECT node, label FROM lbl{r - 1}
), lbl{r} AS MATERIALIZED (
  SELECT node, -(m.nl) AS label
  FROM (SELECT node, MAX(struct_pack(cv := cv, nl := -label)) AS m
        FROM (SELECT node, label, COUNT(*) AS cv FROM v{r} GROUP BY 1, 2)
        GROUP BY node)
)"""


LABEL_PROPAGATION_SQL = f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS MATERIALIZED (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL SELECT s AS src, c AS dst FROM pairs
), lbl0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS label FROM edges
){''.join(_lpa_round_sql(r) for r in range(1, LPA_ROUNDS + 1))}
, comms AS (
  SELECT label, COUNT(*) AS size FROM lbl{LPA_ROUNDS} GROUP BY label
), tot AS (
  SELECT COUNT(*) AS n_communities, CAST(SUM(size) AS BIGINT) AS n_nodes
  FROM comms
)
SELECT label AS community, size, n_communities, n_nodes
FROM comms, tot
ORDER BY size DESC, community ASC
LIMIT {LPA_TOP_K}
"""


# --------------------------------- PrefixSpan-style sequential patterns
SEQ_TOP_K = 15


def prefixspan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K frequent SEQUENTIAL patterns (ordered, gaps allowed) of
    length 1–3 over 30-minute event sessions — the PrefixSpan (Pei et
    al. 2001) question events_top_paths cannot answer: 'view → …
    → purchase' counts even when other events sit in between,
    which is how funnel mining actually reads clickstreams.

    Spark-first shape, no pattern-growth recursion: the event-type
    alphabet is bounded (≤6), so every candidate is enumerable by
    construction. A session contains a…b iff first(a) < last(b), and
    a…b…c iff some b-event falls strictly inside (first(a), last(c))
    — so support needs only the per-session-per-type (min_ts, max_ts)
    frame (one aggregation) self-joined per session (≤|types|² rows a
    session) plus one bounded probe join back to the raw events for
    the middle element. Everything is an equality join on session_id
    with integer counts; nothing is quadratic in events.
    """
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.when(
        (F.col("ts") - F.lag("ts").over(w)) > SESSION_GAP_NS, 1
    ).otherwise(0)
    sess = (
        ev.withColumn("new_sess", gap)
        .withColumn("session_idx", F.sum("new_sess").over(wsum))
        .select("user_id", "session_idx", "ts", "event_type")
    ).cache()
    st = sess.groupBy("user_id", "session_idx", "event_type").agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    ).cache()
    n_sessions = st.select("user_id", "session_idx").distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    len1 = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("support")).select(
        F.col("event_type").alias("pattern"), F.lit(1).alias("length"), "support"
    )
    a, b = st.alias("a"), st.alias("b")
    sess_eq = (F.col("a.user_id") == F.col("b.user_id")) & (
        F.col("a.session_idx") == F.col("b.session_idx")
    )
    len2 = (
        a.join(b, sess_eq & (F.col("a.mn") < F.col("b.mx")))
        .groupBy(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .select(
            F.concat_ws(">", "ta", "tb").alias("pattern"),
            F.lit(2).alias("length"),
            "support",
        )
    )
    # renamed keys: pairs_ac shares lineage with sess, and same-name
    # join conditions are ambiguous to Catalyst (exact_median lesson)
    pairs_ac = a.join(b, sess_eq & (F.col("a.mn") < F.col("b.mx"))).select(
        F.col("a.user_id").alias("pu"),
        F.col("a.session_idx").alias("ps"),
        F.col("a.event_type").alias("ta"),
        F.col("a.mn").alias("amn"),
        F.col("b.event_type").alias("tc"),
        F.col("b.mx").alias("cmx"),
    )
    m = sess.alias("m")
    len3 = (
        pairs_ac.join(
            m,
            (F.col("pu") == F.col("m.user_id"))
            & (F.col("ps") == F.col("m.session_idx"))
            & (F.col("m.ts") > F.col("amn"))
            & (F.col("m.ts") < F.col("cmx")),
        )
        .select(
            "pu", "ps", "ta",
            F.col("m.event_type").alias("tb"), "tc",
        )
        .distinct()
        .groupBy("ta", "tb", "tc")
        .agg(F.count(F.lit(1)).alias("support"))
        .select(
            F.concat_ws(">", "ta", "tb", "tc").alias("pattern"),
            F.lit(3).alias("length"),
            "support",
        )
    )
    return (
        len1.unionByName(len2)
        .unionByName(len3)
        .crossJoin(F.broadcast(n_sessions))
        .orderBy(F.desc("support"), F.asc("pattern"))
        .limit(SEQ_TOP_K)
        .select("pattern", "length", "support", "n_sessions")
    )


PREFIXSPAN_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts,
         CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_NS} THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS MATERIALIZED (
  SELECT user_id, event_type, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged
), st AS MATERIALIZED (
  SELECT user_id, session_idx, event_type, MIN(ts) AS mn, MAX(ts) AS mx
  FROM sess GROUP BY 1, 2, 3
), nsess AS (
  SELECT COUNT(*) AS n_sessions
  FROM (SELECT DISTINCT user_id, session_idx FROM st)
), len1 AS (
  SELECT event_type AS pattern, 1 AS length, COUNT(*) AS support
  FROM st GROUP BY event_type
), len2 AS (
  SELECT a.event_type || '>' || b.event_type AS pattern, 2 AS length,
         COUNT(*) AS support
  FROM st a JOIN st b ON a.user_id = b.user_id
        AND a.session_idx = b.session_idx AND a.mn < b.mx
  GROUP BY 1
), len3 AS (
  SELECT ta || '>' || tb || '>' || tc AS pattern, 3 AS length,
         COUNT(*) AS support
  FROM (
    SELECT DISTINCT p.user_id, p.session_idx, p.ta, m.event_type AS tb, p.tc
    FROM (SELECT a.user_id, a.session_idx, a.event_type AS ta, a.mn AS amn,
                 b.event_type AS tc, b.mx AS cmx
          FROM st a JOIN st b ON a.user_id = b.user_id
                AND a.session_idx = b.session_idx AND a.mn < b.mx) p
    JOIN sess m ON m.user_id = p.user_id AND m.session_idx = p.session_idx
              AND m.ts > p.amn AND m.ts < p.cmx
  ) GROUP BY 1
), u AS (
  SELECT * FROM len1 UNION ALL SELECT * FROM len2 UNION ALL SELECT * FROM len3
)
SELECT pattern, length, CAST(support AS BIGINT) AS support, n_sessions
FROM u, nsess
ORDER BY support DESC, pattern ASC
LIMIT {SEQ_TOP_K}
"""


# ------------------------------ forecast error audit (naive/snaive/SES)
FC_SEASON = 7       # weekly seasonality on the day grid
FC_EVAL_MIN_D = 7   # evaluation region: both lag-1 and lag-7 defined


def forecast_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-error audit of per-type daily event counts: MAE of
    the three standing baselines every capacity/forecasting review
    starts from — naive (ŷ_t = y_{t−1}), seasonal-naive
    (ŷ_t = y_{t−7}), and simple exponential smoothing (α = 0.2,
    ŷ_t = z_{t−1}, the ewma_control_chart state) — plus each
    method's MASE (Hyndman & Koehler 2006: MAE / seasonal-naive MAE,
    the scale-free number that says whether a fancier model beats
    'same day last week').

    All three predictors come from equality joins on the bounded day
    grid (lag-1, lag-7) and the EWMA integer-literal-weight dot
    product (timeseries.py:186 — no engine pow()); |errors| are exact
    integers (naive/snaive) or 1e-6-quantized exact rationals with
    the literal denominator 10¹² (SES), summed per type, divided
    once. The whole operator is two aggregations + three bounded
    self-joins of a |types|·|days| frame — at 100 TB the day grid is
    still tiny; only the initial count aggregation sees the raw data.
    """
    grid = _daily_grid(spark, sf_dir).cache()
    cur = grid.filter(F.col("d") >= FC_EVAL_MIN_D)
    lag1 = grid.select(
        "event_type", (F.col("d") + 1).alias("d"), F.col("y").alias("y1")
    )
    lag7 = grid.select(
        "event_type", (F.col("d") + FC_SEASON).alias("d"), F.col("y").alias("y7")
    )
    # SES history dot product: zq_{d−1} = Σ_j w_j·y_{d−1−j} + b·y0
    w_arr = F.array(*[F.lit(w) for w in _EWMA_W])
    b_arr = F.array(*[F.lit(b) for b in _EWMA_B])
    y0 = grid.filter(F.col("d") == 0).select(
        "event_type", F.col("y").alias("y0")
    )
    hist = (
        cur.alias("a")
        .join(
            grid.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") >= 1)
            & (F.col("b.d") <= F.col("a.d") - 1)
            & (F.col("a.d") - 1 - F.col("b.d") <= F.lit(EWMA_MAX_J)),
            "left",
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.d").alias("d"),
            F.col("a.y").alias("y"),
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.element_at(
                        w_arr, (F.col("a.d") - 1 - F.col("b.d") + 1).cast("int")
                    )
                    * F.col("b.y")
                ),
                F.lit(0),
            ).alias("zq_hist")
        )
    )
    boundary = F.when(
        F.col("d") - 1 <= F.lit(EWMA_MAX_J),
        F.element_at(b_arr, (F.col("d") - 1 + 1).cast("int")) * F.col("y0"),
    ).otherwise(F.lit(0))
    joined = (
        hist.join(y0, "event_type")
        .withColumn("zq", F.col("zq_hist") + boundary)
        .join(lag1, ["event_type", "d"])
        .join(lag7, ["event_type", "d"])
    )
    ses_abs_micro = F.floor(
        F.abs(
            F.col("y").cast("decimal(38,0)") * F.lit(EWMA_S)
            - F.col("zq").cast("decimal(38,0)")
        ).cast("double")
        / F.lit(float(EWMA_S))
        * F.lit(float(MICRO))
        + F.lit(0.5)
    ).cast("long")
    per_type = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(F.abs(F.col("y") - F.col("y1"))).alias("ae_naive"),
        F.sum(F.abs(F.col("y") - F.col("y7"))).alias("ae_snaive"),
        F.sum(ses_abs_micro).alias("ae_ses_micro"),
    )
    nd = F.col("n_eval").cast("double")
    mae_n = F.col("ae_naive").cast("double") / nd
    mae_s = F.col("ae_snaive").cast("double") / nd
    mae_e = F.col("ae_ses_micro").cast("double") / (nd * F.lit(float(MICRO)))
    return per_type.select(
        "event_type",
        "n_eval",
        mae_n.alias("mae_naive"),
        mae_s.alias("mae_snaive"),
        F.round(mae_e, 6).alias("mae_ses"),
        F.round(
            F.col("ae_naive").cast("double") / F.col("ae_snaive").cast("double"),
            6,
        ).alias("mase_naive"),
        F.round(
            F.col("ae_ses_micro").cast("double")
            / (F.col("ae_snaive").cast("double") * F.lit(float(MICRO))),
            6,
        ).alias("mase_ses"),
    ).orderBy("event_type")


_FC_W_TABLE = ", ".join(f"({j}, {w})" for j, w in enumerate(_EWMA_W))
_FC_B_TABLE = ", ".join(f"({t}, {b})" for t, b in enumerate(_EWMA_B))

FORECAST_ERROR_SQL = f"""
WITH {_GRID_SQL}, w(j, w) AS (VALUES {_FC_W_TABLE}),
bt(t, b) AS (VALUES {_FC_B_TABLE}),
y0 AS (SELECT event_type, y AS y0 FROM grid WHERE d = 0),
hist AS (
  SELECT a.event_type, a.d, a.y,
         COALESCE(CAST(SUM(w.w * b.y) AS BIGINT), 0) AS zq_hist
  FROM grid a
  LEFT JOIN grid b ON b.event_type = a.event_type
        AND b.d >= 1 AND b.d <= a.d - 1 AND a.d - 1 - b.d <= {EWMA_MAX_J}
  LEFT JOIN w ON w.j = a.d - 1 - b.d
  WHERE a.d >= {FC_EVAL_MIN_D}
  GROUP BY a.event_type, a.d, a.y
), joined AS (
  SELECT h.event_type, h.d, h.y,
         h.zq_hist + CASE WHEN h.d - 1 <= {EWMA_MAX_J}
                          THEN bt.b * y0.y0 ELSE 0 END AS zq,
         l1.y AS y1, l7.y AS y7
  FROM hist h
  JOIN y0 ON y0.event_type = h.event_type
  LEFT JOIN bt ON bt.t = h.d - 1
  JOIN grid l1 ON l1.event_type = h.event_type AND l1.d = h.d - 1
  JOIN grid l7 ON l7.event_type = h.event_type AND l7.d = h.d - {FC_SEASON}
), per_type AS (
  SELECT event_type, COUNT(*) AS n_eval,
         CAST(SUM(abs(y - y1)) AS BIGINT) AS ae_naive,
         CAST(SUM(abs(y - y7)) AS BIGINT) AS ae_snaive,
         CAST(SUM(CAST(floor(
             CAST(abs(CAST(y AS DECIMAL(38,0)) * {EWMA_S}
                      - CAST(zq AS DECIMAL(38,0))) AS DOUBLE)
             / {EWMA_S} * {MICRO} + 0.5) AS BIGINT)) AS BIGINT) AS ae_ses_micro
  FROM joined GROUP BY event_type
)
SELECT event_type, n_eval,
       CAST(ae_naive AS DOUBLE) / n_eval AS mae_naive,
       CAST(ae_snaive AS DOUBLE) / n_eval AS mae_snaive,
       ROUND(CAST(ae_ses_micro AS DOUBLE) / (CAST(n_eval AS DOUBLE) * {MICRO}), 6) AS mae_ses,
       ROUND(CAST(ae_naive AS DOUBLE) / CAST(ae_snaive AS DOUBLE), 6) AS mase_naive,
       ROUND(CAST(ae_ses_micro AS DOUBLE)
             / (CAST(ae_snaive AS DOUBLE) * {MICRO}), 6) AS mase_ses
FROM per_type
ORDER BY event_type
"""


# --------------------------- mergeable histogram quantile sketch audit
QS_BINS = 256
QS_QUANTILES = (50, 95)


def quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-quantile-sketch audit on o_totalprice: a 256-bin
    equi-width histogram sketch (the mergeable-summary contract —
    per-partition bin-count vectors combine by plain addition, so the
    sketch distributes/merges like t-digest or GK without their
    ordering sensitivity) interpolates the median and p95, and each
    estimate is audited against the EXACT order statistic at the same
    rank computed by the exact_median_2pass bin-selection recipe
    (sampling.py:347) — no global sort on either path.

    Engine-exactness: width = (hi−lo)/256 divides by a power of two
    (EXACT in IEEE); bins, counts and ranks are integers; the
    interpolation est = lo + width·bin + width·(k−before)/cnt is one
    identical expression; the exact value is a raw stored double; the
    reported error is micro-quantized.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(QS_BINS))
    bin_col = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(QS_BINS - 1).cast("long"),
            F.floor((F.col("o_totalprice") - F.col("lo")) / width),
        )
    )
    binned = orders.crossJoin(F.broadcast(bounds)).withColumn("bin", bin_col)
    per_bin = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    # bounded prefix sum over the 256-bin table (theta join, no window)
    cum = (
        per_bin.alias("p")
        .join(F.broadcast(per_bin.alias("q")), F.col("q.bin") < F.col("p.bin"), "left")
        .groupBy(F.col("p.bin").alias("bin"), F.col("p.cnt").alias("cnt"))
        .agg(F.coalesce(F.sum("q.cnt"), F.lit(0)).alias("before"))
    )
    qts = spark.createDataFrame([(q,) for q in QS_QUANTILES], "qt long")
    ranks = qts.crossJoin(F.broadcast(bounds)).select(
        "qt", "n", "lo", "hi",
        F.expr("(qt * n + 99) div 100").alias("k"),
    )
    located = ranks.join(
        F.broadcast(cum),
        (F.col("before") < F.col("k")) & (F.col("before") + F.col("cnt") >= F.col("k")),
    )
    wexpr = (F.col("hi") - F.col("lo")) / F.lit(float(QS_BINS))
    est = (
        F.col("lo")
        + wexpr * F.col("bin").cast("double")
        + wexpr
        * ((F.col("k") - F.col("before")).cast("double") / F.col("cnt").cast("double"))
    )
    loc = located.select(
        "qt", "n", "k",
        F.col("bin").alias("target_bin"),
        "before",
        est.alias("est"),
    )
    in_bin = binned.select("o_orderkey", "o_totalprice", "bin").join(
        F.broadcast(loc), F.col("bin") == F.col("target_bin")
    )
    wr = Window.partitionBy("qt").orderBy("o_totalprice", "o_orderkey")
    exact = (
        in_bin.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == F.col("k") - F.col("before"))
        .select("qt", "n", "k", "est", F.col("o_totalprice").alias("exact"))
    )
    err_micro = F.floor(
        F.abs(F.col("est") - F.col("exact")) * F.lit(float(MICRO)) + F.lit(0.5)
    ).cast("long")
    return exact.select(
        "qt", "n", "k", "est", "exact", err_micro.alias("err_micro")
    ).orderBy("qt")


QUANTILE_SKETCH_SQL = f"""
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi, COUNT(*) AS n
  FROM orders
), binned AS (
  SELECT o_orderkey, o_totalprice,
         CASE WHEN hi = lo THEN 0
              ELSE LEAST({QS_BINS - 1},
                CAST(floor((o_totalprice - lo) / ((hi - lo) / {QS_BINS}.0)) AS BIGINT))
         END AS bin
  FROM orders CROSS JOIN bounds
), per_bin AS (
  SELECT bin, COUNT(*) AS cnt FROM binned GROUP BY bin
), cum AS (
  SELECT p.bin, p.cnt, CAST(COALESCE(SUM(q.cnt), 0) AS BIGINT) AS before
  FROM per_bin p LEFT JOIN per_bin q ON q.bin < p.bin
  GROUP BY p.bin, p.cnt
), ranks AS (
  SELECT qt, n, lo, hi, (qt * n + 99) // 100 AS k
  FROM (SELECT UNNEST([{", ".join(str(q) for q in QS_QUANTILES)}]) AS qt)
  CROSS JOIN bounds
), located AS (
  SELECT r.qt, r.n, r.k, c.bin, c.before, c.cnt,
         r.lo + ((r.hi - r.lo) / {QS_BINS}.0) * CAST(c.bin AS DOUBLE)
              + ((r.hi - r.lo) / {QS_BINS}.0)
                * (CAST(r.k - c.before AS DOUBLE) / CAST(c.cnt AS DOUBLE)) AS est
  FROM ranks r JOIN cum c ON c.before < r.k AND c.before + c.cnt >= r.k
), exact AS (
  SELECT l.qt, l.n, l.k, l.est, b.o_totalprice AS exact
  FROM located l
  JOIN (SELECT bin, o_totalprice, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY bin
                                  ORDER BY o_totalprice, o_orderkey) AS r
        FROM binned) b
    ON b.bin = l.bin AND b.r = l.k - l.before
)
SELECT qt, n, k, est, exact,
       CAST(floor(abs(est - exact) * {MICRO} + 0.5) AS BIGINT) AS err_micro
FROM exact
ORDER BY qt
"""
