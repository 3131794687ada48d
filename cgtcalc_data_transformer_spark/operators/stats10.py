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
from cgtcalc_data_transformer_spark.operators.similarity import (
    lit_double_array,
)
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
_D19 = "decimal(19,0)"  # per-factor overflow routing (stats9 recipe)
_D38 = "decimal(38,6)"  # double-term sums (n³-scale tie terms)

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
    # CACHED (r14 plan audit): the j/k/m interval branches and the
    # inner minimax branch reference bins 4x, and each reference
    # re-ran the whole per-vector centroid scoring (7 embeddings
    # scans, plans/r14/isotonic_calibration_before.txt). The frame is
    # ≤ ECE_BINS rows (guide §2.4).
    bins = (
        per_vec.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("correct").alias("c"),
        )
        .cache()
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
    # one pass over pairs (r12 union audit) — the fwd/rev self-union
    # executed the lineitem⋈orders+distinct lineage once per branch
    from cgtcalc_data_transformer_spark.operators.graph import mirror_edges

    return mirror_edges(pairs, "c", "s")


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


# ---------------------------------------- energy distance two-sample
def _quantity_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, ca, cb): per-quantity-value counts of 'F' vs 'O' lineitem
    rows — the bounded 50-value frame shared by brunner_munzel,
    energy_distance_test and cramer_von_mises."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v"), "l_linestatus"
    )
    return li.groupBy("v").agg(
        F.sum((F.col("l_linestatus") == "F").cast("long")).alias("ca"),
        F.sum((F.col("l_linestatus") == "O").cast("long")).alias("cb"),
    )


_VALS_SQL = """
vals AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM lineitem GROUP BY 1
)"""


def energy_distance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Székely-Rizzo two-sample ENERGY distance between the quantity
    distributions of 'F' and 'O' lineitems: E = 2·E|X−Y| − E|X−X'|
    − E|Y−Y'| and the test statistic T = (n_a·n_b/(n_a+n_b))·E —
    the metric two-sample test that is consistent against EVERY
    distributional difference (KS and CvM lose power on tail/spread
    changes; energy does not privilege location).

    The value domain is 50 points, so all three pairwise-|difference|
    expectations collapse to one 50×50 cell cross-product: each term
    count_u·count_v·|u−v| rides the DECIMAL(19,0)-factor routing
    (inner factor c·|u−v| stays far inside BIGINT), and the three
    sums are exact DECIMAL(38,0) integers at any row count. E and T
    are then closed forms over exact values; outputs are micro-unit
    BIGINTs (pure rationals — the ROUND ties hazard class).
    """
    vals = _quantity_value_counts(spark, sf_dir)
    a, b = vals.alias("a"), vals.alias("b")
    w = F.abs(F.col("a.v") - F.col("b.v"))
    pairs = a.join(F.broadcast(b), F.lit(True)).agg(
        F.sum(
            F.col("a.ca").cast(_D19) * (F.col("b.cb") * w).cast(_D19)
        ).alias("sab"),
        F.sum(
            F.col("a.ca").cast(_D19) * (F.col("b.ca") * w).cast(_D19)
        ).alias("saa"),
        F.sum(
            F.col("a.cb").cast(_D19) * (F.col("b.cb") * w).cast(_D19)
        ).alias("sbb"),
    )
    tots = vals.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    s = pairs.crossJoin(F.broadcast(tots))
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    e = (
        F.lit(2.0) * F.col("sab").cast("double") / (nad * nbd)
        - F.col("saa").cast("double") / (nad * nad)
        - F.col("sbb").cast("double") / (nbd * nbd)
    )
    t = nad * nbd / (nad + nbd) * e
    mic = F.lit(float(MICRO))
    return s.select(
        "na",
        "nb",
        F.floor(e * mic + F.lit(0.5)).cast("long").alias("e_dist_micro"),
        F.floor(t * mic + F.lit(0.5)).cast("long").alias("t_stat_micro"),
    )


ENERGY_DISTANCE_SQL = f"""
WITH {_VALS_SQL}, pairs AS (
  SELECT
    CAST(SUM(CAST(a.ca AS DECIMAL(19,0)) * CAST(b.cb * abs(a.v - b.v) AS DECIMAL(19,0)))
         AS DECIMAL(38,0)) AS sab,
    CAST(SUM(CAST(a.ca AS DECIMAL(19,0)) * CAST(b.ca * abs(a.v - b.v) AS DECIMAL(19,0)))
         AS DECIMAL(38,0)) AS saa,
    CAST(SUM(CAST(a.cb AS DECIMAL(19,0)) * CAST(b.cb * abs(a.v - b.v) AS DECIMAL(19,0)))
         AS DECIMAL(38,0)) AS sbb
  FROM vals a CROSS JOIN vals b
), tots AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM vals
)
SELECT na, nb,
       CAST(floor((2.0 * CAST(sab AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                   - CAST(saa AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))
                   - CAST(sbb AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)))
                  * {MICRO} + 0.5) AS BIGINT) AS e_dist_micro,
       CAST(floor(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                  * (2.0 * CAST(sab AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                     - CAST(saa AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))
                     - CAST(sbb AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)))
                  * {MICRO} + 0.5) AS BIGINT) AS t_stat_micro
FROM pairs, tots
"""


# ------------------------------------ Cramér-von Mises two-sample test
CVM_CRIT_5PCT = 0.461  # limiting T1 distribution, Anderson (1962)


def cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises test on the same F-vs-O quantity
    frame: T = (n_a·n_b/N²)·Σ_pooled (F̂_a(z) − F̂_b(z))² — the
    integrated-squared-ECDF companion to ks_test_quantity (KS reads
    the worst single gap; CvM reads the whole discrepancy profile,
    and is the stronger test against many small departures).

    Inclusive ECDFs come from one cumulative theta join over the
    50-value count table (the brunner_munzel recipe); each pooled
    term (ca+cb)·(F̂_a−F̂_b)² is built from exact int/int divisions
    and quantized to the 1e-6 grid before the DECIMAL(38,0) sum
    (drift_psi recipe). The leading factor is computed as
    (n_a/N)·(n_b/N)·Σ — ratios first, so nothing leaves the exact
    double range at any corpus size.
    """
    vals = _quantity_value_counts(spark, sf_dir)
    cum = (
        vals.alias("p")
        .join(F.broadcast(vals.alias("q")), F.col("q.v") < F.col("p.v"), "left")
        .groupBy(
            F.col("p.v").alias("v"),
            F.col("p.ca").alias("ca"),
            F.col("p.cb").alias("cb"),
        )
        .agg(
            F.coalesce(F.sum("q.ca"), F.lit(0)).alias("cbel_a"),
            F.coalesce(F.sum("q.cb"), F.lit(0)).alias("cbel_b"),
        )
    )
    tots = vals.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = cum.crossJoin(F.broadcast(tots))
    fa = (F.col("cbel_a") + F.col("ca")).cast("double") / F.col("na").cast("double")
    fb = (F.col("cbel_b") + F.col("cb")).cast("double") / F.col("nb").cast("double")
    d = fa - fb
    termq = F.floor(
        (F.col("ca") + F.col("cb")).cast("double") * d * d * F.lit(float(MICRO))
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    s = j.groupBy("na", "nb").agg(F.sum(termq).alias("sq"))
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    nd = nad + nbd
    t = (nad / nd) * (nbd / nd) * (F.col("sq").cast("double") / F.lit(float(MICRO)))
    return s.select(
        "na",
        "nb",
        F.floor(t * F.lit(float(MICRO)) + F.lit(0.5)).cast("long").alias("cvm_t_micro"),
        (t > F.lit(CVM_CRIT_5PCT)).alias("significant"),
    )


CRAMER_VON_MISES_SQL = f"""
WITH {_VALS_SQL}, cum AS (
  SELECT p.v, p.ca, p.cb,
         CAST(COALESCE(SUM(q.ca), 0) AS BIGINT) AS cbel_a,
         CAST(COALESCE(SUM(q.cb), 0) AS BIGINT) AS cbel_b
  FROM vals p LEFT JOIN vals q ON q.v < p.v
  GROUP BY p.v, p.ca, p.cb
), tots AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM vals
), s AS (
  SELECT na, nb,
         CAST(SUM(CAST(floor(CAST(ca + cb AS DOUBLE)
             * (CAST(cbel_a + ca AS DOUBLE) / na - CAST(cbel_b + cb AS DOUBLE) / nb)
             * (CAST(cbel_a + ca AS DOUBLE) / na - CAST(cbel_b + cb AS DOUBLE) / nb)
             * {MICRO} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq
  FROM cum CROSS JOIN tots
  GROUP BY na, nb
)
SELECT na, nb,
       CAST(floor((CAST(na AS DOUBLE) / (CAST(na AS DOUBLE) + nb))
                  * (CAST(nb AS DOUBLE) / (CAST(na AS DOUBLE) + nb))
                  * (CAST(sq AS DOUBLE) / {MICRO}) * {MICRO} + 0.5) AS BIGINT) AS cvm_t_micro,
       (CAST(na AS DOUBLE) / (CAST(na AS DOUBLE) + nb))
         * (CAST(nb AS DOUBLE) / (CAST(na AS DOUBLE) + nb))
         * (CAST(sq AS DOUBLE) / {MICRO}) > {CVM_CRIT_5PCT} AS significant
FROM s
"""


# -------------------------------------- global clustering coefficient
def transitivity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient (transitivity) of the part
    co-purchase graph: C = 3·triangles / wedges, where wedges =
    Σ_v d_v(d_v−1)/2 — the one-number answer to 'do co-purchases
    CLUSTER or just radiate from hubs' that the raw triangle count
    (graph.py:133) cannot give because its denominator is missing.

    Triangles reuse triangle_count_parts' degree-oriented O(E^1.5)
    enumeration via the shared graph.py helpers (copurchase_edges /
    node_degrees / oriented_wedges — ONE implementation of the wedge
    discipline, per VERDICT r10); the wedge sum is one aggregation
    over the degree table with d(d−1) DECIMAL-routed (d² would
    overflow int64 exactly on the hub parts this graph grows at
    scale). C is one int-ratio division, reported in micro units.
    """
    from cgtcalc_data_transformer_spark.operators.graph import (
        copurchase_edges,
        node_degrees,
        oriented_out_adjacency,
        triangle_commons,
    )

    # ONE cached edge build feeds degrees, the wedge sum and the
    # adjacency build; triangles come from the r15 adjacency-
    # intersection machinery (one array_intersect per oriented edge
    # instead of the O(E^1.5) wedge-row exchange + closing semi-join
    # — see oriented_out_adjacency; guide §2.3/§2.4)
    edges = copurchase_edges(spark, sf_dir)
    deg = node_degrees(edges).cache()
    closed = triangle_commons(oriented_out_adjacency(edges, deg))
    tri = (
        closed.agg(
            F.coalesce(
                F.sum(F.size(F.col("common")).cast("long")),
                F.lit(0).cast("long"),
            ).alias("n_triangles")
        )
        .crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes"))))
        .crossJoin(F.broadcast(edges.agg(F.count(F.lit(1)).alias("n_edges"))))
    )
    wedges = deg.agg(
        F.sum(F.col("deg").cast(_D19) * (F.col("deg") - 1).cast(_D19)).alias(
            "w2"
        )
    )
    s = tri.crossJoin(F.broadcast(wedges))
    c = (
        F.lit(3.0)
        * F.col("n_triangles").cast("double")
        / (F.col("w2").cast("double") / F.lit(2.0))
    )
    return s.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        (F.col("w2").cast("decimal(38,0)") / F.lit(2)).cast("long").alias("n_wedges"),
        F.floor(c * F.lit(float(MICRO)) + F.lit(0.5)).cast("long").alias(
            "transitivity_micro"
        ),
    )


TRANSITIVITY_SQL = f"""
WITH lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY node
), agg AS (
  SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
         (SELECT COUNT(*) FROM edges) AS n_edges,
         (SELECT COUNT(*)
          FROM edges e1
          JOIN edges e2 ON e2.u = e1.v
          JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles,
         (SELECT CAST(SUM(CAST(deg AS DECIMAL(19,0)) * CAST(deg - 1 AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) FROM deg) AS w2
)
SELECT n_nodes, n_edges, n_triangles,
       CAST(w2 / 2 AS BIGINT) AS n_wedges,
       CAST(floor(3.0 * CAST(n_triangles AS DOUBLE) / (CAST(w2 AS DOUBLE) / 2.0)
                  * {MICRO} + 0.5) AS BIGINT) AS transitivity_micro
FROM agg
"""


# ------------------------------------------- Hampel filter (day grid)
HAMPEL_HALF = 3          # window = 7 days centered
HAMPEL_K_X10K = 44478    # 3 · 1.4826 · 10⁴ (Gaussian MAD consistency)


def hampel_filter_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier filter on per-type daily counts: flag days
    where |y − median₇| > 3·1.4826·MAD₇ over the centered 7-day
    window — the ROBUST spike detector that, unlike the mean/std
    events_rate_anomaly, cannot have its own threshold dragged up by
    the outlier it is trying to catch (one bad day inflates a std;
    it barely moves a median).

    The window is a bounded partitioned frame (7 rows per day per
    type); median and MAD are element_at(array_sort(...), 4) over the
    collected 7-integer arrays — exact integer order statistics, no
    percentile approximation. The flag comparison is pure integer
    (|y−med|·10⁴ > 44478·MAD), so the per-type rollup is exact at
    any scale; MAD = 0 windows fall back to flagging any y ≠ median.
    """
    grid = _daily_grid(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-HAMPEL_HALF, HAMPEL_HALF)
    )
    arr = F.collect_list("y").over(w)
    g = grid.withColumn("arr", arr).filter(
        F.size("arr") == 2 * HAMPEL_HALF + 1
    )
    med = F.element_at(F.array_sort("arr"), HAMPEL_HALF + 1)
    g = g.withColumn("med", med)
    mad = F.element_at(
        F.array_sort(
            F.transform("arr", lambda x: F.abs(x - F.col("med")))
        ),
        HAMPEL_HALF + 1,
    )
    g = g.withColumn("mad", mad)
    dev = F.abs(F.col("y") - F.col("med"))
    is_out = F.when(
        F.col("mad") > 0,
        dev * F.lit(10**4) > F.lit(HAMPEL_K_X10K) * F.col("mad"),
    ).otherwise(dev > 0)
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
            F.max(dev).alias("max_abs_dev"),
        )
        .orderBy("event_type")
    )


HAMPEL_SQL = f"""
WITH {_GRID_SQL}, win AS (
  SELECT event_type, d, y,
         list(y) OVER (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN {HAMPEL_HALF} PRECEDING
                       AND {HAMPEL_HALF} FOLLOWING) AS arr
  FROM grid
), full_win AS (
  SELECT event_type, d, y,
         list_sort(arr)[{HAMPEL_HALF + 1}] AS med
  FROM win WHERE len(arr) = {2 * HAMPEL_HALF + 1}
), scored AS (
  SELECT f.event_type, f.d, f.y, f.med,
         list_sort(list_transform(w.arr, x -> abs(x - f.med)))[{HAMPEL_HALF + 1}] AS mad
  FROM full_win f JOIN win w ON w.event_type = f.event_type AND w.d = f.d
)
SELECT event_type,
       COUNT(*) AS n_eval,
       CAST(SUM(CASE WHEN (mad > 0 AND abs(y - med) * 10000 > {HAMPEL_K_X10K} * mad)
                       OR (mad = 0 AND abs(y - med) > 0)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(MAX(abs(y - med)) AS BIGINT) AS max_abs_dev
FROM scored
GROUP BY event_type
ORDER BY event_type
"""


# ----------------------------------------------------- Platt scaling
PLATT_BIN = 10**4  # conf_i (1e-6 grid) → percent grid feature


def platt_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt (1999) sigmoid recalibration of the nearest-centroid
    confidence: logistic regression correct ~ σ(β₀ + β₁·conf%) via
    IRLS on the percent-binned confidence — the PARAMETRIC companion
    to isotonic_calibration (isotonic fits any monotone shape from
    the data; Platt assumes the sigmoid and wins when bins are thin).

    Rides logistic_regression_irls' proven determinism recipe
    (stats_ext.py:1013): the sufficient statistics live on a ≤101-row
    percent grid, each IRLS step quantizes per-bin terms to 1e-6 and
    the betas to 1e-9, and the driver-side loop (bounded collect, the
    kmeans-centroid pattern) walks the identical rational sequence as
    the oracle's unrolled CTEs.
    """
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        LOGIT_ITERS,
        LOGIT_TS,
        _logit_step,
    )

    per_vec = _nearest_centroid_scores(spark, sf_dir)
    # clamp at 0 BEFORE the integer division: Spark `div` truncates
    # toward zero, DuckDB `//` floors — they disagree on negatives
    bins_df = per_vec.groupBy(
        F.expr(f"greatest(conf_i, 0L) div {PLATT_BIN}").alias("x")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("correct").alias("y"),
    )
    bins = [(r["x"], r["n"], r["y"]) for r in bins_df.collect()]  # ≤ 101
    bins.sort()
    b0, b1 = 0.0, 0.0
    for _ in range(LOGIT_ITERS):
        b0, b1 = _logit_step(bins, b0, b1)
    import math as _m

    from cgtcalc_data_transformer_spark.operators.stats_ext import _clamp_p

    n_tot = sum(n for _, n, _ in bins)
    llq = 0
    for x, n, y in bins:
        p = _clamp_p(1.0 / (1.0 + _m.exp(-(b0 + b1 * x))))
        llq += _m.floor(
            (y * _m.log(p) + (n - y) * _m.log(1.0 - p)) * LOGIT_TS + 0.5
        )
    out = [(n_tot, b0, b1, -llq / LOGIT_TS / n_tot)]
    return spark.createDataFrame(
        out, "n long, beta0 double, beta1 double, avg_log_loss double"
    )


def _platt_sql() -> str:
    # the IRLS step chain and loss tail are the SHARED text from
    # stats_ext (logit_steps_sql/logit_loss_sql) — one implementation
    # of the Newton walk for both logistic oracles, det-guarded and
    # ln-clamped (ADVICE r10)
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        logit_loss_sql,
        logit_steps_sql,
    )

    return f"""
WITH {_PER_VEC_SQL}, bins AS MATERIALIZED (
  SELECT GREATEST(conf_i, 0) // {PLATT_BIN} AS x, COUNT(*) AS n,
         CAST(SUM(correct) AS BIGINT) AS y
  FROM flat GROUP BY 1
), b0 AS (SELECT 0.0 AS b0, 0.0 AS b1){logit_steps_sql()}{logit_loss_sql()}"""


PLATT_SQL = _platt_sql()


# ------------------------------------------ Bloom-filter FPR audit
BLOOM_M = 1 << 17   # bits
BLOOM_K = 4         # hash functions


def bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized vs theoretical false-positive rate of a Bloom filter
    over the H1-buyer custkey set, probed with every customer who did
    NOT buy in H1 — the pre-flight audit for the runtime Bloom join
    pruning this engine already ships (layout.py
    bloom_filter_pruned_join): before trusting a filter to prune a
    100 TB scan, measure that its realized FPR matches
    (1 − e^{−kn/m})^k on real key distributions.

    The filter is md5-derived (position_i = md5(key·i) mod m — the
    same engine-portable hash family as the split/shuffle ops), so
    'bits' are a DISTINCT position table built by one aggregation;
    probing is an equality join of probe positions against it, and a
    probe false-positives iff all K of its positions hit. Everything
    is exact integers except the theoretical rate (one exp, identical
    IEEE, micro-quantized).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.month("o_orderdate").alias("mo")
    )
    members = (
        orders.filter(F.col("mo") <= 6).select(
            F.col("o_custkey").alias("key")
        ).distinct()
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key")
    )
    probes = cust.join(members, "key", "left_anti")

    def positions(df: DataFrame) -> DataFrame:
        ks = spark.range(1, BLOOM_K + 1).select(
            F.col("id").cast("int").alias("i")
        )
        return df.crossJoin(F.broadcast(ks)).select(
            "key",
            "i",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("#", F.col("key"), F.col("i"))), 1, 15
                    ),
                    16,
                    10,
                ).cast("long")
                % F.lit(BLOOM_M)
            ).alias("pos"),
        )

    bits = positions(members).select("pos").distinct()
    n_bits = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    n_members = members.agg(F.count(F.lit(1)).alias("n_members"))
    probe_pos = positions(probes)
    hits = (
        probe_pos.join(bits, "pos")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("h"))
        .filter(F.col("h") == BLOOM_K)
        .agg(F.count(F.lit(1)).alias("n_false_pos"))
    )
    n_probes = probes.agg(F.count(F.lit(1)).alias("n_probes"))
    s = (
        hits.crossJoin(F.broadcast(n_probes))
        .crossJoin(F.broadcast(n_members))
        .crossJoin(F.broadcast(n_bits))
    )
    x = F.lit(1.0) - F.exp(
        -F.lit(float(BLOOM_K))
        * F.col("n_members").cast("double")
        / F.lit(float(BLOOM_M))
    )
    theory = x * x * x * x  # k = 4 as exact multiplications, no pow()
    return s.select(
        "n_members",
        F.lit(BLOOM_M).alias("m_bits"),
        F.lit(BLOOM_K).alias("k_hashes"),
        "bits_set",
        "n_probes",
        "n_false_pos",
        (
            F.col("n_false_pos").cast("double")
            / F.col("n_probes").cast("double")
        ).alias("fpr_real"),
        F.floor(theory * F.lit(float(MICRO)) + F.lit(0.5))
        .cast("long")
        .alias("fpr_theory_micro"),
    )


BLOOM_FPR_SQL = f"""
WITH members AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS key FROM orders WHERE month(o_orderdate) <= 6
), probes AS MATERIALIZED (
  SELECT c_custkey AS key FROM customer
  WHERE c_custkey NOT IN (SELECT key FROM members)
), ks AS (SELECT UNNEST([1, 2, 3, 4]) AS i),
mpos AS (
  SELECT ('0x' || substr(md5(key::VARCHAR || '#' || i::VARCHAR), 1, 15))::UBIGINT::BIGINT
         % {BLOOM_M} AS pos
  FROM members CROSS JOIN ks
), bits AS MATERIALIZED (
  SELECT DISTINCT pos FROM mpos
), ppos AS (
  SELECT key,
         ('0x' || substr(md5(key::VARCHAR || '#' || i::VARCHAR), 1, 15))::UBIGINT::BIGINT
         % {BLOOM_M} AS pos
  FROM probes CROSS JOIN ks
), fp AS (
  SELECT COUNT(*) AS n_false_pos FROM (
    SELECT key FROM ppos JOIN bits USING (pos) GROUP BY key
    HAVING COUNT(*) = {BLOOM_K}
  )
), agg AS (
  SELECT (SELECT COUNT(*) FROM members) AS n_members,
         (SELECT COUNT(*) FROM bits) AS bits_set,
         (SELECT COUNT(*) FROM probes) AS n_probes,
         (SELECT n_false_pos FROM fp) AS n_false_pos
)
SELECT n_members, {BLOOM_M} AS m_bits, {BLOOM_K} AS k_hashes, bits_set,
       n_probes, n_false_pos,
       CAST(n_false_pos AS DOUBLE) / CAST(n_probes AS DOUBLE) AS fpr_real,
       CAST(floor((1.0 - exp(-{BLOOM_K}.0 * CAST(n_members AS DOUBLE) / {BLOOM_M}.0))
                  * (1.0 - exp(-{BLOOM_K}.0 * CAST(n_members AS DOUBLE) / {BLOOM_M}.0))
                  * (1.0 - exp(-{BLOOM_K}.0 * CAST(n_members AS DOUBLE) / {BLOOM_M}.0))
                  * (1.0 - exp(-{BLOOM_K}.0 * CAST(n_members AS DOUBLE) / {BLOOM_M}.0))
                  * {MICRO} + 0.5) AS BIGINT) AS fpr_theory_micro
FROM agg
"""


# ----------------------------------------------------- log-rank test
LOGRANK_CRIT_DF1 = 3.841459


def logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Cox log-rank test comparing TIME TO FIRST PURCHASE
    between the two halves of a deterministic user split (user_id
    mod 2) — the censoring-aware two-group comparison that completes
    the survival toolkit (kaplan_meier_churn draws curves; log-rank
    says whether two curves differ). On a hash split the truth is
    'no difference', so this is the A/A null contract every
    experiment harness needs: a significant readout here means the
    machinery, not the users, is broken.

    Duration = first purchase day − first active day; users who
    never purchase are right-censored at the observation horizon.
    (Churn durations are NOT usable here: at small SFs every user is
    still active near the horizon, so the churn event count is zero
    and the statistic is 0/0 — purchases exist at every SF.)
    Everything after the per-user rollup lives on the bounded
    duration-domain table: per-group at-risk counts via one theta
    join of the pooled t-grid, hypergeometric E₀/V terms quantized to
    the 1e-6 grid before the DECIMAL(38,0) sums, χ² = (O₀−E₀)²/V as
    one closed form with an explicit V = 0 guard.
    """
    from cgtcalc_data_transformer_spark.operators.events import DAY_NS
    from cgtcalc_data_transformer_spark.sources.tpch import load_events

    ev = load_events(spark, sf_dir)
    act = ev.select(
        "user_id",
        F.expr(f"ts div {DAY_NS}").alias("day"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    horizon = act.agg(F.max("day").alias("h"))
    users = (
        act.groupBy("user_id")
        .agg(
            F.min("day").alias("fd"),
            F.min(F.when(F.col("is_p") == 1, F.col("day"))).alias("pd"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            (F.col("user_id") % 2).alias("g"),
            (F.coalesce(F.col("pd"), F.col("h")) - F.col("fd")).alias("t"),
            F.col("pd").isNotNull().cast("long").alias("event"),
        )
    )
    per_gt = users.groupBy("g", "t").agg(
        F.sum("event").alias("d"), F.count(F.lit(1)).alias("m")
    )
    tgrid = per_gt.select("t").distinct()
    risk = (
        tgrid.alias("a")
        .join(F.broadcast(per_gt.alias("b")), F.col("b.t") >= F.col("a.t"))
        .groupBy(F.col("a.t").alias("t"), F.col("b.g").alias("g"))
        .agg(F.sum("b.m").alias("n_risk"))
    )
    dt = per_gt.select("g", "t", "d")
    wide = (
        risk.join(dt, ["g", "t"], "left")
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("g") == 0, F.col("n_risk"))).alias("n0"),
            F.sum(F.when(F.col("g") == 1, F.col("n_risk"))).alias("n1"),
            F.coalesce(
                F.sum(F.when(F.col("g") == 0, F.col("d"))), F.lit(0)
            ).alias("d0"),
            F.coalesce(
                F.sum(F.when(F.col("g") == 1, F.col("d"))), F.lit(0)
            ).alias("d1"),
        )
        .select(
            "t",
            F.coalesce("n0", F.lit(0)).alias("n0"),
            F.coalesce("n1", F.lit(0)).alias("n1"),
            "d0",
            "d1",
        )
    )
    dd = (F.col("d0") + F.col("d1")).cast("double")
    nn = (F.col("n0") + F.col("n1")).cast("double")
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    e0 = dd * n0d / nn
    v = dd * (n0d / nn) * (n1d / nn) * (nn - dd) / (nn - F.lit(1.0))
    mic = F.lit(float(MICRO))

    def q6(x):
        return F.floor(x * mic + F.lit(0.5)).cast("decimal(38,0)")

    s = wide.filter((F.col("d0") + F.col("d1") > 0) & (F.col("n0") + F.col("n1") > 1)).agg(
        F.sum("d0").alias("o0"),
        F.sum("d1").alias("o1"),
        F.sum(q6(e0)).alias("e0q"),
        F.sum(q6(v)).alias("vq"),
    )
    e0d = F.col("e0q").cast("double") / mic
    chi2 = F.when(
        F.col("vq") > 0,
        (F.col("o0").cast("double") - e0d)
        * (F.col("o0").cast("double") - e0d)
        / (F.col("vq").cast("double") / mic),
    ).otherwise(F.lit(0.0))
    return s.select(
        F.coalesce("o0", F.lit(0)).alias("o0"),
        F.coalesce("o1", F.lit(0)).alias("o1"),
        F.coalesce(F.floor(e0d * mic + F.lit(0.5)).cast("long"), F.lit(0)).alias(
            "e0_micro"
        ),
        F.floor(chi2 * mic + F.lit(0.5)).cast("long").alias("chi2_micro"),
        (chi2 > F.lit(LOGRANK_CRIT_DF1)).alias("significant"),
    )


from cgtcalc_data_transformer_spark.operators.events import (  # noqa: E402
    DAY_NS as _DAY_NS,
    KM_CENSOR_GAP as _KM_GAP,
)

LOGRANK_SQL = f"""
WITH act AS (
  SELECT user_id, epoch_ns(ts) // {_DAY_NS} AS day,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events
), horizon AS (
  SELECT MAX(day) AS h FROM act
), users AS (
  SELECT user_id % 2 AS g, COALESCE(pd, h) - fd AS t,
         CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM (SELECT user_id, MIN(day) AS fd,
               MIN(CASE WHEN is_p = 1 THEN day END) AS pd
        FROM act GROUP BY user_id), horizon
), per_gt AS (
  SELECT g, t, CAST(SUM(event) AS BIGINT) AS d, COUNT(*) AS m
  FROM users GROUP BY g, t
), tgrid AS (SELECT DISTINCT t FROM per_gt),
risk AS (
  SELECT a.t, b.g, CAST(SUM(b.m) AS BIGINT) AS n_risk
  FROM tgrid a JOIN per_gt b ON b.t >= a.t
  GROUP BY a.t, b.g
), wide AS (
  SELECT r.t,
         COALESCE(SUM(CASE WHEN r.g = 0 THEN r.n_risk END), 0) AS n0,
         COALESCE(SUM(CASE WHEN r.g = 1 THEN r.n_risk END), 0) AS n1,
         COALESCE(SUM(CASE WHEN r.g = 0 THEN p.d END), 0) AS d0,
         COALESCE(SUM(CASE WHEN r.g = 1 THEN p.d END), 0) AS d1
  FROM risk r LEFT JOIN per_gt p ON p.g = r.g AND p.t = r.t
  GROUP BY r.t
), s AS (
  SELECT CAST(SUM(d0) AS BIGINT) AS o0, CAST(SUM(d1) AS BIGINT) AS o1,
         CAST(SUM(CAST(floor(CAST(d0 + d1 AS DOUBLE) * n0 / (n0 + n1)
                             * {MICRO} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS e0q,
         CAST(SUM(CAST(floor(CAST(d0 + d1 AS DOUBLE)
                             * (CAST(n0 AS DOUBLE) / (n0 + n1))
                             * (CAST(n1 AS DOUBLE) / (n0 + n1))
                             * ((n0 + n1) - (d0 + d1)) / ((n0 + n1) - 1.0)
                             * {MICRO} + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS vq
  FROM wide WHERE d0 + d1 > 0 AND n0 + n1 > 1
)
SELECT COALESCE(o0, 0) AS o0, COALESCE(o1, 0) AS o1,
       COALESCE(CAST(floor(CAST(e0q AS DOUBLE) / {MICRO} * {MICRO} + 0.5) AS BIGINT), 0) AS e0_micro,
       CAST(floor((CASE WHEN vq > 0 THEN
                     (o0 - CAST(e0q AS DOUBLE) / {MICRO}) * (o0 - CAST(e0q AS DOUBLE) / {MICRO})
                     / (CAST(vq AS DOUBLE) / {MICRO}) ELSE 0.0 END) * {MICRO} + 0.5) AS BIGINT) AS chi2_micro,
       (CASE WHEN vq > 0 THEN
          (o0 - CAST(e0q AS DOUBLE) / {MICRO}) * (o0 - CAST(e0q AS DOUBLE) / {MICRO})
          / (CAST(vq AS DOUBLE) / {MICRO}) ELSE 0.0 END) > {LOGRANK_CRIT_DF1} AS significant
FROM s
"""


# ------------------------------------------------------- Chow test
CHOW_F_CRIT = 2.9957  # F(2, inf) upper 5% — asymptotic gate, day grids
                      # here have n >> k so the large-denominator form


def chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow (1960) structural-break test on each event type's daily
    trend: does the linear model y ~ day fitted on the first half of
    the observation window differ from the second half — the
    regression-regime-change companion to changepoint_split (which
    finds the best break in MEANS; Chow tests a KNOWN break in the
    fitted line, the standard before/after-launch readout).

    Pooled and per-segment SSRs come from exact moment sums (y², d·y
    DECIMAL-routed per factor); each SSR is a closed form over those
    exact values, and F = ((SSR_p − SSR₁ − SSR₂)/2) /
    ((SSR₁+SSR₂)/(n−4)) is one identical IEEE expression. The break
    day is (D−1) div 2 — integer division in both twins.
    """
    grid = _daily_grid(spark, sf_dir)
    bounds = grid.agg(F.expr("(max(d)) div 2").alias("brk"))
    g = grid.crossJoin(F.broadcast(bounds)).withColumn(
        "seg", (F.col("d") >= F.col("brk")).cast("int")
    )

    def moments(df, prefix):
        return [
            F.count(F.lit(1)).alias(f"{prefix}n"),
            F.sum("d").alias(f"{prefix}sd"),
            F.sum("y").alias(f"{prefix}sy"),
            F.sum(F.col("d").cast(_D19) * F.col("y").cast(_D19)).alias(
                f"{prefix}sdy"
            ),
            F.sum(F.col("d").cast(_D19) * F.col("d").cast(_D19)).alias(
                f"{prefix}sdd"
            ),
            F.sum(F.col("y").cast(_D19) * F.col("y").cast(_D19)).alias(
                f"{prefix}syy"
            ),
        ]

    seg = g.groupBy("event_type", "seg").agg(*moments(g, ""))
    wide = seg.groupBy("event_type").agg(
        *[
            F.sum(F.when(F.col("seg") == s_, F.col(c))).alias(f"{c}{s_}")
            for s_ in (0, 1)
            for c in ("n", "sd", "sy", "sdy", "sdd", "syy")
        ]
    )

    def ssr(n, sd, sy, sdy, sdd, syy):
        nd = F.col(n).cast("double")
        sdd_ = F.col(sdd).cast("double") - F.col(sd).cast("double") * F.col(
            sd
        ).cast("double") / nd
        sdy_ = F.col(sdy).cast("double") - F.col(sd).cast("double") * F.col(
            sy
        ).cast("double") / nd
        syy_ = F.col(syy).cast("double") - F.col(sy).cast("double") * F.col(
            sy
        ).cast("double") / nd
        return syy_ - sdy_ * sdy_ / sdd_

    ssr0 = ssr("n0", "sd0", "sy0", "sdy0", "sdd0", "syy0")
    ssr1 = ssr("n1", "sd1", "sy1", "sdy1", "sdd1", "syy1")
    # pooled moments = sums of the two segments
    pooled = wide.select(
        "event_type",
        (F.col("n0") + F.col("n1")).alias("n"),
        (F.col("sd0") + F.col("sd1")).alias("sd"),
        (F.col("sy0") + F.col("sy1")).alias("sy"),
        (F.col("sdy0") + F.col("sdy1")).alias("sdy"),
        (F.col("sdd0") + F.col("sdd1")).alias("sdd"),
        (F.col("syy0") + F.col("syy1")).alias("syy"),
        ssr0.alias("ssr0"),
        ssr1.alias("ssr1"),
    )
    ssrp = ssr("n", "sd", "sy", "sdy", "sdd", "syy")
    nd = F.col("n").cast("double")
    fstat = ((ssrp - F.col("ssr0") - F.col("ssr1")) / F.lit(2.0)) / (
        (F.col("ssr0") + F.col("ssr1")) / (nd - F.lit(4.0))
    )
    mic = F.lit(float(MICRO))
    return pooled.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.floor(fstat * mic + F.lit(0.5)).cast("long").alias("f_micro"),
        (fstat > F.lit(CHOW_F_CRIT)).alias("break_detected"),
    ).orderBy("event_type")


CHOW_SQL = f"""
WITH {_GRID_SQL}, brk AS (
  SELECT MAX(d) // 2 AS brk FROM grid
), segs AS (
  SELECT event_type, CASE WHEN d >= brk THEN 1 ELSE 0 END AS seg,
         COUNT(*) AS n,
         CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(d AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sdy,
         CAST(SUM(CAST(d AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sdd,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS syy
  FROM grid CROSS JOIN brk GROUP BY 1, 2
), wide AS (
  SELECT event_type,
         SUM(CASE WHEN seg = 0 THEN n END) AS n0, SUM(CASE WHEN seg = 1 THEN n END) AS n1,
         SUM(CASE WHEN seg = 0 THEN sd END) AS sd0, SUM(CASE WHEN seg = 1 THEN sd END) AS sd1,
         SUM(CASE WHEN seg = 0 THEN sy END) AS sy0, SUM(CASE WHEN seg = 1 THEN sy END) AS sy1,
         SUM(CASE WHEN seg = 0 THEN sdy END) AS sdy0, SUM(CASE WHEN seg = 1 THEN sdy END) AS sdy1,
         SUM(CASE WHEN seg = 0 THEN sdd END) AS sdd0, SUM(CASE WHEN seg = 1 THEN sdd END) AS sdd1,
         SUM(CASE WHEN seg = 0 THEN syy END) AS syy0, SUM(CASE WHEN seg = 1 THEN syy END) AS syy1
  FROM segs GROUP BY event_type
), f AS (
  SELECT event_type, n0 + n1 AS n,
         (CAST(syy0 AS DOUBLE) - CAST(sy0 AS DOUBLE) * CAST(sy0 AS DOUBLE) / n0)
           - (CAST(sdy0 AS DOUBLE) - CAST(sd0 AS DOUBLE) * CAST(sy0 AS DOUBLE) / n0)
             * (CAST(sdy0 AS DOUBLE) - CAST(sd0 AS DOUBLE) * CAST(sy0 AS DOUBLE) / n0)
             / (CAST(sdd0 AS DOUBLE) - CAST(sd0 AS DOUBLE) * CAST(sd0 AS DOUBLE) / n0) AS ssr0,
         (CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE) / n1)
           - (CAST(sdy1 AS DOUBLE) - CAST(sd1 AS DOUBLE) * CAST(sy1 AS DOUBLE) / n1)
             * (CAST(sdy1 AS DOUBLE) - CAST(sd1 AS DOUBLE) * CAST(sy1 AS DOUBLE) / n1)
             / (CAST(sdd1 AS DOUBLE) - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE) / n1) AS ssr1,
         (CAST(syy0 + syy1 AS DOUBLE) - CAST(sy0 + sy1 AS DOUBLE) * CAST(sy0 + sy1 AS DOUBLE) / (n0 + n1))
           - (CAST(sdy0 + sdy1 AS DOUBLE) - CAST(sd0 + sd1 AS DOUBLE) * CAST(sy0 + sy1 AS DOUBLE) / (n0 + n1))
             * (CAST(sdy0 + sdy1 AS DOUBLE) - CAST(sd0 + sd1 AS DOUBLE) * CAST(sy0 + sy1 AS DOUBLE) / (n0 + n1))
             / (CAST(sdd0 + sdd1 AS DOUBLE) - CAST(sd0 + sd1 AS DOUBLE) * CAST(sd0 + sd1 AS DOUBLE) / (n0 + n1)) AS ssrp
  FROM wide
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor(((ssrp - ssr0 - ssr1) / 2.0) / ((ssr0 + ssr1) / (CAST(n AS DOUBLE) - 4.0))
                  * {MICRO} + 0.5) AS BIGINT) AS f_micro,
       ((ssrp - ssr0 - ssr1) / 2.0) / ((ssr0 + ssr1) / (CAST(n AS DOUBLE) - 4.0))
         > {CHOW_F_CRIT} AS break_detected
FROM f
ORDER BY event_type
"""


# ----------------------------------------------- Dunn post-hoc test
DUNN_Z_CRIT = 2.39398  # two-sided 5% Bonferroni over 3 comparisons


def dunn_posthoc_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn (1964) post-hoc pairwise comparisons after Kruskal-Wallis
    over the three return-flag groups on quantity — the test you run
    AFTER kruskal_wallis_test rejects, to learn WHICH groups differ,
    with the shared-rank-variance denominator and Bonferroni gate
    that naive pairwise Mann-Whitneys get wrong.

    Doubled pooled midranks on the 50-value grid keep every rank sum
    an exact integer (2R(v) = 2·cum_below + c + 1); the tie term
    Σ(t³−t) rides the double-term→DECIMAL(38,6) route; each pairwise
    z is one closed form over exact values, reported in micro units.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v"), "l_returnflag"
    )
    vals = li.groupBy("v").agg(
        *[
            F.sum((F.col("l_returnflag") == fl).cast("long")).alias(f"c{fl}")
            for fl in ("A", "N", "R")
        ]
    )
    cum = (
        vals.alias("p")
        .join(F.broadcast(vals.alias("q")), F.col("q.v") < F.col("p.v"), "left")
        .groupBy(
            F.col("p.v").alias("v"),
            F.col("p.cA").alias("cA"),
            F.col("p.cN").alias("cN"),
            F.col("p.cR").alias("cR"),
        )
        .agg(
            F.coalesce(
                F.sum(F.col("q.cA") + F.col("q.cN") + F.col("q.cR")), F.lit(0)
            ).alias("below")
        )
    )
    ct = F.col("cA") + F.col("cN") + F.col("cR")
    r2 = F.lit(2) * F.col("below") + ct + 1  # doubled pooled midrank
    tdbl = ct.cast("double")
    s = cum.agg(
        *[F.sum(f"c{fl}").alias(f"n{fl}") for fl in ("A", "N", "R")],
        *[
            F.sum(F.col(f"c{fl}").cast(_D19) * r2.cast(_D19)).alias(f"r{fl}")
            for fl in ("A", "N", "R")
        ],
        F.sum((tdbl * tdbl * tdbl - tdbl).cast(_D38)).alias("ties"),
    )
    # CACHED (r12 union audit): one row, but all three pairwise-z
    # output rows project from it — uncached, the rank machinery
    # re-executed once per pair
    s = s.cache()
    nn = (F.col("nA") + F.col("nN") + F.col("nR")).cast("double")
    base_var = nn * (nn + 1) / F.lit(12.0) - F.col("ties").cast("double") / (
        F.lit(12.0) * (nn - 1)
    )
    mic = F.lit(float(MICRO))
    out = None
    for g1, g2 in (("A", "N"), ("A", "R"), ("N", "R")):
        m1 = F.col(f"r{g1}").cast("double") / (
            F.lit(2.0) * F.col(f"n{g1}").cast("double")
        )
        m2 = F.col(f"r{g2}").cast("double") / (
            F.lit(2.0) * F.col(f"n{g2}").cast("double")
        )
        se = F.sqrt(
            base_var
            * (
                F.lit(1.0) / F.col(f"n{g1}").cast("double")
                + F.lit(1.0) / F.col(f"n{g2}").cast("double")
            )
        )
        z = (m1 - m2) / se
        row = s.select(
            F.lit(f"{g1}-{g2}").alias("pair"),
            F.col(f"n{g1}").alias("n1"),
            F.col(f"n{g2}").alias("n2"),
            F.floor(z * mic + F.lit(0.5)).cast("long").alias("z_micro"),
            (F.abs(z) > F.lit(DUNN_Z_CRIT)).alias("significant"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("pair")


DUNN_SQL = f"""
WITH vals AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cA,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cN,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cR
  FROM lineitem GROUP BY 1
), cum AS (
  SELECT p.v, p.cA, p.cN, p.cR,
         CAST(COALESCE(SUM(q.cA + q.cN + q.cR), 0) AS BIGINT) AS below
  FROM vals p LEFT JOIN vals q ON q.v < p.v
  GROUP BY p.v, p.cA, p.cN, p.cR
), s AS (
  SELECT CAST(SUM(cA) AS BIGINT) AS nA, CAST(SUM(cN) AS BIGINT) AS nN,
         CAST(SUM(cR) AS BIGINT) AS nR,
         CAST(SUM(CAST(cA AS DECIMAL(19,0)) * CAST(2 * below + cA + cN + cR + 1 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS rA,
         CAST(SUM(CAST(cN AS DECIMAL(19,0)) * CAST(2 * below + cA + cN + cR + 1 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS rN,
         CAST(SUM(CAST(cR AS DECIMAL(19,0)) * CAST(2 * below + cA + cN + cR + 1 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS rR,
         CAST(SUM(CAST(CAST(cA + cN + cR AS DOUBLE) * (cA + cN + cR) * (cA + cN + cR)
                       - (cA + cN + cR) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS ties
  FROM cum
), base AS (
  SELECT *,
         CAST(nA + nN + nR AS DOUBLE) * (nA + nN + nR + 1) / 12.0
           - CAST(ties AS DOUBLE) / (12.0 * (CAST(nA + nN + nR AS DOUBLE) - 1)) AS bv
  FROM s
), pairs AS (
  SELECT 'A-N' AS pair, nA AS n1, nN AS n2,
         (CAST(rA AS DOUBLE) / (2.0 * nA) - CAST(rN AS DOUBLE) / (2.0 * nN))
           / sqrt(bv * (1.0 / nA + 1.0 / nN)) AS z
  FROM base
  UNION ALL
  SELECT 'A-R', nA, nR,
         (CAST(rA AS DOUBLE) / (2.0 * nA) - CAST(rR AS DOUBLE) / (2.0 * nR))
           / sqrt(bv * (1.0 / nA + 1.0 / nR))
  FROM base
  UNION ALL
  SELECT 'N-R', nN, nR,
         (CAST(rN AS DOUBLE) / (2.0 * nN) - CAST(rR AS DOUBLE) / (2.0 * nR))
           / sqrt(bv * (1.0 / nN + 1.0 / nR))
  FROM base
)
SELECT pair, n1, n2,
       CAST(floor(z * {MICRO} + 0.5) AS BIGINT) AS z_micro,
       abs(z) > {DUNN_Z_CRIT} AS significant
FROM pairs
ORDER BY pair
"""


# ------------------------------------------------- spectral entropy
def spectral_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy of each event type's daily counts
    over the tested rhythm frequencies (periods 7/14/30 days): H =
    −Σ pᵢ·ln pᵢ / ln 3 where pᵢ is the share of spectral power at
    period i — the one-number 'is this series rhythmic or noise'
    summary (H → 0: one dominant cycle; H → 1: power spread evenly),
    complementing periodogram_fixed's raw per-period amplitudes.

    The C/S projections reuse series8's precomputed 1e-9 integer
    cos/sin weight tables (engine trig never runs inside the sums);
    powers C²+S² are DECIMAL-routed exact integers, the shares are
    exact-value divisions, and H is ln on identical doubles,
    micro-quantized.
    """
    from cgtcalc_data_transformer_spark.operators.series8 import (
        _PG_COS,
        _PG_SIN,
        PG_PERIODS,
    )

    grid = _daily_grid(spark, sf_dir)
    aggs = []
    for p in PG_PERIODS:
        wc = lit_double_array(_PG_COS[p])
        ws = lit_double_array(_PG_SIN[p])
        idx = (F.col("d") % p + 1).cast("int")
        aggs.append(F.sum(F.col("y") * F.element_at(wc, idx)).alias(f"c{p}"))
        aggs.append(F.sum(F.col("y") * F.element_at(ws, idx)).alias(f"s{p}"))
    agg = grid.groupBy("event_type").agg(*aggs)
    pw = {
        p: F.col(f"c{p}").cast(_D19) * F.col(f"c{p}").cast(_D19)
        + F.col(f"s{p}").cast(_D19) * F.col(f"s{p}").cast(_D19)
        for p in PG_PERIODS
    }
    withp = agg.select(
        "event_type", *[pw[p].alias(f"p{p}") for p in PG_PERIODS]
    )
    tot = sum((F.col(f"p{p}") for p in PG_PERIODS[1:]), F.col(f"p{PG_PERIODS[0]}"))
    mic = F.lit(float(MICRO))
    # tot = 0 (an all-constant projection) would make every share
    # 0/0 NaN; define shares as 0 there instead (ADVICE r10), which
    # also pins entropy to 0 via the existing share>0 ln guards
    share = {
        p: F.when(
            tot > F.lit(0), F.col(f"p{p}").cast("double") / tot.cast("double")
        ).otherwise(F.lit(0.0))
        for p in PG_PERIODS
    }
    import math as _m

    h = sum(
        (
            -share[p]
            * F.when(share[p] > 0, F.log(share[p])).otherwise(F.lit(0.0))
            for p in PG_PERIODS[1:]
        ),
        -share[PG_PERIODS[0]]
        * F.when(share[PG_PERIODS[0]] > 0, F.log(share[PG_PERIODS[0]])).otherwise(
            F.lit(0.0)
        ),
    ) / F.lit(_m.log(float(len(PG_PERIODS))))
    return withp.select(
        "event_type",
        *[
            F.floor(share[p] * mic + F.lit(0.5)).cast("long").alias(f"share{p}_micro")
            for p in PG_PERIODS
        ],
        F.floor(h * mic + F.lit(0.5)).cast("long").alias("entropy_micro"),
    ).orderBy("event_type")


def _spectral_sql() -> str:
    import math as _m

    from cgtcalc_data_transformer_spark.operators.series8 import (
        _PG_COS,
        _PG_SIN,
        PG_PERIODS,
    )

    proj = []
    for p in PG_PERIODS:
        cos_list = ", ".join(str(v) for v in _PG_COS[p])
        sin_list = ", ".join(str(v) for v in _PG_SIN[p])
        proj.append(
            f"CAST(SUM(y * ([{cos_list}])[(d % {p}) + 1]) AS BIGINT) AS c{p}"
        )
        proj.append(
            f"CAST(SUM(y * ([{sin_list}])[(d % {p}) + 1]) AS BIGINT) AS s{p}"
        )
    pws = ",\n         ".join(
        f"CAST(CAST(c{p} AS DECIMAL(19,0)) * CAST(c{p} AS DECIMAL(19,0))"
        f" + CAST(s{p} AS DECIMAL(19,0)) * CAST(s{p} AS DECIMAL(19,0))"
        f" AS DECIMAL(38,0)) AS p{p}"
        for p in PG_PERIODS
    )
    tot = " + ".join(f"CAST(p{p} AS DOUBLE)" for p in PG_PERIODS)

    # share = 0 when total spectral power is 0 (all-constant
    # projection), mirroring the Spark twin's F.when guard
    def sh(p: int) -> str:
        return (
            f"(CASE WHEN ({tot}) > 0"
            f" THEN CAST(p{p} AS DOUBLE) / ({tot}) ELSE 0.0 END)"
        )

    shares = ",\n       ".join(
        f"CAST(floor({sh(p)} * {MICRO} + 0.5) AS BIGINT)"
        f" AS share{p}_micro"
        for p in PG_PERIODS
    )
    hterms = " + ".join(
        f"(-{sh(p)}"
        f" * (CASE WHEN {sh(p)} > 0"
        f" THEN ln({sh(p)}) ELSE 0.0 END))"
        for p in PG_PERIODS
    )
    ln_k = _m.log(float(len(PG_PERIODS)))
    body = ",\n         ".join(proj)
    return f"""
WITH {_GRID_SQL}, agg AS (
  SELECT event_type,
         {body}
  FROM grid GROUP BY event_type
), pw AS (
  SELECT event_type,
         {pws}
  FROM agg
)
SELECT event_type,
       {shares},
       CAST(floor(({hterms}) / {ln_k!r} * {MICRO} + 0.5) AS BIGINT) AS entropy_micro
FROM pw
ORDER BY event_type
"""


SPECTRAL_ENTROPY_SQL = _spectral_sql()


# ------------------------------------------------- Cohen's kappa
def weighted_kappa_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ (1960) and linear-weighted κ between the return flag
    of an order's FIRST and LAST line — chance-corrected agreement
    over the same 3×3 transition table Bowker tests for symmetry
    (bowker asks 'are disagreements directional'; κ asks 'is there
    more agreement than chance at all'). The first/last pick is the
    shared lexicographic BIGINT encode (stats9.bowker_symmetry).

    Exact integer arithmetic end-to-end: p_o, p_e and both weighted
    disagreement sums are integer-count ratios (Σ d·n_ij, Σ d·r_i·c_j
    with d = |i−j| — DECIMAL-routed margins product), divided once;
    outputs micro-quantized (the C/N ROUND-ties class).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            (F.col("l_linenumber") * 64 + F.col("l_quantity").cast("long")) * 4
            + F.when(F.col("l_returnflag") == "A", 0)
            .when(F.col("l_returnflag") == "N", 1)
            .otherwise(2)
        ).alias("key"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.min("key").alias("mn"),
        F.max("key").alias("mx"),
        F.count(F.lit(1)).alias("nl"),
    ).filter(F.col("nl") >= 2)
    table = per_order.groupBy(
        F.pmod(F.col("mn"), F.lit(4)).alias("i"),
        F.pmod(F.col("mx"), F.lit(4)).alias("j"),
    ).agg(F.count(F.lit(1)).alias("nij")).cache()
    rows_m = table.groupBy("i").agg(F.sum("nij").alias("r"))
    cols_m = table.groupBy("j").agg(F.sum("nij").alias("c"))
    tot = table.agg(F.sum("nij").alias("n"))
    diag = table.filter(F.col("i") == F.col("j")).agg(
        F.coalesce(F.sum("nij"), F.lit(0)).alias("agree")
    )
    wobs = table.agg(
        F.sum(F.abs(F.col("i") - F.col("j")) * F.col("nij")).alias("wo")
    )
    # fold the tiny |i−j| (≤ 2) into the r factor BEFORE the decimal
    # product — a D38→D19 downcast of r·c would throw at scale
    wexp = (
        rows_m.crossJoin(F.broadcast(cols_m))
        .agg(
            F.sum(
                (F.abs(F.col("i") - F.col("j")) * F.col("r")).cast(_D19)
                * F.col("c").cast(_D19)
            ).alias("we")
        )
    )
    chance = (
        rows_m.join(cols_m, F.col("i") == F.col("j"))
        .agg(F.sum(F.col("r").cast(_D19) * F.col("c").cast(_D19)).alias("rc"))
    )
    s = (
        tot.crossJoin(F.broadcast(diag))
        .crossJoin(F.broadcast(wobs))
        .crossJoin(F.broadcast(wexp))
        .crossJoin(F.broadcast(chance))
    )
    nd = F.col("n").cast("double")
    po = F.col("agree").cast("double") / nd
    pe = F.col("rc").cast("double") / (nd * nd)
    kappa = (po - pe) / (F.lit(1.0) - pe)
    kw = F.lit(1.0) - (F.col("wo").cast("double") / nd) / (
        F.col("we").cast("double") / (nd * nd)
    )
    mic = F.lit(float(MICRO))
    return s.select(
        "n",
        F.floor(po * mic + F.lit(0.5)).cast("long").alias("po_micro"),
        F.floor(pe * mic + F.lit(0.5)).cast("long").alias("pe_micro"),
        F.floor(kappa * mic + F.lit(0.5)).cast("long").alias("kappa_micro"),
        F.floor(kw * mic + F.lit(0.5)).cast("long").alias("kappa_w_micro"),
    )


WEIGHTED_KAPPA_SQL = f"""
WITH li AS (
  SELECT l_orderkey,
         (l_linenumber * 64 + CAST(l_quantity AS BIGINT)) * 4
         + CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS key
  FROM lineitem
), per_order AS (
  SELECT l_orderkey, MIN(key) AS mn, MAX(key) AS mx, COUNT(*) AS nl
  FROM li GROUP BY l_orderkey HAVING COUNT(*) >= 2
), tbl AS MATERIALIZED (
  SELECT mn % 4 AS i, mx % 4 AS j, COUNT(*) AS nij
  FROM per_order GROUP BY 1, 2
), rows_m AS (SELECT i, CAST(SUM(nij) AS BIGINT) AS r FROM tbl GROUP BY i),
cols_m AS (SELECT j, CAST(SUM(nij) AS BIGINT) AS c FROM tbl GROUP BY j),
agg AS (
  SELECT (SELECT CAST(SUM(nij) AS BIGINT) FROM tbl) AS n,
         (SELECT COALESCE(CAST(SUM(nij) AS BIGINT), 0) FROM tbl WHERE i = j) AS agree,
         (SELECT CAST(SUM(abs(i - j) * nij) AS BIGINT) FROM tbl) AS wo,
         (SELECT CAST(SUM(CAST(abs(i - j) * r AS DECIMAL(19,0))
                          * CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0))
          FROM rows_m CROSS JOIN cols_m) AS we,
         (SELECT CAST(SUM(CAST(r AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
                      AS DECIMAL(38,0))
          FROM rows_m JOIN cols_m ON i = j) AS rc
)
SELECT n,
       CAST(floor(CAST(agree AS DOUBLE) / n * {MICRO} + 0.5) AS BIGINT) AS po_micro,
       CAST(floor(CAST(rc AS DOUBLE) / (CAST(n AS DOUBLE) * n) * {MICRO} + 0.5) AS BIGINT) AS pe_micro,
       CAST(floor((CAST(agree AS DOUBLE) / n - CAST(rc AS DOUBLE) / (CAST(n AS DOUBLE) * n))
                  / (1.0 - CAST(rc AS DOUBLE) / (CAST(n AS DOUBLE) * n))
                  * {MICRO} + 0.5) AS BIGINT) AS kappa_micro,
       CAST(floor((1.0 - (CAST(wo AS DOUBLE) / n)
                         / (CAST(we AS DOUBLE) / (CAST(n AS DOUBLE) * n)))
                  * {MICRO} + 0.5) AS BIGINT) AS kappa_w_micro
FROM agg
"""


# --------------------------------- Anderson-Darling two-sample test
AD_CRIT_5PCT = 2.492  # Pettitt (1976) asymptotic two-sample 5% point


def anderson_darling_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling test on the F-vs-O quantity frame
    (Scholz-Stephens 1987, k = 2, discrete form): the tail-weighted
    member of the ECDF-test family — KS reads the worst gap, CvM the
    average, AD re-weights by 1/(H(1−H)) so tail departures count,
    which is where corpus-quality distribution shifts usually live.

    A² = Σ_i (1/nᵢ) Σ_{cells, B<N} (l/N)·(N·Mᵢ − nᵢ·B)²/(B·(N−B))
    over the 50-value pooled grid: B and Mᵢ are inclusive cumulative
    counts from the shared cumulative theta join; each cell term is
    an exact-integer rational in double, quantized to 1e-6 before
    the DECIMAL(38,0) sum. Gate vs the asymptotic 5% point (2.492).
    """
    vals = _quantity_value_counts(spark, sf_dir)
    cum = (
        vals.alias("p")
        .join(F.broadcast(vals.alias("q")), F.col("q.v") < F.col("p.v"), "left")
        .groupBy(
            F.col("p.v").alias("v"),
            F.col("p.ca").alias("ca"),
            F.col("p.cb").alias("cb"),
        )
        .agg(
            F.coalesce(F.sum("q.ca"), F.lit(0)).alias("cbel_a"),
            F.coalesce(F.sum("q.cb"), F.lit(0)).alias("cbel_b"),
        )
    )
    tots = vals.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = cum.crossJoin(F.broadcast(tots))
    ma = (F.col("cbel_a") + F.col("ca")).cast("double")
    mb = (F.col("cbel_b") + F.col("cb")).cast("double")
    bt = ma + mb
    nn = (F.col("na") + F.col("nb")).cast("double")
    ll = (F.col("ca") + F.col("cb")).cast("double")
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    ta = (
        (ll / nn)
        * (nn * ma - nad * bt)
        * (nn * ma - nad * bt)
        / (bt * (nn - bt))
        / nad
    )
    tb = (
        (ll / nn)
        * (nn * mb - nbd * bt)
        * (nn * mb - nbd * bt)
        / (bt * (nn - bt))
        / nbd
    )
    mic = F.lit(float(MICRO))
    termq = F.when(
        bt < nn, F.floor((ta + tb) * mic + F.lit(0.5)).cast("decimal(38,0)")
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    s = j.groupBy("na", "nb").agg(F.sum(termq).alias("a2q"))
    a2 = F.col("a2q").cast("double") / mic
    return s.select(
        "na",
        "nb",
        F.floor(a2 * mic + F.lit(0.5)).cast("long").alias("a2_micro"),
        (a2 > F.lit(AD_CRIT_5PCT)).alias("significant"),
    )


ANDERSON_DARLING_SQL = f"""
WITH {_VALS_SQL}, cum AS (
  SELECT p.v, p.ca, p.cb,
         CAST(COALESCE(SUM(q.ca), 0) AS BIGINT) AS cbel_a,
         CAST(COALESCE(SUM(q.cb), 0) AS BIGINT) AS cbel_b
  FROM vals p LEFT JOIN vals q ON q.v < p.v
  GROUP BY p.v, p.ca, p.cb
), tots AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM vals
), s AS (
  SELECT na, nb,
         CAST(SUM(CASE WHEN (cbel_a + ca + cbel_b + cb) < (na + nb) THEN
           CAST(floor((
             (CAST(ca + cb AS DOUBLE) / (na + nb))
             * ((na + nb) * CAST(cbel_a + ca AS DOUBLE) - na * CAST(cbel_a + ca + cbel_b + cb AS DOUBLE))
             * ((na + nb) * CAST(cbel_a + ca AS DOUBLE) - na * CAST(cbel_a + ca + cbel_b + cb AS DOUBLE))
             / (CAST(cbel_a + ca + cbel_b + cb AS DOUBLE) * ((na + nb) - CAST(cbel_a + ca + cbel_b + cb AS DOUBLE)))
             / na
             +
             (CAST(ca + cb AS DOUBLE) / (na + nb))
             * ((na + nb) * CAST(cbel_b + cb AS DOUBLE) - nb * CAST(cbel_a + ca + cbel_b + cb AS DOUBLE))
             * ((na + nb) * CAST(cbel_b + cb AS DOUBLE) - nb * CAST(cbel_a + ca + cbel_b + cb AS DOUBLE))
             / (CAST(cbel_a + ca + cbel_b + cb AS DOUBLE) * ((na + nb) - CAST(cbel_a + ca + cbel_b + cb AS DOUBLE)))
             / nb
           ) * {MICRO} + 0.5) AS DECIMAL(38,0))
         ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS a2q
  FROM cum CROSS JOIN tots
  GROUP BY na, nb
)
SELECT na, nb,
       CAST(floor(CAST(a2q AS DOUBLE) / {MICRO} * {MICRO} + 0.5) AS BIGINT) AS a2_micro,
       CAST(a2q AS DOUBLE) / {MICRO} > {AD_CRIT_5PCT} AS significant
FROM s
"""
