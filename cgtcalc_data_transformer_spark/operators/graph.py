"""Iterative graph algorithms as DataFrame loops.

PageRank over the customer-supplier bipartite graph derived from
lineitem⋈orders. Each iteration is one equality-join shuffle
(edges ⋈ ranks on the source node) plus one aggregation — the
standard O(iterations) shuffle pattern that scales linearly with the
edge count; no driver-side adjacency, no collect. The companion
iterative operator is the connected-components label propagation in
operators/dedup.py (dedup_clusters).

The reference has nothing iterative (a single sort pass,
`/root/reference/index.js:118`); this is pure engine extension.

Fixed iteration count (not convergence-tested) keeps the computation
a finite unrollable recurrence, so DuckDB replays it exactly with
chained CTEs and the result is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cgtcalc_data_transformer_spark.sources.tpch import load_table

DAMPING = 0.85
PR_ITERATIONS = 3
PR_TOP_K = 20


def mirror_edges(pairs: DataFrame, c1: str, c2: str) -> DataFrame:
    """Both orientations of an undirected pair set as (src, dst) in
    ONE pass over `pairs`: an explode of the two-struct array. The
    fwd.union(rev) spelling executes the pair lineage once per
    branch — Catalyst's self-union attribute dedup makes the two
    subtrees non-identical, so exchange reuse never recovers it (the
    local_clustering_topk lesson, r12 union audit)."""
    return pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(c1).alias("src"), F.col(c2).alias("dst")),
                F.struct(F.col(c2).alias("src"), F.col(c1).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected (src, dst) node pairs; node ids are
    prefixed ('C'/'S') because custkey and suppkey ranges overlap."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("C"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    return mirror_edges(pairs, "c", "s")


def pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 suppliers by PageRank after PR_ITERATIONS iterations.

    rank_{k+1}(v) = (1-d)/N + d * Σ_{u→v} rank_k(u)/outdeg(u)

    The undirected bipartite graph has no dangling nodes (every node
    has degree ≥ 1 by construction), so the recurrence needs no
    dangling-mass redistribution term.
    """
    # CACHED (r12 union audit): edges feeds deg, the edges_deg
    # attachment AND the node census below — three materializations
    # of the lineitem⋈orders+distinct lineage without it
    edges = _edges(spark, sf_dir).cache()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # one (src → outdeg) attachment reused by every iteration. CACHED:
    # an iterative plan references this frame once per iteration, and
    # without materialization each reference re-executes the whole
    # lineitem⋈orders+distinct lineage (measured 4x slower). Caching
    # the loop-invariant frame — plus localCheckpoint to truncate the
    # growing lineage at higher iteration counts — is the standard
    # shape for iterative DataFrame algorithms.
    edges_deg = edges.join(deg, "src").persist()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()  # scalar literal, like text_tfidf's N

    ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for _ in range(PR_ITERATIONS):
        contrib = edges_deg.join(
            ranks, edges_deg.src == ranks.node
        ).select(F.col("dst").alias("node"), (F.col("pr") / F.col("outdeg")).alias("c"))
        ranks = contrib.groupBy("node").agg(
            (F.lit((1.0 - DAMPING) / n_nodes) + F.lit(DAMPING) * F.sum("c")).alias(
                "pr"
            )
        )

    return (
        ranks.filter(F.col("node").startswith("S"))
        .select("node", F.round("pr", 6).alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("node"))
        .limit(PR_TOP_K)
    )


# DuckDB parses bare decimal literals as exact DECIMALs; Spark/Python
# compute in IEEE doubles. Every constant is routed through a DOUBLE
# cast and combined in the same operation order as the Python side,
# so both engines produce bit-identical ranks.
_ONE_MINUS_D = f"CAST({1.0 - DAMPING!r} AS DOUBLE)"
_D = f"CAST({DAMPING!r} AS DOUBLE)"


def _iter_sql(k: int) -> str:
    return f"""pr{k} AS (
  SELECT e.dst AS node,
         {_ONE_MINUS_D} / n.n_nodes + {_D} * SUM(p.pr / e.outdeg) AS pr
  FROM edges_deg e JOIN pr{k - 1} p ON p.node = e.src, n
  GROUP BY e.dst, n.n_nodes
)"""


PAGERANK_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT 'C' || o_custkey AS c, 'S' || l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
), deg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
), edges_deg AS (
  SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)
), n AS (
  SELECT COUNT(DISTINCT src) AS n_nodes FROM edges
), pr0 AS (
  SELECT src AS node, CAST(1 AS DOUBLE) / n.n_nodes AS pr
  FROM (SELECT DISTINCT src FROM edges), n
), {", ".join(_iter_sql(k) for k in range(1, PR_ITERATIONS + 1))}
SELECT node, ROUND(pr, 6) AS pagerank
FROM pr{PR_ITERATIONS}
WHERE node LIKE 'S%'
ORDER BY pagerank DESC, node ASC
LIMIT {PR_TOP_K}
"""


# ------------------------------------------------- triangle counting
def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (u < v) edge set of the part co-purchase graph
    (parts sharing an order are adjacent), cached — the shared edge
    build for triangle_count_parts and transitivity_parts. The
    self-join is order-local (within l_orderkey, bounded by
    lines-per-order); callers reuse the ONE cached frame for
    degrees, wedges, and the closing semi-join."""
    # r15 (guide §2.4 "remove shuffles outright"): the pair expansion
    # is ORDER-LOCAL, so it needs no join at all — one groupBy
    # collects each order's distinct part set (collect_set dedups the
    # per-order repeats the old pre-join .distinct() shuffle existed
    # for) and the canonical pairs expand in-task from the array
    # (positional i<j over the set, least/greatest canonicalization).
    # Drops the distinct Exchange + the self-join Exchange + the join
    # itself; only the groupBy and the cross-order distinct shuffles
    # remain. Arrays are bounded by lines-per-order, so the expansion
    # is O(1) per order at any scale. Same edge set: all unordered
    # {u,v} part pairs sharing an order, deduped.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    return (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps) - i - 1), "
                    "y -> struct(least(x, y) AS u, greatest(x, y) AS v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .cache()
    )


def node_degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) over a canonical (u < v) undirected edge set."""
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def oriented_wedges_centered(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Degree-oriented wedge enumeration (the "compact-forward"
    algorithm) with the wedge CENTER kept, shared by
    triangle_count_parts, transitivity_parts (via oriented_wedges)
    and local_clustering_topk (which needs all three triangle
    corners): orient every undirected edge from its lower-(degree,
    id) endpoint to the higher one, then enumerate wedges only
    between OUT-neighbors. Orientation bounds every out-degree by
    O(sqrt(2E)), so the wedge join is O(E^1.5) instead of
    sum(deg^2) — the difference between feasible and not on a
    power-law co-purchase graph. Returns (s, x, y) open wedges
    (x < y, centered at s); closing them against `edges` counts each
    triangle exactly once, from its unique minimum-(degree, id)
    corner s."""
    oriented = _oriented(edges, deg)
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    return (
        w1.join(w2, F.col("w1.s") == F.col("w2.s"))
        .filter(F.col("w1.d") < F.col("w2.d"))
        .select(
            F.col("w1.s").alias("s"),
            F.col("w1.d").alias("x"),
            F.col("w2.d").alias("y"),
        )
    )


def oriented_wedges(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """(x, y) open wedges — oriented_wedges_centered minus the center
    column, the shape triangle_count_parts / transitivity_parts
    consume (their closing semi-join only needs the endpoints)."""
    return oriented_wedges_centered(edges, deg).select("x", "y")


def _oriented(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Degree-oriented edges (s, d): every undirected edge pointed
    from its lower-(degree, id) endpoint to the higher one (the
    compact-forward orientation — see oriented_wedges_centered)."""
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    return (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
            .alias("e")
        )
        .select("e.s", "e.d")
    )


def oriented_out_adjacency(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """(s, nbrs) out-neighbor ARRAYS of the degree-oriented graph,
    cached — the r15 triangle machinery (guide §2.3/§2.4 "shuffle
    fewer bytes / remove shuffles outright").

    The r14 shape materialized every open wedge as a ROW (O(E^1.5)
    rows through a 2-column exchange) and closed them with a
    sort-merge semi-join against the edge set — at sf0.1 that is
    ~10M wedge rows shuffled and sorted per query. Folding the
    out-neighborhood into ONE array per node keeps the same
    information in |V| rows (total payload |E| ids, each oriented
    edge appears in exactly one array); triangles close by
    intersecting two arrays per EDGE (array_intersect, JVM hash-set
    per row) instead of shuffling wedge rows. Orientation still
    bounds every array by O(sqrt(2E)), so no single row explodes —
    the same compact-forward guarantee, carried by the data layout
    instead of a row explosion.

    Bounded within-query materialization: |V| rows, |E| total
    elements — strictly smaller than the cached edge frame feeding
    it; built and dropped inside one query invocation."""
    return (
        _oriented(edges, deg)
        .groupBy("s")
        .agg(F.collect_list("d").alias("nbrs"))
        .cache()
    )


def triangle_commons(adj: DataFrame) -> DataFrame:
    """One row per degree-oriented edge (s, d) with the array of
    common out-neighbors N+(s) ∩ N+(d). Each triangle of the
    undirected graph appears exactly once, as (s, d, w): its unique
    acyclic orientation s→d, s→w, d→w has one source s whose two
    out-edges close — w ∈ N+(s)∩N+(d) holds only for the (s, d)
    edge of that orientation (w ∉ N+(sink); checked against the
    id-ordered DuckDB oracle enumeration).

    The oriented edge stream is re-derived by EXPLODING the cached
    adjacency (no second pass over the edge build), which also
    carries N+(s) for free — one equality join on d attaches N+(d),
    and nodes without out-neighbors drop from that inner join
    because their intersections are empty anyway."""
    st = adj.select(
        "s", F.col("nbrs").alias("nbrs_s"), F.explode("nbrs").alias("d")
    )
    return st.join(
        adj.select(F.col("s").alias("d"), F.col("nbrs").alias("nbrs_d")), "d"
    ).select(
        "s", "d", F.array_intersect("nbrs_s", "nbrs_d").alias("common")
    )


def triangle_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the part co-purchase graph (parts sharing an
    order are adjacent): n_nodes / n_edges / n_triangles.

    Scale shape — degree-oriented wedge enumeration (the
    "compact-forward" algorithm): orient every undirected edge from
    its lower-(degree, id) endpoint to the higher one, enumerate
    wedges only between OUT-neighbors, and close them with one
    semi-join against the canonical edge set. Orientation bounds
    every out-degree by O(sqrt(2E)), so the wedge join is O(E^1.5)
    instead of sum(deg^2) — the difference between feasible and not
    on a power-law co-purchase graph (a hub part in every order
    would otherwise wedge quadratically). Each triangle is counted
    exactly once, from its unique minimum-(degree, id) corner. All
    joins are equality joins; the edge build is order-local
    (self-join within l_orderkey, bounded by lines-per-order).

    The DuckDB oracle closes a<b<c id-ordered paths directly —
    a different enumeration of the same invariant, so the match
    proves the oriented rewrite counts every triangle once.

    r15: wedges are no longer materialized as rows — the out-
    neighborhoods fold into per-node arrays (oriented_out_adjacency)
    and each oriented edge counts |N+(s) ∩ N+(d)| common neighbors
    in one array_intersect; the O(E^1.5) wedge exchange and its
    closing sort-merge semi-join are gone (guide §2.3/§2.4; plan
    pair plans/r15/triangle_count_parts_{before,after}.txt).
    """
    edges = copurchase_edges(spark, sf_dir)
    # cached: feeds the two orientation joins inside the adjacency
    # build AND the n_nodes aggregate (V rows — value-domain bounded)
    deg = node_degrees(edges).cache()
    adj = oriented_out_adjacency(edges, deg)
    closed = triangle_commons(adj)
    # counts stay lazy 1-row aggregates (no driver-side .count() at
    # plan build — the whole operator is ONE submitted plan)
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        closed.agg(
            F.coalesce(
                F.sum(F.size("common").cast("long")), F.lit(0).cast("long")
            ).alias("n_triangles")
        )
        .crossJoin(F.broadcast(n_nodes))
        .crossJoin(F.broadcast(n_edges))
        .select("n_nodes", "n_edges", "n_triangles")
    )


TRIANGLE_SQL = """
WITH lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), nodes AS (
  SELECT u AS node FROM edges UNION SELECT v FROM edges
)
SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT COUNT(*)
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
"""


# ------------------------------------------------ k-core decomposition
KCORE_K = 3
KCORE_ROUNDS = 8  # peeling rounds; a fixpoint reached earlier is stable


def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes of the KCORE_K-core of the part co-purchase graph with
    their within-core degree — iterative peeling: delete every node
    with degree < k, recompute, repeat.

    Spark shape: KCORE_ROUNDS peeling rounds, each one map-side-
    combining degree aggregation plus two semi-joins of the adjacency
    against the survivor set, with the round's result materialized
    via localCheckpoint. The checkpoint is LOAD-BEARING, not an
    optimization: each round references the previous adjacency twice
    (degree agg + filter base), so a fully lazy unroll makes the
    logical tree double per round — measured 42 s of driver-side
    ANALYSIS and an execution that never finished at sf0.001 for 8
    rounds; truncating lineage per round makes both linear. On a
    real cluster this is `checkpoint()` to durable storage — the
    canonical iterative-DataFrame discipline (same family as the
    plan-build-time loops in pagerank/kmeans).

    No driver-side count() convergence probe: extra rounds after the
    fixpoint are exact no-ops, so the FIXED round count equals
    run-to-convergence whenever the graph converges within it — and
    equals the oracle's identical R-round recurrence even when it
    doesn't.

    At 100 TB: rounds are O(E) equality shuffles; the survivor sets
    shrink monotonically, so later rounds get cheaper.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    canon = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    # one pass over canon (mirror_edges), materialized once
    adj = mirror_edges(canon, "u", "v").localCheckpoint()
    for _ in range(KCORE_ROUNDS):
        deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
        keep = deg.filter(F.col("c") >= KCORE_K).select(F.col("src").alias("node"))
        adj = (
            adj.join(keep, adj.src == keep.node, "left_semi")
            .join(keep, F.col("dst") == keep.node, "left_semi")
            .localCheckpoint()
        )
    return (
        adj.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("core_deg"))
        .orderBy("node")
    )


def _kcore_sql() -> str:
    sql = f"""
WITH lp AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), canon AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), adj0 AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM canon
  UNION ALL
  SELECT v AS src, u AS dst FROM canon
)"""
    prev = "adj0"
    for r in range(1, KCORE_ROUNDS + 1):
        sql += f"""
, keep{r} AS (
  SELECT src AS node FROM {prev} GROUP BY src HAVING COUNT(*) >= {KCORE_K}
), adj{r} AS MATERIALIZED (
  SELECT a.src, a.dst FROM {prev} a
  JOIN keep{r} s ON a.src = s.node
  JOIN keep{r} d ON a.dst = d.node
)"""
        prev = f"adj{r}"
    sql += f"""
SELECT src AS node, COUNT(*) AS core_deg
FROM {prev}
GROUP BY src
ORDER BY node
"""
    return sql


KCORE_SQL = _kcore_sql()


# ------------------------------------------------ multi-source BFS
BFS_ROUNDS = 4
BFS_SEED_MAX_SUPPKEY = 2  # seeds: suppliers S1, S2


def bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance profile of a multi-source BFS over the
    customer-supplier bipartite graph: per hop (0..BFS_ROUNDS), how
    many nodes are first reached at that hop, plus one `hop = -1` row
    counting nodes still unreached — the reachability / blast-radius
    primitive (lineage impact analysis, contamination spread,
    influence frontiers).

    Spark shape: classic frontier expansion. Each round is ONE
    equality-join shuffle (edges ⨝ frontier on src) + one min-hop
    aggregation; the visited set is re-aggregated from the union —
    at most one row per (node) survives per round. Rounds reference
    the previous state twice (frontier filter + union base), so each
    round localCheckpoints — the same load-bearing lineage-truncation
    discipline as kcore_parts above.

    Engine-exactness: hop counts are pure integers. The oracle
    replays the identical R-round min-hop recurrence with
    MATERIALIZED CTEs (default inlining re-opens the parquet 2^R
    times).

    At 100 TB: frontier expansion is the textbook BSP/Pregel BFS —
    each round O(E_frontier) shuffle, broadcast-able seed set, no
    driver-side adjacency, no collect.
    """
    edges = _edges(spark, sf_dir).localCheckpoint()
    n_nodes = edges.select("src").distinct().count()
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= BFS_SEED_MAX_SUPPKEY)
        .select(F.concat(F.lit("S"), F.col("s_suppkey")).alias("node"))
    )
    dist = seeds.withColumn("hop", F.lit(0)).localCheckpoint()
    for r in range(1, BFS_ROUNDS + 1):
        frontier = dist.filter(F.col("hop") == r - 1).select("node")
        expanded = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"), F.lit(r).alias("hop"))
        )
        dist = (
            dist.unionByName(expanded)
            .groupBy("node")
            .agg(F.min("hop").alias("hop"))
            .localCheckpoint()
        )
    reached = dist.groupBy("hop").agg(F.count(F.lit(1)).alias("n_nodes"))
    unreached = reached.agg(
        (F.lit(n_nodes) - F.sum("n_nodes")).alias("n_nodes")
    ).select(F.lit(-1).alias("hop"), "n_nodes")
    return reached.unionByName(unreached).orderBy("hop")


def _bfs_sql() -> str:
    sql = f"""
WITH li AS MATERIALIZED (
  SELECT DISTINCT 'C' || o.o_custkey AS c, 'S' || l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), edges AS MATERIALIZED (
  SELECT c AS src, s AS dst FROM li
  UNION ALL
  SELECT s AS src, c AS dst FROM li
), dist0 AS MATERIALIZED (
  SELECT 'S' || s_suppkey AS node, 0 AS hop
  FROM supplier WHERE s_suppkey <= {BFS_SEED_MAX_SUPPKEY}
)"""
    prev = "dist0"
    for r in range(1, BFS_ROUNDS + 1):
        sql += f"""
, dist{r} AS MATERIALIZED (
  SELECT node, MIN(hop) AS hop FROM (
    SELECT node, hop FROM {prev}
    UNION ALL
    SELECT e.dst AS node, {r} AS hop
    FROM edges e JOIN {prev} f ON e.src = f.node AND f.hop = {r - 1}
  ) GROUP BY node
)"""
        prev = f"dist{r}"
    sql += f"""
, reached AS (
  SELECT hop, COUNT(*) AS n_nodes FROM {prev} GROUP BY hop
), total AS (
  SELECT COUNT(DISTINCT src) AS n FROM edges
)
SELECT hop, n_nodes FROM reached
UNION ALL
SELECT -1 AS hop,
       total.n - (SELECT CAST(SUM(n_nodes) AS BIGINT) FROM reached) AS n_nodes
FROM total
ORDER BY hop
"""
    return sql


BFS_REACH_SQL = _bfs_sql()

# --------------------------------------------- HITS hubs/authorities
HITS_ITERS = 3
HITS_S = 10**9   # score quantization after each normalization


def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) over the customer→supplier purchase
    graph: customers are hubs (they point at suppliers), suppliers
    are authorities; after HITS_ITERS mutual-reinforcement rounds the
    authority scores rank suppliers by breadth-of-demand rather than
    raw order count — the PageRank companion that distinguishes "many
    buyers" from "many IMPORTANT buyers". Output: all suppliers with
    their final authority score.

    Each iteration is two equality joins over the edge list plus two
    single-row norm aggregations — identical shuffle complexity to
    pagerank_suppliers. Determinism through the float normalization:
    after every normalize, scores are re-quantized
    floor(x·1e9 + 0.5)::BIGINT, so the values entering every
    subsequent sum are exact integers and the norm itself is sqrt of
    an exact decimal(38,0) sum of squares (h² can pass 2^63 before
    normalization — decimal, not BIGINT). The per-iteration
    localCheckpoint keeps the doubly-referenced frame (norm + divide)
    from doubling the logical plan per round; the oracle unrolls the
    same rounds as materialized CTEs.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .cache()
    )

    def normalize(frame: DataFrame, key: str) -> DataFrame:
        sq = F.col("x").cast("double") * F.col("x").cast("double")
        norm = frame.agg(
            F.sqrt(
                F.sum(sq.cast("decimal(38,0)")).cast("double")
            ).alias("nrm")
        )
        return (
            frame.crossJoin(F.broadcast(norm))
            .select(
                key,
                F.floor(
                    F.col("x").cast("double")
                    / F.col("nrm")
                    * F.lit(float(HITS_S))
                    + F.lit(0.5)
                ).cast("long").alias("x"),
            )
            .localCheckpoint(eager=False)
        )

    hub = edges.select("c").distinct().select(
        "c", F.lit(HITS_S).cast("long").alias("x")
    )
    auth = None
    for _ in range(HITS_ITERS):
        auth = normalize(
            edges.join(hub, "c").groupBy("s").agg(F.sum("x").alias("x")), "s"
        )
        hub = normalize(
            edges.join(auth, "s").groupBy("c").agg(F.sum("x").alias("x")), "c"
        )
    return auth.select(
        F.col("s").alias("s_suppkey"),
        F.col("x").alias("authority_q"),
        (F.col("x") / F.lit(float(HITS_S))).alias("authority"),
    ).orderBy("s_suppkey")


def _hits_sql() -> str:
    steps = []
    prev_hub = "hub0"
    for k in range(1, HITS_ITERS + 1):
        steps.append(f"""
, araw{k} AS MATERIALIZED (
  SELECT s, CAST(SUM({prev_hub}.x) AS BIGINT) AS x
  FROM edges JOIN {prev_hub} ON edges.c = {prev_hub}.c
  GROUP BY s
), anorm{k} AS (
  SELECT sqrt(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,0))) AS DOUBLE)) AS nrm
  FROM araw{k}
), auth{k} AS MATERIALIZED (
  SELECT s, CAST(floor(CAST(x AS DOUBLE) / nrm * {HITS_S} + 0.5) AS BIGINT) AS x
  FROM araw{k}, anorm{k}
), hraw{k} AS MATERIALIZED (
  SELECT c, CAST(SUM(auth{k}.x) AS BIGINT) AS x
  FROM edges JOIN auth{k} ON edges.s = auth{k}.s
  GROUP BY c
), hnorm{k} AS (
  SELECT sqrt(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,0))) AS DOUBLE)) AS nrm
  FROM hraw{k}
), hub{k} AS MATERIALIZED (
  SELECT c, CAST(floor(CAST(x AS DOUBLE) / nrm * {HITS_S} + 0.5) AS BIGINT) AS x
  FROM hraw{k}, hnorm{k}
)""")
        prev_hub = f"hub{k}"
    return f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), hub0 AS (
  SELECT DISTINCT c, CAST({HITS_S} AS BIGINT) AS x FROM edges
){''.join(steps)}
SELECT s AS s_suppkey, x AS authority_q, x / {HITS_S}.0 AS authority
FROM auth{HITS_ITERS}
ORDER BY s_suppkey
"""


HITS_SQL = _hits_sql()


# ------------------------------------------- Adamic-Adar link scores
AA_S = 10**9        # per-wedge 1/ln(deg) quantization
AA_MIN_ORDERS = 2   # repeat-business edge: >= 2 distinct orders
AA_MIN_COMMON = 2   # report pairs sharing >= 2 repeat customers


def adamic_adar_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction between suppliers (Adamic & Adar
    2003): candidate supplier pairs scored by Σ_c 1/ln(deg(c)) over
    shared REPEAT customers — a rare shared customer (low degree)
    says more about supplier affinity than a promiscuous one, which
    is exactly what the inverse-log weight encodes.

    The graph is deliberately the REPEAT-business projection
    (customer-supplier pairs with ≥ {AA_MIN_ORDERS} distinct orders):
    the raw bipartite graph is dense (every supplier pair shares ~36
    customers at sf0.1 — all-pairs scores, meaningless and Σdeg²-
    explosive), while repeat edges are ~2% of edges and make wedge
    volume Σ_c deg(c)² thousands, not tens of millions. Hub
    suppression by construction — the documented production recipe
    for AA at scale. Per-wedge weights are integer literals-by-
    quantization (floor(1e9/ln(deg)+0.5)), so scores are exact sums.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    repeat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.countDistinct("l_orderkey").alias("nord"))
        .filter(F.col("nord") >= AA_MIN_ORDERS)
        .select("c", "s")
        # CACHED (r14 plan audit): deg + the two self-join branches of
        # mids reference this frame 4x, and the countDistinct expand
        # defeats exchange reuse — uncached, the plan scans lineitem/
        # orders 4x each (plans/r14/adamic_adar_links_before.txt).
        # Materialize the ~2% repeat projection once (guide §2.4).
        .cache()
    )
    deg = repeat.groupBy("c").agg(F.count(F.lit(1)).alias("deg"))
    w = F.floor(
        F.lit(float(AA_S)) / F.log(F.col("deg").cast("double")) + F.lit(0.5)
    ).cast("long")
    mids = repeat.join(deg.filter(F.col("deg") >= 2), "c").select(
        "c", "s", w.alias("w")
    )
    pairs = (
        mids.alias("a")
        .join(
            mids.alias("b"),
            (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(
            F.count(F.lit(1)).alias("common_customers"),
            F.sum("a.w").alias("aa_q"),
        )
        .filter(F.col("common_customers") >= AA_MIN_COMMON)
    )
    return pairs.select(
        "s1",
        "s2",
        "common_customers",
        (F.col("aa_q") / F.lit(float(AA_S))).alias("aa_score"),
    ).orderBy("s1", "s2")


ADAMIC_ADAR_SQL = f"""
WITH repeat_e AS (
  SELECT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, l_suppkey
  HAVING COUNT(DISTINCT l_orderkey) >= {AA_MIN_ORDERS}
), deg AS (
  SELECT c, COUNT(*) AS deg FROM repeat_e GROUP BY c
), mids AS (
  SELECT repeat_e.c, s,
         CAST(floor({AA_S} / ln(CAST(deg AS DOUBLE)) + 0.5) AS BIGINT) AS w
  FROM repeat_e JOIN deg ON repeat_e.c = deg.c
  WHERE deg >= 2
)
SELECT a.s AS s1, b.s AS s2,
       COUNT(*) AS common_customers,
       CAST(SUM(a.w) AS BIGINT) / {AA_S}.0 AS aa_score
FROM mids a JOIN mids b ON a.c = b.c AND a.s < b.s
GROUP BY a.s, b.s
HAVING COUNT(*) >= {AA_MIN_COMMON}
ORDER BY s1, s2
"""


# ----------------------------------------------- degree assortativity
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the customer-supplier graph: the
    Pearson correlation of endpoint degrees over all directed edge
    occurrences (Newman 2002) — do high-degree nodes attach to each
    other (r > 0, social-style) or to leaves (r < 0, hub-and-spoke)?
    The one number that predicts how the graph fragments under node
    loss and how badly a partitioner's cut will skew.

    _edges already carries both orientations, so one degree
    aggregation + one join + exact moment sums give r in a single
    closed form; nothing quadratic, no windows.

    Overflow routing (VERDICT r8 item 3): the moment sums are
    Σ_v d_v²- and Σ_v d_v³-scale — one hub with degree ~2·10⁶
    contributes ~8·10¹⁸ to sxx from a single vertex, past 2^63 on
    real power-law graphs well below 100 TB. Degrees are cast to
    DECIMAL(19,0) before the multiply and summed in DECIMAL(38,0)
    (exact, order-insensitive) in BOTH engines — Spark ANSI would
    throw loudly, but DuckDB silently widens to HUGEINT, masking
    the defect until the Spark side trips.
    """
    # CACHED (r12 union audit): edges is referenced three times below
    # (the stream side plus both degree attachments) and each
    # uncached reference re-executed the lineitem⋈orders+distinct
    # lineage — measured as the 3.2 s outlier of the bounded-rollup
    # family at sf0.1.
    edges = _edges(spark, sf_dir).cache()
    d19 = "decimal(19,0)"
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    j = (
        edges.join(deg.withColumnRenamed("src", "u"), F.col("src") == F.col("u"))
        .select("dst", F.col("d").alias("dx"))
        .join(deg.withColumnRenamed("src", "w"), F.col("dst") == F.col("w"))
        .select("dx", F.col("d").alias("dy"))
    )
    s = j.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("dx").cast(d19)).alias("sx"),
        F.sum(F.col("dx").cast(d19) * F.col("dx").cast(d19)).alias("sxx"),
        F.sum(F.col("dx").cast(d19) * F.col("dy").cast(d19)).alias("sxy"),
    )
    md = F.col("m").cast("double")
    num = md * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    den = md * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    return s.select(
        F.col("m").alias("n_edge_ends"),
        F.round(num / den, 6).alias("assortativity"),
    )


DEGREE_ASSORTATIVITY_SQL = """
WITH pairs AS (
  SELECT DISTINCT 'C' || o_custkey AS c, 'S' || l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
), deg AS (
  SELECT src, COUNT(*) AS d FROM edges GROUP BY src
), j AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM edges
  JOIN deg du ON du.src = edges.src
  JOIN deg dv ON dv.src = edges.dst
), s AS (
  SELECT COUNT(*) AS m,
         CAST(SUM(CAST(dx AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dx AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sxy
  FROM j
)
SELECT m AS n_edge_ends,
       ROUND((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)
             / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS assortativity
FROM s
"""


# ------------------------------------------- harmonic centrality
def harmonic_centrality_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality on the nation trade graph (nations are
    adjacent when any customer in one ordered from any supplier in
    the other): H(v) = Σ_u 1/d(v,u) with unreachable contributing 0 —
    the centrality that stays defined on disconnected graphs, ranking
    which nations sit closest to all trade.

    The node domain is bounded (|nations|), so exact multi-source
    BFS is three unrolled self-joins of a <=|nations|²-row distance
    frame; the heavy lifting is the ONE distinct-pair aggregation
    that collapses the lineitem⋈orders⋈customer⋈supplier trade
    volume to nation pairs.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("c_nationkey").alias("a"),
            F.col("s_nationkey").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # one mirror pass + CACHE (r12 union audit): edges is ≤|nations|²
    # rows but its lineage is the 4-table trade join; the three BFS
    # hops reference it five times
    edges = (
        mirror_edges(pairs, "a", "b")
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
        .cache()
    )
    d1 = edges.select("a", "b", F.lit(1).alias("d"))
    two_hop = (
        d1.alias("x")
        .join(edges.alias("e"), F.col("e.a") == F.col("x.b"))
        .select(F.col("x.a").alias("a"), F.col("e.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .join(d1.select("a", "b"), ["a", "b"], "left_anti")
        .select("a", "b", F.lit(2).alias("d"))
    )
    d12 = d1.unionByName(two_hop)
    three_hop = (
        d12.filter(F.col("d") == 2).alias("x")
        .join(edges.alias("e"), F.col("e.a") == F.col("x.b"))
        .select(F.col("x.a").alias("a"), F.col("e.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .join(d12.select("a", "b"), ["a", "b"], "left_anti")
        .select("a", "b", F.lit(3).alias("d"))
    )
    dist = d12.unionByName(three_hop)
    h = dist.groupBy("a").agg(
        F.sum((F.col("d") == 1).cast("long")).alias("n1"),
        F.sum((F.col("d") == 2).cast("long")).alias("n2"),
        F.sum((F.col("d") == 3).cast("long")).alias("n3"),
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("a"), F.col("n_name").alias("nation")
    )
    hc = (
        F.col("n1").cast("double")
        + F.col("n2").cast("double") / F.lit(2.0)
        + F.col("n3").cast("double") / F.lit(3.0)
    )
    return (
        h.join(F.broadcast(nation), "a")
        .select(
            "nation",
            "n1",
            "n2",
            "n3",
            F.round(hc, 6).alias("harmonic"),
        )
        .orderBy("nation")
    )


HARMONIC_CENTRALITY_SQL = """
WITH pairs AS (
  SELECT DISTINCT c_nationkey AS a, s_nationkey AS b
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
), edges AS MATERIALIZED (
  SELECT a, b FROM pairs
  UNION
  SELECT b AS a, a AS b FROM pairs
), d1 AS MATERIALIZED (
  SELECT a, b, 1 AS d FROM edges
), two_hop AS MATERIALIZED (
  SELECT DISTINCT x.a, e.b, 2 AS d
  FROM d1 x JOIN edges e ON e.a = x.b
  WHERE x.a <> e.b
    AND NOT EXISTS (SELECT 1 FROM d1 WHERE d1.a = x.a AND d1.b = e.b)
), d12 AS MATERIALIZED (
  SELECT * FROM d1 UNION ALL SELECT * FROM two_hop
), three_hop AS (
  SELECT DISTINCT x.a, e.b, 3 AS d
  FROM d12 x JOIN edges e ON e.a = x.b
  WHERE x.d = 2 AND x.a <> e.b
    AND NOT EXISTS (SELECT 1 FROM d12 WHERE d12.a = x.a AND d12.b = e.b)
), dist AS (
  SELECT * FROM d12 UNION ALL SELECT * FROM three_hop
), h AS (
  SELECT a,
         CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM dist GROUP BY a
)
SELECT n_name AS nation, n1, n2, n3,
       ROUND(CAST(n1 AS DOUBLE) + n2 / 2.0 + n3 / 3.0, 6) AS harmonic
FROM h JOIN nation ON n_nationkey = a
ORDER BY nation
"""


# ------------------------------------------------ modularity of regions
def modularity_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the REGION partition over the nation
    trade graph: do trading nations cluster within their geographic
    regions — Q = Σ_c (e_c/m − (d_c/2m)²), the community-quality
    objective every Louvain-style pipeline optimizes, here evaluated
    exactly for the natural partition.

    One distinct-pair aggregation collapses the trade volume to the
    |nations|²-bounded edge set; intra-community edge counts and
    degree sums are exact BIGINTs over that bounded frame.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    na = nation.select(
        F.col("n_nationkey").alias("a"), F.col("n_regionkey").alias("ra")
    )
    nb = nation.select(
        F.col("n_nationkey").alias("b"), F.col("n_regionkey").alias("rb")
    )
    # ONE pass to the |regions|²-bounded grid; m/intra/degree sums are
    # all reductions of this tiny frame (recomputing `tagged` for each
    # aggregate re-runs the 4-way join — measured 3x wall on both
    # engines before this collapse)
    grid = (
        pairs.join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .groupBy("ra", "rb")
        .agg(F.count(F.lit(1)).alias("c"))
        # CACHED (r12 union audit): the "ONE pass" promise above only
        # holds if this |regions|²-row frame is materialized — the
        # m/intra reduction and BOTH degs branches reference it
        .cache()
    )
    m_intra = grid.agg(
        F.sum("c").alias("m"),
        F.sum(
            F.when(F.col("ra") == F.col("rb"), F.col("c")).otherwise(0)
        ).alias("intra"),
    )
    degs = (
        grid.select(F.col("ra").alias("r"), "c")
        .unionByName(grid.select(F.col("rb").alias("r"), "c"))
        .groupBy("r")
        .agg(F.sum("c").alias("d"))
    )
    qsum = degs.crossJoin(F.broadcast(m_intra)).agg(
        F.sum(
            F.col("d").cast("double") * F.col("d").cast("double")
            / (
                F.lit(4.0)
                * F.col("m").cast("double")
                * F.col("m").cast("double")
            )
        ).alias("exp_term"),
        F.max("m").alias("m"),
        F.max("intra").alias("intra"),
    )
    q = F.col("intra").cast("double") / F.col("m").cast("double") - F.col(
        "exp_term"
    )
    return qsum.select(
        F.col("m").alias("n_edges"),
        F.col("intra").alias("intra_edges"),
        F.round(q, 6).alias("modularity_q"),
    )


MODULARITY_SQL = """
WITH pairs AS (
  SELECT DISTINCT LEAST(c_nationkey, s_nationkey) AS a,
                  GREATEST(c_nationkey, s_nationkey) AS b
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
), grid AS MATERIALIZED (
  SELECT na.n_regionkey AS ra, nb.n_regionkey AS rb, COUNT(*) AS c
  FROM pairs
  JOIN nation na ON na.n_nationkey = a
  JOIN nation nb ON nb.n_nationkey = b
  GROUP BY 1, 2
), mi AS (
  SELECT CAST(SUM(c) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN ra = rb THEN c ELSE 0 END) AS BIGINT) AS intra
  FROM grid
), degs AS (
  SELECT r, CAST(SUM(c) AS BIGINT) AS d
  FROM (SELECT ra AS r, c FROM grid UNION ALL SELECT rb AS r, c FROM grid)
  GROUP BY r
), q AS (
  SELECT MAX(m) AS m, MAX(intra) AS intra,
         SUM(CAST(d AS DOUBLE) * d / (4.0 * CAST(m AS DOUBLE) * m)) AS exp_term
  FROM degs CROSS JOIN mi
)
SELECT m AS n_edges, intra AS intra_edges,
       ROUND(CAST(intra AS DOUBLE) / m - exp_term, 6) AS modularity_q
FROM q
"""


# ------------------------------------------ Jaccard link prediction
JL_MICRO = 10**6


def jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-coefficient link prediction between suppliers over the
    repeat-business bipartite graph — the set-overlap companion to
    adamic_adar_links (same candidate wedges, different weighting):
    score(s1, s2) = |N(s1) ∩ N(s2)| / |N(s1) ∪ N(s2)| over repeat-
    customer neighbor sets. Jaccard is the baseline every link-
    prediction paper reports first; AA then upgrades it by rarity-
    weighting the shared neighbors.

    Same scale shape as AA: the repeat-edge projection (≥
    {AA_MIN_ORDERS} distinct orders) keeps wedge volume Σ deg(c)²
    linear-ish, common-neighbor counts come from one equality
    self-join on the customer, and degrees join back on supplier
    keys. The score is an exact count rational, micro-quantized;
    union size by inclusion-exclusion, never a set materialization.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    repeat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.countDistinct("l_orderkey").alias("nord"))
        .filter(F.col("nord") >= AA_MIN_ORDERS)
        .select("c", "s")
        # CACHED (r14 plan audit): degs, degc and the two self-join
        # branches of mids reference this frame 6x; the countDistinct
        # expand defeats exchange reuse, so uncached the plan scans
        # lineitem/orders 6x each
        # (plans/r14/jaccard_link_prediction_before.txt). Materialize
        # the repeat projection once (guide §2.4).
        .cache()
    )
    degs = repeat.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    degc = repeat.groupBy("c").agg(F.count(F.lit(1)).alias("cdeg"))
    mids = repeat.join(degc.filter(F.col("cdeg") >= 2), "c").select("c", "s")
    pairs = (
        mids.alias("a")
        .join(
            mids.alias("b"),
            (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count(F.lit(1)).alias("common_customers"))
        .filter(F.col("common_customers") >= AA_MIN_COMMON)
    )
    d1 = degs.select(F.col("s").alias("s1"), F.col("deg").alias("deg1"))
    d2 = degs.select(F.col("s").alias("s2"), F.col("deg").alias("deg2"))
    scored = pairs.join(d1, "s1").join(d2, "s2")
    union = (
        F.col("deg1") + F.col("deg2") - F.col("common_customers")
    ).cast("double")
    jac = F.col("common_customers").cast("double") / union
    return scored.select(
        "s1",
        "s2",
        "common_customers",
        "deg1",
        "deg2",
        F.floor(jac * F.lit(float(JL_MICRO)) + F.lit(0.5))
        .cast("long")
        .alias("jaccard_micro"),
    ).orderBy("s1", "s2")


JACCARD_LINKS_SQL = f"""
WITH repeat_e AS (
  SELECT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, l_suppkey
  HAVING COUNT(DISTINCT l_orderkey) >= {AA_MIN_ORDERS}
), degs AS (
  SELECT s, COUNT(*) AS deg FROM repeat_e GROUP BY s
), degc AS (
  SELECT c, COUNT(*) AS cdeg FROM repeat_e GROUP BY c
), mids AS (
  SELECT repeat_e.c, s FROM repeat_e JOIN degc ON repeat_e.c = degc.c
  WHERE cdeg >= 2
), pairs AS (
  SELECT a.s AS s1, b.s AS s2, COUNT(*) AS common_customers
  FROM mids a JOIN mids b ON a.c = b.c AND a.s < b.s
  GROUP BY a.s, b.s
  HAVING COUNT(*) >= {AA_MIN_COMMON}
)
SELECT s1, s2, common_customers, d1.deg AS deg1, d2.deg AS deg2,
       CAST(floor(CAST(common_customers AS DOUBLE)
                  / CAST(d1.deg + d2.deg - common_customers AS DOUBLE)
                  * {JL_MICRO} + 0.5) AS BIGINT) AS jaccard_micro
FROM pairs JOIN degs d1 ON d1.s = s1 JOIN degs d2 ON d2.s = s2
ORDER BY s1, s2
"""


# ------------------------------------- local clustering coefficient
LCC_TOP_K = 20


def local_clustering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient on the part co-purchase
    graph — c(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), the node-level
    refinement of transitivity_parts (one global ratio hides which
    parts sit in tight co-purchase cliques vs hub-and-spoke
    neighborhoods); top-{LCC_TOP_K} nodes by coefficient.

    Per-node triangle counts reuse the shared compact-forward
    machinery: oriented_wedges_centered keeps the wedge center, the
    closing equality join keeps all three corners of each triangle
    (counted once, at its minimum-(degree, id) corner), and one
    corner-array explode credits tri(v) to each corner. Coefficient is
    an exact count rational micro-quantized; the top-k is a
    TakeOrderedAndProject with (coef, node) deterministic ordering —
    no windows, no driver state.
    """
    edges = copurchase_edges(spark, sf_dir)
    # cached: feeds the orientation joins AND the deg>=2 scoring join
    deg = node_degrees(edges).cache()
    # r15: same adjacency-intersection machinery as
    # triangle_count_parts — each triangle surfaces once as
    # (s, d, w) from one array_intersect per oriented edge, replacing
    # the O(E^1.5) wedge-row exchange + closing join (guide
    # §2.3/§2.4). Exploding the common-neighbor array yields one row
    # per triangle; exploding the corner triple credits all three
    # corners in a single execution, no extra pass.
    adj = oriented_out_adjacency(edges, deg)
    closed = triangle_commons(adj).select(
        "s", "d", F.explode("common").alias("w")
    )
    corners = closed.select(
        F.explode(F.array("s", "d", "w")).alias("node")
    )
    tri = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    scored = (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
        )
    )
    coef = (
        F.lit(2.0)
        * F.col("triangles").cast("double")
        / (F.col("deg").cast("double") * (F.col("deg").cast("double") - F.lit(1.0)))
    )
    return (
        scored.select(
            "node",
            "deg",
            "triangles",
            F.floor(coef * F.lit(float(JL_MICRO)) + F.lit(0.5))
            .cast("long")
            .alias("coef_micro"),
        )
        .orderBy(F.desc("coef_micro"), F.desc("triangles"), F.asc("node"))
        .limit(LCC_TOP_K)
    )


LOCAL_CLUSTERING_SQL = f"""
WITH lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY node
), tris AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
), corners AS (
  SELECT a AS node FROM tris
  UNION ALL SELECT b FROM tris
  UNION ALL SELECT c FROM tris
), tri AS (
  SELECT node, COUNT(*) AS triangles FROM corners GROUP BY node
)
SELECT deg.node, deg.deg, COALESCE(tri.triangles, 0) AS triangles,
       CAST(floor(2.0 * COALESCE(tri.triangles, 0)
                  / (CAST(deg.deg AS DOUBLE) * (CAST(deg.deg AS DOUBLE) - 1.0))
                  * {JL_MICRO} + 0.5) AS BIGINT) AS coef_micro
FROM deg LEFT JOIN tri ON tri.node = deg.node
WHERE deg.deg >= 2
ORDER BY coef_micro DESC, triangles DESC, deg.node ASC
LIMIT {LCC_TOP_K}
"""
