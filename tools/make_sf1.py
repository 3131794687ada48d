#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset (~6M lineitem) from sf0.1 for the
headroom bench (VERDICT r1 #7). 10 replicas with shifted keys; text
and embeddings are re-randomized per replica so the dedup/similarity
workloads keep a realistic (non-degenerate) duplicate structure
instead of 10 exact copies of every document. Writes OUTSIDE the
repo (/tmp/sf1 by default) — driver testdata is never touched.

Usage: python tools/make_sf1.py [src_dir] [dst_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

KEY_STRIDE = 10_000_000  # larger than any base key space

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW reps AS SELECT unnest(range(0, {N})) AS rep")


def gen(table: str, sql: str) -> None:
    con.execute(
        # Bounded row groups: DuckDB's default writes small tables as
        # ONE row group, and Spark cannot split within a row group —
        # documents/embeddings scans would run on a single core, which
        # no real multi-file 100 TB layout ever does. 10k-row groups
        # give the local bench the same splittable shape.
        f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 10000)"
    )
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")


# dims unchanged (broadcast sides stay broadcast-sized at sf1)
for t in ("region", "nation", "customer", "supplier", "part"):
    gen(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

gen(
    "orders",
    f"""
    SELECT o_orderkey + rep * {KEY_STRIDE} AS o_orderkey,
           o_custkey, o_orderstatus, o_totalprice,
           o_orderdate + to_days((rep * 3)::INT) AS o_orderdate,
           o_orderpriority
    FROM read_parquet('{SRC}/orders.parquet') CROSS JOIN reps
    """,
)

gen(
    "lineitem",
    f"""
    SELECT l_orderkey + rep * {KEY_STRIDE} AS l_orderkey,
           l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag,
           l_linestatus,
           l_shipdate + to_days((rep * 3)::INT) AS l_shipdate
    FROM read_parquet('{SRC}/lineitem.parquet') CROSS JOIN reps
    """,
)

gen(
    "events",
    f"""
    SELECT event_id + rep * {KEY_STRIDE} AS event_id,
           ts,
           user_id + rep * {KEY_STRIDE} AS user_id,
           event_type, value, props
    FROM read_parquet('{SRC}/events.parquet') CROSS JOIN reps
    """,
)

# documents: per-replica word substitution keeps token/shingle
# DISTRIBUTIONS (doc lengths, zipf-ish reuse within a replica) while
# making replicas non-identical — rep 0 is the original corpus.
gen(
    "documents",
    f"""
    SELECT doc_id + rep * {KEY_STRIDE} AS doc_id,
           CASE WHEN rep = 0 THEN text
                ELSE list_aggregate(
                       list_transform(string_split(text, ' '),
                                      w -> substr(md5(w || rep), 1, GREATEST(length(w), 1))),
                       'string_agg', ' ')
           END AS text,
           lang, source,
           n_chars
    FROM read_parquet('{SRC}/documents.parquet') CROSS JOIN reps
    """,
)

# embeddings: fresh deterministic vectors per replica (hash-seeded),
# rep 0 original — keeps LSH bucket occupancy realistic.
gen(
    "embeddings",
    f"""
    SELECT vec_id + rep * {KEY_STRIDE} AS vec_id,
           CASE WHEN rep = 0 THEN embedding
                ELSE list_transform(range(0, len(embedding)),
                       i -> ((hash(vec_id * 131 + rep * 17 + i) % 2000000)::DOUBLE
                             / 1000000.0 - 1.0)::FLOAT)
           END AS embedding,
           label
    FROM read_parquet('{SRC}/embeddings.parquet') CROSS JOIN reps
    """,
)

print("done:", DST)
