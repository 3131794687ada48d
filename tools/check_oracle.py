#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB against the same parquet tables (default sf0.01), comparing
row count, column names, and an order-insensitive value multiset.

Faithful to the driver: both sides are materialized THROUGH PANDAS
(`toPandas()` / `fetchdf()`), because that is where representation
divergence appears — DuckDB HUGEINT sums come back as float64/object
while Spark BIGINT comes back int64, and the driver's value hash is
type-sensitive (5 vs 5.0 hash differently after canonicalization).
The multiset compare is therefore TYPE-STRICT: an int on one side and
a float on the other is a failure even when numerically equal.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from collections import Counter

import duckdb
import numpy as np

sys.path.insert(0, ".")

from cgtcalc_data_transformer_spark.session import get_spark  # noqa: E402
from cgtcalc_data_transformer_spark.sources.tpch import TABLES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


class ComplexCellError(TypeError):
    """A list/dict/ndarray cell reached the compare — the DRIVER's
    canonicalizer crashes on these (pandas sort_values: 'unhashable
    type: list', the round-3 multimodal_features red row), so the
    local replica must fail identically instead of normalizing."""


def _norm(v):
    """Normalize a pandas cell to (type-tag, value) — type-strict.

    Complex cells (list/tuple/dict/ndarray) raise: the driver's canon
    dies on them, and a local gate that tolerates what the driver
    rejects ships red rows (round-3 lesson)."""
    if isinstance(v, (np.ndarray, list, tuple, dict, set)):
        raise ComplexCellError(
            f"complex cell {type(v).__name__} — driver canon would crash; "
            "flatten arrays/structs/maps to scalar columns"
        )
    if hasattr(v, "item"):
        v = v.item()  # numpy scalar → python scalar
        if isinstance(v, (list, tuple, dict)):
            raise ComplexCellError(
                f"complex cell {type(v).__name__} — driver canon would crash"
            )
    if v is None:
        return ("null", None)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", v)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if hasattr(v, "isoformat"):
        return ("ts", v.isoformat())
    return (type(v).__name__, v)


def _frame_key(df):
    """Order-insensitive multiset of rows, dtype-preserving.

    itertuples, NOT iterrows: iterrows coerces each row Series to a
    common dtype, so an int64 cell in a frame that also has a float
    column silently becomes float64 and the type-strict compare stops
    being strict (5 vs 5.0 would pass)."""
    cols = sorted(df.columns)
    col_ix = [df.columns.get_loc(c) for c in cols]
    return Counter(
        tuple(_norm(row[i]) for i in col_ix)
        for row in df.itertuples(index=False, name=None)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        if name not in oracles:
            print(
                f"rows  {name}: {len(spd)} rows (no oracle) [{time.time()-t0:.1f}s]"
            )
            continue
        try:
            dpd = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue

        problems = []
        if len(spd) != len(dpd):
            problems.append(f"rowcount spark={len(spd)} duckdb={len(dpd)}")
        if sorted(spd.columns) != sorted(dpd.columns):
            problems.append(
                f"columns spark={sorted(spd.columns)} duckdb={sorted(dpd.columns)}"
            )
        if not problems:
            try:
                sk, dk = _frame_key(spd), _frame_key(dpd)
            except ComplexCellError as e:
                problems.append(f"driver-canon crash: {e}")
                sk = dk = None
            if sk is not None and sk != dk:
                diff_s = list((sk - dk).items())[:3]
                diff_d = list((dk - sk).items())[:3]
                problems.append(
                    f"values spark-only={diff_s} duckdb-only={diff_d}"
                )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK    {name}: {len(spd)} rows [{time.time()-t0:.1f}s]")

    spark.stop()
    print("\nRESULT:", "FAIL" if failures else "OK", f"({failures} failing)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
