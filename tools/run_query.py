#!/usr/bin/env python3
"""Run any registry query by name against any SF directory.

Usage:
  python tools/run_query.py <query> [--sf DIR] [--show N] [--explain]
  python tools/run_query.py --list

Developer loop: inspect one operator's output or plan without the
bench/oracle harnesses.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from cgtcalc_data_transformer_spark import registry  # noqa: E402
from cgtcalc_data_transformer_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query", nargs="?")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    qs = registry.queries()
    if args.list or not args.query:
        oracled = registry.oracle_sql()
        for name in qs:
            print(f"{name}{'' if name in oracled else '  (rows-only)'}")
        return
    if args.query not in qs:
        sys.exit(f"unknown query {args.query!r} — see --list")

    spark = get_spark(app_name=f"run-{args.query}")
    t0 = time.time()
    df = qs[args.query](spark, args.sf)
    if args.explain:
        df.explain("formatted")
    df.show(args.show, truncate=False)
    print(f"[{args.query}] {df.count()} rows in {time.time() - t0:.2f}s at {args.sf}")
    spark.stop()


if __name__ == "__main__":
    main()
