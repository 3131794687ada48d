#!/usr/bin/env python3
"""Isolated per-query measurement with the bench methodology.

Usage: python tools/isolate_measure.py <sf_dir> <query> [query ...]

One SparkSession for the listed queries (pass ONE query for a truly
isolated reading — the r14 adjudication showed long batteries suffer
cache-eviction contention). Per query: one warm run (recorded as
cold), then min-of-3 fresh-plan executions, using the query's
HEADLINE materialization mode so numbers are bench-comparable.
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from cgtcalc_data_transformer_spark import registry  # noqa: E402
from cgtcalc_data_transformer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from bench import HEADLINE  # noqa: E402

    from pyspark.sql import functions as F  # noqa: E402

    spark = get_spark(app_name="isolate-measure")
    qs = registry.queries()
    for name in names:
        mode = HEADLINE.get(name, "collect")

        def build():
            df = qs[name](spark, sf_dir)
            if mode == "exec":
                df = df.select(
                    F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("c")
                )
            return df

        sink = os.path.join(tempfile.gettempdir(), f"iso_sink_{os.getpid()}")

        def run(df):
            if mode == "sink":
                df.write.mode("overwrite").text(sink)
            else:
                df.collect()

        spark.sparkContext.setJobDescription(f"isolate:{name}")
        # ADVICE r14: clearCache before EVERY timed sample — otherwise
        # the min3 samples are served by the warm run's in-query
        # caches and the "isolated reading" measures cache hits, not
        # fresh execution. min3_s here is therefore a CACHE-COLD
        # min-of-3 (each sample includes cache materialization);
        # min3_warm_s keeps the old cache-served reading for
        # comparability with pre-r15 notes.
        spark.catalog.clearCache()
        t0 = time.time()
        tb0 = time.time()
        df = build()
        build_s = time.time() - tb0
        run(df)
        cold = time.time() - t0
        samples = []
        for _ in range(3):
            spark.catalog.clearCache()
            df = build()
            t0 = time.time()
            run(df)
            samples.append(time.time() - t0)
        warm_samples = []
        for _ in range(3):
            df = build()
            t0 = time.time()
            run(df)
            warm_samples.append(time.time() - t0)
        print(json.dumps({
            "query": name, "sf_dir": sf_dir, "mode": mode,
            "plan_build_s": round(build_s, 3), "cold_s": round(cold, 3),
            "min3_s": round(min(samples), 3),
            "samples": [round(s, 3) for s in samples],
            "min3_warm_s": round(min(warm_samples), 3),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
