#!/usr/bin/env python3
"""simjoin_prefix sf-scaling sensitivity probe (VERDICT r12 item 8).

At each SF dir given, measures (min-of-2 fresh plans each):
  - candidate-generation time + candidate-pair count (the AllPairs
    prefix+length filter, stopped at the distinct-pairs count), at
    the production prefix length and one notch LONGER (+1 rarest
    shingle per doc — still lossless, strictly more candidates);
  - full verify time (the registered simjoin_prefix query).

If the sf1/sf0.1 wall ratio tracks the candidate-count ratio, the
near-super-linear scaling row is candidate-driven (the df
distribution flattens with corpus growth: rare shingles get less
rare, posting lists grow), not verify-driven.

Usage: python tools/simjoin_sensitivity.py <sf_dir> [<sf_dir> ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window, functions as F  # noqa: E402

from cgtcalc_data_transformer_spark.operators import dedup  # noqa: E402
from cgtcalc_data_transformer_spark.operators.dedup import (  # noqa: E402
    JACCARD_THRESHOLD,
    shingle_rows,
    shingle_sizes,
)
from cgtcalc_data_transformer_spark.session import get_spark  # noqa: E402
from cgtcalc_data_transformer_spark.sources.tpch import (  # noqa: E402
    load_table,
    scatter,
)


def candidates(spark, sf_dir: str, extra: int):
    docs = scatter(load_table(spark, sf_dir, "documents"))
    shingles = shingle_rows(docs)
    df_counts = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    sizes = shingle_sizes(shingles)
    ranked = (
        shingles.join(df_counts, "shingle")
        .join(sizes, "doc_id")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
    )
    prefix = ranked.filter(
        F.col("rnk")
        <= F.col("n_sh")
        - F.ceil(F.lit(JACCARD_THRESHOLD) * F.col("n_sh"))
        + 1
        + extra
    ).select("doc_id", "shingle", "n_sh")
    a = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "shingle",
        F.col("n_sh").alias("na"),
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"),
        "shingle",
        F.col("n_sh").alias("nb"),
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            (F.col("nb") >= F.lit(JACCARD_THRESHOLD) * F.col("na"))
            & (F.col("nb") <= F.col("na") / F.lit(JACCARD_THRESHOLD))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return pairs


def min2(fn):
    ts = []
    for _ in range(2):
        t0 = time.time()
        out = fn()
        ts.append(time.time() - t0)
    return round(min(ts), 3), out


def main() -> None:
    spark = get_spark(app_name="simjoin_sensitivity")
    for sf_dir in sys.argv[1:]:
        for extra in (0, 1):
            sec, n = min2(lambda: candidates(spark, sf_dir, extra).count())
            print(
                f"{sf_dir} prefix+{extra}: candidates={n} cand_time={sec}s",
                flush=True,
            )
        sec, n = min2(lambda: dedup.simjoin_prefix(spark, sf_dir).count())
        print(f"{sf_dir} full verify: pairs={n} time={sec}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
