"""Canonical text-output source/sink (the ``data.txt`` contract).

The reference re-reads its whole output file on every run, merges,
re-sorts and rewrites it (`/root/reference/index.js:108-122`). The
Spark shape of that contract:

- read: ``spark.read.text`` + trim + drop-blank (S7)
- write: single text file with a trailing newline for byte-identical
  output (K1). ``coalesce(1)`` is an explicit small-output choice —
  at scale you would keep it partitioned (``partitioned=True``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_existing_output(spark: SparkSession, path: str) -> DataFrame:
    """data.txt → DataFrame[line: string]; missing file → empty."""
    try:
        df = spark.read.text(path)
    except Exception:
        return spark.createDataFrame([], "line string")
    return (
        df.select(F.trim("value").alias("line"))
        .filter(F.length("line") > 0)
    )


def write_output(df: DataFrame, path: str, partitioned: bool = False) -> None:
    """Write DataFrame[line] as text.

    ``partitioned=False`` reproduces the reference's single
    ``data.txt`` (one part file); ``partitioned=True`` is the
    100 TB-scale mode (one file per partition, order preserved by
    the upstream range-partitioned sort).
    """
    out = df if partitioned else df.coalesce(1)
    out.write.mode("overwrite").text(path)
