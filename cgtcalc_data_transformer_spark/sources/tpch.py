"""Loaders for the driver's TPC-H-ish parquet testdata (TESTDATA.md).

Plain ``spark.read.parquet`` for everything except ``events``, whose
``ts`` column is written as parquet INT64 TIMESTAMP(NANOS) — a type
the Spark 4 vectorized reader rejects outright. We flip the
``nanosAsLong`` legacy conf (runtime-settable) so the column arrives
as raw int64 nanoseconds, and expose both the raw nanos and a proper
TIMESTAMP column derived from them.

Column pruning & predicate pushdown are preserved: these are thin
wrappers over the parquet scan, no materialization, no driver-side
reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts as int64 nanos plus a derived ``ts_ts`` timestamp.

    ``ts_ts`` is microsecond-truncated (Spark's native resolution).
    Bucketing arithmetic in the event queries uses the raw nanos so
    results are engine-exact regardless of session timezone.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        # integer `div`: /1000 in double loses ulps above 2^53 and can
        # floor 1 µs low — the streaming watermark oracles read ts_ts
        # at ms precision, so the derivation must be exact integer
        # arithmetic (ADVICE r13; same fix in streaming/events.py).
        df = df.withColumn(
            "ts_ts", F.expr("timestamp_micros(ts div 1000)")
        )
    else:  # future-proof: data regenerated with micros
        df = df.withColumn("ts_ts", F.col("ts").cast("timestamp")).withColumn(
            "ts", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("long")
        )
    return df


def scatter(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a SMALL scan before CPU-heavy per-row work.

    Spark sizes scan partitions by BYTES (``maxPartitionBytes``), so a
    compact input — a few MB of compressed text or packed vectors —
    arrives as one or two tasks even when the downstream per-row work
    (token explode + per-token hashing, 64-dim dot products) costs
    orders of magnitude more than the scan. At warehouse scale the
    same table is thousands of splits and this is a no-op (the guard
    sees partitions >= target); locally it converts a single-core
    stage into a full-width one for the price of shuffling a few MB.

    Use it ONLY ahead of genuinely CPU-bound per-row pipelines; for
    scan-bound queries the extra exchange is pure loss.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
