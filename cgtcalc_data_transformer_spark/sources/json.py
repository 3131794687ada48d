"""JSON-lines source/sink.

Not in the reference's surface (CSV + .eml only) — added because a
training-data pipeline ingests JSONL constantly. Always schema-
declared (``spark.read.json`` with inference is a full extra pass at
100 TB); writes partitioned by a derived date column to demonstrate
partition-pruned re-reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_events_partitioned(events: DataFrame, path: str) -> None:
    """Partition by event date (derived from int64 nano ts) — the
    layout that makes day-range queries partition-pruned at scale."""
    with_day = events.withColumn(
        "event_date",
        F.date_format(
            F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")), "yyyy-MM-dd"
        ),
    )
    with_day.write.mode("overwrite").partitionBy("event_date").parquet(path)
