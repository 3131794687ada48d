"""JSON-lines source/sink.

JSONL is the de-facto interchange format for LLM training corpora
(one document object per line, splittable, appendable). Spark reads
it natively and in parallel — each line is a record, so a 100 TB
corpus splits by byte ranges exactly like CSV. The read is
schema-explicit (same policy as sources/csv.py and sources/xml.py:
inference drifts, schemas don't).

``jsonl_roundtrip`` proves lossless interchange for the documents
table: write documents → JSONL shards, read back with the explicit
schema, re-aggregate, oracle on the ORIGINAL parquet. Unicode
escaping, embedded newlines in text (JSON-escaped, so line-framing
survives), and long/int fidelity are what the value hash guards.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from cgtcalc_data_transformer_spark.sources.tpch import load_table

DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSONL → read back (explicit schema) → per-(source,
    lang) rollup with a content checksum. The aggregate runs on the
    JSONL copy, the oracle on the parquet original — the md5-sum
    column makes any text mangling (escaping, truncation, encoding)
    break the hash, not just the counts."""
    # pid-keyed like evolution_path(): two concurrent processes
    # (parallel pytest/bench) must not race on one scratch dir
    path = os.path.join(
        tempfile.gettempdir(),
        f"jsonl_docs_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    cols = [f.name for f in DOCUMENTS_JSONL_SCHEMA.fields]
    write_jsonl(load_table(spark, sf_dir, "documents").select(*cols), path)
    back = read_jsonl(spark, path, DOCUMENTS_JSONL_SCHEMA)
    # order-independent content checksum: sum of the first 8 hex chars
    # of each doc's md5(text) as integers — exact in BIGINT
    digest = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
    return (
        back.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(digest).alias("text_digest_sum"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("source", "lang")
    )


JSONL_ROUNDTRIP_SQL = """
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(('0x' || substr(md5(text), 1, 8))::UBIGINT::BIGINT) AS BIGINT) AS text_digest_sum,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""
