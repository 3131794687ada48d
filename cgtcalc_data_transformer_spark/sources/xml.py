"""XML source/sink (native in Spark 4 — no external package).

Third interchange format after parquet and ORC: warehouse feeds still
arrive as XML exports, and Spark 4 folded the spark-xml reader/writer
into core (`format("xml")`, rowTag-delimited records). The read path
is schema-explicit — XML carries no types, so inference would drift
(int vs long) between runs; the engine's policy everywhere is explicit
schemas (sources/csv.py does the same for the reference's CSVs,
`/root/reference/freetrade.js:6-15` trusts column order instead).

``xml_roundtrip`` proves lossless interchange: supplier → XML files →
read back → per-nation rollup, oracled by DuckDB against the ORIGINAL
parquet. Any serialization loss (double shortest-repr round-trip,
escaping of & < > in names, null handling) breaks the value hash.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from cgtcalc_data_transformer_spark.functions.money import dec as _dec
from cgtcalc_data_transformer_spark.sources.tpch import load_table

SUPPLIER_XML_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)


def write_xml(df: DataFrame, path: str, row_tag: str = "record") -> None:
    df.write.mode("overwrite").format("xml").option("rowTag", row_tag).save(path)


def read_xml(
    spark: SparkSession, path: str, schema: T.StructType, row_tag: str = "record"
) -> DataFrame:
    return (
        spark.read.format("xml").option("rowTag", row_tag).schema(schema).load(path)
    )


def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → XML → read back (explicit schema) → per-nation
    account rollup. The aggregate runs on the XML copy, the oracle on
    the parquet original: equal hashes prove values AND types survive
    the text round-trip (doubles via shortest-repr, names with escaped
    markup characters)."""
    # pid-keyed like evolution_path(): two concurrent processes
    # (parallel pytest/bench) must not race on one scratch dir
    path = os.path.join(
        tempfile.gettempdir(),
        f"xml_supplier_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    cols = [f.name for f in SUPPLIER_XML_SCHEMA.fields]
    write_xml(load_table(spark, sf_dir, "supplier").select(*cols), path)
    back = read_xml(spark, path, SUPPLIER_XML_SCHEMA)
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_dec(F.col("s_acctbal"))).cast("double").alias("acctbal_total"),
            F.min("s_name").alias("first_name"),
            F.max("s_suppkey").alias("max_suppkey"),
        )
        .orderBy("s_nationkey")
    )


XML_ROUNDTRIP_SQL = """
SELECT s_nationkey,
       COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS acctbal_total,
       MIN(s_name) AS first_name,
       MAX(s_suppkey) AS max_suppkey
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
"""
