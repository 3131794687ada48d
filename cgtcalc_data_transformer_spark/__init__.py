"""cgtcalc_data_transformer_spark — a PySpark-native analytics engine.

A ground-up Spark re-expression of the capabilities of the reference
repo AugustinGrigorov/cgtcalc-data-transformer (a single-process
Node.js broker-export → canonical-transaction ETL tool), extended
with the relational / dedup / similarity / text-analysis / streaming
operators a large-scale (100 TB-class) training-data pipeline needs.

Layout:
  session      — SparkSession construction with scale-aware defaults
  schemas      — explicit StructTypes for every source (schema-on-read)
  functions/   — column-expression kernels (js_num, dates, validation)
  sources/     — readers: CSV (header / preamble-skipping), .eml dirs,
                 the TPC-H-ish parquet testdata, canonical text output
  operators/   — parsers (freetrade, ii, fidelity, bullionvault),
                 merge/sort pipeline, relational queries, dedup,
                 similarity search, text analysis, multimodal plumbing
  plans/       — physical-plan inspection helpers (pushdown/broadcast)
  streaming/   — Structured Streaming variants of the event queries
"""

__version__ = "0.1.0"
