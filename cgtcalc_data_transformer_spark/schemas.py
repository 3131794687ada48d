"""Explicit schema-on-read StructTypes for every source.

The reference infers CSV schemas from header rows at parse time
(`/root/reference/freetrade.js:91`, `/root/reference/ii.js:37`) or
declares fixed positional columns (`/root/reference/fidelity.js:34-36`).
At 100 TB, schema inference means an extra full pass over the data —
the engine always declares schemas and uses the header row only for
validation. All broker columns are StringType on read (CSV cells
arrive as text; coercion happens at use sites, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _all_strings(names: list[str]) -> StructType:
    return StructType([StructField(n, StringType(), True) for n in names])


# 44 Freetrade export columns — names from the export header
# (`/root/reference/__tests__/data/freetrade.json:4`) matching the
# documentation-only field map at `/root/reference/freetrade.js:34-79`.
FREETRADE_COLUMNS = [
    "Title", "Type", "Timestamp", "Account Currency", "Total Amount",
    "Buy / Sell", "Ticker", "ISIN", "Price per Share in Account Currency",
    "Stamp Duty", "Quantity", "Venue", "Order ID", "Order Type",
    "Instrument Currency", "Total Shares Amount", "Price per Share",
    "FX Rate", "Base FX Rate", "FX Fee (BPS)", "FX Fee Amount",
    "Dividend Ex Date", "Dividend Pay Date", "Dividend Eligible Quantity",
    "Dividend Amount Per Share", "Dividend Gross Distribution Amount",
    "Dividend Net Distribution Amount", "Dividend Withheld Tax Percentage",
    "Dividend Withheld Tax Amount", "Stock Split Ex Date",
    "Stock Split Pay Date", "Stock Split New ISIN",
    "Stock Split Rate of Share Outturn From",
    "Stock Split Rate of Share Outturn To",
    "Stock Split Maintain Holding of Initial ISIN",
    "Stock Split New Share Quantity",
    "Stock Split Rate of Cash Outturn Amount",
    "Stock Split Rate of Cash Outturn Currency",
    "Stock Split Cash Outturn Received Amount",
    "Stock Split Has Fractional Payout",
    "Stock Split Rate of Fractional Payout Amount",
    "Stock Split Rate of Fractional Payout Currency",
    "Stock Split Fractional Payout Cash Received Amount",
    "Stock Split Fractional Payout Cash Received Currency",
]
FREETRADE_RAW = _all_strings(FREETRADE_COLUMNS)

# 11 Interactive Investor columns (`/root/reference/ii.js:9-21`).
II_COLUMNS = [
    "Date", "Settlement Date", "Symbol", "Sedol", "Quantity", "Price",
    "Description", "Reference", "Debit", "Credit", "Running Balance",
]
II_RAW = _all_strings(II_COLUMNS)

# 12 Fidelity columns (`/root/reference/fidelity.js:34-36`); real files
# carry an 8-line preamble and a trailing comma per row (13th empty
# positional field) — the source reader handles both.
FIDELITY_COLUMNS = [
    "Order date", "Completion date", "Transaction type", "Investments",
    "Product Wrapper", "Account Number", "Source investment", "Amount",
    "Quantity", "Price per unit", "Reference Number", "Status",
]
FIDELITY_RAW = _all_strings(FIDELITY_COLUMNS)

# One row per .eml file (SURVEY.md §1.1): Spark's wholetext reader
# replaces the reference's EOF-sentinel concat/split round-trip
# (`/root/reference/index.js:100-101`, `/root/reference/bullionvault.js:34`).
BULLIONVAULT_RAW = StructType(
    [
        StructField("file_name", StringType(), True),
        StructField("text", StringType(), True),
    ]
)

# The canonical transaction IR every parser produces (SURVEY.md §1.1).
TRANSACTION = StructType(
    [
        StructField("kind", StringType(), False),       # BUY | SELL
        StructField("date", StringType(), False),       # dd/MM/yyyy
        StructField("asset", StringType(), False),      # no spaces
        StructField("amount", DoubleType(), False),
        StructField("price", DoubleType(), False),
        StructField("expenses", DoubleType(), False),
    ]
)

# ---- driver testdata tables (TESTDATA.md / FIXTURES.md §6) ----

TPCH_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampNTZType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampNTZType()),
        ]
    ),
    # events.ts arrives as int64 *nanoseconds* (see sources/tpch.py)
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

# Multimodal: opaque payload bytes + typed metadata (SURVEY.md §2.2
# extension). The decode step is stubbed (no image/audio libs in this
# container); the Spark-side plumbing is real.
MULTIMODAL_ASSET = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("byte_len", LongType(), True),
        StructField("format_tag", StringType(), True),
    ]
)
