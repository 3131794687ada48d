"""CSV sources.

Three readers mirroring the reference's three CSV ingestion modes
(SURVEY.md §2 S4-S6), all schema-declared and distributed:

- ``read_header_csv``: header-validated lenient CSV (Freetrade / ii)
  ↔ csv-parse ``columns:true, trim, relax_*`` options
  (`/root/reference/freetrade.js:90-96`, `/root/reference/ii.js:30-52`).
  Spark's CSV reader handles BOM and PERMISSIVE recovery natively; we
  additionally strip the zero-width characters the ii export leads
  with (`/root/reference/ii.js:34`).
- ``read_preamble_csv``: fixed 12-column read that skips an 8-line
  junk preamble per file (`/root/reference/fidelity.js:31-52`,
  ``from_line: 9``). Spark CSV has no skip-N-rows, so we read
  ``wholetext`` (one row per file) and derive per-file line numbers
  with ``posexplode`` — correct by construction under any scan
  partitioning, no shuffle, parallel across files.
- ``df_from_csv_string``: test/driver convenience — parallelize an
  in-memory CSV string through the same parse path the file readers
  use, so golden tests exercise production code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from cgtcalc_data_transformer_spark.schemas import FIDELITY_COLUMNS

# Zero-width / BOM codepoints the ii export may lead with
# (`/root/reference/ii.js:34`): BOM, ZWSP, LRM, RLM.
_ZERO_WIDTH = "[﻿​‎‏]"


def _csv_options() -> dict[str, str]:
    return {
        "header": "true",
        "mode": "PERMISSIVE",
        "ignoreLeadingWhiteSpace": "true",
        "ignoreTrailingWhiteSpace": "true",
        "enforceSchema": "false",
    }


def read_header_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Header CSV with declared schema; empty lines dropped by Spark."""
    df = spark.read.options(**_csv_options()).schema(schema).csv(path)
    first = schema.fieldNames()[0]
    return df.withColumn(first, F.regexp_replace(F.col(first), _ZERO_WIDTH, ""))


def _split_csv_line(line_col, ncols: int):
    """Split one CSV line into `ncols` fields, honoring double quotes.

    `from_csv` needs a struct literal schema; for the simple
    quote/comma grammar these files use, a regex split outside quotes
    is equivalent and stays in codegen: split on commas not inside
    quotes, then strip surrounding quotes and collapse "" escapes.
    """
    parts = F.split(line_col, r',(?=(?:[^"]*"[^"]*")*[^"]*$)')
    fields = []
    for i in range(ncols):
        raw = F.trim(F.get(parts, i))
        unq = F.when(
            raw.rlike('^".*"$'),
            F.regexp_replace(F.regexp_replace(raw, '^"|"$', ""), '""', '"'),
        ).otherwise(raw)
        fields.append(unq)
    return fields


def read_preamble_csv(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    skip_lines: int = 8,
) -> DataFrame:
    """Fixed-column CSV skipping a per-file preamble (Fidelity shape).

    ``wholetext`` read (one row per file, parallel across files) →
    split to lines with per-file positions via ``posexplode`` — line
    numbers are correct by construction no matter how the scan is
    partitioned (a plain line read + per-task counter miscounts when
    one file spans partitions). The per-file memory bound is the file
    size; broker exports are MBs, and at scale the corpus is many
    files, which is exactly the axis this parallelizes over.
    Repeated header lines inside the body are tolerated downstream
    (the parser's whitelist filter drops them, matching the golden
    case at `/root/reference/__tests__/data/fidelity.json:17-22`).
    """
    columns = columns or FIDELITY_COLUMNS
    files = spark.read.text(path, wholetext=True)
    numbered = files.select(
        F.posexplode(F.split(F.col("value"), r"\r?\n")).alias("_line_no", "value")
    )
    body = numbered.filter(
        (F.col("_line_no") >= skip_lines) & (F.trim("value") != "")
    )
    fields = _split_csv_line(F.col("value"), len(columns))
    return body.select(
        *[fld.alias(name) for name, fld in zip(columns, fields)]
    )


def df_from_csv_string(
    spark: SparkSession,
    content: str,
    schema: StructType,
    skip_lines: int = 0,
    has_header: bool = True,
) -> DataFrame:
    """Parse an in-memory CSV string with the production line grammar.

    Used by golden tests and the driver's fixture queries: the
    reference tests feed raw strings to `parseToFormat`
    (`/root/reference/__tests__/processor.test.js:20-31`); this is the
    DataFrame equivalent.
    """
    raw = content.split("\n")[skip_lines:]
    rows = [(ln,) for ln in raw if ln.strip() != ""]
    names = schema.fieldNames()
    if has_header and rows:
        # Drop the leading header row; repeated headers mid-file are
        # left for parser-level filters (fidelity golden case 3).
        rows = rows[1:]
    lines_df = spark.createDataFrame(
        rows, StructType([StructField("value", StringType())])
    )
    fields = _split_csv_line(
        F.regexp_replace(F.col("value"), _ZERO_WIDTH, ""), len(names)
    )
    return lines_df.select(*[f.alias(n) for n, f in zip(names, fields)])


# -------------------------------------------------- quarantine reader
QUARANTINE_FIXTURE = [
    "1,10.5,alpha",
    "2,abc,beta",
    "3,7,gamma,extra",
    "4,,delta",
    "bad line without commas",
    "6,1e3,zeta",
]


def csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE ingestion with a quarantine lane — the
    collect-violations generalization of the reference's per-field
    fail-fast throws (`/root/reference/freetrade.js:128-160` aborts
    the whole run on the first bad cell; a 100 TB ingest instead
    keeps good rows flowing and routes bad ones to a quarantine
    table with their raw bytes for replay).

    ``from_csv`` with ``columnNameOfCorruptRecord`` implements the
    split in one codegen pass: a malformed FIELD nulls that field and
    captures the raw line (row still partially usable); a structurally
    broken line nulls everything; schema-conformant rows carry no
    quarantine payload. The fixture covers all three plus the
    empty-field-is-null and scientific-notation cases; expected
    outcomes are pinned literally in the oracle, so a Spark behavior
    change would fail the gate loudly.
    """
    df = spark.createDataFrame([(l,) for l in QUARANTINE_FIXTURE], "raw string")
    schema = "id INT, qty DOUBLE, name STRING, _corrupt STRING"
    parsed = df.select(
        "raw",
        F.from_csv(
            "raw",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("p"),
    ).select(
        F.col("p.id").alias("id"),
        F.col("p.qty").alias("qty"),
        F.col("p.name").alias("name"),
        F.col("p._corrupt").isNotNull().alias("quarantined"),
        F.col("p._corrupt").alias("quarantine_raw"),
    )
    return parsed.orderBy(F.asc_nulls_last("id"))


CSV_QUARANTINE_SQL = """
SELECT * FROM (VALUES
  (CAST(1 AS INTEGER), CAST(10.5 AS DOUBLE), CAST('alpha' AS VARCHAR), FALSE,
   CAST(NULL AS VARCHAR)),
  (2, NULL, 'beta', TRUE, '2,abc,beta'),
  (3, 7.0, 'gamma', TRUE, '3,7,gamma,extra'),
  (4, NULL, 'delta', FALSE, NULL),
  (6, 1000.0, 'zeta', FALSE, NULL),
  (NULL, NULL, NULL, TRUE, 'bad line without commas')
) AS t(id, qty, name, quarantined, quarantine_raw)
ORDER BY id NULLS LAST
"""
