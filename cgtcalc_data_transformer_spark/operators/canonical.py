"""Canonical transaction serialization (the T1 line format).

Every parser ends in the same 6-field IR and the same serialized
line: ``KIND DD/MM/YYYY ASSET AMOUNT PRICE EXPENSES`` with JS number
printing (format sites: `/root/reference/freetrade.js:195-200`,
`/root/reference/ii.js:116-118`, `/root/reference/fidelity.js:113-118`,
`/root/reference/bullionvault.js:114-119`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cgtcalc_data_transformer_spark.functions.jsnum import js_num

CANONICAL_FIELDS = ["kind", "date", "asset", "amount", "price", "expenses"]


def to_lines(canonical: DataFrame) -> DataFrame:
    """DataFrame[TRANSACTION] → DataFrame[line: string]."""
    return canonical.select(
        F.concat_ws(
            " ",
            F.col("kind"),
            F.col("date"),
            F.col("asset"),
            js_num("amount"),
            js_num("price"),
            js_num("expenses"),
        ).alias("line")
    )
