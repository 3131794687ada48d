"""Fidelity International CSV → canonical transactions.

Reference semantics (`/root/reference/fidelity.js`):
- only 7 whitelisted transaction types survive, case-insensitive
  (`fidelity.js:3-11,46`) — this filter also swallows repeated
  header lines mid-file (golden case 3);
- kind = sign of ``Amount`` (> 0 BUY, < 0 SELL, = 0 error)
  (`fidelity.js:60-61,81`);
- date = ``Completion date`` in ``d MMM yyyy`` (`fidelity.js:63-64,95-106`);
- asset = ``Investments`` with whitespace runs → ``_``, non-empty
  (`fidelity.js:66-67`);
- the serialized amount is the *Quantity* column (strict, ≠ 0)
  (`fidelity.js:69-70,113-118`);
- price strict > 0 (`fidelity.js:72-76`); expenses always 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cgtcalc_data_transformer_spark.functions.dates import ddmmyyyy_from_d_mon_yyyy
from cgtcalc_data_transformer_spark.functions.validation import require, strict_double
from cgtcalc_data_transformer_spark.operators.canonical import to_lines

SUPPORTED_TYPES = [
    "buy",
    "sell",
    "auto-sell for fees",
    "buy for switch",
    "sell for switch",
    "buy from regular savings plan",
    "cash out/sell for transfer",
]


def canonical(raw: DataFrame) -> DataFrame:
    kept = raw.filter(F.lower(F.trim(F.col("Transaction type"))).isin(*SUPPORTED_TYPES))

    amount = strict_double(F.col("Amount"), "Amount")
    amount = require(amount != 0, amount, F.lit("Zero Amount is not a valid transaction"))
    date = ddmmyyyy_from_d_mon_yyyy("Completion date")
    asset = F.regexp_replace(F.trim(F.col("Investments")), r"\s+", "_")
    quantity = strict_double(F.col("Quantity"), "Quantity")
    quantity = require(
        quantity != 0, quantity, F.lit("Zero Quantity is not a valid transaction")
    )
    price = (F.col("Price per unit")).try_cast("double")

    return kept.select(
        F.when(amount > 0, F.lit("BUY")).otherwise(F.lit("SELL")).alias("kind"),
        require(
            date.isNotNull(),
            date,
            F.concat(F.lit("Invalid Completion date: "), F.coalesce(F.col("Completion date"), F.lit("null"))),
        ).alias("date"),
        require(
            asset != "",
            asset,
            F.concat(F.lit("Invalid or missing Investments field: "), F.coalesce(F.col("Investments"), F.lit("null"))),
        ).alias("asset"),
        quantity.alias("amount"),
        require(
            price.isNotNull() & (price > 0),
            price,
            F.concat(F.lit("Invalid Price per unit for "), F.coalesce(F.col("Price per unit"), F.lit("null"))),
        ).alias("price"),
        F.lit(0.0).alias("expenses"),
    )


def lines(raw: DataFrame) -> DataFrame:
    return to_lines(canonical(raw))
