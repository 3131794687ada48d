"""Freetrade CSV → canonical transactions, as one DataFrame transform.

Reference semantics (`/root/reference/freetrade.js`):
- keep rows with ``Type = order`` and ``Buy / Sell ∈ {buy, sell}``
  (case-insensitive) — dividends / statements / splits are dropped by
  design (`freetrade.js:112-121`);
- kind from Buy/Sell; date = UTC calendar date of the ISO
  ``Timestamp`` (`freetrade.js:128-132,178-188`);
- asset = first non-empty of ISIN, Ticker, trimmed
  (`freetrade.js:135-136`, JS ``||`` treats ``''`` as missing);
- amount = float(Quantity), must be finite and ≠ 0
  (`freetrade.js:138-142`);
- price = float(Price per Share in Account Currency), must be > 0
  (`freetrade.js:144-147`);
- expenses = (float(Stamp Duty) or 0) + (float(FX Fee Amount) or 0)
  (`freetrade.js:167-171`).

All fail-fast checks become ``raise_error`` branches; the whole
parser is filter + project column expressions — no UDFs, fully
codegen-able, shuffle-free.

Intentional strictness divergences from the reference (documented per
ADVICE r1): JS ``parseFloat`` accepts numeric PREFIXES ('5abc' → 5)
where ``try_cast`` rejects the whole string, and the reference passes
structurally-valid-but-impossible calendar dates through unvalidated
where this engine raises. Both are deliberately stricter: silent
prefix truncation and invalid dates are data corruption at scale.
Conversely JS ``isFinite`` rejection of 'Infinity'/'NaN' is matched
exactly via the ``_finite`` guard below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cgtcalc_data_transformer_spark.functions.dates import ddmmyyyy_from_iso_instant
from cgtcalc_data_transformer_spark.functions.validation import require
from cgtcalc_data_transformer_spark.operators.canonical import to_lines


def _nonempty(col_name: str):
    c = F.trim(F.col(col_name))
    return F.when(c != "", c)


def _finite(c: F.Column) -> F.Column:
    """JS ``isFinite`` guard: try_cast admits 'Infinity'/'NaN' strings
    (and Spark treats NaN != 0 / NaN > 0 as true), but the reference's
    isFinite check throws on both (`/root/reference/freetrade.js:140,146`)."""
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))


def canonical(raw: DataFrame) -> DataFrame:
    buy_sell = F.lower(F.trim(F.col("Buy / Sell")))
    kept = raw.filter(
        (F.lower(F.trim(F.col("Type"))) == "order") & buy_sell.isin("buy", "sell")
    )

    date = ddmmyyyy_from_iso_instant("Timestamp")
    asset = F.coalesce(_nonempty("ISIN"), _nonempty("Ticker"))
    amount = (F.col("Quantity")).try_cast("double")
    price = (F.col("Price per Share in Account Currency")).try_cast("double")
    expenses = F.coalesce(
        (F.col("Stamp Duty")).try_cast("double"), F.lit(0.0)
    ) + F.coalesce((F.col("FX Fee Amount")).try_cast("double"), F.lit(0.0))

    return kept.select(
        F.when(buy_sell == "buy", F.lit("BUY")).otherwise(F.lit("SELL")).alias("kind"),
        require(
            date.isNotNull(),
            date,
            F.concat(F.lit("Invalid or missing Timestamp: "), F.coalesce(F.col("Timestamp"), F.lit("null"))),
        ).alias("date"),
        require(
            asset.isNotNull(),
            asset,
            F.concat(F.lit("Missing asset identifier (ISIN/Ticker) for transaction on "), F.coalesce(F.col("Timestamp"), F.lit("null"))),
        ).alias("asset"),
        require(
            _finite(amount) & (amount != 0),
            amount,
            F.concat(F.lit("Invalid Quantity: "), F.coalesce(F.col("Quantity"), F.lit("null"))),
        ).alias("amount"),
        require(
            _finite(price) & (price > 0),
            price,
            F.concat(F.lit("Invalid Price per Share: "), F.coalesce(F.col("Price per Share in Account Currency"), F.lit("null"))),
        ).alias("price"),
        expenses.alias("expenses"),
    )


def lines(raw: DataFrame) -> DataFrame:
    return to_lines(canonical(raw))
