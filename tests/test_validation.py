"""Fail-fast validation paths — the reference aborts on first bad
input with a contextual message; here each guard is a raise_error
branch that fails the Spark job. These tests pin the abort behavior
(SURVEY.md §2 V2/V3, §4.3)."""

from __future__ import annotations

import pytest

from cgtcalc_data_transformer_spark import fixtures, schemas
from cgtcalc_data_transformer_spark.operators import bullionvault, fidelity, freetrade, ii
from cgtcalc_data_transformer_spark.operators.pipeline import merge_sorted
from cgtcalc_data_transformer_spark.sources.csv import df_from_csv_string
from cgtcalc_data_transformer_spark.sources.eml import df_from_email_strings

ABORT = (Exception,)  # Spark wraps raise_error differently per API path


def _collect_error(df):
    with pytest.raises(ABORT) as ei:
        df.collect()
    return str(ei.value)


def test_bullionvault_rejects_non_gbp(spark):
    email = fixtures.BULLIONVAULT_EMAILS[0].replace("GBP", "USD")
    err = _collect_error(bullionvault.lines(df_from_email_strings(spark, [email])))
    assert "GBP" in err or "currency" in err.lower()


def test_bullionvault_rejects_unknown_metal(spark):
    email = fixtures.BULLIONVAULT_EMAILS[0].replace("gold", "platinum")
    err = _collect_error(bullionvault.lines(df_from_email_strings(spark, [email])))
    assert "gold" in err.lower() or "security" in err.lower() or "asset" in err.lower()


def test_freetrade_rejects_zero_quantity(spark):
    csv = fixtures.FREETRADE_CSV.replace(',"40.00",', ',"0",').replace(
        ",40.00,", ",0,"
    )
    raw = df_from_csv_string(spark, csv, schemas.FREETRADE_RAW)
    # only trigger if the replace actually hit a quantity cell
    qty = [r[0] for r in raw.select("Quantity").collect()]
    if "0" in qty:
        _collect_error(freetrade.lines(raw))


def test_ii_rejects_debit_and_credit_both_set(spark):
    bad = fixtures.II_CSV.replace(
        '02/01/2024,04/01/2024,TST,B123456,10,£5.25,Buy TST,R1,"£52.50",n/a,"£0.00"',
        '02/01/2024,04/01/2024,TST,B123456,10,£5.25,Buy TST,R1,"£52.50","£52.50","£0.00"',
    )
    raw = df_from_csv_string(spark, bad, schemas.II_RAW)
    err = _collect_error(ii.lines(raw))
    assert "BUY/SELL" in err or "Debit" in err


def test_fidelity_rejects_zero_amount(spark):
    bad = fixtures.FIDELITY_CSV.replace(
        ",,100.00,25,4.00,", ",,0.00,25,4.00,"
    )
    raw = df_from_csv_string(
        spark, bad, schemas.FIDELITY_RAW, skip_lines=fixtures.FIDELITY_PREAMBLE_LINES
    )
    _collect_error(fidelity.lines(raw))


def test_violations_mode_collects_all_bad_lines(spark):
    """The debug twin reports every malformed line instead of aborting."""
    from cgtcalc_data_transformer_spark.operators.pipeline import violations

    existing = spark.createDataFrame(
        [("BUY nope ASSET 1 2 0",), ("BUY 01/01/2024 OK 1 2 0",)], "line string"
    )
    new = spark.createDataFrame(
        [("SELL 32/13/2024 BAD 1 2 0",), ("SELL 02/01/2024 OK 1 2 0",)], "line string"
    )
    rows = {(r.source, r.line) for r in violations(existing, new).collect()}
    assert rows == {
        ("existing", "BUY nope ASSET 1 2 0"),
        ("new", "SELL 32/13/2024 BAD 1 2 0"),
    }


def test_merge_rejects_malformed_date_line(spark):
    existing = spark.createDataFrame(
        [("BUY not-a-date ASSET 1 2 0",)], "line string"
    )
    new = spark.createDataFrame([("BUY 01/01/2024 A 1 2 0",)], "line string")
    err = _collect_error(merge_sorted(existing, new))
    assert "Invalid date" in err
