"""js_num fidelity kernel — every parser depends on exact formatting.

Cases mirror the JS Number→String behavior the golden corpus encodes
(`/root/reference/__tests__/data/*.json`): shortest round-trip,
no trailing .0, JS exponent thresholds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.functions.jsnum import (
    _js_format_scalar,
    js_num,
    js_num_exact,
)

# (input double, JS String(x))
CASES = [
    (10.0, "10"),
    (10.8103524, "10.8103524"),
    (3.3, "3.3"),
    (0.25746268, "0.25746268"),
    (9.90434808, "9.90434808"),
    (1296.45, "1296.45"),
    (78990.0, "78990"),
    (0.002, "0.002"),
    (0.0, "0"),
    (0.14, "0.14"),
    (-1296.45, "-1296.45"),
    (1.32373113, "1.32373113"),
    (37.91, "37.91"),
    (500.0, "500"),
    (4.7012, "4.7012"),
    (0.41, "0.41"),
]

# ranges where Java and JS notation diverge — exact path only
EXACT_ONLY = [
    (1e7, "10000000"),
    (123456789.123, "123456789.123"),
    (1e-4, "0.0001"),
    (0.000001, "0.000001"),
    (1e-7, "1e-7"),
    (1e21, "1e+21"),
    (2.5e22, "2.5e+22"),
    (-1e-7, "-1e-7"),
]


def test_scalar_formatter():
    for x, want in CASES + EXACT_ONLY:
        assert _js_format_scalar(x) == want, x


def _run(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    return [r.s for r in df.select(col_fn(F.col("x")).alias("s")).collect()]


def test_js_num_jvm_path(spark):
    values = [c[0] for c in CASES]
    want = [c[1] for c in CASES]
    assert _run(spark, js_num, values) == want


def test_js_num_exact_full_range(spark):
    values = [c[0] for c in CASES + EXACT_ONLY]
    want = [c[1] for c in CASES + EXACT_ONLY]
    assert _run(spark, js_num_exact, values) == want


def test_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "x double")
    assert df.select(js_num(F.col("x")).alias("s")).collect()[0].s is None
