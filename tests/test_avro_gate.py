"""Avro interchange gate (VERDICT r10 item 7): the roundtrip runs
when the spark-avro jar is present, and fails LOUDLY-but-typed when
absent — never silently returns wrong data."""

from __future__ import annotations

import duckdb
import pytest

from cgtcalc_data_transformer_spark.sources.avro import (
    AVRO_ROUNDTRIP_SQL,
    AvroUnavailableError,
    avro_available,
    avro_roundtrip,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    not avro_available(),
    reason="spark-avro jar absent in this container (sources/avro.py gate)",
)
def test_avro_roundtrip_matches_parquet_oracle(spark):
    got = [tuple(r) for r in avro_roundtrip(spark, SF).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    want = con.execute(AVRO_ROUNDTRIP_SQL).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert abs(g[2] - w[2]) < 1e-6


@pytest.mark.skipif(
    avro_available(), reason="spark-avro present — gate path untestable"
)
def test_avro_gate_raises_typed_error(spark):
    with pytest.raises(AvroUnavailableError):
        avro_roundtrip(spark, SF)
