"""Python DataSource (.eml) — same rows as the wholetext reader, same
parser output as the in-memory fixture path, explicit partitioning."""

from __future__ import annotations

import os

import pytest

from cgtcalc_data_transformer_spark import fixtures
from cgtcalc_data_transformer_spark.operators import bullionvault
from cgtcalc_data_transformer_spark.sources import eml_datasource


@pytest.fixture()
def eml_dir(tmp_path):
    for i, em in enumerate(fixtures.BULLIONVAULT_EMAILS):
        (tmp_path / f"advice_{i}.eml").write_text(em)
    (tmp_path / "ignore.txt").write_text("not an email")
    (tmp_path / "upper.EML").write_text(fixtures.BULLIONVAULT_EMAILS[0])
    return str(tmp_path)


def test_datasource_lists_and_reads(spark, eml_dir):
    eml_datasource.register(spark)
    df = spark.read.format("eml").load(eml_dir)
    rows = df.collect()
    # .eml case-insensitively, .txt excluded
    assert len(rows) == len(fixtures.BULLIONVAULT_EMAILS) + 1
    assert all(r["file_name"].startswith("file://") for r in rows)
    assert any(r["file_name"].endswith(".EML") for r in rows)


def test_datasource_partitioning(spark, eml_dir):
    eml_datasource.register(spark)
    df = (
        spark.read.format("eml")
        .option("filesPerPartition", "1")
        .load(eml_dir)
    )
    n_files = len(fixtures.BULLIONVAULT_EMAILS) + 1
    assert df.rdd.getNumPartitions() == n_files


def test_datasource_feeds_parser(spark, eml_dir):
    """End-to-end: datasource → bullionvault parser == fixture path."""
    # drop the duplicate upper.EML so expected lines match exactly
    os.remove(os.path.join(eml_dir, "upper.EML"))
    eml_datasource.register(spark)
    df = spark.read.format("eml").load(eml_dir)
    got = sorted(r["line"] for r in bullionvault.lines(df).collect())
    assert got == sorted(fixtures.EXPECTED_BULLIONVAULT)
