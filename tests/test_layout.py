"""Z-order layout: the physical data-skipping claim, measured.

Writes the same lineitem data twice — sorted by l_partkey alone vs
sorted by the Morton key — and reads back parquet ROW-GROUP statistics
with pyarrow: the Z-sorted layout must bound the per-row-group range
of BOTH keys, where the single-key sort leaves l_suppkey's ranges at
~full width (so a suppkey predicate prunes nothing)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import layout
from cgtcalc_data_transformer_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


def _avg_rowgroup_span(path_glob: str, col: str) -> float:
    spans, n = 0.0, 0
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    spans += c.statistics.max - c.statistics.min
                    n += 1
    assert n > 0, f"no row-group stats for {col} in {path_glob}"
    return spans / n


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    # sf0.01: l_partkey spans ~1000, l_suppkey ~100 — wide enough for
    # row-group spans to be meaningful (sf0.001 has only 10 suppliers)
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    z = layout.zorder_key_expr(F.col("l_partkey"), F.col("l_suppkey"))

    # Tiny row groups: the Z-tile per row group must be smaller than
    # the suppkey domain for locality to be visible — 1 KiB blocks
    # here stand in for 128 MiB row groups over a 100 TB key space
    # (what matters is cells-per-row-group vs domain size, not bytes).
    single = str(tmp_path / "by_part")
    zsort = str(tmp_path / "by_z")
    opts = {"parquet.block.size": "1024", "parquet.page.size": "512"}
    li.repartition(1).sortWithinPartitions("l_partkey").write.options(
        **opts
    ).parquet(single)
    li.withColumn("z", z).repartition(1).sortWithinPartitions("z").drop(
        "z"
    ).write.options(**opts).parquet(zsort)

    supp_single = _avg_rowgroup_span(f"{single}/*.parquet", "l_suppkey")
    supp_z = _avg_rowgroup_span(f"{zsort}/*.parquet", "l_suppkey")
    part_z = _avg_rowgroup_span(f"{zsort}/*.parquet", "l_partkey")
    mm = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("p"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("s"),
    ).collect()[0]
    full_part, full_supp = mm.p, mm.s

    # single-key sort leaves the OTHER dimension at ~full width —
    # a suppkey predicate prunes nothing there...
    assert supp_single > full_supp * 0.9, (supp_single, full_supp)
    # ...while the Z-sort bounds BOTH dimensions materially below
    # full width, so selective predicates on either key skip row
    # groups (the balanced-pruning property Z-order buys).
    assert supp_z < full_supp * 0.6, (supp_z, full_supp)
    assert part_z < full_part * 0.15, (part_z, full_part)


def test_zorder_key_is_bijective_on_grid(spark):
    """Interleave must be collision-free for in-range key pairs."""
    li = load_table(spark, SF, "lineitem").select("l_partkey", "l_suppkey").distinct()
    z = layout.zorder_key_expr(F.col("l_partkey"), F.col("l_suppkey"))
    n_pairs = li.count()
    n_z = li.select(z.alias("z")).distinct().count()
    assert n_pairs == n_z
