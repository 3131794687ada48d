"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``cgtcalc_data_transformer_spark.registry`` — the
engine's full operator inventory (SURVEY.md §2) with per-query DuckDB
oracles. See the registry module for the completeness map.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cgtcalc_data_transformer_spark import registry  # noqa: E402
from cgtcalc_data_transformer_spark.session import apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference pipeline's shape on driver data —
    normalize orders into canonical transaction lines, merge, sort."""
    apply_runtime_confs(spark)
    return registry.canonical_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted = rows-only check)."""
    return registry.oracle_sql()
