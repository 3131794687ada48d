"""Physical-plan inspection helpers.

The scale contract (SURVEY.md north star) is checked in tests, not
prose: filters must reach the parquet scan (PushedFilters), dim joins
must broadcast, projections must prune the read schema. These helpers
parse ``explain('formatted')`` output so tests can assert on the plan
the optimizer actually produced.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, fragment: str) -> bool:
    """True if some scan pushes a filter mentioning ``fragment``."""
    plan = formatted_plan(df)
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if fragment in m.group(1):
            return True
    return False


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def scan_read_schema(df: DataFrame, table_fragment: str) -> list[str]:
    """Columns actually read from the scan whose location path contains
    ``table_fragment`` (column-pruning check)."""
    plan = formatted_plan(df)
    blocks = plan.split("Scan parquet")
    for block in blocks[1:]:
        loc = re.search(r"Location:.*", block)
        schema = re.search(r"ReadSchema: struct<(.*?)>", block)
        if loc and table_fragment in loc.group(0) and schema:
            return [c.split(":")[0] for c in schema.group(1).split(",") if c]
    return []
