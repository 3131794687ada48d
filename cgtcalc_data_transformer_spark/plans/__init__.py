from cgtcalc_data_transformer_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    scan_read_schema,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "has_pushed_filters",
    "scan_read_schema",
]
