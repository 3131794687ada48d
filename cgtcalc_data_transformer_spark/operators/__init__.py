from cgtcalc_data_transformer_spark.operators.canonical import to_lines
from cgtcalc_data_transformer_spark.operators import (
    freetrade,
    ii,
    fidelity,
    bullionvault,
    pipeline,
)

__all__ = ["to_lines", "freetrade", "ii", "fidelity", "bullionvault", "pipeline"]
