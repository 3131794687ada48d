from cgtcalc_data_transformer_spark.functions.jsnum import js_num, js_num_exact
from cgtcalc_data_transformer_spark.functions.dates import (
    ddmmyyyy_from_iso_instant,
    ddmmyyyy_from_dmy,
    ddmmyyyy_from_d_mon_yyyy,
    ddmmyyyy_from_freeform_dealtime,
)
from cgtcalc_data_transformer_spark.functions.validation import (
    require,
    strict_double,
    money_double,
)

__all__ = [
    "js_num",
    "js_num_exact",
    "ddmmyyyy_from_iso_instant",
    "ddmmyyyy_from_dmy",
    "ddmmyyyy_from_d_mon_yyyy",
    "ddmmyyyy_from_freeform_dealtime",
    "require",
    "strict_double",
    "money_double",
]
