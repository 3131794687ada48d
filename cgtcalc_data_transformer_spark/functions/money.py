"""The engine's money-precision policy, in one place.

Every revenue/price aggregation sums in DECIMAL(28,6) (exact,
order-independent — the value-hash gate tolerates zero drift) and
casts to double only at the result boundary. Modules used to carry
private copies of this cast; a precision change must hit all of them
at once, so it lives here.
"""

from __future__ import annotations

from pyspark.sql import Column


def dec(col: Column, prec: int = 28, scale: int = 6) -> Column:
    return col.cast(f"decimal({prec},{scale})")
