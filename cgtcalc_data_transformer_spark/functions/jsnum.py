"""JavaScript Number→String formatting as Spark column expressions.

The reference serializes every numeric field with JS's default
number-to-string (shortest round-trip decimal): ``"10.81035240"`` →
``10.8103524``, ``"10.00"`` → ``10``, ``"3.30"`` → ``3.3``
(golden outputs in `/root/reference/__tests__/data/*.json`; format
sites e.g. `/root/reference/freetrade.js:195-200`). This module is
the fidelity kernel every parser depends on (SURVEY.md §4.4).

Two implementations:

- ``js_num``: pure JVM path — Spark's double→string cast already
  produces the shortest round-trip digits (Java ``Double.toString``
  uses the same uniqueness criterion as ECMA-262 ToString); we strip
  the trailing ``.0`` that Java prints for integral values. Stays
  inside whole-stage codegen: this is the hot path.

  Caveat: Java switches to scientific notation outside
  [1e-3, 1e7) while JS switches outside [1e-6, 1e21). All golden
  values (and the personal-finance domain) sit inside the common
  range; use ``js_num_exact`` for data that does not.

- ``js_num_exact``: Arrow-batched pandas UDF implementing the full
  ECMA-262 rules via Python ``repr`` (also shortest round-trip) with
  JS's exponent-notation thresholds. Exact for the entire double
  range; ~10-100× slower than the JVM path — only for edge ranges.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def js_num(col: Column | str) -> Column:
    """JS number formatting, JVM fast path (codegen-friendly)."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("double").cast("string")
    return F.regexp_replace(s, r"\.0$", "")


def _js_format_scalar(x: float) -> str:
    """ECMA-262 Number::toString(10) for one finite double."""
    if x != x:  # NaN
        return "NaN"
    if x == float("inf"):
        return "Infinity"
    if x == float("-inf"):
        return "-Infinity"
    if x == 0:
        return "0"
    r = repr(x)  # shortest round-trip decimal, Python flavor
    mantissa, exp = (r.split("e") + ["0"])[:2] if "e" in r else (r, "0")
    e = int(exp)
    ax = abs(x)
    if 1e-6 <= ax < 1e21:
        # JS prints positional in this range; expand any Python
        # scientific form and trim the trailing '.0'.
        if e != 0:
            digits = mantissa.replace(".", "").lstrip("-")
            sign = "-" if x < 0 else ""
            point = (1 if "." not in mantissa else mantissa.index(".")) + e
            # normalize: digits with an implied decimal point after `point`
            intpart = mantissa.lstrip("-").split(".")[0]
            point = len(intpart) + e
            if point <= 0:
                out = sign + "0." + "0" * (-point) + digits.rstrip("0")
            elif point >= len(digits):
                out = sign + digits + "0" * (point - len(digits))
            else:
                frac = digits[point:].rstrip("0")
                out = sign + digits[:point] + ("." + frac if frac else "")
            return out
        return mantissa[:-2] if mantissa.endswith(".0") else mantissa
    # JS scientific: d.dddde±e with no leading zero in the exponent
    if e == 0:
        # Python printed positionally but JS wants scientific (|x|>=1e21
        # never reaches here positionally; |x|<1e-6 can: e.g. repr(1e-7))
        digits = mantissa.lstrip("-").replace(".", "").lstrip("0")
        first = mantissa.lstrip("-")
        if "." in first:
            ip, fp = first.split(".")
            if ip != "0":
                e = len(ip) - 1
            else:
                lead = len(fp) - len(fp.lstrip("0"))
                e = -(lead + 1)
        else:
            e = len(first) - 1
        mant = digits[0] + ("." + digits[1:].rstrip("0") if digits[1:].rstrip("0") else "")
        return ("-" if x < 0 else "") + mant + ("e+" if e >= 0 else "e-") + str(abs(e))
    mant = mantissa[:-2] if mantissa.endswith(".0") else mantissa
    return mant + ("e+" if e >= 0 else "e-") + str(abs(e))


@pandas_udf(StringType())
def _js_num_udf(s):  # type: ignore[no-untyped-def]
    return s.map(lambda v: None if v is None else _js_format_scalar(float(v)))


def js_num_exact(col: Column | str) -> Column:
    """JS number formatting, exact over the full double range."""
    c = F.col(col) if isinstance(col, str) else col
    return _js_num_udf(c.cast("double"))
