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

  Java's scientific-notation thresholds ([1e-3, 1e7) vs JS's
  [1e-6, 1e21)) are rewritten JVM-side to the JS notation over the
  FULL double range — see the ``js_num`` docstring. Remaining
  caveat: Java 17's pre-Ryū ``Double.toString`` emits one extra
  significant digit for ~0.2% of doubles with |x| ≳ 1e16 (e.g.
  215556435655560672 vs shortest 21555643565556067e1) and for the
  smallest subnormals (4.9e-324 vs 5e-324); JDK ≥ 19 removes the
  divergence. ``js_num_exact`` is byte-exact there if needed —
  finance-range data never is.

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
    """JS number formatting — pure JVM expressions, full double range.

    Java's ``Double.toString`` and ECMA-262 agree on the shortest
    round-trip DIGITS but not the NOTATION: Java goes scientific
    outside [1e-3, 1e7), JS outside [1e-6, 1e21). So on top of the
    trailing-``.0`` strip we rewrite Java's ``d.dddEn``:

    - ``-6 <= n <= 20`` → positional expansion (JS prints plainly),
    - otherwise → JS exponent form ``d.ddde±n`` (lowercase e, signed
      exponent, no ``.0`` mantissa).

    All string surgery is concat/substring/repeat on codegen-friendly
    built-ins — no UDF on the serialization hot path (ADVICE r1).
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    s = c.cast("string")
    neg = s.startswith("-")
    sign = F.when(neg, F.lit("-")).otherwise(F.lit(""))
    body = F.regexp_replace(s, r"^-", "")

    # --- scientific input: Java mantissa is always d[.ddd] with one
    # leading digit and no trailing zeros (except the literal ".0").
    mant = F.substring_index(body, "E", 1)
    exp = F.substring_index(body, "E", -1).cast("int")
    intd = F.substring_index(mant, ".", 1)
    frac = F.substring_index(mant, ".", -1)
    frac_clean = F.when(frac == "0", F.lit("")).otherwise(frac)
    digits = F.concat(intd, frac_clean)
    flen = F.length(frac_clean)

    pos_expanded = (
        F.when(exp >= flen, F.concat(digits, F.repeat(F.lit("0"), exp - flen)))
        .when(
            exp >= 0,
            F.concat(
                F.substring(digits, F.lit(1), exp + 1),
                F.lit("."),
                F.substring(digits, exp + 2, F.length(digits)),
            ),
        )
        .otherwise(F.concat(F.lit("0."), F.repeat(F.lit("0"), -exp - 1), digits))
    )
    js_sci = F.concat(
        intd,
        F.when(flen > 0, F.concat(F.lit("."), frac_clean)).otherwise(F.lit("")),
        F.when(exp >= 0, F.lit("e+")).otherwise(F.lit("e-")),
        F.abs(exp).cast("string"),
    )
    from_sci = F.when((exp >= -6) & (exp <= 20), pos_expanded).otherwise(js_sci)

    return (
        F.when(c == 0.0, F.lit("0"))  # covers -0.0: JS String(-0) is "0"
        .when(body.contains("E"), F.concat(sign, from_sci))
        .otherwise(F.regexp_replace(s, r"\.0$", ""))
    )


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
