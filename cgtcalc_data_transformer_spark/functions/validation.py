"""Fail-fast validation as column expressions.

The reference throws on the first bad row with a contextual message
(e.g. `/root/reference/freetrade.js:133-147`, `/root/reference/ii.js:62-85`).
Spark's default is null-propagation; we reproduce abort-the-job
semantics with `raise_error` branches — the task exception fails the
job just as the reference's throw kills the process (SURVEY.md §4.3).

All helpers use `try_*` casts internally so they behave identically
whether the session runs ANSI mode or not (the correctness driver's
session config is not ours to choose).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def require(cond: Column, value: Column, message: Column | str) -> Column:
    """``value`` where ``cond`` holds, else abort the job.

    Distributed analog of the reference's `throw new Error(msg)`:
    the first violating row in any task fails the query.
    """
    msg = F.lit(message) if isinstance(message, str) else message
    return F.when(cond, value).otherwise(F.raise_error(msg))


def strict_double(col: Column | str, field_name: str) -> Column:
    """Cast to double; abort with the field name if unparseable.

    Mirrors `parseNumberStrict` (`/root/reference/fidelity.js:13-19`):
    NaN/non-numeric input is an error, not a null.
    """
    c = F.col(col) if isinstance(col, str) else col
    v = (c).try_cast("double")
    return require(
        v.isNotNull(),
        v,
        F.concat(F.lit(f"Invalid number for {field_name}: "), F.coalesce(c, F.lit("null"))),
    )


def money_double(col: Column | str) -> Column:
    """Strip ``£`` and thousands commas, then try-cast to double.

    NULL (not an error) when non-numeric — callers decide whether
    that's a skip (ii fee rows, `/root/reference/ii.js:46`) or a
    throw. Covers `parseNumber` (`/root/reference/bullionvault.js:11-13`)
    and the ii `£,`-stripping (`/root/reference/ii.js:66-67,83`).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), "[£,]", "").try_cast("double")
