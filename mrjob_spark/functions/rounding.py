"""Engine-portable rounding.

``round(x, n)`` disagrees between engines at .5 boundaries: Spark rounds
HALF_UP on the shortest decimal representation of the double, DuckDB rounds
the scaled binary value. ``floor(x * 10^n + 0.5) / 10^n`` is pure IEEE-754
arithmetic, so Spark and any SQL oracle produce bit-identical results — all
query outputs round through these helpers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, n: int = 6) -> Column:
    """Portable round-half-up(ish) to n decimals (Spark side)."""
    if isinstance(col, str):
        col = F.col(col)
    f = 10**n
    return F.floor(col * F.lit(f) + F.lit(0.5)) / F.lit(f)


def sql_rnd(expr: str, n: int = 6) -> str:
    """DuckDB SQL equivalent of :func:`rnd`."""
    f = 10**n
    return f"(floor(({expr}) * {f} + 0.5) / {f})"


# ---------------------------------------------------------------------------
# Exact (decimal-backed) float aggregation.
#
# Floating-point addition is not associative, so SUM/AVG of doubles differs
# in the low bits between engines (different accumulation order) — and a
# low-bit difference at an exact rounding boundary flips the rounded value.
# Accumulating in DECIMAL(38,6) is exact and order-independent: both engines
# round each input double to the same 6-decimal value (ties can't occur:
# a double's exact binary expansion never lands on a decimal half-boundary),
# sum exactly, and cast back to the same double.
# ---------------------------------------------------------------------------

_DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent double sum via exact decimal accumulation."""
    if isinstance(col, str):
        col = F.col(col)
    return F.sum(col.cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent double average: exact decimal sum / non-null count."""
    if isinstance(col, str):
        col = F.col(col)
    return F.sum(col.cast(_DEC)).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return (
        f"(CAST(sum(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) / count({expr}))"
    )
