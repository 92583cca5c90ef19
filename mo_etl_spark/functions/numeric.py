"""Exact-arithmetic helpers for oracle-stable float aggregates.

Why: double summation order differs between Spark partials and DuckDB
(and between two Spark runs with different partitioning), so
``sum(double)`` is only reproducible to ~1e-5 at sf0.01 — enough to
break the driver's value-hash.  The corpus money columns are
cents-precision (FIXTURES.md), so we lift them to exact BIGINT cents,
aggregate integers (associative => partition-order independent), and
drop back to double at the very end.  The identical transform is
emitted in the oracle SQL, giving bit-equal results.

At 100 TB the same trick holds (sum of int64 cents over 10^12 rows of
~1e7 cents ≈ 1e19 — near int64 edge, so the scale path would sum to
DECIMAL(38,0) instead; Spark does this automatically for
``sum(decimal)``).  jx numbers are doubles (SURVEY.md §1.2) so the
public API stays double-typed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str, scale: int = 2) -> Column:
    """Lift a cents-precision DOUBLE to exact integer minor units.

    Spark round() is HALF_UP, DuckDB rounds half-away-from-zero — equal
    for the non-negative money columns here, and the *100 product is
    the same IEEE op in both engines.
    SQL twin: ``CAST(round(x * 100) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**scale)).cast("long")


def money(int_col: Column, scale: int = 2) -> Column:
    """Integer minor units back to double.  SQL twin: ``CAST(x AS DOUBLE)/100.0``."""
    return int_col.cast("double") / float(10**scale)


def stable_sum_money(col: Column | str) -> Column:
    """Exact, partition-order-independent sum of a cents-precision column.

    SQL twin: ``CAST(sum(CAST(round(x*100) AS BIGINT)) AS DOUBLE)/100.0``.
    """
    return money(F.sum(cents(col)))


def stable_avg(col: Column | str, ndigits: int = 6) -> Column:
    """Average of a cents-precision column: exact integer sum, then one
    double division (same op order as the SQL twin), rounded.

    SQL twin:
    ``round(CAST(sum(CAST(round(x*100) AS BIGINT)) AS DOUBLE)/100.0/count(x), <ndigits>)``
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(money(F.sum(cents(c))) / F.count(c), ndigits)
