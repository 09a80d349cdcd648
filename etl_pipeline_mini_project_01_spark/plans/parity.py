"""Oracle-parity helpers: expressions that produce bit-identical values in
Spark and DuckDB.

Double addition is not associative, so a plain SUM(double) depends on
partitioning and would flap the driver's value-hash. Every float aggregate
therefore goes through a DECIMAL(18,4) cast (exact, order-insensitive sum)
and comes back as DOUBLE only at the end. Averages divide the decimal-exact
sum (as double) by the count in IEEE double math - deterministic on both
engines. We do NOT round doubles (round-at-tie differs between engines);
rounding happens on decimals only, where both engines round half away from
zero.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dsum(col: str | Column, alias: str | None = None) -> Column:
    """Order-insensitive SUM of a double column, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: str | Column, alias: str | None = None) -> Column:
    """AVG as decimal-exact sum / count, computed in IEEE double math."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))
    return out.alias(alias) if alias else out


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"
