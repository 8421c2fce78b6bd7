"""Cross-engine-deterministic aggregate helpers.

Summing doubles is order-dependent in the last bits; two engines (or two
cluster topologies!) can legitimately disagree after rounding. For money
aggregates the engine sums in exact decimal instead: the double input is
quantized once (deterministic per row), the decimal sum is exact and
associative (any partial-aggregation order gives the same result), then a
single cast back to double. This also makes results stable across
executor counts — a 100 TB correctness property, not just an oracle trick.

Rounding happens IN DECIMAL, before the final double cast: Spark's
round(double) goes through BigDecimal.valueOf (shortest-repr HALF_UP) while
DuckDB rounds the binary value, so .xx5-boundary sums can differ by 0.01
when rounding after the cast. Rounding the exact decimal is HALF_UP in both
engines — boundary-safe.

SQL equivalents (DuckDB oracle):
    dsum:  CAST(ROUND(SUM(CAST(x AS DECIMAL(28,6))), 2) AS DOUBLE)
    davg:  ROUND(CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x), 4)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"


def dsum(c: Column, scale: int = 2) -> Column:
    """Order-insensitive money sum: exact decimal accumulate → round in
    decimal (exact HALF_UP) → double."""
    return F.round(F.sum(c.cast(_DEC)), scale).cast("double")


def davg(c: Column, scale: int = 4) -> Column:
    """Order-insensitive mean with deterministic double division."""
    return F.round(F.sum(c.cast(_DEC)).cast("double") / F.count(c), scale)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(28,6))), {scale}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr}), {scale})"
