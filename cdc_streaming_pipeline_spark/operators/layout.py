"""Data-layout optimization: Z-order (Morton) multi-dimensional clustering.

The lakehouse technique behind `OPTIMIZE ... ZORDER BY`: interleave the
bits of several quantized columns into one sort key, range-partition on
it, and write — parquet row-group min/max stats then prune on EVERY
z-ordered dimension at once, instead of only the leading sort column.
At 100 TB this is the difference between "filters on (user, day) skip
most files" and "filters on day scan everything because the layout is
user-sorted".

The z-value itself is a pure JVM bit-arithmetic expression (built here by
unrolling the interleave loop into shift/and/or terms — whole-stage
codegen'd, no UDF), so computing it is a free map stage before the
range-partitioned write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of each column's low ``bits`` bits (column j
    contributes bit i to output bit i*len(cols)+j). Inputs must already be
    quantized to [0, 2**bits); the caller owns the quantization because it
    is data-dependent (mod for ids, day-of-month for dates, width buckets
    for continuous values)."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + j))
    return out


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The DuckDB twin of ``zorder_value`` — generated from the same loop
    so the two stay in lockstep (each masked bit becomes one OR term)."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)


def zorder_repartition(
    df: DataFrame, quantized: dict[str, Column], bits: int = 16, n_partitions: int | None = None
) -> DataFrame:
    """Attach the z-value and range-partition on it — the write-side step.
    Each output partition then covers a compact hyper-rectangle of the
    quantized dimensions, so its parquet min/max stats are tight on all of
    them. Range partitioning samples the z-value distribution (one extra
    job), which is the standard cost of this layout."""
    d = df
    for name, col in quantized.items():
        d = d.withColumn(name, col)
    d = d.withColumn("zvalue", zorder_value([F.col(n) for n in quantized], bits))
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    return d.repartitionByRange(n_partitions, "zvalue")
