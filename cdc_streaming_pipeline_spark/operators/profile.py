"""Column profiling — data-quality stats the reference's Hive consumers run
ad hoc (`SELECT COUNT(*), COUNT(DISTINCT ...)` spot checks over the landed
wide table, cdc_pipeline_dag.py:360-383), packaged as one operator.

One aggregate pass over the input computing, per requested column:
null count, exact distinct count, min, max (min/max taken in the column's
native type, then rendered as string so heterogeneous columns stack into one
long-form result).

Scale notes
-----------
* Multiple exact COUNT(DISTINCT) in one aggregate makes Catalyst plan an
  Expand (input × ~n_cols). That is the inherent cost of exactness; for
  100 TB health checks swap `exact_distinct=False` to get
  approx_count_distinct (HLL partials, no Expand, one pass) — same output
  schema, rsd≈0.05.
* Everything else (nulls/min/max) is a plain partial-aggregable pass.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """Long-form profile: one row per column, sorted by column name.

    Output: (col_name, n_rows, n_nulls, n_distinct, min_val, max_val) with
    min/max computed in native type order and cast to string for display.
    """
    cols = cols or df.columns
    distinct_fn = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct_fn(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = list(
        chain.from_iterable(
            (
                F.lit(c),
                F.col(f"{c}__nulls"),
                F.col(f"{c}__distinct"),
                F.col(f"{c}__min"),
                F.col(f"{c}__max"),
            )
            for c in cols
        )
    )
    return (
        wide.select(
            F.col("__n").alias("n_rows"),
            F.stack(F.lit(len(cols)), *stack_args).alias(
                "col_name", "n_nulls", "n_distinct", "min_val", "max_val"
            ),
        )
        .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
        .orderBy("col_name")
    )
