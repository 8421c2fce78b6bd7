"""Shuffle-planning diagnostics: the reports an operator reads BEFORE
running a big join/aggregation at scale.

``key_skew_report`` — per-key weight of the would-be shuffle: the heavy
hitters that decide between a plain hash join, AQE skew-split, or manual
salting (operators/joins.py:salted_join). One groupBy on the key (the
same shuffle the real job would do, minus the payload) plus a broadcast
1-row total.

``join_cardinality`` — exact equi-join output size WITHOUT materializing
the join: |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k). Two key-histogram aggregates
and a join of histograms (keys only — at 100 TB this runs on two
columns, never the payload), giving the number that decides whether the
real join is even runnable before paying for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Top-N heaviest keys with count, share of all rows, and the skew
    factor (key count / mean key count — >> 1 means one reducer drags)."""
    counts = df.groupBy(F.col(key).alias("key")).agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.avg("cnt").alias("_mean")
    )
    # distributed top-N (TakeOrderedAndProject — per-partition heaps, no
    # global sort of the key histogram), THEN rank over the ≤ top_n rows
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            F.col("key").cast("string").alias("key"),
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 4).alias("share"),
            F.round(F.col("cnt") / F.col("_mean"), 2).alias("skew_factor"),
        )
    )


def join_cardinality(
    a: DataFrame, a_key: str, b: DataFrame, b_key: str
) -> DataFrame:
    """Exact inner-equi-join cardinality from the two key histograms."""
    ha = a.groupBy(F.col(a_key).alias("k")).agg(F.count("*").alias("ca"))
    hb = b.groupBy(F.col(b_key).alias("k")).agg(F.count("*").alias("cb"))
    return ha.join(hb, "k").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("n_join_rows"),
        F.count("*").alias("n_matching_keys"),
        F.max(F.col("ca") * F.col("cb")).alias("max_key_contribution"),
    )
