"""Bounded-memory heavy hitters: Misra-Gries candidates + exact recount.

The exact way to find items with frequency ≥ θ is a full groupBy — one
shuffle of EVERY distinct key, which at 100 TB means shuffling billions of
group keys to find the dozen hot ones. The production two-pass pattern
avoids that:

1. **Candidate pass (this module's point)**: each partition runs a
   Misra-Gries summary with ``k`` counters — O(k) memory regardless of
   partition size, no shuffle. MG's deficit bound (each surviving
   counter undercounts its item by at most n_p/k, and an item with
   partition frequency > n_p/k always retains a positive counter) gives
   the UNION of per-partition survivors a global guarantee: any item
   with total frequency f > n/k must have f_p > n_p/k in at least one
   partition (otherwise f = Σf_p ≤ Σn_p/k = n/k), so it survives there.
   The candidate set is ≤ k × n_partitions ids — tiny — and is a
   PROVABLE superset of every item at or above the n/k threshold.
2. **Recount pass**: exact counts for candidates only (broadcast
   semi-join + groupBy over the shortlisted keys), filter to the
   threshold. Output is exactly the true heavy-hitter set with exact
   counts — deterministic regardless of arrival order (MG survivors
   depend on order; the recount erases that), which is what makes the
   op SQL-oracle-certifiable.

Shuffle ledger: pass 1 none; pass 2 shuffles only rows matching ≤
k × n_partitions keys. vs the naive full groupBy: the distinct-key
shuffle is gone.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Per-partition Misra-Gries survivors, unioned + distinct.

    Guaranteed superset of every item with global frequency > n/k
    (proof in the module docstring). At most k × n_partitions rows.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all; drop zeros (the classic MG step,
                    # amortized O(1) via dict rebuild)
                    counters = {i: c - 1 for i, c in counters.items() if c > 1}
        if counters:
            yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(summarize, df.select(col).schema).distinct()


def heavy_hitters(
    df: DataFrame, col: str, min_count: int, k: int = 64
) -> DataFrame:
    """Exact heavy hitters via MG shortlist + recount.

    ``min_count`` must be ≥ n/k for the MG superset guarantee to cover
    it (pass a larger ``k`` for a lower threshold). Returns
    (col, n_occurrences) — identical to the full-groupBy answer.
    """
    cand = mg_candidates(df, col, k=k)
    return (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
