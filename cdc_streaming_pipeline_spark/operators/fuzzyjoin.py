"""Exact edit-distance (fuzzy) join via prefix-filtered q-gram blocking.

Record linkage / entity resolution needs ``JOIN ON edit_distance(a, b)
<= d`` — which no equi-join expresses and a cross join cannot survive at
scale (10^9 × 10^9 comparisons). This module implements the standard
exact decomposition (the AllPairs/PPJoin family, reduced to what the
engine needs):

1. **Filter** (complete, never drops a true pair): an edit operation
   touches at most ``q`` of a string's q-grams, so two strings within
   distance ``d`` share at least ``|S| − q·d`` distinct grams — and by
   the prefix-filter theorem their ``q·d + 1`` globally-RAREST grams
   must intersect. Each side therefore emits only its q·d+1 rarest
   grams as join signatures (global gram frequencies from one
   aggregate), the candidate set is the signature equi-join — an
   inverted-index join whose volume is output-proportional, not
   quadratic — plus the free length window ``|len(a) − len(b)| ≤ d``.
2. **Verify** (exact): surviving candidates run JVM-side
   ``F.levenshtein`` (whole-stage codegen, no Python) and keep
   ``<= d``.

Contract: a string must own at least ``q·d + 1`` DISTINCT grams for the
rarest-gram signature to be complete (a shorter string could lose every
shared gram to d edits). Strings below the bound are routed through an
exact short-string path: a broadcast cross join inside the length
window — by construction those strings are short (< ~q·(d+1)+q−1
chars) and a vanishing fraction of real name/title corpora; the
operator never silently drops them.

Scale notes: one gram-frequency aggregate (shuffle on gram), one
per-string window over ≤ len(s) rows (per-string bounded, never a
corpus-wide key), one signature equi-join (shuffle on gram; skew is
bounded BECAUSE frequent grams are exactly what prefix filtering
excludes from signatures), one verify pass. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grams(col, q: int):
    """Distinct q-gram set of ``lower(col)`` — pure JVM HOFs; a string
    shorter than ``q`` yields itself as its single gram."""
    s = F.lower(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s) - q + 1, F.lit(1))),
            lambda i: s.substr(i, F.lit(q)),
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_val: str,
    right_id: str,
    right_val: str,
    max_distance: int = 2,
    q: int = 3,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein(left_val, right_val)
    <= max_distance`` — exact, via prefix-filtered q-gram blocking (see
    module docstring). Returns (l_id, r_id, l_val, r_val, edit_dist)."""
    d = max_distance
    sig_size = q * d + 1

    def side(df: DataFrame, id_col: str, val_col: str, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{tag}_id"),
            F.col(val_col).alias(f"{tag}_val"),
            _grams(F.col(val_col), q).alias("_grams"),
            F.length(val_col).alias(f"_{tag}_len"),
        )

    L = side(left, left_id, left_val, "l")
    R = side(right, right_id, right_val, "r")

    # global gram document frequencies — rarest-first ordering is what
    # makes the signature join skew-proof (frequent grams never become
    # join keys)
    freq = (
        L.select(F.explode("_grams").alias("gram"))
        .unionByName(R.select(F.explode("_grams").alias("gram")))
        .groupBy("gram")
        .agg(F.count("*").alias("_freq"))
    )

    def signatures(s: DataFrame, tag: str) -> DataFrame:
        g = s.select(f"{tag}_id", F.explode("_grams").alias("gram")).join(freq, "gram")
        w = Window.partitionBy(f"{tag}_id").orderBy(
            F.col("_freq").asc(), F.col("gram").asc()
        )
        return (
            g.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= sig_size)
            .select(f"{tag}_id", "gram")
        )

    # strings below the gram bound go through the exact broadcast
    # fallback; everything else through the signature join
    l_short = L.filter(F.size("_grams") < sig_size)
    r_short = R.filter(F.size("_grams") < sig_size)
    l_main = L.filter(F.size("_grams") >= sig_size)
    r_main = R.filter(F.size("_grams") >= sig_size)

    cand = (
        signatures(l_main, "l")
        .join(signatures(r_main, "r"), "gram")
        .select("l_id", "r_id")
        .distinct()
    )
    main_pairs = cand.join(l_main.select("l_id", "l_val", "_l_len"), "l_id").join(
        r_main.select("r_id", "r_val", "_r_len"), "r_id"
    )
    # short-left × all-right, plus main-left × short-right (short×short
    # pairs are covered by the first term: R includes r_short). The
    # broadcast is CONTRACT-BOUNDED, and the contract is enforced, not
    # assumed: the short cohorts are counted (two tiny aggregate jobs)
    # and the operator refuses rather than broadcast a data-scaled frame
    # (the unbounded-broadcast failure family).
    n_short_l = l_short.count()
    n_short_r = r_short.count()
    max_short = 100_000
    if n_short_l > max_short or n_short_r > max_short:
        raise ValueError(
            f"short-string cohort too large for the exact broadcast "
            f"fallback ({n_short_l} left / {n_short_r} right rows under "
            f"{sig_size} distinct grams); lower q/max_distance or "
            f"pre-filter degenerate strings"
        )
    short_pairs = (
        F.broadcast(l_short.select("l_id", "l_val", "_l_len"))
        .crossJoin(R.select("r_id", "r_val", "_r_len"))
        .unionByName(
            l_main.select("l_id", "l_val", "_l_len").crossJoin(
                F.broadcast(r_short.select("r_id", "r_val", "_r_len"))
            )
        )
    )
    if n_short_l == 0 and n_short_r == 0:
        short_pairs = short_pairs.limit(0)  # skip both empty cross joins
    return (
        main_pairs.unionByName(short_pairs)
        .filter(F.abs(F.col("_l_len") - F.col("_r_len")) <= d)
        .withColumn("edit_dist", F.levenshtein("l_val", "r_val"))
        .filter(F.col("edit_dist") <= d)
        .select("l_id", "r_id", "l_val", "r_val", "edit_dist")
    )
