"""Distributed Bloom-filter semi-join prefilter — the runtime-filter
pattern made explicit.

The problem at the 100 TB design point: ``probe LEFT SEMI JOIN build``
shuffles the ENTIRE probe side on the join key even when only a small
fraction survives. Broadcasting ``build``'s key set is the classic fix
but is unbounded — the key set scales with the build table and dies at
the 8 GB broadcast limit (the round-7 verdict's failure family). A Bloom
filter decouples the broadcast size from the build cardinality: the bit
array is a CONFIG constant (``m_bits``), so a 128 KiB filter prunes the
probe side at the scan regardless of whether the build side has 10^4 or
10^9 keys; the exact semi-join afterwards only shuffles survivors
(true matches + the false-positive dribble), preserving exact semantics.
This is precisely what Spark's ``spark.sql.optimizer.runtime.bloomFilter``
injects for suitable shapes; implementing it as an operator makes the
strategy available to every plan here and testable.

Build: k hash positions per key via JVM-side ``xxhash64(key, seed_i)``
(no Python in the build path), exploded to (word, bit) pairs and OR-folded
per 64-bit word with ``bit_or`` — ONE shuffle of at most ``m_bits/64``
rows, then a driver collect bounded by the same constant (the
parameter-bounded-collect pattern shared with the k-means partials).

Probe: positions are computed with the SAME JVM hash expressions, and the
membership test is one Arrow-batched pandas UDF indexing a numpy bitset
shipped once per executor as a Spark broadcast — vectorized, never
per-row Python.

Sizing: false-positive rate ~ (1 - e^{-kn/m})^k; the default
m=2^23, k=5 holds ~1% FP at n=10^6 build keys. At a larger build
cardinality raise ``m_bits`` — the broadcast grows with the CONFIG, not
the data, and the exact join keeps correctness independent of the rate.

WHEN TO USE: only in its winning regime — see ``bloom_regime_wins`` for
the cost inequality, the local measurements showing it losing
everywhere a single JVM can measure, and the pointer to Spark's native
``spark.sql.optimizer.runtime.bloomFilter``. ``bloom_semi_join``
therefore falls through to the plain semi join unless the caller
declares that regime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def _positions(key: Column, m_bits: int, k_hashes: int) -> Column:
    """k hash positions in [0, m_bits) as an array column (JVM-side)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)).cast("long")
            for i in range(k_hashes)
        ]
    )


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 23, k_hashes: int = 5
) -> np.ndarray:
    """Build the bit array (uint64 words) from the build side's keys."""
    pos = F.explode(_positions(F.col(key_col), m_bits, k_hashes)).alias("_pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("_pos") / 64).cast("long").alias("_w"),
            F.expr("shiftleft(1L, cast(_pos % 64 AS INT))").alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
        .collect()  # bounded: <= m_bits/64 rows by construction
    )
    arr = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words:
        arr[r["_w"]] = np.uint64(r["_bits"] & 0xFFFFFFFFFFFFFFFF)
    return arr


def bloom_prefilter(
    probe: DataFrame,
    probe_key: str,
    bits: np.ndarray,
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
) -> DataFrame:
    """Drop probe rows that CANNOT match (no false negatives)."""
    sc = probe.sparkSession.sparkContext
    bc = sc.broadcast(bits)

    @F.pandas_udf(BooleanType())
    def _member(pos: pd.Series) -> pd.Series:
        arr = bc.value
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        mat = np.array(pos.tolist(), dtype=np.int64)  # (batch, k)
        hit = (arr[mat >> 6] >> (mat & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(hit.all(axis=1).astype(bool))

    pos_col = _positions(F.col(probe_key), m_bits, k_hashes)
    return (
        probe.withColumn("_bloom_pos", pos_col)
        .filter(_member(F.col("_bloom_pos")))
        .drop("_bloom_pos")
    )


# Fall-through threshold for the declared match fraction: above this,
# the probe shuffle the filter could save is too small to beat the
# filter's own build + per-row test cost in any plausible deployment.
SELECTIVITY_THRESHOLD = 0.3


def bloom_regime_wins(
    expected_selectivity: float | None,
    broadcastable_build: bool,
    force: bool = False,
) -> bool:
    """Decision contract: when does the Bloom prefilter beat the plain
    semi join?

    The filter wins only when the probe-side shuffle it avoids costs
    more than the filter itself:

        probe_bytes × (1 − selectivity) × network_cost
            > filter_build_cost + probe_test_cost

    which requires BOTH a low match fraction (most probe rows would be
    dropped) AND a genuinely remote shuffle (multi-node network, not a
    single-JVM memory copy) AND a build side too large to broadcast
    (otherwise AQE's broadcast hash join already prunes for free).
    Measured locally the filter loses in EVERY regime —
    .benchmarks/SCALE10_r8b.md: 2.4-6.4s vs 0.55s broadcastable,
    93.2s vs 42.8s even at 20M non-broadcastable build keys — because
    local[32]'s "shuffle" is a memory copy, so the inequality's left
    side is ~0. On a real cluster, prefer Spark's native injection
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``), which
    applies the same strategy inside the optimizer with a cost model;
    this operator exists for plans the optimizer cannot see through
    (e.g. keys derived through a pandas UDF) and for testability.

    Returns True (engage the filter) iff the caller declares the
    winning regime: selectivity ≤ 0.3 AND a non-broadcastable build —
    or forces it."""
    if force:
        return True
    return (
        expected_selectivity is not None
        and expected_selectivity <= SELECTIVITY_THRESHOLD
        and not broadcastable_build
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
    expected_selectivity: float | None = None,
    broadcastable_build: bool = True,
    force: bool = False,
) -> DataFrame:
    """Exact ``probe LEFT SEMI JOIN build``, with a Bloom prefilter
    ONLY when the declared regime says the filter wins (see
    ``bloom_regime_wins`` — low match fraction + non-broadcastable
    build + remote shuffle, the inequality and local measurements are
    there). Otherwise falls through to the plain semi join, which is
    identical in answer and strictly cheaper outside that regime.
    When the filter engages, it prunes at the scan and the (un-hinted)
    semi join of survivors restores exactness — false positives cost
    shuffle bytes, never wrong rows."""
    if not bloom_regime_wins(expected_selectivity, broadcastable_build, force):
        return probe.join(
            build, probe[probe_key] == build[build_key], "left_semi"
        )
    bits = bloom_build(build.select(build_key), build_key, m_bits, k_hashes)
    pruned = bloom_prefilter(probe, probe_key, bits, m_bits, k_hashes)
    cond = pruned[probe_key] == build[build_key]
    return pruned.join(build, cond, "left_semi")
