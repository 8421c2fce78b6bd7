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


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
) -> DataFrame:
    """Exact ``probe LEFT SEMI JOIN build`` with a Bloom prefilter: the
    filter prunes at the scan; the (un-hinted) semi join of survivors
    restores exactness, so false positives cost shuffle bytes, never
    wrong rows."""
    bits = bloom_build(build.select(build_key), build_key, m_bits, k_hashes)
    pruned = bloom_prefilter(probe, probe_key, bits, m_bits, k_hashes)
    cond = pruned[probe_key] == build[build_key]
    return pruned.join(build, cond, "left_semi")
