"""Deterministic sampling operators for training-data pipelines.

Sampling a 100 TB corpus must be (a) single-pass, (b) reproducible across
reruns and engines, and (c) free of driver-side state. Both operators here
key off md5 of the row id — a portable hash every engine computes
identically (unlike engine-native hash functions), so the SAME sample
falls out of Spark, the DuckDB oracle, or any future backfill job.

- ``hash_bucket_sample``: rate-based sampling — keep rows whose
  hash-bucket (md5 mod 100) falls under the rate. Pure per-row predicate:
  no shuffle, pushes down to a scan filter, trivially composable with
  stratification by just reporting the stratum columns.
- ``topn_per_stratum``: fixed-size per-stratum sample ("deterministic
  reservoir"): rank rows within each stratum by their hash and keep the
  first n. One window shuffle on the stratum key; skewed strata are
  bounded by n on output (the sort itself is the cost — for extreme skew
  pre-filter with ``hash_bucket_sample`` at a safe over-sampling rate
  first, then rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def md5_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic, engine-portable hash bucket in [0, buckets): the
    first 8 hex digits of md5(id-as-string) interpreted as an integer.
    DuckDB twin: CAST(('0x' || substr(md5(x::VARCHAR), 1, 8)) AS UBIGINT) % n.
    """
    first8 = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return F.conv(first8, 16, 10).cast("long") % buckets


def hash_bucket_sample(
    df: DataFrame,
    rate_pct: int = 20,
    id_col: str = "doc_id",
    buckets: int = 100,
) -> DataFrame:
    """Keep rows whose md5 bucket < rate_pct — a reproducible ~rate_pct%
    sample with zero shuffle (the predicate evaluates at the scan)."""
    return df.withColumn("bucket", md5_bucket(F.col(id_col), buckets)).filter(
        F.col("bucket") < rate_pct
    )


PACK_SHARD_STRIDE = 1 << 40  # shard id lives above bit 40 of pack_id


def pack_sequences(
    df: DataFrame,
    capacity: int = 512,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    n_shards: int = 1,
) -> DataFrame:
    """Assign documents to fixed-capacity training sequences ("packing").

    Chunked-cumsum packing: documents are taken in id order and a sequence
    boundary falls wherever the running token total crosses a capacity
    multiple — the standard distributed approximation of greedy bin
    packing (exact greedy is inherently sequential; this is one window
    cumsum, deterministic, and within one oversize-doc of greedy's bin
    count). A document contributes at most ``capacity`` to the running
    total and is assigned to the bin of its START offset — so an oversize
    document fills (and may share) that bin rather than getting a private
    one; consumers clip/split it at load time. The id ordering makes packs
    stable across engines and reruns.

    ``n_shards > 1`` is the scale path: rows are sharded by the
    engine-portable md5 bucket of their id and the cumsum window is
    PARTITIONED by shard, so shards pack concurrently (no global sort, no
    single-task window — the plan shows no Exchange SinglePartition).
    pack_id = shard * 2^40 + shard-local bin, keeping ids disjoint without
    any cross-shard coordination; cum_tokens is shard-local. Bin-fill
    invariants are per-shard identical to the global form (asserted in
    tests/test_sampling_pack.py); per-shard bin counts add at most one
    underfull tail bin each, so choose n_shards ≈ cluster parallelism,
    orders of magnitude below the bin count at 100 TB.
    """
    eff = F.least(F.col(size_col), F.lit(capacity))
    shard = (
        md5_bucket(F.col(id_col), n_shards).cast("long")
        if n_shards > 1
        else F.lit(0).cast("long")
    )
    out = df.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col(id_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(eff).over(w)
    return out.withColumn(
        "pack_id",
        F.col("shard") * PACK_SHARD_STRIDE + F.floor((cum - eff) / capacity),
    ).withColumn("cum_tokens", cum)


def topn_per_stratum(
    df: DataFrame,
    strata: list[str],
    n: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """First n rows per stratum in md5-hash order (ties broken by id) —
    a fixed-size uniform-without-replacement sample per group whose
    membership is stable across engines and reruns."""
    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return df.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= n
    )
