"""Data-skipping scale evidence: a selective range predicate on the
bucketed table should cost I/O proportional to the files that can
contain it, not the snapshot — once per-file stats exist AND the layout
makes them narrow (clustered compaction).

Builds a 2M-row BucketedTxLogTable (64 buckets, stats on ``amount``),
then measures a 0.05%-selectivity range count three ways:
  1. read_state().filter(...)      — full scan, no pruning
  2. read_state_where pre-cluster  — stats exist, hash layout: ranges
                                     span the domain, ~zero pruning
  3. read_state_where post clustered compaction — range-split files,
                                     reads ~1/selectivity-bucket slice

Usage: python tools/skipping_scale.py [n_rows]   (default 2000000)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.session import get_spark
from cdc_streaming_pipeline_spark.sources.txlog import BucketedTxLogTable


def synth(spark, n_rows: int):
    return (
        spark.range(n_rows)
        .repartition(32)
        .select(
            F.col("id"),
            # value uncorrelated with the key hash: worst case for
            # hash-layout stats, the case clustering exists to fix
            F.pmod(F.xxhash64(F.col("id"), F.lit("amt")), F.lit(1_000_000))
            .cast("double")
            .alias("amount"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            F.lit("r").alias("_op"),
            F.lpad(F.col("id").cast("string"), 14, "0").alias("_lsn"),
            F.lit(None).cast("string").alias("_deleted"),
        )
    )


def timed_count(df) -> tuple[float, int]:
    t0 = time.monotonic()
    n = df.count()
    return time.monotonic() - t0, n


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("skipping_scale")
    path = os.path.join(tempfile.gettempdir(), f"skipping_scale_{n}")
    shutil.rmtree(path, ignore_errors=True)
    t = BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=64, stats_cols=["amount"]
    )
    t0 = time.monotonic()
    t.init_from_events(synth(spark, n))
    print(f"init {n} rows @64 buckets (+stats job): {time.monotonic() - t0:.2f}s",
          flush=True)

    LO, HI = 500_000.0, 500_500.0  # ~0.05% of the value domain

    s, c = timed_count(t.read_state().filter(F.col("amount").between(LO, HI)))
    print(f"full-scan filter: {s:.2f}s ({c} rows)")

    df, r, tot = t.read_state_where("amount", LO, HI)
    s, c2 = timed_count(df)
    print(f"read_state_where pre-cluster: {s:.2f}s, files {r}/{tot} ({c2} rows)")

    t0 = time.monotonic()
    t.compact_buckets(min_files=1, cluster_cols=["amount"], cluster_parts=256)
    print(f"clustered compaction (256 range slices): {time.monotonic() - t0:.2f}s")

    df, r, tot = t.read_state_where("amount", LO, HI)
    s, c3 = timed_count(df)
    print(f"read_state_where post-cluster: {s:.2f}s, files {r}/{tot} ({c3} rows)")
    assert c == c2 == c3, (c, c2, c3)

    # dictionary stats: equality probe on a 16-value categorical — range
    # stats are useless (every file spans the alphabet) until a
    # status-clustered compaction makes files value-pure
    t2 = BucketedTxLogTable(
        spark,
        path + "_cat",
        key_cols=["id"],
        n_buckets=64,
        stats_cols=["status"],
    )
    t2.init_from_events(
        synth(spark, n).withColumn(
            "status",
            F.concat(
                F.lit("st-"),
                F.pmod(F.xxhash64(F.col("id"), F.lit("cat")), F.lit(16)).cast(
                    "string"
                ),
            ),
        )
    )
    df, r, tot = t2.read_state_where_in("status", ["st-3"])
    s, ce = timed_count(df)
    print(f"equality probe pre-cluster: {s:.2f}s, files {r}/{tot} ({ce} rows)")
    t0 = time.monotonic()
    t2.compact_buckets(min_files=1, cluster_cols=["status"], cluster_parts=256)
    print(f"status-clustered compaction: {time.monotonic() - t0:.2f}s")
    df, r, tot = t2.read_state_where_in("status", ["st-3"])
    s, ce2 = timed_count(df)
    print(f"equality probe post-cluster: {s:.2f}s, files {r}/{tot} ({ce2} rows)")
    assert ce == ce2, (ce, ce2)
    shutil.rmtree(path + "_cat", ignore_errors=True)
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
