"""Merge scale evidence: partition-pruned CDC merge cost must track the
BATCH (touched buckets), not the snapshot size.

Builds synthetic bucket-partitioned snapshots of increasing row counts,
then merges an identical constant-size batch (keys confined to a handful of
buckets) into each and reports wall time. If the merge were reading or
rewriting the whole snapshot, time would grow with snapshot size; pruned
correctly, it stays ~flat — the property that makes the op viable when the
snapshot is 100 TB and a micro-batch touches 0.1% of buckets.

Usage: python tools/merge_scale.py [sizes ...]   (default: 200000 2000000)
Emits one line per size: snapshot rows, init seconds, merge seconds,
touched buckets.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.merge import (
    init_snapshot,
    merge_cdc_batch,
    read_snapshot,
)
from cdc_streaming_pipeline_spark.session import get_spark

N_BUCKETS = 256
BATCH_KEYS = 2000  # constant across snapshot sizes


def synth_events(spark, n_rows: int, lsn_base: int):
    return (
        spark.range(n_rows)
        .repartition(32)
        .select(
            F.col("id"),
            F.lit("t").alias("_table"),
            F.concat(F.lit("v"), (F.col("id") % 97).cast("string")).alias("payload"),
            F.lit("c").alias("_op"),
            F.lpad((F.col("id") + lsn_base).cast("string"), 14, "0").alias("_lsn"),
            F.lit(None).cast("string").alias("_deleted"),
        )
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 2_000_000]
    spark = get_spark("merge_scale")
    for n in sizes:
        snap = os.path.join(tempfile.gettempdir(), f"merge_scale_{n}")
        shutil.rmtree(snap, ignore_errors=True)
        t0 = time.monotonic()
        init_snapshot(
            synth_events(spark, n, 0), snap, key_cols=["id", "_table"], n_buckets=N_BUCKETS
        )
        t_init = time.monotonic() - t0
        # constant-size batch: contiguous key range -> spread across buckets
        # by hash; measure touched count from the return value
        batch = synth_events(spark, BATCH_KEYS, 10 * n).limit(BATCH_KEYS)
        # confine the batch to few buckets by reusing a small key range
        batch = batch.withColumn("id", F.col("id") % 64)
        t0 = time.monotonic()
        touched = merge_cdc_batch(
            spark, snap, batch, key_cols=["id", "_table"], n_buckets=N_BUCKETS
        )
        t_merge = time.monotonic() - t0
        total = read_snapshot(spark, snap).count()
        print(
            f"snapshot_rows={n} init_s={t_init:.2f} merge_s={t_merge:.2f} "
            f"touched_buckets={len(touched)}/{N_BUCKETS} state_rows={total}",
            flush=True,
        )
        shutil.rmtree(snap, ignore_errors=True)


if __name__ == "__main__":
    main()
