"""Round-10 stress evidence for the two r9 verdict defects in
BucketedTxLogTable.merge_cdc_batch:

1. ``meta``: merge METADATA cost must be flat in accumulated commit
   count. r9 resolved snapshot + bucket map by full log replay —
   O(table age) JSON entry reads per merge, invisible at the 2-commit
   gate fixture, real at CDC cadence (a merge per minute ≈ 500k
   commits/year). r10 routes resolution through checkpoints written
   every ``checkpoint_interval`` merges. This mode runs ~220 tiny
   merges and reports, at commit milestones, (a) log entries READ by
   the next merge (instrumented _read_entry — deterministic, no wall
   noise) and (b) merge wall. Run with --no-checkpoint for the r9
   behavior to see the linear growth the fix removes.

2. ``salt``: the per-bucket writer floor. r9 staged with
   repartition(bucket) = ONE task per touched bucket, so a 1-bucket
   merge of a 20M-row table was SLOWER (20.3s) than an 8-bucket one
   (12.2s) — a floor that rises with bucket size forever. r10 salts
   the staging key (sized by old-file bytes / target_file_bytes,
   capped by parallelism). This mode rebuilds the r9 setup (20M rows,
   64 buckets, 20k-row batch confined to 1 / 8 buckets) and reports
   both walls; done = 1-bucket <= 8-bucket.

Usage:
  python tools/txlog_merge_stress.py meta [n_merges] [--no-checkpoint]
  python tools/txlog_merge_stress.py salt [table_rows]
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

N_BUCKETS = 64
SCHEMA_COLS = ["id", "payload", "_op", "_lsn", "_deleted"]


def synth(spark, n_rows: int, lsn: int, op: str = "r"):
    return spark.range(n_rows).select(
        F.col("id"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        F.lit(op).alias("_op"),
        F.lpad(F.lit(lsn).cast("string"), 14, "0").alias("_lsn"),
        F.lit(None).cast("string").alias("_deleted"),
    )


def fresh_table(spark, name: str, **kw) -> BucketedTxLogTable:
    path = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(path, ignore_errors=True)
    return BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=N_BUCKETS, **kw
    )


def run_meta(n_merges: int, checkpoint: bool) -> None:
    spark = get_spark("txlog_meta_stress")
    interval = 10 if checkpoint else 0
    t = fresh_table(
        spark, f"txlog_meta_{interval}", checkpoint_interval=interval
    )
    t.init_from_events(synth(spark, 2_000_000, 1))
    milestones = {20, 60, 120, 200, n_merges}
    print(f"checkpoint_interval={interval} n_merges={n_merges}", flush=True)
    for i in range(1, n_merges + 1):
        batch = synth(spark, 1, i + 1, op="u").withColumn(
            "id", F.col("id") + F.lit(i % 1000)
        )
        probe = i in milestones
        reads: list[int] = []
        if probe:
            orig = t._read_entry

            def counting(v, _o=orig, _r=reads):
                _r.append(v)
                return _o(v)

            t._read_entry = counting
        t0 = time.monotonic()
        t.merge_cdc_batch(batch)
        wall = time.monotonic() - t0
        if probe:
            t._read_entry = orig
            print(
                f"commit={i} entries_read={len(reads)} "
                f"distinct={len(set(reads))} merge_s={wall:.2f}",
                flush=True,
            )


def run_salt(table_rows: int) -> None:
    spark = get_spark("txlog_salt_stress")
    from cdc_streaming_pipeline_spark.operators.merge import with_key_bucket

    # keys confined to exactly `k` buckets, 20k rows total
    def confined_batch(k_buckets: int, lsn: int):
        ids = (
            with_key_bucket(
                spark.range(table_rows).select("id"), ["id"], N_BUCKETS
            )
            .filter(F.col("_kb") < k_buckets)
            .limit(20_000)
            .select("id")
        )
        return ids.join(synth(spark, table_rows, lsn, op="u"), "id").select(
            *SCHEMA_COLS
        )

    for k in (1, 8):
        t = fresh_table(spark, f"txlog_salt_{k}")
        t0 = time.monotonic()
        t.init_from_events(synth(spark, table_rows, 1))
        t_init = time.monotonic() - t0
        batch = confined_batch(k, 2)
        batch = batch.localCheckpoint(eager=True)  # time ONLY the merge
        best = None
        for _ in range(3):  # same-volume repeats (bucket size unchanged)
            t0 = time.monotonic()
            v, touched = t.merge_cdc_batch(batch)
            wall = time.monotonic() - t0
            best = wall if best is None else min(best, wall)
        entry = t._read_entry(v)
        files_per_bucket = {}
        for b in entry["buckets"]:
            files_per_bucket[b] = sum(
                1 for x in entry["file_buckets"].values() if x == b
            )
        print(
            f"table_rows={table_rows} touched={len(touched)}/{N_BUCKETS} "
            f"init_s={t_init:.1f} merge_s={best:.2f} "
            f"new_files_per_touched_bucket={sorted(files_per_bucket.values())[:10]}",
            flush=True,
        )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "meta"
    if mode == "meta":
        n = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 220
        run_meta(n, checkpoint="--no-checkpoint" not in sys.argv)
    elif mode == "salt":
        rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
        run_salt(rows)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
