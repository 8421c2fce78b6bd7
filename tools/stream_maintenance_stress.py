"""Streaming-sink maintenance policy stress (r10 verdict #2 evidence).

Drives the SAME 50-micro-batch CDC stream (bootstrap + 49 hot-key
update waves, maxFilesPerTrigger=1, salting forced with a tiny
target_file_bytes) through ``bucketed_merge_stream_sink`` twice:

- policy OFF (max_files_per_bucket=None, no vacuum) — the r10 sink:
  salted files accrete per touched bucket, dead files accrete on disk;
- policy ON (max_files_per_bucket=2, vacuum every 10 batches) — the
  r11 sink: overgrown buckets fold back inside the same foreachBatch,
  debris is age-guard vacuumed.

Prints a markdown row per mode: live files (max per bucket / total),
parquet files on disk, and read_state() wall (min-of-3) at the end —
the read-amplification number the policy exists to bound.

Run: python tools/stream_maintenance_stress.py [n_waves]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

from cdc_streaming_pipeline_spark.session import get_spark
from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    resolve_snapshot_state,
)
from cdc_streaming_pipeline_spark.streaming.pipeline import bucketed_merge_stream_sink

SCHEMA = "id bigint, status string, _op string, _lsn string, _deleted string"


def put(src: str, name: str, rows) -> None:
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(
                json.dumps(dict(zip(("id", "status", "_op", "_lsn", "_deleted"), r)))
                + "\n"
            )


def drive(spark, root: str, n_waves: int, policy: bool) -> dict:
    src = os.path.join(root, "src")
    os.makedirs(src)
    table_path = os.path.join(root, "table")
    put(src, "w000.json", [(i, f"s{i}", "r", "0001", None) for i in range(200)])
    for w in range(1, n_waves + 1):
        k = w % 8
        put(src, f"w{w:03d}.json", [(k, f"w{w}", "u", f"{w + 1:04d}", None)])
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(src)
    )
    kw = (
        dict(max_files_per_bucket=2, vacuum_every=10,
             vacuum_retain_versions=5, vacuum_min_age_seconds=0.0)
        if policy
        else dict(max_files_per_bucket=None, vacuum_every=None)
    )
    q = (
        bucketed_merge_stream_sink(
            stream,
            table_path,
            os.path.join(root, "ckpt"),
            key_cols=["id"],
            n_buckets=8,
            target_file_bytes=512,
            **kw,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(900)

    t = BucketedTxLogTable(spark, table_path, key_cols=["id"], n_buckets=8)
    snap, bmap, _ = resolve_snapshot_state(t, t.latest_version())
    per_bucket: dict[int, int] = {}
    for f in snap:
        per_bucket[bmap[f]] = per_bucket.get(bmap[f], 0) + 1
    on_disk = glob.glob(os.path.join(table_path, "data", "stage-*", "*", "*.parquet"))
    on_disk += glob.glob(os.path.join(table_path, "data", "stage-*", "*.parquet"))
    wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        t.read_state().count()
        wall = min(wall, time.perf_counter() - t0)
    return {
        "mode": "policy ON" if policy else "policy OFF (r10)",
        "live_max_per_bucket": max(per_bucket.values()),
        "live_total": len(snap),
        "on_disk": len(on_disk),
        "read_state_wall_s": round(wall, 3),
        "versions": t.latest_version(),
    }


def main() -> int:
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 49
    spark = get_spark("stream_maint", cpus=8, shuffle_partitions=8)
    print("| sink | live files max/bucket | live files total | parquet on disk "
          "| read_state wall | log versions |")
    print("|---|---|---|---|---|---|")
    for policy in (False, True):
        root = tempfile.mkdtemp(prefix="stream_maint_")
        try:
            r = drive(spark, root, n_waves, policy)
            print(
                f"| {r['mode']} | {r['live_max_per_bucket']} | {r['live_total']} "
                f"| {r['on_disk']} | {r['read_state_wall_s']} s | {r['versions']} |"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
