"""Layout-evolution scale evidence: LAZY rebucket must cost one JSON
write — independent of table size — while the full-rewrite flavor pays
the whole table. At 100 TB the rewrite is one enormous transaction; the
lazy path amortizes it into merges that were happening anyway.

Builds a 2M-row BucketedTxLogTable at 64 buckets (the r11 rewrite
measurement's setup), then measures:
  1. rebucket(128, rewrite=False)   — metadata-only commit
  2. a 1-key merge post-lazy        — migrates its touched file in-line
  3. migrate_buckets(max_files=16)  — bounded catch-up steps to done
  4. a 1-key merge post-migration   — the halved-bucket payoff

Usage: python tools/rebucket_scale.py [n_rows]   (default 2000000)
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
from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    resolve_file_layouts,
    resolve_snapshot_state,
)


def synth(spark, n_rows: int):
    return (
        spark.range(n_rows)
        .repartition(32)
        .select(
            F.col("id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            F.lit("r").alias("_op"),
            F.lpad(F.col("id").cast("string"), 14, "0").alias("_lsn"),
            F.lit(None).cast("string").alias("_deleted"),
        )
    )


def one_key_merge(spark, t, key: int, lsn: str) -> float:
    batch = spark.createDataFrame(
        [(key, "upd", "u", lsn, None)],
        "id bigint, payload string, _op string, _lsn string, _deleted string",
    )
    t0 = time.monotonic()
    t.merge_cdc_batch(batch)
    return time.monotonic() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("rebucket_scale")
    path = os.path.join(tempfile.gettempdir(), f"rebucket_scale_{n}")
    shutil.rmtree(path, ignore_errors=True)
    t = BucketedTxLogTable(spark, path, key_cols=["id"], n_buckets=64)
    t0 = time.monotonic()
    t.init_from_events(synth(spark, n))
    print(f"init {n} rows @64 buckets: {time.monotonic() - t0:.2f}s", flush=True)

    print(f"1-key merge @64 (pre): {one_key_merge(spark, t, 11, '9' * 14):.2f}s")

    t0 = time.monotonic()
    t.rebucket(128, rewrite=False)
    lazy_s = time.monotonic() - t0
    print(f"LAZY rebucket 64->128 (metadata-only): {lazy_s * 1000:.1f}ms")

    print(
        f"1-key merge post-lazy (migrates in-line): "
        f"{one_key_merge(spark, t, 12, '9' * 13 + '8'):.2f}s"
    )

    t0 = time.monotonic()
    steps = files = 0
    while True:
        v, k = t.migrate_buckets(max_files=16)
        if v is None:
            break
        steps += 1
        files += k
    mig_s = time.monotonic() - t0
    print(
        f"migrate_buckets to done: {files} files in {steps} bounded steps, "
        f"{mig_s:.2f}s total ({mig_s / max(steps, 1):.2f}s/step)"
    )
    snap, _, _ = resolve_snapshot_state(t, t.latest_version())
    layouts = resolve_file_layouts(t, t.latest_version())
    assert all(layouts[f] == 128 for f in snap), "migration incomplete"

    print(
        f"1-key merge @128 (post): {one_key_merge(spark, t, 13, '9' * 13 + '7'):.2f}s"
    )
    cnt = t.read_state().count()
    assert cnt == n, (cnt, n)
    print(f"read_state rows intact: {cnt}")
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
