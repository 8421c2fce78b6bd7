"""Scale evidence for the round's storage features: merge-on-read
DELETE vs copy-on-write, bloom point lookups, and change-feed
derivation cost — measured on a 2M-row bucketed table.

Sections (each prints one JSON line):
  1. delete_0.1pct     — delete_where (deletion vectors: metadata-only)
                         vs the copy-on-write equivalent (tombstone
                         merge rewriting every touched bucket): wall
                         seconds, bytes written, files rewritten; plus
                         the post-delete read tax (DV anti-join) vs the
                         pre-delete clean read.
  2. bloom_point_probe — one-key equality probe on a high-cardinality
                         column: files read and wall with bloom
                         sidecars vs the unpruned filter; sidecar build
                         cost and on-disk footprint at write time.
  3. cdf_touched_cost  — table_changes for a single-key merge version:
                         wall vs a full-table snapshot_diff (the
                         non-log-aware way to get the same answer).

Usage: python tools/dv_scale.py [n_rows]   (default 2000000)
"""

from __future__ import annotations

import glob
import json
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
    resolve_with_checkpoint,
    table_changes,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_BUCKETS = 64


def _staged_bytes(root: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(root, "stage-*", "**", "*.parquet"), recursive=True)
        + glob.glob(os.path.join(root, "stage-*", "*.parquet"))
    )


def _events(spark, n):
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") % 1_000_000).cast("double").alias("amount"),
            (F.col("id") * 37).alias("customer"),
            F.lit("r").alias("_op"),
            F.lpad(F.col("id").cast("string"), 12, "0").alias("_lsn"),
            F.lit(None).cast("string").alias("_deleted"),
        )
    )


def _fresh(spark):
    """Section isolation: a long local[32] session accumulates state
    (broadcast blobs pending GC-driven cleanup, shuffle files, codegen
    caches) that inflates LATER sections' walls up to ~10× — a
    local-mode measurement artifact, not an operator property (the
    same op isolated in a fresh session reproduces its true cost).
    Stop the session and start a clean one per section, with a small
    warmup so first-job costs don't masquerade as operator cost;
    tables reopen from their on-disk meta."""
    spark.stop()
    spark = get_spark("dv_scale")
    _events(spark, 100_000).groupBy((F.col("id") % 7)).count().collect()
    return spark


def main() -> None:
    spark = get_spark("dv_scale")
    root = tempfile.mkdtemp(prefix="dvscale-")
    out: dict[str, dict] = {}
    try:
        # JVM/codegen warmup so the plain-vs-bloom build comparison
        # isn't dominated by first-job costs
        _events(spark, 100_000).groupBy((F.col("id") % 7)).count().collect()

        # ---- build: two identical tables (DV path vs CoW path), one
        # with bloom sidecars to also price their build. Sidecars follow
        # the documented sizing rule (~10 bits per expected distinct
        # value): N/64 buckets ≈ 31k distinct customers per file →
        # bloom_bits = 2^20 (128 KiB/sidecar, gate 131k)
        t0 = time.time()
        t_dv = BucketedTxLogTable(
            spark, os.path.join(root, "dv"), key_cols=["id"],
            n_buckets=N_BUCKETS, stats_cols=["amount"],
        )
        t_dv.init_from_events(_events(spark, N))
        build_plain = time.time() - t0

        t0 = time.time()
        t_bloom = BucketedTxLogTable(
            spark, os.path.join(root, "bl"), key_cols=["id"],
            n_buckets=N_BUCKETS, stats_cols=["amount"],
            bloom_cols=["customer"], bloom_bits=1 << 20,
        )
        t_bloom.init_from_events(_events(spark, N))
        build_bloom = time.time() - t0
        bloom_disk = sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(t_bloom.data_dir, "_bloom", "*.bf"))
        )

        t_cow = BucketedTxLogTable(
            spark, os.path.join(root, "cow"), key_cols=["id"],
            n_buckets=N_BUCKETS, stats_cols=["amount"],
        )
        t_cow.init_from_events(_events(spark, N))
        data_bytes = _staged_bytes(t_cow.data_dir)

        # ---- 1. delete 0.1% (a 1000-wide amount band = ~0.1% of the
        # 1M-value domain), spread across every bucket by key hash —
        # the CoW worst case and the DV sweet spot
        spark = _fresh(spark)
        t_dv = BucketedTxLogTable(
            spark, os.path.join(root, "dv"), stats_cols=["amount"]
        )
        t_cow = BucketedTxLogTable(
            spark, os.path.join(root, "cow"), stats_cols=["amount"]
        )
        band = (F.col("amount") >= 500_000.0) & (F.col("amount") < 501_000.0)
        t0 = time.time()
        clean_count = t_dv.read_state().count()
        read_clean = time.time() - t0

        t0 = time.time()
        _, nf, nd = t_dv.delete_where(band)
        dv_wall = time.time() - t0
        dv_bytes = sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(t_dv.data_dir, "_dv", "*.dv*"))
        )
        t0 = time.time()
        dv_count = t_dv.read_state().count()
        read_dv = time.time() - t0

        doomed = t_cow.read_state().filter(band).select("id")
        tomb = doomed.select(
            "id",
            F.lit(None).cast("double").alias("amount"),
            F.lit(None).cast("long").alias("customer"),
            F.lit("d").alias("_op"),
            F.lit("9" * 12).alias("_lsn"),
            F.lit("true").alias("_deleted"),
        )
        before = _staged_bytes(t_cow.data_dir)
        t0 = time.time()
        _, touched = t_cow.merge_cdc_batch(tomb)
        cow_wall = time.time() - t0
        cow_bytes = _staged_bytes(t_cow.data_dir) - before
        out["delete_0.1pct"] = {
            "n_rows": N,
            "rows_deleted": nd,
            "dv": {
                "wall_s": round(dv_wall, 2),
                "bytes_written": dv_bytes,
                "files_rewritten": 0,
                "files_touched": nf,
            },
            "cow_tombstone_merge": {
                "wall_s": round(cow_wall, 2),
                "bytes_written": cow_bytes,
                "buckets_rewritten": len(touched),
            },
            "read_tax": {
                "clean_read_s": round(read_clean, 2),
                "dv_read_s": round(read_dv, 2),
                "counts": [clean_count, dv_count],
            },
            "table_bytes": data_bytes,
        }
        print(json.dumps({"delete_0.1pct": out["delete_0.1pct"]}))

        # ---- 1b. the same delete on an amount-CLUSTERED table: the
        # vectors land in only the overlapping slices, and the split
        # read (clean files scan plain, only dirty files pay the
        # anti-join) keeps the post-delete read at clean cost
        spark = _fresh(spark)
        t_cl = BucketedTxLogTable(
            spark, os.path.join(root, "cl"), key_cols=["id"],
            n_buckets=N_BUCKETS, stats_cols=["amount"],
        )
        t_cl.init_from_events(_events(spark, N))
        t_cl.compact_buckets(
            min_files=1, cluster_cols=["amount"], cluster_parts=N_BUCKETS * 2
        )
        t0 = time.time()
        cl_clean = t_cl.read_state().count()
        read_cl_clean = time.time() - t0
        t0 = time.time()
        _, nf_cl, nd_cl = t_cl.delete_where(band)
        cl_wall = time.time() - t0
        t0 = time.time()
        cl_count = t_cl.read_state().count()
        read_cl_dv = time.time() - t0
        out["delete_clustered"] = {
            "rows_deleted": nd_cl,
            "files_with_vectors": nf_cl,
            "files_total": len(resolve_with_checkpoint(t_cl)),
            "delete_wall_s": round(cl_wall, 2),
            "read_tax": {
                "clean_read_s": round(read_cl_clean, 2),
                "dv_read_s": round(read_cl_dv, 2),
                "counts": [cl_clean, cl_count],
            },
        }
        print(json.dumps({"delete_clustered": out["delete_clustered"]}))

        # ---- 2. bloom point probe: one present key, one absent
        spark = _fresh(spark)
        t_bloom = BucketedTxLogTable(
            spark, os.path.join(root, "bl"), stats_cols=["amount"],
            bloom_cols=["customer"], bloom_bits=1 << 20,
        )
        probe = 41_007 * 37
        t0 = time.time()
        full = t_bloom.read_state().filter(F.col("customer") == probe).count()
        full_wall = time.time() - t0
        t0 = time.time()
        df, fr, ft = t_bloom.read_state_where_in("customer", [probe])
        got = df.count()
        bloom_wall = time.time() - t0
        t0 = time.time()
        dfa, fra, fta = t_bloom.read_state_where_in("customer", [-12345])
        absent = dfa.count()
        absent_wall = time.time() - t0
        out["bloom_point_probe"] = {
            "present": {
                "files_read": fr,
                "files_total": ft,
                "wall_s": round(bloom_wall, 2),
                "rows": got,
            },
            "absent": {
                "files_read": fra,
                "wall_s": round(absent_wall, 2),
                "rows": absent,
            },
            "unpruned_filter": {"wall_s": round(full_wall, 2), "rows": full},
            "build_overhead_s": round(build_bloom - build_plain, 2),
            "build_plain_s": round(build_plain, 2),
            "sidecar_disk_bytes": bloom_disk,
        }
        print(json.dumps({"bloom_point_probe": out["bloom_point_probe"]}))

        # ---- 3. CDF cost for a single-key merge vs full snapshot_diff
        spark = _fresh(spark)
        t_dv = BucketedTxLogTable(
            spark, os.path.join(root, "dv"), stats_cols=["amount"]
        )
        pre_v = t_dv.latest_version()
        one = spark.createDataFrame(
            [(7, 123.0, 7 * 37, "u", "9" * 12, None)],
            "id bigint, amount double, customer bigint, _op string, _lsn string, _deleted string",
        )
        t_dv.merge_cdc_batch(one)
        t0 = time.time()
        feed_n = table_changes(t_dv, pre_v).count()
        cdf_wall = time.time() - t0

        from cdc_streaming_pipeline_spark.operators.cdc import snapshot_diff

        t0 = time.time()
        diff_n = snapshot_diff(
            t_dv.read_state(pre_v),
            t_dv.read_state(),
            ["id"],
            ["amount", "customer"],
        ).count()
        diff_wall = time.time() - t0
        out["cdf_touched_cost"] = {
            "feed_rows": feed_n,
            "cdf_wall_s": round(cdf_wall, 2),
            "snapshot_diff_rows": diff_n,
            "snapshot_diff_wall_s": round(diff_wall, 2),
            "files_in_table": len(resolve_with_checkpoint(t_dv)),
        }
        print(json.dumps({"cdf_touched_cost": out["cdf_touched_cost"]}))

        # ---- 4. WIDE delete: 25% of the table in one predicate — the
        # compliance-erasure shape the r12 verdict flagged. Positions
        # group per file and sidecars are composed EXECUTOR-side
        # (_dv_stage_executor_side); the driver's working set is ONE
        # metadata row per touched file (reported below), never a
        # position list — the path that used to collect ~500k longs
        # driver-side now collects 64 file rows.
        spark = _fresh(spark)
        t_dv = BucketedTxLogTable(
            spark, os.path.join(root, "dv"), stats_cols=["amount"]
        )
        wide = (F.col("amount") >= 100_000.0) & (F.col("amount") < 350_000.0)
        pre_wide_v = t_dv.latest_version()
        t0 = time.time()
        _, nf_w, nd_w = t_dv.delete_where(wide)
        wide_wall = time.time() - t0
        wide_dv_bytes = sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(t_dv.data_dir, "_dv", "*.dv"))
        )
        t0 = time.time()
        wide_count = t_dv.read_state().count()
        wide_read = time.time() - t0
        out["delete_wide_25pct"] = {
            "rows_deleted": nd_w,
            "pct_of_table": round(100.0 * nd_w / N, 1),
            "driver_metadata_rows": nf_w,  # == files touched, NOT positions
            "wall_s": round(wide_wall, 2),
            "dv_bytes_on_disk": wide_dv_bytes,
            "files_rewritten": 0,
            "post_read_s": round(wide_read, 2),
            "post_count": wide_count,
        }
        print(json.dumps({"delete_wide_25pct": out["delete_wide_25pct"]}))

        # ---- 4b. CDF read OF that wide-delete commit: table_changes
        # must expand the 500k dv_added positions without the driver
        # ever seeing one — past DV_BROADCAST_MAX_POSITIONS the .dva
        # sidecars are read with binaryFile and expanded executor-side
        # (_dv_added_relation → _dv_pairs_df), semi-joined distributed.
        # The count asserts the gate fired (n > threshold) and times
        # the consumer-side read the r13 verdict flagged as the last
        # driver position funnel.
        from cdc_streaming_pipeline_spark.sources.txlog import (
            DV_BROADCAST_MAX_POSITIONS,
        )

        post_wide_v = t_dv.latest_version()
        wide_entry = t_dv._read_entry(post_wide_v)
        wide_positions = sum(
            int(m.get("n", 0)) for m in wide_entry.get("dv_added", {}).values()
        )
        t0 = time.time()
        cdf_wide_n = table_changes(t_dv, pre_wide_v, post_wide_v).count()
        cdf_wide_wall = time.time() - t0
        out["cdf_read_wide_delete"] = {
            "dv_added_positions": wide_positions,
            "broadcast_threshold": DV_BROADCAST_MAX_POSITIONS,
            "distributed_path": wide_positions > DV_BROADCAST_MAX_POSITIONS,
            "feed_rows": cdf_wide_n,
            "cdf_wall_s": round(cdf_wide_wall, 2),
            "driver_working_set": "file-level sidecar paths only",
        }
        print(json.dumps({"cdf_read_wide_delete": out["cdf_read_wide_delete"]}))

        # ---- 5. merge-on-read UPDATE of a 0.1% band vs the CoW merge:
        # update_where appends postimage files + vectors (O(touched
        # rows)); the bucketed MERGE rewrites every touched bucket
        # (O(touched buckets) — all 64 here, since key-hash spreads the
        # band everywhere)
        spark = _fresh(spark)
        t_cl = BucketedTxLogTable(
            spark, os.path.join(root, "cl"), stats_cols=["amount"]
        )
        t_cow = BucketedTxLogTable(
            spark, os.path.join(root, "cow"), stats_cols=["amount"]
        )
        uband = (F.col("amount") >= 600_000.0) & (F.col("amount") < 601_000.0)
        before = _staged_bytes(t_cl.data_dir)
        t0 = time.time()
        _, nf_u, nu = t_cl.update_where(uband, {"amount": F.col("amount") + 0.25})
        upd_wall = time.time() - t0
        upd_bytes = _staged_bytes(t_cl.data_dir) - before
        new_images = t_cow.read_state().filter(uband).select(
            "id",
            (F.col("amount") + 0.25).alias("amount"),
            "customer",
            F.lit("u").alias("_op"),
            F.lit("8" * 12).alias("_lsn"),
            F.lit(None).cast("string").alias("_deleted"),
        )
        before = _staged_bytes(t_cow.data_dir)
        t0 = time.time()
        _, touched_u = t_cow.merge_cdc_batch(new_images)
        cow_u_wall = time.time() - t0
        cow_u_bytes = _staged_bytes(t_cow.data_dir) - before
        out["update_0.1pct"] = {
            "rows_updated": nu,
            "mor_update": {
                "wall_s": round(upd_wall, 2),
                "bytes_written": upd_bytes,
                "files_marked": nf_u,
                "buckets_rewritten": 0,
            },
            "cow_merge": {
                "wall_s": round(cow_u_wall, 2),
                "bytes_written": cow_u_bytes,
                "buckets_rewritten": len(touched_u),
            },
        }
        print(json.dumps({"update_0.1pct": out["update_0.1pct"]}))

        # ---- 6. CDC MERGE, merge-on-read vs rewrite: the same 0.1%
        # change batch (2k keys spread over all 64 buckets by hash —
        # the steady-state CDC worst case) landed via
        # merge_cdc_batch_mor (DV old images + append winners) vs the
        # bucket-rewrite merge. Bytes written is the headline: CoW
        # rewrites every touched bucket, MoR writes the batch.
        spark = _fresh(spark)
        t_bloom = BucketedTxLogTable(
            spark, os.path.join(root, "bl"), stats_cols=["amount"],
            bloom_cols=["customer"], bloom_bits=1 << 20,
        )
        t_cow = BucketedTxLogTable(
            spark, os.path.join(root, "cow"), stats_cols=["amount"]
        )
        batch = (
            spark.range(700_000, 702_000)
            .select(
                F.col("id"),
                F.lit(-1.0).alias("amount"),
                (F.col("id") * 37).alias("customer"),
                F.lit("u").alias("_op"),
                F.lit("7" * 12).alias("_lsn"),
                F.lit(None).cast("string").alias("_deleted"),
            )
        )
        before = _staged_bytes(t_bloom.data_dir)
        t0 = time.time()
        _, touched_m = t_bloom.merge_cdc_batch_mor(batch)
        mor_wall = time.time() - t0
        mor_bytes = _staged_bytes(t_bloom.data_dir) - before
        before = _staged_bytes(t_cow.data_dir)
        t0 = time.time()
        _, touched_c = t_cow.merge_cdc_batch(batch)
        cowm_wall = time.time() - t0
        cowm_bytes = _staged_bytes(t_cow.data_dir) - before
        out["merge_0.1pct"] = {
            "batch_rows": 2000,
            "mor_merge": {
                "wall_s": round(mor_wall, 2),
                "bytes_written": mor_bytes,
                "buckets_rewritten": 0,
                "buckets_touched": len(touched_m),
            },
            "cow_merge": {
                "wall_s": round(cowm_wall, 2),
                "bytes_written": cowm_bytes,
                "buckets_rewritten": len(touched_c),
            },
        }
        print(json.dumps({"merge_0.1pct": out["merge_0.1pct"]}))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
