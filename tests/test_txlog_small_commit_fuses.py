"""Small-commit fuse paths (r14 verdict #5 — MoR MERGE wall parity)
must be BIT-IDENTICAL to the plans they replace:

- bloom fuse: when a write's total staged bytes fit
  ``BLOOM_FUSE_TOTAL_BYTES``, the k position sets ride the stats
  aggregate and the sidecars are composed driver-side — same bitmaps,
  same pruning, no second scan job (``_bloom_job`` spied unused);
- DV staging gate: a trickle update/merge stages its deletion vectors
  driver-side (``_dv_stage_executor_side`` spied unused) with results
  identical to the executor-side path (threshold forced to 0)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.schemas import DELETED_COL, LSN_COL, OP_COL, pad_lsn
from cdc_streaming_pipeline_spark.sources import txlog
from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    resolve_file_blooms,
    resolve_file_dvs,
)


def _events(spark, n=200, lsn=1):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") * 7).alias("customer"),
        (F.col("id") % 50).cast("double").alias("amount"),
        F.lit("c").alias(OP_COL),
        pad_lsn(F.lit(lsn)).alias(LSN_COL),
        F.lit(None).cast("string").alias(DELETED_COL),
    )


def _bloom_bitmaps(t):
    """{column: multiset of sidecar bitmap bytes} for the live files."""
    out: dict[str, list[bytes]] = {}
    for _, cols in resolve_file_blooms(t).items():
        for c, meta in cols.items():
            if meta:
                out.setdefault(c, []).append(t.blob.get(meta["path"]))
    return {c: sorted(v) for c, v in out.items()}


def test_bloom_fuse_bitmaps_match_two_job_plan(spark, tmp_path, monkeypatch):
    kw = dict(
        key_cols=["id"], n_buckets=4, bloom_cols=["customer"], bloom_bits=1 << 12
    )
    # fused path (small write), with a spy proving _bloom_job never ran
    calls: list[int] = []
    real = BucketedTxLogTable._bloom_job

    def spy(self, *a, **k):
        calls.append(1)
        return real(self, *a, **k)

    monkeypatch.setattr(BucketedTxLogTable, "_bloom_job", spy)
    t_fused = BucketedTxLogTable(spark, str(tmp_path / "fused"), **kw)
    t_fused.init_from_events(_events(spark))
    assert calls == [], "small write must fuse bloom positions into the stats job"

    # two-job path: same data, fuse gate forced off
    monkeypatch.setattr(txlog, "BLOOM_FUSE_TOTAL_BYTES", 0)
    t_twojob = BucketedTxLogTable(spark, str(tmp_path / "twojob"), **kw)
    t_twojob.init_from_events(_events(spark))
    assert calls, "gate off must take the scan-job plan"
    monkeypatch.undo()

    assert _bloom_bitmaps(t_fused) == _bloom_bitmaps(t_twojob)

    # and the fused sidecars actually prune: absent key reads 0 files
    df, fr, ft = t_fused.read_state_where_in("customer", [999_999])
    assert df.count() == 0 and fr == 0 and ft > 0


def test_trickle_dv_staging_driver_side_matches_executor_side(
    spark, tmp_path, monkeypatch
):
    calls: list[int] = []
    real = txlog._dv_stage_executor_side

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(txlog, "_dv_stage_executor_side", spy)

    t_drv = BucketedTxLogTable(
        spark, str(tmp_path / "drv"), key_cols=["id"], n_buckets=4
    )
    t_drv.init_from_events(_events(spark))
    t_drv.update_where(F.col("id") < 5, {"amount": F.lit(-1.0)})
    t_drv.merge_cdc_batch_mor(_events(spark, n=3, lsn=9))
    assert calls == [], "trickle commits must stage vectors driver-side"

    # identical workload with the gate closed -> executor-side staging
    monkeypatch.setattr(txlog, "DV_BROADCAST_MAX_POSITIONS", 0)
    t_exe = BucketedTxLogTable(
        spark, str(tmp_path / "exe"), key_cols=["id"], n_buckets=4
    )
    t_exe.init_from_events(_events(spark))
    t_exe.update_where(F.col("id") < 5, {"amount": F.lit(-1.0)})
    t_exe.merge_cdc_batch_mor(_events(spark, n=3, lsn=9))
    assert calls, "gate closed must take the executor path"
    monkeypatch.undo()

    a = sorted(map(tuple, t_drv.read_state().select("id", "customer", "amount").collect()))
    b = sorted(map(tuple, t_exe.read_state().select("id", "customer", "amount").collect()))
    assert a == b
    # same vector SIZES per commit on both paths (paths/uuids differ)
    na = sorted(m["n"] for m in resolve_file_dvs(t_drv).values())
    nb = sorted(m["n"] for m in resolve_file_dvs(t_exe).values())
    # 5 update marks + 3 merge replacements (the merge DVs the updated
    # postimages of ids 0-2)
    assert na == nb and sum(na) == 8
