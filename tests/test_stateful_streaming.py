"""Custom stateful streaming operator: per-key running totals survive
micro-batches and a checkpointed restart (applyInPandasWithState)."""

from __future__ import annotations

import json
import os

from cdc_streaming_pipeline_spark.streaming.stateful import running_key_totals


def _write_wave(src: str, name: str, rows: list[tuple[int, float]]) -> None:
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w", encoding="utf-8") as fh:
        for uid, val in rows:
            fh.write(json.dumps({"user_id": uid, "value": val}) + "\n")


def _run_wave(spark, src, out, ckpt):
    stream = spark.readStream.schema("user_id long, value double").json(src)
    q = (
        running_key_totals(stream)
        .writeStream.foreachBatch(
            lambda batch, _bid: batch.write.mode("append").parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    # the sink accumulates per-batch updates; latest row per key
    # (max n_events) is the current state
    sink = spark.read.parquet(out)
    sink.createOrReplaceTempView("totals_probe")
    rows = spark.sql(
        """SELECT user_id, n_events, total FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
               FROM totals_probe) WHERE rn = 1"""
    ).collect()
    return {r.user_id: (r.n_events, r.total) for r in rows}


def test_state_accumulates_across_batches_and_restart(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    _write_wave(src, "wave1.json", [(1, 10.0), (1, 5.0), (2, 7.0)])
    got = _run_wave(spark, src, out, ckpt)
    assert got == {1: (2, 15.0), 2: (1, 7.0)}

    # second wave arrives; a NEW query restarts from the same checkpoint —
    # state must be restored, not recomputed from zero
    _write_wave(src, "wave2.json", [(1, 1.0), (3, 2.5)])
    got = _run_wave(spark, src, out, ckpt)
    assert got[1] == (3, 16.0)  # 2 events + restored state
    assert got[3] == (1, 2.5)
    spark.catalog.dropTempView("totals_probe")
