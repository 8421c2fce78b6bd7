"""Custom stateful streaming operator: per-key running totals survive
micro-batches and a checkpointed restart (applyInPandasWithState)."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

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


def _write_cdc_wave(src: str, name: str, rows: list[tuple[int, str, str]]) -> None:
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w", encoding="utf-8") as fh:
        for rid, lsn, op in rows:
            fh.write(json.dumps({"id": rid, "_lsn": lsn, "_op": op}) + "\n")


def _run_cdc_wave(spark, src, out, ckpt):
    from cdc_streaming_pipeline_spark.streaming.stateful import cdc_latest_state_stream

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = spark.readStream.schema("id long, _lsn string, _op string").json(src)
    q = (
        cdc_latest_state_stream(stream)
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
    sink = spark.read.parquet(out)
    sink.createOrReplaceTempView("cdc_tws_probe")
    rows = spark.sql(
        """SELECT id, _op, is_live FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY _lsn DESC) rn
               FROM cdc_tws_probe) WHERE rn = 1"""
    ).collect()
    return {r.id: (r._op, r.is_live) for r in rows}


def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas's Python state-server worker needs "
    "protobuf, absent in this sandbox (no pip install) — same class of "
    "environment block as the live-Kafka skip; the operator itself is "
    "plain Spark 4 API usage",
)
def test_tws_latest_state_across_batches_restart_and_deletes(spark, tmp_path):
    """transformWithStateInPandas CDC latest-state: latest-row-wins per
    key, deletes go tombstone, state survives a checkpointed restart, and
    a LATE lower-LSN update cannot resurrect a deleted key."""
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "o")
    _write_cdc_wave(
        src,
        "w1.json",
        [(1, "0005", "c"), (1, "0007", "u"), (2, "0003", "c"), (3, "0004", "c")],
    )
    got = _run_cdc_wave(spark, src, out, ckpt)
    assert got[1] == ("u", True) and got[2] == ("c", True) and got[3] == ("c", True)

    # wave 2 on a fresh query from the same checkpoint: delete key 1,
    # update key 2 — then a LATE event for key 1 with a lower LSN
    _write_cdc_wave(src, "w2.json", [(1, "0009", "d"), (2, "0008", "u")])
    got = _run_cdc_wave(spark, src, out, ckpt)
    assert got[1] == ("d", False)  # tombstoned
    assert got[2] == ("u", True)

    _write_cdc_wave(src, "w3.json", [(1, "0006", "u")])  # late, pre-delete LSN
    got = _run_cdc_wave(spark, src, out, ckpt)
    assert got[1] == ("d", False)  # delete's LSN wins: no resurrection
