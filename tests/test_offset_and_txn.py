"""Offset-gap audit + transaction-boundary operators on hand-built
streams with known gap/commit structure, plus the scale-plan contract
(no per-partition sort window in the gap audit)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.cdc import (
    offset_gap_audit,
    transaction_atomic_apply,
    transaction_boundary_audit,
)


def _stream(spark, rows):
    return spark.createDataFrame(rows, "p bigint, o bigint")


def test_gap_audit_counts_runs_and_missing(spark):
    # p=0: 1..3, 7, 9..10  -> runs {4..6},{8}: 2 runs, 4 missing
    # p=1: 5 alone         -> 0 runs, 0 missing
    # p=2: 100,101         -> contiguous: 0 runs, 0 missing
    rows = [(0, x) for x in [1, 2, 3, 7, 9, 10]] + [(1, 5)] + [(2, 100), (2, 101)]
    out = {
        r["p"]: r
        for r in offset_gap_audit(_stream(spark, rows), "p", "o", step=1).collect()
    }
    assert out[0]["n_gap_runs"] == 2 and out[0]["missing_n"] == 4
    assert out[0]["first_offset"] == 1 and out[0]["last_offset"] == 10
    assert out[1]["n_gap_runs"] == 0 and out[1]["missing_n"] == 0
    assert out[2]["n_gap_runs"] == 0 and out[2]["missing_n"] == 0


def test_gap_audit_nonunit_step(spark):
    # step=10: 0,10,30,60 -> runs {20},{40,50}: 2 runs, 3 missing
    rows = [(7, x) for x in [0, 10, 30, 60]]
    r = offset_gap_audit(_stream(spark, rows), "p", "o", step=10).collect()[0]
    assert r["n_gap_runs"] == 2 and r["missing_n"] == 3


def test_gap_audit_has_no_sort_window(spark):
    """The scale contract: gaps come from an anti-join, never from a
    per-partition ordered window (one Kafka partition = billions of rows
    at the design point — a sort window would serialize it)."""
    plan = offset_gap_audit(
        _stream(spark, [(0, 1), (0, 3)]), "p", "o"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def _txn(spark):
    # tx 1: declared 2, received 2 -> complete
    # tx 2: declared 3, received 1 -> partial
    # tx 3: declared 1, received 0 -> lost
    # tx 4: no marker, 2 events    -> in_flight
    events = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (2, 20.0), (4, 40.0), (4, 41.0)],
        "tx_id bigint, total_amount double",
    )
    markers = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "tx_id bigint, declared_n bigint"
    )
    return events, markers


def test_txn_boundary_classification(spark):
    events, markers = _txn(spark)
    out = {
        r["tx_status"]: r for r in transaction_boundary_audit(events, markers).collect()
    }
    assert set(out) == {"complete", "partial", "lost", "in_flight"}
    assert out["complete"]["n_txs"] == 1 and out["complete"]["events_received"] == 2
    assert out["partial"]["events_declared"] == 3
    assert out["partial"]["events_received"] == 1
    assert out["lost"]["events_received"] == 0
    assert out["in_flight"]["n_txs"] == 1 and out["in_flight"]["events_received"] == 2


def test_txn_atomic_apply_gates_all_or_nothing(spark):
    events, markers = _txn(spark)
    applied = transaction_atomic_apply(events, markers)
    rows = applied.collect()
    # only tx 1 commits: partial tx 2 must NOT leak its one received event
    assert sorted(r["tx_id"] for r in rows) == [1, 1]
    assert applied.columns == events.columns  # gate preserves the event schema


def test_gap_audit_word_boundaries(spark):
    """The bitmap strategy packs 64 slots per long; gaps and adjacency
    straddling the 64-slot word boundary must be recovered by the
    boundary join."""
    from cdc_streaming_pipeline_spark.operators.cdc import offset_gap_audit

    # contiguous 0..199 spans four words: zero runs, boundary pairs
    # (63,64) and (127,128) must be counted
    rows = [(1, s) for s in range(200)]
    r = offset_gap_audit(_stream(spark, rows), "p", "o", step=1).collect()[0]
    assert r["n_gap_runs"] == 0 and r["missing_n"] == 0

    # gap run {63, 64} straddles the word boundary: ONE run, 2 missing
    rows = [(0, s) for s in range(130) if s not in (63, 64)]
    r = offset_gap_audit(_stream(spark, rows), "p", "o", step=1).collect()[0]
    assert r["n_gap_runs"] == 1 and r["missing_n"] == 2

    # last slot of word 0 missing only: one run at the boundary
    rows = [(2, s) for s in range(130) if s != 63]
    r = offset_gap_audit(_stream(spark, rows), "p", "o", step=1).collect()[0]
    assert r["n_gap_runs"] == 1 and r["missing_n"] == 1
