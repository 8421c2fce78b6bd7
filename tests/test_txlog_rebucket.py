"""Bucket-layout metadata + rebucket (sources/txlog.py): the log — not
the constructor — owns the bucket layout. Opening a table with the
wrong n_buckets used to silently select the wrong old files in a merge
(duplicate keys in read_state); now the layout is recorded as
``table_meta`` in entry 0 / rebucket entries / checkpoints, validated
at open, adopted per operation by long-lived handles, and evolvable via
``rebucket()`` with every prior version still readable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.merge import with_key_bucket
from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    ConcurrentWriteError,
    resolve_snapshot_state,
    resolve_table_meta,
    write_checkpoint,
)

SCHEMA = "id bigint, status string, _op string, _lsn string, _deleted string"


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _seed(spark, n=60):
    return _events(spark, [(i, f"s{i}", "r", "0001", None) for i in range(n)])


def _state(t, version=None):
    return {r["id"]: r["status"] for r in t.read_state(version).collect()}


def _mk(spark, tmp_path, **kw):
    kw.setdefault("key_cols", ["id"])
    kw.setdefault("n_buckets", 8)
    return BucketedTxLogTable(spark, str(tmp_path / "t"), **kw)


def test_layout_recorded_resolved_and_validated(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.init_from_events(_seed(spark))
    assert resolve_table_meta(t) == {
        "key_cols": ["id"], "n_buckets": 8, "order_col": "_lsn",
    }
    # omitted args resolve FROM the log
    opened = BucketedTxLogTable(spark, str(tmp_path / "t"))
    assert (opened.key_cols, opened.n_buckets, opened.order_col) == (
        ["id"], 8, "_lsn",
    )
    # a mismatching explicit layout is a loud error, not silent corruption
    with pytest.raises(ValueError, match="n_buckets"):
        _mk(spark, tmp_path, n_buckets=16)
    with pytest.raises(ValueError, match="key_cols"):
        _mk(spark, tmp_path, key_cols=["status"])
    # meta rides checkpoints: resolution stays bounded and exact
    write_checkpoint(t)
    assert resolve_table_meta(t)["n_buckets"] == 8
    # a brand-new path still requires key_cols
    with pytest.raises(ValueError, match="key_cols is required"):
        BucketedTxLogTable(spark, str(tmp_path / "fresh"))


def test_rebucket_preserves_state_and_retags_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.init_from_events(_seed(spark))
    t.merge_cdc_batch(_events(spark, [(2, "UPD", "u", "0002", None)]))
    pre_state = _state(t)
    pre_v = t.latest_version()

    v = t.rebucket(16)
    assert v == pre_v + 1 and t.n_buckets == 16
    assert _state(t) == pre_state  # logical no-op
    assert _state(t, pre_v) == pre_state  # time travel intact
    snap, bmap, _ = resolve_snapshot_state(t, v)
    assert set(bmap.values()) <= set(range(16)) and max(bmap.values()) >= 8
    assert resolve_table_meta(t)["n_buckets"] == 16
    # no-op rebucket returns the current version without a commit
    assert t.rebucket(16) == v

    # subsequent merges prune under the NEW math: pick a key whose
    # bucket differs mod 8 vs mod 16 and assert no duplicate/stale rows
    probe = with_key_bucket(
        spark.createDataFrame([(k,) for k in range(60)], "id bigint"), ["id"], 16
    )
    k = next(
        r["id"] for r in probe.collect() if r["_kb"] >= 8
    )  # old math would look in bucket _kb % 8 — the wrong files
    t.merge_cdc_batch(_events(spark, [(k, "REBUCKETED", "u", "0009", None)]))
    rows = t.read_state().filter(F.col("id") == k).collect()
    assert len(rows) == 1 and rows[0]["status"] == "REBUCKETED"


def test_stale_handle_adopts_rebucketed_layout(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.init_from_events(_seed(spark))
    stale = BucketedTxLogTable(spark, str(tmp_path / "t"))  # opened pre-rebucket
    t.rebucket(16)
    assert stale.n_buckets == 8
    stale.merge_cdc_batch(_events(spark, [(7, "VIA_STALE", "u", "0005", None)]))
    assert stale.n_buckets == 16  # adopted the recorded layout
    got = t.read_state().filter(F.col("id") == 7).collect()
    assert len(got) == 1 and got[0]["status"] == "VIA_STALE"


def test_merge_racing_rebucket_conflicts_loudly(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.init_from_events(_seed(spark))
    other = BucketedTxLogTable(spark, str(tmp_path / "t"))

    def racing_backend(entry_path, payload):
        other.rebucket(16)  # lands between the merge's resolve and commit
        return False

    racer = BucketedTxLogTable(
        spark, str(tmp_path / "t"), commit_backend=racing_backend
    )
    with pytest.raises(ConcurrentWriteError):
        racer.merge_cdc_batch(_events(spark, [(1, "STALE", "u", "0002", None)]))
    # nothing half-landed: state reflects the rebucket only
    assert _state(t) == {i: f"s{i}" for i in range(60)}


def test_legacy_log_without_meta_still_opens(spark, tmp_path):
    """Tables written before table_meta existed carry no layout record:
    explicit constructor args stand (back-compat), resolution returns
    None, and operations run under the caller's layout."""
    import json

    t = _mk(spark, tmp_path)
    t.init_from_events(_seed(spark, n=20))
    # strip the meta from entry 0, simulating a legacy log
    p = t._entry_path(0)
    with open(p) as f:
        e = json.load(f)
    del e["table_meta"]
    with open(p, "w") as f:
        json.dump(e, f)
    legacy = BucketedTxLogTable(spark, str(tmp_path / "t"), key_cols=["id"], n_buckets=8)
    assert resolve_table_meta(legacy) is None
    legacy.merge_cdc_batch(_events(spark, [(3, "OK", "u", "0002", None)]))
    assert _state(legacy)[3] == "OK"
    with pytest.raises(ValueError, match="key_cols is required"):
        BucketedTxLogTable(spark, str(tmp_path / "t"))