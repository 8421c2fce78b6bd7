"""The object-store seam, proven (blob.py): every METADATA object the
engine reads or writes itself — log entries, checkpoints, the
_last_checkpoint pointer, DV sidecars (driver AND executor side),
bloom sidecars, the change-feed cursor — moves through a ``BlobStore``
whose API is restricted to object-store primitives (whole-object
put / conditional put / get / exists / list / mtime / delete).

The proof is ``MappedBlobStore``: it relocates every object under a
DIFFERENT root while the engine addresses logical paths, so the two
namespaces share nothing — an engine code path that bypasses the seam
(a direct ``open()``/``glob`` of a logical metadata path) finds no
object and fails LOUDLY instead of silently working because both
happened to be the same local disk. The full table lifecycle below
(init with stats+blooms → merges → MoR delete → MoR update → pruned
reads → CDF → MV fold → time travel → compact → vacuum → clone →
reopen → change-feed cursor) runs with the store injected; the logical
metadata directories are asserted EMPTY on disk throughout.

Out of seam by design (Spark's own FS layer, object-store capable via
s3a/gs/abfss with no engine change): data parquet, the binaryFile
sidecar scan past DV_BROADCAST_MAX_POSITIONS, and the streaming
versions source's log probes."""

from __future__ import annotations

import os
from glob import glob

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.blob import MappedBlobStore, PosixBlobStore
from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    ChangeFeedSource,
    clone_table,
    fold_mv,
    resolve_file_dvs,
    table_changes,
    vacuum,
)

S = "id bigint, amount double, customer bigint, _op string, _lsn string, _deleted string"


def _rows(spark, lo, hi, op="r", lsn_off=0):
    return spark.createDataFrame(
        [
            (i, float(i), i * 37, op, f"{i + lsn_off:012d}", None)
            for i in range(lo, hi)
        ],
        S,
    )


def _no_logical_metadata(root):
    """No metadata OBJECT exists at a logical path — everything lives
    behind the store. (Directories themselves may exist: makedirs in
    the constructor, Spark staging.)"""
    leaks = (
        glob(os.path.join(root, "_txlog", "*"))
        + glob(os.path.join(root, "data", "_dv", "*"))
        + glob(os.path.join(root, "data", "_bloom", "*"))
    )
    assert leaks == [], f"metadata bypassed the blob seam: {leaks}"


def test_full_lifecycle_on_mapped_store(spark, tmp_path):
    root = str(tmp_path / "t")
    store_root = str(tmp_path / "OBJECTS")
    blob = MappedBlobStore(str(tmp_path), store_root)

    t = BucketedTxLogTable(
        spark, root, key_cols=["id"], n_buckets=4,
        stats_cols=["amount"], bloom_cols=["customer"], bloom_bits=1 << 12,
        checkpoint_interval=2, blob_backend=blob,
    )
    t.init_from_events(_rows(spark, 0, 120))
    _no_logical_metadata(root)

    # merges past the checkpoint interval: entry writes, checkpoint
    # writes, pointer updates — all through the store
    for w in range(3):
        t.merge_cdc_batch(_rows(spark, w * 5, w * 5 + 3, op="u", lsn_off=10_000))
    _no_logical_metadata(root)

    # MoR delete + update: sidecars composed in EXECUTOR tasks write
    # through the pickled store; prior-vector loads read through it
    t.delete_where(F.col("amount").between(20.0, 29.0))
    t.update_where(F.col("amount").between(30.0, 39.0), {"amount": F.col("amount") + 0.5})
    _no_logical_metadata(root)

    st = {r["id"]: r["amount"] for r in t.read_state().collect()}
    assert len(st) == 110 and 25 not in st and st[35] == 35.5

    # pruned reads: stats (range) and bloom (point) facts resolve and
    # the sidecar bitmaps load through the store
    df, fr, ft = t.read_state_where("amount", 100.0, 110.0)
    assert df.count() == 11 and fr <= ft
    dfb, frb, ftb = t.read_state_where_in("customer", [50 * 37])
    assert dfb.count() == 1 and frb < ftb  # bloom pruned at least one

    # CDF (dv_added reads) + MV fold + time travel
    feed = table_changes(t, 0)
    assert feed.filter(F.col("_change_type") == "delete").count() == 10
    mv = {
        r["customer"]: r["n_rows"]
        for r in fold_mv(t, ["customer"], "amount").collect()
    }
    assert len(mv) == 110 and all(n == 1 for n in mv.values())
    assert t.read_state(0).count() == 120

    # change-feed cursor file lives behind the store too (polled BEFORE
    # vacuum: a null cursor replays from v0, which post-vacuum is the
    # contract's LOUD branch, not this test's subject)
    cpath = os.path.join(str(tmp_path), "cursor.json")
    src = ChangeFeedSource(t, cpath)
    events, cur = src.poll()
    assert events.count() > 0
    src.advance(cur)
    assert not os.path.exists(cpath)  # logical path empty
    assert ChangeFeedSource(t, cpath).cursor == cur  # durable via store

    # compact absorbs vectors; vacuum reaps dead sidecars THROUGH the
    # store (list/mtime/delete)
    t.compact_buckets(min_files=1)
    dead = vacuum(t, retain_versions=1, min_age_seconds=0.0)
    assert any(p.endswith((".dv", ".dva")) for p in dead)
    assert not set(resolve_file_dvs(t)) & set()  # no-op sanity
    _no_logical_metadata(root)
    assert {r["id"]: r["amount"] for r in t.read_state().collect()} == st

    # reopen from the log THROUGH the store (meta resolution = entry
    # reads + checkpoint + pointer)
    t2 = BucketedTxLogTable(spark, root, blob_backend=blob)
    assert t2.n_buckets == 4 and t2.key_cols == ["id"]
    assert t2.read_state().count() == 110

    # shallow clone inherits the backend; its version-0 commit and all
    # its reads ride the same seam
    c = clone_table(t2, str(tmp_path / "c"))
    assert c.read_state().count() == 110
    _no_logical_metadata(str(tmp_path / "c"))


def test_mapped_store_makes_bypass_loud(tmp_path):
    """The conformance property itself: an object put through the store
    is INVISIBLE at its logical path, and a logical-path read that
    bypasses the store raises — this is what makes the lifecycle test
    above a proof rather than a tautology."""
    blob = MappedBlobStore(str(tmp_path), str(tmp_path / "OBJ"))
    p = str(tmp_path / "x" / "y.bin")
    blob.put(p, b"payload")
    assert not os.path.exists(p)
    assert blob.get(p) == b"payload"
    assert blob.exists(p)
    with pytest.raises(FileNotFoundError):
        open(p, "rb")
    assert blob.list(str(tmp_path / "x")) == [p]  # logical paths back
    assert blob.mtime(p) > 0
    # conditional put: second create loses
    q = str(tmp_path / "x" / "e.json")
    assert blob.put_if_absent(q, "a") is True
    assert blob.put_if_absent(q, "b") is False
    assert blob.get_text(q) == "a"
    blob.delete(p)
    assert not blob.exists(p)
    blob.delete(p)  # idempotent


def test_posix_store_roundtrip(tmp_path):
    b = PosixBlobStore()
    p = str(tmp_path / "a" / "b.bin")
    b.put(p, b"123")
    assert b.get(p) == b"123" and b.exists(p)
    assert b.put_if_absent(p + ".j", "x") and not b.put_if_absent(p + ".j", "y")
    assert b.list(str(tmp_path / "a"), "*.bin") == [p]
    b.delete(p)
    assert not b.exists(p)
