"""BucketedTxLogTable (sources/txlog.py): bucket-pruned incremental CDC
MERGE with per-bucket file-replacement commits — the scale-correct
replacement for the full-rewrite copy-on-write merge. Pins the three
contracts the design exists for: (1) merged state equals latest-state
semantics, (2) untouched buckets' files are byte-identical under the
same paths across a merge commit, (3) conflict detection is
file-granular, so merges over disjoint buckets interleave safely while
same-bucket merges conflict loudly."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.merge import with_key_bucket
from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    ConcurrentWriteError,
    posix_put_if_absent,
)

N_BUCKETS = 8
SCHEMA = "id bigint, status string, _op string, _lsn string, _deleted string"


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _seed(spark, n=60):
    return _events(
        spark, [(i, f"s{i}", "r", "0001", None) for i in range(n)]
    )


def _state(t, version=None):
    return {
        r["id"]: r["status"] for r in t.read_state(version).collect()
    }


def _buckets_of(spark, keys):
    df = with_key_bucket(
        spark.createDataFrame([(k,) for k in keys], "id bigint"), ["id"], N_BUCKETS
    )
    return {r["id"]: r["_kb"] for r in df.collect()}


def _table(spark, tmp_path, name="t", backend=None):
    return BucketedTxLogTable(
        spark,
        str(tmp_path / name),
        key_cols=["id"],
        n_buckets=N_BUCKETS,
        commit_backend=backend,
    )


def _sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_merge_semantics_match_latest_state(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.init_from_events(_seed(spark))
    batch = _events(
        spark,
        [
            (2, "UPD", "u", "0002", None),      # update
            (3, "s3", "d", "0003", "true"),     # delete
            (100, "new", "c", "0002", None),     # insert
            (5, "early", "u", "0000", None),     # LATE lower-LSN event: loses
        ],
    )
    v, touched = t.merge_cdc_batch(batch)
    assert v == 1 and touched
    got = _state(t)
    expect = {i: f"s{i}" for i in range(60)}
    expect[2] = "UPD"
    del expect[3]
    expect[100] = "new"
    assert got == expect
    # time travel: pre-merge state intact
    assert _state(t, 0) == {i: f"s{i}" for i in range(60)}
    # raw rows keep the delete marker (anti-resurrection invariant) ...
    raw = t.read(1)
    assert raw.filter(F.col("id") == 3).count() == 1
    # ... so a late lower-LSN re-insert of the deleted key stays dead
    late = _events(spark, [(3, "zombie", "c", "0001", None)])
    t.merge_cdc_batch(late)
    assert 3 not in _state(t)


def test_untouched_buckets_byte_identical_and_unread(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.init_from_events(_seed(spark))
    bmap0 = t._bucket_map(0)
    batch = _events(spark, [(7, "UPD", "u", "0002", None)])
    (tb,) = _buckets_of(spark, [7]).values()
    pre = {p: (_sha(p), os.path.getmtime(p)) for p in t._snapshot_files(0)}

    v, touched = t.merge_cdc_batch(batch)
    assert touched == [tb]
    post_files = t._snapshot_files(v)
    bmap1 = t._bucket_map(v)
    # every untouched bucket's file survives under the SAME path with the
    # SAME bytes and mtime — never rewritten, never even opened for write
    untouched_pre = [p for p, b in bmap0.items() if b != tb and p in pre]
    for p in untouched_pre:
        assert p in post_files
        assert (_sha(p), os.path.getmtime(p)) == pre[p]
    # the touched bucket's old file is gone from the snapshot (still on
    # disk for time travel), replaced by new files in the same bucket
    old_touched = [p for p, b in bmap0.items() if b == tb]
    for p in old_touched:
        assert p not in post_files and os.path.exists(p)
    new_touched = [p for p in post_files if bmap1[p] == tb]
    assert new_touched and all(p not in pre for p in new_touched)
    # the log entry records exactly the touched bucket
    assert t._read_entry(v)["buckets"] == [tb]


def test_merge_cost_reads_only_touched_files(spark, tmp_path):
    """The merge's snapshot read lists only touched-bucket files — the
    pruning is in the FILE LIST handed to Spark, not a filter Spark may
    or may not push."""
    t = _table(spark, tmp_path)
    t.init_from_events(_seed(spark))
    bmap = t._bucket_map()
    batch = _events(spark, [(11, "x", "u", "0002", None)])
    (tb,) = _buckets_of(spark, [11]).values()
    old = [f for f in t._snapshot_files() if bmap[f] == tb]
    # the entry's removes == exactly the touched bucket's files
    v, _ = t.merge_cdc_batch(batch)
    assert sorted(t._read_entry(v)["removes"]) == sorted(old)


def test_disjoint_bucket_merges_interleave(spark, tmp_path):
    """File-granular conflict rule: a merge that loses the version race
    to a DISJOINT-bucket merge revalidates and lands on the next
    version; both results are present."""
    t = _table(spark, tmp_path)
    t.init_from_events(_seed(spark))
    by_bucket = _buckets_of(spark, list(range(60)))
    k1 = 0
    k2 = next(k for k, b in by_bucket.items() if b != by_bucket[k1])

    other = _table(spark, tmp_path)  # second writer, same table
    calls = {"n": 0}

    def racing_backend(entry_path, payload):
        calls["n"] += 1
        if calls["n"] == 1:
            # a concurrent writer lands a disjoint-bucket merge first
            other.merge_cdc_batch(
                _events(spark, [(k2, "OTHER", "u", "0002", None)])
            )
            return False  # and this writer loses the version race
        return posix_put_if_absent(entry_path, payload)

    racer = _table(spark, tmp_path, backend=racing_backend)
    v, _ = racer.merge_cdc_batch(_events(spark, [(k1, "MINE", "u", "0002", None)]))
    assert v == 2 and calls["n"] == 2  # retried once, won the next slot
    got = _state(t)
    assert got[k1] == "MINE" and got[k2] == "OTHER"


def test_same_bucket_race_conflicts(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.init_from_events(_seed(spark))
    by_bucket = _buckets_of(spark, list(range(60)))
    k1 = 0
    k2 = next(k for k, b in by_bucket.items() if k != k1 and b == by_bucket[k1])

    other = _table(spark, tmp_path)

    def racing_backend(entry_path, payload):
        other.merge_cdc_batch(_events(spark, [(k2, "OTHER", "u", "0002", None)]))
        return False

    racer = _table(spark, tmp_path, backend=racing_backend)
    with pytest.raises(ConcurrentWriteError, match="conflicts"):
        racer.merge_cdc_batch(_events(spark, [(k1, "MINE", "u", "0002", None)]))
    # the competing merge's result is intact; no partial state landed
    assert _state(t)[k2] == "OTHER"


def test_empty_batch_is_a_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.init_from_events(_seed(spark, n=5))
    v, touched = t.merge_cdc_batch(_events(spark, []))
    assert (v, touched) == (0, [])
    assert t.latest_version() == 0


def test_vacuum_reclaims_replaced_bucket_files(spark, tmp_path):
    from cdc_streaming_pipeline_spark.sources.txlog import vacuum

    t = _table(spark, tmp_path)
    t.init_from_events(_seed(spark))
    for lsn in ("0002", "0003", "0004"):
        t.merge_cdc_batch(_events(spark, [(1, f"v{lsn}", "u", lsn, None)]))
    pre = _state(t)
    deleted = vacuum(t, retain_versions=2, min_age_seconds=0)
    assert deleted  # replaced touched-bucket files reclaimed
    assert _state(t) == pre  # retained versions read exactly
