"""Partition-pruned CDC merge (operators/merge.py).

Three invariants:
1. Incremental merges == full recompute (`latest_state` over the whole log),
   for any seeded interleaving, including deletes and late events.
2. Untouched bucket partitions are byte-identical after a merge — the
   file-skipping property that makes the op viable at 100 TB.
3. The snapshot scan for a merge is partition-pruned (the `_kb IN (...)`
   predicate reaches the scan as a partition filter).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.cdc import latest_state
from cdc_streaming_pipeline_spark.operators.merge import (
    BUCKET_COL,
    init_snapshot,
    merge_cdc_batch,
    read_snapshot,
    touched_buckets,
    with_key_bucket,
)
from cdc_streaming_pipeline_spark.sources.event_log import read_event_log
from cdc_streaming_pipeline_spark.workload import CdcWorkloadGenerator

KEYS = ["id", "_table"]
N_BUCKETS = 16


def _event_batches(spark, tmp_path, seed, n_batches=3, ops_per_batch=60):
    """Seeded workload split into ordered batches, plus the full log."""
    gen = CdcWorkloadGenerator(seed=seed)
    gen.initial_load(rows_per_table=10)
    dirs = []
    for b in range(n_batches):
        gen.run(ops_per_batch)
        d = str(tmp_path / f"batch_{b}")
        # write_json_files emits ALL events so far; slice per-batch below
        gen.write_json_files(d, n_files=2)
        dirs.append(d)
    full = read_event_log(spark, dirs[-1])
    batches = []
    prev_max = None
    for d in dirs:
        log = read_event_log(spark, d)
        if prev_max is not None:
            log = log.filter(F.col("_lsn") > prev_max)
        prev_max = read_event_log(spark, d).agg(F.max("_lsn")).collect()[0][0]
        batches.append(log)
    return batches, full


def _partition_files(path):
    out = {}
    for entry in os.listdir(path):
        if not entry.startswith(f"{BUCKET_COL}="):
            continue
        bucket = int(entry.split("=", 1)[1])
        pdir = os.path.join(path, entry)
        out[bucket] = sorted(
            (f, os.path.getmtime(os.path.join(pdir, f)), os.path.getsize(os.path.join(pdir, f)))
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        )
    return out


def _state_dict(df):
    cols = sorted(c for c in df.columns if c != BUCKET_COL)
    return {
        (r["id"], r["_table"]): tuple(r[c] for c in cols)
        for r in df.select(*cols, "id", "_table").collect()
    }


@pytest.mark.parametrize("seed", [7, 42])
def test_incremental_merge_equals_full_recompute(spark, tmp_path, seed):
    batches, full = _event_batches(spark, tmp_path, seed)
    snap = str(tmp_path / "snapshot")
    init_snapshot(batches[0], snap, KEYS, n_buckets=N_BUCKETS)
    for batch in batches[1:]:
        merge_cdc_batch(spark, snap, batch, KEYS, n_buckets=N_BUCKETS)

    got = _state_dict(read_snapshot(spark, snap))
    expected = _state_dict(latest_state(full, key_cols=KEYS))
    assert got == expected


def test_untouched_partitions_are_not_rewritten(spark, tmp_path):
    batches, _ = _event_batches(spark, tmp_path, seed=3)
    snap = str(tmp_path / "snapshot")
    init_snapshot(batches[0], snap, KEYS, n_buckets=N_BUCKETS)

    before = _partition_files(snap)
    # merge a batch restricted to ONE key → at most one touched bucket
    one_key = batches[1].filter((F.col("_table") == "customer")).limit(1)
    assert one_key.count() == 1
    touched = merge_cdc_batch(spark, snap, one_key, KEYS, n_buckets=N_BUCKETS)
    after = _partition_files(snap)

    assert len(touched) == 1
    for bucket, files in before.items():
        if bucket in touched:
            continue
        assert after[bucket] == files, f"bucket {bucket} was rewritten"


def test_touched_buckets_bounded_and_deterministic(spark, tmp_path):
    batches, _ = _event_batches(spark, tmp_path, seed=5, n_batches=1)
    t1 = touched_buckets(batches[0], KEYS, N_BUCKETS)
    t2 = touched_buckets(batches[0], KEYS, N_BUCKETS)
    assert t1 == t2
    assert all(0 <= b < N_BUCKETS for b in t1)


def test_merge_scan_is_partition_pruned(spark, tmp_path):
    batches, _ = _event_batches(spark, tmp_path, seed=9, n_batches=1)
    snap = str(tmp_path / "snapshot")
    init_snapshot(batches[0], snap, KEYS, n_buckets=N_BUCKETS)
    pruned = spark.read.parquet(snap).filter(F.col(BUCKET_COL).isin([1, 2]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filters appear as PartitionFilters on the parquet scan node
    assert "PartitionFilters" in plan and BUCKET_COL in plan.split("PartitionFilters", 1)[1][:200]


def test_delete_not_resurrected_by_late_event(spark, tmp_path):
    """A late lower-LSN update arriving after the delete's merge must not
    resurrect the key — the raw-snapshot (markers kept) invariant."""
    rows = [
        # key 1: insert lsn 1, delete lsn 3 land in batch A; late update lsn 2 in batch B
        {"id": 1, "_table": "t", "v": "a", "_op": "c", "_lsn": "001", "_deleted": None},
        {"id": 1, "_table": "t", "v": None, "_op": "d", "_lsn": "003", "_deleted": "true"},
    ]
    late = [{"id": 1, "_table": "t", "v": "b", "_op": "u", "_lsn": "002", "_deleted": None}]
    snap = str(tmp_path / "snap")
    schema = "id bigint, _table string, v string, _op string, _lsn string, _deleted string"
    a = spark.createDataFrame(rows, schema=schema)
    b = spark.createDataFrame(late, schema=schema)
    init_snapshot(a, snap, KEYS, n_buckets=4)
    merge_cdc_batch(spark, snap, b, KEYS, n_buckets=4)
    assert read_snapshot(spark, snap).count() == 0
    raw = read_snapshot(spark, snap, raw=True)
    assert raw.count() == 1 and raw.collect()[0]["_lsn"] == "003"


def test_idempotent_replay(spark, tmp_path):
    """Replaying the same batch (at-least-once delivery) changes nothing."""
    batches, _ = _event_batches(spark, tmp_path, seed=11, n_batches=2)
    snap = str(tmp_path / "snapshot")
    init_snapshot(batches[0], snap, KEYS, n_buckets=N_BUCKETS)
    merge_cdc_batch(spark, snap, batches[1], KEYS, n_buckets=N_BUCKETS)
    first = _state_dict(read_snapshot(spark, snap))
    merge_cdc_batch(spark, snap, batches[1], KEYS, n_buckets=N_BUCKETS)
    assert _state_dict(read_snapshot(spark, snap)) == first


def test_bucket_assignment_is_stable(spark):
    df = spark.range(100).withColumn("_table", F.lit("t")).withColumnRenamed("id", "id")
    a = with_key_bucket(df, KEYS, 32).select("id", BUCKET_COL).collect()
    b = with_key_bucket(df, KEYS, 32).select("id", BUCKET_COL).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_propagate_deletions_erases_rows_and_prunes_rewrites(spark, tmp_path):
    """Right-to-be-forgotten: requested keys vanish PHYSICALLY (raw view —
    no marker rows left, unlike a CDC delete), untouched buckets stay
    byte-identical, and the returned bucket list matches the keys' spread."""
    from cdc_streaming_pipeline_spark.operators.merge import propagate_deletions

    batches, full = _event_batches(spark, tmp_path, seed=11)
    snap = str(tmp_path / "snap")
    init_snapshot(full, snap, KEYS, n_buckets=N_BUCKETS)
    before_files = _partition_files(snap)
    before = _state_dict(read_snapshot(spark, snap, raw=True))

    victims = [k for k in sorted(before)[:3]]
    # materialized frame with the snapshot's key TYPES (id is bigint —
    # a string id would xxhash into different buckets), and no lineage
    # over the snapshot path (which is about to be rewritten)
    keys_df = spark.createDataFrame(victims, "id bigint, _table string")
    touched = propagate_deletions(spark, snap, keys_df, KEYS, n_buckets=N_BUCKETS)
    assert 1 <= len(touched) <= 3  # audit record covers the victims' spread

    after = _state_dict(read_snapshot(spark, snap, raw=True))
    assert set(after) == set(before) - set(victims)  # erased, others intact
    for k in set(after):
        assert after[k] == before[k]

    after_files = _partition_files(snap)
    for bucket, files in before_files.items():
        if bucket not in touched:
            assert after_files[bucket] == files, f"bucket {bucket} rewritten"


def test_propagate_deletions_empties_whole_bucket(spark, tmp_path):
    """A bucket whose EVERY key is erased must lose its partition directory
    (dynamic overwrite alone cannot delete an empty partition)."""
    from cdc_streaming_pipeline_spark.operators.merge import propagate_deletions

    _, full = _event_batches(spark, tmp_path, seed=5)
    snap = str(tmp_path / "snap2")
    init_snapshot(full, snap, KEYS, n_buckets=N_BUCKETS)
    raw = read_snapshot(spark, snap, raw=True)
    some_bucket = raw.select(BUCKET_COL).first()[BUCKET_COL]
    bucket_keys = (
        raw.filter(F.col(BUCKET_COL) == some_bucket).select("id", "_table").distinct()
    )
    propagate_deletions(spark, snap, bucket_keys, KEYS, n_buckets=N_BUCKETS)
    assert not os.path.exists(os.path.join(snap, f"{BUCKET_COL}={some_bucket}"))
    remaining = read_snapshot(spark, snap, raw=True)
    assert remaining.filter(F.col(BUCKET_COL) == some_bucket).count() == 0


def _scd2_full(spark, full):
    from cdc_streaming_pipeline_spark.operators.cdc import scd2_history

    return scd2_history(full, key_cols=KEYS)


def _scd2_dict(df):
    cols = sorted(c for c in df.columns if c != BUCKET_COL)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.mark.parametrize("seed", [7, 23])
def test_incremental_scd2_merge_equals_full_recompute(spark, tmp_path, seed):
    """merge_scd2_batch over seeded batches == scd2_history over the whole
    log — every version row, every interval bound, every is_current flag."""
    from cdc_streaming_pipeline_spark.operators.merge import (
        init_scd2,
        merge_scd2_batch,
        read_scd2,
    )

    batches, full = _event_batches(spark, tmp_path, seed=seed)
    path = str(tmp_path / "scd2")
    init_scd2(batches[0], path, key_cols=KEYS, n_buckets=N_BUCKETS)
    for b in batches[1:]:
        merge_scd2_batch(spark, path, b, key_cols=KEYS, n_buckets=N_BUCKETS)
    assert _scd2_dict(read_scd2(spark, path)) == _scd2_dict(_scd2_full(spark, full))


def test_scd2_merge_skips_untouched_buckets_and_replays_idempotently(spark, tmp_path):
    from cdc_streaming_pipeline_spark.operators.merge import (
        init_scd2,
        merge_scd2_batch,
        read_scd2,
    )

    batches, full = _event_batches(spark, tmp_path, seed=31)
    path = str(tmp_path / "scd2")
    init_scd2(batches[0], path, key_cols=KEYS, n_buckets=N_BUCKETS)
    before = _partition_files(path)
    # merge a batch restricted to ONE key -> at most one touched bucket
    one_key = batches[1].filter(F.col("_table") == "customer").limit(1)
    assert one_key.count() == 1
    touched = merge_scd2_batch(spark, path, one_key, key_cols=KEYS, n_buckets=N_BUCKETS)
    after = _partition_files(path)
    assert len(touched) == 1
    untouched = set(before) - set(touched)
    assert untouched
    for b in untouched:
        assert after[b] == before[b]  # same files, same mtimes, same sizes

    # replaying the SAME batch must not change the table (dedup on key+lsn)
    state1 = _scd2_dict(read_scd2(spark, path))
    merge_scd2_batch(spark, path, one_key, key_cols=KEYS, n_buckets=N_BUCKETS)
    assert _scd2_dict(read_scd2(spark, path)) == state1


def test_merge_survives_additive_schema_evolution(spark, tmp_path):
    """Dynamic overwrite rewrites only touched buckets, so an additive
    upstream column leaves the snapshot with MIXED footers across bucket
    dirs. A plain parquet read picks one footer and silently drops the
    new column (the reproduced bug class); every bucketed read now goes
    through mergeSchema, so the evolved column must survive with NULLs
    on un-evolved rows — for the latest-state snapshot AND the SCD2
    table."""
    from cdc_streaming_pipeline_spark.operators.merge import (
        init_scd2,
        init_snapshot,
        merge_cdc_batch,
        merge_scd2_batch,
        read_scd2,
        read_snapshot,
    )

    b1 = spark.createDataFrame(
        [(i, "a", f"{i:06d}", "c") for i in range(40)],
        "id long, status string, _lsn string, _op string",
    )
    b2 = spark.createDataFrame(
        [(1, "b", "900001", "u", "x@y.z")],
        "id long, status string, _lsn string, _op string, email string",
    )

    snap = str(tmp_path / "snap")
    init_snapshot(b1, snap, ["id"], n_buckets=8)
    merge_cdc_batch(spark, snap, b2, ["id"], n_buckets=8)
    out = read_snapshot(spark, snap, raw=True)
    rows = {r.id: r for r in out.filter(F.col("id").isin(1, 2)).collect()}
    assert rows[1].email == "x@y.z"
    assert rows[2].email is None  # un-evolved bucket reads NULL, not a drop

    scd2 = str(tmp_path / "scd2")
    init_scd2(b1, scd2, ["id"], n_buckets=8)
    merge_scd2_batch(spark, scd2, b2, ["id"], n_buckets=8)
    hist = read_scd2(spark, scd2)
    assert "email" in hist.columns
    v = {(r.id, r.valid_from): r for r in hist.filter(F.col("id") == 1).collect()}
    assert v[(1, "900001")].email == "x@y.z" and v[(1, "900001")].is_current


def test_scd2_merge_delete_before_insert_across_batches(spark, tmp_path):
    """The tombstone-retention bug class: a delete processed in an EARLIER
    batch than its key's insert (interleaved file batches) must still
    close the version — the zero-width delete marker preserves the event
    where plain scd2 output would lose it and let the late insert
    resurrect an open version."""
    from cdc_streaming_pipeline_spark.operators.merge import (
        init_scd2,
        merge_scd2_batch,
        read_scd2,
    )

    schema = "id bigint, _table string, v string, _op string, _lsn string, _deleted string"
    first = spark.createDataFrame([(8, "t", None, "d", "082", "true")], schema)
    late = spark.createDataFrame([(8, "t", "a", "c", "038", None)], schema)
    path = str(tmp_path / "scd2")
    init_scd2(first, path, ["id", "_table"], n_buckets=4)
    merge_scd2_batch(spark, path, late, ["id", "_table"], n_buckets=4)

    rows = read_scd2(spark, path).collect()
    assert len(rows) == 1
    assert (rows[0].valid_from, rows[0].valid_to, rows[0].is_current) == ("038", "082", False)
    # the marker stays in the raw view for future merges, hidden by default
    raw = read_scd2(spark, path, raw=True)
    assert raw.count() == 2


def test_propagate_deletions_purges_scd2_history_too(spark, tmp_path):
    """GDPR erasure must remove HISTORY, not just current rows: applied to
    the SCD2 table (same key-bucket layout, so the same operator works
    verbatim), every version row AND delete marker of the victim keys
    vanishes from the raw view, untouched buckets stay byte-identical."""
    from cdc_streaming_pipeline_spark.operators.merge import (
        init_scd2,
        propagate_deletions,
        read_scd2,
    )

    batches, full = _event_batches(spark, tmp_path, seed=13)
    path = str(tmp_path / "scd2")
    init_scd2(full, path, KEYS, n_buckets=N_BUCKETS)
    before_files = _partition_files(path)
    all_keys = sorted(
        (r.id, r._table)
        for r in read_scd2(spark, path, raw=True).select("id", "_table").distinct().collect()
    )
    victims = all_keys[:3]
    vdf = spark.createDataFrame(victims, "id bigint, _table string")
    touched = propagate_deletions(spark, path, vdf, KEYS, n_buckets=N_BUCKETS)
    assert touched

    raw = read_scd2(spark, path, raw=True)
    survivors = {
        (r.id, r._table) for r in raw.select("id", "_table").distinct().collect()
    }
    assert survivors == set(all_keys) - set(victims)
    after_files = _partition_files(path)
    for b, files in before_files.items():
        if b not in touched and b in after_files:
            assert after_files[b] == files
