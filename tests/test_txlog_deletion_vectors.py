"""Deletion vectors (sources/txlog.py:delete_where / _apply_dvs):
merge-on-read DELETE — per-file row-index sidecars plus ONE metadata
commit, zero data bytes rewritten (Delta deletion vectors / Iceberg
positional deletes).

The invariants under test: every read path (state, time travel, pruned,
Column-filtered) applies the version-correct vectors; every REWRITE
path (merge / compact) reads DV-applied rows so replacement files are
born clean and deleted rows can never resurrect; vectors are cumulative
per file and time travel to a pre-delete version restores rows exactly;
``mv_delta`` folds delete entries without double-counting (a removed
file negates its VISIBLE rows, the delete entry negates exactly its
``dv_added`` rows); checkpoints and shallow clones carry the vectors
(correctness facts, not optimizations); vacuum reclaims sidecars whose
data file died.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    ConcurrentWriteError,
    clone_table,
    describe_detail,
    fold_mv,
    resolve_file_dvs,
    resolve_with_checkpoint,
    vacuum,
    write_checkpoint,
)

SCHEMA = "id bigint, amount double, g string, _op string, _lsn string, _deleted string"


def _seed(spark, path, n=300, **kw):
    t = BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=4, stats_cols=["amount"], **kw
    )
    rows = [
        (i, float(i), ["a", "b", "c"][i % 3], "r", f"{i:06d}", None)
        for i in range(n)
    ]
    t.init_from_events(spark.createDataFrame(rows, SCHEMA))
    return t


def _ev(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_delete_where_is_metadata_only_and_exact(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    v0 = t.latest_version()
    files_before = sorted(resolve_with_checkpoint(t))

    ver, nf, nd = t.delete_where(F.col("amount").between(100.0, 150.0))
    assert nd == 51 and nf >= 1
    e = t._read_entry(ver)
    assert e["mode"] == "delete" and e["adds"] == [] and e["removes"] == []
    # zero data movement: the live file list is byte-identical
    assert sorted(resolve_with_checkpoint(t)) == files_before

    st = t.read_state()
    assert st.count() == 249
    assert st.filter(F.col("amount").between(100.0, 150.0)).count() == 0
    # time travel restores the rows exactly
    assert t.read_state(v0).count() == 300


def test_pruned_reads_apply_vectors(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_where(F.col("amount").between(100.0, 150.0))
    df, fr, ft = t.read_state_where("amount", 90.0, 160.0)
    assert {int(r["amount"]) for r in df.collect()} == set(range(90, 100)) | set(
        range(151, 161)
    )
    df, _, _ = t.read_state_filtered(F.col("amount") >= 140.0)
    assert df.filter(F.col("amount") <= 150.0).count() == 0


def test_vectors_are_cumulative_and_idempotent(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_where(F.col("amount").between(100.0, 150.0))
    ver2, _, nd2 = t.delete_where(F.col("amount") < 10.0)
    assert nd2 == 10
    assert t.read_state().count() == 239
    # re-deleting already-deleted rows matches nothing: NO commit
    assert t.delete_where(F.col("amount").between(100.0, 150.0)) == (None, 0, 0)
    assert t.latest_version() == ver2


def test_rewrites_absorb_vectors_never_resurrect(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_where(F.col("amount").between(100.0, 150.0))
    # merge re-inserts ONE deleted key; its neighbors must stay deleted
    # through the bucket rewrite
    t.merge_cdc_batch(_ev(spark, [(120, 9999.0, "z", "u", "999999", None)]))
    st = t.read_state()
    assert st.filter(F.col("id") == 120).count() == 1
    assert st.filter(F.col("id") == 121).count() == 0
    assert st.count() == 250
    # compaction absorbs the remaining vectors: output files born clean
    t.compact_buckets(min_files=1)
    assert t.read_state().count() == 250
    dvs = resolve_file_dvs(t)
    assert all(f not in dvs for f in resolve_with_checkpoint(t))


def test_mv_delta_folds_deletes_without_double_count(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_where(F.col("amount").between(100.0, 150.0))
    t.merge_cdc_batch(_ev(spark, [(120, 9999.0, "z", "u", "999999", None)]))
    t.delete_where(F.col("amount") < 10.0)
    t.compact_buckets(min_files=1)
    mv = {
        r["g"]: (r["n_rows"], float(r["total"]))
        for r in fold_mv(t, ["g"], "amount").collect()
    }
    direct = {
        r["g"]: (r["n"], float(r["s"]))
        for r in t.read_state()
        .groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("amount").cast("decimal(28,6)")).alias("s"),
        )
        .collect()
    }
    assert mv == direct


def test_tombstoned_rows_are_not_recounted(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=60)
    # CDC-tombstone one key first; delete_where over its range must not
    # count the already-invisible row
    t.merge_cdc_batch(_ev(spark, [(30, 30.0, "a", "d", "999999", "true")]))
    ver, nf, nd = t.delete_where(F.col("amount").between(29.0, 31.0))
    assert nd == 2  # 29 and 31 — NOT the tombstoned 30
    assert t.read_state().count() == 60 - 3


def test_vectors_ride_checkpoints_and_clone(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), checkpoint_interval=1)
    t.delete_where(F.col("amount") >= 250.0)
    write_checkpoint(t)
    t.delete_where(F.col("amount") < 20.0)

    t2 = BucketedTxLogTable(spark, t.path)  # fresh handle: checkpoint + suffix
    assert t2.read_state().count() == 300 - 50 - 20

    c = clone_table(t2, str(tmp_path / "c"))
    assert c.read_state().count() == 230
    # the clone is independent: deleting on the clone leaves the source
    c.delete_where(F.col("amount").between(100.0, 109.0))
    assert c.read_state().count() == 220
    assert t2.read_state().count() == 230

    d = describe_detail(t2)
    assert d["files_with_dvs"] >= 1 and d["dv_deleted_rows"] == 70


def test_vacuum_reclaims_dead_dv_sidecars(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_where(F.col("amount").between(100.0, 150.0))
    assert glob.glob(os.path.join(t.data_dir, "_dv", "*"))
    t.compact_buckets(min_files=1)  # absorbs every vector
    removed = vacuum(t, retain_versions=1, min_age_seconds=0.0)
    assert not glob.glob(os.path.join(t.data_dir, "_dv", "*"))
    assert any("_dv" in p for p in removed)
    assert t.read_state().count() == 249

    # with the delete version RETAINED, its sidecars must survive
    t.delete_where(F.col("amount") < 10.0)
    vacuum(t, retain_versions=2, min_age_seconds=0.0)
    assert glob.glob(os.path.join(t.data_dir, "_dv", "*"))
    assert t.read_state().count() == 239


def test_delete_prunes_candidate_files(spark, tmp_path):
    """A selective predicate must scan only the files it can touch —
    cluster by amount so ranges are file-pure, then check the delete's
    vectors touch only the overlapping files."""
    t = _seed(spark, str(tmp_path / "t"))
    t.compact_buckets(min_files=1, cluster_cols=["amount"], cluster_parts=8)
    n_files = len(resolve_with_checkpoint(t))
    ver, nf, nd = t.delete_where(F.col("amount").between(10.0, 20.0))
    assert nd == 11
    assert nf < n_files  # prune-tree kept only overlapping files


def test_clone_raises_loudly_when_source_vacuums_vectors(spark, tmp_path):
    """Shallow-clone retention caveat, DV edition: the clone references
    the SOURCE's vector sidecars like it references its data files.
    After the source compacts (absorbing its vectors) and vacuums past
    the clone point, the clone's reads must RAISE on the missing
    sidecar — a correctness fact gone missing is an error, NEVER a
    silent return of the deleted rows."""
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_where(F.col("amount").between(100.0, 150.0))
    c = clone_table(t, str(tmp_path / "c"))
    assert c.read_state().count() == 249

    t.compact_buckets(min_files=1)
    vacuum(t, retain_versions=1, min_age_seconds=0.0)
    assert not glob.glob(os.path.join(t.data_dir, "_dv", "*"))

    with pytest.raises(Exception) as ei:
        c.read_state().count()
    # loud and attributable: the sidecar (or the shared file) is gone
    assert not isinstance(ei.value, AssertionError)


def test_vectors_survive_uri_reserved_characters_in_path(spark, tmp_path):
    """``_metadata.file_path`` arrives percent-encoded (a space is
    ``%20``) while log entries record decoded filesystem paths; the DV
    anti-join key must decode or a table under such a path silently
    returns deleted rows."""
    t = _seed(spark, str(tmp_path / "sp ace" / "t"), n=60)
    ver, nf, nd = t.delete_where(F.col("amount").between(10.0, 19.0))
    assert nd == 10
    assert t.read_state().count() == 50
    assert t.read_state().filter(F.col("amount").between(10.0, 19.0)).count() == 0


def test_wide_delete_reads_use_distributed_pairs(spark, tmp_path, monkeypatch):
    """Past DV_BROADCAST_MAX_POSITIONS, every read's anti-join relation
    is built EXECUTOR-side (binaryFile + mapInPandas) instead of
    materialized on the driver — the read-side twin of the
    partition-parallel delete. Forced here by dropping the threshold;
    results must be exact on both paths, and the driver must load no
    vector (driver-process spy)."""
    from cdc_streaming_pipeline_spark.sources import txlog

    t = _seed(spark, str(tmp_path / "t"))
    t.delete_where(F.col("amount").between(100.0, 150.0))

    monkeypatch.setattr(txlog, "DV_BROADCAST_MAX_POSITIONS", 4)
    driver_calls: list[str] = []
    real = txlog._dv_load

    def spy(path):
        driver_calls.append(path)
        return real(path)

    monkeypatch.setattr(txlog, "_dv_load", spy)
    st = t.read_state()
    assert st.count() == 249
    assert st.filter(F.col("amount").between(100.0, 150.0)).count() == 0
    df, fr, ft = t.read_state_where("amount", 90.0, 160.0)
    assert {int(r["amount"]) for r in df.collect()} == set(range(90, 100)) | set(
        range(151, 161)
    )
    assert driver_calls == [], "read path loaded vectors driver-side"


def test_vectors_survive_plus_and_percent_in_path(spark, tmp_path):
    """'+' is the trap the space test missed: URL-decoding treats a
    literal '+' as SPACE under form-encoding rules, while Spark's path
    encoding and Python's unquote both preserve it — a table under a
    path containing '+' would record DV keys in space-form, resolve-side
    lookups would never match, and deleted rows would silently
    reappear. '%' additionally exercises the escape round-trip (the
    directory's literal '%' arrives as '%25')."""
    t = _seed(spark, str(tmp_path / "a+b %pct" / "t"), n=60)
    ver, nf, nd = t.delete_where(F.col("amount").between(10.0, 19.0))
    assert nd == 10
    assert t.read_state().count() == 50
    assert t.read_state().filter(F.col("amount").between(10.0, 19.0)).count() == 0
    # cumulative second delete: resolve-side key lookup must find the
    # prior vector (the silent-miss failure mode composes vectors wrong)
    t.delete_where(F.col("amount") < 5.0)
    assert t.read_state().count() == 45
    # rewrites under the same path stay clean
    t.compact_buckets(min_files=1)
    assert t.read_state().count() == 45
    assert t.read_state().filter(F.col("amount").between(10.0, 19.0)).count() == 0
