"""Shallow clone (sources/txlog.py:clone_table): a zero-copy table fork
— version 0 of the destination is ONE metadata commit carrying the
source snapshot's file list and every skipping fact; no bytes move.
Writes diverge independently; the source-vacuum retention caveat is
pinned as documented behavior."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    clone_table,
    resolve_file_dicts,
    resolve_file_stats,
    resolve_table_meta,
    vacuum,
)

SCHEMA = "id bigint, status string, _op string, _lsn string, _deleted string"


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _mk(spark, tmp_path, name="src"):
    t = BucketedTxLogTable(
        spark, str(tmp_path / name), key_cols=["id"], n_buckets=8,
        stats_cols=["status"],
    )
    t.init_from_events(
        _events(spark, [(i, f"s{i}", "r", "0001", None) for i in range(60)])
    )
    return t


def _state(t):
    return {r["id"]: r["status"] for r in t.read_state().collect()}


def test_clone_is_metadata_only_and_reads_equal(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.merge_cdc_batch(_events(spark, [(3, "UPD", "u", "0002", None)]))
    want = _state(src)

    c = clone_table(src, str(tmp_path / "dest"))
    assert _state(c) == want
    # zero data movement: the clone's data_dir holds no parquet
    assert not glob.glob(os.path.join(c.data_dir, "**", "*.parquet"), recursive=True)
    # skipping facts carried: stats-pruned read works at the clone
    assert resolve_file_stats(c, 0) and resolve_file_dicts(c, 0)
    df, read, total = c.read_state_where_in("status", ["UPD"])
    assert {r["id"] for r in df.collect()} == {3} and read < total
    assert resolve_table_meta(c)["n_buckets"] == 8
    assert c._read_entry(0)["cloned_from"]["path"] == src.path

    with pytest.raises(FileExistsError):
        clone_table(src, str(tmp_path / "dest"))


def test_clone_and_source_diverge_independently(spark, tmp_path):
    src = _mk(spark, tmp_path)
    c = clone_table(src, str(tmp_path / "dest"))
    c.merge_cdc_batch(_events(spark, [(1, "CLONE", "u", "0002", None)]))
    src.merge_cdc_batch(_events(spark, [(2, "SRC", "u", "0002", None)]))
    s, d = _state(src), _state(c)
    assert d[1] == "CLONE" and s[1] == "s1"
    assert s[2] == "SRC" and d[2] == "s2"
    # the clone's rewrite landed under its OWN data_dir
    adds = c._read_entry(c.latest_version())["adds"]
    assert all(f.startswith(c.data_dir) for f in adds)
    # clone vacuum can never touch source bytes: it scans its own dir
    deleted = vacuum(c, retain_versions=1, min_age_seconds=0.0)
    assert all(p.startswith(c.data_dir) for p in deleted)
    assert _state(src) == s


def test_source_vacuum_past_clone_point_breaks_clone_reads(spark, tmp_path):
    """The documented shallow-clone retention caveat (Delta's is the
    same): the source's vacuum consults only the source's log, so after
    the source rewrites itself and vacuums, shared files the clone
    still references are gone."""
    src = _mk(spark, tmp_path)
    c = clone_table(src, str(tmp_path / "dest"))
    src.compact_buckets(min_files=1)  # full self-rewrite: old files dead TO SRC
    vacuum(src, retain_versions=1, min_age_seconds=0.0)
    assert _state(src) == {i: f"s{i}" for i in range(60)}  # source intact
    with pytest.raises(Exception):
        c.read_state().collect()  # clone's pinned files are gone


def test_describe_detail_reports_log_facts_only(spark, tmp_path):
    from cdc_streaming_pipeline_spark.sources.txlog import (
        describe_detail,
        write_checkpoint,
    )

    t = _mk(spark, tmp_path, name="detail")
    t.merge_cdc_batch(_events(spark, [(3, "UPD", "u", "0002", None)]))
    t.rebucket(16, rewrite=False)  # lazy: mixed layouts visible
    write_checkpoint(t)
    d = describe_detail(t)
    assert d["version"] == t.latest_version()
    assert d["n_files"] > 0 and d["total_bytes"] > 0
    assert d["table_meta"]["n_buckets"] == 16
    assert set(d["layout_histogram"]) == {8}  # nothing migrated yet
    assert d["files_with_stats"] == d["n_files"]  # stats_cols=['status']
    assert d["checkpoint_version"] == t.latest_version()
    t.migrate_buckets()
    d2 = describe_detail(t)
    assert set(d2["layout_histogram"]) == {16}  # migration visible
    assert d2["max_files_per_bucket"] >= 1


def test_clone_mid_migration_pruned_reads_survive_source_migration(spark, tmp_path):
    """r11 verdict item 5, the exact interleaving: clone a MID-MIGRATION
    table (mixed write-time layouts after a lazy rebucket + partial
    migrate), run pruned reads ON THE CLONE while the SOURCE finishes
    its migration — the clone's pinned view must stay model-exact
    throughout — then source-vacuum past the clone point and assert the
    clone's reads fail LOUDLY (missing shared files), never wrong rows."""
    NUM = "id bigint, amount double, _op string, _lsn string, _deleted string"
    src = BucketedTxLogTable(
        spark, str(tmp_path / "src"), key_cols=["id"], n_buckets=4,
        stats_cols=["amount"],
    )
    src.init_from_events(
        spark.createDataFrame(
            [(i, float(i), "r", "0001", None) for i in range(200)], NUM
        )
    )
    src.compact_buckets(min_files=1, cluster_cols=["amount"], cluster_parts=8)
    src.rebucket(8, rewrite=False)          # lazy: metadata-only
    src.migrate_buckets(max_files=2)        # PARTIAL: clone sees mixed layouts
    from cdc_streaming_pipeline_spark.sources.txlog import resolve_file_layouts

    layouts = set(resolve_file_layouts(src).values())
    assert len(layouts) > 1  # genuinely mid-migration

    c = clone_table(src, str(tmp_path / "dest"))
    want = {(r["id"], r["amount"]) for r in c.read_state().collect()}

    def probe_clone():
        df, read, total = c.read_state_pruned(
            [("amount", "between", 50.0, 80.0)]
        )
        got = {(r["id"], r["amount"]) for r in df.collect()}
        assert got == {(i, float(i)) for i in range(50, 81)}
        assert read < total  # skipping facts carried through the clone
        full = {(r["id"], r["amount"]) for r in c.read_state().collect()}
        assert full == want

    probe_clone()
    # source finishes its migration while the clone keeps reading
    while src.migrate_buckets(max_files=2)[0] is not None:
        probe_clone()
    # and diverges further (full rewrite makes every shared file dead)
    src.compact_buckets(min_files=1)
    probe_clone()

    # the documented shallow-clone caveat, asserted LOUD: source vacuum
    # past the clone point deletes shared bytes -> clone reads RAISE
    deleted = vacuum(src, retain_versions=1, min_age_seconds=0.0)
    assert deleted  # shared files physically gone
    with pytest.raises(Exception) as ei:
        c.read_state_pruned([("amount", "between", 50.0, 80.0)])[0].collect()
    msg = str(ei.value).lower()
    assert "path does not exist" in msg or "filenotfound" in msg or "unable" in msg
