"""Per-file Bloom filter sidecars (sources/txlog.py): the point-lookup
skipping fact for HIGH-cardinality columns — the complement of the value
dictionaries, which only exist below the distinct-count cap, and of the
[min, max] ranges, which span every file for an id-shaped column under
key-hash bucketing.

The two-language contract under test: sidecars are BUILT executor-side
with the JVM ``xxhash64`` expression (whole-stage codegen, no Python at
write time) and PROBED driver-side with the pure-Python XXH64 replica
(functions/hashing.py) — one flipped bit between them and pruning drops
live files, so the position scheme is pinned bit-for-bit here. Also
covered: exactness under present/absent probes (a bloom can only ever
prune, never lose a row), the distinct-count gate, type discipline
(incompatible probes never prune; non-bloomable column types build no
sidecar), checkpoint/clone carriage, vacuum reclamation of dead
sidecars, and the all-null-candidate empty bitmap.
"""

from __future__ import annotations

import glob
import os
import random

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.functions.hashing import spark_xxhash64
from cdc_streaming_pipeline_spark.sources.txlog import (
    BLOOM_K,
    BucketedTxLogTable,
    _bloom_pruned,
    clone_table,
    describe_detail,
    resolve_file_blooms,
    vacuum,
    write_checkpoint,
)

SCHEMA = "id bigint, customer bigint, tag string, _op string, _lsn string, _deleted string"


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _seed(spark, path, n=2000, n_buckets=8, **kw):
    """Bucketed table with a HIGH-cardinality bigint column (customer =
    id*37 — far above the dictionary margin per file) and a string tag."""
    t = BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=n_buckets,
        bloom_cols=["customer", "tag"], **kw,
    )
    rows = [(i, i * 37, f"tag-{i % 997}", "r", f"{i:08d}", None) for i in range(n)]
    t.init_from_events(_events(spark, rows))
    return t


def test_bloom_point_lookup_prunes_and_is_exact(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    # a synthetic hot value present ONLY in one merged bucket's file
    t.merge_cdc_batch(_events(spark, [(7, -424242, "hot", "u", "99999999", None)]))

    df, read, total = t.read_state_where_in("customer", [-424242])
    assert read < total  # every other file bloom-pruned
    rows = df.collect()
    assert [(r["id"], r["customer"]) for r in rows] == [(7, -424242)]

    # an absent value prunes EVERY file — zero I/O, empty result
    df, read, total = t.read_state_where_in("customer", [-999999999])
    assert read == 0 and df.count() == 0

    # a present ordinary value: its file survives, result exact
    df, read, total = t.read_state_where_in("customer", [41 * 37])
    assert read >= 1
    assert {r["id"] for r in df.collect()} == {41}


def test_bloom_string_column(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.merge_cdc_batch(_events(spark, [(11, 11 * 37, "needle", "u", "99999999", None)]))
    df, read, total = t.read_state_where_in("tag", ["needle"])
    assert read < total
    assert {r["id"] for r in df.collect()} == {11}
    df, read, _ = t.read_state_where_in("tag", ["absent-tag"])
    assert read == 0 and df.count() == 0


def test_bloom_never_loses_rows(spark, tmp_path):
    """Property: for any probe set, pruned result == unpruned filter."""
    t = _seed(spark, str(tmp_path / "t"), n=1500)
    state = t.read_state()
    rng = random.Random(12)
    for _ in range(12):
        vals = [rng.randrange(0, 1500) * 37 for _ in range(rng.randint(1, 4))]
        vals += [rng.randrange(10**7, 10**8)]  # one (almost surely) absent
        df, read, total = t.read_state_where_in("customer", vals)
        got = sorted(r["id"] for r in df.collect())
        exp = sorted(r["id"] for r in state.filter(F.col("customer").isin(vals)).collect())
        assert got == exp
        assert read <= total


def test_bloom_positions_match_jvm(spark, tmp_path):
    """The cross-language contract: probing a value KNOWN to be in a file
    must test positive against the sidecar the JVM job built (zero false
    negatives by bit-exactness, not by luck)."""
    t = _seed(spark, str(tmp_path / "t"), n=400)
    blooms = resolve_file_blooms(t)
    assert blooms  # sidecars were built
    state = t.read_state().select("id", "customer", "tag").collect()
    # every present value must KEEP at least one file under _bloom_pruned
    for r in random.Random(5).sample(state, 40):
        kept_c = [
            f for f, cols in blooms.items()
            if "customer" in cols and not _bloom_pruned(cols["customer"], [r["customer"]])
        ]
        kept_t = [
            f for f, cols in blooms.items()
            if "tag" in cols and not _bloom_pruned(cols["tag"], [r["tag"]])
        ]
        assert kept_c and kept_t


def test_bloom_gate_skips_high_cardinality_files(spark, tmp_path):
    """bloom_bits/8 is the distinct-count gate: files whose column
    cardinality exceeds it build NO sidecar (a saturated bloom prunes
    nothing and costs a scan) — probes then read conservatively."""
    t = BucketedTxLogTable(
        spark, str(tmp_path / "t"), key_cols=["id"], n_buckets=2,
        bloom_cols=["customer"], bloom_bits=256,  # gate = 32 distinct
    )
    rows = [(i, i * 37, "x", "r", f"{i:08d}", None) for i in range(2000)]
    t.init_from_events(_events(spark, rows))
    # gated-off pairs record an explicit None marker (no sidecar): the
    # coverage fact analyze_table converges on
    blooms = resolve_file_blooms(t)
    assert blooms and all(
        cols.get("customer") is None for cols in blooms.values()
    )
    df, read, total = t.read_state_where_in("customer", [-1])
    assert read == total  # no usable facts: conservative full read
    assert df.count() == 0


def test_bloom_incompatible_probe_never_prunes(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=300)
    # a string probe against a bigint bloom cannot prove absence
    df, read, total = t.read_state_where_in("customer", ["37"])
    assert read == total
    # an integer probe against a string bloom likewise
    df, read, total = t.read_state_where_in("tag", [12345])
    assert read == total


def test_bloom_out_of_domain_probe_is_provably_absent(spark, tmp_path):
    """A non-integral float can equal no bigint — provably absent without
    hashing; integral floats test as their integer image (the value
    Spark's implicit cast would match)."""
    t = _seed(spark, str(tmp_path / "t"), n=300)
    df, read, total = t.read_state_where_in("customer", [1.5])
    assert read == 0 and df.count() == 0
    df, read, total = t.read_state_where_in("customer", [float(41 * 37)])
    assert {r["id"] for r in df.collect()} == {41}


def test_bloom_large_float_probe_never_prunes(spark, tmp_path):
    """Above 2^53, double equality is LOSSY: several distinct bigints
    compare equal to one float probe under Spark's bigint→double cast
    (9007199254740993 == 9007199254740992.0 as doubles), so hashing the
    probe's single truncated integer image could bloom-prune a file
    whose NEIGHBOR bigint the residual filter would have matched. Such
    probes must keep the file."""
    t = BucketedTxLogTable(
        spark, str(tmp_path / "t"), key_cols=["id"], n_buckets=2,
        bloom_cols=["customer"],
    )
    big = 2**53 + 1  # stored bigint; NOT representable as a double
    rows = [(i, i * 37, "x", "r", f"{i:08d}", None) for i in range(300)]
    rows.append((9001, big, "big", "r", "00009001", None))
    t.init_from_events(_events(spark, rows))

    probe = float(2**53)  # equals `big` under double comparison
    # unit: the sidecar itself must refuse to prune on this probe
    blooms = resolve_file_blooms(t)
    metas = [m for fm in blooms.values() for c, m in fm.items() if m]
    assert metas and all(not _bloom_pruned(m, [probe]) for m in metas)
    # end-to-end: Spark's residual equality MATCHES the neighbor bigint,
    # so the row must come back — a prune here would lose it
    df, read, total = t.read_state_where_in("customer", [probe])
    assert read >= 1
    assert {r["id"] for r in df.collect()} == {9001}
    # sanity: in-range integral floats still prune normally
    df, read, total = t.read_state_where_in("customer", [-5.0])
    assert read == 0


def test_non_bloomable_types_build_no_sidecar(spark, tmp_path):
    t = BucketedTxLogTable(
        spark, str(tmp_path / "t"), key_cols=["id"], n_buckets=2,
        bloom_cols=["amount"],
    )
    rows = [(i, float(i), "r", f"{i:08d}", None) for i in range(100)]
    t.init_from_events(
        spark.createDataFrame(
            rows, "id bigint, amount double, _op string, _lsn string, _deleted string"
        )
    )
    blooms = resolve_file_blooms(t)  # typed None markers, no sidecars
    assert blooms and all(
        cols.get("amount") is None for cols in blooms.values()
    )
    assert not glob.glob(os.path.join(t.data_dir, "_bloom", "*.bf"))


def test_all_null_candidate_gets_empty_bitmap(spark, tmp_path):
    t = BucketedTxLogTable(
        spark, str(tmp_path / "t"), key_cols=["id"], n_buckets=2,
        bloom_cols=["customer"],
    )
    rows = [(i, None, "x", "r", f"{i:08d}", None) for i in range(50)]
    t.init_from_events(_events(spark, rows))
    blooms = resolve_file_blooms(t)
    assert blooms and all("customer" in cols for cols in blooms.values())
    df, read, total = t.read_state_where_in("customer", [1])
    assert read == 0 and df.count() == 0  # IN never matches null: sound


def test_blooms_ride_checkpoints_and_clone(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), checkpoint_interval=1)
    t.merge_cdc_batch(_events(spark, [(3, -5, "h1", "u", "99999990", None)]))
    write_checkpoint(t)
    t.merge_cdc_batch(_events(spark, [(4, -6, "h2", "u", "99999991", None)]))

    # a FRESH handle resolves blooms through checkpoint + suffix
    t2 = BucketedTxLogTable(spark, t.path)
    df, read, total = t2.read_state_where_in("customer", [-6])
    assert read < total
    assert {r["id"] for r in df.collect()} == {4}

    d = describe_detail(t2)
    assert d["files_with_blooms"] == d["n_files"]

    c = clone_table(t2, str(tmp_path / "c"))
    df, read, total = c.read_state_where_in("customer", [-5])
    assert read < total
    assert {r["id"] for r in df.collect()} == {3}


def test_vacuum_reclaims_dead_bloom_sidecars(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=500)
    before = set(glob.glob(os.path.join(t.data_dir, "_bloom", "*.bf")))
    assert before
    # compact rewrites every file; old files AND their sidecars die once
    # the old versions age out
    t.compact_buckets(min_files=1)
    after_write = set(glob.glob(os.path.join(t.data_dir, "_bloom", "*.bf")))
    assert after_write > before  # new sidecars staged alongside
    removed = vacuum(t, retain_versions=1, min_age_seconds=0.0)
    live = set(glob.glob(os.path.join(t.data_dir, "_bloom", "*.bf")))
    assert before.isdisjoint(live)  # dead sidecars reclaimed
    assert live  # current files' sidecars kept
    assert any(p.endswith(".bf") for p in removed)
    # pruned reads still work post-vacuum
    df, read, total = t.read_state_where_in("customer", [41 * 37])
    assert {r["id"] for r in df.collect()} == {41}


def test_column_predicate_equality_uses_bloom(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.merge_cdc_batch(_events(spark, [(9, -777, "h", "u", "99999999", None)]))
    df, read, total = t.read_state_filtered(F.col("customer") == -777)
    assert read < total
    assert {r["id"] for r in df.collect()} == {9}
    # OR of two point lookups prunes through the tree
    pred = (F.col("customer") == -777) | (F.col("tag") == "tag-13")
    df, read, total = t.read_state_filtered(pred)
    got = {r["id"] for r in df.collect()}
    assert got == {9} | {i for i in range(2000) if i % 997 == 13}
    assert read < total


def test_analyze_backfills_blooms_for_legacy_files(spark, tmp_path):
    """Files written by a bloom-less handle are point-lookup-blind
    forever unless ANALYZE covers them: a bloom-policy handle's
    analyze_table must build sidecars for exactly the uncovered files,
    then report nothing left to do (gated-off pairs converge via their
    None markers instead of rescanning every run)."""
    from cdc_streaming_pipeline_spark.sources.txlog import analyze_table

    plain = BucketedTxLogTable(
        spark, str(tmp_path / "t"), key_cols=["id"], n_buckets=4,
        stats_cols=["customer"],
    )
    rows = [(i, i * 37, f"tag-{i % 997}", "r", f"{i:08d}", None) for i in range(800)]
    plain.init_from_events(_events(spark, rows))
    assert all(
        cols.get("customer") is None or "customer" not in cols
        for cols in resolve_file_blooms(plain).values()
    )

    t = BucketedTxLogTable(
        spark, plain.path, stats_cols=["customer"], bloom_cols=["customer"]
    )
    v = analyze_table(t)
    assert v is not None
    blooms = resolve_file_blooms(t)
    assert blooms and all("customer" in cols for cols in blooms.values())
    df, read, total = t.read_state_where_in("customer", [-5])
    assert read == 0 and df.count() == 0  # absent key now prunes fully
    df, read, total = t.read_state_where_in("customer", [41 * 37])
    assert {r["id"] for r in df.collect()} == {41}
    assert analyze_table(t) is None  # converged: nothing uncovered
