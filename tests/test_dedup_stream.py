"""Streaming corpus ingestion with online dedup
(streaming/dedup_sink.py): micro-batches land in a txlog corpus with
duplicates filtered against everything already landed — exact
(fingerprint, bloom-pruned probe) and minhash (banded LSH probe against
the persisted index, exact-Jaccard verify against the persisted shingle
sets).

Pins: cross-wave and within-wave dups dropped in both modes; restart
from the checkpoint processes only new waves; a mid-batch CRASH between
the corpus commit and the index commit (minhash mode's vulnerable
window) replays to a correct, duplicate-free state because the
detection table commits last and every merge is txn-tagged; the exact
probe uses the bloom-pruned point read, not a corpus scan."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.sources.txlog import BucketedTxLogTable
from cdc_streaming_pipeline_spark.streaming.dedup_sink import dedup_stream_sink

DOCS = "doc_id bigint, text string"


def _write_wave(spark, spool, rows, name):
    spark.createDataFrame(rows, DOCS).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(spool, name)
    )


def _stream(spark, spool):
    return spark.readStream.schema(DOCS).option("maxFilesPerTrigger", "1").parquet(
        os.path.join(spool, "*")
    )


def _run(spark, spool, ckpt, **kw):
    q = dedup_stream_sink(_stream(spark, spool), ckpt, available_now=True, **kw)
    q.awaitTermination(300)


def test_exact_stream_dedup_across_waves(spark, tmp_path):
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    corpus_path = str(tmp_path / "corpus")
    os.makedirs(spool)

    _write_wave(
        spark, spool,
        [(1, "alpha beta gamma"), (2, "Alpha  beta GAMMA"), (3, "delta")],
        "w1",
    )
    _run(spark, spool, ckpt, mode="exact", corpus_path=corpus_path)
    c = BucketedTxLogTable(spark, corpus_path)
    got = {r["doc_id"]: r["fp"] for r in c.read_state().collect()}
    # 2 normalizes to 1's text: within-wave dup, lowest id survives
    assert set(got) == {1, 3}

    # wave 2: cross-wave dup (4 == 1's text), new (5), internal dups (6, 7)
    _write_wave(
        spark, spool,
        [(4, "ALPHA beta gamma"), (5, "epsilon"), (6, "zeta"), (7, " ZETA ")],
        "w2",
    )
    _run(spark, spool, ckpt, mode="exact", corpus_path=corpus_path)
    got = sorted(r["doc_id"] for r in c.read_state().collect())
    assert got == [1, 3, 5, 6]

    # replay with a stale checkpoint: the wave re-lands, novelty is
    # empty, and the corpus log does NOT advance
    ckpt2 = str(tmp_path / "ckpt2")
    v = c.latest_version()
    _run(spark, spool, ckpt2, mode="exact", corpus_path=corpus_path)
    assert c.latest_version() == v
    assert sorted(r["doc_id"] for r in c.read_state().collect()) == [1, 3, 5, 6]


def test_exact_probe_is_bloom_pruned(spark, tmp_path, monkeypatch):
    """The novelty probe must ride read_state_where_in (bloom-pruned
    point read), not a corpus scan — spied via the method."""
    spool = str(tmp_path / "spool")
    corpus_path = str(tmp_path / "corpus")
    os.makedirs(spool)
    _write_wave(
        spark, spool,
        [(i, f"document number {i} with its own body") for i in range(40)],
        "w1",
    )
    _run(spark, spool, str(tmp_path / "c1"), mode="exact", corpus_path=corpus_path)

    calls = []
    real = BucketedTxLogTable.read_state_where_in

    def spy(self, col, values, version=None):
        out = real(self, col, values, version)
        calls.append((col, len(values), out[1], out[2]))
        return out

    monkeypatch.setattr(BucketedTxLogTable, "read_state_where_in", spy)
    _write_wave(spark, spool, [(100, "document number 3 with its own body")], "w2")
    _run(spark, spool, str(tmp_path / "c2"), mode="exact", corpus_path=corpus_path)
    monkeypatch.undo()
    # ckpt c2 is fresh, so BOTH waves replayed as batches; at least the
    # singleton wave probed through the pruned read
    assert any(col == "fp" for col, *_ in calls)
    c = BucketedTxLogTable(spark, corpus_path)
    assert c.read_state().filter(F.col("doc_id") == 100).count() == 0  # dup dropped


NEAR_A = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR_A2 = "the quick brown fox jumps over the lazy dog near the river bank tonight"
NEAR_B = "completely different content about distributed query engines and storage"


def test_minhash_stream_dedup_and_crash_replay(spark, tmp_path, monkeypatch):
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    paths = dict(
        corpus_path=str(tmp_path / "corpus"),
        index_path=str(tmp_path / "index"),
        sigs_path=str(tmp_path / "sigs"),
    )
    os.makedirs(spool)
    # 8 bands of 2 rows: collision odds per band J^2 — at J≈0.85 the
    # miss probability across 8 bands is ~1e-4 (and the seeded hashes
    # make the outcome deterministic)
    kw = dict(mode="minhash", jaccard_threshold=0.5, num_hashes=16, bands=8, **paths)

    _write_wave(spark, spool, [(1, NEAR_A), (2, NEAR_B)], "w1")
    _run(spark, spool, ckpt, **kw)
    corpus = BucketedTxLogTable(spark, paths["corpus_path"])
    assert sorted(r["doc_id"] for r in corpus.read_state().collect()) == [1, 2]

    # wave 2 near-duplicates doc 1 (one token differs) and adds a novel
    # doc — CRASH injected between the corpus commit and the index
    # commit on the first attempt
    _write_wave(spark, spool, [(10, NEAR_A2), (11, "yet another novel body entirely")], "w2")
    real = BucketedTxLogTable.merge_cdc_batch_mor
    state = {"armed": True}

    def crashing(self, batch, *a, **k):
        if state["armed"] and self.path.endswith("index"):
            state["armed"] = False
            raise RuntimeError("injected crash before the index commit")
        return real(self, batch, *a, **k)

    monkeypatch.setattr(BucketedTxLogTable, "merge_cdc_batch_mor", crashing)
    try:
        _run(spark, spool, ckpt, **kw)
        raise AssertionError("query should have failed on the injected crash")
    except Exception:
        pass
    monkeypatch.undo()

    # replay: detection re-reads the UNCHANGED index, recomputes the
    # same novel set; the already-committed corpus/sigs merges no-op on
    # their txn tags; the index commit lands
    _run(spark, spool, ckpt, **kw)
    got = sorted(r["doc_id"] for r in corpus.read_state().collect())
    assert got == [1, 2, 11], got  # 10 near-dups 1; 11 lands exactly once

    index = BucketedTxLogTable(spark, paths["index_path"])
    idx_ids = {r["doc_id"] for r in index.read_state().collect()}
    assert idx_ids == {1, 2, 11}  # index caught up on replay

    # wave 3: near-dup of the NOVEL survivor + within-wave near pair
    _write_wave(
        spark, spool,
        [(20, "yet another novel body entirely okay"), (21, NEAR_A), (22, NEAR_A)],
        "w3",
    )
    _run(spark, spool, ckpt, **kw)
    got = sorted(r["doc_id"] for r in corpus.read_state().collect())
    assert got == [1, 2, 11], got  # all three wave-3 docs are dups

    # every post-bootstrap landing on every state table was MoR: zero
    # bucket rewrites (r14 verdict item 1) — scoped to txn-tagged
    # landings (untagged entries would be maintenance folds)
    for p in paths.values():
        t = BucketedTxLogTable(spark, p)
        merges = [
            e for e in t.history()
            if e.get("txn") and str(e.get("mode", "")).startswith("merge")
        ]
        assert all(e.get("mode") == "merge_mor" for e in merges), p
        assert all(e.get("removes") == [] for e in merges), p


def test_exact_landing_is_o_batch(spark, tmp_path):
    """r14 verdict item 1: the landing must be merge-on-read — a trickle
    batch appends O(batch) bytes with ZERO bucket rewrites and (novel
    ids + leading-key blooms) zero stored images touched, independent of
    corpus size."""
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    corpus_path = str(tmp_path / "corpus")
    os.makedirs(spool)
    # a corpus whose ids spread across every bucket
    _write_wave(
        spark, spool,
        [(i, f"corpus body {i} " * 20) for i in range(400)],
        "w1",
    )
    _run(spark, spool, ckpt, mode="exact", corpus_path=corpus_path)
    c = BucketedTxLogTable(spark, corpus_path)
    base_bytes = sum(
        b for e in c.history() for b in (e.get("file_bytes") or {}).values()
    )

    _write_wave(spark, spool, [(1000, "a single novel trickle document")], "w2")
    _run(spark, spool, ckpt, mode="exact", corpus_path=corpus_path)
    merges = [e for e in c.history() if str(e.get("mode", "")).startswith("merge")]
    assert merges and all(e["mode"] == "merge_mor" for e in merges)
    for e in merges:
        assert e["removes"] == []  # zero bucket rewrites
        assert not e.get("file_dvs")  # no stored image touched (pure insert)
    trickle_bytes = sum(b for e in merges for b in e["file_bytes"].values())
    # one tiny appended file, not a rewrite of the touched bucket
    assert trickle_bytes < base_bytes / 20, (trickle_bytes, base_bytes)
    assert c.read_state().filter(F.col("doc_id") == 1000).count() == 1


def test_landing_retries_through_lost_commit_race(spark, tmp_path, monkeypatch):
    """A landing that loses one commit race to an external writer
    retries (re-resolving from the new base) instead of killing the
    stream; the txn tag keeps the retried batch exactly-once."""
    from cdc_streaming_pipeline_spark.sources.txlog import ConcurrentWriteError

    spool = str(tmp_path / "spool")
    corpus_path = str(tmp_path / "corpus")
    os.makedirs(spool)
    _write_wave(spark, spool, [(1, "alpha"), (2, "beta")], "w1")
    _run(spark, spool, str(tmp_path / "c1"), mode="exact", corpus_path=corpus_path)

    real = BucketedTxLogTable.merge_cdc_batch_mor
    state = {"armed": True}

    def flaky(self, batch, *a, **k):
        if state["armed"]:
            state["armed"] = False
            raise ConcurrentWriteError("injected lost race")
        return real(self, batch, *a, **k)

    monkeypatch.setattr(BucketedTxLogTable, "merge_cdc_batch_mor", flaky)
    _write_wave(spark, spool, [(3, "gamma")], "w2")
    _run(spark, spool, str(tmp_path / "c1"), mode="exact", corpus_path=corpus_path)
    monkeypatch.undo()
    c = BucketedTxLogTable(spark, corpus_path)
    assert sorted(r["doc_id"] for r in c.read_state().collect()) == [1, 2, 3]


@pytest.mark.slowsuite
def test_minhash_trickle_maintains_all_three_tables(spark, tmp_path):
    """Maintenance must cover corpus AND index AND sigs: a minhash
    trickle stream's per-bucket file count stays bounded on every
    state table, and every landing is MoR."""
    from cdc_streaming_pipeline_spark.sources.txlog import resolve_snapshot_state

    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    paths = dict(
        corpus_path=str(tmp_path / "corpus"),
        index_path=str(tmp_path / "index"),
        sigs_path=str(tmp_path / "sigs"),
    )
    os.makedirs(spool)
    n_waves = 10
    for w in range(n_waves):
        _write_wave(
            spark, spool,
            [(100 * w + j,
              f"wave {w} document {j} about topic {w * 3 + j} entirely distinct")
             for j in range(2)],
            f"w{w:03d}",
        )
    _run(
        spark, spool, ckpt, mode="minhash", n_buckets=4,
        max_files_per_bucket=3, **paths,
    )
    corpus = BucketedTxLogTable(spark, paths["corpus_path"])
    assert corpus.read_state().count() == n_waves * 2
    for p in paths.values():
        t = BucketedTxLogTable(spark, p)
        live, bmap, _ = resolve_snapshot_state(t)
        per_bucket: dict[int, int] = {}
        for f in live:
            per_bucket[bmap[f]] = per_bucket.get(bmap[f], 0) + 1
        assert max(per_bucket.values()) <= 4, (p, per_bucket)
        # every txn-tagged LANDING is MoR; untagged "merge" entries are
        # the maintenance folds themselves (compact_buckets' replay rule)
        landings = [
            e for e in t.history()
            if e.get("txn") and str(e.get("mode", "")).startswith("merge")
        ]
        assert landings and all(e["mode"] == "merge_mor" for e in landings), p
        folds = [e for e in t.history() if e.get("mode") == "merge" and not e.get("txn")]
        assert folds, f"{p}: trickle never folded — maintenance did not run"


@pytest.mark.slowsuite
def test_long_trickle_bounded_files_and_flat_probe(spark, tmp_path):
    """Maintenance cadence (r14 verdict item 2): over a long trickle the
    per-bucket live file count stays bounded (overgrown buckets fold
    after each batch) and a point probe reads files ∝ hits, not batch
    count."""
    from cdc_streaming_pipeline_spark.sources.txlog import resolve_snapshot_state

    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    corpus_path = str(tmp_path / "corpus")
    os.makedirs(spool)
    n_waves = 24
    for w in range(n_waves):
        _write_wave(
            spark, spool,
            [(100 * w + j, f"unique body {w}-{j}") for j in range(3)],
            f"w{w:03d}",
        )
    _run(
        spark, spool, ckpt, mode="exact", corpus_path=corpus_path,
        n_buckets=4, max_files_per_bucket=3,
        vacuum_every=8, vacuum_min_age_seconds=0.0, vacuum_retain_versions=5,
    )
    c = BucketedTxLogTable(spark, corpus_path)
    assert c.read_state().count() == n_waves * 3
    live, bmap, _ = resolve_snapshot_state(c)
    per_bucket: dict[int, int] = {}
    for f in live:
        per_bucket[bmap[f]] = per_bucket.get(bmap[f], 0) + 1
    # 24 appending batches but every bucket folded back to <= the
    # policy bound — the probe plan cannot degrade with stream age
    assert max(per_bucket.values()) <= 4, per_bucket
    probe_fp = c.read_state().select("fp").first()["fp"]
    df, files_read, files_total = c.read_state_where_in("fp", [probe_fp])
    assert df.count() == 1
    assert files_read <= 4, (files_read, files_total)
