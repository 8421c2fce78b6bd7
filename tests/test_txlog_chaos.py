"""Seeded random-walk chaos test over the FULL bucketed-table lifecycle:
interleave merges (updates/deletes/inserts, occasionally stale-LSN
events that must lose), bucket compaction, checkpoints, vacuum,
rebucket, and fresh-handle reopens, checking read_state against a
pure-Python latest-LSN model throughout. Every maintenance op is a
logical no-op and every merge is latest-row-wins — whatever order the
walk composes them in. Deterministic (seeded) so a failure replays."""

from __future__ import annotations

import random

import pytest

from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    vacuum,
    write_checkpoint,
)

SCHEMA = "id bigint, status string, _op string, _lsn string, _deleted string"
KEYS = 80


def test_lifecycle_random_walk_matches_model(spark, tmp_path):
    rng = random.Random(1107)
    path = str(tmp_path / "chaos")
    t = BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=8, checkpoint_interval=7
    )

    model: dict[int, tuple[str, str, bool]] = {}  # key -> (status, lsn, deleted)

    def apply_model(events):
        for k, status, op, lsn, deleted in events:
            cur = model.get(k)
            if cur is None or lsn > cur[1]:
                model[k] = (status, lsn, deleted == "true")

    def live():
        return {k: s for k, (s, _, d) in model.items() if not d}

    seed = [(i, f"s{i}", "r", "0001-00", None) for i in range(40)]
    t.init_from_events(spark.createDataFrame(seed, SCHEMA))
    apply_model(seed)

    def check(tbl):
        got = {r["id"]: r["status"] for r in tbl.read_state().collect()}
        assert got == live(), f"divergence at step {step}"

    n_buckets_now = 8
    for step in range(1, 41):
        roll = rng.random()
        if roll < 0.60:
            events = []
            for i in range(rng.randint(1, 5)):
                k = rng.randrange(KEYS)
                op = rng.choice(["u", "u", "c", "d"])
                stale = rng.random() < 0.15
                # stale events sort below every fresh one but stay UNIQUE
                # (an exact-tie between two events for one key would make
                # the winner engine-defined — not what this test pins)
                lsn = f"0000-{step:02d}{i:02d}" if stale else f"{step:04d}-{i:02d}"
                deleted = "true" if op == "d" else None
                status = None if op == "d" else f"v{step}.{i}"
                events.append((k, status, op, lsn, deleted))
            t.merge_cdc_batch(spark.createDataFrame(events, SCHEMA))
            apply_model(events)
        elif roll < 0.70:
            t.compact_buckets(min_files=2)
        elif roll < 0.78:
            write_checkpoint(t)
        elif roll < 0.86:
            vacuum(t, retain_versions=3, min_age_seconds=0.0)
        elif roll < 0.93:
            n_buckets_now = 16 if n_buckets_now == 8 else 8
            t.rebucket(n_buckets_now)
        else:
            t = BucketedTxLogTable(spark, path)  # fresh handle, layout from log
            assert t.n_buckets == n_buckets_now
        if step % 5 == 0:
            check(t)

    check(t)
    # the log survived the walk structurally: dense versions, every
    # snapshot file bucket-tagged under the final layout
    from cdc_streaming_pipeline_spark.sources.txlog import resolve_snapshot_state

    snap, bmap, _ = resolve_snapshot_state(t, t.latest_version())
    assert snap and all(f in bmap for f in snap)
    assert set(bmap.values()) <= set(range(t.n_buckets))
    # recent time travel still consistent post-vacuum: the latest version
    # re-read through a FRESH handle equals the model
    check(BucketedTxLogTable(spark, path))


SCHEMA_V = "id bigint, amount double, _op string, _lsn string, _deleted string"


@pytest.mark.slowsuite
def test_lifecycle_walk_with_lazy_rebucket_clustering_and_skipping(spark, tmp_path):
    """The round's new lifecycle ops join the walk: LAZY (metadata-only)
    rebucket through the divisor chain 8→16→32, bounded migrate_buckets
    steps, CLUSTERED compaction, full-rewrite rebucket back down, and
    stats-pruned reads — read_state AND read_state_where stay model-
    exact at every checkpoint regardless of interleaving, and pruned
    reads agree with unpruned ones mid-migration (the covering rule
    under mixed layouts)."""
    import random

    from cdc_streaming_pipeline_spark.sources.txlog import (
        BucketedTxLogTable,
        vacuum,
        write_checkpoint,
    )

    rng = random.Random(2218)
    path = str(tmp_path / "chaos2")
    t = BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=8,
        checkpoint_interval=5, stats_cols=["amount"],
    )

    model: dict[int, tuple[float, str, bool]] = {}

    def apply_model(events):
        for k, amount, op, lsn, deleted in events:
            cur = model.get(k)
            if cur is None or lsn > cur[1]:
                model[k] = (amount, lsn, deleted == "true")

    def live():
        return {k: a for k, (a, _, d) in model.items() if not d}

    seed = [(i, float(i), "r", "0001-00", None) for i in range(40)]
    t.init_from_events(spark.createDataFrame(seed, SCHEMA_V))
    apply_model(seed)

    def check(tbl):
        got = {r["id"]: r["amount"] for r in tbl.read_state().collect()}
        assert got == live(), f"divergence at step {step}"
        lo, hi = 0.0, float(step * 50)
        df, read, total = tbl.read_state_where("amount", lo, hi)
        want = {k: a for k, a in live().items() if a is not None and lo <= a <= hi}
        assert {r["id"]: r["amount"] for r in df.collect()} == want, (
            f"pruned-read divergence at step {step} ({read}/{total} files)"
        )

    n_now = 8
    for step in range(1, 41):
        roll = rng.random()
        if roll < 0.55:
            events = []
            for i in range(rng.randint(1, 5)):
                k = rng.randrange(KEYS)
                op = rng.choice(["u", "u", "c", "d"])
                stale = rng.random() < 0.15
                lsn = f"0000-{step:02d}{i:02d}" if stale else f"{step:04d}-{i:02d}"
                deleted = "true" if op == "d" else None
                amount = None if op == "d" else float(step * 100 + i)
                events.append((k, amount, op, lsn, deleted))
            t.merge_cdc_batch(spark.createDataFrame(events, SCHEMA_V))
            apply_model(events)
        elif roll < 0.64:
            if rng.random() < 0.5:
                t.compact_buckets(min_files=2)
            else:
                t.compact_buckets(min_files=1, cluster_cols=["amount"],
                                  cluster_parts=n_now * 2)
        elif roll < 0.72:
            write_checkpoint(t)
        elif roll < 0.80:
            vacuum(t, retain_versions=3, min_age_seconds=0.0)
        elif roll < 0.86:
            if n_now < 32:
                n_now *= 2
                t.rebucket(n_now, rewrite=False)  # metadata-only
            else:
                n_now = 8
                t.rebucket(8, rewrite=True)  # full rewrite takes any count
        elif roll < 0.93:
            t.migrate_buckets(max_files=rng.randint(1, 4))
        else:
            t = BucketedTxLogTable(spark, path, stats_cols=["amount"])
            assert t.n_buckets == n_now
        if step % 5 == 0:
            check(t)
    check(t)

@pytest.mark.slowsuite
def test_lifecycle_walk_with_deletion_vectors_and_blooms(spark, tmp_path):
    """Chaos walk #3: merge-on-read DELETEs and bloom-sidecar point
    lookups join the lifecycle mix. delete_where's documented semantic
    is modeled exactly — a DV delete erases the row AND its LSN history,
    so a later event of ANY LSN (stale included) re-creates the key —
    and both read_state and the bloom-backed read_state_where_in stay
    model-exact at every checkpoint, through compactions that absorb
    vectors, metadata-only rebuckets, migrations, vacuum, and reopens."""
    from pyspark.sql import functions as F

    from cdc_streaming_pipeline_spark.sources.txlog import (
        BucketedTxLogTable,
        vacuum,
        write_checkpoint,
    )

    rng = random.Random(3313)
    path = str(tmp_path / "chaos3")
    t = BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=8,
        checkpoint_interval=5, stats_cols=["amount"], bloom_cols=["id"],
    )

    model: dict[int, tuple[float | None, str, bool]] = {}

    def apply_model(events):
        for k, amount, op, lsn, deleted in events:
            cur = model.get(k)
            if cur is None or lsn > cur[1]:
                model[k] = (amount, lsn, deleted == "true")

    def live():
        return {k: a for k, (a, _, d) in model.items() if not d}

    seed = [(i, float(i), "r", "0001-00", None) for i in range(40)]
    t.init_from_events(spark.createDataFrame(seed, SCHEMA_V))
    apply_model(seed)

    def check(tbl):
        got = {r["id"]: r["amount"] for r in tbl.read_state().collect()}
        assert got == live(), f"divergence at step {step}"
        # bloom-backed point lookups: 3 present-or-absent keys
        for k in [rng.randrange(KEYS) for _ in range(3)]:
            df, read, total = tbl.read_state_where_in("id", [k])
            want = {k: live()[k]} if k in live() else {}
            assert {r["id"]: r["amount"] for r in df.collect()} == want, (
                f"bloom-read divergence at step {step} key {k} "
                f"({read}/{total} files)"
            )

    n_now = 8
    for step in range(1, 41):
        roll = rng.random()
        if roll < 0.45:
            events = []
            for i in range(rng.randint(1, 5)):
                k = rng.randrange(KEYS)
                op = rng.choice(["u", "u", "c", "d"])
                stale = rng.random() < 0.15
                lsn = f"0000-{step:02d}{i:02d}" if stale else f"{step:04d}-{i:02d}"
                deleted = "true" if op == "d" else None
                amount = None if op == "d" else float(step * 100 + i)
                events.append((k, amount, op, lsn, deleted))
            # rewrite and merge-on-read merges interchange per batch —
            # identical semantics is exactly what the walk pins
            if rng.random() < 0.5:
                t.merge_cdc_batch(spark.createDataFrame(events, SCHEMA_V))
            else:
                t.merge_cdc_batch_mor(spark.createDataFrame(events, SCHEMA_V))
            apply_model(events)
        elif roll < 0.53:
            # merge-on-read delete of a random amount band; the model
            # FORGETS the keys entirely (history erased — stale events
            # may re-create them, exactly the engine's semantic)
            lo = float(rng.randrange(0, 4000))
            hi = lo + float(rng.randrange(50, 800))
            t.delete_where(F.col("amount").between(lo, hi))
            for k in [k for k, a in live().items() if a is not None and lo <= a <= hi]:
                del model[k]
        elif roll < 0.60:
            # merge-on-read UPDATE of a random band: the postimage keeps
            # the row's LSN (fencing undisturbed), so the model edits the
            # amount in place and leaves the lsn alone
            lo = float(rng.randrange(0, 4000))
            hi = lo + float(rng.randrange(50, 800))
            t.update_where(
                F.col("amount").between(lo, hi),
                {"amount": F.col("amount") + 0.5},
            )
            for k, a in list(live().items()):
                if a is not None and lo <= a <= hi:
                    model[k] = (a + 0.5, model[k][1], False)
        elif roll < 0.66:
            if rng.random() < 0.5:
                t.compact_buckets(min_files=2)
            else:
                t.compact_buckets(min_files=1, cluster_cols=["amount"],
                                  cluster_parts=n_now * 2)
        elif roll < 0.74:
            write_checkpoint(t)
        elif roll < 0.80:
            vacuum(t, retain_versions=3, min_age_seconds=0.0)
        elif roll < 0.86:
            if n_now < 32:
                n_now *= 2
                t.rebucket(n_now, rewrite=False)
            else:
                n_now = 8
                t.rebucket(8, rewrite=True)
        elif roll < 0.93:
            t.migrate_buckets(max_files=rng.randint(1, 4))
        else:
            t = BucketedTxLogTable(spark, path, stats_cols=["amount"],
                                   bloom_cols=["id"])
            assert t.n_buckets == n_now
        if step % 5 == 0:
            check(t)
    check(t)
