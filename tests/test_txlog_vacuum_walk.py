"""Vacuum vs time-travel contract for DV sidecars (r13 verdict item
6): ``vacuum`` keeps a cumulative vector alive while its data file is
live in ANY retained version and keeps the retained suffix's
``dv_added`` event sidecars for CDF/MV readers — so the contract to
hold under ANY interleaving is:

  for every version v ever committed, a post-vacuum ``read_state(v)``
  is either EXACT (equal to the state the table had at v) or LOUD
  (raises on the missing file/sidecar) — never silently wrong; and
  every version inside the retention window is always EXACT.

Pinned as a seeded property walk over random merge / MoR delete / MoR
update / compact / vacuum steps, with a per-version model snapshot as
the oracle, plus the same either-exact-or-loud sweep for the change
feed (table_changes depends on dv_added sidecars vacuum may reclaim
past the horizon)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    table_changes,
    vacuum,
)

S = "id bigint, amount double, _op string, _lsn string, _deleted string"


def _seed(spark, path, n=60):
    t = BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=4, stats_cols=["amount"]
    )
    t.init_from_events(
        spark.createDataFrame(
            [(i, float(i), "r", f"{i:012d}", None) for i in range(n)], S
        )
    )
    return t


def _sweep(t, models, floor):
    """Every committed version: exact or loud; retained ones exact.
    Returns (n_exact, n_loud) so callers can assert both branches
    actually ran."""
    n_exact = n_loud = 0
    for v, want in models.items():
        try:
            got = {r["id"]: r["amount"] for r in t.read_state(v).collect()}
        except AssertionError:
            raise
        except Exception:
            assert v < floor, f"version {v} inside retention raised"
            n_loud += 1
            continue
        assert got == want, f"version {v} read back WRONG (silent corruption)"
        n_exact += 1
    return n_exact, n_loud


def test_vacuum_time_travel_walk_exact_or_loud(spark, tmp_path):
    rng = random.Random(1717)
    t = _seed(spark, str(tmp_path / "t"))
    model = {i: float(i) for i in range(60)}
    models = {t.latest_version(): dict(model)}
    floor = 0  # oldest version guaranteed retained
    lsn = 100

    for step in range(1, 15):
        roll = rng.random()
        lsn += 1
        if roll < 0.3:
            k = rng.randrange(70)
            t.merge_cdc_batch(
                spark.createDataFrame(
                    [(k, float(lsn), "u", f"{lsn:012d}", None)], S
                )
            )
            model[k] = float(lsn)
        elif roll < 0.5:
            lo = float(rng.randrange(0, 50))
            doomed = [k for k, a in model.items() if lo <= a <= lo + 5.0]
            if not doomed:
                continue
            t.delete_where(F.col("amount").between(lo, lo + 5.0))
            for k in doomed:
                del model[k]
        elif roll < 0.7:
            mod = rng.choice([7, 11])
            t.update_where(
                F.col("id") % mod == 2, {"amount": F.col("amount") + 0.25}
            )
            for k in list(model):
                if k % mod == 2:
                    model[k] += 0.25
        elif roll < 0.85:
            t.compact_buckets(min_files=1)
        else:
            retain = rng.choice([1, 2, 3])
            vacuum(t, retain_versions=retain, min_age_seconds=0.0)
            floor = max(floor, t.latest_version() - retain + 1)
            _sweep(t, models, floor)  # full sweep right after reclaim
        models[t.latest_version()] = dict(model)
        got = {r["id"]: r["amount"] for r in t.read_state().collect()}
        assert got == model, f"HEAD divergence at step {step}"

    # force a final horizon move and sweep everything
    t.compact_buckets(min_files=1)
    models[t.latest_version()] = dict(model)
    vacuum(t, retain_versions=1, min_age_seconds=0.0)
    floor = max(floor, t.latest_version())
    n_exact, n_loud = _sweep(t, models, floor)
    # the property must have exercised BOTH branches: the retained head
    # read exactly, and at least one reclaimed-past version raised
    assert n_exact >= 1 and n_loud >= 1, (n_exact, n_loud)

    # the change feed over any surviving range: exact or loud, and the
    # retained tail (nothing — the walk just vacuumed to retain=1 at a
    # compact head, whose feed is empty) must not raise
    for v in sorted(models):
        try:
            rows = table_changes(t, v).count()
        except AssertionError:
            raise
        except Exception:
            assert v < floor, f"feed from retained version {v} raised"
            continue
        assert rows >= 0


def test_vacuum_never_reclaims_retained_dv(spark, tmp_path):
    """Directed companion: with the delete version retained, its
    cumulative AND event sidecars survive vacuum and both readers
    (state + feed) stay exact."""
    t = _seed(spark, str(tmp_path / "t"))
    pre = t.latest_version()
    t.delete_where(F.col("amount").between(10.0, 19.0))
    del_v = t.latest_version()
    t.merge_cdc_batch(
        spark.createDataFrame([(70, 70.0, "c", "9" * 12, None)], S)
    )
    vacuum(t, retain_versions=3, min_age_seconds=0.0)  # covers del_v
    assert t.read_state(del_v).count() == 50
    feed = table_changes(t, pre, del_v)
    assert feed.filter(F.col("_change_type") == "delete").count() == 10
    assert t.read_state().count() == 51
