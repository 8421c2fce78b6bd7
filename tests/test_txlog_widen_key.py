"""One-verb key widening (sources/txlog.py:widen_key — r13 verdict
item 3): ``widen_column`` refuses key columns because the bucket layout
hashes the key's BYTES (int and bigint hash differently), so widening a
key requires a rewrite. ``widen_key`` performs widen + rebucket as ONE
atomic planned commit: snapshot read (vectors applied — output born
clean), key cast wide, whole table re-staged bucket-pure under the WIDE
hash, widening recorded in table_meta so future batches' keys cast wide
BEFORE hashing.

Pins: values exact through the migration; post-widen merges with
NARROW-typed batch keys still land in the right buckets (bucket pruning
holds — untouched buckets' files stay byte-identical); time travel to
the pre-widen era reads the narrow type; validations and the
concurrent-writer conflict are loud; a seeded walk interleaves the verb
with merges/deletes/updates/compactions model-exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    ConcurrentWriteError,
    resolve_with_checkpoint,
    table_changes,
)

S_INT = "id int, amount double, g string, _op string, _lsn string, _deleted string"
S_LONG = "id bigint, amount double, g string, _op string, _lsn string, _deleted string"


def _seed(spark, path, n=120, **kw):
    t = BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=4, stats_cols=["amount"], **kw
    )
    rows = [
        (i, float(i), ["a", "b", "c"][i % 3], "r", f"{i:012d}", None)
        for i in range(n)
    ]
    t.init_from_events(spark.createDataFrame(rows, S_INT))
    return t


def test_widen_key_one_verb_values_exact(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_where(F.col("amount").between(10.0, 19.0))  # vectors live
    pre_v = t.latest_version()
    pre_files = sorted(resolve_with_checkpoint(t))

    v = t.widen_key("id", "bigint")
    e = t._read_entry(v)
    assert e["mode"] == "rebucket"
    assert sorted(e["removes"]) == pre_files  # full planned rewrite
    assert e["table_meta"]["type_widening"]["id"] == "bigint"

    st = t.read_state()
    assert dict(st.dtypes)["id"] == "bigint"
    got = {r["id"]: r["amount"] for r in st.collect()}
    assert len(got) == 110 and 15 not in got  # DV'd rows stay gone
    assert got[50] == 50.0

    # the rewrite is born clean: no LIVE file carries a vector
    from cdc_streaming_pipeline_spark.sources.txlog import resolve_file_dvs

    assert not set(resolve_file_dvs(t)) & set(resolve_with_checkpoint(t))

    # time travel: the pre-widen era reads its narrow type exactly
    old = t.read_state(pre_v)
    assert dict(old.dtypes)["id"] == "int"
    assert old.count() == 110

    # a fresh handle sees the widened meta
    t2 = BucketedTxLogTable(spark, t.path)
    assert dict(t2.read_state().dtypes)["id"] == "bigint"


def test_post_widen_merge_narrow_batch_lands_in_right_bucket(spark, tmp_path):
    """The property the refusal protects: after widen_key, an incoming
    batch whose key arrives NARROW (int) must still hash into the wide
    layout's buckets — _to_physical casts it wide before staging. The
    merge touches exactly the keys' wide-hash buckets; every other
    bucket's files stay byte-identical."""
    t = _seed(spark, str(tmp_path / "t"))
    t.widen_key("id", "bigint")
    before = set(resolve_with_checkpoint(t))

    batch = spark.createDataFrame(
        [(7, 777.0, "m", "u", "9" * 12, None)], S_INT  # narrow int key
    )
    t.merge_cdc_batch(batch)
    e = t._read_entry(t.latest_version())
    expected_bucket = (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(7).cast("bigint")), F.lit(t.n_buckets))
            .cast("int")
            .alias("b")
        )
        .collect()[0]["b"]
    )
    assert e["buckets"] == [expected_bucket]
    # untouched buckets keep their exact files
    untouched_before = {f for f in before if f not in set(e.get("removes", []))}
    after = set(resolve_with_checkpoint(t))
    assert untouched_before <= after

    got = {r["id"]: r["amount"] for r in t.read_state().collect()}
    assert got[7] == 777.0 and got[8] == 8.0

    # and a key that only fits WIDE works end-to-end now
    big = 1 << 40
    t.merge_cdc_batch(
        spark.createDataFrame([(big, 1.5, "w", "c", "9" * 12, None)], S_LONG)
    )
    assert t.read_state().filter(F.col("id") == big).count() == 1


def test_widen_key_changes_bucket_count_same_commit(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    v = t.widen_key("id", "bigint", n_buckets=8)
    assert t.n_buckets == 8
    e = t._read_entry(v)
    assert set(e["file_layout_n"].values()) == {8}
    assert t.read_state().count() == 120
    t2 = BucketedTxLogTable(spark, t.path)
    assert t2.n_buckets == 8


def test_widen_key_validations(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="not a key column"):
        t.widen_key("amount", "bigint")
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_key("id", "smallint")  # narrowing
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_key("id", "double")  # cross-family
    with pytest.raises(ValueError, match="widen_key"):
        t.widen_column("id", "bigint")  # refusal points at the verb
    empty = BucketedTxLogTable(
        spark, str(tmp_path / "e"), key_cols=["id"], n_buckets=4
    )
    with pytest.raises(FileNotFoundError):
        empty.widen_key("id", "bigint")


def test_widen_key_conflicts_loudly(spark, tmp_path):
    """A writer racing the rewrite must not commit files under a stale
    (narrow-hash) layout: the widen loses its commit race and raises
    rather than retrying against moved data."""
    t1 = _seed(spark, str(tmp_path / "t"))
    t2 = BucketedTxLogTable(spark, t1.path)

    orig = t1._try_commit
    fired = {"n": 0}

    def race(version, entry):
        if fired["n"] == 0:
            fired["n"] = 1
            t2.merge_cdc_batch(
                spark.createDataFrame([(3, 33.0, "x", "u", "9" * 12, None)], S_INT)
            )
        return orig(version, entry)

    t1._try_commit = race
    with pytest.raises(ConcurrentWriteError):
        t1.widen_key("id", "bigint")
    # the failed attempt must not leave stale wide meta on the handle
    assert t1.type_widening == {} and t1.n_buckets == 4
    assert {r["id"]: r["amount"] for r in t1.read_state().collect()}[3] == 33.0


def test_widen_key_walk_model_exact(spark, tmp_path):
    """Seeded walk: widen_key lands mid-stream between merges, DV
    deletes, MoR updates, compactions and reopens — read_state stays
    model-exact, the change feed stays consistent, and post-widen steps
    exercise keys only a bigint can hold."""
    import random

    rng = random.Random(1414)
    t = _seed(spark, str(tmp_path / "t"), n=40)
    model = {i: float(i) for i in range(40)}
    widened = False
    lsn = 100

    for step in range(1, 15):
        roll = rng.random()
        lsn += 1
        if roll < 0.35:
            k = rng.randrange(40) if not widened or rng.random() < 0.7 else (
                (1 << 40) + rng.randrange(4)
            )
            schema = S_LONG if widened else S_INT
            t.merge_cdc_batch(
                spark.createDataFrame(
                    [(k, float(lsn), "w", "u", f"{lsn:012d}", None)], schema
                )
            )
            model[k] = float(lsn)
        elif roll < 0.5 and not widened:
            t.widen_key("id", "bigint", n_buckets=8 if rng.random() < 0.5 else None)
            widened = True
        elif roll < 0.65:
            doomed = [k for k, a in model.items() if a < 10.0]
            if doomed:
                t.delete_where(F.col("amount") < 10.0)
                for k in doomed:
                    del model[k]
        elif roll < 0.8:
            t.update_where(F.col("id") % 7 == 2, {"amount": F.col("amount") + 0.5})
            for k in list(model):
                if k % 7 == 2:
                    model[k] += 0.5
        elif roll < 0.9:
            t.compact_buckets(min_files=1)
        else:
            t = BucketedTxLogTable(spark, t.path)
        got = {r["id"]: r["amount"] for r in t.read_state().collect()}
        assert got == model, f"divergence at step {step} (widened={widened})"
    assert widened
    # the full change feed still replays to the same state
    feed = table_changes(t, -1)
    from cdc_streaming_pipeline_spark.operators.cdc import latest_state

    # replay: inserts/postimages apply, deletes remove
    last = (
        feed.withColumn(
            "_k",
            F.col("_commit_version") * 10
            + F.when(F.col("_change_type") == "update_preimage", 0).otherwise(1),
        )
    )
    import pandas as pd  # noqa: F401  (environment guard)

    rows = last.collect()
    state: dict = {}
    for r in sorted(rows, key=lambda r: r["_k"]):
        if r["_change_type"] == "delete":
            state.pop(r["id"], None)
        elif r["_change_type"] in ("insert", "update_postimage"):
            state[r["id"]] = r["amount"]
    assert state == model
