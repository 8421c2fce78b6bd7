"""Column mapping (sources/txlog.py:rename_column / drop_column — Delta
column mapping name-mode / Iceberg schema evolution): rename or drop a
column as ONE metadata commit, zero files rewritten. Files keep their
physical names forever; the versioned ``column_mapping`` in table_meta
translates at the API boundary — reads present logical names, incoming
batches are accepted under them, skipping-fact probes translate before
fact lookup, and time travel to a pre-rename version reads under the
names of that era.

Guard rails under test: re-introducing a DROPPED physical column is
refused loudly (its bytes still live in unrewritten files and would
resurrect); rename targets cannot collide with logical, physical,
dropped, or bookkeeping names; key/order columns cannot be dropped
(but CAN be renamed — bucketing keys on the physical name)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    clone_table,
    fold_mv,
    resolve_with_checkpoint,
    table_changes,
)

S = "id bigint, amount double, status string, _op string, _lsn string, _deleted string"


def _seed(spark, path, n=200, **kw):
    t = BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=4, stats_cols=["amount"], **kw
    )
    rows = [
        (i, float(i), ["open", "closed"][i % 2], "r", f"{i:06d}", None)
        for i in range(n)
    ]
    t.init_from_events(spark.createDataFrame(rows, S))
    return t


def test_rename_is_metadata_only_and_versioned(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    v0 = t.latest_version()
    files_before = sorted(resolve_with_checkpoint(t))

    v1 = t.rename_column("amount", "revenue")
    assert sorted(resolve_with_checkpoint(t)) == files_before  # no rewrite
    e = t._read_entry(v1)
    assert e["mode"] == "alter" and e["adds"] == [] and e["removes"] == []

    st = t.read_state()
    assert "revenue" in st.columns and "amount" not in st.columns
    assert st.filter(F.col("revenue") == 7.0).count() == 1
    # time travel reads under the names of that era
    old = t.read_state(v0)
    assert "amount" in old.columns and "revenue" not in old.columns


def test_merges_and_skipping_speak_logical_names(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.rename_column("amount", "revenue")
    # a batch under the NEW name lands in the same physical column
    S2 = "id bigint, revenue double, status string, _op string, _lsn string, _deleted string"
    t.merge_cdc_batch(
        spark.createDataFrame([(3, 9999.0, "open", "u", "999999", None)], S2)
    )
    st = t.read_state()
    assert st.filter(F.col("id") == 3).collect()[0]["revenue"] == 9999.0

    # pruned reads probe by logical name against physical facts
    df, fr, ft = t.read_state_where("revenue", 9000.0, 10000.0)
    assert fr < ft
    assert {r["id"] for r in df.collect()} == {3}
    df, fr, ft = t.read_state_filtered(F.col("revenue") >= 9000.0)
    assert fr < ft and {r["id"] for r in df.collect()} == {3}

    # merge-on-read delete under the logical name
    ver, nf, nd = t.delete_where(F.col("revenue") >= 9000.0)
    assert nd == 1
    assert t.read_state().filter(F.col("id") == 3).count() == 0


def test_new_handle_policy_accepts_logical_names(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.rename_column("amount", "revenue")
    t2 = BucketedTxLogTable(spark, t.path, stats_cols=["revenue"])
    S2 = "id bigint, revenue double, status string, _op string, _lsn string, _deleted string"
    t2.merge_cdc_batch(
        spark.createDataFrame([(5, 8888.0, "open", "u", "999999", None)], S2)
    )
    df, fr, ft = t2.read_state_where("revenue", 8000.0, 8900.0)
    assert fr < ft and {r["id"] for r in df.collect()} == {5}


def test_drop_column_and_readd_protection(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    v0 = t.latest_version()
    t.drop_column("status")
    st = t.read_state()
    assert "status" not in st.columns
    assert st.count() == 200  # rows untouched
    # time travel still shows the column
    assert "status" in t.read_state(v0).columns
    # re-introducing the dropped physical name is refused loudly
    with pytest.raises(ValueError, match="dropped"):
        t.merge_cdc_batch(
            spark.createDataFrame([(1, 1.0, "zzz", "u", "999999", None)], S)
        )
    # ...but a fresh name for fresh data composes fine
    t.rename_column("amount", "price")
    S3 = "id bigint, price double, _op string, _lsn string, _deleted string"
    t.merge_cdc_batch(
        spark.createDataFrame([(1, 42.0, "u", "999999", None)], S3)
    )
    assert t.read_state().filter(F.col("id") == 1).collect()[0]["price"] == 42.0


def test_rename_validations(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=20)
    with pytest.raises(ValueError):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError):
        t.rename_column("amount", "status")  # existing logical
    with pytest.raises(ValueError):
        t.rename_column("amount", "_op")  # bookkeeping
    t.drop_column("status")
    with pytest.raises(ValueError):
        t.rename_column("amount", "status")  # dropped physical
    with pytest.raises(ValueError):
        t.drop_column("id")  # key column


def test_key_column_rename_keeps_bucketing(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.rename_column("id", "order_id")
    S2 = "order_id bigint, amount double, status string, _op string, _lsn string, _deleted string"
    t.merge_cdc_batch(
        spark.createDataFrame([(7, 777.0, "open", "u", "999999", None)], S2)
    )
    st = t.read_state()
    assert "order_id" in st.columns
    assert st.filter(F.col("order_id") == 7).collect()[0]["amount"] == 777.0
    assert st.count() == 200  # an update, not a duplicate key


def test_change_feed_uniform_across_rename(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=50)
    v0 = t.latest_version()
    t.merge_cdc_batch(
        spark.createDataFrame([(2, 2222.0, "open", "u", "999990", None)], S)
    )
    t.rename_column("amount", "revenue")
    S2 = "id bigint, revenue double, status string, _op string, _lsn string, _deleted string"
    t.merge_cdc_batch(
        spark.createDataFrame([(4, 4444.0, "open", "u", "999999", None)], S2)
    )
    feed = table_changes(t, v0)
    assert "revenue" in feed.columns and "amount" not in feed.columns
    post = {
        r["id"]: r["revenue"]
        for r in feed.filter(F.col("_change_type") == "update_postimage").collect()
    }
    assert post == {2: 2222.0, 4: 4444.0}


def test_mv_and_clone_under_mapping(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=60)
    t.rename_column("amount", "revenue")
    mv = {
        r["status"]: (r["n_rows"], float(r["total"]))
        for r in fold_mv(t, ["status"], "revenue").collect()
    }
    direct = {
        r["status"]: (r["n"], float(r["s"]))
        for r in t.read_state()
        .groupBy("status")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("revenue").cast("decimal(28,6)")).alias("s"),
        )
        .collect()
    }
    assert mv == direct

    c = clone_table(t, str(tmp_path / "c"))
    st = c.read_state()
    assert "revenue" in st.columns and st.count() == 60
    # the clone evolves independently
    c.rename_column("revenue", "gross")
    assert "gross" in c.read_state().columns
    assert "revenue" in t.read_state().columns


def test_alter_interleaves_with_data_ops_model_exact(spark, tmp_path):
    """Seeded walk interleaving renames with merges, merge-on-read
    deletes, compactions and reopens. Alters are conflict-free with
    data ops BY DESIGN — everything inside the engine is physical, a
    rename changes only the boundary translation — so the walk checks
    read_state stays model-exact under the CURRENT logical name at
    every step."""
    import random

    rng = random.Random(4414)
    t = _seed(spark, str(tmp_path / "t"), n=80)
    model = {i: float(i) for i in range(80)}
    name = "amount"
    aliases = ["amount", "amt", "net_amount", "revenue_v2"]

    for step in range(1, 16):
        roll = rng.random()
        if roll < 0.45:
            rows = [
                (rng.randrange(80), float(step * 100 + i), "open", "u",
                 f"{step + 1:04d}{i:02d}", None)
                for i in range(rng.randint(1, 3))
            ]
            sch = f"id bigint, {name} double, status string, _op string, _lsn string, _deleted string"
            t.merge_cdc_batch(spark.createDataFrame(rows, sch))
            for i, v, *_ in rows:
                model[i] = v
        elif roll < 0.65:
            new = rng.choice([a for a in aliases if a != name])
            try:
                t.rename_column(name, new)
                name = new
            except ValueError:
                pass  # collision with a past physical name: refused loudly
        elif roll < 0.8:
            lo = float(rng.randrange(0, 1500))
            t.delete_where(F.col(name).between(lo, lo + 100.0))
            for i in [i for i, v in model.items() if lo <= v <= lo + 100.0]:
                del model[i]
        elif roll < 0.9:
            t.compact_buckets(min_files=1)
        else:
            t = BucketedTxLogTable(spark, t.path)
        got = {r["id"]: r[name] for r in t.read_state().collect()}
        assert got == model, f"divergence at step {step} under name {name!r}"


def test_alter_race_keeps_both_changes(spark, tmp_path):
    """Lost-update protection: an alter that loses the version race must
    re-resolve the winner's meta and re-apply its own mutation on top —
    the committed table_meta carries BOTH changes, never a stale
    in-memory copy that reverts the winner's rename or bucket count."""
    from cdc_streaming_pipeline_spark.sources.txlog import resolve_table_meta

    t1 = _seed(spark, str(tmp_path / "t"))
    t2 = BucketedTxLogTable(spark, t1.path)

    orig = t1._try_commit
    fired = {"n": 0}

    def race(version, entry):
        if fired["n"] == 0:
            fired["n"] = 1
            # the interleaved winner: a rename AND a lazy rebucket land
            # between t1's meta resolution and its commit attempt
            t2.rename_column("status", "state")
            t2.rebucket(8, rewrite=False)
        return orig(version, entry)

    t1._try_commit = race
    t1.rename_column("amount", "amt")
    meta = resolve_table_meta(t1)
    # both renames survive, and the winner's bucket count is adopted
    assert meta["column_mapping"] == {"state": "status", "amt": "amount"}
    assert int(meta["n_buckets"]) == 8
    st = t1.read_state()
    assert {"amt", "state"} <= set(st.columns)
    assert {"amount", "status"} & set(st.columns) == set()


def test_alter_race_with_conflicting_rename_raises(spark, tmp_path):
    """When the race winner makes this alter impossible (it renamed the
    same source column), the retry must raise loudly instead of
    committing a mapping for a column that no longer exists."""
    t1 = _seed(spark, str(tmp_path / "t"))
    t2 = BucketedTxLogTable(spark, t1.path)

    orig = t1._try_commit
    fired = {"n": 0}

    def race(version, entry):
        if fired["n"] == 0:
            fired["n"] = 1
            t2.rename_column("amount", "revenue")
        return orig(version, entry)

    t1._try_commit = race
    with pytest.raises(ValueError, match="no such column"):
        t1.rename_column("amount", "amt")


def test_analyze_converges_after_rename(spark, tmp_path):
    """Fact maps key on PHYSICAL names; analyze's coverage check must
    translate its (logical) policy columns before the membership test,
    or a post-rename handle sees every file as missing forever and
    rescans all live files on each call."""
    from cdc_streaming_pipeline_spark.sources.txlog import analyze_table

    t = _seed(spark, str(tmp_path / "t"))  # stats_cols=["amount"]
    t.rename_column("amount", "revenue")
    # all live files already carry facts under physical name "amount":
    # an analyze under the new logical name must be a no-op, twice
    assert analyze_table(t, stats_cols=["revenue"]) is None
    assert analyze_table(t, stats_cols=["revenue"]) is None
