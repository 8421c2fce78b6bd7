"""Change data feed (sources/txlog.py:table_changes — Delta CDF): typed
per-version change rows derived from the log at touched-files cost.

Invariants: merges classify exactly (new-only keys insert, vanished
keys delete — a CDC tombstone landing — changed rows emit pre+post
images, UNCHANGED rows of rewritten buckets emit NOTHING); DV deletes
feed the deleted images; maintenance (compact / rebucket / migrate /
vacuum) feeds nothing — a file rewrite is not a change; schema drift
unions with null fill; the feed from before version 0 replays the
initial load as inserts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    table_changes,
    write_checkpoint,
)

S = "id bigint, amount double, _op string, _lsn string, _deleted string"


def _seed(spark, path, n=100):
    t = BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=4, stats_cols=["amount"]
    )
    t.init_from_events(
        spark.createDataFrame(
            [(i, float(i), "r", "000100", None) for i in range(n)], S
        )
    )
    return t


def test_merge_classification_and_dv_deletes(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    v0 = t.latest_version()
    wave = (
        [(k, float(k) + 1000.0, "u", "000200", None) for k in (3, 13, 23, 33, 43)]
        + [(k, None, "d", "000200", "true") for k in (6, 16, 26)]
        + [(1001, 1.0, "c", "000200", None), (1002, 2.0, "c", "000200", None)]
    )
    t.merge_cdc_batch(spark.createDataFrame(wave, S))
    v1 = t.latest_version()
    t.delete_where(F.col("amount").between(50.0, 59.0))
    v2 = t.latest_version()
    t.compact_buckets(min_files=1)  # must feed nothing
    t.rebucket(8, rewrite=False)
    t.migrate_buckets()
    write_checkpoint(t)

    feed = table_changes(t, v0)
    res = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in feed.groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert res == {
        (v1, "insert"): 2,
        (v1, "delete"): 3,
        (v1, "update_preimage"): 5,
        (v1, "update_postimage"): 5,
        (v2, "delete"): 10,
    }
    pre = {
        r["id"]: r["amount"]
        for r in feed.filter(F.col("_change_type") == "update_preimage").collect()
    }
    post = {
        r["id"]: r["amount"]
        for r in feed.filter(F.col("_change_type") == "update_postimage").collect()
    }
    assert pre == {k: float(k) for k in (3, 13, 23, 33, 43)}
    assert post == {k: float(k) + 1000.0 for k in (3, 13, 23, 33, 43)}
    # DV-deleted images arrive intact
    dv_rows = {
        r["id"]
        for r in feed.filter(
            (F.col("_commit_version") == v2) & (F.col("_change_type") == "delete")
        ).collect()
    }
    assert dv_rows == set(range(50, 60))


def test_initial_load_replays_as_inserts(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=40)
    feed = table_changes(t, -1)
    assert feed.count() == 40
    assert feed.select("_change_type").distinct().collect()[0][0] == "insert"


def test_identical_reimage_feeds_nothing(spark, tmp_path):
    """Re-merging a key's CURRENT image rewrites its bucket but changes
    no row — the feed must be empty for that version."""
    t = _seed(spark, str(tmp_path / "t"), n=40)
    v0 = t.latest_version()
    t.merge_cdc_batch(
        spark.createDataFrame([(7, 7.0, "u", "000100", None)], S)
    )
    assert table_changes(t, v0).count() == 0


def test_schema_drift_unions_with_null_fill(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=20)
    v0 = t.latest_version()
    S2 = "id bigint, amount double, region string, _op string, _lsn string, _deleted string"
    t.merge_cdc_batch(
        spark.createDataFrame([(5, 500.0, "emea", "u", "000200", None)], S2)
    )
    feed = table_changes(t, v0)
    assert "region" in feed.columns
    rows = {r["_change_type"]: r for r in feed.collect()}
    assert rows["update_postimage"]["region"] == "emea"
    assert rows["update_preimage"]["region"] is None


def test_empty_feed_has_stable_schema(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=10)
    v = t.latest_version()
    t.compact_buckets(min_files=1)
    feed = table_changes(t, v)
    assert feed.count() == 0
    assert {"_change_type", "_commit_version", "id", "amount"} <= set(feed.columns)


def test_follow_changes_reconstructs_state_exactly(spark, tmp_path):
    """The CDC-consumer contract: a replica applying the feed's
    insert/update_postimage upserts and delete removes equals
    read_state after EVERY poll, through merges, DV deletes, and
    maintenance — the feed is sufficient, not just descriptive."""
    import random

    from cdc_streaming_pipeline_spark.sources.txlog import follow_changes

    rng = random.Random(99)
    t = _seed(spark, str(tmp_path / "t"), n=60)
    replica: dict[int, float] = {}
    cursor = None

    def poll():
        nonlocal cursor
        feed, cursor = follow_changes(t, cursor)
        for r in feed.collect():
            if r["_change_type"] in ("insert", "update_postimage"):
                replica[r["id"]] = r["amount"]
            elif r["_change_type"] == "delete":
                replica.pop(r["id"], None)
        got = {r["id"]: r["amount"] for r in t.read_state().collect()}
        assert replica == got

    poll()  # initial load arrives as inserts
    for step in range(6):
        roll = rng.random()
        if roll < 0.5:
            wave = [
                (rng.randrange(100), float(1000 * step + i), "u",
                 f"{step + 2:04d}{i:02d}", None)
                for i in range(rng.randint(1, 4))
            ]
            t.merge_cdc_batch(spark.createDataFrame(wave, S))
        elif roll < 0.75:
            lo = float(rng.randrange(0, 4000))
            t.delete_where(F.col("amount").between(lo, lo + 500.0))
        else:
            t.compact_buckets(min_files=1)
        poll()


def test_version_at_timestamp_binary_search(spark, tmp_path):
    import time

    from cdc_streaming_pipeline_spark.sources.txlog import version_at_timestamp

    t = _seed(spark, str(tmp_path / "t"), n=20)
    marks = [time.time()]
    for i in range(3):
        time.sleep(0.05)
        t.merge_cdc_batch(
            spark.createDataFrame([(i, 999.0 + i, "u", f"99{i:04d}", None)], S)
        )
        marks.append(time.time())
    assert version_at_timestamp(t, marks[0]) == 0
    for i in range(1, 4):
        assert version_at_timestamp(t, marks[i]) == i
    assert version_at_timestamp(t, time.time() + 100) == t.latest_version()
    # read_state at the resolved version is the historical state
    v = version_at_timestamp(t, marks[1])
    assert t.read_state(v).filter(F.col("id") == 1).collect()[0]["amount"] != 1000.0
    with pytest.raises(ValueError):
        version_at_timestamp(t, marks[0] - 10_000)


def test_change_feed_source_replicates_exactly_once(spark, tmp_path):
    """r12 verdict item 6: the change feed as a STREAMING SOURCE — a
    txlog table feeds the CDC pipeline the way the reference's Kafka
    topics do. ChangeFeedSource polls Debezium-shaped events
    (op 'r'/'c'/'u'/'d' + zero-padded version LSN + rewrite-style
    deletes); merging each poll into a destination with the cursor as
    txn epoch is exactly-once: a crash between merge and advance
    replays the poll and the txn tag no-ops it. B's read_state must
    equal A's after every poll, through merges, MoR deletes and MoR
    updates upstream."""
    from cdc_streaming_pipeline_spark.sources.txlog import ChangeFeedSource

    a = _seed(spark, str(tmp_path / "a"), n=80)
    bpath = str(tmp_path / "b")
    cpath = str(tmp_path / "cursor.json")

    def apply_poll():
        src = ChangeFeedSource(a, cpath)  # fresh handle: durable cursor
        events, cur = src.poll()
        b = BucketedTxLogTable(spark, bpath, key_cols=["id"], n_buckets=4)
        if b.latest_version() is None:
            b.init_from_events(events, txn=("feed", cur))
        else:
            b.merge_cdc_batch(events, txn=("feed", cur))
        src.advance(cur)
        return b

    def states_equal(b):
        sa = {r["id"]: r["amount"] for r in a.read_state().collect()}
        sb = {r["id"]: r["amount"] for r in b.read_state().collect()}
        assert sa == sb

    b = apply_poll()  # initial load arrives as op='r'
    states_equal(b)

    # upstream wave: CDC merge + MoR delete + MoR update
    a.merge_cdc_batch(
        spark.createDataFrame(
            [(3, 1003.0, "u", "000300", None), (81, 81.0, "c", "000300", None)], S
        )
    )
    a.delete_where(F.col("amount").between(10.0, 19.0))
    a.update_where(F.col("amount").between(30.0, 39.0), {"amount": F.col("amount") + 0.5})
    b = apply_poll()
    states_equal(b)

    # crash between merge and advance: redo the SAME poll with a stale
    # cursor file — the merge must no-op via its txn tag
    a.merge_cdc_batch(
        spark.createDataFrame([(5, 2005.0, "u", "000400", None)], S)
    )
    src = ChangeFeedSource(a, cpath)
    events, cur = src.poll()
    b.merge_cdc_batch(events, txn=("feed", cur))
    v_after = b.latest_version()
    # crash HERE: advance never ran; a restarted consumer re-polls
    src2 = ChangeFeedSource(a, cpath)
    assert src2.cursor == src.cursor and src2.cursor < cur
    events2, cur2 = src2.poll()
    assert cur2 == cur
    b.merge_cdc_batch(events2, txn=("feed", cur2))  # replayed: no-op
    assert b.latest_version() == v_after
    src2.advance(cur2)
    states_equal(b)

    # caught up: an empty poll is a no-op and the cursor holds
    src3 = ChangeFeedSource(a, cpath)
    events3, cur3 = src3.poll()
    assert events3.count() == 0 and cur3 == cur


def test_feed_events_compose_with_native_events(spark, tmp_path):
    """r13 verdict item 2 (the `_lsn` cast trap): feed events carry the
    SAME zero-padded LSN_WIDTH string contract every native producer
    follows (schemas.pad_lsn), so a consumer can UNION a change feed
    with a native CDC stream and fence on `_lsn` directly — no cast,
    no width mismatch. Pins: (1) union merges without type error and
    latest-row-wins picks the numerically-greater LSN in BOTH
    directions (feed beats older native, native beats older feed);
    (2) `lsn_as='long'` emits bigint commit versions that pad_lsn
    round-trips to the padded form bit-for-bit."""
    from cdc_streaming_pipeline_spark.operators.cdc import latest_state
    from cdc_streaming_pipeline_spark.schemas import pad_lsn
    from cdc_streaming_pipeline_spark.sources.txlog import (
        ChangeFeedSource,
        feed_as_cdc_events,
        follow_changes,
    )

    a = _seed(spark, str(tmp_path / "a"), n=10)
    # upstream commits: v1 touches ids 3 and 4 (feed LSN = pad(1))
    a.merge_cdc_batch(
        spark.createDataFrame(
            [(3, 1003.0, "u", "000200", None), (4, 1004.0, "u", "000200", None)], S
        )
    )
    src = ChangeFeedSource(a)
    events, cur = src.poll()
    assert events.schema["_lsn"].dataType.typeName() == "string"

    # native stream, padded per the shared contract: id 3's native
    # event is OLDER than the feed's (version 0 < 1), id 4's is NEWER
    native = spark.createDataFrame(
        [(3, 555.0, "u", 0), (4, 444.0, "u", 2)],
        "id bigint, amount double, _op string, _v long",
    ).select(
        "id", "amount", "_op",
        pad_lsn(F.col("_v")).alias("_lsn"),
        F.lit(None).cast("string").alias("_deleted"),
    )
    mixed = events.select(*native.columns).unionByName(native)
    got = {
        r["id"]: r["amount"]
        for r in latest_state(mixed, ["id"]).collect()
    }
    assert got[3] == 1003.0  # feed (v1) beat native (v0)
    assert got[4] == 444.0   # native (v2) beat feed (v1)
    assert len(got) == 10

    # numeric variant: bigint commit versions, pad_lsn round-trip exact
    feed, _ = follow_changes(a, None)
    longs = feed_as_cdc_events(feed, lsn_as="long")
    assert longs.schema["_lsn"].dataType.typeName() == "long"
    padded = sorted(
        (r["id"], r["_lsn"])
        for r in feed_as_cdc_events(feed).select("id", "_lsn").collect()
    )
    rt = sorted(
        (r["id"], r["_lsn_rt"])
        for r in longs.select(
            "id", pad_lsn(F.col("_lsn")).alias("_lsn_rt")
        ).collect()
    )
    assert padded == rt

    import pytest as _pytest

    with _pytest.raises(ValueError):
        feed_as_cdc_events(feed, lsn_as="int")
