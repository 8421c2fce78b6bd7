"""Property tests: the round-8 per-key window operators vs brute-force
Python replays on randomized event logs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.cdc import status_transition_stats


def test_transition_stats_match_python_replay(spark):
    rng = random.Random(11)
    rows = []
    for key in range(120):
        n = rng.randint(1, 6)
        for v in range(n):
            rows.append((key, f"{v:012d}", rng.choice("ABC")))
    df = spark.createDataFrame(rows, "id bigint, _lsn string, status string")

    got = {
        (r.n_versions, r.n_status_changes): r.n_keys
        for r in status_transition_stats(df, ["id"], "status").collect()
    }

    per_key: dict[int, list[tuple[str, str]]] = {}
    for k, lsn, s in rows:
        per_key.setdefault(k, []).append((lsn, s))
    want: dict[tuple[int, int], int] = {}
    for seq in per_key.values():
        seq.sort()
        changes = sum(1 for a, b in zip(seq, seq[1:]) if a[1] != b[1])
        cell = (len(seq), changes)
        want[cell] = want.get(cell, 0) + 1
    assert got == want


def test_debounce_dedup_matches_python_replay(spark):
    """The registered debounce query's window semantics (suppress when
    within 60s of the IMMEDIATELY PRECEDING same-(user,type) event) vs a
    sequential replay, including equal-timestamp ties broken by
    event_id."""
    import datetime

    rng = random.Random(23)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(25):
        t = 0
        for _ in range(rng.randint(1, 30)):
            t += rng.choice([0, 1, 30, 59, 60, 61, 600])
            rows.append(
                (eid, base + datetime.timedelta(seconds=t), user,
                 rng.choice(["view", "click"]))
            )
            eid += 1
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, event_type string")

    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev = F.lag("ts").over(w)
    sup = (prev.isNotNull() & (F.col("ts") < prev + F.expr("INTERVAL 60 SECONDS"))).cast("long")
    got = {r.event_id: r.s for r in df.withColumn("s", sup).select("event_id", "s").collect()}

    streams: dict[tuple[int, str], list[tuple]] = {}
    for e, ts, u, ty in rows:
        streams.setdefault((u, ty), []).append((ts, e))
    want = {}
    for seq in streams.values():
        seq.sort()
        for i, (ts, e) in enumerate(seq):
            want[e] = 1 if i > 0 and (ts - seq[i - 1][0]).total_seconds() < 60 else 0
    assert got == want
