"""Event-log source/sink round-trip: declared-schema JSON read, PERMISSIVE
corrupt handling, time-partitioned write (P1-P5, S5)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.cdc import split_corrupt, with_time_partitions
from cdc_streaming_pipeline_spark.sources.event_log import (
    read_event_log,
    write_event_log,
)
from cdc_streaming_pipeline_spark.workload import CdcWorkloadGenerator


def _workload_dir(tmp_path, n_ops=60):
    gen = CdcWorkloadGenerator(seed=7)
    gen.initial_load(rows_per_table=10)
    gen.run(n_ops)
    src = str(tmp_path / "src")
    gen.write_json_files(src, n_files=3)
    return gen, src


def test_declared_schema_read_and_partitioned_roundtrip(spark, tmp_path):
    gen, src = _workload_dir(tmp_path)
    df = read_event_log(spark, src)
    assert df.count() == len(gen.events)
    # schema is declared, not inferred: decimal survives the JSON round-trip
    assert dict(df.dtypes)["price"] == "decimal(10,2)"
    assert dict(df.dtypes)["updated_at"] == "timestamp"

    out = str(tmp_path / "landed")
    good, _ = split_corrupt(df)
    write_event_log(good, out, fmt="parquet")
    # Hive-style event-time partition layout on disk
    assert glob.glob(os.path.join(out, "year=*/month=*/day=*/hour=*"))
    back = spark.read.parquet(out)
    assert back.count() == len(gen.events)

    # gzip JSON sink (byte-compat path) round-trips through the same reader
    out_json = str(tmp_path / "landed_json")
    write_event_log(good, out_json, fmt="json")
    assert glob.glob(os.path.join(out_json, "year=*/month=*/day=*/hour=*/*.gz"))
    back_json = read_event_log(spark, out_json)
    assert back_json.count() == len(gen.events)


def test_partitions_follow_event_time_not_arrival(spark, tmp_path):
    gen, src = _workload_dir(tmp_path, n_ops=120)
    df = read_event_log(spark, src)
    expected = {
        (r.year, r.month, r.day, r.hour)
        for r in with_time_partitions(df).select("year", "month", "day", "hour").distinct().collect()
    }
    out = str(tmp_path / "landed")
    write_event_log(df, out)
    on_disk = set()
    for p in glob.glob(os.path.join(out, "year=*/month=*/day=*/hour=*")):
        parts = dict(s.split("=") for s in p.split(os.sep)[-4:])
        on_disk.add((int(parts["year"]), int(parts["month"]), int(parts["day"]), int(parts["hour"])))
    assert on_disk == expected
    assert len(expected) > 1  # the workload's late events span partitions


def test_permissive_read_routes_corrupt_lines_to_dlq(spark, tmp_path):
    _, src = _workload_dir(tmp_path, n_ops=20)
    with open(os.path.join(src, "poison.json"), "w", encoding="utf-8") as fh:
        fh.write('{"id": 1, "name": BROKEN\n')
        fh.write('not json at all\n')
    df = read_event_log(spark, src)
    good, bad = split_corrupt(df)
    assert bad.count() == 2
    assert good.filter(F.col("id").isNull()).count() == 0


def test_compact_event_log_collapses_small_files(spark, tmp_path):
    """Many small appended files per hour partition → one file per
    partition after compaction, with identical row content."""
    from cdc_streaming_pipeline_spark.sources.event_log import (
        compact_event_log,
        read_event_log,
        write_event_log,
    )
    from cdc_streaming_pipeline_spark.workload import CdcWorkloadGenerator
    import glob
    import os

    gen = CdcWorkloadGenerator(seed=31)
    gen.initial_load(rows_per_table=5)
    gen.run(30)
    src_json = str(tmp_path / "src")
    gen.write_json_files(src_json, n_files=1)
    log = read_event_log(spark, src_json).drop("_corrupt_record")
    sink = str(tmp_path / "sink")
    for _ in range(4):  # four appends -> >=4 files per touched partition
        write_event_log(log, sink)
    some_part = glob.glob(os.path.join(sink, "year=*/month=*/day=*/hour=*"))[0]
    assert len(glob.glob(os.path.join(some_part, "*.parquet"))) >= 4

    compacted = str(tmp_path / "compacted")
    compact_event_log(spark, sink, compacted)
    for part in glob.glob(os.path.join(compacted, "year=*/month=*/day=*/hour=*")):
        assert len(glob.glob(os.path.join(part, "*.parquet"))) == 1
    before = spark.read.parquet(sink)
    after = spark.read.parquet(compacted)
    assert before.count() == after.count()
    assert before.exceptAll(after).count() == 0


def test_schema_evolution_additive_column(spark, tmp_path):
    """A column added upstream mid-stream: reading the whole log with the
    merged schema gives NULL for pre-change rows and values after."""
    import json as jsonlib

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from cdc_streaming_pipeline_spark.schemas import cdc_event_schema, merge_schemas
    from cdc_streaming_pipeline_spark.sources.event_log import read_event_log

    src = tmp_path / "src"
    src.mkdir()
    v1 = {"id": 1, "name": "alice", "email": "a@x.com", "_op": "c",
          "_table": "customer", "_lsn": "001"}
    v2 = {"id": 2, "name": "bob", "email": "b@x.com", "loyalty_tier": "gold",
          "_op": "c", "_table": "customer", "_lsn": "002"}
    (src / "old.json").write_text(jsonlib.dumps(v1) + "\n")
    (src / "new.json").write_text(jsonlib.dumps(v2) + "\n")

    old_schema = cdc_event_schema("customer", with_corrupt=True)
    added = T.StructType([T.StructField("loyalty_tier", T.StringType(), True)])
    merged = merge_schemas(old_schema, added)
    log = read_event_log(spark, str(src), schema=merged)
    rows = {r.id: r.loyalty_tier for r in log.select("id", "loyalty_tier").collect()}
    assert rows == {1: None, 2: "gold"}
    # nothing lands in the DLQ — the unknown key was evolution, not corruption
    assert log.filter(F.col("_corrupt_record").isNotNull()).count() == 0

    # a type CHANGE is a breaking migration, not evolution
    conflicting = T.StructType([T.StructField("email", T.IntegerType(), True)])
    try:
        merge_schemas(old_schema, conflicting)
        raise AssertionError("expected TypeError on type conflict")
    except TypeError:
        pass


def test_replay_dlq_recovers_after_schema_fix(spark, tmp_path):
    """Rows quarantined under a misdeclared schema replay cleanly once the
    schema is corrected; true poison stays in the DLQ."""
    import json as jsonlib

    from pyspark.sql import types as T

    from cdc_streaming_pipeline_spark.schemas import CORRUPT_COL
    from cdc_streaming_pipeline_spark.sources.event_log import replay_dlq

    dlq = tmp_path / "dlq"
    dlq.mkdir()
    # as the pipeline writes it: one JSON object per line, raw original text
    # in the corrupt-record column
    good_line = jsonlib.dumps({"id": 7, "code": "A-1", "_op": "c",
                               "_table": "customer", "_lsn": "001"})
    poison_line = "BROKEN {"
    (dlq / "part-0.json").write_text(
        jsonlib.dumps({CORRUPT_COL: good_line}) + "\n"
        + jsonlib.dumps({CORRUPT_COL: poison_line}) + "\n"
    )
    # the original pipeline schema declared `code` as INT (the quarantine
    # reason); the corrected schema declares STRING
    fixed = T.StructType([
        T.StructField("id", T.IntegerType(), True),
        T.StructField("code", T.StringType(), True),
        T.StructField("_op", T.StringType(), True),
        T.StructField("_table", T.StringType(), True),
        T.StructField("_lsn", T.StringType(), True),
    ])
    recovered, still_bad = replay_dlq(spark, str(dlq), fixed)
    rows = recovered.collect()
    assert len(rows) == 1 and rows[0].code == "A-1" and rows[0].id == 7
    bad = still_bad.collect()
    assert len(bad) == 1 and bad[0][CORRUPT_COL] == poison_line
