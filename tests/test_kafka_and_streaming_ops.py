"""Kafka-shaped source adapter (S4/T6), stream-static enrichment (I5),
stream metrics (Q10), and key generation (Q1)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark import catalog
from cdc_streaming_pipeline_spark.operators.cdc import split_corrupt, with_generated_keys
from cdc_streaming_pipeline_spark.sources.event_log import read_event_log
from cdc_streaming_pipeline_spark.sources.kafka import parse_kafka_records, topic_filter
from cdc_streaming_pipeline_spark.streaming.pipeline import stream_static_enrich
from cdc_streaming_pipeline_spark.workload import CdcWorkloadGenerator


def _kafka_frame(spark):
    """Kafka record shape: (topic, value) with matching + non-matching
    topics, a tombstone, and a poison value."""

    def rec(table, body):
        return (f"cdc.testdb.test_schema.{table}", json.dumps(body))

    rows = [
        rec("customer", {"id": 1, "name": "alice", "_op": "c", "_table": "customer", "_lsn": "001"}),
        rec("customer", {"id": 1, "name": "alice2", "_op": "u", "_table": "customer", "_lsn": "002"}),
        rec("order", {"id": 7, "status": "pending", "_op": "c", "_table": "order", "_lsn": "003"}),
        ("cdc.testdb.test_schema.order", None),  # tombstone after a delete
        ("other.unrelated.topic", json.dumps({"id": 99})),  # regex-filtered
        ("cdc.testdb.test_schema.order", "BROKEN {"),  # poison -> corrupt col
    ]
    return spark.createDataFrame(rows, "topic string, value string")


def test_topic_regex_filter(spark):
    df = _kafka_frame(spark)
    kept = topic_filter(df)
    assert kept.count() == 5
    assert kept.filter(F.col("topic").startswith("other")).count() == 0


def test_parse_kafka_records_end_to_end(spark):
    flat = parse_kafka_records(_kafka_frame(spark))
    # tombstone dropped pre-parse, unrelated topic filtered; poison kept
    assert flat.count() == 4
    good, bad = split_corrupt(flat)
    assert good.count() == 3 and bad.count() == 1
    tables = {r._table for r in good.select("_table").collect()}
    assert tables == {"customer", "order"}
    # table name falls back to the topic segment on corrupt rows
    assert bad.first()._table == "order"


def test_stream_static_enrich_joins_dimension(spark, tmp_path):
    gen = CdcWorkloadGenerator(seed=21)
    gen.initial_load(rows_per_table=5)
    src = str(tmp_path / "src")
    gen.write_json_files(src, n_files=1)
    static_dim = spark.createDataFrame(
        [(i, f"segment_{i % 3}") for i in range(1, 50)], "customer_id int, segment string"
    )
    stream = read_event_log(spark, src, streaming=True)
    enriched = stream_static_enrich(
        stream.filter(F.col("_table") == "order"), F.broadcast(static_dim), "customer_id"
    )
    out = str(tmp_path / "out")
    q = (
        enriched.select("id", "customer_id", "segment", "_lsn")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    result = spark.read.parquet(out)
    n_orders = sum(1 for e in gen.events if e["_table"] == "order")
    assert result.count() == n_orders
    assert result.filter(F.col("segment").isNull()).count() == 0


def test_stream_metrics_reports_progress(spark, tmp_path):
    gen = CdcWorkloadGenerator(seed=22)
    gen.initial_load(rows_per_table=3)
    src = str(tmp_path / "src")
    gen.write_json_files(src, n_files=1)
    stream = read_event_log(spark, src, streaming=True)
    q = (
        stream.writeStream.format("parquet")
        .queryName("metrics_probe")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not q.recentProgress:
            time.sleep(0.5)
        metrics = {r.query_name: r for r in catalog.stream_metrics(spark).collect()}
        assert "metrics_probe" in metrics
        assert metrics["metrics_probe"].is_active
        assert metrics["metrics_probe"].batch_id is not None
    finally:
        q.stop()


def test_with_generated_keys_both_modes(spark):
    df = spark.createDataFrame([(c,) for c in "dcab"], "payload string")
    dense = with_generated_keys(df, key_col="id", order_col="payload", start=10)
    assert [(r.id, r.payload) for r in dense.orderBy("id").collect()] == [
        (10, "a"), (11, "b"), (12, "c"), (13, "d")
    ]
    sparse = with_generated_keys(df, key_col="id")
    ids = [r.id for r in sparse.collect()]
    assert len(set(ids)) == 4  # unique, shuffle-free; sparse by design


def test_session_windows_merge_by_gap(spark, tmp_path):
    """Events within the gap merge into one session; a >gap pause opens a
    new one (memory sink so we can read the final session rows)."""
    from cdc_streaming_pipeline_spark.streaming.pipeline import session_windows

    gen = CdcWorkloadGenerator(seed=23)
    gen.initial_load(rows_per_table=4)
    gen.run(20)
    src = str(tmp_path / "src")
    gen.write_json_files(src, n_files=1)
    stream = read_event_log(spark, src, streaming=True)
    sess = session_windows(stream, key_col="_table", gap="10 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_probe")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions_probe").collect()
    assert got, "expected at least one session row"
    # sessions are per-key disjoint and each holds >=1 event
    for r in got:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1
    # batch twin: total events across sessions == events with timestamps
    batch = read_event_log(spark, src)
    n_ts = batch.filter(F.col("updated_at").isNotNull()).count()
    assert sum(r.n_events for r in got) == n_ts


def test_dedup_within_watermark_collapses_redelivery(spark, tmp_path):
    """The same file content delivered twice (at-least-once source) must
    collapse to one row per (table, id, lsn)."""
    from cdc_streaming_pipeline_spark.streaming.pipeline import dedup_within_watermark

    gen = CdcWorkloadGenerator(seed=24)
    gen.initial_load(rows_per_table=4)
    src = str(tmp_path / "src")
    gen.write_json_files(src, n_files=1)
    gen.write_json_files(src, n_files=1, offset=5)  # same events, new files
    stream = read_event_log(spark, src, streaming=True)
    deduped = dedup_within_watermark(stream)
    out = str(tmp_path / "out")
    q = (
        deduped.select("_table", "id", "_lsn")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    result = spark.read.parquet(out)
    assert result.count() == len(gen.events)
    assert result.distinct().count() == len(gen.events)


def test_stream_stream_join_orders_items(spark, tmp_path):
    """Orders stream joined to the order_item stream (both demuxed from the
    same CDC log) within a time interval — state-bounded stream-stream join."""
    from cdc_streaming_pipeline_spark.streaming.pipeline import stream_stream_join

    gen = CdcWorkloadGenerator(seed=25)
    gen.initial_load(rows_per_table=6)
    gen.run(30)
    src = str(tmp_path / "src")
    gen.write_json_files(src, n_files=1)
    stream = read_event_log(spark, src, streaming=True)
    orders = stream.filter(F.col("_table") == "order").select(
        F.col("id").alias("order_id"), F.col("status"), F.col("updated_at")
    )
    items = stream.filter(F.col("_table") == "order_item").select(
        F.col("id").alias("item_id"),
        F.col("order_id").alias("item_order_id"),
        F.col("quantity"),
        F.col("updated_at").alias("item_updated_at"),
    )
    joined = stream_stream_join(
        orders,
        items,
        on=F.col("l.order_id") == F.col("r.item_order_id"),
        right_ts="item_updated_at",
    )
    out = str(tmp_path / "out")
    q = (
        joined.select("order_id", "item_id", "quantity", "status")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    result = spark.read.parquet(out)
    # batch twin over the same log
    batch = read_event_log(spark, src)
    bo = batch.filter(F.col("_table") == "order").select(
        F.col("id").alias("order_id"), "updated_at"
    )
    bi = batch.filter(F.col("_table") == "order_item").select(
        F.col("order_id").alias("item_order_id"), F.col("updated_at").alias("iu")
    )
    expected = bo.join(
        bi,
        (F.col("order_id") == F.col("item_order_id"))
        & (F.col("iu") >= F.col("updated_at") - F.expr("INTERVAL 1 hour"))
        & (F.col("iu") <= F.col("updated_at") + F.expr("INTERVAL 1 hour")),
    ).count()
    assert result.count() == expected
    assert expected > 0, "fixture should produce joinable order/item pairs"


def test_to_kafka_records_tombstone_round_trip(spark):
    """T4 emit side: tombstones.on.delete — every delete row yields an
    extra null-value record with the same key/topic, and the T4 filter in
    parse_kafka_records restores exactly the payload rows."""
    from cdc_streaming_pipeline_spark.sources.kafka import to_kafka_records

    flat = spark.createDataFrame(
        [
            (1, "alice", "c", "customer", "001"),
            (1, "alice2", "u", "customer", "002"),
            (2, "bob", "d", "customer", "003"),
            (7, "ack", "d", "customer", "004"),
        ],
        "id int, name string, _op string, _table string, _lsn string",
    )
    records = to_kafka_records(flat, topic_prefix="cdc.testdb.test_schema.")
    rows = records.collect()
    assert len(rows) == 6  # 4 payloads + 2 tombstones
    tombs = [r for r in rows if r.value is None]
    assert sorted(r.key for r in tombs) == ['{"id":2}', '{"id":7}']
    assert all(r.topic == "cdc.testdb.test_schema.customer" for r in rows)
    # round trip: regex filter + tombstone filter + declared-schema parse
    parsed = parse_kafka_records(records, entity="customer")
    back = {(r.id, r.name, r._op, r._lsn) for r in parsed.collect()}
    want = {(r.id, r.name, r._op, r._lsn) for r in flat.collect()}
    assert back == want
    # emit can be disabled (tombstones.on.delete=false)
    assert to_kafka_records(flat, tombstones_on_delete=False).count() == 4


def test_emit_tombstones_inverse_of_filter(spark):
    """filter_tombstones(emit_tombstones(x)) == x on a struct-value log."""
    from cdc_streaming_pipeline_spark.operators.cdc import (
        emit_tombstones,
        filter_tombstones,
    )

    log = spark.createDataFrame(
        [((1, "c"),), ((2, "d"),), ((3, "u"),), ((4, "d"),)],
        "value struct<id:int,_op:string>",
    )
    out = emit_tombstones(log)
    assert out.count() == 6
    assert out.filter(F.col("value").isNull()).count() == 2
    back = filter_tombstones(out)
    assert {r.value.id for r in back.collect()} == {1, 2, 3, 4}
    assert back.count() == log.count()


def _kafka_datasource_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_kafka_live_source_round_trip(spark, tmp_path):
    """LIVE-broker integration (S4): skipped in this container — the
    spark-sql-kafka package is not bundled and there is no network/broker
    (verified: no jar on the classpath, Maven unreachable). On a real
    cluster, run with

        spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>
        KAFKA_BOOTSTRAP_SERVERS=broker:9092 pytest tests/ -k kafka_live

    and this test produces via to_kafka_records + format('kafka') write,
    consumes via read_kafka_stream, and asserts the parsed rows round-trip.
    """
    import os as _os

    import pytest as _pytest

    bootstrap = _os.environ.get("KAFKA_BOOTSTRAP_SERVERS")
    if not _kafka_datasource_available(spark):
        _pytest.skip("spark-sql-kafka package not on the classpath (no network in CI)")
    if not bootstrap:
        _pytest.skip("KAFKA_BOOTSTRAP_SERVERS not set")

    from cdc_streaming_pipeline_spark.sources.kafka import (
        read_kafka_stream,
        to_kafka_records,
    )

    flat = spark.createDataFrame(
        [(1, "alice", "c", "customer", "001"), (2, "bob", "d", "customer", "002")],
        "id int, name string, _op string, _table string, _lsn string",
    )
    (
        to_kafka_records(flat)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .save()
    )
    stream = read_kafka_stream(spark, bootstrap)
    q = (
        parse_kafka_records(stream, entity="customer")
        .writeStream.format("memory")
        .queryName("kafka_live_rt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.table("kafka_live_rt")
    assert got.count() >= 2  # payload rows; tombstone filtered by T4
