"""Kafka CDC source adapter (S4/T6): topic-per-table streams behind the
same declared-schema parse path as the file source.

The reference consumes Debezium topics ``cdc.{db}.test_schema.{table}``
via a topics.regex (reference: airflow/dags/cdc_pipeline_dag.py:96-102,186)
with JSON values and no embedded schemas. Here the adapter is three
source-agnostic pieces:

- ``read_kafka_stream``: the real Structured Streaming Kafka source
  (requires the spark-sql-kafka package on the cluster — not bundled in
  this container, so CI exercises the parse path on Kafka-shaped frames;
  the option surface mirrors the reference's connector config).
- ``topic_filter``: T6 — the consumer-side topic-regex predicate.
- ``parse_kafka_records``: Kafka record shape (topic, key, value) →
  tombstone filter (null values, T4) → declared-schema from_json with
  PERMISSIVE corrupt column (T5/P5) → flat CDC rows + topic/table columns.

Everything downstream (operators/cdc.py, streaming/pipeline.py sinks) is
identical between Kafka and file sources — one logical pipeline, two
ingestion adapters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.cdc import filter_tombstones
from cdc_streaming_pipeline_spark.schemas import CORRUPT_COL, OP_COL, TABLE_COL
from cdc_streaming_pipeline_spark.sources.event_log import event_schema

# topics.regex the reference's sink consumes (cdc_pipeline_dag.py:186)
DEFAULT_TOPIC_PATTERN = r"cdc\..*\.test_schema\..*"


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str = DEFAULT_TOPIC_PATTERN,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Raw Kafka stream over the CDC topics.

    ``startingOffsets=earliest`` replays the initial snapshot events
    (op='r') ahead of the live tail — the S2 snapshot-then-stream contract.
    Returns the standard Kafka columns (key, value, topic, partition,
    offset, timestamp); feed through ``parse_kafka_records``.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", subscribe_pattern)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def topic_filter(df: DataFrame, pattern: str = DEFAULT_TOPIC_PATTERN) -> DataFrame:
    """T6 — sink-side topic-regex filter (scan pruning at the consumer)."""
    return df.filter(F.col("topic").rlike(pattern))


def table_from_topic(df: DataFrame, topic_col: str = "topic") -> DataFrame:
    """Derive the entity/table name from the topic's last dot segment
    (``cdc.{db}.test_schema.{table}`` → ``{table}``)."""
    return df.withColumn(
        TABLE_COL, F.element_at(F.split(F.col(topic_col), r"\."), -1)
    )


def to_kafka_records(
    df: DataFrame,
    topic_prefix: str = "cdc.postgres.test_schema.",
    key_cols: list[str] | None = None,
    tombstones_on_delete: bool = True,
) -> DataFrame:
    """EMIT-side adapter: flat CDC rows → Kafka-record-shaped frame
    (topic, key, value JSON strings) — the engine twin of the reference's
    producer config. With ``tombstones_on_delete`` (the default, mirroring
    ``tombstones.on.delete=true``, cdc_pipeline_dag.py:147) every delete
    row also yields a null-value record carrying the SAME key, so a
    log-compacted topic eventually forgets the key entirely.

    The frame feeds ``df.write.format("kafka")`` verbatim on a cluster
    with the Kafka package; without a broker the contract is tested by
    round-tripping through ``parse_kafka_records`` (tombstones filtered by
    T4, payload rows identical). Shuffle-free — projection + filtered
    union of one scan; Kafka's per-(topic, key) partition ordering is what
    places the tombstone after its delete at produce time.
    """
    keys = key_cols or ["id"]
    base = df.select(
        F.concat(F.lit(topic_prefix), F.col(TABLE_COL)).alias("topic"),
        F.to_json(F.struct(*[F.col(k) for k in keys])).alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
        (F.col(OP_COL) == F.lit("d")).alias("_is_delete"),
    )
    if not tombstones_on_delete:
        return base.drop("_is_delete")
    tombs = base.filter(F.col("_is_delete")).withColumn(
        "value", F.lit(None).cast("string")
    )
    return base.unionByName(tombs).drop("_is_delete")


def parse_kafka_records(
    df: DataFrame,
    entity: str | None = None,
    pattern: str = DEFAULT_TOPIC_PATTERN,
) -> DataFrame:
    """Kafka-shaped records → flat declared-schema CDC rows.

    Works identically on batch and streaming frames with (topic, value)
    columns: topic-regex filter → drop null-value tombstones → cast bytes
    to string → from_json with the declared schema + corrupt column →
    flatten, carrying topic and derived table name.
    """
    schema = event_schema(entity)
    records = filter_tombstones(topic_filter(df, pattern), "value")
    parsed = records.select(
        F.from_json(
            F.col("value").cast("string"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_parsed"),
        "topic",
    )
    flat = parsed.select("_parsed.*", "topic")
    if TABLE_COL in flat.columns:
        # wide schema already declares _table from the record body; keep it,
        # fall back to the topic segment when the body lacks it
        flat = flat.withColumn(
            TABLE_COL,
            F.coalesce(F.col(TABLE_COL), F.element_at(F.split("topic", r"\."), -1)),
        )
    else:
        flat = table_from_topic(flat)
    return flat
