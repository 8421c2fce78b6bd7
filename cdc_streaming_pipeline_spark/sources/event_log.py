"""CDC event-log source + sink: declared-schema JSON read, partitioned write.

The reference lands gzip JSON-lines under a time-based directory layout and
declares a Hive external table over it (schema-on-read; reference:
airflow/dags/cdc_pipeline_dag.py:186-207,358-387). Here:

- read: ``spark.read.schema(declared).json(path)`` — schemas are DECLARED,
  never inferred (the wire format ships no embedded schema:
  schemas.enable=false, cdc_pipeline_dag.py:148-151). PERMISSIVE mode +
  corrupt-record column feeds ``operators.cdc.split_corrupt`` (P5 DLQ).
- write: Hive-style ``year=/month=/day=/hour=`` partition dirs derived
  from the RECORD timestamp (late events land in their event-time
  partition, cdc_pipeline_dag.py:193-195), gzip JSON for byte-compat or
  parquet(+zstd) as the native analytical format. Partition pruning on
  time-range queries is free downstream.

Both functions work identically on batch and streaming DataFrames
(streaming/pipeline.py drives the same code via readStream/foreachBatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_streaming_pipeline_spark.operators.cdc import with_time_partitions
from cdc_streaming_pipeline_spark.schemas import (
    CORRUPT_COL,
    cdc_event_schema,
    wide_event_schema,
)

TIME_PARTITION_COLS = ("year", "month", "day", "hour")


def event_schema(entity: str | None = None, with_corrupt: bool = True) -> T.StructType:
    """Declared read schema: one entity's flattened CDC shape, or the wide
    (all-entities) union schema when entity is None."""
    if entity is None:
        return wide_event_schema(with_corrupt=with_corrupt)
    return cdc_event_schema(entity, with_corrupt=with_corrupt)


def read_event_log(
    spark: SparkSession,
    path: str,
    entity: str | None = None,
    fmt: str = "json",
    streaming: bool = False,
) -> DataFrame:
    """Schema-on-read scan of a landed event log (S5).

    PERMISSIVE parse: malformed lines survive as rows with only the
    corrupt-record column set — split them off with ``split_corrupt``
    instead of failing the pipeline (errors.tolerance=all).
    """
    schema = event_schema(entity)
    reader = spark.readStream if streaming else spark.read
    if fmt != "json":
        return reader.schema(schema).format(fmt).load(path)
    # JSON lines are scanned as text and parsed with from_json — exactly the
    # Kafka-value model (bytes in, declared schema applied). This also side-
    # steps Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction on raw JSON
    # scans, so the DLQ split can project just the corrupt column.
    raw = reader.format("text").load(path)
    parsed = raw.select(
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_parsed"),
        *[c for c in raw.columns if c != "value"],  # keep partition columns
    )
    return parsed.select("_parsed.*", *[c for c in parsed.columns if c != "_parsed"])


def write_event_log(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    compression: str | None = None,
    ts_col: str = "updated_at",
    mode: str = "append",
) -> None:
    """Time-partitioned append write (P1-P4).

    Partition columns are derived from the event-time column if not already
    present. Default format is parquet (columnar native); ``fmt="json",
    compression="gzip"`` reproduces the reference's landed bytes. Appends
    write new immutable files per call/micro-batch — the append-only event
    log semantics, without single-file append (SURVEY §7 P3 note).
    """
    if compression is None:
        compression = "gzip" if fmt == "json" else "zstd"
    if not all(c in df.columns for c in TIME_PARTITION_COLS):
        df = with_time_partitions(df, ts_col)
    (
        df.write.partitionBy(*TIME_PARTITION_COLS)
        .option("compression", compression)
        .format(fmt)
        .mode(mode)
        .save(path)
    )


def compact_event_log(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    fmt: str = "parquet",
    compression: str | None = None,
    files_per_partition: int = 1,
) -> None:
    """Small-file compaction: rewrite the partitioned event log with
    ``files_per_partition`` files per hour partition.

    The 60-second rotation (reference semantics) plus one-file-per-task
    appends leave each hour with dozens of tiny files; scan cost at 100 TB
    is dominated by file-open overhead long before bytes. Repartitioning
    by the partition columns routes every row of an hour to one task
    (salted across ``files_per_partition`` when >1), so each output
    partition collapses to exactly that many full-size files. Written to a
    fresh directory and swapped by the caller — never overwrite a path
    while reading it (lazy scans would race the delete). On a real
    cluster, run per-partition-range with dynamic partition overwrite to
    compact only closed hours while the stream appends to the open one.
    """
    if compression is None:
        compression = "gzip" if fmt == "json" else "zstd"
    df = spark.read.format(fmt).load(src_path)
    parts = [F.col(c) for c in TIME_PARTITION_COLS]
    if files_per_partition > 1:
        parts.append(F.pmod(F.xxhash64(*df.columns), F.lit(files_per_partition)))
    (
        df.repartition(*parts)
        .write.partitionBy(*TIME_PARTITION_COLS)
        .option("compression", compression)
        .format(fmt)
        .mode("overwrite")
        .save(dst_path)
    )
