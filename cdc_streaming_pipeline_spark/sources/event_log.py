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
    schema: T.StructType | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Schema-on-read scan of a landed event log (S5).

    PERMISSIVE parse: malformed lines survive as rows with only the
    corrupt-record column set — split them off with ``split_corrupt``
    instead of failing the pipeline (errors.tolerance=all).

    Pass an explicit ``schema`` (e.g. ``schemas.merge_schemas(old, new)``)
    to read a log that spans an upstream schema change: files written
    before the added column parse with NULL there, newer files populate
    it — additive evolution without rewriting history.
    """
    if schema is None:
        schema = event_schema(entity)
    reader = spark.readStream if streaming else spark.read
    if options:
        reader = reader.options(**options)
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


def replay_dlq(
    spark: SparkSession,
    dlq_path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Re-parse quarantined raw lines with a corrected/evolved schema.

    The DLQ keeps the ORIGINAL bytes (the corrupt-record column), so
    nothing is lost at quarantine time; once the schema is fixed (a
    misdeclared type, or ``merge_schemas`` after an upstream change) the
    backlog replays through the same parse path. Returns (recovered,
    still_bad) — re-run until still_bad is only true poison.
    """
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        schema = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])
    # text scan + JSON-path extraction (selecting only a column named like
    # the corrupt-record column from a raw JSON scan is disallowed —
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN — same reason as read_event_log)
    raw = spark.read.format("text").load(dlq_path).select(
        F.get_json_object("value", f"$.{CORRUPT_COL}").alias("_raw")
    )
    parsed = raw.select(
        F.from_json(
            F.col("_raw"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_p"),
        "_raw",
    ).select("_p.*", "_raw")
    recovered = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL, "_raw")
    still_bad = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col("_raw").alias(CORRUPT_COL)
    )
    return recovered, still_bad


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
