"""Catalog + health surface (Q7/Q8).

The reference declares its analytical surface as Hive DDL and probes
pipeline health with SQL/REST checks (CREATE DATABASE/EXTERNAL TABLE,
SHOW DATABASES/TABLES — reference: airflow/dags/cdc_pipeline_dag.py:355-391,
scripts/monitor-pipeline.sh:101-113; health probes:
cdc_pipeline_dag.py:59-83). Spark's built-in catalog replaces the Hive
metastore; external tables become ``CREATE TABLE ... USING <fmt> LOCATION``
(schema-on-read over landed files, zero-copy).

Health: the reference's replication-slot / connector-state / topic probes
map to engine-level facts — active streaming queries with their progress,
catalog reachability, session liveness — exposed as an ordinary DataFrame
so it is queryable with the same SQL surface (Q8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def create_database(spark: SparkSession, name: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def create_external_table(
    spark: SparkSession,
    table: str,
    location: str,
    fmt: str = "parquet",
    database: str | None = None,
) -> None:
    """External (unmanaged) table over landed files — the engine's
    equivalent of the reference's Hive external table: dropping it never
    deletes data, and new files under the location are visible to SQL
    immediately (schema-on-read)."""
    qualified = f"{database}.{table}" if database else table
    spark.sql(f"CREATE TABLE IF NOT EXISTS {qualified} USING {fmt} LOCATION '{location}'")


def create_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Managed bucketed table: rows are hash-bucketed (and optionally
    sorted) by the join/aggregation key AT WRITE TIME, so every later join
    or groupBy on that key between co-bucketed tables runs with NO shuffle
    and (when sorted) no sort — the write pays the shuffle once, every
    query after rides it. This is the Spark answer to the 'same join key
    every night' fact-table pattern at 100 TB; pick n_buckets ≈ target
    parallelism at full scale. (File-path tables cannot carry bucket
    metadata — bucketing requires the catalog, hence saveAsTable.)"""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def register_txlog_table(
    spark: SparkSession,
    path: str,
    name: str,
    version: int | None = None,
    timestamp: float | None = None,
    global_view: bool = False,
) -> DataFrame:
    """Make an engine-owned transactional table SQL-queryable by name —
    the missing half of the reference's Hive-DDL surface for the
    engine's OWN storage layer (external parquet tables come from
    ``create_external_table``; this is the txlog equivalent): opens the
    table at ``path`` (layout resolved from its log) and registers its
    queryable snapshot (DVs applied, tombstones filtered, column
    mapping resolved) as a temp view, optionally AS OF a version or
    timestamp. The view then shows up in ``SHOW TABLES`` like any other
    relation, so a beeline-persona user's ``SELECT COUNT(*) FROM t``
    works verbatim. Pinned at registration (snapshot isolation) —
    re-register after new commits, the same cadence as the reference's
    partition-recovery step."""
    from cdc_streaming_pipeline_spark.sources.txlog import (
        BucketedTxLogTable,
        TxLogTable,
        resolve_table_meta,
    )

    t: TxLogTable = TxLogTable(spark, path)
    if resolve_table_meta(t) is not None:
        t = BucketedTxLogTable(spark, path)
    return t.to_view(
        name, version=version, timestamp=timestamp, global_view=global_view
    )


def register_txlog_changes(
    spark: SparkSession,
    path: str,
    name: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """The CHANGE DATA FEED as SQL: registers
    ``table_changes(table, from_version, to_version)`` — typed change
    rows (`_change_type` ∈ insert/update_preimage/update_postimage/
    delete, `_commit_version`) — as a temp view, so the reference's
    SQL persona audits what changed with a plain ``SELECT``, the same
    way Delta exposes ``table_changes(...)`` as a table-valued
    function. Pinned to the log window resolved at registration, like
    ``register_txlog_table``."""
    from cdc_streaming_pipeline_spark.sources.txlog import (
        BucketedTxLogTable,
        TxLogTable,
        resolve_table_meta,
    )
    from cdc_streaming_pipeline_spark.sources.txlog import table_changes

    if resolve_table_meta(TxLogTable(spark, path)) is None:
        raise ValueError(
            f"table at {path} records no bucket layout — the typed change "
            "feed is a BucketedTxLogTable surface; a plain append-only "
            "table tails read_changes() instead"
        )
    t = BucketedTxLogTable(spark, path)
    df = table_changes(t, from_version, to_version)
    df.createOrReplaceTempView(name)
    return df


def register_txlog_history(
    spark: SparkSession,
    path: str,
    name: str,
    limit: int | None = None,
) -> DataFrame:
    """DESCRIBE HISTORY as SQL: the table's committed log — version,
    mode, wall-clock timestamp, files added/removed, bytes, txn tag —
    registered as a view, so the audit queries the reference runs over
    connector/offset state land on the engine's commit history with
    plain SELECTs (Delta's ``DESCRIBE HISTORY`` shape). ``limit`` keeps
    only the newest N entries (O(limit) log reads, the audit-UI case).
    One row per commit; file-level metadata only — never data rows."""
    from cdc_streaming_pipeline_spark.sources.txlog import TxLogTable

    t = TxLogTable(spark, path)
    rows = [
        (
            int(e["version"]),
            str(e.get("mode", "append")),
            float(e["ts"]) if e.get("ts") is not None else None,
            len(e.get("adds", [])),
            len(e.get("removes", [])),
            int(sum((e.get("file_bytes") or {}).values())),
            (e.get("txn") or [None, None])[0],
            (
                int(e["txn"][1])
                if e.get("txn") and e["txn"][1] is not None
                else None
            ),
        )
        for e in t.history(limit)
    ]
    df = spark.createDataFrame(
        rows,
        "version long, mode string, ts double, n_added int, n_removed int, "
        "bytes_added long, txn_writer string, txn_epoch long",
    )
    df.createOrReplaceTempView(name)
    return df


def show_databases(spark: SparkSession) -> DataFrame:
    return spark.sql("SHOW DATABASES")


def show_tables(spark: SparkSession, database: str | None = None) -> DataFrame:
    return spark.sql(f"SHOW TABLES IN {database}" if database else "SHOW TABLES")


def refresh_table(spark: SparkSession, qualified: str) -> None:
    """Invalidate cached file listings after out-of-band appends."""
    spark.sql(f"REFRESH TABLE {qualified}")


def recover_partitions(spark: SparkSession, qualified: str) -> None:
    """Register the Hive-style partition directories of an external table
    with the catalog (MSCK REPAIR). A partitioned external table declared
    over landed files sees ZERO rows until its partitions are recovered —
    the same step the reference's Hive DDL needs after the connector lands
    new partition dirs (cdc_pipeline_dag.py:358-387). Run again after
    out-of-band appends create new partitions."""
    spark.sql(f"MSCK REPAIR TABLE {qualified}")


def analyze_table(
    spark: SparkSession, qualified: str, columns: list[str] | None = None
) -> None:
    """Compute table (and optionally column) statistics for the
    cost-based optimizer. On a real warehouse this runs after each landing
    cycle: rowCount/sizeInBytes let the planner pick broadcast sides by
    TABLE reality rather than file-size guesswork, and column NDV/min/max
    feed join reordering under ``spark.sql.cbo.enabled``. (The reference's
    Hive stack has the same lever as ANALYZE TABLE ... COMPUTE STATISTICS;
    hive-site.xml enables the vectorized/stats machinery.)"""
    spark.sql(f"ANALYZE TABLE {qualified} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {qualified} COMPUTE STATISTICS FOR COLUMNS {cols}")


def table_stats(spark: SparkSession, qualified: str) -> dict[str, str]:
    """Read back the '# Detailed Table Information' section of DESCRIBE
    TABLE EXTENDED as a plain dict (rowCount/sizeInBytes live under its
    'Statistics' key). Only that section is returned: the column-schema and
    partition-info sections reuse col_name values ('# col_name' headers,
    partition columns repeating schema columns), so a whole-output dict
    silently overwrites entries with values from the wrong section."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {qualified}").collect()
    stats: dict[str, str] = {}
    in_detail = False
    for r in rows:
        name = (r.col_name or "").strip()
        if name == "# Detailed Table Information":
            in_detail = True
            continue
        if in_detail and name.startswith("#"):
            in_detail = False
        if in_detail and name:
            stats[name] = r.data_type
    return stats


_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("check", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("detail", T.StringType(), True),
    ]
)


def engine_status(spark: SparkSession) -> DataFrame:
    """Health-check view (Q8): one row per probe, queryable via SQL.

    Mirrors the reference's orchestrated assertions — source reachable
    (session alive), capture configured (catalog reachable), connector
    RUNNING (streaming queries + their last-progress rates).
    """
    rows: list[tuple[str, str, str | None]] = []
    try:
        version = spark.version
        rows.append(("session", "ok", f"spark {version}"))
    except Exception as exc:  # noqa: BLE001
        rows.append(("session", "error", str(exc)))
    try:
        dbs = [d.name for d in spark.catalog.listDatabases()]
        rows.append(("catalog", "ok", f"databases: {', '.join(dbs)}"))
    except Exception as exc:  # noqa: BLE001
        rows.append(("catalog", "error", str(exc)))
    streams = spark.streams.active
    rows.append(("streams", "ok" if streams else "idle", f"{len(streams)} active"))
    for q in streams:
        progress = q.lastProgress or {}
        rows.append(
            (
                f"stream:{q.name or q.id}",
                "running" if q.isActive else "stopped",
                f"batch={progress.get('batchId')} rows/s={progress.get('processedRowsPerSecond')}",
            )
        )
    return spark.createDataFrame(rows, _STATUS_SCHEMA)


_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("query_name", T.StringType(), False),
        T.StructField("is_active", T.BooleanType(), False),
        T.StructField("batch_id", T.LongType(), True),
        T.StructField("num_input_rows", T.LongType(), True),
        T.StructField("input_rows_per_second", T.DoubleType(), True),
        T.StructField("processed_rows_per_second", T.DoubleType(), True),
    ]
)


def stream_metrics(spark: SparkSession) -> DataFrame:
    """Q10 — per-streaming-query progress metrics as a queryable frame
    (the engine's equivalent of per-topic offset sums,
    scripts/monitor-pipeline.sh:53-59): rows consumed, throughput, batch id
    from each query's lastProgress."""
    rows = []
    for q in spark.streams.active:
        progress = q.lastProgress or {}
        rows.append(
            (
                q.name or str(q.id),
                q.isActive,
                progress.get("batchId"),
                progress.get("numInputRows"),
                progress.get("inputRowsPerSecond"),
                progress.get("processedRowsPerSecond"),
            )
        )
    return spark.createDataFrame(rows, _METRICS_SCHEMA)
