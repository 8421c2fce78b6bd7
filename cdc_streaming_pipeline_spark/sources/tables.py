"""Batch table loading over the driver-provided parquet testdata.

Parquet is the engine's native analytical format (columnar, predicate
pushdown, column pruning) — the reference's landed JSON-over-HDFS with
Hive schema-on-read maps to ``spark.read.schema(...).json`` and is kept
in sources/event_log.py for compatibility; analytical tables are parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver's events table stores INT64 TIMESTAMP(NANOS), which the
    # vectorized parquet reader rejects; read nanos as long and convert to
    # microsecond timestamps (integer division — no double round-trip).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Spark 4 defaults to inferring parquet timestamps without timezone
    # metadata as TIMESTAMP_NTZ, which unix_micros()/time arithmetic reject.
    # Pin at RUNTIME (not just session build) so callers that construct
    # their own SparkSession — like the correctness driver — get TIMESTAMP.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Belt-and-braces: if a cached relation or an engine default still
    # yields TIMESTAMP_NTZ, normalize to TIMESTAMP (session-local instant
    # semantics are identical here — testdata is generated timezone-naive).
    for col_name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col_name, F.col(col_name).cast("timestamp"))
    # NOTE: these files are single-row-group parquet (unsplittable), so
    # scans are single-partition. A blanket repartition here measured as a
    # net LOSS — tiny tables feeding Arrow/GEMM paths fragment into
    # overhead-dominated micro-batches. Operators whose per-row compute is
    # genuinely heavy fan out themselves (operators/dedup._parallelize).
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (for spark.sql use)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
