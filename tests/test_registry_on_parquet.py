"""Every registered query must RUN against real driver parquet.

Round-4 lesson: pytest fixtures build timestamps via ``createDataFrame``
(TIMESTAMP_LTZ), so the Spark-4 parquet TIMESTAMP_NTZ inference break in
``user_sessions`` was invisible to the whole suite — only the driver bench
caught it. This test closes that gap: it executes every ``queries()``
entry against ``/root/testdata/sf0.001`` parquet (the same read path the
driver gate and bench use) and asserts the plan both analyzes and
executes. Row-level correctness stays with the DuckDB oracle
(``tools/oracle_check.py`` / the driver gate); this is the
environment-compatibility smoke layer.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_runs_on_parquet(spark, name):
    fn = _QUERIES[name]
    df = fn(spark, SF_DIR)
    # noop write executes the full plan JVM-side without driver collection —
    # identical to how bench.py forces execution.
    df.write.format("noop").mode("overwrite").save()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0


def test_oracle_sql_strings_run_on_duckdb():
    """Every oracle_sql() entry must be valid DuckDB SQL over the tables."""
    import duckdb

    from cdc_streaming_pipeline_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(sql).fetchone()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {e}")
    assert not bad, "\n".join(bad)


def test_ntz_inference_stays_disabled(spark):
    """Spark 4 reads timezone-less parquet timestamps as TIMESTAMP_NTZ
    unless this conf is off; NTZ breaks unix_micros/watermark expressions
    across the engine (round-4 user_sessions incident). Fail HERE with a
    clear message rather than as dozens of query errors."""
    assert spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false"
    ts_type = (
        spark.read.parquet(f"{SF_DIR}/events.parquet").schema["ts"].dataType.typeName()
    )
    assert ts_type == "timestamp", f"events.ts read as {ts_type}, expected LTZ timestamp"


@pytest.mark.slowsuite
def test_spark_and_oracle_column_names_agree(spark):
    """The driver's value-hash compare sorts columns BY NAME, so a Spark
    result aliased `sum_qty` against an oracle emitting `sum(l_quantity)`
    hash-mismatches even with identical values. Cheap full-surface pin:
    Spark side needs only plan analysis (df.columns — no job); the oracle
    side one DESCRIBE per query."""
    import duckdb

    from cdc_streaming_pipeline_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    bad = []
    for name, sql in oracles.items():
        spark_cols = sorted(_QUERIES[name](spark, SF_DIR).columns)
        oracle_cols = sorted(r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall())
        if spark_cols != oracle_cols:
            bad.append(f"{name}: spark={spark_cols} oracle={oracle_cols}")
    assert not bad, "\n".join(bad)
