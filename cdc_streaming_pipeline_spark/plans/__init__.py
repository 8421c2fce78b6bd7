"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, str]`` (DuckDB-runnable ANSI SQL over the same
parquet tables, registered as views). Names and output column aliases match
exactly between the two — that is the driver's correctness contract.
Queries without an ORACLE entry get a rows-only check (non-SQL-expressible).
"""

from __future__ import annotations

from cdc_streaming_pipeline_spark.plans import analytics, cdc, docs, events

QUERIES = {**analytics.QUERIES, **events.QUERIES, **docs.QUERIES, **cdc.QUERIES}
ORACLE = {**analytics.ORACLE, **events.ORACLE, **docs.ORACLE, **cdc.ORACLE}

__all__ = ["QUERIES", "ORACLE"]
