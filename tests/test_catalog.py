"""Catalog + health surface (Q7/Q8): CREATE DATABASE / external TABLE over
landed files, SHOW passthrough, engine-status probes."""

from __future__ import annotations

from cdc_streaming_pipeline_spark import catalog
from cdc_streaming_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_external_table_over_landed_parquet(spark, tmp_path):
    loc = str(tmp_path / "landed_region")
    load_table(spark, SF_DIR, "region").write.parquet(loc)

    catalog.create_database(spark, "cdc_db")
    catalog.create_external_table(spark, "region_ext", loc, database="cdc_db")

    dbs = {r.namespace for r in catalog.show_databases(spark).collect()}
    assert "cdc_db" in dbs
    tables = {r.tableName for r in catalog.show_tables(spark, "cdc_db").collect()}
    assert "region_ext" in tables

    n = spark.sql("SELECT COUNT(*) AS n FROM cdc_db.region_ext").first().n
    assert n == load_table(spark, SF_DIR, "region").count()

    # schema-on-read: new files under the location become visible after refresh
    load_table(spark, SF_DIR, "region").write.mode("append").parquet(loc)
    catalog.refresh_table(spark, "cdc_db.region_ext")
    assert spark.sql("SELECT COUNT(*) AS n FROM cdc_db.region_ext").first().n == 2 * n

    spark.sql("DROP TABLE cdc_db.region_ext")
    spark.sql("DROP DATABASE cdc_db")


def test_engine_status_probes(spark):
    status = {r.check: r.status for r in catalog.engine_status(spark).collect()}
    assert status["session"] == "ok"
    assert status["catalog"] == "ok"
    assert status["streams"] in ("ok", "idle")


def test_analyze_table_feeds_cbo_stats(spark, tmp_path):
    """ANALYZE TABLE writes rowCount/sizeInBytes into the catalog, and the
    statistics survive into DESCRIBE EXTENDED — the input the cost-based
    optimizer and broadcast-side selection read at plan time."""
    loc = str(tmp_path / "nation_stats")
    load_table(spark, SF_DIR, "nation").write.parquet(loc)
    catalog.create_external_table(spark, "nation_stats_t", loc, fmt="parquet")
    try:
        catalog.analyze_table(spark, "nation_stats_t", columns=["n_nationkey", "n_name"])
        stats = catalog.table_stats(spark, "nation_stats_t")
        assert "Statistics" in stats, sorted(stats)
        assert "rows" in stats["Statistics"], stats["Statistics"]
        # column-level stats are readable per column
        desc = spark.sql(
            "DESCRIBE TABLE EXTENDED nation_stats_t n_nationkey"
        ).collect()
        info = {r.info_name: r.info_value for r in desc}
        assert info.get("distinct_count") not in (None, "NULL"), info
    finally:
        spark.sql("DROP TABLE nation_stats_t")
