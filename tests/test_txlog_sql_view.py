"""SQL entry point over the engine's own table format (r14 verdict
missing #1): ``TxLogTable.to_view`` / ``catalog.register_txlog_table``
make a txlog table queryable with ``spark.sql`` by name — latest and
AS-OF (version or timestamp) snapshots, deletion vectors applied,
column mapping resolved to logical names, catalog-listed."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.catalog import register_txlog_table
from cdc_streaming_pipeline_spark.schemas import DELETED_COL, LSN_COL, OP_COL, pad_lsn
from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    TxLogTable,
)


def _events(spark, ids, lsn=1):
    return (
        spark.range(0, 100)
        .filter(F.col("id").isin(ids))
        .select(
            F.col("id"),
            (F.col("id") * 10.0).alias("amount"),
            F.lit("c").alias(OP_COL),
            pad_lsn(F.lit(lsn)).alias(LSN_COL),
            F.lit(None).cast("string").alias(DELETED_COL),
        )
    )


def test_plain_table_to_view_latest_and_as_of(spark, tmp_path):
    t = TxLogTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(5).select("id"))
    t0_time = time.time()
    time.sleep(0.05)
    t.commit(spark.range(5, 8).select("id"))

    t.to_view("sqlv_plain")
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlv_plain").first()["n"] == 8

    # AS OF version
    t.to_view("sqlv_plain_v0", version=0)
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlv_plain_v0").first()["n"] == 5
    # AS OF timestamp (between the two commits -> v0)
    t.to_view("sqlv_plain_ts", timestamp=t0_time + 0.01)
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlv_plain_ts").first()["n"] == 5

    # pinned at registration: a later commit is invisible until re-registered
    t.commit(spark.range(8, 10).select("id"))
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlv_plain").first()["n"] == 8
    t.to_view("sqlv_plain")
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlv_plain").first()["n"] == 10


def test_bucketed_view_applies_dvs_and_column_mapping(spark, tmp_path):
    t = BucketedTxLogTable(spark, str(tmp_path / "b"), key_cols=["id"], n_buckets=4)
    t.init_from_events(_events(spark, list(range(20))))
    # MoR delete (deletion vectors) + rename: SQL must see the logical
    # name and NOT the deleted rows
    t.delete_where(F.col("amount") >= 150.0)
    t.rename_column("amount", "total")

    t.to_view("sqlv_bucketed")
    rows = spark.sql(
        "SELECT COUNT(*) AS n, CAST(SUM(total) AS DOUBLE) AS s FROM sqlv_bucketed"
    ).first()
    assert rows["n"] == 15
    assert rows["s"] == sum(i * 10.0 for i in range(15))
    assert "total" in spark.table("sqlv_bucketed").columns
    assert "_op" not in spark.table("sqlv_bucketed").columns

    # time travel to the pre-delete version through SQL
    t.to_view("sqlv_bucketed_v0", version=0)
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlv_bucketed_v0").first()["n"] == 20


def test_register_txlog_table_catalog_listing(spark, tmp_path):
    # plain
    p = TxLogTable(spark, str(tmp_path / "p"))
    p.commit(spark.range(3).select("id"))
    register_txlog_table(spark, str(tmp_path / "p"), "sqlv_cat_plain")
    # bucketed: layout resolved from the log, no key_cols needed
    b = BucketedTxLogTable(spark, str(tmp_path / "b2"), key_cols=["id"], n_buckets=2)
    b.init_from_events(_events(spark, [1, 2, 3]))
    register_txlog_table(spark, str(tmp_path / "b2"), "sqlv_cat_bucketed")

    listed = {r["tableName"] for r in spark.sql("SHOW TABLES").collect()}
    assert {"sqlv_cat_plain", "sqlv_cat_bucketed"} <= listed
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlv_cat_plain").first()["n"] == 3
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlv_cat_bucketed").first()["n"] == 3
    # bucketed registration went through read_state (no bookkeeping cols)
    assert "_lsn" not in spark.table("sqlv_cat_bucketed").columns


def test_register_txlog_changes_cdf_via_sql(spark, tmp_path):
    """The change feed as a SQL view: a MoR delete's dv_added rows and
    a merge's inserts are auditable with plain SELECTs."""
    from cdc_streaming_pipeline_spark.catalog import register_txlog_changes

    t = BucketedTxLogTable(spark, str(tmp_path / "cdf"), key_cols=["id"], n_buckets=2)
    t.init_from_events(_events(spark, list(range(10))))  # v0
    t.delete_where(F.col("amount") >= 70.0)  # v1: DV delete of ids 7..9

    register_txlog_changes(spark, str(tmp_path / "cdf"), "cdf_sql_v", from_version=0)
    rows = {
        r["change_type"]: r["n"]
        for r in spark.sql(
            "SELECT _change_type AS change_type, COUNT(*) AS n "
            "FROM cdf_sql_v GROUP BY _change_type"
        ).collect()
    }
    assert rows == {"delete": 3}
    ids = {
        r["id"]
        for r in spark.sql("SELECT id FROM cdf_sql_v WHERE _change_type = 'delete'").collect()
    }
    assert ids == {7, 8, 9}

    # plain append-only table: loud contract error, not a confusing
    # constructor failure
    p = TxLogTable(spark, str(tmp_path / "plain"))
    p.commit(spark.range(2).select("id"))
    try:
        register_txlog_changes(spark, str(tmp_path / "plain"), "nope", 0)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "read_changes" in str(e)


def test_register_txlog_history_describe_history_via_sql(spark, tmp_path):
    """DESCRIBE HISTORY shape: one row per commit, mode/bytes/txn tag
    queryable by SQL, limit = newest N."""
    from cdc_streaming_pipeline_spark.catalog import register_txlog_history

    t = BucketedTxLogTable(spark, str(tmp_path / "h"), key_cols=["id"], n_buckets=2)
    t.init_from_events(_events(spark, [1, 2, 3]), txn=("w", 0))
    t.merge_cdc_batch_mor(_events(spark, [4], lsn=2), txn=("w", 1))
    t.delete_where(F.col("amount") >= 30.0)

    register_txlog_history(spark, str(tmp_path / "h"), "hist_v")
    rows = spark.sql(
        "SELECT version, mode, txn_writer, txn_epoch FROM hist_v ORDER BY version"
    ).collect()
    assert [(r["version"], r["mode"]) for r in rows] == [
        (0, "append"), (1, "merge_mor"), (2, "delete"),
    ]
    assert [(r["txn_writer"], r["txn_epoch"]) for r in rows[:2]] == [
        ("w", 0), ("w", 1),
    ]
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM hist_v WHERE mode = 'merge_mor' AND bytes_added > 0"
    ).first()["n"]
    assert n == 1
    # limit keeps only the newest entries
    register_txlog_history(spark, str(tmp_path / "h"), "hist_v1", limit=1)
    only = spark.sql("SELECT version FROM hist_v1").collect()
    assert [r["version"] for r in only] == [2]


def test_to_view_rejects_version_and_timestamp(spark, tmp_path):
    t = TxLogTable(spark, str(tmp_path / "t2"))
    t.commit(spark.range(1).select("id"))
    try:
        t.to_view("sqlv_bad", version=0, timestamp=time.time())
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_global_view_visible_in_global_temp(spark, tmp_path):
    t = TxLogTable(spark, str(tmp_path / "t3"))
    t.commit(spark.range(4).select("id"))
    t.to_view("sqlv_global", global_view=True)
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM global_temp.sqlv_global").first()["n"]
        == 4
    )
