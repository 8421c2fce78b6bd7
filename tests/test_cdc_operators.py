"""Unit tests for the CDC operator core (operators/cdc.py) — one test per
transform, on tiny in-memory frames (SURVEY §5 unit-test plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.cdc import (
    demux,
    enrich_metadata,
    filter_tombstones,
    latest_state,
    mark_deleted,
    scd2_history,
    split_corrupt,
    to_wide,
    unwrap_envelope,
    with_time_partitions,
)

_ENV_SCHEMA = (
    "value struct<before:struct<id:int,name:string>,"
    "after:struct<id:int,name:string>,op:string,table:string,lsn:string>"
)


def _envelopes(spark):
    rows = [
        ((None, (1, "a"), "c", "customer", "0001"),),
        (((1, "a"), (1, "b"), "u", "customer", "0002"),),
        (((1, "b"), None, "d", "customer", "0003"),),
    ]
    return spark.createDataFrame(rows, _ENV_SCHEMA)


def test_unwrap_envelope_projects_after_image_and_before_for_deletes(spark):
    out = unwrap_envelope(_envelopes(spark)).orderBy("_lsn").collect()
    assert [(r.id, r.name, r._op) for r in out] == [
        (1, "a", "c"),
        (1, "b", "u"),
        (1, "b", "d"),  # delete keeps last-known state: rewrite semantics
    ]
    assert out[0]._table == "customer" and out[0]._lsn == "0001"


def test_filter_tombstones_drops_null_value_rows_pre_parse(spark):
    df = _envelopes(spark)
    with_tomb = df.union(spark.createDataFrame([(None,)], df.schema))
    assert with_tomb.count() == 4
    assert filter_tombstones(with_tomb).count() == 3  # dropped BEFORE parse/dedup


def test_mark_deleted_with_and_without_marker_column(spark):
    with_marker = spark.createDataFrame(
        [(1, "c", None), (2, "d", "true"), (3, "u", None)],
        "id int, _op string, _deleted string",
    )
    flags = {r.id: r._is_deleted for r in mark_deleted(with_marker).collect()}
    assert flags == {1: False, 2: True, 3: False}

    no_marker = spark.createDataFrame([(1, "c"), (2, "d")], "id int, _op string")
    flags = {r.id: r._is_deleted for r in mark_deleted(no_marker).collect()}
    assert flags == {1: False, 2: True}


def test_enrich_metadata_adds_op_table_lsn(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = enrich_metadata(df, F.lit("c"), F.lit("customer"), F.lit("0001")).first()
    assert (out._op, out._table, out._lsn) == ("c", "customer", "0001")


def _entity_events(spark):
    cust = spark.createDataFrame(
        [(1, "alice", "a@x.com", None, None, None, "c", "customer", "0001")],
        "id int, name string, email string, address string, created_at timestamp,"
        " updated_at timestamp, _op string, _table string, _lsn string",
    )
    orders = spark.createDataFrame(
        [(7, 1, None, "pending", None, None, None, None, "c", "order", "0002")],
        "id int, customer_id int, order_date timestamp, status string,"
        " total_amount decimal(12,2), shipping_address string, created_at timestamp,"
        " updated_at timestamp, _op string, _table string, _lsn string",
    )
    return cust, orders


def test_to_wide_and_demux_roundtrip(spark):
    cust, orders = _entity_events(spark)
    wide = to_wide([cust, orders])
    assert wide.count() == 2
    assert "total_amount" in wide.columns and "email" in wide.columns
    # absent columns are NULL on the other entity's rows
    assert wide.filter(F.col("_table") == "customer").first().total_amount is None

    back = demux(wide, "customer")
    assert back.count() == 1
    row = back.first()
    assert row.id == 1 and row.name == "alice"
    assert "total_amount" not in back.columns  # projected to declared schema


def test_latest_state_max_lsn_wins_delete_drops_reinsert_resurrects(spark):
    events = spark.createDataFrame(
        [
            (1, "v1", "c", "t", "001", None),
            (1, "v2", "u", "t", "002", None),
            (2, "x1", "c", "t", "003", None),
            (2, "x1", "d", "t", "004", "true"),
            (3, "y1", "c", "t", "005", None),
            (3, "y1", "d", "t", "006", "true"),
            (3, "y2", "c", "t", "007", None),  # re-insert after delete
        ],
        "id int, payload string, _op string, _table string, _lsn string, _deleted string",
    )
    out = {r.id: r.payload for r in latest_state(events, key_cols=["id"]).collect()}
    assert out == {1: "v2", 3: "y2"}  # 2 deleted; 3 resurrected

    raw = latest_state(events, key_cols=["id"], drop_deleted=False)
    assert {r.id for r in raw.collect()} == {1, 2, 3}  # markers retained


def test_scd2_history_versions_close_on_next_event_deletes_close_only(spark):
    events = spark.createDataFrame(
        [
            (1, "v1", "c", "t", "001", None),
            (1, "v2", "u", "t", "002", None),
            (2, "x1", "c", "t", "003", None),
            (2, "x1", "d", "t", "004", "true"),
            (3, "y1", "c", "t", "005", None),
            (3, "y1", "d", "t", "006", "true"),
            (3, "y2", "c", "t", "007", None),  # re-insert after delete
        ],
        "id int, payload string, _op string, _table string, _lsn string, _deleted string",
    )
    out = scd2_history(events, key_cols=["id"]).orderBy("id", "valid_from").collect()
    got = [(r.id, r.payload, r.valid_from, r.valid_to, r.is_current) for r in out]
    assert got == [
        (1, "v1", "001", "002", False),  # closed by the update
        (1, "v2", "002", None, True),
        (2, "x1", "003", "004", False),  # closed by the delete; no current row
        (3, "y1", "005", "006", False),  # delete closes...
        (3, "y2", "007", None, True),  # ...re-insert opens a new current
    ]
    # current versions == latest_state survivors
    current = {r.id for r in out if r.is_current}
    assert current == {r.id for r in latest_state(events, key_cols=["id"]).collect()}


def test_with_time_partitions_derives_event_time_parts(spark):
    df = spark.createDataFrame([("2024-03-07 15:42:11",)], "ts string").select(
        F.to_timestamp("ts").alias("updated_at")
    )
    row = with_time_partitions(df).first()
    assert (row.year, row.month, row.day, row.hour) == (2024, 3, 7, 15)


def test_split_corrupt_routes_poison_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (None, '{"broken'), (2, None)], "id int, _corrupt_record string"
    )
    good, bad = split_corrupt(df)
    assert [r.id for r in good.orderBy("id").collect()] == [1, 2]
    assert "_corrupt_record" not in good.columns
    assert bad.count() == 1

    clean = spark.createDataFrame([(1,)], "id int")
    good, bad = split_corrupt(clean)
    assert good.count() == 1 and bad.count() == 0


def test_pit_join_interval_semantics(spark):
    """Point-in-time join edges: probe inside a closed interval gets that
    version, probe in the open (current) interval gets the open version,
    probe before any version or on an unknown key gets NULLs, and a probe
    exactly AT valid_to belongs to the NEXT version (half-open)."""
    from cdc_streaming_pipeline_spark.operators.joins import pit_join

    dim = spark.createDataFrame(
        [
            (1, "v1", "010", "020"),
            (1, "v2", "020", None),   # open/current
            (2, "w1", "050", "060"),  # closed, then deleted (no open row)
        ],
        "id long, payload string, valid_from string, valid_to string",
    )
    fact = spark.createDataFrame(
        [
            (1, 1, "015"),  # inside v1
            (2, 1, "020"),  # AT v1.valid_to -> v2 (half-open)
            (3, 1, "999"),  # far future -> open v2
            (4, 1, "005"),  # before first version -> null
            (5, 2, "070"),  # after deletion closed the interval -> null
            (6, 9, "015"),  # unknown key -> null
        ],
        "probe_id long, fid long, probe string",
    )
    out = {r.probe_id: r.payload for r in pit_join(fact, dim, "fid", "id", "probe").collect()}
    assert out == {1: "v1", 2: "v2", 3: "v2", 4: None, 5: None, 6: None}
    assert pit_join(fact, dim, "fid", "id", "probe").count() == 6  # never fans out


def test_ivm_group_aggregate_moves_rows_and_drops_empty_groups(spark):
    """IVM algebra on a hand-built envelope: an update MOVES a row
    between groups (debit old, credit new), a delete removes it, and a
    group whose rows all left nets to zero and disappears."""
    from pyspark.sql import functions as F

    from cdc_streaming_pipeline_spark.operators.cdc import ivm_group_aggregate

    img = "struct<id:bigint,g:string,amt:double>"
    rows = [
        # id 1: insert A(10) -> update to B(12): A must net out entirely
        (None, (1, "A", 10.0), "c"),
        ((1, "A", 10.0), (1, "B", 12.0), "u"),
        # id 2: insert B(5), then delete
        (None, (2, "B", 5.0), "c"),
        ((2, "B", 5.0), None, "d"),
        # id 3: stays in C
        (None, (3, "C", 7.0), "c"),
    ]
    env = spark.createDataFrame(
        [(r,) for r in rows],
        f"value struct<before:{img},after:{img},op:string>",
    )
    got = {
        r.g: (r.n_rows, r.total_amount)
        for r in ivm_group_aggregate(env, "g", "amt").collect()
    }
    assert got == {"B": (1, 12.0), "C": (1, 7.0)}  # A netted to zero, gone
