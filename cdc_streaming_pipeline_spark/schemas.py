"""Declared schemas for the CDC data model.

Source entities mirror the reference's Postgres schema
(reference: postgres/init/init.sql:5-44); the CDC event shape mirrors the
flattened Debezium record (ExtractNewRecordState + add.fields=op,table,lsn,
delete rewrite — reference: airflow/dags/cdc_pipeline_dag.py:142-147); the
wide events schema mirrors the Hive external table DDL
(reference: airflow/dags/cdc_pipeline_dag.py:360-383).

Schemas are *declared*, never inferred: the reference ships JSON without
embedded schemas (schemas.enable=false, cdc_pipeline_dag.py:148-151), so the
consumer must know the shape — same contract here via explicit StructTypes.

Decimal fidelity: prices/amounts are DecimalType(10,2)/(12,2) end-to-end.
JSON has no decimal type, so the JSON reader path parses strings→decimal
(never through double).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- CDC metadata columns (Debezium add.fields + delete rewrite) ---------
OP_COL = "_op"  # c=insert u=update d=delete r=snapshot-read
TABLE_COL = "_table"
LSN_COL = "_lsn"  # zero-padded numeric string; monotone per stream
DELETED_COL = "_deleted"  # 'true' on delete-rewrite records
CORRUPT_COL = "_corrupt_record"

#: The pipeline-wide LSN pad width. ``_lsn`` is a STRING whose total
#: order must equal the numeric order of the underlying sequence —
#: which holds lexicographically iff every producer zero-pads to the
#: SAME width. Every in-repo producer (fixtures, workload generator,
#: change-feed source) pads to this constant; a mixed-width stream
#: silently mis-fences ('45' > '000123' lexicographically while
#: 45 < 123), so external producers must match it or consumers must
#: re-pad with ``pad_lsn`` before comparing.
LSN_WIDTH = 12


def pad_lsn(col):
    """Normalize an LSN (numeric or string) to the pipeline's
    zero-padded ``LSN_WIDTH`` string form — idempotent on conforming
    values, repairs shorter pads, and the safe way to stamp ``_lsn``
    from a numeric sequence."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = col if isinstance(col, Column) else F.col(col)
    return F.lpad(c.cast("string"), LSN_WIDTH, "0")

_META_FIELDS = [
    T.StructField(OP_COL, T.StringType(), False),
    T.StructField(TABLE_COL, T.StringType(), False),
    T.StructField(LSN_COL, T.StringType(), False),
    T.StructField(DELETED_COL, T.StringType(), True),
]


def _ts_fields() -> list[T.StructField]:
    return [
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]


CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("email", T.StringType(), False),
        T.StructField("address", T.StringType(), True),
        *_ts_fields(),
    ]
)

PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("price", T.DecimalType(10, 2), False),
        T.StructField("stock", T.IntegerType(), False),
        T.StructField("category", T.StringType(), True),
        *_ts_fields(),
    ]
)

ORDER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("customer_id", T.IntegerType(), True),
        T.StructField("order_date", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("total_amount", T.DecimalType(12, 2), False),
        T.StructField("shipping_address", T.StringType(), True),
        *_ts_fields(),
    ]
)

ORDER_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("order_id", T.IntegerType(), True),
        T.StructField("product_id", T.IntegerType(), True),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("unit_price", T.DecimalType(10, 2), False),
        *_ts_fields(),
    ]
)

ENTITY_SCHEMAS: dict[str, T.StructType] = {
    "customer": CUSTOMER_SCHEMA,
    "product": PRODUCT_SCHEMA,
    "order": ORDER_SCHEMA,
    "order_item": ORDER_ITEM_SCHEMA,
}

ENTITY_KEYS: dict[str, str] = {t: "id" for t in ENTITY_SCHEMAS}

# Wide events table: union of all entity columns + CDC metadata — the Hive
# external table cdc_db.cdc_events (22 cols, cdc_pipeline_dag.py:360-383).
WIDE_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("price", T.DecimalType(10, 2), True),
        T.StructField("stock", T.IntegerType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("customer_id", T.IntegerType(), True),
        T.StructField("order_date", T.TimestampType(), True),
        T.StructField("total_amount", T.DecimalType(12, 2), True),
        T.StructField("shipping_address", T.StringType(), True),
        T.StructField("product_id", T.IntegerType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("unit_price", T.DecimalType(10, 2), True),
        T.StructField("order_id", T.IntegerType(), True),
        *_META_FIELDS,
    ]
)


def cdc_event_schema(entity: str, with_corrupt: bool = False) -> T.StructType:
    """Flattened Debezium event schema for one entity table."""
    fields = list(ENTITY_SCHEMAS[entity].fields) + list(_META_FIELDS)
    if with_corrupt:
        fields.append(T.StructField(CORRUPT_COL, T.StringType(), True))
    return T.StructType(fields)


def wide_event_schema(with_corrupt: bool = False) -> T.StructType:
    fields = list(WIDE_EVENTS_SCHEMA.fields)
    if with_corrupt:
        fields.append(T.StructField(CORRUPT_COL, T.StringType(), True))
    return T.StructType(fields)


def merge_schemas(*schemas: T.StructType) -> T.StructType:
    """Widening union of declared schemas — CDC schema EVOLUTION.

    When the upstream DDL adds a column, wal2json starts shipping it and
    older landed files simply lack the key; declaring the merged schema
    over the whole log reads old rows with NULL and new rows populated
    (additive evolution is free with schema-on-read). Field order is
    first-seen so existing consumers keep their column positions. A TYPE
    change on an existing column is NOT evolution — it is a breaking
    migration, surfaced as an error instead of a silent coercion.
    """
    out: dict[str, T.StructField] = {}
    for s in schemas:
        for f in s.fields:
            prev = out.get(f.name)
            if prev is None:
                out[f.name] = T.StructField(f.name, f.dataType, True)
            elif prev.dataType != f.dataType:
                raise TypeError(
                    f"schema conflict on '{f.name}': {prev.dataType} vs {f.dataType}"
                )
    return T.StructType(list(out.values()))
