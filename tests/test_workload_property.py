"""The end-to-end invariant (SURVEY §5): for any seeded interleaving of
inserts/updates/deletes, the latest-state view reconstructed from the event
log equals the applied state — including the FK rules (order_items deleted
before orders; only childless orders deleted, the anti-join rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.cdc import latest_state
from cdc_streaming_pipeline_spark.sources.event_log import read_event_log
from cdc_streaming_pipeline_spark.workload import CdcWorkloadGenerator

_VALUE_COLS = {
    "customer": "address",
    "product": "stock",
    "order": "status",
    "order_item": "quantity",
}


@pytest.mark.parametrize("seed", [1, 42, 99])
def test_latest_state_equals_applied_state(spark, tmp_path, seed):
    gen = CdcWorkloadGenerator(seed=seed)
    gen.initial_load(rows_per_table=12)
    gen.run(150)
    src = str(tmp_path / f"events_{seed}")
    gen.write_json_files(src, n_files=4)

    log = read_event_log(spark, src)
    state = latest_state(log, key_cols=["id", "_table"])

    for table, value_col in _VALUE_COLS.items():
        got = {
            r.id: r[value_col]
            for r in state.filter(F.col("_table") == table).select("id", value_col).collect()
        }
        expected = {i: row[value_col] for i, row in gen.applied_state(table).items()}
        assert got == expected, f"{table} mismatch (seed={seed})"


@pytest.mark.parametrize("seed", [1, 42])
def test_referential_integrity_of_final_state(seed):
    gen = CdcWorkloadGenerator(seed=seed)
    gen.initial_load(rows_per_table=12)
    gen.run(200)
    orders = gen.applied_state("order")
    customers = gen.applied_state("customer")
    items = gen.applied_state("order_item")
    products = gen.applied_state("product")
    assert all(o["customer_id"] in customers for o in orders.values())
    assert all(i["order_id"] in orders for i in items.values())
    assert all(i["product_id"] in products for i in items.values())


def test_generator_is_deterministic():
    a = CdcWorkloadGenerator(seed=42)
    a.initial_load(8)
    a.run(50)
    b = CdcWorkloadGenerator(seed=42)
    b.initial_load(8)
    b.run(50)
    assert a.events == b.events
    assert a.state == b.state
