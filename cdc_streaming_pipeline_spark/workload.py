"""Seeded CDC workload generator (Q9) + applied-state oracle.

Re-expresses the reference test-generator's semantics (reference:
test-generator/generate_test_data.py:104-301) as a direct CDC-event
emitter: seeded random insert/update/delete mix over the four-entity
schema, with referential integrity maintained exactly like the reference —
order_items are deleted before their order, orders are only deleted when
childless (the LEFT JOIN ... IS NULL anti-join rule,
generate_test_data.py:247-251), customers/products only when unreferenced.

Instead of driving Postgres and capturing WAL, state changes are emitted
directly as flattened Debezium-shaped records (the post-SMT wire shape,
cdc_pipeline_dag.py:142-151): entity columns + _op/_table/_lsn(+_deleted
on delete-rewrite). The generator also maintains the applied state —
table -> {id -> row} — which is the ground truth for the end-to-end
invariant (SURVEY §5): latest_state(event log) == applied state.

Deterministic: same seed -> byte-identical event log. No tombstone lines
are written to files (the reference's landed JSON has none either — null
Kafka values don't serialize to sink lines); tombstone handling is
exercised at the pre-parse stage in operators/cdc.py.
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta
from typing import Any

from cdc_streaming_pipeline_spark.schemas import LSN_WIDTH

TABLES = ("customer", "product", "order", "order_item")

_BASE_TS = datetime(2024, 1, 1, 0, 0, 0)
_CATEGORIES = ("electronics", "books", "clothing", "food", "tools")
_STATUSES = ("pending", "processing", "shipped", "delivered", "cancelled")


def _iso(ts: datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%S")


class CdcWorkloadGenerator:
    """Seeded insert/update/delete event stream + applied-state oracle."""

    def __init__(self, seed: int = 42, late_event_rate: float = 0.05) -> None:
        self.rng = random.Random(seed)
        self.late_event_rate = late_event_rate
        self.lsn = 0
        self.state: dict[str, dict[int, dict[str, Any]]] = {t: {} for t in TABLES}
        self.next_id: dict[str, int] = {t: 1 for t in TABLES}
        self.events: list[dict[str, Any]] = []

    # ------------------------------------------------------------ clock --
    def _event_time(self) -> str:
        """Mostly-monotone event time: one minute per LSN, occasionally
        shifted back (late events — must land in their event-time
        partition, not arrival order)."""
        minutes = self.lsn
        if self.rng.random() < self.late_event_rate and self.lsn > 90:
            minutes -= self.rng.randint(60, 90)
        return _iso(_BASE_TS + timedelta(minutes=minutes))

    def _emit(self, table: str, op: str, row: dict[str, Any], deleted: bool = False) -> None:
        self.lsn += 1
        event = dict(row)
        event["updated_at"] = self._event_time()
        event.setdefault("created_at", event["updated_at"])
        event["_op"] = op
        event["_table"] = table
        event["_lsn"] = f"{self.lsn:0{LSN_WIDTH}d}"
        if deleted:
            event["_deleted"] = "true"
        self.events.append(event)

    # ---------------------------------------------------------- inserts --
    def _new_id(self, table: str) -> int:
        i = self.next_id[table]
        self.next_id[table] = i + 1
        return i

    def insert_customer(self) -> int:
        i = self._new_id("customer")
        row = {
            "id": i,
            "name": f"customer_{i}",
            "email": f"customer_{i}@example.com",
            "address": f"{self.rng.randint(1, 999)} Main St",
        }
        self.state["customer"][i] = row
        self._emit("customer", "c", row)
        return i

    def insert_product(self) -> int:
        i = self._new_id("product")
        row = {
            "id": i,
            "name": f"product_{i}",
            "description": f"description of product {i}",
            "price": round(self.rng.uniform(1, 500), 2),
            "stock": self.rng.randint(0, 100),
            "category": self.rng.choice(_CATEGORIES),
        }
        self.state["product"][i] = row
        self._emit("product", "c", row)
        return i

    def insert_order(self, with_items: bool = True) -> int:
        if not self.state["customer"]:
            self.insert_customer()
        i = self._new_id("order")
        row = {
            "id": i,
            "customer_id": self.rng.choice(sorted(self.state["customer"])),
            "order_date": _iso(_BASE_TS + timedelta(minutes=self.lsn)),
            "status": "pending",
            "total_amount": round(self.rng.uniform(10, 2000), 2),
            "shipping_address": f"{self.rng.randint(1, 999)} Oak Ave",
        }
        self.state["order"][i] = row
        self._emit("order", "c", row)
        if with_items:
            for _ in range(self.rng.randint(1, 3)):
                self.insert_order_item(i)
        return i

    def insert_order_item(self, order_id: int | None = None) -> int:
        if not self.state["order"]:
            return self.insert_order(with_items=False)
        if not self.state["product"]:
            self.insert_product()
        i = self._new_id("order_item")
        row = {
            "id": i,
            "order_id": order_id or self.rng.choice(sorted(self.state["order"])),
            "product_id": self.rng.choice(sorted(self.state["product"])),
            "quantity": self.rng.randint(1, 5),
            "unit_price": round(self.rng.uniform(1, 500), 2),
        }
        self.state["order_item"][i] = row
        self._emit("order_item", "c", row)
        return i

    # ---------------------------------------------------------- updates --
    def update_random(self, table: str) -> bool:
        rows = self.state[table]
        if not rows:
            return False
        i = self.rng.choice(sorted(rows))
        row = dict(rows[i])
        if table == "customer":
            row["address"] = f"{self.rng.randint(1, 999)} Updated Blvd"
        elif table == "product":
            row["price"] = round(self.rng.uniform(1, 500), 2)
            row["stock"] = self.rng.randint(0, 100)
        elif table == "order":
            row["status"] = self.rng.choice(_STATUSES)
        else:
            row["quantity"] = self.rng.randint(1, 5)
        rows[i] = row
        self._emit(table, "u", row)
        return True

    # ---------------------------------------------------------- deletes --
    def _childless_orders(self) -> list[int]:
        """The anti-join rule: orders with no order_items
        (generate_test_data.py:247-251)."""
        referenced = {r["order_id"] for r in self.state["order_item"].values()}
        return sorted(set(self.state["order"]) - referenced)

    def delete_random(self, table: str) -> bool:
        if table == "order_item":
            candidates = sorted(self.state["order_item"])
        elif table == "order":
            candidates = self._childless_orders()
        elif table == "product":
            referenced = {r["product_id"] for r in self.state["order_item"].values()}
            candidates = sorted(set(self.state["product"]) - referenced)
        else:
            referenced = {r["customer_id"] for r in self.state["order"].values()}
            candidates = sorted(set(self.state["customer"]) - referenced)
        if not candidates:
            return False
        i = self.rng.choice(candidates)
        last = self.state[table].pop(i)
        self._emit(table, "d", last, deleted=True)
        return True

    # -------------------------------------------------------------- run --
    def initial_load(self, rows_per_table: int = 20) -> None:
        """Seed phase (TEST_SIZE rows/table; orders bring 1-3 items each,
        generate_test_data.py:104-168)."""
        for _ in range(rows_per_table):
            self.insert_customer()
        for _ in range(rows_per_table):
            self.insert_product()
        for _ in range(rows_per_table):
            self.insert_order()

    def step(self) -> None:
        """One random operation (op mix per .env:27 insert,update,delete)."""
        op = self.rng.choice(("insert", "update", "delete"))
        table = self.rng.choice(TABLES)
        if op == "insert":
            getattr(self, f"insert_{table}")()
        elif op == "update":
            self.update_random(table)
        else:
            self.delete_random(table)

    def run(self, n_ops: int) -> None:
        for _ in range(n_ops):
            self.step()

    # ------------------------------------------------------------ output --
    def applied_state(self, table: str) -> dict[int, dict[str, Any]]:
        return self.state[table]

    def write_json_files(self, out_dir: str, n_files: int = 4, offset: int = 0) -> list[str]:
        """Write the (remaining) event log as JSON-lines files — the
        streaming file source's input. Events are split round-robin so a
        multi-file read exercises out-of-order arrival across files while
        per-key LSN order still decides the winner."""
        os.makedirs(out_dir, exist_ok=True)
        paths = [os.path.join(out_dir, f"events_{offset + i:04d}.json") for i in range(n_files)]
        handles = [open(p, "w", encoding="utf-8") for p in paths]
        try:
            for i, event in enumerate(self.events):
                handles[i % n_files].write(json.dumps(event) + "\n")
        finally:
            for fh in handles:
                fh.close()
        return paths
