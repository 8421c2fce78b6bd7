"""Custom stateful streaming operators (applyInPandasWithState +
transformWithStateInPandas).

Where built-in streaming aggregates don't express the semantics (arbitrary
per-key state machines), the engine drops to Arrow-batched grouped state:
state lives in Spark's state store (checkpointed, restored across
restarts), the kernel sees one key's rows per call as pandas batches.

Two generations of the API are covered:
- `running_key_totals` — applyInPandasWithState (GroupState), the
  Spark 3.4+ form;
- `cdc_latest_state_stream` — transformWithStateInPandas
  (StatefulProcessor + typed state variables over the RocksDB store),
  the Spark 4 form, carrying the engine's defining op (CDC latest-row-wins
  with delete tombstones) as INCREMENTAL state instead of a per-batch
  window over the full log.
Both are exercised by streaming tests across micro-batches AND across a
checkpoint restart.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_key_totals(
    stream_df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained in explicit group state.

    Output mode 'update': each micro-batch emits one row per touched key
    with the lifetime-to-date totals. State is two numbers per key —
    bounded by key cardinality, not event count; add a timeout for
    unbounded key spaces.
    """
    out_schema = f"{key_col} long, n_events long, total double"
    state_schema = "n long, total double"

    def kernel(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [round(total, 2)]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        kernel, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def cdc_latest_state_stream(
    stream_df: DataFrame,
    key_col: str = "id",
    order_col: str = "_lsn",
    op_col: str = "_op",
) -> DataFrame:
    """Streaming CDC latest-state via ``transformWithStateInPandas``
    (Spark 4 StatefulProcessor over the RocksDB state store).

    The batch form of this op (operators/cdc.py:latest_state) windows over
    the FULL accumulated log per run; here the state store carries exactly
    one (lsn, op) per key, each micro-batch folds its rows in, and the
    operator emits one row per TOUCHED key with the key's current
    liveness. Deletes keep their LSN in state (a late lower-LSN update
    must not resurrect the row — same rule the batch op gets from its
    window order) and emit ``is_live=false`` so a foreachBatch upsert sink
    can drop the key.

    Requires the RocksDB state store provider (bundled with Spark 4):
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    Reference parity: this is the materialization the reference leaves to
    downstream Hive consumers (airflow/dags/cdc_pipeline_dag.py:360-383),
    expressed as a first-class incremental operator.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = f"{key_col} long, {order_col} string, {op_col} string, is_live boolean"

    class LatestState(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._latest = handle.getValueState("latest", "lsn string, op string")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            best_lsn, best_op = (
                tuple(self._latest.get()) if self._latest.exists() else (None, None)
            )
            for pdf in rows:
                for lsn, op in zip(pdf[order_col], pdf[op_col]):
                    # zero-padded LSN strings compare correctly as strings
                    if best_lsn is None or lsn > best_lsn:
                        best_lsn, best_op = lsn, op
            self._latest.update((best_lsn, best_op))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    order_col: [best_lsn],
                    op_col: [best_op],
                    "is_live": [best_op != "d"],
                }
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=LatestState(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
