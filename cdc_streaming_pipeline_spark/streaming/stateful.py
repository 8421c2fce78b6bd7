"""Custom stateful streaming operators (applyInPandasWithState).

Where built-in streaming aggregates don't express the semantics (arbitrary
per-key state machines), the engine drops to Arrow-batched grouped state:
state lives in Spark's state store (checkpointed, restored across
restarts), the kernel sees one key's rows per call as pandas batches.

This is the pattern slot for CDC-flavored custom state (per-key op
counters, session machines, schema-drift trackers); `running_key_totals`
is the engine's reference implementation and is exercised by the streaming
tests across micro-batches AND across a checkpoint restart.
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
