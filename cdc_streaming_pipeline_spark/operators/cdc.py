"""CDC stream/batch transforms — the reference pipeline's operator core.

Covers SURVEY.md §2.2/§2.5 line by line (reference cites in each docstring):
envelope unwrap (T1), delete rewrite (T2), metadata enrichment (T3),
tombstone handling (T4), per-table demultiplex, wide-schema union (T7),
latest-state materialization, event-time partition derivation (P1).

All functions are stream-safe: they use only expressions valid on both
batch and streaming DataFrames, so the batch and streaming paths share
this exact code (one logical plan, two execution modes).

Scale notes
-----------
* latest_state is a per-key window dedup — shuffles once on the key.
  At 100 TB the shuffle is unavoidable (it IS the group-by state); skew is
  bounded because keys are primary keys (≈1 row per key per batch), and AQE
  skew-join/partition-coalescing handles stragglers.
* No driver-side state anywhere; everything is expression-level.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.schemas import (
    DELETED_COL,
    ENTITY_KEYS,
    ENTITY_SCHEMAS,
    LSN_COL,
    OP_COL,
    TABLE_COL,
)


def unwrap_envelope(df: DataFrame, value_col: str = "value") -> DataFrame:
    """T1 — project the after-image out of a Debezium-style envelope.

    Input rows hold a struct column ``value`` with fields
    ``{before, after, op, table, lsn}``; output is the flat after-image row
    plus CDC metadata columns. Deletes keep the last-known state (the
    ``before`` image) — Debezium ``delete.handling.mode=rewrite`` semantics
    (reference: cdc_pipeline_dag.py:142-145).
    """
    v = F.col(value_col)
    image = F.when(v["op"] == "d", v["before"]).otherwise(v["after"])
    return (
        df.withColumn("__image", image)
        .withColumn(OP_COL, v["op"])
        .withColumn(TABLE_COL, v["table"])
        .withColumn(LSN_COL, v["lsn"])
        .select("__image.*", OP_COL, TABLE_COL, LSN_COL)
    )


def filter_tombstones(df: DataFrame, value_col: str = "value") -> DataFrame:
    """T4 — drop null-value tombstone records emitted after deletes
    (reference: cdc_pipeline_dag.py:144,147). Must run before parsing."""
    return df.filter(F.col(value_col).isNotNull())


def emit_tombstones(df: DataFrame, value_col: str = "value", op_field: str = OP_COL) -> DataFrame:
    """T4 EMIT side — for every delete record, also emit a null-value
    tombstone record (Debezium ``tombstones.on.delete=true``,
    cdc_pipeline_dag.py:147), so log-compacting consumers forget the key.
    Inverse of ``filter_tombstones``:
    ``filter_tombstones(emit_tombstones(x)) == x`` (round-trip tested in
    tests/test_cdc_operators.py). Shuffle-free — a filter + union over the
    same scan. Record ORDER (tombstone directly after its delete) is the
    sink's concern: Kafka guarantees it per key partition at produce time;
    unordered file logs rely on the LSN, which the tombstone (by design)
    does not carry."""
    v = F.col(value_col)
    tomb = df.filter(v.getField(op_field) == F.lit("d")).select(
        *[
            F.lit(None).cast(df.schema[c].dataType).alias(c) if c == value_col else F.col(c)
            for c in df.columns
        ]
    )
    return df.unionByName(tomb)


def mark_deleted(df: DataFrame) -> DataFrame:
    """T2 — normalize the delete marker to a boolean ``_is_deleted``.

    Delete-rewrite records carry ``_deleted='true'`` (string, Debezium
    rewrite mode) or ``_op='d'``; either marks the row as a delete. The
    ``_deleted`` column is optional — sources that only carry ``_op``
    (e.g. unwrap_envelope output) compose without it.
    """
    marker = (
        F.coalesce(F.col(DELETED_COL) == F.lit("true"), F.lit(False))
        if DELETED_COL in df.columns
        else F.lit(False)
    )
    return df.withColumn("_is_deleted", marker | (F.col(OP_COL) == F.lit("d")))


def enrich_metadata(df: DataFrame, op: Column, table: Column, lsn: Column) -> DataFrame:
    """T3 — attach __op/__table/__lsn equivalents as ordinary columns
    (reference: add.fields=op,table,lsn, cdc_pipeline_dag.py:146)."""
    return df.withColumn(OP_COL, op).withColumn(TABLE_COL, table).withColumn(LSN_COL, lsn)


def demux(df: DataFrame, entity: str) -> DataFrame:
    """Per-table demultiplex of the wide events stream: filter on the
    discriminator and project the entity's declared columns
    (reference wide table discriminated by table_name,
    cdc_pipeline_dag.py:381). The filter is a partition-prunable predicate
    when the sink partitioned by table."""
    cols = [f.name for f in ENTITY_SCHEMAS[entity].fields]
    return df.filter(F.col(TABLE_COL) == entity).select(
        *cols, OP_COL, TABLE_COL, LSN_COL, *([DELETED_COL] if DELETED_COL in df.columns else [])
    )


def to_wide(dfs: list[DataFrame]) -> DataFrame:
    """T7 — widen per-entity event frames into the union schema; absent
    columns become NULL (reference Hive wide table,
    cdc_pipeline_dag.py:360-383)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def latest_state(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_col: str = LSN_COL,
    drop_deleted: bool = True,
) -> DataFrame:
    """Latest-state materialization (upsert view) — reconstruct current
    table contents from the append-only event log.

    Per key, keep the row with the greatest ``order_col`` (the LSN is a
    total order per stream — reference guarantees per-table order via
    single-partition topics, cdc_pipeline_dag.py:100; at scale we rely on
    per-key LSN order instead, which is the scalable equivalent).
    Rows whose final op is a delete are dropped (CDC 'd' + rewrite marker).

    One shuffle on the key; no driver state. This is the op the reference
    delegates to downstream consumers — first-class here.
    """
    keys = key_cols or ["id", TABLE_COL]
    keys = [k for k in keys if k in df.columns]
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if drop_deleted:
        marked = mark_deleted(out) if "_is_deleted" not in out.columns else out
        out = marked.filter(~F.col("_is_deleted")).drop("_is_deleted")
    return out


def scd2_history(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_col: str = LSN_COL,
) -> DataFrame:
    """SCD Type-2 version history from the flat CDC event stream.

    Every non-delete event opens a version row; the NEXT event on the same
    key — including a delete — closes it: ``valid_from`` = the event's LSN,
    ``valid_to`` = the following event's LSN (NULL while open),
    ``is_current`` = the version is still open. Delete events close the
    preceding version but emit no version of their own, so a deleted (and
    not re-inserted) key has no current row — exactly ``latest_state``'s
    drop semantics, with the full change history retained. This is the
    warehouse-history view the reference leaves to its downstream Hive
    consumers (airflow/dags/cdc_pipeline_dag.py:360-383) — first-class here.

    Same cost envelope as ``latest_state``: one shuffle (window on the
    key), no iteration, no driver state. The lead() must run BEFORE the
    delete filter — deletes participate as closers only.
    """
    keys = key_cols or ["id", TABLE_COL]
    keys = [k for k in keys if k in df.columns]
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    marked = mark_deleted(df) if "_is_deleted" not in df.columns else df
    return (
        marked.withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", F.lead(order_col).over(w))
        .filter(~F.col("_is_deleted"))
        .drop("_is_deleted")
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def with_time_partitions(df: DataFrame, ts_col: str = "updated_at") -> DataFrame:
    """P1 — derive year/month/day/hour partition columns from the *record*
    (event-time) timestamp, so late events land in their event-time
    partition (reference TimeBasedPartitioner on Record timestamp,
    cdc_pipeline_dag.py:193-195). Downstream time-range queries get
    partition pruning for free."""
    ts = F.col(ts_col)
    return (
        df.withColumn("year", F.year(ts))
        .withColumn("month", F.month(ts))
        .withColumn("day", F.dayofmonth(ts))
        .withColumn("hour", F.hour(ts))
    )


def with_generated_keys(
    df: DataFrame,
    key_col: str = "id",
    order_col: str | None = None,
    start: int = 1,
) -> DataFrame:
    """Q1 — key generation for inserted rows (the engine-side equivalent of
    ``INSERT ... RETURNING id``, reference:
    test-generator/generate_test_data.py:114-164).

    Two modes:
    - ``order_col`` given: dense sequential keys by that total order
      (deterministic/reproducible; the global row_number sort is the right
      choice for bounded batches — e.g. one micro-batch's inserts).
    - no ``order_col``: ``monotonically_increasing_id`` — sparse but
      unique, shuffle-free, the 100 TB path (keys encode partition id, so
      no coordination between executors).
    """
    if order_col is None:
        return df.withColumn(key_col, F.monotonically_increasing_id() + F.lit(start))
    w = Window.orderBy(F.col(order_col).asc())
    return df.withColumn(key_col, (F.row_number().over(w) + start - 1).cast("long"))


def split_corrupt(df: DataFrame, corrupt_col: str = "_corrupt_record") -> tuple[DataFrame, DataFrame]:
    """P5 — error tolerance: split good rows from poison rows (DLQ).

    Mirrors errors.tolerance=all + error logging
    (reference: cdc_pipeline_dag.py:203-205) via PERMISSIVE parse +
    corrupt-record column.
    """
    if corrupt_col not in df.columns:
        return df, df.limit(0)
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull())
    return good, bad


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    op_col: str = OP_COL,
) -> DataFrame:
    """Derive CDC events by DIFFING two table snapshots — the inverse of
    applying a change stream, and the standard recovery/reconciliation
    move when log capture was down (or never existed) between two
    snapshot exports: diff(yesterday, today) IS the missing change batch.

    One full-outer join shuffled on the key: keys only in ``new`` emit
    'c', keys only in ``old`` emit 'd', keys in both emit 'u' iff any
    compare column differs (null-safe), and identical rows emit nothing.
    Emitted rows carry the NEW image ('c'/'u') or nulls with the key
    ('d') — exactly what `latest_state` needs to roll the older snapshot
    forward. At 100 TB both sides arrive bucket-partitioned from the
    snapshot layout (operators/merge.py), so the join co-locates without
    a re-shuffle when read through the same bucketing."""
    o = old.select(
        *[F.col(k).alias(f"_o_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"_n_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_n_present"),
    )
    # eqNullSafe + explicit presence markers: key-column nullity is NOT a
    # reliable presence signal under a plain equi-join (a NULL key never
    # matches, and an old-only row with a NULL key would read as "in new
    # only" and emit 'c' with an all-null image instead of 'd')
    cond = None
    for k in key_cols:
        c = o[f"_o_{k}"].eqNullSafe(n[f"_n_{k}"])
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    in_old = F.col("_o_present").isNotNull()
    in_new = F.col("_n_present").isNotNull()
    changed = None
    for c in compare_cols:
        d = ~F.col(f"_n_{c}").eqNullSafe(F.col(f"_o_{c}"))
        changed = d if changed is None else (changed | d)
    op = (
        F.when(~in_old, F.lit("c"))
        .when(~in_new, F.lit("d"))
        .when(changed, F.lit("u"))
    )
    out_keys = [
        F.coalesce(F.col(f"_n_{k}"), F.col(f"_o_{k}")).alias(k) for k in key_cols
    ]
    out_vals = [F.col(f"_n_{c}").alias(c) for c in compare_cols]
    return (
        joined.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*out_keys, *out_vals, op_col)
    )


def ivm_group_aggregate(
    envelope: DataFrame,
    group_field: str,
    value_field: str,
    value_col: str = "value",
) -> DataFrame:
    """Incremental view maintenance (IVM) of a grouped COUNT/SUM from a
    Debezium-envelope change stream — the algebra behind incrementally
    maintained materialized views: every event contributes its AFTER
    image positively and its BEFORE image negatively, so inserts add,
    deletes subtract, and an update that MOVES a row between groups
    debits the old group and credits the new one in the same pass.
    Summing contributions replays the view to the log's final state
    with ONE aggregation and zero state — no per-key window, no join
    against the previous view. Groups that net to zero rows are dropped
    (they no longer exist in the view).

    ``envelope``: DataFrame[value: struct{before, after, op, table,
    lsn}] where before/after carry ``group_field`` and ``value_field``.
    """
    v = F.col(value_col)
    after = envelope.filter(v["after"].isNotNull()).select(
        v["after"][group_field].alias("_g"),
        F.lit(1).alias("_sign"),
        v["after"][value_field].alias("_val"),
    )
    before = envelope.filter(v["before"].isNotNull()).select(
        v["before"][group_field].alias("_g"),
        F.lit(-1).alias("_sign"),
        (-v["before"][value_field]).alias("_val"),
    )
    from cdc_streaming_pipeline_spark.functions.precision import dsum

    return (
        after.unionByName(before)
        .groupBy(F.col("_g").alias(group_field))
        .agg(
            F.sum("_sign").cast("long").alias("n_rows"),
            dsum(F.col("_val")).alias("total_amount"),
        )
        .filter(F.col("n_rows") != 0)
    )


def status_transition_stats(
    flat: DataFrame,
    key_cols: list[str],
    status_col: str,
    order_col: str = LSN_COL,
) -> DataFrame:
    """Key-churn audit over a CDC version history: per (n_versions,
    n_status_changes) cell, how many keys show that lifecycle shape —
    the report that surfaces flip-flopping keys (status oscillation =
    upstream bugs or update storms that bloat SCD2 history and IVM
    deltas out of proportion to real state change).

    One window partitioned BY KEY ordered by the event order (max task =
    one key's history, never the table — the scale contract every
    per-key CDC window here shares), then two bounded aggregates: the
    per-key rollup shuffles one row per key, the cell rollup a handful.
    A status change is counted between CONSECUTIVE versions (delete
    rewrites carry the last image, so a 'd' row never counts as a
    change by itself)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    prev = F.lag(F.col(status_col)).over(w)
    changed = (prev.isNotNull() & (F.col(status_col) != prev)).cast("long")
    per_key = (
        flat.withColumn("_chg", changed)
        .groupBy(*key_cols)
        .agg(
            F.count("*").alias("n_versions"),
            F.sum("_chg").alias("n_status_changes"),
        )
    )
    return (
        per_key.groupBy("n_versions", "n_status_changes")
        .agg(F.count("*").alias("n_keys"))
    )


def ivm_join_group_aggregate(
    env_fact: DataFrame,
    env_dim: DataFrame,
    join_field: str,
    group_field: str,
    value_field: str,
    value_col: str = "value",
) -> DataFrame:
    """Incremental view maintenance of an AGGREGATE OVER A JOIN — the
    bilinear extension of ``ivm_group_aggregate`` (the DBSP/Materialize
    delta rule Δ(A⋈B) = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB, collapsed for a full-log
    replay): each stream reduces independently to a signed per-join-key
    state — the fact side to (net row count, exact-decimal net value),
    the dimension side to a net indicator per (key, group attribute) that
    telescopes to 1 for the current attribute and 0 for every superseded
    one — and ONE compact join of the two states followed by a grouped
    sum of products lands exactly on the final-state join aggregate.

    No per-event join, no latest-state window, no state store: two
    linear aggregations over the logs plus a join whose both sides are
    |live keys|, order-insensitive because the ± cancellation is exact
    in decimal and the indicator algebra is integral. At 100 TB each log
    shuffles once on the join key — the same lower bound the final-state
    recompute pays, but this plan never materializes either table.

    ``env_fact``/``env_dim``: Debezium-envelope frames (struct
    ``{before, after, op, table, lsn}``); fact images carry
    ``join_field`` + ``value_field``, dim images ``join_field`` +
    ``group_field``.
    """
    from cdc_streaming_pipeline_spark.functions.precision import _DEC

    v = F.col(value_col)
    f_after = env_fact.filter(v["after"].isNotNull()).select(
        v["after"][join_field].alias("_k"),
        F.lit(1).alias("_s"),
        v["after"][value_field].cast(_DEC).alias("_v"),
    )
    f_before = env_fact.filter(v["before"].isNotNull()).select(
        v["before"][join_field].alias("_k"),
        F.lit(-1).alias("_s"),
        (-v["before"][value_field]).cast(_DEC).alias("_v"),
    )
    fact = (
        f_after.unionByName(f_before)
        .groupBy("_k")
        .agg(F.sum("_s").alias("_n_f"), F.sum("_v").alias("_v_f"))
        .filter(F.col("_n_f") != 0)
    )
    d_after = env_dim.filter(v["after"].isNotNull()).select(
        v["after"][join_field].alias("_k"),
        v["after"][group_field].alias("_g"),
        F.lit(1).alias("_s"),
    )
    d_before = env_dim.filter(v["before"].isNotNull()).select(
        v["before"][join_field].alias("_k"),
        v["before"][group_field].alias("_g"),
        F.lit(-1).alias("_s"),
    )
    dim = (
        d_after.unionByName(d_before)
        .groupBy("_k", "_g")
        .agg(F.sum("_s").alias("_n_d"))
        .filter(F.col("_n_d") != 0)
    )
    return (
        fact.join(dim, "_k")
        .groupBy(F.col("_g").alias(group_field))
        .agg(
            F.sum(F.col("_n_f") * F.col("_n_d")).cast("long").alias("n_rows"),
            F.round(F.sum(F.col("_v_f") * F.col("_n_d")), 2)
            .cast("double")
            .alias("total_amount"),
        )
    )


def offset_gap_audit(
    stream: DataFrame,
    partition_col: str,
    offset_col: str,
    step: int = 1,
) -> DataFrame:
    """Per-source-partition offset-sequence completeness audit — the
    replication-loss detector a CDC consumer runs over its landed log
    (Kafka offsets / Postgres LSNs are per-partition fixed-step
    sequences; a hole means records were lost or skipped; reference: the
    connector's offset bookkeeping in airflow/dags/cdc_pipeline_dag.py).

    Contract: within a partition, offsets form a step-spaced sequence
    (``o = r + slot*step`` for a fixed residue ``r``) — the Kafka/LSN
    model. A GAP RUN is a maximal run of missing slots.

    Scale design — why none of the three obvious plans:
    - ``Window.partitionBy(partition).orderBy(offset)`` sorts each
      source partition in ONE task (billions of rows per Kafka
      partition at the design point);
    - a self-anti-join on (partition, offset+step) is parallel but
      shuffles the stream TWICE and builds stream-sized hash sides
      (measured 23× wall for 10× rows at 10^8 locally — spill);
    - collect_list-per-chunk bounds task memory but ships every slot
      through the shuffle and pays per-element HOF work (measured only
      1.5× better than the anti-join at 10^8).
    Instead the slot sequence is folded into a BITMAP: 64 slots per
    long, ``bit_or(1 << slot%64)`` grouped by (partition, slot div 64)
    — pure whole-stage-codegen integer ops, and the map-side partial
    aggregation collapses rows to words BEFORE the shuffle, so at most
    n/64 rows ever ship. Adjacent-present pairs inside a word are
    ``bit_count(word & (word >>> 1))``; pairs straddling word
    boundaries come from a self-join of the word frame (n/64 rows) on
    the neighbouring word id. Gap runs per partition then fall out in
    closed form: ``n_records − adjacent_pairs − 1`` (every offset
    except the max either has its successor present or starts a gap
    run), and missing slots are ``(last−first)/step + 1 − n_records``.
    """
    p, o = F.col(partition_col), F.col(offset_col)
    base = stream.select(p.alias("_p"), o.alias("_o")).withColumn(
        "_s", F.expr(f"_o div {step}")
    )
    words = base.groupBy("_p", F.expr("_s div 64").alias("_w")).agg(
        F.expr("bit_or(shiftleft(1L, cast(_s % 64 AS INT)))").alias("_word"),
        F.count("*").alias("_n"),
        F.min("_o").alias("_min_o"),
        F.max("_o").alias("_max_o"),
    )
    words = words.withColumn(
        "_pairs", F.expr("bit_count(_word & shiftrightunsigned(_word, 1))")
    )
    nxt = words.select(
        "_p",
        (F.col("_w") - 1).alias("_w"),
        F.expr("cast(_word & 1 AS LONG)").alias("_nxt_first"),
    )
    boundary = words.join(nxt, ["_p", "_w"], "left").withColumn(
        "_bpair",
        F.expr("shiftrightunsigned(_word, 63)") * F.coalesce("_nxt_first", F.lit(0)),
    )
    stats = boundary.groupBy("_p").agg(
        F.sum("_n").alias("n_records"),
        F.min("_min_o").alias("first_offset"),
        F.max("_max_o").alias("last_offset"),
        (F.sum("_pairs") + F.sum("_bpair")).alias("_adj"),
    )
    expected = ((F.col("last_offset") - F.col("first_offset")) / step + 1).cast("long")
    return stats.select(
        F.col("_p").alias(partition_col),
        "n_records",
        "first_offset",
        "last_offset",
        (expected - F.col("n_records")).alias("missing_n"),
        (F.col("n_records") - F.col("_adj") - 1).cast("long").alias("n_gap_runs"),
    )


def transaction_boundary_audit(
    events: DataFrame,
    markers: DataFrame,
    tx_col: str = "tx_id",
    declared_col: str = "declared_n",
) -> DataFrame:
    """Debezium transaction-metadata accounting (``provide.transaction.
    metadata=true``): data events carry a transaction id; a separate
    marker stream declares each committed transaction's event count. A
    consumer that applies transactions ATOMICALLY must hold events until
    the marker arrives and the received count matches. This audit
    classifies every transaction seen on either stream:

    - ``complete``:  marker present, received == declared
    - ``partial``:   marker present, 0 < received < declared (loss)
    - ``lost``:      marker present, no events at all
    - ``in_flight``: events present, no marker yet (uncommitted tail)

    One count-aggregate per stream + one full-outer join on tx id — both
    sides shuffle once on the transaction id and the join carries one
    row per transaction, not per event. Returns the per-status rollup
    (n_txs, declared/received event totals)."""
    recv = events.groupBy(F.col(tx_col).alias("_tx")).agg(
        F.count("*").alias("_received")
    )
    decl = markers.select(F.col(tx_col).alias("_tx"), F.col(declared_col).alias("_declared"))
    both = decl.join(recv, "_tx", "full_outer")
    received = F.coalesce("_received", F.lit(0))
    status = (
        F.when(F.col("_declared").isNull(), F.lit("in_flight"))
        .when(received == 0, F.lit("lost"))
        .when(received == F.col("_declared"), F.lit("complete"))
        .otherwise(F.lit("partial"))
    )
    return (
        both.withColumn("tx_status", status)
        .groupBy("tx_status")
        .agg(
            F.count("*").alias("n_txs"),
            F.sum(F.coalesce("_declared", F.lit(0))).alias("events_declared"),
            F.sum(received).alias("events_received"),
        )
    )


def transaction_atomic_apply(
    events: DataFrame,
    markers: DataFrame,
    tx_col: str = "tx_id",
    declared_col: str = "declared_n",
) -> DataFrame:
    """Commit-atomic event gate: keep only events of transactions whose
    marker arrived AND whose declared count matches the received count
    (the all-or-nothing rule — applying a partial transaction exposes a
    state no upstream database ever held). Left-semi join against the
    complete-transaction id set; AQE broadcasts it when small, shuffles
    when not — no hint, the set scales with the open-transaction window."""
    recv = events.groupBy(F.col(tx_col).alias("_tx")).agg(
        F.count("*").alias("_received")
    )
    complete = (
        markers.select(F.col(tx_col).alias("_tx"), F.col(declared_col).alias("_declared"))
        .join(recv, "_tx")
        .filter(F.col("_received") == F.col("_declared"))
        .select("_tx")
    )
    return events.join(
        complete.withColumnRenamed("_tx", tx_col), tx_col, "left_semi"
    )
