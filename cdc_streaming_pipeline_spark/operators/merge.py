"""Partition-pruned CDC merge into a bucket-partitioned parquet snapshot.

The reference lands CDC events in Hive and leaves "apply the changes to a
queryable table" to downstream consumers (cdc_pipeline_dag.py:360-383 builds
the wide external table; init.sql seeds the source). `latest_state`
(operators/cdc.py:126) answers that as a full recompute over the whole log.
This module is the INCREMENTAL answer — the op a production Spark deployment
runs every few minutes, and the one whose cost model actually matters at
100 TB:

* The snapshot lives on disk partitioned by a stable key bucket
  (``_kb = pmod(xxhash64(key), n_buckets)``). Bucket count is fixed at table
  creation, so a key always lands in the same partition directory.
* An incoming CDC batch touches only the buckets its keys hash into. The
  merge reads ONLY those partitions (partition pruning on the scan — a
  batch touching 3 of 512 buckets reads ~0.6% of a 100 TB snapshot), merges
  with `latest_state` semantics, and rewrites ONLY those partitions via
  dynamic partition overwrite. Untouched partition files are never opened,
  never rewritten (byte-identity asserted in tests/test_merge.py).
* The snapshot stores RAW latest rows — delete markers and the LSN column
  included — so a late, lower-LSN event can never resurrect a deleted key
  (same invariant as streaming/pipeline.py's raw state, and the workload
  property test's applied-state oracle).

This is exactly Delta/Iceberg ``MERGE INTO`` file-skipping semantics,
expressed with plain parquet + Spark dynamic partition overwrite — no table
format required. On a real deployment, swap `merge_cdc_batch`'s write for a
``MERGE INTO`` and keep everything upstream unchanged.

Scale notes
-----------
* One shuffle per merge (the `latest_state` window over touched buckets);
  the union's snapshot side arrives already bucket-partitioned.
* ``touched_buckets`` is a collect of DISTINCT bucket ids — bounded by
  ``n_buckets`` (an int list of ≤ a few thousand), never by data volume.
* Dynamic partition overwrite is atomic per partition directory on HDFS-like
  stores; on object stores pair it with a manifest commit (out of scope
  here, noted for deployment).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.cdc import latest_state, mark_deleted
from cdc_streaming_pipeline_spark.schemas import LSN_COL

BUCKET_COL = "_kb"


def read_bucketed(spark: SparkSession, path: str):
    """Every read of a bucketed table goes through schema-merged parquet:
    dynamic overwrite rewrites only TOUCHED buckets, so after an additive
    upstream schema change different bucket dirs legitimately carry
    different footers — a plain read picks one footer and silently DROPS
    the new column (bug class reproduced in tests/test_merge.py). The
    footer-merge cost is bounded by the files actually listed, i.e. the
    pruned buckets on merge paths; a deployment avoiding even that keeps
    a sidecar schema file updated on write."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def with_key_bucket(df: DataFrame, key_cols: list[str], n_buckets: int) -> DataFrame:
    """Stable key bucket: pmod(xxhash64(keys...), n_buckets).

    xxhash64 is deterministic across Spark sessions/versions for the same
    input, so the bucket assignment is a durable property of the key — the
    requirement for the on-disk layout to be reusable across runs.
    """
    return df.withColumn(
        BUCKET_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int"),
    )


def init_snapshot(
    events: DataFrame,
    path: str,
    key_cols: list[str],
    n_buckets: int = 64,
    order_col: str = LSN_COL,
) -> None:
    """Bootstrap the snapshot from an event backlog (initial load / backfill).

    Writes raw latest rows (delete markers kept) partitioned by key bucket.
    `repartition(BUCKET_COL)` co-locates each bucket in one task so each
    partition directory gets contiguous, well-sized files rather than
    n_tasks × n_buckets small files.
    """
    state = latest_state(events, key_cols=key_cols, order_col=order_col, drop_deleted=False)
    out = with_key_bucket(state, key_cols, n_buckets)
    (
        out.repartition(F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def touched_buckets(batch_df: DataFrame, key_cols: list[str], n_buckets: int) -> list[int]:
    """Distinct key buckets present in a CDC batch — the partitions the merge
    is allowed to read and rewrite. Bounded by n_buckets, not by batch size
    (Spark aggregates the distinct before the driver sees anything)."""
    rows = (
        with_key_bucket(batch_df, key_cols, n_buckets)
        .select(BUCKET_COL)
        .distinct()
        .collect()
    )
    return sorted(r[BUCKET_COL] for r in rows)


def merge_cdc_batch(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    key_cols: list[str],
    n_buckets: int = 64,
    order_col: str = LSN_COL,
) -> list[int]:
    """Merge one CDC batch into the snapshot, touching only its buckets.

    Returns the list of rewritten bucket ids. The scan filter
    ``_kb IN (...)`` is a partition-column predicate, so Spark prunes the
    listing to those directories — the snapshot read cost is proportional to
    the batch's key spread, not to snapshot size. The write uses
    ``partitionOverwriteMode=dynamic`` as a per-write OPTION (not a global
    conf mutation), so only partitions present in the output frame — exactly
    the touched ones — are replaced.
    """
    batch = with_key_bucket(batch_df, key_cols, n_buckets)
    touched = touched_buckets(batch_df, key_cols, n_buckets)
    if not touched:
        return []
    prev = (
        read_bucketed(spark, path).filter(F.col(BUCKET_COL).isin(touched))
        if os.path.exists(path)
        else None
    )
    merged = batch if prev is None else prev.unionByName(batch, allowMissingColumns=True)
    new_state = latest_state(merged, key_cols=key_cols, order_col=order_col, drop_deleted=False)
    (
        new_state.repartition(F.col(BUCKET_COL))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )
    return touched


def read_snapshot(spark: SparkSession, path: str, raw: bool = False) -> DataFrame:
    """Current table contents. raw=True keeps delete markers and the bucket
    column (the merge's own input view); the default is the queryable view."""
    df = read_bucketed(spark, path)
    if raw:
        return df
    df = mark_deleted(df) if "_is_deleted" not in df.columns else df
    return df.filter(~F.col("_is_deleted")).drop("_is_deleted", BUCKET_COL)


def propagate_deletions(
    spark: SparkSession,
    path: str,
    keys_df: DataFrame,
    key_cols: list[str],
    n_buckets: int = 64,
) -> list[int]:
    """Compliance deletion (right-to-be-forgotten) against the bucketed
    snapshot: PHYSICALLY remove every row whose key appears in ``keys_df``,
    rewriting only the partitions those keys hash into.

    Distinct from a CDC delete event: ``merge_cdc_batch`` keeps a delete
    MARKER (so late lower-LSN events cannot resurrect the key), which is
    the wrong answer when the obligation is to erase the data itself. This
    op anti-joins the affected buckets against the key set and overwrites
    just those directories — cost proportional to the keys' bucket spread,
    never snapshot size, same pruning contract as the merge (untouched
    partition files stay byte-identical; asserted in tests/test_merge.py).
    The returned bucket list is the audit record of what was rewritten.

    Works verbatim on the SCD2 version table too (same key-bucket
    layout): applied there it purges the victims' entire HISTORY —
    versions and delete markers — which is what the erasure obligation
    actually demands (tests/test_merge.py::
    test_propagate_deletions_purges_scd2_history_too).
    """
    if not os.path.exists(path):
        return []
    # bucket = xxhash64 of the TYPED key (an int and a long with the same
    # value hash differently), so the key frame must carry the snapshot's
    # exact key dtypes before bucketing — cast defensively from the footer
    # schema rather than trusting the caller's frame
    snap_types = {f.name: f.dataType for f in read_bucketed(spark, path).schema.fields}
    keys_typed = keys_df.select(
        *[F.col(c).cast(snap_types[c]).alias(c) for c in key_cols]
    )
    touched = touched_buckets(keys_typed, key_cols, n_buckets)
    if not touched:
        return []
    keys = with_key_bucket(keys_typed, key_cols, n_buckets).select(
        *key_cols, BUCKET_COL
    ).distinct()
    prev = read_bucketed(spark, path).filter(F.col(BUCKET_COL).isin(touched))
    kept = prev.join(F.broadcast(keys), on=[*key_cols, BUCKET_COL], how="left_anti")
    # The overwrite below rewrites the very files `kept`'s lineage reads, so
    # the survivors must be DURABLY materialized first — a persist() would
    # leave a window where an evicted partition recomputed mid-write re-reads
    # files scheduled for deletion. Stage the (pruned, small) survivor set to
    # a sibling directory and run the overwrite from the staged copy; the
    # extra write is proportional to the touched buckets, never the snapshot.
    staging = f"{path.rstrip('/')}._erasure_staging"
    # a failed prior run may have left a stale staging dir — clear it so
    # mode("overwrite") semantics never mix two runs' survivor sets
    shutil.rmtree(staging, ignore_errors=True)
    try:
        kept.write.mode("overwrite").parquet(staging)
        staged = spark.read.parquet(staging)
        # dynamic overwrite only replaces partitions PRESENT in the output —
        # a bucket whose every row was erased emits nothing and would keep
        # its old files, silently failing the erasure. Find fully-emptied
        # buckets (a tiny per-bucket count) and remove their directories
        # explicitly.
        surviving = {
            r[BUCKET_COL] for r in staged.select(BUCKET_COL).distinct().collect()
        }
        if surviving:
            (
                staged.repartition(F.col(BUCKET_COL))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(BUCKET_COL)
                .parquet(path)
            )
    finally:
        # unconditional: a failure between the staged write and the
        # overwrite must not strand the staging directory on disk
        shutil.rmtree(staging, ignore_errors=True)
    for b in touched:
        if b not in surviving:
            shutil.rmtree(os.path.join(path, f"{BUCKET_COL}={b}"), ignore_errors=True)
    # the rmtree above bypasses Spark's write path, so the session's cached
    # file listing for this path still names the removed files — invalidate
    spark.catalog.refreshByPath(path)
    return touched


# ----------------------------------------------------- SCD2 maintenance --
SCD2_COLS = ("valid_from", "valid_to", "is_current")


def _scd2_with_markers(events: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """SCD2 versions PLUS zero-width delete-marker rows.

    ``scd2_history`` encodes a delete only as a closed ``valid_to`` bound
    on the preceding version — which is LOSSY when there is no preceding
    version yet (a delete arriving before its key's first insert across
    micro-batch boundaries) or when the closing bound lands in a bucket
    rewrite that later recomputes without it: a late lower-LSN insert
    would then resurrect an open version. So every delete event is ALSO
    stored verbatim as a marker row with ``valid_from == valid_to ==``
    its LSN — a zero-width interval no point-in-time probe can match,
    invisible in the default read, but preserved for the merge's event
    reconstruction. Same tombstone-retention move as the latest-state
    snapshot's raw delete rows (init_snapshot docstring).

    With markers, EVERY stored row is its originating event verbatim, so
    reconstruction is just dropping the interval columns — nothing is
    inferred."""
    from cdc_streaming_pipeline_spark.operators.cdc import mark_deleted, scd2_history

    hist = scd2_history(events, key_cols=key_cols, order_col=order_col)
    marked = mark_deleted(events) if "_is_deleted" not in events.columns else events
    markers = (
        marked.filter(F.col("_is_deleted"))
        .drop("_is_deleted")
        .withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", F.col(order_col))
        .withColumn("is_current", F.lit(False))
    )
    return hist.unionByName(markers)


def init_scd2(
    events: DataFrame,
    path: str,
    key_cols: list[str],
    n_buckets: int = 64,
    order_col: str = LSN_COL,
) -> None:
    """Bootstrap the bucket-partitioned SCD2 version table from an event
    backlog. Rows keep EVERY event column (op, lsn, deleted flag
    included) alongside the interval bounds, and deletes persist as
    zero-width marker rows — together that makes the table a LOSSLESS
    encoding of its own event history, which is what
    `merge_scd2_batch`'s pruned recompute relies on."""
    out = with_key_bucket(
        _scd2_with_markers(events, key_cols, order_col), key_cols, n_buckets
    )
    (
        out.repartition(F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def merge_scd2_batch(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    key_cols: list[str],
    n_buckets: int = 64,
    order_col: str = LSN_COL,
) -> list[int]:
    """Incremental SCD2 maintenance, partition-pruned like
    ``merge_cdc_batch``: only the buckets the batch's keys hash into are
    read, recomputed, and dynamically overwritten.

    Because every stored row (version or delete marker) IS its
    originating event verbatim (`_scd2_with_markers`), the touched-bucket
    recompute is EXACT: strip the interval columns from the stored rows,
    union the new batch (by name, missing columns null-filled — additive
    schema evolution), dedupe on (key, lsn) — which also makes replays
    idempotent — and re-derive the touched keys' versions from scratch.
    Late, out-of-order events are handled exactly (the recompute re-sorts
    per key), including a delete that arrived BEFORE its key's first
    insert (the marker preserves it). Returns the rewritten bucket ids."""
    touched = touched_buckets(batch_df, key_cols, n_buckets)
    if not touched:
        return []
    prev = read_bucketed(spark, path).filter(F.col(BUCKET_COL).isin(touched))
    event_cols = [c for c in prev.columns if c not in SCD2_COLS and c != BUCKET_COL]

    log = (
        prev.select(*event_cols)
        .unionByName(batch_df, allowMissingColumns=True)
        .dropDuplicates([*key_cols, order_col])
    )
    out = with_key_bucket(
        _scd2_with_markers(log, key_cols, order_col), key_cols, n_buckets
    )
    (
        out.repartition(F.col(BUCKET_COL))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )
    return touched


def read_scd2(spark: SparkSession, path: str, raw: bool = False) -> DataFrame:
    """The maintained SCD2 dimension. The default view hides the
    zero-width delete markers (``valid_from == valid_to`` — matchable by
    no point-in-time probe); raw=True keeps them (the merge's own input
    view), with the bucket column dropped either way."""
    df = read_bucketed(spark, path).drop(BUCKET_COL)
    if raw:
        return df
    return df.filter(
        F.col("valid_to").isNull() | (F.col("valid_to") != F.col("valid_from"))
    )
